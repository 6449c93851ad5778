"""Plot Gram-matvec wall times across sizes and execution policies.

Role of the reference's gram_matvec_versus_keops plot family
(``plot.py``/``plot_sizes.py``): time-vs-N per policy, with the
reference's published V100 KeOps/matfree numbers overlaid for the
configurations BASELINE.md records.
"""

import argparse
import json
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

from lanczos_adjoints_tpu.utils import exp_util

# BASELINE.md rows (V100, reference results/): N=65536, d=1.
_REFERENCE = {
    "KeOps+GPyTorch (V100)": {65536: 5.58e-3},
    "matfree vmap (V100)": {65536: 1.91e-2},
}


def main(args):
    results = exp_util.matching_directory(__file__, "results/")
    results = results.replace("/plot/", "/benchmark/")
    with open(f"{results}matvec_times.json") as fp:
        rows = json.load(fp)

    by_policy = {}
    for row in rows:
        by_policy.setdefault(row["policy"], []).append(
            (row["n"], row["time_s"])
        )

    fig, ax = plt.subplots(figsize=(4.8, 3.4), constrained_layout=True)
    for policy, pts in sorted(by_policy.items()):
        pts = sorted(pts)
        ax.loglog([p[0] for p in pts], [p[1] for p in pts], "o-", label=policy)
    for name, pts in _REFERENCE.items():
        ns = sorted(pts)
        ax.loglog(ns, [pts[n] for n in ns], "k*", markersize=10)
        ax.annotate(name, (ns[-1], pts[ns[-1]]), fontsize=7,
                    textcoords="offset points", xytext=(5, 0))
    ax.set_xlabel("N")
    ax.set_ylabel("seconds / matvec")
    ax.legend(fontsize=8)
    ax.grid(True, which="both", alpha=0.3)

    figures = exp_util.matching_directory(__file__, "figures/")
    os.makedirs(figures, exist_ok=True)
    out = f"{figures}gram_matvec_times.pdf"
    fig.savefig(out)
    print("saved", out)


if __name__ == "__main__":
    main(argparse.ArgumentParser().parse_args())
