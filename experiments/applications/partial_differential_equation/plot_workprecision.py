"""Plot work-precision: gradient error vs matvec count per solver.

Role of the reference's ``plot_workprecision.py``: one marker series
per method (Arnoldi expm depths vs explicit RK4 steps), optionally
overlaying the f32 run with the f64-on-CPU reference that shows the
convergence range below the f32 floor (``workprecision.py --x64``).
"""

import argparse
import glob
import json
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

from lanczos_adjoints_tpu.utils import exp_util

_STYLES = {"arnoldi": "o-", "rk4": "s--"}


def main(args):
    results = exp_util.matching_directory(__file__, "results/")
    results = results.replace("/plot_workprecision/", "/workprecision/")
    files = sorted(glob.glob(f"{results}workprecision*_s{args.seed}.json"))
    if not files:
        raise SystemExit(f"no workprecision artifacts under {results}")

    fig, ax = plt.subplots(figsize=(4.6, 3.4), constrained_layout=True)
    for path in files:
        tag = "f64" if "_x64_" in path else "f32"
        with open(path) as fp:
            rows = json.load(fp)
        by_method = {}
        for row in rows:
            by_method.setdefault(row["method"], []).append(
                (row["num_matvecs"], row["error"])
            )
        for method, pts in sorted(by_method.items()):
            pts = sorted(pts)
            ax.loglog(
                [p[0] for p in pts],
                [max(p[1], 1e-16) for p in pts],
                _STYLES.get(method, "^-"),
                alpha=1.0 if tag == "f64" else 0.45,
                label=f"{method} ({tag})",
            )
    ax.set_xlabel("matvecs per solve")
    ax.set_ylabel("relative gradient error")
    ax.legend(fontsize=7)
    ax.grid(True, which="both", alpha=0.3)

    figures = exp_util.matching_directory(__file__, "figures/")
    os.makedirs(figures, exist_ok=True)
    out = f"{figures}workprecision_s{args.seed}.pdf"
    fig.savefig(out)
    print("saved", out)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--seed", type=int, default=1)
    main(parser.parse_args())
