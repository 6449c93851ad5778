"""Plot forward/adjoint/backprop wall-times vs Krylov depth.

Role of the reference's ``plot_inline.py`` + ``plot_quadrant.py``
(``experiments/benchmarks/wall_times_vjp_through_lanczos_arnoldi``):
one panel per (algorithm, reortho) tag showing the forward pass, the
closed-form adjoint VJP and the backprop-through-the-loop VJP as a
function of Krylov depth, with the reference's V100 bcsstk18 medians
(BASELINE.md rows 1-3) overlaid for scale.
"""

import argparse
import glob
import os
import re

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from lanczos_adjoints_tpu.utils import exp_util

# BASELINE.md rows 1-3: V100, bcsstk18, reortho=none.
_REFERENCE = {
    "lanczos": {"custom": (90, 0.098), "autodiff": (90, 0.268), "fwdpass": (250, 0.279)},
    "arnoldi": {"custom": (90, 0.242), "autodiff": (90, 0.299)},
}

_STYLES = {"fwdpass": "o-", "custom": "s-", "autodiff": "^--"}


def main(args):
    results = exp_util.matching_directory(__file__, "results/")
    results = results.replace("/plot/", "/benchmark/")
    tags = sorted(
        {
            re.sub(r"_(times_\w+|depths)\.npy$", "", os.path.basename(p))
            for p in glob.glob(f"{results}*_depths.npy")
        }
    )
    if not tags:
        raise SystemExit(f"no benchmark artifacts under {results}")

    fig, axes = plt.subplots(
        1, len(tags), figsize=(4.2 * len(tags), 3.4), constrained_layout=True,
        squeeze=False,
    )
    for ax, tag in zip(axes[0], tags):
        depths = np.load(f"{results}{tag}_depths.npy")
        for name, style in _STYLES.items():
            path = f"{results}{tag}_times_{name}.npy"
            if not os.path.exists(path):
                continue
            times = np.load(path)
            ax.semilogy(depths[: len(times)], times * 1e3, style, label=name)
        algo = tag.split("_")[0]
        for name, (k, t) in _REFERENCE.get(algo, {}).items():
            ax.semilogy([k], [t * 1e3], "k*", markersize=10)
            ax.annotate(
                f"V100 {name}", (k, t * 1e3), fontsize=7,
                textcoords="offset points", xytext=(5, 0),
            )
        ax.set_title(tag, fontsize=9)
        ax.set_xlabel("Krylov depth K")
        ax.set_ylabel("ms / decomposition")
        ax.legend(fontsize=8)
        ax.grid(True, which="both", alpha=0.3)

    figures = exp_util.matching_directory(__file__, "figures/")
    os.makedirs(figures, exist_ok=True)
    out = f"{figures}wall_times_vjp.pdf"
    fig.savefig(out)
    print("saved", out)


if __name__ == "__main__":
    main(argparse.ArgumentParser().parse_args())
