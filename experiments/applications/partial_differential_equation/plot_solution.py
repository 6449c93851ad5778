"""Visualise the wave-PDE data and the recovered coefficient field.

Role of the reference's ``plot_solution.py``: panels for an initial
condition, the dopri8/RK4 target at t=1, and the true vs learned
(squared, i.e. physical) wave-speed fields.  The learned field is read
from ``<label>_scale_field.npy`` written by ``train.py``.
"""

import argparse
import glob
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from lanczos_adjoints_tpu.utils import exp_util


def main(args):
    data_dir = exp_util.matching_directory(__file__, "data/")
    data_dir = data_dir.replace("/plot_solution/", "/make_data/")
    prefix = f"{data_dir}{args.resolution}x{args.resolution}"
    y0s = np.load(f"{prefix}_data_inputs.npy")
    y1s = np.load(f"{prefix}_data_targets.npy")
    truth = np.load(f"{prefix}_data_parameter.npy")

    results = exp_util.matching_directory(__file__, "results/")
    results = results.replace("/plot_solution/", "/train/")
    learned_files = sorted(
        glob.glob(
            f"{results}{args.resolution}x{args.resolution}_*_scale_field.npy"
        )
    )

    ncols = 3 + len(learned_files)
    fig, axes = plt.subplots(
        1, ncols, figsize=(3.0 * ncols, 3.0), constrained_layout=True
    )
    k = args.sample
    axes[0].imshow(y0s[k, 0], cmap="RdBu")
    axes[0].set_title("$u(t=0)$")
    axes[1].imshow(y1s[k, 0], cmap="RdBu")
    axes[1].set_title("$u(t=1)$ (RK4 target)")
    im = axes[2].imshow(truth**2, cmap="viridis")
    axes[2].set_title("true $c^2$")
    fig.colorbar(im, ax=axes[2], shrink=0.8)
    for ax, f in zip(axes[3:], learned_files):
        method = os.path.basename(f).split("_")[1]
        learned = np.load(f).reshape(truth.shape)
        im = ax.imshow(learned, cmap="viridis")
        ax.set_title(f"learned $c^2$ ({method})")
        fig.colorbar(im, ax=ax, shrink=0.8)
    for ax in axes:
        ax.set_xticks([]), ax.set_yticks([])

    figures = exp_util.matching_directory(__file__, "figures/")
    os.makedirs(figures, exist_ok=True)
    out = f"{figures}solution_{args.resolution}.pdf"
    fig.savefig(out)
    print("saved", out)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--resolution", type=int, default=128)
    parser.add_argument("--sample", type=int, default=0)
    main(parser.parse_args())
