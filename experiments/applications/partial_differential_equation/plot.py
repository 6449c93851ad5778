"""Plot wave-PDE training convergence and work-precision curves.

Parity with the reference's plot.py / plot_workprecision.py /
plot_solution.py trio, combined into one driver with subcommands.
"""

import argparse
import glob
import json
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from lanczos_adjoints_tpu.utils import exp_util


def plot_training(resolution, figures):
    results = exp_util.matching_directory(__file__, "results/")
    results = results.replace("/plot/", "/train/")
    fig, axes = plt.subplots(1, 2, figsize=(9, 3.2), constrained_layout=True)
    pattern = f"{results}{resolution}x{resolution}_*_convergence.npy"
    for f in sorted(glob.glob(pattern)):
        label = os.path.basename(f).split("_")[1]
        conv = np.load(f)
        stamps = np.load(f.replace("_convergence", "_timestamps"))
        axes[0].semilogy(conv, label=label)
        axes[1].semilogy(stamps[: len(conv)], conv[: len(stamps)], label=label)
    axes[0].set_xlabel("epoch")
    axes[0].set_ylabel("relative MSE")
    axes[1].set_xlabel("wall time [s]")
    axes[0].legend(fontsize=8)
    fig.savefig(f"{figures}training_{resolution}.pdf")
    print("saved", f"{figures}training_{resolution}.pdf")


def plot_workprecision(figures):
    results = exp_util.matching_directory(__file__, "results/")
    results = results.replace("/plot/", "/workprecision/")
    fig, ax = plt.subplots(figsize=(4.5, 3.2), constrained_layout=True)
    for f in sorted(glob.glob(f"{results}workprecision_s*.json")):
        with open(f) as fp:
            rows = json.load(fp)
        by_method = {}
        for row in rows:
            by_method.setdefault(row["method"], []).append(
                (row["num_matvecs"], row["error"])
            )
        for method, pts in by_method.items():
            pts = sorted(pts)
            ax.loglog(*zip(*pts), "o-", label=method)
    ax.set_xlabel("matvecs")
    ax.set_ylabel("gradient relative error")
    ax.legend(fontsize=8)
    fig.savefig(f"{figures}workprecision.pdf")
    print("saved", f"{figures}workprecision.pdf")


def plot_solution(resolution, figures):
    data_dir = exp_util.matching_directory(__file__, "data/")
    data_dir = data_dir.replace("/plot/", "/make_data/")
    prefix = f"{data_dir}{resolution}x{resolution}"
    y0 = np.load(f"{prefix}_data_inputs.npy")[0]
    y1 = np.load(f"{prefix}_data_targets.npy")[0]
    param = np.load(f"{prefix}_data_parameter.npy")

    fig, axes = plt.subplots(1, 3, figsize=(10, 3.2), constrained_layout=True)
    for ax, field, title in [
        (axes[0], y0[0], "initial condition"),
        (axes[1], y1[0], "solution at t=1"),
        (axes[2], param, "wave-speed field"),
    ]:
        im = ax.imshow(field, cmap="RdBu")
        ax.set_title(title, fontsize=9)
        fig.colorbar(im, ax=ax, shrink=0.8)
    fig.savefig(f"{figures}solution_{resolution}.pdf")
    print("saved", f"{figures}solution_{resolution}.pdf")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--what",
        type=str,
        default="all",
        choices=["training", "workprecision", "solution", "all"],
    )
    parser.add_argument("--resolution", type=int, default=128)
    args = parser.parse_args()

    figures = exp_util.matching_directory(__file__, "figures/")
    os.makedirs(figures, exist_ok=True)

    if args.what in ("training", "all"):
        plot_training(args.resolution, figures)
    if args.what in ("workprecision", "all"):
        plot_workprecision(figures)
    if args.what in ("solution", "all"):
        plot_solution(args.resolution, figures)
