"""Plot GP-training loss curves and CG diagnostics per dataset/seed.

Parity with the reference's plot.py: loss vs wall-clock, CG error and
iteration counts over epochs, aggregated across seeds.
"""

import argparse
import glob
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from lanczos_adjoints_tpu.utils import exp_util

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--name", type=str, required=True)
    args = parser.parse_args()

    results = exp_util.matching_directory(__file__, "results/")
    results = results.replace("/plot/", "/optim_logml_adjoints_adaptive/")
    figures = exp_util.matching_directory(__file__, "figures/")
    os.makedirs(figures, exist_ok=True)

    datasets = sorted(
        {
            os.path.basename(f).split("_s")[0].removeprefix(f"{args.name}_")
            for f in glob.glob(f"{results}{args.name}_*_loss_curve.npy")
        }
    )
    fig, axes = plt.subplots(
        1, 3, figsize=(12, 3.2), constrained_layout=True
    )
    for ds in datasets:
        for f in sorted(glob.glob(f"{results}{args.name}_{ds}_s*_loss_curve.npy")):
            stem = f.removesuffix("_loss_curve.npy")
            curve = np.load(f)
            stamps = np.load(f"{stem}_loss_timestamps.npy")
            cg_err = np.load(f"{stem}_cg_errors.npy")
            cg_steps = np.load(f"{stem}_cg_numsteps_all.npy")
            axes[0].plot(stamps[: len(curve)], curve[: len(stamps)], label=ds)
            axes[1].semilogy(cg_err)
            axes[2].plot(cg_steps)
    axes[0].set_xlabel("wall time [s]")
    axes[0].set_ylabel("negative log-marginal-likelihood / N")
    axes[1].set_xlabel("epoch")
    axes[1].set_ylabel("CG residual (RMS)")
    axes[2].set_xlabel("epoch")
    axes[2].set_ylabel("CG iterations")
    if datasets:
        axes[0].legend(fontsize=7)
    fig.savefig(f"{figures}{args.name}_training.pdf")
    print("saved", f"{figures}{args.name}_training.pdf")
