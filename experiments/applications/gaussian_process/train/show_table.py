"""Aggregate GP-training npy results into a mean/std table per dataset.

Parity with the reference's show_table.py (show_table.py:29-63).
"""

import argparse
import glob
import os

import numpy as np

from lanczos_adjoints_tpu.utils import exp_util

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--name", type=str, required=True)
    args = parser.parse_args()

    directory = exp_util.matching_directory(__file__, "results/")
    directory = directory.replace("/show_table/", "/optim_logml_adjoints_adaptive/")

    datasets = sorted(
        {
            os.path.basename(f).split("_s")[0].removeprefix(f"{args.name}_")
            for f in glob.glob(f"{directory}{args.name}_*_test_rmses.npy")
        }
    )
    print(f"{'dataset':>18} | {'RMSE':>16} | {'NLL':>16} | {'wall [s]':>10}")
    print("-" * 70)
    for ds in datasets:
        rmses, nlls, walls = [], [], []
        for f in sorted(glob.glob(f"{directory}{args.name}_{ds}_s*_test_rmses.npy")):
            stem = f.removesuffix("_test_rmses.npy")
            rmses.append(float(np.load(f)))
            nlls.append(float(np.load(f"{stem}_test_nlls.npy")))
            ts = np.load(f"{stem}_loss_timestamps.npy")
            walls.append(float(ts[-1]) if len(ts) else 0.0)
        rmses, nlls = np.asarray(rmses), np.asarray(nlls)
        print(
            f"{ds:>18} | {rmses.mean():.3f} +/- {rmses.std():.3f} | "
            f"{nlls.mean():.3f} +/- {nlls.std():.3f} | {np.mean(walls):>10.1f}"
        )
