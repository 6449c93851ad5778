"""Aggregate GP-training npy results into a mean/std table per dataset.

Parity with the reference's show_table.py (show_table.py:29-63), plus
``--compare_reference``: first-class comparison columns built from the
reference's own stored V100 result curves (its Lanczos-adjoints runs
and its GPyTorch baseline), bundled under
``results/.../train/reference_baselines/`` -- see the README there for
provenance.
"""

import argparse
import glob
import os

import numpy as np

from lanczos_adjoints_tpu.utils import exp_util


def _stats(directory, prefix, ds, *, rmse_key, nll_key, wall_key):
    """(rmse mean/std, nll mean/std, wall mean) over seeds, or None."""
    rmses, nlls, walls = [], [], []
    for f in sorted(glob.glob(f"{directory}{prefix}_{ds}_s*_{rmse_key}.npy")):
        stem = f[: -len(f"_{rmse_key}.npy")]
        rmses.append(float(np.load(f)))
        if nll_key and os.path.exists(f"{stem}_{nll_key}.npy"):
            nlls.append(float(np.load(f"{stem}_{nll_key}.npy")))
        ts = np.load(f"{stem}_{wall_key}.npy")
        walls.append(float(ts[-1]) if len(ts) else 0.0)
    if not rmses:
        return None
    return {
        "rmse": (float(np.mean(rmses)), float(np.std(rmses))),
        "nll": (float(np.mean(nlls)), float(np.std(nlls))) if nlls else None,
        "wall": float(np.mean(walls)),
        "seeds": len(rmses),
    }


def _fmt(stats):
    if stats is None:
        return f"{'--':>16} | {'--':>16} | {'--':>10}"
    rmse = f"{stats['rmse'][0]:.3f} +/- {stats['rmse'][1]:.3f}"
    nll = (
        f"{stats['nll'][0]:.3f} +/- {stats['nll'][1]:.3f}"
        if stats["nll"]
        else "--"
    )
    return f"{rmse:>16} | {nll:>16} | {stats['wall']:>10.1f}"


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--name", type=str, required=True)
    parser.add_argument(
        "--compare_reference",
        action="store_true",
        help="add the reference's stored V100 adjoints + GPyTorch rows",
    )
    args = parser.parse_args()

    directory = exp_util.matching_directory(__file__, "results/")
    directory = directory.replace("/show_table/", "/optim_logml_adjoints_adaptive/")
    ref_dir = directory.replace(
        "/optim_logml_adjoints_adaptive/", "/reference_baselines/"
    )

    datasets = sorted(
        {
            os.path.basename(f).split("_s")[0].removeprefix(f"{args.name}_")
            for f in glob.glob(f"{directory}{args.name}_*_test_rmses.npy")
        }
    )
    header = f"{'dataset':>18} | {'method':>22} | {'RMSE':>16} | {'NLL':>16} | {'wall [s]':>10}"
    print(header)
    print("-" * len(header))
    for ds in datasets:
        ours = _stats(
            directory,
            args.name,
            ds,
            rmse_key="test_rmses",
            nll_key="test_nlls",
            wall_key="loss_timestamps",
        )
        print(f"{ds:>18} | {'ours (TPU v5e)':>22} | {_fmt(ours)}")
        if args.compare_reference and os.path.isdir(ref_dir):
            ref_adj = _stats(
                ref_dir,
                "adjoints75",
                ds,
                rmse_key="test_rmses",
                nll_key="test_nlls",
                wall_key="loss_timestamps",
            )
            ref_gpy = _stats(
                ref_dir,
                "gpytorch75",
                ds,
                rmse_key="rmse",
                nll_key=None,
                wall_key="loss_timestamps",
            )
            print(f"{'':>18} | {'ref adjoints (V100)':>22} | {_fmt(ref_adj)}")
            print(f"{'':>18} | {'ref GPyTorch (V100)':>22} | {_fmt(ref_gpy)}")
