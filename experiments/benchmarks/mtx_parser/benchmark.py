"""Benchmark the native MatrixMarket parser against the Python fallback.

ROADMAP item: the ``.mtx`` loader (`utils/exp_util.py`, role of the
reference's ``suite_sparse_load``, exp_util.py:35-42) dispatches to a
C++ body parser (``native/mtxparse.cc``) when the extension is built,
with a pure-numpy fallback.  This driver generates a large synthetic
MatrixMarket file and times both paths end-to-end (file -> CSR), plus
scipy.io.mmread when available, to justify the native path on the
>100 MB matrices SuiteSparse serves.
"""

import argparse
import os
import tempfile
import time

import numpy as np

from lanczos_adjoints_tpu import native
from lanczos_adjoints_tpu.utils import exp_util


def synth_mtx(path, n, nnz_per_row, seed=0):
    rng = np.random.default_rng(seed)
    rows = np.repeat(np.arange(1, n + 1), nnz_per_row)
    cols = rng.integers(1, n + 1, len(rows))
    vals = rng.normal(size=len(rows))
    with open(path, "w") as fp:
        fp.write("%%MatrixMarket matrix coordinate real general\n")
        fp.write(f"{n} {n} {len(rows)}\n")
        np.savetxt(fp, np.column_stack([rows, cols, vals]), fmt="%d %d %.9g")
    return os.path.getsize(path)


def time_load(name, directory, repeats=3):
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        mat = exp_util.suite_sparse_load(name, path=directory)
        ts.append(time.perf_counter() - t0)
    return min(ts), mat.nnz


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=1_000_000)
    parser.add_argument("--nnz_per_row", type=int, default=8)
    args = parser.parse_args()

    with tempfile.TemporaryDirectory() as tmp:
        os.makedirs(f"{tmp}/synth")
        size = synth_mtx(f"{tmp}/synth/synth.mtx", args.n, args.nnz_per_row)
        print(f"synthetic mtx: {size / 1e6:.0f} MB, {args.n * args.nnz_per_row} nnz")

        t_scipy, _ = time_load("synth", tmp + "/")
        print(
            f"scipy fast path:   {t_scipy:.2f} s ({size / t_scipy / 1e6:.0f} MB/s)"
        )

        # Force the builtin paths for comparison.
        scipy_path, exp_util._mmread_scipy = exp_util._mmread_scipy, lambda p: None
        assert native.get_mtxparse() is not None, "native parser not built"
        t_native, _ = time_load("synth", tmp + "/", repeats=1)
        print(f"native C++ parser: {t_native:.2f} s ({size / t_native / 1e6:.0f} MB/s)")

        native.DISABLE = True  # force the numpy fallback
        t_numpy, _ = time_load("synth", tmp + "/", repeats=1)
        native.DISABLE = False
        exp_util._mmread_scipy = scipy_path
        print(f"numpy fallback:    {t_numpy:.2f} s ({size / t_numpy / 1e6:.0f} MB/s)")
