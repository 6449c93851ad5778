"""Spy plots of bundled SuiteSparse matrices.

Parity with reference ``experiments/playground/plot_spy_suite_sparse.py``
(plot_spy_suite_sparse.py:1-46).  The reference downloads via ssgetpy;
offline, the bundled collection under ``/root/reference/data/matrices``
is used (``suite_sparse_download`` raises a descriptive zero-egress
error by design).
"""

import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

from lanczos_adjoints_tpu.utils import exp_util

PATH = os.environ.get("MATRICES", "/root/reference/data/matrices/")

matrices = ["t2dal_e", "t3dl_e", "bloweybq"]
available = [m for m in matrices if os.path.isdir(os.path.join(PATH, m))]
if not available:
    raise SystemExit(f"none of {matrices} found under {PATH}")

fig, axes = plt.subplot_mosaic(
    [available], constrained_layout=True, figsize=(len(available) * 3, 3)
)
for matrix in available:
    mat = exp_util.suite_sparse_load(matrix, path=PATH)
    print(matrix, mat.shape, mat.nnz)
    exp_util.plt_spy_coo(axes[matrix], mat.rows, mat.indices, shape=mat.shape)
    axes[matrix].set_title(f"{matrix} (nnz={mat.nnz})", fontsize=9)

directory = exp_util.matching_directory(__file__, "figures/")
os.makedirs(directory, exist_ok=True)
fig.savefig(f"{directory}spy.png", dpi=150)
print(f"wrote {directory}spy.png")
