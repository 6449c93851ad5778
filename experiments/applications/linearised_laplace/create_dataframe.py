"""Aggregate the linearised-Laplace artifacts into one table.

Parity with reference ``create_dataframe.py`` (create_dataframe.py:10-31):
collect the per-variant result files, build a pandas DataFrame, and
print a LaTeX table (plus a CSV next to the artifacts).  The reference
aggregates the ``results_{full,diagonal}_{Cholesky,Lanczos}.pkl`` grid;
this repo's variants are the calibration runs (full-GGN SLQ vs
diagonal-GGN, ``callibration*/s*_{alpha,curve}.npy``) and the
MAP-vs-Laplace predictive metrics
(``compute_metrics_lanczos/s*_metrics.json``).
"""

import glob
import json
import os
import re

import numpy as np
import pandas as pd

from lanczos_adjoints_tpu.utils import exp_util

directory_results = exp_util.matching_directory(__file__, "results/")
base = os.path.dirname(directory_results.rstrip("/"))

rows = {}

# Calibration runs: optimal prior precision + final calibration loss.
for ggn, subdir in [("full", "callibration"), ("diagonal", "callibration_diag")]:
    for alpha_path in sorted(glob.glob(f"{base}/{subdir}/s*_alpha.npy")):
        seed = re.search(r"s(\d+)_alpha", alpha_path).group(1)
        curve = np.load(alpha_path.replace("_alpha", "_curve"))
        rows[rf"SLQ calibration \& {ggn} (s{seed})"] = {
            "alpha": float(np.load(alpha_path)),
            "final loss": float(curve[-1]),
            "epochs": int(len(curve)),
        }

# Predictive metrics: MAP vs Lanczos-sampled Laplace.
for metrics_path in sorted(
    glob.glob(f"{base}/compute_metrics_lanczos/s*_metrics.json")
):
    seed = re.search(r"s(\d+)_metrics", metrics_path).group(1)
    with open(metrics_path) as fp:
        metrics = json.load(fp)
    for name, vals in metrics.items():
        rows[rf"{name} \& Lanczos (s{seed})"] = dict(vals)

if not rows:
    msg = f"no artifacts found under {base}"
    raise SystemExit(msg)

results_dataframe = pd.DataFrame(rows).T

num_keys = results_dataframe.shape[1]
column_format = f"l{'c' * num_keys}"
latex = results_dataframe.to_latex(
    column_format=column_format, float_format="%.3f", na_rep="--"
)
print()
print(latex)
print()

os.makedirs(directory_results, exist_ok=True)
results_dataframe.to_csv(f"{directory_results}dataframe.csv")
with open(f"{directory_results}table.tex", "w") as fp:
    fp.write(latex)
print(f"wrote {directory_results}dataframe.csv and table.tex")
