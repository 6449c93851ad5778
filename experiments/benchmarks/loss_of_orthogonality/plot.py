"""Plot adjoint gradient error with/without re-projection vs matrix size.

Role of the figure the reference builds inline in
``loss_of_orthogonality/measure.py:40-66``: on ill-conditioned Hilbert
matrices, the Arnoldi adjoint *with* adjoint-vector re-projection stays
near the backprop gradient while the un-projected adjoint drifts as
orthogonality is lost.
"""

import argparse
import json
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

from lanczos_adjoints_tpu.utils import exp_util


def main(args):
    results = exp_util.matching_directory(__file__, "results/")
    results = results.replace("/plot/", "/measure/")
    with open(f"{results}orthogonality.json") as fp:
        rows = json.load(fp)

    ns = [r["n"] for r in rows]
    fig, ax = plt.subplots(figsize=(4.4, 3.2), constrained_layout=True)
    ax.semilogy(ns, [r["err_proj"] for r in rows], "o-", label="adjoint + re-projection")
    ax.semilogy(ns, [r["err_noproj"] for r in rows], "s--", label="adjoint, no re-projection")
    ax.set_xlabel("Hilbert matrix size n")
    ax.set_ylabel("gradient error vs backprop")
    ax.legend(fontsize=8)
    ax.grid(True, which="both", alpha=0.3)

    figures = exp_util.matching_directory(__file__, "figures/")
    os.makedirs(figures, exist_ok=True)
    out = f"{figures}loss_of_orthogonality.pdf"
    fig.savefig(out)
    print("saved", out)


if __name__ == "__main__":
    main(argparse.ArgumentParser().parse_args())
