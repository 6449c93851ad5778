"""Loss of orthogonality of adjoint gradients on Hilbert matrices.

TPU-native re-implementation of the reference measure.py
(loss_of_orthogonality/measure.py:40-66): gradient error of the
Arnoldi adjoint with vs without adjoint re-projection vs backprop, as
matrix conditioning degrades (Hilbert matrices of growing size).
"""

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from lanczos_adjoints_tpu import krylov
from lanczos_adjoints_tpu.utils import exp_util

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--sizes", type=int, nargs="+", default=[4, 8, 12, 16, 24])
    args = parser.parse_args()
    print(args)

    # Conditioning study needs f64; run on CPU (TPUs have no native f64).
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    results = []
    for n in args.sizes:
        A = exp_util.hilbert(n)
        v = jnp.arange(1.0, n + 1.0, dtype=A.dtype)
        k = n

        def matvec(s, p):
            return (p + p.T) @ s

        def grad_of(custom_vjp, reortho_vjp):
            f = krylov.hessenberg(
                matvec,
                k,
                reortho="full",
                custom_vjp=custom_vjp,
                reortho_vjp=reortho_vjp,
            )

            def loss(p):
                Q, H, _r, _c = f(v, p)
                return jnp.sum(H**2) + jnp.sum(Q**2)

            return jax.grad(loss)(A)

        g_backprop = grad_of(False, "match")
        g_proj = grad_of(True, "full")
        g_noproj = grad_of(True, "none")

        err_proj = float(
            jnp.linalg.norm(g_proj - g_backprop) / jnp.linalg.norm(g_backprop)
        )
        err_noproj = float(
            jnp.linalg.norm(g_noproj - g_backprop) / jnp.linalg.norm(g_backprop)
        )
        print(
            f"n={n}: adjoint-with-reprojection err {err_proj:.2e}, "
            f"without {err_noproj:.2e}"
        )
        results.append({"n": n, "err_proj": err_proj, "err_noproj": err_noproj})

    directory = exp_util.matching_directory(__file__, "results/")
    os.makedirs(directory, exist_ok=True)
    with open(f"{directory}orthogonality.json", "w") as fp:
        json.dump(results, fp, indent=2)
