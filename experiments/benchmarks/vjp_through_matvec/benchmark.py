"""Hand-written custom VJP for the Gram matvec vs autodiff.

TPU-native re-implementation of the reference benchmark
(``vjp_through_matvec/benchmark.py:51-66``): compares wall-time and
memory behaviour of (a) autodiff through the Gram matvec, (b) a
hand-written custom VJP that recomputes the two kernel matvecs in the
backward pass instead of storing the N x N intermediate.
"""

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from lanczos_adjoints_tpu.models import gp
from lanczos_adjoints_tpu.utils import exp_util


def gram_matvec_custom_vjp(kernel_factory):
    """Gram matvec with a recompute-in-backward custom VJP.

    For K = K(x, x; theta) symmetric: d/dv [u^T K v] = K u, and
    d/dtheta is one VJP of the double-contraction u^T K(theta) v --
    both recomputed from scratch in the backward pass (O(N) memory).
    """

    def matvec(x, v, params):
        kernel = kernel_factory(**params)
        return gp.gram_matvec()(kernel)(x, x, v)

    @jax.custom_vjp
    def mv(x, v, params):
        return matvec(x, v, params)

    def mv_fwd(x, v, params):
        return matvec(x, v, params), (x, v, params)

    def mv_bwd(cache, cotangent):
        x, v, params = cache
        dv = matvec(x, cotangent, params)  # symmetry: K^T u = K u

        def quadform(params, x):
            return jnp.dot(cotangent, matvec(x, v, params))

        dparams, dx = jax.grad(quadform, argnums=(0, 1))(params, x)
        return dx, dv, dparams

    mv.defvjp(mv_fwd, mv_bwd)
    return mv


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--num_data", type=int, default=16384)
    parser.add_argument("--data_dim", type=int, default=2)
    args = parser.parse_args()
    print(args)

    key = jax.random.PRNGKey(0)
    n = args.num_data
    x = jax.random.normal(key, (n, args.data_dim), dtype=jnp.float32)
    v = jax.random.normal(key, (n,), dtype=jnp.float32)
    params = {
        "raw_lengthscale": jnp.zeros((args.data_dim,)),
        "raw_outputscale": jnp.zeros(()),
    }

    kernel_factory, _ = gp.kernel_scaled_rbf(
        shape_in=(args.data_dim,), shape_out=()
    )

    def loss_autodiff(params):
        kernel = kernel_factory(**params)
        out = gp.gram_matvec()(kernel)(x, x, v)
        return jnp.sum(out**2)

    mv_custom = gram_matvec_custom_vjp(kernel_factory)

    def loss_custom(params):
        return jnp.sum(mv_custom(x, v, params) ** 2)

    results = []
    for name, loss in [("autodiff", loss_autodiff), ("custom_vjp", loss_custom)]:
        g = jax.jit(jax.grad(loss))
        out = g(params)
        jax.block_until_ready(out)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = g(params)
            _ = float(out["raw_outputscale"])
            ts.append(time.perf_counter() - t0)
        t = float(np.median(ts))
        print(f"{name}: {t * 1e3:.1f} ms per gradient")
        results.append({"variant": name, "time_s": t, "n": n})

    # Gradients must agree.
    g1 = jax.jit(jax.grad(loss_autodiff))(params)
    g2 = jax.jit(jax.grad(loss_custom))(params)
    f1 = jax.flatten_util.ravel_pytree(g1)[0]
    f2 = jax.flatten_util.ravel_pytree(g2)[0]
    rel = float(jnp.linalg.norm(f1 - f2) / jnp.linalg.norm(f1))
    print(f"gradient agreement: rel-err {rel:.2e}")
    assert rel < 1e-3

    directory = exp_util.matching_directory(__file__, "results/")
    os.makedirs(directory, exist_ok=True)
    with open(f"{directory}vjp_times.json", "w") as fp:
        json.dump(results, fp, indent=2)
