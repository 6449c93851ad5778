"""Headline benchmark: Lanczos forward+adjoint VJP wall-clock at K=90.

Mirrors the reference's flagship benchmark
(``experiments/benchmarks/wall_times_vjp_through_lanczos_adjoints/
suite_sparse/benchmark.py:98-143``): wall-clock of one forward+custom-
adjoint VJP through a depth-90 Lanczos tridiagonalisation of a sparse
SPD operator.

Baseline: the reference measured 0.098 s (custom adjoint) on a V100 32GB
for ``bcsstk18`` (n=11,948, nnz~149k, K=90, reortho=none) --
BASELINE.md row 1.  That matrix is not redistributable here, so the
operator is a 5-point Laplacian on a 128x128 grid (n=16,384, nnz=81,408,
same K and algorithm); the comparison is cross-hardware and
cross-matrix but measures the identical algorithmic quantity (one
fwd+adjoint pass at K=90 over an HBM-resident sparse operator).

Prints exactly ONE JSON line on stdout; diagnostics go to stderr.
"""

import json
import sys
import time

import numpy as np

BASELINE_S = 0.098  # V100: custom-adjoint VJP, K=90, bcsstk18 (BASELINE.md)
K = 90


def _laplacian_2d(m):
    from lanczos_adjoints_tpu.ops import sparse

    n = m * m
    idx = np.arange(n)
    rows, cols, vals = [idx], [idx], [4.0 * np.ones(n)]
    i, j = idx // m, idx % m
    for di, dj in [(-1, 0), (1, 0), (0, -1), (0, 1)]:
        ni, nj = i + di, j + dj
        ok = (ni >= 0) & (ni < m) & (nj >= 0) & (nj < m)
        rows.append(idx[ok])
        cols.append((ni * m + nj)[ok])
        vals.append(-1.0 * np.ones(ok.sum()))
    return sparse.csr_from_coo(
        np.concatenate(rows), np.concatenate(cols), np.concatenate(vals), shape=(n, n)
    )


def main():
    import jax
    import jax.numpy as jnp

    from lanczos_adjoints_tpu import krylov
    from lanczos_adjoints_tpu.ops import sparse

    mat = _laplacian_2d(128)
    matvec, values, info = sparse.sparse_operator(mat, with_info=True)
    print(
        f"operator: n={mat.shape[0]} nnz={mat.nnz} format={info.format} "
        f"fill={info.fill_efficiency:.2f} backend={jax.default_backend()}",
        file=sys.stderr,
    )

    factorise = krylov.tridiag(matvec, K, reortho="none", custom_vjp=True)
    v0 = jnp.ones((mat.shape[0],), jnp.float32)

    def vjp_apply(v0, values):
        out, vjp = jax.vjp(factorise, v0, values)
        flat, unflatten = jax.flatten_util.ravel_pytree(out)
        return vjp(unflatten(jnp.ones_like(flat)))

    fn = jax.jit(vjp_apply)
    dv, dvals = fn(v0, values)
    jax.block_until_ready((dv, dvals))  # compile
    # Guard against silent elision: gradients must be finite and nonzero.
    assert bool(jnp.all(jnp.isfinite(dv))), "NaN/inf in dv"
    assert float(jnp.abs(dv).max()) > 0, "dv identically zero"
    assert float(jnp.abs(dvals).max()) > 0, "dvalues identically zero"

    times = []
    for _ in range(20):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(v0, values))
        times.append(time.perf_counter() - t0)
    t = float(np.median(times))

    print(
        f"fwd+adjoint K={K}: median {t * 1e3:.2f} ms "
        f"(min {min(times) * 1e3:.2f}, max {max(times) * 1e3:.2f})",
        file=sys.stderr,
    )
    # Secondary diagnostic (stderr only): the same pass on a 5.2M-nnz
    # operator (n=1M), the scale of BASELINE config 5.
    mat_big = _laplacian_2d(1024)
    matvec_b, values_b = sparse.sparse_operator(mat_big)
    factorise_b = krylov.tridiag(matvec_b, K, reortho="none", custom_vjp=True)

    def vjp_apply_b(v0, values):
        out, vjp = jax.vjp(factorise_b, v0, values)
        flat, unflatten = jax.flatten_util.ravel_pytree(out)
        return vjp(unflatten(jnp.ones_like(flat)))

    fn_b = jax.jit(vjp_apply_b)
    v0_b = jnp.ones((mat_big.shape[0],), jnp.float32)
    jax.block_until_ready(fn_b(v0_b, values_b))
    times_b = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(fn_b(v0_b, values_b))
        times_b.append(time.perf_counter() - t0)
    tb = float(np.median(times_b))
    print(
        f"fwd+adjoint K={K} n=1M nnz=5.2M: median {tb * 1e3:.2f} ms "
        f"({2 * K * mat_big.nnz / tb / 1e9:.1f} Gnnz/s effective)",
        file=sys.stderr,
    )

    result = {
        "metric": "lanczos_fwd_adjoint_vjp_k90_wallclock",
        "value": round(t * 1e3, 3),
        "unit": "ms",
        "vs_baseline": round(BASELINE_S / t, 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
