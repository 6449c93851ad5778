"""Kernel Gram-matrix matvecs with tiered execution policies.

Parity with reference ``gp_util.py:434-549``: three execution strategies
for the O(N^2) Gram matvec, selected per problem size:

- ``gram_matvec()``           : fully vectorised; the whole N x N kernel
                                matrix is formed implicitly by XLA fusion
                                (with vector data the pairwise terms lower
                                to MXU matmuls).  Use when N^2 intermediate
                                fits in HBM.
- ``gram_matvec_partitioned`` : row-block streaming through ``lax.map``
                                with optional rematerialisation -- O(N^2/P)
                                peak memory.
- ``gram_matvec_sequential``  : row-at-a-time streaming (gigantic N).

All three share the calling convention of the reference:
``matvec(fun)(i, j, v)`` where ``fun`` is a scalar kernel ``k(x, y)`` and
``i, j`` are the row/column data arrays (or index arrays for lazy
kernels).  A fused Pallas streaming kernel for distance-based kernels
lives in ``lanczos_adjoints_tpu.ops.pallas_gram``.
"""

from typing import Callable

import jax
import jax.numpy as jnp

from lanczos_adjoints_tpu.utils.precision import highest_precision


def gram_matrix(fun: Callable, /) -> Callable:
    """Materialise the Gram matrix of a scalar kernel."""
    row = jax.vmap(fun, in_axes=(None, 0), out_axes=-1)
    return highest_precision(jax.vmap(row, in_axes=(0, None), out_axes=-2))


def gram_matvec():
    """Fully-vectorised Gram matvec (whole batch at once)."""

    def matvec(fun: Callable) -> Callable:
        def matvec_y(i, j, v):
            fun_batched = jax.vmap(fun, in_axes=(None, 0), out_axes=-1)
            return fun_batched(i, j) @ v

        # The vmapped row-dot lowers to an MXU matvec and the kernel's
        # pairwise-distance dots to MXU matmuls; pin f32 (TPU default is
        # bf16, which makes tight CG tolerances unreachable).
        return highest_precision(jax.vmap(matvec_y, in_axes=(0, None, None), out_axes=0))

    return matvec


def gram_matvec_pallas(
    *, contract_precision: str = "highest", data_grads: bool = False
):
    """Fused streaming Pallas Gram matvec policy (O(N) memory, fastest).

    Same policy shape as ``gram_matvec()`` but requires a kernel closure
    built by the ``models.gp.kernel_scaled_*`` factories (they tag the
    closure with a ``fused_spec``); raises for untagged kernels.  Runs
    the tiled streaming kernel of ``ops.pallas_gram`` -- measured 4.38 ms
    at N=65,536 d=1 RBF vs 23.7 ms for the vmapped policy (RESULTS.md).
    Kernel evaluations use an exp2-based fast path (~4e-5 relative);
    gradients re-stream tiles instead of storing N^2 residuals.
    ``data_grads=True`` additionally computes true input cotangents
    (deep-kernel / inducing-point training); the default returns
    symbolic zeros for them -- see ``pallas_gram.gram_matvec_fused``.
    """

    def matvec(fun: Callable) -> Callable:
        spec = getattr(fun, "fused_spec", None)
        if spec is None:
            msg = (
                "kernel closure is not tagged for the fused Pallas path "
                "(build it with models.gp.kernel_scaled_*); use gram_matvec()"
            )
            raise ValueError(msg)
        kind, raw_ell, raw_out, constrain = spec
        from lanczos_adjoints_tpu.ops import pallas_gram

        fused = pallas_gram.gram_matvec_fused(
            kind, contract_precision=contract_precision, data_grads=data_grads
        )
        indexed = getattr(fun, "fused_data", None)

        def matvec_y(i, j, v):
            if indexed is None:
                x, y = i, j  # feature rows directly
                return fused(x, y, v, constrain(raw_ell), constrain(raw_out))
            # Index-based lazy wrapper (models.gp._CovarianceOp.elem):
            # resolve indices to rows; the noise term is diagonal, so on
            # the square same-index matvec it contributes ``noise * v``.
            inputs, noise = indexed
            out = fused(
                inputs[i], inputs[j], v, constrain(raw_ell), constrain(raw_out)
            )
            if isinstance(noise, (int, float)) and noise == 0.0:
                return out
            # On the square same-index matvec i covers all of v; under a
            # row-sharded mesh (parallel.sharded_gram_policy) i is a
            # local block of global indices -- gather the matching rows.
            if jnp.shape(i)[0] == jnp.shape(v)[0]:
                return out + noise * v
            return out + noise * jnp.take(v, i, axis=0)

        return matvec_y

    return matvec


def gram_matvec_partitioned(num: int, *, checkpoint: bool):
    """Gram matvec streamed over ``num`` row blocks.

    Peak memory O(N^2 / num); ``checkpoint`` rematerialises each block in
    the backward pass.  Raises if ``num`` does not divide the number of
    rows.
    """

    def matvec(fun: Callable) -> Callable:
        dense = gram_matvec()(fun)

        def matvec_map(i, j, v):
            ndata, *feature_shape = jnp.shape(i)
            if ndata % num != 0:
                msg = f"num = {num} does not divide dataset size {ndata}."
                raise ValueError(msg)

            def block(i_block):
                return dense(i_block, j, v)

            if checkpoint:
                block = jax.checkpoint(block)

            blocks = jnp.reshape(i, (num, ndata // num, *feature_shape))
            mapped = jax.lax.map(block, blocks)
            # Preserve trailing RHS axes: v may be an (N, m) probe block
            # (blocked SLQ); mapped is (num, ndata // num, *rhs).
            return jnp.reshape(mapped, (ndata, *jnp.shape(mapped)[2:]))

        return matvec_map

    return matvec


def gram_matvec_sequential(*, checkpoint: bool):
    """Row-at-a-time Gram matvec (minimum memory, maximum latency)."""

    def matvec(fun: Callable) -> Callable:
        def matvec_map(i, j, v):
            def row(x_single):
                return gram_matrix(fun)(x_single[None, ...], j) @ v

            if checkpoint:
                row = jax.checkpoint(row)

            mapped = jax.lax.map(row, i)
            # mapped is (N, 1, *rhs): one row block per data point.
            return jnp.reshape(mapped, (jnp.shape(i)[0], *jnp.shape(mapped)[2:]))

        return highest_precision(matvec_map)

    return matvec
