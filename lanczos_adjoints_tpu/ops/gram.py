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
            return jnp.reshape(mapped, (-1,))

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
            return jnp.reshape(mapped, (-1,))

        return highest_precision(matvec_map)

    return matvec
