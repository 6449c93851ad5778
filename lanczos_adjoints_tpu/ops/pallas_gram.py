"""Fused streaming Gram matvec: a Pallas TPU kernel (KeOps equivalent).

Computes ``out = K(x, y) @ v`` for distance-based kernels without ever
materialising the N x N Gram matrix: the kernel streams row blocks of
``x`` over the grid, holds ``y``/``v`` resident in VMEM, and for each
(row-block, column-tile) pair evaluates

    D   = |x_r|^2 + |y_c|^2 - 2 x_r . y_c      (dot_general)
    K   = f(D / lengthscale^2)                  (VPU)
    acc += K . v_c                              (dot_general)

This is the role PyKeOps plays for the reference's GPU baselines
(reference ``gram_matvec_versus_keops/matvec/benchmark.py:36-42``);
here it is a first-class TPU kernel with a custom VJP whose backward
pass is two more streaming passes (no N^2 residuals):

- d/dv     = K^T u                               (same kernel, x/y swapped)
- d/dtheta = sum_ij u_i (df/dtheta)(D_ij) v_j    (streamed reduction)

Row blocks are laid out as native (8, 128) register tiles (Mosaic
cannot relayout 1-D <-> 2-D vectors), so every intermediate keeps the
(sublane, lane) structure and the kernel compiles without reshapes.

Supported kernel families (GPyTorch-parametrised, matching
``lanczos_adjoints_tpu.models.gp``): ``rbf``, ``matern12``, ``matern32``.

Performance status (v5e, N=65536, d=1): this kernel sustains ~120
Gcells/s while XLA's fused vmap policy reaches ~330 (vmapped) to ~540
(partitioned) Gcells/s -- the transcendental (exp) evaluation is the
bound and XLA's fusion already saturates the VPU, so the XLA policies
in ``ops.gram`` remain the default *speed* path.  This kernel's
advantage is memory: the custom VJP re-streams tiles instead of saving
f32 N^2 residuals for backward, making gradient evaluation O(N) memory
at any N.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_BLOCK = 1024  # rows per grid step; laid out as (8, 128) tiles
COL_BLOCK = 256  # resident y/v tile length (VMEM budget for (8,128,C) tiles)


def _pad_to(x, size, axis=0):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _kernel_and_grads(kind: str, sq, ell, outputscale, *, want_grads: bool):
    """k(sq) and optionally (dk/d ell, dk/d outputscale); sq pre-scaled."""
    sq = jnp.maximum(sq, 0.0)
    eps = jnp.finfo(jnp.float32).eps
    if kind == "rbf":
        k = outputscale * jnp.exp(-sq / 2)
        if not want_grads:
            return k, None, None
        return k, k * sq / ell, k / outputscale
    if kind == "matern12":
        dist = jnp.sqrt(sq + eps)
        e = jnp.exp(-dist)
        k = outputscale * e
        if not want_grads:
            return k, None, None
        return k, k * dist / ell, e
    if kind == "matern32":
        dist = jnp.sqrt(3.0 * sq + eps)
        e = jnp.exp(-dist)
        k = outputscale * (1.0 + dist) * e
        if not want_grads:
            return k, None, None
        return k, outputscale * dist * dist * e / ell, (1.0 + dist) * e
    msg = f"kind={kind!r} not supported"
    raise ValueError(msg)


def _tile_sq(x_scaled, x_sq, y, inv_ell):
    """Scaled squared distances of an (8, 128, d) row tile vs (C, d) tile."""
    y_scaled = y * inv_ell
    y_sq = jnp.sum(y_scaled * y_scaled, axis=1)  # (C,)
    cross = jax.lax.dot_general(
        x_scaled,
        y_scaled,
        dimension_numbers=(((2,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )  # (8, 128, C)
    return x_sq[:, :, None] + y_sq[None, None, :] - 2.0 * cross


def _gram_matvec_kernel(kind, x_ref, y_ref, v_ref, par_ref, out_ref):
    inv_ell = 1.0 / par_ref[0]
    outputscale = par_ref[1]
    x = x_ref[0] * inv_ell  # (8, 128, d), pre-scaled
    x_sq = jnp.sum(x * x, axis=2)  # (8, 128)

    def tile_step(c, acc):
        sq = _tile_sq(x, x_sq, y_ref[c], inv_ell)
        k, _, _ = _kernel_and_grads(
            kind, sq, par_ref[0], outputscale, want_grads=False
        )
        contribution = jax.lax.dot_general(
            k,
            v_ref[c],
            dimension_numbers=(((2,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )  # (8, 128)
        return acc + contribution

    acc = jax.lax.fori_loop(
        0, y_ref.shape[0], tile_step, jnp.zeros((8, ROW_BLOCK // 8), jnp.float32)
    )
    out_ref[0] = acc


def _gram_reduce_kernel(kind, x_ref, y_ref, v_ref, u_ref, par_ref, out_ref):
    inv_ell = 1.0 / par_ref[0]
    outputscale = par_ref[1]
    x = x_ref[0] * inv_ell
    u = u_ref[0]  # (8, 128)
    x_sq = jnp.sum(x * x, axis=2)

    def tile_step(c, carry):
        d_ell, d_out = carry
        sq = _tile_sq(x, x_sq, y_ref[c], inv_ell)
        _, dk_dell, dk_dout = _kernel_and_grads(
            kind, sq, par_ref[0], outputscale, want_grads=True
        )
        v = v_ref[c]
        w_ell = jax.lax.dot_general(
            dk_dell,
            v,
            dimension_numbers=(((2,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        w_out = jax.lax.dot_general(
            dk_dout,
            v,
            dimension_numbers=(((2,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        return d_ell + jnp.sum(u * w_ell), d_out + jnp.sum(u * w_out)

    d_ell, d_out = jax.lax.fori_loop(0, y_ref.shape[0], tile_step, (0.0, 0.0))
    rows = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    first = rows == 0
    block = jnp.where(first & (cols == 0), d_ell, 0.0)
    block = block + jnp.where(first & (cols == 1), d_out, 0.0)
    out_ref[0] = block


def _prep(x, y, v):
    n_rows, d = x.shape
    n_cols = y.shape[0]
    n_rows_pad = -(-n_rows // ROW_BLOCK) * ROW_BLOCK
    n_cols_pad = -(-n_cols // COL_BLOCK) * COL_BLOCK
    x_p = _pad_to(x, n_rows_pad).reshape(
        n_rows_pad // ROW_BLOCK, 8, ROW_BLOCK // 8, d
    )
    y_p = _pad_to(y, n_cols_pad).reshape(n_cols_pad // COL_BLOCK, COL_BLOCK, d)
    v_p = _pad_to(v, n_cols_pad).reshape(n_cols_pad // COL_BLOCK, COL_BLOCK)
    return x_p, y_p, v_p, n_rows, n_rows_pad, d


def _matvec_impl(kind, x, y, v, ell, outputscale):
    x_p, y_p, v_p, n_rows, n_rows_pad, d = _prep(x, y, v)
    params = jnp.stack([ell, outputscale])
    nb = n_rows_pad // ROW_BLOCK

    out = pl.pallas_call(
        functools.partial(_gram_matvec_kernel, kind),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(
                (1, 8, ROW_BLOCK // 8, d),
                lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 8, ROW_BLOCK // 8), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((nb, 8, ROW_BLOCK // 8), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(x_p, y_p, v_p, params)
    return out.reshape(-1)[:n_rows]


def _param_grads(kind, x, y, v, u, ell, outputscale):
    x_p, y_p, v_p, _n_rows, n_rows_pad, d = _prep(x, y, v)
    u_p = _pad_to(u, n_rows_pad).reshape(n_rows_pad // ROW_BLOCK, 8, ROW_BLOCK // 8)
    params = jnp.stack([ell, outputscale])
    nb = n_rows_pad // ROW_BLOCK

    partials = pl.pallas_call(
        functools.partial(_gram_reduce_kernel, kind),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(
                (1, 8, ROW_BLOCK // 8, d),
                lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 8, ROW_BLOCK // 8), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((nb, 8, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(x_p, y_p, v_p, u_p, params)
    total = jnp.sum(partials, axis=0)
    return total[0, 0], total[0, 1]


def gram_matvec_fused(kind: str):
    """Return ``matvec(x, y, v, lengthscale, outputscale) -> K(x,y) @ v``.

    Differentiable w.r.t. ``v``, ``lengthscale`` and ``outputscale``
    (not the data); the backward pass streams the tiles again instead
    of storing them.  ``lengthscale`` is a scalar (isotropic kernels);
    the ARD kernels in ``models.gp`` use the XLA policies.
    """

    @jax.custom_vjp
    def matvec(x, y, v, lengthscale, outputscale):
        return _matvec_impl(kind, x, y, v, lengthscale, outputscale)

    def matvec_fwd(x, y, v, lengthscale, outputscale):
        out = _matvec_impl(kind, x, y, v, lengthscale, outputscale)
        return out, (x, y, v, lengthscale, outputscale)

    def matvec_bwd(cache, u):
        x, y, v, ell, outputscale = cache
        dv = _matvec_impl(kind, y, x, u, ell, outputscale)  # K^T u
        d_ell, d_out = _param_grads(kind, x, y, v, u, ell, outputscale)
        return None, None, dv, d_ell, d_out

    matvec.defvjp(matvec_fwd, matvec_bwd)
    return matvec
