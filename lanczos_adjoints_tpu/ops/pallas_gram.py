"""Fused streaming Gram matvec: a Pallas TPU kernel (KeOps equivalent).

Computes ``out = K(x, y) @ v`` for distance-based kernels without ever
materialising the N x N Gram matrix.  This is the role PyKeOps plays
for the reference's GPU baselines (reference
``gram_matvec_versus_keops/matvec/benchmark.py:36-42``); here it is a
first-class TPU kernel with a custom VJP whose backward pass is two
more streaming passes (no N^2 residuals).

Design (v3; v1 lost to XLA's fused vmap policy, v2's MXU-folded
distance was MXU-*pass*-bound -- a K = d+2 contraction still costs a
full systolic pass per 128x128 output tile, ~0.008 cycles/cell ~ 120
Gcells/s regardless of d):

- For d <= 8 (every bundled UCI benchmark dimension that matters for
  the KeOps comparison) the scaled squared distance is built on the
  VPU from rank-broadcast differences, ``sum_d (x_d - y_d)^2``, with
  the kernel-specific distance scale pre-folded into the scaled data.
  ~2d + 5 VPU ops per cell, no MXU involvement, and exact
  (cancellation-free) distances.  For d > 8 the distance folds into
  one MXU matmul via feature augmentation
  ``[x, |x|^2, 1] . [-2y, 1, |y|^2]`` whose pass cost amortises over
  the d contraction.
- ``outputscale`` multiplies the *output vector* (O(N)), not the N^2
  kernel values.
- Column tiles stream through a second grid dimension (the output
  block revisits across it), so ``y``/``v`` never need to be fully
  VMEM-resident: any N works.
- Multi-vector right-hand sides ``v: (N, m)`` contract on the MXU --
  each pairwise cell then serves ``m`` MACs, so SLQ probe batches ride
  one kernel-evaluation pass (this framework's GP training batches all
  SLQ probes through one Gram pass).  ``contract_precision="default"``
  runs that contraction in bf16 with f32 accumulation (fine for
  stochastic trace probes); the default is exact f32.
- Lengthscales may be scalar or per-dimension (ARD), matching the
  ``models.gp`` kernel parametrisation.

Supported kernel families (GPyTorch-parametrised, matching
``lanczos_adjoints_tpu.models.gp``): ``rbf``, ``matern12``, ``matern32``.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Per-family (row, column) tile footprint per grid step, tuned on v5e
# (N=65536, d=1 sweep): RBF peaks at (2048, 2048) -- 1011 Gcells/s --
# while the Materns' longer per-cell op chain prefers narrower column
# tiles.  Rows are laid out as (8, ROW_BLOCK/8) register tiles.
_BLOCKS = {"rbf": (2048, 2048), "matern12": (2048, 1024), "matern32": (2048, 1024)}
VPU_DMAX = 8  # data dims up to this use the broadcast-difference path

_EPS = float(jnp.finfo(jnp.float32).eps)
_LOG2E = 1.4426950408889634  # log2(e)

# p = scale * sq with sq = |x-y|^2/ell^2; the scale pre-folds the
# kernel's distance factor (RBF's 1/2, Matern-3/2's 3) into the scaled
# data -- and for RBF additionally log2(e), so the kernel value is one
# hardware exp2 with no argument scaling.
_ALPHA = {"rbf": 0.5, "matern12": 1.0, "matern32": 3.0}
_PSCALE = {"rbf": 0.5 * _LOG2E, "matern12": 1.0, "matern32": 3.0}

_PRECISIONS = {
    "highest": jax.lax.Precision.HIGHEST,
    "default": jax.lax.Precision.DEFAULT,
}


def _kernel_value(kind, p, *, clamp=False):
    """g(p) with k = outputscale * g.

    The VPU path hands RBF ``p = -pscale * sq`` (the distance
    accumulates *negated* so exp2 applies with no extra negation) and
    the Materns ``p = +pscale * sq``.  ``clamp`` guards the MXU path,
    whose expanded-form dot can round slightly negative (and which
    always produces +p; RBF negates here).

    Distances use the exp2/log2 hardware pair: sqrt costs ~8 VPU ops on
    v5e while exp2/log2 are ~1, so dist = exp2(log2(p)/2) is ~3x
    cheaper at ~4e-5 relative error (measured) -- far below the f32
    Gram-matvec noise floor of the expanded-distance XLA policies.
    """
    if kind == "rbf":
        if clamp:
            return jnp.exp2(jnp.minimum(-p, 0.0))
        return jnp.exp2(p)  # p <= 0; log2(e) pre-folded into the scaling
    if clamp:
        p = jnp.maximum(p, 0.0)
    dist = jnp.exp2(0.5 * jnp.log2(p + _EPS))
    e = jnp.exp2(-_LOG2E * dist)
    if kind == "matern12":
        return e
    return (1.0 + dist) * e  # matern32


def _kernel_value_dsq(kind, p, *, clamp=False):
    """(g, dg/d sq) -- derivative w.r.t. the *unscaled* sq.

    Sign conventions as in ``_kernel_value``; 1/dist for matern12 comes
    free as exp2 of the negated half-log.
    """
    if kind == "rbf":
        if clamp:
            g = jnp.exp2(jnp.minimum(-p, 0.0))
        else:
            g = jnp.exp2(p)  # p <= 0 on the VPU path
        return g, -0.5 * g
    if clamp:
        p = jnp.maximum(p, 0.0)
    half_log = 0.5 * jnp.log2(p + _EPS)
    dist = jnp.exp2(half_log)
    e = jnp.exp2(-_LOG2E * dist)
    if kind == "matern12":
        # d/dsq exp(-sqrt(sq + eps)) = -e / (2 dist)
        return e, -0.5 * e * jnp.exp2(-half_log)
    # matern32: dist = sqrt(3 sq + eps); d/dsq (1 + dist) e^-dist = -1.5 e
    return (1.0 + dist) * e, -1.5 * e


def _pad_to(x, size, axis=0):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


# ---------------------------------------------------------------------------
# Tile distance: VPU broadcast path (small d) / MXU augmented path (large d)
# ---------------------------------------------------------------------------


def _tile_p_vpu(x_tile, yt_tile, *, negate=False):
    """(+/-) sum_d (x_d - y_d)^2 from pre-scaled tiles, pure VPU.

    x_tile: (8, 128, d); yt_tile: (d, C) transposed columns.
    ``negate`` accumulates the negated sum (fused negate-multiply-add),
    handing RBF its exp2 argument with no separate negation pass.
    """
    d = x_tile.shape[-1]
    acc = None
    for dd in range(d):
        diff = x_tile[:, :, dd][..., None] - yt_tile[dd : dd + 1]  # (8,128,C)
        term = -(diff * diff) if negate and acc is None else diff * diff
        if acc is None:
            acc = term
        elif negate:
            acc = acc - term
        else:
            acc = acc + term
    return acc


def _augment_rows(x_scaled):
    """[x, |x|^2, 1] of shape (n, d + 2) from pre-scaled data."""
    sq = jnp.sum(x_scaled * x_scaled, axis=-1, keepdims=True)
    ones = jnp.ones_like(sq)
    return jnp.concatenate([x_scaled, sq, ones], axis=-1)


def _augment_cols(y_scaled):
    """[-2y, 1, |y|^2] of shape (n, d + 2) from pre-scaled data."""
    sq = jnp.sum(y_scaled * y_scaled, axis=-1, keepdims=True)
    ones = jnp.ones_like(sq)
    return jnp.concatenate([-2.0 * y_scaled, ones, sq], axis=-1)


def _tile_p_mxu(x_aug_tile, y_aug_tile):
    """(8, 128, daug) . (C, daug) -> (8, 128, C) = alpha * sq."""
    return jax.lax.dot_general(
        x_aug_tile,
        y_aug_tile,
        dimension_numbers=(((2,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------


def _matvec_kernel(kind, via_mxu, precision, x_ref, y_ref, v_ref, out_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    if via_mxu:
        p = _tile_p_mxu(x_ref[0], y_ref[0])
    else:
        p = _tile_p_vpu(x_ref[0], y_ref[0], negate=kind == "rbf")
    k = _kernel_value(kind, p, clamp=via_mxu)
    if out_ref.ndim == 3:  # single right-hand side, v tile (1, C)
        # VPU multiply + lane reduction; an MXU matvec starves the
        # systolic array at one output column.
        out_ref[0] += jnp.sum(k * v_ref[0], axis=-1)
    else:
        out_ref[0] += jax.lax.dot_general(
            k,
            v_ref[0],
            dimension_numbers=(((2,), (0,)), ((), ())),
            precision=precision,
            preferred_element_type=jnp.float32,
        )


def _grads_kernel_vpu(kind, m_is_one, precision, x_ref, y_ref, v_ref, u_ref,
                      out_ref):
    """Parameter-gradient pass, broadcast-difference distances.

    Output block (8, 1 + d): column 0 carries d_out / 8 per sublane,
    columns 1..d the per-dimension sums of w_ij * (x - y)_scaled,d^2
    (the caller unscales and finishes the block/sublane reduction).
    """
    j = pl.program_id(1)
    d = x_ref.shape[-1]

    @pl.when(j == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    p = _tile_p_vpu(x_ref[0], y_ref[0], negate=kind == "rbf")
    g, dg = _kernel_value_dsq(kind, p)
    if m_is_one:
        uv = u_ref[0] * v_ref[0]  # (8,128,1) x (1,C) broadcast
    else:
        uv = jax.lax.dot_general(
            u_ref[0],
            v_ref[0],
            dimension_numbers=(((2,), (1,)), ((), ())),
            precision=precision,
            preferred_element_type=jnp.float32,
        )  # (8, 128, C)
    d_out = jnp.sum(uv * g)
    w = uv * dg
    cols = [jnp.full((8, 1), d_out / 8.0, jnp.float32)]
    for dd in range(d):
        diff = x_ref[0][:, :, dd][..., None] - y_ref[0][dd : dd + 1]
        t = jnp.sum(w * diff * diff, axis=2)  # (8, 128)
        cols.append(jnp.sum(t, axis=1, keepdims=True))  # (8, 1)
    out_ref[0] += jnp.concatenate(cols, axis=1)


def _grads_kernel_mxu(kind, m_is_one, precision, x_ref, xs_ref, y_ref, ys_ref,
                      v_ref, u_ref, out_ref):
    """Parameter-gradient pass, MXU distances + MXU sufficient stats.

    stats = w . [1, y_s, y_s^2]; per-dim sums assemble as
    x_s^2 stats_0 + stats_(1+d..) - 2 x_s stats_(1..).
    """
    j = pl.program_id(1)
    d = xs_ref.shape[-1]

    @pl.when(j == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    p = _tile_p_mxu(x_ref[0], y_ref[0])
    g, dg = _kernel_value_dsq(kind, p, clamp=True)
    if m_is_one:
        uv = u_ref[0] * v_ref[0]
    else:
        uv = jax.lax.dot_general(
            u_ref[0],
            v_ref[0],
            dimension_numbers=(((2,), (1,)), ((), ())),
            precision=precision,
            preferred_element_type=jnp.float32,
        )
    d_out = jnp.sum(uv * g)
    w = uv * dg
    stats = jax.lax.dot_general(
        w,
        ys_ref[0],  # (C, 1 + 2d): [1, y_s, y_s^2]
        dimension_numbers=(((2,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )  # (8, 128, 1 + 2d)
    xs = xs_ref[0]  # (8, 128, d)
    per_dim = (
        xs * xs * stats[..., :1]
        + stats[..., 1 + d :]
        - 2.0 * xs * stats[..., 1 : 1 + d]
    )  # (8, 128, d)
    red = jnp.sum(per_dim, axis=1)  # (8, d)
    dout_col = jnp.full((8, 1), d_out / 8.0, jnp.float32)
    out_ref[0] += jnp.concatenate([dout_col, red], axis=1)


def _dgrads_kernel_vpu(kind, m_is_one, precision, x_ref, y_ref, v_ref, u_ref,
                       out_ref):
    """Data-gradient pass, broadcast-difference distances.

    Output block (8, rb//8, 1 + d) indexed by the row tile: channel 0 is
    the row-sum ``S_i = sum_j w_ij`` and channels 1..d are
    ``T_id = sum_j w_ij * ys_jd`` (scaled-y moments), with
    ``w_ij = (sum_m u_im v_jm) * dg/dsq``.  The caller assembles
    ``dx_id = outputscale * (2/ell_d^2) * (x_id S_i - T_id / scale_d)``.
    """
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    p = _tile_p_vpu(x_ref[0], y_ref[0], negate=kind == "rbf")
    _, dg = _kernel_value_dsq(kind, p)
    if m_is_one:
        uv = u_ref[0] * v_ref[0]
    else:
        uv = jax.lax.dot_general(
            u_ref[0],
            v_ref[0],
            dimension_numbers=(((2,), (1,)), ((), ())),
            precision=precision,
            preferred_element_type=jnp.float32,
        )
    w = uv * dg  # (8, 128, C)
    s = jnp.sum(w, axis=-1)  # (8, 128)
    t = jax.lax.dot_general(
        w,
        y_ref[0],  # (d, C) transposed scaled columns
        dimension_numbers=(((2,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )  # (8, 128, d)
    out_ref[0] += jnp.concatenate([s[..., None], t], axis=-1)


def _dgrads_kernel_mxu(kind, m_is_one, precision, x_ref, y_ref, ys_ref,
                       v_ref, u_ref, out_ref):
    """Data-gradient pass, MXU distances; stats = w . [1, ys] directly."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    p = _tile_p_mxu(x_ref[0], y_ref[0])
    _, dg = _kernel_value_dsq(kind, p, clamp=True)
    if m_is_one:
        uv = u_ref[0] * v_ref[0]
    else:
        uv = jax.lax.dot_general(
            u_ref[0],
            v_ref[0],
            dimension_numbers=(((2,), (1,)), ((), ())),
            precision=precision,
            preferred_element_type=jnp.float32,
        )
    w = uv * dg
    out_ref[0] += jax.lax.dot_general(
        w,
        ys_ref[0],  # (C, 1 + d): [1, ys]
        dimension_numbers=(((2,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )  # (8, 128, 1 + d)


# ---------------------------------------------------------------------------
# Host-side assembly
# ---------------------------------------------------------------------------


def _row_spec(rb, trailing):
    return pl.BlockSpec(
        (1, 8, rb // 8, trailing),
        lambda i, j: (i, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )


def _col_spec(cb, trailing):
    return pl.BlockSpec(
        (1, cb, trailing), lambda i, j: (j, 0, 0),
        memory_space=pltpu.VMEM,
    )


def _colT_spec(cb, leading):
    return pl.BlockSpec(
        (1, leading, cb), lambda i, j: (j, 0, 0),
        memory_space=pltpu.VMEM,
    )


_COMPILER_PARAMS = pltpu.CompilerParams(
    vmem_limit_bytes=100 * 1024 * 1024,
    dimension_semantics=("parallel", "arbitrary"),
)


def _prep_rows(arr, rb):
    n_rows = arr.shape[0]
    n_rows_pad = -(-n_rows // rb) * rb
    return (
        _pad_to(arr, n_rows_pad).reshape(n_rows_pad // rb, 8, rb // 8, arr.shape[-1]),
        n_rows_pad,
    )


def _scaled(arr, ell, kind):
    return arr * (jnp.sqrt(_PSCALE[kind]) / ell)


def _v_single_spec_and_pack(v_col, n_cols_pad, cb):
    v_p = _pad_to(v_col, n_cols_pad).reshape(-1, 1, cb)
    return v_p, _colT_spec(cb, 1)


def _matvec_impl(kind, precision, x, y, v, ell, outputscale):
    squeeze = v.ndim == 1
    v2 = v[:, None] if squeeze else v
    m = v2.shape[-1]
    d = x.shape[-1]
    rb, cb = _BLOCKS[kind]
    via_mxu = d > VPU_DMAX
    n_cols_pad = -(-y.shape[0] // cb) * cb

    if via_mxu:
        x_p, n_rows_pad = _prep_rows(_augment_rows(_scaled(x, ell, kind)), rb)
        y_aug = _augment_cols(_scaled(y, ell, kind))
        y_p = _pad_to(y_aug, n_cols_pad).reshape(-1, cb, y_aug.shape[-1])
        y_spec = _col_spec(cb, y_aug.shape[-1])
        x_spec = _row_spec(rb, d + 2)
    else:
        x_p, n_rows_pad = _prep_rows(_scaled(x, ell, kind), rb)
        y_t = _pad_to(_scaled(y, ell, kind), n_cols_pad).T  # (d, n_cols_pad)
        y_p = y_t.reshape(d, -1, cb).transpose(1, 0, 2)  # (ncb, d, C)
        y_spec = _colT_spec(cb, d)
        x_spec = _row_spec(rb, d)
    nb = x_p.shape[0]

    if m == 1:
        v_p, v_spec = _v_single_spec_and_pack(v2[:, 0], n_cols_pad, cb)
        out_spec = pl.BlockSpec(
            (1, 8, rb // 8), lambda i, j: (i, 0, 0),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct((nb, 8, rb // 8), jnp.float32)
    else:
        v_p = _pad_to(v2, n_cols_pad).reshape(-1, cb, m)
        v_spec = _col_spec(cb, m)
        out_spec = pl.BlockSpec(
            (1, 8, rb // 8, m), lambda i, j: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct((nb, 8, rb // 8, m), jnp.float32)

    out = pl.pallas_call(
        functools.partial(_matvec_kernel, kind, via_mxu, precision),
        grid=(nb, y_p.shape[0]),
        in_specs=[x_spec, y_spec, v_spec],
        out_specs=out_spec,
        out_shape=out_shape,
        compiler_params=_COMPILER_PARAMS,
    )(x_p, y_p, v_p)
    out = outputscale * out.reshape(n_rows_pad, m)[: x.shape[0]]
    return out[:, 0] if squeeze else out


def _param_grads(kind, precision, x, y, v, u, ell, outputscale):
    """(d_ell, d_outputscale) of sum_k u_k^T K v_k."""
    v2 = v[:, None] if v.ndim == 1 else v
    u2 = u[:, None] if u.ndim == 1 else u
    m = v2.shape[-1]
    d = x.shape[-1]
    rb, cb = _BLOCKS[kind]
    via_mxu = d > VPU_DMAX
    n_cols_pad = -(-y.shape[0] // cb) * cb

    if m == 1:
        v_p, v_spec = _v_single_spec_and_pack(v2[:, 0], n_cols_pad, cb)
    else:
        v_p = _pad_to(v2, n_cols_pad).reshape(-1, cb, m)
        v_spec = _col_spec(cb, m)

    if via_mxu:
        xs = _scaled(x, ell, kind)
        x_p, n_rows_pad = _prep_rows(_augment_rows(xs), rb)
        xs_p, _ = _prep_rows(xs, rb)
        y_aug = _augment_cols(_scaled(y, ell, kind))
        y_p = _pad_to(y_aug, n_cols_pad).reshape(-1, cb, y_aug.shape[-1])
        ys = _scaled(y, ell, kind)
        ys_aug = jnp.concatenate(
            [jnp.ones_like(ys[:, :1]), ys, ys * ys], axis=-1
        )
        ys_p = _pad_to(ys_aug, n_cols_pad).reshape(-1, cb, 1 + 2 * d)
        u_p, _ = _prep_rows(u2, rb)
        kernel = functools.partial(_grads_kernel_mxu, kind, m == 1, precision)
        operands = (x_p, xs_p, y_p, ys_p, v_p, u_p)
        in_specs = [
            _row_spec(rb, d + 2),
            _row_spec(rb, d),
            _col_spec(cb, d + 2),
            _col_spec(cb, 1 + 2 * d),
            v_spec,
            _row_spec(rb, m),
        ]
        ncb = y_p.shape[0]
    else:
        x_p, n_rows_pad = _prep_rows(_scaled(x, ell, kind), rb)
        y_t = _pad_to(_scaled(y, ell, kind), n_cols_pad).T
        y_p = y_t.reshape(d, -1, cb).transpose(1, 0, 2)
        u_p, _ = _prep_rows(u2, rb)
        kernel = functools.partial(_grads_kernel_vpu, kind, m == 1, precision)
        operands = (x_p, y_p, v_p, u_p)
        in_specs = [_row_spec(rb, d), _colT_spec(cb, d), v_spec, _row_spec(rb, m)]
        ncb = y_p.shape[0]
    nb = x_p.shape[0]

    partials = pl.pallas_call(
        kernel,
        grid=(nb, ncb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 8, 1 + d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((nb, 8, 1 + d), jnp.float32),
        compiler_params=_COMPILER_PARAMS,
    )(*operands)
    total = jnp.sum(partials, axis=(0, 1))  # (1 + d,)
    d_out = total[0]
    # Kernel accumulates sum_ij w_ij * (x - y)_scaled,d^2 with the
    # alpha-folded scaling; unscale to sq_d = (x_d - y_d)^2 / ell_d^2,
    # then d sq / d ell_d = -2 sq_d / ell_d (w carries dg/dsq).
    dsq_sums = total[1:] / _PSCALE[kind]
    d_ell_vec = outputscale * (-2.0 / ell) * dsq_sums
    d_ell = d_ell_vec if jnp.ndim(ell) else jnp.sum(d_ell_vec)
    return d_ell, d_out


def _data_grad(kind, precision, x, y, v, u, ell, outputscale):
    """dL/dx of ``sum_m u_m^T K(x, y) v_m`` as two streamed moments.

    With ``w_ij = (sum_m u_im v_jm) * dg/dsq`` the input gradient is
    ``dx_id = outputscale * 2/ell_d^2 * (x_id sum_j w_ij - sum_j w_ij y_jd)``;
    the kernel accumulates the row-sum and the scaled-y moment per row
    tile, so memory stays O(N(1+d)).  ``dL/dy`` follows by symmetry:
    ``_data_grad(kind, prec, y, x, u, v, ...)`` (swap rows/columns and
    the probe/cotangent roles; ``w`` transposes onto itself).
    """
    v2 = v[:, None] if v.ndim == 1 else v
    u2 = u[:, None] if u.ndim == 1 else u
    m = v2.shape[-1]
    d = x.shape[-1]
    rb, cb = _BLOCKS[kind]
    via_mxu = d > VPU_DMAX
    n_cols_pad = -(-y.shape[0] // cb) * cb

    if m == 1:
        v_p, v_spec = _v_single_spec_and_pack(v2[:, 0], n_cols_pad, cb)
    else:
        v_p = _pad_to(v2, n_cols_pad).reshape(-1, cb, m)
        v_spec = _col_spec(cb, m)
    u_p, _ = _prep_rows(u2, rb)

    if via_mxu:
        xs = _scaled(x, ell, kind)
        x_p, n_rows_pad = _prep_rows(_augment_rows(xs), rb)
        y_aug = _augment_cols(_scaled(y, ell, kind))
        y_p = _pad_to(y_aug, n_cols_pad).reshape(-1, cb, y_aug.shape[-1])
        ys = _scaled(y, ell, kind)
        ys_aug = jnp.concatenate([jnp.ones_like(ys[:, :1]), ys], axis=-1)
        ys_p = _pad_to(ys_aug, n_cols_pad).reshape(-1, cb, 1 + d)
        kernel = functools.partial(_dgrads_kernel_mxu, kind, m == 1, precision)
        operands = (x_p, y_p, ys_p, v_p, u_p)
        in_specs = [
            _row_spec(rb, d + 2),
            _col_spec(cb, d + 2),
            _col_spec(cb, 1 + d),
            v_spec,
            _row_spec(rb, m),
        ]
        ncb = y_p.shape[0]
    else:
        x_p, n_rows_pad = _prep_rows(_scaled(x, ell, kind), rb)
        y_t = _pad_to(_scaled(y, ell, kind), n_cols_pad).T
        y_p = y_t.reshape(d, -1, cb).transpose(1, 0, 2)
        kernel = functools.partial(_dgrads_kernel_vpu, kind, m == 1, precision)
        operands = (x_p, y_p, v_p, u_p)
        in_specs = [_row_spec(rb, d), _colT_spec(cb, d), v_spec, _row_spec(rb, m)]
        ncb = y_p.shape[0]
    nb = x_p.shape[0]

    moments = pl.pallas_call(
        kernel,
        grid=(nb, ncb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 8, rb // 8, 1 + d),
            lambda i, j: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((nb, 8, rb // 8, 1 + d), jnp.float32),
        compiler_params=_COMPILER_PARAMS,
    )(*operands)
    moments = moments.reshape(n_rows_pad, 1 + d)[: x.shape[0]]
    row_sum, t = moments[:, :1], moments[:, 1:]
    # t carries sum_j w y_jd in *scaled* coordinates; unscale with the
    # same factor _scaled applied (sqrt(pscale)/ell).
    scale = jnp.sqrt(_PSCALE[kind]) / ell
    return outputscale * (2.0 / ell**2) * (x * row_sum - t / scale)


def gram_matvec_fused(
    kind: str, *, contract_precision: str = "highest", data_grads: bool = False
):
    """Return ``matvec(x, y, v, lengthscale, outputscale) -> K(x,y) @ v``.

    ``v`` may be ``(N,)`` or ``(N, m)`` (multi-vector: SLQ probe batches
    ride a single kernel-evaluation pass).  ``lengthscale`` may be a
    scalar or a ``(d,)`` ARD vector.  Differentiable w.r.t. ``v``,
    ``lengthscale`` and ``outputscale``; the backward pass streams the
    tiles again instead of storing N^2 residuals, so gradient
    evaluation is O(N) memory at any N.

    ``data_grads``: by default the backward pass returns symbolic-zero
    cotangents for ``x`` and ``y`` -- an EXPLICIT design choice, not an
    oversight: GP hyperparameter training discards input cotangents
    (``closure_convert`` threads the data through the Lanczos adjoint's
    ``jax.vjp`` even though only parameter gradients are consumed), and
    charging every MLL gradient two extra O(N^2) streaming passes for
    discarded values would be waste.  Pass ``data_grads=True`` to get
    the true ``dx``/``dy`` (deep-kernel / inducing-point use), computed
    by two more streamed moment passes (``_data_grad``).  Accuracy
    caveat: the moment formulation evaluates ``x_i * w_ii - w_ii * x_i``
    on the diagonal as two separate accumulations rather than an exact
    cancellation; for ``matern12`` the kernel derivative behaves like
    ``-0.5/sqrt(eps)`` at sq -> 0, so data gradients of near-diagonal
    entries (x very close to or equal to y) carry amplified rounding
    error for that family -- rbf/matern32 are tested symmetric-exact
    (tests/test_ops/test_pallas_gram.py::test_fused_data_gradients).

    ``contract_precision``: MXU precision of the multi-vector
    contraction ("highest" = exact f32; "default" = bf16 inputs with
    f32 accumulation, ~1e-3 relative -- fine for stochastic trace
    probes, not for tight CG solves).
    """
    if kind not in _ALPHA:
        msg = f"kind={kind!r} not supported"
        raise ValueError(msg)
    precision = _PRECISIONS[contract_precision]

    @jax.custom_vjp
    def matvec(x, y, v, lengthscale, outputscale):
        return _matvec_impl(kind, precision, x, y, v, lengthscale, outputscale)

    def matvec_fwd(x, y, v, lengthscale, outputscale):
        out = _matvec_impl(kind, precision, x, y, v, lengthscale, outputscale)
        return out, (x, y, v, lengthscale, outputscale)

    def matvec_bwd(cache, u):
        x, y, v, ell, outputscale = cache
        dv = _matvec_impl(kind, precision, y, x, u, ell, outputscale)  # K^T u
        d_ell, d_out = _param_grads(
            kind, precision, x, y, v, u, ell, outputscale
        )
        if data_grads:
            dx = _data_grad(kind, precision, x, y, v, u, ell, outputscale)
            dy = _data_grad(kind, precision, y, x, u, v, ell, outputscale)
            return dx, dy, dv, d_ell, d_out
        return None, None, dv, d_ell, d_out

    matvec.defvjp(matvec_fwd, matvec_bwd)
    return matvec
