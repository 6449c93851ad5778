"""Single-pass DIA (diagonal-format) SpMV as a Pallas TPU kernel.

The XLA formulation (``ops.sparse.dia_matvec_fn``: one ``jnp.roll`` +
FMA per diagonal) materialises a rolled copy of ``x`` per diagonal, so
a 5-diagonal n=1M matvec moves ~3x the useful bytes (measured 127 GB/s
effective with runtime values; the round-1 ~550-900 GB/s figures were
flattered by XLA constant-folding closure-captured stencil values).
This kernel makes one pass: ``x`` stays VMEM-resident (padded by the
halo), the value diagonals stream through the pipeline, and each
(chunk, diagonal) contribution is two static row-slices combined with a
lane roll -- every byte of ``vals`` is read exactly once and ``x`` is
read from VMEM.

Semantics are exactly the XLA path's: circular ``jnp.roll``
wraparound is reproduced by reading from a circularly-padded copy of
``x`` (the halo is filled with the wrapped tail/head), so results and
gradients match for *all* inputs, not just zero-padded DIA values.

Gradients: ``jax.custom_vjp``.  The cotangent matvec is the same
forward kernel evaluated with negated offsets and diagonal-rolled
values (the exact transpose of the circular-roll forward); the value
gradient ``dvals[k] = u * x[. + d_k]`` is a second tiny kernel sharing
the shifted-slice helper.

Role of reference ``exp_util.py:35-42`` (BCOO SpMV on GPU); no direct
reference counterpart -- this is TPU-native scope (SURVEY.md §7).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
_SUBLANES = 8


def _halo_rows(halo: int) -> int:
    rows = -(-halo // LANES)
    return -(-rows // _SUBLANES) * _SUBLANES


def _shifted_chunk(xpad_ref, base: int, shift: int, chunk: int, one_roll: bool = True):
    """rows [base, base+chunk) of xpad flat-shifted by ``shift`` >= 0.

    ``one_roll=True`` reads ``chunk + 1`` rows once and lane-rotates the
    whole block (the two needed row windows are that block's first and
    last ``chunk`` rows), halving the roll work of the two-read variant.
    """
    q, r = divmod(shift, LANES)
    if r == 0:
        return xpad_ref[pl.ds(base + q, chunk), :]
    if one_roll:
        c = xpad_ref[pl.ds(base + q, chunk + 1), :]
        cr = pltpu.roll(c, LANES - r, axis=1)
        ar, br = cr[:chunk], cr[1:]
    else:
        a = xpad_ref[pl.ds(base + q, chunk), :]
        b = xpad_ref[pl.ds(base + q + 1, chunk), :]
        ar = pltpu.roll(a, LANES - r, axis=1)
        br = pltpu.roll(b, LANES - r, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, ar.shape, 1)
    return jnp.where(lane + r < LANES, ar, br)


def _fill_halo(x_ref, xpad_ref, hr):
    """Circularly-padded copy of x into VMEM scratch, once per grid pass.

    Building the padded copy in VMEM (instead of a JAX-level
    ``jnp.concatenate``) saves one HBM round trip of the whole vector
    -- a third of this kernel's traffic at n=1M.
    """
    rows = x_ref.shape[0]

    @pl.when(pl.program_id(0) == 0)
    def _():
        xpad_ref[hr : hr + rows] = x_ref[...]
        xpad_ref[0:hr] = x_ref[rows - hr : rows]
        xpad_ref[hr + rows :] = x_ref[0:hr]


def _matvec_kernel(offsets, hr, chunk, one_roll, x_ref, vals_ref, out_ref, xpad_ref):
    _fill_halo(x_ref, xpad_ref, hr)
    hp = hr * LANES
    base = pl.program_id(0) * chunk
    acc = jnp.zeros_like(out_ref)
    for k, d in enumerate(offsets):
        acc = acc + vals_ref[k] * _shifted_chunk(xpad_ref, base, hp + d, chunk, one_roll)
    out_ref[...] = acc


def _dvals_kernel(offsets, hr, chunk, x_ref, u_ref, dvals_ref, xpad_ref):
    _fill_halo(x_ref, xpad_ref, hr)
    hp = hr * LANES
    base = pl.program_id(0) * chunk
    u = u_ref[...]
    for k, d in enumerate(offsets):
        dvals_ref[k] = u * _shifted_chunk(xpad_ref, base, hp + d, chunk)


def _pick_chunk(rows: int, target: int = 1024) -> int:
    # Keep at least two grid steps: with grid=1 the pipeline cannot
    # double-buffer the streamed value blocks behind compute and the
    # kernel collapses to serial HBM reads (measured 17 GB/s vs 600+ at
    # n=524288, round-5 scaling sweep).
    if rows >= 2 * _SUBLANES:
        target = min(target, rows // 2)
    best = _SUBLANES
    for c in range(_SUBLANES, min(rows, target) + 1, _SUBLANES):
        if rows % c == 0:
            best = c
    return best


def dia_matvec_pallas(
    dia, *, interpret: bool = False, chunk_target: int = 4096, one_roll: bool = True
):
    """Differentiable single-pass matvec ``matvec(v, vals) -> A @ v``.

    ``vals`` is the packed ``(num_diags, n)`` array from
    ``ops.sparse.dia_values``.  Requires ``n % 1024 == 0``.

    ``chunk_target``/``one_roll`` are tuning knobs (rows per grid step,
    i.e. the streamed value-block size, and the shifted-read variant);
    the defaults are the measured-fastest configuration at n = 1M
    (RESULTS.md roofline section).
    """
    offsets = tuple(int(d) for d in dia.offsets)
    n = dia.shape[0]
    if n % (LANES * _SUBLANES) != 0:
        msg = f"n={n} must be a multiple of {LANES * _SUBLANES}"
        raise ValueError(msg)
    rows = n // LANES
    halo = max(1, max(abs(d) for d in offsets))
    hr = _halo_rows(halo)
    if rows < hr:
        msg = f"halo rows {hr} exceed vector rows {rows}"
        raise ValueError(msg)
    chunk = _pick_chunk(rows, chunk_target)
    num_diags = len(offsets)

    # Scoped-vmem budget: the resident x copy + halo scratch + the
    # double-buffered streamed value/output blocks.  Only ever RAISE
    # the limit above Mosaic's default (some terminals default to
    # 16 MiB, below what chunk_target=4096 at n=1M needs).
    vmem_est = 4 * LANES * (
        (rows + 2 * hr)  # xpad scratch
        + rows  # x input
        + 2 * (num_diags + 2) * chunk  # double-buffered vals + out blocks
    )
    compiler_params = pltpu.CompilerParams(
        dimension_semantics=("arbitrary",),
        vmem_limit_bytes=min(
            max(2 * vmem_est + (1 << 20), 64 * 1024 * 1024),
            128 * 1024 * 1024,
        ),
    )

    neg_offsets = tuple(-d for d in offsets)

    def _run_matvec(signed_offsets, v, vals):
        kernel = functools.partial(
            _matvec_kernel, signed_offsets, hr, chunk, one_roll
        )
        out = pl.pallas_call(
            kernel,
            grid=(rows // chunk,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (num_diags, chunk, LANES),
                    lambda i: (0, i, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (chunk, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((rows, LANES), v.dtype),
            scratch_shapes=[pltpu.VMEM((rows + 2 * hr, LANES), jnp.float32)],
            compiler_params=compiler_params,
            interpret=interpret,
        )(v.reshape(rows, LANES), vals.reshape(num_diags, rows, LANES))
        return out.reshape(-1)

    def _run_dvals(v, u):
        kernel = functools.partial(_dvals_kernel, offsets, hr, chunk)
        dvals = pl.pallas_call(
            kernel,
            grid=(rows // chunk,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (chunk, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (num_diags, chunk, LANES),
                lambda i: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((num_diags, rows, LANES), v.dtype),
            scratch_shapes=[pltpu.VMEM((rows + 2 * hr, LANES), jnp.float32)],
            compiler_params=compiler_params,
            interpret=interpret,
        )(v.reshape(rows, LANES), u.reshape(rows, LANES))
        return dvals.reshape(num_diags, n)

    @jax.custom_vjp
    def matvec(v, vals):
        return _run_matvec(offsets, v, vals)

    def matvec_fwd(v, vals):
        return _run_matvec(offsets, v, vals), (v, vals)

    def matvec_bwd(cache, u):
        v, vals = cache
        # Exact transpose of the circular-roll forward: A^T has offsets
        # -d with values rolled along the diagonal.
        vals_t = jnp.stack([jnp.roll(vals[k], d) for k, d in enumerate(offsets)])
        dv = _run_matvec(neg_offsets, u, vals_t)
        dvals = _run_dvals(v, u)
        return dv, dvals

    matvec.defvjp(matvec_fwd, matvec_bwd)
    return matvec
