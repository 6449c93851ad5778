"""Fully-fused Arnoldi forward for DIA operators: one Pallas kernel.

The whole K-step Arnoldi recurrence -- matvec, classical Gram-Schmidt
against the growing basis (optionally applied twice, ``reortho="full"``),
normalisation, Hessenberg assembly -- runs inside a single
``pallas_call``: operator value tiles, iterates and the basis stay in
VMEM, each matvec is a static unrolled sum of flat register rolls, and
the Krylov loop is fully unrolled (K is small where re-orthogonalised
Arnoldi is used: the PDE matrix exponential runs K <= 32, reference
``pde_util.py:257-268``).  This removes the per-step kernel boundaries
and dynamic-update-slices the XLA ``fori_loop`` version pays.

The full unroll buys static per-step shapes: step ``i`` projects against
exactly ``i + 1`` basis rows (no masking against unwritten rows) and the
Hessenberg column writes are static slices.

The backward pass reuses the generic closed-form adjoint
(``krylov.arnoldi._adjoint``) over the XLA DIA matvec: the fused kernel
is the *forward* of a ``jax.custom_vjp`` whose bwd is identical to the
standard path, so gradients match ``krylov.hessenberg`` exactly.

Capacity: (K + 1) vectors of length n resident in VMEM plus the
operator tiles -- the same budget as ``ops.pallas_lanczos``.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lanczos_adjoints_tpu.krylov import arnoldi as _arnoldi
from lanczos_adjoints_tpu.ops.pallas_lanczos import _flat_roll, _guarded_div
from lanczos_adjoints_tpu.ops.sparse import dia_matvec_fn

LANES = 128


def _arnoldi_kernel(
    offsets, krylov_depth, reortho_full, vals_ref, v0_ref, q_ref, h_ref, res_ref
):
    n_rows = v0_ref.shape[0]
    k = krylov_depth

    def matvec(x):
        acc = jnp.zeros_like(x)
        for slot, d in enumerate(offsets):
            acc = acc + vals_ref[slot] * _flat_roll(x, d, n_rows)
        return acc

    def project(w, i):
        """Coefficients (i+1, 1) against basis rows 0..i and the update.

        Two-stage reduction: a rank-3 keepdims reduction followed by a
        slice crashes Mosaic's layout inference; lane-then-sublane sums
        keep every intermediate rank <= 2.
        """
        if i == 0:
            # The singleton (1, S) reduction produces a fully-replicated
            # (1, 1) vector Mosaic cannot relayout; use a plain scalar.
            c0 = jnp.sum(q_ref[0] * w)
            return w - c0 * q_ref[0], jnp.full((1, 1), c0, w.dtype)
        prod = q_ref[0 : i + 1] * w[None]
        t = jnp.sum(prod, axis=2)  # (i+1, S)
        c = jnp.sum(t, axis=1, keepdims=True)  # (i+1, 1)
        w = w - jnp.sum(c[:, :, None] * q_ref[0 : i + 1], axis=0)
        return w, c

    # H assembles via masked full-block adds: narrow column stores of
    # lane-replicated vectors trip Mosaic relayouts, a (k, k) VPU mask
    # add does not.
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    h_ref[...] = jnp.zeros_like(h_ref)

    w = v0_ref[:]
    norm = jnp.sqrt(jnp.sum(w * w))
    for i in range(k):
        # Exhaustion-guarded normalisation + (reortho=full) DGKS
        # twice-is-enough truncation, matching krylov.arnoldi._forward:
        # once the Krylov space is numerically exhausted, columns stay
        # exactly zero instead of normalising rounding noise.
        q = _guarded_div(w, norm)
        q_ref[i] = q
        w = matvec(q)
        w, c = project(w, i)
        if reortho_full:
            norm_pass1 = jnp.sqrt(jnp.sum(w * w))
            w, _c2 = project(w, i)
            norm = jnp.sqrt(jnp.sum(w * w))
            keep = jnp.where(norm > 0.5 * norm_pass1, 1.0, 0.0)
            norm = norm * keep
            w = w * keep
        else:
            norm = jnp.sqrt(jnp.sum(w * w))
        # Hessenberg column i: first-pass coefficients, then the
        # subdiagonal entry (dropped at i == k - 1, matching
        # krylov.arnoldi._forward's out-of-bounds write).
        if i + 1 < k:
            c_col = jnp.concatenate(
                [c, jnp.zeros((k - i - 1, 1), c.dtype)], axis=0
            )
            sub = jnp.where((row_iota == i + 1) & (col_iota == i), norm, 0.0)
        else:
            c_col = c
            sub = jnp.zeros((k, k), c.dtype)
        h_ref[...] += c_col * (col_iota == i) + sub
    res_ref[:] = w


def _arnoldi_kernel_looped(
    offsets, krylov_depth, reortho_full, vals_ref, v0_ref, q_ref, h_ref, res_ref
):
    """Deep-K variant: ``fori_loop`` over steps, masked projections.

    The fully-unrolled kernel above emits O(K^2) code (step ``i``
    projects against a static ``i + 1``-row slice), which is fast to
    run but slow to COMPILE past K ~ 48.  Here each step projects
    against the whole (K, n) basis buffer with rows ``> i`` masked to
    zero coefficients -- uniform static shapes, one loop body to
    compile, 2x the triangular arithmetic (VPU-bound, still far under
    the XLA per-step loop overhead).  Basis rows are zero-initialised
    so the masked-out garbage never sees NaN * 0.
    """
    k = krylov_depth
    n_rows = v0_ref.shape[0]

    def matvec(x):
        acc = jnp.zeros_like(x)
        for slot, d in enumerate(offsets):
            acc = acc + vals_ref[slot] * _flat_roll(x, d, n_rows)
        return acc

    row_iota_k1 = jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)

    q_ref[...] = jnp.zeros_like(q_ref)

    def project_masked(w, i):
        qs = q_ref[...]
        t = jnp.sum(qs * w[None], axis=2)  # (k, S)
        c = jnp.sum(t, axis=1, keepdims=True)  # (k, 1)
        c = jnp.where(row_iota_k1 <= i, c, 0.0)
        w = w - jnp.sum(c[:, :, None] * qs, axis=0)
        return w, c

    def body(i, carry):
        w, norm, h = carry
        # Same exhaustion guards as the unrolled kernel / XLA forward.
        q = _guarded_div(w, norm)
        q_ref[i] = q
        w = matvec(q)
        w, c = project_masked(w, i)
        if reortho_full:
            norm_pass1 = jnp.sqrt(jnp.sum(w * w))
            w, _c2 = project_masked(w, i)
            norm_next = jnp.sqrt(jnp.sum(w * w))
            keep = jnp.where(norm_next > 0.5 * norm_pass1, 1.0, 0.0)
            norm_next = norm_next * keep
            w = w * keep
        else:
            norm_next = jnp.sqrt(jnp.sum(w * w))
        sub = jnp.where((row_iota == i + 1) & (col_iota == i), norm_next, 0.0)
        h = h + c * (col_iota == i) + sub
        return w, norm_next, h

    w0 = v0_ref[...]
    norm0 = jnp.sqrt(jnp.sum(w0 * w0))
    h0 = jnp.zeros((k, k), w0.dtype)
    w, _norm, h = jax.lax.fori_loop(0, k, body, (w0, norm0, h0))
    h_ref[...] = h
    res_ref[:] = w


# Past this depth the fully-unrolled kernel's O(K^2) code makes
# compiles slow; the looped kernel takes over.
_UNROLL_DEPTH_CAP = 48


def hessenberg_dia_forward(
    dia, krylov_depth: int, *, reortho: str, interpret: bool = False
):
    """Build the fused forward ``(v0, vals) -> (Q, H, res, 1/|v0|)``.

    Output layout matches ``krylov.arnoldi.hessenberg``: ``Q`` is
    ``(n, krylov_depth)``, ``H`` upper-Hessenberg ``(k, k)``.  Depths
    up to ``_UNROLL_DEPTH_CAP`` run the fully-unrolled kernel; deeper
    factorisations (SLQ-typical K = 90-250) run the looped variant.
    """
    n = dia.shape[0]
    if n % LANES != 0:
        msg = f"n={n} must be a multiple of {LANES} for the fused kernel"
        raise ValueError(msg)
    if not 1 <= krylov_depth <= n:
        msg = f"Parameter depth {krylov_depth} is outside the expected range"
        raise ValueError(msg)
    n_rows = n // LANES
    looped = krylov_depth > _UNROLL_DEPTH_CAP
    if looped:
        kernel = functools.partial(
            _arnoldi_kernel_looped, dia.offsets, krylov_depth, reortho == "full"
        )
    else:
        kernel = functools.partial(
            _arnoldi_kernel, dia.offsets, krylov_depth, reortho == "full"
        )

    def forward(v0, vals):
        vals_tiled = vals.reshape(len(dia.offsets), n_rows, LANES)
        v0_tiled = v0.reshape(n_rows, LANES)
        vmem_bytes = 4 * n * (krylov_depth + 2 * len(dia.offsets) + 8)
        q_tiled, h, res_tiled = pl.pallas_call(
            kernel,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((krylov_depth, n_rows, LANES), v0.dtype),
                jax.ShapeDtypeStruct((krylov_depth, krylov_depth), v0.dtype),
                jax.ShapeDtypeStruct((n_rows, LANES), v0.dtype),
            ],
            # Only ever RAISE the scoped-vmem limit above Mosaic's
            # default: a small problem must not inherit a limit below
            # what the compiler would have granted anyway.
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=min(
                    max(2 * vmem_bytes + (1 << 20), 64 * 1024 * 1024),
                    128 * 1024 * 1024,
                )
            ),
            interpret=interpret,
        )(vals_tiled, v0_tiled)
        Q = q_tiled.reshape(krylov_depth, n).T
        norm0 = jnp.linalg.norm(v0)
        return Q, h, res_tiled.reshape(n), 1.0 / norm0

    return forward


def hessenberg_dia_fused(
    dia,
    krylov_depth: int,
    *,
    reortho: str,
    reortho_vjp: str = "match",
    interpret: bool = False,
):
    """Drop-in ``krylov.hessenberg`` for DIA operators, fused forward.

    ``estimate(v0, vals) -> (Q, H, res, 1/|v0|)``; the backward pass is
    the generic closed-form adjoint (``krylov.arnoldi._adjoint``) over
    the XLA DIA matvec, so gradient semantics are identical to
    ``krylov.hessenberg(custom_vjp=True)``.
    """
    options = ("none", "full")
    if reortho not in options:
        msg = f"Unexpected input for {reortho}: either of {list(options)} expected."
        raise TypeError(msg)
    reortho_adjoint = reortho if reortho_vjp == "match" else reortho_vjp
    fused_forward = hessenberg_dia_forward(
        dia, krylov_depth, reortho=reortho, interpret=interpret
    )
    matvec = dia_matvec_fn(dia)

    @jax.custom_vjp
    def estimate(v0, vals):
        return fused_forward(v0, vals)

    def estimate_fwd(v0, vals):
        value = fused_forward(v0, vals)
        return value, (value, vals)

    def estimate_bwd(cache, cotangents):
        (Q, H, res, inv_norm), vals = cache
        dQ, dH, dres, dinv_norm = cotangents
        dv, dvals = _arnoldi._adjoint(
            matvec,
            (vals,),
            Q=Q,
            H=H,
            res=res,
            inv_norm=inv_norm,
            dQ=dQ,
            dH=dH,
            dres=dres,
            dinv_norm=dinv_norm,
            reortho=reortho_adjoint,
        )
        return dv, dvals

    estimate.defvjp(estimate_fwd, estimate_bwd)
    return estimate
