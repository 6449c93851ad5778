"""Arnoldi Hessenberg factorisation with a closed-form reverse-mode adjoint.

Capability parity with the reference ``src/matfree_extensions/arnoldi.py``
(``hessenberg`` at arnoldi.py:7, forward at arnoldi.py:57-101, adjoint at
arnoldi.py:104-220), re-designed for TPU/XLA:

- Forward: ``lax.fori_loop`` over the classical (optionally twice-applied)
  Gram-Schmidt recurrence; the basis lives in a ``(n, k)`` buffer whose
  column writes XLA turns into dynamic-update-slices.
- Adjoint: a reverse ``lax.scan`` performing backward substitution on the
  Hessenberg matrix, with optional re-projection of the adjoint vectors
  against the computed basis (``reortho="full"``). One transposed matvec +
  parameter-VJP per step.

Divergence from the reference (deliberate, documented in SURVEY.md 2.5#2):
the reference's ``reortho_vjp``-handling contains a no-op conditional
(arnoldi.py:26) that makes the *forward* pass always re-orthogonalise.
Here the intended semantics are implemented: ``reortho`` controls the
forward pass; ``reortho_vjp`` (default ``"match"``) optionally overrides
the adjoint's re-projection.

Supports complex operators (conjugate-transposes in the forward pass).
"""

from typing import Callable

import jax
import jax.numpy as jnp

from lanczos_adjoints_tpu.utils.precision import highest_precision


def _safe_norm(w):
    """2-norm whose backprop is zero (not NaN) at exactly-zero vectors.

    Happy-breakdown truncation leaves exact zeros; ``sqrt`` has an
    infinite derivative at 0 and ``0 * inf`` poisons the backprop oracle.
    """
    sq = jnp.dot(w.conj(), w)
    alive = jnp.real(sq) > 0.0
    return jnp.where(alive, jnp.sqrt(jnp.where(alive, sq, 1.0)), jnp.zeros_like(sq))


def hessenberg(
    matvec,
    krylov_depth,
    /,
    *,
    reortho: str,
    custom_vjp: bool = True,
    reortho_vjp: str = "match",
    loop_unroll: int = 4,
    dispatch_log: list | None = None,
) -> Callable:
    """Construct an Arnoldi factorisation ``A Q = Q H + r e_k^T``.

    Returns ``estimate(v, *params) -> (Q, H, residual, 1/|v|)`` with
    ``Q`` of shape ``(n, krylov_depth)`` and ``H`` upper-Hessenberg of
    shape ``(krylov_depth, krylov_depth)``.

    ``dispatch_log``: optional list receiving one trace-time entry per
    compilation naming the path that ran (``"hessenberg:pallas_dia_fused"``
    or ``"hessenberg:xla_loop"``) -- see ``lanczos.tridiag``.
    """
    options = ("none", "full")
    if reortho not in options:
        msg = f"Unexpected input for {reortho}: either of {list(options)} expected."
        raise TypeError(msg)
    if reortho_vjp not in (*options, "match"):
        msg = (
            f"Unexpected input for {reortho_vjp}: "
            f"either of {[*options, 'match']} expected."
        )
        raise TypeError(msg)
    reortho_adjoint = reortho if reortho_vjp == "match" else reortho_vjp

    @highest_precision
    def estimate_public(v, *params):
        # Precision resolves at trace time; closure_convert traces the
        # matvec here, so the wrapper must cover it.
        matvec_converted, aux_args = jax.closure_convert(matvec, v, *params)
        return estimate_backend(matvec_converted, v, *params, *aux_args)

    def estimate_backend(matvec_converted: Callable, v, *params):
        return _forward(
            matvec_converted,
            krylov_depth,
            v,
            *params,
            reortho=reortho,
            unroll=loop_unroll,
        )

    def estimate_fwd(matvec_converted: Callable, v, *params):
        outputs = estimate_backend(matvec_converted, v, *params)
        return outputs, (outputs, params)

    def estimate_bwd(matvec_converted: Callable, cache, cotangents):
        (Q, H, res, inv_norm), params = cache
        dQ, dH, dres, dinv_norm = cotangents
        return _adjoint(
            matvec_converted,
            params,
            Q=Q,
            H=H,
            res=res,
            inv_norm=inv_norm,
            dQ=dQ,
            dH=dH,
            dres=dres,
            dinv_norm=dinv_norm,
            reortho=reortho_adjoint,
            unroll=loop_unroll,
        )

    if custom_vjp:
        estimate_backend = jax.custom_vjp(estimate_backend, nondiff_argnums=(0,))
        estimate_backend.defvjp(estimate_fwd, estimate_bwd)
    dia = getattr(matvec, "dia_data", None)
    if custom_vjp and dia is not None:
        return _hessenberg_dispatch_dia(
            estimate_public,
            dia,
            krylov_depth,
            reortho=reortho,
            reortho_vjp=reortho_vjp,
            dispatch_log=dispatch_log,
        )
    if dispatch_log is None:
        return estimate_public

    def logged(v, *params):
        dispatch_log.append("hessenberg:xla_loop")
        return estimate_public(v, *params)

    return logged


# The fused Arnoldi kernels hold the whole basis in VMEM (v5e: 128 MB).
# Depths <= 48 run the fully-unrolled kernel (static per-step projection
# shapes); deeper factorisations -- the SLQ-typical K = 90-250 of the
# paper's walltime figure -- run the looped masked-projection kernel
# (ops/pallas_arnoldi._arnoldi_kernel_looped), so the cap is VMEM plus
# a generous depth bound, not compile time.
_FUSED_VMEM_BUDGET_BYTES = 100 * 1024 * 1024
_FUSED_DEPTH_CAP = 512


def _hessenberg_dispatch_dia(
    plain, dia, krylov_depth, *, reortho, reortho_vjp, dispatch_log=None
):
    """Route DIA-tagged operators to ``ops.pallas_arnoldi`` when they fit.

    The fused path runs the whole K-step recurrence (matvec + classical
    Gram-Schmidt, optionally twice) as one Pallas kernel -- measured
    2-5x over the XLA loop at K<=32 (RESULTS.md).  Gradient semantics
    are identical: its backward pass is the same closed-form adjoint.
    """

    def estimate(vec, *params):
        n = dia.shape[0]
        vecs = krylov_depth + 2 * len(dia.offsets) + 8
        fits = (
            vecs * n * 4 <= _FUSED_VMEM_BUDGET_BYTES
            and krylov_depth <= _FUSED_DEPTH_CAP
        )
        is_plain_call = (
            len(params) == 1
            and jnp.shape(params[0]) == (len(dia.offsets), n)
            and jnp.shape(vec) == (n,)
            and n % 128 == 0
            and 0 < krylov_depth <= n
            and jnp.result_type(vec) == jnp.float32
            and jax.default_backend() == "tpu"
        )
        if fits and is_plain_call:
            from lanczos_adjoints_tpu.ops.pallas_arnoldi import hessenberg_dia_fused

            if dispatch_log is not None:
                dispatch_log.append("hessenberg:pallas_dia_fused")
            fused = hessenberg_dia_fused(
                dia, krylov_depth, reortho=reortho, reortho_vjp=reortho_vjp
            )
            return fused(vec, params[0])
        if dispatch_log is not None:
            dispatch_log.append("hessenberg:xla_loop")
        return plain(vec, *params)

    return estimate


@highest_precision
def _forward(matvec, krylov_depth, v, *params, reortho: str, unroll: int = 4):
    if krylov_depth < 1 or krylov_depth > len(v):
        msg = f"Parameter depth {krylov_depth} is outside the expected range"
        raise ValueError(msg)

    (n,), k = jnp.shape(v), krylov_depth
    Q = jnp.zeros((n, k), dtype=v.dtype)
    H = jnp.zeros((k, k), dtype=v.dtype)
    norm0 = jnp.sqrt(jnp.dot(v.conj(), v))

    def body(idx, state):
        Q, H, w, norm = state

        # Happy-breakdown-safe normalisation: once an earlier step
        # truncated (norm == 0), every subsequent column stays exactly
        # zero instead of dividing 0/0.
        alive = jnp.abs(norm) > 0.0
        q = jnp.where(alive, w / jnp.where(alive, norm, 1.0), jnp.zeros_like(w))
        Q = Q.at[:, idx].set(q)

        w = matvec(q, *params)

        # Classical Gram-Schmidt against the basis so far (zero columns of
        # Q beyond idx contribute nothing), optionally applied twice.
        coeffs = Q.conj().T @ w
        w = w - Q @ coeffs
        if reortho == "full":
            norm_pass1 = _safe_norm(w)
            w = w - Q @ (Q.conj().T @ w)
            norm = _safe_norm(w)
            # DGKS/Kahan "twice is enough" breakdown detection: the first
            # pass leaves true-residual + dot-product noise; the second
            # pass removes only noise.  If it removed more than half the
            # remaining norm, the residual IS noise (the Krylov space is
            # numerically exhausted at this working precision) -- truncate
            # with an exact zero so T decouples cleanly, instead of
            # normalising rounding error into a garbage direction (the
            # observed failure mode on multi-million-parameter GGNs:
            # Ritz values at -2600 on an SPD operator, NaN logdets).
            # Platform-adaptive by construction: no eps*sqrt(n) modelling
            # of the accumulation noise floor is needed.
            exhausted = jnp.abs(norm) <= 0.5 * jnp.abs(norm_pass1)
            norm = jnp.where(exhausted, jnp.zeros_like(norm), norm)
            w = jnp.where(exhausted, jnp.zeros_like(w), w)
        else:
            norm = _safe_norm(w)

        # The subdiagonal entry; for idx == k-1 the write at row k is
        # out of bounds and dropped, leaving the residual norm out of H.
        coeffs = coeffs.at[idx + 1].set(norm)
        H = H.at[:, idx].set(coeffs)
        return Q, H, w, norm

    Q, H, w, _norm = jax.lax.fori_loop(0, k, body, (Q, H, v, norm0), unroll=unroll)
    return Q, H, w, 1.0 / norm0


@highest_precision
def _adjoint(
    matvec,
    params,
    *,
    Q,
    H,
    res,
    inv_norm,
    dQ,
    dH,
    dres,
    dinv_norm,
    reortho: str,
    unroll: int = 4,
):
    """Backward substitution on H, scanning the Krylov steps in reverse.

    Solves the adjoint system of arXiv:2405.17277 for the Arnoldi
    recurrence. Per step: one transposed matvec (via ``jax.vjp``), one
    parameter-gradient increment, and O(nk) projections.
    """
    _, k = jnp.shape(Q)
    eye = jnp.eye(k, dtype=H.dtype)
    e1, ek = eye[0], eye[-1]

    # Strictly-lower-plus-half-diagonal mask used to symmetrise the
    # Gramian adjoint.
    ones = jnp.ones((k, k), dtype=H.dtype)
    half_lower = jnp.tril(ones) - 0.5 * jnp.diag(jnp.diag(jnp.tril(ones)))

    # Initial adjoint direction from the residual/H cotangents.
    eta = dH @ ek - Q.T @ dres
    lam = dres + Q @ eta

    # Row-wise auxiliary matrices consumed one row per backward step.
    c = inv_norm  # the forward returns 1/|v|; dinv_norm is its cotangent
    Xi_rows = dQ.T + jnp.outer(eta, res)  # (k, n)
    Gamma_rows = -dinv_norm * c * jnp.outer(e1, e1) + H @ dH.T - dQ.T @ Q  # (k, k)

    # Sub-/diagonal decomposition of H for the three-term backward relation.
    beta_lower = jnp.concatenate([jnp.ones((1,), H.dtype), jnp.diag(H, -1)])
    alphas = jnp.diag(H)
    beta_upper = H - jnp.diag(alphas) - jnp.diag(jnp.diag(H, -1), -1)

    # Re-projection data: rows of dH^T masked to the entries that were
    # actually produced by the forward orthogonalisation.
    proj_mask = jnp.tril(jnp.ones((k, k), dtype=H.dtype), 1)

    scan_inputs = {
        "idx": jnp.arange(k),
        "beta_lower": beta_lower,
        "alpha": alphas,
        "beta_upper_row": beta_upper,
        "half_lower_row": half_lower,
        "Gamma_row": Gamma_rows,
        "Xi_row": Xi_rows,
        "proj_target": dH.T,
        "proj_mask_row": proj_mask,
        "q_row": Q.T,
    }

    def step(carry, inp):
        lam, Lambda, Sigma, P, dparams = carry

        if reortho == "full":
            # Project the adjoint vector back onto the orthogonal
            # complement of the (still-active) basis rows, then add the
            # component prescribed by the masked dH row.
            P_masked = inp["proj_mask_row"][:, None] * P
            target = inp["proj_mask_row"] * inp["proj_target"]
            lam = lam - P_masked.T @ (P_masked @ lam) + P_masked.T @ target

        # Transposed matvec and parameter gradient in one VJP.
        _, vjp = jax.vjp(lambda u, p: matvec(u, *p), inp["q_row"], params)
        at_lam, dparams_inc = vjp(lam)
        dparams = jax.tree_util.tree_map(jnp.add, dparams, dparams_inc)

        # Accumulate the symmetrised Gramian adjoint row.
        sigma_row = inp["half_lower_row"] * (inp["Gamma_row"] - at_lam @ Q)
        Sigma = Sigma.at[inp["idx"], :].set(sigma_row)

        # Backward-substitution step for the next adjoint vector.
        Lambda = Lambda.at[:, inp["idx"]].set(lam)
        xi = inp["Xi_row"] + (Sigma + Sigma.T)[inp["idx"], :] @ Q.T
        lam_next = xi - (inp["alpha"] * lam - at_lam) - inp["beta_upper_row"] @ Lambda.T
        # Happy-breakdown guard (matches the forward's truncation): a
        # zero subdiagonal decouples the trailing block, whose forward
        # columns are exactly zero and carry zero cotangents -- the
        # correct adjoint vector there is zero, not xi / 0.
        beta = inp["beta_lower"]
        alive = jnp.abs(beta) > 0.0
        lam_next = jnp.where(
            alive, lam_next / jnp.where(alive, beta, 1.0), jnp.zeros_like(lam_next)
        )
        return (lam_next, Lambda, Sigma, P, dparams), None

    Lambda0 = jnp.zeros_like(Q)
    Sigma0 = jnp.zeros((k, k), dtype=H.dtype)
    dparams0 = jax.tree_util.tree_map(jnp.zeros_like, params)
    init = (lam, Lambda0, Sigma0, Q.T, dparams0)
    (lam, _Lambda, _Sigma, _P, dparams), _ = jax.lax.scan(
        step, init, xs=scan_inputs, reverse=True, unroll=unroll
    )

    dv = lam * c
    return (dv, *dparams)
