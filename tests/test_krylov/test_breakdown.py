"""Krylov-exhaustion (happy-breakdown) robustness.

Regression tests for the failure mode observed on multi-million-parameter
GGN calibration (reference imagenet_callibration.py:30-42 scale class):
on a numerically rank-deficient SPD operator ``A = U diag(lam) U^T + alpha I``
with rank(U) < krylov_depth, the Lanczos/Arnoldi recurrence exhausts its
Krylov space.  Without guards this divides by ~zero, normalises rounding
noise into garbage directions (observed Ritz values at -2600 on an SPD
operator) and poisons both the SLQ value (``log`` of negative Ritz
values) and the gradient (``eigh``'s VJP divides by the gaps of the
degenerate zero Ritz block).

The guarded pipeline must produce:
  * a cleanly truncated decomposition (exact zero offdiagonal + zero
    trailing columns, DGKS twice-is-enough detection, arnoldi.py),
  * an SLQ logdet value matching the dense ``slogdet`` oracle,
  * finite gradients from BOTH the closed-form adjoint (custom_vjp=True)
    and the backprop oracle (custom_vjp=False), agreeing with each other
    (the Daleckii-Krein quadform VJP, lanczos.py::_quadform_tridiag).
"""

import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lanczos_adjoints_tpu.krylov import lanczos
from lanczos_adjoints_tpu.models import bnn


def _low_rank_spd(key, n, rank, dtype=jnp.float32):
    """U diag(lam) U^T with lam in [0.5, 2.5]; exact rank `rank`."""
    ku, kl = jax.random.split(key)
    u, _ = jnp.linalg.qr(jax.random.normal(ku, (n, rank), dtype=dtype))
    lam = 0.5 + 2.0 * jax.random.uniform(kl, (rank,), dtype=dtype)
    return (u * lam) @ u.T, u, lam


def test_tridiag_full_reortho_truncates_cleanly():
    """Past exhaustion the decomposition must truncate, not run away."""
    n, rank, depth = 64, 6, 20
    mat64, _, _ = _low_rank_spd(jax.random.PRNGKey(0), n, rank)
    alpha = 0.75
    mat = jnp.asarray(mat64, jnp.float32) + alpha * jnp.eye(n, dtype=jnp.float32)

    factorise = lanczos.tridiag(lambda v: mat @ v, depth, reortho="full")
    v0 = jax.random.normal(jax.random.PRNGKey(1), (n,), dtype=jnp.float32)
    (basis, (diags, offdiags)), (res, res_norm) = factorise(v0 / jnp.linalg.norm(v0))

    assert np.all(np.isfinite(np.asarray(basis)))
    assert np.all(np.isfinite(np.asarray(diags)))
    # The Krylov space has dimension rank+1 (range of U plus the alpha*I
    # direction); beyond it the recurrence must have truncated exactly.
    assert np.asarray(offdiags)[rank + 1 :].max(initial=0.0) == 0.0
    # Truncated trailing columns are exactly zero (not garbage).
    norms = np.linalg.norm(np.asarray(basis), axis=1)
    assert norms[rank + 2 :].max(initial=0.0) == 0.0
    # The live Ritz values stay inside the operator's spectral range.
    t_mat = np.diag(np.asarray(diags)) + np.diag(np.asarray(offdiags), 1)
    t_mat = t_mat + np.diag(np.asarray(offdiags), -1)
    live = rank + 2
    eigs = np.linalg.eigvalsh(t_mat[:live, :live])
    assert eigs.min() >= alpha - 1e-3
    assert eigs.max() <= alpha + 2.5 + 1e-3


@pytest.mark.parametrize("use_adjoint", [True, False])
def test_slq_logdet_rank_deficient_matches_dense(use_adjoint):
    """SLQ value and gradient stay finite and correct past exhaustion."""
    n, rank, depth = 48, 5, 16
    mat64, u, lam = _low_rank_spd(jax.random.PRNGKey(2), n, rank)

    def logdet_slq(log_alpha, key):
        alpha = jnp.exp(log_alpha)

        def matvec(v):
            mat = jnp.asarray(mat64, jnp.float32)
            return mat @ v + alpha * v

        integrand = lanczos.integrand_spd(
            bnn.slq_log_clipped(),
            depth,
            matvec,
            use_adjoints_for_tridiag=use_adjoint,
        )
        keys = jax.random.split(key, 64)
        probes = jax.vmap(
            lambda k: jax.random.rademacher(k, (n,), dtype=jnp.float32)
        )(keys)
        return jnp.mean(jax.vmap(integrand)(probes))

    key = jax.random.PRNGKey(3)
    log_alpha = jnp.asarray(0.1)
    value, grad = jax.value_and_grad(logdet_slq)(log_alpha, key)
    assert np.isfinite(float(value)), value
    assert np.isfinite(float(grad)), grad

    alpha = float(jnp.exp(log_alpha))
    dense = np.asarray(mat64) + alpha * np.eye(n)
    _, expected = np.linalg.slogdet(dense)
    # 64 Rademacher probes on a 48-dim operator: Monte-Carlo tolerance.
    np.testing.assert_allclose(float(value), expected, rtol=0.08)
    # d/dlog_alpha logdet = alpha * trace((A + alpha I)^{-1})
    expected_grad = alpha * np.trace(np.linalg.inv(dense))
    np.testing.assert_allclose(float(grad), expected_grad, rtol=0.08)


def test_adjoint_matches_backprop_past_exhaustion():
    """Closed-form adjoint == backprop oracle in the truncated regime."""
    n, rank, depth = 40, 4, 14
    mat64, _, _ = _low_rank_spd(jax.random.PRNGKey(4), n, rank)
    base = jnp.asarray(mat64, jnp.float32)

    def quad(theta, use_adjoint):
        def matvec(v, t):
            return base @ v + jnp.exp(t) * v

        integrand = lanczos.integrand_spd(
            bnn.slq_log_clipped(), depth, matvec,
            use_adjoints_for_tridiag=use_adjoint,
        )
        v0 = jax.random.normal(jax.random.PRNGKey(5), (n,), dtype=jnp.float32)
        return integrand(v0, theta)

    theta = jnp.asarray(-0.3)
    v_adj, g_adj = jax.value_and_grad(lambda t: quad(t, True))(theta)
    v_bp, g_bp = jax.value_and_grad(lambda t: quad(t, False))(theta)
    assert np.isfinite(float(g_adj)) and np.isfinite(float(g_bp))
    np.testing.assert_allclose(float(v_adj), float(v_bp), rtol=1e-5)
    np.testing.assert_allclose(float(g_adj), float(g_bp), rtol=1e-3, atol=1e-5)


def test_quadform_gradient_matches_eigh_autodiff_when_separated():
    """On well-separated spectra the DK VJP equals autodiff-through-eigh."""
    key = jax.random.PRNGKey(6)
    kd, ko = jax.random.split(key)
    diags = 1.0 + jax.random.uniform(kd, (12,), dtype=jnp.float32) * 3.0
    offdiags = 0.1 + 0.3 * jax.random.uniform(ko, (11,), dtype=jnp.float32)

    def via_dk(d, e):
        return lanczos._quadform_tridiag(jnp.log, d, e)

    def via_eigh(d, e):
        eigvals, eigvecs = lanczos._eigh_tridiag(d, e)
        u = eigvecs[0, :]
        return jnp.dot(u, jnp.log(eigvals) * u)

    np.testing.assert_allclose(via_dk(diags, offdiags), via_eigh(diags, offdiags))
    g_dk = jax.grad(via_dk, argnums=(0, 1))(diags, offdiags)
    g_ad = jax.grad(via_eigh, argnums=(0, 1))(diags, offdiags)
    # f32 (x64 off in tests): the two formulations round differently;
    # compare to f32 resolution relative to the gradient scale.
    for ours, oracle in zip(g_dk, g_ad):
        scale = np.abs(np.asarray(oracle)).max()
        np.testing.assert_allclose(ours, oracle, rtol=1e-4, atol=1e-5 * scale)


def test_quadform_gradient_finite_on_degenerate_spectrum():
    """Exactly-duplicate Ritz values: eigh autodiff NaNs, the DK VJP not."""
    diags = jnp.asarray([2.0, 1.0, 1.0, 0.0, 0.0], dtype=jnp.float32)
    offdiags = jnp.asarray([0.3, 0.0, 0.0, 0.0], dtype=jnp.float32)

    def log_clipped(x):
        eps = jnp.finfo(x.dtype).eps
        return jnp.log(jnp.where(x < eps, 1.0, x))

    value, grads = jax.value_and_grad(
        lambda d, e: lanczos._quadform_tridiag(log_clipped, d, e), argnums=(0, 1)
    )(diags, offdiags)
    assert np.isfinite(float(value))
    assert np.all(np.isfinite(np.asarray(grads[0])))
    assert np.all(np.isfinite(np.asarray(grads[1])))


def test_calibration_loss_finite_on_saturated_network():
    """End-to-end: the BNN calibration pipeline past Krylov exhaustion.

    A hand-built rank-deficient damped GGN stands in for the saturated
    3.7M-parameter MAP solution; rank 16 >> effective rank 5 forces the
    exhaustion the unguarded pipeline NaN'd on.
    """
    n, rank, depth = 48, 5, 16
    mat64, _, _ = _low_rank_spd(jax.random.PRNGKey(7), n, rank)
    base = jnp.asarray(mat64, jnp.float32)

    logdet_fun = bnn.solver_logdet_slq_implicit(
        lanczos_rank=depth, slq_num_samples=8, slq_num_batches=1, N=n
    )

    def loss(log_alpha, key):
        alpha = jnp.exp(log_alpha)
        matvec = lambda v: base @ v + alpha * v
        return logdet_fun(matvec, key)

    value, grad = jax.value_and_grad(loss)(jnp.asarray(0.0), jax.random.PRNGKey(8))
    assert np.isfinite(float(value))
    assert np.isfinite(float(grad))


def test_slq_batches_divide_probe_total():
    """slq_num_batches is a memory knob: fixed probe total, agreeing stats.

    Round-4 regression for the 3.7M-param rank-50 OOM: batches used to
    MULTIPLY the probe count, and lax.map's backward stacked every
    batch's Lanczos basis.  Now batches divide the total (remat keeps
    the working set one batch wide) so the batched estimator is the
    same Monte-Carlo estimator -- identical probe count, finite grads,
    and mean within Monte-Carlo error of the unbatched one.
    """
    n, rank = 40, 6
    mat64, _, _ = _low_rank_spd(jax.random.PRNGKey(3), n, n)
    base = jnp.asarray(mat64, jnp.float32) + 0.5 * jnp.eye(n, dtype=jnp.float32)
    matvec = lambda v: base @ v

    def run(num_batches):
        logdet_fun = bnn.solver_logdet_slq_implicit(
            lanczos_rank=rank,
            slq_num_samples=32,
            slq_num_batches=num_batches,
            N=n,
        )
        return jax.value_and_grad(
            lambda s, key: logdet_fun(lambda v: matvec(v) + s * v, key)
        )(jnp.asarray(0.1), jax.random.PRNGKey(11))

    v1, g1 = run(1)
    v4, g4 = run(4)
    assert np.isfinite(float(v4)) and np.isfinite(float(g4))
    # Same estimator class at the same probe budget: agreement within a
    # loose Monte-Carlo band (different key-split trees).
    exact = float(jnp.linalg.slogdet(base + 0.1 * jnp.eye(n))[1])
    assert abs(float(v1) - exact) < 0.35 * abs(exact) + 2.0
    assert abs(float(v4) - exact) < 0.35 * abs(exact) + 2.0

    with pytest.raises(ValueError, match="divisible"):
        bnn.solver_logdet_slq_implicit(
            lanczos_rank=rank, slq_num_samples=10, slq_num_batches=3, N=n
        )


# ---------------------------------------------------------------------------
# Fused Pallas kernels (interpret mode): the TPU auto-dispatch paths must
# truncate on exhaustion exactly like the guarded XLA forward, so results
# do not differ between the fused and XLA paths for the same call.
# ---------------------------------------------------------------------------

from lanczos_adjoints_tpu.krylov import arnoldi  # noqa: E402
from lanczos_adjoints_tpu.ops import (  # noqa: E402
    pallas_arnoldi,
    pallas_lanczos,
    sparse,
)

_INTERPRET = jax.default_backend() == "cpu"


def _diag_dia(diag_vals):
    n = len(diag_vals)
    idx = np.arange(n)
    mat = sparse.csr_from_coo(
        idx, idx, np.asarray(diag_vals, np.float32), shape=(n, n)
    )
    dia = sparse.dia_pack(mat)
    return dia, sparse.dia_values(dia, mat.data)


# 64 > _UNROLL_DEPTH_CAP also covers the looped masked-projection kernel.
@pytest.mark.parametrize("depth", [8, 64])
def test_fused_arnoldi_truncates_on_exhaustion(depth):
    """Krylov-dim-2 exhaustion: DGKS must truncate inside the kernel.

    ``v0`` supported on two coordinates of a diagonal operator with two
    distinct eigenvalues spans an exactly invariant 2-D subspace, so all
    rounding noise past step 2 lies IN the basis span and the DGKS
    second pass removes it deterministically (a dense random ``v0``
    leaves mostly-orthogonal noise and makes the ratio test knife-edge).
    The fused reortho=full kernels must zero-truncate (alive-masked
    divide + twice-is-enough detection) instead of emitting 0/0 NaNs or
    garbage Ritz directions, and must agree with the guarded XLA forward.
    """
    n = 256
    dia, vals = _diag_dia(np.where(np.arange(n) % 2 == 0, 1.0, 2.0))
    v0 = jnp.zeros(n).at[0].set(0.6).at[1].set(0.8)

    fused = pallas_arnoldi.hessenberg_dia_fused(
        dia, depth, reortho="full", interpret=_INTERPRET
    )
    Qf, Hf, resf, cf = fused(v0, vals)
    assert np.all(np.isfinite(np.asarray(Qf)))
    assert np.all(np.isfinite(np.asarray(Hf)))
    # Exhausted directions are exact zeros, not normalised noise.
    assert float(jnp.abs(Qf[:, 2:]).max()) == 0.0
    assert float(jnp.abs(resf).max()) == 0.0

    generic = arnoldi.hessenberg(sparse.dia_matvec_fn(dia), depth, reortho="full")
    Qg, Hg, resg, _cg = generic(v0, vals)
    assert jnp.allclose(Qf, Qg, atol=1e-5)
    assert jnp.allclose(Hf, Hg, atol=1e-5)

    def loss(v, p):
        Q, H, r, c = fused(v, p)
        return jnp.sum(Q**2) + jnp.sum(H**2) + jnp.sum(r**2) + c

    gv, gp = jax.grad(loss, argnums=(0, 1))(v0, vals)
    assert np.all(np.isfinite(np.asarray(gv)))
    assert np.all(np.isfinite(np.asarray(gp)))


def test_fused_lanczos_guarded_on_exact_breakdown():
    """A = c*I with a one-hot v0 exhausts at step 0, residual EXACTLY zero.

    (One-hot so the normalisation and alpha = x^T A x are exact in f32;
    the cancellation ``Ax - alpha x`` then leaves a true zero vector.)
    The fused three-term kernels used to divide 0/0 there; the guarded
    divide must leave exact zeros (matching krylov.tridiag's alive mask)
    and the fused adjoint must return finite gradients.
    """
    n, depth = 256, 6
    dia, vals = _diag_dia(1.5 * np.ones(n))
    v0 = jnp.zeros(n).at[7].set(1.0)

    fused = pallas_lanczos.tridiag_dia_fused(dia, depth, interpret=_INTERPRET)
    (X, (alphas, betas)), (x_res, beta_res) = fused(v0, vals)
    assert np.all(np.isfinite(np.asarray(X)))
    assert np.isclose(float(alphas[0]), 1.5, atol=1e-6)
    assert float(jnp.abs(betas).max()) == 0.0
    assert float(beta_res) == 0.0
    assert float(jnp.abs(X[1:]).max()) == 0.0

    ref = lanczos.tridiag(sparse.dia_matvec_fn(dia), depth, reortho="none")
    (Xr, (ar, br)), (xrr, brr) = ref(v0, vals)
    assert jnp.allclose(X, Xr, atol=1e-6)
    assert jnp.allclose(alphas, ar, atol=1e-6)
    assert jnp.allclose(betas, br, atol=1e-6)

    def loss(v, p):
        (Xs, (a, b)), (xr, brm) = fused(v, p)
        return jnp.sum(a) + jnp.sum(b) + jnp.sum(Xs[0] ** 2) + jnp.sum(xr * brm)

    gv, gp = jax.grad(loss, argnums=(0, 1))(v0, vals)
    assert np.all(np.isfinite(np.asarray(gv)))
    assert np.all(np.isfinite(np.asarray(gp)))


def test_clipped_mass_diagnostic_flags_rank_deficiency():
    """solver_clipped_mass_slq makes silent clipping observable."""
    n, rank = 48, 8
    mat64, _, _ = _low_rank_spd(jax.random.PRNGKey(5), n, rank)
    deficient = jnp.asarray(mat64, jnp.float32)  # rank 8 of 48
    full = deficient + 0.5 * jnp.eye(n, dtype=jnp.float32)

    diag = bnn.solver_clipped_mass_slq(
        lanczos_rank=16, slq_num_samples=64, slq_num_batches=1, N=n
    )
    key = jax.random.PRNGKey(6)
    mass_deficient = float(diag(lambda v: deficient @ v, key))
    mass_full = float(diag(lambda v: full @ v, key))
    # ~n - rank = 40 null directions vs none; loose Monte-Carlo bands.
    assert mass_deficient > 20.0
    assert abs(mass_full) < 2.0


def test_split_batches_warns_once_on_semantics_change():
    bnn._WARNED_BATCH_SEMANTICS = False
    with pytest.warns(UserWarning, match="DIVIDES"):
        bnn._split_batches(8, 2)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        bnn._split_batches(8, 2)  # one-time: silent now

