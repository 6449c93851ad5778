"""Blocked multi-RHS Lanczos vs vmapped single-probe recurrences."""

import jax
import jax.numpy as jnp
import pytest

from lanczos_adjoints_tpu.krylov import lanczos
from lanczos_adjoints_tpu.utils import test_util


def _spd(n):
    eigvals = jnp.linspace(1.0, 4.0, n)
    return test_util.symmetric_matrix_from_eigenvalues(eigvals)


def _matvec(v, A):
    return A @ v  # works for (n,) and (n, m)


@pytest.mark.parametrize("custom_vjp", [True, False])
def test_block_matches_vmapped_tridiag(custom_vjp):
    n, m, depth = 24, 5, 8
    A = _spd(n)
    V = jax.random.normal(jax.random.PRNGKey(0), (n, m))

    blocked = lanczos.tridiag_block(_matvec, depth, custom_vjp=custom_vjp)
    single = lanczos.tridiag(_matvec, depth, reortho="none", custom_vjp=custom_vjp)

    (xs_b, (al_b, be_b)), (r_b, rb_b) = blocked(V, A)

    def run_one(v):
        (xs, (al, be)), (r, rb) = single(v, A)
        return xs, al, be, r, rb

    xs_s, al_s, be_s, r_s, rb_s = jax.vmap(run_one, in_axes=1, out_axes=-1)(V)
    # vmapped single: xs_s is (depth, n, m) with out_axes=-1.
    assert jnp.allclose(al_b, al_s, atol=1e-5)
    assert jnp.allclose(be_b, be_s, atol=1e-5)
    assert jnp.allclose(xs_b, xs_s, atol=1e-5)
    assert jnp.allclose(r_b, r_s, atol=1e-5)
    assert jnp.allclose(rb_b, rb_s, atol=1e-5)


def test_block_adjoint_matches_autodiff():
    """dV matches autodiff exactly; dA matches in its symmetric part.

    The closed-form adjoint is derived for symmetric operators, so the
    antisymmetric component of the dense-matrix gradient differs from
    backprop (both are valid cotangents of the symmetric-operator
    function) -- the same property the single-probe adjoint has.
    """
    n, m, depth = 20, 4, 6
    A = _spd(n)
    V = jax.random.normal(jax.random.PRNGKey(1), (n, m))

    def loss(fn, vv, a):
        (xs, (al, be)), (r, rb) = fn(vv, a)
        return jnp.sum(al) + jnp.sum(be**2) + jnp.sum(xs[-1] ** 2) + jnp.sum(rb)

    adj = lanczos.tridiag_block(_matvec, depth, custom_vjp=True)
    ref = lanczos.tridiag_block(_matvec, depth, custom_vjp=False)

    ga = jax.grad(lambda vv, a: loss(adj, vv, a), argnums=(0, 1))(V, A)
    gr = jax.grad(lambda vv, a: loss(ref, vv, a), argnums=(0, 1))(V, A)
    assert jnp.allclose(ga[0], gr[0], atol=1e-4, rtol=1e-4), float(
        jnp.max(jnp.abs(ga[0] - gr[0]))
    )
    sym = lambda g: 0.5 * (g + g.T)  # noqa: E731
    assert jnp.allclose(sym(ga[1]), sym(gr[1]), atol=1e-4, rtol=1e-4), float(
        jnp.max(jnp.abs(sym(ga[1]) - sym(gr[1])))
    )

    # And the blocked custom adjoint is exactly the vmapped single one.
    single = lanczos.tridiag(_matvec, depth, reortho="none", custom_vjp=True)

    def loss_single(vv, a):
        def one(v):
            (xs, (al, be)), (r, rb) = single(v, a)
            return jnp.sum(al) + jnp.sum(be**2) + jnp.sum(xs[-1] ** 2) + jnp.sum(rb)

        return jnp.sum(jax.vmap(one, in_axes=1)(vv))

    gs = jax.grad(loss_single, argnums=(0, 1))(V, A)
    for a, b in zip(ga, gs):
        assert jnp.allclose(a, b, atol=1e-5), float(jnp.max(jnp.abs(a - b)))


def test_block_reortho_full_matches_vmapped_full():
    """Re-orthogonalised blocked recurrences match tridiag(reortho='full')
    on an ill-conditioned spectrum where plain Lanczos loses orthogonality."""
    n, m, depth = 48, 3, 20
    eigvals = jnp.concatenate(
        [jnp.logspace(-4, 0, n - 4), jnp.asarray([2.0, 4.0, 8.0, 16.0])]
    )
    A = test_util.symmetric_matrix_from_eigenvalues(eigvals)
    V = jax.random.normal(jax.random.PRNGKey(4), (n, m))

    blocked = lanczos.tridiag_block(_matvec, depth, reortho="full")
    single = lanczos.tridiag(_matvec, depth, reortho="full", custom_vjp=True)

    (_xs_b, (al_b, be_b)), _rem_b = blocked(V, A)

    def run_one(v):
        (_xs, (al, be)), _rem = single(v, A)
        return al, be

    al_s, be_s = jax.vmap(run_one, in_axes=1, out_axes=-1)(V)
    assert jnp.allclose(al_b, al_s, atol=1e-3, rtol=1e-3), float(
        jnp.max(jnp.abs(al_b - al_s))
    )
    assert jnp.allclose(be_b, be_s, atol=1e-3, rtol=1e-3), float(
        jnp.max(jnp.abs(be_b - be_s))
    )


def test_blocked_integrand_matches_vmapped():
    n, m, depth = 32, 6, 10
    A = _spd(n)
    V = jax.random.normal(jax.random.PRNGKey(2), (n, m))

    blocked = lanczos.integrand_spd_block(jnp.log, depth, _matvec, reortho="none")
    single = lanczos.integrand_spd(jnp.log, depth, _matvec, reortho="none")

    vals_b = blocked(V, A)
    vals_s = jax.vmap(lambda v: single(v, A))(V.T)
    assert jnp.allclose(vals_b, vals_s, atol=1e-4, rtol=1e-4)

    # Gradients through the estimate agree too.
    gb = jax.grad(lambda a: jnp.mean(blocked(V, a)))(A)
    gs = jax.grad(lambda a: jnp.mean(jax.vmap(lambda v: single(v, a))(V.T)))(A)
    assert jnp.allclose(gb, gs, atol=1e-4, rtol=1e-4), float(jnp.max(jnp.abs(gb - gs)))


@pytest.mark.parametrize(
    ("spectrum", "rel_tol"),
    [
        ("noise_shifted", 1e-4),  # the SLQ training regime
        ("harsh", 1e-4),  # cond ~1.6e4 at depth 12: re-projection holds
    ],
)
def test_block_reortho_full_adjoint_vs_autodiff(spectrum, rel_tol):
    """The RE-PROJECTED blocked adjoint, pinned against backprop.

    ``tridiag_block(reortho="full")``'s backward pass re-projects the
    adjoint vectors against the per-probe basis (the blocked port of
    the Arnoldi ``reortho="full"`` adjoint, reference
    arnoldi.py:201-204), so the gradient matches autodiff at the same
    tolerance as the per-probe path on BOTH benign and severely
    ill-conditioned spectra (the round-2 un-re-projected adjoint erred
    at ~5e-2 relative on the harsh case).
    """
    n, m, depth = 48, 3, 12
    if spectrum == "noise_shifted":
        eigvals = jnp.linspace(0.3, 17.0, n)
    else:
        eigvals = jnp.concatenate(
            [jnp.logspace(-3, 0, n - 4), jnp.asarray([2.0, 4.0, 8.0, 16.0])]
        )
    A = test_util.symmetric_matrix_from_eigenvalues(eigvals)
    V = jax.random.normal(jax.random.PRNGKey(5), (n, m))

    def quadform(fn, vv, a):
        (_xs, (al, be)), _rem = fn(vv, a)
        return jnp.sum(al) + jnp.sum(be**2)

    adj = lanczos.tridiag_block(_matvec, depth, reortho="full", custom_vjp=True)
    ref = lanczos.tridiag_block(_matvec, depth, reortho="full", custom_vjp=False)

    ga = jax.grad(lambda vv, a: quadform(adj, vv, a), argnums=(0, 1))(V, A)
    gr = jax.grad(lambda vv, a: quadform(ref, vv, a), argnums=(0, 1))(V, A)
    sym = lambda g: 0.5 * (g + g.T)  # noqa: E731
    rel_v = jnp.max(jnp.abs(ga[0] - gr[0])) / jnp.max(jnp.abs(gr[0]))
    rel_a = jnp.max(jnp.abs(sym(ga[1]) - sym(gr[1]))) / jnp.max(jnp.abs(sym(gr[1])))
    assert rel_v < rel_tol, float(rel_v)
    assert rel_a < rel_tol, float(rel_a)


def test_block_reortho_full_adjoint_hilbert_x64():
    """Hilbert-matrix spectrum in x64: the regime the re-projection
    exists for (reference arnoldi adjoint test, Hilbert x64 variant).

    Pins the blocked re-projected adjoint against (a) backprop through
    the blocked forward and (b) the vmapped per-probe
    ``tridiag(reortho="full")`` adjoint, at the per-probe path's own
    tolerance.
    """
    jax.config.update("jax_enable_x64", True)
    try:
        from lanczos_adjoints_tpu.utils import exp_util

        n, m, depth = 15, 3, 10
        A_half = jnp.tril(exp_util.hilbert(n))
        A_half = A_half - 0.5 * jnp.diag(jnp.diag(A_half))

        def matvec(s, p):
            return (p + p.T) @ s

        V = jax.random.normal(jax.random.PRNGKey(7), (n, m), dtype=A_half.dtype)

        def quadform(fn, vv, a):
            (_xs, (al, be)), _rem = fn(vv, a)
            return jnp.sum(al) + jnp.sum(be**2)

        adj = lanczos.tridiag_block(matvec, depth, reortho="full", custom_vjp=True)
        ref = lanczos.tridiag_block(matvec, depth, reortho="full", custom_vjp=False)
        ga = jax.grad(lambda vv, a: quadform(adj, vv, a), argnums=(0, 1))(V, A_half)
        gr = jax.grad(lambda vv, a: quadform(ref, vv, a), argnums=(0, 1))(V, A_half)
        tol = 100 * jnp.sqrt(jnp.finfo(jnp.float64).eps)
        assert jnp.allclose(ga[0], gr[0], atol=tol, rtol=tol), float(
            jnp.max(jnp.abs(ga[0] - gr[0]))
        )
        assert jnp.allclose(ga[1], gr[1], atol=tol, rtol=tol), float(
            jnp.max(jnp.abs(ga[1] - gr[1]))
        )

        # Agreement with the vmapped per-probe re-projected adjoint.
        single = lanczos.tridiag(matvec, depth, reortho="full", custom_vjp=True)

        def quadform_single(vv, a):
            def one(v):
                (_xs, (al, be)), _rem = single(v, a)
                return jnp.sum(al) + jnp.sum(be**2)

            return jnp.sum(jax.vmap(one, in_axes=1)(vv))

        gs = jax.grad(quadform_single, argnums=(0, 1))(V, A_half)
        assert jnp.allclose(ga[0], gs[0], atol=tol, rtol=tol), float(
            jnp.max(jnp.abs(ga[0] - gs[0]))
        )
        assert jnp.allclose(ga[1], gs[1], atol=tol, rtol=tol), float(
            jnp.max(jnp.abs(ga[1] - gs[1]))
        )
    finally:
        jax.config.update("jax_enable_x64", False)
