"""Partial-Cholesky low-rank approximations and the Woodbury preconditioner.

Parity with reference ``src/matfree_extensions/low_rank.py``:
``preconditioner`` (low_rank.py:10), ``cholesky_partial`` (low_rank.py:63),
``cholesky_partial_pivot`` (low_rank.py:120).  All three forbid
differentiation through themselves via custom VJPs whose backward pass
raises -- preconditioners must not contribute gradients.

The kernel matrix is only accessed lazily through ``element(i, j)``;
columns are vmapped, which XLA vectorises into batched kernel
evaluations (MXU matmuls for dot-product kernels).
"""

import functools
from typing import Callable

import jax
import jax.numpy as jnp

from lanczos_adjoints_tpu.utils.precision import highest_precision


@jax.custom_vjp
@highest_precision
def woodbury_solve(chol: jax.Array, v: jax.Array, s):
    """``(s*I + L L^T)^{-1} v`` from a partial factor ``L`` (n, rank).

    The capacitance-matrix identity, exposed as a standalone function so
    a driver can build the factor in one executable and apply the solve
    in another (this environment kills executables running longer than
    ~90 s on-device; splitting the GP training step around this boundary
    is how the N=400k configuration runs).  Refuses to be differentiated,
    like the closure built by :func:`preconditioner`.
    """
    rank = jnp.shape(chol)[1]
    scaled = chol / jnp.sqrt(s)
    v_scaled = v / s
    capacitance = jnp.eye(rank) + scaled.T @ scaled
    cho = jax.scipy.linalg.cho_factor(capacitance)
    correction = jax.scipy.linalg.cho_solve(cho, scaled.T @ v_scaled)
    return v_scaled - scaled @ correction


def _woodbury_fwd(chol, v, s):
    return woodbury_solve(chol, v, s), None


def _woodbury_bwd(_cache, _cotangent):
    msg = "Preconditioners must not be differentiated through."
    raise RuntimeError(msg)


woodbury_solve.defvjp(_woodbury_fwd, _woodbury_bwd)


def preconditioner(cholesky: Callable, /) -> Callable:
    """Turn a partial Cholesky routine into a Woodbury solver factory.

    ``solve(v, s) ~= (s*I + L L^T)^{-1} v`` via the capacitance-matrix
    identity; ``s`` is the noise/shift.  The returned solver refuses to
    be differentiated.
    """

    def precondition(lazy_kernel: Callable, nrows: int, /):
        chol, info = cholesky(lazy_kernel, nrows)

        n_full, rank = jnp.shape(chol)
        assert rank <= n_full, (n_full, rank)

        def solve(v: jax.Array, s):
            return woodbury_solve(chol, v, s)

        return solve, info

    return precondition


def cholesky_partial(*, rank: int) -> Callable:
    """Rank-``rank`` partial Cholesky of a lazily-indexed matrix."""

    def cholesky(lazy_kernel: Callable, n: int, /):
        _check_rank(rank, n)
        with jax.default_matmul_precision("highest"):
            # precision resolves at trace time; the lazy kernel is
            # traced here by closure_convert
            element, aux_args = jax.closure_convert(lazy_kernel, 0, 0)
        return _cholesky(element, n, *aux_args)

    @functools.partial(jax.custom_vjp, nondiff_argnums=[0, 1])
    @highest_precision
    def _cholesky(element: Callable, n: int, *params):
        body = _partial_body(element, n, rank, *params)
        L = jnp.zeros((n, rank))
        return jax.lax.fori_loop(0, rank, body, L), {}

    def _fwd(*args):
        return _cholesky(*args), None

    def _bwd(*_args):
        msg = "Partial Cholesky factorisations must not be differentiated through."
        raise RuntimeError(msg)

    _cholesky.defvjp(_fwd, _bwd)
    return cholesky


def _partial_body(element: Callable, n: int, rank: int, *params):
    all_idx = jnp.arange(n)

    def column(i):
        return jax.vmap(lambda j: element(j, i, *params))(all_idx)

    def body(i, L):
        diag_el = element(i, i, *params)
        pivot = jnp.sqrt(diag_el - jnp.dot(L[i], L[i]))
        col = column(i) - L @ L[i, :]
        return L.at[:, i].set(col / pivot)

    return body


def cholesky_partial_pivot(*, rank: int) -> Callable:
    """Partial Cholesky with greedy diagonal pivoting.

    Each step pivots to the largest residual diagonal entry; the result
    is de-permuted so callers see the original ordering.  Info carries a
    ``success`` flag: False means the residual was numerically exhausted
    before ``rank`` columns and the factorisation truncated early
    (remaining columns zero) -- the output stays finite and usable,
    unlike the reference's NaN (see the in-body note).
    """

    def cholesky(lazy_kernel: Callable, n: int, /):
        _check_rank(rank, n)
        with jax.default_matmul_precision("highest"):
            # precision resolves at trace time; the lazy kernel is
            # traced here by closure_convert
            element, aux_args = jax.closure_convert(lazy_kernel, 0, 0)
        return _cholesky(element, n, *aux_args)

    @functools.partial(jax.custom_vjp, nondiff_argnums=[0, 1])
    @highest_precision
    def _cholesky(element: Callable, n: int, *params):
        body, initial_diag = _pivot_body(element, n, rank, *params)
        L = jnp.zeros((n, rank))
        perm = jnp.arange(n)
        diag0 = initial_diag(perm)
        # LAPACK pstrf-style exhaustion threshold: pivots below
        # n * eps * max(diag) are rounding noise, not signal.
        tol = n * jnp.finfo(diag0.dtype).eps * jnp.max(diag0)
        init = (L, perm, perm, diag0, True)
        body_tol = functools.partial(body, tol=tol)
        L, perm, _mp, _rd, success = jax.lax.fori_loop(0, rank, body_tol, init)
        return _unpermute_rows(L, perm), {"success": success}

    def _fwd(*args):
        return _cholesky(*args), None

    def _bwd(*_args):
        msg = "Partial Cholesky factorisations must not be differentiated through."
        raise RuntimeError(msg)

    _cholesky.defvjp(_fwd, _bwd)
    return cholesky


def _pivot_body(element: Callable, n: int, rank: int, *params):
    """Pivoted partial-Cholesky step with an incrementally-tracked
    residual diagonal.

    The reference (low_rank.py:159-210) recomputes the full diagonal and
    the row-norms of L every step -- O(n) lazy-kernel evaluations plus an
    O(n * rank) re-read of L per step, which dominates GP training time
    at rank ~500.  Tracking ``residual_diag`` in the carry (swap on
    pivot, subtract the new column's square) is mathematically identical
    and leaves one kernel-column evaluation as the only O(n) work per
    step.
    """
    all_idx = jnp.arange(n)

    def column_p(i, permute):
        return jax.vmap(lambda j: element(permute[j], permute[i], *params))(all_idx)

    def body(i, carry, *, tol):
        L, perm, matrix_perm, residual_diag, success = carry

        # Greedy pivot over the ACTIVE trailing block only: processed
        # slots 0..i-1 can retain a stale positive residual from
        # rounding, and re-selecting one would swap a finished column
        # back into play (benign under the tol guard, but the pivot
        # order would be ill-defined in the exhausted regime).
        active = all_idx >= i
        k = jnp.argmax(jnp.where(active, residual_diag, -jnp.inf))

        matrix_perm = _swap(matrix_perm, i, k)
        L = _swap_rows(L, i, k)
        perm = _swap(perm, i, k)
        residual_diag = _swap(residual_diag, i, k)

        pivot_sq = residual_diag[i]
        # Early-termination guard (deliberate divergence from reference
        # low_rank.py:200-204, which takes sqrt of a possibly-negative
        # pivot and lets NaN poison L while only flagging
        # success=False): once the pivot falls below the pstrf-style
        # rounding threshold the kernel is numerically exhausted at
        # f32 -- observed on UCI elevators when the learned noise drops
        # below ~0.014 -- and the remaining columns are set to zero,
        # which truncates the factorisation at its effective rank and
        # keeps the Woodbury solve finite.  Also pivot on the *signed*
        # residual diagonal (the abs of the reference can select a
        # rounding-negative entry) and clamp it at zero, which is exact
        # arithmetic's invariant anyway.
        safe = pivot_sq > tol
        pivot = jnp.sqrt(jnp.where(safe, pivot_sq, 1.0))
        col = column_p(i, matrix_perm) - L @ L[i, :]
        col = jnp.where(safe, col / pivot, 0.0)
        success = jnp.logical_and(success, safe)

        residual_diag = jnp.maximum(residual_diag - col**2, 0.0)
        return L.at[:, i].set(col), perm, matrix_perm, residual_diag, success

    def initial_diag(permute):
        return jax.vmap(lambda j: element(permute[j], permute[j], *params))(all_idx)

    return body, initial_diag


def cholesky_partial_pivot_blocked(*, rank: int, block: int = 64) -> Callable:
    """Partial Cholesky with *block*-greedy diagonal pivoting.

    The sequential variant (``cholesky_partial_pivot``) runs ``rank``
    dependent steps whose per-step work is one lazy kernel column and an
    ``(n, rank) @ (rank,)`` matvec -- MXU-hostile at TPU tile sizes.
    This variant selects the ``block`` largest residual-diagonal entries
    per sweep (``jax.lax.top_k``), evaluates the whole kernel panel at
    once, and applies the Schur-complement update as ``(n, rank) @
    (rank, block)`` matmuls: the same O(n rank^2) total FLOPs, but in
    rank/block MXU-shaped steps.

    The block selection is *greedy per sweep* instead of per column, so
    the pivot sequence (and hence L) differs slightly from the
    sequential variant; the approximation quality is equivalent in
    practice (tested: equal-rank residuals within a small factor).
    No row permutation is materialised -- columns are built directly in
    the original ordering.  Non-differentiable, like the other
    factorisations.  No reference counterpart (sequential only,
    low_rank.py:120-210); this is a TPU-shaped redesign.
    """
    if rank % block != 0:
        msg = f"rank={rank} must be a multiple of block={block}"
        raise ValueError(msg)

    def cholesky(lazy_kernel: Callable, n: int, /):
        _check_rank(rank, n)
        if block > n:
            msg = f"block={block} exceeds n={n}"
            raise ValueError(msg)
        with jax.default_matmul_precision("highest"):
            # precision resolves at trace time; the lazy kernel is
            # traced here by closure_convert
            element, aux_args = jax.closure_convert(lazy_kernel, 0, 0)
        return _cholesky(element, n, *aux_args)

    @functools.partial(jax.custom_vjp, nondiff_argnums=[0, 1])
    @highest_precision
    def _cholesky(element: Callable, n: int, *params):
        all_idx = jnp.arange(n)

        def panel(cols_idx):
            # (n, block) panel of kernel columns.
            return jax.vmap(
                lambda j: jax.vmap(lambda i: element(i, j, *params))(all_idx),
                out_axes=1,
            )(cols_idx)

        def sweep(s, carry):
            L, residual_diag, success = carry
            _, piv = jax.lax.top_k(jnp.abs(residual_diag), block)

            C = panel(piv) - L @ L[piv, :].T  # residual panel (n, block)
            S = C[piv, :]  # residual block (block, block)
            # Pseudo-inverse Schur update W W^T = C S^+ C^T: duplicate
            # data points make S exactly singular (plain Cholesky would
            # NaN -- observed on UCI protein), so factor through eigh
            # and drop the deficient directions.
            S = 0.5 * (S + S.T)
            w, Q = jnp.linalg.eigh(S)
            tol = block * jnp.finfo(w.dtype).eps * jnp.max(jnp.abs(w))
            inv_sqrt = jnp.where(w > tol, 1.0 / jnp.sqrt(jnp.maximum(w, tol)), 0.0)
            W = (C @ Q) * inv_sqrt
            success = jnp.logical_and(success, jnp.min(w) > -tol)

            L = jax.lax.dynamic_update_slice(L, W, (0, s * block))
            residual_diag = residual_diag - jnp.sum(W * W, axis=1)
            return L, residual_diag, success

        diag0 = jax.vmap(lambda i: element(i, i, *params))(all_idx)
        init = (jnp.zeros((n, rank)), diag0, True)
        L, _rd, success = jax.lax.fori_loop(0, rank // block, sweep, init)
        return L, {"success": success}

    def _fwd(*args):
        return _cholesky(*args), None

    def _bwd(*_args):
        msg = "Partial Cholesky factorisations must not be differentiated through."
        raise RuntimeError(msg)

    _cholesky.defvjp(_fwd, _bwd)
    return cholesky


def _swap(arr, i, j):
    ai, aj = arr[i], arr[j]
    return arr.at[i].set(aj).at[j].set(ai)


_swap_rows = _swap


def _unpermute_rows(arr, perm, /):
    return arr[jnp.argsort(perm)]


def _check_rank(rank: int, n: int):
    if rank > n:
        msg = f"Rank exceeds n: {rank} >= {n}."
        raise ValueError(msg)
    if rank < 1:
        msg = f"Rank must be positive, but {rank} < {1}."
        raise ValueError(msg)
