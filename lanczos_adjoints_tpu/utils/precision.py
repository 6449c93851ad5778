"""Matmul-precision scoping for numerically sensitive code paths.

TPU matmuls default to bfloat16 MXU passes (~3 decimal digits).  That is
fine for neural-network layers but poisons Krylov methods: a matvec with
1e-2 relative noise makes tight CG tolerances unreachable (the iteration
then drifts for ``maxiter`` steps), and Gram-Schmidt loses orthogonality
immediately.  The reference ran on GPUs where f32 is the default, so it
never had to spell this out; on TPU the library must.

``highest_precision`` wraps a closure so that everything traced inside it
-- including user-supplied matvec closures -- uses
``jax.default_matmul_precision("highest")`` (six-pass bf16 == full f32 on
the MXU).  The hot Pallas kernels are unaffected: they pin their own
``precision=`` per ``pl.dot``.

Cost: for the library's workloads the matmuls guarded here are either
bandwidth-bound (matvec contractions), transcendental-bound (kernel Gram
evaluation: exp dominates), or tiny (k x k tridiagonal algebra), so the
6x MXU-pass cost is not measurable end-to-end; correctness is.

A user who wants bf16 inside their own matvec can opt out by pinning
``precision=jax.lax.Precision.DEFAULT`` explicitly at their dot sites.
"""

import functools

import jax


def highest_precision(fn):
    """Trace ``fn`` under ``jax.default_matmul_precision("highest")``."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped
