"""Low-rank preconditioning."""

from lanczos_adjoints_tpu.precond.low_rank import (  # noqa: F401
    cholesky_partial,
    cholesky_partial_pivot,
    cholesky_partial_pivot_blocked,
    preconditioner,
    woodbury_solve,
)
