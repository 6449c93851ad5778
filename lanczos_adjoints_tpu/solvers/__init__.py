"""Matrix-free linear solvers."""

from lanczos_adjoints_tpu.solvers.cg import (  # noqa: F401
    cg_adaptive,
    cg_fixed_step,
    cg_fixed_step_reortho,
    krylov_solve_cg_fixed_step_reortho,
    pcg_adaptive,
    pcg_fixed_step,
    pcg_fixed_step_reortho,
)
