"""Krylov factorisations with custom reverse-mode adjoints."""

from lanczos_adjoints_tpu.krylov.arnoldi import hessenberg  # noqa: F401
from lanczos_adjoints_tpu.krylov.lanczos import (  # noqa: F401
    integrand_spd,
    integrand_spd_block,
    integrand_spd_custom_vjp_reuse,
    tridiag,
    tridiag_block,
)
