"""Stochastic trace estimation and SLQ log-determinants."""

from lanczos_adjoints_tpu.trace.hutchinson import (  # noqa: F401
    hutchinson,
    hutchinson_batch,
    hutchinson_custom_vjp,
    hutchinson_nograd,
    sampler_normal,
    sampler_rademacher,
)
from lanczos_adjoints_tpu.trace.slq import (  # noqa: F401
    krylov_logdet_slq,
    krylov_logdet_slq_vjp_reuse,
)
