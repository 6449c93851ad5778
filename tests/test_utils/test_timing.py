"""Timing helpers produce sane, positive measurements."""

import jax.numpy as jnp

from lanczos_adjoints_tpu.utils import timing


def test_slope_time_positive_and_reasonable():
    A = jnp.ones((256, 256))

    def fn(x):
        return A @ x

    t = timing.slope_time(fn, jnp.ones((256,)), reps=4, outer=2)
    # Slope of a trivially fast op on CPU: small but can be noisy;
    # just assert it is a finite float of plausible magnitude.
    assert isinstance(t, float)
    assert -1.0 < t < 1.0


def test_wallclock_time_positive():
    def fn(x):
        return jnp.sum(x**2)

    t = timing.wallclock_time(fn, jnp.ones((64,)))
    assert t >= 0.0
