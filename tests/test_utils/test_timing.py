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


def test_slope_time_budget_fallback_never_escalates():
    """A zero budget must fall back to one wall-clock call, not escalate.

    Regression for the TPU-worker-crash mode: auto-escalation used to
    iterate heavy graphs up to 4096x inside one executable regardless
    of their cost.
    """
    calls = []

    def fn(x):
        calls.append(1)
        return x * 2.0

    t, info = timing.slope_time(
        fn, jnp.ones((8,)), budget_s=0.0, return_info=True
    )
    assert t > 0.0
    assert info["fallback_wallclock"] is True
    assert info["budget_exhausted"] is True
    assert info["resolved"] is False
    assert info["reps"] == 1
    # Traced at most twice (reps=1 program only); never a 4096-rep trace.
    assert len(calls) <= 2


def test_slope_time_budget_stops_escalation():
    """With an unreachable window the loop must stop on budget, not crash.

    The workload has a real per-iteration cost (a 512x512 matmul) so the
    refined cost model -- which charges escalation at the *measured*
    slope, not the dispatch-dominated single-call time -- still finds
    4096 reps unaffordable inside the small budget.
    """
    A = jnp.ones((1024, 1024))
    t, info = timing.slope_time(
        lambda x: A @ x,
        jnp.ones((1024, 1024)),
        reps=2,
        outer=2,
        min_window=1e9,  # never reachable
        budget_s=0.5,
        return_info=True,
    )
    assert info["resolved"] is False
    assert info["budget_exhausted"] is True
    assert info["reps"] < 4096
