"""Benchmark timing utilities: on-device wall-clock via the R-slope protocol.

The reference times jitted calls with ``time.perf_counter`` around
``block_until_ready`` (reference benchmark.py:24-33).  On a TPU reached
through a relay (as in this environment) that measures the ~30 ms
per-call round trip, not the chip.  ``slope_time`` instead iterates the
workload R times *inside one jit* -- with a data dependency between
iterations so XLA cannot collapse them -- and reports the slope between
R=reps and R=1: pure on-device time per iteration.
"""

import contextlib
import functools
import time
from typing import Callable

import numpy as np


def slope_time(
    fn: Callable,
    *args,
    reps: int = 8,
    outer: int = 5,
    feedback_scale: float = 1e-12,
    min_window: float = 5e-3,
    max_reps: int = 4096,
    budget_s: float = 120.0,
    return_info: bool = False,
):
    """On-device seconds per evaluation of ``fn(*args)``.

    ``fn`` must map its first argument (an array) to an array of the
    same shape (or something summable); iterations are chained through
    a tiny feedback term so the compiler cannot dedupe them.

    Fast workloads auto-escalate ``reps`` until the measured window
    exceeds ``min_window`` seconds -- below that the relay's per-call
    jitter dominates and the slope can even come out negative.

    ``budget_s`` bounds the total wall clock of the measurement.  Heavy
    graphs must NOT auto-escalate: iterating a multi-second program
    thousands of times inside one XLA executable is exactly the
    observed TPU-worker-crash mode (3.7M-param rank-50 GGN step,
    round-4 phase1b: 3/3 worker crashes).  The iteration count is
    clamped to what fits the remaining budget, escalation stops when
    the next step would not fit, and if even a 2-rep slope is
    unaffordable the function falls back to a single-call wall-clock
    reading (dispatch overhead included) flagged ``resolved: False``
    rather than crashing the chip.

    ``return_info=True`` additionally returns ``{"resolved": bool,
    "window_s": float, "reps": int, "budget_exhausted": bool,
    "fallback_wallclock": bool}`` so benchmark scripts can refuse to
    persist sub-window (unreliable, possibly negative) readings instead
    of silently committing them.
    """
    import jax
    import jax.numpy as jnp

    first, *rest = args

    # ``rest`` is threaded through as traced jit arguments: capturing
    # large arrays in the closure would embed them in the lowered module
    # as dense literals (a 340 MB HLO for a 3M-nnz BSR operator, which
    # overflows remote-compile request limits).
    def repeated(first, *rest, reps):
        def body(_i, carry):
            x, acc = carry
            out = fn(x, *rest)
            out_flat = jax.flatten_util.ravel_pytree(out)[0]
            feedback = jnp.reshape(out_flat, -1)[: jnp.size(first)]
            feedback = jnp.reshape(feedback, jnp.shape(first)) if (
                jnp.size(first) == jnp.size(feedback)
            ) else jnp.zeros_like(first)
            return x + feedback_scale * feedback, acc + jnp.sum(out_flat)

        _x, acc = jax.lax.fori_loop(0, reps, body, (first, 0.0))
        return acc

    fn_one = jax.jit(functools.partial(repeated, reps=1))
    np.asarray(fn_one(first, *rest))  # compile + execute once
    t_start = time.perf_counter()
    np.asarray(fn_one(first, *rest))
    t_single = max(time.perf_counter() - t_start, 1e-9)

    def remaining():
        return budget_s - (time.perf_counter() - t_start)

    # Cost model for one measure(r): (outer + 1) many-calls (including
    # the compile/warmup one) at ~(dispatch + r * per-iteration) each,
    # plus outer one-calls at ~t_single.  Before any slope measurement
    # the per-iteration cost is unknown; assume t_single (the
    # compute-dominated worst case -- for heavy graphs this is exactly
    # right, which is what keeps the worker-crash mode out).  After each
    # measurement, refine with the measured slope so relay-dominated
    # tiny workloads (per-iteration microseconds, dispatch ~30 ms) are
    # not spuriously clamped below a resolvable window.
    per_est = t_single

    def measure_cost(r):
        return (outer + 1) * (t_single + r * per_est) + outer * t_single

    def affordable(r):
        return measure_cost(r) <= remaining()

    def measure(reps):
        fn_many = jax.jit(functools.partial(repeated, reps=reps))
        np.asarray(fn_many(first, *rest))
        t_many, t_one = [], []
        for _ in range(outer):
            t0 = time.perf_counter()
            np.asarray(fn_many(first, *rest))
            t_many.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            np.asarray(fn_one(first, *rest))
            t_one.append(time.perf_counter() - t0)
        window = float(np.median(t_many)) - float(np.median(t_one))
        return window / (reps - 1), window

    budget_exhausted = False
    if not affordable(2):
        # Even the smallest slope measurement would blow the budget:
        # report the single-call wall clock instead of crashing the chip.
        per_iter, window = t_single, 0.0
        reps = 1
        budget_exhausted = True
        fallback = True
    else:
        fallback = False
        reps = max(2, reps)
        while reps > 2 and not affordable(reps):
            reps //= 2
        per_iter, window = measure(reps)
        per_est = max(per_iter, 1e-9)
        while window < min_window and reps < max_reps:
            next_reps = min(max_reps, reps * 8)
            while next_reps > reps and not affordable(next_reps):
                next_reps //= 2
            if next_reps <= reps:
                budget_exhausted = True
                break
            reps = next_reps
            per_iter, window = measure(reps)
            per_est = max(per_iter, 1e-9)
    if window < min_window:
        import warnings

        why = "budget exhausted" if budget_exhausted else "slope unreliable"
        msg = (
            f"measurement window {window * 1e3:.2f} ms stayed below "
            f"{min_window * 1e3:.0f} ms at reps={reps}; {why}"
        )
        warnings.warn(msg, stacklevel=2)
    if return_info:
        info = {
            "resolved": bool(window >= min_window),
            "window_s": float(window),
            "reps": int(reps),
            "budget_exhausted": budget_exhausted,
            "fallback_wallclock": fallback,
        }
        return per_iter, info
    return per_iter


@contextlib.contextmanager
def profile_to(log_dir: str):
    """Capture a jax.profiler trace (TensorBoard format) for the block."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def wallclock_time(fn: Callable, *args, repeats: int = 5):
    """Reference-style host wall-clock (includes dispatch/transfer)."""
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))
