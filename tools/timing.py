"""Slope-based timing for the tunneled TPU backend.

A single dispatch + dependent-scalar fetch on this backend costs a fixed
~20-50 ms RTT that swamps kernel deltas (CLAUDE.md).  Sustained cost is
therefore measured as a SLOPE: the workload is applied K times inside one
jit with a serial data dependency (so XLA can neither hoist nor dedupe
iterations), and per-iteration cost is (t(1+N) - t(1)) / N — the fixed
dispatch/fetch overhead cancels exactly.  This matches production reality:
a training loop runs hundreds of steps between host syncs.
"""
import time

import jax
import numpy as np


def timed_call(fn, *args, repeats=3):
    """Best-of-N wall time of ``fn(*args)`` with an output-dependent scalar
    fetched to the host (completion proof on backends whose
    block_until_ready resolves at enqueue)."""
    float(np.asarray(fn(*args)))  # compile + warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(np.asarray(fn(*args)))
        best = min(best, time.perf_counter() - t0)
    return best


def chain(step_fn, extract, k):
    """jit a fn(carry) applying ``step_fn(i, carry) -> carry`` k times and
    returning ``extract(final_carry)`` (a scalar depending on every
    iteration's work)."""

    def run(carry):
        out = jax.lax.fori_loop(0, k, step_fn, carry)
        return extract(out)

    return jax.jit(run)


def slope(step_fn, extract, carry, iters=8, repeats=3):
    """Per-iteration seconds of ``step_fn`` (and the K=1 dispatch floor)."""
    base = timed_call(chain(step_fn, extract, 1), carry, repeats=repeats)
    long = timed_call(
        chain(step_fn, extract, 1 + iters), carry, repeats=repeats
    )
    return (long - base) / iters, base
