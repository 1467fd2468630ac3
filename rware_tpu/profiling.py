"""Profiling hooks: jax.profiler traces and named step annotations.

The reference's only perf artifact is an ad-hoc tqdm loop
(rware/warehouse.py:1043-1054).  Here: ``trace(dir)`` captures a perfetto/
tensorboard-compatible device trace around any code block, and
``annotate(name)`` scopes device ops under a label in that trace.
"""
from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace (view in tensorboard / perfetto)."""
    with jax.profiler.trace(log_dir):
        yield


def annotate(name: str):
    """Scope device ops under ``name`` in profiler traces."""
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def stopwatch(label: str, sync: bool = True) -> Iterator[None]:
    """Host-side wall-clock timer; blocks on device completion when sync."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if sync:
            # effects of the block may still be in flight
            jax.effects_barrier()
        print(f"[{label}] {time.perf_counter() - t0:.4f}s", flush=True)


def throughput(fn, *args, repeats: int = 3, items: Optional[int] = None):
    """Best-of-N wall time of a compiled callable; returns (seconds, items/s)."""
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best, (items / best if items else None)
