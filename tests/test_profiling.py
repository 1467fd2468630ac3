"""Profiling utilities: trace capture, annotations, throughput timing."""
import os

import jax
import jax.numpy as jnp

from rware_tpu.profiling import annotate, stopwatch, throughput, trace


def test_trace_writes_artifacts(tmp_path):
    with trace(str(tmp_path)):
        with annotate("test-compute"):
            jax.block_until_ready(jnp.arange(1000).sum())
    # jax.profiler writes a plugins/profile/<run>/ directory
    found = [
        os.path.join(root, f)
        for root, _, files in os.walk(tmp_path)
        for f in files
    ]
    assert found, "no trace artifacts written"


def test_throughput_returns_rate():
    f = jax.jit(lambda x: (x * 2).sum())
    x = jnp.arange(1024.0)
    secs, rate = throughput(f, x, repeats=2, items=1024)
    assert secs > 0
    assert rate > 0


def test_stopwatch_prints(capsys):
    with stopwatch("unit"):
        jax.block_until_ready(jnp.arange(10).sum())
    assert "[unit]" in capsys.readouterr().out
