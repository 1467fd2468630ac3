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


def test_step_timer_summary():
    from rware_tpu.profiling import StepTimer

    t = StepTimer(skip_first=1)
    for _ in range(5):
        t.tick()
    s = t.summary()
    assert set(s) == {"step_ms_mean", "step_ms_p50", "step_ms_p95", "steps_per_s"}
    assert s["steps_per_s"] > 0


def test_aggregate_across_hosts_single_process():
    from rware_tpu.profiling import aggregate_across_hosts

    out = aggregate_across_hosts({"a": 1.5, "b": 2})
    assert out == {"a": 1.5, "b": 2.0}


def test_trace_window_writes_artifacts(tmp_path):
    import jax
    import jax.numpy as jnp

    from rware_tpu.profiling import TraceWindow

    tw = TraceWindow(str(tmp_path), start=1, n_steps=2)
    f = jax.jit(lambda x: (x * 2).sum())
    for i in range(5):
        tw.step(i)
        float(f(jnp.arange(8.0)))
    tw.close()
    files = list(tmp_path.rglob("*"))
    assert files, "trace window produced no artifacts"
