"""Metrics aggregation tests."""
import jax
import numpy as np

import rware_tpu
from rware_tpu.metrics import EpisodeStats, MetricLogger, episode_stats
from rware_tpu.parallel import batched_reset, build_batched_rollout_fn


def test_episode_stats_from_trajectory():
    env = rware_tpu.make(
        rware_tpu.WarehouseConfig(n_agents=2, request_queue_size=2, max_steps=5)
    )
    B = 4
    states, _ = batched_reset(env, jax.random.key(0), B)
    rollout = jax.jit(build_batched_rollout_fn(env, n_steps=12))
    _, traj = rollout(states, jax.random.split(jax.random.key(1), B))
    stats = episode_stats(traj)
    assert isinstance(stats, EpisodeStats)
    # every env terminates at steps 5 and 10 within 12 steps
    assert int(stats.episodes_completed) == 2 * B
    assert np.isfinite(float(stats.failed_move_rate))
    assert 0.0 <= float(stats.failed_move_rate) <= 1.0


def test_metric_logger_accumulates():
    logger = MetricLogger(print_every=0)
    for step in range(1, 4):
        entry = logger.log(step, {"loss": 0.5 * step}, env_steps=100)
        assert entry["step"] == step
        assert "env_steps_per_s" in entry
    summary = logger.summary()
    assert abs(summary["loss"] - 1.0) < 1e-6
    assert len(logger.history) == 3
