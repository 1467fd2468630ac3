"""Metrics & observability.

The reference's ``info`` is always ``{}`` (rware/warehouse.py:746-747); the
engine here returns structured per-step metrics (deliveries, failed moves)
in every StepResult, and this module turns trajectory tensors into episode
statistics on device plus a tiny host-side aggregator for logging loops.
"""
from __future__ import annotations

import time
from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class EpisodeStats(NamedTuple):
    """Aggregates over a (T, B, ...) trajectory batch (device scalars)."""

    total_reward: jax.Array  # () sum of all agent rewards
    reward_per_env_step: jax.Array  # () mean over (T, B)
    episodes_completed: jax.Array  # () number of done flags
    mean_episode_return: jax.Array  # () return per completed episode (proxy)
    deliveries: jax.Array  # () total deliveries (info metric)
    failed_move_rate: jax.Array  # () failed moves / (T*B*N)


def episode_stats(traj) -> EpisodeStats:
    """Compute EpisodeStats from a parallel.Trajectory (T, B, ...)."""
    t, b = traj.rewards.shape[0], traj.rewards.shape[1]
    n = traj.rewards.shape[2]
    total = traj.rewards.sum()
    episodes = traj.dones.sum()
    deliveries = traj.info["deliveries"].sum()
    failed = traj.info["failed_moves"].sum()
    return EpisodeStats(
        total_reward=total,
        reward_per_env_step=total / (t * b),
        episodes_completed=episodes,
        mean_episode_return=jnp.where(episodes > 0, total / episodes, 0.0),
        deliveries=deliveries,
        failed_move_rate=failed / (t * b * n),
    )


class MetricLogger:
    """Host-side running aggregator with steps/s accounting.

    ``log(step, metrics)`` accepts a dict of device or host scalars; values
    are fetched once (one device->host sync per call) and accumulated.
    """

    def __init__(self, print_every: int = 0):
        self.history: list = []
        self.print_every = print_every
        self._t0 = time.perf_counter()
        self._last_time = self._t0
        self._last_step = 0

    def log(self, step: int, metrics: Dict[str, Any], env_steps: int = 0) -> dict:
        now = time.perf_counter()
        entry = {k: float(v) for k, v in metrics.items()}
        entry["step"] = step
        entry["wall_s"] = now - self._t0
        if env_steps:
            entry["env_steps_per_s"] = env_steps / max(now - self._last_time, 1e-9)
        self._last_time = now
        self._last_step = step
        self.history.append(entry)
        if self.print_every and step % self.print_every == 0:
            parts = [f"step {step}"] + [
                f"{k}={v:.4g}" for k, v in entry.items() if k != "step"
            ]
            print("  ".join(parts), flush=True)
        return entry

    def summary(self) -> dict:
        if not self.history:
            return {}
        keys = [k for k in self.history[-1] if k != "step"]
        return {
            k: float(np.mean([h[k] for h in self.history if k in h])) for k in keys
        }
