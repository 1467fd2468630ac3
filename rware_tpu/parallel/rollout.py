"""Batched rollouts: the time axis as ``lax.scan``, the env axis as ``vmap``.

The reference advances one env one step per Python call
(``/root/reference/rware/warehouse.py:804``).  Here a full (B, T) rollout is a
single XLA program: ``vmap`` over the env batch, ``lax.scan`` over time, with
auto-reset at episode boundaries so device buffers never return to the host.
This is the engine's hot loop — everything in it must stay on device.
"""
from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from rware_tpu.core.engine import StepResult
from rware_tpu.core.env import Warehouse
from rware_tpu.core.state import WarehouseState


class Trajectory(NamedTuple):
    """Stacked (T, B, ...) rollout tensors (B absent for unbatched rollouts)."""

    obs: Any  # (T, B, N, ...) observations seen BEFORE each action
    actions: jax.Array  # (T, B, N) int32
    rewards: jax.Array  # (T, B, N) float32
    dones: jax.Array  # (T, B) bool
    info: dict


def autoreset_select(reset_fn, state, done):
    """Replace a single env's state with a fresh reset where ``done``.

    The canonical on-device autoreset: split the env's own key stream, draw
    the fresh state, and select leaf-wise.  vmap for a batch.  Shared by the
    rollout helpers and every learner.
    """
    reset_key, carry_key = jax.random.split(state.key)
    fresh = reset_fn(reset_key).replace(key=carry_key)
    return jax.tree.map(lambda a, b: jnp.where(done, a, b), fresh, state)


def random_policy(env: Warehouse) -> Callable:
    """(key, obs) -> uniform random actions, matching env action layout."""

    def policy(key: jax.Array, obs: Any) -> jax.Array:
        return env.sample_actions(key)

    return policy


def build_rollout_fn(
    env: Warehouse,
    policy: Optional[Callable] = None,
    *,
    n_steps: int,
    autoreset: bool = True,
) -> Callable[[WarehouseState, jax.Array], tuple]:
    """Returns ``rollout(state, key) -> (final_state, Trajectory)`` for ONE env.

    ``policy(key, obs) -> actions`` defaults to uniform random.  vmap the
    returned function for a batch; the scan stays inside the vmap so XLA sees
    one fused (B, T) program.
    """
    if policy is None:
        policy = random_policy(env)
    step_fn = env._step_fn
    reset_fn = env._reset_fn
    obs_fn = env._obs_fn

    def one_step(carry, key):
        state, obs = carry
        actions = policy(key, obs)
        res: StepResult = step_fn(state, actions)
        next_state, next_obs = res.state, res.obs
        if autoreset:
            next_state = autoreset_select(reset_fn, res.state, res.done)
            next_obs = jax.tree.map(
                lambda a, b: jnp.where(res.done, a, b), obs_fn(next_state), res.obs
            )
        out = (obs, actions, res.rewards, res.done, res.info)
        return (next_state, next_obs), out

    def rollout(state: WarehouseState, key: jax.Array):
        obs = obs_fn(state)
        keys = jax.random.split(key, n_steps)
        (final_state, _), (obs_t, act_t, rew_t, done_t, info_t) = jax.lax.scan(
            one_step, (state, obs), keys
        )
        return final_state, Trajectory(obs_t, act_t, rew_t, done_t, info_t)

    return rollout


def build_batched_rollout_fn(
    env: Warehouse,
    policy: Optional[Callable] = None,
    *,
    n_steps: int,
    autoreset: bool = True,
) -> Callable[[WarehouseState, jax.Array], tuple]:
    """Returns ``rollout(states, keys) -> (final_states, Trajectory)`` where
    every state leaf and key has a leading env-batch axis.  Output tensors are
    (T, B, ...): scan-major for learner consumption."""
    single = build_rollout_fn(env, policy, n_steps=n_steps, autoreset=autoreset)
    vmapped = jax.vmap(single)

    def rollout(states: WarehouseState, keys: jax.Array):
        final_states, traj = vmapped(states, keys)
        # vmap puts B in front: (B, T, ...) -> (T, B, ...)
        traj = jax.tree.map(lambda x: jnp.swapaxes(x, 0, 1), traj)
        return final_states, traj

    return rollout


def batched_reset(env: Warehouse, key: jax.Array, n_envs: int):
    """(states, obs) for ``n_envs`` parallel envs from one key."""
    keys = jax.random.split(key, n_envs)
    states = jax.vmap(env._reset_fn)(keys)
    return states, jax.vmap(env._obs_fn)(states)
