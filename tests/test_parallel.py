"""Rollout and mesh-sharding tests (8 virtual CPU devices via conftest)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import rware_tpu
from rware_tpu.parallel import (
    batched_reset,
    build_batched_rollout_fn,
    build_rollout_fn,
    env_sharding,
    make_mesh,
    shard_env_batch,
)


def test_rollout_shapes():
    env = rware_tpu.make("rware-tiny-2ag-v2")
    state, _ = env.reset(jax.random.key(0))
    rollout = jax.jit(build_rollout_fn(env, n_steps=10))
    final, traj = rollout(state, jax.random.key(1))
    assert traj.obs.shape == (10, 2, 71)
    assert traj.actions.shape == (10, 2)
    assert traj.rewards.shape == (10, 2)
    assert traj.dones.shape == (10,)
    assert int(final.cur_steps) == 10


def test_batched_rollout_time_major():
    env = rware_tpu.make("rware-tiny-2ag-v2")
    B = 4
    states, _ = batched_reset(env, jax.random.key(0), B)
    rollout = jax.jit(build_batched_rollout_fn(env, n_steps=7))
    final, traj = rollout(states, jax.random.split(jax.random.key(1), B))
    assert traj.obs.shape == (7, B, 2, 71)
    assert traj.rewards.shape == (7, B, 2)
    assert traj.dones.shape == (7, B)


def test_rollout_autoreset_keeps_running():
    env = rware_tpu.make(
        rware_tpu.WarehouseConfig(n_agents=1, request_queue_size=1, max_steps=3)
    )
    state, _ = env.reset(jax.random.key(0))
    rollout = jax.jit(build_rollout_fn(env, n_steps=10))
    final, traj = rollout(state, jax.random.key(1))
    # episodes end every 3 steps and restart
    assert np.asarray(traj.dones).sum() == 3
    assert int(final.cur_steps) == 1  # 10 = 3+3+3+1


def test_mesh_sharded_rollout_matches_single_device():
    env = rware_tpu.make("rware-tiny-2ag-v2")
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    B = 16
    states, _ = batched_reset(env, jax.random.key(0), B)
    keys = jax.random.split(jax.random.key(1), B)
    rollout = jax.jit(build_batched_rollout_fn(env, n_steps=5))

    final_plain, traj_plain = rollout(states, keys)

    mesh = make_mesh()
    sharded_states = shard_env_batch(states, mesh)
    sharded_keys = jax.device_put(keys, env_sharding(mesh))
    final_shard, traj_shard = rollout(sharded_states, sharded_keys)

    np.testing.assert_array_equal(
        np.asarray(traj_plain.rewards), np.asarray(traj_shard.rewards)
    )
    np.testing.assert_array_equal(
        np.asarray(traj_plain.obs), np.asarray(traj_shard.obs)
    )
    # outputs actually came back sharded over the env axis
    assert len(traj_shard.rewards.sharding.device_set) == 8


def test_shard_env_batch_places_leaves():
    env = rware_tpu.make("rware-tiny-2ag-v2")
    states, _ = batched_reset(env, jax.random.key(0), 8)
    mesh = make_mesh()
    sharded = shard_env_batch(states, mesh)
    assert len(sharded.agent_x.sharding.device_set) == 8
