"""Spaces, shapes, reproducibility and episode logic
(native analogue of /root/reference/tests/test_env.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import rware_tpu
from rware_tpu import ObservationType, WarehouseConfig


def test_grid_size_formula():
    # reference grid-size tests (tests/test_env.py:42-68)
    assert rware_tpu.make("rware-tiny-2ag-v2").grid_size == (11, 10)
    assert rware_tpu.make("rware-small-2ag-v2").grid_size == (20, 10)
    assert rware_tpu.make("rware-medium-2ag-v2").grid_size == (20, 16)
    assert rware_tpu.make("rware-large-2ag-v2").grid_size == (29, 16)


def test_flattened_obs_length_tiny_defaults():
    cfg = WarehouseConfig()  # tiny, 2 agents, sensor 1, msg 0
    assert cfg.flattened_obs_length == 71  # verified against reference


def test_flattened_obs_length_with_msg_bits():
    cfg = WarehouseConfig(msg_bits=2)
    assert cfg.flattened_obs_length == 8 + 9 * (5 + 2) + 9 * 2


def test_obs_shapes():
    env = rware_tpu.make("rware-tiny-2ag-v2")
    state, obs = env.reset(jax.random.key(0))
    assert obs.shape == (2, 71)

    env = rware_tpu.make("rware-img-tiny-2ag-v2")
    state, obs = env.reset(jax.random.key(0))
    assert obs.shape == (2, 5, 3, 3)  # default 5 layers, window 3x3

    env = rware_tpu.make("rware-imgdict-tiny-2ag-v2")
    state, obs = env.reset(jax.random.key(0))
    assert obs["image"].shape == (2, 5, 3, 3)
    assert obs["features"].shape == (2, 6)


def test_reset_spawns_are_valid():
    env = rware_tpu.make("rware-tiny-4ag-v2")
    h, w = env.grid_size
    for seed in range(5):
        state, _ = env.reset(jax.random.key(seed))
        xs = np.asarray(state.agent_x)
        ys = np.asarray(state.agent_y)
        assert (xs >= 0).all() and (xs < w).all()
        assert (ys >= 0).all() and (ys < h).all()
        # distinct cells
        assert len({(x, y) for x, y in zip(xs, ys)}) == 4
        # queue entries distinct and in range
        q = np.asarray(state.request_queue)
        assert len(set(q.tolist())) == len(q)
        assert (q >= 0).all() and (q < env.config.n_shelves).all()
        # shelves at home slots
        np.testing.assert_array_equal(
            np.asarray(state.shelf_x), env.layout.shelf_slots[:, 0]
        )


def test_same_key_same_trajectory():
    env = rware_tpu.make("rware-tiny-2ag-v2")

    def rollout(seed):
        state, obs = env.reset(jax.random.key(seed))
        traj = [np.asarray(obs)]
        for t in range(20):
            acts = env.sample_actions(jax.random.key(1000 + t))
            res = env.step(state, acts)
            state = res.state
            traj.append(np.asarray(res.obs))
        return traj

    a, b = rollout(3), rollout(3)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    c = rollout(4)
    assert any(not np.array_equal(x, y) for x, y in zip(a, c))


def test_autoreset_on_done():
    env = rware_tpu.make(
        WarehouseConfig(n_agents=1, request_queue_size=1, max_steps=2)
    )
    state, _ = env.reset(jax.random.key(0))
    res = env.step_autoreset(state, jnp.asarray([0]))
    assert int(res.state.cur_steps) == 1
    res = env.step_autoreset(res.state, jnp.asarray([0]))
    assert bool(res.done)
    assert int(res.state.cur_steps) == 0  # fresh episode state


def test_jit_matches_nonjit():
    env = rware_tpu.make("rware-tiny-2ag-v2")
    state, _ = env.reset(jax.random.key(0))
    acts = jnp.asarray([1, 1], dtype=jnp.int32)
    jitted = env.step(state, acts)
    eager = env._step_fn(state, acts)
    np.testing.assert_array_equal(
        np.asarray(jitted.obs), np.asarray(eager.obs)
    )
    np.testing.assert_array_equal(
        np.asarray(jitted.rewards), np.asarray(eager.rewards)
    )


def test_scan_rollout_runs():
    env = rware_tpu.make("rware-tiny-2ag-v2")
    state, _ = env.reset(jax.random.key(0))

    def body(state, key):
        res = env._step_fn(state, env.sample_actions(key))
        return res.state, res.rewards

    keys = jax.random.split(jax.random.key(1), 50)
    final, rews = jax.lax.scan(body, state, keys)
    assert rews.shape == (50, 2)
    assert int(final.cur_steps) == 50


def test_message_bits_roundtrip():
    env = rware_tpu.make(
        WarehouseConfig(n_agents=2, msg_bits=2, request_queue_size=2)
    )
    state, obs = env.reset(jax.random.key(0))
    acts = jnp.asarray([[0, 1, 0], [0, 0, 1]], dtype=jnp.int32)
    res = env.step(state, acts)
    np.testing.assert_array_equal(
        np.asarray(res.state.agent_message), [[1, 0], [0, 1]]
    )


def test_invalid_configs_raise():
    with pytest.raises(ValueError):
        WarehouseConfig(n_agents=0)
    with pytest.raises(ValueError):
        WarehouseConfig(shelf_columns=2)  # even columns unsupported
    with pytest.raises(ValueError):
        WarehouseConfig(request_queue_size=10_000)  # more than shelves
