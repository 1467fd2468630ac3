"""Fused collector kernel: obs/policy parity and the pallas-IPPO train step.

All tests run the kernel in interpret+deterministic mode on CPU (the TPU
PRNG primitive has no CPU lowering; deterministic mode is RNG-free).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import rware_tpu
from rware_tpu.models import ActorCritic, IPPOConfig
from rware_tpu.models.ippo_pallas import (
    build_pallas_train_step,
    init_pallas_runner,
)
from rware_tpu.ops.pallas_rollout import ENV_BLOCK, build_pallas_collect
from rware_tpu.parallel import batched_reset


@pytest.fixture(scope="module")
def setup():
    env = rware_tpu.make("rware-tiny-2ag-v2")
    states, _ = batched_reset(env, jax.random.key(0), ENV_BLOCK)
    model = ActorCritic(n_actions=5)
    params = model.init(jax.random.key(1), jnp.zeros((1, 2, 71)))
    collect = build_pallas_collect(
        env.config, 16, tc_len=8, interpret=True, deterministic=True
    )
    new_state, traj = collect(states, params, 3)
    return env, states, model, params, new_state, traj


def test_in_kernel_obs_bit_exact(setup):
    env, states, model, params, new_state, traj = setup
    xla_obs = jax.vmap(env._obs_fn)(states)
    np.testing.assert_array_equal(
        np.asarray(traj["obs"][0], dtype=np.float32), np.asarray(xla_obs)
    )


def test_in_kernel_policy_matches_flax(setup):
    env, states, model, params, new_state, traj = setup
    xla_obs = jax.vmap(env._obs_fn)(states)
    logits, value = model.apply(params, xla_obs)
    # bf16-epsilon agreement between the two lowerings
    np.testing.assert_allclose(
        np.asarray(traj["value"][0]), np.asarray(value), atol=2e-2
    )
    # deterministic mode takes the argmax — must match flax exactly
    np.testing.assert_array_equal(
        np.asarray(traj["action"][0]),
        np.asarray(jnp.argmax(logits, -1)),
    )
    lsm = jax.nn.log_softmax(logits)
    lp_ref = np.take_along_axis(
        np.asarray(lsm), np.asarray(traj["action"][0])[..., None], -1
    )[..., 0]
    np.testing.assert_allclose(
        np.asarray(traj["logp"][0]), lp_ref, atol=2e-2
    )


def test_recorded_actions_replay_through_xla_engine(setup):
    env, states, model, params, new_state, traj = setup

    def replay(state, acts):
        def body(s, a):
            r = env._step_fn(s, a)
            return r.state, r.rewards

        return jax.lax.scan(body, state, acts)

    final, rews = jax.jit(
        jax.vmap(replay, in_axes=(0, 1), out_axes=(0, 1))
    )(states, jnp.asarray(traj["action"]))
    np.testing.assert_array_equal(
        np.asarray(final.agent_x), np.asarray(new_state.agent_x)
    )
    np.testing.assert_array_equal(
        np.asarray(final.agent_y), np.asarray(new_state.agent_y)
    )
    np.testing.assert_allclose(
        np.asarray(rews), np.asarray(traj["reward"])
    )


def test_obs_bit_exact_sensor_range_2():
    env = rware_tpu.make(rware_tpu.WarehouseConfig(sensor_range=2))
    L = env.config.flattened_obs_length  # 183
    states, _ = batched_reset(env, jax.random.key(0), ENV_BLOCK)
    model = ActorCritic(n_actions=5)
    params = model.init(jax.random.key(1), jnp.zeros((1, 2, L)))
    collect = build_pallas_collect(
        env.config, 4, tc_len=4, interpret=True, deterministic=True
    )
    _, traj = collect(states, params, 0)
    xla_obs = jax.vmap(env._obs_fn)(states)
    np.testing.assert_array_equal(
        np.asarray(traj["obs"][0], dtype=np.float32), np.asarray(xla_obs)
    )


def test_pallas_train_step_learns(setup):
    env = rware_tpu.make("rware-tiny-2ag-v2")
    cfg = IPPOConfig(n_envs=ENV_BLOCK, rollout_len=8, epochs=1, minibatches=2)
    runner, model, tx = init_pallas_runner(env, cfg, jax.random.key(0))
    ts = jax.jit(
        build_pallas_train_step(
            env, model, tx, cfg, interpret=True, deterministic_collect=True
        )
    )
    new_runner, metrics = ts(runner)
    assert int(new_runner.update_idx) == 1
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    diffs = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()),
        runner.params,
        new_runner.params,
    )
    assert max(jax.tree.leaves(diffs)) > 0
