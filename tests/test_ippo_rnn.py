"""Recurrent IPPO tests: carry handling, episode-boundary resets, updates."""
import jax
import jax.numpy as jnp
import numpy as np

import rware_tpu
from rware_tpu.models.ippo import IPPOConfig
from rware_tpu.models.ippo_rnn import build_rnn_train_step, init_rnn_runner


def test_rnn_train_step_runs():
    env = rware_tpu.make("rware-tiny-2ag-v2")
    cfg = IPPOConfig(n_envs=8, rollout_len=6, epochs=2, minibatches=2)
    runner, model, tx = init_rnn_runner(env, cfg, jax.random.key(0))
    ts = jax.jit(build_rnn_train_step(env, model, tx, cfg))
    new_runner, metrics = ts(runner)
    assert int(new_runner.update_idx) == 1
    assert new_runner.carry.shape == (8, 2, 128)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    # params moved
    diffs = jax.tree.map(
        lambda a, b: float(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)).max()),
        runner.params, new_runner.params,
    )
    assert max(jax.tree.leaves(diffs)) > 0


def test_carry_resets_on_episode_boundary():
    env = rware_tpu.make(
        rware_tpu.WarehouseConfig(n_agents=1, request_queue_size=1, max_steps=3)
    )
    cfg = IPPOConfig(n_envs=4, rollout_len=3, epochs=1, minibatches=1)
    runner, model, tx = init_rnn_runner(env, cfg, jax.random.key(0))
    ts = jax.jit(build_rnn_train_step(env, model, tx, cfg))
    new_runner, metrics = ts(runner)
    # every env hit max_steps=3 exactly at the end of the rollout
    assert int(metrics["episodes_done"]) == 4
    np.testing.assert_array_equal(
        np.asarray(new_runner.carry.astype(jnp.float32)), 0.0
    )


def test_rnn_is_stateful_across_steps():
    # same obs, different carries must give different logits (memory works)
    env = rware_tpu.make("rware-tiny-2ag-v2")
    cfg = IPPOConfig(n_envs=4, rollout_len=2, epochs=1, minibatches=1)
    runner, model, tx = init_rnn_runner(env, cfg, jax.random.key(0))
    obs = runner.obs
    zero = runner.carry
    c1, (logits1, _) = model.apply(runner.params, zero, obs)
    c2, (logits2, _) = model.apply(runner.params, c1, obs)
    assert not np.allclose(np.asarray(logits1), np.asarray(logits2))
