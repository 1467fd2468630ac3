"""Learner-stack tests: networks, IPPO train step, multi-chip dry run."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import rware_tpu
from rware_tpu.models import (
    ActorCritic,
    IPPOConfig,
    RecurrentActorCritic,
    build_train_step,
    init_runner,
    sample_action,
)


def test_actor_critic_shapes():
    model = ActorCritic()
    obs = jnp.zeros((3, 2, 71))
    params = model.init(jax.random.key(0), obs)
    logits, value = model.apply(params, obs)
    assert logits.shape == (3, 2, 5)
    assert value.shape == (3, 2)
    assert logits.dtype == jnp.float32


def test_recurrent_actor_critic():
    model = RecurrentActorCritic()
    obs = jnp.zeros((3, 2, 71))
    carry = model.initialize_carry((3, 2))
    params = model.init(jax.random.key(0), carry, obs)
    carry2, (logits, value) = model.apply(params, carry, obs)
    assert carry2.shape == carry.shape
    assert logits.shape == (3, 2, 5)
    assert value.shape == (3, 2)


def test_sample_action_matches_logp():
    logits = jax.random.normal(jax.random.key(0), (16, 5))
    action, logp = sample_action(jax.random.key(1), logits)
    ref = jax.nn.log_softmax(logits)[jnp.arange(16), action]
    np.testing.assert_allclose(np.asarray(logp), np.asarray(ref), rtol=1e-6)


def test_ippo_train_step_runs_and_updates_params():
    env = rware_tpu.make("rware-tiny-2ag-v2")
    cfg = IPPOConfig(n_envs=8, rollout_len=8, epochs=2, minibatches=2)
    runner, model, tx = init_runner(env, cfg, jax.random.key(0))
    train_step = jax.jit(build_train_step(env, model, tx, cfg))
    new_runner, metrics = train_step(runner)
    assert int(new_runner.update_idx) == 1
    # params changed
    diffs = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), runner.params, new_runner.params
    )
    assert max(jax.tree.leaves(diffs)) > 0
    for k in ("pg_loss", "v_loss", "entropy", "approx_kl", "reward_per_env"):
        assert np.isfinite(float(metrics[k])), k


def test_ippo_learns_on_trivial_signal():
    # Two updates shouldn't blow up KL or entropy (smoke-level sanity).
    env = rware_tpu.make("rware-tiny-2ag-v2")
    cfg = IPPOConfig(n_envs=16, rollout_len=16, epochs=2, minibatches=2)
    runner, model, tx = init_runner(env, cfg, jax.random.key(1))
    train_step = jax.jit(build_train_step(env, model, tx, cfg))
    for _ in range(3):
        runner, metrics = train_step(runner)
    assert float(metrics["entropy"]) > 0.5  # hasn't collapsed
    assert abs(float(metrics["approx_kl"])) < 0.5


def test_graft_entry_contract():
    import sys, os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    logits, value = out
    assert logits.shape[-1] == 5


def test_dryrun_multichip_8_devices():
    import sys, os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_block_minibatch_mode_trains():
    env = rware_tpu.make("rware-tiny-2ag-v2")
    cfg = IPPOConfig(
        n_envs=8, rollout_len=8, epochs=2, minibatches=2, minibatch_mode="block"
    )
    runner, model, tx = init_runner(env, cfg, jax.random.key(0))
    ts = jax.jit(build_train_step(env, model, tx, cfg))
    new_runner, metrics = ts(runner)
    assert np.isfinite(float(metrics["pg_loss"]))
    diffs = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), runner.params, new_runner.params
    )
    assert max(jax.tree.leaves(diffs)) > 0
