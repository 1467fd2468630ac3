"""Checkpoint/resume: bit-exact continuation of a training run."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import rware_tpu
from rware_tpu.checkpoint import Checkpointer, pack_keys, unpack_keys
from rware_tpu.models import IPPOConfig, build_train_step, init_runner


def test_pack_unpack_roundtrip():
    tree = {
        "key": jax.random.key(7),
        "x": jnp.arange(3),
        "empty": jnp.zeros((4, 0), dtype=jnp.float32),
        "nested": {"k": jax.random.split(jax.random.key(1), 5)},
    }
    packed = pack_keys(tree)
    # packed tree has no typed keys and no zero-size leaves
    for leaf in jax.tree.leaves(packed):
        assert not jnp.issubdtype(leaf.dtype, jax.dtypes.prng_key)
        assert leaf.size > 0
    restored = unpack_keys(packed)
    assert jnp.all(
        jax.random.key_data(restored["key"]) == jax.random.key_data(tree["key"])
    )
    assert restored["empty"].shape == (4, 0)
    assert restored["empty"].dtype == jnp.float32
    np.testing.assert_array_equal(
        jax.random.key_data(restored["nested"]["k"]),
        jax.random.key_data(tree["nested"]["k"]),
    )


def test_bit_exact_resume(tmp_path):
    env = rware_tpu.make("rware-tiny-2ag-v2")
    cfg = IPPOConfig(n_envs=8, rollout_len=8, epochs=1, minibatches=2)
    runner, model, tx = init_runner(env, cfg, jax.random.key(0))
    train_step = jax.jit(build_train_step(env, model, tx, cfg))

    # run 2 updates, checkpoint, run 2 more -> reference trajectory
    runner, _ = train_step(runner)
    runner, _ = train_step(runner)
    ckpt = Checkpointer(str(tmp_path / "ck"))
    ckpt.save(2, runner, wait=True)
    cont, m3 = train_step(runner)
    cont, m4 = train_step(cont)

    # restore and repeat: must match bit for bit
    restored = ckpt.restore(template=runner)
    r2, n3 = train_step(restored)
    r2, n4 = train_step(r2)
    for a, b in zip(jax.tree.leaves(m4), jax.tree.leaves(n4)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for name in ["agent_x", "agent_y", "request_queue", "cur_steps"]:
        np.testing.assert_array_equal(
            np.asarray(getattr(cont.env_states, name)),
            np.asarray(getattr(r2.env_states, name)),
        )
    for a, b in zip(jax.tree.leaves(cont.params), jax.tree.leaves(r2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    ckpt.close()


def test_restore_latest_and_missing(tmp_path):
    ckpt = Checkpointer(str(tmp_path / "empty"))
    with pytest.raises(FileNotFoundError):
        ckpt.restore()
    ckpt.close()


def test_sharded_runner_save_restore(tmp_path):
    """Mesh-sharded runner (env batch split over the 8-device CPU mesh)
    round-trips through orbax: restored values bit-exact, and restoring
    into a sharded template reproduces the sharding."""
    from rware_tpu.parallel import make_mesh, replicate, shard_env_batch

    env = rware_tpu.make("rware-tiny-2ag-v2")
    n_dev = len(jax.devices())
    cfg = IPPOConfig(n_envs=8 * n_dev, rollout_len=4, epochs=1, minibatches=2)
    runner, model, tx = init_runner(env, cfg, jax.random.key(0))
    mesh = make_mesh()
    sharded = runner.replace(
        env_states=shard_env_batch(runner.env_states, mesh),
        obs=shard_env_batch(runner.obs, mesh),
        params=replicate(runner.params, mesh),
        opt_state=replicate(runner.opt_state, mesh),
    )
    train_step = jax.jit(build_train_step(env, model, tx, cfg))
    sharded, _ = train_step(sharded)

    ckpt = Checkpointer(str(tmp_path / "ck"))
    ckpt.save(1, sharded, wait=True)
    restored = ckpt.restore(template=sharded)
    ckpt.close()

    for a, b in zip(jax.tree.leaves(sharded), jax.tree.leaves(restored)):
        if jnp.issubdtype(a.dtype, jax.dtypes.prng_key):
            a, b = jax.random.key_data(a), jax.random.key_data(b)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # the restored env batch is re-shardable and steppable on the mesh
    resumed = restored.replace(
        env_states=shard_env_batch(restored.env_states, mesh),
        obs=shard_env_batch(restored.obs, mesh),
    )
    cont, metrics = train_step(resumed)
    ref, ref_metrics = train_step(sharded)
    np.testing.assert_array_equal(
        np.asarray(cont.env_states.agent_x),
        np.asarray(ref.env_states.agent_x),
    )
