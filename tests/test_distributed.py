"""Multi-host helper tests on the virtual 8-device CPU mesh (single process)."""
import jax
import jax.numpy as jnp
import numpy as np

import rware_tpu
from rware_tpu.distributed import global_env_batch, initialize, run_with_recovery
from rware_tpu.models import IPPOConfig, build_train_step, init_runner
from rware_tpu.parallel import make_mesh


def test_initialize_single_process_noop():
    idx, count = initialize()
    assert idx == 0 and count == 1


def test_global_env_batch_single_host():
    env = rware_tpu.make("rware-tiny-2ag-v2")
    mesh = make_mesh()

    def make_local(start, count):
        keys = jax.vmap(lambda i: jax.random.key(i))(start + jnp.arange(count))
        states = jax.vmap(env._reset_fn)(keys)
        # keys aren't serialisable via make_array_from_process_local_data;
        # swap to key data for the assembly test
        return states.replace(key=jax.random.key_data(states.key))

    batch = global_env_batch(make_local, 16, mesh)
    assert batch.agent_x.shape == (16, 2)
    assert len(batch.agent_x.sharding.device_set) == 8


def test_run_with_recovery_happy_path(tmp_path):
    from rware_tpu.checkpoint import Checkpointer

    env = rware_tpu.make("rware-tiny-2ag-v2")
    cfg = IPPOConfig(n_envs=8, rollout_len=4, epochs=1, minibatches=1)
    runner, model, tx = init_runner(env, cfg, jax.random.key(0))
    train_step = jax.jit(build_train_step(env, model, tx, cfg))
    ckpt = Checkpointer(str(tmp_path / "rec"))
    seen = []
    runner = run_with_recovery(
        train_step,
        runner,
        n_updates=4,
        checkpointer=ckpt,
        checkpoint_every=2,
        on_metrics=lambda u, m: seen.append(u),
    )
    assert int(runner.update_idx) == 4
    assert seen == [1, 2, 3, 4]
    assert ckpt.latest_step == 4
    ckpt.close()


def test_run_with_recovery_restores_after_failure(tmp_path):
    from rware_tpu.checkpoint import Checkpointer

    env = rware_tpu.make("rware-tiny-2ag-v2")
    cfg = IPPOConfig(n_envs=8, rollout_len=4, epochs=1, minibatches=1)
    runner, model, tx = init_runner(env, cfg, jax.random.key(0))
    real_step = jax.jit(build_train_step(env, model, tx, cfg))
    ckpt = Checkpointer(str(tmp_path / "rec2"))

    calls = {"n": 0}

    def flaky_step(r):
        calls["n"] += 1
        if calls["n"] == 4:  # fail once mid-run (after checkpoint at 2)
            raise RuntimeError("injected device failure")
        return real_step(r)

    runner = run_with_recovery(
        flaky_step,
        runner,
        n_updates=5,
        checkpointer=ckpt,
        checkpoint_every=2,
        max_restarts=2,
    )
    # failure at call 4 (update 4) rewound to checkpointed update 2 and
    # replayed deterministically to 5
    assert int(runner.update_idx) == 5
    ckpt.close()
