#!/usr/bin/env python
"""Decompose the PPO update cost: gather strategy comparison (ad-hoc tool).

The pallas-IPPO train step spends ~208ms at B=4096,T=128 while the collect
kernel needs ~9ms — is the update dominated by random-index gathers of the
(T*B, N, L) dataset, the grads, or the optimizer?
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import optax

    import rware_tpu
    from rware_tpu.models import ActorCritic, IPPOConfig
    from rware_tpu.models.ippo import make_optimizer, ppo_loss, ppo_update_epochs

    env = rware_tpu.make("rware-tiny-2ag-v2")
    cfg = IPPOConfig(n_envs=4096, rollout_len=128, epochs=4, minibatches=4)
    model = ActorCritic(n_actions=5)
    key = jax.random.key(0)
    params = model.init(key, jnp.zeros((1, 2, 71)))
    tx = make_optimizer(cfg)
    opt_state = tx.init(params)

    n_data = cfg.n_envs * cfg.rollout_len
    dataset = (
        jax.random.normal(key, (n_data, 2, 71), jnp.float32),
        jax.random.randint(key, (n_data, 2), 0, 5, dtype=jnp.int32),
        jnp.zeros((n_data, 2)),
        jnp.zeros((n_data, 2)),
        jax.random.normal(key, (n_data, 2)),
        jax.random.normal(key, (n_data, 2)),
    )

    # A: the real update (4 epochs x 4 minibatches, random gathers).
    # dataset must be an ARGUMENT — closing over it bakes ~300MB of
    # constants into the program and overflows the remote-compile request.
    upd = jax.jit(
        lambda p, o, d, k: ppo_update_epochs(model, cfg, tx, p, o, d, k)
    )
    t = timeit(upd, params, opt_state, dataset, key)
    print(f"A full update 4x4:            {t*1e3:8.1f} ms", flush=True)

    # B: one fwd+bwd on a minibatch, no gather
    batch = jax.tree.map(lambda x: x[: n_data // 4], dataset)
    grad_fn = jax.jit(
        lambda p, b: jax.value_and_grad(ppo_loss, argnums=2, has_aux=True)(
            model, cfg, p, b
        )
    )
    t = timeit(grad_fn, params, batch)
    print(f"B single fwd+bwd (no gather): {t*1e3:8.1f} ms  (x16 = {16*t*1e3:.0f})", flush=True)

    # C: gathers alone: 16 random-index takes
    def gathers(dataset, key):
        def epoch(c, k):
            perm = jax.random.permutation(k, n_data)
            def mb(c, idx):
                b = jax.tree.map(lambda x: jnp.take(x, idx, axis=0), dataset)
                return c + b[0].sum(), None
            idxs = perm.reshape(cfg.minibatches, -1)
            c, _ = jax.lax.scan(mb, c, idxs)
            return c, None
        c, _ = jax.lax.scan(epoch, 0.0, jax.random.split(key, cfg.epochs))
        return c
    t = timeit(jax.jit(gathers), dataset, key)
    print(f"C 16 random gathers only:     {t*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
