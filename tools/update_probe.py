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
    # fetch a leaf value to host: block_until_ready resolves at enqueue on
    # this backend, so only a host fetch proves completion
    def sync(out):
        leaf = jax.tree.leaves(out)[0]
        return float(np.asarray(leaf).reshape(-1)[0])

    sync(fn(*args))
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        sync(fn(*args))
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

    # D: update with contiguous-block minibatches (no permutation gather):
    # minibatch m = dataset[m::M] strided view? No — contiguous slices with a
    # random per-epoch offset (roll), sequential HBM reads
    def block_update(params, opt_state, dataset, key):
        n_mb = cfg.minibatches
        mb = n_data // n_mb

        def epoch(carry, k):
            params, opt_state = carry
            off = jax.random.randint(k, (), 0, n_data)
            rolled = jax.tree.map(lambda x: jnp.roll(x, off, axis=0), dataset)

            def minibatch(carry, i):
                params, opt_state = carry
                b = jax.tree.map(
                    lambda x: jax.lax.dynamic_slice_in_dim(x, i * mb, mb, 0),
                    rolled,
                )
                (loss, metrics), grads = jax.value_and_grad(
                    ppo_loss, argnums=2, has_aux=True
                )(model, cfg, params, b)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), metrics

            return jax.lax.scan(
                minibatch, (params, opt_state), jnp.arange(n_mb)
            )

        return jax.lax.scan(
            epoch, (params, opt_state), jax.random.split(key, cfg.epochs)
        )

    t = timeit(jax.jit(block_update), params, opt_state, dataset, key)
    print(f"D block-minibatch update 4x4: {t*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
