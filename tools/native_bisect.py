#!/usr/bin/env python
"""Bisect the native-layout pallas-IPPO train step cost on the accelerator.

Times, as separate jitted programs:
  A collect kernel only
  B collect + last_value + native GAE (no update)
  C B + per-epoch rolls of the dataset (no sgd)
  D B + E x M sgd steps on FIXED slices (no roll)
  E the full native train step
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=3):
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
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-envs", type=int, default=4096)
    ap_args = ap.parse_args()

    import optax

    import rware_tpu
    from rware_tpu.models import IPPOConfig
    from rware_tpu.models.ippo import make_optimizer
    from rware_tpu.models.ippo_pallas import (
        _RB_AXES,
        build_pallas_train_step,
        compute_gae_native,
        init_pallas_runner,
        ppo_loss_native,
        _pick_tc_len,
    )
    from rware_tpu.ops.pallas_rollout import LANE, build_pallas_collect

    env = rware_tpu.make("rware-tiny-2ag-v2")
    cfg = IPPOConfig(n_envs=ap_args.n_envs, rollout_len=128)
    runner, model, tx = init_pallas_runner(env, cfg, jax.random.key(0))
    collect = build_pallas_collect(
        env.config, cfg.rollout_len, tc_len=_pick_tc_len(cfg.rollout_len),
        native_traj=True,
    )
    obs_fn = jax.vmap(env._obs_fn)
    rb = cfg.n_envs // LANE
    n = env.n_agents

    def a_collect(runner):
        st, traj = collect(runner.env_states, runner.params, 1)
        return traj["reward"].sum() + st.agent_x.sum()

    def make_dataset(runner):
        st, traj = collect(runner.env_states, runner.params, 1)
        obs = obs_fn(st)
        _, last_value = model.apply(runner.params, obs)
        lv = jnp.swapaxes(last_value, 0, 1).reshape(n, rb, LANE)
        adv, tgt = compute_gae_native(
            cfg, traj["reward"], traj["value"], traj["done"], lv
        )
        return (
            traj["obs"], traj["action"], traj["logp"], traj["value"], adv, tgt
        )

    def b_gae(runner):
        ds = make_dataset(runner)
        return ds[4].sum() + ds[0].astype(jnp.float32).sum()

    def c_rolls(runner, key):
        ds = make_dataset(runner)
        acc = jnp.float32(0)
        for k in jax.random.split(key, cfg.epochs):
            off = jax.random.randint(k, (), 0, rb)
            rolled = tuple(
                jnp.roll(x, off, axis=ax) for x, ax in zip(ds, _RB_AXES)
            )
            acc += rolled[4].sum() + rolled[0].astype(jnp.float32).sum()
        return acc

    def d_sgd_fixed(runner, key):
        ds = make_dataset(runner)
        mb = rb // cfg.minibatches
        params, opt_state = runner.params, runner.opt_state

        def epoch(carry, _):
            params, opt_state = carry

            def minibatch(carry, i):
                params, opt_state = carry
                batch = tuple(
                    jax.lax.dynamic_slice_in_dim(x, i * mb, mb, ax)
                    for x, ax in zip(ds, _RB_AXES)
                )
                (loss, m), grads = jax.value_and_grad(
                    ppo_loss_native, argnums=1, has_aux=True
                )(cfg, params, batch)
                updates, opt_state = tx.update(grads, opt_state, params)
                return (optax.apply_updates(params, updates), opt_state), loss

            return jax.lax.scan(
                minibatch, (params, opt_state), jnp.arange(cfg.minibatches)
            )

        (params, _), losses = jax.lax.scan(
            epoch, (params, opt_state), None, length=cfg.epochs
        )
        return losses.sum() + jax.tree.leaves(params)[0].sum()

    e_full = build_pallas_train_step(env, model, tx, cfg, native=True)

    key = jax.random.key(1)
    for name, fn, args in [
        ("A collect", a_collect, (runner,)),
        ("B +gae", b_gae, (runner,)),
        ("C +rolls", c_rolls, (runner, key)),
        ("D +sgd-fixed", d_sgd_fixed, (runner, key)),
        ("E full", lambda r: e_full(r)[1]["reward_per_env"], (runner,)),
    ]:
        t = timeit(jax.jit(fn), *args)
        print(f"{name:14s} {t*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
