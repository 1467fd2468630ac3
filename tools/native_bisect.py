#!/usr/bin/env python
"""Bisect the native-layout pallas-IPPO train step cost on the accelerator.

Slope-timed (tools/timing.py): each stage is iterated K times inside one
jit with a serial dependency, so the fixed per-dispatch tunnel RTT cancels.
Stages (per-iteration cost):
  A collect kernel only
  B collect + last_value + native GAE (no update)
  D E x M sgd passes, XLA autodiff, FIXED minibatch slices (dataset built
    once outside the loop — its cost cancels in the slope)
  F E x M sgd passes, fused Pallas gradient kernel, FIXED slices
  E the full native train step (collect + GAE + rolls + fused sgd)
E - B - F ~= per-epoch roll + minibatch slice + glue cost.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# persistent XLA executable cache: second-process compiles deserialize
# instead of recompiling (rware_tpu/compile_cache; RWARE_TPU_NO_CACHE=1 opts out)
from rware_tpu.compile_cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

from tools.timing import slope


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-envs", type=int, default=16384)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--stages", default="ABDFE")
    ap_args = ap.parse_args()

    import optax

    import rware_tpu
    from rware_tpu.models import IPPOConfig
    from rware_tpu.models.ippo_pallas import (
        _RB_AXES,
        build_pallas_train_step,
        compute_gae_native,
        init_pallas_runner,
        ppo_loss_native,
        _pick_tc_len,
    )
    from rware_tpu.ops.pallas_rollout import LANE, build_pallas_collect
    from rware_tpu.ops.pallas_update import build_fused_ppo_grads

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

    def a_body(i, carry):
        states, acc = carry
        st, traj = collect(states, runner.params, i)
        return st, acc + traj["reward"].sum()

    def make_dataset(states, params, seed):
        st, traj = collect(states, params, seed)
        obs = obs_fn(st)
        _, last_value = model.apply(params, obs)
        lv = jnp.swapaxes(last_value, 0, 1).reshape(n, rb, LANE)
        adv, tgt = compute_gae_native(
            cfg, traj["reward"], traj["value"], traj["done"], lv
        )
        return st, (
            traj["obs"], traj["action"], traj["logp"], traj["value"], adv, tgt
        )

    def b_body(i, carry):
        states, acc = carry
        st, ds = make_dataset(states, runner.params, i)
        return st, acc + ds[4].sum() + ds[5].sum()

    mb_t = cfg.rollout_len // cfg.minibatches
    kern_kw = dict(
        obs_len=env.config.policy_obs_length, hidden=tuple(model.hidden),
        n_actions=env.n_actions, rollout_len=mb_t, n_agents=n,
        mb_rows=rb, clip_eps=cfg.clip_eps, vf_coef=cfg.vf_coef,
        ent_coef=cfg.ent_coef, msg_bits=env.config.msg_bits,
    )
    grads_fused = build_fused_ppo_grads(**kern_kw)
    grads_zc = build_fused_ppo_grads(dataset_len=cfg.rollout_len, **kern_kw)

    def grads_xla(params, batch):
        (loss, metrics), grads = jax.value_and_grad(
            ppo_loss_native, argnums=1, has_aux=True
        )(cfg, params, batch)
        return grads, metrics

    def sgd_fixed_body(grads_fn, zero_copy=False):
        # one iteration = the full E x M update phase on static time slices
        def body(i, carry):
            params, opt_state, ds = carry

            def epoch(carry_eo, _):
                params, opt_state = carry_eo

                def minibatch(carry_mb, m):
                    params, opt_state = carry_mb
                    if zero_copy:
                        grads, _ = grads_fn(params, ds, m * mb_t)
                    else:
                        batch = tuple(
                            jax.lax.dynamic_slice_in_dim(x, m * mb_t, mb_t, 0)
                            for x in ds
                        )
                        grads, _ = grads_fn(params, batch)
                    updates, opt_state = tx.update(grads, opt_state, params)
                    return (optax.apply_updates(params, updates), opt_state), None

                return jax.lax.scan(
                    minibatch, (params, opt_state),
                    jnp.arange(cfg.minibatches),
                )[0], None

            (params, opt_state), _ = jax.lax.scan(
                epoch, (params, opt_state), None, length=cfg.epochs
            )
            return params, opt_state, ds

        return body

    e_full = build_pallas_train_step(env, model, tx, cfg, native=True)

    def e_body(i, carry):
        return e_full(carry)[0]

    def leaf0(tree):
        return jax.tree.leaves(tree)[0].reshape(-1)[0].astype(jnp.float32)

    _, ds0 = jax.jit(make_dataset, static_argnums=2)(
        runner.env_states, runner.params, 0
    )

    stages = {
        "A": ("collect", a_body,
              lambda c: c[1] + c[0].agent_x.sum().astype(jnp.float32),
              (runner.env_states, jnp.float32(0))),
        "B": ("+gae", b_body,
              lambda c: c[1] + c[0].agent_x.sum().astype(jnp.float32),
              (runner.env_states, jnp.float32(0))),
        "D": ("sgd-xla-fixed", sgd_fixed_body(grads_xla),
              lambda c: leaf0(c[0]),
              (runner.params, runner.opt_state, ds0)),
        "F": ("sgd-fused-fixed", sgd_fixed_body(grads_fused),
              lambda c: leaf0(c[0]),
              (runner.params, runner.opt_state, ds0)),
        "Z": ("sgd-zero-copy", sgd_fixed_body(grads_zc, zero_copy=True),
              lambda c: leaf0(c[0]),
              (runner.params, runner.opt_state, ds0)),
        "E": ("full", e_body,
              lambda r: leaf0(r.params)
              + r.env_states.agent_x.sum().astype(jnp.float32),
              runner),
    }

    for tag in ap_args.stages:
        name, body, extract, carry = stages[tag]
        per_iter, base = slope(body, extract, carry, iters=ap_args.iters)
        print(
            f"{tag} {name:16s} {per_iter*1e3:8.2f} ms/iter  "
            f"(K=1 dispatch floor {base*1e3:.1f} ms)",
            flush=True,
        )


if __name__ == "__main__":
    main()
