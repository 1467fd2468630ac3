#!/usr/bin/env python
"""Bisect the native-layout recurrent (GRU) train step cost on hardware.

Slope-timed (tools/timing.py — K chained iterations inside one jit, the
fixed per-dispatch tunnel RTT cancels).  Stages:
  A gru collect kernel only
  B collect + last_value + native GAE (dataset build, no update)
  R E x M loss-only (forward GRU replay) passes, FIXED env-band slices
  G E x M value_and_grad + sgd passes, FIXED slices
  E the full native recurrent train step
R isolates the sequential-recurrence forward cost; G - R ~= the backward
scan; E - B - G ~= per-epoch roll + slice glue.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tools.timing import slope


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-envs", type=int, default=4096)
    ap.add_argument("--rollout-len", type=int, default=128)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--stages", default="ABRGE")
    ap_args = ap.parse_args()

    import optax

    import rware_tpu
    from rware_tpu.models import IPPOConfig
    from rware_tpu.models.ippo_pallas import compute_gae_native
    from rware_tpu.models.ippo_rnn import (
        _pick_tc_len_gru_default,
        build_rnn_pallas_train_step,
        init_rnn_runner,
        rnn_ppo_loss_native,
    )
    from rware_tpu.ops.pallas_rollout import LANE, build_pallas_collect

    env = rware_tpu.make("rware-tiny-2ag-v2")
    cfg = IPPOConfig(n_envs=ap_args.n_envs, rollout_len=ap_args.rollout_len)
    runner, model, tx = init_rnn_runner(env, cfg, jax.random.key(0))
    hidden = (int(model.embed), int(model.hidden))
    collect = build_pallas_collect(
        env.config, cfg.rollout_len, hidden=hidden,
        tc_len=_pick_tc_len_gru_default(cfg.rollout_len),
        policy="gru", native_traj=True,
    )
    from rware_tpu.models.ippo import policy_obs_fn

    obs_fn = jax.vmap(policy_obs_fn(env))
    rb = cfg.n_envs // LANE
    n = env.n_agents
    hg = int(model.hidden)

    def a_body(i, carry):
        states, h, acc = carry
        st, nh, traj = collect(states, runner.params, i, h0=h)
        return st, nh, acc + traj["reward"].sum()

    def make_dataset(states, h0, params, seed):
        st, nh, traj = collect(states, params, seed, h0=h0)
        obs = obs_fn(st)
        _, (_, last_value) = model.apply(params, nh, obs)
        lv = jnp.swapaxes(last_value, 0, 1).reshape(n, rb, LANE)
        adv, tgt = compute_gae_native(
            cfg, traj["reward"], traj["value"], traj["done"], lv
        )
        h0n = jnp.transpose(h0, (1, 0, 2)).reshape(n, rb, LANE, hg)
        return st, nh, (
            jnp.transpose(traj["obs"], (0, 2, 3, 4, 1)), traj["done"],
            traj["action"], traj["logp"], traj["value"], adv, tgt, h0n,
        )

    def b_body(i, carry):
        states, h, acc = carry
        st, nh, ds = make_dataset(states, h, runner.params, i)
        return st, nh, acc + ds[5].sum() + ds[6].sum()

    _NATIVE_RB_AXES = (2, 2, 2, 2, 2, 2, 2, 1)
    mb = rb // cfg.minibatches

    def passes_body(with_grad):
        def body(i, carry):
            params, opt_state, ds, acc = carry

            def epoch(carry_eo, _):
                params, opt_state, acc = carry_eo

                def minibatch(carry_mb, m):
                    params, opt_state, acc = carry_mb
                    batch = tuple(
                        jax.lax.dynamic_slice_in_dim(x, m * mb, mb, ax)
                        for x, ax in zip(ds, _NATIVE_RB_AXES)
                    )
                    if with_grad:
                        (loss, _), grads = jax.value_and_grad(
                            rnn_ppo_loss_native, argnums=2, has_aux=True
                        )(cfg, model, params, batch)
                        updates, opt_state = tx.update(
                            grads, opt_state, params
                        )
                        params = optax.apply_updates(params, updates)
                    else:
                        loss, _ = rnn_ppo_loss_native(
                            cfg, model, params, batch
                        )
                    return (params, opt_state, acc + loss), None

                return jax.lax.scan(
                    minibatch, (params, opt_state, acc),
                    jnp.arange(cfg.minibatches),
                )[0], None

            (params, opt_state, acc), _ = jax.lax.scan(
                epoch, (params, opt_state, acc), None, length=cfg.epochs
            )
            return params, opt_state, ds, acc

        return body

    ts_full = jax.jit(build_rnn_pallas_train_step(env, model, tx, cfg))

    def e_body(i, r):
        return ts_full(r)[0]

    def leaf0(tree):
        return jax.tree.leaves(tree)[0].reshape(-1)[0].astype(jnp.float32)

    _, _, ds0 = jax.jit(make_dataset, static_argnums=3)(
        runner.env_states, runner.carry, runner.params, 0
    )

    stages = {
        "A": ("gru-collect", a_body,
              lambda c: c[2] + c[0].agent_x.sum().astype(jnp.float32),
              (runner.env_states, runner.carry, jnp.float32(0))),
        "B": ("+gae-dataset", b_body,
              lambda c: c[2] + c[0].agent_x.sum().astype(jnp.float32),
              (runner.env_states, runner.carry, jnp.float32(0))),
        "R": ("replay-fwd-only", passes_body(False),
              lambda c: c[3].astype(jnp.float32),
              (runner.params, runner.opt_state, ds0, jnp.float32(0))),
        "G": ("sgd-fixed", passes_body(True),
              lambda c: leaf0(c[0]) + c[3].astype(jnp.float32),
              (runner.params, runner.opt_state, ds0, jnp.float32(0))),
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
