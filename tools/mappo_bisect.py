#!/usr/bin/env python
"""Bisect the MAPPO train-step cost on the accelerator (slope-timed,
tools/timing.py — the fixed dispatch RTT cancels in the K-chain slope).

Stages (per-iteration cost):
  A collect kernel only
  B collect + central-critic trajectory values + native GAE (dataset build)
  C E x M fused ACTOR passes only (zero-copy window starts, actor adam)
  D E x M CRITIC passes only (contiguous self-concat windows + XLA
    autodiff, critic adam)
  E the full MAPPO train step (split: per-pass actor kernel + XLA critic)
  F the full MAPPO train step (split: whole-phase actor kernel + critic scan)
  G the full MAPPO train step (COMBINED actor+critic kernel — the default)
  V collect + kernel-native critic values + GAE (the combined path's
    dataset build; B's relayout+XLA-forward counterpart)
E - B - C - D ~= glue; D is the XLA critic cost the combined kernel kills.
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
    ap.add_argument("--stages", default="ABCDEFGHV")
    args = ap.parse_args()

    import rware_tpu
    from rware_tpu.models import IPPOConfig
    from rware_tpu.models.ippo_pallas import (
        _pick_tc_len,
        compute_gae_native,
    )
    from rware_tpu.models.mappo import (
        _critic_rowmajor_forward,
        _joint_rowmajor,
        build_mappo_train_step,
        init_mappo_runner,
        make_mappo_optimizer,
    )
    from rware_tpu.ops.pallas_rollout import LANE, build_pallas_collect
    from rware_tpu.ops.pallas_update import build_fused_ppo_grads

    env = rware_tpu.make("rware-tiny-2ag-v2")
    cfg = IPPOConfig(n_envs=args.n_envs, rollout_len=128)
    runner, actor, critic, tx = init_mappo_runner(
        env, cfg, jax.random.key(0)
    )
    collect = build_pallas_collect(
        env.config, cfg.rollout_len, tc_len=_pick_tc_len(cfg.rollout_len),
        native_traj=True,
    )
    obs_fn = jax.vmap(env._obs_fn)
    rb = cfg.n_envs // LANE
    n = env.n_agents
    obs_dim = env.config.policy_obs_length
    mb_t = cfg.rollout_len // cfg.minibatches
    tx_parts = make_mappo_optimizer(cfg)

    def a_body(i, carry):
        states, acc = carry
        st, traj = collect(states, runner.params["actor"], i)
        return st, acc + traj["reward"].sum()

    def make_dataset(states, params, seed):
        st, traj = collect(states, params["actor"], seed)
        joint = _joint_rowmajor(traj["obs"])
        values = _critic_rowmajor_forward(params["critic"], joint)
        obs = obs_fn(st)
        last_joint = obs.reshape(cfg.n_envs, n * obs_dim)
        last_value = critic.apply(params["critic"], last_joint)
        lv = jnp.swapaxes(last_value, 0, 1).reshape(n, rb, LANE)
        adv, tgt = compute_gae_native(
            cfg, traj["reward"], values, traj["done"], lv
        )
        def ext(x):  # prod train_step's self-concat minibatch sources
            return jnp.concatenate([x, x[:mb_t]], axis=0)

        return st, (
            traj["obs"], traj["action"], traj["logp"], values, adv, tgt
        ), (ext(joint), ext(values), ext(tgt))

    def b_body(i, carry):
        states, acc = carry
        st, ds, _ = make_dataset(states, runner.params, i)
        return st, acc + ds[4].sum() + ds[5].sum()

    akernel = build_fused_ppo_grads(
        obs_len=obs_dim, hidden=tuple(actor.hidden),
        n_actions=env.n_actions, rollout_len=mb_t, n_agents=n,
        mb_rows=rb, clip_eps=cfg.clip_eps, vf_coef=0.0,
        ent_coef=cfg.ent_coef, msg_bits=env.config.msg_bits,
        dataset_len=cfg.rollout_len,
    )

    def critic_loss(cp, joint_mb, old_value, target):
        value = _critic_rowmajor_forward(cp, joint_mb)
        v_clipped = old_value + jnp.clip(
            value - old_value, -cfg.clip_eps, cfg.clip_eps
        )
        v_loss = 0.5 * jnp.maximum(
            (value - target) ** 2, (v_clipped - target) ** 2
        ).mean()
        return cfg.vf_coef * v_loss, v_loss

    def phase_body(use_actor, use_critic):
        def body(i, carry):
            # exts ride the carry: baked-as-constants they blow the remote
            # compile helper's request-size limit at B=16384 (HTTP 413)
            params, opt_state, ds, exts = carry

            def epoch(carry_eo, _):
                params, opt_state = carry_eo

                def minibatch(carry_mb, m):
                    import optax

                    params, opt_state = carry_mb
                    start = m * mb_t
                    if use_actor:
                        ag, _ = akernel(params["actor"], ds, start)
                    else:
                        ag = jax.tree.map(jnp.zeros_like, params["actor"])
                    if use_critic:
                        sl = lambda x: jax.lax.dynamic_slice_in_dim(
                            x, start, mb_t, 0
                        )
                        (_l, _vl), cg = jax.value_and_grad(
                            critic_loss, has_aux=True
                        )(params["critic"], sl(exts[0]), sl(exts[1]),
                          sl(exts[2]))
                    else:
                        cg = jax.tree.map(jnp.zeros_like, params["critic"])
                    u, o = tx_parts.update(
                        {"actor": ag, "critic": cg}, opt_state, params
                    )
                    return (optax.apply_updates(params, u), o), None

                return jax.lax.scan(
                    minibatch, (params, opt_state),
                    jnp.arange(cfg.minibatches),
                )[0], None

            (params, opt_state), _ = jax.lax.scan(
                epoch, (params, opt_state), None, length=cfg.epochs
            )
            return params, opt_state, ds, exts

        return body

    e_full = build_mappo_train_step(
        env, actor, critic, tx, cfg, fused_actor_update=True,
        fused_actor_phase=False,
    )
    f_full = build_mappo_train_step(
        env, actor, critic, tx, cfg, fused_actor_update=True,
        fused_actor_phase=True,
    )
    g_full = build_mappo_train_step(env, actor, critic, tx, cfg)
    h_full = build_mappo_train_step(
        env, actor, critic, tx, cfg, fused_critic_update=True,
        fused_critic_phase=True,
    )

    def e_body(i, carry):
        return e_full(carry)[0]

    def f_body(i, carry):
        return f_full(carry)[0]

    def g_body(i, carry):
        return g_full(carry)[0]

    def h_body(i, carry):
        return h_full(carry)[0]

    from rware_tpu.ops.pallas_update import build_fused_critic_values

    values_kernel = build_fused_critic_values(
        obs_len=obs_dim, n_agents=n, rollout_len=cfg.rollout_len,
        mb_rows=rb,
    )

    def v_body(i, carry):
        states, acc = carry
        st, traj = collect(states, runner.params["actor"], i)
        values = values_kernel(runner.params["critic"], traj["obs"])
        obs = obs_fn(st)
        last_joint = obs.reshape(cfg.n_envs, n * obs_dim)
        last_value = critic.apply(runner.params["critic"], last_joint)
        lv = jnp.swapaxes(last_value, 0, 1).reshape(n, rb, LANE)
        adv, tgt = compute_gae_native(
            cfg, traj["reward"], values, traj["done"], lv
        )
        return st, acc + adv.sum() + tgt.sum()

    def leaf0(tree):
        # one scalar per part: a single-part stage's work must not be DCE'd
        # because the extractor only read the other part's leaf
        return sum(
            jax.tree.leaves(part)[0].reshape(-1)[0].astype(jnp.float32)
            for part in (tree["actor"], tree["critic"])
        )

    _, ds0, exts0 = jax.jit(make_dataset, static_argnums=2)(
        runner.env_states, runner.params, 0
    )
    opt0 = tx_parts.init(runner.params)

    stages = {
        "A": ("collect", a_body,
              lambda c: c[1] + c[0].agent_x.sum().astype(jnp.float32),
              (runner.env_states, jnp.float32(0))),
        "B": ("+critic-values+gae", b_body,
              lambda c: c[1] + c[0].agent_x.sum().astype(jnp.float32),
              (runner.env_states, jnp.float32(0))),
        "C": ("actor-kernel passes", phase_body(True, False),
              lambda c: leaf0(c[0]),
              (runner.params, opt0, ds0, exts0)),
        "D": ("critic-xla passes", phase_body(False, True),
              lambda c: leaf0(c[0]),
              (runner.params, opt0, ds0, exts0)),
        "E": ("full per-pass", e_body,
              lambda r: leaf0(r.params)
              + r.env_states.agent_x.sum().astype(jnp.float32),
              runner),
        "F": ("full phase-kernel", f_body,
              lambda r: leaf0(r.params)
              + r.env_states.agent_x.sum().astype(jnp.float32),
              runner),
        "G": ("full combined-kernel", g_body,
              lambda r: leaf0(r.params)
              + r.env_states.agent_x.sum().astype(jnp.float32),
              runner),
        "H": ("full combined-PHASE", h_body,
              lambda r: leaf0(r.params)
              + r.env_states.agent_x.sum().astype(jnp.float32),
              runner),
        "V": ("+kernel-values+gae", v_body,
              lambda c: c[1] + c[0].agent_x.sum().astype(jnp.float32),
              (runner.env_states, jnp.float32(0))),
    }

    for tag in args.stages:
        name, body, extract, carry = stages[tag]
        per_iter, base = slope(body, extract, carry, iters=args.iters)
        print(
            f"{tag} {name:22s} {per_iter*1e3:8.2f} ms/iter  "
            f"(K=1 dispatch floor {base*1e3:.1f} ms)",
            flush=True,
        )


if __name__ == "__main__":
    main()
