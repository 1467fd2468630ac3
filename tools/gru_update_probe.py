#!/usr/bin/env python
"""Split the recurrent minibatch pass's cost between the Pallas sequence
kernels, the XLA segments (embed/gates/heads/loss) and the optimizer.

Slope-timed per-iteration costs (tools/timing.py) at MINIBATCH shapes —
one pass of the native recurrent update (models/ippo_rnn.py
train_step_native), stages:

  K   forward sequence kernel alone            (ops/pallas_gru fwd)
  KB  forward + reverse sequence kernels       (fwd + seq bwd)
  VG  value_and_grad(rnn_ppo_loss_native) + plain-SGD apply
  G   value_and_grad + Adam (tx.update)        (the production pass)

Derived:   seq-bwd kernel = KB - K;   XLA fwd segs = loss-fwd - K (use
gru_bisect stage R/pass);   XLA bwd segs = VG - KB - XLA fwd segs;
Adam = G - VG.
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
    ap.add_argument("--n-envs", type=int, default=4096)
    ap.add_argument("--rollout-len", type=int, default=128)
    ap.add_argument("--minibatches", type=int, default=4)
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--stages", default="K,KB,VG,G")
    ap.add_argument("--env", default="rware-tiny-2ag-v2")
    args = ap.parse_args()

    import optax

    import rware_tpu
    from rware_tpu.models import IPPOConfig
    from rware_tpu.models.ippo_pallas import compute_gae_native
    from rware_tpu.models.ippo_rnn import (
        _gru_obs_kernels,
        _gru_seq_kernels,
        _pick_tc_len_gru_default,
        init_rnn_runner,
        rnn_ppo_loss_native,
    )
    from rware_tpu.ops.pallas_rollout import LANE, build_pallas_collect

    env = rware_tpu.make(args.env)
    cfg = IPPOConfig(
        n_envs=args.n_envs, rollout_len=args.rollout_len,
        minibatches=args.minibatches,
    )
    runner, model, tx = init_rnn_runner(env, cfg, jax.random.key(0))
    hidden = (int(model.embed), int(model.hidden))
    hg = int(model.hidden)
    n = env.n_agents
    rb = cfg.n_envs // LANE
    mb = rb // cfg.minibatches
    t = cfg.rollout_len

    collect = build_pallas_collect(
        env.config, t, hidden=hidden,
        tc_len=_pick_tc_len_gru_default(t), policy="gru", native_traj=True,
    )
    from rware_tpu.models.ippo import policy_obs_fn

    obs_fn = jax.vmap(policy_obs_fn(env))
    st, nh, traj = jax.jit(
        lambda s, p, h: collect(s, p, 0, h0=h)
    )(runner.env_states, runner.params, runner.carry)
    obs = obs_fn(st)
    _, (_, last_value) = model.apply(runner.params, nh, obs)
    lv = jnp.swapaxes(last_value, 0, 1).reshape(n, rb, LANE)
    adv, tgt = compute_gae_native(
        cfg, traj["reward"], traj["value"], traj["done"], lv
    )
    h0n = jnp.transpose(runner.carry, (1, 0, 2)).reshape(n, rb, LANE, hg)
    _AX = (2, 2, 2, 2, 2, 2, 2, 1)
    ds = (
        jnp.transpose(traj["obs"], (0, 2, 3, 4, 1)), traj["done"],
        traj["action"], traj["logp"], traj["value"], adv, tgt, h0n,
    )
    batch = tuple(
        jax.lax.dynamic_slice_in_dim(x, 0, mb, ax)
        for x, ax in zip(ds, _AX)
    )
    batch = jax.tree.map(lambda x: jax.device_put(x), batch)
    (obs_mb, done_mb, *_), h0_mb = batch, batch[7]

    # ---- sequence-kernel inputs at minibatch shapes ----
    p = runner.params["params"]
    g = p["gru"]
    e = jax.nn.tanh(
        jax.lax.dot_general(
            obs_mb.astype(jnp.bfloat16),
            p["embed"]["kernel"].astype(jnp.bfloat16),
            (((obs_mb.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + p["embed"]["bias"]
    ).astype(jnp.bfloat16)
    wi = jnp.concatenate(
        [g["ir"]["kernel"], g["iz"]["kernel"], g["in"]["kernel"]], axis=1
    ).astype(jnp.bfloat16)
    bi = jnp.concatenate(
        [g["ir"]["bias"], g["iz"]["bias"], g["in"]["bias"]], axis=0
    )
    iall0 = (
        jax.lax.dot_general(
            e, wi, (((e.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bi
    ).astype(jnp.bfloat16)
    wh0 = jnp.concatenate(
        [
            g["hr"]["kernel"].astype(jnp.bfloat16),
            g["hz"]["kernel"].astype(jnp.bfloat16),
            g["hn"]["kernel"].astype(jnp.bfloat16),
        ],
        axis=1,
    )
    bhn0 = g["hn"]["bias"]
    done_mask = (done_mb != 0).astype(jnp.bfloat16)
    h0b = h0_mb.astype(jnp.bfloat16)
    fwd_k, bwd_k = _gru_seq_kernels(t, n, mb, hg, False)
    lf = obs_mb.shape[-1]
    emb = int(model.embed)
    we0 = p["embed"]["kernel"]
    be0 = p["embed"]["bias"]
    bi0 = bi
    fwd_ok, bwd_ok = _gru_obs_kernels(t, n, mb, hg, emb, lf, False)

    stages = args.stages.split(",")

    def report(tag, per, base):
        print(
            f"{tag:22s} {per * 1e3:8.3f} ms/iter  "
            f"(K=1 floor {base * 1e3:.1f} ms)",
            flush=True,
        )

    if "K" in stages:
        def k_body(i, carry):
            bhn, acc = carry
            hseq = fwd_ok(
                we0, be0, wi, bi0, wh0, bhn, obs_mb, done_mask, h0b
            )
            # serial dep: perturb the candidate bias by a kernel output row
            return bhn + hseq[-1, 0, 0, 0].astype(jnp.float32) * 1e-20, acc

        per, base = slope(
            k_body, lambda c: c[0].sum() + c[1], (bhn0, jnp.float32(0)),
            iters=args.iters,
        )
        report("K obs-fwd kernel", per, base)

    if "KB" in stages:
        def kb_body(i, carry):
            bhn, acc = carry
            hseq = fwd_ok(
                we0, be0, wi, bi0, wh0, bhn, obs_mb, done_mask, h0b
            )
            dwe, dbe, dwi, dbi, dwh, dbhn, dh0 = bwd_ok(
                we0, be0, wi, bi0, wh0, bhn, obs_mb, done_mask, h0b,
                hseq, hseq,
            )
            return bhn + dbhn[0] * 1e-20, acc + dwe[0, 0].astype(
                jnp.float32
            )

        per, base = slope(
            kb_body, lambda c: c[0].sum() + c[1], (bhn0, jnp.float32(0)),
            iters=args.iters,
        )
        report("KB obs fwd+bwd kernels", per, base)

    if "KI" in stages:
        def ki_body(i, carry):
            bhn, acc = carry
            hseq = fwd_k(wh0, bhn, iall0, done_mask, h0b)
            return bhn + hseq[-1, 0, 0, 0].astype(jnp.float32) * 1e-20, acc

        per, base = slope(
            ki_body, lambda c: c[0].sum() + c[1], (bhn0, jnp.float32(0)),
            iters=args.iters,
        )
        report("KI iall-fwd kernel", per, base)

    if "KBI" in stages:
        def kbi_body(i, carry):
            bhn, acc = carry
            hseq = fwd_k(wh0, bhn, iall0, done_mask, h0b)
            dwh, dbhn, d_iall, dh0 = bwd_k(
                wh0, bhn, iall0, done_mask, h0b, hseq, hseq
            )
            return bhn + dbhn[0] * 1e-20, acc + d_iall[0, 0, 0, 0, 0].astype(
                jnp.float32
            )

        per, base = slope(
            kbi_body, lambda c: c[0].sum() + c[1], (bhn0, jnp.float32(0)),
            iters=args.iters,
        )
        report("KBI iall fwd+bwd kernels", per, base)

    def vg_chain(use_adam):
        def body(i, carry):
            params, opt_state, acc = carry
            (loss, _), grads = jax.value_and_grad(
                rnn_ppo_loss_native, argnums=2, has_aux=True
            )(cfg, model, params, batch)
            if use_adam:
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
            else:
                params = jax.tree.map(
                    lambda w, d: w - 1e-8 * d.astype(w.dtype), params, grads
                )
            return params, opt_state, acc + loss

        return body

    if "VG" in stages:
        per, base = slope(
            vg_chain(False),
            lambda c: c[0]["params"]["value"]["bias"].sum().astype(
                jnp.float32
            ) + c[2],
            (runner.params, runner.opt_state, jnp.float32(0)),
            iters=args.iters,
        )
        report("VG grad+sgd", per, base)

    if "G" in stages:
        per, base = slope(
            vg_chain(True),
            lambda c: c[0]["params"]["value"]["bias"].sum().astype(
                jnp.float32
            ) + c[2],
            (runner.params, runner.opt_state, jnp.float32(0)),
            iters=args.iters,
        )
        report("G grad+adam", per, base)


if __name__ == "__main__":
    main()
