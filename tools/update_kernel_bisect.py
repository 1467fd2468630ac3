#!/usr/bin/env python
"""Bisect the fused PPO update kernel cost: fwd / +dgrads / full.

Methodology note (this backend): a single tunneled dispatch costs ~45-50 ms
RTT, which swamps any per-kernel delta.  So the kernel is iterated K times
INSIDE one jit with a serial params dependency (each iteration applies a
tiny SGD step from its own gradients), and per-minibatch cost is the slope
between K=1 and K=1+iters — dispatch overhead cancels.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import jax, jax.numpy as jnp, numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n-envs", type=int, default=16384)
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args()
    from rware_tpu.models import ActorCritic, IPPOConfig
    from rware_tpu.ops.pallas_rollout import LANE
    from rware_tpu.ops.pallas_update import build_fused_ppo_grads

    cfg = IPPOConfig(n_envs=args.n_envs, rollout_len=128)
    T_mb = cfg.rollout_len // cfg.minibatches
    passes = cfg.epochs * cfg.minibatches
    rb = args.n_envs // LANE
    model = ActorCritic(n_actions=5)
    params = model.init(jax.random.key(0), jnp.zeros((1, 2, 71)))
    ks = jax.random.split(jax.random.key(1), 6)
    batch = (
        jax.random.normal(ks[0], (T_mb, 71, 2, rb, LANE)).astype(jnp.bfloat16),
        jax.random.randint(ks[1], (T_mb, 2, rb, LANE), 0, 5, dtype=jnp.int32),
        jax.random.normal(ks[2], (T_mb, 2, rb, LANE)) * 0.1 - 1.6,
        jax.random.normal(ks[3], (T_mb, 2, rb, LANE)),
        jax.random.normal(ks[4], (T_mb, 2, rb, LANE)),
        jax.random.normal(ks[5], (T_mb, 2, rb, LANE)),
    )

    for lvl, name in [(2, "fwd+loss"), (1, "+dgrads"), (0, "full")]:
        g = build_fused_ppo_grads(
            obs_len=71, hidden=(128, 128), n_actions=5, rollout_len=T_mb,
            n_agents=2, mb_rows=rb, clip_eps=0.2, vf_coef=0.5, ent_coef=0.01,
            debug_level=lvl, _unsafe_bisect=True,
        )

        def make_looped(k):
            def body(i, carry):
                grads, m = g(carry, batch)
                # serial dependency: consume the gradients so XLA cannot
                # hoist or dedupe iterations
                return jax.tree.map(
                    lambda p, gr: p - 1e-9 * gr.astype(p.dtype), carry, grads
                )

            def run(params):
                out = jax.lax.fori_loop(0, k, body, params)
                return jax.tree.leaves(out)[0].reshape(-1)[0]

            return jax.jit(run)

        def timed(fn):
            fn(params)  # compile + warm
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                float(np.asarray(fn(params)))  # output-dependent scalar sync
                best = min(best, time.perf_counter() - t0)
            return best

        base = timed(make_looped(1))
        long = timed(make_looped(1 + args.iters))
        per_mb = (long - base) / args.iters
        print(
            f"{name:10s} {per_mb*1e3:7.3f} ms per minibatch "
            f"(x{passes} = {per_mb*passes*1e3:.1f} ms/update; "
            f"dispatch+1 floor {base*1e3:.1f} ms)",
            flush=True,
        )


if __name__ == "__main__":
    main()
