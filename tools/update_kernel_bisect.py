#!/usr/bin/env python
"""Bisect the fused PPO update kernel cost: fwd / +dgrads / full."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import jax, jax.numpy as jnp, numpy as np

def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n-envs", type=int, default=16384)
    args = p.parse_args()
    from rware_tpu.models import ActorCritic, IPPOConfig
    from rware_tpu.ops.pallas_rollout import LANE
    from rware_tpu.ops.pallas_update import build_fused_ppo_grads

    cfg = IPPOConfig(n_envs=args.n_envs, rollout_len=128)
    T_mb = cfg.rollout_len // cfg.minibatches
    rb = args.n_envs // LANE
    model = ActorCritic(n_actions=5)
    params = model.init(jax.random.key(0), jnp.zeros((1, 2, 71)))
    ks = jax.random.split(jax.random.key(1), 6)
    batch = (
        jax.random.normal(ks[0], (T_mb, 2, 71, rb, LANE)).astype(jnp.bfloat16),
        jax.random.randint(ks[1], (T_mb, 2, rb, LANE), 0, 5, dtype=jnp.int32),
        jax.random.normal(ks[2], (T_mb, 2, rb, LANE)) * 0.1 - 1.6,
        jax.random.normal(ks[3], (T_mb, 2, rb, LANE)),
        jax.random.normal(ks[4], (T_mb, 2, rb, LANE)),
        jax.random.normal(ks[5], (T_mb, 2, rb, LANE)),
    )
    for lvl, name in [(2, "fwd+loss"), (1, "+dgrads"), (0, "full")]:
        g = jax.jit(build_fused_ppo_grads(
            obs_len=71, hidden=(128, 128), n_actions=5, rollout_len=T_mb,
            n_agents=2, mb_rows=rb, clip_eps=0.2, vf_coef=0.5, ent_coef=0.01,
            debug_level=lvl,
        ))
        def sync(out):
            gr, m = out
            return float(np.asarray(m["pg_loss"])) + float(np.asarray(jax.tree.leaves(gr)[0]).reshape(-1)[0])
        sync(g(params, batch))
        best = 1e9
        for _ in range(4):
            t0 = time.perf_counter()
            sync(g(params, batch))
            best = min(best, time.perf_counter() - t0)
        print(f"{name:10s} {best*1e3:7.2f} ms per minibatch (x16 = {best*16*1e3:.1f} ms/update)", flush=True)

if __name__ == "__main__":
    main()
