#!/usr/bin/env python
"""End-to-end IPPO train-step throughput on the local accelerator.

Times the full jitted train step (collect + GAE + E x M PPO update) and
prints env-steps/s.  --path selects the collector/update pipeline:
  native  pallas collect + native-layout update (default)
  flat    pallas collect + round-1 flat relayout update
  xla     XLA vmap+scan collector + flat update
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# persistent XLA executable cache: second-process compiles deserialize
# instead of recompiling (rware_tpu/compile_cache; RWARE_TPU_NO_CACHE=1 opts out)
from rware_tpu.compile_cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--env", default="rware-tiny-2ag-v2")
    p.add_argument("--path", choices=["native", "flat", "xla"], default="native")
    p.add_argument("--n-envs", type=int, default=4096)
    p.add_argument("--rollout-len", type=int, default=128)
    p.add_argument("--minibatch-mode", default="block")
    p.add_argument("--repeats", type=int, default=5)
    args = p.parse_args()

    import rware_tpu
    from rware_tpu.models import IPPOConfig

    env = rware_tpu.make(args.env)
    cfg = IPPOConfig(
        n_envs=args.n_envs,
        rollout_len=args.rollout_len,
        minibatch_mode=args.minibatch_mode,
    )
    key = jax.random.key(0)

    if args.path == "xla":
        from rware_tpu.models import build_train_step, init_runner

        runner, model, tx = init_runner(env, cfg, key)
        ts = jax.jit(build_train_step(env, model, tx, cfg))
    else:
        from rware_tpu.models.ippo_pallas import (
            build_pallas_train_step,
            init_pallas_runner,
        )

        runner, model, tx = init_pallas_runner(env, cfg, key)
        ts = jax.jit(
            build_pallas_train_step(
                env, model, tx, cfg, native=args.path == "native"
            )
        )

    # slope timing: K chained steps inside one jit so the fixed dispatch
    # RTT cancels (tools/timing.py; single-dispatch numbers are RTT-bound)
    from tools.timing import slope

    def body(i, r):
        return ts(r)[0]

    def extract(r):
        return (
            jax.tree.leaves(r.params)[0].reshape(-1)[0].astype(jnp.float32)
            + r.env_states.agent_x.sum().astype(jnp.float32)
        )

    t0 = time.perf_counter()
    per_step, base = slope(body, extract, runner, iters=args.repeats)
    print(f"measured in {time.perf_counter()-t0:.1f}s", flush=True)
    steps = cfg.n_envs * cfg.rollout_len
    print(
        f"path={args.path} env={args.env} B={cfg.n_envs} T={cfg.rollout_len} "
        f"step={per_step*1e3:.1f}ms -> {steps/per_step/1e6:.2f}M env-steps/s "
        f"(dispatch floor {base*1e3:.1f}ms)",
        flush=True,
    )


if __name__ == "__main__":
    main()
