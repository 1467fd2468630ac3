#!/usr/bin/env python
"""Throughput of the collector variants on hardware: GRU-in-kernel
recurrent IPPO and IMAGE-observation IPPO (both --collect pallas paths)."""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def sync(r, m):
    return float(np.asarray(m["reward_per_env"])) + float(
        np.asarray(jax.tree.leaves(r.params)[0]).reshape(-1)[0]
    )


def time_steps(ts, runner, n_envs, rollout, repeats=3):
    t0 = time.perf_counter()
    runner, m = ts(runner)
    sync(runner, m)
    print(f"  compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        runner, m = ts(runner)
        sync(runner, m)
        best = min(best, time.perf_counter() - t0)
    print(
        f"  step={best*1e3:.1f}ms -> {n_envs*rollout/best/1e6:.2f}M "
        "env-steps/s",
        flush=True,
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n-envs", type=int, default=4096)
    p.add_argument("--rollout-len", type=int, default=128)
    p.add_argument("--variant", choices=["gru", "image", "both"], default="both")
    args = p.parse_args()

    import rware_tpu
    from rware_tpu.models import IPPOConfig

    cfg = IPPOConfig(n_envs=args.n_envs, rollout_len=args.rollout_len)

    if args.variant in ("gru", "both"):
        from rware_tpu.models.ippo_rnn import (
            build_rnn_pallas_train_step,
            init_rnn_runner,
        )

        env = rware_tpu.make("rware-tiny-2ag-v2")
        runner, model, tx = init_rnn_runner(env, cfg, jax.random.key(0))
        ts = jax.jit(build_rnn_pallas_train_step(env, model, tx, cfg))
        print("gru-in-kernel recurrent IPPO (tiny-2ag):", flush=True)
        time_steps(ts, runner, cfg.n_envs, cfg.rollout_len)

    if args.variant in ("image", "both"):
        from rware_tpu.models.ippo_pallas import (
            build_pallas_train_step,
            init_pallas_runner,
        )
        from rware_tpu.types import ObservationType

        env = rware_tpu.make(
            rware_tpu.WarehouseConfig(
                observation_type=ObservationType.IMAGE
            )
        )
        runner, model, tx = init_pallas_runner(env, cfg, jax.random.key(0))
        ts = jax.jit(build_pallas_train_step(env, model, tx, cfg))
        print("IMAGE-obs IPPO, in-kernel image windows (tiny-2ag-img):",
              flush=True)
        time_steps(ts, runner, cfg.n_envs, cfg.rollout_len)


if __name__ == "__main__":
    main()
