#!/usr/bin/env python
"""Throughput of the training-path variants on hardware, slope-timed
(tools/timing.py — K chained steps in one jit, dispatch RTT cancels):

  gru    recurrent IPPO, GRU collect in-kernel + native-layout GRU update
  image  IMAGE-observation IPPO, in-kernel image windows
  seac   SEAC-PPO, per-agent-params collect + fused shared-experience update
  msg    msg_bits=2 IPPO, Bernoulli bits sampled in-kernel + fused update
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

from tools.timing import slope


def probe(name, ts, runner, n_envs, rollout, iters=6):
    def body(i, r):
        return ts(r)[0]

    def extract(r):
        return (
            jax.tree.leaves(r.params)[0].reshape(-1)[0].astype(jnp.float32)
            + r.env_states.agent_x.sum().astype(jnp.float32)
        )

    t0 = time.perf_counter()
    per_step, base = slope(body, extract, runner, iters=iters)
    print(
        f"{name}: step={per_step*1e3:.1f}ms -> "
        f"{n_envs*rollout/per_step/1e6:.2f}M env-steps/s "
        f"(dispatch floor {base*1e3:.1f}ms; measured in "
        f"{time.perf_counter()-t0:.1f}s)",
        flush=True,
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n-envs", type=int, default=4096)
    p.add_argument("--rollout-len", type=int, default=128)
    p.add_argument("--minibatches", type=int, default=4)
    p.add_argument("--epochs", type=int, default=4)
    p.add_argument(
        "--variant",
        choices=["mlp", "gru", "gru-msg", "mappo", "rnn-mappo", "image",
                 "seac", "msg", "all"],
        default="all",
    )
    p.add_argument(
        "--gru-fused-loss", action="store_true",
        help="route the GRU update through rnn_fused_grads (both sequence "
        "sweeps + heads/loss in Pallas)",
    )
    args = p.parse_args()
    want = (
        ["gru", "image", "seac", "msg"]
        if args.variant == "all"
        else [args.variant]
    )

    import rware_tpu
    from rware_tpu.models import IPPOConfig

    cfg = IPPOConfig(
        n_envs=args.n_envs, rollout_len=args.rollout_len,
        minibatches=args.minibatches, epochs=args.epochs,
    )

    if "mlp" in want:
        from rware_tpu.models.ippo_pallas import (
            build_pallas_train_step,
            init_pallas_runner,
        )

        env = rware_tpu.make("rware-tiny-2ag-v2")
        runner, model, tx = init_pallas_runner(env, cfg, jax.random.key(0))
        ts = jax.jit(build_pallas_train_step(env, model, tx, cfg))
        probe("IPPO MLP flagship (tiny-2ag)", ts, runner,
              cfg.n_envs, cfg.rollout_len)

    if "gru" in want:
        from rware_tpu.models.ippo_rnn import (
            build_rnn_pallas_train_step,
            init_rnn_runner,
        )

        env = rware_tpu.make("rware-tiny-2ag-v2")
        runner, model, tx = init_rnn_runner(env, cfg, jax.random.key(0))
        ts = jax.jit(build_rnn_pallas_train_step(
            env, model, tx, cfg, fused_loss=args.gru_fused_loss
        ))
        tag = " (loss-fused bwd)" if args.gru_fused_loss else ""
        probe("gru-in-kernel recurrent IPPO (tiny-2ag)" + tag, ts, runner,
              cfg.n_envs, cfg.rollout_len)

    if "gru-msg" in want:
        from rware_tpu.models.ippo_rnn import (
            build_rnn_pallas_train_step,
            init_rnn_runner,
        )

        env = rware_tpu.make("rware-tiny-2ag-v2", msg_bits=2)
        runner, model, tx = init_rnn_runner(env, cfg, jax.random.key(0))
        ts = jax.jit(build_rnn_pallas_train_step(env, model, tx, cfg))
        probe("gru + msg_bits=2 recurrent IPPO (tiny-2ag)", ts, runner,
              cfg.n_envs, cfg.rollout_len)

    if "mappo" in want:
        from rware_tpu.models.mappo import (
            build_mappo_train_step,
            init_mappo_runner,
        )

        env = rware_tpu.make("rware-tiny-2ag-v2")
        runner, actor, critic, tx = init_mappo_runner(
            env, cfg, jax.random.key(0)
        )
        ts = jax.jit(build_mappo_train_step(env, actor, critic, tx, cfg))
        probe("MAPPO central-critic PPO (tiny-2ag)", ts, runner,
              cfg.n_envs, cfg.rollout_len)

    if "rnn-mappo" in want:
        from rware_tpu.models.mappo import (
            build_rnn_mappo_train_step,
            init_rnn_mappo_runner,
        )

        env = rware_tpu.make("rware-tiny-2ag-v2")
        runner, actor, critic, tx = init_rnn_mappo_runner(
            env, cfg, jax.random.key(0)
        )
        ts = jax.jit(
            build_rnn_mappo_train_step(env, actor, critic, tx, cfg)
        )
        probe("recurrent MAPPO, GRU actor + central critic (tiny-2ag)",
              ts, runner, cfg.n_envs, cfg.rollout_len)

    if "image" in want:
        from rware_tpu.models.ippo_pallas import (
            build_pallas_train_step,
            init_pallas_runner,
        )
        from rware_tpu.types import ObservationType

        env = rware_tpu.make(
            rware_tpu.WarehouseConfig(observation_type=ObservationType.IMAGE)
        )
        runner, model, tx = init_pallas_runner(env, cfg, jax.random.key(0))
        ts = jax.jit(build_pallas_train_step(env, model, tx, cfg))
        probe("IMAGE-obs IPPO, in-kernel windows (tiny-2ag-img)", ts, runner,
              cfg.n_envs, cfg.rollout_len)

    if "seac" in want:
        from rware_tpu.models.seac import (
            SEACPPOConfig,
            build_seac_ppo_train_step,
            init_seac_ppo,
        )

        env = rware_tpu.make("rware-tiny-2ag-v2")
        scfg = SEACPPOConfig(n_envs=args.n_envs, rollout_len=args.rollout_len)
        runner, model, tx = init_seac_ppo(env, scfg, jax.random.key(0))
        ts = jax.jit(
            build_seac_ppo_train_step(
                env, model, tx, scfg, collect_mode="pallas"
            )
        )
        probe("SEAC-PPO fused per-agent update (tiny-2ag)", ts, runner,
              cfg.n_envs, cfg.rollout_len)

    if "msg" in want:
        from rware_tpu.models.ippo_pallas import (
            build_pallas_train_step,
            init_pallas_runner,
        )

        env = rware_tpu.make("rware-tiny-2ag-v2", msg_bits=2)
        runner, model, tx = init_pallas_runner(env, cfg, jax.random.key(0))
        ts = jax.jit(build_pallas_train_step(env, model, tx, cfg))
        probe("msg_bits=2 IPPO, bits in-kernel (tiny-2ag)", ts, runner,
              cfg.n_envs, cfg.rollout_len)


if __name__ == "__main__":
    main()
