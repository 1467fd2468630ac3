#!/usr/bin/env python
"""Train IPPO or SEAC on a warehouse config — the end-to-end driver.

Examples:
  python train.py --env rware-tiny-2ag-v2 --updates 100
  python train.py --algo seac --env rware-small-4ag-v2 --n-envs 512
  python train.py --resume --checkpoint-dir ckpts/run1

Multi-host: launch one process per host with jax.distributed coordinates in
the environment and pass --distributed; the env batch shards over all chips.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--env", default="rware-tiny-2ag-v2")
    p.add_argument(
        "--algo", choices=["ippo", "mappo", "seac", "seac-ppo"],
        default="ippo",
        help="seac-ppo = shared-experience PPO (the SEAC variant validated "
        "to learn; see models/seac.py)",
    )
    p.add_argument(
        "--net", choices=["mlp", "gru"], default="mlp",
        help="policy network (gru = recurrent actor; ippo, mappo and "
        "seac-ppo)",
    )
    p.add_argument(
        "--minibatch-mode", choices=["shuffle", "block"], default="shuffle",
        help="PPO minibatching: block = contiguous random-offset slices "
        "(~2x faster updates on TPU; time-band minibatches)",
    )
    p.add_argument(
        "--collect", choices=["xla", "pallas"], default="xla",
        help="experience collector: pallas = fused in-kernel obs+policy+env "
        "(TPU only; ippo with mlp or gru nets)",
    )
    p.add_argument(
        "--msg-bits", type=int, default=None,
        help="override the env's message-channel width (ids cannot express "
        "it); trains the Bernoulli message head on the XLA ippo path",
    )
    p.add_argument("--updates", type=int, default=100)
    p.add_argument("--n-envs", type=int, default=256)
    p.add_argument("--rollout-len", type=int, default=None)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--ent-coef", type=float, default=0.01)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--checkpoint-every", type=int, default=50)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--log-every", type=int, default=10)
    p.add_argument("--profile-dir", default=None, help="capture a jax trace here")
    p.add_argument("--platform", default=None, help="force jax platform (cpu/tpu)")
    p.add_argument("--distributed", action="store_true")
    p.add_argument("--mesh", action="store_true", help="shard envs over all devices")
    return p.parse_args()


def main():
    args = parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.distributed:
        from rware_tpu.distributed import initialize

        pid, nproc = initialize()
        print(f"distributed: process {pid}/{nproc}", flush=True)

    from rware_tpu.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    import rware_tpu
    from rware_tpu.metrics import MetricLogger
    from rware_tpu.parallel import make_mesh, replicate, shard_env_batch

    env = (
        rware_tpu.make(args.env, msg_bits=args.msg_bits)
        if args.msg_bits is not None
        else rware_tpu.make(args.env)
    )
    print(
        f"env={args.env} grid={env.grid_size} agents={env.n_agents} "
        f"devices={len(jax.devices())}",
        flush=True,
    )

    key = jax.random.key(args.seed)
    if args.algo == "ippo" and args.net == "gru":
        from rware_tpu.models import IPPOConfig
        from rware_tpu.models.ippo_rnn import (
            build_rnn_pallas_train_step,
            build_rnn_train_step,
            init_rnn_runner,
        )

        cfg = IPPOConfig(
            n_envs=args.n_envs,
            rollout_len=args.rollout_len or 128,
            lr=args.lr,
            ent_coef=args.ent_coef,
            minibatch_mode=args.minibatch_mode,
        )
        runner, model, tx = init_rnn_runner(env, cfg, key)
        if args.collect == "pallas" and jax.devices()[0].platform != "cpu":
            mesh_rnn = None
            if args.mesh and len(jax.devices()) > 1:
                mesh_rnn = make_mesh()
            train_step = jax.jit(
                build_rnn_pallas_train_step(env, model, tx, cfg,
                                            mesh=mesh_rnn)
            )
        else:
            train_step = jax.jit(build_rnn_train_step(env, model, tx, cfg), donate_argnums=0)
        env_steps_per_update = cfg.n_envs * cfg.rollout_len
    elif args.algo == "ippo":
        from rware_tpu.models import IPPOConfig, build_train_step, init_runner

        cfg = IPPOConfig(
            n_envs=args.n_envs,
            rollout_len=args.rollout_len or 128,
            lr=args.lr,
            ent_coef=args.ent_coef,
            minibatch_mode=args.minibatch_mode,
        )
        runner, model, tx = init_runner(env, cfg, key)
        if args.collect == "pallas" and jax.devices()[0].platform == "cpu":
            print(
                "--collect pallas needs TPU hardware; falling back to the "
                "XLA collector",
                flush=True,
            )
            args.collect = "xla"
        if args.collect == "pallas":
            from rware_tpu.models.ippo_pallas import build_pallas_train_step

            mesh = None
            if args.mesh and len(jax.devices()) > 1:
                from rware_tpu.parallel import make_mesh

                mesh = make_mesh()
            train_step = jax.jit(
                build_pallas_train_step(env, model, tx, cfg, mesh=mesh),
                donate_argnums=0,
            )
        else:
            train_step = jax.jit(build_train_step(env, model, tx, cfg), donate_argnums=0)
        env_steps_per_update = cfg.n_envs * cfg.rollout_len
    elif args.algo == "mappo" and args.net == "gru":
        from rware_tpu.models import IPPOConfig
        from rware_tpu.models.mappo import (
            build_rnn_mappo_train_step,
            init_rnn_mappo_runner,
        )

        cfg = IPPOConfig(
            n_envs=args.n_envs,
            rollout_len=args.rollout_len or 128,
            lr=args.lr,
            ent_coef=args.ent_coef,
        )
        if jax.devices()[0].platform == "cpu":
            raise SystemExit(
                "recurrent MAPPO rides the GRU collect kernel (TPU only)"
            )
        runner, actor, critic, tx = init_rnn_mappo_runner(env, cfg, key)
        mesh_rmappo = None
        if args.mesh and len(jax.devices()) > 1:
            mesh_rmappo = make_mesh()
        train_step = jax.jit(
            build_rnn_mappo_train_step(
                env, actor, critic, tx, cfg, mesh=mesh_rmappo,
            ),
            donate_argnums=0,
        )
        env_steps_per_update = cfg.n_envs * cfg.rollout_len
    elif args.algo == "mappo":
        from rware_tpu.models import IPPOConfig
        from rware_tpu.models.mappo import (
            build_mappo_train_step,
            init_mappo_runner,
        )

        cfg = IPPOConfig(
            n_envs=args.n_envs,
            rollout_len=args.rollout_len or 128,
            lr=args.lr,
            ent_coef=args.ent_coef,
        )
        runner, actor, critic, tx = init_mappo_runner(env, cfg, key)
        collect_mode = (
            "pallas"
            if args.collect == "pallas"
            and jax.devices()[0].platform != "cpu"
            else "xla"
        )
        mesh_mappo = None
        if args.mesh and len(jax.devices()) > 1:
            mesh_mappo = make_mesh()
        train_step = jax.jit(
            build_mappo_train_step(
                env, actor, critic, tx, cfg, collect_mode=collect_mode,
                mesh=mesh_mappo,
            ),
            donate_argnums=0,
        )
        env_steps_per_update = cfg.n_envs * cfg.rollout_len
    elif args.algo == "seac-ppo" and args.net == "gru":
        from rware_tpu.models.seac import (
            SEACPPOConfig,
            build_seac_gru_train_step,
            init_seac_gru,
        )

        cfg = SEACPPOConfig(
            n_envs=args.n_envs,
            rollout_len=args.rollout_len or 128,
            lr=args.lr,
            ent_coef=args.ent_coef,
        )
        runner, model, tx = init_seac_gru(env, cfg, key)
        collect_mode = (
            "pallas"
            if args.collect == "pallas"
            and jax.devices()[0].platform != "cpu"
            else "xla"
        )
        mesh_sg = None
        if args.mesh and len(jax.devices()) > 1:
            mesh_sg = make_mesh()
        train_step = jax.jit(
            build_seac_gru_train_step(
                env, model, tx, cfg, collect_mode=collect_mode,
                mesh=mesh_sg,
            ),
            donate_argnums=0,
        )
        env_steps_per_update = cfg.n_envs * cfg.rollout_len
    elif args.algo == "seac-ppo":
        from rware_tpu.models.seac import (
            SEACPPOConfig,
            build_seac_ppo_train_step,
            init_seac_ppo,
        )

        cfg = SEACPPOConfig(
            n_envs=args.n_envs,
            rollout_len=args.rollout_len or 128,
            lr=args.lr,
            ent_coef=args.ent_coef,
        )
        runner, model, tx = init_seac_ppo(env, cfg, key)
        collect_mode = (
            "pallas"
            if args.collect == "pallas"
            and jax.devices()[0].platform != "cpu"
            else "xla"
        )
        train_step = jax.jit(
            build_seac_ppo_train_step(
                env, model, tx, cfg, collect_mode=collect_mode
            ),
            donate_argnums=0,
        )
        env_steps_per_update = cfg.n_envs * cfg.rollout_len
    else:
        from rware_tpu.models.seac import (
            SEACConfig,
            build_seac_train_step,
            init_seac,
        )

        cfg = SEACConfig(
            n_envs=args.n_envs,
            rollout_len=args.rollout_len or 5,
            lr=args.lr,
            ent_coef=args.ent_coef,
        )
        runner, model, tx = init_seac(env, cfg, key)
        train_step = jax.jit(build_seac_train_step(env, model, tx, cfg), donate_argnums=0)
        env_steps_per_update = cfg.n_envs * cfg.rollout_len

    if args.mesh and len(jax.devices()) > 1:
        mesh = make_mesh()
        runner = runner.replace(
            env_states=shard_env_batch(runner.env_states, mesh),
            obs=shard_env_batch(runner.obs, mesh),
            params=replicate(runner.params, mesh),
            opt_state=replicate(runner.opt_state, mesh),
        )
        if hasattr(runner, "carry"):
            runner = runner.replace(
                carry=shard_env_batch(runner.carry, mesh)
            )
        print(f"sharded {args.n_envs} envs over {mesh.devices.size} devices")

    ckpt = None
    start = 0
    if args.checkpoint_dir:
        from rware_tpu.checkpoint import Checkpointer

        ckpt = Checkpointer(args.checkpoint_dir)
        if args.resume and ckpt.latest_step is not None:
            runner = ckpt.restore(template=runner)
            start = int(runner.update_idx)
            print(f"resumed from update {start}", flush=True)

    logger = MetricLogger(print_every=args.log_every)
    from rware_tpu.profiling import StepTimer, TraceWindow, aggregate_across_hosts

    timer = StepTimer(skip_first=1)
    # automatic trace artifact: a 3-step window after compile/warmup
    tracer = TraceWindow(args.profile_dir, start=start + 3) if args.profile_dir else None

    def run_updates():
        nonlocal runner
        # fetching metrics forces a device->host sync whose fixed RTT
        # dominates per-update cost on tunneled backends — sync only at
        # log boundaries and let the runner carry chain on device between
        # them (the update stream pipelines; measured 3.0M -> ~20M
        # env-steps/s for SEAC-PPO at B=4096 with --log-every 50)
        log_int = max(1, args.log_every)
        timer.tick()
        last_sync = start
        for u in range(start, args.updates):
            if tracer:
                tracer.step(u)
            runner, metrics = train_step(runner)
            at_boundary = (u + 1) % log_int == 0 or u + 1 == args.updates
            if ckpt and (u + 1) % args.checkpoint_every == 0:
                ckpt.save(u + 1, runner)
                at_boundary = True  # save materialised the runner
            if not at_boundary:
                continue
            if args.distributed:
                metrics = aggregate_across_hosts(
                    {k: float(v) for k, v in metrics.items()}
                )
            n = u + 1 - last_sync
            logger.log(u + 1, metrics, env_steps=env_steps_per_update * n)
            timer.tick(n_steps=n)
            last_sync = u + 1
        if tracer:
            tracer.close()

    run_updates()
    step_stats = timer.summary()
    if step_stats:
        print(
            f"timing: {step_stats['step_ms_p50']:.1f}ms p50 / "
            f"{step_stats['step_ms_p95']:.1f}ms p95 per update "
            f"({step_stats['steps_per_s'] * env_steps_per_update / 1e6:.2f}M "
            "env-steps/s)",
            flush=True,
        )

    if ckpt:
        ckpt.save(args.updates, runner, wait=True)
        ckpt.close()
    summary = logger.summary()
    print(
        "done:",
        {k: round(v, 4) for k, v in summary.items() if "loss" in k or "reward" in k or "env_steps" in k},
        flush=True,
    )


if __name__ == "__main__":
    main()
