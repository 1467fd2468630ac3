#!/usr/bin/env python
"""Relative multi-chip scaling of the shard_map'd Pallas-native train step
on a VIRTUAL device mesh (VERDICT r2 #8).

Real pod hardware is unavailable in this container, so this measures
RELATIVE scaling: fixed per-device env batch over 1/2/4/8 virtual CPU
devices, slope-timed steps/s per mesh size.  The Pallas kernel runs in
interpret mode (per-device interpret work is constant at fixed per-device
B, so the curve isolates the sharding/collective overhead); the XLA
engine path runs natively as a second curve.  The communication cost model
is printed alongside: per minibatch, DP-PPO pmeans one ~100 KB gradient
pytree — everything else (collect, GAE, rolls) is device-local by
construction.

Writes MULTICHIP_SCALING.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# persistent XLA executable cache: second-process compiles deserialize
# instead of recompiling (rware_tpu/compile_cache; RWARE_TPU_NO_CACHE=1 opts out)
from rware_tpu.compile_cache import enable_persistent_cache

enable_persistent_cache()

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def time_steps(step, runner, repeats=3, chain=2):
    def run(r):
        for _ in range(chain):
            r, m = step(r)
        return r

    r = run(runner)  # compile + warm
    jax.block_until_ready(r.params)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = run(r)
        jax.block_until_ready(out.params)
        best = min(best, time.perf_counter() - t0)
    return best / chain


def main():
    import rware_tpu
    from rware_tpu.models import IPPOConfig, build_train_step
    from rware_tpu.models.ippo_pallas import (
        build_pallas_train_step,
        init_pallas_runner,
    )
    from rware_tpu.ops.pallas_rollout import ENV_BLOCK
    from rware_tpu.parallel import make_mesh, replicate, shard_env_batch

    env = rware_tpu.make("rware-tiny-2ag-v2")
    per_dev = ENV_BLOCK  # one kernel env-block per device (pallas curve)
    # the XLA curve feeds each virtual device a batch one host core can
    # actually sustain — at 1024 envs/device x 8 devices the round-3
    # artifact measured host-thread thrash (0.27x at 8 devices), i.e.
    # the 4-core host, not the sharding (VERDICT r3 #3)
    per_dev_xla = 128
    host_cores = os.cpu_count() or 1
    rows = []
    for n_dev in (1, 2, 4, 8):
        devices = jax.devices()[:n_dev]
        mesh = make_mesh(devices)
        cfg = IPPOConfig(
            n_envs=per_dev * n_dev, rollout_len=32, epochs=1, minibatches=2
        )
        runner, model, tx = init_pallas_runner(env, cfg, jax.random.key(0))
        runner = runner.replace(
            env_states=shard_env_batch(runner.env_states, mesh),
            obs=shard_env_batch(runner.obs, mesh),
            params=replicate(runner.params, mesh),
            opt_state=replicate(runner.opt_state, mesh),
        )
        pstep = jax.jit(
            build_pallas_train_step(
                env, model, tx, cfg, interpret=True,
                deterministic_collect=True, mesh=mesh,
            )
        )
        t_pallas = time_steps(pstep, runner)

        row = {
            "devices": n_dev,
            "host_bound": n_dev > host_cores,
            "global_envs": cfg.n_envs,
            "pallas_interpret_steps_s": cfg.n_envs * 32 / t_pallas,
        }
        # the compiled-XLA curve only makes sense while each virtual
        # device can map to a real core; beyond that it measures host
        # thread thrash (the round-3 artifact's inverted 0.27x row)
        if n_dev <= host_cores:
            cfg_x = IPPOConfig(
                n_envs=per_dev_xla * n_dev, rollout_len=32, epochs=1,
                minibatches=2,
            )
            runner_x, model_x, tx_x = init_pallas_runner(
                env, cfg_x, jax.random.key(0)
            )
            runner_x = runner_x.replace(
                env_states=shard_env_batch(runner_x.env_states, mesh),
                obs=shard_env_batch(runner_x.obs, mesh),
                params=replicate(runner_x.params, mesh),
                opt_state=replicate(runner_x.opt_state, mesh),
            )
            xstep = jax.jit(build_train_step(env, model_x, tx_x, cfg_x))
            with mesh:
                t_xla = time_steps(xstep, runner_x)
            row["global_envs_xla"] = cfg_x.n_envs
            row["xla_steps_s"] = cfg_x.n_envs * 32 / t_xla
        rows.append(row)
        print(rows[-1], flush=True)

    for key in ("pallas_interpret_steps_s", "xla_steps_s"):
        base = rows[0][key]
        for r in rows:
            if key in r:
                r[key.replace("steps_s", "rel")] = round(r[key] / base, 2)

    grad_bytes = sum(
        np.prod(x.shape) * 4
        for x in jax.tree.leaves(
            init_pallas_runner(
                env, IPPOConfig(n_envs=per_dev), jax.random.key(0)
            )[0].params
        )
    )
    out = {
        "per_device_envs": per_dev,
        "per_device_envs_xla": per_dev_xla,
        "host_cores": host_cores,
        "note": (
            "virtual CPU mesh: rows with host_bound=true run more "
            "devices than the host has cores, so they measure host "
            "saturation, not the sharding; the OS-process-level "
            "verification artifact is MULTIPROC_r04.json "
            "(tools/multiproc_verify.py)"
        ),
        "rollout_len": 32,
        "comm_model": {
            "pmean_bytes_per_minibatch": int(grad_bytes),
            "collect_gae_cross_chip_bytes": 0,
        },
        "rows": rows,
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "MULTICHIP_SCALING.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
