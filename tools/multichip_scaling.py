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
    per_dev = ENV_BLOCK  # one kernel env-block per device
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

        xstep = jax.jit(build_train_step(env, model, tx, cfg))
        with mesh:
            t_xla = time_steps(xstep, runner)

        steps = cfg.n_envs * cfg.rollout_len
        rows.append(
            {
                "devices": n_dev,
                "global_envs": cfg.n_envs,
                "pallas_interpret_steps_s": steps / t_pallas,
                "xla_steps_s": steps / t_xla,
            }
        )
        print(rows[-1], flush=True)

    for key in ("pallas_interpret_steps_s", "xla_steps_s"):
        base = rows[0][key]
        for r in rows:
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
