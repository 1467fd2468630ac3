#!/usr/bin/env python
"""Throughput benchmark: batched env-steps/s on the local accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is the speedup over the reference implementation's measured
single-process CPU throughput on the same config (BASELINE.md: ~2,330
env-steps/s for rware-tiny-2ag).

Protocol: B parallel envs stepped in lockstep with uniform-random actions and
auto-reset, T steps per rollout program.  Sustained cost is slope-timed: K
rollouts chained on the env state inside ONE jit (serial data dependency),
per-rollout time = (t(1+K) - t(1)) / K with a dependent-scalar host fetch —
the fixed per-dispatch tunnel RTT of this backend cancels, matching a
production loop that runs many steps between host syncs.

Default engine is the fused Pallas rollout kernel (one dispatch per env
block, all state in VMEM; the pointer-doubling resolver covers every
registered config incl. 19 agents — PERF_TABLE.json); --xla uses the
vmap+scan XLA path instead, and the benchmark falls back to it
automatically on CPU and for --obs runs (the rollout kernel is TPU-only
and does not materialise the per-step obs trajectory).
"""
import argparse
import json
import os

import jax
import jax.numpy as jnp


def _ensure_backend():
    """Fall back to auto-selection if the configured platform is missing
    (e.g. JAX_PLATFORMS names a plugin that didn't register in this process)."""
    try:
        jax.devices()
    except RuntimeError:
        jax.config.update("jax_platforms", "")
        jax.devices()


# Reference single-process CPU throughput per config (BASELINE.md, measured
# on this container); vs_baseline uses the matching config or null.
REF_STEPS_PER_SEC = {
    "rware-tiny-2ag-v2": 2330.0,
    "rware-small-4ag-v2": 1680.0,
    "rware-medium-6ag-v2": 1090.0,
    "rware-large-8ag-v2": 780.0,
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--env", default="rware-tiny-2ag-v2")
    p.add_argument("--batch", type=int, default=65536)
    p.add_argument("--steps", type=int, default=256, help="scan length per call")
    p.add_argument("--repeats", type=int, default=5)
    p.add_argument("--obs", action="store_true", help="include obs in carry-out")
    p.add_argument(
        "--unroll", type=int, default=4,
        help="lax.scan unroll factor (merges step programs, fewer dispatches)",
    )
    p.add_argument(
        "--xla", action="store_true",
        help="use the vmap+scan XLA engine instead of the Pallas kernel",
    )
    args = p.parse_args()

    _ensure_backend()
    import rware_tpu
    from rware_tpu.compile_cache import enable_persistent_cache
    from rware_tpu.parallel import batched_reset, build_rollout_fn

    enable_persistent_cache()

    env = rware_tpu.make(args.env)
    B, T = args.batch, args.steps

    # Rollout WITHOUT materialising per-step outputs: the pure stepping-rate
    # benchmark (obs are still computed inside step; they just stay in
    # registers/VMEM instead of being written to a (T, B, ...) HBM buffer
    # unless --obs asks for the trajectory).
    # the compiled kernel needs real TPU hardware; CPU runs use the XLA path
    on_cpu = jax.devices()[0].platform == "cpu"
    use_pallas = not (args.xla or args.obs or on_cpu)
    if use_pallas:
        try:
            from rware_tpu.ops.pallas_rollout import build_pallas_rollout

            pallas_roll = build_pallas_rollout(env.config, T)
        except NotImplementedError:
            use_pallas = False
    if use_pallas:

        def body(i, carry):
            states, acc = carry
            # per-iteration seed: fresh PRNG streams each chained rollout
            new_states, rew, epis = pallas_roll(states, i * 7919 + 1)
            return new_states, acc + rew.sum() + epis.sum()

    elif args.obs:
        single = build_rollout_fn(env, n_steps=T)

        def body(i, carry):
            states, acc = carry
            keys = jax.vmap(jax.random.fold_in)(
                jax.random.split(jax.random.key(1), B), jnp.full(B, i)
            )
            final, traj = jax.vmap(single)(states, keys)
            return final, acc + traj.rewards.sum() + traj.obs.sum()

    else:
        step_fn = env._step_fn
        reset_fn = env._reset_fn

        def one_env(state, key):
            def step_body(carry, k):
                state, rew_sum = carry
                res = step_fn(state, env.sample_actions(k))
                reset_key, carry_key = jax.random.split(res.state.key)
                fresh = reset_fn(reset_key).replace(key=carry_key)
                next_state = jax.tree.map(
                    lambda a, b: jnp.where(res.done, a, b), fresh, res.state
                )
                return (next_state, rew_sum + res.rewards.sum()), None

            (final, rew), _ = jax.lax.scan(
                step_body,
                (state, jnp.float32(0)),
                jax.random.split(key, T),
                unroll=args.unroll,
            )
            return final, rew

        def body(i, carry):
            states, acc = carry
            keys = jax.vmap(jax.random.fold_in)(
                jax.random.split(jax.random.key(1), B), jnp.full(B, i)
            )
            final, rews = jax.vmap(one_env)(states, keys)
            return final, acc + rews.sum()

    key = jax.random.key(0)
    states, _ = batched_reset(env, key, B)

    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from tools.timing import slope

    def extract(carry):
        final, acc = carry
        return (
            acc
            + final.agent_x.sum().astype(jnp.float32)
            + final.cur_steps.sum().astype(jnp.float32)
        )

    per_rollout, _base = slope(
        body, extract, (states, jnp.float32(0)), iters=args.repeats
    )
    steps_per_sec = B * T / per_rollout
    ref = REF_STEPS_PER_SEC.get(args.env)
    print(
        json.dumps(
            {
                "metric": f"env-steps/s ({args.env}, B={B}, T={T}, "
                f"{'pallas' if use_pallas else 'xla'}, "
                f"{jax.devices()[0].device_kind})",
                "value": round(steps_per_sec, 1),
                "unit": "env-steps/s",
                "vs_baseline": round(steps_per_sec / ref, 1) if ref else None,
            }
        )
    )


if __name__ == "__main__":
    main()
