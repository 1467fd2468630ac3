#!/usr/bin/env python
"""Throughput benchmark: batched env-steps/s on the local accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is the speedup over the reference implementation's measured
single-process CPU throughput on the same config (BASELINE.md: ~2,330
env-steps/s for rware-tiny-2ag).

Protocol: B parallel envs stepped in lockstep with uniform-random actions and
auto-reset, T steps per compiled program, repeated R times with full output
materialisation + device synchronisation, best-of-R wall time.

Default engine is the fused Pallas rollout kernel (one dispatch per env
block, all state in VMEM); --xla uses the vmap+scan XLA path instead, and
the benchmark falls back to it automatically for configs the kernel does
not support (n_agents > 8).
"""
import argparse
import json
import time

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
    from rware_tpu.parallel import batched_reset, build_rollout_fn

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

        def run(states, keys):
            # seed folded from the key batch so repeats use fresh streams
            seed = jax.random.randint(keys[0], (), 0, 2**31 - 1)
            new_states, rew, epis = pallas_roll(states, seed)
            # reduce to one scalar DEPENDENT ON ALL OUTPUTS: fetching it
            # host-side forces completion even on backends whose
            # block_until_ready resolves at enqueue time
            checksum = (
                rew.sum()
                + new_states.agent_x.sum()
                + new_states.shelf_x.sum()
                + new_states.cur_steps.sum()
                + epis.sum()
            )
            return checksum

    elif args.obs:
        single = build_rollout_fn(env, n_steps=T)

        def run(states, keys):
            final, traj = jax.vmap(single)(states, keys)
            return (
                traj.rewards.sum()
                + final.agent_x.sum()
                + traj.obs.sum()
                + final.cur_steps.sum()
            )

    else:
        step_fn = env._step_fn
        reset_fn = env._reset_fn

        def one_env(state, key):
            def body(carry, k):
                state, rew_sum = carry
                res = step_fn(state, env.sample_actions(k))
                reset_key, carry_key = jax.random.split(res.state.key)
                fresh = reset_fn(reset_key).replace(key=carry_key)
                next_state = jax.tree.map(
                    lambda a, b: jnp.where(res.done, a, b), fresh, res.state
                )
                return (next_state, rew_sum + res.rewards.sum()), None

            (final, rew), _ = jax.lax.scan(
                body,
                (state, jnp.float32(0)),
                jax.random.split(key, T),
                unroll=args.unroll,
            )
            return final, rew

        def run(states, keys):
            final, rews = jax.vmap(one_env)(states, keys)
            return (
                rews.sum()
                + final.agent_x.sum()
                + final.shelf_x.sum()
                + final.cur_steps.sum()
            )

    run = jax.jit(run)

    key = jax.random.key(0)
    states, _ = batched_reset(env, key, B)
    keys = jax.random.split(jax.random.key(1), B)

    import numpy as np

    def run_synced(states, keys):
        # fetch the output-dependent scalar to host: completion proof
        return float(np.asarray(run(states, keys)))

    # compile + warmup
    checksum = run_synced(states, keys)

    best = float("inf")
    for r in range(args.repeats):
        keys = jax.vmap(jax.random.fold_in)(keys, jnp.full(B, r))
        jax.block_until_ready(keys)
        t0 = time.perf_counter()
        run_synced(states, keys)
        best = min(best, time.perf_counter() - t0)

    steps_per_sec = B * T / best
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
