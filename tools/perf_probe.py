#!/usr/bin/env python
"""Perf probes: decompose bench time into step / obs / reset / RNG costs.

Run on the target accelerator.  Each probe jits a scan of a reduced program
so the deltas attribute cost to components.  (Ad-hoc tool, not a test.)
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


def timeit(fn, *args, repeats=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--env", default="rware-tiny-2ag-v2")
    p.add_argument("--batch", type=int, default=4096)
    p.add_argument("--steps", type=int, default=256)
    args = p.parse_args()

    import rware_tpu
    from rware_tpu.parallel import batched_reset

    env = rware_tpu.make(args.env)
    B, T = args.batch, args.steps
    states, _ = batched_reset(env, jax.random.key(0), B)
    keys = jax.random.split(jax.random.key(1), B)
    step_fn = env._step_fn
    reset_fn = env._reset_fn
    n = env.config.n_agents

    def scan_over(body):
        def one(state, key):
            def wrapped(carry, k):
                return body(carry, k)

            final, _ = jax.lax.scan(wrapped, state, jax.random.split(key, T))
            return final

        return jax.jit(jax.vmap(one))

    # 1: full step + autoreset (bench equivalent)
    def full(carry, k):
        res = step_fn(carry, env.sample_actions(k))
        rk, ck = jax.random.split(res.state.key)
        fresh = reset_fn(rk).replace(key=ck)
        nxt = jax.tree.map(lambda a, b: jnp.where(res.done, a, b), fresh, res.state)
        return nxt, None

    # 2: step without autoreset
    def no_reset(carry, k):
        res = step_fn(carry, env.sample_actions(k))
        return res.state, None

    # 3: step without obs (engine only)
    noobs_step = __import__(
        "rware_tpu.core.engine", fromlist=["build_step_fn"]
    ).build_step_fn(env.config, obs_fn=lambda s: jnp.zeros(()))

    def no_obs(carry, k):
        res = noobs_step(carry, env.sample_actions(k))
        return res.state, None

    # 4: RNG-only floor: threefry split + randint per step
    def rng_only(carry, k):
        acts = env.sample_actions(k)
        return jax.tree.map(lambda x: x, carry), None

    # 5: reset-only cost
    def reset_only(carry, k):
        fresh = reset_fn(k)
        return fresh, None

    for name, body in [
        ("full(step+obs+autoreset)", full),
        ("step+obs", no_reset),
        ("step-only", no_obs),
        ("rng-only", rng_only),
        ("reset-only", reset_only),
    ]:
        fn = scan_over(body)
        dt = timeit(fn, states, keys)
        print(
            f"{name:28s} {dt*1e3:8.1f} ms  {B*T/dt/1e6:8.2f} M env-steps/s"
        )


if __name__ == "__main__":
    main()
