#!/usr/bin/env python
"""Per-config throughput table: Pallas rollout vs XLA engine (VERDICT #7).

Sweeps the registered size grid x agent counts on the local accelerator and
writes a JSON table (markdown-printable) for BASELINE.md.  Random-action
rollouts with autoreset, slope-timed (K chained rollouts in one jit — the
fixed per-dispatch tunnel RTT cancels; tools/timing.py).
"""
import argparse
import json
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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_CONFIGS = [
    ("rware-tiny-2ag-v2", 16384),
    ("rware-tiny-4ag-v2", 16384),
    ("rware-small-4ag-v2", 16384),
    ("rware-medium-6ag-v2", 8192),
    ("rware-large-8ag-v2", 8192),
    ("rware-tiny-12ag-v2", 4096),
    ("rware-tiny-16ag-v2", 4096),
    ("rware-large-19ag-v2", 2048),
]


def sync_scalar(x):
    return float(np.asarray(x))


def bench_pallas(env, B, T, repeats):
    from rware_tpu.ops.pallas_rollout import build_pallas_rollout
    from rware_tpu.parallel import batched_reset
    from tools.timing import slope

    roll = build_pallas_rollout(env.config, T)

    def body(i, carry):
        states, acc = carry
        ns, rew, epis = roll(states, i * 7919 + 1)
        return ns, acc + rew.sum() + epis.sum()

    def extract(carry):
        ns, acc = carry
        return acc + ns.agent_x.sum().astype(jnp.float32)

    states, _ = batched_reset(env, jax.random.key(0), B)
    t0 = time.time()
    per_iter, _base = slope(
        body, extract, (states, jnp.float32(0)), iters=repeats
    )
    compile_s = time.time() - t0  # both chain compiles + the runs
    return B * T / per_iter, compile_s


def bench_xla(env, B, T, repeats):
    from rware_tpu.parallel import batched_reset

    step_fn = env._step_fn
    reset_fn = env._reset_fn

    def one_env(state, key):
        def body(carry, k):
            state, rew = carry
            res = step_fn(state, env.sample_actions(k))
            rk, ck = jax.random.split(res.state.key)
            fresh = reset_fn(rk).replace(key=ck)
            nxt = jax.tree.map(
                lambda a, b: jnp.where(res.done, a, b), fresh, res.state
            )
            return (nxt, rew + res.rewards.sum()), None

        (final, rew), _ = jax.lax.scan(
            body, (state, jnp.float32(0)), jax.random.split(key, T), unroll=4
        )
        return final, rew

    from tools.timing import slope

    def body(i, carry):
        states, acc = carry
        keys = jax.vmap(jax.random.fold_in)(
            jax.random.split(jax.random.key(1), B), jnp.full(B, i)
        )
        final, rews = jax.vmap(one_env)(states, keys)
        return final, acc + rews.sum()

    def extract(carry):
        final, acc = carry
        return acc + final.agent_x.sum().astype(jnp.float32)

    states, _ = batched_reset(env, jax.random.key(0), B)
    t0 = time.time()
    per_iter, _base = slope(
        body, extract, (states, jnp.float32(0)), iters=repeats
    )
    compile_s = time.time() - t0
    return B * T / per_iter, compile_s


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="PERF_TABLE.json")
    p.add_argument("--steps", type=int, default=128)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--skip-xla", action="store_true")
    p.add_argument("--only", default=None,
                   help="substring filter on env ids (e.g. large-8ag)")
    args = p.parse_args()

    import rware_tpu

    rows = []
    for env_id, B in DEFAULT_CONFIGS:
        if args.only and args.only not in env_id:
            continue
        env = rware_tpu.make(env_id)
        row = {"env": env_id, "B": B, "T": args.steps}
        try:
            sps, cs = bench_pallas(env, B, args.steps, args.repeats)
            row["pallas_steps_per_s"] = round(sps)
            row["pallas_compile_s"] = round(cs, 1)
        except Exception as e:  # noqa: BLE001
            row["pallas_error"] = repr(e)[:300]
        if not args.skip_xla:
            try:
                sps, cs = bench_xla(env, B, args.steps, args.repeats)
                row["xla_steps_per_s"] = round(sps)
                row["xla_compile_s"] = round(cs, 1)
            except Exception as e:  # noqa: BLE001
                row["xla_error"] = repr(e)[:300]
        rows.append(row)
        print(row, flush=True)

    out = {"device": jax.devices()[0].device_kind, "rows": rows}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"perf_table_rows": len(rows)}))


if __name__ == "__main__":
    main()
