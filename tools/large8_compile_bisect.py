#!/usr/bin/env python
"""Bisect WHICH config axis makes the remote compile helper crash on
rware-large-8ag (ROADMAP #7: HTTP 500, tpu_compile_helper exit 1, fresh
compiles only).

Compiles build_pallas_rollout for a matrix of env ids that isolate grid
size (H*W), shelf count S, agent count N and rollout length T, one process
per attempt is NOT needed — each compile is independent within one
process.  Prints PASS/FAIL + compile seconds per cell.
"""
import argparse
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

CELLS = [
    # (label, env_id, B, T, chained) — isolates batch size, rollout
    # length, agent count and the fori_loop wrapper used by the
    # slope-timing harness.  Anchors: B=1024/T=32 compiled on hardware
    # (TPUPARITY_r03), B=8192/T=128 under fori crashed the helper 3/3.
    ("anchor-pass", "rware-large-8ag-v2", 1024, 32, False),
    ("T=128", "rware-large-8ag-v2", 1024, 128, False),
    ("B=8192", "rware-large-8ag-v2", 8192, 32, False),
    ("B=8192 T=128", "rware-large-8ag-v2", 8192, 128, False),
    ("B=8192 T=128 fori", "rware-large-8ag-v2", 8192, 128, True),
    ("large-grid N=2", "rware-large-2ag-v2", 8192, 128, False),
    ("medium-grid N=8", "rware-medium-8ag-v2", 8192, 128, False),
    # batch threshold on the large grid (B=1024 passes, B=8192 fails):
    ("B=2048", "rware-large-8ag-v2", 2048, 128, False),
    ("B=4096", "rware-large-8ag-v2", 4096, 128, False),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", default="")
    args = ap.parse_args()
    import rware_tpu
    from rware_tpu.ops.pallas_rollout import build_pallas_rollout
    from rware_tpu.parallel import batched_reset

    cells = CELLS
    if args.cells:
        idx = [int(i) for i in args.cells.split(",")]
        cells = [CELLS[i] for i in idx]

    for label, env_id, B, T, chained in cells:
        env = rware_tpu.make(env_id)
        t0 = time.time()
        try:
            # max_envs_per_call=B disables the auto-chunking mitigation —
            # this tool measures the raw single-call compile threshold
            roll = build_pallas_rollout(env.config, T, max_envs_per_call=B)
            states, _ = batched_reset(env, jax.random.key(0), B)
            if chained:
                def body(i, carry):
                    states, acc = carry
                    ns, rew, epis = roll(states, i * 7919 + 1)
                    return ns, acc + rew.sum() + epis.sum()

                def f(s):
                    ns, acc = jax.lax.fori_loop(
                        0, 2, body, (s, jnp.float32(0))
                    )
                    return acc + ns.agent_x.sum().astype(jnp.float32)

                val = float(np.asarray(jax.jit(f)(states)))
            else:
                def f(s):
                    ns, rew, epis = roll(s, 7)
                    return rew.sum() + ns.agent_x.sum().astype(jnp.float32)

                val = float(np.asarray(jax.jit(f)(states)))
            print(
                f"PASS {label:22s} ({env_id}, B={B}, T={T}, "
                f"fori={chained}) compile+run {time.time()-t0:.1f}s "
                f"checksum={val:.0f}",
                flush=True,
            )
        except Exception as e:
            msg = str(e).splitlines()[0][:160] if str(e) else repr(e)[:160]
            print(
                f"FAIL {label:22s} ({env_id}, B={B}, T={T}, "
                f"fori={chained}) {time.time()-t0:.1f}s {msg}",
                flush=True,
            )


if __name__ == "__main__":
    main()
