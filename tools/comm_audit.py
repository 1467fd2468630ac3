#!/usr/bin/env python
"""Comm-model audit from the COMPILED artifact (chip-count independent).

BASELINE.md's multi-chip scaling argument is structural: "one ~106 KB
gradient pmean per minibatch, zero cross-chip traffic in the env loop".
This tool turns that assertion into evidence the single-chip container can
produce: compile the REAL sharded programs for N virtual devices, walk the
post-optimization HLO for collective ops, and record op count x bytes x
program into COMM_AUDIT.json.

Two programs are audited per device count:

  * ``collect``  — the shard_map'd Pallas rollout alone (the env loop).
    The scaling claim requires ZERO collectives here; the audit asserts it.
  * ``train_step`` — the full flagship update (collect + GAE + E x M
    minibatch PPO passes + metrics psums).  Expected collectives: one
    gradient all-reduce per minibatch pass (~param-count x 4 bytes) plus
    O(1) scalar metric reductions; nothing proportional to the env batch.

Bytes are parsed from the HLO shapes of every all-reduce / all-gather /
reduce-scatter / collective-permute / all-to-all op, so the output is the
compiler's actual communication schedule, not a hand count of pmean calls.

Usage:  python tools/comm_audit.py --devices 8,32 --out COMM_AUDIT.json
(CPU virtual devices; re-execs itself with XLA_FLAGS set.)
"""
import argparse
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "bf16": 2, "f16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8, "c64": 8,
    "token": 0,
}

# one HLO result shape, e.g. f32[128,5]{1,0} or (f32[8], s32[])
_SHAPE_RE = re.compile(r"([a-z]+\d*)\[([\d,]*)\]")

_COLLECTIVES = (
    "all-reduce", "all-gather", "reduce-scatter", "collective-permute",
    "all-to-all",
)


def _shape_bytes(shapes_text: str) -> int:
    total = 0
    for dtype, dims in _SHAPE_RE.findall(shapes_text):
        if dtype not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dtype]
    return total


def audit_hlo(hlo: str) -> dict:
    """Count collective ops and their payload bytes in optimized HLO text."""
    ops = []
    for line in hlo.splitlines():
        s = line.strip()
        # op lines look like:  %name = f32[...] all-reduce(...), replica_groups=...
        m = re.match(r"%?[\w.\-]+ = (.+?) (" + "|".join(_COLLECTIVES) + r")\(", s)
        if not m:
            continue
        kind = m.group(2)
        if re.search(r"(all-reduce|all-gather|reduce-scatter|all-to-all|"
                     r"collective-permute)-(start|done)", s):
            # -done ops repeat the -start shape; count the pair once (start)
            if "-done" in m.group(0) or re.match(
                r"%?[\w.\-]+ = .+ (" + "|".join(_COLLECTIVES) + r")-done", s
            ):
                continue
        ops.append({
            "kind": kind,
            "bytes": _shape_bytes(m.group(1)),
            "hlo": s[:160],
        })
    by_kind = {}
    for op in ops:
        k = by_kind.setdefault(op["kind"], {"count": 0, "bytes": 0})
        k["count"] += 1
        k["bytes"] += op["bytes"]
    return {
        "n_collectives": len(ops),
        "total_bytes": sum(op["bytes"] for op in ops),
        "by_kind": by_kind,
        "ops": ops,
    }


def run_audit(n_devices: int, n_envs: int, rollout_len: int, epochs: int,
              minibatches: int) -> dict:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np  # noqa: F401

    sys.path.insert(0, REPO)
    import rware_tpu
    from rware_tpu.models import IPPOConfig
    from rware_tpu.models.ippo_pallas import (
        build_pallas_train_step,
        init_pallas_runner,
    )
    from rware_tpu.ops.pallas_rollout import ENV_BLOCK, build_pallas_collect
    from rware_tpu.parallel import make_mesh, replicate, shard_env_batch

    devices = jax.devices()[:n_devices]
    assert len(devices) == n_devices, f"have {len(jax.devices())}"
    mesh = make_mesh(devices)

    env = rware_tpu.make("rware-tiny-2ag-v2")
    cfg = IPPOConfig(
        n_envs=max(n_envs, ENV_BLOCK * n_devices), rollout_len=rollout_len,
        epochs=epochs, minibatches=minibatches,
    )
    runner, model, tx = init_pallas_runner(env, cfg, jax.random.key(0))
    runner = runner.replace(
        env_states=shard_env_batch(runner.env_states, mesh),
        obs=shard_env_batch(runner.obs, mesh),
        params=replicate(runner.params, mesh),
        opt_state=replicate(runner.opt_state, mesh),
    )
    step = jax.jit(
        build_pallas_train_step(
            env, model, tx, cfg, interpret=True,
            deterministic_collect=True, mesh=mesh,
        )
    )
    hlo_step = step.lower(runner).compile().as_text()
    step_audit = audit_hlo(hlo_step)

    # --- the env loop alone: shard_map'd collect must have ZERO collectives
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    collect = build_pallas_collect(
        env.config, cfg.rollout_len, hidden=tuple(model.hidden),
        interpret=True, deterministic=True,
    )

    # out_specs=P() + check_rep=False: each shard's local output is taken
    # as-is (no replication collectives are inserted by shard_map) — only
    # collectives the COLLECT BODY itself would issue can appear, which is
    # exactly what the audit measures.
    sharded_collect = shard_map(
        lambda s, p: collect(s, p, 0),
        mesh=mesh,
        in_specs=(P("env"), P()),
        out_specs=P(),
        check_rep=False,
    )
    hlo_collect = (
        jax.jit(sharded_collect)
        .lower(runner.env_states, runner.params)
        .compile()
        .as_text()
    )
    collect_audit = audit_hlo(hlo_collect)

    n_param_bytes = sum(
        x.size * 4 for x in jax.tree.leaves(runner.params)
    )
    passes = cfg.epochs * cfg.minibatches
    # HLO is a STATIC program: the gradient all-reduce lives inside the
    # epochs x minibatches scan body, so it appears ONCE in the text but
    # executes once per pass.  The largest all-reduce is that gradient
    # reduce (grads + pmean'd loss metrics fused into one tuple op); the
    # remaining ops are once-per-update scalar metric psums.
    ars = sorted(
        (op for op in step_audit["ops"] if op["kind"] == "all-reduce"),
        key=lambda o: -o["bytes"],
    )
    grad_ar = ars[0]["bytes"] if ars else 0
    scalar_bytes = sum(o["bytes"] for o in ars[1:])
    return {
        "n_devices": n_devices,
        "config": {
            "n_envs": cfg.n_envs, "rollout_len": cfg.rollout_len,
            "epochs": cfg.epochs, "minibatches": cfg.minibatches,
        },
        "param_bytes_f32": n_param_bytes,
        "minibatch_passes": passes,
        "collect": {
            k: collect_audit[k]
            for k in ("n_collectives", "total_bytes", "by_kind")
        },
        "collect_zero_collectives": collect_audit["n_collectives"] == 0,
        "train_step": {
            k: step_audit[k] for k in ("n_collectives", "total_bytes",
                                       "by_kind")
        },
        "train_step_ops": step_audit["ops"],
        "grad_allreduce_bytes_per_pass": grad_ar,
        "scalar_psum_bytes_per_update": scalar_bytes,
        "bytes_per_update": grad_ar * passes + scalar_bytes,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", default="8,32")
    ap.add_argument("--n-envs", type=int, default=2048)
    ap.add_argument("--rollout-len", type=int, default=32)
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--minibatches", type=int, default=4)
    ap.add_argument("--out", default=os.path.join(REPO, "COMM_AUDIT.json"))
    ap.add_argument("--_worker", type=int, default=None)
    args = ap.parse_args()

    if args._worker is not None:
        out = run_audit(args._worker, args.n_envs, args.rollout_len,
                        args.epochs, args.minibatches)
        print("AUDIT_JSON:" + json.dumps(out))
        return

    results = []
    for n in [int(x) for x in args.devices.split(",")]:
        env = dict(os.environ)
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={n}"
        )
        env["JAX_PLATFORMS"] = "cpu"
        cmd = [sys.executable, os.path.abspath(__file__),
               "--_worker", str(n),
               "--n-envs", str(args.n_envs),
               "--rollout-len", str(args.rollout_len),
               "--epochs", str(args.epochs),
               "--minibatches", str(args.minibatches)]
        proc = subprocess.run(cmd, env=env, capture_output=True, text=True,
                              timeout=3000, cwd=REPO)
        payload = None
        for line in proc.stdout.splitlines():
            if line.startswith("AUDIT_JSON:"):
                payload = json.loads(line[len("AUDIT_JSON:"):])
        if payload is None:
            sys.stderr.write(proc.stdout[-2000:] + proc.stderr[-4000:])
            raise SystemExit(f"worker for {n} devices failed")
        ok = payload["collect_zero_collectives"]
        print(
            f"{n} devices: collect collectives={payload['collect']['n_collectives']}"
            f" (zero={ok}), train_step collectives="
            f"{payload['train_step']['n_collectives']}, "
            f"grad all-reduce bytes/pass={payload['grad_allreduce_bytes_per_pass']}"
        )
        results.append(payload)

    out = {
        "tool": "tools/comm_audit.py",
        "claim": "one ~106 KB gradient pmean per minibatch pass; zero "
                 "env-loop collectives (BASELINE.md multi-chip section)",
        "results": results,
        "all_ok": all(r["collect_zero_collectives"] for r in results),
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}; all_ok={out['all_ok']}")


if __name__ == "__main__":
    main()
