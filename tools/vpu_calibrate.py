#!/usr/bin/env python
"""Measured VPU issue-slot ceiling (roofline-v2 calibration).

The paper VPU peak (~6.0e12 elem-op/s on v5e) assumes every ALU issues
every cycle.  The env kernels are dependency-CHAINED integer/compare/select
streams over stacked (8,128) tiles — the achievable ceiling for that op mix
is what "issue-bound" should be measured against.  This tool measures it
directly with Pallas micro-kernels:

  * serial-f32 / serial-i32: one block, each op consumes the previous op's
    result (pure dependency chain — the pessimistic bound),
  * ilp4-f32 / ilp4-i32: four independent chains (what a well-scheduled
    kernel with independent tile rows can reach),
  * envmix-i32: an add/compare/select/bitwise mix shaped like the resolver
    inner loop, on an 8-row stacked block (the realistic case: ops serial,
    tiles within an op independent).

Cost is slope-timed (tools/timing.py): K applications of the op body
inside ONE kernel via fori_loop, (t(K_hi) - t(K_lo)) / (K_hi - K_lo); the
kernel-launch and dispatch RTT cancel.  Writes VPU_CALIBRATION.json with
achieved slots/s per variant; tools/roofline.py's `measured_ceiling` mode
then reports env-kernel utilization against the envmix ceiling.

Usage: timeout 3400 python tools/vpu_calibrate.py --out VPU_CALIBRATION.json
"""
import argparse
import functools
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from rware_tpu.compile_cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tools.timing import timed_call

SUB, LANE = 8, 128
_INTERPRET = False


def _build(body, rows, n_ops_per_iter, k, dtype, n_blocks=1):
    """Kernel applying ``body`` k times to (rows*SUB, LANE) block(s)."""

    def kernel(*refs):
        ins = refs[:n_blocks]
        outs = refs[n_blocks:]
        xs = [r[:] for r in ins]

        def step(i, xs):
            return body(i, xs)

        xs = jax.lax.fori_loop(0, k, step, tuple(xs))
        for o, x in zip(outs, xs):
            o[:] = x

    shape = (rows * SUB, LANE)
    fn = pl.pallas_call(
        kernel,
        out_shape=tuple(
            jax.ShapeDtypeStruct(shape, dtype) for _ in range(n_blocks)
        ),
        interpret=_INTERPRET,
    )

    def run(xs):
        outs = fn(*xs)
        outs = outs if isinstance(outs, (tuple, list)) else (outs,)
        return sum(o.astype(jnp.float32).sum() for o in outs)

    return jax.jit(run), shape


def measure(name, body, rows, ops_per_iter, dtype, n_blocks=1,
            k_lo=131072, k_hi=8388608, repeats=5):
    # k_hi sized so kernel time (~50 ms at a few ns/iter) dominates the
    # tunnel RTT jitter (~±2 ms on a ~45 ms dispatch) — at the old 1M
    # trip count the slope carried ±30% run-to-run noise.
    elems = rows * SUB * LANE * n_blocks

    def at(k):
        fn, shape = _build(body, rows, ops_per_iter, k, dtype, n_blocks)
        if dtype == jnp.int32:
            xs = tuple(
                jnp.arange(np.prod(shape), dtype=dtype).reshape(shape) % 97
                for _ in range(n_blocks)
            )
        else:
            xs = tuple(
                jnp.linspace(0.1, 1.1, int(np.prod(shape)), dtype=dtype)
                .reshape(shape)
                for _ in range(n_blocks)
            )
        return timed_call(fn, xs, repeats=repeats)

    t_lo, t_hi = at(k_lo), at(k_hi)
    per_iter = (t_hi - t_lo) / (k_hi - k_lo)
    slots_s = ops_per_iter * elems / per_iter
    row = {
        "name": name,
        "rows": rows,
        "n_blocks": n_blocks,
        "ops_per_iter": ops_per_iter,
        "elems": elems,
        "per_iter_ns": per_iter * 1e9,
        "achieved_slots_per_s": slots_s,
        "fraction_of_paper_peak": slots_s / 6.0e12,
    }
    print(
        f"{name:14s} {per_iter*1e9:8.1f} ns/iter  "
        f"{slots_s/1e12:6.2f}e12 slots/s "
        f"({row['fraction_of_paper_peak']*100:4.0f}% of paper peak)",
        flush=True,
    )
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO,
                                                  "VPU_CALIBRATION.json"))
    ap.add_argument("--interpret", action="store_true",
                    help="CPU smoke (timings meaningless)")
    ap.add_argument("--k-hi", type=int, default=8388608)
    ap.add_argument("--smoke", action="store_true",
                    help="tiny trip counts (flow check only)")
    args = ap.parse_args()
    global _INTERPRET
    if args.interpret:
        _INTERPRET = True
        jax.config.update("jax_platforms", "cpu")

    if args.smoke:
        meas = functools.partial(measure, k_lo=4, k_hi=8, repeats=1)
    else:
        meas = functools.partial(measure, k_hi=args.k_hi)
    rows_out = []

    # serial f32: x = x * 1.0001 + 0.3 (2 ops, one chain)
    rows_out.append(meas(
        "serial-f32",
        lambda i, xs: (xs[0] * jnp.float32(1.0001) + jnp.float32(0.3),),
        rows=1, ops_per_iter=2, dtype=jnp.float32,
    ))
    # serial i32: x = (x + 7) ^ (x >> 1) (3 ops, one chain)
    rows_out.append(meas(
        "serial-i32",
        lambda i, xs: (
            ((xs[0] + jnp.int32(7))
             ^ jax.lax.shift_right_logical(xs[0], jnp.int32(1))),
        ),
        rows=1, ops_per_iter=3, dtype=jnp.int32,
    ))
    # ilp4 f32: four independent chains
    rows_out.append(meas(
        "ilp4-f32",
        lambda i, xs: tuple(
            x * jnp.float32(1.0001) + jnp.float32(0.3) for x in xs
        ),
        rows=1, ops_per_iter=2, dtype=jnp.float32, n_blocks=4,
    ))
    # ilp4 i32
    rows_out.append(meas(
        "ilp4-i32",
        lambda i, xs: tuple(
            (x + jnp.int32(7)) ^ jax.lax.shift_right_logical(
                x, jnp.int32(1)
            )
            for x in xs
        ),
        rows=1, ops_per_iter=3, dtype=jnp.int32, n_blocks=4,
    ))

    # envmix: resolver-shaped mix on an 8-row stacked block — serial ops,
    # independent tiles (sum of: add, cmp, select, and, min => 5 slots)
    def envmix(i, xs):
        x = xs[0]
        y = x + jnp.int32(3)
        c = y > jnp.int32(50)
        z = jnp.where(c, y, x)
        w = z & jnp.int32(0xFFFF)
        return (jnp.minimum(w, y),)

    rows_out.append(meas(
        "envmix-i32-8row", envmix, rows=8, ops_per_iter=5,
        dtype=jnp.int32,
    ))
    rows_out.append(meas(
        "envmix-i32-1row", envmix, rows=1, ops_per_iter=5,
        dtype=jnp.int32,
    ))

    # gru-dot: the recurrent update's per-step hidden contraction shape —
    # a dependency-CHAINED (rows, 128) @ (128, 128) bf16 dot (the real
    # kernel's (rows,128)@(128,384) has the same M/K and 3x N; FLOP rate
    # transfers).  Measures the achievable MXU rate under the serial
    # recurrence, launch-free.
    def _gru_dot_build(rows, k):
        def kernel(x_ref, w_ref, o_ref):
            w = w_ref[:]

            def step(i, x):
                y = jax.lax.dot_general(
                    x, w, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                return (y * jnp.float32(1e-3)).astype(jnp.bfloat16)

            o_ref[:] = jax.lax.fori_loop(
                0, k, step, x_ref[:]
            ).astype(jnp.float32)

        fn = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.float32),
            interpret=_INTERPRET,
        )
        return jax.jit(lambda x, w: fn(x, w).sum())

    # rows=4096 is the real kernel's sequential hidden-dot M (n x rbc x
    # LANE at tiny-2ag minibatch shapes); rows=8192 stands in for the
    # batched embed/gate dots' M=16384 (a chained 16384-row block OOMs the
    # 16 MB scoped VMEM; the MXU FLOP rate is flat from 4096 up, so the
    # 8192 rate transfers).
    # trip counts sized for >= ~40 ms of kernel time at the expected rate
    gru_ks = {1024: (16384, 131072), 4096: (4096, 32768),
              8192: (2048, 16384)}
    for rows in (1024, 4096, 8192):
        k_lo, k_hi = gru_ks[rows]
        if args.smoke:
            k_lo, k_hi = 2, 4
        x = jnp.ones((rows, 128), jnp.bfloat16) * 0.01
        w = jnp.ones((128, 128), jnp.bfloat16) * 0.01
        t_lo = timed_call(_gru_dot_build(rows, k_lo), x, w)
        t_hi = timed_call(_gru_dot_build(rows, k_hi), x, w)
        per = (t_hi - t_lo) / (k_hi - k_lo)
        flops = 2.0 * rows * 128 * 128
        row = {
            "name": f"gru-dot-{rows}", "rows": rows,
            "per_iter_ns": per * 1e9,
            "achieved_flops_per_s": flops / per,
            "fraction_of_mxu_peak": flops / per / 197e12,
        }
        print(
            f"gru-dot-{rows}: {per*1e9:.0f} ns/iter "
            f"{flops/per/1e12:.1f} TFLOP/s "
            f"({row['fraction_of_mxu_peak']*100:.0f}% MXU)",
            flush=True,
        )
        rows_out.append(row)

    # big-dot-ilp4: FOUR independent dot chains interleaved — the MXU
    # rate for INDEPENDENT batched dots (the GRU kernels' embed/gate and
    # weight-gradient contractions, which are data-parallel across cells
    # and time), as opposed to the latency-bound sequential recurrence
    # the chained variant above measures.
    def _ilp_dot_build(rows, k, n_chains=4):
        def kernel(*refs):
            xs = [r[:] for r in refs[:n_chains]]
            w = refs[n_chains][:]
            outs = refs[n_chains + 1:]

            def step(i, xs):
                return tuple(
                    (jax.lax.dot_general(
                        x, w, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ) * jnp.float32(1e-3)).astype(jnp.bfloat16)
                    for x in xs
                )

            xs = jax.lax.fori_loop(0, k, step, tuple(xs))
            for o, x in zip(outs, xs):
                o[:] = x.astype(jnp.float32)

        fn = pl.pallas_call(
            kernel,
            out_shape=tuple(
                jax.ShapeDtypeStruct((rows, 128), jnp.float32)
                for _ in range(n_chains)
            ),
            interpret=_INTERPRET,
        )
        return jax.jit(
            lambda *a: sum(o.sum() for o in fn(*a))
        )

    rows = 1024
    k_lo, k_hi = (2, 4) if args.smoke else (4096, 32768)
    xs4 = tuple(jnp.ones((rows, 128), jnp.bfloat16) * 0.01
                for _ in range(4))
    w = jnp.ones((128, 128), jnp.bfloat16) * 0.01
    t_lo = timed_call(_ilp_dot_build(rows, k_lo), *xs4, w)
    t_hi = timed_call(_ilp_dot_build(rows, k_hi), *xs4, w)
    per = (t_hi - t_lo) / (k_hi - k_lo)
    flops = 4 * 2.0 * rows * 128 * 128
    row = {
        "name": "big-dot-ilp4", "rows": rows, "n_chains": 4,
        "per_iter_ns": per * 1e9,
        "achieved_flops_per_s": flops / per,
        "fraction_of_mxu_peak": flops / per / 197e12,
    }
    print(
        f"big-dot-ilp4: {per*1e9:.0f} ns/iter {flops/per/1e12:.1f} "
        f"TFLOP/s ({row['fraction_of_mxu_peak']*100:.0f}% MXU)",
        flush=True,
    )
    rows_out.append(row)

    # dw-dot: the backward pass's weight-gradient contraction shape —
    # (K, 128)^T @ (K, 384) with LARGE K (the kernels accumulate dW over
    # trows = tc*rows activations).  Large-K dots stream far
    # better than the K=128 activation dots, so they get their own rate.
    # The chain perturbs lhs by a scalar derived from the previous out
    # (XLA would hoist a loop-invariant dot); the extra bf16 scale pass
    # costs ~4% of the dot — a conservative (low) rate estimate.
    def _dw_dot_build(kdim, k):
        def kernel(x_ref, y_ref, o_ref):
            x = x_ref[:]
            y = y_ref[:]

            def step(i, o):
                scale = (o[0, 0] * jnp.float32(1e-30)
                         + jnp.float32(1.0)).astype(jnp.bfloat16)
                return jax.lax.dot_general(
                    x * scale, y, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * jnp.float32(1e-3)

            o_ref[:] = jax.lax.fori_loop(
                0, k, step, jnp.zeros((128, 384), jnp.float32)
            )

        fn = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((128, 384), jnp.float32),
            interpret=_INTERPRET,
        )
        return jax.jit(lambda x, y: fn(x, y).sum())

    # kdim=8192 operands (2+6 MB bf16 plus the scale temp and dot
    # staging) overflow the 16 MB scoped VMEM; 4096 fits and K is still
    # large enough to stream (rate flat vs K for K >= ~2048)
    kdim = 4096
    k_lo, k_hi = (2, 4) if args.smoke else (1024, 8192)
    x = jnp.ones((kdim, 128), jnp.bfloat16) * 0.01
    y = jnp.ones((kdim, 384), jnp.bfloat16) * 0.01
    t_lo = timed_call(_dw_dot_build(kdim, k_lo), x, y)
    t_hi = timed_call(_dw_dot_build(kdim, k_hi), x, y)
    per = (t_hi - t_lo) / (k_hi - k_lo)
    flops = 2.0 * kdim * 128 * 384
    row = {
        "name": "dw-dot-large", "k_dim": kdim,
        "per_iter_ns": per * 1e9,
        "achieved_flops_per_s": flops / per,
        "fraction_of_mxu_peak": flops / per / 197e12,
    }
    print(
        f"dw-dot-large: {per*1e9:.0f} ns/iter {flops/per/1e12:.1f} "
        f"TFLOP/s ({row['fraction_of_mxu_peak']*100:.0f}% MXU)",
        flush=True,
    )
    rows_out.append(row)

    def _rate(name, key):
        return next(r[key] for r in rows_out if r["name"] == name)

    out = {
        "tool": "tools/vpu_calibrate.py",
        "platform": jax.devices()[0].platform,
        "paper_peak_slots_per_s": 6.0e12,
        "rows": rows_out,
        "ceiling_envmix_slots_per_s": _rate(
            "envmix-i32-8row", "achieved_slots_per_s"
        ),
        # roofline.gru_roofline calibration keys: the sequential hidden
        # dot runs at the kernel's real M (4096 rows at tiny-2ag
        # minibatch shapes); the batched embed/gate dots at M=16384 use
        # the 8192-row rate (flat beyond 4096 — see loop comment).
        "rate_gru_dot_flops_per_s": _rate(
            "gru-dot-4096", "achieved_flops_per_s"
        ),
        "rate_big_dot_flops_per_s": _rate(
            "big-dot-ilp4", "achieved_flops_per_s"
        ),
        "rate_dw_dot_flops_per_s": _rate(
            "dw-dot-large", "achieved_flops_per_s"
        ),
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
