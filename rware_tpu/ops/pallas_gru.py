"""Pallas GRU sequence kernels: the time recurrence of the native-layout
recurrent-PPO update with the T-loop INSIDE the kernel.

Why: the recurrent update's cost is per-step launch overhead, not compute —
the XLA scan issues one tiny (rows, Hg) x (Hg, 3Hg) matmul per step, and at
T=128 x 3 scans (fwd, recompute, reverse) x 16 minibatch passes the
sequential step count dominates the update (tools/gru_bisect.py: 115 ms of
a 127 ms train step at B=4096 AFTER the custom-VJP rewrite removed XLA's
scan-transpose).  Here each grid cell owns an (env-chunk, time-chunk) tile:
the hidden state (forward) / hidden adjoint (backward) persists in VMEM
scratch across the sequential time-chunk grid axis, every per-step matmul
and gate algebra runs from VMEM, and the (Hg, 3Hg) hidden-weight gradient
accumulates in a VMEM-resident output block — HBM traffic is one read of
the precomputed input gates plus the hidden-sequence stream.

The three input gates ride as ONE fused (T, N, RB, LANE, 3Hg) bf16 tensor
(r | z | n in wh's gate order): one XLA dot produces it, one DMA stream
feeds each grid cell, and the backward emits a single fused cotangent —
per-cell DMA setup count, measured at ~13 us/cell, is the kernels' cost
floor, so fewer/larger streams matter more than FLOPs here.

Scope: exactly the ``_gru_scan`` recurrence of models/ippo_rnn.py (whose
hand-derived backward these kernels implement step-for-step); the big
input-gate / embed / head matmuls stay in XLA where the MXU already
saturates.  Cell semantics match models.ippo_rnn._gru_cell_fwd (bf16
hidden, bf16-rounded gate pre-activations, carry reset at episode
boundaries); equivalence is tested against the XLA scan and jax.grad in
interpret mode (tests/test_pallas_gru.py).

Layout notes: ``done`` rides as (T, 1, RB, LANE, 1) so the env-chunk axis
sits outside Mosaic's last-two-dims tiling constraint; all sequence
streams are bf16 to keep the per-cell block footprint inside VMEM with
double-buffering.

Reference parity anchor: the recurrent policy itself is this framework's
addition (the reference env is policy-agnostic); the episode-boundary
reset semantics mirror rware's per-episode termination
(/root/reference/rware/warehouse.py:920-931).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _pick_chunks(t: int, rb: int, n: int, hg: int,
                 bytes_per_el_t: int) -> Tuple[int, int]:
    """(tc, rbc): time-chunk / env-chunk sizes keeping the per-cell
    CHANGING block bytes (``bytes_per_el_t`` per (n*rbc*LANE*hg) chunk
    element per time row) under ~16 MB — double-buffering doubles it.
    Bigger cells matter more than balance: the measured cost is ~13 us of
    DMA orchestration per grid cell, so maximise tc*rbc, preferring env
    rows (bigger per-step matmuls) on ties.  Both kernels raise the Mosaic
    scoped-VMEM limit to 64 MB (v5e has 128 MB VMEM; the 16 MB default
    rejected the backward at rb=32 — the compiler's buffer accounting runs
    ~3-4x the changing-block bytes)."""
    budget = 16 * 1024 * 1024
    el = n * LANE * hg
    best = (1, 1)
    for rbc in (16, 8, 4, 2, 1):
        if rb % rbc:
            continue
        for tc in (16, 8, 4, 2, 1):
            if t % tc:
                continue
            if bytes_per_el_t * tc * rbc * el <= budget:
                if tc * rbc > best[0] * best[1]:
                    best = (tc, rbc)
    return best


def build_gru_seq_fwd(t: int, n: int, rb: int, hg: int,
                      interpret: bool = False):
    """Forward recurrence: (wh, bhn, iall, done, h0) -> hseq.

    wh (Hg, 3Hg), bhn (Hg,) f32, fused gates ``iall``
    (T, N, RB, LANE, 3Hg) [ir | iz | in], done (T, 1, RB, LANE) (mask
    applied to the carry AFTER each step), h0 (N, RB, LANE, Hg).
    Returns hseq bf16 — the per-step hidden BEFORE the boundary reset,
    exactly models.ippo_rnn._gru_scan on the sliced gates.
    """
    # changing blocks per time row: bf16 fused gates (6) + bf16 out (2)
    tc, rbc = _pick_chunks(t, rb, n, hg, bytes_per_el_t=8)
    n_tc = t // tc
    rows = n * rbc * LANE

    def kernel(wh_ref, bhn_ref, iall_ref, done_ref, h0_ref, out_ref, h_s):
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            h_s[:] = h0_ref[:]

        wh = wh_ref[:]
        bhn = bhn_ref[:]
        for lt in range(tc):
            h4 = h_s[:]  # (N, rbc, LANE, Hg) bf16
            hh = jax.lax.dot_general(
                h4.reshape(rows, hg), wh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(n, rbc, LANE, 3 * hg)
            iall_t = iall_ref[lt]
            r = jax.nn.sigmoid(
                iall_t[..., :hg].astype(jnp.float32) + hh[..., :hg]
            ).astype(jnp.bfloat16)
            z = jax.nn.sigmoid(
                iall_t[..., hg:2 * hg].astype(jnp.float32)
                + hh[..., hg:2 * hg]
            ).astype(jnp.bfloat16)
            nn = jnp.tanh(
                iall_t[..., 2 * hg:].astype(jnp.bfloat16)
                + r * (hh[..., 2 * hg:] + bhn).astype(jnp.bfloat16)
            )
            new_h = (jnp.bfloat16(1.0) - z) * nn + z * h4
            out_ref[lt] = new_h
            m = done_ref[lt, 0]  # (rbc, LANE, 1)
            h_s[:] = jnp.where(m != 0, jnp.bfloat16(0.0), new_h)

    grid = (rb // rbc, n_tc)
    gate_spec = pl.BlockSpec(
        (tc, n, rbc, LANE, 3 * hg), lambda c, k: (k, 0, c, 0, 0),
        memory_space=pltpu.VMEM,
    )
    h_spec = pl.BlockSpec(
        (tc, n, rbc, LANE, hg), lambda c, k: (k, 0, c, 0, 0),
        memory_space=pltpu.VMEM,
    )
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((hg, 3 * hg), lambda c, k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hg), lambda c, k: (0, 0),
                         memory_space=pltpu.VMEM),
            gate_spec,
            pl.BlockSpec((tc, 1, rbc, LANE, 1),
                         lambda c, k: (k, 0, c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, rbc, LANE, hg), lambda c, k: (0, c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=h_spec,
        out_shape=jax.ShapeDtypeStruct(
            (t, n, rb, LANE, hg), jnp.bfloat16
        ),
        scratch_shapes=[pltpu.VMEM((n, rbc, LANE, hg), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )

    def fwd(wh, bhn, iall, done, h0):
        return call(
            wh.astype(jnp.bfloat16),
            bhn.reshape(1, hg).astype(jnp.float32),
            iall.astype(jnp.bfloat16),
            done.reshape(t, 1, rb, LANE, 1).astype(jnp.bfloat16),
            h0.astype(jnp.bfloat16),
        )

    return fwd


def build_gru_seq_bwd(t: int, n: int, rb: int, hg: int,
                      interpret: bool = False):
    """Reverse recurrence of the hand-derived GRU backward.

    (wh, bhn, iall, done, h0, hseq, dhseq) ->
    (dwh, dbhn, d_iall, dh0).

    The reverse time-chunk sweep carries ONLY the (N, rbc, LANE, Hg)
    hidden adjoint in scratch; each step recomputes the forward gates from
    the saved inputs/outputs (no residual storage), emits one fused bf16
    gate cotangent [dr_pre | dz_pre | dn_pre], and accumulates the
    (Hg, 3Hg) hidden-weight gradient and the candidate-bias gradient into
    VMEM-resident output blocks.  Step algebra matches
    models.ippo_rnn._gru_scan_bwd exactly.
    """
    # changing blocks per time row: bf16 fused gates (6) + bf16 dhseq (2)
    # + bf16 fused cotangent out (6) + bf16 hseq (2)
    tc, rbc = _pick_chunks(t, rb, n, hg, bytes_per_el_t=16)
    n_tc = t // tc
    rows = n * rbc * LANE

    def kernel(wh_ref, bhn_ref, iall_ref, done_ref,
               hseq_ref, hboundary_ref, dh_ref,
               dg_out, dwh_out, dbhn_out, dh0_out,
               dc_s):
        k = pl.program_id(1)
        kk = n_tc - 1 - k  # time chunk being processed (reverse sweep)
        first = (pl.program_id(0) == 0) & (k == 0)

        @pl.when(first)
        def _():
            dwh_out[:] = jnp.zeros_like(dwh_out)
            dbhn_out[:] = jnp.zeros_like(dbhn_out)

        @pl.when(k == 0)
        def _():
            dc_s[:] = jnp.zeros_like(dc_s)

        wh = wh_ref[:]
        bhn = bhn_ref[:]
        zero_b = jnp.bfloat16(0.0)
        for lt in range(tc - 1, -1, -1):
            # hidden INPUT of step t = kk*tc + lt: inside the chunk it is
            # the reset-masked previous output; at the chunk boundary the
            # precomputed hboundary row (h0 at kk=0, masked hseq[kk*tc-1]
            # otherwise — assembled in XLA, one row per chunk)
            if lt == 0:
                hp_t = hboundary_ref[0]
            else:
                hp_t = jnp.where(
                    done_ref[lt - 1, 0] != 0, zero_b, hseq_ref[lt - 1]
                )
            hp2 = hp_t.reshape(rows, hg)
            hh = jax.lax.dot_general(
                hp2, wh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(n, rbc, LANE, 3 * hg)
            iall_t = iall_ref[lt]
            r = jax.nn.sigmoid(
                iall_t[..., :hg].astype(jnp.float32) + hh[..., :hg]
            )
            z = jax.nn.sigmoid(
                iall_t[..., hg:2 * hg].astype(jnp.float32)
                + hh[..., hg:2 * hg]
            )
            hhn = (hh[..., 2 * hg:] + bhn).astype(jnp.bfloat16)
            nn = jnp.tanh(
                iall_t[..., 2 * hg:].astype(jnp.bfloat16)
                + r.astype(jnp.bfloat16) * hhn
            ).astype(jnp.float32)
            m = done_ref[lt, 0] != 0  # carry reset AFTER this step
            dnh = dh_ref[lt].astype(jnp.float32) + jnp.where(
                m, 0.0, dc_s[:]
            )
            hpf = hp_t.astype(jnp.float32)
            dz_pre = dnh * (hpf - nn) * z * (1.0 - z)
            dn_pre = dnh * (1.0 - z) * (1.0 - nn * nn)
            dhhn = dn_pre * r
            dr_pre = dn_pre * hhn.astype(jnp.float32) * r * (1.0 - r)
            dg3 = jnp.concatenate(
                [dr_pre, dz_pre, dhhn], axis=-1
            ).astype(jnp.bfloat16).reshape(rows, 3 * hg)
            dh_prev = dnh * z + jax.lax.dot_general(
                dg3, wh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(n, rbc, LANE, hg)
            dwh_out[:] += jax.lax.dot_general(
                hp2, dg3, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dbhn_out[:] += jnp.sum(
                dhhn.reshape(rows, hg), axis=0, keepdims=True
            )
            dg_out[lt] = jnp.concatenate(
                [dr_pre, dz_pre, dn_pre], axis=-1
            ).astype(jnp.bfloat16)
            dc_s[:] = dh_prev
            if lt == 0:
                dh0_val = dh_prev

                @pl.when(kk == 0)
                def _():
                    dh0_out[:] = dh0_val

    grid = (rb // rbc, n_tc)
    rev = lambda c, k: (n_tc - 1 - k, 0, c, 0, 0)

    gate_spec = pl.BlockSpec(
        (tc, n, rbc, LANE, 3 * hg), rev, memory_space=pltpu.VMEM
    )
    h_spec = pl.BlockSpec(
        (tc, n, rbc, LANE, hg), rev, memory_space=pltpu.VMEM
    )
    done_spec = pl.BlockSpec(
        (tc, 1, rbc, LANE, 1), rev, memory_space=pltpu.VMEM
    )
    hblock = pl.BlockSpec(
        (n, rbc, LANE, hg), lambda c, k: (0, c, 0, 0),
        memory_space=pltpu.VMEM,
    )
    in_specs = [
        pl.BlockSpec((hg, 3 * hg), lambda c, k: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hg), lambda c, k: (0, 0),
                     memory_space=pltpu.VMEM),
        gate_spec,
        done_spec,
        h_spec,  # hseq
        pl.BlockSpec(
            (1, n, rbc, LANE, hg),
            lambda c, k: (n_tc - 1 - k, 0, c, 0, 0),
            memory_space=pltpu.VMEM,
        ),  # hboundary: one precomputed chunk-boundary hidden per chunk
        h_spec,  # dhseq (bf16)
    ]
    out_specs = [
        gate_spec,
        pl.BlockSpec((hg, 3 * hg), lambda c, k: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hg), lambda c, k: (0, 0),
                     memory_space=pltpu.VMEM),
        hblock,
    ]
    out_shape = [
        jax.ShapeDtypeStruct((t, n, rb, LANE, 3 * hg), jnp.bfloat16),
        jax.ShapeDtypeStruct((hg, 3 * hg), jnp.float32),
        jax.ShapeDtypeStruct((1, hg), jnp.float32),
        jax.ShapeDtypeStruct((n, rb, LANE, hg), jnp.float32),
    ]
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((n, rbc, LANE, hg), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )

    def bwd(wh, bhn, iall, done, h0, hseq, dhseq):
        done5 = done.reshape(t, 1, rb, LANE, 1).astype(jnp.bfloat16)
        # chunk-boundary hidden inputs (one row per time chunk): h0 for
        # chunk 0, the reset-masked hseq[kk*tc - 1] otherwise — n_tc rows
        # assembled in XLA so the kernel needs no scalar select
        hb = jnp.concatenate(
            [
                h0.astype(jnp.bfloat16)[None],
                jnp.where(
                    done5[tc - 1::tc][: n_tc - 1] != 0,
                    jnp.bfloat16(0.0),
                    hseq[tc - 1::tc][: n_tc - 1],
                ),
            ],
            axis=0,
        )  # (n_tc, N, RB, LANE, Hg)
        d_iall, dwh, dbhn, dh0 = call(
            wh.astype(jnp.bfloat16),
            bhn.reshape(1, hg).astype(jnp.float32),
            iall.astype(jnp.bfloat16), done5, hseq, hb,
            dhseq.astype(jnp.bfloat16),
        )
        return dwh, dbhn.reshape(bhn.shape), d_iall, dh0

    return bwd


def _pick_chunks_bytes(t: int, rb: int, cell_bytes, budget: int
                       ) -> Tuple[int, int]:
    """(tc, rbc) maximising the cell volume under an exact per-cell VMEM
    byte model (``cell_bytes(tc, rbc)``), preferring ENV rows on ties —
    rbc widens the per-step MXU dots of the sequential hidden recurrence
    (rows = n*rbc*LANE), and the tc-first ordering measured 55% slower on
    the tiny-2ag fwd+bwd pair (3.68 vs 2.38 ms/iter) at the same cell
    volume.  The carry-sized blocks (hidden scratch / h0 / dh0 /
    hboundary) scale with n*rbc but not tc, so at large n the byte model
    itself forces rbc down; the exact model replaces the crude
    bytes-per-element knob of _pick_chunks (the obs-fused kernels'
    streams have different widths)."""
    best = (1, 1)
    for rbc in (16, 8, 4, 2, 1):
        if rb % rbc:
            continue
        for tc in (16, 8, 4, 2, 1):
            if t % tc:
                continue
            if cell_bytes(tc, rbc) <= budget and tc * rbc > best[0] * best[1]:
                best = (tc, rbc)
    return best


def build_gru_obs_fwd(t: int, n: int, rb: int, hg: int, emb: int,
                      lf: int, interpret: bool = False):
    """Obs-fused forward recurrence: (we, be, wi, bi, wh, bhn, obs, done,
    h0) -> hseq, with the embed (tanh(obs @ We + be)) and the fused input
    gates (e @ Wi + bi) computed IN-KERNEL, batched over each time chunk.

    Why: the iall-streaming forward (build_gru_seq_fwd) reads a
    (T, ·, 3Hg) bf16 gate tensor that an XLA dot first wrote to HBM —
    ~600 MB of traffic per update pass at B=4096 (tools/gru_bisect.py).
    Here the kernel streams the raw observations instead (lf = 71 lanes
    for tiny-2ag vs 3Hg = 384) and the e / iall intermediates live only
    in VMEM scratch.

    obs rides in the REPLAY layout (T, N, RB, LANE, lf) bf16 — features
    minor, so the embed contraction is one 2D MXU dot per chunk; the
    trajectory is transposed into this layout once per update (amortised
    over epochs x minibatches passes).  Gate/cell semantics match
    models.ippo_rnn._gru_native_replay's XLA path bit-for-bit (f32 dot
    accumulation, bf16-rounded pre-activations, tanh on bf16).
    """
    lpad = -(-lf // LANE) * LANE

    def cell_bytes(tc, rbc):
        trows = tc * n * rbc * LANE
        rows = n * rbc * LANE
        rc = rows * hg  # carry-sized (tc-independent) elements
        # -- pipeline blocks (changing blocks double-buffered by Mosaic)
        blocks = (
            2 * trows * lpad * 2        # obs in
            + 2 * trows * hg * 2        # hseq out
            + 2 * tc * rbc * LANE * LANE * 2  # done (lane dim pads 1->128)
            + 2 * rc * 2                # h0 in
            + rc * 2                    # h_s scratch
            + trows * 3 * hg * 2        # iall_s scratch
            + (lf * emb + emb * 3 * hg + hg * 3 * hg) * 2 + 4096  # weights
        )
        # -- scoped stack: the kernel's live f32/bf16 temporaries.  The
        # batched gate dot's f32 result scales with trows; the per-step
        # recurrence temporaries (hh f32 + gate intermediates) scale with
        # rows = n*rbc*LANE — at 8 agents these dominated and overflowed
        # the 120 MB limit (scoped 125.4M, /tmp/gru_large_triage) until
        # counted here.
        stack = (
            trows * (3 * hg * 4 + emb * 2)   # iall f32 dot + e bf16 live
            + rows * (3 * hg * 4 + 4 * hg * 2)  # hh f32 + r/z/nn/new_h
        )
        return blocks + stack

    # both obs kernels measured DMA-orchestration-bound (~13 us/cell,
    # tools/gru_update_probe.py) — budget for the fewest cells that fit.
    # 112 MB = the 120 MB Mosaic scoped-vmem limit minus margin; the
    # model keeps the measured-good (4,16) pick at hg=emb=128, lf=71, n=2
    tc, rbc = _pick_chunks_bytes(t, rb, cell_bytes, 112 * 1024 * 1024)
    n_tc = t // tc
    rows = n * rbc * LANE
    trows = tc * rows

    def kernel(we_ref, be_ref, wi_ref, bi_ref, wh_ref, bhn_ref,
               obs_ref, done_ref, h0_ref, out_ref, h_s, iall_s):
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            h_s[:] = h0_ref[:]

        # ---- batched embed + input gates for the whole time chunk ----
        ob = obs_ref[:].reshape(trows, lf)
        e = jax.lax.dot_general(
            ob, we_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        e = jnp.tanh((e + be_ref[:]).astype(jnp.bfloat16))
        ia = jax.lax.dot_general(
            e, wi_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        iall_s[:] = (ia + bi_ref[:]).astype(jnp.bfloat16).reshape(
            tc, n, rbc, LANE, 3 * hg
        )

        wh = wh_ref[:]
        bhn = bhn_ref[:]
        for lt in range(tc):
            h4 = h_s[:]
            hh = jax.lax.dot_general(
                h4.reshape(rows, hg), wh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(n, rbc, LANE, 3 * hg)
            iall_t = iall_s[lt]
            r = jax.nn.sigmoid(
                iall_t[..., :hg].astype(jnp.float32) + hh[..., :hg]
            ).astype(jnp.bfloat16)
            z = jax.nn.sigmoid(
                iall_t[..., hg:2 * hg].astype(jnp.float32)
                + hh[..., hg:2 * hg]
            ).astype(jnp.bfloat16)
            nn = jnp.tanh(
                iall_t[..., 2 * hg:]
                + r * (hh[..., 2 * hg:] + bhn).astype(jnp.bfloat16)
            )
            new_h = (jnp.bfloat16(1.0) - z) * nn + z * h4
            out_ref[lt] = new_h
            m = done_ref[lt, 0]
            h_s[:] = jnp.where(m != 0, jnp.bfloat16(0.0), new_h)

    grid = (rb // rbc, n_tc)
    obs_spec = pl.BlockSpec(
        (tc, n, rbc, LANE, lf), lambda c, k: (k, 0, c, 0, 0),
        memory_space=pltpu.VMEM,
    )
    h_spec = pl.BlockSpec(
        (tc, n, rbc, LANE, hg), lambda c, k: (k, 0, c, 0, 0),
        memory_space=pltpu.VMEM,
    )

    def cspec(shape):
        return pl.BlockSpec(shape, lambda c, k: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            cspec((lf, emb)), cspec((1, emb)),
            cspec((emb, 3 * hg)), cspec((1, 3 * hg)),
            cspec((hg, 3 * hg)), cspec((1, hg)),
            obs_spec,
            pl.BlockSpec((tc, 1, rbc, LANE, 1),
                         lambda c, k: (k, 0, c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, rbc, LANE, hg), lambda c, k: (0, c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=h_spec,
        out_shape=jax.ShapeDtypeStruct((t, n, rb, LANE, hg), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((n, rbc, LANE, hg), jnp.bfloat16),
            pltpu.VMEM((tc, n, rbc, LANE, 3 * hg), jnp.bfloat16),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024
        ),
        interpret=interpret,
    )

    def fwd(we, be, wi, bi, wh, bhn, obs, done, h0):
        return call(
            we.astype(jnp.bfloat16),
            be.reshape(1, emb).astype(jnp.float32),
            wi.astype(jnp.bfloat16),
            bi.reshape(1, 3 * hg).astype(jnp.float32),
            wh.astype(jnp.bfloat16),
            bhn.reshape(1, hg).astype(jnp.float32),
            obs.astype(jnp.bfloat16),
            done.reshape(t, 1, rb, LANE, 1).astype(jnp.bfloat16),
            h0.astype(jnp.bfloat16),
        )

    fwd.tc, fwd.rbc = tc, rbc  # chunk picks, for roofline accounting
    return fwd


def build_gru_obs_bwd(t: int, n: int, rb: int, hg: int, emb: int,
                      lf: int, interpret: bool = False):
    """Obs-fused backward: the reverse GRU sweep PLUS the embed /
    input-gate backward in one kernel.

    (we, be, wi, bi, wh, bhn, obs, done, h0, hseq, dhseq) ->
    (dwe, dbe, dwi, dbi, dwh, dbhn, dh0).

    Each cell recomputes e / iall from the streamed obs block (batched,
    off the sequential path), runs the reverse gate sweep carrying only
    the hidden adjoint, overwrites the iall scratch rows IN PLACE with
    the gate cotangents [dr_pre | dz_pre | dn_pre] (iall_s[lt] is dead
    once step lt's gates are recomputed), and then folds the whole
    input-side backward — dWi += e^T dg, de = dg Wi^T, dpre through the
    tanh, dWe += obs^T dpre — into batched MXU dots whose results
    accumulate in VMEM-resident weight blocks.  Nothing trajectory-sized
    is written back: the (T, ·, 3Hg) d_iall stream of build_gru_seq_bwd
    and the XLA dots that consumed it are gone entirely.

    Step algebra matches models.ippo_rnn._gru_scan_bwd; input-side
    algebra matches models.ippo_rnn.rnn_fused_grads' hand-derived
    embed/gate backward (both tested vs jax.grad).
    """
    lpad = -(-lf // LANE) * LANE

    def cell_bytes(tc, rbc):
        trows = tc * n * rbc * LANE
        rows = n * rbc * LANE
        rc = rows * hg  # carry-sized (tc-independent) elements
        # -- pipeline blocks (changing blocks double-buffered by Mosaic)
        blocks = (
            2 * trows * lpad * 2        # obs in
            + 2 * 2 * trows * hg * 2    # hseq + dhseq in
            + 2 * tc * rbc * LANE * LANE * 2  # done (lane dim pads 1->128)
            + 2 * rc * 2                # hboundary in
            + 2 * rc * 4                # dh0 out (f32)
            + rc * 4                    # dc_s scratch (f32)
            + trows * 3 * hg * 2        # iall_s scratch
            + 2 * (lf * emb + emb * 3 * hg + hg * 3 * hg) * 6 + 8192
        )
        # -- scoped stack: batched-recompute f32 dot results (trows) plus
        # the larger of the reverse-step temporaries (hh f32, 8 gate
        # cotangent f32 planes, dg3 — all rows-sized) and the batched
        # input-side epilogue (dg2/de/dpre — trows-sized).  At 8 agents
        # the rows-sized loop temporaries alone were ~105 MB at rbc=16
        # and overflowed the 120 MB limit (scoped 125.4M,
        # /tmp/gru_large_triage) until counted here.
        loop = rows * (3 * hg * 4 + 8 * hg * 4 + 3 * hg * 2)
        epi = trows * (3 * hg * 2 + emb * 4 + emb * 2)
        stack = trows * (3 * hg * 4 + emb * 2) + max(loop, epi)
        return blocks + stack

    tc, rbc = _pick_chunks_bytes(t, rb, cell_bytes, 112 * 1024 * 1024)
    n_tc = t // tc
    rows = n * rbc * LANE
    trows = tc * rows

    def kernel(we_ref, be_ref, wi_ref, bi_ref, wh_ref, bhn_ref,
               obs_ref, done_ref, hseq_ref, hboundary_ref, dh_ref,
               dwe_out, dbe_out, dwi_out, dbi_out, dwh_out, dbhn_out,
               dh0_out, dc_s, iall_s):
        k = pl.program_id(1)
        kk = n_tc - 1 - k
        first = (pl.program_id(0) == 0) & (k == 0)

        @pl.when(first)
        def _():
            dwe_out[:] = jnp.zeros_like(dwe_out)
            dbe_out[:] = jnp.zeros_like(dbe_out)
            dwi_out[:] = jnp.zeros_like(dwi_out)
            dbi_out[:] = jnp.zeros_like(dbi_out)
            dwh_out[:] = jnp.zeros_like(dwh_out)
            dbhn_out[:] = jnp.zeros_like(dbhn_out)

        @pl.when(k == 0)
        def _():
            dc_s[:] = jnp.zeros_like(dc_s)

        # ---- recompute the chunk's input gates (batched) ----
        ob = obs_ref[:].reshape(trows, lf)
        we = we_ref[:]
        be = be_ref[:]
        e = jnp.tanh(
            (jax.lax.dot_general(
                ob, we, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + be).astype(jnp.bfloat16)
        )
        iall_s[:] = (jax.lax.dot_general(
            e, wi_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bi_ref[:]).astype(jnp.bfloat16).reshape(
            tc, n, rbc, LANE, 3 * hg
        )

        wh = wh_ref[:]
        bhn = bhn_ref[:]
        zero_b = jnp.bfloat16(0.0)
        for lt in range(tc - 1, -1, -1):
            if lt == 0:
                hp_t = hboundary_ref[0]
            else:
                hp_t = jnp.where(
                    done_ref[lt - 1, 0] != 0, zero_b, hseq_ref[lt - 1]
                )
            hp2 = hp_t.reshape(rows, hg)
            hh = jax.lax.dot_general(
                hp2, wh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(n, rbc, LANE, 3 * hg)
            iall_t = iall_s[lt]
            r = jax.nn.sigmoid(
                iall_t[..., :hg].astype(jnp.float32) + hh[..., :hg]
            )
            z = jax.nn.sigmoid(
                iall_t[..., hg:2 * hg].astype(jnp.float32)
                + hh[..., hg:2 * hg]
            )
            hhn = (hh[..., 2 * hg:] + bhn).astype(jnp.bfloat16)
            nn = jnp.tanh(
                iall_t[..., 2 * hg:] + r.astype(jnp.bfloat16) * hhn
            ).astype(jnp.float32)
            m = done_ref[lt, 0] != 0
            dnh = dh_ref[lt].astype(jnp.float32) + jnp.where(
                m, 0.0, dc_s[:]
            )
            hpf = hp_t.astype(jnp.float32)
            dz_pre = dnh * (hpf - nn) * z * (1.0 - z)
            dn_pre = dnh * (1.0 - z) * (1.0 - nn * nn)
            dhhn = dn_pre * r
            dr_pre = dn_pre * hhn.astype(jnp.float32) * r * (1.0 - r)
            dg3 = jnp.concatenate(
                [dr_pre, dz_pre, dhhn], axis=-1
            ).astype(jnp.bfloat16).reshape(rows, 3 * hg)
            dh_prev = dnh * z + jax.lax.dot_general(
                dg3, wh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(n, rbc, LANE, hg)
            dwh_out[:] += jax.lax.dot_general(
                hp2, dg3, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dbhn_out[:] += jnp.sum(
                dhhn.reshape(rows, hg), axis=0, keepdims=True
            )
            # iall_s[lt] is dead from here on: reuse it as the gate
            # cotangent store the input-side backward consumes below
            iall_s[lt] = jnp.concatenate(
                [dr_pre, dz_pre, dn_pre], axis=-1
            ).astype(jnp.bfloat16)
            dc_s[:] = dh_prev
            if lt == 0:
                dh0_val = dh_prev

                @pl.when(kk == 0)
                def _():
                    dh0_out[:] = dh0_val

        # ---- input-side backward, batched over the chunk ----
        dg2 = iall_s[:].reshape(trows, 3 * hg)
        dwi_out[:] += jax.lax.dot_general(
            e, dg2, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dbi_out[:] += jnp.sum(
            dg2.astype(jnp.float32), axis=0, keepdims=True
        )
        de = jax.lax.dot_general(
            dg2, wi_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ef = e.astype(jnp.float32)
        dpre = (de * (1.0 - ef * ef)).astype(jnp.bfloat16)
        dwe_out[:] += jax.lax.dot_general(
            ob, dpre, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dbe_out[:] += jnp.sum(
            dpre.astype(jnp.float32), axis=0, keepdims=True
        )

    grid = (rb // rbc, n_tc)
    rev = lambda c, k: (n_tc - 1 - k, 0, c, 0, 0)
    obs_spec = pl.BlockSpec(
        (tc, n, rbc, LANE, lf), rev, memory_space=pltpu.VMEM
    )
    h_spec = pl.BlockSpec(
        (tc, n, rbc, LANE, hg), rev, memory_space=pltpu.VMEM
    )
    done_spec = pl.BlockSpec(
        (tc, 1, rbc, LANE, 1), rev, memory_space=pltpu.VMEM
    )
    hblock = pl.BlockSpec(
        (n, rbc, LANE, hg), lambda c, k: (0, c, 0, 0),
        memory_space=pltpu.VMEM,
    )

    def cspec(shape):
        return pl.BlockSpec(shape, lambda c, k: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    in_specs = [
        cspec((lf, emb)), cspec((1, emb)),
        cspec((emb, 3 * hg)), cspec((1, 3 * hg)),
        cspec((hg, 3 * hg)), cspec((1, hg)),
        obs_spec, done_spec, h_spec,
        pl.BlockSpec(
            (1, n, rbc, LANE, hg),
            lambda c, k: (n_tc - 1 - k, 0, c, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        h_spec,  # dhseq (bf16)
    ]
    out_specs = [
        cspec((lf, emb)), cspec((1, emb)),
        cspec((emb, 3 * hg)), cspec((1, 3 * hg)),
        cspec((hg, 3 * hg)), cspec((1, hg)),
        hblock,
    ]
    out_shape = [
        jax.ShapeDtypeStruct((lf, emb), jnp.float32),
        jax.ShapeDtypeStruct((1, emb), jnp.float32),
        jax.ShapeDtypeStruct((emb, 3 * hg), jnp.float32),
        jax.ShapeDtypeStruct((1, 3 * hg), jnp.float32),
        jax.ShapeDtypeStruct((hg, 3 * hg), jnp.float32),
        jax.ShapeDtypeStruct((1, hg), jnp.float32),
        jax.ShapeDtypeStruct((n, rb, LANE, hg), jnp.float32),
    ]
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((n, rbc, LANE, hg), jnp.float32),
            pltpu.VMEM((tc, n, rbc, LANE, 3 * hg), jnp.bfloat16),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024
        ),
        interpret=interpret,
    )

    def bwd(we, be, wi, bi, wh, bhn, obs, done, h0, hseq, dhseq):
        done5 = done.reshape(t, 1, rb, LANE, 1).astype(jnp.bfloat16)
        hb = jnp.concatenate(
            [
                h0.astype(jnp.bfloat16)[None],
                jnp.where(
                    done5[tc - 1::tc][: n_tc - 1] != 0,
                    jnp.bfloat16(0.0),
                    hseq[tc - 1::tc][: n_tc - 1],
                ),
            ],
            axis=0,
        )
        dwe, dbe, dwi, dbi, dwh, dbhn, dh0 = call(
            we.astype(jnp.bfloat16),
            be.reshape(1, emb).astype(jnp.float32),
            wi.astype(jnp.bfloat16),
            bi.reshape(1, 3 * hg).astype(jnp.float32),
            wh.astype(jnp.bfloat16),
            bhn.reshape(1, hg).astype(jnp.float32),
            obs.astype(jnp.bfloat16), done5, hseq, hb,
            dhseq.astype(jnp.bfloat16),
        )
        return (
            dwe, dbe.reshape(be.shape), dwi, dbi.reshape(bi.shape),
            dwh, dbhn.reshape(bhn.shape), dh0,
        )

    bwd.tc, bwd.rbc = tc, rbc  # chunk picks, for roofline accounting
    return bwd


def build_gru_loss_bwd(t: int, n: int, rb: int, hg: int, a: int,
                       clip_eps: float, vf_coef: float, ent_coef: float,
                       interpret: bool = False):
    """Loss-fused GRU backward: heads, the clipped-PPO loss and its
    backward run INSIDE the reverse sweep, so the head logits, the hidden
    cotangent stream and every hseq-sized f32 intermediate never touch
    HBM (they were ~1.6 ms/pass of XLA segments between the sequence
    kernels — tools/gru_bisect.py).

    (wh, bhn, whead, bhead, iall, done, h0, hseq, action, logp_old,
     value_old, adv, target, stats) ->
    (d_iall, dwh, dbhn, dwhead, dbhead, dh0, mets)

    whead (Hg, A+1) f32 = [W_policy | W_value], bhead (1, A+1); the small
    per-sample streams (action/logp_old/value_old/adv/target) ride as
    (T, N, RB, LANE, 1); stats (2,) SMEM = [adv_mean, adv_inv_std].
    Loss semantics match models.ippo_rnn.rnn_ppo_loss_native exactly
    (means over every (t, agent, env) element of the minibatch); ``mets``
    = [pg_sum, v_sum, ent_sum, kl_sum] (divide by t*n*rb*LANE).
    """
    # changing blocks: bf16 gates (6) + bf16 cotangent out (6) + bf16
    # hseq (2) per el per time row (the dhseq stream of the plain bwd is
    # gone — the head cotangent is computed in-kernel).  The head/loss
    # intermediates roughly double the compiler's scoped accounting vs
    # the plain bwd (113.6 MB at the 16 MB chunk budget on hardware), so
    # this kernel budgets half the chunk volume.
    tc, rbc = _pick_chunks(t, rb, n, hg, bytes_per_el_t=28)
    n_tc = t // tc
    rows = n * rbc * LANE
    a1 = a + 1
    inv_n = 1.0 / (t * n * rb * LANE)
    eps = clip_eps

    def kernel(stats_ref, wh_ref, bhn_ref, whead_ref, bhead_ref,
               iall_ref, done_ref, hseq_ref, hboundary_ref,
               act_ref, olp_ref, ov_ref, adv_ref, tgt_ref,
               dg_out, dwh_out, dbhn_out, dwhead_out, dbhead_out,
               dh0_out, mets, dc_s):
        k = pl.program_id(1)
        kk = n_tc - 1 - k
        first = (pl.program_id(0) == 0) & (k == 0)

        @pl.when(first)
        def _():
            dwh_out[:] = jnp.zeros_like(dwh_out)
            dbhn_out[:] = jnp.zeros_like(dbhn_out)
            dwhead_out[:] = jnp.zeros_like(dwhead_out)
            dbhead_out[:] = jnp.zeros_like(dbhead_out)
            for i in range(4):
                mets[i] = 0.0

        @pl.when(k == 0)
        def _():
            dc_s[:] = jnp.zeros_like(dc_s)

        adv_mean = stats_ref[0]
        adv_inv_std = stats_ref[1]
        wh = wh_ref[:]
        bhn = bhn_ref[:]
        whead = whead_ref[:]
        bhead = bhead_ref[:]
        zero_b = jnp.bfloat16(0.0)

        # ---- heads + loss + loss-backward, BATCHED over the whole time
        # chunk (keeping this off the sequential reverse loop's critical
        # path — per-step (rows, A) algebra serialized measured SLOWER
        # than the XLA segments it replaced) ----
        trows = tc * rows
        hf2 = hseq_ref[:].astype(jnp.float32).reshape(trows, hg)
        heads = jax.lax.dot_general(
            hf2, whead, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bhead  # (tc*rows, A+1)
        logits = heads[:, :a]
        value = heads[:, a:]
        act = act_ref[:].reshape(trows, 1)
        old_logp = olp_ref[:].reshape(trows, 1)
        old_value = ov_ref[:].reshape(trows, 1)
        adv = adv_ref[:].reshape(trows, 1)
        target = tgt_ref[:].reshape(trows, 1)

        mx = jnp.max(logits, axis=1, keepdims=True)
        sm = jnp.exp(logits - mx)
        zs = jnp.sum(sm, axis=1, keepdims=True)
        lsm = logits - mx - jnp.log(zs)
        pr = sm / zs
        onehot = (
            jax.lax.broadcasted_iota(jnp.int32, (trows, a), 1) == act
        )
        logp = jnp.sum(
            jnp.where(onehot, lsm, 0.0), axis=1, keepdims=True
        )
        ratio = jnp.exp(logp - old_logp)
        advn = (adv - adv_mean) * adv_inv_std
        ratio_c = jnp.clip(ratio, 1.0 - eps, 1.0 + eps)
        pg1 = ratio * advn
        pg2 = ratio_c * advn
        obj = jnp.minimum(pg1, pg2)
        use1 = pg1 <= pg2
        inside = (
            (ratio > 1.0 - eps) & (ratio < 1.0 + eps)
        ).astype(jnp.float32)
        dobj = jnp.where(use1, advn, advn * inside)
        dlogp = -inv_n * dobj * ratio
        ent = -jnp.sum(pr * lsm, axis=1, keepdims=True)
        dlogits = dlogp * (onehot.astype(jnp.float32) - pr) + (
            ent_coef * inv_n
        ) * pr * (lsm + ent)
        vdiff = value - old_value
        v_clip = old_value + jnp.clip(vdiff, -eps, eps)
        e1 = value - target
        e2 = v_clip - target
        use_e1 = (e1 * e1) >= (e2 * e2)
        inside_v = ((vdiff > -eps) & (vdiff < eps)).astype(jnp.float32)
        dvalue = (vf_coef * inv_n) * jnp.where(use_e1, e1, e2 * inside_v)
        dheads = jnp.concatenate([dlogits, dvalue], axis=1)
        dwhead_out[:] += jax.lax.dot_general(
            hf2, dheads, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dbhead_out[:] += jnp.sum(dheads, axis=0, keepdims=True)
        dh_all = jax.lax.dot_general(
            dheads, whead, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(tc, n, rbc, LANE, hg)
        mets[0] += jnp.sum(obj)
        mets[1] += jnp.sum(0.5 * jnp.maximum(e1 * e1, e2 * e2))
        mets[2] += jnp.sum(ent)
        mets[3] += jnp.sum((ratio - 1.0) - (logp - old_logp))

        for lt in range(tc - 1, -1, -1):
            # ---- GRU step backward (identical to build_gru_seq_bwd) ----
            if lt == 0:
                hp_t = hboundary_ref[0]
            else:
                hp_t = jnp.where(
                    done_ref[lt - 1, 0] != 0, zero_b, hseq_ref[lt - 1]
                )
            hp2 = hp_t.reshape(rows, hg)
            hh = jax.lax.dot_general(
                hp2, wh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(n, rbc, LANE, 3 * hg)
            iall_t = iall_ref[lt]
            r = jax.nn.sigmoid(
                iall_t[..., :hg].astype(jnp.float32) + hh[..., :hg]
            )
            z = jax.nn.sigmoid(
                iall_t[..., hg:2 * hg].astype(jnp.float32)
                + hh[..., hg:2 * hg]
            )
            hhn = (hh[..., 2 * hg:] + bhn).astype(jnp.bfloat16)
            nn = jnp.tanh(
                iall_t[..., 2 * hg:].astype(jnp.bfloat16)
                + r.astype(jnp.bfloat16) * hhn
            ).astype(jnp.float32)
            m = done_ref[lt, 0] != 0
            dnh = dh_all[lt] + jnp.where(m, 0.0, dc_s[:])
            hpf = hp_t.astype(jnp.float32)
            dz_pre = dnh * (hpf - nn) * z * (1.0 - z)
            dn_pre = dnh * (1.0 - z) * (1.0 - nn * nn)
            dhhn = dn_pre * r
            dr_pre = dn_pre * hhn.astype(jnp.float32) * r * (1.0 - r)
            dg3 = jnp.concatenate(
                [dr_pre, dz_pre, dhhn], axis=-1
            ).astype(jnp.bfloat16).reshape(rows, 3 * hg)
            dh_prev = dnh * z + jax.lax.dot_general(
                dg3, wh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(n, rbc, LANE, hg)
            dwh_out[:] += jax.lax.dot_general(
                hp2, dg3, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dbhn_out[:] += jnp.sum(
                dhhn.reshape(rows, hg), axis=0, keepdims=True
            )
            dg_out[lt] = jnp.concatenate(
                [dr_pre, dz_pre, dn_pre], axis=-1
            ).astype(jnp.bfloat16)
            dc_s[:] = dh_prev
            if lt == 0:
                dh0_val = dh_prev

                @pl.when(kk == 0)
                def _():
                    dh0_out[:] = dh0_val

    grid = (rb // rbc, n_tc)
    rev = lambda c, k: (n_tc - 1 - k, 0, c, 0, 0)
    gate_spec = pl.BlockSpec(
        (tc, n, rbc, LANE, 3 * hg), rev, memory_space=pltpu.VMEM
    )
    h_spec = pl.BlockSpec(
        (tc, n, rbc, LANE, hg), rev, memory_space=pltpu.VMEM
    )
    small_spec = pl.BlockSpec(
        (tc, n, rbc, LANE, 1), rev, memory_space=pltpu.VMEM
    )
    done_spec = pl.BlockSpec(
        (tc, 1, rbc, LANE, 1), rev, memory_space=pltpu.VMEM
    )
    hblock = pl.BlockSpec(
        (n, rbc, LANE, hg), lambda c, k: (0, c, 0, 0),
        memory_space=pltpu.VMEM,
    )

    def cspec(shape):
        return pl.BlockSpec(shape, lambda c, k: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    in_specs = [
        cspec((hg, 3 * hg)), cspec((1, hg)),
        cspec((hg, a1)), cspec((1, a1)),
        gate_spec, done_spec, h_spec,
        pl.BlockSpec(
            (1, n, rbc, LANE, hg),
            lambda c, k: (n_tc - 1 - k, 0, c, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        small_spec, small_spec, small_spec, small_spec, small_spec,
    ]
    out_specs = [
        gate_spec,
        cspec((hg, 3 * hg)), cspec((1, hg)),
        cspec((hg, a1)), cspec((1, a1)),
        hblock,
        pl.BlockSpec((4,), lambda c, k: (0,), memory_space=pltpu.SMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((t, n, rb, LANE, 3 * hg), jnp.bfloat16),
        jax.ShapeDtypeStruct((hg, 3 * hg), jnp.float32),
        jax.ShapeDtypeStruct((1, hg), jnp.float32),
        jax.ShapeDtypeStruct((hg, a1), jnp.float32),
        jax.ShapeDtypeStruct((1, a1), jnp.float32),
        jax.ShapeDtypeStruct((n, rb, LANE, hg), jnp.float32),
        jax.ShapeDtypeStruct((4,), jnp.float32),
    ]
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((n, rbc, LANE, hg), jnp.float32)],
        # the loss-fused sweep carries head/loss intermediates on top of
        # the gate streams: the compiler's accounting ran 73.4 MB at the
        # 16 MB chunk budget (64 MB limit rejected it on hardware)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024
        ),
        interpret=interpret,
    )

    def small(x):
        return x.reshape(t, n, rb, LANE, 1)

    def bwd(wh, bhn, whead, bhead, iall, done, h0, hseq,
            action, logp_old, value_old, adv, target, stats):
        done5 = done.reshape(t, 1, rb, LANE, 1).astype(jnp.bfloat16)
        hb = jnp.concatenate(
            [
                h0.astype(jnp.bfloat16)[None],
                jnp.where(
                    done5[tc - 1::tc][: n_tc - 1] != 0,
                    jnp.bfloat16(0.0),
                    hseq[tc - 1::tc][: n_tc - 1],
                ),
            ],
            axis=0,
        )
        d_iall, dwh, dbhn, dwhead, dbhead, dh0, mets = call(
            stats.astype(jnp.float32),
            wh.astype(jnp.bfloat16),
            bhn.reshape(1, hg).astype(jnp.float32),
            whead.astype(jnp.float32),
            bhead.reshape(1, a1).astype(jnp.float32),
            iall.astype(jnp.bfloat16), done5, hseq, hb,
            small(action.astype(jnp.int32)),
            small(logp_old.astype(jnp.float32)),
            small(value_old.astype(jnp.float32)),
            small(adv.astype(jnp.float32)),
            small(target.astype(jnp.float32)),
        )
        return d_iall, dwh, dbhn.reshape(bhn.shape), dwhead, dbhead, dh0, mets

    return bwd
