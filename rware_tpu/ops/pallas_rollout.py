"""Fused full-rollout Pallas kernel: T env steps per kernel launch, in VMEM.

Why: the XLA step program is ~1.2 ms/scan-iteration at B=4096 on v5e —
dispatch-bound, dozens of micro-kernels over tiny tensors (tools/
perf_probe.py).  This kernel runs the ENTIRE rollout for a block of envs
inside one kernel: state lives in registers/VMEM for all T steps, HBM is
touched once at the start and once at the end, and there is exactly one
dispatch per (env-block) — the hardware's speed-of-light shape for this
workload.

Design (TPU-first, not a port):
  * env-major tiles: every state field is laid out (X, 8, 128) — each
    logical row (one agent coordinate, one shelf coordinate, ...) fills a
    full (8 sublanes x 128 lanes) VPU tile of 1024 envs, so every
    elementwise op runs at 100% vector utilisation; the agent / shelf axes
    are unrolled / leading axes.
  * all control flow is static: the agent loop, the N^2 resolver algebra,
    the goal loop and the without-replacement samplers unroll at trace time.
  * on-chip PRNG (pltpu.prng_random_bits) for actions, spawns and queue
    resampling — no threefry tensor traffic.

Semantics match rware_tpu.core.engine (same resolver rules, pre-cancel,
reward types, termination; validated by tests/test_pallas.py in scripted
mode).  Deviations, by construction:
  * RNG streams differ from the jax.random-based engine (sampling is
    modulo-reduced uint32: bias < 2^-24 for all moduli used here), so
    random-action rollouts are statistically, not bitwise, equivalent;
  * scripted mode (actions supplied, for validation) replaces a delivered
    request with the lowest-index non-queued shelf and respawns agents at
    fixed cells, keeping that mode fully deterministic.

Reference behavior being reproduced: /root/reference/rware/warehouse.py
step() :804-946 (see rware_tpu/core/engine.py for the per-rule citations).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rware_tpu.config import WarehouseConfig
from rware_tpu.core.state import WarehouseState
from rware_tpu.types import Action, RewardType

# Envs per kernel instance, laid out as one (8, 128) VPU tile per row.
SUB, LANE = 8, 128
ENV_BLOCK = SUB * LANE  # 1024

# Direction coding (UP=0, DOWN=1, LEFT=2, RIGHT=3) — see types.Direction.
_ROT_LEFT = (2, 3, 1, 0)
_ROT_RIGHT = (3, 2, 0, 1)
_DX = (0, 0, -1, 1)
_DY = (-1, 1, 0, 0)


def _sel4(idx, table):
    """table[idx] for a static 4-entry table and (1, E) int index."""
    out = jnp.full_like(idx, table[0])
    for v in range(1, 4):
        out = jnp.where(idx == v, table[v], out)
    return out


def _u32(shape):
    return pltpu.prng_random_bits(shape)


def _rand_mod(shape, m):
    """Uniform int32 in [0, m) (modulo-reduced; bias < 2^-24).

    The top bit is masked off first: Mosaic lowers uint32 arithmetic on
    signed i32 vectors, so an unmasked modulo yields NEGATIVE values for
    half the draws (verified on hardware via the action-distribution skew).
    """
    masked = _u32(shape) & np.uint32(0x7FFFFFFF)
    return (masked % np.uint32(m)).astype(jnp.int32)


def _draw_distinct(n_draws, m, shape):
    """n_draws distinct uniform values in [0, m) per lane (unrolled).

    Sequential shifted draws: draw_i is uniform over the m - i values not
    yet taken; shifting past already-chosen values (in ascending order)
    maps it to the global id.  Exactly uniform over ordered samples, like
    np_random.choice(replace=False) (rware/warehouse.py:781-792).
    """
    chosen = []  # unsorted, in draw order
    sorted_cells = []  # ascending
    for i in range(n_draws):
        d = _rand_mod(shape, m - i)
        for c in sorted_cells:
            d = d + (d >= c).astype(jnp.int32)
        chosen.append(d)
        # insert d into the ascending list (unrolled insertion pass)
        new_sorted = []
        cur = d
        for c in sorted_cells:
            lo = jnp.minimum(cur, c)
            hi = jnp.maximum(cur, c)
            new_sorted.append(lo)
            cur = hi
        new_sorted.append(cur)
        sorted_cells = new_sorted
    return chosen


def _arith_rack_ch(layout) -> int:
    """column_height when the layout's highway mask exactly equals the
    parametric formula (rware/warehouse.py:294-326) — rack membership can
    then be computed arithmetically in-kernel; -1 otherwise (string
    layouts keep the slot scan)."""
    import numpy as _np

    ch = getattr(layout, "column_height", None)
    if ch is None or ch < 0:
        return -1
    H, W = layout.grid_size
    ys = _np.arange(H)[:, None]
    xs = _np.arange(W)[None, :]
    mask = (
        (xs % 3 == 0)
        | (ys % (ch + 1) == 0)
        | (ys == H - 1)
        | ((ys > H - (ch + 3)) & ((xs == W // 2 - 1) | (xs == W // 2)))
    ).astype(_np.uint8)
    return int(ch) if _np.array_equal(mask, layout.highways) else -1


def _on_rack_arith(st, x, y, H, W):
    """Rack membership by the inverted parametric highway formula (valid
    when st.rack_ch >= 0 — verified by _arith_rack_ch at build time)."""
    ch1 = st.rack_ch + 1
    return ~(
        (x % 3 == 0)
        | (y % ch1 == 0)
        | (y == H - 1)
        | (
            (y > H - (st.rack_ch + 3))
            & ((x == W // 2 - 1) | (x == W // 2))
        )
    )


def _env_step_core(st, goals, shelf_rows, slots_x, slots_y, acts, state):
    """One warehouse transition on env-tiled vectors (shared by the random,
    scripted and collect kernels).

    ``state`` = (ax, ay, ad, carrying, hd, sx, sy, q, inact, steps) where the
    agent fields are N-lists of (SUB, LANE) int32, ``hd`` an N-list of bool,
    shelf/queue stacked (S/R, SUB, LANE).  Returns
    ``(new_state, rewards, done)`` with rewards an N-list of f32 tiles.
    """
    N, S, R, H, W = st.n, st.s, st.r, st.h, st.w
    HW = H * W
    ax, ay, ad, carrying, hd, sx, sy, q, inact, steps = state
    acts = list(acts)

    # ---- target cells (edge-clamped) ------------------------------
    tx, ty = [], []
    for i in range(N):
        fwd = acts[i] == Action.FORWARD
        dx = _sel4(ad[i], _DX)
        dy = _sel4(ad[i], _DY)
        tx.append(
            jnp.clip(ax[i] + jnp.where(fwd, dx, 0), 0, W - 1)
        )
        ty.append(
            jnp.clip(ay[i] + jnp.where(fwd, dy, 0), 0, H - 1)
        )

    # ---- packed cell ids -------------------------------------------
    # Every coordinate-pair scan below compares ONE int (y*W + x, unique
    # in [0, HW)) instead of two eqs + and — the same idiom the obs
    # builders' slot_cid already uses.  This halves the O(N*S) shelf
    # scans and cuts each O(N^2) resolver adjacency to one eq per pair.
    scell = sy * W + sx  # (S, SUB, LANE) — pre-move shelf cells

    # ---- pre-cancel: loaded agent into a standing shelf -----------
    if st.debug_level < 3:
        acell0 = [ay[i] * W + ax[i] for i in range(N)]
        tcell0 = [ty[i] * W + tx[i] for i in range(N)]
        loaded_acell = jnp.stack(
            [
                jnp.where(carrying[j] >= 0, acell0[j], -1)
                for j in range(N)
            ]
        )  # (N, SUB, LANE): loaded agents' cells, -1 otherwise
        for i in range(N):
            shelf_at_t = jnp.any(scell == tcell0[i], axis=0)
            tgt_loaded = jnp.any(loaded_acell == tcell0[i][None], axis=0)
            moving = tcell0[i] != acell0[i]
            cancel = (carrying[i] >= 0) & moving & shelf_at_t & ~tgt_loaded
            acts[i] = jnp.where(cancel, Action.NOOP, acts[i])
            tx[i] = jnp.where(cancel, ax[i], tx[i])
            ty[i] = jnp.where(cancel, ay[i], ty[i])

    # ---- resolver (same rules as ops/resolver.py) -----------------
    # Stacked packed-cell formulation with POINTER-DOUBLING walks: op
    # count O(log N) per concept and vector work O(N^2 log N) — down from
    # the round-3 O(N)-pass / O(N^3)-work form whose superlinear growth
    # set the >12-agent throughput cliff (tiny-16ag carried 44.6k VPU
    # elem-ops/env-step at flat ~30% utilization; tools/roofline.py).
    # Semantics are unchanged: the functional-graph fixed point with
    # self-loop commits, 2-cycle poisoning, longest-chain priority and
    # the pinned lowest-index tie.  Dynamic cross-agent selects use
    # one-hot sums over the leading axis instead of gathers, which
    # Mosaic cannot lower along untiled axes.
    if st.debug_level >= 5:
        committed_s = jnp.stack(
            [acts[i] == Action.FORWARD for i in range(N)]
        )
    axs = jnp.stack(ax)  # (N, SUB, LANE)
    ays = jnp.stack(ay)
    txs = jnp.stack(tx)
    tys = jnp.stack(ty)
    acells = ays * W + axs  # packed current cells
    tcells = tys * W + txs  # packed target cells
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (N, SUB, LANE), 0)
    iota_i = jax.lax.broadcasted_iota(jnp.int32, (N, N, SUB, LANE), 0)
    iota_j = jax.lax.broadcasted_iota(jnp.int32, (N, N, SUB, LANE), 1)
    off_diag = iota_i != iota_j

    # match[i, j]: agent i's target cell is agent j's current cell
    # (positions are unique, so at most one j per i)
    match = tcells[:, None] == acells[None, :]
    match_t = jnp.swapaxes(match, 0, 1)
    has_next = jnp.any(match, axis=1)  # (N, SUB, LANE)
    nxt = jnp.sum(jnp.where(match, iota_j, 0), axis=1)

    # head-on swaps poison their whole weak component
    two_cycle = jnp.any(match & match_t & off_diag, axis=1)

    # longest-chain priority with lowest-index tie-break (computed first:
    # the doubling chain below folds `chosen` along the walk)
    shared = tcells[:, None] == tcells[None, :]
    depth = jnp.ones((N, SUB, LANE), dtype=jnp.int32)
    for _ in range(N):
        depth = 1 + jnp.max(
            jnp.where(match_t, depth[None, :], 0), axis=1
        )
    beats = (depth[None, :] < depth[:, None]) | (
        (depth[None, :] == depth[:, None]) & (iota_j >= iota_i)
    )
    chosen = jnp.all(
        ~(shared & off_diag) | beats, axis=1
    )

    # ONE pointer-doubling chain over the absorbing successor function
    # (terminals self-loop), ceil(log2 N) one-hot composes, computing:
    #   fin   = succ^(2^K), 2^K >= N — a node on the path's cycle, or
    #           the absorbing terminal
    #   mpath = min agent index over the 2^K-step path; gathered at a
    #           cycle node it is the min over the WHOLE cycle, i.e. a
    #           canonical cycle id
    #   allch = AND of `chosen` over the path — for terminal trees this
    #           IS the old cc chain-follow fixed point (cycle-bound paths
    #           are masked by comp_cycle below, exactly as cc was)
    succ = jnp.where(has_next, nxt, iota_n)
    cur, mpath, allch = succ, iota_n, chosen
    for _ in range((N - 1).bit_length()):
        at = cur[:, None] == iota_j  # one-hot row: x[cur] gathers below
        mpath = jnp.minimum(
            mpath, jnp.sum(jnp.where(at, mpath[None, :], 0), axis=1)
        )
        allch = allch & jnp.any(at & allch[None, :], axis=1)
        cur = jnp.sum(jnp.where(at, cur[None, :], 0), axis=1)
    fin = cur

    # on a cycle <=> some agent's 2^K-step walk lands on you: succ^(2^K)
    # always sits on a cycle or a terminal, and only cycle nodes keep a
    # successor there
    at_fin = fin[:, None] == iota_j  # (Ni, Nj, ...): fin[i] == j
    on_cycle = has_next & jnp.any(at_fin, axis=0)

    # canonical weak-component key: same key <=> connected under
    # (shared | match | match_t).  Cycle-bound components key on the min
    # agent index of their cycle; terminal trees key on the terminal's
    # target cell (terminals sharing a target cell are shared-adjacent,
    # so the cell id IS the component), offset by N to stay disjoint.
    m_fin = jnp.sum(jnp.where(at_fin, mpath[None, :], 0), axis=1)
    hn_fin = jnp.any(at_fin & has_next[None, :], axis=1)
    tc_fin = jnp.sum(jnp.where(at_fin, tcells[None, :], 0), axis=1)
    key = jnp.where(hn_fin, m_fin, N + tc_fin)
    key_eq = key[:, None] == key[None, :]
    comp_poison = jnp.any(key_eq & two_cycle[None, :], axis=1)
    comp_cycle = jnp.any(key_eq & on_cycle[None, :], axis=1)

    if st.debug_level < 5:
        committed_s = (on_cycle & ~comp_poison) | (allch & ~comp_cycle)
    committed = [committed_s[i] for i in range(N)]
    acts = [
        jnp.where(committed[i], acts[i], Action.NOOP) for i in range(N)
    ]

    # ---- execute movement / rotation ------------------------------
    # toggle-load below must see PRE-move shelf positions (the
    # reference reads a stale grid, warehouse.py:889-892) — `scell`
    # above packed them before any shelf moved
    new_ax, new_ay, new_ad = [], [], []
    for i in range(N):
        moved = committed[i] & (acts[i] == Action.FORWARD)
        new_ax.append(jnp.where(moved, tx[i], ax[i]))
        new_ay.append(jnp.where(moved, ty[i], ay[i]))
        rot_l = _sel4(ad[i], _ROT_LEFT)
        rot_r = _sel4(ad[i], _ROT_RIGHT)
        new_ad.append(
            jnp.where(
                acts[i] == Action.LEFT,
                rot_l,
                jnp.where(acts[i] == Action.RIGHT, rot_r, ad[i]),
            )
        )
        # carried shelf rides along
        mask = (shelf_rows == carrying[i]) & moved
        sx = jnp.where(mask, new_ax[i], sx)
        sy = jnp.where(mask, new_ay[i], sy)

    # ---- toggle load ----------------------------------------------
    rewards = [jnp.zeros((SUB, LANE), dtype=jnp.float32) for _ in range(N)]
    new_carrying, new_hd = [], []
    acell_new = [new_ay[i] * W + new_ax[i] for i in range(N)]
    # rack-slot cells only needed by the slot-scan fallback (string
    # layouts); parametric layouts use _on_rack_arith
    slot_cell = (
        None if st.rack_ch >= 0 else slots_y * W + slots_x
    )  # (S, SUB, LANE)
    if st.debug_level >= 3:
        new_carrying = list(carrying)
        new_hd = list(hd)
    for i in range(N) if st.debug_level < 3 else []:
        toggling = acts[i] == Action.TOGGLE_LOAD
        # toggle-load sees PRE-move shelf cells (stale grid; `scell`
        # was packed before any carried shelf moved)
        under = scell == acell_new[i][None]
        shelf_under = jnp.max(
            jnp.where(under, shelf_rows, -1), axis=0
        )
        has_under = shelf_under >= 0  # max is -1 iff nothing underneath
        pickup = toggling & (carrying[i] < 0) & has_under
        # on_highway = not a rack slot
        if st.rack_ch >= 0:
            on_rack = _on_rack_arith(st, new_ax[i], new_ay[i], H, W)
        else:
            on_rack = jnp.any(slot_cell == acell_new[i][None], axis=0)
        drop = toggling & (carrying[i] >= 0) & on_rack
        if st.reward_type == RewardType.TWO_STAGE:
            rewards[i] += jnp.where(drop & hd[i], 0.5, 0.0)
        new_carrying.append(
            jnp.where(pickup, shelf_under, jnp.where(drop, -1, carrying[i]))
        )
        new_hd.append(hd[i] & ~drop)

    # ---- deliveries, queue resample, rewards ----------------------
    any_delivered = jnp.zeros((SUB, LANE), dtype=jnp.bool_)
    if R and st.debug_level < 2:
        scell_new = sy * W + sx  # post-move shelf cells
        # per-goal in-queue membership: a full rebuild costs 2*R*S ops;
        # when several goals share a step and R is large, build ONCE and
        # update the <=1 changed slot incrementally per goal (~7*S) —
        # semantics identical (each goal sees the queue as updated by the
        # goals before it, the reference's sequential order)
        incremental = R * 2 * (len(goals) - 1) > 7 * len(goals)
        in_queue = None
        if incremental:
            in_queue = shelf_rows == q[0]
            for r_i in range(1, R):
                in_queue |= shelf_rows == q[r_i]
        for gx, gy in goals:
            at_goal = scell_new == (gy * W + gx)
            sid = jnp.max(
                jnp.where(at_goal, shelf_rows, -1), axis=0
            )
            has_shelf = sid >= 0  # max is -1 iff no shelf on the goal
            in_q_slot = q == sid  # (R, E)
            delivered = has_shelf & jnp.any(
                in_q_slot, axis=0
            )
            if not incremental:
                in_queue = shelf_rows == q[0]
                for r_i in range(1, R):
                    in_queue |= shelf_rows == q[r_i]
            # the queue ALWAYS holds exactly R distinct shelves (resample
            # replaces one slot with a non-queued shelf), so candidate
            # existence and count are compile-time constants
            if st.scripted:
                # deterministic: lowest-index non-queued shelf
                repl = jnp.min(
                    jnp.where(~in_queue, shelf_rows, S),
                    axis=0,
                    keepdims=True,
                )
            else:
                k = (
                    (_u32((SUB, LANE)) & np.uint32(0x7FFFFFFF))
                    % np.uint32(max(S - R, 1))
                ).astype(jnp.int32)
                # k-th available shelf via the sequential accumulator
                # chain: a log-depth shift-doubling prefix count was
                # tried and measured SLOWER on hardware (medium/large
                # -19% — the serial chain pipelines across steps; the
                # doubling's 2*S*log(S) extra ops don't pay for the
                # depth).  tests/test_pallas keeps the selection-
                # equivalence proof of the two formulas.
                acc = jnp.zeros((SUB, LANE), dtype=jnp.int32)
                repl = jnp.zeros((SUB, LANE), dtype=jnp.int32)
                for s_i in range(S):
                    avail = ~in_queue[s_i]
                    hit = avail & (acc == k)
                    repl = jnp.where(hit, s_i, repl)
                    acc += avail.astype(jnp.int32)
            if S <= R:
                # R == S edge: no replacement candidate exists (the
                # reference crashes here); keep the shelf requested
                repl = sid
            q = jnp.where(delivered & in_q_slot, repl, q)
            if incremental:
                # reflect the slot swap: sid leaves the queue, repl
                # enters (order matters: repl == sid at the R == S edge
                # must stay requested)
                repl_row = repl if repl.ndim == 2 else repl[0]
                in_queue = in_queue & ~(
                    delivered[None] & (shelf_rows == sid[None])
                )
                in_queue = in_queue | (
                    delivered[None] & (shelf_rows == repl_row[None])
                )

            # reward by type (INDIVIDUAL/TWO_STAGE credit the agent
            # on the goal; none -> last agent, the reference's
            # rewards[-1] wraparound, warehouse.py:921-927)
            if st.reward_type == RewardType.GLOBAL:
                for i in range(N):
                    rewards[i] += jnp.where(delivered, 1.0, 0.0)
            else:
                on_goal = [
                    acell_new[i] == (gy * W + gx) for i in range(N)
                ]
                none_on = ~functools.reduce(jnp.logical_or, on_goal)
                amount = (
                    0.5
                    if st.reward_type == RewardType.TWO_STAGE
                    else 1.0
                )
                for i in range(N):
                    credit = on_goal[i] | (none_on & (i == N - 1))
                    rewards[i] += jnp.where(
                        delivered & credit, amount, 0.0
                    )
                    if st.reward_type == RewardType.TWO_STAGE:
                        new_hd[i] = new_hd[i] | (
                            delivered & credit
                        )
            any_delivered |= delivered

    # ---- termination & autoreset ----------------------------------
    inact = jnp.where(any_delivered, 0, inact + 1)
    steps = steps + 1
    done = jnp.zeros((SUB, LANE), dtype=jnp.bool_)
    if st.max_inactivity:
        done |= inact >= st.max_inactivity
    if st.max_steps:
        done |= steps >= st.max_steps

    if st.debug_level >= 1:
        pass
    elif st.scripted:
        spawn_cells = [
            jnp.full((SUB, LANE), i, dtype=jnp.int32) for i in range(N)
        ]
        spawn_dirs = [
            jnp.zeros((SUB, LANE), dtype=jnp.int32) for _ in range(N)
        ]
        fresh_q = (
            [
                jnp.full((SUB, LANE), r_i, dtype=jnp.int32)
                for r_i in range(R)
            ]
            if R
            else []
        )
    else:
        spawn_cells = _draw_distinct(N, HW, (SUB, LANE))
        spawn_dirs = [_rand_mod((SUB, LANE), 4) for _ in range(N)]
        fresh_q = _draw_distinct(R, S, (SUB, LANE)) if R else []

    for i in range(N) if st.debug_level < 1 else []:
        new_ax[i] = jnp.where(done, spawn_cells[i] % W, new_ax[i])
        new_ay[i] = jnp.where(done, spawn_cells[i] // W, new_ay[i])
        new_ad[i] = jnp.where(done, spawn_dirs[i], new_ad[i])
        new_carrying[i] = jnp.where(done, -1, new_carrying[i])
        new_hd[i] = new_hd[i] & ~done
    if st.debug_level < 1:
        sx = jnp.where(done, slots_x, sx)
        sy = jnp.where(done, slots_y, sy)
    if R and st.debug_level < 1:
        q = jnp.where(done, jnp.stack(fresh_q, axis=0), q)
    if st.debug_level < 1:
        inact = jnp.where(done, 0, inact)
        steps = jnp.where(done, 0, steps)


    new_state = (
        new_ax, new_ay, new_ad, new_carrying, new_hd,
        sx, sy, q, inact, steps,
    )
    return new_state, rewards, done


@dataclasses.dataclass(frozen=True)
class _Static:
    n: int
    s: int
    r: int
    g: int
    h: int
    w: int
    t: int
    reward_type: int
    max_steps: int
    max_inactivity: int
    scripted: bool
    # perf-bisect switch: 0=full, 1=no autoreset, 2=also no delivery,
    # 3=also no toggle/pre-cancel, 4=movement+resolver only, 5=movement only
    debug_level: int = 0
    # message bits per agent (rware/warehouse.py:152,809-814): pure state
    # pass-through for dynamics — set from action columns, cleared on reset
    m: int = 0
    # >= 0: the layout's highway mask equals the parametric formula with
    # this column_height (verified at build time), so rack membership is
    # ~11 arithmetic ops per agent instead of a 2*S slot scan
    rack_ch: int = -1


def _make_kernel(st: _Static, goals: Tuple[Tuple[int, int], ...]):
    N, S, R, T, M = st.n, st.s, st.r, st.t, st.m
    AW = 1 + M  # action width per agent: action column + message bits

    def kernel(*refs):
        shelf_rows = jax.lax.broadcasted_iota(jnp.int32, (S, SUB, LANE), 0)
        refs = list(refs)
        seed_ref = refs.pop(0)
        actions_ref = refs.pop(0) if st.scripted else None
        (ax_ref, ay_ref, ad_ref, carry_ref, hd_ref) = refs[:5]
        refs = refs[5:]
        msg_ref = refs.pop(0) if M else None
        (sx_ref, sy_ref, q_ref, inact_ref, steps_ref,
         slotx_ref, sloty_ref) = refs[:7]
        refs = refs[7:]
        (oax, oay, oad, ocarry, ohd) = refs[:5]
        refs = refs[5:]
        omsg = refs.pop(0) if M else None
        (osx, osy, oq, oinact, osteps, orew, oepis) = refs

        if not st.scripted:
            # scripted (validation) mode is RNG-free so it also runs under
            # the CPU interpreter, where the TPU PRNG is unavailable
            pltpu.prng_seed(seed_ref[0] + pl.program_id(0))

        slots_x = slotx_ref[:]  # (S, E) — home rack slots (pre-broadcast)
        slots_y = sloty_ref[:]

        def one_step(t, carry):
            (ax, ay, ad, carrying, hd_i, msg, sx, sy, q, inact, steps,
             rew_acc, epis) = carry
            # ax..: lists of (1, E); sx/sy: (S, E); q: (R, E) or None.
            # hd is carried as int32 — Mosaic cannot legalize loop-carried
            # i1 vectors — and viewed as bool inside the step.
            hd = [h != 0 for h in hd_i]

            # ---- actions --------------------------------------------------
            if st.scripted:
                acts = [
                    actions_ref[pl.ds(t, 1), i * AW, :, :].reshape(SUB, LANE)
                    for i in range(N)
                ]
                if M:
                    new_msg = jnp.concatenate(
                        [
                            actions_ref[
                                pl.ds(t, 1), i * AW + 1 : i * AW + AW, :, :
                            ].reshape(M, SUB, LANE)
                            for i in range(N)
                        ],
                        axis=0,
                    )
            else:
                bits = _rand_mod((N, SUB, LANE), 5)
                acts = [bits[i] for i in range(N)]
                if M:
                    new_msg = _rand_mod((N * M, SUB, LANE), 2)

            core_state = (
                ax, ay, ad, carrying, hd, sx, sy, q, inact, steps,
            )
            new_state, rewards, done = _env_step_core(
                st, goals, shelf_rows, slots_x, slots_y, acts, core_state
            )
            (new_ax, new_ay, new_ad, new_carrying, new_hd,
             sx, sy, q, inact, steps) = new_state
            if M:
                # messages set from action columns each step
                # (rware/warehouse.py:809-814), cleared by autoreset
                msg = jnp.where(done, 0, new_msg)
            rew_acc = [rew_acc[i] + rewards[i] for i in range(N)]
            epis = epis + done.astype(jnp.int32)
            new_hd_i = [h.astype(jnp.int32) for h in new_hd]
            return (
                new_ax, new_ay, new_ad, new_carrying, new_hd_i, msg,
                sx, sy, q, inact, steps, rew_acc, epis,
            )

        init = (
            [ax_ref[i] for i in range(N)],
            [ay_ref[i] for i in range(N)],
            [ad_ref[i] for i in range(N)],
            [carry_ref[i] for i in range(N)],
            [hd_ref[i] for i in range(N)],
            msg_ref[:] if M else jnp.zeros((1, SUB, LANE), jnp.int32),
            sx_ref[:],
            sy_ref[:],
            q_ref[:] if R else jnp.zeros((1, SUB, LANE), jnp.int32),
            inact_ref[0],
            steps_ref[0],
            [jnp.zeros((SUB, LANE), dtype=jnp.float32) for _ in range(N)],
            jnp.zeros((SUB, LANE), dtype=jnp.int32),
        )
        final = jax.lax.fori_loop(0, T, one_step, init, unroll=False)
        (ax, ay, ad, carrying, hd, msg, sx, sy, q, inact, steps,
         rew, epis) = final
        oax[:] = jnp.stack(ax, axis=0)
        oay[:] = jnp.stack(ay, axis=0)
        oad[:] = jnp.stack(ad, axis=0)
        ocarry[:] = jnp.stack(carrying, axis=0)
        ohd[:] = jnp.stack(hd, axis=0)
        if M:
            omsg[:] = msg
        osx[:] = sx
        osy[:] = sy
        if R:
            oq[:] = q
        else:
            oq[:] = jnp.zeros((1, SUB, LANE), jnp.int32)
        oinact[:] = inact[None]
        osteps[:] = steps[None]
        orew[:] = jnp.stack(rew, axis=0)
        oepis[:] = epis[None]

    return kernel


def build_pallas_rollout(
    config: WarehouseConfig,
    n_steps: int,
    scripted: bool = False,
    interpret: bool = False,
    debug_level: int = 0,
    max_envs_per_call: Optional[int] = None,
    _unsafe_bisect: bool = False,
):
    """Returns ``rollout(state_batch, seed[, actions]) -> (state_batch,
    rewards_sum (B, N), episodes (B,))``.

    ``state_batch`` is a WarehouseState with leading batch axis B (multiple
    of ENV_BLOCK).  ``actions`` (scripted mode): (T, B, N) int32, or
    (T, B, N, 1 + msg_bits) when the config has message bits (action column
    first, then the broadcast bits — rware/warehouse.py:809-814).

    Supports the full registered config space: any ``n_agents`` (the
    stacked resolver keeps program size at O(N) ops — each over N- or
    N^2-sized tensors, so vector work is O(N^3) but compile time stays
    flat in N) and any ``msg_bits`` (messages ride as extra state rows).
    """
    if debug_level != 0 and not _unsafe_bisect:
        # debug_level >= 3 silently removes the pre-cancel dynamics rule
        # and >= 5 drops resolver pieces — perf-bisect scaffolding only.
        # Production builders must construct level-0 kernels; bisect tools
        # opt in explicitly.
        raise ValueError(
            "debug_level != 0 alters env dynamics (perf-bisect only); "
            "pass _unsafe_bisect=True if you really want a partial kernel"
        )
    layout = config.compile_layout()
    H, W = layout.grid_size
    N = config.n_agents
    S = layout.n_shelves
    R = config.request_queue_size
    M = config.msg_bits
    AW = 1 + M
    st = _Static(
        n=N,
        s=S,
        r=R,
        g=layout.n_goals,
        h=H,
        w=W,
        t=n_steps,
        reward_type=int(config.reward_type),
        max_steps=config.max_steps or 0,
        max_inactivity=config.max_inactivity_steps or 0,
        scripted=scripted,
        debug_level=debug_level,
        m=M,
        rack_ch=_arith_rack_ch(layout),
    )
    goals = tuple((int(x), int(y)) for x, y in layout.goals)
    kernel = _make_kernel(st, goals)
    E = ENV_BLOCK

    state_dims = {
        "ax": N, "ay": N, "ad": N, "carry": N, "hd": N,
        **({"msg": N * M} if M else {}),
        "sx": S, "sy": S, "q": max(R, 1), "inact": 1, "steps": 1,
    }

    def block(rows):
        # (rows, SUB, LANE) tile: block i covers envs [i*1024, (i+1)*1024)
        return pl.BlockSpec(
            (rows, SUB, LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        )

    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]  # seed (1,)
    if scripted:
        in_specs.append(
            pl.BlockSpec(
                (n_steps, N * AW, SUB, LANE),
                lambda i: (0, 0, i, 0),
                memory_space=pltpu.VMEM,
            )
        )
    in_specs += [block(d) for d in state_dims.values()]
    in_specs += [block(S), block(S)]  # home slots
    out_specs = [block(d) for d in state_dims.values()]
    out_specs += [block(N), block(1)]  # rewards, episodes

    def out_shape(b):
        rows = b // LANE
        shapes = [
            jax.ShapeDtypeStruct((d, rows, LANE), jnp.int32)
            for d in state_dims.values()
        ]
        shapes.append(jax.ShapeDtypeStruct((N, rows, LANE), jnp.float32))
        shapes.append(jax.ShapeDtypeStruct((1, rows, LANE), jnp.int32))
        return shapes

    slots_x = np.asarray(layout.shelf_slots[:, 0])
    slots_y = np.asarray(layout.shelf_slots[:, 1])

    def rollout(
        state: WarehouseState, seed, actions: Optional[jax.Array] = None
    ):
        b = state.agent_x.shape[0]
        if b % E:
            raise ValueError(f"batch {b} must be a multiple of {E}")
        grid = (b // E,)

        def ti(x):
            # (B, X) -> (X, B//LANE, LANE): env e -> (e // 128, e % 128)
            arr = jnp.swapaxes(x.astype(jnp.int32), 0, 1)
            return arr.reshape(arr.shape[0], b // LANE, LANE)

        def ti1(x):
            # (B,) -> (1, B//LANE, LANE)
            return x.astype(jnp.int32).reshape(1, b // LANE, LANE)

        inputs = [jnp.atleast_1d(jnp.asarray(seed, dtype=jnp.int32))]
        if scripted:
            if actions is None:
                raise ValueError("scripted mode needs actions (T, B, N)")
            if M:
                if actions.ndim != 4 or actions.shape[-1] != AW:
                    raise ValueError(
                        f"msg_bits={M} scripted actions must be "
                        f"(T, B, N, {AW})"
                    )
                # (T, B, N, AW) -> (T, N, AW, B) -> (T, N*AW, RB, LANE)
                acts = jnp.moveaxis(actions, 1, 3).astype(jnp.int32)
                inputs.append(
                    acts.reshape(n_steps, N * AW, b // LANE, LANE)
                )
            else:
                acts = jnp.swapaxes(actions, 1, 2).astype(jnp.int32)
                inputs.append(acts.reshape(n_steps, N, b // LANE, LANE))
        inputs += [
            ti(state.agent_x),
            ti(state.agent_y),
            ti(state.agent_dir),
            ti(state.agent_carrying),
            ti(state.agent_has_delivered),
        ]
        if M:
            inputs.append(ti(state.agent_message.reshape(b, N * M)))
        inputs += [
            ti(state.shelf_x),
            ti(state.shelf_y),
            ti(state.request_queue)
            if R
            else jnp.zeros((1, b // LANE, LANE), jnp.int32),
            ti1(state.cur_inactive_steps),
            ti1(state.cur_steps),
            jnp.broadcast_to(
                jnp.asarray(slots_x, jnp.int32)[:, None, None],
                (S, b // LANE, LANE),
            ),
            jnp.broadcast_to(
                jnp.asarray(slots_y, jnp.int32)[:, None, None],
                (S, b // LANE, LANE),
            ),
        ]

        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape(b),
            # big-grid/high-N configs (S~224, N=19) need ~18 MB of scoped
            # stack for the step temporaries — over the 16 MB default
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=48 * 1024 * 1024
            ),
            interpret=interpret,
        )(*inputs)
        outs = list(outs)
        (ax, ay, ad, carry, hd) = outs[:5]
        outs = outs[5:]
        msg = outs.pop(0) if M else None
        (sx, sy, q, inact, steps, rew, epis) = outs

        def to(x):
            return jnp.swapaxes(x.reshape(x.shape[0], b), 0, 1)

        new_state = state.replace(
            agent_x=to(ax),
            agent_y=to(ay),
            agent_dir=to(ad),
            agent_carrying=to(carry),
            agent_has_delivered=to(hd).astype(bool),
            shelf_x=to(sx),
            shelf_y=to(sy),
            request_queue=to(q) if R else state.request_queue,
            cur_inactive_steps=inact.reshape(b),
            cur_steps=steps.reshape(b),
            **(
                {
                    "agent_message": to(msg)
                    .reshape(b, N, M)
                    .astype(jnp.float32)
                }
                if M
                else {}
            ),
        )
        return new_state, to(rew), epis.reshape(b)

    # Fresh large-grid programs crash the remote compile helper above a
    # batch threshold even though the Mosaic program is B-independent
    # (tools/large8_compile_bisect.py; ROADMAP #1).  Above the cap, run
    # the SAME known-good program over batch chunks inside one jit:
    # lax.map compiles the kernel once, and the per-chunk seed offset
    # keeps every env block's PRNG stream identical to the unchunked
    # program (the kernel seeds with seed + program_id; TPU grid cells
    # execute sequentially anyway, so chunking costs only the map glue).
    if max_envs_per_call is None and H * W >= 400:
        max_envs_per_call = 1024
    cap = max_envs_per_call

    def rollout_chunked(
        state: WarehouseState, seed, actions: Optional[jax.Array] = None
    ):
        b = state.agent_x.shape[0]
        if cap is None or b <= cap or b % cap:
            return rollout(state, seed, actions)
        n_chunks = b // cap

        def split(x):
            return x.reshape((n_chunks, cap) + x.shape[1:])

        st_c = jax.tree.map(split, state)
        seeds = (
            jnp.asarray(seed, jnp.int32)
            + jnp.arange(n_chunks, dtype=jnp.int32) * (cap // E)
        )
        if scripted:
            if actions is None:
                raise ValueError("scripted mode needs actions (T, B, N)")
            acts_c = jnp.moveaxis(
                actions.reshape(
                    (n_steps, n_chunks, cap) + actions.shape[2:]
                ),
                1, 0,
            )
            ns, rew, epis = jax.lax.map(
                lambda a: rollout(a[0], a[1], a[2]),
                (st_c, seeds, acts_c),
            )
        else:
            ns, rew, epis = jax.lax.map(
                lambda a: rollout(a[0], a[1]), (st_c, seeds)
            )

        def join(x):
            return x.reshape((b,) + x.shape[2:])

        return jax.tree.map(join, ns), join(rew), join(epis)

    return rollout_chunked


# ---------------------------------------------------------------------------
# Collect mode: observations + policy + sampling inside the kernel.
# ---------------------------------------------------------------------------


def _window_offsets(sensor_range):
    """Row-major (dy, dx) window offsets, y-outer (matches core.observations)."""
    r = sensor_range
    return [(dy, dx) for dy in range(-r, r + 1) for dx in range(-r, r + 1)]


def _window_onehot(rel, valid, n_words):
    """Per-entity packed window-cell one-hots.

    ``rel`` (E, SUB, LANE) int32 window-cell index of each entity relative
    to one agent's window, ``valid`` (E, SUB, LANE) bool (entity inside the
    window).  Returns an ``n_words``-list of (E, SUB, LANE) int32 with bit
    ``rel - 32*w`` set in word ``w`` — each entity's window membership as
    ONE set bit, so any per-cell membership mask reduces over the entity
    axis with a single sum per word (cell occupancy is unique, so sum == or)
    instead of a (E, W^2) compare tensor.
    """
    outs = []
    for wi in range(n_words):
        if n_words == 1:
            sel = valid
        else:
            sel = valid & (rel >= wi * 32) & (rel < wi * 32 + 32)
        # clip keeps the shift amount architecturally valid on lanes the
        # select masks out (shift-by->=32 is poison)
        sh = jnp.clip(rel - wi * 32, 0, 31)
        outs.append(jnp.where(sel, jnp.int32(1) << sh, 0))
    return outs


def _bitmap(onehot_words, mask=None):
    """Reduce per-entity one-hot words into per-agent window bitmaps:
    an n_words-list of (SUB, LANE) int32."""
    if mask is None:
        return [jnp.sum(w, axis=0) for w in onehot_words]
    return [jnp.sum(jnp.where(mask, w, 0), axis=0) for w in onehot_words]


def _window_bits(bitmap_words, w2):
    """Unpack bitmap words into (W2, SUB, LANE) int32 0/1 rows with ONE
    broadcast shift per word (bit c of word c // 32; arithmetic >> is fine
    because of the trailing & 1)."""
    c_iota = jax.lax.broadcasted_iota(jnp.int32, (w2, 1, 1), 0)
    if len(bitmap_words) == 1:
        return (bitmap_words[0][None] >> c_iota) & 1
    out = None
    for wi, word in enumerate(bitmap_words):
        sh = jnp.clip(c_iota - wi * 32, 0, 31)
        sel = (c_iota >= wi * 32) & (c_iota < wi * 32 + 32)
        v = jnp.where(sel, (word[None] >> sh) & 1, 0)
        out = v if out is None else out + v
    return out


def _build_obs_feats(
    st, sensor_range, normalised, acts_state, slots_x, slots_y, msg=None
):
    """FLATTENED observation features per agent, env-tile layout.

    Returns an N-list of (L, SUB, LANE) bfloat16 feature blocks in the
    exact reference bit order (rware/warehouse.py:631-674): self
    [x, y, carrying, dir-onehot(4), on_highway] then per window cell
    [has_agent, dir-onehot(4) (empty-cell quirk [1,0,0,0]), msg bits...,
    has_shelf, shelf_requested].  Out-of-grid window cells produce all-zero
    features (entities are always in-grid, so no bit is ever set for them),
    matching the reference's zero pad.

    Design: each entity's window-relative cell index is packed as ONE bit
    of a per-agent int32 bitmap (_window_onehot / _bitmap) and the W^2
    feature rows are unpacked with one broadcast shift (_window_bits) —
    tile work is O(N + S + W^2) per agent instead of the
    O((N + S) * W^2) of per-cell coordinate compares, and the rows come
    out pre-stacked (no per-cell slicing).

    ``msg``: (N*M, SUB, LANE) message state rows (agent-major: row
    i*M + m is agent i's bit m) when the config has message bits.
    """
    N, S, R, H, W = st.n, st.s, st.r, st.h, st.w
    M = st.m
    ax, ay, ad, carrying, sx, sy, q = acts_state
    r = sensor_range
    side = 2 * r + 1
    w2 = side * side
    n_words = (w2 + 31) // 32

    axs = jnp.stack(ax)  # (N, SUB, LANE)
    ays = jnp.stack(ay)
    ads = jnp.stack(ad)

    shelf_rows_i = jax.lax.broadcasted_iota(jnp.int32, (S, SUB, LANE), 0)
    in_queue = jnp.zeros((S, SUB, LANE), dtype=jnp.bool_)
    for r_i in range(R):
        in_queue |= shelf_rows_i == q[r_i]
    # slot-scan fallback only (string layouts); parametric layouts use
    # _on_rack_arith
    slot_cid = None if st.rack_ch >= 0 else slots_y * W + slots_x

    feats = []
    for i in range(N):
        # ---- per-entity window one-hots ----
        rel_ax = axs - ax[i][None] + r
        rel_ay = ays - ay[i][None] + r
        a_valid = (
            (rel_ax >= 0) & (rel_ax < side) & (rel_ay >= 0) & (rel_ay < side)
        )
        a_oh = _window_onehot(rel_ay * side + rel_ax, a_valid, n_words)
        rel_sx = sx - ax[i][None] + r
        rel_sy = sy - ay[i][None] + r
        s_valid = (
            (rel_sx >= 0) & (rel_sx < side) & (rel_sy >= 0) & (rel_sy < side)
        )
        s_oh = _window_onehot(rel_sy * side + rel_sx, s_valid, n_words)

        # ---- per-cell rows (each a (W2, SUB, LANE) unpack) ----
        a_bits = _window_bits(_bitmap(a_oh), w2)
        d_bits = [
            _window_bits(_bitmap(a_oh, ads == k), w2) for k in range(4)
        ]
        # empty-cell quirk: no agent reads as dir UP -> onehot [1,0,0,0]
        d_bits[0] = d_bits[0] + 1 - a_bits
        # static reshape+index, NOT msg[m::M]: a non-unit-stride slice on a
        # 3D ref lowers to a gather, which Mosaic rejects on hardware
        msg_by_bit = msg.reshape(st.n, M, SUB, LANE) if M else None
        msg_rows = [
            _window_bits(_bitmap(a_oh, msg_by_bit[:, m] != 0), w2)
            for m in range(M)
        ]
        cell_block = jnp.stack(
            [a_bits] + d_bits + msg_rows
            + [
                _window_bits(_bitmap(s_oh), w2),
                _window_bits(_bitmap(s_oh, in_queue), w2),
            ],
            axis=1,
        )  # (W2, bits-per-cell, SUB, LANE) — cell-major flatten below
        cell_rows = cell_block.reshape(-1, SUB, LANE).astype(jnp.bfloat16)

        # ---- self rows ----
        fx = ax[i].astype(jnp.float32)
        fy = ay[i].astype(jnp.float32)
        if normalised:
            fx = fx / (W - 1)
            fy = fy / (H - 1)
        if st.rack_ch >= 0:
            on_rack = _on_rack_arith(st, ax[i], ay[i], H, W)
        else:
            on_rack = jnp.any(
                slot_cid == (ay[i] * W + ax[i])[None], axis=0
            )
        self_rows = jnp.stack(
            [
                fx,
                fy,
                (carrying[i] >= 0).astype(jnp.float32),
                (ad[i] == 0).astype(jnp.float32),
                (ad[i] == 1).astype(jnp.float32),
                (ad[i] == 2).astype(jnp.float32),
                (ad[i] == 3).astype(jnp.float32),
                (~on_rack).astype(jnp.float32),
            ],
            axis=0,
        ).astype(jnp.bfloat16)
        feats.append(jnp.concatenate([self_rows, cell_rows], axis=0))
    return feats


def _rot_window_rel(oy, ox, d, directional, r, side):
    """Window-cell index of an entity at world offset (oy, ox) from the
    agent, with the reference's np.rot90 rotation folded in: the entity
    lands at output cell  UP:(oy+r, ox+r)  DOWN:(r-oy, r-ox)
    LEFT:(ox+r, r-oy)  RIGHT:(r-ox, oy+r)  (the inverse of the sampling
    map in core.observations / rware/warehouse.py:584-595).  Returns
    (rel, valid)."""
    if directional:
        u = jnp.where(
            d == 0, oy + r,
            jnp.where(d == 1, r - oy, jnp.where(d == 2, ox + r, r - ox)),
        )
        v = jnp.where(
            d == 0, ox + r,
            jnp.where(d == 1, r - ox, jnp.where(d == 2, r - oy, oy + r)),
        )
    else:
        u = oy + r
        v = ox + r
    valid = (u >= 0) & (u < side) & (v >= 0) & (v < side)
    return u * side + v, valid


def _build_image_feats(
    st, sensor_range, layers, directional, acts_state, goals,
    slots_x, slots_y, self_feats=False,
):
    """IMAGE observation features per agent, env-tile layout.

    Returns an N-list of (L, SUB, LANE) bfloat16 blocks, rows = the
    flattened (C, w2, w2) layer stack in (channel, row, col) order —
    exactly core.observations.build_image_obs_fn (reference:
    rware/warehouse.py:527-596 with the [y, x] indexing fix).  With
    ``self_feats`` (IMAGE_DICT) 6 extra rows [dir-onehot(4), on_highway,
    carrying] are appended (build_image_dict_features_fn; reference
    :725-742).  Same packed-bitmap scheme as _build_obs_feats; the window
    rotation is folded into each entity's cell index (_rot_window_rel), so
    no materialised window is ever rotated.  Out-of-grid cells are 0 in
    every layer except ACCESSIBLE's in-grid mask (the reference's zero
    pad).
    """
    from rware_tpu.types import ImageLayer

    N, S, R, H, W = st.n, st.s, st.r, st.h, st.w
    r = sensor_range
    side = 2 * r + 1
    w2 = side * side
    n_words = (w2 + 31) // 32
    ax, ay, ad, carrying, sx, sy, q = acts_state

    axs = jnp.stack(ax)
    ays = jnp.stack(ay)
    ads = jnp.stack(ad)
    carry_s = jnp.stack(carrying)

    in_queue = jnp.zeros((S, SUB, LANE), dtype=jnp.bool_)
    for r_i in range(R):
        in_queue |= (
            jax.lax.broadcasted_iota(jnp.int32, (S, SUB, LANE), 0) == q[r_i]
        )
    slot_cid = None if st.rack_ch >= 0 else slots_y * W + slots_x

    need_acc = ImageLayer.ACCESSIBLE in layers
    # per-output-cell world coords for the ACCESSIBLE in-grid mask
    c_iota = jax.lax.broadcasted_iota(jnp.int32, (w2, 1, 1), 0)
    u_i = c_iota // side
    v_i = c_iota % side

    feats = []
    for i in range(N):
        d = ad[i][None]  # (1, SUB, LANE), broadcasts over the entity axis
        a_rel, a_valid = _rot_window_rel(
            ays - ay[i][None], axs - ax[i][None], d, directional, r, side
        )
        a_oh = _window_onehot(a_rel, a_valid, n_words)
        s_rel, s_valid = _rot_window_rel(
            sy - ay[i][None], sx - ax[i][None], d, directional, r, side
        )
        s_oh = _window_onehot(s_rel, s_valid, n_words)

        a_bits = None
        if (
            ImageLayer.AGENTS in layers
            or ImageLayer.AGENT_DIRECTION in layers
            or need_acc
        ):
            a_bits = _window_bits(_bitmap(a_oh), w2)

        if need_acc:
            if directional:
                dy = jnp.where(
                    d == 0, u_i - r,
                    jnp.where(
                        d == 1, r - u_i,
                        jnp.where(d == 2, r - v_i, v_i - r),
                    ),
                )
                dx = jnp.where(
                    d == 0, v_i - r,
                    jnp.where(
                        d == 1, r - v_i,
                        jnp.where(d == 2, u_i - r, r - u_i),
                    ),
                )
            else:
                dy = u_i - r
                dx = v_i - r
            cx = ax[i][None] + dx
            cy = ay[i][None] + dy
            in_grid = (
                (cx >= 0) & (cx < W) & (cy >= 0) & (cy < H)
            ).astype(jnp.int32)

        layer_rows = []
        for layer_type in layers:
            if layer_type == ImageLayer.SHELVES:
                val = _window_bits(_bitmap(s_oh), w2)
            elif layer_type == ImageLayer.REQUESTS:
                val = _window_bits(_bitmap(s_oh, in_queue), w2)
            elif layer_type == ImageLayer.AGENTS:
                val = a_bits
            elif layer_type == ImageLayer.AGENT_DIRECTION:
                # dir + 1 via two bitplanes: 1 + (dir & 1) + 2 * (dir >= 2)
                val = (
                    a_bits
                    + _window_bits(_bitmap(a_oh, (ads & 1) != 0), w2)
                    + 2 * _window_bits(_bitmap(a_oh, ads >= 2), w2)
                )
            elif layer_type == ImageLayer.AGENT_LOAD:
                val = _window_bits(_bitmap(a_oh, carry_s >= 0), w2)
            elif layer_type == ImageLayer.GOALS:
                if goals:
                    g_oy = jnp.stack([gy - ay[i] for _, gy in goals])
                    g_ox = jnp.stack([gx - ax[i] for gx, _ in goals])
                    g_rel, g_valid = _rot_window_rel(
                        g_oy, g_ox, d, directional, r, side
                    )
                    val = _window_bits(
                        _bitmap(_window_onehot(g_rel, g_valid, n_words)), w2
                    )
                else:
                    val = jnp.zeros((w2, SUB, LANE), jnp.int32)
            elif layer_type == ImageLayer.ACCESSIBLE:
                # agents are always in-grid, so a_bits is a subset of the
                # in-grid mask and plain subtraction is exact
                val = in_grid - a_bits
            else:
                raise ValueError(f"unknown layer {layer_type}")
            layer_rows.append(val)

        block = jnp.stack(layer_rows, axis=0).reshape(-1, SUB, LANE)
        rows = block.astype(jnp.bfloat16)
        if self_feats:
            if st.rack_ch >= 0:
                on_rack = _on_rack_arith(st, ax[i], ay[i], H, W)
            else:
                on_rack = jnp.any(
                    slot_cid == (ay[i] * W + ax[i])[None], axis=0
                )
            extra = jnp.stack(
                [
                    (ad[i] == 0).astype(jnp.float32),
                    (ad[i] == 1).astype(jnp.float32),
                    (ad[i] == 2).astype(jnp.float32),
                    (ad[i] == 3).astype(jnp.float32),
                    (~on_rack).astype(jnp.float32),
                    (carrying[i] >= 0).astype(jnp.float32),
                ],
                axis=0,
            ).astype(jnp.bfloat16)
            rows = jnp.concatenate([rows, extra], axis=0)
        feats.append(rows)
    return feats


def _policy_forward(params, feats):
    """Shared-parameter MLP actor-critic on env-tiled features via the MXU.

    ``feats``: the stacked (L, N, SUB, LANE) bf16 feature block (the same
    tensor streamed to the trajectory) — one dot serves all agents of the
    block.  Returns (logits (A, M) f32, value (1, M) f32) with
    M = N*SUB*LANE (agent-major) — the ACTION axis lives on sublanes
    (A rows), which keeps every action-wise op (gumbel, argmax, logsumexp)
    a cheap sublane reduction and avoids 5-lane tiles.

    With a message head (10 params: wm, bm appended) a third return value
    carries the (msg_bits, M) Bernoulli logits (models/networks.py
    ActorCritic(msg_bits > 0)).
    """
    msg_head = None
    if len(params) == 10:
        params, msg_head = params[:8], params[8:]
    w0, b0, w1, b1, wp, bp, wv, bv = params
    L, n = feats.shape[0], feats.shape[1]
    feats = feats.reshape(L, n * SUB * LANE)
    dn = (((0,), (0,)), ((), ()))
    x = jax.lax.dot_general(
        feats, w0, dn, preferred_element_type=jnp.float32
    )  # (M, H1)
    # bf16 tanh matches flax Dense(dtype=bf16) and halves VPU work
    x = jnp.tanh((x + b0).astype(jnp.bfloat16))
    x = jax.lax.dot_general(
        x, w1, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    x = jnp.tanh((x + b1).astype(jnp.bfloat16))
    # heads transposed: contract the hidden axis, leave (A, M)/(1, M)
    logits = (
        jax.lax.dot_general(
            wp, x, (((0,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        + bp.T
    )
    value = (
        jax.lax.dot_general(
            wv, x, (((0,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        + bv.T
    )
    if msg_head is None:
        return logits, value, None
    wm, bm = msg_head
    msg_logits = (
        jax.lax.dot_general(
            wm, x, (((0,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        + bm.T
    )
    return logits, value, msg_logits


def _policy_forward_per_agent(params, feats_list):
    """Per-agent-parameter MLP actor-critic (SEAC-style learners).

    Like _policy_forward but every weight carries a leading agent axis
    (the stacked per-agent param pytree of models.seac.init_seac): agent
    i's features go through agent i's network — N small matmuls of
    M = SUB*LANE instead of one shared matmul.  ``feats_list``: N-list of
    (L, SUB, LANE) bf16 blocks.  Returns (logits (A, M), value (1, M),
    msg_logits (Mb, M) | None) with the same agent-major M ordering as the
    shared path (message head = 10 stacked params, like _policy_forward).
    """
    msg_head = None
    if len(params) == 10:
        params, msg_head = params[:8], params[8:]
    w0, b0, w1, b1, wp, bp, wv, bv = params
    n = len(feats_list)
    dn = (((0,), (0,)), ((), ()))
    logits_parts, value_parts, msg_parts = [], [], []
    for i in range(n):
        L = feats_list[i].shape[0]
        feats = feats_list[i].reshape(L, SUB * LANE)
        x = jax.lax.dot_general(
            w0[i], feats, dn, preferred_element_type=jnp.float32
        )
        x = jnp.tanh((x + b0[i].reshape(-1, 1)).astype(jnp.bfloat16))
        x = jax.lax.dot_general(
            w1[i], x, dn, preferred_element_type=jnp.float32
        )
        x = jnp.tanh((x + b1[i].reshape(-1, 1)).astype(jnp.bfloat16))
        xf = x.astype(jnp.float32)
        logits_parts.append(
            jax.lax.dot_general(
                wp[i].astype(jnp.float32), xf, dn,
                preferred_element_type=jnp.float32,
            )
            + bp[i].reshape(-1, 1)
        )
        value_parts.append(
            jax.lax.dot_general(
                wv[i].astype(jnp.float32), xf, dn,
                preferred_element_type=jnp.float32,
            )
            + bv[i].reshape(-1, 1)
        )
        if msg_head is not None:
            wm, bm = msg_head
            msg_parts.append(
                jax.lax.dot_general(
                    wm[i].astype(jnp.float32), xf, dn,
                    preferred_element_type=jnp.float32,
                )
                + bm[i].reshape(-1, 1)
            )
    return (
        jnp.concatenate(logits_parts, axis=1),
        jnp.concatenate(value_parts, axis=1),
        jnp.concatenate(msg_parts, axis=1) if msg_head is not None else None,
    )


def _gru_forward_per_agent(params, feats_list, h):
    """Per-agent-parameter recurrent actor-critic (recurrent SEAC).

    _gru_forward with every weight carrying a leading agent axis (the
    stacked per-agent pytree of models.seac.init_seac_gru): agent i's
    features and carry slice go through agent i's GRU — N small matmuls
    of M = SUB*LANE columns.  ``feats_list``: N-list of (L, SUB, LANE)
    bf16; ``h``: (Hg, N, SUB, LANE) carry.  Returns (logits (A, M'),
    value (1, M'), msg_logits (Mb, M') | None, new_h (Hg, M')) with
    M' = N*SUB*LANE agent-major — the same contract as _gru_forward.
    """
    msg_head = None
    if len(params) == 18:
        params, msg_head = params[:16], params[16:]
    (we, be, wir, bir, wiz, biz, win, bin_,
     whr, whz, whn, bhn, wp, bp, wv, bv) = params
    n = len(feats_list)
    hg = h.shape[0]
    dn = (((0,), (0,)), ((), ()))
    one = jnp.bfloat16(1.0)
    logits_parts, value_parts, msg_parts, h_parts = [], [], [], []
    for i in range(n):
        L = feats_list[i].shape[0]
        feats = feats_list[i].reshape(L, SUB * LANE)
        hb = h[:, i].reshape(hg, SUB * LANE).astype(jnp.bfloat16)

        def dot(w, x):
            return jax.lax.dot_general(
                w, x, dn, preferred_element_type=jnp.float32
            )

        e = jnp.tanh(
            (dot(we[i], feats) + be[i].reshape(-1, 1)).astype(jnp.bfloat16)
        )
        # sigmoid stays f32 (Mosaic bf16-vector mis-lowering; see
        # _gru_forward)
        r = jax.nn.sigmoid(
            dot(wir[i], e) + dot(whr[i], hb) + bir[i].reshape(-1, 1)
        ).astype(jnp.bfloat16)
        z = jax.nn.sigmoid(
            dot(wiz[i], e) + dot(whz[i], hb) + biz[i].reshape(-1, 1)
        ).astype(jnp.bfloat16)
        nn_ = jnp.tanh(
            (dot(win[i], e) + bin_[i].reshape(-1, 1)).astype(jnp.bfloat16)
            + r * (dot(whn[i], hb) + bhn[i].reshape(-1, 1)).astype(
                jnp.bfloat16
            )
        )
        new_h = (one - z) * nn_ + z * hb  # (Hg, SUB*LANE) bf16
        hf = new_h.astype(jnp.float32)
        logits_parts.append(
            dot(wp[i].astype(jnp.float32), hf) + bp[i].reshape(-1, 1)
        )
        value_parts.append(
            dot(wv[i].astype(jnp.float32), hf) + bv[i].reshape(-1, 1)
        )
        if msg_head is not None:
            wm, bm = msg_head
            msg_parts.append(
                dot(wm[i].astype(jnp.float32), hf) + bm[i].reshape(-1, 1)
            )
        h_parts.append(new_h)
    return (
        jnp.concatenate(logits_parts, axis=1),
        jnp.concatenate(value_parts, axis=1),
        jnp.concatenate(msg_parts, axis=1) if msg_head is not None else None,
        jnp.concatenate(h_parts, axis=1),
    )


def _gru_forward(params, feats, h):
    """Recurrent actor-critic forward on env-tiled features.

    Matches models.networks.RecurrentActorCritic (embed Dense + flax
    GRUCell + f32 heads; bf16 hidden compute): gate layout ir/iz/in with
    bias, hr/hz without, hn with (flax.linen.GRUCell defaults).  ``feats``
    is the stacked (L, N, SUB, LANE) bf16 feature block; ``h`` is the
    (Hg, N*SUB*LANE) carry (feature-major, like the activations);
    returns (logits (A, M), value (1, M), msg_logits (Mb, M) | None,
    new_h (Hg, M)).  A message head (18 params: wm, bm appended) follows
    RecurrentActorCritic(msg_bits > 0).
    """
    msg_head = None
    if len(params) == 18:
        params, msg_head = params[:16], params[16:]
    (we, be, wir, bir, wiz, biz, win, bin_,
     whr, whz, whn, bhn, wp, bp, wv, bv) = params
    L, n = feats.shape[0], feats.shape[1]
    feats = feats.reshape(L, n * SUB * LANE)
    dn = (((0,), (0,)), ((), ()))

    def dot(w, x):
        return jax.lax.dot_general(
            w, x, dn, preferred_element_type=jnp.float32
        )

    e = jnp.tanh((dot(we, feats) + be.T).astype(jnp.bfloat16))  # (E, M)
    hb = h.astype(jnp.bfloat16)
    one = jnp.bfloat16(1.0)
    # sigmoid stays f32: Mosaic mis-lowers its internal f32 constants when
    # applied to bf16 vectors (vector.broadcast verification error)
    r = jax.nn.sigmoid(dot(wir, e) + dot(whr, hb) + bir.T).astype(jnp.bfloat16)
    z = jax.nn.sigmoid(dot(wiz, e) + dot(whz, hb) + biz.T).astype(jnp.bfloat16)
    nn_ = jnp.tanh(
        (dot(win, e) + bin_.T).astype(jnp.bfloat16)
        + r * (dot(whn, hb) + bhn.T).astype(jnp.bfloat16)
    )
    new_h = (one - z) * nn_ + z * hb  # (Hg, M) bf16
    hf = new_h.astype(jnp.float32)
    logits = dot(wp.astype(jnp.float32), hf) + bp.T
    value = dot(wv.astype(jnp.float32), hf) + bv.T
    msg_logits = None
    if msg_head is not None:
        wm, bm = msg_head
        msg_logits = dot(wm.astype(jnp.float32), hf) + bm.T
    return logits, value, msg_logits, new_h


def _sample_gumbel(logits, n, deterministic=False):
    """Gumbel-argmax sample + log-prob from (A, M) logits.

    Returns env-tiled (N, SUB, LANE) action / logp.  ``deterministic``
    (validation mode) takes the plain argmax — no RNG, so the CPU
    interpreter can run the kernel.  Uniforms come from the top 24 bits of
    the PRNG output (sign-safe however uint32 is interpreted downstream).
    """
    a, m = logits.shape
    if deterministic:
        noisy = logits
    else:
        bits = _u32((a, m))
        # Mask to 23 bits: value stays positive under ANY signedness
        # reinterpretation (Mosaic lowers uint32 shifts arithmetically on
        # i32, which made half the uniforms negative -> NaN gumbels)
        u = (bits & np.uint32(0x7FFFFF)).astype(jnp.float32) * (
            1.0 / 8388608.0
        )
        noisy = logits - jnp.log(-jnp.log(u + 1e-10) + 1e-10)
    action = jnp.argmax(noisy, axis=0).astype(jnp.int32)  # (M,)
    mx = jnp.max(logits, axis=0)
    lse = mx + jnp.log(jnp.sum(jnp.exp(logits - mx), axis=0))
    chosen = jnp.sum(
        jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (a, m), 0) == action,
            logits,
            0.0,
        ),
        axis=0,
    )
    logp = chosen - lse
    return (
        action.reshape(n, SUB, LANE),
        logp.reshape(n, SUB, LANE),
    )


def _log_sigmoid(x):
    """Numerically stable log sigmoid(x) = min(x, 0) - log(1 + exp(-|x|))."""
    return jnp.minimum(x, 0.0) - jnp.log(1.0 + jnp.exp(-jnp.abs(x)))


def _sample_bernoulli(msg_logits, n, mb, deterministic=False):
    """Message-bit sample + joint log-prob from (Mb, M) logits
    (M = N*SUB*LANE, agent-major like _sample_gumbel).

    Returns (bits (N*Mb, SUB, LANE) int32 — agent-major rows i*Mb + m, the
    kernel's message-state layout — and logp (N, SUB, LANE) f32 summed
    over each agent's bits).  ``deterministic`` takes the mode (logit > 0),
    keeping validation RNG-free like the argmax move.
    """
    a, m = msg_logits.shape
    if deterministic:
        bit = msg_logits > 0.0
    else:
        u = (_u32((a, m)) & np.uint32(0x7FFFFF)).astype(jnp.float32) * (
            1.0 / 8388608.0
        )
        bit = u < jax.nn.sigmoid(msg_logits)
    bitf = bit.astype(jnp.float32)
    logp = bitf * _log_sigmoid(msg_logits) + (1.0 - bitf) * _log_sigmoid(
        -msg_logits
    )
    bits_n = jnp.swapaxes(
        bit.astype(jnp.int32).reshape(mb, n, SUB, LANE), 0, 1
    ).reshape(n * mb, SUB, LANE)
    logp_n = jnp.sum(logp.reshape(mb, n, SUB, LANE), axis=0)
    return bits_n, logp_n


def _make_collect_kernel(
    st, goals, sensor_range, normalised, tc_len, deterministic=False,
    obs_mode="flattened", image_layers=(), image_directional=True,
    policy="mlp",
):
    """Kernel for grid (env_blocks, T // tc_len): policy + env fused, state
    persisted across time-chunks in VMEM scratch.

    ``policy="gru"`` uses the recurrent actor-critic (_gru_forward); the
    GRU carry rides in a bf16 VMEM scratch across time-chunks and resets to
    zero at episode boundaries, mirroring models.ippo_rnn.

    Message bits (st.m > 0) ride as N*M extra state rows: observations
    read the pre-step message state, the policy's Bernoulli head samples
    fresh bits each step (joint move+bits log-prob, networks.py
    sample_action_msg), and autoreset clears them — the same semantics as
    the XLA engine (reference rware/warehouse.py:809-814).
    """
    N, S, R, M = st.n, st.s, st.r, st.m
    n_policy_params = (16 if policy in ("gru", "gru_per_agent") else 8) + (2 if M else 0)

    def build_rows(acts_state, slots_x, slots_y, msg=None):
        if obs_mode in ("image", "image_dict"):
            return _build_image_feats(
                st, sensor_range, image_layers, image_directional,
                acts_state, goals, slots_x, slots_y,
                self_feats=obs_mode == "image_dict",
            )
        return _build_obs_feats(
            st, sensor_range, normalised, acts_state, slots_x, slots_y,
            msg=msg,
        )

    def kernel(*refs):
        refs = list(refs)
        seed_ref = refs.pop(0)
        param_refs = [refs.pop(0) for _ in range(n_policy_params)]
        (ax_ref, ay_ref, ad_ref, carry_ref, hd_ref) = refs[:5]
        refs = refs[5:]
        msg_ref = refs.pop(0) if M else None
        (sx_ref, sy_ref, q_ref, inact_ref, steps_ref,
         slotx_ref, sloty_ref) = refs[:7]
        refs = refs[7:]
        h0_ref = refs.pop(0) if policy in ("gru", "gru_per_agent") else None
        (obs_out, act_out) = refs[:2]
        refs = refs[2:]
        bits_out = refs.pop(0) if M else None
        (logp_out, val_out, rew_out, done_out,
         oax, oay, oad, ocarry, ohd) = refs[:9]
        refs = refs[9:]
        omsg = refs.pop(0) if M else None
        (osx, osy, oq, oinact, osteps) = refs[:5]
        refs = refs[5:]
        oh = refs.pop(0) if policy in ("gru", "gru_per_agent") else None
        st_scratch = refs.pop(0)
        h_scratch = refs.pop(0) if policy in ("gru", "gru_per_agent") else None

        tc = pl.program_id(1)
        n_tc = pl.num_programs(1)
        if not deterministic:
            pltpu.prng_seed(seed_ref[0] + pl.program_id(0) * n_tc + tc)
        shelf_rows = jax.lax.broadcasted_iota(jnp.int32, (S, SUB, LANE), 0)
        slots_x = slotx_ref[:]
        slots_y = sloty_ref[:]
        params = tuple(r[:] for r in param_refs)

        # state scratch layout (rows): N each of ax, ay, ad, carrying, hd,
        # then N*M msg, S sx, S sy, R q, 1 inact, 1 steps
        offs = {}
        o = 0
        for name, rows in [
            ("ax", N), ("ay", N), ("ad", N), ("carry", N), ("hd", N),
            ("msg", N * M),
            ("sx", S), ("sy", S), ("q", max(R, 1)), ("inact", 1), ("steps", 1),
        ]:
            offs[name] = o
            o += rows

        @pl.when(tc == 0)
        def _():
            st_scratch[offs["ax"] : offs["ax"] + N] = ax_ref[:]
            st_scratch[offs["ay"] : offs["ay"] + N] = ay_ref[:]
            st_scratch[offs["ad"] : offs["ad"] + N] = ad_ref[:]
            st_scratch[offs["carry"] : offs["carry"] + N] = carry_ref[:]
            st_scratch[offs["hd"] : offs["hd"] + N] = hd_ref[:]
            if M:
                st_scratch[offs["msg"] : offs["msg"] + N * M] = msg_ref[:]
            st_scratch[offs["sx"] : offs["sx"] + S] = sx_ref[:]
            st_scratch[offs["sy"] : offs["sy"] + S] = sy_ref[:]
            st_scratch[offs["q"] : offs["q"] + max(R, 1)] = q_ref[:]
            st_scratch[offs["inact"]] = inact_ref[0]
            st_scratch[offs["steps"]] = steps_ref[0]
            if policy in ("gru", "gru_per_agent"):
                h_scratch[:] = h0_ref[:]

        def load(name, rows):
            base = offs[name]
            return [st_scratch[base + i] for i in range(rows)]

        init = (
            load("ax", N), load("ay", N), load("ad", N), load("carry", N),
            load("hd", N),
            st_scratch[offs["msg"] : offs["msg"] + N * M]
            if M
            else jnp.zeros((1, SUB, LANE), jnp.int32),
            st_scratch[offs["sx"] : offs["sx"] + S],
            st_scratch[offs["sy"] : offs["sy"] + S],
            st_scratch[offs["q"] : offs["q"] + max(R, 1)],
            st_scratch[offs["inact"]],
            st_scratch[offs["steps"]],
        )
        if policy in ("gru", "gru_per_agent"):
            hg = h_scratch.shape[0]
            init = init + (h_scratch[:],)

        def one_step(tt, carry):
            if policy in ("gru", "gru_per_agent"):
                (ax, ay, ad, carrying, hd_i, msg, sx, sy, q, inact, steps,
                 h_t) = carry
            else:
                (ax, ay, ad, carrying, hd_i, msg, sx, sy, q, inact,
                 steps) = carry
            hd = [h != 0 for h in hd_i]

            feats_list = build_rows(
                (ax, ay, ad, carrying, sx, sy, q), slots_x, slots_y,
                msg=msg if M else None,
            )
            # (L, N, SUB, LANE) bf16 — feature-major: feeds the policy
            # matmul AND streams to the trajectory without any transpose
            feats = jnp.stack(feats_list, axis=1)
            if policy == "gru":
                logits, value, msg_logits, new_h = _gru_forward(
                    params, feats, h_t.reshape(hg, N * SUB * LANE)
                )
            elif policy == "gru_per_agent":
                logits, value, msg_logits, new_h = _gru_forward_per_agent(
                    params, feats_list, h_t
                )
            elif policy == "mlp_per_agent":
                logits, value, msg_logits = _policy_forward_per_agent(
                    params, feats_list
                )
            else:
                logits, value, msg_logits = _policy_forward(params, feats)
            action_t, logp_t = _sample_gumbel(logits, N, deterministic)
            acts = [action_t[i] for i in range(N)]
            if M:
                new_bits, logp_bits = _sample_bernoulli(
                    msg_logits, N, M, deterministic
                )
                logp_t = logp_t + logp_bits

            # write pre-step trajectory tensors at index tt
            obs_out[pl.ds(tt, 1)] = feats[None]
            act_out[pl.ds(tt, 1)] = action_t[None]
            if M:
                bits_out[pl.ds(tt, 1)] = new_bits[None]
            logp_out[pl.ds(tt, 1)] = logp_t[None]
            val_out[pl.ds(tt, 1)] = value[0].reshape(N, SUB, LANE)[None]

            core_state = (ax, ay, ad, carrying, hd, sx, sy, q, inact, steps)
            new_state, rewards, done = _env_step_core(
                st, goals, shelf_rows, slots_x, slots_y, acts, core_state
            )
            (nax, nay, nad, ncarry, nhd, sx, sy, q, inact, steps) = new_state
            if M:
                # messages set from the sampled bits each step, cleared by
                # autoreset (rware/warehouse.py:809-814)
                msg = jnp.where(done, 0, new_bits)
            rew_out[pl.ds(tt, 1)] = jnp.stack(rewards, axis=0)[None]
            done_out[pl.ds(tt, 1)] = done.astype(jnp.int32)[None, None]
            out = (
                nax, nay, nad, ncarry,
                [h.astype(jnp.int32) for h in nhd],
                msg, sx, sy, q, inact, steps,
            )
            if policy in ("gru", "gru_per_agent"):
                # reset hidden at episode boundaries (ippo_rnn:101-104)
                h_next = jnp.where(
                    done[None, None, :, :],
                    0.0,
                    new_h.reshape(hg, N, SUB, LANE),
                ).astype(jnp.bfloat16)
                out = out + (h_next,)
            return out

        final = jax.lax.fori_loop(0, tc_len, one_step, init, unroll=False)
        if policy in ("gru", "gru_per_agent"):
            (ax, ay, ad, carrying, hd, msg, sx, sy, q, inact, steps,
             h_final) = final
            h_scratch[:] = h_final
        else:
            ax, ay, ad, carrying, hd, msg, sx, sy, q, inact, steps = final

        def store(name, vals):
            base = offs[name]
            for i, v in enumerate(vals):
                st_scratch[base + i] = v

        store("ax", ax)
        store("ay", ay)
        store("ad", ad)
        store("carry", carrying)
        store("hd", hd)
        if M:
            st_scratch[offs["msg"] : offs["msg"] + N * M] = msg
        st_scratch[offs["sx"] : offs["sx"] + S] = sx
        st_scratch[offs["sy"] : offs["sy"] + S] = sy
        st_scratch[offs["q"] : offs["q"] + max(R, 1)] = q
        st_scratch[offs["inact"]] = inact
        st_scratch[offs["steps"]] = steps

        @pl.when(tc == n_tc - 1)
        def _():
            oax[:] = jnp.stack(ax, axis=0)
            oay[:] = jnp.stack(ay, axis=0)
            oad[:] = jnp.stack(ad, axis=0)
            ocarry[:] = jnp.stack(carrying, axis=0)
            ohd[:] = jnp.stack(hd, axis=0)
            if M:
                omsg[:] = msg
            osx[:] = sx
            osy[:] = sy
            oq[:] = q
            oinact[:] = inact[None]
            osteps[:] = steps[None]
            if policy in ("gru", "gru_per_agent"):
                oh[:] = h_scratch[:]

    return kernel


def build_pallas_collect(
    config: WarehouseConfig,
    n_steps: int,
    hidden: Tuple[int, int] = (128, 128),
    tc_len: int = 16,
    interpret: bool = False,
    deterministic: bool = False,
    native_traj: bool = False,
    policy: str = "mlp",
    max_envs_per_call: Optional[int] = None,
):
    """Fused experience collector: obs + policy + sampling + env step in
    one kernel, trajectories streamed to HBM in time-chunks.

    Returns ``collect(state_batch, params, seed) -> (new_state, traj)`` with
    ``traj = dict(obs (T,B,N,L) bf16, action/logp/value/reward (T,B,N),
    done (T,B))``.  ``params`` is an ActorCritic params pytree with hidden
    sizes ``hidden`` (bf16 compute, f32 heads, tanh — models/networks.py).

    Configs with message bits need a message-head params pytree
    (ActorCritic(msg_bits=M)): the kernel samples the Bernoulli bits
    in-kernel, ``logp`` becomes the joint move+bits log-prob, and the
    trajectory gains ``bits`` ((T, B, N, M) int32, or native
    (T, N*M, RB, LANE) agent-major rows i*M + m).

    ``native_traj=True`` returns the trajectory in the kernel-native tiled
    layout instead — obs (T, L, N, RB, LANE) bf16 (feature-major: exactly
    the stacked block the in-kernel policy matmul consumes, so emission is
    a single store), action/logp/value/reward (T, N, RB, LANE), done
    (T, 1, RB, LANE) with RB = B // LANE and env ``e`` at
    ``(e // LANE, e % LANE)`` — skipping the (T, B, N, L) relayout
    entirely; models.ippo_pallas consumes this directly (the L contraction
    in the first update matmul needs no transpose at all).

    ``policy="gru"`` fuses the RecurrentActorCritic (embed + GRU cell +
    heads; ``hidden`` = (embed, gru_hidden)) into the kernel; the signature
    becomes ``collect(state, params, h0, seed) -> (new_state, new_h, traj)``
    with ``h0``/``new_h`` the (B, N, Hg) carry, reset to zero at episode
    boundaries in-kernel (mirroring models.ippo_rnn).
    """
    layout = config.compile_layout()
    H, W = layout.grid_size
    N = config.n_agents
    S = layout.n_shelves
    R = config.request_queue_size
    H1, H2 = hidden
    from rware_tpu.types import ObservationType

    if config.observation_type == ObservationType.IMAGE:
        obs_mode = "image"
    elif config.observation_type == ObservationType.IMAGE_DICT:
        # flattened (C, w2, w2) stack + the 6 self features [dir-onehot,
        # on_highway, carrying] (reference rware/warehouse.py:725-742)
        obs_mode = "image_dict"
    else:
        obs_mode = "flattened"
    L = config.policy_obs_length
    M = config.msg_bits
    if n_steps % tc_len:
        raise ValueError(f"n_steps={n_steps} must be a multiple of {tc_len}")
    st = _Static(
        n=N, s=S, r=R, g=layout.n_goals, h=H, w=W, t=n_steps,
        reward_type=int(config.reward_type),
        max_steps=config.max_steps or 0,
        max_inactivity=config.max_inactivity_steps or 0,
        # deterministic mode reuses the scripted core paths (lowest-index
        # queue replacement, fixed respawn) so the kernel stays RNG-free
        scripted=deterministic,
        m=M,
        rack_ch=_arith_rack_ch(layout),
    )
    goals = tuple((int(x), int(y)) for x, y in layout.goals)
    kernel = _make_collect_kernel(
        st, goals, config.sensor_range, config.normalised_coordinates,
        tc_len, deterministic,
        obs_mode=obs_mode,
        image_layers=tuple(config.image_observation_layers),
        image_directional=config.image_observation_directional,
        policy=policy,
    )
    n_tc = n_steps // tc_len

    state_dims = {
        "ax": N, "ay": N, "ad": N, "carry": N, "hd": N,
        **({"msg": N * M} if M else {}),
        "sx": S, "sy": S, "q": max(R, 1), "inact": 1, "steps": 1,
    }
    scratch_rows = sum(state_dims.values())

    def sblock(rows):
        return pl.BlockSpec(
            (rows, SUB, LANE), lambda i, tc: (0, i, 0), memory_space=pltpu.VMEM
        )

    def pblock(shape):
        return pl.BlockSpec(
            shape, lambda i, tc: tuple(0 for _ in shape), memory_space=pltpu.VMEM
        )

    def hblock():
        return pl.BlockSpec(
            (H2, N, SUB, LANE),
            lambda i, tc: (0, 0, i, 0),
            memory_space=pltpu.VMEM,
        )

    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    if policy == "gru":
        E, Hg = H1, H2
        in_specs += [
            pblock((L, E)), pblock((1, E)),
            pblock((E, Hg)), pblock((1, Hg)),   # ir
            pblock((E, Hg)), pblock((1, Hg)),   # iz
            pblock((E, Hg)), pblock((1, Hg)),   # in
            pblock((Hg, Hg)), pblock((Hg, Hg)), pblock((Hg, Hg)),  # hr/hz/hn
            pblock((1, Hg)),                    # hn bias
            pblock((Hg, 5)), pblock((1, 5)), pblock((Hg, 1)), pblock((1, 1)),
        ]
    elif policy == "gru_per_agent":
        E, Hg = H1, H2
        in_specs += [
            pblock((N, L, E)), pblock((N, E)),
            pblock((N, E, Hg)), pblock((N, Hg)),   # ir
            pblock((N, E, Hg)), pblock((N, Hg)),   # iz
            pblock((N, E, Hg)), pblock((N, Hg)),   # in
            pblock((N, Hg, Hg)), pblock((N, Hg, Hg)),
            pblock((N, Hg, Hg)),                   # hr/hz/hn
            pblock((N, Hg)),                       # hn bias
            pblock((N, Hg, 5)), pblock((N, 5)),
            pblock((N, Hg, 1)), pblock((N, 1)),
        ]
    elif policy == "mlp_per_agent":
        in_specs += [
            pblock((N, L, H1)), pblock((N, H1)),
            pblock((N, H1, H2)), pblock((N, H2)),
            pblock((N, H2, 5)), pblock((N, 5)),
            pblock((N, H2, 1)), pblock((N, 1)),
        ]
    else:
        in_specs += [
            pblock((L, H1)), pblock((1, H1)), pblock((H1, H2)), pblock((1, H2)),
            pblock((H2, 5)), pblock((1, 5)), pblock((H2, 1)), pblock((1, 1)),
        ]
    if M:
        # message head: (hidden, M) kernel + bias, stacked for per-agent
        hh = H2
        if policy in ("mlp_per_agent", "gru_per_agent"):
            in_specs += [pblock((N, hh, M)), pblock((N, M))]
        else:
            in_specs += [pblock((hh, M)), pblock((1, M))]
    in_specs += [sblock(d) for d in state_dims.values()]
    in_specs += [sblock(S), sblock(S)]
    if policy in ("gru", "gru_per_agent"):
        in_specs.append(hblock())

    def tblock(rows):
        return pl.BlockSpec(
            (tc_len, rows, SUB, LANE),
            lambda i, tc: (tc, 0, i, 0),
            memory_space=pltpu.VMEM,
        )

    obs_spec = pl.BlockSpec(
        (tc_len, L, N, SUB, LANE),
        lambda i, tc: (tc, 0, 0, i, 0),
        memory_space=pltpu.VMEM,
    )
    out_specs = [obs_spec, tblock(N)]  # obs, actions
    if M:
        out_specs.append(tblock(N * M))  # message bits
    out_specs += [
        tblock(N),  # logp
        tblock(N),  # value
        tblock(N),  # reward
        tblock(1),  # done
    ]
    out_specs += [sblock(d) for d in state_dims.values()]
    if policy in ("gru", "gru_per_agent"):
        out_specs.append(hblock())

    def out_shape(b):
        rows = b // LANE
        shapes = [
            jax.ShapeDtypeStruct((n_steps, L, N, rows, LANE), jnp.bfloat16),
            jax.ShapeDtypeStruct((n_steps, N, rows, LANE), jnp.int32),
        ]
        if M:
            shapes.append(
                jax.ShapeDtypeStruct((n_steps, N * M, rows, LANE), jnp.int32)
            )
        shapes += [
            jax.ShapeDtypeStruct((n_steps, N, rows, LANE), jnp.float32),
            jax.ShapeDtypeStruct((n_steps, N, rows, LANE), jnp.float32),
            jax.ShapeDtypeStruct((n_steps, N, rows, LANE), jnp.float32),
            jax.ShapeDtypeStruct((n_steps, 1, rows, LANE), jnp.int32),
        ]
        shapes += [
            jax.ShapeDtypeStruct((d, rows, LANE), jnp.int32)
            for d in state_dims.values()
        ]
        if policy in ("gru", "gru_per_agent"):
            shapes.append(
                jax.ShapeDtypeStruct((H2, N, rows, LANE), jnp.bfloat16)
            )
        return shapes

    slots_x = np.asarray(layout.shelf_slots[:, 0])
    slots_y = np.asarray(layout.shelf_slots[:, 1])

    def extract_params(params):
        p = params["params"]
        if policy == "mlp_per_agent":
            # stacked per-agent leaves (leading N axis; models.seac)
            out = [
                p["dense_0"]["kernel"].astype(jnp.bfloat16),
                p["dense_0"]["bias"].astype(jnp.float32),
                p["dense_1"]["kernel"].astype(jnp.bfloat16),
                p["dense_1"]["bias"].astype(jnp.float32),
                p["policy"]["kernel"].astype(jnp.float32),
                p["policy"]["bias"].astype(jnp.float32),
                p["value"]["kernel"].astype(jnp.float32),
                p["value"]["bias"].astype(jnp.float32),
            ]
            if M:
                out += [
                    p["message"]["kernel"].astype(jnp.float32),
                    p["message"]["bias"].astype(jnp.float32),
                ]
            return out
        if policy == "gru_per_agent":
            # stacked per-agent GRU leaves (leading N axis;
            # models.seac.init_seac_gru)
            g = p["gru"]
            out = [
                p["embed"]["kernel"].astype(jnp.bfloat16),
                p["embed"]["bias"].astype(jnp.float32),
                g["ir"]["kernel"].astype(jnp.bfloat16),
                g["ir"]["bias"].astype(jnp.float32),
                g["iz"]["kernel"].astype(jnp.bfloat16),
                g["iz"]["bias"].astype(jnp.float32),
                g["in"]["kernel"].astype(jnp.bfloat16),
                g["in"]["bias"].astype(jnp.float32),
                g["hr"]["kernel"].astype(jnp.bfloat16),
                g["hz"]["kernel"].astype(jnp.bfloat16),
                g["hn"]["kernel"].astype(jnp.bfloat16),
                g["hn"]["bias"].astype(jnp.float32),
                p["policy"]["kernel"].astype(jnp.float32),
                p["policy"]["bias"].astype(jnp.float32),
                p["value"]["kernel"].astype(jnp.float32),
                p["value"]["bias"].astype(jnp.float32),
            ]
            if M:
                out += [
                    p["message"]["kernel"].astype(jnp.float32),
                    p["message"]["bias"].astype(jnp.float32),
                ]
            return out
        if policy == "gru":
            g = p["gru"]
            out = [
                p["embed"]["kernel"].astype(jnp.bfloat16),
                p["embed"]["bias"].astype(jnp.float32)[None, :],
                g["ir"]["kernel"].astype(jnp.bfloat16),
                g["ir"]["bias"].astype(jnp.float32)[None, :],
                g["iz"]["kernel"].astype(jnp.bfloat16),
                g["iz"]["bias"].astype(jnp.float32)[None, :],
                g["in"]["kernel"].astype(jnp.bfloat16),
                g["in"]["bias"].astype(jnp.float32)[None, :],
                g["hr"]["kernel"].astype(jnp.bfloat16),
                g["hz"]["kernel"].astype(jnp.bfloat16),
                g["hn"]["kernel"].astype(jnp.bfloat16),
                g["hn"]["bias"].astype(jnp.float32)[None, :],
                p["policy"]["kernel"].astype(jnp.float32),
                p["policy"]["bias"].astype(jnp.float32)[None, :],
                p["value"]["kernel"].astype(jnp.float32),
                p["value"]["bias"].astype(jnp.float32)[None, :],
            ]
        else:
            out = [
                p["dense_0"]["kernel"].astype(jnp.bfloat16),
                p["dense_0"]["bias"].astype(jnp.float32)[None, :],
                p["dense_1"]["kernel"].astype(jnp.bfloat16),
                p["dense_1"]["bias"].astype(jnp.float32)[None, :],
                p["policy"]["kernel"].astype(jnp.float32),
                p["policy"]["bias"].astype(jnp.float32)[None, :],
                p["value"]["kernel"].astype(jnp.float32),
                p["value"]["bias"].astype(jnp.float32)[None, :],
            ]
        if M:
            out += [
                p["message"]["kernel"].astype(jnp.float32),
                p["message"]["bias"].astype(jnp.float32)[None, :],
            ]
        return out

    def collect(state: WarehouseState, params, seed, h0=None):
        b = state.agent_x.shape[0]
        if b % ENV_BLOCK:
            raise ValueError(f"batch {b} must be a multiple of {ENV_BLOCK}")
        grid = (b // ENV_BLOCK, n_tc)

        def ti(x):
            arr = jnp.swapaxes(x.astype(jnp.int32), 0, 1)
            return arr.reshape(arr.shape[0], b // LANE, LANE)

        def ti1(x):
            return x.astype(jnp.int32).reshape(1, b // LANE, LANE)

        inputs = [jnp.atleast_1d(jnp.asarray(seed, dtype=jnp.int32))]
        inputs += extract_params(params)
        inputs += [
            ti(state.agent_x), ti(state.agent_y), ti(state.agent_dir),
            ti(state.agent_carrying), ti(state.agent_has_delivered),
        ]
        if M:
            inputs.append(ti(state.agent_message.reshape(b, N * M)))
        inputs += [
            ti(state.shelf_x), ti(state.shelf_y),
            ti(state.request_queue) if R else jnp.zeros((1, b // LANE, LANE), jnp.int32),
            ti1(state.cur_inactive_steps), ti1(state.cur_steps),
            jnp.broadcast_to(
                jnp.asarray(slots_x, jnp.int32)[:, None, None],
                (S, b // LANE, LANE),
            ),
            jnp.broadcast_to(
                jnp.asarray(slots_y, jnp.int32)[:, None, None],
                (S, b // LANE, LANE),
            ),
        ]
        if policy in ("gru", "gru_per_agent"):
            if h0 is None:
                raise ValueError("gru collect needs the (B, N, Hg) carry")
            # (B, N, Hg) -> (Hg, N, RB, LANE)
            inputs.append(
                jnp.transpose(h0, (2, 1, 0))
                .reshape(H2, N, b // LANE, LANE)
                .astype(jnp.bfloat16)
            )

        scratch_shapes = [pltpu.VMEM((scratch_rows, SUB, LANE), jnp.int32)]
        if policy in ("gru", "gru_per_agent"):
            scratch_shapes.append(
                pltpu.VMEM((H2, N, SUB, LANE), jnp.bfloat16)
            )
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape(b),
            scratch_shapes=scratch_shapes,
            # the GRU carry scratch + msg rows push past the 16 MB default
            # scoped-VMEM limit (v5e has 128 MB); see ops/pallas_gru
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024
            ),
            interpret=interpret,
        )(*inputs)
        outs = list(outs)
        (obs, act) = outs[:2]
        outs = outs[2:]
        bits = outs.pop(0) if M else None
        (logp, val, rew, done, ax, ay, ad, carry, hd) = outs[:9]
        outs = outs[9:]
        msg = outs.pop(0) if M else None
        (sx, sy, q, inact, steps) = outs[:5]
        outs = outs[5:]
        new_h = outs.pop(0) if policy in ("gru", "gru_per_agent") else None

        def to_state(x):
            return jnp.swapaxes(x.reshape(x.shape[0], b), 0, 1)

        def to_traj(x):
            # (T, N, rows, LANE) -> (T, B, N)
            t = x.shape[0]
            return jnp.moveaxis(x.reshape(t, x.shape[1], b), 1, 2)

        if native_traj:
            traj = {
                "obs": obs,
                "action": act,
                "logp": logp,
                "value": val,
                "reward": rew,
                "done": done,
            }
            if M:
                traj["bits"] = bits  # (T, N*M, RB, LANE), rows i*M + m
        else:
            traj = {
                # (T, L, N, rows, LANE) -> (T, B, N, L)
                "obs": jnp.transpose(
                    obs.reshape(n_steps, L, N, b), (0, 3, 2, 1)
                ),
                "action": to_traj(act),
                "logp": to_traj(logp),
                "value": to_traj(val),
                "reward": to_traj(rew),
                "done": done.reshape(n_steps, b),
            }
            if M:
                # (T, N*M, rows, LANE) -> (T, B, N, M)
                traj["bits"] = jnp.moveaxis(
                    bits.reshape(n_steps, N, M, b), 3, 1
                )
        new_state = state.replace(
            agent_x=to_state(ax), agent_y=to_state(ay), agent_dir=to_state(ad),
            agent_carrying=to_state(carry),
            agent_has_delivered=to_state(hd).astype(bool),
            shelf_x=to_state(sx), shelf_y=to_state(sy),
            request_queue=to_state(q) if R else state.request_queue,
            cur_inactive_steps=inact.reshape(b),
            cur_steps=steps.reshape(b),
            **(
                {
                    "agent_message": to_state(msg)
                    .reshape(b, N, M)
                    .astype(jnp.float32)
                }
                if M
                else {}
            ),
        )
        if policy in ("gru", "gru_per_agent"):
            # (Hg, N, RB, LANE) -> (B, N, Hg)
            h_out = jnp.transpose(new_h.reshape(H2, N, b), (2, 1, 0))
            return new_state, h_out, traj
        return new_state, traj

    # Large-grid batch chunking, mirroring build_pallas_rollout: above the
    # cap the SAME known-good program runs over batch chunks via lax.map
    # (one compile); the per-chunk seed offset keeps each env block's PRNG
    # stream identical to the unchunked program (the kernel seeds with
    # seed + program_id * n_tc + tc).
    if max_envs_per_call is None and H * W >= 400:
        max_envs_per_call = ENV_BLOCK
    cap = max_envs_per_call

    def collect_chunked(state: WarehouseState, params, seed, h0=None):
        b = state.agent_x.shape[0]
        if cap is None or b <= cap or b % cap:
            return collect(state, params, seed, h0=h0)
        n_chunks = b // cap

        def split(x):
            return x.reshape((n_chunks, cap) + x.shape[1:])

        st_c = jax.tree.map(split, state)
        seeds = (
            jnp.asarray(seed, jnp.int32)
            + jnp.arange(n_chunks, dtype=jnp.int32) * (cap // ENV_BLOCK)
            * n_tc
        )

        def join_state(x):
            return x.reshape((b,) + x.shape[2:])

        def join_traj(x):
            if native_traj:
                # (C, T, ..., RBc, LANE): merge the chunk axis into RB
                # (global rb = chunk * RBc + local rb, so C rides major)
                y = jnp.moveaxis(x, 0, -3)
                return y.reshape(y.shape[:-3] + (b // LANE, LANE))
            # friendly layout: env axis is axis 1 of every leaf
            y = jnp.moveaxis(x, 0, 1)
            return y.reshape((y.shape[0], b) + y.shape[3:])

        if policy in ("gru", "gru_per_agent"):
            if h0 is None:
                raise ValueError("gru collect needs the (B, N, Hg) carry")
            ns, nh, traj = jax.lax.map(
                lambda a: collect(a[0], params, a[1], h0=a[2]),
                (st_c, seeds, split(h0)),
            )
            return (
                jax.tree.map(join_state, ns),
                join_state(nh),
                jax.tree.map(join_traj, traj),
            )
        ns, traj = jax.lax.map(
            lambda a: collect(a[0], params, a[1]), (st_c, seeds)
        )
        return jax.tree.map(join_state, ns), jax.tree.map(join_traj, traj)

    return collect_chunked
