"""Fused PPO minibatch gradient kernel: MLP forward + hand-derived backward
in one Pallas program, activations resident in VMEM.

Why: the XLA update on the native-layout trajectory is activation-bandwidth
bound — every hidden activation (samples x 128) round-trips HBM between the
forward, backward and weight-gradient passes, ~2.1 ms per minibatch at
B=4096/T=128 (tools/native_bisect.py).  Here each grid cell loads one
(t, agent) slab of observations, runs the whole clipped-PPO
forward+backward on the MXU with every intermediate in VMEM, and
accumulates weight gradients into VMEM-resident output blocks — HBM traffic
is the observation read plus ~100 KB of gradients, the hardware floor.

Scope: the shared-parameter ActorCritic MLP (models/networks.py) on the
kernel-native trajectory layout produced by ops/pallas_rollout
.build_pallas_collect(native_traj=True).  The loss matches
models.ippo_pallas.ppo_loss_native (clipped surrogate + clipped value loss
+ entropy bonus); equivalence is tested against jax.grad of that loss in
interpret mode (tests/test_pallas_update.py).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rware_tpu.ops.pallas_rollout import LANE

_METRICS = ("pg_sum", "v_sum", "ent_sum", "kl_sum")


def _pick_fold_rb_chunk(mb_rows: int, n_fold: int, cap: int = 64) -> int:
    """Env-row chunk for kernels that FOLD the agent axis into each grid
    cell (blocks shaped (..., N, rb_chunk, LANE)).

    Mosaic requires a block's last two dims be divisible by (8, 128) or
    equal to the array dims, so rb_chunk must be a multiple of 8 (or the
    whole mb_rows).  Among legal divisors of ``mb_rows``, prefer the
    largest with n_fold * rb_chunk <= cap (the activation-VMEM sweet
    spot; default cap=64, n_fold=1 callers pass cap=32); fall back to
    the smallest with n_fold * rb_chunk <= 2 * cap (bigger fold, up to
    2x the VMEM pressure).  The fallback is the designed path for the
    12/16-agent configs; for n_fold=1 callers it only triggers on
    awkward non-power-of-two minibatch sizes and contradicts their
    "M <= 4096" VMEM budget, so THAT case warns at trace time instead
    of silently doubling pressure.  Raises ValueError when no legal
    chunk exists (callers fall back to per-agent-grid kernels, which
    never fold)."""
    legal = [
        rb for rb in range(1, mb_rows + 1)
        if mb_rows % rb == 0 and (rb % 8 == 0 or rb == mb_rows)
    ]
    small = [rb for rb in legal if n_fold * rb <= cap]
    if small:
        return max(small)
    big = [rb for rb in legal if n_fold * rb <= 2 * cap]
    if big:
        if n_fold == 1:
            import warnings

            warnings.warn(
                f"env-row chunk for mb_rows={mb_rows} exceeds the VMEM "
                f"sweet spot (rb_chunk = {min(big)} > cap {cap}, so "
                f"M = {min(big)} * 128): the kernel's live activations "
                "grow up to 2x over the documented <= 4096 budget; "
                "prefer power-of-two env batches / minibatch counts",
                stacklevel=2,
            )
        return min(big)
    raise ValueError(
        f"no Mosaic-legal env-row chunk for mb_rows={mb_rows}, "
        f"n_fold={n_fold} (agent-folded kernels need rb_chunk % 8 == 0 "
        f"or rb_chunk == mb_rows, and n_fold * rb_chunk <= 128)"
    )


@dataclasses.dataclass(frozen=True)
class _UpdStatic:
    l: int  # obs length
    h1: int
    h2: int
    a: int  # n_actions
    t: int
    n: int  # agents
    mb_rows: int  # env rows per minibatch
    rb_chunk: int  # env rows per grid cell (M = rb_chunk * LANE <= ~4k
    # for power-of-two batches, keeping the ~6 live (H, M) f32
    # activations under the 16MB VMEM cap; _pick_fold_rb_chunk's warned
    # fallback can reach ~8k for awkward mb_rows divisors)
    clip_eps: float
    vf_coef: float
    ent_coef: float
    # perf-bisect: 0=full, 1=no wgrad matmuls, 2=forward+loss only
    debug_level: int = 0
    # message bits: Bernoulli head, joint move+bits log-prob (the policy
    # the msg collect kernel samples from — ops/pallas_rollout)
    m: int = 0


def _make_update_kernel(st: _UpdStatic):
    L, H1, H2, A, MB = st.l, st.h1, st.h2, st.a, st.m
    M = st.rb_chunk * LANE
    inv_n = 1.0 / (st.t * st.n * st.mb_rows * LANE)
    eps = st.clip_eps

    AC = A + 1 + MB  # concatenated head width: [policy | value | message]

    def kernel(*refs):
        refs = list(refs)
        stats_ref = refs.pop(0)
        (obs_ref, act_ref, logp_ref, oldv_ref, adv_ref, tgt_ref) = refs[:6]
        refs = refs[6:]
        bits_ref = refs.pop(0) if MB else None
        (w0_ref, b0_ref, w1_ref, b1_ref, wc_ref, bc_ref) = refs[:6]
        refs = refs[6:]
        (dw0, db0, dw1, db1, dwc, dbc) = refs[:6]
        refs = refs[6:]
        mets = refs.pop(0)

        t = pl.program_id(0)
        n = pl.program_id(1)
        first = (t == 0) & (n == 0) & (pl.program_id(2) == 0)

        @pl.when(first)
        def _():
            dw0[:] = jnp.zeros_like(dw0)
            db0[:] = jnp.zeros_like(db0)
            dw1[:] = jnp.zeros_like(dw1)
            db1[:] = jnp.zeros_like(db1)
            dwc[:] = jnp.zeros_like(dwc)
            dbc[:] = jnp.zeros_like(dbc)
            # SMEM accepts only scalar stores on hardware
            for k in range(len(_METRICS)):
                mets[k] = 0.0

        adv_mean = stats_ref[0]
        adv_inv_std = stats_ref[1]

        # ---- forward (feature-major: activations are (features, M)) ----
        x = obs_ref[0, :, 0].reshape(L, M)  # bf16
        dn00 = (((0,), (0,)), ((), ()))
        z1 = jax.lax.dot_general(
            w0_ref[:], x, dn00, preferred_element_type=jnp.float32
        )  # (H1, M)
        # hidden elementwise in bf16: halves VPU work and matches flax
        # (Dense(dtype=bf16) emits bf16 pre-activations)
        h1b = jnp.tanh((z1 + b0_ref[:].T).astype(jnp.bfloat16))
        z2 = jax.lax.dot_general(
            w1_ref[:], h1b, dn00, preferred_element_type=jnp.float32
        )  # (H2, M)
        h2b = jnp.tanh((z2 + b1_ref[:].T).astype(jnp.bfloat16))
        h2f = h2b.astype(jnp.float32)
        # ONE head dot on the concatenated (H2, A+1+MB) weight block: the
        # lane-padded MXU passes cost the same at width 5 or 8, so the
        # separate policy/value/message dots each paid full price
        hcat = (
            jax.lax.dot_general(
                wc_ref[:], h2f, dn00, preferred_element_type=jnp.float32
            )
            + bc_ref[:].T
        )  # (AC, M)
        logits = hcat[:A]  # (A, M)
        value = hcat[A:A + 1]  # (1, M)

        # ---- loss pieces ----
        action = act_ref[0, 0].reshape(1, M)
        old_logp = logp_ref[0, 0].reshape(1, M)
        old_value = oldv_ref[0, 0].reshape(1, M)
        adv = adv_ref[0, 0].reshape(1, M)
        target = tgt_ref[0, 0].reshape(1, M)

        mx = jnp.max(logits, axis=0, keepdims=True)
        sm = jnp.exp(logits - mx)
        z = jnp.sum(sm, axis=0, keepdims=True)
        lsm = logits - mx - jnp.log(z)
        p = sm / z
        onehot = (
            jax.lax.broadcasted_iota(jnp.int32, (A, M), 0) == action
        )
        logp = jnp.sum(jnp.where(onehot, lsm, 0.0), axis=0, keepdims=True)

        if MB:
            msg_logits = hcat[A + 1:]  # (MB, M)
            bitf = bits_ref[0].reshape(MB, M).astype(jnp.float32)
            # stable log sigmoid(+/-l) share one log1p(exp(-|l|)) term
            log1pe = jnp.log(1.0 + jnp.exp(-jnp.abs(msg_logits)))
            ls_p = jnp.minimum(msg_logits, 0.0) - log1pe
            ls_n = jnp.minimum(-msg_logits, 0.0) - log1pe
            logp = logp + jnp.sum(
                bitf * ls_p + (1.0 - bitf) * ls_n, axis=0, keepdims=True
            )

        ratio = jnp.exp(logp - old_logp)
        advn = (adv - adv_mean) * adv_inv_std
        ratio_c = jnp.clip(ratio, 1.0 - eps, 1.0 + eps)
        pg1 = ratio * advn
        pg2 = ratio_c * advn
        obj = jnp.minimum(pg1, pg2)
        use1 = pg1 <= pg2
        inside = ((ratio > 1.0 - eps) & (ratio < 1.0 + eps)).astype(
            jnp.float32
        )
        dobj_dratio = jnp.where(use1, advn, advn * inside)
        dlogp = -inv_n * dobj_dratio * ratio  # (1, M)

        ent = -jnp.sum(p * lsm, axis=0, keepdims=True)  # (1, M)
        dlogits = dlogp * (onehot.astype(jnp.float32) - p) + (
            st.ent_coef * inv_n
        ) * p * (lsm + ent)
        if MB:
            sig = jax.nn.sigmoid(msg_logits)
            ent_msg = -jnp.sum(
                sig * ls_p + (1.0 - sig) * ls_n, axis=0, keepdims=True
            )
            ent = ent + ent_msg  # joint entropy (metrics)
            # d(pg)/dl = dlogp * (bit - sigma); d(-ent_coef*H)/dl =
            # ent_coef * l * sigma * (1 - sigma)
            dmsg = dlogp * (bitf - sig) + (
                st.ent_coef * inv_n
            ) * msg_logits * sig * (1.0 - sig)

        vdiff = value - old_value
        v_clip = old_value + jnp.clip(vdiff, -eps, eps)
        e1 = value - target
        e2 = v_clip - target
        use_e1 = (e1 * e1) >= (e2 * e2)
        inside_v = ((vdiff > -eps) & (vdiff < eps)).astype(jnp.float32)
        dvalue = (st.vf_coef * inv_n) * jnp.where(
            use_e1, e1, e2 * inside_v
        )

        # ---- backward through the MLP ----
        dn10 = (((1,), (0,)), ((), ()))  # contract lhs dim1 with rhs dim0
        dn11 = (((1,), (1,)), ((), ()))  # contract the M axes
        if st.debug_level < 2:
            # fused head cotangent [dlogits | dvalue | dmsg]: one dgrad
            # dot and one wgrad dot instead of one per head
            dcat_rows = [dlogits, dvalue]
            if MB:
                dcat_rows.append(dmsg)
            dcat = jnp.concatenate(dcat_rows, axis=0)  # (AC, M)
            dh2 = jax.lax.dot_general(
                wc_ref[:], dcat, dn10, preferred_element_type=jnp.float32
            )  # (H2, M)
            one = jnp.bfloat16(1.0)
            dz2b = dh2.astype(jnp.bfloat16) * (one - h2b * h2b)
            dh1 = jax.lax.dot_general(
                w1_ref[:], dz2b, dn10, preferred_element_type=jnp.float32
            )  # (H1, M)
            dz1b = dh1.astype(jnp.bfloat16) * (one - h1b * h1b)
        if st.debug_level < 1:
            dw0[:] += jax.lax.dot_general(
                x, dz1b, dn11, preferred_element_type=jnp.float32
            )  # (L, H1)
            db0[:] += jnp.sum(
                dz1b.astype(jnp.float32), axis=1, keepdims=True
            ).T  # (1, H1)
            dw1[:] += jax.lax.dot_general(
                h1b, dz2b, dn11, preferred_element_type=jnp.float32
            )  # (H1, H2)
            db1[:] += jnp.sum(
                dz2b.astype(jnp.float32), axis=1, keepdims=True
            ).T
            dwc[:] += jax.lax.dot_general(
                h2f, dcat, dn11, preferred_element_type=jnp.float32
            )  # (H2, AC)
            dbc[:] += jnp.sum(dcat, axis=1, keepdims=True).T
        elif st.debug_level == 1:
            # dgrads computed but wgrad matmuls skipped; keep the dgrad
            # chain alive through the bias-grad sums
            db0[:] += jnp.sum(
                dz1b.astype(jnp.float32), axis=1, keepdims=True
            ).T
            db1[:] += jnp.sum(
                dz2b.astype(jnp.float32), axis=1, keepdims=True
            ).T
            dbc[:] += jnp.sum(dcat, axis=1, keepdims=True).T

        # ---- metric partial sums ----
        mets[0] += jnp.sum(obj)
        mets[1] += jnp.sum(
            0.5 * jnp.maximum(e1 * e1, e2 * e2)
        )
        mets[2] += jnp.sum(ent)
        mets[3] += jnp.sum((ratio - 1.0) - (logp - old_logp))

    return kernel


def build_fused_ppo_grads(
    obs_len: int,
    hidden: Tuple[int, int],
    n_actions: int,
    rollout_len: int,
    n_agents: int,
    mb_rows: int,
    clip_eps: float,
    vf_coef: float,
    ent_coef: float,
    interpret: bool = False,
    debug_level: int = 0,
    msg_bits: int = 0,
    dataset_len: int = 0,
    _unsafe_bisect: bool = False,
):
    """Returns ``grads(params, batch) -> (grads_pytree, metrics_dict)``.

    ``batch`` is a native-layout minibatch tuple (obs (T, L, N, mb_rows,
    LANE) bf16, action/old_logp/old_value/adv/target (T, N, mb_rows, LANE),
    plus bits (T, N*msg_bits, mb_rows, LANE) int32 for message configs —
    the log-prob/entropy/gradients then cover the joint move+Bernoulli
    policy of the msg collect kernel); ``params`` the flax ActorCritic
    params pytree.  Gradients are exact for the clipped-PPO loss of
    models.ippo_pallas.ppo_loss_native (bf16 hidden matmuls, f32
    accumulation/heads) and returned as an f32 pytree matching ``params``;
    metrics are the standard PPO diagnostics.

    ``dataset_len=T_full`` switches to zero-copy minibatching: ``batch``
    tensors keep the FULL trajectory time extent and the returned function
    becomes ``grads(params, batch, start)`` where ``start`` is the traced
    first time row of the minibatch window.  The per-epoch random rotation
    + contiguous slice of models.ippo_pallas.ppo_update_epochs_native is
    then realised by the kernel's index map reading rows
    ``(start + t) % T_full`` straight from the trajectory buffer — no
    jnp.roll of the dataset, no dynamic-slice copy per minibatch (the two
    dominated the update phase's HBM traffic; tools/native_bisect.py).
    """
    if debug_level != 0 and not _unsafe_bisect:
        # level >= 1 drops weight-gradient matmuls, >= 2 the whole backward
        # — perf-bisect scaffolding that must never reach production
        raise ValueError(
            "debug_level != 0 drops gradient terms (perf-bisect only); "
            "pass _unsafe_bisect=True if you really want a partial kernel"
        )
    L, (H1, H2), A = obs_len, hidden, n_actions
    T, N = rollout_len, n_agents
    MB = msg_bits
    T_full = dataset_len or T
    # chunk the env-rows axis so M = rb_chunk*LANE stays <= 4096 (VMEM
    # cap) for power-of-two batches, Mosaic-legally (rb_chunk % 8 == 0
    # or == mb_rows); awkward divisors take the helper's warned <= 8192
    # fallback rather than failing
    rb_chunk = _pick_fold_rb_chunk(mb_rows, 1, cap=32)
    st = _UpdStatic(
        l=L, h1=H1, h2=H2, a=A, t=T, n=N, mb_rows=mb_rows,
        rb_chunk=rb_chunk,
        clip_eps=clip_eps, vf_coef=vf_coef, ent_coef=ent_coef,
        debug_level=debug_level, m=MB,
    )
    kernel = _make_update_kernel(st)
    n_total = T * N * mb_rows * LANE
    inv_n = 1.0 / n_total

    grid = (T, N, mb_rows // rb_chunk)

    if dataset_len:
        # scalar-prefetch minibatching: sel[0] = first time row; the block
        # index map wraps (start + t) around the full trajectory extent
        def trow(t, sel):
            return (sel[0] + t) % T_full

        obs_map = lambda t, n, c, sel: (trow(t, sel), 0, n, c, 0)
        vec_map = lambda t, n, c, sel: (trow(t, sel), n, c, 0)

        def cmap(shape):
            return lambda t, n, c, sel: tuple(0 for _ in shape)

        met_map = lambda t, n, c, sel: (0,)
    else:
        obs_map = lambda t, n, c: (t, 0, n, c, 0)
        vec_map = lambda t, n, c: (t, n, c, 0)

        def cmap(shape):
            return lambda t, n, c: tuple(0 for _ in shape)

        met_map = lambda t, n, c: (0,)

    def cblock(shape):
        return pl.BlockSpec(shape, cmap(shape), memory_space=pltpu.VMEM)

    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]  # adv stats (2,)
    in_specs += [
        pl.BlockSpec(
            (1, L, 1, rb_chunk, LANE), obs_map, memory_space=pltpu.VMEM
        )
    ]
    in_specs += [
        pl.BlockSpec(
            (1, 1, rb_chunk, LANE), vec_map, memory_space=pltpu.VMEM
        )
        for _ in range(5)
    ]
    if MB:
        in_specs.append(
            pl.BlockSpec(
                (1, MB, rb_chunk, LANE), vec_map, memory_space=pltpu.VMEM
            )
        )
    AC = A + 1 + MB
    in_specs += [
        cblock((L, H1)), cblock((1, H1)), cblock((H1, H2)), cblock((1, H2)),
        cblock((H2, AC)), cblock((1, AC)),
    ]

    out_specs = [
        cblock((L, H1)), cblock((1, H1)), cblock((H1, H2)), cblock((1, H2)),
        cblock((H2, AC)), cblock((1, AC)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((L, H1), jnp.float32),
        jax.ShapeDtypeStruct((1, H1), jnp.float32),
        jax.ShapeDtypeStruct((H1, H2), jnp.float32),
        jax.ShapeDtypeStruct((1, H2), jnp.float32),
        jax.ShapeDtypeStruct((H2, AC), jnp.float32),
        jax.ShapeDtypeStruct((1, AC), jnp.float32),
    ]
    out_specs.append(
        pl.BlockSpec((len(_METRICS),), met_map, memory_space=pltpu.SMEM)
    )
    out_shape.append(jax.ShapeDtypeStruct((len(_METRICS),), jnp.float32))

    base_kernel = kernel
    if dataset_len:
        def kernel(sel_ref, *refs):  # noqa: F811 — scalar-prefetch wrapper
            del sel_ref  # consumed by the index maps only
            base_kernel(*refs)

        call = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid,
                in_specs=in_specs,
                out_specs=out_specs,
            ),
            out_shape=out_shape,
            interpret=interpret,
        )
    else:
        call = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )

    def grads(params, batch, start=None):
        if MB:
            obs, action, old_logp, old_value, adv, target, bits = batch
        else:
            obs, action, old_logp, old_value, adv, target = batch
        p = params["params"]
        if dataset_len:
            # stats over the wrapped minibatch window only (adv is the
            # full-trajectory tensor in this mode; it is small — the big
            # obs tensor never moves)
            adv_mb = jax.lax.dynamic_slice_in_dim(
                jnp.roll(adv, -start, axis=0), 0, T, 0
            )
        else:
            adv_mb = adv
        adv_mean = adv_mb.mean()
        adv_inv_std = 1.0 / (adv_mb.std() + 1e-8)
        stats = jnp.stack([adv_mean, adv_inv_std]).astype(jnp.float32)
        inputs = [
            stats,
            obs.astype(jnp.bfloat16),
            action.astype(jnp.int32),
            old_logp.astype(jnp.float32),
            old_value.astype(jnp.float32),
            adv.astype(jnp.float32),
            target.astype(jnp.float32),
        ]
        if MB:
            inputs.append(bits.astype(jnp.int32))
        head_ws = [p["policy"]["kernel"], p["value"]["kernel"]]
        head_bs = [p["policy"]["bias"], p["value"]["bias"]]
        if MB:
            head_ws.append(p["message"]["kernel"])
            head_bs.append(p["message"]["bias"])
        inputs += [
            p["dense_0"]["kernel"].astype(jnp.bfloat16),
            p["dense_0"]["bias"].astype(jnp.float32)[None, :],
            p["dense_1"]["kernel"].astype(jnp.bfloat16),
            p["dense_1"]["bias"].astype(jnp.float32)[None, :],
            jnp.concatenate(head_ws, axis=1).astype(jnp.float32),
            jnp.concatenate(head_bs, axis=0).astype(jnp.float32)[None, :],
        ]
        if dataset_len:
            sel = jnp.asarray([start], dtype=jnp.int32)
            outs = list(call(sel, *inputs))
        else:
            outs = list(call(*inputs))
        (gw0, gb0, gw1, gb1, gwc, gbc) = outs[:6]
        mets = outs[6]
        grads_tree = {
            "params": {
                "dense_0": {"kernel": gw0, "bias": gb0[0]},
                "dense_1": {"kernel": gw1, "bias": gb1[0]},
                "policy": {"kernel": gwc[:, :A], "bias": gbc[0, :A]},
                "value": {
                    "kernel": gwc[:, A:A + 1],
                    "bias": gbc[0, A:A + 1],
                },
                **(
                    {
                        "message": {
                            "kernel": gwc[:, A + 1:],
                            "bias": gbc[0, A + 1:],
                        }
                    }
                    if MB
                    else {}
                ),
            }
        }
        metrics = {
            "pg_loss": -mets[0] * inv_n,
            "v_loss": mets[1] * inv_n,
            "entropy": mets[2] * inv_n,
            "approx_kl": mets[3] * inv_n,
        }
        return grads_tree, metrics

    grads.dataset_len = dataset_len
    return grads


# ---------------------------------------------------------------------------
# SEAC-PPO: per-agent parameters, shared-experience cross terms.
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class _SeacStatic:
    l: int
    h1: int
    h2: int
    a: int
    t: int
    n: int
    mb_rows: int
    rb_chunk: int
    tb: int
    clip_eps: float
    vf_coef: float
    ent_coef: float
    seac_lambda: float


def _make_seac_update_kernel(st: _SeacStatic):
    L, H1, H2, A = st.l, st.h1, st.h2, st.a
    N, TB = st.n, st.tb
    M = N * st.rb_chunk * LANE  # the N_j sharing axis rides in-cell
    # pg/v: sum over j, mean over (samples, i)  ->  1 / (samples * N_i)
    inv_n = 1.0 / (st.t * st.mb_rows * LANE * st.n)
    eps = st.clip_eps

    def kernel(
        stats_ref,
        obs_ref, act_ref, blogp_ref, oldv_ref, adv_ref, tgt_ref,
        w0_ref, b0_ref, w1_ref, b1_ref, wc_ref, bc_ref,
        dw0, db0, dw1, db1, dwc, dbc, mets,
    ):
        t = pl.program_id(0)
        i = pl.program_id(1)
        c = pl.program_id(2)
        first = (t == 0) & (c == 0)

        @pl.when(first)
        def _():
            # zero agent i's gradient blocks on first visit
            dw0[:] = jnp.zeros_like(dw0)
            db0[:] = jnp.zeros_like(db0)
            dw1[:] = jnp.zeros_like(dw1)
            db1[:] = jnp.zeros_like(db1)
            dwc[:] = jnp.zeros_like(dwc)
            dbc[:] = jnp.zeros_like(dbc)

        @pl.when(first & (i == 0))
        def _():
            for k in range(len(_METRICS)):
                mets[k] = 0.0

        adv_mean = stats_ref[0]
        adv_inv_std = stats_ref[1]
        # per-COLUMN pair weights: column blocks are j-major, so
        # col // (rb_chunk*LANE) is the j whose slab that column holds
        j_col = jax.lax.broadcasted_iota(jnp.int32, (1, M), 1) // (
            st.rb_chunk * LANE
        )
        diag = (j_col == i).astype(jnp.float32)  # (1, M)
        # w_ij = 1 on the diagonal, seac_lambda off it
        w_pair = diag + st.seac_lambda * (1.0 - diag)

        for lt in range(TB):
            _seac_cell(lt, obs_ref, act_ref, blogp_ref, oldv_ref, adv_ref,
                       tgt_ref, adv_mean, adv_inv_std, diag, w_pair,
                       w0_ref, b0_ref, w1_ref, b1_ref, wc_ref, bc_ref,
                       dw0, db0, dw1, db1, dwc, dbc, mets)

    def _seac_cell(lt, obs_ref, act_ref, blogp_ref, oldv_ref, adv_ref,
                   tgt_ref, adv_mean, adv_inv_std, diag, w_pair,
                   w0_ref, b0_ref, w1_ref, b1_ref, wc_ref, bc_ref,
                   dw0, db0, dw1, db1, dwc, dbc, mets):
        # ---- forward: agent i's MLP on EVERY agent's observation slab ----
        x = obs_ref[lt].reshape(L, M)  # bf16
        dn00 = (((0,), (0,)), ((), ()))
        z1 = jax.lax.dot_general(
            w0_ref[0], x, dn00, preferred_element_type=jnp.float32
        )
        h1b = jnp.tanh((z1 + b0_ref[0].reshape(-1, 1)).astype(jnp.bfloat16))
        z2 = jax.lax.dot_general(
            w1_ref[0], h1b, dn00, preferred_element_type=jnp.float32
        )
        h2b = jnp.tanh((z2 + b1_ref[0].reshape(-1, 1)).astype(jnp.bfloat16))
        h2f = h2b.astype(jnp.float32)
        # fused [policy | value] head dot (lane padding makes separate
        # width-A / width-1 dots cost full MXU passes each)
        hcat = (
            jax.lax.dot_general(
                wc_ref[0], h2f, dn00, preferred_element_type=jnp.float32
            )
            + bc_ref[0].reshape(-1, 1)
        )  # (A+1, M)
        logits = hcat[:A]  # (A, M)
        value = hcat[A:A + 1]  # (1, M)

        # ---- SEAC-PPO loss pieces ----
        action = act_ref[lt].reshape(1, M)
        behav_logp = blogp_ref[lt].reshape(1, M)
        old_value = oldv_ref[lt, 0].reshape(1, M)
        adv = adv_ref[lt, 0].reshape(1, M)
        target = tgt_ref[lt, 0].reshape(1, M)

        mx = jnp.max(logits, axis=0, keepdims=True)
        sm = jnp.exp(logits - mx)
        z = jnp.sum(sm, axis=0, keepdims=True)
        lsm = logits - mx - jnp.log(z)
        p = sm / z
        onehot = jax.lax.broadcasted_iota(jnp.int32, (A, M), 0) == action
        logp = jnp.sum(jnp.where(onehot, lsm, 0.0), axis=0, keepdims=True)

        # ratio of agent i's policy to the BEHAVIOUR policy (agent j's old
        # policy): the SEAC importance weight on a PPO trust region
        ratio = jnp.exp(logp - behav_logp)
        advn = (adv - adv_mean) * adv_inv_std
        ratio_c = jnp.clip(ratio, 1.0 - eps, 1.0 + eps)
        pg1 = ratio * advn
        pg2 = ratio_c * advn
        obj = jnp.minimum(pg1, pg2)
        use1 = pg1 <= pg2
        inside = ((ratio > 1.0 - eps) & (ratio < 1.0 + eps)).astype(
            jnp.float32
        )
        dobj_dratio = jnp.where(use1, advn, advn * inside)
        dlogp = -(w_pair * inv_n) * dobj_dratio * ratio

        ent = -jnp.sum(p * lsm, axis=0, keepdims=True)
        # entropy bonus only on each agent's OWN policy (the diagonal)
        dlogits = dlogp * (onehot.astype(jnp.float32) - p) + (
            st.ent_coef * inv_n
        ) * diag * p * (lsm + ent)

        vdiff = value - old_value
        v_clip = old_value + jnp.clip(vdiff, -eps, eps)
        e1 = value - target
        e2 = v_clip - target
        use_e1 = (e1 * e1) >= (e2 * e2)
        inside_v = ((vdiff > -eps) & (vdiff < eps)).astype(jnp.float32)
        dvalue = (st.vf_coef * inv_n) * w_pair * jnp.where(
            use_e1, e1, e2 * inside_v
        )

        # ---- backward ----
        dn10 = (((1,), (0,)), ((), ()))
        dn11 = (((1,), (1,)), ((), ()))
        dcat = jnp.concatenate([dlogits, dvalue], axis=0)  # (A+1, M)
        dh2 = jax.lax.dot_general(
            wc_ref[0], dcat, dn10, preferred_element_type=jnp.float32
        )
        one = jnp.bfloat16(1.0)
        dz2b = dh2.astype(jnp.bfloat16) * (one - h2b * h2b)
        dh1 = jax.lax.dot_general(
            w1_ref[0], dz2b, dn10, preferred_element_type=jnp.float32
        )
        dz1b = dh1.astype(jnp.bfloat16) * (one - h1b * h1b)
        dw0[0] += jax.lax.dot_general(
            x, dz1b, dn11, preferred_element_type=jnp.float32
        )
        db0[0] += jnp.sum(dz1b.astype(jnp.float32), axis=1, keepdims=True).T
        dw1[0] += jax.lax.dot_general(
            h1b, dz2b, dn11, preferred_element_type=jnp.float32
        )
        db1[0] += jnp.sum(dz2b.astype(jnp.float32), axis=1, keepdims=True).T
        dwc[0] += jax.lax.dot_general(
            h2f, dcat, dn11, preferred_element_type=jnp.float32
        )
        dbc[0] += jnp.sum(dcat, axis=1, keepdims=True).T

        # ---- metric partial sums (loss-term weighted like the loss) ----
        mets[0] += jnp.sum(w_pair * obj)
        mets[1] += jnp.sum(
            w_pair * 0.5 * jnp.maximum(e1 * e1, e2 * e2)
        )
        mets[2] += jnp.sum(diag * ent)
        mets[3] += jnp.sum(
            diag * ((ratio - 1.0) - (logp - behav_logp))
        )

    return kernel


def build_fused_seac_ppo_grads(
    obs_len: int,
    hidden: Tuple[int, int],
    n_actions: int,
    rollout_len: int,
    n_agents: int,
    mb_rows: int,
    clip_eps: float,
    vf_coef: float,
    ent_coef: float,
    seac_lambda: float,
    interpret: bool = False,
):
    """Fused shared-experience PPO gradients for PER-AGENT parameters.

    Returns ``grads(params, batch) -> (grads_pytree, metrics)``.
    ``params`` is the stacked per-agent pytree of models.seac.init_seac
    (leading N axis on every leaf); ``batch`` is the native-layout tuple
    (obs (T, L, N, RB, LANE) bf16, action (T, N, RB, LANE) int32,
    behav_logp (T, N, RB, LANE), old_value/adv/target
    (T, N_i, N_j, RB, LANE)).  One grid cell = (time-block, i, env-chunk):
    agent i's MLP forward + hand-derived backward on EVERY agent's
    observation slab at once (the N_j sharing axis rides in the cell's M
    sample columns with per-column pair weights, and each cell processes
    phase_time_block(T) consecutive time rows — the same cell folding as
    the IPPO phase kernel, amortising the per-cell DMA floor), clipped at
    the SEAC importance weight
    (models.seac.build_seac_ppo_train_step's minibatch_loss is the spec),
    accumulated into agent i's VMEM-resident gradient blocks — the same
    one-obs-read HBM floor as the IPPO kernel, times the N_j sharing axis.
    """
    L, (H1, H2), A = obs_len, hidden, n_actions
    T, N = rollout_len, n_agents
    rb_chunk = _pick_fold_rb_chunk(mb_rows, N)
    TB = phase_time_block(T)
    st = _SeacStatic(
        l=L, h1=H1, h2=H2, a=A, t=T, n=N, mb_rows=mb_rows,
        rb_chunk=rb_chunk, tb=TB, clip_eps=clip_eps, vf_coef=vf_coef,
        ent_coef=ent_coef, seac_lambda=seac_lambda,
    )
    kernel = _make_seac_update_kernel(st)
    n_samples = T * mb_rows * LANE
    inv_pg = 1.0 / (n_samples * N)
    inv_ent = 1.0 / (n_samples * N)

    grid = (T // TB, N, mb_rows // rb_chunk)

    def pb(shape):
        # agent-i-indexed parameter block
        return pl.BlockSpec(
            (1,) + shape, lambda t, i, c: (i,) + tuple(0 for _ in shape),
            memory_space=pltpu.VMEM,
        )

    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    in_specs += [
        pl.BlockSpec(
            (TB, L, N, rb_chunk, LANE),
            lambda t, i, c: (t, 0, 0, c, 0),
            memory_space=pltpu.VMEM,
        )
    ]
    in_specs += [
        pl.BlockSpec(
            (TB, N, rb_chunk, LANE),
            lambda t, i, c: (t, 0, c, 0),
            memory_space=pltpu.VMEM,
        )
        for _ in range(2)
    ]
    in_specs += [
        pl.BlockSpec(
            (TB, 1, N, rb_chunk, LANE),
            lambda t, i, c: (t, i, 0, c, 0),
            memory_space=pltpu.VMEM,
        )
        for _ in range(3)
    ]
    # biases carry an explicit singleton row axis (N, 1, X): Mosaic
    # requires a block's last two dims be (8k, 128m)-divisible OR equal to
    # the array dims — a (1, X) block over (N, X) violates that on
    # hardware (interpret mode tolerated it)
    AC = A + 1
    in_specs += [
        pb((L, H1)), pb((1, H1)), pb((H1, H2)), pb((1, H2)),
        pb((H2, AC)), pb((1, AC)),
    ]

    out_specs = [
        pb((L, H1)), pb((1, H1)), pb((H1, H2)), pb((1, H2)),
        pb((H2, AC)), pb((1, AC)),
        pl.BlockSpec(
            (len(_METRICS),), lambda t, i, c: (0,),
            memory_space=pltpu.SMEM,
        ),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((N, L, H1), jnp.float32),
        jax.ShapeDtypeStruct((N, 1, H1), jnp.float32),
        jax.ShapeDtypeStruct((N, H1, H2), jnp.float32),
        jax.ShapeDtypeStruct((N, 1, H2), jnp.float32),
        jax.ShapeDtypeStruct((N, H2, AC), jnp.float32),
        jax.ShapeDtypeStruct((N, 1, AC), jnp.float32),
        jax.ShapeDtypeStruct((len(_METRICS),), jnp.float32),
    ]

    def grads(params, batch):
        obs, action, behav_logp, old_value, adv, target = batch
        p = params["params"]
        adv_mean = adv.mean()
        adv_inv_std = 1.0 / (adv.std() + 1e-8)
        stats = jnp.stack([adv_mean, adv_inv_std]).astype(jnp.float32)
        inputs = [
            stats,
            obs.astype(jnp.bfloat16),
            action.astype(jnp.int32),
            behav_logp.astype(jnp.float32),
            old_value.astype(jnp.float32),
            adv.astype(jnp.float32),
            target.astype(jnp.float32),
            p["dense_0"]["kernel"].astype(jnp.bfloat16),
            p["dense_0"]["bias"].astype(jnp.float32)[:, None, :],
            p["dense_1"]["kernel"].astype(jnp.bfloat16),
            p["dense_1"]["bias"].astype(jnp.float32)[:, None, :],
            jnp.concatenate(
                [p["policy"]["kernel"], p["value"]["kernel"]], axis=2
            ).astype(jnp.float32),
            jnp.concatenate(
                [p["policy"]["bias"], p["value"]["bias"]], axis=1
            ).astype(jnp.float32)[:, None, :],
        ]
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            # folded cells (TB time rows x N_j slabs) exceed the 16 MB
            # default changing-block budget
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=112 * 1024 * 1024
            ),
            interpret=interpret,
        )(*inputs)
        (gw0, gb0, gw1, gb1, gwc, gbc, mets) = outs
        grads_tree = {
            "params": {
                "dense_0": {"kernel": gw0, "bias": gb0[:, 0]},
                "dense_1": {"kernel": gw1, "bias": gb1[:, 0]},
                "policy": {"kernel": gwc[:, :, :A], "bias": gbc[:, 0, :A]},
                "value": {"kernel": gwc[:, :, A:], "bias": gbc[:, 0, A:]},
            }
        }
        metrics = {
            "pg_loss": -mets[0] * inv_pg,
            "v_loss": mets[1] * inv_pg,
            "entropy": mets[2] * inv_ent,
            "approx_kl": mets[3] * inv_ent,
        }
        return grads_tree, metrics

    return grads


# ---------------------------------------------------------------------------
# Whole-update-phase kernel: E epochs x M minibatches, optimizer included.
# ---------------------------------------------------------------------------


def phase_time_block(t_mb: int) -> int:
    """Time rows folded into one update-phase-kernel grid cell.

    Pass starts must be multiples of this, so every time-mode epoch
    rotation (here AND in the per-pass comparison path,
    models.ippo_pallas.ppo_update_epochs_native) draws offsets in these
    units — the two paths then produce identical minibatch windows."""
    for tb in (4, 2):
        if t_mb % tb == 0:
            return tb
    return 1


def build_fused_ppo_update_phase(
    obs_len: int,
    hidden: Tuple[int, int],
    n_actions: int,
    dataset_len: int,
    n_agents: int,
    mb_rows: int,
    epochs: int,
    minibatches: int,
    clip_eps: float,
    vf_coef: float,
    ent_coef: float,
    max_grad_norm: float,
    interpret: bool = False,
):
    """The ENTIRE PPO update phase — every epoch x minibatch gradient pass
    plus the optimizer (global-norm clip -> Adam) — as ONE Pallas program.

    Why: with the per-minibatch fused kernel the update phase still pays
    16 XLA segments of optimizer/adv-stat/scheduling glue between kernel
    launches (~6 ms of the 42 ms train step at B=16,384,
    tools/native_bisect.py).  Here parameters and Adam moments live in
    VMEM-resident output blocks for the whole phase, gradients accumulate
    in VMEM scratch, and the optimizer step (exact optax semantics:
    clip_by_global_norm then scale_by_adam with bias correction and the
    per-pass learning rate) runs in-kernel at each pass boundary.  HBM
    traffic for the phase = E x M dataset reads + one parameter write.

    Returns ``update(params_arrays, mu_arrays, nu_arrays, batch, starts,
    advstats, hyper) -> (new_params, new_mu, new_nu, metrics (P, 4))``
    where the *_arrays are the 8 (kernel-layout) parameter blocks,
    ``starts`` (P,) int32 per-pass window starts, ``advstats`` (P, 2)
    [mean, inv_std], ``hyper`` (P, 3) [lr_t, 1/(1-b1^t), 1/(1-b2^t)].
    Time-axis zero-copy minibatching only; shared-parameter MLP without
    message head (msg_bits configs use the per-pass kernel).

    Grid cells are FOLDED to amortise the ~13 us/cell DMA-orchestration
    floor: the agent axis rides inside each cell's M sample columns (the
    parameters are shared, so the math is agent-blind) and each cell owns
    ``update.time_block`` consecutive time rows processed by an unrolled
    in-kernel loop — one DMA stream set per cell instead of one per
    (time row, agent).  Every ``starts`` entry must be a multiple of
    ``update.time_block`` (= phase_time_block(T_mb)); the caller draws
    epoch rotations in those units.
    """
    L, (H1, H2), A = obs_len, hidden, n_actions
    T_full, N = dataset_len, n_agents
    T_mb = T_full // minibatches
    P = epochs * minibatches
    # Cell folding: the agent axis rides INSIDE each cell's sample axis
    # (shared parameters — the math is agent-blind), and each cell owns a
    # TB-row time block processed by an unrolled in-kernel loop.  Both
    # exist to amortise the ~13 us/cell DMA orchestration floor measured
    # on this hardware (ops/pallas_gru docstring) over more samples; the
    # dots also grow to M = N*rb_chunk*LANE columns.  TB requires every
    # pass start to be TB-aligned — build returns ``update.time_block``
    # and ppo_update_phase_fused quantises the per-epoch rotation to it.
    rb_chunk = _pick_fold_rb_chunk(mb_rows, N)
    C = mb_rows // rb_chunk
    M = N * rb_chunk * LANE
    TB = phase_time_block(T_mb)
    cpp = (T_mb // TB) * C  # grid cells per pass
    total = P * cpp + 1  # +1: final boundary cell applies the last pass
    inv_n = 1.0 / (T_mb * N * mb_rows * LANE)
    eps = clip_eps
    b1, b2 = 0.9, 0.999
    adam_eps = 1e-5

    AC = A + 1  # concatenated [policy | value] head block (lane padding
    # makes separate width-A and width-1 dots cost full MXU passes each)
    pshapes = [
        (L, H1), (1, H1), (H1, H2), (1, H2),
        (H2, AC), (1, AC),
    ]
    NP = len(pshapes)

    def decode(i):
        p = jnp.minimum(i // cpp, P - 1)
        local = jnp.minimum(i - p * cpp, cpp - 1)
        t = local // C  # time-BLOCK index within the minibatch window
        c = local % C
        return p, t, c

    def kernel(*refs):
        refs = list(refs)
        starts_ref = refs.pop(0)  # scalar-prefetch (P,)
        advstats_ref = refs.pop(0)  # SMEM (P, 2)
        hyper_ref = refs.pop(0)  # SMEM (P, 3)
        data_refs = [refs.pop(0) for _ in range(6)]
        win = [refs.pop(0) for _ in range(NP)]
        muin = [refs.pop(0) for _ in range(NP)]
        nuin = [refs.pop(0) for _ in range(NP)]
        wout = [refs.pop(0) for _ in range(NP)]
        muout = [refs.pop(0) for _ in range(NP)]
        nuout = [refs.pop(0) for _ in range(NP)]
        mets = refs.pop(0)  # SMEM (P, 4)
        gacc = refs  # NP scratch blocks

        i = pl.program_id(0)
        p, t, c = decode(i)

        @pl.when(i == 0)
        def _():
            for k in range(NP):
                wout[k][:] = win[k][:]
                muout[k][:] = muin[k][:]
                nuout[k][:] = nuin[k][:]
                gacc[k][:] = jnp.zeros_like(gacc[k])

        # ---- pass boundary: clip + Adam for the pass that just finished
        @pl.when((i > 0) & (i % cpp == 0))
        def _():
            q = i // cpp - 1  # pass being applied
            sq = jnp.float32(0.0)
            for k in range(NP):
                sq += jnp.sum(gacc[k][:] * gacc[k][:])
            gn = jnp.sqrt(sq)
            big = (gn >= max_grad_norm).astype(jnp.float32)
            scale = big * (
                max_grad_norm / jnp.maximum(gn, jnp.float32(1e-30))
            ) + (1.0 - big)
            lr = hyper_ref[q, 0]
            bc1 = hyper_ref[q, 1]
            bc2 = hyper_ref[q, 2]
            for k in range(NP):
                g = gacc[k][:] * scale
                mu = b1 * muout[k][:] + (1.0 - b1) * g
                nu = b2 * nuout[k][:] + (1.0 - b2) * g * g
                muout[k][:] = mu
                nuout[k][:] = nu
                wout[k][:] = wout[k][:] - lr * (mu * bc1) / (
                    jnp.sqrt(nu * bc2) + adam_eps
                )
                gacc[k][:] = jnp.zeros_like(gacc[k])

        @pl.when((i % cpp == 0) & (i < P * cpp))
        def _():
            for k in range(4):
                mets[p, k] = 0.0

        # ---- one (time-block, env-chunk) gradient cell of pass p ----
        # TB time rows x N agents per cell: one DMA stream set, TB
        # unrolled sub-steps, agents folded into the M sample columns
        @pl.when(i < P * cpp)
        def _():
            (obs_ref, act_ref, logp_ref, oldv_ref, adv_ref,
             tgt_ref) = data_refs
            adv_mean = advstats_ref[p, 0]
            adv_inv_std = advstats_ref[p, 1]
            w0 = wout[0][:].astype(jnp.bfloat16)
            b0 = wout[1][:]
            w1 = wout[2][:].astype(jnp.bfloat16)
            b1_ = wout[3][:]
            wc = wout[4][:]
            bc = wout[5][:]

            for lt in range(TB):
                _cell(lt, obs_ref, act_ref, logp_ref, oldv_ref, adv_ref,
                      tgt_ref, adv_mean, adv_inv_std,
                      w0, b0, w1, b1_, wc, bc, gacc, mets, p)

    def _cell(lt, obs_ref, act_ref, logp_ref, oldv_ref, adv_ref, tgt_ref,
              adv_mean, adv_inv_std, w0, b0, w1, b1_, wc, bc, gacc, mets,
              p):
            x = obs_ref[lt].reshape(L, M)  # bf16
            dn00 = (((0,), (0,)), ((), ()))
            z1 = jax.lax.dot_general(
                w0, x, dn00, preferred_element_type=jnp.float32
            )
            h1b = jnp.tanh((z1 + b0.T).astype(jnp.bfloat16))
            z2 = jax.lax.dot_general(
                w1, h1b, dn00, preferred_element_type=jnp.float32
            )
            h2b = jnp.tanh((z2 + b1_.T).astype(jnp.bfloat16))
            h2f = h2b.astype(jnp.float32)
            hcat = (
                jax.lax.dot_general(
                    wc, h2f, dn00, preferred_element_type=jnp.float32
                )
                + bc.T
            )  # (AC, M)
            logits = hcat[:A]
            value = hcat[A:A + 1]

            action = act_ref[lt].reshape(1, M)
            old_logp = logp_ref[lt].reshape(1, M)
            old_value = oldv_ref[lt].reshape(1, M)
            adv = adv_ref[lt].reshape(1, M)
            target = tgt_ref[lt].reshape(1, M)

            mx = jnp.max(logits, axis=0, keepdims=True)
            sm = jnp.exp(logits - mx)
            z = jnp.sum(sm, axis=0, keepdims=True)
            lsm = logits - mx - jnp.log(z)
            pr = sm / z
            onehot = (
                jax.lax.broadcasted_iota(jnp.int32, (A, M), 0) == action
            )
            logp = jnp.sum(
                jnp.where(onehot, lsm, 0.0), axis=0, keepdims=True
            )
            ratio = jnp.exp(logp - old_logp)
            advn = (adv - adv_mean) * adv_inv_std
            ratio_c = jnp.clip(ratio, 1.0 - eps, 1.0 + eps)
            pg1 = ratio * advn
            pg2 = ratio_c * advn
            obj = jnp.minimum(pg1, pg2)
            use1 = pg1 <= pg2
            inside = ((ratio > 1.0 - eps) & (ratio < 1.0 + eps)).astype(
                jnp.float32
            )
            dobj_dratio = jnp.where(use1, advn, advn * inside)
            dlogp = -inv_n * dobj_dratio * ratio
            ent = -jnp.sum(pr * lsm, axis=0, keepdims=True)
            dlogits = dlogp * (onehot.astype(jnp.float32) - pr) + (
                ent_coef * inv_n
            ) * pr * (lsm + ent)
            vdiff = value - old_value
            v_clip = old_value + jnp.clip(vdiff, -eps, eps)
            e1 = value - target
            e2 = v_clip - target
            use_e1 = (e1 * e1) >= (e2 * e2)
            inside_v = ((vdiff > -eps) & (vdiff < eps)).astype(jnp.float32)
            dvalue = (vf_coef * inv_n) * jnp.where(
                use_e1, e1, e2 * inside_v
            )

            dn10 = (((1,), (0,)), ((), ()))
            dn11 = (((1,), (1,)), ((), ()))
            dcat = jnp.concatenate([dlogits, dvalue], axis=0)  # (AC, M)
            dh2 = jax.lax.dot_general(
                wc, dcat, dn10, preferred_element_type=jnp.float32
            )
            one = jnp.bfloat16(1.0)
            dz2b = dh2.astype(jnp.bfloat16) * (one - h2b * h2b)
            dh1 = jax.lax.dot_general(
                w1, dz2b, dn10, preferred_element_type=jnp.float32
            )
            dz1b = dh1.astype(jnp.bfloat16) * (one - h1b * h1b)
            gacc[0][:] += jax.lax.dot_general(
                x, dz1b, dn11, preferred_element_type=jnp.float32
            )
            gacc[1][:] += jnp.sum(
                dz1b.astype(jnp.float32), axis=1, keepdims=True
            ).T
            gacc[2][:] += jax.lax.dot_general(
                h1b, dz2b, dn11, preferred_element_type=jnp.float32
            )
            gacc[3][:] += jnp.sum(
                dz2b.astype(jnp.float32), axis=1, keepdims=True
            ).T
            gacc[4][:] += jax.lax.dot_general(
                h2f, dcat, dn11, preferred_element_type=jnp.float32
            )
            gacc[5][:] += jnp.sum(dcat, axis=1, keepdims=True).T

            mets[p, 0] += jnp.sum(obj)
            mets[p, 1] += jnp.sum(0.5 * jnp.maximum(e1 * e1, e2 * e2))
            mets[p, 2] += jnp.sum(ent)
            mets[p, 3] += jnp.sum((ratio - 1.0) - (logp - old_logp))

    def tblk(i, sel):
        # block-unit time index: starts are TB-aligned by contract, so the
        # wrap works in whole blocks
        p, t, c = decode(i)
        return (sel[p] // TB + t) % (T_full // TB)

    def obs_map(i, sel):
        p, t, c = decode(i)
        return (tblk(i, sel), 0, 0, c, 0)

    def vec_map(i, sel):
        p, t, c = decode(i)
        return (tblk(i, sel), 0, c, 0)

    def cmap(shape):
        return lambda i, sel: tuple(0 for _ in shape)

    def cblock(shape):
        return pl.BlockSpec(shape, cmap(shape), memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # advstats (P, 2)
        pl.BlockSpec(memory_space=pltpu.SMEM),  # hyper (P, 3)
        pl.BlockSpec(
            (TB, L, N, rb_chunk, LANE), obs_map, memory_space=pltpu.VMEM
        ),
    ]
    in_specs += [
        pl.BlockSpec(
            (TB, N, rb_chunk, LANE), vec_map, memory_space=pltpu.VMEM
        )
        for _ in range(5)
    ]
    in_specs += [cblock(s) for s in pshapes] * 3  # w, mu, nu
    out_specs = [cblock(s) for s in pshapes] * 3
    out_specs.append(
        pl.BlockSpec((P, 4), lambda i, sel: (0, 0),
                     memory_space=pltpu.SMEM)
    )
    out_shape = (
        [jax.ShapeDtypeStruct(s, jnp.float32) for s in pshapes] * 3
        + [jax.ShapeDtypeStruct((P, 4), jnp.float32)]
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(total,),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=[pltpu.VMEM(s, jnp.float32) for s in pshapes],
        ),
        out_shape=out_shape,
        # folded cells (TB time rows x N agents) push the double-buffered
        # changing blocks past the 16 MB default
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024
        ),
        interpret=interpret,
    )

    def update(params_arrays, mu_arrays, nu_arrays, batch, starts,
               advstats, hyper):
        obs, action, old_logp, old_value, adv, target = batch
        inputs = (
            [jnp.asarray(starts, jnp.int32),
             advstats.astype(jnp.float32), hyper.astype(jnp.float32),
             obs.astype(jnp.bfloat16), action.astype(jnp.int32),
             old_logp.astype(jnp.float32), old_value.astype(jnp.float32),
             adv.astype(jnp.float32), target.astype(jnp.float32)]
            + [a.astype(jnp.float32) for a in params_arrays]
            + [a.astype(jnp.float32) for a in mu_arrays]
            + [a.astype(jnp.float32) for a in nu_arrays]
        )
        outs = list(call(*inputs))
        new_w = outs[:NP]
        new_mu = outs[NP:2 * NP]
        new_nu = outs[2 * NP:3 * NP]
        mets = outs[3 * NP]
        return new_w, new_mu, new_nu, mets

    update.n_passes = P
    # every ``starts`` entry must be a multiple of this (zero-copy wrap
    # addressing works in whole time blocks); callers quantise the
    # per-epoch rotation accordingly
    update.time_block = TB
    return update


# ---------------------------------------------------------------------------
# MAPPO: centralized critic in-kernel — actor + critic gradients from ONE
# native-layout obs read.
# ---------------------------------------------------------------------------


def _critic_perm(obs_len: int, n_agents: int):
    """Row permutations between the flax CentralCritic's agent-major joint
    feature order (row n*L + l — joint obs assembled by concatenating
    agents) and the kernel's feature-major order (row l*N + n — the
    natural row-major flatten of the native (L, N, rb, LANE) obs block).

    Returns (perm, inv): ``w_kernel = w_flax[perm]``,
    ``dw_flax = dw_kernel[inv]``."""
    import numpy as np

    L, N = obs_len, n_agents
    perm = np.empty(L * N, dtype=np.int32)
    for l in range(L):
        for n in range(N):
            perm[l * N + n] = n * L + l
    inv = np.argsort(perm).astype(np.int32)
    return perm, inv


@dataclasses.dataclass(frozen=True)
class _MappoStatic:
    l: int
    h1: int
    h2: int
    ch1: int  # critic hidden sizes (may differ from the actor's)
    ch2: int
    a: int
    t: int
    n: int
    mb_rows: int
    rb_chunk: int
    tb: int
    clip_eps: float
    vf_coef: float
    ent_coef: float
    with_actor: bool


def _make_mappo_update_kernel(st: _MappoStatic):
    L, H1, H2, A, N = st.l, st.h1, st.h2, st.a, st.n
    CH1, CH2 = st.ch1, st.ch2
    TB = st.tb
    Mc = st.rb_chunk * LANE  # critic sample columns (one per env)
    Ma = N * Mc  # actor sample columns (agents folded, shared params)
    inv_n = 1.0 / (st.t * st.n * st.mb_rows * LANE)
    eps = st.clip_eps
    AC = A + 1
    NP_A = 6 if st.with_actor else 0

    def kernel(*refs):
        refs = list(refs)
        stats_ref = refs.pop(0)
        if st.with_actor:
            data = [refs.pop(0) for _ in range(6)]
            (obs_ref, act_ref, logp_ref, oldv_ref, adv_ref, tgt_ref) = data
            aw = [refs.pop(0) for _ in range(6)]
        else:
            obs_ref = refs.pop(0)
            oldv_ref = refs.pop(0)
            tgt_ref = refs.pop(0)
        cw = [refs.pop(0) for _ in range(6)]
        if st.with_actor:
            da = [refs.pop(0) for _ in range(6)]
        dc = [refs.pop(0) for _ in range(6)]
        mets = refs.pop(0)

        t = pl.program_id(0)
        c = pl.program_id(1)
        first = (t == 0) & (c == 0)

        @pl.when(first)
        def _():
            if st.with_actor:
                for r in da:
                    r[:] = jnp.zeros_like(r)
            for r in dc:
                r[:] = jnp.zeros_like(r)
            for k in range(len(_METRICS)):
                mets[k] = 0.0

        adv_mean = stats_ref[0]
        adv_inv_std = stats_ref[1]
        dn00 = (((0,), (0,)), ((), ()))
        dn10 = (((1,), (0,)), ((), ()))
        dn11 = (((1,), (1,)), ((), ()))
        one = jnp.bfloat16(1.0)

        for lt in range(TB):
            # ---- critic: joint-obs forward + clipped value loss ----
            # The SAME obs block serves both networks: rows (L, N) flatten
            # to the joint feature axis l*N + n (weights pre-permuted from
            # the flax agent-major order by _critic_perm), columns are the
            # Mc env samples.
            xc = obs_ref[lt].reshape(L * N, Mc)  # bf16
            z1c = jax.lax.dot_general(
                cw[0][:], xc, dn00, preferred_element_type=jnp.float32
            )  # (CH1, Mc)
            h1c = jnp.tanh((z1c + cw[1][:].T).astype(jnp.bfloat16))
            z2c = jax.lax.dot_general(
                cw[2][:], h1c, dn00, preferred_element_type=jnp.float32
            )  # (CH2, Mc)
            h2c = jnp.tanh((z2c + cw[3][:].T).astype(jnp.bfloat16))
            h2cf = h2c.astype(jnp.float32)
            value = (
                jax.lax.dot_general(
                    cw[4][:], h2cf, dn00,
                    preferred_element_type=jnp.float32,
                )
                + cw[5][:].T
            )  # (N, Mc): per-agent values from the joint state

            old_value = oldv_ref[lt].reshape(N, Mc)
            target = tgt_ref[lt].reshape(N, Mc)
            vdiff = value - old_value
            v_clip = old_value + jnp.clip(vdiff, -eps, eps)
            e1 = value - target
            e2 = v_clip - target
            use_e1 = (e1 * e1) >= (e2 * e2)
            inside_v = ((vdiff > -eps) & (vdiff < eps)).astype(jnp.float32)
            dvalue = (st.vf_coef * inv_n) * jnp.where(
                use_e1, e1, e2 * inside_v
            )  # (N, Mc)

            # ---- critic backward ----
            dh2c = jax.lax.dot_general(
                cw[4][:], dvalue, dn10, preferred_element_type=jnp.float32
            )  # (CH2, Mc)
            dz2c = dh2c.astype(jnp.bfloat16) * (one - h2c * h2c)
            dh1c = jax.lax.dot_general(
                cw[2][:], dz2c, dn10, preferred_element_type=jnp.float32
            )  # (CH1, Mc)
            dz1c = dh1c.astype(jnp.bfloat16) * (one - h1c * h1c)
            dc[0][:] += jax.lax.dot_general(
                xc, dz1c, dn11, preferred_element_type=jnp.float32
            )  # (L*N, CH1)
            dc[1][:] += jnp.sum(
                dz1c.astype(jnp.float32), axis=1, keepdims=True
            ).T
            dc[2][:] += jax.lax.dot_general(
                h1c, dz2c, dn11, preferred_element_type=jnp.float32
            )  # (CH1, CH2)
            dc[3][:] += jnp.sum(
                dz2c.astype(jnp.float32), axis=1, keepdims=True
            ).T
            dc[4][:] += jax.lax.dot_general(
                h2cf, dvalue, dn11, preferred_element_type=jnp.float32
            )  # (CH2, N)
            dc[5][:] += jnp.sum(dvalue, axis=1, keepdims=True).T
            mets[1] += jnp.sum(0.5 * jnp.maximum(e1 * e1, e2 * e2))

            if not st.with_actor:
                continue

            # ---- actor: clipped surrogate + entropy (agents folded into
            # the Ma columns; the local value head takes no gradient —
            # MAPPO's value term is the critic's) ----
            xa = obs_ref[lt].reshape(L, Ma)  # bf16
            z1 = jax.lax.dot_general(
                aw[0][:], xa, dn00, preferred_element_type=jnp.float32
            )
            h1b = jnp.tanh((z1 + aw[1][:].T).astype(jnp.bfloat16))
            z2 = jax.lax.dot_general(
                aw[2][:], h1b, dn00, preferred_element_type=jnp.float32
            )
            h2b = jnp.tanh((z2 + aw[3][:].T).astype(jnp.bfloat16))
            h2f = h2b.astype(jnp.float32)
            hcat = (
                jax.lax.dot_general(
                    aw[4][:], h2f, dn00, preferred_element_type=jnp.float32
                )
                + aw[5][:].T
            )  # (AC, Ma)
            logits = hcat[:A]

            action = act_ref[lt].reshape(1, Ma)
            old_logp = logp_ref[lt].reshape(1, Ma)
            adv = adv_ref[lt].reshape(1, Ma)

            mx = jnp.max(logits, axis=0, keepdims=True)
            sm = jnp.exp(logits - mx)
            z = jnp.sum(sm, axis=0, keepdims=True)
            lsm = logits - mx - jnp.log(z)
            pr = sm / z
            onehot = (
                jax.lax.broadcasted_iota(jnp.int32, (A, Ma), 0) == action
            )
            logp = jnp.sum(
                jnp.where(onehot, lsm, 0.0), axis=0, keepdims=True
            )
            ratio = jnp.exp(logp - old_logp)
            advn = (adv - adv_mean) * adv_inv_std
            ratio_c = jnp.clip(ratio, 1.0 - eps, 1.0 + eps)
            pg1 = ratio * advn
            pg2 = ratio_c * advn
            obj = jnp.minimum(pg1, pg2)
            use1 = pg1 <= pg2
            inside = ((ratio > 1.0 - eps) & (ratio < 1.0 + eps)).astype(
                jnp.float32
            )
            dobj_dratio = jnp.where(use1, advn, advn * inside)
            dlogp = -inv_n * dobj_dratio * ratio
            ent = -jnp.sum(pr * lsm, axis=0, keepdims=True)
            dlogits = dlogp * (onehot.astype(jnp.float32) - pr) + (
                st.ent_coef * inv_n
            ) * pr * (lsm + ent)

            dcat = jnp.concatenate(
                [dlogits, jnp.zeros((1, Ma), jnp.float32)], axis=0
            )  # value-head row: exactly zero gradient
            dh2 = jax.lax.dot_general(
                aw[4][:], dcat, dn10, preferred_element_type=jnp.float32
            )
            dz2b = dh2.astype(jnp.bfloat16) * (one - h2b * h2b)
            dh1 = jax.lax.dot_general(
                aw[2][:], dz2b, dn10, preferred_element_type=jnp.float32
            )
            dz1b = dh1.astype(jnp.bfloat16) * (one - h1b * h1b)
            da[0][:] += jax.lax.dot_general(
                xa, dz1b, dn11, preferred_element_type=jnp.float32
            )
            da[1][:] += jnp.sum(
                dz1b.astype(jnp.float32), axis=1, keepdims=True
            ).T
            da[2][:] += jax.lax.dot_general(
                h1b, dz2b, dn11, preferred_element_type=jnp.float32
            )
            da[3][:] += jnp.sum(
                dz2b.astype(jnp.float32), axis=1, keepdims=True
            ).T
            da[4][:] += jax.lax.dot_general(
                h2f, dcat, dn11, preferred_element_type=jnp.float32
            )
            da[5][:] += jnp.sum(dcat, axis=1, keepdims=True).T

            mets[0] += jnp.sum(obj)
            mets[2] += jnp.sum(ent)
            mets[3] += jnp.sum((ratio - 1.0) - (logp - old_logp))

    return kernel


def build_fused_mappo_grads(
    obs_len: int,
    hidden: Tuple[int, int],
    n_actions: int,
    rollout_len: int,
    n_agents: int,
    mb_rows: int,
    clip_eps: float,
    vf_coef: float,
    ent_coef: float,
    critic_hidden: Optional[Tuple[int, int]] = None,
    interpret: bool = False,
    dataset_len: int = 0,
    with_actor: bool = True,
):
    """Fused MAPPO minibatch gradients: shared-parameter actor AND the
    centralized critic in ONE Pallas program, both fed by a single read of
    the native-layout obs block.

    The critic's joint observation is NOT materialised: each grid cell's
    (L, N, rb, LANE) obs block row-major-flattens to the (L*N, Mc) joint
    feature matrix (feature order l*N + n), and the critic's dense_0 rows
    are pre-permuted from the flax agent-major order (_critic_perm) so the
    contraction consumes the block in place — this deletes the per-update
    `_joint_rowmajor` transpose and every per-pass critic HBM read of it
    (models/mappo.py round-3 path; VERDICT r3 #1).  The actor runs the
    same cell math as the whole-phase IPPO kernel (agents folded into Ma
    columns) with an exactly-zero local value-head gradient, matching
    jax.grad of models.mappo.mappo_loss_native.

    Returns ``grads(params, batch[, start]) -> ({"actor", "critic"},
    metrics)`` with ``params = {"actor": ActorCritic pytree, "critic":
    CentralCritic pytree}`` and ``batch`` the native-layout tuple (obs,
    action, logp, old_value (critic), adv, target).  ``dataset_len``
    enables the zero-copy full-trajectory window addressing of
    build_fused_ppo_grads (starts must be phase_time_block-aligned, which
    ppo_update_epochs_native's rotation guarantees).

    ``with_actor=False`` builds the critic-only variant for recurrent
    MAPPO (the GRU actor trains through ops/pallas_gru): ``params`` is the
    CentralCritic pytree, ``batch = (obs, old_value, target)``, and the
    return is ``(critic_grads, {"v_loss"})``.

    Message-bit actor heads are not supported here (use the split
    per-pass path); the critic is head-width N so needs nothing extra.
    """
    L, (H1, H2), A = obs_len, hidden, n_actions
    CH1, CH2 = critic_hidden or hidden
    T, N = rollout_len, n_agents
    T_full = dataset_len or T
    rb_chunk = (
        _pick_fold_rb_chunk(mb_rows, N)
        if with_actor
        else _pick_fold_rb_chunk(mb_rows, 1, cap=32)
    )
    TB = phase_time_block(T)
    st = _MappoStatic(
        l=L, h1=H1, h2=H2, ch1=CH1, ch2=CH2, a=A, t=T, n=N,
        mb_rows=mb_rows, rb_chunk=rb_chunk, tb=TB, clip_eps=clip_eps,
        vf_coef=vf_coef, ent_coef=ent_coef, with_actor=with_actor,
    )
    kernel = _make_mappo_update_kernel(st)
    inv_n = 1.0 / (T * N * mb_rows * LANE)
    perm, inv_perm = _critic_perm(L, N)

    grid = (T // TB, mb_rows // rb_chunk)
    AC = A + 1
    ashapes = [(L, H1), (1, H1), (H1, H2), (1, H2), (H2, AC), (1, AC)]
    cshapes = [
        (L * N, CH1), (1, CH1), (CH1, CH2), (1, CH2), (CH2, N), (1, N),
    ]

    if dataset_len:
        def tblk(t, sel):
            return (sel[0] // TB + t) % (T_full // TB)

        obs_map = lambda t, c, sel: (tblk(t, sel), 0, 0, c, 0)
        vec_map = lambda t, c, sel: (tblk(t, sel), 0, c, 0)

        def cmap(shape):
            return lambda t, c, sel: tuple(0 for _ in shape)

        met_map = lambda t, c, sel: (0,)
    else:
        obs_map = lambda t, c: (t, 0, 0, c, 0)
        vec_map = lambda t, c: (t, 0, c, 0)

        def cmap(shape):
            return lambda t, c: tuple(0 for _ in shape)

        met_map = lambda t, c: (0,)

    def cblock(shape):
        return pl.BlockSpec(shape, cmap(shape), memory_space=pltpu.VMEM)

    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]  # adv stats (2,)
    in_specs += [
        pl.BlockSpec(
            (TB, L, N, rb_chunk, LANE), obs_map, memory_space=pltpu.VMEM
        )
    ]
    n_vec = 5 if with_actor else 2
    in_specs += [
        pl.BlockSpec(
            (TB, N, rb_chunk, LANE), vec_map, memory_space=pltpu.VMEM
        )
        for _ in range(n_vec)
    ]
    if with_actor:
        in_specs += [cblock(s) for s in ashapes]
    in_specs += [cblock(s) for s in cshapes]

    out_specs = []
    out_shape = []
    gshapes = (ashapes + cshapes) if with_actor else cshapes
    for s in gshapes:
        out_specs.append(cblock(s))
        out_shape.append(jax.ShapeDtypeStruct(s, jnp.float32))
    out_specs.append(
        pl.BlockSpec((len(_METRICS),), met_map, memory_space=pltpu.SMEM)
    )
    out_shape.append(jax.ShapeDtypeStruct((len(_METRICS),), jnp.float32))

    base_kernel = kernel
    if dataset_len:
        def kernel(sel_ref, *refs):  # noqa: F811 — scalar-prefetch wrapper
            del sel_ref
            base_kernel(*refs)

        call = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid,
                in_specs=in_specs,
                out_specs=out_specs,
            ),
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=112 * 1024 * 1024
            ),
            interpret=interpret,
        )
    else:
        call = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=112 * 1024 * 1024
            ),
            interpret=interpret,
        )

    def critic_inputs(cp):
        p = cp["params"]
        return [
            p["dense_0"]["kernel"][perm].astype(jnp.bfloat16),
            p["dense_0"]["bias"].astype(jnp.float32)[None, :],
            p["dense_1"]["kernel"].astype(jnp.bfloat16),
            p["dense_1"]["bias"].astype(jnp.float32)[None, :],
            p["value"]["kernel"].astype(jnp.float32),
            p["value"]["bias"].astype(jnp.float32)[None, :],
        ]

    def critic_tree(outs):
        (gc0, gcb0, gc1, gcb1, gcv, gcbv) = outs
        return {
            "params": {
                "dense_0": {"kernel": gc0[inv_perm], "bias": gcb0[0]},
                "dense_1": {"kernel": gc1, "bias": gcb1[0]},
                "value": {"kernel": gcv, "bias": gcbv[0]},
            }
        }

    if with_actor:
        def grads(params, batch, start=None):
            obs, action, old_logp, old_value, adv, target = batch
            ap = params["actor"]["params"]
            if dataset_len:
                adv_mb = jax.lax.dynamic_slice_in_dim(
                    jnp.roll(adv, -start, axis=0), 0, T, 0
                )
            else:
                adv_mb = adv
            adv_mean = adv_mb.mean()
            adv_inv_std = 1.0 / (adv_mb.std() + 1e-8)
            stats = jnp.stack([adv_mean, adv_inv_std]).astype(jnp.float32)
            inputs = [
                stats,
                obs.astype(jnp.bfloat16),
                action.astype(jnp.int32),
                old_logp.astype(jnp.float32),
                old_value.astype(jnp.float32),
                adv.astype(jnp.float32),
                target.astype(jnp.float32),
                ap["dense_0"]["kernel"].astype(jnp.bfloat16),
                ap["dense_0"]["bias"].astype(jnp.float32)[None, :],
                ap["dense_1"]["kernel"].astype(jnp.bfloat16),
                ap["dense_1"]["bias"].astype(jnp.float32)[None, :],
                jnp.concatenate(
                    [ap["policy"]["kernel"], ap["value"]["kernel"]], axis=1
                ).astype(jnp.float32),
                jnp.concatenate(
                    [ap["policy"]["bias"], ap["value"]["bias"]], axis=0
                ).astype(jnp.float32)[None, :],
            ] + critic_inputs(params["critic"])
            if dataset_len:
                sel = jnp.asarray([start], dtype=jnp.int32)
                outs = list(call(sel, *inputs))
            else:
                outs = list(call(*inputs))
            (gw0, gb0, gw1, gb1, gwc, gbc) = outs[:6]
            mets = outs[12]
            grads_tree = {
                "actor": {
                    "params": {
                        "dense_0": {"kernel": gw0, "bias": gb0[0]},
                        "dense_1": {"kernel": gw1, "bias": gb1[0]},
                        "policy": {
                            "kernel": gwc[:, :A], "bias": gbc[0, :A]
                        },
                        "value": {
                            "kernel": gwc[:, A:A + 1],
                            "bias": gbc[0, A:A + 1],
                        },
                    }
                },
                "critic": critic_tree(outs[6:12]),
            }
            metrics = {
                "pg_loss": -mets[0] * inv_n,
                "v_loss": mets[1] * inv_n,
                "entropy": mets[2] * inv_n,
                "approx_kl": mets[3] * inv_n,
            }
            return grads_tree, metrics
    else:
        def grads(params, batch, start=None):
            obs, old_value, target = batch
            stats = jnp.zeros((2,), jnp.float32)  # unused by the critic
            inputs = [
                stats,
                obs.astype(jnp.bfloat16),
                old_value.astype(jnp.float32),
                target.astype(jnp.float32),
            ] + critic_inputs(params)
            if dataset_len:
                sel = jnp.asarray([start], dtype=jnp.int32)
                outs = list(call(sel, *inputs))
            else:
                outs = list(call(*inputs))
            mets = outs[6]
            return critic_tree(outs[:6]), {"v_loss": mets[1] * inv_n}

    grads.dataset_len = dataset_len
    return grads


def build_fused_critic_values(
    obs_len: int,
    n_agents: int,
    rollout_len: int,
    mb_rows: int,
    hidden: Tuple[int, int] = (128, 128),
    interpret: bool = False,
):
    """Central-critic forward over the WHOLE stored trajectory, consuming
    the kernel-native obs layout directly: ``values(critic_params, obs
    (T, L, N, RB, LANE) bf16) -> (T, N, RB, LANE) f32``.

    Replaces models.mappo's `_joint_rowmajor` relayout +
    `_critic_rowmajor_forward` batched dot: the joint feature matrix is
    the in-place row-major flatten of each obs block (same trick as
    build_fused_mappo_grads), so the trajectory's only HBM traffic is one
    obs read and the (T, N, RB, LANE) value write.  Numerics follow the
    shared bf16-trunk/f32-head recipe (ippo_pallas._native_trunk)."""
    L, N = obs_len, n_agents
    CH1, CH2 = hidden
    T = rollout_len
    rb_chunk = _pick_fold_rb_chunk(mb_rows, 1, cap=32)
    TB = phase_time_block(T)
    Mc = rb_chunk * LANE
    perm, _ = _critic_perm(L, N)
    dn00 = (((0,), (0,)), ((), ()))

    def kernel(obs_ref, c0, cb0, c1, cb1, cv, cbv, out_ref):
        for lt in range(TB):
            xc = obs_ref[lt].reshape(L * N, Mc)
            z1 = jax.lax.dot_general(
                c0[:], xc, dn00, preferred_element_type=jnp.float32
            )
            h1 = jnp.tanh((z1 + cb0[:].T).astype(jnp.bfloat16))
            z2 = jax.lax.dot_general(
                c1[:], h1, dn00, preferred_element_type=jnp.float32
            )
            h2 = jnp.tanh((z2 + cb1[:].T).astype(jnp.bfloat16))
            v = (
                jax.lax.dot_general(
                    cv[:], h2.astype(jnp.float32), dn00,
                    preferred_element_type=jnp.float32,
                )
                + cbv[:].T
            )  # (N, Mc)
            out_ref[lt] = v.reshape(N, rb_chunk, LANE)

    def cmap(shape):
        return lambda t, c: tuple(0 for _ in shape)

    def cblock(shape):
        return pl.BlockSpec(shape, cmap(shape), memory_space=pltpu.VMEM)

    cshapes = [
        (L * N, CH1), (1, CH1), (CH1, CH2), (1, CH2), (CH2, N), (1, N),
    ]
    call = pl.pallas_call(
        kernel,
        grid=(T // TB, mb_rows // rb_chunk),
        in_specs=[
            pl.BlockSpec(
                (TB, L, N, rb_chunk, LANE),
                lambda t, c: (t, 0, 0, c, 0),
                memory_space=pltpu.VMEM,
            ),
        ] + [cblock(s) for s in cshapes],
        out_specs=pl.BlockSpec(
            (TB, N, rb_chunk, LANE),
            lambda t, c: (t, 0, c, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((T, N, mb_rows, LANE), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024
        ),
        interpret=interpret,
    )

    def values(critic_params, obs):
        p = critic_params["params"]
        return call(
            obs.astype(jnp.bfloat16),
            p["dense_0"]["kernel"][perm].astype(jnp.bfloat16),
            p["dense_0"]["bias"].astype(jnp.float32)[None, :],
            p["dense_1"]["kernel"].astype(jnp.bfloat16),
            p["dense_1"]["bias"].astype(jnp.float32)[None, :],
            p["value"]["kernel"].astype(jnp.float32),
            p["value"]["bias"].astype(jnp.float32)[None, :],
        )

    return values


def build_fused_mappo_update_phase(
    obs_len: int,
    hidden: Tuple[int, int],
    n_actions: int,
    dataset_len: int,
    n_agents: int,
    mb_rows: int,
    epochs: int,
    minibatches: int,
    clip_eps: float,
    vf_coef: float,
    ent_coef: float,
    max_grad_norm: float,
    critic_hidden: Optional[Tuple[int, int]] = None,
    interpret: bool = False,
):
    """The ENTIRE MAPPO update phase as ONE Pallas program: every
    epoch x minibatch pass computes actor AND centralized-critic
    gradients from one native-obs read (the build_fused_mappo_grads
    cell), and at each pass boundary BOTH parts step through their own
    clip_by_global_norm -> Adam chain in-kernel (the split per-part
    optimizer of models.mappo.make_mappo_optimizer, exact optax
    semantics).  HBM traffic for the phase = E x M dataset reads + one
    parameter write per part.

    Returns ``update(aparams, amu, anu, cparams, cmu, cnu, batch, starts,
    advstats, hyper) -> (new_a, new_amu, new_anu, new_c, new_cmu,
    new_cnu, metrics (P, 4))`` with the actor arrays in the kernel
    layout of ippo_pallas._params_to_arrays and the critic arrays in
    build_fused_mappo_grads' layout (dense_0 rows PRE-PERMUTED by
    _critic_perm — the caller owns the permute/unpermute, once per
    phase).  ``starts`` must be multiples of ``update.time_block``.
    """
    L, (H1, H2), A = obs_len, hidden, n_actions
    CH1, CH2 = critic_hidden or hidden
    T_full, N = dataset_len, n_agents
    T_mb = T_full // minibatches
    P = epochs * minibatches
    rb_chunk = _pick_fold_rb_chunk(mb_rows, N)
    C = mb_rows // rb_chunk
    Mc = rb_chunk * LANE
    Ma = N * Mc
    TB = phase_time_block(T_mb)
    cpp = (T_mb // TB) * C
    total = P * cpp + 1
    inv_n = 1.0 / (T_mb * N * mb_rows * LANE)
    eps = clip_eps
    b1, b2 = 0.9, 0.999
    adam_eps = 1e-5

    AC = A + 1
    ashapes = [(L, H1), (1, H1), (H1, H2), (1, H2), (H2, AC), (1, AC)]
    cshapes = [
        (L * N, CH1), (1, CH1), (CH1, CH2), (1, CH2), (CH2, N), (1, N),
    ]
    pshapes = ashapes + cshapes
    NA = len(ashapes)
    NP = len(pshapes)

    def decode(i):
        p = jnp.minimum(i // cpp, P - 1)
        local = jnp.minimum(i - p * cpp, cpp - 1)
        t = local // C
        c = local % C
        return p, t, c

    def kernel(*refs):
        refs = list(refs)
        starts_ref = refs.pop(0)  # scalar-prefetch (P,)
        advstats_ref = refs.pop(0)  # SMEM (P, 2)
        hyper_ref = refs.pop(0)  # SMEM (P, 3)
        data_refs = [refs.pop(0) for _ in range(6)]
        win = [refs.pop(0) for _ in range(NP)]
        muin = [refs.pop(0) for _ in range(NP)]
        nuin = [refs.pop(0) for _ in range(NP)]
        wout = [refs.pop(0) for _ in range(NP)]
        muout = [refs.pop(0) for _ in range(NP)]
        nuout = [refs.pop(0) for _ in range(NP)]
        mets = refs.pop(0)  # SMEM (P, 4)
        gacc = refs  # NP scratch blocks

        i = pl.program_id(0)
        p, t, c = decode(i)

        @pl.when(i == 0)
        def _():
            for k in range(NP):
                wout[k][:] = win[k][:]
                muout[k][:] = muin[k][:]
                nuout[k][:] = nuin[k][:]
                gacc[k][:] = jnp.zeros_like(gacc[k])

        # ---- pass boundary: per-PART clip + Adam for the finished pass
        @pl.when((i > 0) & (i % cpp == 0))
        def _():
            q = i // cpp - 1
            lr = hyper_ref[q, 0]
            bc1 = hyper_ref[q, 1]
            bc2 = hyper_ref[q, 2]
            for lo, hi in ((0, NA), (NA, NP)):
                sq = jnp.float32(0.0)
                for k in range(lo, hi):
                    sq += jnp.sum(gacc[k][:] * gacc[k][:])
                gn = jnp.sqrt(sq)
                big = (gn >= max_grad_norm).astype(jnp.float32)
                scale = big * (
                    max_grad_norm / jnp.maximum(gn, jnp.float32(1e-30))
                ) + (1.0 - big)
                for k in range(lo, hi):
                    g = gacc[k][:] * scale
                    mu = b1 * muout[k][:] + (1.0 - b1) * g
                    nu = b2 * nuout[k][:] + (1.0 - b2) * g * g
                    muout[k][:] = mu
                    nuout[k][:] = nu
                    wout[k][:] = wout[k][:] - lr * (mu * bc1) / (
                        jnp.sqrt(nu * bc2) + adam_eps
                    )
                    gacc[k][:] = jnp.zeros_like(gacc[k])

        @pl.when((i % cpp == 0) & (i < P * cpp))
        def _():
            for k in range(4):
                mets[p, k] = 0.0

        @pl.when(i < P * cpp)
        def _():
            (obs_ref, act_ref, logp_ref, oldv_ref, adv_ref,
             tgt_ref) = data_refs
            adv_mean = advstats_ref[p, 0]
            adv_inv_std = advstats_ref[p, 1]
            dn00 = (((0,), (0,)), ((), ()))
            dn10 = (((1,), (0,)), ((), ()))
            dn11 = (((1,), (1,)), ((), ()))
            one = jnp.bfloat16(1.0)
            aw0 = wout[0][:].astype(jnp.bfloat16)
            ab0 = wout[1][:]
            aw1 = wout[2][:].astype(jnp.bfloat16)
            ab1 = wout[3][:]
            awc = wout[4][:]
            abc = wout[5][:]
            cw0 = wout[6][:].astype(jnp.bfloat16)
            cb0 = wout[7][:]
            cw1 = wout[8][:].astype(jnp.bfloat16)
            cb1 = wout[9][:]
            cwv = wout[10][:]
            cbv = wout[11][:]

            for lt in range(TB):
                # ---- critic on the joint-feature flatten ----
                xc = obs_ref[lt].reshape(L * N, Mc)
                z1c = jax.lax.dot_general(
                    cw0, xc, dn00, preferred_element_type=jnp.float32
                )
                h1c = jnp.tanh((z1c + cb0.T).astype(jnp.bfloat16))
                z2c = jax.lax.dot_general(
                    cw1, h1c, dn00, preferred_element_type=jnp.float32
                )
                h2c = jnp.tanh((z2c + cb1.T).astype(jnp.bfloat16))
                h2cf = h2c.astype(jnp.float32)
                value = (
                    jax.lax.dot_general(
                        cwv, h2cf, dn00,
                        preferred_element_type=jnp.float32,
                    )
                    + cbv.T
                )  # (N, Mc)
                old_value = oldv_ref[lt].reshape(N, Mc)
                target = tgt_ref[lt].reshape(N, Mc)
                vdiff = value - old_value
                v_clip = old_value + jnp.clip(vdiff, -eps, eps)
                e1 = value - target
                e2 = v_clip - target
                use_e1 = (e1 * e1) >= (e2 * e2)
                inside_v = ((vdiff > -eps) & (vdiff < eps)).astype(
                    jnp.float32
                )
                dvalue = (vf_coef * inv_n) * jnp.where(
                    use_e1, e1, e2 * inside_v
                )
                dh2c = jax.lax.dot_general(
                    cwv, dvalue, dn10, preferred_element_type=jnp.float32
                )
                dz2c = dh2c.astype(jnp.bfloat16) * (one - h2c * h2c)
                dh1c = jax.lax.dot_general(
                    cw1, dz2c, dn10, preferred_element_type=jnp.float32
                )
                dz1c = dh1c.astype(jnp.bfloat16) * (one - h1c * h1c)
                gacc[6][:] += jax.lax.dot_general(
                    xc, dz1c, dn11, preferred_element_type=jnp.float32
                )
                gacc[7][:] += jnp.sum(
                    dz1c.astype(jnp.float32), axis=1, keepdims=True
                ).T
                gacc[8][:] += jax.lax.dot_general(
                    h1c, dz2c, dn11, preferred_element_type=jnp.float32
                )
                gacc[9][:] += jnp.sum(
                    dz2c.astype(jnp.float32), axis=1, keepdims=True
                ).T
                gacc[10][:] += jax.lax.dot_general(
                    h2cf, dvalue, dn11, preferred_element_type=jnp.float32
                )
                gacc[11][:] += jnp.sum(dvalue, axis=1, keepdims=True).T
                mets[p, 1] += jnp.sum(0.5 * jnp.maximum(e1 * e1, e2 * e2))

                # ---- actor (agents folded into Ma columns; zero local
                # value-head gradient) ----
                xa = obs_ref[lt].reshape(L, Ma)
                z1 = jax.lax.dot_general(
                    aw0, xa, dn00, preferred_element_type=jnp.float32
                )
                h1b = jnp.tanh((z1 + ab0.T).astype(jnp.bfloat16))
                z2 = jax.lax.dot_general(
                    aw1, h1b, dn00, preferred_element_type=jnp.float32
                )
                h2b = jnp.tanh((z2 + ab1.T).astype(jnp.bfloat16))
                h2f = h2b.astype(jnp.float32)
                hcat = (
                    jax.lax.dot_general(
                        awc, h2f, dn00,
                        preferred_element_type=jnp.float32,
                    )
                    + abc.T
                )
                logits = hcat[:A]
                action = act_ref[lt].reshape(1, Ma)
                old_logp = logp_ref[lt].reshape(1, Ma)
                adv = adv_ref[lt].reshape(1, Ma)
                mx = jnp.max(logits, axis=0, keepdims=True)
                sm = jnp.exp(logits - mx)
                z = jnp.sum(sm, axis=0, keepdims=True)
                lsm = logits - mx - jnp.log(z)
                pr = sm / z
                onehot = (
                    jax.lax.broadcasted_iota(jnp.int32, (A, Ma), 0)
                    == action
                )
                logp = jnp.sum(
                    jnp.where(onehot, lsm, 0.0), axis=0, keepdims=True
                )
                ratio = jnp.exp(logp - old_logp)
                advn = (adv - adv_mean) * adv_inv_std
                ratio_c = jnp.clip(ratio, 1.0 - eps, 1.0 + eps)
                pg1 = ratio * advn
                pg2 = ratio_c * advn
                obj = jnp.minimum(pg1, pg2)
                use1 = pg1 <= pg2
                inside = ((ratio > 1.0 - eps) & (ratio < 1.0 + eps)).astype(
                    jnp.float32
                )
                dobj_dratio = jnp.where(use1, advn, advn * inside)
                dlogp = -inv_n * dobj_dratio * ratio
                ent = -jnp.sum(pr * lsm, axis=0, keepdims=True)
                dlogits = dlogp * (onehot.astype(jnp.float32) - pr) + (
                    ent_coef * inv_n
                ) * pr * (lsm + ent)
                dcat = jnp.concatenate(
                    [dlogits, jnp.zeros((1, Ma), jnp.float32)], axis=0
                )
                dh2 = jax.lax.dot_general(
                    awc, dcat, dn10, preferred_element_type=jnp.float32
                )
                dz2b = dh2.astype(jnp.bfloat16) * (one - h2b * h2b)
                dh1 = jax.lax.dot_general(
                    aw1, dz2b, dn10, preferred_element_type=jnp.float32
                )
                dz1b = dh1.astype(jnp.bfloat16) * (one - h1b * h1b)
                gacc[0][:] += jax.lax.dot_general(
                    xa, dz1b, dn11, preferred_element_type=jnp.float32
                )
                gacc[1][:] += jnp.sum(
                    dz1b.astype(jnp.float32), axis=1, keepdims=True
                ).T
                gacc[2][:] += jax.lax.dot_general(
                    h1b, dz2b, dn11, preferred_element_type=jnp.float32
                )
                gacc[3][:] += jnp.sum(
                    dz2b.astype(jnp.float32), axis=1, keepdims=True
                ).T
                gacc[4][:] += jax.lax.dot_general(
                    h2f, dcat, dn11, preferred_element_type=jnp.float32
                )
                gacc[5][:] += jnp.sum(dcat, axis=1, keepdims=True).T
                mets[p, 0] += jnp.sum(obj)
                mets[p, 2] += jnp.sum(ent)
                mets[p, 3] += jnp.sum((ratio - 1.0) - (logp - old_logp))

    def tblk(i, sel):
        p, t, c = decode(i)
        return (sel[p] // TB + t) % (T_full // TB)

    def obs_map(i, sel):
        p, t, c = decode(i)
        return (tblk(i, sel), 0, 0, c, 0)

    def vec_map(i, sel):
        p, t, c = decode(i)
        return (tblk(i, sel), 0, c, 0)

    def cmap(shape):
        return lambda i, sel: tuple(0 for _ in shape)

    def cblock(shape):
        return pl.BlockSpec(shape, cmap(shape), memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # advstats (P, 2)
        pl.BlockSpec(memory_space=pltpu.SMEM),  # hyper (P, 3)
        pl.BlockSpec(
            (TB, L, N, rb_chunk, LANE), obs_map, memory_space=pltpu.VMEM
        ),
    ]
    in_specs += [
        pl.BlockSpec(
            (TB, N, rb_chunk, LANE), vec_map, memory_space=pltpu.VMEM
        )
        for _ in range(5)
    ]
    in_specs += [cblock(s) for s in pshapes] * 3
    out_specs = [cblock(s) for s in pshapes] * 3
    out_specs.append(
        pl.BlockSpec((P, 4), lambda i, sel: (0, 0),
                     memory_space=pltpu.SMEM)
    )
    out_shape = (
        [jax.ShapeDtypeStruct(s, jnp.float32) for s in pshapes] * 3
        + [jax.ShapeDtypeStruct((P, 4), jnp.float32)]
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(total,),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=[pltpu.VMEM(s, jnp.float32) for s in pshapes],
        ),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024
        ),
        interpret=interpret,
    )

    def update(aparams, amu, anu, cparams, cmu, cnu, batch, starts,
               advstats, hyper):
        obs, action, old_logp, old_value, adv, target = batch
        arrays = (
            list(aparams) + list(cparams)
            + list(amu) + list(cmu)
            + list(anu) + list(cnu)
        )
        inputs = (
            [jnp.asarray(starts, jnp.int32),
             advstats.astype(jnp.float32), hyper.astype(jnp.float32),
             obs.astype(jnp.bfloat16), action.astype(jnp.int32),
             old_logp.astype(jnp.float32), old_value.astype(jnp.float32),
             adv.astype(jnp.float32), target.astype(jnp.float32)]
            + [a.astype(jnp.float32) for a in arrays]
        )
        outs = list(call(*inputs))
        new_w = outs[:NP]
        new_mu = outs[NP:2 * NP]
        new_nu = outs[2 * NP:3 * NP]
        mets = outs[3 * NP]
        return (
            new_w[:NA], new_mu[:NA], new_nu[:NA],
            new_w[NA:], new_mu[NA:], new_nu[NA:], mets,
        )

    update.n_passes = P
    update.time_block = TB
    return update
