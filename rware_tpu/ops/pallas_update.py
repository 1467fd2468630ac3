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
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rware_tpu.ops.pallas_rollout import LANE

_METRICS = ("pg_sum", "v_sum", "ent_sum", "kl_sum")


@dataclasses.dataclass(frozen=True)
class _UpdStatic:
    l: int  # obs length
    h1: int
    h2: int
    a: int  # n_actions
    t: int
    n: int  # agents
    mb_rows: int  # env rows per minibatch
    rb_chunk: int  # env rows per grid cell (M = rb_chunk * LANE <= ~4k,
    # keeping the ~6 live (H, M) f32 activations under the 16MB VMEM cap)
    clip_eps: float
    vf_coef: float
    ent_coef: float
    # perf-bisect: 0=full, 1=no wgrad matmuls, 2=forward+loss only
    debug_level: int = 0


def _make_update_kernel(st: _UpdStatic):
    L, H1, H2, A = st.l, st.h1, st.h2, st.a
    M = st.rb_chunk * LANE
    inv_n = 1.0 / (st.t * st.n * st.mb_rows * LANE)
    eps = st.clip_eps

    def kernel(
        stats_ref,
        obs_ref, act_ref, logp_ref, oldv_ref, adv_ref, tgt_ref,
        w0_ref, b0_ref, w1_ref, b1_ref, wp_ref, bp_ref, wv_ref, bv_ref,
        dw0, db0, dw1, db1, dwp, dbp, dwv, dbv, mets,
    ):
        t = pl.program_id(0)
        n = pl.program_id(1)
        first = (t == 0) & (n == 0) & (pl.program_id(2) == 0)

        @pl.when(first)
        def _():
            dw0[:] = jnp.zeros_like(dw0)
            db0[:] = jnp.zeros_like(db0)
            dw1[:] = jnp.zeros_like(dw1)
            db1[:] = jnp.zeros_like(db1)
            dwp[:] = jnp.zeros_like(dwp)
            dbp[:] = jnp.zeros_like(dbp)
            dwv[:] = jnp.zeros_like(dwv)
            dbv[:] = jnp.zeros_like(dbv)
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
        logits = (
            jax.lax.dot_general(
                wp_ref[:], h2f, dn00, preferred_element_type=jnp.float32
            )
            + bp_ref[:].T
        )  # (A, M)
        value = (
            jax.lax.dot_general(
                wv_ref[:], h2f, dn00, preferred_element_type=jnp.float32
            )
            + bv_ref[:].T
        )  # (1, M)

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
            dh2 = (
                jax.lax.dot_general(
                    wp_ref[:], dlogits, dn10,
                    preferred_element_type=jnp.float32,
                )
                + wv_ref[:] * dvalue
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
            dwp[:] += jax.lax.dot_general(
                h2f, dlogits, dn11, preferred_element_type=jnp.float32
            )  # (H2, A)
            dbp[:] += jnp.sum(dlogits, axis=1, keepdims=True).T
            dwv[:] += jax.lax.dot_general(
                h2f, dvalue, dn11, preferred_element_type=jnp.float32
            )  # (H2, 1)
            dbv[:] += jnp.sum(dvalue, axis=1, keepdims=True).T
        elif st.debug_level == 1:
            # dgrads computed but wgrad matmuls skipped; keep the dgrad
            # chain alive through the bias-grad sums
            db0[:] += jnp.sum(
                dz1b.astype(jnp.float32), axis=1, keepdims=True
            ).T
            db1[:] += jnp.sum(
                dz2b.astype(jnp.float32), axis=1, keepdims=True
            ).T
            dbv[:] += jnp.sum(dvalue, axis=1, keepdims=True).T

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
):
    """Returns ``grads(params, batch) -> (grads_pytree, metrics_dict)``.

    ``batch`` is a native-layout minibatch tuple (obs (T, L, N, mb_rows,
    LANE) bf16, action/old_logp/old_value/adv/target (T, N, mb_rows, LANE));
    ``params`` the flax ActorCritic params pytree.  Gradients are exact for
    the clipped-PPO loss of models.ippo_pallas.ppo_loss_native (bf16 hidden
    matmuls, f32 accumulation/heads) and returned as an f32 pytree matching
    ``params``; metrics are the standard PPO diagnostics.
    """
    L, (H1, H2), A = obs_len, hidden, n_actions
    T, N = rollout_len, n_agents
    # chunk the env-rows axis so M = rb_chunk*LANE stays <= 4096 (VMEM cap)
    rb_chunk = mb_rows
    while rb_chunk > 32 or mb_rows % rb_chunk:
        rb_chunk -= 1
    st = _UpdStatic(
        l=L, h1=H1, h2=H2, a=A, t=T, n=N, mb_rows=mb_rows,
        rb_chunk=rb_chunk,
        clip_eps=clip_eps, vf_coef=vf_coef, ent_coef=ent_coef,
        debug_level=debug_level,
    )
    kernel = _make_update_kernel(st)
    n_total = T * N * mb_rows * LANE
    inv_n = 1.0 / n_total

    grid = (T, N, mb_rows // rb_chunk)

    def cblock(shape):
        return pl.BlockSpec(
            shape, lambda t, n, c: tuple(0 for _ in shape),
            memory_space=pltpu.VMEM,
        )

    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]  # adv stats (2,)
    in_specs += [
        pl.BlockSpec(
            (1, L, 1, rb_chunk, LANE),
            lambda t, n, c: (t, 0, n, c, 0),
            memory_space=pltpu.VMEM,
        )
    ]
    in_specs += [
        pl.BlockSpec(
            (1, 1, rb_chunk, LANE),
            lambda t, n, c: (t, n, c, 0),
            memory_space=pltpu.VMEM,
        )
        for _ in range(5)
    ]
    in_specs += [
        cblock((L, H1)), cblock((1, H1)), cblock((H1, H2)), cblock((1, H2)),
        cblock((H2, A)), cblock((1, A)), cblock((H2, 1)), cblock((1, 1)),
    ]

    out_specs = [
        cblock((L, H1)), cblock((1, H1)), cblock((H1, H2)), cblock((1, H2)),
        cblock((H2, A)), cblock((1, A)), cblock((H2, 1)), cblock((1, 1)),
        pl.BlockSpec(
            (len(_METRICS),), lambda t, n, c: (0,), memory_space=pltpu.SMEM
        ),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((L, H1), jnp.float32),
        jax.ShapeDtypeStruct((1, H1), jnp.float32),
        jax.ShapeDtypeStruct((H1, H2), jnp.float32),
        jax.ShapeDtypeStruct((1, H2), jnp.float32),
        jax.ShapeDtypeStruct((H2, A), jnp.float32),
        jax.ShapeDtypeStruct((1, A), jnp.float32),
        jax.ShapeDtypeStruct((H2, 1), jnp.float32),
        jax.ShapeDtypeStruct((1, 1), jnp.float32),
        jax.ShapeDtypeStruct((len(_METRICS),), jnp.float32),
    ]

    def grads(params, batch):
        obs, action, old_logp, old_value, adv, target = batch
        p = params["params"]
        adv_mean = adv.mean()
        adv_inv_std = 1.0 / (adv.std() + 1e-8)
        stats = jnp.stack([adv_mean, adv_inv_std]).astype(jnp.float32)
        inputs = [
            stats,
            obs.astype(jnp.bfloat16),
            action.astype(jnp.int32),
            old_logp.astype(jnp.float32),
            old_value.astype(jnp.float32),
            adv.astype(jnp.float32),
            target.astype(jnp.float32),
            p["dense_0"]["kernel"].astype(jnp.bfloat16),
            p["dense_0"]["bias"].astype(jnp.float32)[None, :],
            p["dense_1"]["kernel"].astype(jnp.bfloat16),
            p["dense_1"]["bias"].astype(jnp.float32)[None, :],
            p["policy"]["kernel"].astype(jnp.float32),
            p["policy"]["bias"].astype(jnp.float32)[None, :],
            p["value"]["kernel"].astype(jnp.float32),
            p["value"]["bias"].astype(jnp.float32)[None, :],
        ]
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )(*inputs)
        (gw0, gb0, gw1, gb1, gwp, gbp, gwv, gbv, mets) = outs
        grads_tree = {
            "params": {
                "dense_0": {"kernel": gw0, "bias": gb0[0]},
                "dense_1": {"kernel": gw1, "bias": gb1[0]},
                "policy": {"kernel": gwp, "bias": gbp[0]},
                "value": {"kernel": gwv, "bias": gbv[0]},
            }
        }
        metrics = {
            "pg_loss": -mets[0] * inv_n,
            "v_loss": mets[1] * inv_n,
            "entropy": mets[2] * inv_n,
            "approx_kl": mets[3] * inv_n,
        }
        return grads_tree, metrics

    return grads
