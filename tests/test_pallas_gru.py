"""Pallas GRU sequence kernels (ops/pallas_gru) vs the XLA scan and
jax.grad, in interpret mode on CPU."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rware_tpu.models.ippo_rnn import _gru_cell_fwd, _gru_scan
from rware_tpu.ops.pallas_gru import build_gru_seq_bwd, build_gru_seq_fwd

HG = 16
T, N, RB, LANE = 8, 2, 2, 128


def _inputs(seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 8)
    wh = (jax.random.normal(ks[0], (HG, 3 * HG)) * 0.3).astype(jnp.bfloat16)
    bhn = jax.random.normal(ks[1], (HG,)) * 0.1
    # fused [ir | iz | in] gate tensor, bf16-rounded (the kernel streams
    # bf16; the XLA reference consumes the same rounded values)
    iall = (
        jax.random.normal(ks[2], (T, N, RB, LANE, 3 * HG))
        .astype(jnp.bfloat16)
        .astype(jnp.float32)
    )
    done = (jax.random.uniform(ks[5], (T, 1, RB, LANE)) < 0.25).astype(
        jnp.bfloat16
    )
    h0 = (jax.random.normal(ks[6], (N, RB, LANE, HG)) * 0.5).astype(
        jnp.bfloat16
    )
    dout = jax.random.normal(ks[7], (T, N, RB, LANE, HG))
    return wh, bhn, iall, done, h0, dout


def _split(iall):
    return iall[..., :HG], iall[..., HG:2 * HG], iall[..., 2 * HG:]


def test_fwd_kernel_matches_xla_scan():
    wh, bhn, iall, done, h0, _ = _inputs()
    fwd = build_gru_seq_fwd(T, N, RB, HG, interpret=True)
    hseq_k = jax.jit(fwd)(wh, bhn, iall, done, h0)
    ir, iz, inn = _split(iall)
    hseq_x = _gru_scan(HG, wh, bhn, ir, iz, inn, done, h0)
    np.testing.assert_array_equal(
        np.asarray(hseq_k, np.float32), np.asarray(hseq_x, np.float32)
    )


def test_bwd_kernel_matches_autodiff():
    wh, bhn, iall, done, h0, dout = _inputs(1)
    fwd = build_gru_seq_fwd(T, N, RB, HG, interpret=True)
    bwd = build_gru_seq_bwd(T, N, RB, HG, interpret=True)
    hseq = jax.jit(fwd)(wh, bhn, iall, done, h0)
    dwh, dbhn, d_iall, dh0 = jax.jit(bwd)(
        wh, bhn, iall, done, h0, hseq, dout
    )

    def ref(args):
        wh, bhn, iall, h0 = args
        ir, iz, inn = _split(iall)

        def cell(h, xs):
            ir_t, iz_t, inn_t, m_t = xs
            return _gru_cell_fwd(HG, wh, bhn, h, ir_t, iz_t, inn_t, m_t)

        _, hseq = jax.lax.scan(cell, h0, (ir, iz, inn, done))
        return jnp.sum(hseq.astype(jnp.float32) * dout)

    g = jax.grad(ref)((wh, bhn, iall, h0))
    for name, a, b in zip(
        ["wh", "bhn", "iall", "h0"], [dwh, dbhn, d_iall, dh0], g
    ):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        scale = max(np.abs(b).max(), 1e-6)
        # bf16 cotangent streams bound the agreement
        assert np.abs(a - b).max() / scale < 3e-2, name


def test_native_replay_pallas_impl_matches_xla():
    """_gru_native_replay value+grads agree between the XLA scan and the
    pallas sequence kernels (interpret)."""
    from rware_tpu.models import ippo_rnn
    from rware_tpu.models.networks import RecurrentActorCritic

    L = 31
    model = RecurrentActorCritic(n_actions=5, hidden=HG, embed=12)
    key = jax.random.key(0)
    params = model.init(
        key, model.initialize_carry((1, N)), jnp.zeros((1, N, L))
    )
    k1, k2 = jax.random.split(key)
    obs = jax.random.normal(k1, (T, N, RB, LANE, L)).astype(jnp.bfloat16)
    done = (jax.random.uniform(k2, (T, 1, RB, LANE)) < 0.2).astype(
        jnp.int32
    )
    h0 = jnp.zeros((N, RB, LANE, HG), jnp.bfloat16)

    def loss(params):
        logits, value = ippo_rnn._gru_native_replay(
            model, params, obs, done, h0
        )
        return jnp.sum(logits * logits) * 1e-3 + jnp.sum(value * value) * 1e-3

    old = ippo_rnn.GRU_SEQ_IMPL
    try:
        ippo_rnn.GRU_SEQ_IMPL = "xla"
        v1, g1 = jax.value_and_grad(loss)(params)
        ippo_rnn.GRU_SEQ_IMPL = "pallas_interpret"
        v2, g2 = jax.value_and_grad(loss)(params)
    finally:
        ippo_rnn.GRU_SEQ_IMPL = old

    np.testing.assert_allclose(
        float(v1), float(v2), rtol=5e-3
    )
    flat1 = jax.tree.leaves(g1)
    flat2 = jax.tree.leaves(g2)
    for a, b in zip(flat1, flat2):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        scale = max(np.abs(a).max(), 1e-5)
        assert np.abs(a - b).max() / scale < 4e-2


def test_rnn_fused_grads_match_autodiff():
    """rnn_fused_grads (loss-fused backward kernel + hand-derived
    embed/gate backward) == jax.grad of rnn_ppo_loss_native."""
    from rware_tpu.models import IPPOConfig
    from rware_tpu.models.ippo_rnn import (
        rnn_fused_grads,
        rnn_ppo_loss_native,
    )
    from rware_tpu.models.networks import RecurrentActorCritic

    L, A = 31, 5
    cfg = IPPOConfig(minibatches=1)
    model = RecurrentActorCritic(n_actions=A, hidden=HG, embed=12)
    params = model.init(
        jax.random.key(0), model.initialize_carry((1, N)),
        jnp.zeros((1, N, L)),
    )
    ks = jax.random.split(jax.random.key(1), 8)
    batch = (
        jax.random.normal(ks[0], (T, N, RB, LANE, L)).astype(jnp.bfloat16),
        (jax.random.uniform(ks[1], (T, 1, RB, LANE)) < 0.2).astype(
            jnp.int32
        ),
        jax.random.randint(ks[2], (T, N, RB, LANE), 0, A,
                           dtype=jnp.int32),
        jax.random.normal(ks[3], (T, N, RB, LANE)) * 0.1 - 1.6,
        jax.random.normal(ks[4], (T, N, RB, LANE)),
        jax.random.normal(ks[5], (T, N, RB, LANE)),
        jax.random.normal(ks[6], (T, N, RB, LANE)),
        (jax.random.normal(ks[7], (N, RB, LANE, HG)) * 0.3).astype(
            jnp.bfloat16
        ),
    )
    fused, fused_mets = jax.jit(
        lambda p, b: rnn_fused_grads(cfg, model, p, b, interpret=True)
    )(params, batch)
    (loss, ref_mets), ref = jax.jit(
        lambda p, b: jax.value_and_grad(
            lambda pp, bb: rnn_ppo_loss_native(cfg, model, pp, bb),
            has_aux=True,
        )(p, b)
    )(params, batch)

    for k in ("pg_loss", "v_loss", "entropy", "approx_kl"):
        np.testing.assert_allclose(
            float(fused_mets[k]), float(ref_mets[k]),
            rtol=3e-2, atol=3e-3, err_msg=k,
        )
    flat_r = dict(jax.tree_util.tree_flatten_with_path(ref)[0])
    for path, gg in jax.tree_util.tree_flatten_with_path(fused)[0]:
        r = np.asarray(flat_r[path], np.float32)
        gg = np.asarray(gg, np.float32)
        assert gg.shape == r.shape, path
        scale = max(np.abs(r).max(), 1e-6)
        np.testing.assert_allclose(
            gg, r, atol=0.06 * scale, err_msg=str(path)
        )
