"""Fused PPO gradient kernel (ops/pallas_update) vs XLA autodiff of
ppo_loss_native — interpret mode on CPU."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import rware_tpu
from rware_tpu.models import ActorCritic, IPPOConfig
from rware_tpu.models.ippo_pallas import ppo_loss_native
from rware_tpu.ops.pallas_rollout import LANE
from rware_tpu.ops.pallas_update import build_fused_ppo_grads


@pytest.fixture(scope="module")
def case():
    T, N, L, RB = 4, 2, 71, 8
    cfg = IPPOConfig(minibatches=1)
    model = ActorCritic(n_actions=5)
    key = jax.random.key(0)
    params = model.init(key, jnp.zeros((1, N, L)))
    ks = jax.random.split(key, 6)
    batch = (
        jax.random.normal(ks[0], (T, L, N, RB, LANE)).astype(jnp.bfloat16),
        jax.random.randint(ks[1], (T, N, RB, LANE), 0, 5, dtype=jnp.int32),
        jax.random.normal(ks[2], (T, N, RB, LANE)) * 0.1 - 1.6,
        jax.random.normal(ks[3], (T, N, RB, LANE)),
        jax.random.normal(ks[4], (T, N, RB, LANE)),
        jax.random.normal(ks[5], (T, N, RB, LANE)),
    )
    return cfg, model, params, batch


def test_fused_grads_match_autodiff(case):
    cfg, model, params, batch = case
    T, L, N, RB, _ = batch[0].shape

    grads_fn = build_fused_ppo_grads(
        obs_len=L, hidden=(128, 128), n_actions=5, rollout_len=T,
        n_agents=N, mb_rows=RB, clip_eps=cfg.clip_eps, vf_coef=cfg.vf_coef,
        ent_coef=cfg.ent_coef, interpret=True,
    )
    fused_grads, fused_metrics = jax.jit(grads_fn)(params, batch)

    (loss, ref_metrics), ref_grads = jax.jit(
        lambda p, b: jax.value_and_grad(
            ppo_loss_native, argnums=1, has_aux=True
        )(cfg, p, b)
    )(params, batch)

    for k in ("pg_loss", "v_loss", "entropy", "approx_kl"):
        np.testing.assert_allclose(
            float(fused_metrics[k]), float(ref_metrics[k]),
            rtol=2e-2, atol=2e-3, err_msg=k,
        )

    flat_f, _ = jax.tree_util.tree_flatten_with_path(fused_grads)
    flat_r = dict(jax.tree_util.tree_flatten_with_path(ref_grads)[0])
    for path, g in flat_f:
        r = np.asarray(flat_r[path])
        g = np.asarray(g)
        assert g.shape == r.shape, path
        scale = max(np.abs(r).max(), 1e-6)
        np.testing.assert_allclose(
            g, r, atol=0.05 * scale, err_msg=str(path)
        )


def test_fused_grads_zero_copy_window_matches_sliced(case):
    """dataset_len mode (scalar-prefetch index-map minibatching) produces
    the same gradients as slicing the wrapped window out host-side —
    including a start that wraps around the trajectory end."""
    cfg, model, params, batch = case
    T, L, N, RB, _ = batch[0].shape
    mbt = T // 2
    kw = dict(
        obs_len=L, hidden=(128, 128), n_actions=5, rollout_len=mbt,
        n_agents=N, mb_rows=RB, clip_eps=cfg.clip_eps, vf_coef=cfg.vf_coef,
        ent_coef=cfg.ent_coef, interpret=True,
    )
    zc = build_fused_ppo_grads(dataset_len=T, **kw)
    sliced = build_fused_ppo_grads(**kw)
    for start in (0, 1, T - 1):  # T-1 wraps around the end
        idx = [(start + t) % T for t in range(mbt)]
        window = tuple(jnp.take(x, jnp.asarray(idx), axis=0) for x in batch)
        g1, m1 = jax.jit(zc)(params, batch, jnp.int32(start))
        g2, m2 = jax.jit(sliced)(params, window)
        for (p1, a), (p2, b) in zip(
            jax.tree_util.tree_flatten_with_path(g1)[0],
            jax.tree_util.tree_flatten_with_path(g2)[0],
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6,
                err_msg=f"start={start} {p1}",
            )
        for k in m1:
            np.testing.assert_allclose(
                float(m1[k]), float(m2[k]), rtol=1e-6, atol=1e-6,
                err_msg=f"start={start} {k}",
            )


def test_native_train_step_fused_update_runs():
    from rware_tpu.models.ippo_pallas import (
        build_pallas_train_step,
        init_pallas_runner,
    )
    from rware_tpu.ops.pallas_rollout import ENV_BLOCK

    env = rware_tpu.make("rware-tiny-2ag-v2")
    cfg = IPPOConfig(n_envs=ENV_BLOCK, rollout_len=8, epochs=1, minibatches=2)
    runner, model, tx = init_pallas_runner(env, cfg, jax.random.key(0))
    ts = jax.jit(
        build_pallas_train_step(
            env, model, tx, cfg, interpret=True, deterministic_collect=True,
            fused_update=True,
        )
    )
    new_runner, metrics = ts(runner)
    assert int(new_runner.update_idx) == 1
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    diffs = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), runner.params,
        new_runner.params,
    )
    assert max(jax.tree.leaves(diffs)) > 0


def test_fused_grads_match_autodiff_msg():
    """Message-head variant: joint move+Bernoulli logp/entropy gradients."""
    T, N, L, RB, MB = 4, 2, 79, 8, 2
    cfg = IPPOConfig(minibatches=1)
    model = ActorCritic(n_actions=5, msg_bits=MB)
    params = model.init(jax.random.key(0), jnp.zeros((1, N, L)))
    ks = jax.random.split(jax.random.key(0), 7)
    batch = (
        jax.random.normal(ks[0], (T, L, N, RB, LANE)).astype(jnp.bfloat16),
        jax.random.randint(ks[1], (T, N, RB, LANE), 0, 5, dtype=jnp.int32),
        jax.random.normal(ks[2], (T, N, RB, LANE)) * 0.1 - 2.8,
        jax.random.normal(ks[3], (T, N, RB, LANE)),
        jax.random.normal(ks[4], (T, N, RB, LANE)),
        jax.random.normal(ks[5], (T, N, RB, LANE)),
        jax.random.randint(ks[6], (T, N * MB, RB, LANE), 0, 2, dtype=jnp.int32),
    )
    grads_fn = build_fused_ppo_grads(
        obs_len=L, hidden=(128, 128), n_actions=5, rollout_len=T,
        n_agents=N, mb_rows=RB, clip_eps=cfg.clip_eps, vf_coef=cfg.vf_coef,
        ent_coef=cfg.ent_coef, interpret=True, msg_bits=MB,
    )
    fused_grads, fused_metrics = jax.jit(grads_fn)(params, batch)
    (loss, ref_metrics), ref_grads = jax.jit(
        lambda p, b: jax.value_and_grad(
            ppo_loss_native, argnums=1, has_aux=True
        )(cfg, p, b)
    )(params, batch)
    for k in ("pg_loss", "v_loss", "entropy", "approx_kl"):
        np.testing.assert_allclose(
            float(fused_metrics[k]), float(ref_metrics[k]),
            rtol=3e-2, atol=3e-3, err_msg=k,
        )
    flat_r = dict(jax.tree_util.tree_flatten_with_path(ref_grads)[0])
    for path, g in jax.tree_util.tree_flatten_with_path(fused_grads)[0]:
        r = np.asarray(flat_r[path])
        g = np.asarray(g)
        assert g.shape == r.shape, path
        scale = max(np.abs(r).max(), 1e-6)
        np.testing.assert_allclose(g, r, atol=0.05 * scale, err_msg=str(path))


def test_fused_seac_grads_match_autodiff():
    """Per-agent SEAC-PPO gradient kernel vs jax.grad of an independent
    native-layout re-derivation of models.seac's minibatch_loss."""
    from rware_tpu.models.ippo_pallas import _native_forward
    from rware_tpu.models.seac import SEACPPOConfig
    from rware_tpu.ops.pallas_update import build_fused_seac_ppo_grads

    T, N, L, RB = 4, 3, 23, 4
    cfg = SEACPPOConfig(minibatches=1)
    model = ActorCritic(n_actions=5, hidden=(32, 32))
    params = jax.vmap(
        lambda k: model.init(k, jnp.zeros((1, L)))
    )(jax.random.split(jax.random.key(0), N))
    ks = jax.random.split(jax.random.key(1), 6)
    batch = (
        jax.random.normal(ks[0], (T, L, N, RB, LANE)).astype(jnp.bfloat16),
        jax.random.randint(ks[1], (T, N, RB, LANE), 0, 5, dtype=jnp.int32),
        jax.random.normal(ks[2], (T, N, RB, LANE)) * 0.1 - 1.6,
        jax.random.normal(ks[3], (T, N, N, RB, LANE)),
        jax.random.normal(ks[4], (T, N, N, RB, LANE)),
        jax.random.normal(ks[5], (T, N, N, RB, LANE)),
    )
    grads_fn = build_fused_seac_ppo_grads(
        obs_len=L, hidden=(32, 32), n_actions=5, rollout_len=T,
        n_agents=N, mb_rows=RB, clip_eps=cfg.clip_eps, vf_coef=cfg.vf_coef,
        ent_coef=cfg.ent_coef, seac_lambda=cfg.seac_lambda, interpret=True,
    )
    fused_grads, fused_metrics = jax.jit(grads_fn)(params, batch)

    eye = jnp.eye(N)

    def ref_loss(params, batch):
        obs, action, behav, oldv, adv, tgt = batch
        logits, values = jax.vmap(
            lambda p: _native_forward(p, obs), out_axes=1
        )(params)  # (T, Ni, Nj, RB, LANE[, A])
        lsm = jax.nn.log_softmax(logits)
        onehot = (
            jax.lax.broadcasted_iota(jnp.int32, logits.shape, 5)
            == action[:, None, ..., None]
        )
        logp = jnp.sum(jnp.where(onehot, lsm, 0.0), -1)
        ratio = jnp.exp(logp - behav[:, None])
        advn = (adv - adv.mean()) / (adv.std() + 1e-8)
        pg1 = ratio * advn
        pg2 = jnp.clip(ratio, 1 - cfg.clip_eps, 1 + cfg.clip_eps) * advn
        surr = -jnp.minimum(pg1, pg2)
        w = (eye + cfg.seac_lambda * (1.0 - eye))[None, :, :, None, None]
        pg_loss = (surr * w).sum(2).mean()
        v_clip = oldv + jnp.clip(values - oldv, -cfg.clip_eps, cfg.clip_eps)
        v_err = jnp.maximum((values - tgt) ** 2, (v_clip - tgt) ** 2)
        v_loss = 0.5 * (v_err * w).sum(2).mean()
        ent = -(jnp.exp(lsm) * lsm).sum(-1)
        entropy = jnp.diagonal(ent, axis1=1, axis2=2).mean()
        total = pg_loss + cfg.vf_coef * v_loss - cfg.ent_coef * entropy
        own_ratio = jnp.diagonal(ratio, axis1=1, axis2=2)
        return total, {
            "pg_loss": pg_loss,
            "v_loss": v_loss,
            "entropy": entropy,
            "approx_kl": ((own_ratio - 1) - jnp.log(own_ratio)).mean(),
        }

    (loss, ref_metrics), ref_grads = jax.jit(
        jax.value_and_grad(ref_loss, has_aux=True)
    )(params, batch)

    for k in ("pg_loss", "v_loss", "entropy", "approx_kl"):
        np.testing.assert_allclose(
            float(fused_metrics[k]), float(ref_metrics[k]),
            rtol=3e-2, atol=3e-3, err_msg=k,
        )
    flat_r = dict(jax.tree_util.tree_flatten_with_path(ref_grads)[0])
    for path, g in jax.tree_util.tree_flatten_with_path(fused_grads)[0]:
        r = np.asarray(flat_r[path])
        g = np.asarray(g)
        assert g.shape == r.shape, path
        scale = max(np.abs(r).max(), 1e-6)
        np.testing.assert_allclose(g, r, atol=0.06 * scale, err_msg=str(path))


def test_update_phase_kernel_matches_per_pass_path():
    """The whole-update-phase kernel (in-kernel clip+Adam across all
    E x M passes) produces the same parameters and metrics as the
    per-minibatch fused kernel + optax loop."""
    import rware_tpu
    from rware_tpu.models.ippo_pallas import (
        build_pallas_train_step,
        init_pallas_runner,
    )
    from rware_tpu.models import IPPOConfig

    env = rware_tpu.make("rware-tiny-2ag-v2")
    from rware_tpu.ops.pallas_rollout import ENV_BLOCK

    cfg = IPPOConfig(
        n_envs=ENV_BLOCK, rollout_len=8, epochs=2, minibatches=2
    )
    runner, model, tx = init_pallas_runner(env, cfg, jax.random.key(0))

    steps = {}
    for phase in (False, True):
        ts = jax.jit(
            build_pallas_train_step(
                env, model, tx, cfg, interpret=True,
                deterministic_collect=True, fused_update_phase=phase,
            )
        )
        r1, m1 = ts(runner)
        r2, m2 = ts(r1)
        steps[phase] = (r2, jax.tree.map(lambda x: x.mean(), m2))

    ra, ma = steps[False]
    rb, mb = steps[True]
    for (ka, a), (kb, b) in zip(
        jax.tree_util.tree_leaves_with_path(ra.params),
        jax.tree_util.tree_leaves_with_path(rb.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=2e-4, atol=2e-6, err_msg=str(ka),
        )
    # optax count advanced identically
    assert int(ra.opt_state[1][0].count) == int(rb.opt_state[1][0].count)
    for k in ma:
        np.testing.assert_allclose(
            float(ma[k]), float(mb[k]), rtol=2e-3, atol=1e-5, err_msg=k
        )


def test_update_phase_kernel_with_lr_schedule():
    """anneal_lr exercises the schedule-count handling of the phase
    kernel (per-pass lr rows + ScaleByScheduleState advance)."""
    import rware_tpu
    from rware_tpu.models.ippo_pallas import (
        build_pallas_train_step,
        init_pallas_runner,
    )
    from rware_tpu.models import IPPOConfig
    from rware_tpu.ops.pallas_rollout import ENV_BLOCK

    env = rware_tpu.make("rware-tiny-2ag-v2")
    cfg = IPPOConfig(
        n_envs=ENV_BLOCK, rollout_len=8, epochs=2, minibatches=2,
        anneal_lr=True, total_updates=10,
    )
    runner, model, tx = init_pallas_runner(env, cfg, jax.random.key(0))
    outs = {}
    for phase in (False, True):
        ts = jax.jit(
            build_pallas_train_step(
                env, model, tx, cfg, interpret=True,
                deterministic_collect=True, fused_update_phase=phase,
            )
        )
        r1, _ = ts(runner)
        r2, _ = ts(r1)
        outs[phase] = r2
    for a, b in zip(
        jax.tree.leaves(outs[False].params),
        jax.tree.leaves(outs[True].params),
    ):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=2e-4, atol=2e-6,
        )
    # both optax counts (adam + schedule) advanced identically
    fa = jax.tree.leaves(outs[False].opt_state)
    fb = jax.tree.leaves(outs[True].opt_state)
    for a, b in zip(fa, fb):
        if np.asarray(a).ndim == 0:
            assert int(a) == int(b)


def test_debug_level_pinned_out_of_production_reach():
    """debug_level != 0 alters dynamics/gradients (perf-bisect only): the
    public builders refuse it unless _unsafe_bisect=True is passed, so no
    production path can ship a partial kernel via a defaulted kwarg."""
    from rware_tpu.ops.pallas_rollout import build_pallas_rollout

    env = rware_tpu.make("rware-tiny-2ag-v2")
    with pytest.raises(ValueError, match="_unsafe_bisect"):
        build_pallas_rollout(env.config, 8, debug_level=3)
    with pytest.raises(ValueError, match="_unsafe_bisect"):
        build_fused_ppo_grads(
            obs_len=71, hidden=(128, 128), n_actions=5, rollout_len=4,
            n_agents=2, mb_rows=8, clip_eps=0.2, vf_coef=0.5,
            ent_coef=0.01, debug_level=1,
        )
    # the bisect escape hatch still constructs
    build_pallas_rollout(env.config, 8, debug_level=3, _unsafe_bisect=True)


# ---------------------------------------------------------------------------
# MAPPO combined actor+critic kernel (interpret mode)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def mappo_case():
    from rware_tpu.models.networks import CentralCritic

    T, N, L, RB = 4, 2, 71, 8
    cfg = IPPOConfig(minibatches=1)
    actor = ActorCritic(n_actions=5)
    critic = CentralCritic(n_agents=N)
    key = jax.random.key(1)
    ka, kc, *ks = jax.random.split(key, 8)
    params = {
        "actor": actor.init(ka, jnp.zeros((1, N, L))),
        "critic": critic.init(kc, jnp.zeros((1, N * L))),
    }
    batch = (
        jax.random.normal(ks[0], (T, L, N, RB, LANE)).astype(jnp.bfloat16),
        jax.random.randint(ks[1], (T, N, RB, LANE), 0, 5, dtype=jnp.int32),
        jax.random.normal(ks[2], (T, N, RB, LANE)) * 0.1 - 1.6,
        jax.random.normal(ks[3], (T, N, RB, LANE)),
        jax.random.normal(ks[4], (T, N, RB, LANE)),
        jax.random.normal(ks[5], (T, N, RB, LANE)),
    )
    return cfg, params, batch


def test_fused_mappo_grads_match_autodiff(mappo_case):
    """The combined actor+critic kernel's gradients equal jax.grad of
    models.mappo.mappo_loss_native for BOTH parts (the critic through the
    in-place joint-feature flatten + permuted dense_0 rows)."""
    from rware_tpu.models.mappo import mappo_loss_native
    from rware_tpu.ops.pallas_update import build_fused_mappo_grads

    cfg, params, batch = mappo_case
    T, L, N, RB, _ = batch[0].shape
    grads_fn = build_fused_mappo_grads(
        obs_len=L, hidden=(128, 128), n_actions=5, rollout_len=T,
        n_agents=N, mb_rows=RB, clip_eps=cfg.clip_eps, vf_coef=cfg.vf_coef,
        ent_coef=cfg.ent_coef, interpret=True,
    )
    fused_grads, fused_metrics = jax.jit(grads_fn)(params, batch)

    (loss, ref_metrics), ref_grads = jax.jit(
        lambda p, b: jax.value_and_grad(
            mappo_loss_native, argnums=1, has_aux=True
        )(cfg, p, b)
    )(params, batch)

    for k in ("pg_loss", "v_loss", "entropy", "approx_kl"):
        np.testing.assert_allclose(
            float(fused_metrics[k]), float(ref_metrics[k]),
            rtol=2e-2, atol=2e-3, err_msg=k,
        )
    flat_f, _ = jax.tree_util.tree_flatten_with_path(fused_grads)
    flat_r = dict(jax.tree_util.tree_flatten_with_path(ref_grads)[0])
    assert len(flat_f) == len(flat_r)
    for path, g in flat_f:
        r = np.asarray(flat_r[path])
        g = np.asarray(g)
        assert g.shape == r.shape, path
        scale = max(np.abs(r).max(), 1e-6)
        np.testing.assert_allclose(
            g, r, atol=0.05 * scale, err_msg=str(path)
        )


def test_fused_mappo_zero_copy_window_matches_sliced(mappo_case):
    from rware_tpu.ops.pallas_update import (
        build_fused_mappo_grads,
        phase_time_block,
    )

    cfg, params, batch = mappo_case
    T, L, N, RB, _ = batch[0].shape
    mbt = T // 2
    kw = dict(
        obs_len=L, hidden=(128, 128), n_actions=5, rollout_len=mbt,
        n_agents=N, mb_rows=RB, clip_eps=cfg.clip_eps, vf_coef=cfg.vf_coef,
        ent_coef=cfg.ent_coef, interpret=True,
    )
    zc = build_fused_mappo_grads(dataset_len=T, **kw)
    sliced = build_fused_mappo_grads(**kw)
    tb = phase_time_block(mbt)
    for start in (0, tb, T - tb):  # TB-aligned starts, incl. a wrap
        idx = [(start + t) % T for t in range(mbt)]
        window = tuple(jnp.take(x, jnp.asarray(idx), axis=0) for x in batch)
        g1, m1 = jax.jit(zc)(params, batch, jnp.int32(start))
        g2, m2 = jax.jit(sliced)(params, window)
        for (p1, a), (p2, b) in zip(
            jax.tree_util.tree_flatten_with_path(g1)[0],
            jax.tree_util.tree_flatten_with_path(g2)[0],
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6,
                err_msg=f"start={start} {p1}",
            )


def test_fused_critic_only_grads_match_autodiff(mappo_case):
    """with_actor=False (the recurrent-MAPPO critic path) matches jax.grad
    of the clipped value loss on the joint observation."""
    from rware_tpu.models.mappo import (
        _critic_native_forward,
        _joint_native,
    )
    from rware_tpu.ops.pallas_update import build_fused_mappo_grads

    cfg, params, batch = mappo_case
    obs = batch[0]
    old_value, target = batch[3], batch[5]
    T, L, N, RB, _ = obs.shape

    def loss(cp):
        value = _critic_native_forward(cp, _joint_native(obs))
        v_clipped = old_value + jnp.clip(
            value - old_value, -cfg.clip_eps, cfg.clip_eps
        )
        return cfg.vf_coef * 0.5 * jnp.maximum(
            (value - target) ** 2, (v_clipped - target) ** 2
        ).mean()

    ref_grads = jax.jit(jax.grad(loss))(params["critic"])
    grads_fn = build_fused_mappo_grads(
        obs_len=L, hidden=(128, 128), n_actions=5, rollout_len=T,
        n_agents=N, mb_rows=RB, clip_eps=cfg.clip_eps, vf_coef=cfg.vf_coef,
        ent_coef=cfg.ent_coef, interpret=True, with_actor=False,
    )
    fused, mets = jax.jit(grads_fn)(params["critic"], (obs, old_value, target))
    flat_f = jax.tree_util.tree_flatten_with_path(fused)[0]
    flat_r = dict(jax.tree_util.tree_flatten_with_path(ref_grads)[0])
    for path, g in flat_f:
        r = np.asarray(flat_r[path])
        scale = max(np.abs(r).max(), 1e-6)
        np.testing.assert_allclose(
            np.asarray(g), r, atol=0.05 * scale, err_msg=str(path)
        )
    assert float(mets["v_loss"]) > 0


def test_fused_critic_values_match_native_forward(mappo_case):
    from rware_tpu.models.mappo import (
        _critic_native_forward,
        _joint_native,
    )
    from rware_tpu.ops.pallas_update import build_fused_critic_values

    cfg, params, batch = mappo_case
    obs = batch[0]
    T, L, N, RB, _ = obs.shape
    vfn = build_fused_critic_values(
        obs_len=L, n_agents=N, rollout_len=T, mb_rows=RB, interpret=True,
    )
    got = jax.jit(vfn)(params["critic"], obs)
    want = jax.jit(
        lambda cp, o: _critic_native_forward(cp, _joint_native(o))
    )(params["critic"], obs)
    assert got.shape == want.shape
    scale = max(float(jnp.abs(want).max()), 1e-6)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-2 * scale,
    )


def test_pick_fold_rb_chunk_is_mosaic_legal():
    """Agent-folded kernels must pick env-row chunks that are multiples
    of 8 sublanes (or the whole extent) — the rule the first 16-agent
    end-to-end training run tripped over on hardware."""
    from rware_tpu.ops.pallas_update import _pick_fold_rb_chunk

    for mb_rows in (4, 8, 16, 32, 128):
        for n in (1, 2, 6, 8, 12, 16):
            try:
                rb = _pick_fold_rb_chunk(mb_rows, n)
            except ValueError:
                continue
            assert mb_rows % rb == 0
            assert rb % 8 == 0 or rb == mb_rows, (mb_rows, n, rb)
    # 16 agents at 32 env rows: the 2x-VMEM fallback fold
    assert _pick_fold_rb_chunk(32, 16) == 8
    # 19 agents at 16 env rows: no legal fold -> callers fall back
    with pytest.raises(ValueError):
        _pick_fold_rb_chunk(16, 19)
