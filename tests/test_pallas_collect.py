"""Fused collector kernel: obs/policy parity and the pallas-IPPO train step.

All tests run the kernel in interpret+deterministic mode on CPU (the TPU
PRNG primitive has no CPU lowering; deterministic mode is RNG-free).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import rware_tpu
from rware_tpu.models import ActorCritic, IPPOConfig
from rware_tpu.models.ippo_pallas import (
    build_pallas_train_step,
    init_pallas_runner,
)
from rware_tpu.ops.pallas_rollout import ENV_BLOCK, build_pallas_collect
from rware_tpu.parallel import batched_reset


@pytest.fixture(scope="module")
def setup():
    env = rware_tpu.make("rware-tiny-2ag-v2")
    states, _ = batched_reset(env, jax.random.key(0), ENV_BLOCK)
    model = ActorCritic(n_actions=5)
    params = model.init(jax.random.key(1), jnp.zeros((1, 2, 71)))
    collect = build_pallas_collect(
        env.config, 16, tc_len=8, interpret=True, deterministic=True
    )
    new_state, traj = collect(states, params, 3)
    return env, states, model, params, new_state, traj


def test_in_kernel_obs_bit_exact(setup):
    env, states, model, params, new_state, traj = setup
    xla_obs = jax.vmap(env._obs_fn)(states)
    np.testing.assert_array_equal(
        np.asarray(traj["obs"][0], dtype=np.float32), np.asarray(xla_obs)
    )


def test_in_kernel_policy_matches_flax(setup):
    env, states, model, params, new_state, traj = setup
    xla_obs = jax.vmap(env._obs_fn)(states)
    logits, value = model.apply(params, xla_obs)
    # bf16-epsilon agreement between the two lowerings
    np.testing.assert_allclose(
        np.asarray(traj["value"][0]), np.asarray(value), atol=2e-2
    )
    # deterministic mode takes the argmax — must match flax exactly
    np.testing.assert_array_equal(
        np.asarray(traj["action"][0]),
        np.asarray(jnp.argmax(logits, -1)),
    )
    lsm = jax.nn.log_softmax(logits)
    lp_ref = np.take_along_axis(
        np.asarray(lsm), np.asarray(traj["action"][0])[..., None], -1
    )[..., 0]
    np.testing.assert_allclose(
        np.asarray(traj["logp"][0]), lp_ref, atol=2e-2
    )


def test_recorded_actions_replay_through_xla_engine(setup):
    env, states, model, params, new_state, traj = setup

    def replay(state, acts):
        def body(s, a):
            r = env._step_fn(s, a)
            return r.state, r.rewards

        return jax.lax.scan(body, state, acts)

    final, rews = jax.jit(
        jax.vmap(replay, in_axes=(0, 1), out_axes=(0, 1))
    )(states, jnp.asarray(traj["action"]))
    np.testing.assert_array_equal(
        np.asarray(final.agent_x), np.asarray(new_state.agent_x)
    )
    np.testing.assert_array_equal(
        np.asarray(final.agent_y), np.asarray(new_state.agent_y)
    )
    np.testing.assert_allclose(
        np.asarray(rews), np.asarray(traj["reward"])
    )


def test_obs_bit_exact_sensor_range_2():
    env = rware_tpu.make(rware_tpu.WarehouseConfig(sensor_range=2))
    L = env.config.flattened_obs_length  # 183
    states, _ = batched_reset(env, jax.random.key(0), ENV_BLOCK)
    model = ActorCritic(n_actions=5)
    params = model.init(jax.random.key(1), jnp.zeros((1, 2, L)))
    collect = build_pallas_collect(
        env.config, 4, tc_len=4, interpret=True, deterministic=True
    )
    _, traj = collect(states, params, 0)
    xla_obs = jax.vmap(env._obs_fn)(states)
    np.testing.assert_array_equal(
        np.asarray(traj["obs"][0], dtype=np.float32), np.asarray(xla_obs)
    )


def test_pallas_train_step_learns(setup):
    env = rware_tpu.make("rware-tiny-2ag-v2")
    cfg = IPPOConfig(n_envs=ENV_BLOCK, rollout_len=8, epochs=1, minibatches=2)
    runner, model, tx = init_pallas_runner(env, cfg, jax.random.key(0))
    ts = jax.jit(
        build_pallas_train_step(
            env, model, tx, cfg, interpret=True, deterministic_collect=True
        )
    )
    new_runner, metrics = ts(runner)
    assert int(new_runner.update_idx) == 1
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    diffs = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()),
        runner.params,
        new_runner.params,
    )
    assert max(jax.tree.leaves(diffs)) > 0


# --- native-layout update path (models/ippo_pallas) --------------------------


def test_native_forward_matches_flax(setup):
    """_native_forward on tiled obs == model.apply on (B, N, L) obs."""
    from rware_tpu.models.ippo_pallas import _native_forward
    from rware_tpu.ops.pallas_rollout import LANE

    env, states, model, params, new_state, traj = setup
    collect = build_pallas_collect(
        env.config, 16, tc_len=8, interpret=True, deterministic=True,
        native_traj=True,
    )
    _, ntraj = collect(states, params, 3)
    logits_n, value_n = jax.jit(_native_forward)(params, ntraj["obs"])
    # rearrange native (T, L, N, RB, LANE) -> (T, B, N, L) reference layout
    t, L, n, rb, lane = ntraj["obs"].shape
    obs_flat = jnp.transpose(
        ntraj["obs"].reshape(t, L, n, rb * lane), (0, 3, 2, 1)
    ).astype(jnp.float32)
    logits_f, value_f = model.apply(params, obs_flat)
    # native logits (T, N, RB, LANE, A) -> (T, B, N, A)
    ln = jnp.moveaxis(logits_n.reshape(t, n, rb * lane, 5), 2, 1)
    vn = jnp.moveaxis(value_n.reshape(t, n, rb * lane), 2, 1)
    np.testing.assert_allclose(
        np.asarray(ln), np.asarray(logits_f), atol=3e-2
    )
    np.testing.assert_allclose(
        np.asarray(vn), np.asarray(value_f), atol=3e-2
    )


def test_native_gae_matches_flat():
    from rware_tpu.models.ippo import compute_gae
    from rware_tpu.models.ippo_pallas import compute_gae_native

    cfg = IPPOConfig()
    T, N, RB, LANE_ = 7, 2, 3, 4
    B = RB * LANE_
    key = jax.random.key(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    rew = jax.random.normal(k1, (T, N, RB, LANE_))
    val = jax.random.normal(k2, (T, N, RB, LANE_))
    done = (jax.random.uniform(k3, (T, 1, RB, LANE_)) < 0.2).astype(jnp.int32)
    last_v = jax.random.normal(k4, (N, RB, LANE_))

    adv_n, tgt_n = compute_gae_native(cfg, rew, val, done, last_v)

    def to_flat(x):  # (T, N, RB, LANE) -> (T, B, N)
        return jnp.moveaxis(x.reshape(T, N, B), 1, 2)

    adv_f, tgt_f = compute_gae(
        cfg,
        to_flat(rew),
        to_flat(val),
        done.reshape(T, B),
        jnp.swapaxes(last_v.reshape(N, B), 0, 1),
    )
    np.testing.assert_allclose(
        np.asarray(to_flat(adv_n)), np.asarray(adv_f), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(to_flat(tgt_n)), np.asarray(tgt_f), rtol=1e-5, atol=1e-5
    )


def test_native_train_step_runs_and_matches_rollout_metrics():
    env = rware_tpu.make("rware-tiny-2ag-v2")
    cfg = IPPOConfig(n_envs=ENV_BLOCK, rollout_len=8, epochs=1, minibatches=2)
    runner, model, tx = init_pallas_runner(env, cfg, jax.random.key(0))
    ts_native = jax.jit(
        build_pallas_train_step(
            env, model, tx, cfg, interpret=True, deterministic_collect=True,
            native=True,
        )
    )
    ts_flat = jax.jit(
        build_pallas_train_step(
            env, model, tx, cfg, interpret=True, deterministic_collect=True,
            native=False,
        )
    )
    rn, mn = ts_native(runner)
    rf, mf = ts_flat(runner)
    assert int(rn.update_idx) == 1
    for k, v in mn.items():
        assert np.isfinite(float(v)), k
    # same collect stream -> identical rollout statistics
    assert float(mn["reward_per_env"]) == float(mf["reward_per_env"])
    assert float(mn["episodes_done"]) == float(mf["episodes_done"])
    # env states advance identically
    np.testing.assert_array_equal(
        np.asarray(rn.env_states.agent_x), np.asarray(rf.env_states.agent_x)
    )
    # params moved
    diffs = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), runner.params, rn.params
    )
    assert max(jax.tree.leaves(diffs)) > 0


def test_sharded_native_train_step_matches_metrics():
    """The shard_map'd pallas train step over the 8-device CPU mesh: runs,
    produces finite metrics, and the rollout statistics equal the
    single-device step (same seed streams by construction)."""
    from rware_tpu.parallel import make_mesh, replicate, shard_env_batch

    env = rware_tpu.make("rware-tiny-2ag-v2")
    n_dev = len(jax.devices())
    cfg = IPPOConfig(
        n_envs=ENV_BLOCK * n_dev, rollout_len=8, epochs=1,
        minibatches=2,
    )
    runner, model, tx = init_pallas_runner(env, cfg, jax.random.key(0))

    ts_single = jax.jit(
        build_pallas_train_step(
            env, model, tx, cfg, interpret=True, deterministic_collect=True,
        )
    )
    r1, m1 = ts_single(runner)

    mesh = make_mesh()
    sharded_runner = runner.replace(
        env_states=shard_env_batch(runner.env_states, mesh),
        obs=shard_env_batch(runner.obs, mesh),
        params=replicate(runner.params, mesh),
        opt_state=replicate(runner.opt_state, mesh),
    )
    ts_mesh = jax.jit(
        build_pallas_train_step(
            env, model, tx, cfg, interpret=True, deterministic_collect=True,
            mesh=mesh,
        )
    )
    r2, m2 = ts_mesh(sharded_runner)
    for k, v in m2.items():
        assert np.isfinite(float(v)), k
    # deterministic collect: identical rollouts -> identical statistics
    assert float(m1["episodes_done"]) == float(m2["episodes_done"])
    np.testing.assert_allclose(
        float(m1["reward_per_env"]), float(m2["reward_per_env"]), rtol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(r1.env_states.agent_x), np.asarray(r2.env_states.agent_x)
    )
    # params end up replicated and finite
    assert all(
        np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(r2.params)
    )


# --- IMAGE observations in-kernel --------------------------------------------


@pytest.mark.parametrize("directional", [True, False])
def test_in_kernel_image_obs_bit_exact(directional):
    from rware_tpu.types import ObservationType

    env = rware_tpu.make(
        rware_tpu.WarehouseConfig(
            observation_type=ObservationType.IMAGE,
            image_observation_directional=directional,
        )
    )
    L = env.config.policy_obs_length  # C * w2 * w2
    states, _ = batched_reset(env, jax.random.key(2), ENV_BLOCK)
    model = ActorCritic(n_actions=5)
    params = model.init(jax.random.key(1), jnp.zeros((1, 2, L)))
    collect = build_pallas_collect(
        env.config, 4, tc_len=4, interpret=True, deterministic=True
    )
    _, traj = collect(states, params, 0)
    xla_img = jax.vmap(env._obs_fn)(states)  # (B, N, C, w2, w2)
    xla_flat = xla_img.reshape(xla_img.shape[0], xla_img.shape[1], -1)
    np.testing.assert_array_equal(
        np.asarray(traj["obs"][0], dtype=np.float32), np.asarray(xla_flat)
    )


@pytest.mark.parametrize("directional", [True, False])
def test_in_kernel_image_dict_obs_bit_exact(directional):
    """IMAGE_DICT in-kernel obs = flattened window stack + the 6 self
    features [dir-onehot(4), on_highway, carrying] — bit-exact vs the XLA
    learner input (models.ippo.policy_obs_fn over build_image_dict
    features; reference rware/warehouse.py:725-742)."""
    from rware_tpu.models.ippo import policy_obs_fn
    from rware_tpu.types import ObservationType

    env = rware_tpu.make(
        rware_tpu.WarehouseConfig(
            observation_type=ObservationType.IMAGE_DICT,
            image_observation_directional=directional,
        )
    )
    L = env.config.policy_obs_length  # C * w2 * w2 + 6
    states, _ = batched_reset(env, jax.random.key(2), ENV_BLOCK)
    model = ActorCritic(n_actions=5)
    params = model.init(jax.random.key(1), jnp.zeros((1, 2, L)))
    collect = build_pallas_collect(
        env.config, 4, tc_len=4, interpret=True, deterministic=True
    )
    _, traj = collect(states, params, 0)
    xla_flat = jax.vmap(policy_obs_fn(env))(states)  # (B, N, L)
    np.testing.assert_array_equal(
        np.asarray(traj["obs"][0], dtype=np.float32), np.asarray(xla_flat)
    )


def test_image_env_pallas_train_step_runs():
    from rware_tpu.types import ObservationType

    env = rware_tpu.make(
        rware_tpu.WarehouseConfig(observation_type=ObservationType.IMAGE)
    )
    cfg = IPPOConfig(n_envs=ENV_BLOCK, rollout_len=8, epochs=1, minibatches=2)
    runner, model, tx = init_pallas_runner(env, cfg, jax.random.key(0))
    ts = jax.jit(
        build_pallas_train_step(
            env, model, tx, cfg, interpret=True, deterministic_collect=True
        )
    )
    new_runner, metrics = ts(runner)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k


# --- GRU policy in-kernel ----------------------------------------------------


def test_gru_collect_matches_flax_and_replays():
    from rware_tpu.models.networks import RecurrentActorCritic

    env = rware_tpu.make("rware-tiny-2ag-v2")
    states, _ = batched_reset(env, jax.random.key(0), ENV_BLOCK)
    model = RecurrentActorCritic(n_actions=5)
    carry0 = model.initialize_carry((ENV_BLOCK, 2))
    params = model.init(
        jax.random.key(1), carry0[:1], jnp.zeros((1, 2, 71))
    )
    collect = build_pallas_collect(
        env.config, 16, hidden=(128, 128), tc_len=8, interpret=True,
        deterministic=True, policy="gru",
    )
    new_state, new_h, traj = collect(states, params, 0, h0=carry0)

    # t=0 forward vs flax from the zero carry.  The GRU has two distinct
    # bf16 lowerings (kernel vs flax), so near-tie argmaxes may flip on a
    # tiny fraction of envs; values agree to bf16 epsilon.
    xla_obs = jax.vmap(env._obs_fn)(states)
    new_carry, (logits, value) = model.apply(params, carry0, xla_obs)
    mismatch = (
        np.asarray(traj["action"][0]) != np.asarray(jnp.argmax(logits, -1))
    ).mean()
    assert mismatch < 0.01, mismatch
    np.testing.assert_allclose(
        np.asarray(traj["value"][0]), np.asarray(value), atol=3e-2
    )
    # final carry finite + consistent shape
    assert new_h.shape == (ENV_BLOCK, 2, 128)
    assert np.isfinite(np.asarray(new_h, dtype=np.float32)).all()

    # recorded actions replay through the XLA engine to the same state
    def replay(state, acts):
        def body(s, a):
            r = env._step_fn(s, a)
            return r.state, r.rewards

        return jax.lax.scan(body, state, acts)

    final, rews = jax.jit(
        jax.vmap(replay, in_axes=(0, 1), out_axes=(0, 1))
    )(states, jnp.asarray(traj["action"]))
    np.testing.assert_array_equal(
        np.asarray(final.agent_x), np.asarray(new_state.agent_x)
    )


def test_gru_collect_carry_evolves_like_flax():
    """Multi-step carry: kernel's final carry == flax scan over the same
    recorded actions' observation sequence (bf16 tolerance)."""
    from rware_tpu.models.networks import RecurrentActorCritic

    env = rware_tpu.make("rware-tiny-2ag-v2")
    states, _ = batched_reset(env, jax.random.key(3), ENV_BLOCK)
    model = RecurrentActorCritic(n_actions=5)
    carry0 = model.initialize_carry((ENV_BLOCK, 2))
    params = model.init(jax.random.key(1), carry0[:1], jnp.zeros((1, 2, 71)))
    T = 8
    collect = build_pallas_collect(
        env.config, T, tc_len=4, interpret=True, deterministic=True,
        policy="gru",
    )
    _, new_h, traj = collect(states, params, 0, h0=carry0)

    def replay(carry, xs):
        obs, done = xs
        nc, _ = model.apply(params, carry, obs)
        nc = jnp.where(done[:, None, None], jnp.zeros_like(nc), nc)
        return nc, None

    obs_seq = jnp.asarray(traj["obs"], dtype=model.dtype)
    final_c, _ = jax.lax.scan(
        replay, carry0, (obs_seq, jnp.asarray(traj["done"]))
    )
    np.testing.assert_allclose(
        np.asarray(new_h, dtype=np.float32),
        np.asarray(final_c, dtype=np.float32),
        atol=5e-2,
    )


def test_rnn_pallas_train_step_runs():
    from rware_tpu.models.ippo_rnn import (
        build_rnn_pallas_train_step,
        init_rnn_runner,
    )

    env = rware_tpu.make("rware-tiny-2ag-v2")
    cfg = IPPOConfig(n_envs=ENV_BLOCK, rollout_len=8, epochs=1, minibatches=2)
    runner, model, tx = init_rnn_runner(env, cfg, jax.random.key(0))
    ts = jax.jit(
        build_rnn_pallas_train_step(
            env, model, tx, cfg, interpret=True, deterministic_collect=True
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


# --- message bits in-kernel ---------------------------------------------------


def test_msg_collect_obs_logp_and_replay():
    """msg_bits collect: obs bit-exact at t=0, joint move+bits logp matches
    flax, and replaying the recorded (move, bits) actions through the XLA
    engine reproduces the final state including the message channel."""
    from rware_tpu.models.networks import bernoulli_logp

    env = rware_tpu.make(rware_tpu.WarehouseConfig(msg_bits=2))
    L = env.config.policy_obs_length
    states, _ = batched_reset(env, jax.random.key(0), ENV_BLOCK)
    model = ActorCritic(n_actions=5, msg_bits=2)
    params = model.init(jax.random.key(1), jnp.zeros((1, 2, L)))
    collect = build_pallas_collect(
        env.config, 8, tc_len=4, interpret=True, deterministic=True
    )
    new_state, traj = collect(states, params, 3)
    assert traj["bits"].shape == (8, ENV_BLOCK, 2, 2)

    xla_obs = jax.vmap(env._obs_fn)(states)
    np.testing.assert_array_equal(
        np.asarray(traj["obs"][0], np.float32), np.asarray(xla_obs)
    )
    (mv_logits, msg_logits), value = model.apply(params, xla_obs)
    lsm = jax.nn.log_softmax(mv_logits)
    lp_mv = np.take_along_axis(
        np.asarray(lsm), np.asarray(traj["action"][0])[..., None], -1
    )[..., 0]
    lp_b = np.asarray(bernoulli_logp(msg_logits, traj["bits"][0]).sum(-1))
    np.testing.assert_allclose(
        np.asarray(traj["logp"][0]), lp_mv + lp_b, atol=3e-2
    )
    np.testing.assert_allclose(
        np.asarray(traj["value"][0]), np.asarray(value), atol=3e-2
    )

    acts = jnp.concatenate(
        [jnp.asarray(traj["action"])[..., None], jnp.asarray(traj["bits"])],
        -1,
    )

    def replay(state, a):
        def body(s, a1):
            r = env._step_fn(s, a1)
            return r.state, r.rewards

        return jax.lax.scan(body, state, a)

    final, rews = jax.jit(
        jax.vmap(replay, in_axes=(0, 1), out_axes=(0, 1))
    )(states, acts)
    np.testing.assert_array_equal(
        np.asarray(final.agent_x), np.asarray(new_state.agent_x)
    )
    np.testing.assert_array_equal(
        np.asarray(final.agent_message), np.asarray(new_state.agent_message)
    )
    np.testing.assert_allclose(np.asarray(rews), np.asarray(traj["reward"]))


def test_msg_pallas_train_step_runs():
    env = rware_tpu.make(rware_tpu.WarehouseConfig(msg_bits=2))
    cfg = IPPOConfig(n_envs=ENV_BLOCK, rollout_len=8, epochs=1, minibatches=2)
    runner, model, tx = init_pallas_runner(env, cfg, jax.random.key(0))
    assert model.msg_bits == 2
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


def test_chunked_collect_matches_unchunked():
    """max_envs_per_call chunking of the collect kernel (large-grid
    compile mitigation) is bit-identical to the single-call program in
    both trajectory layouts, including the GRU carry."""
    env = rware_tpu.make("rware-tiny-2ag-v2")
    B = 2 * ENV_BLOCK
    states, _ = batched_reset(env, jax.random.key(5), B)
    model = ActorCritic(n_actions=5)
    params = model.init(jax.random.key(1), jnp.zeros((1, 2, 71)))
    for native in (True, False):
        c1 = build_pallas_collect(
            env.config, 8, tc_len=4, interpret=True, deterministic=True,
            native_traj=native,
        )
        c2 = build_pallas_collect(
            env.config, 8, tc_len=4, interpret=True, deterministic=True,
            native_traj=native, max_envs_per_call=ENV_BLOCK,
        )
        s1, t1 = c1(states, params, 3)
        s2, t2 = c2(states, params, 3)
        for k in t1:
            np.testing.assert_array_equal(
                np.asarray(t1[k], np.float32),
                np.asarray(t2[k], np.float32), err_msg=f"{native} {k}",
            )
        np.testing.assert_array_equal(
            np.asarray(s1.agent_x), np.asarray(s2.agent_x)
        )
    # GRU variant: carry plumbing through the chunked path
    from rware_tpu.models.networks import RecurrentActorCritic

    rmodel = RecurrentActorCritic(n_actions=5, hidden=16, embed=12)
    rparams = rmodel.init(
        jax.random.key(2), rmodel.initialize_carry((1, 2)),
        jnp.zeros((1, 2, 71)),
    )
    h0 = jnp.zeros((B, 2, 16), jnp.bfloat16)
    g1 = build_pallas_collect(
        env.config, 8, hidden=(12, 16), tc_len=4, interpret=True,
        deterministic=True, native_traj=True, policy="gru",
    )
    g2 = build_pallas_collect(
        env.config, 8, hidden=(12, 16), tc_len=4, interpret=True,
        deterministic=True, native_traj=True, policy="gru",
        max_envs_per_call=ENV_BLOCK,
    )
    s1, h1, t1 = g1(states, rparams, 3, h0=h0)
    s2, h2, t2 = g2(states, rparams, 3, h0=h0)
    np.testing.assert_array_equal(
        np.asarray(h1, np.float32), np.asarray(h2, np.float32)
    )
    for k in t1:
        np.testing.assert_array_equal(
            np.asarray(t1[k], np.float32), np.asarray(t2[k], np.float32),
            err_msg=k,
        )


@pytest.mark.parametrize(
    "make_arg,label",
    [
        ("rware-medium-6ag-v2", "parametric-medium"),
        # string layout: rack membership must take the slot-scan fallback
        # (rack_ch == -1 — the arithmetic highway formula doesn't apply)
        (
            rware_tpu.WarehouseConfig(
                n_agents=2,
                request_queue_size=2,
                layout="..g..\n.x.x.\n.xxx.\n.....",
            ),
            "string-layout",
        ),
    ],
    ids=["parametric-medium", "string-layout"],
)
def test_in_kernel_obs_bit_exact_more_configs(make_arg, label):
    """Obs bit-exactness beyond tiny-2ag: a bigger parametric grid (the
    arithmetic on_rack path) and a string layout (the slot-scan
    fallback)."""
    env = rware_tpu.make(make_arg)
    n = env.n_agents
    L = env.config.policy_obs_length
    states, _ = batched_reset(env, jax.random.key(2), ENV_BLOCK)
    model = ActorCritic(n_actions=5)
    params = model.init(jax.random.key(1), jnp.zeros((1, n, L)))
    collect = build_pallas_collect(
        env.config, 8, tc_len=4, interpret=True, deterministic=True
    )
    new_state, traj = collect(states, params, 3)
    xla_obs = jax.vmap(env._obs_fn)(states)
    np.testing.assert_array_equal(
        np.asarray(traj["obs"][0], dtype=np.float32),
        np.asarray(xla_obs),
        err_msg=label,
    )
