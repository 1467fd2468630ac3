"""Pallas fused-rollout kernel vs the XLA engine (interpret mode on CPU).

Scripted mode is deterministic (lowest-index queue replacement, fixed
respawn cells), so dynamics fields must match the XLA engine bit-for-bit;
delivery bookkeeping is checked semantically.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import rware_tpu
from rware_tpu.ops.pallas_rollout import ENV_BLOCK, build_pallas_rollout
from rware_tpu.parallel import batched_reset
from rware_tpu.testing import DOWN, UP, make_state

DYNAMICS_FIELDS = [
    "agent_x",
    "agent_y",
    "agent_dir",
    "agent_carrying",
    "shelf_x",
    "shelf_y",
    "cur_steps",
]


def xla_rollout(env, states, actions):
    def one(state, acts):
        def body(s, a):
            r = env._step_fn(s, a)
            return r.state, (r.rewards, r.done)

        return jax.lax.scan(body, state, acts)

    return jax.jit(jax.vmap(one, in_axes=(0, 1)))(states, actions)


@pytest.mark.parametrize(
    "env_id,with_toggle",
    [
        ("rware-tiny-2ag-v2", False),
        ("rware-tiny-2ag-v2", True),
        ("rware-small-4ag-v2", True),
        ("rware-medium-6ag-hard-v2", True),
    ],
)
def test_scripted_dynamics_match_xla(env_id, with_toggle):
    env = rware_tpu.make(env_id)
    n = env.n_agents
    B, T = ENV_BLOCK, 12
    states, _ = batched_reset(env, jax.random.key(0), B)
    rng = np.random.default_rng(1)
    actions = jnp.asarray(rng.integers(0, 5, (T, B, n)), dtype=jnp.int32)
    if not with_toggle:
        actions = jnp.where(actions == 4, 0, actions)

    roll = build_pallas_rollout(env.config, T, scripted=True, interpret=True)
    pallas_state, rew, epis = roll(states, 0, actions)
    final, (rews, dones) = xla_rollout(env, states, actions)

    for f in DYNAMICS_FIELDS:
        np.testing.assert_array_equal(
            np.asarray(getattr(pallas_state, f)),
            np.asarray(getattr(final, f)),
            err_msg=f,
        )


def test_scripted_delivery_reward_and_queue_rule():
    # Agent 0 carries requested shelf 0 one cell above the goal; FORWARD
    # delivers: +1 (INDIVIDUAL), queue slot replaced by the lowest-index
    # non-queued shelf (deterministic scripted-mode rule).
    env = rware_tpu.make("rware-tiny-2ag-v2")
    cfg = env.config
    gx, gy = env.layout.goals[0]
    single = make_state(
        cfg, [(int(gx), int(gy) - 1, DOWN), (0, 0, UP)],
        carrying=[0, -1], queue=[0, 1],
    )
    states = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (ENV_BLOCK,) + x.shape), single
    )
    states = states.replace(key=jax.random.split(jax.random.key(0), ENV_BLOCK))
    actions = jnp.broadcast_to(
        jnp.asarray([[1, 0]], dtype=jnp.int32), (1, ENV_BLOCK, 2)
    )
    roll = build_pallas_rollout(cfg, 1, scripted=True, interpret=True)
    new_state, rew, epis = roll(states, 0, actions)
    np.testing.assert_allclose(np.asarray(rew[0]), [1.0, 0.0])
    # queue was [0, 1]; delivered 0 -> replaced by shelf 2 (lowest non-queued)
    assert np.asarray(new_state.request_queue)[0].tolist() == [2, 1]
    assert int(new_state.cur_inactive_steps[0]) == 0


def test_scripted_autoreset_counts_episode():
    cfg = rware_tpu.WarehouseConfig(n_agents=2, request_queue_size=2, max_steps=3)
    env = rware_tpu.make(cfg)
    states, _ = batched_reset(env, jax.random.key(0), ENV_BLOCK)
    actions = jnp.zeros((7, ENV_BLOCK, 2), dtype=jnp.int32)
    roll = build_pallas_rollout(cfg, 7, scripted=True, interpret=True)
    new_state, rew, epis = roll(states, 0, actions)
    # 7 NOOP steps with max_steps=3: episodes end at t=3 and t=6
    assert np.asarray(epis).min() == 2
    assert int(new_state.cur_steps[0]) == 1
    # scripted respawn: agent i at cell i
    assert int(new_state.agent_x[0][0]) == 0 and int(new_state.agent_y[0][0]) == 0


def test_scripted_dynamics_match_xla_12_agents():
    # the reference registers up to 19 agents (rware/__init__.py:19); past
    # the old N<=8 limit the stacked-resolver formulation keeps compile
    # time flat (the round-1 per-agent unrolling took >30 min to compile
    # at N=9 on CPU)
    env = rware_tpu.make("rware-tiny-12ag-v2")
    B, T = ENV_BLOCK, 6
    states, _ = batched_reset(env, jax.random.key(0), B)
    rng = np.random.default_rng(7)
    actions = jnp.asarray(rng.integers(0, 5, (T, B, 12)), dtype=jnp.int32)

    roll = build_pallas_rollout(env.config, T, scripted=True, interpret=True)
    pallas_state, rew, epis = roll(states, 0, actions)
    final, (rews, dones) = xla_rollout(env, states, actions)

    for f in DYNAMICS_FIELDS:
        np.testing.assert_array_equal(
            np.asarray(getattr(pallas_state, f)),
            np.asarray(getattr(final, f)),
            err_msg=f,
        )


def test_scripted_msg_bits_roundtrip():
    # messages (rware/warehouse.py:152,809-814) ride through the kernel as
    # state rows: set from action columns, cleared on autoreset
    cfg = rware_tpu.WarehouseConfig(
        n_agents=2, msg_bits=2, request_queue_size=2
    )
    env = rware_tpu.make(cfg)
    B, T = ENV_BLOCK, 6
    states, _ = batched_reset(env, jax.random.key(0), B)
    rng = np.random.default_rng(3)
    actions = np.zeros((T, B, 2, 3), dtype=np.int32)
    actions[..., 0] = rng.integers(0, 5, (T, B, 2))
    actions[..., 1:] = rng.integers(0, 2, (T, B, 2, 2))
    actions = jnp.asarray(actions)

    roll = build_pallas_rollout(env.config, T, scripted=True, interpret=True)
    pallas_state, rew, epis = roll(states, 0, actions)
    final, (rews, dones) = xla_rollout(env, states, actions)

    for f in DYNAMICS_FIELDS + ["agent_message"]:
        np.testing.assert_array_equal(
            np.asarray(getattr(pallas_state, f)),
            np.asarray(getattr(final, f)),
            err_msg=f,
        )


def test_collect_accepts_msg_bits():
    # msg configs build (the message head rides in-kernel since round 3;
    # full behavior covered by tests/test_pallas_collect.py)
    from rware_tpu.ops.pallas_rollout import build_pallas_collect

    build_pallas_collect(
        rware_tpu.WarehouseConfig(msg_bits=1, request_queue_size=2), 4,
        tc_len=4,
    )


def test_shard_map_over_mesh_matches_single_device():
    # the multi-chip deployment shape: kernel dispatched per mesh shard
    from jax.sharding import PartitionSpec as P

    from rware_tpu.parallel import make_mesh

    env = rware_tpu.make("rware-tiny-2ag-v2")
    B, T = ENV_BLOCK * 8, 4
    states, _ = batched_reset(env, jax.random.key(0), B)
    rng = np.random.default_rng(0)
    actions = jnp.asarray(rng.integers(0, 4, (T, B, 2)), dtype=jnp.int32)

    roll = build_pallas_rollout(env.config, T, scripted=True, interpret=True)
    mesh = make_mesh()
    state_spec = jax.tree.map(lambda _: P("env"), states)
    smapped = jax.shard_map(
        lambda s, a: roll(s, 0, a),
        mesh=mesh,
        in_specs=(state_spec, P(None, "env", None)),
        out_specs=(state_spec, P("env"), P("env")),
        check_vma=False,
    )
    ns_sh, rew_sh, _ = jax.jit(smapped)(states, actions)
    ns, rew, _ = roll(states, 0, actions)
    np.testing.assert_array_equal(
        np.asarray(ns_sh.agent_x), np.asarray(ns.agent_x)
    )
    np.testing.assert_array_equal(np.asarray(rew_sh), np.asarray(rew))


def test_zero_request_queue_rollout():
    # request_queue_size=0 is a legal config (e.g. rware-tiny-1ag-hard-v2)
    cfg = rware_tpu.WarehouseConfig(n_agents=2, request_queue_size=0, max_steps=4)
    env = rware_tpu.make(cfg)
    states, _ = batched_reset(env, jax.random.key(0), ENV_BLOCK)
    actions = jnp.zeros((3, ENV_BLOCK, 2), dtype=jnp.int32)
    roll = build_pallas_rollout(cfg, 3, scripted=True, interpret=True)
    ns, rew, epis = roll(states, 0, actions)
    assert float(np.asarray(rew).sum()) == 0.0
    assert int(ns.cur_steps[0]) == 3


def test_chunked_rollout_matches_unchunked():
    """max_envs_per_call chunking (the large-grid compile mitigation) is
    bit-identical to the single-call program, including episode counts."""
    env = rware_tpu.make("rware-tiny-2ag-v2")
    n = env.n_agents
    B, T = 2 * ENV_BLOCK, 9
    states, _ = batched_reset(env, jax.random.key(3), B)
    rng = np.random.default_rng(7)
    actions = jnp.asarray(rng.integers(0, 5, (T, B, n)), dtype=jnp.int32)

    roll1 = build_pallas_rollout(env.config, T, scripted=True,
                                 interpret=True)
    roll2 = build_pallas_rollout(env.config, T, scripted=True,
                                 interpret=True,
                                 max_envs_per_call=ENV_BLOCK)
    s1, r1, e1 = roll1(states, 0, actions)
    s2, r2, e2 = roll2(states, 0, actions)
    for f in DYNAMICS_FIELDS:
        np.testing.assert_array_equal(
            np.asarray(getattr(s1, f)), np.asarray(getattr(s2, f)),
            err_msg=f,
        )
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))


def test_scripted_dynamics_match_xla_16_agents_contended():
    """Forward-biased fuzz at 16 agents on the tiny grid: dense chains,
    rotating cycles and head-on swaps stress the pointer-doubling
    resolver (round-4 rewrite) against the XLA engine bit-for-bit."""
    env = rware_tpu.make("rware-tiny-16ag-v2")
    B, T = ENV_BLOCK, 10
    states, _ = batched_reset(env, jax.random.key(3), B)
    rng = np.random.default_rng(11)
    # ~60% FORWARD maximises resolver contention
    raw = rng.integers(0, 10, (T, B, 16))
    actions = jnp.asarray(
        np.where(raw < 6, 1, raw - 5), dtype=jnp.int32
    )

    roll = build_pallas_rollout(env.config, T, scripted=True, interpret=True)
    pallas_state, rew, epis = roll(states, 0, actions)
    final, (rews, dones) = xla_rollout(env, states, actions)

    for f in DYNAMICS_FIELDS:
        np.testing.assert_array_equal(
            np.asarray(getattr(pallas_state, f)),
            np.asarray(getattr(final, f)),
            err_msg=f,
        )
    # xla_rollout's vmap puts the batch axis first: rews is (B, T, N)
    np.testing.assert_allclose(
        np.asarray(rew), np.asarray(rews).sum(1), atol=1e-6
    )


def test_scripted_delivery_incremental_queue_path():
    """Delivery + queue resample on a config whose R triggers the
    INCREMENTAL in-queue bitmap (R > 4 with 2 goals): both goals deliver
    in the same step — goal 2 must see the queue as updated by goal 1
    (the reference's sequential order), matching the XLA engine exactly."""
    env = rware_tpu.make("rware-large-8ag-v2")  # R = 8 -> incremental
    cfg = env.config
    (g0x, g0y), (g1x, g1y) = (
        (int(x), int(y)) for x, y in env.layout.goals[:2]
    )
    n = env.n_agents
    # agents 0 and 1 carry requested shelves 0 and 1 one cell above each
    # goal; everyone else parked far away
    pos = [(g0x, g0y - 1, DOWN), (g1x, g1y - 1, DOWN)]
    pos += [(2 + i, 0, UP) for i in range(n - 2)]
    single = make_state(
        cfg, pos, carrying=[0, 1] + [-1] * (n - 2),
        queue=list(range(cfg.request_queue_size)),
    )
    states = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (ENV_BLOCK,) + x.shape), single
    )
    states = states.replace(
        key=jax.random.split(jax.random.key(0), ENV_BLOCK)
    )
    acts = jnp.zeros((1, ENV_BLOCK, n), dtype=jnp.int32)
    acts = acts.at[0, :, 0].set(1).at[0, :, 1].set(1)  # both FORWARD

    roll = build_pallas_rollout(cfg, 1, scripted=True, interpret=True)
    new_state, rew, epis = roll(states, 0, acts)
    final, (rews, dones) = xla_rollout(env, states, acts)
    # queue replacement draws differ by design (scripted kernel:
    # deterministic lowest-index; XLA engine: RNG) — dynamics only
    for f in DYNAMICS_FIELDS:
        np.testing.assert_array_equal(
            np.asarray(getattr(new_state, f)),
            np.asarray(getattr(final, f)),
            err_msg=f,
        )
    np.testing.assert_allclose(
        np.asarray(rew), np.asarray(rews).sum(1), atol=1e-6
    )
    # both deliveries paid out; sequential goal processing: the first
    # delivery's slot takes shelf R (lowest non-queued), and the first
    # DELIVERED shelf — now out of the queue — is the lowest candidate
    # when the second goal resamples
    np.testing.assert_allclose(np.asarray(rew[0, :2]), [1.0, 1.0])
    q = np.asarray(new_state.request_queue)[0].tolist()
    R = cfg.request_queue_size
    assert R in q, q
    assert (0 in q) != (1 in q), q  # exactly one re-entered
    assert len(set(q)) == len(q)


def test_prefix_doubling_resample_selection_equivalence():
    """The log-depth prefix-count selection (big-grid stochastic queue
    resample) picks exactly the k-th available shelf, i.e. the same shelf
    as the sequential accumulator chain it replaced, for any mask/k."""
    rng = np.random.default_rng(0)
    for S in (64, 224, 240):
        for _ in range(20):
            n_q = rng.integers(1, min(S - 1, 20))
            in_queue = np.zeros(S, dtype=bool)
            in_queue[rng.choice(S, n_q, replace=False)] = True
            k = int(rng.integers(0, S - n_q))
            # sequential reference
            acc = 0
            repl_seq = 0
            for s_i in range(S):
                if not in_queue[s_i]:
                    if acc == k:
                        repl_seq = s_i
                    acc += 1
            # shift-doubling prefix (the kernel's formula)
            availi = (~in_queue).astype(np.int32)
            cs = availi.copy()
            d = 1
            while d < S:
                shifted = np.concatenate([np.zeros(d, np.int32), cs[: S - d]])
                cs = cs + shifted
                d *= 2
            hit = (availi == 1) & ((cs - availi) == k)
            repl_dbl = int(np.max(np.where(hit, np.arange(S), 0)))
            assert repl_dbl == repl_seq, (S, k)
