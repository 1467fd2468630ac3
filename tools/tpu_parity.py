#!/usr/bin/env python
"""On-hardware kernel-vs-XLA parity artifact (VERDICT round-1 #6).

Interpret-mode CI cannot catch Mosaic lowering regressions (this repo has
hit two: i1 loop carries, PRNG sign-bit arithmetic-shift).  This tool runs
the COMPILED Pallas kernels against the XLA engine on the real chip:

  * scripted-mode rollout equality (all dynamics fields, bit-exact) for a
    spread of configs including >8 agents and msg_bits;
  * deterministic fused-collect obs/replay equality for tiny-2ag.

Writes a JSON verdict to the path given by --out (default
TPUPARITY_r{N}.json in the repo root is committed by the round driver).
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# persistent XLA executable cache: second-process compiles deserialize
# instead of recompiling (rware_tpu/compile_cache; RWARE_TPU_NO_CACHE=1 opts out)
from rware_tpu.compile_cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np

DYNAMICS_FIELDS = [
    "agent_x", "agent_y", "agent_dir", "agent_carrying",
    "shelf_x", "shelf_y", "cur_steps",
]

CONFIGS = [
    "rware-tiny-2ag-v2",
    "rware-large-8ag-v2",
    "rware-tiny-12ag-v2",
    "msg-bits-2ag",  # constructor-param config (msg_bits=2)
]


def check_rollout(env_id, B=1024, T=32):
    import rware_tpu
    from rware_tpu.ops.pallas_rollout import build_pallas_rollout
    from rware_tpu.parallel import batched_reset

    if env_id == "msg-bits-2ag":
        cfg = rware_tpu.WarehouseConfig(
            n_agents=2, msg_bits=2, request_queue_size=2
        )
        env = rware_tpu.make(cfg)
    else:
        env = rware_tpu.make(env_id)
    n = env.n_agents
    m = env.config.msg_bits
    states, _ = batched_reset(env, jax.random.key(0), B)
    rng = np.random.default_rng(1)
    if m:
        acts = np.zeros((T, B, n, 1 + m), dtype=np.int32)
        acts[..., 0] = rng.integers(0, 5, (T, B, n))
        acts[..., 1:] = rng.integers(0, 2, (T, B, n, m))
        actions = jnp.asarray(acts)
    else:
        actions = jnp.asarray(rng.integers(0, 5, (T, B, n)), dtype=jnp.int32)

    roll = build_pallas_rollout(env.config, T, scripted=True)
    t0 = time.time()
    pallas_state, rew, epis = roll(states, 0, actions)
    jax.block_until_ready(pallas_state.agent_x)
    compile_s = round(time.time() - t0, 1)

    def one(state, a):
        def body(s, aa):
            r = env._step_fn(s, aa)
            return r.state, r.rewards

        return jax.lax.scan(body, state, a)

    final, rews = jax.jit(jax.vmap(one, in_axes=(0, 1), out_axes=(0, 1)))(
        states, actions
    )

    mismatches = []
    fields = DYNAMICS_FIELDS + (["agent_message"] if m else [])
    for f in fields:
        a = np.asarray(getattr(pallas_state, f))
        b = np.asarray(getattr(final, f))
        if not np.array_equal(a, b):
            mismatches.append({"field": f, "n_diff": int((a != b).sum())})
    # reward sums (kernel returns the T-sum)
    if not np.allclose(np.asarray(rew), np.asarray(rews).sum(0)):
        mismatches.append({"field": "rewards", "n_diff": -1})
    return {
        "ok": not mismatches,
        "mismatches": mismatches,
        "B": B,
        "T": T,
        "compile_s": compile_s,
    }


def check_collect(B=1024, T=16, msg_bits=0, image=False):
    import rware_tpu
    from rware_tpu.models import ActorCritic
    from rware_tpu.ops.pallas_rollout import build_pallas_collect
    from rware_tpu.parallel import batched_reset

    if image:
        from rware_tpu.types import ObservationType

        env = rware_tpu.make(
            rware_tpu.WarehouseConfig(
                observation_type=ObservationType.IMAGE,
                request_queue_size=2,
            )
        )
    else:
        env = rware_tpu.make("rware-tiny-2ag-v2", msg_bits=msg_bits)
    L = env.config.policy_obs_length
    states, _ = batched_reset(env, jax.random.key(0), B)
    model = ActorCritic(n_actions=5, msg_bits=msg_bits)
    params = model.init(jax.random.key(1), jnp.zeros((1, 2, L)))
    collect = build_pallas_collect(env.config, T, tc_len=8, deterministic=True)
    t0 = time.time()
    new_state, traj = collect(states, params, 3)
    jax.block_until_ready(traj["obs"])
    compile_s = round(time.time() - t0, 1)

    from rware_tpu.models.ippo import policy_obs_fn

    mismatches = []
    # the policy view (flattened for IMAGE configs) — what the kernel's
    # in-kernel policy consumes and the trajectory stores
    xla_obs = np.asarray(jax.jit(jax.vmap(policy_obs_fn(env)))(states))
    if not np.array_equal(
        np.asarray(traj["obs"][0], dtype=np.float32), xla_obs
    ):
        mismatches.append({"field": "obs_t0", "n_diff": -1})
    heads, value = model.apply(params, jnp.asarray(xla_obs))
    # bf16 accumulation order differs between the kernel and XLA, so
    # argmax/sign decisions at near-ties can flip legitimately; a mismatch
    # only counts where the XLA logit margin is decisive
    if msg_bits:
        logits, msg_logits = heads
        bits_diff = np.asarray(traj["bits"][0]) != np.asarray(
            msg_logits > 0.0
        )
        decisive = np.abs(np.asarray(msg_logits)) > 1e-2
        n_bad = int((bits_diff & decisive).sum())
        if n_bad:
            mismatches.append({"field": "msg_bits_t0", "n_diff": n_bad})
    else:
        logits = heads
    lg = np.sort(np.asarray(logits), axis=-1)
    margin = lg[..., -1] - lg[..., -2]
    move_diff = np.asarray(traj["action"][0]) != np.asarray(
        jnp.argmax(logits, -1)
    )
    n_bad = int((move_diff & (margin > 1e-2)).sum())
    if n_bad:
        mismatches.append({"field": "action_t0", "n_diff": n_bad})
    if not np.allclose(
        np.asarray(traj["value"][0]), np.asarray(value), atol=2e-2
    ):
        mismatches.append({"field": "value_t0", "n_diff": -1})

    # replay the recorded actions through the XLA engine
    def replay(state, acts):
        def body(s, a):
            r = env._step_fn(s, a)
            return r.state, r.rewards

        return jax.lax.scan(body, state, acts)

    acts = jnp.asarray(traj["action"])
    if msg_bits:
        # engine consumes (N, 1 + msg_bits) MultiDiscrete rows
        acts = jnp.concatenate([acts[..., None], traj["bits"]], axis=-1)
    final, rews = jax.jit(
        jax.vmap(replay, in_axes=(0, 1), out_axes=(0, 1))
    )(states, acts)
    for f in ("agent_x", "agent_y", "shelf_x"):
        a = np.asarray(getattr(new_state, f))
        b = np.asarray(getattr(final, f))
        if not np.array_equal(a, b):
            mismatches.append({"field": f"collect_{f}", "n_diff": int((a != b).sum())})
    return {
        "ok": not mismatches,
        "mismatches": mismatches,
        "B": B,
        "T": T,
        "compile_s": compile_s,
    }


def check_gru_per_agent_collect(B=1024, T=16):
    """Per-agent GRU collect mode (recurrent SEAC, round 5) COMPILED on
    hardware: deterministic actions/values at t=0 vs the per-agent XLA
    forward, and the recorded action stream replayed through the XLA
    engine must land on the same final state."""
    import rware_tpu
    from rware_tpu.models.seac import SEACPPOConfig, init_seac_gru
    from rware_tpu.ops.pallas_rollout import build_pallas_collect
    from rware_tpu.parallel import batched_reset

    env = rware_tpu.make("rware-tiny-2ag-v2")
    cfg = SEACPPOConfig(n_envs=B)
    runner, model, tx = init_seac_gru(env, cfg, jax.random.key(0))
    states, _ = batched_reset(env, jax.random.key(2), B)
    collect = build_pallas_collect(
        env.config, T, tc_len=8, deterministic=True,
        policy="gru_per_agent", hidden=(int(model.embed), int(model.hidden)),
    )
    h0 = model.initialize_carry((B, env.n_agents))
    t0 = time.time()
    new_state, new_h, traj = collect(states, runner.params, 0, h0=h0)
    jax.block_until_ready(traj["obs"])
    compile_s = round(time.time() - t0, 1)

    from rware_tpu.models.ippo import policy_obs_fn

    mismatches = []
    obs = jax.jit(jax.vmap(policy_obs_fn(env)))(states)
    _, (logits, value) = jax.vmap(
        lambda p, c, o: model.apply(p, c, o), in_axes=(0, 1, 1),
        out_axes=1,
    )(runner.params, h0, jnp.asarray(obs))
    lg = np.sort(np.asarray(logits), axis=-1)
    margin = lg[..., -1] - lg[..., -2]
    move_diff = np.asarray(traj["action"][0]) != np.asarray(
        jnp.argmax(logits, -1)
    )
    n_bad = int((move_diff & (margin > 1e-2)).sum())
    if n_bad:
        mismatches.append({"field": "action_t0", "n_diff": n_bad})
    if not np.allclose(
        np.asarray(traj["value"][0]), np.asarray(value), atol=3e-2
    ):
        mismatches.append({"field": "value_t0", "n_diff": -1})

    def replay(state, acts):
        def body(s, a):
            r = env._step_fn(s, a)
            return r.state, r.rewards

        return jax.lax.scan(body, state, acts)

    final, _ = jax.jit(
        jax.vmap(replay, in_axes=(0, 1), out_axes=(0, 1))
    )(states, jnp.asarray(traj["action"]))
    for f in ("agent_x", "agent_y", "shelf_x"):
        a = np.asarray(getattr(new_state, f))
        b = np.asarray(getattr(final, f))
        if not np.array_equal(a, b):
            mismatches.append(
                {"field": f"collect_{f}", "n_diff": int((a != b).sum())}
            )
    return {
        "ok": not mismatches,
        "mismatches": mismatches,
        "B": B,
        "T": T,
        "compile_s": compile_s,
    }


def check_gru_image_collect(B=1024, T=16):
    """Shared-GRU collect on an IMAGE-observation config COMPILED on
    hardware (the combination behind the img+GRU learning run): t=0
    deterministic actions/values vs the RecurrentActorCritic XLA forward
    on the flattened window view, and the recorded action stream replayed
    through the XLA engine must land on the same final state."""
    import rware_tpu
    from rware_tpu.models import RecurrentActorCritic
    from rware_tpu.ops.pallas_rollout import build_pallas_collect
    from rware_tpu.parallel import batched_reset
    from rware_tpu.types import ObservationType

    env = rware_tpu.make(
        rware_tpu.WarehouseConfig(
            observation_type=ObservationType.IMAGE, request_queue_size=2
        )
    )
    L = env.config.policy_obs_length
    n = env.n_agents
    states, _ = batched_reset(env, jax.random.key(0), B)
    model = RecurrentActorCritic(n_actions=5)
    h0 = model.initialize_carry((B, n))
    params = model.init(
        jax.random.key(1), model.initialize_carry((1, n)),
        jnp.zeros((1, n, L)),
    )
    collect = build_pallas_collect(
        env.config, T, tc_len=8, deterministic=True, policy="gru",
        hidden=(int(model.embed), int(model.hidden)),
    )
    t0 = time.time()
    new_state, new_h, traj = collect(states, params, 0, h0=h0)
    jax.block_until_ready(traj["obs"])
    compile_s = round(time.time() - t0, 1)

    from rware_tpu.models.ippo import policy_obs_fn

    mismatches = []
    obs = jax.jit(jax.vmap(policy_obs_fn(env)))(states)
    _, (logits, value) = model.apply(params, h0, jnp.asarray(obs))
    lg = np.sort(np.asarray(logits), axis=-1)
    margin = lg[..., -1] - lg[..., -2]
    move_diff = np.asarray(traj["action"][0]) != np.asarray(
        jnp.argmax(logits, -1)
    )
    n_bad = int((move_diff & (margin > 1e-2)).sum())
    if n_bad:
        mismatches.append({"field": "action_t0", "n_diff": n_bad})
    if not np.allclose(
        np.asarray(traj["value"][0]), np.asarray(value), atol=3e-2
    ):
        mismatches.append({"field": "value_t0", "n_diff": -1})

    def replay(state, acts):
        def body(s, a):
            r = env._step_fn(s, a)
            return r.state, r.rewards

        return jax.lax.scan(body, state, acts)

    final, _ = jax.jit(
        jax.vmap(replay, in_axes=(0, 1), out_axes=(0, 1))
    )(states, jnp.asarray(traj["action"]))
    for f in ("agent_x", "agent_y", "shelf_x"):
        a = np.asarray(getattr(new_state, f))
        b = np.asarray(getattr(final, f))
        if not np.array_equal(a, b):
            mismatches.append(
                {"field": f"collect_{f}", "n_diff": int((a != b).sum())}
            )
    return {
        "ok": not mismatches,
        "mismatches": mismatches,
        "B": B,
        "T": T,
        "compile_s": compile_s,
    }


def check_gru_obs_update(B=1024, T=16):
    """Obs-fused GRU sequence kernels (ops/pallas_gru.build_gru_obs_*)
    vs the XLA scan path of _gru_native_replay, ON HARDWARE: same
    value_and_grad(rnn_ppo_loss_native) on a real collected batch, the
    only difference being GRU_SEQ_IMPL.  bf16 cotangent transport bounds
    the agreement (same tolerance as the CPU interpret test)."""
    import rware_tpu
    from rware_tpu.models import IPPOConfig
    from rware_tpu.models import ippo_rnn
    from rware_tpu.models.ippo_pallas import compute_gae_native
    from rware_tpu.models.ippo_rnn import (
        init_rnn_runner,
        rnn_ppo_loss_native,
    )
    from rware_tpu.ops.pallas_rollout import LANE, build_pallas_collect

    env = rware_tpu.make("rware-tiny-2ag-v2")
    cfg = IPPOConfig(n_envs=B, rollout_len=T)
    runner, model, tx = init_rnn_runner(env, cfg, jax.random.key(0))
    hidden = (int(model.embed), int(model.hidden))
    collect = build_pallas_collect(
        env.config, T, hidden=hidden, tc_len=4, policy="gru",
        native_traj=True,
    )
    rb = B // LANE
    n = env.n_agents
    hg = int(model.hidden)
    t0 = time.time()
    st, nh, traj = jax.jit(
        lambda s, p, h: collect(s, p, 0, h0=h)
    )(runner.env_states, runner.params, runner.carry)
    from rware_tpu.models.ippo import policy_obs_fn

    obs_last = jax.vmap(policy_obs_fn(env))(st)
    _, (_, last_value) = model.apply(runner.params, nh, obs_last)
    lv = jnp.swapaxes(last_value, 0, 1).reshape(n, rb, LANE)
    adv, tgt = compute_gae_native(
        cfg, traj["reward"], traj["value"], traj["done"], lv
    )
    h0n = jnp.transpose(runner.carry, (1, 0, 2)).reshape(
        n, rb, LANE, hg
    )
    batch = (
        jnp.transpose(traj["obs"], (0, 2, 3, 4, 1)), traj["done"],
        traj["action"], traj["logp"], traj["value"], adv, tgt, h0n,
    )

    def run(impl):
        old = ippo_rnn.GRU_SEQ_IMPL
        try:
            ippo_rnn.GRU_SEQ_IMPL = impl
            (loss, mets), grads = jax.jit(
                jax.value_and_grad(
                    lambda p, b: rnn_ppo_loss_native(cfg, model, p, b),
                    has_aux=True,
                )
            )(runner.params, batch)
            jax.block_until_ready(loss)
            return float(loss), jax.tree.map(np.asarray, grads)
        finally:
            ippo_rnn.GRU_SEQ_IMPL = old

    loss_x, g_x = run("xla")
    loss_p, g_p = run("pallas")
    compile_s = round(time.time() - t0, 1)
    mismatches = []
    if not np.isclose(loss_x, loss_p, rtol=5e-3, atol=1e-4):
        mismatches.append(
            {"field": "loss", "xla": loss_x, "pallas": loss_p}
        )
    worst = 0.0
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(g_x)[0],
        jax.tree_util.tree_flatten_with_path(g_p)[0],
    ):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        scale = max(np.abs(a).max(), 1e-5)
        rel = float(np.abs(a - b).max() / scale)
        worst = max(worst, rel)
        if rel > 4e-2:
            mismatches.append({"field": str(path), "rel_diff": rel})
    return {
        "ok": not mismatches,
        "mismatches": mismatches,
        "worst_grad_rel_diff": round(worst, 5),
        "B": B,
        "T": T,
        "compile_s": compile_s,
    }


def check_update_phase(B=1024, T=16):
    """Whole-update-phase kernel == per-pass kernel + optax, COMPILED on
    hardware: one full train step from the same runner, params compared."""
    import rware_tpu
    from rware_tpu.models import IPPOConfig
    from rware_tpu.models.ippo_pallas import (
        build_pallas_train_step,
        init_pallas_runner,
    )

    env = rware_tpu.make("rware-tiny-2ag-v2")
    cfg = IPPOConfig(n_envs=B, rollout_len=T, epochs=2, minibatches=2)
    runner, model, tx = init_pallas_runner(env, cfg, jax.random.key(0))
    t0 = time.time()
    outs = {}
    for phase in (False, True):
        ts = jax.jit(
            build_pallas_train_step(
                env, model, tx, cfg, deterministic_collect=True,
                fused_update_phase=phase,
            )
        )
        r1, _ = ts(runner)
        outs[phase] = jax.tree.leaves(
            jax.tree.map(np.asarray, r1.params)
        )
    compile_s = round(time.time() - t0, 1)
    mismatches = []
    for i, (a, b) in enumerate(zip(outs[False], outs[True])):
        err = np.abs(a.astype(np.float32) - b.astype(np.float32)).max()
        scale = max(np.abs(a).max(), 1e-8)
        if err / scale > 1e-3:
            mismatches.append({"field": f"param_leaf_{i}",
                               "rel_err": float(err / scale)})
    return {
        "ok": not mismatches,
        "mismatches": mismatches,
        "B": B,
        "T": T,
        "compile_s": compile_s,
    }


def check_mappo_combined_update(B=1024, T=16):
    """Combined actor+critic MAPPO kernel (build_fused_mappo_grads +
    build_fused_critic_values) == XLA autodiff of mappo_loss_native,
    COMPILED on hardware: one full train step from the same runner (same
    deterministic trajectory), params compared within bf16 bound."""
    import rware_tpu
    from rware_tpu.models import IPPOConfig
    from rware_tpu.models.mappo import (
        build_mappo_train_step,
        init_mappo_runner,
    )

    env = rware_tpu.make("rware-tiny-2ag-v2")
    cfg = IPPOConfig(n_envs=B, rollout_len=T, epochs=2, minibatches=2)
    runner, actor, critic, tx = init_mappo_runner(
        env, cfg, jax.random.key(0)
    )
    t0 = time.time()
    outs = {}
    for name, kw in (
        ("combined", dict(fused_critic_update=True)),
        ("xla", dict(fused_actor_update=False)),
    ):
        ts = jax.jit(
            build_mappo_train_step(
                env, actor, critic, tx, cfg, deterministic_collect=True,
                **kw,
            )
        )
        r1, _ = ts(runner)
        outs[name] = jax.tree_util.tree_flatten_with_path(
            jax.tree.map(np.asarray, r1.params)
        )[0]
    compile_s = round(time.time() - t0, 1)
    mismatches = []
    worst = 0.0
    for (path, a), (_, b) in zip(outs["combined"], outs["xla"]):
        # Adam steps are ~lr-sized; bf16 kernel grads may flip near-zero
        # directions, bounding agreement at a few lr (3e-4 default)
        err = float(
            np.abs(a.astype(np.float32) - b.astype(np.float32)).max()
        )
        worst = max(worst, err)
        if err > 5e-3:
            mismatches.append({"field": str(path), "abs_err": err})
    return {
        "ok": not mismatches,
        "mismatches": mismatches,
        "worst_param_abs_diff": round(worst, 6),
        "B": B,
        "T": T,
        "compile_s": compile_s,
    }


def check_rnn_mappo_msg_update(B=1024, T=16):
    """Recurrent MAPPO + msg_bits (the round-5 capability-frontier path):
    GRU collect with in-kernel Bernoulli message head -> central critic
    on the msg-augmented joint obs; fused critic kernel == XLA critic
    autodiff on the identical deterministic trajectory, COMPILED on
    hardware (the CPU test runs interpret mode only —
    tests/test_mappo.py:324)."""
    import rware_tpu
    from rware_tpu.models import IPPOConfig
    from rware_tpu.models.mappo import (
        build_rnn_mappo_train_step,
        init_rnn_mappo_runner,
    )

    env = rware_tpu.make("rware-tiny-2ag-v2", msg_bits=2)
    cfg = IPPOConfig(n_envs=B, rollout_len=T, epochs=1, minibatches=2)
    runner, actor, critic, tx = init_rnn_mappo_runner(
        env, cfg, jax.random.key(0)
    )
    t0 = time.time()
    outs = {}
    for fused in (True, False):
        ts = jax.jit(
            build_rnn_mappo_train_step(
                env, actor, critic, tx, cfg,
                deterministic_collect=True, fused_critic_update=fused,
            )
        )
        r1, _ = ts(runner)
        outs[fused] = jax.tree_util.tree_flatten_with_path(
            jax.tree.map(np.asarray, r1.params)
        )[0]
    compile_s = round(time.time() - t0, 1)
    # the message head must take gradient (bits join the actor loss)
    msg_moved = any(
        "message" in str(path)
        and float(np.abs(np.asarray(a, np.float32)).sum()) > 0
        and not np.array_equal(a, b)
        for ((path, a), (_, b)) in zip(
            outs[True],
            jax.tree_util.tree_flatten_with_path(runner.params)[0],
        )
    )
    mismatches = []
    worst = 0.0
    for (path, a), (_, b) in zip(outs[True], outs[False]):
        err = float(np.abs(
            a.astype(np.float32) - b.astype(np.float32)
        ).max())
        worst = max(worst, err)
        if err > 5e-3:
            mismatches.append({"field": str(path), "abs_err": err})
    return {
        "ok": msg_moved and not mismatches,
        "msg_head_moved": msg_moved,
        "mismatches": mismatches,
        "worst_param_abs_diff": round(worst, 6),
        "B": B,
        "T": T,
        "compile_s": compile_s,
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="TPUPARITY.json")
    p.add_argument("--configs", nargs="*", default=CONFIGS)
    args = p.parse_args()

    results = {"device": jax.devices()[0].device_kind}
    for env_id in args.configs:
        try:
            results[env_id] = check_rollout(env_id)
        except Exception as e:  # noqa: BLE001 — record, keep going
            results[env_id] = {"ok": False, "error": repr(e)[:500]}
        print(env_id, results[env_id], flush=True)
    # batch-chunked large-grid program (the compile-threshold mitigation)
    try:
        results["large-8ag-chunked"] = check_rollout(
            "rware-large-8ag-v2", B=2048
        )
    except Exception as e:  # noqa: BLE001
        results["large-8ag-chunked"] = {"ok": False, "error": repr(e)[:500]}
    print("large-8ag-chunked", results["large-8ag-chunked"], flush=True)
    try:
        results["update-phase-kernel"] = check_update_phase()
    except Exception as e:  # noqa: BLE001
        results["update-phase-kernel"] = {"ok": False, "error": repr(e)[:500]}
    print("update-phase-kernel", results["update-phase-kernel"], flush=True)
    try:
        results["gru-obs-update"] = check_gru_obs_update()
    except Exception as e:  # noqa: BLE001
        results["gru-obs-update"] = {"ok": False, "error": repr(e)[:500]}
    print("gru-obs-update", results["gru-obs-update"], flush=True)
    try:
        results["mappo-combined-update"] = check_mappo_combined_update()
    except Exception as e:  # noqa: BLE001
        results["mappo-combined-update"] = {
            "ok": False, "error": repr(e)[:500]
        }
    print(
        "mappo-combined-update", results["mappo-combined-update"],
        flush=True,
    )
    try:
        results["rnn-mappo-msg-update"] = check_rnn_mappo_msg_update()
    except Exception as e:  # noqa: BLE001
        results["rnn-mappo-msg-update"] = {
            "ok": False, "error": repr(e)[:500]
        }
    print(
        "rnn-mappo-msg-update", results["rnn-mappo-msg-update"],
        flush=True,
    )
    for name, kw in (
        ("collect-tiny-2ag", {}),
        ("collect-msg-bits-2ag", {"msg_bits": 2}),
        ("collect-image-2ag", {"image": True}),
    ):
        try:
            results[name] = check_collect(**kw)
        except Exception as e:  # noqa: BLE001
            results[name] = {"ok": False, "error": repr(e)[:500]}
        print(name, results[name], flush=True)
    try:
        results["collect-gru-image"] = check_gru_image_collect()
    except Exception as e:  # noqa: BLE001
        results["collect-gru-image"] = {"ok": False, "error": repr(e)[:500]}
    print("collect-gru-image", results["collect-gru-image"], flush=True)
    try:
        results["collect-gru-per-agent"] = check_gru_per_agent_collect()
    except Exception as e:  # noqa: BLE001
        results["collect-gru-per-agent"] = {
            "ok": False, "error": repr(e)[:500]
        }
    print(
        "collect-gru-per-agent", results["collect-gru-per-agent"],
        flush=True,
    )

    results["all_ok"] = all(
        v.get("ok", True) for v in results.values() if isinstance(v, dict)
    )
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({"tpu_parity_ok": results["all_ok"]}))


if __name__ == "__main__":
    main()
