#!/usr/bin/env python
"""Distributional validation of the PRODUCTION Pallas rollout path.

Scripted mode is bit-exact vs the XLA engine (tests/test_pallas.py), but the
path training actually runs — in-kernel Gumbel-argmax sampling from masked
23-bit PRNG uniforms, in-kernel autoreset respawns
(ops/pallas_rollout.py:26-32 documents the deviations) — had only indirect
evidence (learning curves).  This tool measures the deviations directly on
hardware and writes DISTCHECK.json; tests/test_distcheck.py pins the
committed artifact's bounds.

Checks (all statistics are reduced ON DEVICE — this backend's bulk
device->host fetches are unsafe, so only O(actions + grid cells) scalars
ever cross the tunnel):

  A. Sampler exactness: an all-zero policy gives exactly uniform logits, so
     kernel action frequencies must be Multinomial(1/5) and message bits
     Bernoulli(1/2) — five-sigma binomial bounds on ~0.5M samples.  This
     isolates the modulo/23-bit-uniform sampling machinery from env
     dynamics.
  B. End-to-end marginals vs the XLA engine: the SAME random-init policy
     rolled out by the stochastic kernel and by the vmap+scan XLA path
     (jax.random sampling).  Action marginals and per-step delivery rates
     must agree within combined sampling noise.
  C. Respawn uniformity: with max_steps=32 the in-kernel autoreset fires
     every 32 steps; the post-done observation rows carry the respawned
     (x, y) and direction.  Chi-square vs uniform over the grid cells and
     the 4 directions (the reference resets agents uniformly over ALL
     cells without replacement — warehouse.py reset; marginal per agent is
     uniform).

Usage: timeout 3400 python tools/dist_check.py --out DISTCHECK.json
"""
import argparse
import json
import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _chi2_z(counts, probs=None):
    """Normal-approx z of the chi-square stat (df = k-1)."""
    import numpy as np

    counts = np.asarray(counts, dtype=np.float64)
    total = counts.sum()
    k = counts.size
    exp = total * (np.full(k, 1.0 / k) if probs is None else np.asarray(probs))
    x2 = float(((counts - exp) ** 2 / exp).sum())
    df = k - 1
    return x2, df, (x2 - df) / math.sqrt(2 * df)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "DISTCHECK.json"))
    ap.add_argument("--n-envs", type=int, default=2048)
    ap.add_argument("--chunks", type=int, default=16)
    ap.add_argument("--chunk-len", type=int, default=128)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from rware_tpu.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    import rware_tpu
    from rware_tpu.models import ActorCritic
    from rware_tpu.models.ippo import policy_obs_fn
    from rware_tpu.models.networks import sample_action
    from rware_tpu.ops.pallas_rollout import ENV_BLOCK, LANE, build_pallas_collect
    from rware_tpu.parallel.rollout import autoreset_select

    B, K, T = args.n_envs, args.chunks, args.chunk_len
    A = 5
    results = {"samples_per_check": B * K * T, "checks": []}

    def run_pallas(env, params, extra_stats=None, msg_bits=0):
        """K chained stochastic collects; on-device stat accumulation."""
        collect = build_pallas_collect(
            env.config, T, native_traj=True
        )
        n_tc = max(1, T // 16)
        streams = (B // ENV_BLOCK) * n_tc
        n = env.n_agents

        def chunk(carry, k):
            state, acc = carry
            new_state, traj = collect(state, params, k * streams)
            act = traj["action"]  # (T, N, RB, LANE) int32
            one_hot = jax.nn.one_hot(act, A, dtype=jnp.float32)
            acc = dict(acc)
            acc["action_counts"] = acc["action_counts"] + one_hot.sum(
                axis=(0, 1, 2, 3)
            )
            acc["reward_sum"] = acc["reward_sum"] + traj["reward"].astype(
                jnp.float32
            ).sum()
            acc["done_sum"] = acc["done_sum"] + traj["done"].astype(
                jnp.float32
            ).sum()
            if msg_bits:
                acc["bits_sum"] = acc["bits_sum"] + traj["bits"].astype(
                    jnp.float32
                ).sum()
            if extra_stats is not None:
                acc = extra_stats(acc, traj)
            return (new_state, acc), None

        def run(key):
            states = jax.vmap(env._reset_fn)(jax.random.split(key, B))
            acc = {
                "action_counts": jnp.zeros((A,), jnp.float32),
                "reward_sum": jnp.zeros((), jnp.float32),
                "done_sum": jnp.zeros((), jnp.float32),
            }
            if msg_bits:
                acc["bits_sum"] = jnp.zeros((), jnp.float32)
            if extra_stats is not None:
                acc = extra_stats(acc, None)
            (state, acc), _ = jax.lax.scan(
                chunk, (states, acc), jnp.arange(K, dtype=jnp.int32)
            )
            return acc

        return jax.tree.map(np.asarray, jax.jit(run)(jax.random.key(0)))

    # ---------------- A: sampler exactness under uniform logits ---------
    env = rware_tpu.make("rware-tiny-2ag-v2")
    model = ActorCritic(n_actions=env.n_actions)
    obs_dim = env.config.flattened_obs_length
    p0 = model.init(
        jax.random.key(1), jnp.zeros((1, env.n_agents, obs_dim))
    )
    zeros = jax.tree.map(jnp.zeros_like, p0)
    accA = run_pallas(env, zeros)
    nA = accA["action_counts"].sum()
    freqA = accA["action_counts"] / nA
    sigA = math.sqrt(0.2 * 0.8 / nA)
    devA = float(np.abs(freqA - 0.2).max())
    x2A, dfA, zA = _chi2_z(accA["action_counts"])
    results["checks"].append({
        "name": "A_uniform_policy_action_marginals",
        "n_samples": float(nA),
        "freq": [float(f) for f in freqA],
        "max_abs_dev_from_0.2": devA,
        "binomial_sigma": sigA,
        "dev_sigmas": devA / sigA,
        "chi2": x2A, "df": dfA, "chi2_z": zA,
        "ok": bool(devA < 5 * sigA and abs(zA) < 6),
    })

    # A': message bits at exactly Bernoulli(1/2)
    env_m = rware_tpu.make("rware-tiny-2ag-v2", msg_bits=2)
    model_m = ActorCritic(n_actions=env_m.n_actions, msg_bits=2)
    obs_dim_m = env_m.config.flattened_obs_length
    pm = model_m.init(
        jax.random.key(2), jnp.zeros((1, env_m.n_agents, obs_dim_m))
    )
    zeros_m = jax.tree.map(jnp.zeros_like, pm)
    accM = run_pallas(env_m, zeros_m, msg_bits=2)
    n_bits = accM["action_counts"].sum() * 2  # N*M bit rows = 2 bits/agent
    p_bit = float(accM["bits_sum"] / n_bits)
    sig_bit = math.sqrt(0.25 / n_bits)
    results["checks"].append({
        "name": "A_uniform_policy_message_bits",
        "n_samples": float(n_bits),
        "p_bit": p_bit,
        "binomial_sigma": sig_bit,
        "dev_sigmas": abs(p_bit - 0.5) / sig_bit,
        "ok": bool(abs(p_bit - 0.5) < 5 * sig_bit),
    })

    # ---------------- B: Pallas vs XLA end-to-end marginals -------------
    accB = run_pallas(env, p0)

    obs_fn = jax.vmap(policy_obs_fn(env))
    step_fn = jax.vmap(env._step_fn)
    reset_fn = env._reset_fn

    def run_xla(key):
        k_env, k_roll = jax.random.split(key)
        states = jax.vmap(reset_fn)(jax.random.split(k_env, B))

        def one(carry, key):
            states, acc = carry
            obs = obs_fn(states)
            heads, _ = model.apply(p0, obs)
            action, _logp = sample_action(key, heads)
            res = step_fn(states, action)
            nxt = jax.vmap(
                lambda s, d: autoreset_select(reset_fn, s, d)
            )(res.state, res.done)
            acc = {
                "action_counts": acc["action_counts"]
                + jax.nn.one_hot(action, A, dtype=jnp.float32).sum((0, 1)),
                "reward_sum": acc["reward_sum"]
                + res.rewards.astype(jnp.float32).sum(),
                "done_sum": acc["done_sum"]
                + res.done.astype(jnp.float32).sum(),
            }
            return (nxt, acc), None

        acc = {
            "action_counts": jnp.zeros((A,), jnp.float32),
            "reward_sum": jnp.zeros((), jnp.float32),
            "done_sum": jnp.zeros((), jnp.float32),
        }
        (states, acc), _ = jax.lax.scan(
            one, (states, acc), jax.random.split(k_roll, K * T)
        )
        return acc

    accX = jax.tree.map(np.asarray, jax.jit(run_xla)(jax.random.key(3)))
    nP = accB["action_counts"].sum()
    nX = accX["action_counts"].sum()
    fP, fX = accB["action_counts"] / nP, accX["action_counts"] / nX
    diff = float(np.abs(fP - fX).max())
    # combined binomial noise at p<=0.5, plus slack for state-distribution
    # autocorrelation (envs are independent; time within an env is not)
    sigB = math.sqrt(0.5 * 0.5 * (1 / nP + 1 / nX))
    rewP = float(accB["reward_sum"]) / nP * env.n_agents
    rewX = float(accX["reward_sum"]) / nX * env.n_agents
    cntP, cntX = float(accB["reward_sum"]), float(accX["reward_sum"])
    # Poisson z on delivery counts (equal exposure)
    z_rate = (cntP - cntX) / math.sqrt(max(cntP + cntX, 1.0))
    results["checks"].append({
        "name": "B_pallas_vs_xla_end_to_end",
        "n_samples": float(nP),
        "action_freq_pallas": [float(f) for f in fP],
        "action_freq_xla": [float(f) for f in fX],
        "max_abs_freq_diff": diff,
        "freq_tolerance": max(0.01, 8 * sigB),
        "deliveries_pallas": cntP,
        "deliveries_xla": cntX,
        "delivery_rate_z": z_rate,
        "ok": bool(diff < max(0.01, 8 * sigB) and abs(z_rate) < 6),
    })

    # ---------------- C: respawn uniformity ------------------------------
    env_s = rware_tpu.make("rware-tiny-2ag-v2", max_steps=32)
    H, W = env_s.config.grid_size
    cells = H * W

    def respawn_stats(acc, traj):
        if traj is None:
            return {
                **acc,
                "cell_hist": jnp.zeros((cells,), jnp.float32),
                "dir_hist": jnp.zeros((4,), jnp.float32),
            }
        obs = traj["obs"]  # (T, L, N, RB, LANE) bf16
        done = traj["done"].astype(jnp.float32)  # (T, 1, RB, LANE)
        mask = done[:-1, 0][:, None]  # (T-1, 1, RB, LANE) -> per agent bc
        x = obs[1:, 0].astype(jnp.float32)  # (T-1, N, RB, LANE)
        y = obs[1:, 1].astype(jnp.float32)
        cid = (y * W + x).astype(jnp.int32).reshape(-1)
        m = jnp.broadcast_to(mask, x.shape).reshape(-1)
        hist = jnp.zeros((cells,), jnp.float32).at[cid].add(m)
        dirs = jnp.stack(
            [
                (obs[1:, 3 + d].astype(jnp.float32)
                 * jnp.broadcast_to(mask, x.shape)).sum()
                for d in range(4)
            ]
        )
        return {
            **acc,
            "cell_hist": acc["cell_hist"] + hist,
            "dir_hist": acc["dir_hist"] + dirs,
        }

    accC = run_pallas(env_s, p0, extra_stats=respawn_stats)
    n_resp = float(accC["cell_hist"].sum())
    x2C, dfC, zC = _chi2_z(accC["cell_hist"])
    x2D, dfD, zD = _chi2_z(accC["dir_hist"])
    results["checks"].append({
        "name": "C_respawn_uniformity",
        "n_respawns": n_resp,
        "cells": cells,
        "cell_chi2": x2C, "cell_df": dfC, "cell_chi2_z": zC,
        "dir_chi2": x2D, "dir_df": dfD, "dir_chi2_z": zD,
        "max_cell_count": float(accC["cell_hist"].max()),
        "min_cell_count": float(accC["cell_hist"].min()),
        "ok": bool(abs(zC) < 6 and abs(zD) < 6 and n_resp > 10000),
    })

    results["all_ok"] = all(c["ok"] for c in results["checks"])
    results["platform"] = jax.devices()[0].platform
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    for c in results["checks"]:
        print(c["name"], "ok=", c["ok"])
    print(f"wrote {args.out}; all_ok={results['all_ok']}")


if __name__ == "__main__":
    main()
