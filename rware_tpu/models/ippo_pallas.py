"""IPPO with the fused Pallas experience collector.

The collect phase — observations, MLP policy forward, Gumbel sampling and
the env transition — runs entirely inside the Pallas rollout kernel
(ops/pallas_rollout.build_pallas_collect): one dispatch per env-block per
time-chunk, all state in VMEM, trajectories streamed to HBM in bf16.  The
PPO update (GAE + E x M minibatched SGD) stays in XLA where the MXU already
runs it at peak.  The two phases compose inside one jitted train step.

Numerics note: the in-kernel MLP matches models.networks.ActorCritic (bf16
hidden compute, f32 heads, tanh) but is a distinct lowering, so stored
logp/value differ from an XLA re-evaluation at bf16 epsilon; PPO's ratio
is computed against the stored logp, so this is equivalent to a slightly
perturbed behaviour policy — harmless for on-policy learning.
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from rware_tpu.core.env import Warehouse
from rware_tpu.models.ippo import (
    IPPOConfig,
    RunnerState,
    compute_gae,
    make_optimizer,
    ppo_update_epochs,
)
from rware_tpu.models.networks import ActorCritic


def _pick_tc_len(t: int) -> int:
    # 8 keeps the kernel's scoped-VMEM block budget under the 16MB limit
    # alongside XLA-placed operands (16 overflows by ~1MB at B=4096)
    for tc in (8, 4, 2, 1):
        if t % tc == 0:
            return tc
    return 1


def init_pallas_runner(env, cfg, key, model=None):
    """Same runner as models.ippo.init_runner (shapes are compatible)."""
    from rware_tpu.models.ippo import init_runner

    return init_runner(env, cfg, key, model)


def build_pallas_train_step(
    env: Warehouse,
    model: ActorCritic,
    tx: optax.GradientTransformation,
    cfg: IPPOConfig,
    interpret: bool = False,
    deterministic_collect: bool = False,
) -> Callable[[RunnerState], Tuple[RunnerState, dict]]:
    from rware_tpu.ops.pallas_rollout import build_pallas_collect

    hidden = tuple(model.hidden)
    collect = build_pallas_collect(
        env.config,
        cfg.rollout_len,
        hidden=hidden,
        tc_len=_pick_tc_len(cfg.rollout_len),
        interpret=interpret,
        deterministic=deterministic_collect,
    )
    obs_fn = jax.vmap(env._obs_fn)

    from rware_tpu.ops.pallas_rollout import ENV_BLOCK

    # the kernel consumes one PRNG stream per (env-block, time-chunk); a
    # stride of update_idx * streams_per_update keeps streams disjoint
    # across the whole run (a uniformly random per-update seed would
    # birthday-collide at scale)
    streams_per_update = (cfg.n_envs // ENV_BLOCK) * max(
        1, cfg.rollout_len // _pick_tc_len(cfg.rollout_len)
    )

    def train_step(runner: RunnerState) -> Tuple[RunnerState, dict]:
        key, k_perm = jax.random.split(runner.key, 2)
        seed = runner.update_idx * jnp.int32(streams_per_update)

        env_states, traj = collect(runner.env_states, runner.params, seed)

        obs = obs_fn(env_states)
        _, last_value = model.apply(runner.params, obs)
        advantages, targets = compute_gae(
            cfg, traj["reward"], traj["value"], traj["done"], last_value
        )

        def flat(x):
            return x.reshape((cfg.rollout_len * cfg.n_envs,) + x.shape[2:])

        dataset = (
            flat(traj["obs"].astype(jnp.float32)),
            flat(traj["action"]),
            flat(traj["logp"]),
            flat(traj["value"]),
            flat(advantages),
            flat(targets),
        )
        (params, opt_state), metrics = ppo_update_epochs(
            model, cfg, tx, runner.params, runner.opt_state, dataset, k_perm
        )
        out_metrics = {
            "reward_per_env": traj["reward"].sum() / cfg.n_envs,
            "episodes_done": traj["done"].sum(),
            **jax.tree.map(lambda x: x.mean(), metrics),
        }
        return (
            RunnerState(
                params=params,
                opt_state=opt_state,
                env_states=env_states,
                obs=obs,
                key=key,
                update_idx=runner.update_idx + 1,
            ),
            out_metrics,
        )

    return train_step
