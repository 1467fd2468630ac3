#!/usr/bin/env python
"""Measure how often the resolver's pinned tie-break actually fires.

Context (VERDICT round-1, weak #4): lockstep parity vs the reference is
proven with the reference's equal-chain tie order pinned to
lowest-agent-index (tests/ref_utils.pinned_reference_tiebreak), because
upstream's networkx traversal order is CPython set-hash noise.  This tool
quantifies how much behaviour that pin actually covers: over random-action
rollouts it counts env-steps where two MOVING chains of equal length
contend for the same cell — the only situation where the pinned order can
differ from an arbitrary upstream run.

Output: one JSON line with per-config tie rates (ties per env-step and the
fraction of env-steps with >= 1 tie).
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def build_tie_stat_fn(env):
    """stat(state, actions) -> (n_tie_pairs, any_tie) for one env.

    Replicates the engine's target computation + pre-cancel
    (core/engine.py:168-189, reference rware/warehouse.py:102-116,829-843)
    and the resolver's depth metric (ops/resolver.py:118-131), then counts
    unordered pairs (i, j) that share a target cell with equal, maximal
    chain depth while both actually moving — the tie the pinned
    lowest-index rule decides.
    """
    from rware_tpu.core.engine import DIR_DX, DIR_DY
    from rware_tpu.types import Action

    layout = env.config.compile_layout()
    height, width = layout.grid_size
    dir_dx = jnp.asarray(DIR_DX)
    dir_dy = jnp.asarray(DIR_DY)

    def stat(state, acts):
        ax, ay, adir = state.agent_x, state.agent_y, state.agent_dir
        carrying = state.agent_carrying
        is_forward = acts == Action.FORWARD
        tx = jnp.clip(ax + jnp.where(is_forward, dir_dx[adir], 0), 0, width - 1)
        ty = jnp.clip(ay + jnp.where(is_forward, dir_dy[adir], 0), 0, height - 1)
        shelf_at_target = jnp.any(
            (tx[:, None] == state.shelf_x[None, :])
            & (ty[:, None] == state.shelf_y[None, :]),
            axis=1,
        )
        agent_at_target = (tx[:, None] == ax[None, :]) & (
            ty[:, None] == ay[None, :]
        )
        target_agent_loaded = jnp.any(
            agent_at_target & (carrying[None, :] >= 0), axis=1
        )
        moving = (tx != ax) | (ty != ay)
        cancelled = (
            (carrying >= 0) & moving & shelf_at_target & ~target_agent_loaded
        )
        tx = jnp.where(cancelled, ax, tx)
        ty = jnp.where(cancelled, ay, ty)
        moving = (tx != ax) | (ty != ay)

        n = ax.shape[0]
        match = (tx[:, None] == ax[None, :]) & (ty[:, None] == ay[None, :])
        pred = match.T

        def depth_body(_, depth):
            return 1 + jnp.max(jnp.where(pred, depth[None, :], 0), axis=1)

        depth = jax.lax.fori_loop(
            0, n, depth_body, jnp.ones(n, dtype=jnp.int32), unroll=True
        )

        shared = (
            (tx[:, None] == tx[None, :]) & (ty[:, None] == ty[None, :])
        )
        both_moving = moving[:, None] & moving[None, :]
        eq_depth = depth[:, None] == depth[None, :]
        # maximal: no third agent contends for the same cell with deeper chain
        deeper_exists = jnp.any(
            shared & (depth[None, :] > depth[:, None]) & moving[None, :],
            axis=1,
        )
        upper = jnp.triu(jnp.ones((n, n), dtype=bool), k=1)
        tie = (
            shared
            & both_moving
            & eq_depth
            & upper
            & ~deeper_exists[:, None]
            & ~deeper_exists[None, :]
        )
        n_ties = tie.sum()
        return n_ties, (n_ties > 0)

    return stat


def main():
    p = argparse.ArgumentParser()
    p.add_argument(
        "--configs", nargs="*",
        default=["rware-tiny-2ag-v2", "rware-tiny-4ag-v2",
                 "rware-small-4ag-v2", "rware-medium-6ag-v2",
                 "rware-large-8ag-v2", "rware-tiny-12ag-v2"],
    )
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--steps", type=int, default=256)
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import rware_tpu
    from rware_tpu.parallel import batched_reset

    out = {}
    for env_id in args.configs:
        env = rware_tpu.make(env_id)
        stat = build_tie_stat_fn(env)
        step_fn = env._step_fn

        def one_env(state, key):
            def body(carry, k):
                state, ties, any_tie = carry
                acts = env.sample_actions(k)
                t, a = stat(state, acts)
                res = step_fn(state, acts)
                return (res.state, ties + t, any_tie + a.astype(jnp.int32)), None

            (state, ties, any_tie), _ = jax.lax.scan(
                body,
                (state, jnp.int32(0), jnp.int32(0)),
                jax.random.split(key, args.steps),
            )
            return ties, any_tie

        states, _ = batched_reset(env, jax.random.key(0), args.batch)
        keys = jax.random.split(jax.random.key(1), args.batch)
        ties, any_tie = jax.jit(jax.vmap(one_env))(states, keys)
        total_steps = args.batch * args.steps
        out[env_id] = {
            "ties_per_env_step": round(float(np.asarray(ties).sum()) / total_steps, 6),
            "frac_steps_with_tie": round(
                float(np.asarray(any_tie).sum()) / total_steps, 6
            ),
            "env_steps": total_steps,
        }
        print(env_id, out[env_id], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
