"""Ad-hoc differential driver (also used by test_differential.py).

Runs the reference env and the JAX engine in lockstep under a shared action
script, comparing full state, rewards, done flags and flattened observations
each step.  See ref_utils module docstring for the queue-sync protocol.
"""
import numpy as np
import jax
import jax.numpy as jnp

import rware_tpu
from tests.ref_utils import (
    compare_to_ref,
    pinned_reference_tiebreak,
    state_from_ref,
    sync_queue_from_ref,
)


def run_differential(
    env_id: str,
    n_steps: int = 300,
    seed: int = 0,
    check_obs: bool = True,
    ref_kwargs=None,
    overrides=None,
    biased: bool = False,
    count_deliveries: bool = False,
):
    """Return a list of mismatch strings over an n_steps random rollout.

    ``biased`` favours FORWARD/TOGGLE so deliveries actually occur;
    ``count_deliveries`` appends a final ``deliveries=K`` record for sanity.
    """
    import sys

    sys.path.insert(0, "/root/reference")
    import gymnasium as gym
    import rware  # noqa: F401  (registers reference env ids)

    try:
        ref_env = gym.make(env_id, **(ref_kwargs or {})).unwrapped
    except gym.error.NameNotFound:
        # ids outside the default grid (sensor range, RxC, column height):
        # construct the reference env directly — its full_registration()
        # builds ~100k gymnasium entries and takes tens of minutes
        from rware.warehouse import RewardType as RefRT, Warehouse as RefWarehouse

        from rware_tpu.registry import parse_env_id

        cfg = parse_env_id(env_id)
        ref_env = RefWarehouse(
            cfg.shelf_columns,
            cfg.column_height,
            cfg.shelf_rows,
            cfg.n_agents,
            cfg.msg_bits,
            cfg.sensor_range,
            cfg.request_queue_size,
            cfg.max_inactivity_steps,
            cfg.max_steps,
            RefRT(int(cfg.reward_type)),
            **(ref_kwargs or {}),
        )
    ref_obs, _ = ref_env.reset(seed=seed)

    env = rware_tpu.make(env_id, **(overrides or {}))
    state = state_from_ref(ref_env, env.config, jax.random.key(seed))
    step = env.step
    obs_fn = env.observe

    rng = np.random.default_rng(seed + 1)
    errs = []
    deliveries = 0
    p = [0.05, 0.55, 0.125, 0.125, 0.15] if biased else None
    for t in range(n_steps):
        acts = rng.choice(5, size=env.config.n_agents, p=p)
        with pinned_reference_tiebreak(ref_env):
            ref_obs, ref_rew, ref_done, ref_trunc, _ = ref_env.step(list(acts))
        res = step(state, jnp.asarray(acts, dtype=jnp.int32))
        if np.asarray(ref_rew).sum() > 0:
            deliveries += 1

        errs += [f"t={t}: {e}" for e in compare_to_ref(res.state, ref_env)]
        if not np.allclose(np.asarray(res.rewards), np.asarray(ref_rew)):
            errs.append(f"t={t}: rewards {np.asarray(res.rewards)} != {ref_rew}")
        if bool(res.done) != bool(ref_done):
            errs.append(f"t={t}: done {bool(res.done)} != {ref_done}")

        # Queues must agree except in slots the reference just resampled
        # (RNG streams differ there); re-sync ours to the reference's.
        state = sync_queue_from_ref(res.state, ref_env)

        if check_obs:
            ours = obs_fn(state)
            for i in range(env.config.n_agents):
                mine = (
                    np.asarray(ours["image"][i])
                    if isinstance(ours, dict)
                    else np.asarray(ours[i])
                )
                theirs = np.asarray(
                    ref_obs[i]["image"]
                    if isinstance(ref_obs[i], dict)
                    else ref_obs[i]
                )
                if not np.allclose(mine, theirs):
                    bad = np.nonzero(~np.isclose(mine, theirs).reshape(-1))[0]
                    errs.append(
                        f"t={t}: obs agent {i} differs at dims {bad[:8]}"
                        f" ours={mine.reshape(-1)[bad[:8]]}"
                        f" ref={theirs.reshape(-1)[bad[:8]]}"
                    )
        if errs and len(errs) > 12:
            break
        if ref_done:
            ref_obs, _ = ref_env.reset(seed=seed + t + 1)
            state = state_from_ref(ref_env, env.config, jax.random.key(seed + t))
    if count_deliveries:
        errs.append(f"deliveries={deliveries}")
    return errs


if __name__ == "__main__":
    import sys

    for env_id in sys.argv[1:] or ["rware-tiny-2ag-v2"]:
        errs = run_differential(env_id, n_steps=200)
        status = "OK" if not errs else "FAIL"
        print(f"{env_id}: {status}")
        for e in errs[:12]:
            print("   ", e)
