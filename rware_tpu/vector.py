"""Gymnasium ``VectorEnv`` over the batched functional engine.

The reference has no vector API — users wrap N ``Warehouse`` objects in
``gymnasium.vector.SyncVectorEnv`` / ``AsyncVectorEnv`` and step them one
Python call per env (``/root/reference/rware/warehouse.py:804``).  Here the
whole batch is ONE jitted XLA program (``vmap`` over envs, on-device
autoreset), so external training loops (cleanrl / SB3-style) get the
device-batched engine through the standard ``gym.vector`` contract instead
of a host loop.

Semantics follow Gymnasium 1.x ``AutoresetMode.NEXT_STEP``: the step that
terminates an episode returns its final observation/reward; the *next*
``step`` call resets that env on device (its action is ignored) and returns
the reset observation with zero reward and ``terminated=False``.

Multi-agent shapes: observations/actions keep the reference's per-agent
tuple structure (batched leaves, via ``gymnasium.vector.utils.batch_space``);
``rewards`` is ``(num_envs, n_agents)`` float32 — per-agent rewards are the
point of this env, so they are not summed away.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import gymnasium as gym
import numpy as np
import jax
import jax.numpy as jnp
from gymnasium.vector.utils import batch_space

from rware_tpu.config import WarehouseConfig
from rware_tpu.core.env import Warehouse
from rware_tpu.gym_adapter import GymWarehouse
from rware_tpu.registry import parse_env_id
from rware_tpu.types import ObservationType


class VectorGymWarehouse(gym.vector.VectorEnv):
    """``num_envs`` warehouses stepping as one XLA program."""

    metadata = {
        "render_modes": ["rgb_array"],
        "autoreset_mode": gym.vector.AutoresetMode.NEXT_STEP,
    }

    def __init__(
        self,
        env_id_or_config: Any = "rware-tiny-2ag-v2",
        num_envs: int = 8,
        **overrides,
    ):
        if isinstance(env_id_or_config, WarehouseConfig):
            config = env_id_or_config
            if overrides:
                import dataclasses

                config = dataclasses.replace(config, **overrides)
        else:
            config = parse_env_id(env_id_or_config)
            if overrides:
                import dataclasses

                config = dataclasses.replace(config, **overrides)
        self.config = config
        self.num_envs = int(num_envs)
        self._env = Warehouse(config)

        # Single-env spaces come from the scalar adapter (one source of truth
        # for the reference space layout); batched spaces are derived.
        proto = GymWarehouse(config)
        self.single_observation_space = proto.observation_space
        self.single_action_space = proto.action_space
        self.observation_space = batch_space(
            self.single_observation_space, self.num_envs
        )
        self.action_space = batch_space(self.single_action_space, self.num_envs)

        self._states = None
        self._prev_done = None
        self._vreset = jax.jit(self._build_reset())
        self._vstep = jax.jit(self._build_step())

    # -- jitted programs -------------------------------------------------------

    def _build_reset(self):
        env = self._env

        def vreset(keys: jax.Array):
            states = jax.vmap(env._reset_fn)(keys)
            return states, jax.vmap(env._obs_fn)(states)

        return vreset

    def _build_step(self):
        """NEXT_STEP autoreset: envs flagged done on the previous step are
        reset (action ignored) instead of stepped."""
        env = self._env
        step_fn = env._step_fn
        reset_fn = env._reset_fn
        obs_fn = env._obs_fn

        def one(state, prev_done, action):
            res = step_fn(state, action)
            # split the POST-step key: _step_fn already consumed state.key
            # (core/engine.py:156), so splitting the pre-step key would
            # reuse the stream the step itself derived from
            reset_key, carry_key = jax.random.split(res.state.key)
            fresh = reset_fn(reset_key).replace(key=carry_key)
            sel = lambda a, b: jnp.where(prev_done, a, b)
            next_state = jax.tree.map(sel, fresh, res.state)
            obs = jax.tree.map(sel, obs_fn(fresh), res.obs)
            rewards = jnp.where(prev_done, 0.0, res.rewards)
            done = jnp.where(prev_done, False, res.done)
            info = {
                k: jnp.where(prev_done, jnp.zeros_like(v), v)
                for k, v in res.info.items()
            }
            return next_state, obs, rewards, done, info

        return jax.vmap(one)

    # -- observation conversion ------------------------------------------------

    def _flat_to_dict_batch(self, flat: np.ndarray) -> dict:
        """Vectorised inverse of the reference's ``_VectorWriter`` layout
        (rware/warehouse.py:631-674) over a ``(B, L)`` flat block — the
        batched counterpart of ``GymWarehouse._flat_to_dict``."""
        cfg = self.config
        i = 0

        def take(k):
            nonlocal i
            out = flat[:, i : i + k]
            i += k
            return out

        loc = take(2)
        if not cfg.normalised_coordinates:
            loc = loc.astype(np.int32)
        as_bin = lambda a: a.astype(np.int8)
        obs = {
            "self": {
                "location": loc,
                "carrying_shelf": as_bin(take(1)),
                "direction": np.argmax(take(4), axis=1).astype(np.int64),
                "on_highway": as_bin(take(1)),
            }
        }
        sensors = []
        for _ in range(cfg.n_sensor_cells):
            cell = {
                "has_agent": as_bin(take(1)),
                "direction": np.argmax(take(4), axis=1).astype(np.int64),
            }
            if cfg.msg_bits > 0:
                cell["local_message"] = as_bin(take(cfg.msg_bits))
            cell["has_shelf"] = as_bin(take(1))
            cell["shelf_requested"] = as_bin(take(1))
            sensors.append(cell)
        obs["sensors"] = tuple(sensors)
        return obs

    def _convert_obs(self, obs: Any) -> Tuple:
        """Device obs (leading env-batch axis) -> tuple over agents of
        batched numpy leaves, matching ``batch_space`` of the single space."""
        cfg = self.config
        ot = cfg.observation_type
        if ot in (ObservationType.FLATTENED, ObservationType.IMAGE):
            arr = np.asarray(obs, dtype=np.float32)  # (B, N, ...)
            return tuple(arr[:, i] for i in range(cfg.n_agents))
        if ot == ObservationType.DICT:
            arr = np.asarray(obs, dtype=np.float32)
            return tuple(
                self._flat_to_dict_batch(arr[:, i]) for i in range(cfg.n_agents)
            )
        img = np.asarray(obs["image"], dtype=np.float32)
        feat = np.asarray(obs["features"], dtype=np.float32)
        return tuple(
            {"image": img[:, i], "features": feat[:, i]}
            for i in range(cfg.n_agents)
        )

    def _convert_actions(self, actions: Any) -> jax.Array:
        """Accept the batched action-space layout (tuple over agents of
        ``(B,)`` / ``(B, 1+msg_bits)`` arrays) or a ready ``(B, N[, ...])``
        array."""
        n = self.config.n_agents
        if isinstance(actions, (tuple, list)) and len(actions) == n:
            acts = np.stack(
                [np.asarray(a, dtype=np.int32) for a in actions], axis=1
            )
        else:
            acts = np.asarray(actions, dtype=np.int32)
        if self.config.msg_bits > 0 and acts.ndim == 2:
            raise ValueError(
                "msg_bits > 0 actions need a trailing (1 + msg_bits) axis"
            )
        return jnp.asarray(acts)

    # -- gym.vector API --------------------------------------------------------

    def reset(self, *, seed: Optional[int] = None, options=None):
        """Gymnasium VectorEnv reset. ``seed`` may be an int (per-env keys
        are derived by splitting) or a per-env list/tuple of ints (each env
        seeded independently, honoring the VectorEnv contract). ``options``
        is accepted for API compatibility and ignored (no resettable
        options exist — the reference's reset takes none either)."""
        if seed is None:
            seed = int(np.random.default_rng().integers(0, 2**31 - 1))
        if isinstance(seed, (list, tuple)):
            if len(seed) != self.num_envs:
                raise ValueError(
                    f"seed list length {len(seed)} != num_envs {self.num_envs}"
                )
            keys = jnp.stack([jax.random.key(int(s)) for s in seed])
        else:
            keys = jax.random.split(jax.random.key(int(seed)), self.num_envs)
        states, obs = self._vreset(keys)
        self._states = states
        self._prev_done = jnp.zeros(self.num_envs, dtype=bool)
        return self._convert_obs(obs), {}

    def step(self, actions):
        if self._states is None:
            raise RuntimeError("Call reset() before step()")
        acts = self._convert_actions(actions)
        states, obs, rewards, done, info = self._vstep(
            self._states, self._prev_done, acts
        )
        self._states = states
        self._prev_done = done
        return (
            self._convert_obs(obs),
            np.asarray(rewards, dtype=np.float32),  # (B, N) per-agent
            np.asarray(done),
            np.zeros(self.num_envs, dtype=bool),  # truncated: always False
            {k: np.asarray(v) for k, v in info.items()},
        )

    def render(self):
        """rgb_array of env 0 (debug aid)."""
        from rware_tpu.rendering import Viewer

        state0 = jax.tree.map(lambda x: x[0], self._states)
        return Viewer(self.config).render(state0, return_rgb_array=True)

    def close_extras(self, **kwargs):
        pass

    @property
    def states(self):
        """Batched ``WarehouseState`` pytree (functional escape hatch)."""
        return self._states


def make_vec(
    env_id_or_config: Any = "rware-tiny-2ag-v2", num_envs: int = 8, **overrides
) -> VectorGymWarehouse:
    """Vectorised counterpart of ``make_gym``."""
    return VectorGymWarehouse(env_id_or_config, num_envs, **overrides)


def vector_entry_point(num_envs: int = 1, env_id: str = None, **overrides):
    """``gymnasium.make_vec`` hook (registered ids carry
    ``vector_entry_point="rware_tpu.vector:vector_entry_point"``), so
    ``gym.make_vec("rware-tiny-2ag-v2", num_envs=1024)`` returns the
    single-XLA-program batch instead of a host SyncVectorEnv loop."""
    return VectorGymWarehouse(env_id, num_envs, **overrides)
