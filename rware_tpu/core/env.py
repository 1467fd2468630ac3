"""Functional environment facade.

``Warehouse`` bundles the compiled reset/step/obs programs for one config.
It is NOT a gym.Env — it is a stateless container of pure functions, the
JAX-native idiom (cf. gymnax/brax): state flows through the caller.  The
Gymnasium-compatible adapter lives in :mod:`rware_tpu.gym_adapter`.

Usage::

    env = Warehouse(WarehouseConfig(n_agents=2))
    state, obs = env.reset(jax.random.key(0))
    result = env.step(state, jnp.array([1, 0]))

    # Batched: 4096 envs in lockstep.
    keys = jax.random.split(jax.random.key(0), 4096)
    states, obs = jax.vmap(env.reset)(keys)
    results = jax.vmap(env.step)(states, actions)
"""
from __future__ import annotations

import functools
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from rware_tpu.config import WarehouseConfig
from rware_tpu.core.engine import StepResult, build_obs_fn, build_reset_fn, build_step_fn
from rware_tpu.core.state import WarehouseState


class Warehouse:
    """Pure-functional warehouse environment for one static config."""

    def __init__(self, config: Optional[WarehouseConfig] = None, **kwargs):
        if config is None:
            config = WarehouseConfig(**kwargs)
        elif kwargs:
            raise TypeError("Pass either a config or kwargs, not both")
        self.config = config
        self.layout = config.compile_layout()
        self._obs_fn = build_obs_fn(config)
        self._reset_fn = build_reset_fn(config)
        self._step_fn = build_step_fn(config, self._obs_fn)

    # -- core API --------------------------------------------------------------

    @functools.cached_property
    def reset_state(self):
        """``reset_state(key) -> WarehouseState`` (jitted)."""
        return jax.jit(self._reset_fn)

    def reset(self, key: jax.Array) -> Tuple[WarehouseState, Any]:
        state = self.reset_state(key)
        return state, self.observe(state)

    @functools.cached_property
    def step(self):
        """``step(state, actions) -> StepResult`` (jitted)."""
        return jax.jit(self._step_fn)

    @functools.cached_property
    def observe(self):
        """``observe(state) -> obs`` (jitted)."""
        return jax.jit(self._obs_fn)

    @functools.cached_property
    def step_autoreset(self):
        """``step_autoreset(state, actions) -> StepResult`` (jitted).

        On episode end the returned state (and obs) are a fresh reset drawn
        from the env's own key stream — the standard batched-RL convention so
        vmapped rollouts never leave the device.
        """
        reset_fn = self._reset_fn
        step_fn = self._step_fn
        obs_fn = self._obs_fn

        def step_autoreset(state: WarehouseState, actions: jax.Array) -> StepResult:
            result = step_fn(state, actions)
            reset_key, carry_key = jax.random.split(result.state.key)
            fresh = reset_fn(reset_key)
            fresh = fresh.replace(key=carry_key)
            # ``done`` is a scalar here (batching happens via vmap outside),
            # so a plain broadcasted select picks fresh vs stepped leaves.
            next_state = jax.tree.map(
                lambda a, b: jnp.where(result.done, a, b), fresh, result.state
            )
            return result._replace(
                state=next_state,
                obs=jax.tree.map(
                    lambda new, old: jnp.where(result.done, new, old),
                    obs_fn(next_state),
                    result.obs,
                ),
            )

        return jax.jit(step_autoreset)

    # -- conveniences ----------------------------------------------------------

    @functools.cached_property
    def global_image(self):
        """``global_image(state) -> (C, H, W)`` jitted global layer stack
        (functional counterpart of the adapter's get_global_image)."""
        from rware_tpu.core.observations import build_global_layers_fn
        from rware_tpu.types import DEFAULT_GLOBAL_IMAGE_LAYERS

        return jax.jit(
            build_global_layers_fn(self.config, DEFAULT_GLOBAL_IMAGE_LAYERS)
        )

    @property
    def n_agents(self) -> int:
        return self.config.n_agents

    @property
    def grid_size(self) -> Tuple[int, int]:
        return self.layout.grid_size

    @property
    def n_actions(self) -> int:
        return 5

    def sample_actions(self, key: jax.Array) -> jax.Array:
        """Uniform random actions (shape matches what ``step`` expects)."""
        n = self.config.n_agents
        if self.config.msg_bits > 0:
            ka, km = jax.random.split(key)
            acts = jax.random.randint(ka, (n, 1), 0, 5, dtype=jnp.int32)
            msgs = jax.random.randint(
                km, (n, self.config.msg_bits), 0, 2, dtype=jnp.int32
            )
            return jnp.concatenate([acts, msgs], axis=1)
        return jax.random.randint(key, (n,), 0, 5, dtype=jnp.int32)
