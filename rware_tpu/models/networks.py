"""Policy/value networks for warehouse agents.

The reference ships no models (SURVEY.md §2: "no training code"); the
framework's learner stack targets the IPPO/SEAC-style baselines usually run
on RWARE.  Networks are flax modules with parameter sharing across agents:
inputs are (..., N, obs_dim) and the agent axis is just another batch axis,
so one MXU-friendly matmul serves all agents of all envs.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class ActorCritic(nn.Module):
    """Shared-parameter MLP actor-critic.

    Returns (logits over n_actions, value).  All hidden compute is bfloat16
    on TPU (MXU native); logits/values are returned float32 for numerics.
    """

    n_actions: int = 5
    hidden: Sequence[int] = (128, 128)
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, obs: jax.Array) -> Tuple[jax.Array, jax.Array]:
        x = obs.astype(self.dtype)
        for i, width in enumerate(self.hidden):
            x = nn.Dense(width, dtype=self.dtype, name=f"dense_{i}")(x)
            x = nn.tanh(x)
        logits = nn.Dense(self.n_actions, dtype=jnp.float32, name="policy")(x)
        value = nn.Dense(1, dtype=jnp.float32, name="value")(x)
        return logits, jnp.squeeze(value, axis=-1)


class RecurrentActorCritic(nn.Module):
    """GRU actor-critic for partially observable play.

    ``__call__(carry, obs)`` consumes one timestep; carry is the GRU state
    (..., hidden).  Use ``initialize_carry`` for the zero state.  Designed to
    sit inside the rollout ``lax.scan`` — the recurrence and the env step
    compile into one fused program.
    """

    n_actions: int = 5
    hidden: int = 128
    embed: int = 128
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, carry, obs: jax.Array):
        x = obs.astype(self.dtype)
        x = nn.tanh(nn.Dense(self.embed, dtype=self.dtype, name="embed")(x))
        carry, x = nn.GRUCell(self.hidden, dtype=self.dtype, name="gru")(carry, x)
        logits = nn.Dense(self.n_actions, dtype=jnp.float32, name="policy")(x)
        value = nn.Dense(1, dtype=jnp.float32, name="value")(x)
        return carry, (logits, jnp.squeeze(value, axis=-1))

    def initialize_carry(self, batch_shape: Tuple[int, ...]) -> jax.Array:
        return jnp.zeros(batch_shape + (self.hidden,), dtype=self.dtype)


def sample_action(key: jax.Array, logits: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Categorical sample + log-prob, stable in float32."""
    action = jax.random.categorical(key, logits)
    logp = jnp.take_along_axis(
        jax.nn.log_softmax(logits), action[..., None], axis=-1
    ).squeeze(-1)
    return action.astype(jnp.int32), logp
