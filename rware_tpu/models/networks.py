"""Policy/value networks for warehouse agents.

The reference ships no models (SURVEY.md §2: "no training code"); the
framework's learner stack targets the IPPO/SEAC-style baselines usually run
on RWARE.  Networks are flax modules with parameter sharing across agents:
inputs are (..., N, obs_dim) and the agent axis is just another batch axis,
so one MXU-friendly matmul serves all agents of all envs.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class ActorCritic(nn.Module):
    """Shared-parameter MLP actor-critic.

    Returns (logits over n_actions, value).  All hidden compute is bfloat16
    on TPU (MXU native); logits/values are returned float32 for numerics.

    ``msg_bits > 0`` adds an independent-Bernoulli message head (the env's
    MultiDiscrete([5, 2, ..., 2]) action space, reference
    rware/warehouse.py:152,289-291): the first return becomes a
    ``(move_logits, msg_logits)`` pair.  ``msg_bits=0`` keeps the original
    signature and parameter tree.
    """

    n_actions: int = 5
    hidden: Sequence[int] = (128, 128)
    msg_bits: int = 0
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, obs: jax.Array) -> Tuple[Any, jax.Array]:
        x = obs.astype(self.dtype)
        for i, width in enumerate(self.hidden):
            x = nn.Dense(width, dtype=self.dtype, name=f"dense_{i}")(x)
            x = nn.tanh(x)
        logits = nn.Dense(self.n_actions, dtype=jnp.float32, name="policy")(x)
        value = nn.Dense(1, dtype=jnp.float32, name="value")(x)
        if self.msg_bits > 0:
            msg_logits = nn.Dense(
                self.msg_bits, dtype=jnp.float32, name="message"
            )(x)
            return (logits, msg_logits), jnp.squeeze(value, axis=-1)
        return logits, jnp.squeeze(value, axis=-1)


class CentralCritic(nn.Module):
    """Centralized value function for MAPPO: V(joint obs) -> one value per
    agent.

    Inputs are the CONCATENATION of every agent's observation
    (..., N * obs_dim, agent-major), so the critic conditions on the full
    decentralized state — the centralized-training / decentralized-
    execution split of MAPPO (Yu et al., 2022), the other standard PPO
    baseline the RWARE literature runs (EPyMARL).  The actor stays the
    shared-parameter :class:`ActorCritic` policy head (its local value
    head is unused under MAPPO).  One (N*L, H) matmul serves all envs;
    the N output heads give per-agent values from the joint state.
    """

    n_agents: int
    hidden: Sequence[int] = (128, 128)
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, joint_obs: jax.Array) -> jax.Array:
        x = joint_obs.astype(self.dtype)
        for i, width in enumerate(self.hidden):
            x = nn.Dense(width, dtype=self.dtype, name=f"dense_{i}")(x)
            x = nn.tanh(x)
        return nn.Dense(
            self.n_agents, dtype=jnp.float32, name="value"
        )(x)  # (..., N)


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
    msg_bits: int = 0
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, carry, obs: jax.Array):
        x = obs.astype(self.dtype)
        x = nn.tanh(nn.Dense(self.embed, dtype=self.dtype, name="embed")(x))
        carry, x = nn.GRUCell(self.hidden, dtype=self.dtype, name="gru")(carry, x)
        logits = nn.Dense(self.n_actions, dtype=jnp.float32, name="policy")(x)
        value = nn.Dense(1, dtype=jnp.float32, name="value")(x)
        if self.msg_bits > 0:
            msg_logits = nn.Dense(
                self.msg_bits, dtype=jnp.float32, name="message"
            )(x)
            return carry, ((logits, msg_logits), jnp.squeeze(value, axis=-1))
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


def bernoulli_logp(logits: jax.Array, bits: jax.Array) -> jax.Array:
    """log p(bits) for independent Bernoullis parameterised by logits."""
    bits = bits.astype(jnp.float32)
    return bits * jax.nn.log_sigmoid(logits) + (1.0 - bits) * jax.nn.log_sigmoid(
        -logits
    )


def sample_action_msg(
    key: jax.Array, move_logits: jax.Array, msg_logits: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Sample the env's composite (move, message-bits) action.

    Returns ``action`` of shape ``(..., 1 + msg_bits)`` int32 — the layout
    the engine's step consumes for msg-bit configs — and the joint log-prob
    (categorical move + independent Bernoulli bits)."""
    k_move, k_msg = jax.random.split(key)
    move, logp_move = sample_action(k_move, move_logits)
    bits = jax.random.bernoulli(k_msg, jax.nn.sigmoid(msg_logits)).astype(
        jnp.int32
    )
    logp = logp_move + bernoulli_logp(msg_logits, bits).sum(-1)
    return jnp.concatenate([move[..., None], bits], axis=-1), logp
