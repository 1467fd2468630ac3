"""Recurrent IPPO: GRU policies over partial observations.

RWARE is partially observable (3x3 sensor windows), so the standard strong
baselines use recurrent policies.  Same fused design as the MLP learner
(models/ippo.py): rollout + GAE + update in one jitted program.  The GRU
carry lives in the runner next to the env states; episode boundaries reset
it on device.  PPO epochs shuffle ENV indices (sequences stay intact) and
re-run the GRU over the stored trajectory from the stored initial carry —
sequence-parallel over the minibatch, time-sequential in a lax.scan, which
is the TPU-friendly layout (hidden-state matmuls batch over B*N on the MXU).
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from rware_tpu.core.env import Warehouse
from rware_tpu.models.ippo import IPPOConfig, make_optimizer
from rware_tpu.models.networks import RecurrentActorCritic, sample_action


class RNNRunnerState(struct.PyTreeNode):
    params: Any
    opt_state: Any
    env_states: Any  # (B, ...)
    obs: jax.Array  # (B, N, L)
    carry: jax.Array  # (B, N, H) GRU hidden
    key: jax.Array
    update_idx: jax.Array


class RNNTransition(NamedTuple):
    obs: jax.Array  # (B, N, L)
    carry_in: jax.Array  # (B, N, H) hidden BEFORE this step
    action: jax.Array
    logp: jax.Array
    value: jax.Array
    reward: jax.Array
    done: jax.Array  # (B,)


def init_rnn_runner(
    env: Warehouse,
    cfg: IPPOConfig,
    key: jax.Array,
    model: Optional[RecurrentActorCritic] = None,
) -> Tuple[RNNRunnerState, RecurrentActorCritic, optax.GradientTransformation]:
    if model is None:
        model = RecurrentActorCritic(
            n_actions=env.n_actions, msg_bits=env.config.msg_bits
        )
    k_param, k_env, k_run = jax.random.split(key, 3)
    obs_dim = env.config.policy_obs_length
    carry0 = model.initialize_carry((1, env.n_agents))
    params = model.init(
        k_param, carry0, jnp.zeros((1, env.n_agents, obs_dim))
    )
    tx = make_optimizer(cfg)
    env_states = jax.vmap(env._reset_fn)(jax.random.split(k_env, cfg.n_envs))
    from rware_tpu.models.ippo import policy_obs_fn

    obs = jax.vmap(policy_obs_fn(env))(env_states)
    runner = RNNRunnerState(
        params=params,
        opt_state=tx.init(params),
        env_states=env_states,
        obs=obs,
        carry=model.initialize_carry((cfg.n_envs, env.n_agents)),
        key=k_run,
        update_idx=jnp.zeros((), jnp.int32),
    )
    return runner, model, tx


def build_rnn_train_step(
    env: Warehouse,
    model: RecurrentActorCritic,
    tx: optax.GradientTransformation,
    cfg: IPPOConfig,
) -> Callable[[RNNRunnerState], Tuple[RNNRunnerState, dict]]:
    step_fn = jax.vmap(env._step_fn)
    reset_fn = env._reset_fn
    from rware_tpu.models.ippo import policy_obs_fn

    obs_fn = policy_obs_fn(env)
    msg_mode = getattr(model, "msg_bits", 0) > 0

    def collect(carry_state, key):
        params, env_states, obs, carry = carry_state
        k_act, _ = jax.random.split(key)
        new_carry, (heads, value) = model.apply(params, carry, obs)
        if msg_mode:
            from rware_tpu.models.networks import sample_action_msg

            action, logp = sample_action_msg(k_act, *heads)
        else:
            action, logp = sample_action(k_act, heads)
        res = step_fn(env_states, action)
        from rware_tpu.parallel.rollout import autoreset_select

        next_states = jax.vmap(
            lambda s, d: autoreset_select(reset_fn, s, d)
        )(res.state, res.done)
        next_obs = jax.vmap(obs_fn)(next_states)
        # reset hidden at episode boundaries
        next_carry = jnp.where(
            res.done[:, None, None], jnp.zeros_like(new_carry), new_carry
        )
        t = RNNTransition(obs, carry, action, logp, value, res.rewards, res.done)
        return (params, next_states, next_obs, next_carry), t

    def gae(traj: RNNTransition, last_value):
        def body(carry, t):
            g, next_v = carry
            nd = 1.0 - t.done.astype(jnp.float32)[:, None]
            delta = t.reward + cfg.gamma * next_v * nd - t.value
            g = delta + cfg.gamma * cfg.gae_lambda * nd * g
            return (g, t.value), g

        (_, _), adv = jax.lax.scan(
            body, (jnp.zeros_like(last_value), last_value), traj, reverse=True
        )
        return adv, adv + traj.value

    def loss_fn(params, batch):
        # batch: trajectory slices for a minibatch of envs, (T, M, N, ...)
        traj, adv, target = batch
        init_carry = traj.carry_in[0]  # (M, N, H) hidden at rollout start

        def replay(carry, xs):
            obs, done = xs
            new_carry, (heads, value) = model.apply(params, carry, obs)
            new_carry = jnp.where(
                done[:, None, None], jnp.zeros_like(new_carry), new_carry
            )
            return new_carry, (heads, value)

        _, (heads, value) = jax.lax.scan(
            replay, init_carry, (traj.obs, traj.done)
        )
        if msg_mode:
            from rware_tpu.models.networks import bernoulli_logp

            logits, msg_logits = heads
            move, bits = traj.action[..., 0], traj.action[..., 1:]
            logp_all = jax.nn.log_softmax(logits)
            logp = (
                jnp.take_along_axis(logp_all, move[..., None], -1).squeeze(-1)
                + bernoulli_logp(msg_logits, bits).sum(-1)
            )
            p_msg = jax.nn.sigmoid(msg_logits)
            msg_entropy = -(
                p_msg * jax.nn.log_sigmoid(msg_logits)
                + (1.0 - p_msg) * jax.nn.log_sigmoid(-msg_logits)
            ).sum(-1)
        else:
            logits = heads
            logp_all = jax.nn.log_softmax(logits)
            logp = jnp.take_along_axis(
                logp_all, traj.action[..., None], -1
            ).squeeze(-1)
            msg_entropy = 0.0
        ratio = jnp.exp(logp - traj.logp)
        adv_norm = (adv - adv.mean()) / (adv.std() + 1e-8)
        pg1 = ratio * adv_norm
        pg2 = jnp.clip(ratio, 1 - cfg.clip_eps, 1 + cfg.clip_eps) * adv_norm
        pg_loss = -jnp.minimum(pg1, pg2).mean()
        v_clipped = traj.value + jnp.clip(
            value - traj.value, -cfg.clip_eps, cfg.clip_eps
        )
        v_loss = 0.5 * jnp.maximum(
            (value - target) ** 2, (v_clipped - target) ** 2
        ).mean()
        entropy = (-(jnp.exp(logp_all) * logp_all).sum(-1) + msg_entropy).mean()
        total = pg_loss + cfg.vf_coef * v_loss - cfg.ent_coef * entropy
        return total, {
            "pg_loss": pg_loss,
            "v_loss": v_loss,
            "entropy": entropy,
            "approx_kl": ((ratio - 1) - jnp.log(ratio)).mean(),
        }

    def train_step(runner: RNNRunnerState) -> Tuple[RNNRunnerState, dict]:
        key, k_roll, k_perm = jax.random.split(runner.key, 3)
        roll_keys = jax.random.split(k_roll, cfg.rollout_len)
        (params, env_states, obs, carry), traj = jax.lax.scan(
            collect,
            (runner.params, runner.env_states, runner.obs, runner.carry),
            roll_keys,
        )
        _, (_, last_value) = model.apply(params, carry, obs)
        advantages, targets = gae(traj, last_value)

        mb_envs = cfg.n_envs // cfg.minibatches

        def epoch(carry_es, key):
            params, opt_state = carry_es
            perm = jax.random.permutation(key, cfg.n_envs)

            def minibatch(carry_es, idx):
                params, opt_state = carry_es
                batch = jax.tree.map(
                    lambda x: jnp.take(x, idx, axis=1),
                    (traj, advantages, targets),
                )
                (loss, metrics), grads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(params, batch)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), metrics

            idxs = perm[: mb_envs * cfg.minibatches].reshape(
                cfg.minibatches, mb_envs
            )
            return jax.lax.scan(minibatch, (params, opt_state), idxs)

        (params, opt_state), metrics = jax.lax.scan(
            epoch,
            (runner.params, runner.opt_state),
            jax.random.split(k_perm, cfg.epochs),
        )
        out_metrics = {
            "reward_per_env": traj.reward.sum() / cfg.n_envs,
            "episodes_done": traj.done.sum(),
            **jax.tree.map(lambda x: x.mean(), metrics),
        }
        return (
            RNNRunnerState(
                params=params,
                opt_state=opt_state,
                env_states=env_states,
                obs=obs,
                carry=carry,
                key=key,
                update_idx=runner.update_idx + 1,
            ),
            out_metrics,
        )

    return train_step


def build_rnn_pallas_train_step(
    env: Warehouse,
    model: RecurrentActorCritic,
    tx: optax.GradientTransformation,
    cfg: IPPOConfig,
    interpret: bool = False,
    deterministic_collect: bool = False,
) -> Callable[[RNNRunnerState], Tuple[RNNRunnerState, dict]]:
    """Recurrent IPPO with the GRU fused INTO the collect kernel.

    The rollout — observations, embed+GRU forward, sampling, env step and
    the episode-boundary carry reset — runs inside the Pallas kernel
    (ops/pallas_rollout.build_pallas_collect(policy="gru")); the PPO update
    replays the GRU over the stored trajectory in XLA exactly like
    build_rnn_train_step (sequence-parallel over the env minibatch).
    """
    from rware_tpu.ops.pallas_rollout import ENV_BLOCK, build_pallas_collect

    if env.config.msg_bits > 0:
        raise NotImplementedError(
            "the GRU collect kernel samples moves only; msg_bits configs "
            "use build_rnn_train_step (XLA collect, message head)"
        )

    def _pick_tc_len_gru(t: int) -> int:
        # The GRU carry block (Hg, N, RB, LANE) costs ~2MB of scoped VMEM
        # on top of the MLP collector's budget, which overflows the 16MB
        # limit at tc=8 (measured: 17.74M at B=4096).  tc=4 halves the obs
        # trajectory block and fits.
        for tc in (4, 2, 1):
            if t % tc == 0:
                return tc
        return 1

    hidden = (int(model.embed), int(model.hidden))
    collect = build_pallas_collect(
        env.config,
        cfg.rollout_len,
        hidden=hidden,
        tc_len=_pick_tc_len_gru(cfg.rollout_len),
        interpret=interpret,
        deterministic=deterministic_collect,
        policy="gru",
    )
    from rware_tpu.models.ippo import policy_obs_fn

    obs_fn = jax.vmap(policy_obs_fn(env))
    n_tc = max(1, cfg.rollout_len // _pick_tc_len_gru(cfg.rollout_len))
    streams_per_update = (cfg.n_envs // ENV_BLOCK) * n_tc

    def loss_fn(params, batch):
        obs, done, action, logp_old, value_old, adv, target, h0 = batch

        def replay(carry, xs):
            o, d = xs
            new_carry, (logits, value) = model.apply(params, carry, o)
            new_carry = jnp.where(
                d[:, None, None], jnp.zeros_like(new_carry), new_carry
            )
            return new_carry, (logits, value)

        _, (logits, value) = jax.lax.scan(replay, h0, (obs, done))
        logp_all = jax.nn.log_softmax(logits)
        logp = jnp.take_along_axis(
            logp_all, action[..., None], -1
        ).squeeze(-1)
        ratio = jnp.exp(logp - logp_old)
        adv_norm = (adv - adv.mean()) / (adv.std() + 1e-8)
        pg1 = ratio * adv_norm
        pg2 = jnp.clip(ratio, 1 - cfg.clip_eps, 1 + cfg.clip_eps) * adv_norm
        pg_loss = -jnp.minimum(pg1, pg2).mean()
        v_clipped = value_old + jnp.clip(
            value - value_old, -cfg.clip_eps, cfg.clip_eps
        )
        v_loss = 0.5 * jnp.maximum(
            (value - target) ** 2, (v_clipped - target) ** 2
        ).mean()
        entropy = -(jnp.exp(logp_all) * logp_all).sum(-1).mean()
        total = pg_loss + cfg.vf_coef * v_loss - cfg.ent_coef * entropy
        return total, {
            "pg_loss": pg_loss,
            "v_loss": v_loss,
            "entropy": entropy,
            "approx_kl": ((ratio - 1) - jnp.log(ratio)).mean(),
        }

    def train_step(runner: RNNRunnerState) -> Tuple[RNNRunnerState, dict]:
        key, k_perm = jax.random.split(runner.key, 2)
        seed = runner.update_idx * jnp.int32(streams_per_update)
        h0 = runner.carry  # (B, N, H) — carry at rollout start
        env_states, new_carry, traj = collect(
            runner.env_states, runner.params, seed, h0=h0
        )
        obs = obs_fn(env_states)
        _, (_, last_value) = model.apply(
            runner.params, new_carry.astype(runner.carry.dtype), obs
        )

        from rware_tpu.models.ippo import compute_gae

        advantages, targets = compute_gae(
            cfg, traj["reward"], traj["value"], traj["done"], last_value
        )

        obs_f = traj["obs"].astype(jnp.float32)
        dataset = (
            obs_f, traj["done"], traj["action"], traj["logp"],
            traj["value"], advantages, targets,
        )
        mb_envs = cfg.n_envs // cfg.minibatches

        def epoch(carry_es, key):
            params, opt_state = carry_es
            perm = jax.random.permutation(key, cfg.n_envs)

            def minibatch(carry_es, idx):
                params, opt_state = carry_es
                batch = tuple(
                    jnp.take(x, idx, axis=1) for x in dataset
                ) + (jnp.take(h0.astype(runner.carry.dtype), idx, axis=0),)
                (loss, metrics), grads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(params, batch)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), metrics

            idxs = perm[: mb_envs * cfg.minibatches].reshape(
                cfg.minibatches, mb_envs
            )
            return jax.lax.scan(minibatch, (params, opt_state), idxs)

        (params, opt_state), metrics = jax.lax.scan(
            epoch,
            (runner.params, runner.opt_state),
            jax.random.split(k_perm, cfg.epochs),
        )
        out_metrics = {
            "reward_per_env": traj["reward"].sum() / cfg.n_envs,
            "episodes_done": traj["done"].sum(),
            **jax.tree.map(lambda x: x.mean(), metrics),
        }
        return (
            RNNRunnerState(
                params=params,
                opt_state=opt_state,
                env_states=env_states,
                obs=obs,
                carry=new_carry.astype(runner.carry.dtype),
                key=key,
                update_idx=runner.update_idx + 1,
            ),
            out_metrics,
        )

    return train_step
