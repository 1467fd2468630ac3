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


# ---------------------------------------------------------------------------
# Native-layout update path: GAE + minibatched PPO directly on the kernel's
# tiled trajectory — obs (T, N, L, RB, LANE), everything else (T, N, RB,
# LANE).  The round-1 train step spent ~200 ms/update relaying this into
# (T*B, N, L); here the ONLY layout change is the L-axis contraction inside
# the first matmul (a transposed-lhs dot_general the MXU runs natively), so
# the update is HBM-read-bound instead of transpose-bound.
# ---------------------------------------------------------------------------

# rb-axis (env-block axis) position per dataset entry:
# (obs, action, logp, value, advantage, target)
_RB_AXES = (3, 2, 2, 2, 2, 2)


def _native_trunk(p, obs, contract_axis):
    """Dense-stack (dense_0, dense_1, ...) walker on native-layout inputs:
    contracts ``contract_axis`` of ``obs`` against dense_0 without
    materialising a transposed copy, bf16 hidden compute with f32
    accumulation and bf16-rounded tanh pre-activations — the numeric
    recipe the in-kernel forward and the parity tests pin.  Shared by the
    actor (_native_forward) and MAPPO's CentralCritic
    (models/mappo._critic_native_forward).  Returns the f32 trunk
    output with the contracted axis moved to the end."""
    x = jax.lax.dot_general(
        obs.astype(jnp.bfloat16),
        p["dense_0"]["kernel"].astype(jnp.bfloat16),
        (((contract_axis,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # bf16 tanh: flax Dense(dtype=bf16) emits bf16 pre-activations; the
    # fused update kernel computes the same way
    x = jnp.tanh((x + p["dense_0"]["bias"]).astype(jnp.bfloat16))
    i = 1
    while f"dense_{i}" in p:
        d = p[f"dense_{i}"]
        x = jax.lax.dot_general(
            x,
            d["kernel"].astype(jnp.bfloat16),
            (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        x = jnp.tanh((x + d["bias"]).astype(jnp.bfloat16))
        i += 1
    return x.astype(jnp.float32)


def _native_forward(params, obs):
    """ActorCritic forward on native-layout obs (..., L, N, RB, LANE).

    Contracts the L axis (axis -4) against dense_0 without materialising a
    transposed copy; hidden compute bf16 with f32 accumulation + f32 heads,
    mirroring the in-kernel _policy_forward / models.networks.ActorCritic.
    Returns logits (..., N, RB, LANE, A) f32 and value (..., N, RB, LANE)
    f32.
    """
    p = params["params"]
    xf = _native_trunk(p, obs, obs.ndim - 4)

    def head(name):
        return (
            jax.lax.dot_general(
                xf,
                p[name]["kernel"].astype(jnp.float32),
                (((xf.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + p[name]["bias"]
        )

    logits = head("policy")
    value = jnp.squeeze(head("value"), axis=-1)
    if "message" in p:
        # mirror model.apply's msg convention: ((move, msg), value)
        return (logits, head("message")), value
    return logits, value


def compute_gae_native(cfg: IPPOConfig, reward, value, done, last_value):
    """GAE on native-layout tensors: reward/value (T, N, RB, LANE), done
    (T, 1, RB, LANE) int32, last_value (N, RB, LANE)."""

    def body(carry, xs):
        g, next_v = carry
        r, v, d = xs
        not_done = 1.0 - d.astype(jnp.float32)  # (1, RB, LANE) broadcasts on N
        delta = r + cfg.gamma * next_v * not_done - v
        g = delta + cfg.gamma * cfg.gae_lambda * not_done * g
        return (g, v), g

    (_, _), advantages = jax.lax.scan(
        body,
        (jnp.zeros_like(last_value), last_value),
        (reward, value, done),
        reverse=True,
    )
    return advantages, advantages + value


def clipped_ppo_terms(cfg: IPPOConfig, heads, value,
                      action, old_logp, old_value, adv, target, bits=None):
    """The clipped-PPO objective on native-layout tensors, given the
    policy heads and value from ANY source: shared by IPPO
    (ppo_loss_native — actor's own value head), recurrent IPPO
    (models.ippo_rnn.rnn_ppo_loss_native — GRU replay outputs) and MAPPO
    (models.mappo.mappo_loss_native — central-critic values), so the
    surrogate / value-clip / entropy / KL algebra exists exactly once.

    ``bits`` (message bits, (T, N*M, RB, LANE) agent-major rows i*M + m)
    switches to the joint move+Bernoulli policy: joint ratio and joint
    entropy, matching the msg collect kernel's stored logp."""
    msg_entropy = 0.0
    if bits is not None:
        from rware_tpu.models.networks import bernoulli_logp

        logits, msg_logits = heads  # msg_logits (T, N, RB, LANE, M)
        t, nm, rb, lane = bits.shape
        n = action.shape[1]
        bitsf = jnp.moveaxis(
            bits.reshape(t, n, nm // n, rb, lane), 2, -1
        ).astype(jnp.float32)  # (T, N, RB, LANE, M)
        logp_msg = bernoulli_logp(msg_logits, bitsf).sum(-1)
        p_msg = jax.nn.sigmoid(msg_logits)
        msg_entropy = -(
            p_msg * jax.nn.log_sigmoid(msg_logits)
            + (1.0 - p_msg) * jax.nn.log_sigmoid(-msg_logits)
        ).sum(-1)
    else:
        logits = heads
    logp_all = jax.nn.log_softmax(logits)
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, logits.shape, logits.ndim - 1)
        == action[..., None]
    )
    logp = jnp.sum(jnp.where(onehot, logp_all, 0.0), axis=-1)
    if bits is not None:
        logp = logp + logp_msg
    ratio = jnp.exp(logp - old_logp)
    adv_norm = (adv - adv.mean()) / (adv.std() + 1e-8)
    pg1 = ratio * adv_norm
    pg2 = jnp.clip(ratio, 1 - cfg.clip_eps, 1 + cfg.clip_eps) * adv_norm
    pg_loss = -jnp.minimum(pg1, pg2).mean()

    v_clipped = old_value + jnp.clip(
        value - old_value, -cfg.clip_eps, cfg.clip_eps
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


def ppo_loss_native(cfg: IPPOConfig, params, batch):
    """Clipped-PPO loss on a native-layout minibatch.

    A 7th batch entry (message bits) switches to the joint
    move+Bernoulli policy — see clipped_ppo_terms."""
    bits = None
    if len(batch) == 7:
        obs, action, old_logp, old_value, adv, target, bits = batch
    else:
        obs, action, old_logp, old_value, adv, target = batch
    heads, value = _native_forward(params, obs)
    return clipped_ppo_terms(
        cfg, heads, value, action, old_logp, old_value, adv, target, bits
    )


def ppo_update_epochs_native(
    cfg: IPPOConfig, tx, params, opt_state, dataset, key, axis_name=None,
    grads_fn=None, mb_axis: str = "time",
):
    """E epochs x M minibatches over the native dataset.

    Minibatches are contiguous slices after a random per-epoch rotation —
    sequential HBM reads, no index gathers.  ``mb_axis`` picks the slicing
    axis: "time" (default) makes each minibatch a T/M time window over ALL
    envs — the fused-kernel-friendly shape (every grid cell contracts the
    full RB*LANE env extent, amortising per-cell overhead 4x vs env
    slices); "env" makes each minibatch a band of env-blocks across all T
    (the env-axis dual of IPPOConfig.minibatch_mode="block").

    ``axis_name``: when run inside shard_map with the env batch sharded,
    gradients and metrics are pmean'd over that mesh axis (data-parallel
    PPO — every device takes the identical parameter step).

    ``grads_fn(params, batch) -> (grads, metrics)``: optional fused
    gradient kernel (ops/pallas_update.build_fused_ppo_grads); default is
    jax.value_and_grad of ppo_loss_native.  Its ``rollout_len``/``mb_rows``
    must match the minibatch shape this function produces.
    """
    rb_axes = _RB_AXES + (2,) * (len(dataset) - len(_RB_AXES))
    if mb_axis == "time":
        t_len = dataset[1].shape[0]
        if t_len % cfg.minibatches:
            raise ValueError(
                f"minibatches={cfg.minibatches} must divide "
                f"rollout_len={t_len} for time-axis minibatching"
            )
        mb = t_len // cfg.minibatches
        roll_extent = t_len
        axes = (0,) * len(dataset)
    else:
        rb = dataset[1].shape[2]
        if rb % cfg.minibatches:
            raise ValueError(
                f"minibatches={cfg.minibatches} must divide the "
                f"{rb} env rows (n_envs / lane width "
                f"{dataset[1].shape[3]}) for env-axis minibatching"
            )
        mb = rb // cfg.minibatches
        roll_extent = rb
        axes = rb_axes

    if grads_fn is None:

        def grads_fn(params, batch):
            (loss, metrics), grads = jax.value_and_grad(
                ppo_loss_native, argnums=1, has_aux=True
            )(cfg, params, batch)
            return grads, metrics

    def sgd_step(params, opt_state, batch, start=None):
        if start is None:
            grads, metrics = grads_fn(params, batch)
        else:
            grads, metrics = grads_fn(params, batch, start)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            metrics = jax.lax.pmean(metrics, axis_name)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, metrics

    # fused kernels built with dataset_len consume the FULL dataset plus a
    # scalar window start — the per-epoch rotation + minibatch slice happen
    # in the kernel's index map (zero copies; ops/pallas_update)
    zero_copy = (
        mb_axis == "time"
        and getattr(grads_fn, "dataset_len", 0) == roll_extent
    )

    # time-mode rotations are drawn in phase_time_block units so this
    # path's windows stay bit-identical to the whole-phase kernel's
    # TB-aligned starts (ops/pallas_update.phase_time_block)
    if mb_axis == "time":
        from rware_tpu.ops.pallas_update import phase_time_block

        off_tb = phase_time_block(mb)
    else:
        off_tb = 1

    def epoch(carry, k):
        params, opt_state = carry
        off = jax.random.randint(k, (), 0, roll_extent // off_tb) * off_tb

        if zero_copy:
            def minibatch(carry, i):
                params, opt_state = carry
                # same window as roll(off)+slice: rolled[j] = x[(j - off)]
                start = (i * mb - off) % roll_extent
                params, opt_state, metrics = sgd_step(
                    params, opt_state, dataset, start
                )
                return (params, opt_state), metrics
        else:
            rolled = tuple(
                jnp.roll(x, off, axis=ax) for x, ax in zip(dataset, axes)
            )

            def minibatch(carry, i):
                params, opt_state = carry
                batch = tuple(
                    jax.lax.dynamic_slice_in_dim(x, i * mb, mb, ax)
                    for x, ax in zip(rolled, axes)
                )
                params, opt_state, metrics = sgd_step(
                    params, opt_state, batch
                )
                return (params, opt_state), metrics

        return jax.lax.scan(
            minibatch, (params, opt_state), jnp.arange(cfg.minibatches)
        )

    return jax.lax.scan(
        epoch, (params, opt_state), jax.random.split(key, cfg.epochs)
    )


def _params_to_arrays(params):
    """Kernel-layout parameter blocks: the policy/value heads ride as ONE
    concatenated (H2, A+1) / (1, A+1) block (the update kernel's fused
    head dot); Adam and global-norm clip are elementwise/global, so the
    packing is optimizer-transparent."""
    p = params["params"]
    return [
        p["dense_0"]["kernel"], p["dense_0"]["bias"][None, :],
        p["dense_1"]["kernel"], p["dense_1"]["bias"][None, :],
        jnp.concatenate(
            [p["policy"]["kernel"], p["value"]["kernel"]], axis=1
        ),
        jnp.concatenate(
            [p["policy"]["bias"], p["value"]["bias"]], axis=0
        )[None, :],
    ]


def _arrays_to_params(arrays, like):
    w0, b0, w1, b1, wc, bc = arrays
    tpl = like["params"]
    a = tpl["policy"]["kernel"].shape[1]

    def leaf(new, old):
        return new.astype(old.dtype)

    return {
        "params": {
            "dense_0": {
                "kernel": leaf(w0, tpl["dense_0"]["kernel"]),
                "bias": leaf(b0[0], tpl["dense_0"]["bias"]),
            },
            "dense_1": {
                "kernel": leaf(w1, tpl["dense_1"]["kernel"]),
                "bias": leaf(b1[0], tpl["dense_1"]["bias"]),
            },
            "policy": {
                "kernel": leaf(wc[:, :a], tpl["policy"]["kernel"]),
                "bias": leaf(bc[0, :a], tpl["policy"]["bias"]),
            },
            "value": {
                "kernel": leaf(wc[:, a:], tpl["value"]["kernel"]),
                "bias": leaf(bc[0, a:], tpl["value"]["bias"]),
            },
        }
    }


def phase_window_starts(cfg, t_full: int, tb: int, key) -> jax.Array:
    """(P,) int32 per-pass minibatch window starts: a fresh random rotation
    per epoch (drawn in ``tb`` time-block units, see
    ops/pallas_update.phase_time_block) then M contiguous windows — the
    schedule both the whole-phase kernel and any side-by-side XLA pass
    loop (e.g. MAPPO's critic) must share to see identical minibatches."""
    mb_t = t_full // cfg.minibatches
    offs = jax.vmap(
        lambda k: jax.random.randint(k, (), 0, t_full // tb) * tb
    )(jax.random.split(key, cfg.epochs))  # (E,)
    m_idx = jnp.arange(cfg.minibatches, dtype=jnp.int32)
    return (
        (m_idx[None, :] * mb_t - offs[:, None]) % t_full
    ).reshape(cfg.epochs * cfg.minibatches)


def ppo_update_phase_fused(cfg, params, opt_state, dataset, key, update_fn):
    """Run the whole-update-phase kernel
    (ops/pallas_update.build_fused_ppo_update_phase) and rebuild the optax
    state around it: per-pass window starts / advantage stats / Adam
    hyper rows are computed here, the kernel owns everything else.

    Matches ppo_update_epochs_native's semantics exactly: time-axis
    zero-copy minibatch windows with a fresh random rotation per epoch,
    clip_by_global_norm -> adam(lr schedule) per pass."""
    from rware_tpu.models.ippo import make_lr_schedule

    obs, action, logp_old, value_old, adv, target = dataset
    t_full = action.shape[0]
    mb_t = t_full // cfg.minibatches
    P = cfg.epochs * cfg.minibatches

    # the kernel's zero-copy wrap addresses whole time blocks, so the
    # per-epoch rotation is drawn in time_block units (statistically the
    # same decorrelation, TB-aligned starts)
    tb = getattr(update_fn, "time_block", 1)
    starts = phase_window_starts(cfg, t_full, tb, key)

    # per-pass advantage stats over each window (population std, as
    # jnp.std of the sliced window computes)
    t_mean = adv.astype(jnp.float32).mean(axis=(1, 2, 3))  # (T,)
    t_sqmean = (adv.astype(jnp.float32) ** 2).mean(axis=(1, 2, 3))
    widx = (starts[:, None] + jnp.arange(mb_t)[None, :]) % t_full
    w_mean = t_mean[widx].mean(axis=1)
    w_var = jnp.maximum(t_sqmean[widx].mean(axis=1) - w_mean**2, 0.0)
    advstats = jnp.stack(
        [w_mean, 1.0 / (jnp.sqrt(w_var) + 1e-8)], axis=1
    )  # (P, 2)

    adam = opt_state[1][0]
    count = adam.count
    sched = make_lr_schedule(cfg)
    q = jnp.arange(P, dtype=jnp.int32)
    t_adam = (count + q + 1).astype(jnp.float32)
    hyper = jnp.stack(
        [
            jax.vmap(lambda c: jnp.asarray(sched(c), jnp.float32))(
                count + q
            ),
            1.0 / (1.0 - jnp.power(0.9, t_adam)),
            1.0 / (1.0 - jnp.power(0.999, t_adam)),
        ],
        axis=1,
    )  # (P, 3)

    new_w, new_mu, new_nu, mets = update_fn(
        _params_to_arrays(params),
        _params_to_arrays(adam.mu),
        _params_to_arrays(adam.nu),
        (obs, action, logp_old, value_old, adv, target),
        starts, advstats, hyper,
    )
    new_params = _arrays_to_params(new_w, params)
    new_adam = adam._replace(
        count=count + P,
        mu=_arrays_to_params(new_mu, params),
        nu=_arrays_to_params(new_nu, params),
    )
    sched_state = opt_state[1][1]
    if "count" in getattr(sched_state, "_fields", ()):
        sched_state = sched_state._replace(count=sched_state.count + P)
    new_opt_state = (opt_state[0], (new_adam, sched_state))

    inv_n = 1.0 / (mb_t * action.shape[1] * action.shape[2] * action.shape[3])
    metrics = {
        "pg_loss": -(mets[:, 0] * inv_n),
        "v_loss": mets[:, 1] * inv_n,
        "entropy": mets[:, 2] * inv_n,
        "approx_kl": mets[:, 3] * inv_n,
    }
    return (new_params, new_opt_state), metrics


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
    native: bool = True,
    fused_update: bool = True,
    fused_update_phase: Optional[bool] = None,
    mesh=None,
    mesh_axis: str = "env",
) -> Callable[[RunnerState], Tuple[RunnerState, dict]]:
    """``native=True`` (default) runs GAE + the PPO update directly on the
    kernel-native tiled trajectory (no relayout — ~10x faster end-to-end);
    ``native=False`` keeps the round-1 flat-dataset path (classic shuffled
    minibatches over T*B samples).

    ``fused_update=True`` computes minibatch PPO gradients with the fused
    Pallas kernel (ops/pallas_update: forward+backward in VMEM, HBM traffic
    = one obs read) instead of XLA autodiff.

    ``mesh``: a jax.sharding.Mesh whose ``mesh_axis`` shards the env batch.
    The whole train step is shard_map'd over it — each device runs the
    collect kernel + GAE on its local env shard and PPO gradients are
    pmean'd over ICI (data-parallel PPO; params/opt state replicated).
    Requires ``native=True``."""
    from rware_tpu.ops.pallas_rollout import LANE, build_pallas_collect

    hidden = tuple(model.hidden)
    collect = build_pallas_collect(
        env.config,
        cfg.rollout_len,
        hidden=hidden,
        tc_len=_pick_tc_len(cfg.rollout_len),
        interpret=interpret,
        deterministic=deterministic_collect,
        native_traj=native,
    )
    from rware_tpu.models.ippo import policy_obs_fn

    obs_fn = jax.vmap(policy_obs_fn(env))

    from rware_tpu.ops.pallas_rollout import ENV_BLOCK

    # the kernel consumes one PRNG stream per (env-block, time-chunk); a
    # stride of update_idx * streams_per_update keeps streams disjoint
    # across the whole run (a uniformly random per-update seed would
    # birthday-collide at scale)
    n_tc = max(1, cfg.rollout_len // _pick_tc_len(cfg.rollout_len))
    streams_per_update = (cfg.n_envs // ENV_BLOCK) * n_tc
    n_agents = env.n_agents
    n_shards = int(mesh.shape[mesh_axis]) if mesh is not None else 1
    n_local = cfg.n_envs // n_shards
    streams_per_shard = (n_local // ENV_BLOCK) * n_tc
    axis_name = mesh_axis if mesh is not None else None

    # Whole-phase kernel: optimizer runs in-kernel, so it is incompatible
    # with the per-minibatch gradient pmean of the mesh path and with the
    # message head; default on exactly when those don't apply.
    if fused_update_phase is None:
        fused_update_phase = (
            native and fused_update and mesh is None
            and env.config.msg_bits == 0
        )
    grads_fn = None
    update_phase_fn = None
    if native and fused_update_phase and mesh is None \
            and env.config.msg_bits == 0:
        from rware_tpu.ops.pallas_update import build_fused_ppo_update_phase

        try:
            update_phase_fn = build_fused_ppo_update_phase(
                obs_len=env.config.policy_obs_length,
                hidden=hidden,
                n_actions=env.n_actions,
                dataset_len=cfg.rollout_len,
                n_agents=env.n_agents,
                mb_rows=n_local // LANE,
                epochs=cfg.epochs,
                minibatches=cfg.minibatches,
                clip_eps=cfg.clip_eps,
                vf_coef=cfg.vf_coef,
                ent_coef=cfg.ent_coef,
                max_grad_norm=cfg.max_grad_norm,
                interpret=interpret,
            )
        except ValueError:
            # no Mosaic-legal agent-folded chunk at this (N, B) — the
            # per-pass kernel below never folds agents, so it always has
            # a legal chunking (e.g. 19 agents at small batches)
            update_phase_fn = None
    if native and fused_update and update_phase_fn is None:
        from rware_tpu.ops.pallas_update import build_fused_ppo_grads

        # time-axis minibatches: each is a T/M window over the FULL local
        # env extent, so every kernel grid cell contracts rb*LANE lanes
        grads_fn = build_fused_ppo_grads(
            obs_len=env.config.policy_obs_length,
            hidden=hidden,
            n_actions=env.n_actions,
            rollout_len=cfg.rollout_len // cfg.minibatches,
            n_agents=env.n_agents,
            mb_rows=n_local // LANE,
            clip_eps=cfg.clip_eps,
            vf_coef=cfg.vf_coef,
            ent_coef=cfg.ent_coef,
            interpret=interpret,
            msg_bits=env.config.msg_bits,
            dataset_len=cfg.rollout_len,
        )

    def train_step_native(runner: RunnerState) -> Tuple[RunnerState, dict]:
        key, k_perm = jax.random.split(runner.key, 2)
        seed = runner.update_idx * jnp.int32(streams_per_update)
        if axis_name is not None:
            # disjoint per-shard streams (the kernel offsets by its local
            # program_id only, which restarts at 0 on every shard)
            seed = seed + jax.lax.axis_index(axis_name) * jnp.int32(
                streams_per_shard
            )

        env_states, traj = collect(runner.env_states, runner.params, seed)

        obs = obs_fn(env_states)
        _, last_value = model.apply(runner.params, obs)  # (B_local, N)
        rb = n_local // LANE
        last_value_native = jnp.swapaxes(last_value, 0, 1).reshape(
            n_agents, rb, LANE
        )
        advantages, targets = compute_gae_native(
            cfg, traj["reward"], traj["value"], traj["done"], last_value_native
        )
        dataset = (
            traj["obs"],
            traj["action"],
            traj["logp"],
            traj["value"],
            advantages,
            targets,
        )
        if "bits" in traj:
            dataset = dataset + (traj["bits"],)
        if update_phase_fn is not None:
            (params, opt_state), metrics = ppo_update_phase_fused(
                cfg, runner.params, runner.opt_state, dataset, k_perm,
                update_phase_fn,
            )
        else:
            (params, opt_state), metrics = ppo_update_epochs_native(
                cfg, tx, runner.params, runner.opt_state, dataset, k_perm,
                axis_name=axis_name, grads_fn=grads_fn,
            )
        reward_sum = traj["reward"].sum()
        episodes = traj["done"].sum()
        if axis_name is not None:
            reward_sum = jax.lax.psum(reward_sum, axis_name)
            episodes = jax.lax.psum(episodes, axis_name)
        out_metrics = {
            "reward_per_env": reward_sum / cfg.n_envs,
            "episodes_done": episodes,
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

    def train_step_flat(runner: RunnerState) -> Tuple[RunnerState, dict]:
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

        action = traj["action"]
        if "bits" in traj:
            # joint (move, bits) action: ppo_loss keys msg mode off the
            # trailing action axis (models/ippo.py)
            action = jnp.concatenate(
                [action[..., None], traj["bits"]], axis=-1
            )
        dataset = (
            flat(traj["obs"].astype(jnp.float32)),
            flat(action),
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

    if mesh is None:
        return train_step_native if native else train_step_flat
    if not native:
        raise ValueError("mesh sharding requires the native path")
    if n_local % ENV_BLOCK:
        raise ValueError(
            f"n_envs={cfg.n_envs} over {n_shards} shards gives {n_local} "
            f"local envs; must be a multiple of ENV_BLOCK={ENV_BLOCK}"
        )

    from rware_tpu.parallel import shard_map_train_step

    return shard_map_train_step(
        train_step_native, mesh,
        RunnerState(params=None, opt_state=None, env_states=None,
                    obs=None, key=None, update_idx=None),
        env_fields=("env_states", "obs"), axis=mesh_axis,
    )
