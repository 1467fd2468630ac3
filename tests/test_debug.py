"""Invariant validation and checkify-wrapped stepping."""
import jax
import jax.numpy as jnp
import pytest

import rware_tpu
from rware_tpu.debug import checked_step, state_invariant_errors, validate_state
from rware_tpu.testing import UP, make_state


def test_valid_state_passes():
    env = rware_tpu.make("rware-tiny-2ag-v2")
    state, _ = env.reset(jax.random.key(0))
    validate_state(state, env.config)


def test_detects_agent_overlap():
    env = rware_tpu.make("rware-tiny-2ag-v2")
    cfg = env.config
    state = make_state(cfg, [(1, 1, UP), (1, 1, UP)])
    errs = state_invariant_errors(state, cfg)
    assert any("share a cell" in e for e in errs)
    with pytest.raises(ValueError):
        validate_state(state, cfg)


def test_detects_carried_shelf_drift():
    env = rware_tpu.make("rware-tiny-2ag-v2")
    cfg = env.config
    state = make_state(cfg, [(1, 1, UP), (2, 2, UP)], carrying=[0, -1])
    # teleport the agent but not its shelf
    state = state.set_agent(0, x=5)
    errs = state_invariant_errors(state, cfg)
    assert any("not under its carrier" in e for e in errs)


def test_detects_queue_duplicates():
    env = rware_tpu.make("rware-tiny-2ag-v2")
    cfg = env.config
    state = make_state(cfg, [(1, 1, UP), (2, 2, UP)], queue=[3, 3])
    errs = state_invariant_errors(state, cfg)
    assert any("queue" in e for e in errs)


def test_checked_step_passes_on_valid():
    env = rware_tpu.make("rware-tiny-2ag-v2")
    state, _ = env.reset(jax.random.key(0))
    checked = jax.jit(checked_step(env._step_fn, env.config))
    err, res = checked(state, jnp.asarray([1, 1], dtype=jnp.int32))
    err.throw()  # no violation
    assert res.obs.shape == (2, 71)
