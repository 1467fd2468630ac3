"""State invariants and debug checks.

The reference's only runtime guard is the resolver assert "failed implies
FORWARD" (rware/warehouse.py:875) plus Python's object model.  The
functional engine can't corrupt shared state (there is none — SURVEY.md §5
race-detection analysis), but injected/test states can violate the physical
invariants the engine assumes.  ``validate_state`` checks them eagerly
(host-side, for tests and adapters); ``checked_step`` wraps a step function
with jax.experimental.checkify so the same invariants trip inside jit.
"""
from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from rware_tpu.config import WarehouseConfig
from rware_tpu.core.state import WarehouseState


def state_invariant_errors(
    state: WarehouseState, config: WarehouseConfig
) -> List[str]:
    """Human-readable list of violated invariants (host-side, unbatched)."""
    errs = []
    h, w = config.grid_size
    ax = np.asarray(state.agent_x)
    ay = np.asarray(state.agent_y)
    sx = np.asarray(state.shelf_x)
    sy = np.asarray(state.shelf_y)
    carrying = np.asarray(state.agent_carrying)
    queue = np.asarray(state.request_queue)

    if not ((ax >= 0) & (ax < w) & (ay >= 0) & (ay < h)).all():
        errs.append("agent out of bounds")
    if not ((sx >= 0) & (sx < w) & (sy >= 0) & (sy < h)).all():
        errs.append("shelf out of bounds")
    cells = list(zip(ax.tolist(), ay.tolist()))
    if len(set(cells)) != len(cells):
        errs.append("two agents share a cell")
    shelf_cells = list(zip(sx.tolist(), sy.tolist()))
    if len(set(shelf_cells)) != len(shelf_cells):
        errs.append("two shelves share a cell")
    if not ((carrying >= -1) & (carrying < config.n_shelves)).all():
        errs.append("carrying index out of range")
    held = carrying[carrying >= 0]
    if len(set(held.tolist())) != len(held):
        errs.append("one shelf carried by two agents")
    for i, c in enumerate(carrying):
        if c >= 0 and (sx[c] != ax[i] or sy[c] != ay[i]):
            errs.append(f"carried shelf {c} not under its carrier {i}")
    if len(queue) and (
        len(set(queue.tolist())) != len(queue)
        or not ((queue >= 0) & (queue < config.n_shelves)).all()
    ):
        errs.append("request queue invalid (duplicate or out of range)")
    return errs


def validate_state(state: WarehouseState, config: WarehouseConfig) -> None:
    """Raise ValueError when a state violates engine invariants."""
    errs = state_invariant_errors(state, config)
    if errs:
        raise ValueError("invalid WarehouseState: " + "; ".join(errs))


def checked_step(step_fn, config: WarehouseConfig):
    """Wrap a step function with in-jit invariant checks (checkify).

    Returns ``(err, result) = checked(state, actions)``; call
    ``err.throw()`` host-side to surface violations.  Compile-time cost only
    when used — the production path stays assert-free.
    """
    from jax.experimental import checkify

    def with_checks(state: WarehouseState, actions):
        result = step_fn(state, actions)
        new = result.state
        # failed => was FORWARD is enforced structurally; check the physical
        # core invariants instead.
        same_cell = (
            (new.agent_x[:, None] == new.agent_x[None, :])
            & (new.agent_y[:, None] == new.agent_y[None, :])
            & ~jnp.eye(new.agent_x.shape[0], dtype=bool)
        )
        checkify.check(
            ~jnp.any(same_cell), "two agents share a cell after step"
        )
        carrying = new.agent_carrying
        idx = jnp.maximum(carrying, 0)
        riding = (new.shelf_x[idx] == new.agent_x) & (
            new.shelf_y[idx] == new.agent_y
        )
        checkify.check(
            jnp.all(jnp.where(carrying >= 0, riding, True)),
            "carried shelf not under its carrier",
        )
        return result

    return checkify.checkify(with_checks)
