"""State-injection helpers — the functional equivalent of the reference's
white-box test pattern (mutate ``agent.x/.y/.dir``, ``shelfs[i].x/.y``,
``request_queue[0]`` then ``_recalc_grid()``, e.g.
/root/reference/tests/test_movement.py:14-61).

Because the JAX engine derives grids on the fly from coordinates, "teleport
then recalc" collapses to building a :class:`WarehouseState` with the desired
coordinates.  :func:`make_state` builds one from scratch with shelves at their
home slots unless overridden.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rware_tpu.config import WarehouseConfig
from rware_tpu.core.state import WarehouseState
from rware_tpu.types import Direction


def make_state(
    config: WarehouseConfig,
    agents: Sequence[Tuple],
    *,
    shelves: Optional[Sequence[Tuple[int, int]]] = None,
    queue: Optional[Sequence[int]] = None,
    carrying: Optional[Sequence[int]] = None,
    has_delivered: Optional[Sequence[bool]] = None,
    seed: int = 0,
) -> WarehouseState:
    """Build an exact WarehouseState for a test scenario.

    Args:
      config: static env config (must match the lengths given here).
      agents: per-agent ``(x, y, direction)`` tuples.
      shelves: optional per-shelf ``(x, y)``; defaults to home rack slots.
      queue: optional request-queue shelf indices (0-based); defaults to
        ``[0, 1, ..., R-1]``.
      carrying: optional per-agent carried shelf index or -1.
      has_delivered: optional per-agent TWO_STAGE delivery flags.
      seed: PRNG seed for the state's key stream.
    """
    layout = config.compile_layout()
    n = config.n_agents
    if len(agents) != n:
        raise ValueError(f"need {n} agent tuples, got {len(agents)}")
    ax = jnp.asarray([a[0] for a in agents], dtype=jnp.int32)
    ay = jnp.asarray([a[1] for a in agents], dtype=jnp.int32)
    adir = jnp.asarray([int(a[2]) for a in agents], dtype=jnp.int32)

    if shelves is None:
        sx = jnp.asarray(layout.shelf_slots[:, 0])
        sy = jnp.asarray(layout.shelf_slots[:, 1])
    else:
        if len(shelves) != layout.n_shelves:
            raise ValueError(
                f"need {layout.n_shelves} shelf positions, got {len(shelves)}"
            )
        sx = jnp.asarray([s[0] for s in shelves], dtype=jnp.int32)
        sy = jnp.asarray([s[1] for s in shelves], dtype=jnp.int32)

    if queue is None:
        queue = list(range(config.request_queue_size))
    if carrying is None:
        carrying = [-1] * n
    if has_delivered is None:
        has_delivered = [False] * n

    # Carried shelves ride on their carrier (reference invariant).
    sx = jnp.asarray(sx)
    sy = jnp.asarray(sy)
    for i, c in enumerate(carrying):
        if c >= 0:
            sx = sx.at[c].set(ax[i])
            sy = sy.at[c].set(ay[i])

    return WarehouseState(
        agent_x=ax,
        agent_y=ay,
        agent_dir=adir,
        agent_carrying=jnp.asarray(carrying, dtype=jnp.int32),
        agent_has_delivered=jnp.asarray(has_delivered, dtype=bool),
        agent_message=jnp.zeros((n, config.msg_bits), dtype=jnp.float32),
        shelf_x=sx,
        shelf_y=sy,
        request_queue=jnp.asarray(queue, dtype=jnp.int32),
        cur_steps=jnp.zeros((), dtype=jnp.int32),
        cur_inactive_steps=jnp.zeros((), dtype=jnp.int32),
        key=jax.random.key(seed),
    )


UP = Direction.UP
DOWN = Direction.DOWN
LEFT = Direction.LEFT
RIGHT = Direction.RIGHT


def positions(state: WarehouseState) -> list:
    """[(x, y), ...] per agent — concise assertion helper."""
    return list(
        zip(np.asarray(state.agent_x).tolist(), np.asarray(state.agent_y).tolist())
    )
