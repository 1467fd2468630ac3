"""Observation kernels: gather-free windowed views of the warehouse state.

The reference builds observations with Python loops over window cells and a
``_VectorWriter`` (``/root/reference/rware/warehouse.py:598-744``).  Here each
observation family is a pure function of the state, built from broadcasted
coordinate comparisons instead of id-grid scatter/gather: with N agents and S
shelves both small, (N, W^2, N) / (N, W^2, S) boolean compare tensors are far
cheaper on the VPU than materialising and scattering an id grid every step,
and they fuse into one XLA program with the step itself.

FLATTENED bit layout (must match the reference exactly, incl. quirks —
rware/warehouse.py:631-674):
  self:  [x, y, carrying, dir-onehot(4), on_highway]
  per window cell (row-major, y-outer):
         [has_agent, dir-onehot(4) — empty cells write [1,0,0,0],
          msg_bits... (zeros when empty), has_shelf, shelf_requested]
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from rware_tpu.config import WarehouseConfig
from rware_tpu.core.state import WarehouseState
from rware_tpu.types import Direction, ImageLayer


def _window_offsets(sensor_range: int) -> tuple[np.ndarray, np.ndarray]:
    """Row-major (dy, dx) offsets of the (2r+1)^2 window, y-outer."""
    r = sensor_range
    dy, dx = np.meshgrid(np.arange(-r, r + 1), np.arange(-r, r + 1), indexing="ij")
    return dy.reshape(-1), dx.reshape(-1)


def build_flattened_obs_fn(
    config: WarehouseConfig,
) -> Callable[[WarehouseState], jax.Array]:
    """Returns ``obs(state) -> (N, L) float32`` for one (unbatched) env."""
    layout = config.compile_layout()
    height, width = layout.grid_size
    highways = jnp.asarray(layout.highways.astype(np.float32))
    dy, dx = _window_offsets(config.sensor_range)
    dy_c = jnp.asarray(dy, dtype=jnp.int32)
    dx_c = jnp.asarray(dx, dtype=jnp.int32)
    msg_bits = config.msg_bits
    normalised = config.normalised_coordinates

    def obs(state: WarehouseState) -> jax.Array:
        ax, ay = state.agent_x, state.agent_y
        # (N, W2) absolute coordinates of each agent's window cells.
        cx = ax[:, None] + dx_c[None, :]
        cy = ay[:, None] + dy_c[None, :]

        # --- neighbouring agents: (N, W2, N) one-hot over agent index.
        agent_match = (cx[:, :, None] == ax[None, None, :]) & (
            cy[:, :, None] == ay[None, None, :]
        )
        has_agent = jnp.any(agent_match, axis=-1)
        # Direction of the agent at the cell; empty cells give 0 == UP, which
        # reproduces the reference's empty-cell one-hot [1,0,0,0]
        # (rware/warehouse.py:658-659).
        cell_dir = jnp.sum(
            agent_match * state.agent_dir[None, None, :], axis=-1
        )
        dir_onehot = jax.nn.one_hot(cell_dir, 4, dtype=jnp.float32)

        cell_feats = [has_agent[..., None].astype(jnp.float32), dir_onehot]
        if msg_bits > 0:
            cell_msg = jnp.einsum(
                "nwj,jm->nwm",
                agent_match.astype(jnp.float32),
                state.agent_message.astype(jnp.float32),
            )
            cell_feats.append(cell_msg)

        # --- neighbouring shelves: (N, W2, S).
        shelf_match = (cx[:, :, None] == state.shelf_x[None, None, :]) & (
            cy[:, :, None] == state.shelf_y[None, None, :]
        )
        has_shelf = jnp.any(shelf_match, axis=-1)
        requested = jnp.any(shelf_match & state.in_queue_mask()[None, None, :], axis=-1)
        cell_feats.append(has_shelf[..., None].astype(jnp.float32))
        cell_feats.append(requested[..., None].astype(jnp.float32))

        per_cell = jnp.concatenate(cell_feats, axis=-1)  # (N, W2, bits)
        n = ax.shape[0]
        sensor_part = per_cell.reshape(n, -1)

        # --- self features.
        if normalised:
            fx = ax.astype(jnp.float32) / (width - 1)
            fy = ay.astype(jnp.float32) / (height - 1)
        else:
            fx = ax.astype(jnp.float32)
            fy = ay.astype(jnp.float32)
        carrying = (state.agent_carrying >= 0).astype(jnp.float32)
        self_dir = jax.nn.one_hot(state.agent_dir, 4, dtype=jnp.float32)
        on_highway = highways[ay, ax]
        self_part = jnp.concatenate(
            [
                fx[:, None],
                fy[:, None],
                carrying[:, None],
                self_dir,
                on_highway[:, None],
            ],
            axis=-1,
        )
        return jnp.concatenate([self_part, sensor_part], axis=-1)

    return obs


def build_global_layers_fn(
    config: WarehouseConfig, layers: tuple[ImageLayer, ...]
) -> Callable[[WarehouseState], jax.Array]:
    """Returns ``fn(state) -> (C, H, W) float32`` global layer stack.

    Mirrors the layer semantics of rware/warehouse.py:527-575 / 984-1019 with
    the reference's ``layer[ag.x, ag.y]`` transposition bug fixed (it raises
    IndexError on non-square grids there; see SURVEY.md §7.5): all layers here
    are consistently indexed ``[y, x]``.
    """
    layout = config.compile_layout()
    height, width = layout.grid_size
    goals_x = jnp.asarray(layout.goals[:, 0])
    goals_y = jnp.asarray(layout.goals[:, 1])

    def global_layers(state: WarehouseState) -> jax.Array:
        zeros = jnp.zeros((height, width), dtype=jnp.float32)
        out = []
        for layer_type in layers:
            if layer_type == ImageLayer.SHELVES:
                layer = zeros.at[state.shelf_y, state.shelf_x].set(1.0)
            elif layer_type == ImageLayer.REQUESTS:
                rx = state.shelf_x[state.request_queue]
                ry = state.shelf_y[state.request_queue]
                layer = zeros.at[ry, rx].set(1.0)
            elif layer_type == ImageLayer.AGENTS:
                layer = zeros.at[state.agent_y, state.agent_x].set(1.0)
            elif layer_type == ImageLayer.AGENT_DIRECTION:
                layer = zeros.at[state.agent_y, state.agent_x].set(
                    (state.agent_dir + 1).astype(jnp.float32)
                )
            elif layer_type == ImageLayer.AGENT_LOAD:
                layer = zeros.at[state.agent_y, state.agent_x].set(
                    (state.agent_carrying >= 0).astype(jnp.float32)
                )
            elif layer_type == ImageLayer.GOALS:
                layer = zeros.at[goals_y, goals_x].set(1.0)
            elif layer_type == ImageLayer.ACCESSIBLE:
                layer = (
                    jnp.ones((height, width), dtype=jnp.float32)
                    .at[state.agent_y, state.agent_x]
                    .set(0.0)
                )
            else:
                raise ValueError(f"Unknown image layer type: {layer_type}")
            out.append(layer)
        return jnp.stack(out)

    return global_layers


def build_image_obs_fn(
    config: WarehouseConfig,
) -> Callable[[WarehouseState], jax.Array]:
    """Returns ``obs(state) -> (N, C, W2, W2) float32`` windowed image obs.

    Reference: rware/warehouse.py:527-596 — global layer stack, zero-padded by
    sensor_range, per-agent window slice, optionally rotated into the agent's
    frame (UP = identity; DOWN = 180°; LEFT/RIGHT = ±90°).
    """
    r = config.sensor_range
    w2 = config.window_size
    global_layers = build_global_layers_fn(config, config.image_observation_layers)
    directional = config.image_observation_directional
    n_channels = len(config.image_observation_layers)

    def obs(state: WarehouseState) -> jax.Array:
        stack = global_layers(state)
        padded = jnp.pad(stack, ((0, 0), (r, r), (r, r)))

        def window(x, y, direction):
            win = jax.lax.dynamic_slice(
                padded,
                (0, y, x),  # top-left of window is (y - r) + r padding
                (n_channels, w2, w2),
            )
            if not directional:
                return win
            # Rotation into the agent frame (rware/warehouse.py:584-595):
            # DOWN: k=2; LEFT: k=3 (270° ccw); RIGHT: k=1 (90° ccw).
            branches = [
                lambda w: w,  # UP
                lambda w: jnp.rot90(w, k=2, axes=(1, 2)),  # DOWN
                lambda w: jnp.rot90(w, k=3, axes=(1, 2)),  # LEFT
                lambda w: jnp.rot90(w, k=1, axes=(1, 2)),  # RIGHT
            ]
            return jax.lax.switch(direction, branches, win)

        return jax.vmap(window)(state.agent_x, state.agent_y, state.agent_dir)

    return obs


def build_image_dict_features_fn(
    config: WarehouseConfig,
) -> Callable[[WarehouseState], jax.Array]:
    """(N, 6) feature vector of IMAGE_DICT obs: [dir-onehot(4), on_highway,
    carrying] (reference: rware/warehouse.py:725-742)."""
    layout = config.compile_layout()
    highways = jnp.asarray(layout.highways.astype(np.float32))

    def features(state: WarehouseState) -> jax.Array:
        dir_onehot = jax.nn.one_hot(state.agent_dir, 4, dtype=jnp.float32)
        on_highway = highways[state.agent_y, state.agent_x]
        carrying = (state.agent_carrying >= 0).astype(jnp.float32)
        return jnp.concatenate(
            [dir_onehot, on_highway[:, None], carrying[:, None]], axis=-1
        )

    return features
