"""Golden movement/collision scenarios.

Native re-statements of the reference's behavioral suite
(/root/reference/tests/test_movement.py) against the JAX engine, using the
state-injection API.  Layouts are small DSL grids so every scenario is
geometrically explicit.
"""
import jax.numpy as jnp
import numpy as np
import pytest

import rware_tpu
from rware_tpu import Action, WarehouseConfig
from rware_tpu.testing import DOWN, LEFT, RIGHT, UP, make_state, positions

# 5x5 playground: one rack cell so a request queue exists, one goal.
OPEN = """
.....
.....
..x..
.....
....g
"""


def open_env(n_agents, **kw):
    return rware_tpu.make(
        WarehouseConfig(
            n_agents=n_agents, request_queue_size=1, layout=OPEN, **kw
        )
    )


FWD = int(Action.FORWARD)
NOOP = int(Action.NOOP)
TOGGLE = int(Action.TOGGLE_LOAD)


def step_env(env, state, acts):
    return env.step(state, jnp.asarray(acts, dtype=jnp.int32))


# --- simple movement and wall clamps (ref: test_movement.py:50-165) ---------


@pytest.mark.parametrize(
    "direction,expect",
    [(UP, (1, 0)), (DOWN, (1, 2)), (LEFT, (0, 1)), (RIGHT, (2, 1))],
)
def test_simple_forward(direction, expect):
    env = open_env(1)
    state = make_state(env.config, [(1, 1, direction)])
    res = step_env(env, state, [FWD])
    assert positions(res.state)[0] == expect


@pytest.mark.parametrize(
    "pos,direction",
    [((0, 0), UP), ((0, 0), LEFT), ((4, 4), DOWN), ((4, 4), RIGHT)],
)
def test_wall_clamp(pos, direction):
    env = open_env(1)
    state = make_state(env.config, [(pos[0], pos[1], direction)])
    res = step_env(env, state, [FWD])
    assert positions(res.state)[0] == pos  # clamped, still committed


# --- rotations (ref: test_movement.py:389-498) -------------------------------


@pytest.mark.parametrize(
    "start,left,right",
    [(UP, LEFT, RIGHT), (RIGHT, UP, DOWN), (DOWN, RIGHT, LEFT), (LEFT, DOWN, UP)],
)
def test_rotation(start, left, right):
    env = open_env(1)
    state = make_state(env.config, [(2, 2, start)])
    res = step_env(env, state, [int(Action.LEFT)])
    assert int(res.state.agent_dir[0]) == int(left)
    res = step_env(env, state, [int(Action.RIGHT)])
    assert int(res.state.agent_dir[0]) == int(right)


# --- collisions (ref: test_movement.py:168-386) ------------------------------


def test_head_on_swap_blocks_both():
    env = open_env(2)
    state = make_state(env.config, [(1, 1, RIGHT), (2, 1, LEFT)])
    res = step_env(env, state, [FWD, FWD])
    assert positions(res.state) == [(1, 1), (2, 1)]


def test_head_on_swap_poisons_whole_component():
    # A third agent chained behind one of the swappers also fails
    # (ref commits nobody in a 2-cycle component, warehouse.py:855-858).
    env = open_env(3)
    state = make_state(
        env.config, [(1, 1, RIGHT), (2, 1, LEFT), (0, 1, RIGHT)]
    )
    res = step_env(env, state, [FWD, FWD, FWD])
    assert positions(res.state) == [(1, 1), (2, 1), (0, 1)]


def test_move_into_static_agent_fails():
    env = open_env(2)
    state = make_state(env.config, [(1, 1, RIGHT), (2, 1, UP)])
    res = step_env(env, state, [FWD, NOOP])
    assert positions(res.state) == [(1, 1), (2, 1)]


def test_move_into_rotating_agent_fails():
    env = open_env(2)
    state = make_state(env.config, [(1, 1, RIGHT), (2, 1, UP)])
    res = step_env(env, state, [FWD, int(Action.LEFT)])
    assert positions(res.state) == [(1, 1), (2, 1)]
    assert int(res.state.agent_dir[1]) == int(LEFT)


def test_chain_moves_together():
    env = open_env(2)
    state = make_state(env.config, [(1, 1, RIGHT), (2, 1, RIGHT)])
    res = step_env(env, state, [FWD, FWD])
    assert positions(res.state) == [(2, 1), (3, 1)]


def test_chain_of_three():
    env = open_env(3)
    state = make_state(
        env.config, [(0, 1, RIGHT), (1, 1, RIGHT), (2, 1, RIGHT)]
    )
    res = step_env(env, state, [FWD, FWD, FWD])
    assert positions(res.state) == [(1, 1), (2, 1), (3, 1)]


def test_chain_blocked_by_head():
    env = open_env(3)
    # head stays (NOOP), the whole chain behind fails
    state = make_state(
        env.config, [(0, 1, RIGHT), (1, 1, RIGHT), (2, 1, RIGHT)]
    )
    res = step_env(env, state, [FWD, FWD, NOOP])
    assert positions(res.state) == [(0, 1), (1, 1), (2, 1)]


def test_four_cycle_rotates():
    env = open_env(4)
    # square (1,1)->(2,1)->(2,2)->(1,2)->(1,1)
    state = make_state(
        env.config,
        [(1, 1, RIGHT), (2, 1, DOWN), (2, 2, LEFT), (1, 2, UP)],
    )
    res = step_env(env, state, [FWD] * 4)
    assert positions(res.state) == [(2, 1), (2, 2), (1, 2), (1, 1)]


def test_cycle_feeder_fails():
    # Agent feeding into a rotating 4-cycle is NOT committed even though its
    # target cell is vacated (ref commits only cycle nodes, warehouse.py:859-863).
    env = open_env(5)
    state = make_state(
        env.config,
        [(1, 1, RIGHT), (2, 1, DOWN), (2, 2, LEFT), (1, 2, UP), (0, 1, RIGHT)],
    )
    res = step_env(env, state, [FWD] * 5)
    assert positions(res.state) == [(2, 1), (2, 2), (1, 2), (1, 1), (0, 1)]


def test_contention_longer_chain_wins():
    env = open_env(3)
    # agents 0,1 form a chain moving right into (3,1); agent 2 competes
    # for (3,1) from below. Chain (len 2) beats single (len 1).
    state = make_state(
        env.config, [(1, 1, RIGHT), (2, 1, RIGHT), (3, 2, UP)]
    )
    res = step_env(env, state, [FWD, FWD, FWD])
    assert positions(res.state) == [(2, 1), (3, 1), (3, 2)]


def test_contention_equal_chains_deterministic():
    # Two single agents contend for the same empty cell; exactly one commits
    # and the winner is stable across runs (lowest index by our documented
    # tie-break; the reference's networkx tie order is arbitrary).
    env = open_env(2)
    state = make_state(env.config, [(2, 1, DOWN), (2, 3, UP)])
    res = step_env(env, state, [FWD, FWD])
    got = positions(res.state)
    assert got == [(2, 2), (2, 3)] or got == [(2, 1), (2, 2)]
    res2 = step_env(env, state, [FWD, FWD])
    assert positions(res2.state) == got


# --- carrying rules (ref: test_movement.py:501-620) --------------------------


def test_pickup_and_carry():
    env = open_env(1)
    state = make_state(env.config, [(2, 2, UP)])  # on the rack cell
    res = step_env(env, state, [TOGGLE])
    assert int(res.state.agent_carrying[0]) == 0
    res = step_env(env, res.state, [FWD])
    assert positions(res.state)[0] == (2, 1)
    # carried shelf rides along
    assert int(res.state.shelf_x[0]) == 2 and int(res.state.shelf_y[0]) == 1


def test_toggle_on_empty_cell_is_noop():
    env = open_env(1)
    state = make_state(env.config, [(0, 0, UP)])
    res = step_env(env, state, [TOGGLE])
    assert int(res.state.agent_carrying[0]) == -1


def test_drop_on_highway_fails():
    env = open_env(1)
    state = make_state(env.config, [(1, 1, UP)], carrying=[0])
    res = step_env(env, state, [TOGGLE])
    assert int(res.state.agent_carrying[0]) == 0  # still carrying


def test_drop_off_highway_succeeds():
    env = open_env(1)
    state = make_state(env.config, [(2, 2, UP)], carrying=[0])
    res = step_env(env, state, [TOGGLE])
    assert int(res.state.agent_carrying[0]) == -1
    assert int(res.state.shelf_x[0]) == 2 and int(res.state.shelf_y[0]) == 2


def test_unloaded_agent_moves_under_shelf():
    env = open_env(1)
    state = make_state(env.config, [(2, 3, UP)])
    res = step_env(env, state, [FWD])
    assert positions(res.state)[0] == (2, 2)  # under the standing shelf


def test_loaded_agent_cancelled_into_standing_shelf():
    env = open_env(1)
    # carrying shelf... the only shelf is 0, so use a 2-shelf layout
    layout = """
.....
.x.x.
....g
"""
    cfg = WarehouseConfig(n_agents=1, request_queue_size=1, layout=layout)
    env = rware_tpu.make(cfg)
    state = make_state(cfg, [(2, 1, RIGHT)], carrying=[0])
    res = step_env(env, state, [FWD])
    assert positions(res.state)[0] == (2, 1)  # pre-cancelled


def test_loaded_agent_follows_loaded_agent_through_rack():
    # Exception to the pre-cancel: the "standing shelf" at the target is held
    # by a loaded agent, so the chain may move (warehouse.py:833-841).
    layout = """
.....
.x.x.
....g
"""
    cfg = WarehouseConfig(n_agents=2, request_queue_size=1, layout=layout)
    env = rware_tpu.make(cfg)
    state = make_state(cfg, [(2, 1, RIGHT), (3, 1, RIGHT)], carrying=[0, 1])
    res = step_env(env, state, [FWD, FWD])
    assert positions(res.state) == [(3, 1), (4, 1)]


# --- batch semantics ---------------------------------------------------------


def test_vmap_step_matches_single():
    import jax

    env = open_env(2)
    keys = jax.random.split(jax.random.key(0), 5)
    states = jax.vmap(env._reset_fn)(keys)
    acts = jnp.tile(jnp.asarray([FWD, FWD], dtype=jnp.int32), (5, 1))
    batched = jax.vmap(env._step_fn)(states, acts)
    fields = [
        "agent_x", "agent_y", "agent_dir", "agent_carrying",
        "agent_has_delivered", "shelf_x", "shelf_y", "request_queue",
        "cur_steps", "cur_inactive_steps",
    ]
    for b in range(5):
        single = env.step(jax.tree.map(lambda x: x[b], states), acts[b])
        for f in fields:
            np.testing.assert_array_equal(
                np.asarray(getattr(batched.state, f)[b]),
                np.asarray(getattr(single.state, f)),
                err_msg=f"env {b} field {f}",
            )
        np.testing.assert_array_equal(
            np.asarray(batched.obs[b]), np.asarray(single.obs)
        )


def test_loaded_head_on_swap_blocks_both():
    # loaded variant of the head-on swap (ref: test_movement.py:168-245)
    layout = """
.....
.x.x.
....g
"""
    cfg = WarehouseConfig(n_agents=2, request_queue_size=1, layout=layout)
    env = rware_tpu.make(cfg)
    # ADJACENT loaded agents facing each other: a true head-on swap
    state = make_state(
        cfg, [(1, 0, RIGHT), (2, 0, LEFT)], carrying=[0, 1]
    )
    res = step_env(env, state, [FWD, FWD])
    assert positions(res.state) == [(1, 0), (2, 0)]
    # carried shelves stayed with their agents
    assert int(res.state.shelf_x[0]) == 1 and int(res.state.shelf_x[1]) == 2


def test_loaded_chain_moves_together():
    layout = """
......
.x.x..
.....g
"""
    cfg = WarehouseConfig(n_agents=2, request_queue_size=1, layout=layout)
    env = rware_tpu.make(cfg)
    state = make_state(
        cfg, [(1, 0, RIGHT), (2, 0, RIGHT)], carrying=[0, 1]
    )
    res = step_env(env, state, [FWD, FWD])
    assert positions(res.state) == [(2, 0), (3, 0)]
    assert int(res.state.shelf_x[0]) == 2
    assert int(res.state.shelf_x[1]) == 3


def test_rotation_while_carrying_keeps_shelf():
    env = open_env(1)
    state = make_state(env.config, [(2, 2, UP)], carrying=[0])
    res = step_env(env, state, [int(Action.RIGHT)])
    assert int(res.state.agent_dir[0]) == int(RIGHT)
    assert int(res.state.shelf_x[0]) == 2 and int(res.state.shelf_y[0]) == 2


def test_unloaded_swap_under_shelves_blocked():
    # two unloaded agents under adjacent shelves trying to swap still block
    layout = """
.....
.xx..
....g
"""
    cfg = WarehouseConfig(n_agents=2, request_queue_size=1, layout=layout)
    env = rware_tpu.make(cfg)
    state = make_state(cfg, [(1, 1, RIGHT), (2, 1, LEFT)])
    res = step_env(env, state, [FWD, FWD])
    assert positions(res.state) == [(1, 1), (2, 1)]
