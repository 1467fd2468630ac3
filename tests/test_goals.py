"""Delivery, request-queue and reward golden tests
(native re-statements of /root/reference/tests/test_goals.py)."""
import jax.numpy as jnp
import numpy as np
import pytest

import rware_tpu
from rware_tpu import Action, RewardType, WarehouseConfig
from rware_tpu.testing import DOWN, UP, make_state, positions

# 3 rack cells, goal bottom-right at (4,4).
LAYOUT = """
.....
.xxx.
.....
.....
....g
"""

FWD = int(Action.FORWARD)
NOOP = int(Action.NOOP)
TOGGLE = int(Action.TOGGLE_LOAD)


def env_with(reward_type, n_agents=2, queue_size=1):
    return rware_tpu.make(
        WarehouseConfig(
            n_agents=n_agents,
            request_queue_size=queue_size,
            reward_type=reward_type,
            layout=LAYOUT,
        )
    )


def deliver_setup(env, carrying_shelf=0, queue=None):
    """Agent 0 loaded with a requested shelf, one step above the goal."""
    return make_state(
        env.config,
        [(4, 3, DOWN), (0, 0, UP)],
        carrying=[carrying_shelf, -1],
        queue=queue or [carrying_shelf],
    )


def test_goal_positions_from_layout():
    env = env_with(RewardType.INDIVIDUAL)
    assert env.layout.goals.tolist() == [[4, 4]]


def test_delivery_individual_reward():
    env = env_with(RewardType.INDIVIDUAL)
    state = deliver_setup(env)
    res = env.step(state, jnp.asarray([FWD, NOOP]))
    assert positions(res.state)[0] == (4, 4)
    np.testing.assert_allclose(np.asarray(res.rewards), [1.0, 0.0])
    assert int(res.state.cur_inactive_steps) == 0


def test_delivery_global_reward():
    env = env_with(RewardType.GLOBAL)
    state = deliver_setup(env)
    res = env.step(state, jnp.asarray([FWD, NOOP]))
    np.testing.assert_allclose(np.asarray(res.rewards), [1.0, 1.0])


def test_delivery_two_stage_reward():
    env = env_with(RewardType.TWO_STAGE)
    state = deliver_setup(env)
    res = env.step(state, jnp.asarray([FWD, NOOP]))
    np.testing.assert_allclose(np.asarray(res.rewards), [0.5, 0.0])
    assert bool(res.state.agent_has_delivered[0])

    # walk back to a rack cell and drop: second 0.5
    state = res.state.set_agent(0, x=1, y=1)
    res2 = env.step(state, jnp.asarray([TOGGLE, NOOP]))
    np.testing.assert_allclose(np.asarray(res2.rewards), [0.5, 0.0])
    assert int(res2.state.agent_carrying[0]) == -1
    assert not bool(res2.state.agent_has_delivered[0])


def test_two_stage_drop_without_delivery_pays_nothing():
    env = env_with(RewardType.TWO_STAGE)
    state = make_state(env.config, [(1, 1, UP), (0, 0, UP)], carrying=[0, -1])
    res = env.step(state, jnp.asarray([TOGGLE, NOOP]))
    np.testing.assert_allclose(np.asarray(res.rewards), [0.0, 0.0])
    assert int(res.state.agent_carrying[0]) == -1


def test_non_requested_shelf_on_goal_pays_nothing():
    env = env_with(RewardType.INDIVIDUAL)
    # carrying shelf 2, but only shelf 0 is requested
    state = deliver_setup(env, carrying_shelf=2, queue=[0])
    res = env.step(state, jnp.asarray([FWD, NOOP]))
    assert positions(res.state)[0] == (4, 4)
    np.testing.assert_allclose(np.asarray(res.rewards), [0.0, 0.0])
    assert int(res.state.cur_inactive_steps) == 1


def test_unloaded_agent_on_goal_pays_nothing():
    env = env_with(RewardType.INDIVIDUAL)
    state = make_state(env.config, [(4, 3, DOWN), (0, 0, UP)])
    res = env.step(state, jnp.asarray([FWD, NOOP]))
    np.testing.assert_allclose(np.asarray(res.rewards), [0.0, 0.0])


def test_queue_resample_excludes_queued_shelves():
    # S=3 shelves, queue=[0,1]; delivering 0 leaves shelf 2 as the only
    # legal replacement (reference excludes queued shelves incl. the one
    # being delivered, warehouse.py:915-917) — deterministic outcome.
    env = rware_tpu.make(
        WarehouseConfig(
            n_agents=2,
            request_queue_size=2,
            reward_type=RewardType.INDIVIDUAL,
            layout=LAYOUT,
        )
    )
    state = make_state(
        env.config,
        [(4, 3, DOWN), (0, 0, UP)],
        carrying=[0, -1],
        queue=[0, 1],
    )
    res = env.step(state, jnp.asarray([FWD, NOOP]))
    np.testing.assert_allclose(np.asarray(res.rewards), [1.0, 0.0])
    assert np.asarray(res.state.request_queue).tolist() == [2, 1]


def test_inactivity_termination():
    env = rware_tpu.make(
        WarehouseConfig(
            n_agents=1,
            request_queue_size=1,
            max_inactivity_steps=5,
            max_steps=None,
            layout=LAYOUT,
        )
    )
    state = make_state(env.config, [(0, 0, UP)])
    for t in range(5):
        res = env.step(state, jnp.asarray([NOOP]))
        state = res.state
        assert bool(res.done) == (t == 4)


def test_max_steps_termination():
    env = rware_tpu.make(
        WarehouseConfig(
            n_agents=1, request_queue_size=1, max_steps=3, layout=LAYOUT
        )
    )
    state = make_state(env.config, [(0, 0, UP)])
    for t in range(3):
        res = env.step(state, jnp.asarray([NOOP]))
        state = res.state
        assert bool(res.done) == (t == 2)
        assert not bool(res.truncated)  # reference reports time-limit via done


def test_delivery_resets_inactivity_counter():
    env = env_with(RewardType.INDIVIDUAL)
    state = deliver_setup(env)
    state = state.replace(cur_inactive_steps=jnp.asarray(99, dtype=jnp.int32))
    res = env.step(state, jnp.asarray([FWD, NOOP]))
    assert int(res.state.cur_inactive_steps) == 0


def test_multi_goal_simultaneous_delivery_counts_two():
    # both goals deliver in the same step: rewards pay twice AND the info
    # metric counts 2 (it used to emit a 0/1 flag)
    env = rware_tpu.make(
        WarehouseConfig(
            n_agents=2,
            request_queue_size=3,
            reward_type=RewardType.INDIVIDUAL,
            layout="""
.....
.xxx.
.....
.....
...gg
""",
        )
    )
    state = make_state(
        env.config,
        [(3, 3, DOWN), (4, 3, DOWN)],
        carrying=[0, 1],
        queue=[0, 1, 2],
    )
    res = env.step(state, jnp.asarray([FWD, FWD]))
    np.testing.assert_allclose(np.asarray(res.rewards), [1.0, 1.0])
    assert int(res.info["deliveries"]) == 2


def test_queue_equals_shelf_count_keeps_delivered_shelf():
    # R == S: the reference crashes on an empty candidate list; here the
    # delivered shelf stays requested (documented graceful behavior)
    env = rware_tpu.make(
        WarehouseConfig(
            n_agents=2,
            request_queue_size=3,
            reward_type=RewardType.INDIVIDUAL,
            layout=LAYOUT,
        )
    )
    state = make_state(
        env.config,
        [(4, 3, DOWN), (0, 0, UP)],
        carrying=[0, -1],
        queue=[0, 1, 2],  # all three shelves requested
    )
    res = env.step(state, jnp.asarray([FWD, NOOP]))
    np.testing.assert_allclose(np.asarray(res.rewards), [1.0, 0.0])
    assert sorted(np.asarray(res.state.request_queue).tolist()) == [0, 1, 2]
