"""Gymnasium adapter: spaces, 5-tuple contract, DICT reconstruction, wrappers."""
import gymnasium as gym
import numpy as np
import pytest

import rware_tpu
from rware_tpu import ObservationType, WarehouseConfig
from rware_tpu.gym_adapter import GymWarehouse, make_gym, register_all
from rware_tpu.utils.wrappers import DictAgents, FlattenAgents, FlattenSAObservation


def test_basic_episode_contract():
    env = make_gym("rware-tiny-2ag-v2")
    obs, info = env.reset(seed=0)
    assert isinstance(obs, tuple) and len(obs) == 2
    assert env.observation_space.contains(tuple(o.astype(np.float32) for o in obs))
    for _ in range(20):
        actions = env.action_space.sample()
        obs, rewards, done, truncated, info = env.step(list(actions))
        assert len(rewards) == 2 and isinstance(rewards[0], float)
        assert truncated is False
    env.close()


def test_obs_space_containment_all_types():
    for ot in [
        ObservationType.FLATTENED,
        ObservationType.DICT,
        ObservationType.IMAGE,
        ObservationType.IMAGE_DICT,
    ]:
        env = make_gym("rware-tiny-2ag-v2", observation_type=ot)
        obs, _ = env.reset(seed=1)
        for t in range(10):
            obs, *_ = env.step(list(env.action_space.sample()))
        assert env.observation_space.contains(obs), ot


def test_dict_flattens_to_flattened():
    # flatten(DICT) == FLATTENED bit-for-bit (reference tests/test_env.py:406-512)
    dict_env = make_gym("rware-tiny-2ag-v2", observation_type=ObservationType.DICT)
    flat_env = make_gym(
        "rware-tiny-2ag-v2", observation_type=ObservationType.FLATTENED
    )
    dict_obs, _ = dict_env.reset(seed=5)
    flat_env.state = dict_env.state  # identical underlying state
    flat_obs = flat_env._convert_obs(flat_env._env.observe(flat_env.state))
    for i in range(2):
        flat_from_dict = gym.spaces.flatten(
            dict_env.observation_space[i], dict_obs[i]
        )
        np.testing.assert_allclose(flat_from_dict, flat_obs[i])


def test_action_space_msg_bits():
    env = make_gym(WarehouseConfig(n_agents=2, msg_bits=2, request_queue_size=2))
    sa = env.action_space[0]
    assert isinstance(sa, gym.spaces.MultiDiscrete)
    assert sa.nvec.tolist() == [5, 2, 2]
    env.reset(seed=0)
    obs, rew, *_ = env.step([np.array([1, 0, 1]), np.array([0, 1, 0])])


def test_seed_reproducibility():
    env = make_gym("rware-tiny-2ag-v2")
    a, _ = env.reset(seed=42)
    b, _ = env.reset(seed=42)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    c, _ = env.reset(seed=43)
    assert any(not np.array_equal(x, y) for x, y in zip(a, c))


def test_state_injection_roundtrip():
    env = make_gym("rware-tiny-2ag-v2")
    env.reset(seed=0)
    env.state = env.state.set_agent(0, x=3, y=4)
    assert np.asarray(env.state.agent_x)[0] == 3
    obs, *_ = env.step([0, 0])
    assert np.asarray(env.state.agent_x)[0] == 3  # NOOP kept position


def test_get_global_image():
    env = make_gym("rware-tiny-2ag-v2")
    env.reset(seed=0)
    img = env.get_global_image()
    assert img.shape == (2, 11, 10)  # (C=2 default layers, H, W)
    assert set(np.unique(img)) <= {0.0, 1.0}
    padded = env.get_global_image(pad_to_shape=(2, 15, 14), recompute=True)
    assert padded.shape == (2, 15, 14)
    # centre-pad: original content offset by floor(pad/2)
    np.testing.assert_array_equal(padded[:, 2:13, 2:12], img)
    with pytest.raises(ValueError):
        env.get_global_image(pad_to_shape=(2, 5, 5), recompute=True)


def test_register_all_registers_grid():
    n = register_all()
    env = gym.make("rware-tiny-2ag-v2", disable_env_checker=True)
    obs, info = env.reset(seed=0)
    assert len(obs) == 2
    # idempotent
    assert register_all() == 0


def test_register_all_top_level_export():
    # README documents rware_tpu.register_all(image=True) for the -img grid
    import rware_tpu

    rware_tpu.register_all(image=True)
    env = gym.make("rware-img-tiny-2ag-v2", disable_env_checker=True)
    obs, info = env.reset(seed=0)
    assert obs[0].shape[0] == 5  # image layers, directional window


# --- wrappers (reference: rware/utils/wrappers.py, tests/test_wrappers.py) ---


def test_flatten_agents():
    env = FlattenAgents(make_gym("rware-tiny-2ag-v2"))
    obs, info = env.reset(seed=0)
    assert obs.shape == (2 * 71,)
    assert isinstance(env.action_space, gym.spaces.MultiDiscrete)
    obs, rew, done, trunc, info = env.step(env.action_space.sample())
    assert obs.shape == (2 * 71,)
    assert isinstance(rew, float)


def test_dict_agents():
    env = DictAgents(make_gym("rware-tiny-2ag-v2"))
    obs, info = env.reset(seed=0)
    assert set(obs.keys()) == {"agent_0", "agent_1"}
    actions = {"agent_0": 1, "agent_1": 0}
    obs, rew, done, trunc, info = env.step(actions)
    assert set(rew.keys()) == {"agent_0", "agent_1"}
    assert set(done.keys()) == {"agent_0", "agent_1"}


def test_flatten_sa_observation():
    env = FlattenSAObservation(
        make_gym("rware-tiny-2ag-v2", observation_type=ObservationType.DICT)
    )
    obs, info = env.reset(seed=0)
    assert len(obs) == 2
    assert obs[0].shape == (71,)


# --- renderer ----------------------------------------------------------------


def test_render_rgb_array():
    env = make_gym("rware-tiny-2ag-v2", render_mode="rgb_array")
    env.reset(seed=0)
    frame = env.render()
    assert frame.shape == (11 * 30 + 1, 10 * 30 + 1, 3)
    assert frame.dtype == np.uint8
    # agents drawn: some orange pixels
    orange = (frame == np.array([255, 165, 0], np.uint8)).all(-1)
    assert orange.sum() > 100
    env.step([1, 1])
    frame2 = env.render()
    assert frame2.shape == frame.shape
    env.close()


def test_register_full_variants():
    from rware_tpu.gym_adapter import register_full

    register_full(sensor_ranges=[3], column_heights=[12])
    env = gym.make("rware-3s-tiny-2ag-v2", disable_env_checker=True)
    obs, _ = env.reset(seed=0)
    assert obs[0].shape == (8 + 49 * 7,)
    env2 = gym.make("rware-small-12h-4ag-easy-v2", disable_env_checker=True)
    assert env2.unwrapped.grid_size == (28, 10)


def test_reference_positional_extras():
    """Positionals 11+ (layout, observation_type, ...) map like the
    reference signature (rware/warehouse.py:146-170); overflow raises."""
    from rware_tpu.gym_adapter import GymWarehouse
    from rware_tpu.types import RewardType

    env = GymWarehouse(
        3, 8, 1, 2, 0, 1, 2, None, 500, RewardType.INDIVIDUAL,
        None, ObservationType.DICT,
    )
    assert env.config.observation_type == ObservationType.DICT
    with pytest.raises(TypeError):
        GymWarehouse(
            3, 8, 1, 2, 0, 1, 2, None, 500, RewardType.INDIVIDUAL,
            None, ObservationType.DICT, None, True, False, None, 99,
        )


def test_flatten_agents_msg_bits_action():
    """FlattenAgents splits joint actions into (1+msg_bits)-wide slices
    (reference np.split semantics, rware/utils/wrappers.py:33)."""
    from rware_tpu.gym_adapter import GymWarehouse
    from rware_tpu.types import RewardType

    env = FlattenAgents(
        GymWarehouse(3, 8, 1, 2, 2, 1, 2, None, 500, RewardType.INDIVIDUAL)
    )
    env.reset(seed=0)
    joint = np.zeros(2 * 3, dtype=np.int64)  # 2 agents x (action + 2 bits)
    obs, rew, done, trunc, info = env.step(joint)
    assert np.isscalar(rew) or np.ndim(rew) == 0


def test_interactive_viewer_headless_raises():
    """InteractiveViewer (the windowed play surface) declines cleanly
    under a headless Agg backend so human_play falls back to curses."""
    import matplotlib

    matplotlib.use("Agg")
    from rware_tpu.rendering import InteractiveViewer

    with pytest.raises(RuntimeError):
        InteractiveViewer(WarehouseConfig())
