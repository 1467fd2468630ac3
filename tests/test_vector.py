"""VectorGymWarehouse: batched gym.vector contract + NEXT_STEP autoreset."""
import gymnasium as gym
import numpy as np
import pytest

import rware_tpu
from rware_tpu.types import ObservationType


B = 4


def sample_actions(venv, rng):
    return tuple(
        rng.integers(0, 5, size=B).astype(np.int64)
        for _ in range(venv.config.n_agents)
    )


def test_vector_contract_flattened():
    venv = rware_tpu.make_vec("rware-tiny-2ag-v2", num_envs=B)
    assert isinstance(venv, gym.vector.VectorEnv)
    assert venv.num_envs == B
    obs, info = venv.reset(seed=0)
    assert venv.observation_space.contains(obs)
    rng = np.random.default_rng(1)
    for _ in range(3):
        obs, rew, term, trunc, info = venv.step(sample_actions(venv, rng))
        assert venv.observation_space.contains(obs)
        assert rew.shape == (B, venv.config.n_agents)
        assert term.shape == (B,) and trunc.shape == (B,)
        assert not trunc.any()
        assert {"deliveries", "failed_moves"} <= set(info)


def test_vector_action_space_layouts():
    venv = rware_tpu.make_vec("rware-tiny-2ag-v2", num_envs=B)
    venv.reset(seed=0)
    # batched-space tuple layout
    a = venv.action_space.sample()
    obs1, *_ = venv.step(a)
    # raw (B, N) array layout
    arr = np.stack([np.asarray(x) for x in a], axis=1)
    obs2, *_ = venv.step(arr)
    assert venv.observation_space.contains(obs2)


@pytest.mark.parametrize("obs_type", [ObservationType.DICT, ObservationType.IMAGE])
def test_vector_obs_types(obs_type):
    venv = rware_tpu.make_vec(
        "rware-tiny-2ag-v2", num_envs=B, observation_type=obs_type
    )
    obs, _ = venv.reset(seed=3)
    assert venv.observation_space.contains(obs)
    rng = np.random.default_rng(4)
    obs, *_ = venv.step(sample_actions(venv, rng))
    assert venv.observation_space.contains(obs)


def test_vector_image_dict():
    venv = rware_tpu.make_vec(
        "rware-tiny-2ag-v2", num_envs=B,
        observation_type=ObservationType.IMAGE_DICT,
    )
    obs, _ = venv.reset(seed=5)
    assert len(obs) == venv.config.n_agents
    assert obs[0]["image"].shape[0] == B
    assert obs[0]["features"].shape == (B, 6)


def test_vector_next_step_autoreset():
    venv = rware_tpu.make_vec("rware-tiny-2ag-v2", num_envs=B, max_steps=3)
    venv.reset(seed=0)
    rng = np.random.default_rng(2)
    for t in range(3):
        obs, rew, term, trunc, info = venv.step(sample_actions(venv, rng))
    # horizon hit: every env reports terminated on step 3...
    assert term.all()
    assert int(venv.states.cur_steps[0]) == 3
    # ...and the NEXT step resets on device instead of stepping
    obs, rew, term, trunc, info = venv.step(sample_actions(venv, rng))
    assert not term.any()
    assert (rew == 0).all()
    assert (np.asarray(venv.states.cur_steps) == 0).all()
    assert (np.asarray(info["failed_moves"]) == 0).all()
    # and the episode then proceeds normally
    obs, rew, term, trunc, info = venv.step(sample_actions(venv, rng))
    assert (np.asarray(venv.states.cur_steps) == 1).all()


def test_gym_make_vec_entry_point():
    from rware_tpu.gym_adapter import register_all

    # force: earlier tests may have imported the reference package, whose
    # import side effect registers the same ids (no vector entry point)
    register_all(force=True)
    venv = gym.make_vec("rware-tiny-2ag-v2", num_envs=B)
    assert type(venv).__name__ == "VectorGymWarehouse"
    obs, _ = venv.reset(seed=0)
    obs, rew, term, trunc, info = venv.step(venv.action_space.sample())
    assert venv.observation_space.contains(obs)
    assert rew.shape == (B, venv.config.n_agents)


def test_vector_reset_determinism():
    v1 = rware_tpu.make_vec("rware-tiny-2ag-v2", num_envs=B)
    v2 = rware_tpu.make_vec("rware-tiny-2ag-v2", num_envs=B)
    o1, _ = v1.reset(seed=7)
    o2, _ = v2.reset(seed=7)
    for a, b in zip(o1, o2):
        np.testing.assert_array_equal(a, b)
    # different envs in the batch start in different states
    assert not np.array_equal(o1[0][0], o1[0][1])
