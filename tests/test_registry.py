"""Env-id grammar tests (reference naming scheme, rware/__init__.py:22-175)."""
import pytest

import rware_tpu
from rware_tpu import ObservationType, RewardType
from rware_tpu.registry import parse_env_id


def test_sizes():
    assert parse_env_id("rware-tiny-2ag-v2").shelf_rows == 1
    assert parse_env_id("rware-tiny-2ag-v2").shelf_columns == 3
    assert parse_env_id("rware-small-2ag-v2").shelf_rows == 2
    assert parse_env_id("rware-medium-2ag-v2").shelf_columns == 5
    assert parse_env_id("rware-large-2ag-v2").shelf_rows == 3


def test_difficulty_scales_queue():
    assert parse_env_id("rware-tiny-4ag-v2").request_queue_size == 4
    assert parse_env_id("rware-tiny-4ag-easy-v2").request_queue_size == 8
    assert parse_env_id("rware-tiny-4ag-hard-v2").request_queue_size == 2


def test_observation_variants():
    assert (
        parse_env_id("rware-tiny-2ag-v2").observation_type
        == ObservationType.FLATTENED
    )
    assert (
        parse_env_id("rware-img-tiny-2ag-v2").observation_type
        == ObservationType.IMAGE
    )
    assert (
        parse_env_id("rware-imgdict-tiny-2ag-v2").observation_type
        == ObservationType.IMAGE_DICT
    )
    assert parse_env_id("rware-img-Nd-tiny-2ag-v2").image_observation_directional is False


def test_sensor_and_height_variants():
    assert parse_env_id("rware-3s-tiny-2ag-v2").sensor_range == 3
    assert parse_env_id("rware-tiny-10h-2ag-v2").column_height == 10
    assert parse_env_id("rware-2x5-2ag-v2").shelf_rows == 2
    assert parse_env_id("rware-2x5-2ag-v2").shelf_columns == 5


def test_reward_variants():
    assert parse_env_id("rware-tiny-2ag-global-v2").reward_type == RewardType.GLOBAL
    assert (
        parse_env_id("rware-tiny-2ag-twostage-v2").reward_type
        == RewardType.TWO_STAGE
    )
    assert parse_env_id("rware-tiny-2ag-indiv-v2").reward_type == RewardType.INDIVIDUAL


def test_explicit_request_count():
    assert parse_env_id("rware-tiny-2ag-7req-v2").request_queue_size == 7


def test_invalid_ids_raise():
    for bad in ["rware-huge-2ag-v2", "rware-tiny-v2", "rware-tiny-2ag-v1", "foo"]:
        with pytest.raises(ValueError):
            parse_env_id(bad)


def test_make_accepts_config_and_overrides():
    env = rware_tpu.make(
        "rware-tiny-2ag-v2", observation_type=ObservationType.IMAGE
    )
    assert env.config.observation_type == ObservationType.IMAGE
    env2 = rware_tpu.make(env.config)
    assert env2.config == env.config


def test_register_on_import_default():
    """`import rware_tpu` registers the default grid as an import side
    effect, matching the reference (rware/__init__.py:22-39) so its
    README's import -> gym.make flow works unchanged."""
    import os
    import subprocess
    import sys

    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        "import rware_tpu, gymnasium as gym;"
        "e = gym.make('rware-small-3ag-v2'); e.reset(seed=0);"
        "print('ok', e.unwrapped.n_agents)"
    )
    env = {**os.environ}
    env.pop("RWARE_TPU_AUTO_REGISTER", None)
    env.pop("RWARE_TPU_NO_REGISTER", None)
    out = subprocess.run(
        [sys.executable, "-c", code],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "ok 3" in out.stdout


def test_no_register_opt_out():
    """RWARE_TPU_NO_REGISTER=1 suppresses the import side effect (for
    coexistence with the reference package or registry hygiene)."""
    import os
    import subprocess
    import sys

    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        "import rware_tpu, gymnasium as gym;"
        "assert 'rware-small-3ag-v2' not in gym.registry;"
        "print('clean')"
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        env={**os.environ, "RWARE_TPU_NO_REGISTER": "1"},
        capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "clean" in out.stdout
