"""Layout compiler tests (reference geometry, rware/warehouse.py:294-350)."""
import numpy as np
import pytest

from rware_tpu.layout import make_layout_from_params, make_layout_from_str


def test_param_layout_tiny():
    lay = make_layout_from_params(shelf_columns=3, shelf_rows=1, column_height=8)
    assert lay.grid_size == (11, 10)
    assert lay.goals.tolist() == [[4, 10], [5, 10]]
    # vertical corridors every 3rd column, full bottom row highway
    assert lay.highways[:, 0].all() and lay.highways[:, 3].all()
    assert lay.highways[-1].all()
    # shelf count = non-highway cells; tiny has 32 shelves (verified vs ref)
    assert lay.n_shelves == int((lay.highways == 0).sum())
    assert lay.n_shelves == 32


def test_param_layout_requires_odd_columns():
    with pytest.raises(ValueError):
        make_layout_from_params(shelf_columns=2, shelf_rows=1, column_height=8)


def test_shelf_slots_row_major():
    lay = make_layout_from_params(3, 1, 8)
    slots = lay.shelf_slots
    # row-major: y non-decreasing, x increasing within a row
    keys = [(int(y), int(x)) for x, y in slots]
    assert keys == sorted(keys)


def test_str_layout_roundtrip():
    lay = make_layout_from_str(
        """
..g..
.x.x.
.....
"""
    )
    assert lay.grid_size == (3, 5)
    assert lay.goals.tolist() == [[2, 0]]
    assert lay.n_shelves == 2
    assert lay.shelf_slots.tolist() == [[1, 1], [3, 1]]
    assert lay.highways[0, 2] == 1  # goal cells are highway


def test_str_layout_validation():
    with pytest.raises(ValueError):
        make_layout_from_str("..\n...")  # ragged
    with pytest.raises(ValueError):
        make_layout_from_str("..x\n...")  # no goal
    with pytest.raises(ValueError):
        make_layout_from_str("g.?\n...")  # bad char


def test_matches_reference_layouts():
    import sys

    sys.path.insert(0, "/root/reference")
    try:
        from rware.warehouse import RewardType, Warehouse
    except ImportError:
        pytest.skip("reference not available")

    for rows, cols, height in [(1, 3, 8), (2, 3, 8), (2, 5, 8), (3, 5, 2)]:
        ref = Warehouse(cols, height, rows, 2, 0, 1, 2, None, 500, RewardType.GLOBAL)
        lay = make_layout_from_params(cols, rows, height)
        assert lay.grid_size == ref.grid_size
        np.testing.assert_array_equal(lay.highways, ref.highways)
        assert sorted(map(tuple, lay.goals.tolist())) == sorted(
            (x, y) for x, y in ref.goals
        )
