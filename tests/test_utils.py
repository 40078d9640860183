import numpy as np
import pytest

from flypylib_tpu.utils import (
    block_starts,
    ceil_div,
    crop_center,
    pad_to_multiple,
    round_up,
    to3d,
)


def test_to3d():
    assert to3d(5) == (5, 5, 5)
    assert to3d((1, 2, 3)) == (1, 2, 3)
    assert to3d([4, 5, 6]) == (4, 5, 6)
    with pytest.raises(ValueError):
        to3d((1, 2))


def test_ceil_div_round_up():
    assert ceil_div(10, 3) == 4
    assert ceil_div(9, 3) == 3
    assert round_up(10, 8) == 16
    assert round_up(16, 8) == 16


def test_block_starts_cover_and_fit():
    for total, block in [(100, 32), (32, 32), (10, 32), (100, 33)]:
        starts = block_starts(total, min(block, total))
        b = min(block, total)
        covered = np.zeros(total, dtype=bool)
        for s in starts:
            assert s + b <= total
            covered[s : s + b] = True
        assert covered.all()


def test_pad_crop_roundtrip():
    v = np.arange(5 * 6 * 7, dtype=np.float32).reshape(5, 6, 7)
    padded, orig = pad_to_multiple(v, 4)
    assert padded.shape == (8, 8, 8)
    assert orig == (5, 6, 7)
    c = crop_center(np.pad(v, 2), 2)
    np.testing.assert_array_equal(c, v)
