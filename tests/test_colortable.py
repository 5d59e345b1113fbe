"""Color table parity tests (reference rat.py:443-528 generators +
broadcast RGBA lookup)."""

import numpy as np
import pyarrow as pa
import pytest

from rios_ray import colortable as C


def test_gray_ramp_matches_reference_semantics():
    ct = C.gen_color_table(256, "gray")
    # reference: numpy.mgrid[0:255:256j] — linear incl. endpoints
    want = np.linspace(0, 255, 256).astype(np.uint8)
    assert np.array_equal(ct[:, 0], want)
    assert np.array_equal(ct[:, 0], ct[:, 1])
    assert np.array_equal(ct[:, 1], ct[:, 2])
    assert (ct[:, 3] == 255).all()


def test_rainbow_ramp_structure():
    ct = C.gen_color_table(256, "rainbow")
    mid = 128
    assert ct[0, 0] == 255 and ct[0, 1] == 0      # starts red
    assert ct[mid, 1] == 255 and ct[mid, 2] == 0  # mid green
    assert ct[-1, 2] == 255 and ct[-1, 1] == 0    # ends blue
    assert (ct[:, 3] == 255).all()


def test_random_deterministic():
    assert np.array_equal(C.gen_color_table(64, "random"), C.gen_color_table(64, "random"))


def test_apply_color_table_lookup():
    ct = C.gen_color_table(16, "gray")
    b = pa.table({"value": pa.array([0, 3, 15, 99])})  # 99 clips to 15
    out = C.apply_color_table(b, ct)
    assert out["red"].to_pylist() == [int(ct[0, 0]), int(ct[3, 0]), int(ct[15, 0]), int(ct[15, 0])]
    assert out["alpha"].to_pylist() == [255] * 4


def test_scale_roundtrip():
    f = np.array([0.0, 0.5, 1.0])
    b = C.scale_color_float_to_byte(f)
    assert b.tolist() == [0, 127, 255]
    back = C.scale_color_byte_to_float(b)
    assert np.allclose(back, [0.0, 127 / 255, 1.0])


# --- color ramps (reference colortable.py colorbrewer set) ---------------


def test_builtin_ramp_names():
    from rios_ray.colorramps import ramp_names

    names = ramp_names()
    # the reference ships 42 ramps + "random" (colortable.py:43-279)
    for expect in ("Blues", "Spectral", "viridis", "Set1", "RdYlGn", "random"):
        assert expect in names
    assert len(names) >= 43


def test_ramp_interpolation_endpoints_and_range():
    from rios_ray.colorramps import gen_ramp_table

    t = gen_ramp_table(256, "viridis")
    assert t.shape == (256, 4) and t.dtype == np.uint8
    # published viridis endpoints
    assert list(t[0]) == [68, 1, 84, 255]
    assert list(t[-1]) == [253, 231, 37, 255]
    # Blues is monotonic dark-blue-ward in the red channel (descending)
    b = gen_ramp_table(64, "Blues").astype(np.int32)
    assert (np.diff(b[:, 0]) <= 0).all()


def test_ramp_via_gen_color_table_dispatch():
    from rios_ray.colortable import gen_color_table

    t = gen_color_table(100, "Spectral")
    assert t.shape == (100, 4)
    with pytest.raises(ValueError):
        gen_color_table(10, "NoSuchRamp")


def test_ramp_ignore_val_transparent():
    from rios_ray.colorramps import gen_ramp_table

    t = gen_ramp_table(16, "Greens", ignore_val=5)
    assert list(t[5]) == [0, 0, 0, 0]
    assert t[4, 3] == 255


def test_ramp_color_points_and_user_ramp():
    from rios_ray.colorramps import ColorRampError, add_ramp, gen_ramp_table

    add_ramp("test2col", "0 255", "0 0", "255 0")
    t = gen_ramp_table(11, "test2col")
    assert list(t[0][:3]) == [0, 0, 255]
    assert list(t[-1][:3]) == [255, 0, 0]
    # pinned control points: the whole ramp is traversed by entry 5
    t2 = gen_ramp_table(11, "test2col", color_points=[0, 5])
    assert list(t2[5][:3]) == [255, 0, 0] and list(t2[10][:3]) == [255, 0, 0]
    with pytest.raises(ColorRampError):
        add_ramp("test2col", "0", "0", "0")  # duplicate
    with pytest.raises(ColorRampError):
        add_ramp("badlen", "0 1", "0", "0")  # unequal channel lengths
    with pytest.raises(ColorRampError):
        gen_ramp_table(8, "test2col", color_points=[0, 4, 8])  # count mismatch
