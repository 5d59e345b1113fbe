"""Color table parity tests (reference rat.py:443-528 generators +
broadcast RGBA lookup)."""

import numpy as np
import pyarrow as pa

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
