"""Grid algebra goldens, recomputed independently (reference test style:
generate independently, recompute with plain numpy/decimal, compare
exactly — riostestutils.py:3-10)."""

import decimal

import numpy as np
import pytest

from rios_ray import gridmodel as gm


def _round_away_oracle(x: float) -> float:
    dec = decimal.Decimal(x).quantize(decimal.Decimal("1"), rounding=decimal.ROUND_HALF_UP)
    return float(dec.to_integral_value())


def test_round_away_scalar_specials():
    for v, want in [(2.5, 3.0), (-2.5, -3.0), (0.5, 1.0), (-0.5, -1.0), (2.4, 2.0), (0.0, 0.0)]:
        assert gm.round_away(v) == want


def test_round_away_vec_matches_scalar_on_random_floats():
    rng = np.random.default_rng(0)
    x = np.concatenate(
        [
            rng.uniform(-1e6, 1e6, 5000),
            rng.integers(-100, 100, 500).astype(float) + 0.5,
            np.array([2.4999999999999996, -2.4999999999999996, 1e-12, -1e-12]),
        ]
    )
    vec = gm.round_away_vec(x)
    sca = np.array([_round_away_oracle(v) for v in x])
    np.testing.assert_array_equal(vec, sca)


def test_snap_and_numpix():
    # 500x500 grid, pixel 10, origin per the reference canonical fixture
    assert gm.get_num_pix(7000000.0, 6995000.0, 10.0) == 500
    assert gm.snap_to_grid(500003.0, 500000.0, 10.0) == 500000.0
    assert gm.snap_to_grid(500006.0, 500000.0, 10.0) == 500010.0
    assert gm.snap_to_grid(499995.0, 500000.0, 10.0) == 499990.0  # half away from zero


def _canonical_grid(shift_px=0):
    d = shift_px * 10.0
    return gm.PixelGrid(
        500000.0 + d, 505000.0 + d, 6995000.0 - d, 7000000.0 - d, 10.0, 10.0, "EPSG:28355"
    )


def test_block_list_500x500():
    g = _canonical_grid()
    blocks = gm.make_block_list(g, 256, 256)
    assert len(blocks) == 4
    assert blocks[0] == gm.BlockDefn(0, 0, 256, 256)
    assert blocks[-1] == gm.BlockDefn(256, 256, 244, 244)  # ragged edge
    # disjoint cover
    cover = np.zeros((500, 500), dtype=np.int32)
    for b in blocks:
        cover[b.top : b.top + b.nrows, b.left : b.left + b.ncols] += 1
    assert (cover == 1).all()
    # deterministic total order
    assert blocks == sorted(blocks)


def test_footprint_intersection_union_reference():
    """Extent arithmetic golden, independent min/max recompute
    (reference testfootprint.py:100-134 analogue, 100 px shift)."""
    g1, g2 = _canonical_grid(0), _canonical_grid(100)
    inter = gm.find_common_region([g1, g2], g1, gm.INTERSECTION)
    assert (inter.x_min, inter.x_max) == (max(g1.x_min, g2.x_min), min(g1.x_max, g2.x_max))
    assert (inter.y_min, inter.y_max) == (max(g1.y_min, g2.y_min), min(g1.y_max, g2.y_max))
    assert inter.dimensions() == (400, 400)
    uni = gm.find_common_region([g1, g2], g1, gm.UNION)
    assert (uni.x_min, uni.x_max) == (min(g1.x_min, g2.x_min), max(g1.x_max, g2.x_max))
    assert uni.dimensions() == (600, 600)
    ref = gm.find_common_region([g1, g2], g2, gm.BOUNDS_FROM_REFERENCE)
    assert ref == g2


def test_non_intersecting_raises():
    g1 = _canonical_grid(0)
    g3 = gm.PixelGrid(600000.0, 605000.0, 6995000.0, 7000000.0, 10.0, 10.0, "EPSG:28355")
    with pytest.raises(gm.GridError):
        g1.intersection(g3)


def test_remove_surrounding():
    inner1 = _canonical_grid(0)
    inner2 = _canonical_grid(10)
    outer = gm.PixelGrid(400000.0, 700000.0, 6900000.0, 7100000.0, 10.0, 10.0, "EPSG:28355")
    kept = gm.remove_surrounding([outer, inner1, inner2])
    assert kept == [inner1, inner2]
    # INTERSECTION ignores the outer grid entirely
    inter = gm.find_common_region([outer, inner1, inner2], inner1, gm.INTERSECTION)
    assert inter.dimensions() == (490, 490)
    # keep at least one
    assert gm.remove_surrounding([outer]) == [outer]


def test_alignment_and_snap():
    g1 = _canonical_grid()
    shifted = gm.PixelGrid(500003.0, 505003.0, 6995000.0, 7000000.0, 10.0, 10.0, "EPSG:28355")
    assert not g1.aligned_with(shifted)
    snapped = shifted.snap_to(g1)
    assert g1.aligned_with(snapped)
    assert snapped.x_min == 500000.0
    # tolerance formula 0.001 * res / npix
    assert g1.alignment_tolerance(shifted) == pytest.approx(0.001 * 10.0 / 500)


def test_world_pixel_roundtrip_and_block_assignment():
    g = _canonical_grid()
    x = np.array([500005.0, 502565.0, 504999.0])
    y = np.array([6999995.0, 6997435.0, 6995001.0])
    row, col = g.world_to_pixel(x, y)
    np.testing.assert_allclose(np.floor(row), [0, 256, 499])
    np.testing.assert_allclose(np.floor(col), [0, 256, 499])
    ty, tx = gm.block_ids_for_points(g, x, y)
    np.testing.assert_array_equal(ty, [0, 1, 1])
    np.testing.assert_array_equal(tx, [0, 1, 1])
    # outside point -> -1
    ty, tx = gm.block_ids_for_points(g, np.array([0.0]), np.array([0.0]))
    assert ty[0] == -1 and tx[0] == -1
