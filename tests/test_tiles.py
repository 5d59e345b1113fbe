"""Pyramid decimation goldens (testpyramids.py analogue: strided
``arr[o::lvl, o::lvl]``) and point->raster bridge vs histogram2d."""

import numpy as np
import pyarrow as pa
import pytest

from rios_ray import synth, tiles
from rios_ray.gridmodel import PixelGrid


def test_overview_levels_rule():
    assert tiles.overview_levels(500, 500) == []  # 500//4=125 < 128
    assert tiles.overview_levels(2048, 2048) == [4, 8, 16]
    assert tiles.overview_levels(100000, 100000) == [4, 8, 16, 32, 64, 128, 256, 512]


def test_decimate_matches_strided_golden(ray_session):
    import ray.data

    ramp = synth.gen_ramp_array()
    t = synth.raster_to_tile_table(ramp, block=256)
    ds = ray.data.from_arrow(t)
    lvl = 4
    dec = ds.map_batches(
        lambda b: tiles.decimate_tile_batch(b, lvl, np.uint8), batch_format="pyarrow"
    )
    rows = dec.take_all()
    # reassemble the overview raster
    o = lvl // 2
    want = ramp[o::lvl, o::lvl]
    got = np.zeros_like(want)
    for r in rows:
        got[r["top"] : r["top"] + r["nrows"], r["left"] : r["left"] + r["ncols"]] = np.asarray(
            r["data"], dtype=np.uint8
        ).reshape(r["nrows"], r["ncols"])
    np.testing.assert_array_equal(got, want)


def test_points_to_raster_matches_histogram2d(ray_session):
    import ray.data

    rng = np.random.default_rng(3)
    lon = rng.uniform(-10, 10, 20000)
    lat = rng.uniform(-5, 5, 20000)
    grid = PixelGrid(-10.0, 10.0, -5.0, 5.0, 0.1, 0.1)
    nrows, ncols = grid.dimensions()
    ds = ray.data.from_arrow(pa.table({"lon": lon, "lat": lat}))
    out = tiles.points_to_raster(ds, grid, block_ysize=64, block_xsize=64)
    rows = out.take_all()
    got = np.zeros((nrows, ncols))
    for r in rows:
        got[r["top"] : r["top"] + r["nrows"], r["left"] : r["left"] + r["ncols"]] = np.asarray(
            r["data"]
        ).reshape(r["nrows"], r["ncols"])
    # independent oracle: numpy histogram2d on the same binning
    row_idx = np.floor((5.0 - lat) / 0.1).astype(int)
    col_idx = np.floor((lon + 10.0) / 0.1).astype(int)
    ok = (row_idx >= 0) & (row_idx < nrows) & (col_idx >= 0) & (col_idx < ncols)
    want = np.zeros((nrows, ncols))
    np.add.at(want, (row_idx[ok], col_idx[ok]), 1.0)
    np.testing.assert_array_equal(got, want)
    assert got.sum() == ok.sum()
