"""Nearest-neighbour resample golden tests (reference testresample
style: independent numpy recomputation, exact equality — nearest has
no interpolation so no tolerance is needed)."""

import numpy as np
import pytest
import ray.data

from rios_ray import synth
from rios_ray.gridmodel import PixelGrid
from rios_ray.resample import resample_nearest
from rios_ray.synth import raster_to_tile_table

IN_GRID = PixelGrid(500000.0, 505000.0, 6995000.0, 7000000.0, 10.0, 10.0, "EPSG:28355")


def _golden(arr: np.ndarray, ing: PixelGrid, outg: PixelGrid) -> np.ndarray:
    """Direct whole-image nearest resample (containing cell of the
    output pixel center), fill 0 outside the input extent."""
    onr, onc = outg.dimensions()
    r = np.arange(onr)
    c = np.arange(onc)
    y = outg.y_max - (r + 0.5) * outg.y_res
    x = outg.x_min + (c + 0.5) * outg.x_res
    sr = np.floor((ing.y_max - y) / ing.y_res).astype(np.int64)
    sc = np.floor((x - ing.x_min) / ing.x_res).astype(np.int64)
    out = np.zeros((onr, onc), dtype=np.float64)
    rm = (sr >= 0) & (sr < arr.shape[0])
    cm = (sc >= 0) & (sc < arr.shape[1])
    out[np.ix_(rm, cm)] = arr[sr[rm][:, None], sc[cm][None, :]]
    return out


def _run(arr2d: np.ndarray, outg: PixelGrid, block: int = 256) -> np.ndarray:
    t = raster_to_tile_table(arr2d.astype(np.float64), block=64)
    ds = ray.data.from_arrow(t)
    res = resample_nearest(ds, IN_GRID, outg, block=block).to_pandas()
    onr, onc = outg.dimensions()
    out = np.zeros((onr, onc), dtype=np.float64)
    for _, row in res.iterrows():
        d = np.asarray(row["data"], dtype=np.float64).reshape(row["nrows"], row["ncols"])
        out[row["top"]: row["top"] + row["nrows"], row["left"]: row["left"] + row["ncols"]] = d
    return out


@pytest.mark.parametrize(
    "outg",
    [
        # downsample 10m -> 25m, offset origin, extent inside input
        PixelGrid(500035.0, 504535.0, 6995515.0, 6999765.0, 25.0, 25.0, "EPSG:28355"),
        # upsample 10m -> 4m over a sub-window
        PixelGrid(501000.0, 502000.0, 6997000.0, 6998000.0, 4.0, 4.0, "EPSG:28355"),
        # extent partially OUTSIDE the input (fill-0 region exercised)
        PixelGrid(499000.0, 506000.0, 6994000.0, 7001000.0, 50.0, 50.0, "EPSG:28355"),
    ],
)
def test_resample_matches_numpy_golden(ray_session, outg):
    ramp = synth.gen_ramp_array().astype(np.float64)
    got = _run(ramp, outg)
    want = _golden(ramp, IN_GRID, outg)
    assert np.array_equal(got, want)  # exact: nearest, no interpolation


def test_resample_identity_grid(ray_session):
    """Resampling onto the identical grid reproduces the input exactly."""
    ramp = synth.gen_ramp_array().astype(np.float64)
    got = _run(ramp, IN_GRID)
    assert np.array_equal(got, ramp)
