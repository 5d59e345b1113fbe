"""Resample golden tests — nearest, bilinear, average (reference
testresample style: independent whole-image numpy recomputation of the
same semantics; exact equality for nearest, last-ulp tolerance for the
interpolating methods whose distributed partials sum in a different
order)."""

import numpy as np
import pytest
import ray.data

from rios_ray import synth
from rios_ray.gridmodel import PixelGrid
from rios_ray.resample import resample_grid, resample_nearest
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


def _run(arr2d: np.ndarray, outg: PixelGrid, block: int = 256,
         method: str = "near") -> np.ndarray:
    t = raster_to_tile_table(arr2d.astype(np.float64), block=64)
    ds = ray.data.from_arrow(t)
    res = resample_grid(ds, IN_GRID, outg, method=method, block=block).to_pandas()
    onr, onc = outg.dimensions()
    out = np.zeros((onr, onc), dtype=np.float64)
    for _, row in res.iterrows():
        d = np.asarray(row["data"], dtype=np.float64).reshape(row["nrows"], row["ncols"])
        out[row["top"]: row["top"] + row["nrows"], row["left"]: row["left"] + row["ncols"]] = d
    return out


def _golden_bilinear(arr: np.ndarray, ing: PixelGrid, outg: PixelGrid) -> np.ndarray:
    """Whole-image bilinear: edge-clamped 2x2 interpolation at mapped
    output centers, fill 0 outside the input extent."""
    onr, onc = outg.dimensions()
    y = outg.y_max - (np.arange(onr) + 0.5) * outg.y_res
    x = outg.x_min + (np.arange(onc) + 0.5) * outg.x_res
    rext = (y <= ing.y_max) & (y >= ing.y_min)
    cext = (x >= ing.x_min) & (x <= ing.x_max)
    fr = np.clip((ing.y_max - y) / ing.y_res - 0.5, 0.0, arr.shape[0] - 1.0)
    fc = np.clip((x - ing.x_min) / ing.x_res - 0.5, 0.0, arr.shape[1] - 1.0)
    r0 = np.clip(np.floor(fr).astype(np.int64), 0, arr.shape[0] - 2)
    c0 = np.clip(np.floor(fc).astype(np.int64), 0, arr.shape[1] - 2)
    wr, wc = fr - r0, fc - c0
    v = (
        (1 - wr)[:, None] * (1 - wc)[None, :] * arr[r0[:, None], c0[None, :]]
        + (1 - wr)[:, None] * wc[None, :] * arr[r0[:, None], c0[None, :] + 1]
        + wr[:, None] * (1 - wc)[None, :] * arr[r0[:, None] + 1, c0[None, :]]
        + wr[:, None] * wc[None, :] * arr[r0[:, None] + 1, c0[None, :] + 1]
    )
    out = np.zeros((onr, onc), dtype=np.float64)
    out[np.ix_(rext, cext)] = v[np.ix_(rext, cext)]
    return out


def _golden_average(arr: np.ndarray, ing: PixelGrid, outg: PixelGrid) -> np.ndarray:
    """Whole-image average: mean of source pixels whose centers fall in
    the output pixel footprint (half-open); nearest containing-cell
    value when none covered (GDAL average degenerates to nearest on
    upsample); 0 only outside the input extent (plain per-pixel loop —
    intentionally naive and independent of the tiled kernel)."""
    onr, onc = outg.dimensions()
    k, j = np.arange(onr), np.arange(onc)
    y_top = outg.y_max - k * outg.y_res
    y_bot = y_top - outg.y_res
    x_l = outg.x_min + j * outg.x_res
    x_r = x_l + outg.x_res
    gr_lo = np.clip(np.ceil((ing.y_max - y_top) / ing.y_res - 0.5), 0, arr.shape[0]).astype(int)
    gr_hi = np.clip(np.ceil((ing.y_max - y_bot) / ing.y_res - 0.5), 0, arr.shape[0]).astype(int)
    gc_lo = np.clip(np.ceil((x_l - ing.x_min) / ing.x_res - 0.5), 0, arr.shape[1]).astype(int)
    gc_hi = np.clip(np.ceil((x_r - ing.x_min) / ing.x_res - 0.5), 0, arr.shape[1]).astype(int)
    fb_r = np.floor((ing.y_max - (y_top - 0.5 * outg.y_res)) / ing.y_res).astype(int)
    fb_c = np.floor(((x_l + 0.5 * outg.x_res) - ing.x_min) / ing.x_res).astype(int)
    out = np.zeros((onr, onc), dtype=np.float64)
    for a in range(onr):
        for b in range(onc):
            sub = arr[gr_lo[a]: gr_hi[a], gc_lo[b]: gc_hi[b]]
            if sub.size:
                out[a, b] = sub.mean()
            elif (0 <= fb_r[a] < arr.shape[0]) and (0 <= fb_c[b] < arr.shape[1]):
                out[a, b] = arr[fb_r[a], fb_c[b]]
    return out


def _noise(shape=(500, 500)) -> np.ndarray:
    """Seeded non-smooth field — a pure ramp would hide neighbor/weight
    mix-ups (bilinear reproduces any affine surface exactly)."""
    rng = np.random.default_rng(12345)
    return rng.uniform(-100.0, 100.0, size=shape)


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


BILIN_AVG_GRIDS = [
    # downsample 10m -> 25m, offset origin, extent inside input
    PixelGrid(500035.0, 504535.0, 6995515.0, 6999765.0, 25.0, 25.0, "EPSG:28355"),
    # upsample 10m -> 4m over a sub-window (stencils cross 64-px tiles)
    PixelGrid(501000.0, 502000.0, 6997000.0, 6998000.0, 4.0, 4.0, "EPSG:28355"),
    # extent partially OUTSIDE the input (fill-0 + edge-clamp ring)
    PixelGrid(499000.0, 506000.0, 6994000.0, 7001000.0, 35.0, 35.0, "EPSG:28355"),
]


@pytest.mark.parametrize("outg", BILIN_AVG_GRIDS)
def test_bilinear_matches_numpy_golden(ray_session, outg):
    arr = _noise()
    got = _run(arr, outg, method="bilinear", block=100)
    want = _golden_bilinear(arr, IN_GRID, outg)
    # partials for one pixel sum in a different order than the oracle
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-9)


def test_bilinear_identity_grid(ray_session):
    """Output centers coincide with source centers -> weights are 0/1
    and bilinear reproduces the input to the ulp."""
    arr = _noise((300, 300))
    g = PixelGrid(500000.0, 503000.0, 6997000.0, 7000000.0, 10.0, 10.0, "EPSG:28355")
    t = raster_to_tile_table(arr, block=64)
    res = resample_grid(ray.data.from_arrow(t), g, g, method="bilinear").to_pandas()
    out = np.zeros((300, 300))
    for _, row in res.iterrows():
        d = np.asarray(row["data"]).reshape(row["nrows"], row["ncols"])
        out[row["top"]: row["top"] + row["nrows"], row["left"]: row["left"] + row["ncols"]] = d
    np.testing.assert_allclose(out, arr, rtol=1e-12, atol=1e-9)


@pytest.mark.parametrize("outg", BILIN_AVG_GRIDS)
def test_average_matches_numpy_golden(ray_session, outg):
    arr = _noise()
    got = _run(arr, outg, method="average", block=100)
    want = _golden_average(arr, IN_GRID, outg)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-9)


def test_average_integer_factor_is_block_mean(ray_session):
    """2x downsample aligned with the grid = exact 2x2 block means."""
    arr = _noise((200, 200))
    outg = PixelGrid(500000.0, 502000.0, 6998000.0, 7000000.0, 20.0, 20.0, "EPSG:28355")
    ing = PixelGrid(500000.0, 502000.0, 6998000.0, 7000000.0, 10.0, 10.0, "EPSG:28355")
    t = raster_to_tile_table(arr, block=64)
    res = resample_grid(ray.data.from_arrow(t), ing, outg, method="average").to_pandas()
    out = np.zeros((100, 100))
    for _, row in res.iterrows():
        d = np.asarray(row["data"]).reshape(row["nrows"], row["ncols"])
        out[row["top"]: row["top"] + row["nrows"], row["left"]: row["left"] + row["ncols"]] = d
    want = arr.reshape(100, 2, 100, 2).mean(axis=(1, 3))
    np.testing.assert_allclose(out, want, rtol=1e-12, atol=1e-9)


def test_average_upsample_degenerates_to_nearest(ray_session):
    """2x upsample: no output footprint covers a source center, so every
    pixel takes its containing-cell value — average == nearest (the
    GDAL-average degeneration, not fill 0)."""
    arr = _noise((100, 100))
    ing = PixelGrid(500000.0, 502000.0, 6998000.0, 7000000.0, 20.0, 20.0, "EPSG:28355")
    outg = PixelGrid(500000.0, 502000.0, 6998000.0, 7000000.0, 10.0, 10.0, "EPSG:28355")
    t = raster_to_tile_table(arr, block=64)
    res = resample_grid(ray.data.from_arrow(t), ing, outg, method="average").to_pandas()
    out = np.zeros((200, 200))
    for _, row in res.iterrows():
        d = np.asarray(row["data"]).reshape(row["nrows"], row["ncols"])
        out[row["top"]: row["top"] + row["nrows"], row["left"]: row["left"] + row["ncols"]] = d
    want = np.repeat(np.repeat(arr, 2, axis=0), 2, axis=1)
    np.testing.assert_allclose(out, want, rtol=1e-12, atol=1e-9)


def test_unknown_method_rejected(ray_session):
    from rios_ray.applier import ApplierControls

    with pytest.raises(ValueError, match="cubic"):
        ApplierControls().setResampleMethod("cubic")
    with pytest.raises(ValueError, match="cubic"):
        resample_grid(None, IN_GRID, IN_GRID, method="cubic")
