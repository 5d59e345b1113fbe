"""CRS reprojection tests (reference testreproj semantics: planning
math checked exactly, warped pixels vs an independent whole-image
numpy recomputation — nearest, so exact equality)."""

import numpy as np
import pytest
import ray.data

from rios_ray import reproject as RP
from rios_ray import synth
from rios_ray.gridmodel import PixelGrid
from rios_ray.synth import raster_to_tile_table

# a 500x500 x 0.01-degree geographic grid (mid-latitudes, so Mercator
# y-distortion is visible but finite)
GEO_GRID = PixelGrid(10.0, 15.0, 45.0, 50.0, 0.01, 0.01, "EPSG:4326")


def test_round_trip_transforms():
    lon = np.linspace(-179.0, 179.0, 1001)
    lat = np.linspace(-85.0, 85.0, 1001)
    xf, yf = RP.get_transform("EPSG:4326", "EPSG:3857")
    xi, yi = RP.get_transform("EPSG:3857", "EPSG:4326")
    np.testing.assert_allclose(xi(xf(lon)), lon, atol=1e-9)
    np.testing.assert_allclose(yi(yf(lat)), lat, atol=1e-9)
    # known anchor: lon 180 -> pi*R
    assert abs(float(xf(np.array([180.0]))[0]) - np.pi * 6378137.0) < 1e-6


def test_identity_transform_same_crs():
    xf, yf = RP.get_transform("EPSG:28355", "EPSG:28355")
    v = np.array([1.5, 2.5])
    assert np.array_equal(xf(v), v) and np.array_equal(yf(v), v)
    with pytest.raises(ValueError):
        RP.get_transform("EPSG:28355", "EPSG:3857")


def test_reproj_resolution_matches_direct():
    rx, ry = RP.reproj_resolution(GEO_GRID, "EPSG:3857")
    # x: uniform scaling of longitude degrees
    assert abs(rx - (np.pi * 6378137.0 / 180.0) * 0.01) < 1e-6
    # y: Mercator stretches by ~1/cos(lat) at the grid centre
    assert ry > rx * 1.3 and ry < rx * 1.6


def test_reproject_grid_planning():
    g = RP.reproject_grid(GEO_GRID, "EPSG:3857")
    xf, yf = RP.get_transform("EPSG:4326", "EPSG:3857")
    assert g.projection == "EPSG:3857"
    assert abs(g.x_min - float(xf(np.array([10.0]))[0])) < 1e-6
    assert abs(g.y_max - float(yf(np.array([50.0]))[0])) < 1e-6
    # extent covers the transformed corners (ceil'd to whole pixels)
    assert g.x_max >= float(xf(np.array([15.0]))[0]) - 1e-6
    assert g.y_min <= float(yf(np.array([45.0]))[0]) + 1e-6


def _golden_warp(arr, ing, outg):
    """Whole-image warped nearest resample, independent of the tiled
    kernel: transform every output centre, take the containing source
    cell, fill 0 outside."""
    xf, yf = RP.get_transform(outg.projection, ing.projection)
    onr, onc = outg.dimensions()
    y = yf(outg.y_max - (np.arange(onr) + 0.5) * outg.y_res)
    x = xf(outg.x_min + (np.arange(onc) + 0.5) * outg.x_res)
    sr = np.floor((ing.y_max - y) / ing.y_res).astype(np.int64)
    sc = np.floor((x - ing.x_min) / ing.x_res).astype(np.int64)
    out = np.zeros((onr, onc), dtype=np.float64)
    rm = (sr >= 0) & (sr < arr.shape[0])
    cm = (sc >= 0) & (sc < arr.shape[1])
    out[np.ix_(rm, cm)] = arr[sr[rm][:, None], sc[cm][None, :]]
    return out


def test_reproject_nearest_matches_golden(ray_session):
    ramp = synth.gen_ramp_array().astype(np.float64)
    outg = RP.reproject_grid(GEO_GRID, "EPSG:3857")
    t = raster_to_tile_table(ramp, block=64)
    ds = ray.data.from_arrow(t)
    res = RP.reproject_nearest(ds, GEO_GRID, outg, block=128).to_pandas()
    onr, onc = outg.dimensions()
    got = np.zeros((onr, onc), dtype=np.float64)
    for _, row in res.iterrows():
        d = np.asarray(row["data"], dtype=np.float64).reshape(row["nrows"], row["ncols"])
        got[row["top"]: row["top"] + row["nrows"],
            row["left"]: row["left"] + row["ncols"]] = d
    want = _golden_warp(ramp, GEO_GRID, outg)
    assert np.array_equal(got, want)
    # sanity: the warp is non-trivial (some rows shifted vs unwarped)
    assert (got != 0).any()


def test_applier_cross_crs_input(ray_session, tmp_path):
    """E2E: a 4326 input into a 3857 working grid via
    setResampleMethod('near') — the testreproj analogue."""
    from rios_ray.applier import ApplierControls, ResampleNeededError, apply
    from rios_ray.sources.tileraster import TileRasterInfo, write_tile_raster

    ramp = synth.gen_ramp_array().astype(np.float64)
    src = write_tile_raster(
        str(tmp_path / "geo.parquet"), raster_to_tile_table(ramp), GEO_GRID, 1, np.float64
    )
    wg = RP.reproject_grid(GEO_GRID, "EPSG:3857")

    def copy_fn(info, inputs, outputs):
        outputs.out = inputs.img

    controls = ApplierControls()
    controls.setReferencePixgrid(wg)
    controls.setCalcStats(False)

    # without resampling enabled the cross-CRS input must raise
    with pytest.raises(ResampleNeededError):
        apply(copy_fn, {"img": src}, {"out": str(tmp_path / "no.parquet")},
              controls=controls, out_dir=str(tmp_path))

    controls.setResampleMethod("near")
    out_path = str(tmp_path / "warped.parquet")
    apply(copy_fn, {"img": src}, {"out": out_path}, controls=controls,
          out_dir=str(tmp_path))

    import pyarrow.parquet as pq
    info = TileRasterInfo.read(out_path)
    onr, onc = wg.dimensions()
    got = synth.tile_table_to_raster(pq.read_table(out_path), 1, onr, onc, np.float64)[0]
    want = _golden_warp(ramp, GEO_GRID, wg)
    assert np.array_equal(got, want)


# ---------------------------------------------------------------------------
# UTM (joint, non-separable transverse Mercator) — proves the registry
# generalizes beyond per-axis transforms (EPSG:32655 = UTM zone 55N)

# 0.01-degree geographic grid inside zone 55 (147°E central meridian)
GEO_GRID_55 = PixelGrid(145.0, 148.0, 36.0, 38.0, 0.01, 0.01, "EPSG:4326")


def test_utm_round_trip():
    rng = np.random.default_rng(99)
    lon = rng.uniform(141.0, 153.0, 2000)
    lat = rng.uniform(0.5, 80.0, 2000)
    fwd = RP.get_xy_transform("EPSG:4326", "EPSG:32655")
    inv = RP.get_xy_transform("EPSG:32655", "EPSG:4326")
    x, y = fwd(lon, lat)
    lon2, lat2 = inv(x, y)
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)
    # anchors: the central meridian maps to the false easting, northing
    # grows with latitude
    x0, y0 = fwd(np.array([147.0]), np.array([10.0]))
    assert abs(float(x0[0]) - 500000.0) < 1e-6
    x1, y1 = fwd(np.array([147.0]), np.array([20.0]))
    assert float(y1[0]) > float(y0[0]) > 0.0
    # easting depends on latitude off the meridian => NOT separable
    xa, _ = fwd(np.array([148.0]), np.array([10.0]))
    xb, _ = fwd(np.array([148.0]), np.array([60.0]))
    assert abs(float(xa[0]) - float(xb[0])) > 1000.0
    assert not RP.transform_is_separable("EPSG:4326", "EPSG:32655")
    with pytest.raises(ValueError, match="not axis-separable"):
        RP.get_transform("EPSG:4326", "EPSG:32655")


def _golden_warp_joint(arr, ing, outg, fill_nearest=False):
    """Whole-image warped resample through the JOINT transform:
    transform the full meshgrid of output centres, take the containing
    source cell (or bilinear weights), fill 0 outside."""
    f = RP.get_xy_transform(outg.projection, ing.projection)
    onr, onc = outg.dimensions()
    y = outg.y_max - (np.arange(onr) + 0.5) * outg.y_res
    x = outg.x_min + (np.arange(onc) + 0.5) * outg.x_res
    X, Y = f(x[None, :].repeat(onr, 0), y[:, None].repeat(onc, 1))
    sr = np.floor((ing.y_max - Y) / ing.y_res).astype(np.int64)
    sc = np.floor((X - ing.x_min) / ing.x_res).astype(np.int64)
    out = np.zeros((onr, onc), dtype=np.float64)
    m = (sr >= 0) & (sr < arr.shape[0]) & (sc >= 0) & (sc < arr.shape[1])
    out[m] = arr[sr[m], sc[m]]
    return out


def _golden_bilinear_joint(arr, ing, outg):
    f = RP.get_xy_transform(outg.projection, ing.projection)
    onr, onc = outg.dimensions()
    y = outg.y_max - (np.arange(onr) + 0.5) * outg.y_res
    x = outg.x_min + (np.arange(onc) + 0.5) * outg.x_res
    X, Y = f(x[None, :].repeat(onr, 0), y[:, None].repeat(onc, 1))
    ext = ((Y <= ing.y_max) & (Y >= ing.y_min)
           & (X >= ing.x_min) & (X <= ing.x_max))
    fr = np.clip((ing.y_max - Y) / ing.y_res - 0.5, 0.0, arr.shape[0] - 1.0)
    fc = np.clip((X - ing.x_min) / ing.x_res - 0.5, 0.0, arr.shape[1] - 1.0)
    r0 = np.clip(np.floor(fr).astype(np.int64), 0, arr.shape[0] - 2)
    c0 = np.clip(np.floor(fc).astype(np.int64), 0, arr.shape[1] - 2)
    wr, wc = fr - r0, fc - c0
    v = ((1 - wr) * (1 - wc) * arr[r0, c0]
         + (1 - wr) * wc * arr[r0, c0 + 1]
         + wr * (1 - wc) * arr[r0 + 1, c0]
         + wr * wc * arr[r0 + 1, c0 + 1])
    out = np.zeros((onr, onc), dtype=np.float64)
    out[ext] = v[ext]
    return out


def _run_joint(arr, ing, outg, method):
    t = raster_to_tile_table(arr, block=64)
    ds = ray.data.from_arrow(t)
    res = RP.reproject_raster(ds, ing, outg, method=method, block=128).to_pandas()
    onr, onc = outg.dimensions()
    got = np.zeros((onr, onc), dtype=np.float64)
    for _, row in res.iterrows():
        d = np.asarray(row["data"], dtype=np.float64).reshape(row["nrows"], row["ncols"])
        got[row["top"]: row["top"] + row["nrows"],
            row["left"]: row["left"] + row["ncols"]] = d
    return got


def test_reproject_utm_nearest_matches_golden(ray_session):
    outg = RP.reproject_grid(GEO_GRID_55, "EPSG:32655")
    ramp = synth.gen_ramp_array().astype(np.float64)
    arr = np.resize(ramp, GEO_GRID_55.dimensions()).astype(np.float64)
    got = _run_joint(arr, GEO_GRID_55, outg, "near")
    want = _golden_warp_joint(arr, GEO_GRID_55, outg)
    assert np.array_equal(got, want)
    assert (got != 0).any()


def test_reproject_utm_bilinear_matches_golden(ray_session):
    rng = np.random.default_rng(4242)
    arr = rng.uniform(-50.0, 50.0, GEO_GRID_55.dimensions())
    outg = RP.reproject_grid(GEO_GRID_55, "EPSG:32655")
    got = _run_joint(arr, GEO_GRID_55, outg, "bilinear")
    want = _golden_bilinear_joint(arr, GEO_GRID_55, outg)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-9)


def test_utm_average_rejected(ray_session):
    with pytest.raises(ValueError, match="axis-separable"):
        outg = RP.reproject_grid(GEO_GRID_55, "EPSG:32655")
        RP.reproject_raster(None, GEO_GRID_55, outg, method="average")


def test_applier_cross_crs_utm_input(ray_session, tmp_path):
    """E2E: a 4326 input onto a UTM 55N working grid via
    setResampleMethod('near') — the joint-transform testreproj case."""
    from rios_ray.applier import ApplierControls, apply
    from rios_ray.sources.tileraster import TileRasterInfo, write_tile_raster

    nr, nc = GEO_GRID_55.dimensions()
    rng = np.random.default_rng(77)
    arr = rng.uniform(0.0, 100.0, (nr, nc))
    src = write_tile_raster(
        str(tmp_path / "geo55.parquet"), raster_to_tile_table(arr),
        GEO_GRID_55, 1, np.float64
    )
    wg = RP.reproject_grid(GEO_GRID_55, "EPSG:32655")

    def copy_fn(info, inputs, outputs):
        outputs.out = inputs.img

    controls = ApplierControls()
    controls.setReferencePixgrid(wg)
    controls.setCalcStats(False)
    controls.setResampleMethod("near")
    out_path = str(tmp_path / "utm.parquet")
    apply(copy_fn, {"img": src}, {"out": out_path}, controls=controls,
          out_dir=str(tmp_path))

    import pyarrow.parquet as pq
    TileRasterInfo.read(out_path)
    onr, onc = wg.dimensions()
    got = synth.tile_table_to_raster(pq.read_table(out_path), 1, onr, onc, np.float64)[0]
    want = _golden_warp_joint(arr, GEO_GRID_55, wg)
    assert np.array_equal(got, want)


def test_vector_input_reprojection(ray_session, tmp_path):
    """A polygon layer given in EPSG:3857 burns the same mask as the
    identical layer pre-transformed to the grid's EPSG:4326 (testvector
    reprojected-vector parity, exact for nearest/center rule)."""
    import pyarrow as pa

    from rios_ray.applier import ApplierControls, VectorInput, apply
    from rios_ray.sources.tileraster import write_tile_raster
    from rios_ray.synth import raster_to_tile_table, tile_table_to_raster

    ramp = synth.gen_ramp_array().astype(np.float64)
    src = write_tile_raster(
        str(tmp_path / "geo.parquet"), raster_to_tile_table(ramp), GEO_GRID, 1, np.float64
    )
    # a lon/lat square inside the grid...
    ring_4326 = [[11.0, 46.0], [13.0, 46.0], [13.0, 48.0], [11.0, 48.0], [11.0, 46.0]]
    xf, yf = RP.get_transform("EPSG:4326", "EPSG:3857")
    # ...and the same square expressed in web-mercator metres
    ring_3857 = [
        [float(xf(np.array([x]))[0]), float(yf(np.array([y]))[0])] for x, y in ring_4326
    ]

    def polys(ring):
        return pa.table(
            {
                "poly_id": pa.array([1], type=pa.int64()),
                "ring_xy": pa.array([ring]),
                "category": pa.array(["a"]),
                "burn_value": pa.array([7], type=pa.int32()),
            }
        )

    def copy_mask(info, inputs, outputs):
        outputs.out = inputs.mask

    controls = ApplierControls()
    controls.setReference("img")
    controls.setCalcStats(False)

    outs = {}
    for tag, vi in {
        "native": VectorInput(polys(ring_4326), burn_col="burn_value"),
        "reproj": VectorInput(polys(ring_3857), burn_col="burn_value",
                              projection="EPSG:3857"),
    }.items():
        out = str(tmp_path / f"{tag}.parquet")
        apply(copy_mask, {"img": src, "mask": vi}, {"out": out},
              controls=controls, out_dir=str(tmp_path))
        import pyarrow.parquet as pq
        nr, nc = GEO_GRID.dimensions()
        outs[tag] = tile_table_to_raster(pq.read_table(out), 1, nr, nc, np.int32)[0]

    assert (outs["native"] > 0).any()  # the square actually burns
    np.testing.assert_array_equal(outs["native"], outs["reproj"])
