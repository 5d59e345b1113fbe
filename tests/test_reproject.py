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
