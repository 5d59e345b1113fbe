"""Synthetic-input contract tests: determinism, schema, the
byte-identical html->text invariant, polygon/edge consistency."""

import numpy as np
import pyarrow as pa

from rios_ray import synth


def test_pages_schema_and_determinism():
    a = synth.gen_pages_table(2000)
    b = synth.gen_pages_table(2000)
    assert a.equals(b)
    assert a.schema.names == ["url", "warc_ts", "html", "text", "lang"]
    assert a.schema.field("url").type == pa.string()
    assert a.schema.field("warc_ts").type == pa.timestamp("us")
    assert a.schema.field("html").type == pa.binary()
    assert a.schema.field("text").type == pa.string()
    assert a.schema.field("lang").type == pa.string()


def test_pages_url_unique_and_ts_rule():
    t = synth.gen_pages_table(3000)
    urls = t["url"].to_pylist()
    assert len(set(urls)) == len(urls)
    ts = t["warc_ts"].to_pylist()
    assert (ts[1] - ts[0]).total_seconds() == 737.0
    assert str(ts[0]) == "2025-01-01 00:00:00"


def test_html_text_invariant():
    t = synth.gen_pages_table(500)
    for s, h in zip(t["text"].to_pylist(), t["html"].to_pylist()):
        assert h == b"<html><body>" + s.encode("utf-8") + b"</body></html>"


def test_geo_token_parseable():
    import re

    t = synth.gen_pages_table(500)
    pat = re.compile(r"geo:(-?\d+\.\d{5}),(-?\d+\.\d{5})")
    for s in t["text"].to_pylist():
        m = pat.search(s)
        assert m, s
        lat, lon = float(m.group(1)), float(m.group(2))
        assert -90 <= lat <= 90 and -180 <= lon <= 180


def test_sf_scaling():
    assert synth.n_pages_for("/root/testdata/sf0.001") == 6000
    assert synth.n_pages_for("/root/testdata/sf0.01") == 60000
    assert synth.n_pages_for("/root/testdata/sf0.1") == 600000


def test_polygons_edges_consistent():
    polys, edges = synth.gen_polygons()
    cats = polys["category"].to_pylist()
    assert "outside" in cats and "world" in cats and "quad" in cats
    # rings closed; edge explosion matches ring segments
    n_edges_expected = 0
    for ring in polys["ring_xy"].to_pylist():
        assert ring[0] == ring[-1]
        n_edges_expected += len(ring) - 1
    assert edges.num_rows == n_edges_expected


def test_raster_tile_roundtrip():
    arr = synth.gen_ramp_array()
    assert arr.shape == (500, 500) and arr.dtype == np.uint8
    assert arr[0, 0] == 0 and arr[499, 499] == 100  # (998)*100/998 == 100 exactly
    t = synth.raster_to_tile_table(arr)
    back = synth.tile_table_to_raster(t, 1, 500, 500, np.uint8)
    np.testing.assert_array_equal(back[0], arr)
    rc = synth.gen_rowcol2_array()
    t2 = synth.raster_to_tile_table(rc)
    back2 = synth.tile_table_to_raster(t2, 2, 500, 500, np.uint16)
    np.testing.assert_array_equal(back2, rc)
