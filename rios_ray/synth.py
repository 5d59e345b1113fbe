"""Deterministic, seeded synthetic inputs (no network, no external data).

Generates the canonical pages table required by ``BASELINE.json:
input_hint`` — ``(url: string, warc_ts: timestamp[us], html: binary,
text: string, lang: string)`` — plus the polygon layer for the spatial
join and the RIOS-style raster-grid fixtures, all per the generation
rules in ``/root/repo/FIXTURES.md``.

Everything is a pure function of (row count, seed=42): the engine run
and the DuckDB/numpy oracles read the *same parquet files*, mirroring
the reference's test philosophy of independently-generated inputs with
independently-recomputed goldens
(``/root/reference/rios/riostests/riostestutils.py:3-10``).

Files are written atomically (tmp file + rename) and generation is
idempotent: if the target exists it is reused.
"""

from __future__ import annotations

import os
import re

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
ROWS_PER_SF = 6_000_000  # sf0.001 -> 6k rows (mirrors TESTDATA.md scales)
LANGS = ["en", "de", "fr", "es", "pt", "zh", "ru", "ja", "it", "nl"]
_VOCAB = (
    "the quick brown fox jumps over lazy dog data pipeline tile spatial "
    "join stream block margin raster vector page crawl web index cell "
    "grid shuffle arrow batch actor worker lineage metric resume"
).split()

PAGES_ROOT = "/tmp/graft_synth"


def sf_from_dir(sf_dir: str) -> float:
    """Parse scale factor from a testdata-style dir name (…/sf0.01)."""
    m = re.search(r"sf([0-9.]+)", os.path.basename(os.path.normpath(sf_dir)))
    if not m:
        raise ValueError(f"cannot parse scale factor from {sf_dir!r}")
    return float(m.group(1))


def n_pages_for(sf_dir: str) -> int:
    return max(1, int(round(ROWS_PER_SF * sf_from_dir(sf_dir))))


def _atomic_write(table: pa.Table, path: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + f".tmp.{os.getpid()}"
    pq.write_table(table, tmp)
    os.replace(tmp, path)


# ---------------------------------------------------------------------------
# pages table
# ---------------------------------------------------------------------------


def gen_latlon(n: int, rng: np.random.Generator) -> tuple[np.ndarray, np.ndarray]:
    """Mixture: 50% uniform background + 50% in 20 city-like hot clusters.

    The clusters exercise skew/salting (hot H3 cells) per the BASELINE
    north rule.  Cluster 0 is deliberately much hotter than the rest
    (zipf-ish weights).
    """
    centers_lon = rng.uniform(-170.0, 170.0, size=20)
    centers_lat = rng.uniform(-55.0, 70.0, size=20)
    weights = 1.0 / np.arange(1, 21) ** 1.5
    weights /= weights.sum()
    in_cluster = rng.random(n) < 0.5
    which = rng.choice(20, size=n, p=weights)
    lon_c = centers_lon[which] + rng.normal(0.0, 0.5, size=n)
    lat_c = centers_lat[which] + rng.normal(0.0, 0.5, size=n)
    lon_u = rng.uniform(-180.0, 180.0, size=n)
    lat_u = rng.uniform(-60.0, 75.0, size=n)
    lon = np.where(in_cluster, lon_c, lon_u)
    lat = np.where(in_cluster, lat_c, lat_u)
    # keep strictly inside the valid ranges
    lon = np.clip(lon, -179.99999, 179.99999)
    lat = np.clip(lat, -89.99999, 89.99999)
    return lon, lat


GEN_CHUNK = 1_000_000  # rows per generation block: keeps every string
# array far below Arrow's 2 GiB 32-bit-offset capacity (the html column
# alone crosses it near ~10M rows in one array)


def gen_pages_table(n: int, seed: int = SEED) -> pa.Table:
    """The pages table per FIXTURES.md §1 / input_hint, fully vectorized.

    Deterministic at every size.  Beyond GEN_CHUNK rows the table is
    produced in independent seeded blocks (rng seeded by
    ``[seed, start]``) and concatenated as chunked arrays; the first
    block keeps the original ``default_rng(seed)`` stream, so tables of
    <= GEN_CHUNK rows are bit-identical to the unchunked generator.
    """
    if n <= GEN_CHUNK:
        return _gen_pages_block(0, n, seed)
    return pa.concat_tables(
        _gen_pages_block(s, min(s + GEN_CHUNK, n), seed)
        for s in range(0, n, GEN_CHUNK)
    )


def _gen_pages_block(start: int, stop: int, seed: int = SEED) -> pa.Table:
    n = stop - start
    rng = np.random.default_rng(seed if start == 0 else [seed, start])
    i = np.arange(start, stop, dtype=np.int64)

    # lang: seeded zipf over the categorical set
    zw = 1.0 / np.arange(1, len(LANGS) + 1) ** 1.3
    zw /= zw.sum()
    lang_idx = rng.choice(len(LANGS), size=n, p=zw)

    lon, lat = gen_latlon(n, rng)

    # Arrow-vectorized string assembly (byte-identical to the original
    # np.char/object-concat implementation, verified table.equals; ~10x
    # faster, which matters when regenerating the sf0.5 scaling fixture)
    import pyarrow.compute as pc

    j = pc.binary_join_element_wise
    lang_arr = pc.cast(pc.take(pa.array(LANGS), pa.array(lang_idx)), pa.string())
    url = j(
        "https://", lang_arr, ".example-", pa.array((i % 1009).astype(str)),
        ".org/p/", pa.array(i.astype(str)), "",
    )

    # warc_ts: 2025-01-01T00:00:00 + i*737 s, microsecond precision
    base = np.datetime64("2025-01-01T00:00:00", "us")
    warc_ts = base + (i * 737 * 1_000_000).astype("timedelta64[us]")

    # text: 8 seeded tokens + the geo signal token + 8 more tokens.
    # geo token format "geo:{lat:.5f},{lon:.5f}" (FIXTURES.md §1) —
    # np.char.mod uses C printf %.5f, identical to Python's format.
    word_idx = rng.integers(0, len(_VOCAB), size=(n, 16))
    vocab = pa.array(_VOCAB)
    cols = [pc.cast(pc.take(vocab, pa.array(word_idx[:, k])), pa.string()) for k in range(16)]
    geo = pa.array(
        np.char.add(
            np.char.add(np.char.add("geo:", np.char.mod("%.5f", lat)), ","),
            np.char.mod("%.5f", lon),
        )
    )
    text = j(*cols[:8], geo, *cols[8:], " ")
    html = j("<html><body>", text, "</body></html>", "")

    return pa.table(
        {
            "url": url,
            "warc_ts": pa.array(warc_ts, type=pa.timestamp("us")),
            "html": html.cast(pa.binary()),
            "text": text,
            "lang": lang_arr,
        }
    )


SHARD_ROWS = 20_000  # rows per shard file: read parallelism + resumable layout


def pages_path(sf_dir: str) -> str:
    """Directory of shard files (read parallelism scales with shards)."""
    name = os.path.basename(os.path.normpath(sf_dir))
    return os.path.join(PAGES_ROOT, name, "pages")


def ensure_pages(sf_dir: str) -> str:
    """Idempotently materialize the sharded pages parquet for an sf dir.

    One deterministic global table, sliced into SHARD_ROWS-row shard
    files (the resumable one-dir-per-shard layout; also what gives the
    read stage its parallelism).
    """
    path = pages_path(sf_dir)
    done = os.path.join(path, "_SUCCESS")
    if not os.path.exists(done):
        table = gen_pages_table(n_pages_for(sf_dir))
        os.makedirs(path, exist_ok=True)
        n_shards = max(1, -(-table.num_rows // SHARD_ROWS))
        for s in range(n_shards):
            shard = table.slice(s * SHARD_ROWS, SHARD_ROWS)
            tmp = os.path.join(path, f".part-{s:05d}.tmp.{os.getpid()}")
            pq.write_table(shard, tmp, row_group_size=5_000)
            os.replace(tmp, os.path.join(path, f"part-{s:05d}.parquet"))
        with open(done, "w") as f:
            f.write(str(table.num_rows))
    return path


# ---------------------------------------------------------------------------
# polygon layer (vector side of the spatial join) — FIXTURES.md §2
# ---------------------------------------------------------------------------


def gen_polygons(seed: int = SEED) -> tuple[pa.Table, pa.Table]:
    """Polygon layer + exploded edges table (for the SQL PIP oracle).

    Modeled on the reference vector fixture (axis-aligned square at a
    sub-pixel offset, ``riostestutils.py:168-200``): a grid of
    axis-aligned boxes, a few rotated quads, one polygon fully outside
    the data extent (empty-join case, ``testvector.py:76-83``) and one
    surrounding everything (``pixelgrid.py:447-491`` removeSurrounding
    case).  Rings are closed (first point repeated last).
    """
    rng = np.random.default_rng(seed + 1)
    rings: list[list[list[float]]] = []
    cats: list[str] = []
    burns: list[int] = []

    # 6x4 grid of boxes over the populated band, sub-cell offset 0.6 deg
    k = 0
    for gy in range(4):
        for gx in range(6):
            x0 = -150.0 + gx * 50.0 + 0.6
            y0 = -50.0 + gy * 28.0 + 0.6
            w, h = 18.0 + 3.0 * ((k * 7) % 5), 12.0 + 2.0 * ((k * 11) % 5)
            rings.append([[x0, y0], [x0 + w, y0], [x0 + w, y0 + h], [x0, y0 + h], [x0, y0]])
            cats.append(f"box{k % 5}")
            burns.append(1 + (k % 3))
            k += 1
    # rotated quads
    for j in range(4):
        cx = float(rng.uniform(-120, 120))
        cy = float(rng.uniform(-40, 55))
        r = float(rng.uniform(5, 15))
        ang = float(rng.uniform(0, np.pi / 2))
        pts = []
        for t in range(4):
            a = ang + t * np.pi / 2
            pts.append([cx + r * np.cos(a), cy + r * np.sin(a)])
        pts.append(pts[0])
        rings.append(pts)
        cats.append("quad")
        burns.append(10 + j)
    # one fully outside the data extent (lat > 89 strip)
    rings.append([[0.0, 89.2], [1.0, 89.2], [1.0, 89.8], [0.0, 89.8], [0.0, 89.2]])
    cats.append("outside")
    burns.append(-1)
    # one surrounding everything
    rings.append([[-179.9, -89.9], [179.9, -89.9], [179.9, 89.9], [-179.9, 89.9], [-179.9, -89.9]])
    cats.append("world")
    burns.append(99)

    poly_id = list(range(len(rings)))
    polys = pa.table(
        {
            "poly_id": pa.array(poly_id, type=pa.int64()),
            "ring_xy": pa.array(rings, type=pa.list_(pa.list_(pa.float64()))),
            "category": pa.array(cats, type=pa.string()),
            "burn_value": pa.array(burns, type=pa.int32()),
        }
    )

    # exploded edges for the SQL oracle: one row per ring segment
    pid, x1, y1, x2, y2 = [], [], [], [], []
    for p, ring in zip(poly_id, rings):
        for a, b in zip(ring[:-1], ring[1:]):
            pid.append(p)
            x1.append(a[0])
            y1.append(a[1])
            x2.append(b[0])
            y2.append(b[1])
    edges = pa.table(
        {
            "poly_id": pa.array(pid, type=pa.int64()),
            "x1": pa.array(x1, type=pa.float64()),
            "y1": pa.array(y1, type=pa.float64()),
            "x2": pa.array(x2, type=pa.float64()),
            "y2": pa.array(y2, type=pa.float64()),
        }
    )
    return polys, edges


def polygons_path() -> str:
    return os.path.join(PAGES_ROOT, "polygons.parquet")


def edges_path() -> str:
    return os.path.join(PAGES_ROOT, "polygon_edges.parquet")


def ensure_polygons() -> tuple[str, str]:
    ppath, epath = polygons_path(), edges_path()
    if not (os.path.exists(ppath) and os.path.exists(epath)):
        polys, edges = gen_polygons()
        _atomic_write(polys, ppath)
        _atomic_write(edges, epath)
    return ppath, epath


# ---------------------------------------------------------------------------
# kNN query points (small broadcast side) — deterministic
# ---------------------------------------------------------------------------


def gen_knn_queries(n: int = 16, seed: int = SEED) -> pa.Table:
    rng = np.random.default_rng(seed + 2)
    lon = rng.uniform(-170.0, 170.0, size=n)
    lat = rng.uniform(-55.0, 70.0, size=n)
    return pa.table(
        {
            "qid": pa.array(np.arange(n, dtype=np.int64)),
            "qlon": pa.array(lon, type=pa.float64()),
            "qlat": pa.array(lat, type=pa.float64()),
        }
    )


def knn_queries_path() -> str:
    return os.path.join(PAGES_ROOT, "knn_queries.parquet")


def ensure_knn_queries() -> str:
    path = knn_queries_path()
    if not os.path.exists(path):
        _atomic_write(gen_knn_queries(), path)
    return path


# ---------------------------------------------------------------------------
# RIOS-style raster fixtures (FIXTURES.md §3) as tile-keyed tables
# ---------------------------------------------------------------------------

RASTER_NROWS = 500
RASTER_NCOLS = 500
RASTER_XLEFT = 500000.0
RASTER_YTOP = 7000000.0
RASTER_PIX = 10.0


def gen_ramp_array() -> np.ndarray:
    """``value = (row+col)*100/998`` truncated to uint8 — reference
    ``riostestutils.py:103-109``."""
    row, col = np.mgrid[0:RASTER_NROWS, 0:RASTER_NCOLS]
    return ((row + col) * 100.0 / (RASTER_NROWS + RASTER_NCOLS - 2)).astype(np.uint8)


def gen_rowcol2_array() -> np.ndarray:
    """2-band uint16: band1=row, band2=col — reference ``riostestutils.py:146-165``."""
    row, col = np.mgrid[0:RASTER_NROWS, 0:RASTER_NCOLS]
    return np.stack([row, col]).astype(np.uint16)


def raster_to_tile_table(
    arr: np.ndarray,
    block: int = 256,
    x_left: float = RASTER_XLEFT,
    y_top: float = RASTER_YTOP,
) -> pa.Table:
    """Dense (bands, rows, cols) array -> tile-keyed table per FIXTURES.md §3.

    Schema: tile_y, tile_x, top, left, nrows, ncols, band, data(list<T>).
    """
    if arr.ndim == 2:
        arr = arr[None, :, :]
    nbands, nrows, ncols = arr.shape
    ty, tx, top, left, nr, nc, band, data = [], [], [], [], [], [], [], []
    t = 0
    while t < nrows:
        ys = min(block, nrows - t)
        le = 0
        while le < ncols:
            xs = min(block, ncols - le)
            for b in range(nbands):
                ty.append(t // block)
                tx.append(le // block)
                top.append(t)
                left.append(le)
                nr.append(ys)
                nc.append(xs)
                band.append(b)
                data.append(arr[b, t : t + ys, le : le + xs].ravel())
            le += xs
        t += ys
    pa_dtype = pa.from_numpy_dtype(arr.dtype)
    return pa.table(
        {
            "tile_y": pa.array(ty, type=pa.int32()),
            "tile_x": pa.array(tx, type=pa.int32()),
            "top": pa.array(top, type=pa.int32()),
            "left": pa.array(left, type=pa.int32()),
            "nrows": pa.array(nr, type=pa.int32()),
            "ncols": pa.array(nc, type=pa.int32()),
            "band": pa.array(band, type=pa.int32()),
            "data": pa.array([d for d in data], type=pa.list_(pa_dtype)),
        }
    )


def tile_table_to_raster(table: pa.Table, nbands: int, nrows: int, ncols: int, dtype) -> np.ndarray:
    """Inverse of :func:`raster_to_tile_table` (for test goldens)."""
    out = np.zeros((nbands, nrows, ncols), dtype=dtype)
    d = table.to_pydict()
    for top, left, nr, nc, band, data in zip(
        d["top"], d["left"], d["nrows"], d["ncols"], d["band"], d["data"]
    ):
        out[band, top : top + nr, left : left + nc] = np.asarray(data, dtype=dtype).reshape(nr, nc)
    return out
