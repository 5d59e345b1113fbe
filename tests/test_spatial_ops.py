r"""Extended spatial operators: radius join, cell rollup, zonal stats,
ranked per-key top-N — each against an independent DuckDB oracle at
sf0.001, plus pure-numpy hierarchy properties."""

import duckdb
import numpy as np
import pyarrow as pa

from rios_ray import cells, synth
from rios_ray.stages.skew import ranked_head_per_key

SF = "/root/testdata/sf0.001"

_GEO = r"geo:(-?\d+\.\d+),(-?\d+\.\d+)"


def _pts_sql():
    path = synth.pages_path(SF)
    return rf"""
        SELECT url, text,
               CAST(regexp_extract(text, '{_GEO}', 1) AS DOUBLE) AS lat,
               CAST(regexp_extract(text, '{_GEO}', 2) AS DOUBLE) AS lon
          FROM read_parquet('{path}/*.parquet')
    """


# ---------------------------------------------------------------------------
# grid_parent hierarchy (pure numpy)
# ---------------------------------------------------------------------------


def test_grid_parent_matches_direct_coarse_binning():
    rng = np.random.default_rng(7)
    lon = rng.uniform(-180, 180, 50000)
    lat = rng.uniform(-90, 90, 50000)
    for res in (3, 7, 9):
        child = cells.grid_cell_id(lon, lat, res)
        np.testing.assert_array_equal(
            cells.grid_parent(child, res), cells.grid_cell_id(lon, lat, res - 1)
        )


def test_grid_parent_edge_clamps():
    # poles / antimeridian / exact cell boundaries
    lon = np.array([-180.0, 180.0, 0.0, 179.999999, -1e-12])
    lat = np.array([90.0, -90.0, 0.0, -89.999999, 1e-12])
    for res in (1, 5):
        child = cells.grid_cell_id(lon, lat, res)
        np.testing.assert_array_equal(
            cells.grid_parent(child, res), cells.grid_cell_id(lon, lat, res - 1)
        )


def test_grid_parent_four_children():
    # every res-(r) cell maps to exactly one parent; a parent's children
    # are a contiguous 2x2 block
    res = 4
    ny, nx = 1 << res, 2 << res
    all_cells = np.arange(ny * nx, dtype=np.int64)
    parents = cells.grid_parent(all_cells, res)
    _, counts = np.unique(parents, return_counts=True)
    assert (counts == 4).all()


# ---------------------------------------------------------------------------
# ranked_head_per_key (pure table)
# ---------------------------------------------------------------------------


def test_ranked_head_per_key_vs_duckdb():
    rng = np.random.default_rng(3)
    t = pa.table(
        {
            "k": pa.array([f"h{int(x)}" for x in rng.integers(0, 40, 3000)]),
            "v": pa.array(rng.integers(0, 50, 3000)),  # heavy ties
            "u": pa.array([f"u{i:05d}" for i in rng.permutation(3000)]),
        }
    )
    got = ranked_head_per_key(
        t, "k", 4, [("v", "descending"), ("u", "ascending")]
    ).to_pandas()
    want = duckdb.sql("""
        SELECT k, v, u,
               row_number() OVER (PARTITION BY k ORDER BY v DESC, u) AS rank
          FROM t QUALIFY rank <= 4
    """).df()
    gs = sorted(map(tuple, got[["k", "v", "u", "rank"]].itertuples(index=False)))
    ws = sorted(map(tuple, want[["k", "v", "u", "rank"]].itertuples(index=False)))
    assert gs == ws


def test_ranked_head_per_key_empty():
    t = pa.table({"k": pa.array([], type=pa.string()),
                  "v": pa.array([], type=pa.int64())})
    out = ranked_head_per_key(t, "k", 3, [("v", "ascending")])
    assert out.num_rows == 0
    assert "rank" in out.column_names


# ---------------------------------------------------------------------------
# distributed pipelines vs DuckDB oracles
# ---------------------------------------------------------------------------


def test_radius_join_vs_duckdb(ray_session):
    from rios_ray.pipelines.spatial_ops import radius_join

    synth.ensure_pages(SF)
    qpath = synth.ensure_knn_queries()
    r = 8.0
    got = radius_join(SF, radius=r).to_pandas()
    want = duckdb.sql(f"""
        WITH pts AS ({_pts_sql()})
        SELECT q.qid, p.url,
               (p.lon - q.qlon) * (p.lon - q.qlon)
             + (p.lat - q.qlat) * (p.lat - q.qlat) AS d2
          FROM pts p CROSS JOIN read_parquet('{qpath}') q
         WHERE (p.lon - q.qlon) * (p.lon - q.qlon)
             + (p.lat - q.qlat) * (p.lat - q.qlat) <= {r * r!r}
    """).df()
    assert len(got) == len(want) > 0
    g = set(zip(got["qid"], got["url"], got["d2"]))
    w = set(zip(want["qid"], want["url"], want["d2"]))
    assert g == w


def test_cell_rollup_vs_duckdb(ray_session):
    from rios_ray.pipelines.spatial_ops import cell_rollup
    from rios_ray.stages.cellassign import DEFAULT_GRID_RES

    synth.ensure_pages(SF)
    got = cell_rollup(SF, res=DEFAULT_GRID_RES, levels=3).to_pandas()
    total = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{synth.pages_path(SF)}/*.parquet')"
    ).fetchone()[0]
    # every level partitions the corpus
    sums = got.groupby("res")["n_pages"].sum()
    assert set(sums.index) == {DEFAULT_GRID_RES, DEFAULT_GRID_RES - 1,
                               DEFAULT_GRID_RES - 2}
    assert (sums == total).all()
    # parent count == sum of its children's counts
    base = got[got["res"] == DEFAULT_GRID_RES]
    par = got[got["res"] == DEFAULT_GRID_RES - 1]
    child_parents = cells.grid_parent(
        base["cell"].to_numpy(), DEFAULT_GRID_RES
    )
    import pandas as pd

    rolled = (
        pd.DataFrame({"cell": child_parents, "n": base["n_pages"].to_numpy()})
        .groupby("cell")["n"].sum()
    )
    merged = par.set_index("cell")["n_pages"].sort_index()
    assert (rolled.sort_index() == merged).all()


def test_zonal_stats_vs_duckdb(ray_session):
    from rios_ray.pipelines.spatial_ops import zonal_stats

    synth.ensure_pages(SF)
    ppath, _ = synth.ensure_polygons()
    epath = synth.edges_path()
    got = zonal_stats(SF).to_pandas().sort_values("poly_id").reset_index(drop=True)
    want = duckdb.sql(f"""
        WITH pts AS ({_pts_sql()}),
        cross_counts AS (
            SELECT p.url, e.poly_id, count(*) AS n_cross
              FROM pts p JOIN read_parquet('{epath}') e
                ON ((e.y1 > p.lat) != (e.y2 > p.lat))
               AND p.lon < (e.x2 - e.x1) * (p.lat - e.y1) / (e.y2 - e.y1) + e.x1
             GROUP BY p.url, e.poly_id),
        pairs AS (SELECT url, poly_id FROM cross_counts WHERE n_cross % 2 = 1),
        j AS (SELECT pr.poly_id, length(pt.text) AS n_chars
                FROM pairs pr JOIN pts pt USING (url))
        SELECT j.poly_id, pg.category, count(*) AS n_pages,
               CAST(sum(n_chars) AS BIGINT) AS sum_chars,
               min(n_chars) AS min_chars, max(n_chars) AS max_chars,
               CAST(sum(n_chars) AS DOUBLE) / count(*) AS mean_chars
          FROM j JOIN read_parquet('{ppath}') pg USING (poly_id)
         GROUP BY 1, 2 ORDER BY 1
    """).df()
    assert len(got) == len(want) > 0
    for c in ("poly_id", "n_pages", "sum_chars", "min_chars", "max_chars"):
        np.testing.assert_array_equal(got[c].to_numpy(), want[c].to_numpy())
    np.testing.assert_array_equal(got["mean_chars"].to_numpy(),
                                  want["mean_chars"].to_numpy())


def test_top_pages_per_host_vs_duckdb(ray_session):
    from rios_ray.pipelines.pages import top_pages_per_host

    synth.ensure_pages(SF)
    path = synth.pages_path(SF)
    got = top_pages_per_host(SF, n=2).to_pandas()
    want = duckdb.sql(f"""
        SELECT regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
               url, length(text) AS n_chars,
               row_number() OVER (
                   PARTITION BY regexp_extract(url, '^[a-z]+://([^/]+)', 1)
                   ORDER BY length(text) DESC, url) AS rank
          FROM read_parquet('{path}/*.parquet')
        QUALIFY rank <= 2
    """).df()
    g = sorted(map(tuple, got[["host", "url", "n_chars", "rank"]].itertuples(index=False)))
    w = sorted(map(tuple, want[["host", "url", "n_chars", "rank"]].itertuples(index=False)))
    assert g == w and len(g) > 0


def test_s2_parent_matches_direct_coarse_binning():
    rng = np.random.default_rng(13)
    lon = rng.uniform(-180, 180, 50000)
    lat = rng.uniform(-90, 90, 50000)
    for level in (12, 8):
        child = cells.s2_cell_id(lon, lat, level)
        np.testing.assert_array_equal(
            cells.s2_parent(child, level, level - 1),
            cells.s2_cell_id(lon, lat, level - 1),
        )


def test_s2_rollup_partitions_corpus(ray_session):
    import duckdb

    from rios_ray.pipelines.spatial_ops import s2_rollup

    synth.ensure_pages(SF)
    got = s2_rollup(SF, level=12, levels=2).to_pandas()
    total = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{synth.pages_path(SF)}/*.parquet')"
    ).fetchone()[0]
    sums = got.groupby("level")["n_pages"].sum()
    assert set(sums.index) == {12, 11} and (sums == total).all()
    base = got[got["level"] == 12]
    rolled = (
        __import__("pandas")
        .DataFrame({
            "cell": cells.s2_parent(base["s2_cell"].to_numpy(), 12, 11),
            "n": base["n_pages"].to_numpy(),
        })
        .groupby("cell")["n"].sum().sort_index()
    )
    par = got[got["level"] == 11].set_index("s2_cell")["n_pages"].sort_index()
    assert (rolled == par).all()


def test_host_char_share_vs_duckdb(ray_session):
    from rios_ray.pipelines.pages import host_char_share

    synth.ensure_pages(SF)
    path = synth.pages_path(SF)
    got = host_char_share(SF).to_pandas()
    want = duckdb.sql(f"""
        WITH h AS (SELECT regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
                          url, length(text) AS n_chars
                     FROM read_parquet('{path}/*.parquet'))
        SELECT host, url, n_chars,
               CAST(sum(n_chars) OVER (PARTITION BY host) AS BIGINT) AS host_chars,
               CAST(n_chars AS DOUBLE)
               / CAST(sum(n_chars) OVER (PARTITION BY host) AS BIGINT) AS share
          FROM h""").df()
    g = got.sort_values("url").reset_index(drop=True)
    w = want.sort_values("url").reset_index(drop=True)
    assert len(g) == len(w) > 0
    for c in ("host", "url", "n_chars", "host_chars"):
        assert (g[c] == w[c]).all(), c
    np.testing.assert_array_equal(g["share"].to_numpy(), w["share"].to_numpy())
    # shares of each host sum to 1 (up to float addition)
    s = g.groupby("host")["share"].sum()
    np.testing.assert_allclose(s.to_numpy(), 1.0, rtol=1e-9)


def test_cell_focal_stats_vs_numpy(ray_session):
    """Focal sums equal a dense-grid 3x3 convolution with lon wrap and
    lat zero-padding (independent numpy oracle)."""
    from rios_ray.pipelines.spatial_ops import cell_focal_stats
    from rios_ray.stages.cellassign import DEFAULT_GRID_RES

    synth.ensure_pages(SF)
    res = DEFAULT_GRID_RES
    ny, nx = 1 << res, 2 << res
    got = cell_focal_stats(SF, res=res).to_pandas()
    # dense counts grid from the oracle-parsed points
    pts = duckdb.sql(f"SELECT lat, lon FROM ({_pts_sql()})").df()
    dense = np.zeros((ny, nx), dtype=np.int64)
    ids = cells.grid_cell_id(pts["lon"].to_numpy(), pts["lat"].to_numpy(), res)
    np.add.at(dense, (ids // nx, ids % nx), 1)
    conv = np.zeros_like(dense)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            shifted = np.roll(dense, dx, axis=1)  # lon wraps
            if dy == -1:
                conv[1:, :] += shifted[:-1, :]    # lat clips
            elif dy == 1:
                conv[:-1, :] += shifted[1:, :]
            else:
                conv += shifted
    cy = got["cell"].to_numpy() // nx
    cx = got["cell"].to_numpy() % nx
    assert (got["n_pages"].to_numpy() == dense[cy, cx]).all()
    assert (got["focal_sum"].to_numpy() == conv[cy, cx]).all()
    np.testing.assert_array_equal(
        got["focal_mean"].to_numpy(), conv[cy, cx].astype(np.float64) / 9.0
    )
    # only occupied cells are emitted
    assert (dense[cy, cx] > 0).all() and len(got) == (dense > 0).sum()


def test_radius_join_tiny_radius_empty(ray_session):
    from rios_ray.pipelines.spatial_ops import radius_join

    synth.ensure_pages(SF)
    ds = radius_join(SF, radius=1e-12)
    assert ds.count() == 0
    # schema survives on the Dataset (pandas drops columns of an
    # all-empty dataset — known Ray conversion behavior)
    assert set(ds.schema().names) == {"qid", "url", "d2"}


def test_cell_rollup_single_level(ray_session):
    from rios_ray.pipelines.spatial_ops import cell_rollup
    from rios_ray.stages.cellassign import DEFAULT_GRID_RES

    got = cell_rollup(SF, res=DEFAULT_GRID_RES, levels=1).to_pandas()
    assert (got["res"] == DEFAULT_GRID_RES).all() and len(got) > 0


def test_grid_dbscan_vs_unionfind(ray_session):
    """Cluster labels equal a driver-side union-find over the core-cell
    adjacency (lon wrap + lat clip), and cluster_id is the component
    min; isolated core cells label themselves."""
    import numpy as np
    import pyarrow.parquet as pq

    from rios_ray import synth
    from rios_ray.cells import grid_cell_id
    from rios_ray.pipelines.spatial_ops import grid_dbscan
    from rios_ray.stages.cellassign import DEFAULT_GRID_RES

    sf = "/root/testdata/sf0.001"
    got = grid_dbscan(sf, minpts=5).to_pandas()

    # oracle: recompute core cells + union-find in plain python
    from rios_ray.pipelines.pages import geocoded_pages
    geo = geocoded_pages(sf, keep_text=False, families=("grid",)).to_pandas()
    import collections
    counts = collections.Counter(geo["cell"].astype(int))
    core = {c for c, n in counts.items() if n >= 5}
    nx, ny = 2 << DEFAULT_GRID_RES, 1 << DEFAULT_GRID_RES
    parent = {c: c for c in core}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for c in core:
        cy, cx = divmod(c, nx)
        for dy in (-1, 0, 1):
            if not (0 <= cy + dy < ny):
                continue
            for dx in (-1, 0, 1):
                nb = (cy + dy) * nx + (cx + dx) % nx
                if nb in core:
                    ra, rb = find(c), find(nb)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
    want = {c: find(c) for c in core}
    got_map = dict(zip(got["cell"].astype(int), got["cluster_id"].astype(int)))
    assert got_map == want
    assert dict(zip(got["cell"].astype(int), got["n_pages"].astype(int))) == {
        c: counts[c] for c in core
    }
    assert len(core) > 0


def test_pip_join_left_vs_inner(ray_session):
    """LEFT OUTER PIP = inner pairs + exactly one 'none' row per
    unmatched page; total rows = matched pairs + unmatched pages."""
    from rios_ray.pipelines.pages import spatial_join
    from rios_ray.pipelines.spatial_ops import pip_join_left

    sf = "/root/testdata/sf0.001"
    inner = spatial_join(sf).to_pandas()
    left = pip_join_left(sf).to_pandas()
    matched_urls = set(inner["url"])
    none_rows = left[left["category"] == "none"]
    # no inner-matched url appears as 'none', every other page does once
    assert set(none_rows["url"]).isdisjoint(matched_urls)
    import collections
    assert max(collections.Counter(none_rows["url"]).values(), default=1) == 1
    assert len(left) == len(inner) + len(none_rows)
    # the matched part agrees with the inner join (url x category bags)
    a = sorted(zip(inner["url"], inner["category"]))
    b = sorted(zip(left[left["category"] != "none"]["url"],
                   left[left["category"] != "none"]["category"]))
    assert a == b


def test_cell_gradient_vs_numpy(ray_session):
    """Gradient equals a dense-raster central difference computed
    driver-side on the zero-padded count surface (wrap in x, clip in
    y), restricted to occupied cells."""
    import numpy as np

    from rios_ray.pipelines.pages import geocoded_pages
    from rios_ray.pipelines.spatial_ops import cell_gradient
    from rios_ray.stages.cellassign import DEFAULT_GRID_RES

    sf = "/root/testdata/sf0.001"
    got = cell_gradient(sf).to_pandas().set_index("cell")
    ny, nx = 1 << DEFAULT_GRID_RES, 2 << DEFAULT_GRID_RES
    cells = geocoded_pages(sf, keep_text=False, families=("grid",)) \
        .select_columns(["cell"]).to_pandas()["cell"].to_numpy()
    surface = np.zeros((ny, nx), dtype=np.int64)
    np.add.at(surface, (cells // nx, cells % nx), 1)
    east = np.roll(surface, -1, axis=1)          # x wraps
    west = np.roll(surface, 1, axis=1)
    south = np.vstack([surface[1:], np.zeros((1, nx), np.int64)])  # y clips
    north = np.vstack([np.zeros((1, nx), np.int64), surface[:-1]])
    gx, gy = east - west, south - north
    occ = np.flatnonzero(surface.ravel())
    assert sorted(got.index) == sorted(occ.tolist())
    for c in got.index[:500]:
        y, x = divmod(int(c), nx)
        assert got.loc[c, "gx"] == gx[y, x] and got.loc[c, "gy"] == gy[y, x], c
    assert (got[["gx", "gy"]].abs().to_numpy() > 0).any()


def test_supercover_cells_vs_sampling_oracle():
    """Vectorized supercover matches a dense-sampling scalar oracle on
    random segments, handles on-gridline and degenerate segments with
    the documented floor()-side tie rule, and the batch path equals
    per-segment calls."""
    import numpy as np

    from rios_ray.spatial import supercover_cells

    def oracle(c0, r0, c1, r1, steps=200001):
        ts = np.linspace(0.0, 1.0, steps)
        cols = np.floor(c0 + ts * (c1 - c0)).astype(int)
        rows = np.floor(r0 + ts * (r1 - r0)).astype(int)
        return set(zip(rows, cols))

    rng = np.random.default_rng(5)
    for _ in range(60):
        c0, r0, c1, r1 = rng.uniform(-5, 15, 4)
        s, rw, cl = supercover_cells([c0], [r0], [c1], [r1])
        assert set(zip(rw.tolist(), cl.tolist())) == oracle(c0, r0, c1, r1)
    # vertical segment exactly on a grid line: floor() side only
    s, rw, cl = supercover_cells([2.0], [0.5], [2.0], [3.5])
    assert set(zip(rw.tolist(), cl.tolist())) == {(i, 2) for i in range(4)}
    # degenerate point segment
    s, rw, cl = supercover_cells([1.5], [1.5], [1.5], [1.5])
    assert set(zip(rw.tolist(), cl.tolist())) == {(1, 1)}
    # batch path == per-segment calls
    segs = rng.uniform(-5, 15, (30, 4))
    sb, rb, cb = supercover_cells(segs[:, 0], segs[:, 1], segs[:, 2], segs[:, 3])
    for i in range(30):
        m = sb == i
        one = supercover_cells(*(segs[i:i + 1, j] for j in range(4)))
        assert set(zip(rb[m].tolist(), cb[m].tolist())) == set(
            zip(one[1].tolist(), one[2].tolist())
        )


def test_compact_cells_partition_property(ray_session):
    """compacted set must be a disjoint exact cover of the occupied
    res-7 cells: expanding every (cell, res) back to res-7 descendants
    reproduces the occupied set with no overlap."""
    from rios_ray.pipelines.pages import geocoded_pages
    from rios_ray.pipelines.spatial_ops import compact_cells

    res = 7
    occupied = np.unique(
        geocoded_pages(SF, keep_text=False, grid_res=res, families=("grid",))
        .select_columns(["cell"]).to_pandas()["cell"].to_numpy()
    )
    got = compact_cells(SF, res=res, res_min=5).to_pandas()
    assert got["res"].isin([5, 6, 7]).all()

    def children(cell: int, r: int) -> np.ndarray:
        # inverse of cells.grid_parent: the 4 child ids one res finer
        nx, nxc = 2 << r, 2 << (r + 1)
        cy, cx = cell // nx, cell % nx
        out = []
        for dy in (0, 1):
            for dx in (0, 1):
                out.append((2 * cy + dy) * nxc + 2 * cx + dx)
        return np.array(out, dtype=np.int64)

    expanded = []
    for cell, r in zip(got["cell"], got["res"]):
        cur = np.array([cell], dtype=np.int64)
        for rr in range(int(r), res):
            cur = np.concatenate([children(c, rr) for c in cur])
        expanded.append(cur)
    exp = np.concatenate(expanded)
    assert len(exp) == len(np.unique(exp))  # disjoint
    assert np.array_equal(np.sort(exp), occupied)  # exact cover
    # compaction must actually bite on the fixture
    assert (got["res"] < res).any()


def test_compact_cells_vs_duckdb(ray_session):
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    got = entrymod.queries()["cell_compact"](SF).to_pandas()
    sql = entrymod.oracle_sql()["cell_compact"].replace(
        entrymod._pages_sql(), entrymod._pages_sql(SF)
    )
    want = duckdb.sql(sql).df()
    g = sorted(map(tuple, got[["cell", "res"]].itertuples(index=False)))
    w = sorted(map(tuple, want[["cell", "res"]].itertuples(index=False)))
    assert len(g) == len(w) > 0
    assert g == w


def test_uncompact_round_trip(ray_session):
    """uncompact(compact(occupied)) == occupied, via the library
    grid_children inverse (and grid_parent(grid_children) == identity)."""
    from rios_ray.pipelines.pages import geocoded_pages
    from rios_ray.pipelines.spatial_ops import compact_cells, uncompact_cells

    res = 7
    occupied = np.unique(
        geocoded_pages(SF, keep_text=False, grid_res=res, families=("grid",))
        .select_columns(["cell"]).to_pandas()["cell"].to_numpy()
    )
    back = uncompact_cells(compact_cells(SF, res=res, res_min=5), res=res
                           ).to_pandas()["cell"].to_numpy()
    assert len(back) == len(np.unique(back))
    assert np.array_equal(np.sort(back), occupied)
    # grid_children is the exact inverse of grid_parent
    c = occupied[:64]
    kids = cells.grid_children(c, res)
    assert np.array_equal(cells.grid_parent(kids, res + 1), np.repeat(c, 4))
