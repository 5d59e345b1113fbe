"""The headline pipelines: pages -> geocode -> cells -> spatial join.

This is the engine's equivalent of the reference's top entry point
``rios.applier.apply`` (``/root/reference/rios/applier.py:861-955``):
plan on the driver, stream blocks through vectorized per-batch
transforms, finalize with a small aggregate.  Every stage is lazy; the
only materialized results are aggregates.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

from .. import synth
from ..sources.pages import read_pages
from ..stages.cellassign import (
    DEFAULT_GRID_RES,
    DEFAULT_HEX_RES,
    DEFAULT_S2_LEVEL,
    assign_cells,
)
from ..stages.geocode import extract_text, geocode
from ..stages.knn import KnnPartialStage, knn_final_merge_all, knn_partial_fn
from ..stages.pip import PIPJoinStage, pip_join_fn

GEO_COLS = ["url", "warc_ts", "lang", "extracted_text", "lat", "lon"]

# Rows per batch for the vectorized stages: large enough that pyarrow /
# numpy kernel launch overhead amortizes, small enough that a batch x
# concurrency stays well inside worker heaps (a geocoded row is ~300 B).
BATCH_SIZE = 16384


def geocoded_pages(
    sf_dir: str,
    grid_res: int = DEFAULT_GRID_RES,
    s2_level: int = DEFAULT_S2_LEVEL,
    hex_res: int = DEFAULT_HEX_RES,
    keep_text: bool = True,
    keep_ts: bool = False,
    paths: list[str] | None = None,
    families: tuple[str, ...] = ("grid", "s2", "hex"),
) -> ray.data.Dataset:
    """pages -> extract_text (from html, byte-identical) -> geocode -> cells.

    Prune at the read: ``warc_ts`` is decoded only when a consumer asks
    for it (``keep_ts``); no current pipeline does.  ``families`` prunes
    the cell-index computation the same way — a grid-only consumer
    skips the s2 trig and hex cube-rounding per row.
    """
    read_cols = ["url", "warc_ts", "html", "lang"] if keep_ts else ["url", "html", "lang"]
    # bundle small shard files on full scans; per-shard blocks are kept
    # when the caller restricts paths (the checkpoint-resume unit)
    ds = read_pages(sf_dir, columns=read_cols, paths=paths,
                    bundle_files=paths is None)
    ds = ds.map_batches(extract_text, batch_format="pyarrow", zero_copy_batch=True,
                        batch_size=BATCH_SIZE)
    ds = ds.map_batches(geocode, batch_format="pyarrow", zero_copy_batch=True,
                        batch_size=BATCH_SIZE)
    # html served its purpose; drop the heavy binary column before any shuffle
    cols = [c for c in GEO_COLS if (keep_ts or c != "warc_ts")]
    if not keep_text:
        cols = [c for c in cols if c != "extracted_text"]
    ds = ds.select_columns(cols)
    return ds.map_batches(
        lambda b: assign_cells(b, grid_res, s2_level, hex_res, families),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=BATCH_SIZE,
    )


def spatial_join(sf_dir: str, concurrency=None, **geo_kwargs) -> ray.data.Dataset:
    """Broadcast PIP join: one output row per (page, containing polygon).

    Runs on the shared TASK pool with a per-worker index cache
    (stages.pip.pip_join_fn): same build-once-per-process semantics as
    an actor pool, none of the per-execution pool cold-start (which
    capped effective parallelism at ~5x on a 32-cpu run).  Pass
    ``concurrency`` to force a dedicated actor pool instead.
    """
    ppath, _ = synth.ensure_polygons()
    polys_ref = ray.put(pq.read_table(ppath))
    geo_kwargs.setdefault("families", ("grid",))
    ds = geocoded_pages(sf_dir, keep_text=False, **geo_kwargs)
    if concurrency is not None:
        return ds.map_batches(
            PIPJoinStage,
            fn_constructor_kwargs={"polygons": polys_ref},
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=BATCH_SIZE,
            concurrency=concurrency,
        )
    return ds.map_batches(
        pip_join_fn(polys_ref),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=BATCH_SIZE,
    )


def flagship(sf_dir: str, grid_res: int = DEFAULT_GRID_RES) -> ray.data.Dataset:
    """Spatial-join + tiling headline: per-(cell, category) page counts.

    Lean projection of the general path (the flagship is memory-
    bandwidth-bound once vectorized, so every byte not read or copied
    is throughput): reads ONLY ``html``, geocodes straight off the
    html string (the geo token regex matches identically with or
    without the wrapper — no extracted-text copy), assigns only the
    grid cell (no s2/hex), and the PIP stage keeps only ``cell``.
    Result is identical to
    ``grouped_count(spatial_join(...), ["cell", "category"])`` —
    verified by the same DuckDB oracle.

    Pre-aggregated per batch (combiner) so the one shuffle moves
    per-batch partials keyed by the same cell id used for tiling.
    """
    import pyarrow.compute as pc

    from .. import cells as C
    from ..functions.agg import grouped_count
    from ..stages.geocode import GEO_PATTERN

    ppath, _ = synth.ensure_polygons()
    polys_ref = ray.put(pq.read_table(ppath))

    def geocells(b: pa.Table) -> pa.Table:
        s = pc.cast(b["html"], pa.string())
        ex = pc.extract_regex(s, GEO_PATTERN)
        lat = pc.cast(pc.struct_field(ex, "glat"), pa.float64())
        lon = pc.cast(pc.struct_field(ex, "glon"), pa.float64())
        cell = C.grid_cell_id(
            lon.to_numpy(zero_copy_only=False),
            lat.to_numpy(zero_copy_only=False),
            grid_res,
        )
        return pa.table({"lon": lon, "lat": lat, "cell": pa.array(cell)})

    ds = read_pages(sf_dir, columns=["html"], bundle_files=True).map_batches(
        geocells, batch_format="pyarrow", zero_copy_batch=True, batch_size=BATCH_SIZE
    )
    joined = ds.map_batches(
        pip_join_fn(polys_ref, keep_cols=["cell"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=BATCH_SIZE,
    )
    # tree final: cell x category cardinality is bounded by the grid
    return grouped_count(joined, ["cell", "category"], alias="n_pages",
                         final_mode="tree")


def cell_band_math(
    sf_dir: str,
    cat_a: str = "world",
    cat_b: str = "quad",
    grid_res: int = DEFAULT_GRID_RES,
) -> ray.data.Dataset:
    """RIOS band-arithmetic analogue on the cell grid: treating each
    polygon category's per-cell page count as a raster band, emit — for
    every cell where BOTH bands are present — the exact integer counts,
    their difference, and the band ratio as ONE shared IEEE division
    (the applier's ``(b1 - b2) / b2``-style user function, reference
    ``/root/reference/rios/applier.py`` user-fn examples, re-expressed
    over the flagship's tiled counts).

    Cost: the flagship aggregate itself; the pivot is one vectorized
    pass over its tree-final block (cell x category is grid-bounded at
    any corpus size, so the single-task pivot holds at 100 TB).
    """
    counts = flagship(sf_dir, grid_res=grid_res)

    def pivot(b: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc

        cat = b["category"]
        cells_np = b["cell"].to_numpy(zero_copy_only=False)
        n = b["n_pages"].to_numpy(zero_copy_only=False)
        ma = pc.equal(cat, cat_a).to_numpy(zero_copy_only=False)
        mb = pc.equal(cat, cat_b).to_numpy(zero_copy_only=False)
        ca, na = cells_np[ma], n[ma]
        cb, nb = cells_np[mb], n[mb]
        # intersect1d's return_indices works on unsorted unique inputs
        both, ia, ib = np.intersect1d(ca, cb, assume_unique=True,
                                      return_indices=True)
        na, nb = na[ia], nb[ib]
        return pa.table({
            "cell": pa.array(both),
            "n_a": pa.array(na),
            "n_b": pa.array(nb),
            "band_diff": pa.array(na - nb),
            "band_ratio": pa.array(na.astype(np.float64)
                                   / nb.astype(np.float64)),
        })

    # the pivot needs BOTH bands of a cell in one batch: repartition(1)
    # makes that invariant local (today it is a no-op — flagship's tree
    # final already emits one grid-bounded block — but this no longer
    # depends on flagship's final_mode from another module)
    return counts.repartition(1).map_batches(
        pivot, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None)


def knn_pages(sf_dir: str, k: int = 10) -> ray.data.Dataset:
    """Exact kNN of every broadcast query point over all pages (task
    pool + per-worker query-matrix cache, see spatial_join)."""
    qpath = synth.ensure_knn_queries()
    q_ref = ray.put(pq.read_table(qpath))
    ds = geocoded_pages(sf_dir, keep_text=False, families=("grid",))
    partial = ds.map_batches(
        knn_partial_fn(q_ref, k),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=BATCH_SIZE,
    )
    return partial.repartition(1).map_batches(
        knn_final_merge_all(k), batch_format="pandas", batch_size=None
    )


def knn_pages_cellring(sf_dir: str, k: int = 10,
                       grid_res: int = DEFAULT_GRID_RES) -> ray.data.Dataset:
    """Exact kNN via cell-ring candidate generation + exact refine.

    Two passes (the scale path when queries are localized):

    1. per-cell counts (vectorized grouped count -> small driver map:
       bounded by the grid size, not the corpus);
    2. driver plans a provably-sufficient candidate cell set per query
       (stages.knn.ring_candidate_cells), broadcasts it, and the refine
       scans ONLY rows whose cell is in some query's candidate set —
       per batch, one isin filter + exact distances on the survivors.

    Output is identical to :func:`knn_pages` (tested); only the work
    shape differs: brute force touches every row per query, this
    touches ~|candidate cells| worth of rows.
    """
    import numpy as np

    from ..functions.agg import grouped_count
    from ..stages.knn import KnnPartialStage, knn_final_merge_all, ring_candidate_cells

    qpath = synth.ensure_knn_queries()
    qt = pq.read_table(qpath)
    qid = qt["qid"].to_numpy()
    qlon = qt["qlon"].to_numpy()
    qlat = qt["qlat"].to_numpy()

    # Materialize the pruned 4-column projection ONCE and feed both the
    # count pass and the refine pass — the geocode (regex over html) is
    # the expensive part and must not run twice (round-2 regression).
    # ~30 B/row in the object store; at cluster scale this is the same
    # bounded footprint every shuffle of the projection would need.
    geo = (
        geocoded_pages(sf_dir, keep_text=False, families=("grid",))
        .select_columns(["url", "lon", "lat", "cell"])
        .materialize()
    )

    # pass 1: per-cell counts.  Tree final: cardinality is bounded by
    # the GRID (not the corpus), so per-batch partials + one merge task
    # beat a keyed exchange — same reasoning as flagship's final
    counts_df = grouped_count(
        geo.select_columns(["cell"]), ["cell"], alias="n",
        final_mode="tree",
    ).to_pandas()
    cell_counts = dict(zip(counts_df["cell"].astype(int), counts_df["n"].astype(int)))

    # driver planning: candidate cells per query + the union filter set
    cand_sets = [
        ring_candidate_cells(float(qlon[j]), float(qlat[j]), grid_res, cell_counts, k)
        for j in range(len(qid))
    ]
    union_cells = np.unique(np.concatenate(cand_sets))
    cand_arrays = [np.asarray(np.unique(c), dtype=np.int64) for c in cand_sets]
    q_ref = ray.put((qid, qlon, qlat, cand_arrays, union_cells))

    def refine(b: pa.Table) -> pa.Table:
        import pyarrow as pa_

        qid_, qlon_, qlat_, cand_, union_ = ray.get(q_ref)
        cells = b["cell"].to_numpy()
        keep = np.isin(cells, union_)
        b = b.filter(pa_.array(keep))
        out_qid, out_idx, out_d2 = [], [], []
        if b.num_rows:
            cells = b["cell"].to_numpy()
            lon = b["lon"].to_numpy()
            lat = b["lat"].to_numpy()
            for j in range(len(qid_)):
                # per-query candidate mask BEFORE top-k (a union row must
                # not evict a true candidate from this query's slots)
                m = np.isin(cells, cand_[j])
                if not m.any():
                    continue
                rows = np.flatnonzero(m)
                dlon = lon[rows] - qlon_[j]
                dlat = lat[rows] - qlat_[j]
                d2 = dlon * dlon + dlat * dlat
                kk = min(k, len(d2))
                top = np.argpartition(d2, kk - 1)[:kk] if kk < len(d2) else np.arange(len(d2))
                out_qid.append(np.full(len(top), qid_[j], dtype=np.int64))
                out_idx.append(rows[top])
                out_d2.append(d2[top])
        if not out_qid:
            return pa_.table({"qid": pa_.array([], type=pa_.int64()),
                              "url": pa_.array([], type=pa_.string()),
                              "d2": pa_.array([], type=pa_.float64())})
        import pyarrow.compute as pc_

        # one Arrow take for all queries' survivors — the url strings
        # never round-trip through Python objects
        urls = pc_.take(
            b["url"].combine_chunks(), pa_.array(np.concatenate(out_idx))
        )
        return pa_.table({
            "qid": pa_.array(np.concatenate(out_qid)),
            "url": urls.cast(pa_.string()),
            "d2": pa_.array(np.concatenate(out_d2), type=pa_.float64()),
        })

    partial = geocoded_pages(sf_dir, keep_text=False, families=("grid",)).map_batches(
        refine, batch_format="pyarrow", zero_copy_batch=True, batch_size=BATCH_SIZE
    )
    return partial.repartition(1).map_batches(
        knn_final_merge_all(k), batch_format="pandas", batch_size=None
    )


HOST_RE = r"^[a-z]+://(?P<host>[^/]+)"


def host_counts(sf_dir: str) -> ray.data.Dataset:
    """Per-domain stats: page count + total text bytes per URL host.

    The standard crawl-pipeline rollup (politeness budgeting, domain
    mix reports).  One vectorized RE2 extract per batch feeding the
    combiner-first grouped aggregate — host cardinality is bounded by
    the crawl's domain list, far below row count, so the exchange
    moves only partial rows.
    """
    import pyarrow.compute as pc

    from ..functions.agg import hash_grouped_aggregate

    def host_stats(b: pa.Table) -> pa.Table:
        host = pc.struct_field(pc.extract_regex(b["url"], HOST_RE), "host")
        return pa.table(
            {
                "host": host,
                "n_chars": pc.utf8_length(b["text"]).cast(pa.int64()),
            }
        )

    ds = read_pages(sf_dir, columns=["url", "text"], bundle_files=True).map_batches(
        host_stats, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_grouped_aggregate(
        ds, ["host"],
        [(None, "count", "n_pages"), ("n_chars", "sum", "sum_chars")],
    )


def top_pages_per_host(sf_dir: str, n: int = 3) -> ray.data.Dataset:
    """Distributed windowed top-N: the ``n`` longest pages of every URL
    host, ranked — ``ROW_NUMBER() OVER (PARTITION BY host ORDER BY
    n_chars DESC, url) <= n``.

    Scale shape: a per-batch pre-cap (no batch needs to forward more
    than ``n`` rows per host it sees) bounds the exchange at
    ``n x hosts-per-batch`` rows, then one keyed exchange co-locates
    each host and ranks with a single composite Arrow sort per
    partition (``stages.skew.ranked_head_per_key``) — the window
    function never sees a global sort.
    """
    import pyarrow.compute as pc

    from ..functions.agg import hash_partitioned_groups
    from ..stages.skew import ranked_head_per_key

    ORDER = [("n_chars", "descending"), ("url", "ascending")]

    def host_rows(b: pa.Table) -> pa.Table:
        t = pa.table({
            "host": pc.struct_field(pc.extract_regex(b["url"], HOST_RE), "host"),
            "url": b["url"],
            "n_chars": pc.utf8_length(b["text"]).cast(pa.int64()),
        })
        # combiner: only each host's local top-n can be in the global top-n
        return ranked_head_per_key(t, "host", n, ORDER).drop_columns(["rank"])

    ds = read_pages(sf_dir, columns=["url", "text"], bundle_files=True).map_batches(
        host_rows, batch_format="pyarrow", zero_copy_batch=True, batch_size=BATCH_SIZE
    )
    return hash_partitioned_groups(
        ds, ["host"], lambda t: ranked_head_per_key(t, "host", n, ORDER)
    )


def url_canonical(sf_dir: str) -> ray.data.Dataset:
    """Crawl URL canonicalization: (url, canon_url, domain, path_depth).

    One pruned single-column read -> one vectorized RE2 stage
    (``text.urls.canonical_batch``); row-local, shuffle-free, the
    cheapest possible 100 TB shape.  The canonical form is the usual
    pre-dedup normalizer (lowercased scheme/host, www/default-port
    stripped, fragment + utm params dropped, trailing slash trimmed).
    """
    from ..text.urls import canonical_batch

    return read_pages(sf_dir, columns=["url"], bundle_files=True).map_batches(
        canonical_batch, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=BATCH_SIZE,
    )


def host_char_share(sf_dir: str) -> ray.data.Dataset:
    """Windowed group-share: every page's fraction of its host's total
    text bytes — ``SUM() OVER (PARTITION BY host)`` without a window
    function: one host-keyed exchange, then per partition a single sort
    + ``reduceat`` computes each host's total and broadcasts it back to
    the rows by repeat.  Output (host, url, n_chars, host_chars, share).
    """
    import numpy as np
    import pyarrow.compute as pc

    from ..functions.agg import hash_partitioned_groups

    def host_rows(b: pa.Table) -> pa.Table:
        return pa.table({
            "host": pc.struct_field(pc.extract_regex(b["url"], HOST_RE), "host"),
            "url": b["url"],
            "n_chars": pc.utf8_length(b["text"]).cast(pa.int64()),
        })

    ds = read_pages(sf_dir, columns=["url", "text"], bundle_files=True).map_batches(
        host_rows, batch_format="pyarrow", zero_copy_batch=True, batch_size=BATCH_SIZE
    )

    def share(tbl: pa.Table) -> pa.Table:
        tbl = tbl.sort_by([("host", "ascending"), ("url", "ascending")])
        hcol = tbl["host"].combine_chunks()
        codes = hcol.dictionary_encode().indices.to_numpy(zero_copy_only=False)
        new = np.concatenate([[True], codes[1:] != codes[:-1]]) if len(codes) else np.zeros(0, bool)
        starts = np.flatnonzero(new)
        counts = np.diff(np.append(starts, len(codes)))
        x = tbl["n_chars"].to_numpy(zero_copy_only=False)
        totals = np.add.reduceat(x, starts) if len(starts) else np.zeros(0, np.int64)
        per_row = np.repeat(totals, counts)
        return pa.table({
            "host": tbl["host"],
            "url": tbl["url"],
            "n_chars": tbl["n_chars"],
            "host_chars": pa.array(per_row, type=pa.int64()),
            "share": pa.array(x.astype(np.float64) / per_row.astype(np.float64)),
        })

    return hash_partitioned_groups(ds, ["host"], share)


def pages_cube(sf_dir: str) -> ray.data.Dataset:
    """GROUPING SETS cube over the crawl mix: page counts for
    ((lang, tld), (lang), (tld), ()) with 'ALL' as the roll-up
    sentinel — the multi-level report query (language x domain-suffix
    mix) in ONE pass.

    Scale shape: the scan aggregates only the FINEST level
    (combiner-first; lang x tld cardinality is bounded by the crawl's
    language list x suffix list, not rows), and every coarser grouping
    set is derived from that small table in a single final task — the
    cell_rollup parents-from-children move applied to categorical
    dimensions, so the cube costs one exchange of finest-level partials
    no matter how many grouping sets it reports.
    """
    import pyarrow.compute as pc

    from ..functions.agg import hash_grouped_aggregate

    def lang_tld(b: pa.Table) -> pa.Table:
        host = pc.struct_field(pc.extract_regex(b["url"], HOST_RE), "host")
        tld = pc.struct_field(
            pc.extract_regex(host, r"\.(?P<tld>[a-z]+)$"), "tld"
        )
        return pa.table({"lang": b["lang"], "tld": tld})

    ds = read_pages(sf_dir, columns=["url", "lang"], bundle_files=True).map_batches(
        lang_tld, batch_format="pyarrow", zero_copy_batch=True
    )
    finest = hash_grouped_aggregate(
        ds, ["lang", "tld"], [(None, "count", "n_pages")], final_mode="tree"
    )

    def expand_sets(b: pa.Table) -> pa.Table:
        all_ = pa.array(["ALL"] * b.num_rows, type=pa.string())
        lang, tld, n = b["lang"], b["tld"], b["n_pages"]
        out = pa.concat_tables([
            pa.table({"lang": lang, "tld": tld, "n_pages": n}),
            pa.table({"lang": lang, "tld": all_, "n_pages": n}),
            pa.table({"lang": all_, "tld": tld, "n_pages": n}),
            pa.table({"lang": all_, "tld": all_, "n_pages": n}),
        ])
        g = out.group_by(["lang", "tld"]).aggregate([("n_pages", "sum")])
        return g.rename_columns(["lang", "tld", "n_pages"])

    # finest is one block (tree final): the cube expansion is one task
    return finest.map_batches(
        expand_sets, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    )


def host_crawl_sessions(sf_dir: str, gap_us: int = 6 * 3600 * 1_000_000,
                        num_partitions: int | None = None) -> ray.data.Dataset:
    """Gap-based crawl sessionization of the PAGES table: one row per
    (host, session) with (host, session_id, n_pages, t_start, t_end) —
    the events sessionizer lifted to a string key and the crawl
    timestamp (politeness/burst analysis: how many distinct visits did
    the crawler pay each domain).

    Same co-location contract: a host's pages hash to one partition
    (FNV on the host string), the per-partition kernel is ONE composite
    sort + vectorized gap cumsum over dictionary codes — no per-host
    Python, no window-function barrier.
    """
    import numpy as np
    import pyarrow.compute as pc

    from ..dedup.hashing import fnv1a64_arrow
    from ..functions.agg import cluster_partitions

    if num_partitions is None:
        num_partitions = cluster_partitions()

    def add_part(b: pa.Table) -> pa.Table:
        host = pc.struct_field(pc.extract_regex(b["url"], HOST_RE), "host")
        with np.errstate(over="ignore"):
            part = (fnv1a64_arrow(host) * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(
                num_partitions
            )
        return pa.table({
            "host": host,
            "e": b["warc_ts"].cast(pa.int64()),
            "_part": pa.array(part.astype(np.int64)),
        })

    def sessionize(g: pa.Table) -> pa.Table:
        g = g.sort_by([("host", "ascending"), ("e", "ascending")])
        hcol = g["host"].combine_chunks()
        codes = hcol.dictionary_encode().indices.to_numpy(zero_copy_only=False)
        e = g["e"].to_numpy(zero_copy_only=False)
        if len(e) == 0:
            return pa.table({
                "host": pa.array([], type=pa.string()),
                "session_id": pa.array([], type=pa.int64()),
                "n_pages": pa.array([], type=pa.int64()),
                "t_start": pa.array([], type=pa.int64()),
                "t_end": pa.array([], type=pa.int64()),
            })
        new_host = np.concatenate([[True], codes[1:] != codes[:-1]])
        gap = np.concatenate([[True], (e[1:] - e[:-1]) > gap_us])
        new_session = new_host | gap
        sess_start = np.flatnonzero(new_session)
        sess_host_code = codes[sess_start]
        host_first = np.concatenate([[True], sess_host_code[1:] != sess_host_code[:-1]])
        host_ord = np.cumsum(host_first) - 1
        first_pos = np.flatnonzero(host_first)
        per_host_sid = np.arange(len(sess_start)) - first_pos[host_ord]
        counts = np.add.reduceat(np.ones_like(e), sess_start)
        return pa.table({
            "host": pc.take(hcol, pa.array(sess_start)),
            "session_id": pa.array(per_host_sid),
            "n_pages": pa.array(counts.astype(np.int64)),
            "t_start": pa.array(e[sess_start]),
            "t_end": pa.array(np.maximum.reduceat(e, sess_start)),
        })

    ds = read_pages(sf_dir, columns=["url", "warc_ts"], bundle_files=True).map_batches(
        add_part, batch_format="pyarrow", zero_copy_batch=True, batch_size=BATCH_SIZE
    )
    return ds.groupby("_part").map_groups(sessionize, batch_format="pyarrow")
