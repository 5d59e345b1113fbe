"""The headline pipelines: pages -> geocode -> cells -> spatial join.

This is the engine's equivalent of the reference's top entry point
``rios.applier.apply`` (``/root/reference/rios/applier.py:861-955``):
plan on the driver, stream blocks through vectorized per-batch
transforms, finalize with a small aggregate.  Every stage is lazy; the
only materialized results are aggregates.
"""

from __future__ import annotations

import pyarrow.parquet as pq
import ray
import ray.data
from ray.data.aggregate import Count

from .. import synth
from ..sources.pages import read_pages
from ..stages.cellassign import (
    DEFAULT_GRID_RES,
    DEFAULT_HEX_RES,
    DEFAULT_S2_LEVEL,
    assign_cells,
)
from ..stages.geocode import extract_text, geocode
from ..stages.knn import KnnPartialStage, knn_final_merge, knn_partial_fn
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
    paths: list[str] | None = None,
) -> ray.data.Dataset:
    """pages -> extract_text (from html, byte-identical) -> geocode -> cells."""
    ds = read_pages(sf_dir, columns=["url", "warc_ts", "html", "lang"], paths=paths)
    ds = ds.map_batches(extract_text, batch_format="pyarrow", zero_copy_batch=True,
                        batch_size=BATCH_SIZE)
    ds = ds.map_batches(geocode, batch_format="pyarrow", zero_copy_batch=True,
                        batch_size=BATCH_SIZE)
    # html served its purpose; drop the heavy binary column before any shuffle
    cols = GEO_COLS if keep_text else [c for c in GEO_COLS if c != "extracted_text"]
    ds = ds.select_columns(cols)
    return ds.map_batches(
        lambda b: assign_cells(b, grid_res, s2_level, hex_res),
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


def flagship(sf_dir: str) -> ray.data.Dataset:
    """Spatial-join + tiling headline: per-(cell, category) page counts.

    Pre-aggregated per batch (combiner) so the one shuffle moves
    per-batch partials keyed by the same cell id used for tiling.
    """
    from ..functions.agg import grouped_count

    joined = spatial_join(sf_dir)
    # tree final: cell x category cardinality is bounded by the grid
    return grouped_count(joined, ["cell", "category"], alias="n_pages",
                         final_mode="tree")


def knn_pages(sf_dir: str, k: int = 10) -> ray.data.Dataset:
    """Exact kNN of every broadcast query point over all pages (task
    pool + per-worker query-matrix cache, see spatial_join)."""
    qpath = synth.ensure_knn_queries()
    q_ref = ray.put(pq.read_table(qpath))
    ds = geocoded_pages(sf_dir, keep_text=False)
    partial = ds.map_batches(
        knn_partial_fn(q_ref, k),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=BATCH_SIZE,
    )
    return partial.groupby("qid").map_groups(knn_final_merge(k), batch_format="pandas")
