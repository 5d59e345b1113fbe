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
from ..stages.knn import KnnPartialStage, knn_final_merge
from ..stages.pip import PIPJoinStage

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


def spatial_join(sf_dir: str, concurrency=(1, 8), **geo_kwargs) -> ray.data.Dataset:
    """Broadcast PIP join: one output row per (page, containing polygon)."""
    ppath, _ = synth.ensure_polygons()
    polys_ref = ray.put(pq.read_table(ppath))
    ds = geocoded_pages(sf_dir, keep_text=False, **geo_kwargs)
    return ds.map_batches(
        PIPJoinStage,
        fn_constructor_kwargs={"polygons": polys_ref},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=BATCH_SIZE,
        concurrency=concurrency,
    )


def flagship(sf_dir: str) -> ray.data.Dataset:
    """Spatial-join + tiling headline: per-(cell, category) page counts.

    Pre-aggregated per batch (combiner) so the one shuffle moves
    per-batch partials keyed by the same cell id used for tiling.
    """
    from ..functions.agg import grouped_count

    joined = spatial_join(sf_dir)
    return grouped_count(joined, ["cell", "category"], alias="n_pages")


def knn_pages(sf_dir: str, k: int = 10, concurrency=(1, 8)) -> ray.data.Dataset:
    """Exact kNN of every broadcast query point over all pages."""
    qpath = synth.ensure_knn_queries()
    q_ref = ray.put(pq.read_table(qpath))
    ds = geocoded_pages(sf_dir, keep_text=False)
    partial = ds.map_batches(
        KnnPartialStage,
        fn_constructor_kwargs={"queries": q_ref, "k": k},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=BATCH_SIZE,
        concurrency=concurrency,
    )
    return partial.groupby("qid").map_groups(knn_final_merge(k), batch_format="pandas")
