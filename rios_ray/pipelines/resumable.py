"""Checkpoint-resumable flagship: per-shard partial aggregates + final
combine.

The expensive part of the flagship pipeline (html extract -> geocode ->
cell assign -> PIP broadcast join) is checkpointed at input-shard
granularity: each shard writes its *partial* (cell, category, n_pages)
counts to ``out_dir/part=<shard>/`` with a lineage record; the final
combine re-aggregates the partials — associative, so a resumed run is
bit-identical to a fresh one.  (Counts pre-aggregate per shard exactly
like the reference's single-pass stats partials merge associatively,
``/root/reference/rios/calcstats.py:656-692``.)

A crashed run re-executes only partitions without lineage records; the
re-aggregate reads committed parquet, never recomputes the join.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import ray
import ray.data

from .. import synth
from ..functions.agg import grouped_count
from ..runtime import run_resumable, shard_partitions
from ..stages.pip import pip_join_fn
from .pages import BATCH_SIZE, geocoded_pages


def _build_shard_partials(sf_dir: str, polys_ref):
    def build(name: str, inputs: list[str]) -> ray.data.Dataset:
        ds = geocoded_pages(sf_dir, keep_text=False, paths=inputs, families=("grid",))
        joined = ds.map_batches(
            pip_join_fn(polys_ref),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=BATCH_SIZE,
        )
        return grouped_count(joined, ["cell", "category"], alias="n_pages")

    return build


def resumable_flagship(sf_dir: str, out_dir: str) -> dict:
    """Run (or resume) the flagship at shard granularity.  Returns the
    run_resumable result dict (ran/skipped/manifest/collector)."""
    pages_dir = synth.ensure_pages(sf_dir)
    ppath, _ = synth.ensure_polygons()
    polys_ref = ray.put(pq.read_table(ppath))
    partitions = shard_partitions(pages_dir)
    return run_resumable(
        partitions,
        _build_shard_partials(sf_dir, polys_ref),
        out_dir,
        stage="flagship_partials",
    )


def finalize_flagship(out_dir: str) -> ray.data.Dataset:
    """Combine committed per-shard partials into the global counts."""
    import glob

    files = sorted(
        glob.glob(os.path.join(out_dir, "part=*", "**", "*.parquet"), recursive=True)
    )
    ds = ray.data.read_parquet(files)
    from ..functions.agg import grouped_sum

    return grouped_sum(ds, ["cell", "category"], "n_pages", "n_pages",
                       final_mode="tree")
