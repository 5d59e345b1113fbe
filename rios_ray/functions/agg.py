"""Pre-aggregated (combiner) group-bys.

A bare ``groupby(keys).aggregate(...)`` shuffles every row.  These
helpers combine inside ``map_batches`` first (one row per key per
batch — the associative-partial pattern of the reference's single-pass
stats, ``/root/reference/rios/calcstats.py:656-675``), so the all-to-all
exchange moves per-batch partials, not data."""

from __future__ import annotations

import pyarrow as pa
from ray.data.aggregate import Sum


def grouped_count(ds, keys: list[str], alias: str = "n"):
    """count(*) per key group, pre-aggregated per batch."""

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(keys).aggregate([([], "count_all")])
        return g.rename_columns(list(keys) + ["__pc"])

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=65536)
    return partials.groupby(keys).aggregate(Sum("__pc", alias_name=alias))


def grouped_sum(ds, keys: list[str], value_col: str, alias: str):
    """sum(value) per key group, pre-aggregated per batch."""

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(keys).aggregate([(value_col, "sum")])
        return g.rename_columns(list(keys) + ["__ps"])

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=65536)
    return partials.groupby(keys).aggregate(Sum("__ps", alias_name=alias))
