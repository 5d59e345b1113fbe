"""Skew handling: salted shuffles + per-cell fan-out caps.

The geocoded web corpus is deliberately skewed (synth.gen_latlon: 50%
of pages land in 20 city-like clusters, cluster 0 hottest — the
BASELINE north rule's "hot cells").  Two mechanisms, composable:

- **Combiner-first aggregates** (functions/agg.py) make counts/sums
  skew-immune: a hot cell contributes at most one partial row per
  batch, so no reducer ever sees the hot cell's raw rows.
- **Per-cell fan-out caps** (this module) bound operators whose output
  is proportional to group size (tile materialization, candidate
  generation, per-cell sampling).  The cap is applied in THREE stages:
  per-batch (no shuffle, bounds what enters the exchange), then per
  (cell, salt) group, then per cell — so the largest group any reducer
  materializes is ``cap * n_salts`` rows for the salted stage and
  ``cap * n_salts`` for the final, regardless of how hot the cell is.
  Selection is deterministic (smallest ``order_col`` values win), so
  engine and SQL oracle agree row-for-row.

This is the RD mapping of SURVEY §4 "salt hot cells, per-cell fan-out
caps" (no reference counterpart: RIOS assumes equal-cost blocks,
``/root/reference/rios/computemanager.py:115``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

DEFAULT_SALTS = 8


def head_per_key(table: pa.Table, key_col: str, cap: int, order_col: str) -> pa.Table:
    """Keep the ``cap`` rows with smallest ``order_col`` per key
    (vectorized: one sort + run-length positions, no Python per group)."""
    if table.num_rows == 0:
        return table
    tbl = table.sort_by([(key_col, "ascending"), (order_col, "ascending")])
    keys = tbl[key_col].to_numpy(zero_copy_only=False)
    new_run = np.concatenate([[True], keys[1:] != keys[:-1]])
    run_id = np.cumsum(new_run) - 1
    run_start = np.flatnonzero(new_run)
    pos_in_run = np.arange(len(keys)) - run_start[run_id]
    return tbl.filter(pa.array(pos_in_run < cap))


def ranked_head_per_key(
    table: pa.Table,
    key_col: str,
    n: int,
    sort_keys: list[tuple[str, str]],
    rank_col: str = "rank",
) -> pa.Table:
    """ROW_NUMBER()-style per-key top-N with a composite ordering.

    Keeps the first ``n`` rows of every key under ``sort_keys`` (a list
    of ``(col, "ascending" | "descending")``) and appends a 1-based
    ``rank_col``.  Vectorized like :func:`head_per_key`: one Arrow C++
    composite sort, then run-length rank positions — string keys are
    dictionary-encoded (post-sort, so equal neighbors share a code)
    rather than materialized as Python objects.

    Used inside a ``hash_partitioned_groups`` stage, this is the
    distributed window-function ``ROW_NUMBER() OVER (PARTITION BY key
    ORDER BY ...) <= n``.
    """
    if table.num_rows == 0:
        return table.append_column(rank_col, pa.array([], type=pa.int64()))
    tbl = table.sort_by([(key_col, "ascending")] + list(sort_keys))
    col = tbl[key_col]
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
        keys = col.dictionary_encode().indices.to_numpy(zero_copy_only=False)
    else:
        keys = col.to_numpy(zero_copy_only=False)
    new_run = np.concatenate([[True], keys[1:] != keys[:-1]])
    run_id = np.cumsum(new_run) - 1
    run_start = np.flatnonzero(new_run)
    pos_in_run = np.arange(len(keys)) - run_start[run_id]
    tbl = tbl.append_column(rank_col, pa.array(pos_in_run + 1, type=pa.int64()))
    return tbl.filter(pa.array(pos_in_run < n))


def _salt_of(order_vals: np.ndarray, n_salts: int) -> np.ndarray:
    """Deterministic salt from the order column (spreads a hot key's
    rows across ``n_salts`` subgroups)."""
    from ..dedup.hashing import fnv1a64

    if order_vals.dtype.kind in "iu":
        with np.errstate(over="ignore"):
            h = order_vals.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    else:
        h = fnv1a64([str(v) for v in order_vals])
    return (h % np.uint64(n_salts)).astype(np.int64)


def capped_per_key(
    ds,
    key_col: str,
    cap: int,
    order_col: str,
    n_salts: int = DEFAULT_SALTS,
    num_partitions: int = 16,
):
    """Distributed deterministic per-key fan-out cap.

    Three-stage cap: per batch, per (key, salt), per key.  The result
    is exactly the ``cap`` smallest-``order_col`` rows of every key.

    Stages 2 and 3 are *partition*-vectorized: rows are exchanged on a
    small ``_part`` hash column (P groups, so ``groupby(_part)`` pays
    per-group overhead P times, not once per key — the same lesson as
    functions/agg.py), and the cap inside a partition is one sort + one
    run-length filter over the whole block.  Stage 2 partitions on
    (key, salt) so a hot key's rows split ``n_salts`` ways before any
    single task must hold them; stage 3 partitions on key alone, by
    which point each key carries at most ``cap * n_salts`` rows.
    """

    def batch_cap(b: pa.Table) -> pa.Table:
        b = head_per_key(b, key_col, cap, order_col)
        keys = b[key_col].to_numpy(zero_copy_only=False)
        order_vals = b[order_col].to_numpy(zero_copy_only=False)
        salt = _salt_of(order_vals, n_salts)
        with np.errstate(over="ignore"):
            part = (
                (keys.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15) + salt.astype(np.uint64))
                % np.uint64(num_partitions * n_salts)
            ).astype(np.int64)
        return b.append_column("_part", pa.array(part))

    def salted_cap(g: pa.Table) -> pa.Table:
        g = head_per_key(g, key_col, cap, order_col)
        keys = g[key_col].to_numpy(zero_copy_only=False)
        with np.errstate(over="ignore"):
            part = (
                keys.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                % np.uint64(num_partitions)
            ).astype(np.int64)
        return g.set_column(g.schema.get_field_index("_part"), "_part", pa.array(part))

    def final_cap(g: pa.Table) -> pa.Table:
        g = head_per_key(g, key_col, cap, order_col)
        return g.drop_columns(["_part"])

    capped = ds.map_batches(
        batch_cap, batch_format="pyarrow", zero_copy_batch=True, batch_size=65536
    )
    salted = capped.groupby("_part").map_groups(salted_cap, batch_format="pyarrow")
    return salted.groupby("_part").map_groups(final_cap, batch_format="pyarrow")
