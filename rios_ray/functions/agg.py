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
                from ..dedup.hashing import fnv1a64_arrow

                v = fnv1a64_arrow(col)
            h = (h ^ v) * _HASH_MIX
    return (h % np.uint64(num_partitions)).astype(np.int64)


def cluster_partitions() -> int:
    """Default keyed-exchange partition count: ``max(16, 2 x CPUs)`` —
    the historical 16 at test scale, every core busy on a real cluster."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(16, 2 * cpus)


_FINAL_FN = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}


def hash_grouped_aggregate(
    ds,
    keys: list[str],
    aggs: list[tuple[str | None, str, str]],
    num_partitions: int | None = None,
    final_mode: str = "partition",
):
    """General partial+final aggregate: ``aggs`` is a list of
    ``(value_col, fn, alias)`` with fn in {sum, count, min, max}
    (count ignores value_col).  Every combine is pyarrow C++.

    ``final_mode``:

    - ``"partition"`` (default): hash-partition partials on the keys,
      combine per partition — scales to unbounded key cardinality
      (dedup md5s, pair keys).
    - ``"tree"``: gather all partials into one block and combine once —
      no keyed exchange (the sort barrier costs a serial tail, measured
      ~2 s at sf0.5).  Use ONLY when the distinct-key count is bounded
      (grid cells x categories), since the final combine is one task.
    """

    if num_partitions is None:
        num_partitions = cluster_partitions()
    tree = final_mode == "tree"

    def partial(batch: pa.Table) -> pa.Table:
        spec = [
            (([] if fn == "count" else c), "count_all" if fn == "count" else fn)
            for c, fn, _ in aggs
        ]
        g = batch.group_by(keys).aggregate(spec)
        g = g.rename_columns(list(keys) + [a for _, _, a in aggs])
        if tree:
            return g
        return g.append_column("_part", pa.array(_part_of(g, keys, num_partitions)))

    def final(b: pa.Table) -> pa.Table:
        if "_part" in b.column_names:
            b = b.drop_columns(["_part"])
        spec = [(a, _FINAL_FN[fn]) for _, fn, a in aggs]
        g = b.group_by(keys).aggregate(spec)
        return g.rename_columns(list(keys) + [a for _, _, a in aggs])

    # batch_size=None: one partial per input block.  A row-count batch
    # here would also drive Ray's task bundling (min_rows_per_bundle)
    # for the whole FUSED upstream chain — a 64k partial batch was
    # observed to coarsen a 200-block stage into 75 tasks, and on noisy
    # hosts coarse tasks mean stragglers.  Per-block partials keep task
    # granularity at the read-block level and pre-aggregate at least as
    # well (one combine over MORE rows).
    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    if tree:
        return partials.repartition(1).map_batches(
            final, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        )
    # coalesce partial blocks to the partition count before the keyed
    # exchange: the sort shuffle spawns one map + one reduce task per
    # block, so 210 tiny partial blocks cost 420 near-empty tasks of
    # pure dispatch overhead (measured 6 s wall for 0.2 s of work);
    # 16 coalesced blocks -> 32 tasks
    return (
        partials.repartition(num_partitions)
        .groupby("_part")
        .map_groups(final, batch_format="pyarrow")
    )


def hash_partitioned_groups(ds, keys: list[str], partition_fn,
                            num_partitions: int | None = None):
    """Co-locate every key group into one of ``num_partitions`` hash
    partitions, then run ``partition_fn`` ONCE per partition over the
    whole partition table (all groups of that partition at once).

    ``num_partitions=None`` (default) sizes the exchange to the cluster:
    ``max(16, 2 x total CPUs)`` — at test scale that is the historical
    16, on a 256-node cluster it keeps every core busy in the
    per-partition stage.  Results are partition-count-invariant (every
    caller's fn emits per-group output), so this is purely a
    parallelism knob.

    Replacement for ``groupby(keys).map_groups(fn)`` when group count is
    large: Ray's map_groups pays per-group Python overhead (measured
    ~0.1-0.2 ms/group — minutes at web-scale cardinality), while here
    the keyed exchange has exactly P groups and the caller's fn is
    vectorized over all buckets (lexsort + boundary scan / reduceat).
    ``partition_fn`` receives a ``pa.Table`` without the ``_part``
    column and must handle multiple key groups itself.
    """
    if num_partitions is None:
        num_partitions = cluster_partitions()

    def tag(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_part", pa.array(_part_of(batch, keys, num_partitions))
        )

    def run(tbl: pa.Table) -> pa.Table:
        return partition_fn(tbl.drop_columns(["_part"]))

    return (
        ds.map_batches(
            tag, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        )
        .groupby("_part")
        .map_groups(run, batch_format="pyarrow")
    )


def grouped_count(ds, keys: list[str], alias: str = "n", num_partitions: int | None = None,
                  final_mode: str = "partition"):
    """count(*) per key group, pre-aggregated per batch."""
    return hash_grouped_aggregate(
        ds, keys, [(None, "count", alias)], num_partitions, final_mode
    )


def grouped_sum(ds, keys: list[str], value_col: str, alias: str, num_partitions: int | None = None,
                final_mode: str = "partition"):
    """sum(value) per key group, pre-aggregated per batch."""
    return hash_grouped_aggregate(
        ds, keys, [(value_col, "sum", alias)], num_partitions, final_mode
    )


def distributed_topk(ds, k: int, sort_cols: list[str], ascending: list[bool],
                     batch_size: int = 65536):
    """Global top-k under a lexicographic order, without a global sort.

    Per-batch local top-k using the SAME total order as the final merge
    (a value-only cut could discard the tie-winner at the k-th
    boundary), then one tiny single-task merge over at most
    ``k * n_blocks`` surviving rows — the order-statistics analogue of
    pre-aggregate-before-shuffle.  Total order must be deterministic
    (include a unique tie-break column).
    """
    import pandas as pd  # noqa: F401  (batch_format="pandas")

    def local(b):
        return b.sort_values(sort_cols, ascending=ascending, kind="mergesort").head(k)

    def final(b):
        return (
            b.sort_values(sort_cols, ascending=ascending, kind="mergesort")
            .head(k)
            .reset_index(drop=True)
        )

    local_ds = ds.map_batches(local, batch_format="pandas", batch_size=batch_size)
    return local_ds.repartition(1).map_batches(
        final, batch_format="pandas", batch_size=None
    )


def grouped_quantiles(ds, key: str, value_col: str, qs: list[float],
                      num_partitions: int | None = None):
    """Exact per-group discrete quantiles: for every key, the
    ``ceil(q*n) - 1``-th order statistic of ``value_col`` (ANSI
    ``quantile_disc`` semantics) for each q.

    Order statistics are value PICKS, not sums, so the result is
    bitwise engine-independent (no float-reduction-order hazard) —
    exact quantiles stay oracle-checkable where means/sums of floats
    would not.  One keyed exchange co-locates each group; each
    partition does a single composite Arrow sort and a vectorized
    (groups x qs) fancy-index pick — no per-group Python.

    Output: (key, q, value), one row per key per q.
    """
    qs_arr = np.asarray(sorted(qs), dtype=np.float64)

    def per_partition(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return pa.table({key: tbl[key], "q": pa.array([], type=pa.float64()),
                             "value": pa.array([], type=pa.float64())})
        tbl = tbl.sort_by([(key, "ascending"), (value_col, "ascending")])
        kcol = tbl[key].combine_chunks()
        if pa.types.is_string(kcol.type) or pa.types.is_large_string(kcol.type):
            codes = kcol.dictionary_encode().indices.to_numpy(zero_copy_only=False)
        else:
            codes = kcol.to_numpy(zero_copy_only=False)
        new = np.concatenate([[True], codes[1:] != codes[:-1]])
        starts = np.flatnonzero(new)
        n_g = np.diff(np.append(starts, len(codes)))
        vals = tbl[value_col].to_numpy(zero_copy_only=False)
        pick = np.ceil(qs_arr[None, :] * n_g[:, None]).astype(np.int64) - 1
        pick = np.clip(pick, 0, (n_g - 1)[:, None])
        rows = (starts[:, None] + pick).ravel()
        import pyarrow.compute as pc

        out_keys = pc.take(kcol, pa.array(np.repeat(starts, len(qs_arr))))
        return pa.table({
            key: out_keys,
            "q": pa.array(np.tile(qs_arr, len(starts))),
            "value": pa.array(vals[rows], type=pa.float64()),
        })

    return hash_partitioned_groups(ds, [key], per_partition, num_partitions)


def grouped_quantiles_sketch(ds, key: str, value_col: str, qs: list[float],
                             capacity: int = 4096, id_col: str | None = None,
                             num_partitions: int | None = None):
    """Approximate per-group quantiles via a MERGEABLE bottom-k sample.

    Each row gets a u64 hash priority from ``id_col`` (unique per row);
    a group's sketch is its ``capacity`` lowest-priority rows.  Bottom-k
    is closed under merge (min-k of a union = min-k over the parts'
    min-ks), so per-batch partials cap the exchange at
    ``capacity x groups x batches`` rows REGARDLESS of group size — the
    quantile analogue of the HLL distinct sketch, for when
    ``grouped_quantiles``'s full-value exchange is the bottleneck.

    The sample is uniform-without-replacement, so the q-quantile
    estimate is the sample's own ``ceil(q*c)-1`` order statistic
    (rank error O(n/sqrt(c)) whp).  When ``capacity >= n`` for every
    group the sample IS the group and the result equals
    :func:`grouped_quantiles` exactly — the provably-exact
    configuration the driver oracle gates (the IVF nprobe=nlist move).

    Output (key, q, value), one row per group per q.
    """
    qs_arr = np.asarray(sorted(qs), dtype=np.float64)

    def _priorities(col) -> np.ndarray:
        with np.errstate(over="ignore"):
            x = col.to_numpy(zero_copy_only=False).astype(np.uint64)
            x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            return x ^ (x >> np.uint64(31))

    def _codes(kcol) -> np.ndarray:
        kcol = kcol.combine_chunks() if isinstance(kcol, pa.ChunkedArray) else kcol
        if pa.types.is_string(kcol.type) or pa.types.is_large_string(kcol.type):
            return kcol.dictionary_encode().indices.to_numpy(zero_copy_only=False)
        return kcol.to_numpy(zero_copy_only=False)

    def _bottom_k(tbl: pa.Table) -> pa.Table:
        """Keep each group's ``capacity`` lowest-priority rows."""
        codes = _codes(tbl[key])
        prio = tbl["_prio"].to_numpy(zero_copy_only=False)
        order = np.lexsort((prio, codes))
        codes_s = codes[order]
        new = np.concatenate([[True], codes_s[1:] != codes_s[:-1]])
        starts = np.flatnonzero(new)
        sizes = np.diff(np.append(starts, len(codes_s)))
        rank = np.arange(len(codes_s)) - np.repeat(starts, sizes)
        keep = order[rank < capacity]
        return tbl.take(pa.array(np.sort(keep)))

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({
            key: b[key],
            "_prio": pa.array(_priorities(b[id_col])),
            "value": b[value_col],
        })
        return _bottom_k(t)

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )

    def finish(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return pa.table({key: tbl[key], "q": pa.array([], type=pa.float64()),
                             "value": pa.array([], type=pa.float64())})
        tbl = _bottom_k(tbl)  # merge: min-k over the union of partials
        tbl = tbl.sort_by([(key, "ascending"), ("value", "ascending")])
        kcol = tbl[key].combine_chunks()
        codes = _codes(kcol)
        new = np.concatenate([[True], codes[1:] != codes[:-1]])
        starts = np.flatnonzero(new)
        n_g = np.diff(np.append(starts, len(codes)))
        vals = tbl["value"].to_numpy(zero_copy_only=False)
        pick = np.ceil(qs_arr[None, :] * n_g[:, None]).astype(np.int64) - 1
        pick = np.clip(pick, 0, (n_g - 1)[:, None])
        rows = (starts[:, None] + pick).ravel()
        import pyarrow.compute as pc

        out_keys = pc.take(kcol, pa.array(np.repeat(starts, len(qs_arr))))
        return pa.table({
            key: out_keys,
            "q": pa.array(np.tile(qs_arr, len(starts))),
            "value": pa.array(vals[rows], type=pa.float64()),
        })

    return hash_partitioned_groups(partials, [key], finish, num_partitions)


# --- exact (order-independent) float summation -----------------------------
#
# Distributed float sums are normally not reproducible: IEEE addition is
# not associative, so partial-sum order changes the last bits and no SQL
# oracle can mirror them.  This aggregate makes the sum EXACT and
# therefore order-free: each double v = m * 2^e (np.frexp) is an exact
# integer mantissa at a power-of-two scale, so per (group, exponent)
# bucket the mantissas accumulate in arbitrary-precision integers with
# NO rounding at all.  The bucket dict is a tiny, exactly-mergeable
# combiner state (<= ~2100 exponents, ~60 in practice), and the final
# correctly-rounded double equals math.fsum / DuckDB's fsum regardless
# of partitioning — verified bit-for-bit in tests.


def _mantissa_buckets(vals: np.ndarray, seg_starts: np.ndarray,
                      seg_ends: np.ndarray):
    """Per segment: {exponent: exact integer mantissa sum} for the
    float64 slice vals[s:e].  Vectorized: one frexp, one lexsort-free
    per-segment argsort by exponent, chunked int64 reduceat (512 x 2^53
    < 2^63, no overflow) and a bounded Python merge over CHUNKS (not
    rows)."""
    out = []
    m, e = np.frexp(vals)
    m2 = np.round(m * 9007199254740992.0).astype(np.int64)  # m * 2^53, exact
    e2 = e.astype(np.int64) - 53
    for s, t in zip(seg_starts, seg_ends):
        if t <= s:
            out.append({})
            continue
        seg_m, seg_e = m2[s:t], e2[s:t]
        order = np.argsort(seg_e, kind="stable")
        se, sm = seg_e[order], seg_m[order]
        bounds = np.flatnonzero(np.diff(se)) + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [len(se)]])
        d: dict[int, int] = {}
        for a, b in zip(starts, ends):
            # chunked exact reduction: int64 partials over <=512 values
            # (512 * 2^53 < 2^63); slice FIRST — reduceat's last slice
            # otherwise runs to the end of the whole array
            chunk = sm[a:b]
            partial = np.add.reduceat(chunk, np.arange(0, len(chunk), 512))
            d[int(se[a])] = d.get(int(se[a]), 0) + sum(int(x) for x in partial)
        out.append(d)
    return out


def _buckets_to_float(d: dict[int, int]) -> float:
    """Correctly-rounded double of the EXACT value sum(m * 2^e) — equal
    to math.fsum of the original values (Fraction -> float rounds
    once)."""
    from fractions import Fraction

    total = Fraction(0)
    for e, mm in d.items():
        total += Fraction(mm) * Fraction(2) ** e
    return float(total)


def grouped_exact_float_sum(
    ds, keys: list[str], value_col: str,
    out_sum: str = "sum_value", out_n: str = "n",
    num_partitions: int | None = None,
):
    """(keys..., out_sum, out_n): per-group float64 sum that is
    BIT-IDENTICAL to ``math.fsum`` over the group's values, independent
    of batch/partition order — the reproducible float aggregate a
    DuckDB ``fsum`` oracle can gate on well-conditioned data (module
    comment has the Kahan caveat; plain SUM is gateable never).

    Finite values only (an Inf/NaN would need a sticky flag, not a
    mantissa bucket).  Per-batch partials emit one (keys, exponent,
    mantissa-sum bigint as decimal string) row per occupied exponent
    bucket (~60/group); the
    keyed exchange merges buckets exactly; the final rounds ONCE.
    Means follow as ``out_sum / out_n`` — a single IEEE division both
    engines share.
    """
    def partial(b: pa.Table) -> pa.Table:
        import pandas as pd

        empty_schema = pa.schema(
            [(k, b.schema.field(k).type) for k in keys]
            + [("_exp", pa.int64()), ("_mant", pa.string()), ("_n", pa.int64())]
        )
        if b.num_rows == 0:
            return empty_schema.empty_table()
        df_keys = [b[k].to_numpy(zero_copy_only=False) for k in keys]
        vals = b[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        codes, uniq = pd.factorize(
            pd.MultiIndex.from_arrays(df_keys) if len(keys) > 1
            else pd.Index(df_keys[0]),
            sort=False,
        )
        if (codes < 0).any():
            # factorize encodes null keys as -1; uniq[-1] would silently
            # fold their mantissa buckets into the batch's LAST group
            # (and the merge's pandas groupby would then drop the null
            # group anyway).  Exact sums over null keys are undefined
            # here — fail loudly instead of corrupting a real group.
            raise ValueError(
                f"grouped_exact_float_sum: null values in key column(s) "
                f"{keys}; drop or fill nulls before aggregating"
            )
        order = np.argsort(codes, kind="stable")
        cs = codes[order]
        bounds = np.flatnonzero(np.diff(cs)) + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [len(cs)]])
        dicts = _mantissa_buckets(vals[order], starts, ends)
        rows = []
        for gi, (s, d) in enumerate(zip(starts, dicts)):
            kv = uniq[cs[s]]
            kv = kv if len(keys) > 1 else (kv,)
            # _n rides on the FIRST exponent row of each (batch, group)
            # only, so the merge can plain-sum it
            for j, (e, mm) in enumerate(d.items()):
                rows.append(
                    {**{k: v for k, v in zip(keys, kv)},
                     "_exp": e, "_mant": str(mm),
                     "_n": int(ends[gi] - s) if j == 0 else 0}
                )
        schema = pa.schema(
            [(k, b.schema.field(k).type) for k in keys]
            + [("_exp", pa.int64()), ("_mant", pa.string()), ("_n", pa.int64())]
        )
        return pa.Table.from_pylist(rows, schema=schema)

    parts = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=65536,
    )

    def merge(tbl: pa.Table) -> pa.Table:
        df = tbl.to_pandas()
        out_rows = []
        for kv, g in df.groupby(keys, sort=False):
            kv = kv if isinstance(kv, tuple) else (kv,)
            d: dict[int, int] = {}
            for e, mm in zip(g["_exp"], g["_mant"]):
                d[int(e)] = d.get(int(e), 0) + int(mm)
            out_rows.append(
                {**{k: v for k, v in zip(keys, kv)},
                 out_sum: _buckets_to_float(d), out_n: int(g["_n"].sum())}
            )
        out_schema = pa.schema(
            [(k, tbl.schema.field(k).type) for k in keys]
            + [(out_sum, pa.float64()), (out_n, pa.int64())]
        )
        return pa.Table.from_pylist(out_rows, schema=out_schema)

    return hash_partitioned_groups(parts, keys, merge,
                                   num_partitions=num_partitions)


def global_int_sum(ds, col: str) -> int:
    """Driver-side exact global sum of an int64 column: one-row
    per-block partials, pulled to the driver (bounded by block count).
    A zero-block dataset (possible after an empty keyed exchange — its
    empty frame has no columns at all) sums to 0, not KeyError."""
    import pyarrow as pa

    def partial(b: pa.Table) -> pa.Table:
        return pa.table({"t": pa.array(
            [int(b[col].to_numpy(zero_copy_only=False).sum())],
            type=pa.int64())})

    t = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=None).to_pandas()
    return int(t["t"].sum()) if "t" in t.columns and len(t) else 0


def global_int_max(ds, col: str) -> int | None:
    """Driver-side exact global max of an int64 column (same bounded
    per-block-partial shape as :func:`global_int_sum`).  Returns None
    on an empty/zero-block dataset."""
    import numpy as np
    import pyarrow as pa

    sentinel = np.iinfo(np.int64).min

    def partial(b: pa.Table) -> pa.Table:
        v = b[col].to_numpy(zero_copy_only=False)
        m = int(v.max()) if len(v) else sentinel
        return pa.table({"m": pa.array([m], type=pa.int64())})

    t = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=None).to_pandas()
    if "m" not in t.columns or not len(t):
        return None
    best = int(t["m"].max())
    return None if best == sentinel else best
