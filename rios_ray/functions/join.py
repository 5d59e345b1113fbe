"""Partitioned lookup joins without Ray's join operator.

Ray 2.49's ``Dataset.join`` spins up a pool of hash-aggregator actors
per call — measured multi-second fixed cost per join even on tiny
inputs, and two chained joins serialize their pools.  For the common
case of this engine (attach columns from a side keyed UNIQUELY by the
join key, or semi-join filter against such a side), the same exchange
is expressible as: tag both sides with a deterministic key-hash
partition id, union them (one streamed keyed exchange with exactly
``num_partitions`` groups), and gather within each partition with a
vectorized argsort + searchsorted.  Shuffle volume is identical to a
hash join; the per-call fixed cost is one ``groupby``.

This is the J1 "multi-input alignment" pattern of the reference
(``/root/reference/rios/structures.py:587-616``) applied to relational
keys instead of tile keys.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .agg import hash_partitioned_groups

JOIN_BATCH = 65536


def partitioned_lookup_join(
    left,
    right,
    left_key: str,
    right_key: str,
    left_cols: list[tuple[str, pa.DataType]],
    attach_cols: list[tuple[str, pa.DataType, str]],
    num_partitions: int | None = None,
):
    """Inner lookup join: keep left rows whose ``left_key`` exists in
    ``right`` (keyed uniquely by ``right_key``), attaching each
    ``(right_col, type, out_name)`` in ``attach_cols``.

    ``left_cols`` declares the left columns (name, type) to carry
    through — schemas must be stated up front because the two sides are
    union-ed into one exchange.  With ``attach_cols=[]`` this is a
    distributed semi-join filter.
    """
    l_names = [n for n, _ in left_cols]

    def left_rows(b: pa.Table) -> pa.Table:
        n = b.num_rows
        cols: dict[str, pa.Array | pa.ChunkedArray] = {
            "_key": b[left_key],
            "_side": pa.array(np.ones(n, dtype=np.int8)),
        }
        for name, typ in left_cols:
            cols[name] = b[name].cast(typ) if b[name].type != typ else b[name]
        for rcol, typ, _ in attach_cols:
            cols["_r_" + rcol] = pa.nulls(n, typ)
        return pa.table(cols)

    def right_rows(b: pa.Table) -> pa.Table:
        n = b.num_rows
        cols = {
            "_key": b[right_key],
            "_side": pa.array(np.zeros(n, dtype=np.int8)),
        }
        for name, typ in left_cols:
            cols[name] = pa.nulls(n, typ)
        for rcol, typ, _ in attach_cols:
            cols["_r_" + rcol] = b[rcol].cast(typ) if b[rcol].type != typ else b[rcol]
        return pa.table(cols)

    u = left.map_batches(
        left_rows, batch_format="pyarrow", zero_copy_batch=True, batch_size=JOIN_BATCH
    ).union(
        right.map_batches(
            right_rows,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=JOIN_BATCH,
        )
    )

    def empty() -> pa.Table:
        cols = {n: pa.array([], type=t) for n, t in left_cols}
        for _, typ, out in attach_cols:
            cols[out] = pa.array([], type=typ)
        return pa.table(cols)

    def gather(tbl: pa.Table) -> pa.Table:
        side = tbl["_side"].to_numpy()
        keys = tbl["_key"].to_numpy(zero_copy_only=False)
        ridx = np.flatnonzero(side == 0)
        lidx = np.flatnonzero(side == 1)
        if len(lidx) == 0 or len(ridx) == 0:
            return empty()
        rkeys = keys[ridx]
        rorder = np.argsort(rkeys)
        rsorted = rkeys[rorder]
        lkeys = keys[lidx]
        pos = np.searchsorted(rsorted, lkeys)
        pos_c = np.minimum(pos, len(rsorted) - 1)
        hit = rsorted[pos_c] == lkeys
        lkeep = lidx[hit]
        if len(lkeep) == 0:
            return empty()
        src = ridx[rorder][pos_c[hit]]
        lt = tbl.select(l_names).take(pa.array(lkeep))
        cols = {n: lt[n] for n in l_names}
        for rcol, _, out in attach_cols:
            cols[out] = pc.take(tbl.column("_r_" + rcol).combine_chunks(), pa.array(src))
        return pa.table(cols)

    return hash_partitioned_groups(u, ["_key"], gather, num_partitions)


def partitioned_exists_join(
    left,
    right,
    left_key: str,
    right_key: str,
    left_cols: list[tuple[str, pa.DataType]],
    num_partitions: int | None = None,
    anti: bool = False,
):
    """Distributed EXISTS (semi) / NOT EXISTS (anti) join: keep left
    rows whose ``left_key`` has (``anti=False``) or lacks (``anti=True``)
    at least one match in ``right[right_key]``.

    Unlike :func:`partitioned_lookup_join`, the right side need not be
    keyed uniquely — only membership matters, so right batches are
    deduplicated per batch before the exchange (a combiner: shuffle
    volume is bounded by distinct keys per batch, not right rows).
    """
    l_names = [n for n, _ in left_cols]

    def left_rows(b: pa.Table) -> pa.Table:
        cols: dict[str, pa.Array | pa.ChunkedArray] = {
            "_key": b[left_key],
            "_side": pa.array(np.ones(b.num_rows, dtype=np.int8)),
        }
        for name, typ in left_cols:
            cols[name] = b[name].cast(typ) if b[name].type != typ else b[name]
        return pa.table(cols)

    def right_rows(b: pa.Table) -> pa.Table:
        keys = pc.unique(b[right_key].combine_chunks())
        cols = {
            "_key": keys,
            "_side": pa.array(np.zeros(len(keys), dtype=np.int8)),
        }
        for name, typ in left_cols:
            cols[name] = pa.nulls(len(keys), typ)
        return pa.table(cols)

    u = left.map_batches(
        left_rows, batch_format="pyarrow", zero_copy_batch=True, batch_size=JOIN_BATCH
    ).union(
        right.map_batches(
            right_rows,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=JOIN_BATCH,
        )
    )

    def empty() -> pa.Table:
        return pa.table({n: pa.array([], type=t) for n, t in left_cols})

    def gather(tbl: pa.Table) -> pa.Table:
        side = tbl["_side"].to_numpy()
        keys = tbl["_key"].to_numpy(zero_copy_only=False)
        ridx = np.flatnonzero(side == 0)
        lidx = np.flatnonzero(side == 1)
        if len(lidx) == 0:
            return empty()
        if len(ridx) == 0:
            hit = np.zeros(len(lidx), dtype=bool)
        else:
            rsorted = np.unique(keys[ridx])
            lkeys = keys[lidx]
            pos = np.minimum(np.searchsorted(rsorted, lkeys), len(rsorted) - 1)
            hit = rsorted[pos] == lkeys
        lkeep = lidx[~hit] if anti else lidx[hit]
        if len(lkeep) == 0:
            return empty()
        return tbl.select(l_names).take(pa.array(lkeep))

    return hash_partitioned_groups(u, ["_key"], gather, num_partitions)


def auto_lookup_join(
    left,
    right,
    left_key: str,
    right_key: str,
    left_cols: list[tuple[str, pa.DataType]],
    attach_cols: list[tuple[str, pa.DataType, str]],
    num_partitions: int | None = None,
    broadcast_cap_rows: int = 2_000_000,
):
    """Strategy-selecting lookup join — the q18 broadcast-cap pattern
    generalized: when the (uniquely-keyed) right side fits the cap it
    is collected once, sorted, shipped via ``ray.put`` and joined
    MAP-SIDE with a vectorized ``searchsorted`` — zero shuffle, the
    left stream never moves.  Past the cap it falls back to the
    partitioned union exchange with identical inner-join semantics.

    The cap bounds driver + per-worker memory (rows x row width), not
    correctness; both paths are equality-tested.
    """
    import ray

    right_mat = right.materialize() if hasattr(right, "materialize") else right
    if right_mat.count() > broadcast_cap_rows:
        return partitioned_lookup_join(
            left, right_mat, left_key, right_key, left_cols, attach_cols,
            num_partitions,
        )

    blocks = [t for t in ray.get(right_mat.to_arrow_refs()) if t.num_rows]
    if not blocks:
        # empty right side (a filtered dim matching nothing): inner-join
        # result is empty with the left+attach schema — emit it directly
        # rather than concat-ing zero tables
        names = [n for n, _ in left_cols] + [o for _, _, o in attach_cols]
        types = [t for _, t in left_cols] + [t for _, t, _ in attach_cols]
        empty = pa.table(
            {n: pa.array([], type=t) for n, t in zip(names, types)}
        )

        def drop_all(b: pa.Table) -> pa.Table:
            return empty

        return left.map_batches(
            drop_all, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=65536,
        )
    tbl = pa.concat_tables(blocks)
    keys = tbl[right_key].to_numpy(zero_copy_only=False)
    order = np.argsort(keys)
    sorted_keys = keys[order]
    attach_sorted = {
        rcol: tbl[rcol].combine_chunks().take(pa.array(order)).cast(typ)
        for rcol, typ, _ in attach_cols
    }
    ref = ray.put((sorted_keys, attach_sorted))
    l_names = [n for n, _ in left_cols]

    def map_side(b: pa.Table) -> pa.Table:
        sk, attach = ray.get(ref)
        lk = b[left_key].to_numpy(zero_copy_only=False)
        if len(sk):
            pos = np.searchsorted(sk, lk)
            pos_c = np.minimum(pos, len(sk) - 1)
            hit = sk[pos_c] == lk
        else:
            pos_c = np.zeros(len(lk), dtype=np.int64)
            hit = np.zeros(len(lk), dtype=bool)
        b = b.filter(pa.array(hit))
        out = {n: (b[n].cast(t) if b[n].type != t else b[n]) for n, t in left_cols}
        take = pa.array(pos_c[hit])
        import pyarrow.compute as pc

        for rcol, _, out_name in attach_cols:
            out[out_name] = pc.take(attach[rcol], take)
        return pa.table(out)

    return left.map_batches(
        map_side, batch_format="pyarrow", zero_copy_batch=True, batch_size=65536
    )
