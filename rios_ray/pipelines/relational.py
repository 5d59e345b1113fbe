"""Relational pipelines over the TPC-H-style side tables.

These exercise the engine's generic query surface — column-pruned
reads, broadcast dimension joins, hash equi-joins, vectorized grouped
aggregates, top-k — on the driver-provided tables (TESTDATA.md).

Money math: price columns are float64 with cent precision; float sums
are not associativity-stable across engines, so every monetary
aggregate is computed in *integer cents* via ``floor(x*100 + 0.5)`` —
the same IEEE expression on both the numpy and SQL sides, making sums
bit-exact regardless of reduction order.  (numpy ``round`` is
banker's-rounding and DuckDB ``round`` is half-away — neither is used.)

Join strategy mirrors the 100 TB plan: small dimensions (region,
nation, customer-at-test-scale) broadcast via ``ray.put`` and map-side
hash lookup; the big fact-to-fact join (orders x lineitem) is the
partitioned union exchange of ``functions/join.py`` — hash-join shuffle
volume without Ray's join-operator actor-pool fixed cost — with
partitions sized to the session.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

from ..functions.agg import hash_grouped_aggregate

BATCH = 65536


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    return ray.data.read_parquet(
        os.path.join(sf_dir, f"{table}.parquet"), columns=columns
    )


def _cents(x: np.ndarray) -> np.ndarray:
    return np.floor(x * 100.0 + 0.5).astype(np.int64)


def _join_partitions() -> int:
    """Partition count for the fact-fact exchanges: the cluster-sized
    default every other exchange uses (max(16, 2 x CPUs) — measured on
    q5 at 32 cpus: 16 partitions 7.4 s, 64 partitions 5.0 s)."""
    from ..functions.agg import cluster_partitions

    return cluster_partitions()


def q1_pricing_summary(sf_dir: str, ship_before: str = "2000-09-01") -> ray.data.Dataset:
    """Q1-style: per (returnflag, linestatus) totals for lines shipped
    before the cutoff.  All sums in integer units (qty is whole;
    revenue in cents)."""
    cutoff = np.datetime64(ship_before, "us").astype(np.int64)

    def prep(b: pa.Table) -> pa.Table:
        ship = b["l_shipdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        keep = ship < cutoff
        b = b.filter(pa.array(keep))
        qty = b["l_quantity"].to_numpy(zero_copy_only=False)
        price = b["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = b["l_discount"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "l_returnflag": b["l_returnflag"],
                "l_linestatus": b["l_linestatus"],
                "qty": pa.array(qty.astype(np.int64)),
                "base_cents": pa.array(_cents(price)),
                "disc_cents": pa.array(_cents(price * (1.0 - disc))),
            }
        )

    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
         "l_discount", "l_shipdate"],
    ).map_batches(prep, batch_format="pyarrow", zero_copy_batch=True, batch_size=BATCH)
    return hash_grouped_aggregate(
        ds,
        ["l_returnflag", "l_linestatus"],
        [
            ("qty", "sum", "sum_qty"),
            ("base_cents", "sum", "sum_base_cents"),
            ("disc_cents", "sum", "sum_disc_cents"),
            (None, "count", "count_order"),
        ],
    )


def q3_top_orders(
    sf_dir: str, segment: str = "BUILDING", k: int = 10
) -> ray.data.Dataset:
    """Q3-style: top-k orders by discounted revenue for one market
    segment.  customer filter broadcast; orders x lineitem is the hash
    shuffle join; final top-k on the (small) aggregate."""
    import pyarrow.compute as pc

    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_mktsegment"]
    )
    keys = cust.filter(pc.equal(cust["c_mktsegment"], segment))["c_custkey"].to_numpy()
    keys_ref = ray.put(np.sort(keys))

    def filter_orders(b: pa.Table) -> pa.Table:
        wanted = ray.get(keys_ref)
        ck = b["o_custkey"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(wanted, ck)
        pos[pos >= len(wanted)] = 0
        keep = wanted[pos] == ck if len(wanted) else np.zeros(len(ck), dtype=bool)
        return b.filter(pa.array(keep)).select(["o_orderkey", "o_orderdate"])

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        filter_orders, batch_format="pyarrow", zero_copy_batch=True, batch_size=BATCH
    )

    def prep_li(b: pa.Table) -> pa.Table:
        price = b["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = b["l_discount"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "l_orderkey": b["l_orderkey"],
                "rev_cents": pa.array(_cents(price * (1.0 - disc))),
            }
        )

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"]).map_batches(
        prep_li, batch_format="pyarrow", zero_copy_batch=True, batch_size=BATCH
    )
    # semi-join filter: keep lineitems whose order survives the segment
    # filter (partitioned union exchange, see functions/join.py)
    from ..functions.join import partitioned_lookup_join

    joined = partitioned_lookup_join(
        li,
        orders,
        "l_orderkey",
        "o_orderkey",
        [("l_orderkey", pa.int64()), ("rev_cents", pa.int64())],
        [],
        _join_partitions(),
    )
    per_order = hash_grouped_aggregate(
        joined,
        ["l_orderkey"],
        [("rev_cents", "sum", "revenue_cents")],
    )
    # distributed top-k: per-batch local cut + one tiny merge (no
    # driver-side materialization of the per-order aggregate, which is
    # one row per order at scale)
    from ..functions.agg import distributed_topk

    return distributed_topk(
        per_order, k, ["revenue_cents", "l_orderkey"], [False, True]
    )


def q14_type_revenue(sf_dir: str) -> ray.data.Dataset:
    """Q14-style: discounted revenue + line count per part type.

    The ``part`` dimension broadcasts once (``ray.put`` of a sorted key
    array + dictionary-coded types); the lineitem scan is pruned to 3
    columns and aggregates map-side — no shuffle beyond the tiny final
    combine.  At 100 TB the part table is still the broadcast side
    (it grows with catalog size, not with page count)."""
    part = pq.read_table(
        os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_type"]
    )
    pkeys = part["p_partkey"].to_numpy()
    order = np.argsort(pkeys)
    tdict = part["p_type"].combine_chunks().dictionary_encode()
    type_names = tdict.dictionary.to_pylist()
    type_codes = tdict.indices.to_numpy().astype(np.int32)
    bcast = ray.put((pkeys[order], type_codes[order], type_names))

    def tag(b: pa.Table) -> pa.Table:
        skeys, codes, names = ray.get(bcast)
        lk = b["l_partkey"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(skeys, lk)
        pos_c = np.minimum(pos, len(skeys) - 1)
        hit = skeys[pos_c] == lk
        b = b.filter(pa.array(hit))
        price = b["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = b["l_discount"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "p_type": pa.DictionaryArray.from_arrays(
                    pa.array(codes[pos_c[hit]]), pa.array(names, type=pa.string())
                ).cast(pa.string()),
                "rev_cents": pa.array(_cents(price * (1.0 - disc))),
            }
        )

    ds = _read(
        sf_dir, "lineitem", ["l_partkey", "l_extendedprice", "l_discount"]
    ).map_batches(tag, batch_format="pyarrow", zero_copy_batch=True, batch_size=BATCH)
    return hash_grouped_aggregate(
        ds,
        ["p_type"],
        [("rev_cents", "sum", "revenue_cents"), (None, "count", "n_lines")],
        final_mode="tree",  # bounded key count (part types)
    )


def q6_forecast_revenue(
    sf_dir: str,
    ship_from: str = "1996-01-01",
    ship_to: str = "1997-01-01",
    disc_lo: float = 0.05,
    disc_hi: float = 0.07,
    max_qty: float = 24.0,
) -> ray.data.Dataset:
    """Q6-style forecast-revenue delta: SUM(price * discount) over lines
    in a one-year ship window with discount in [lo, hi] and quantity
    below the cap.  The canonical scan-heavy filtered global aggregate:
    a 4-column pruned read, per-batch boolean mask + cents partial sum,
    then a single-row merge — no keyed exchange at all (the reduction is
    a scalar, so the combine is ``repartition(1)`` over one-row
    partials, never a groupby).  Cents math as in module docstring;
    the discount bounds compare float64-to-float64 with the identical
    literals on the SQL side."""
    lo_us = np.datetime64(ship_from, "us").astype(np.int64)
    hi_us = np.datetime64(ship_to, "us").astype(np.int64)

    def partial(b: pa.Table) -> pa.Table:
        ship = b["l_shipdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        disc = b["l_discount"].to_numpy(zero_copy_only=False)
        qty = b["l_quantity"].to_numpy(zero_copy_only=False)
        keep = (
            (ship >= lo_us) & (ship < hi_us)
            & (disc >= disc_lo) & (disc <= disc_hi) & (qty < max_qty)
        )
        price = b["l_extendedprice"].to_numpy(zero_copy_only=False)[keep]
        return pa.table(
            {
                "revenue_cents": pa.array(
                    [int(_cents(price * disc[keep]).sum())], type=pa.int64()
                ),
                "n_lines": pa.array([int(keep.sum())], type=pa.int64()),
            }
        )

    ds = _read(
        sf_dir,
        "lineitem",
        ["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
    ).map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)

    def merge(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "revenue_cents": pa.array(
                    [int(b["revenue_cents"].to_numpy(zero_copy_only=False).sum())],
                    type=pa.int64(),
                ),
                "n_lines": pa.array(
                    [int(b["n_lines"].to_numpy(zero_copy_only=False).sum())],
                    type=pa.int64(),
                ),
            }
        )

    return ds.repartition(1).map_batches(
        merge, batch_format="pyarrow", batch_size=None
    )


def q5_nation_revenue(sf_dir: str) -> ray.data.Dataset:
    """Q5-style: discounted revenue per (region, nation) where customer
    and supplier share the nation.  All dimensions broadcast (nation /
    region / supplier / customer are the small side at any scale that
    fits a worker heap; the lineitem scan streams); orders x lineitem
    is the shuffle join."""
    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet"))
    region = pq.read_table(os.path.join(sf_dir, "region.parquet"))
    supp = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"), columns=["s_suppkey", "s_nationkey"]
    )
    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_nationkey"]
    )
    # Broadcast sorted key arrays + dense nation/region name tables —
    # every per-batch lookup below is searchsorted / fancy-index, no
    # per-row Python (same pattern as q14's part tagging).
    nkey = nation["n_nationkey"].to_numpy()
    n_max = int(nkey.max()) + 1
    nat_names = [""] * n_max
    for k, nm in zip(nkey, nation["n_name"].to_pylist()):
        nat_names[int(k)] = nm
    nat2reg = np.zeros(n_max, dtype=np.int32)
    nat2reg[nkey] = nation["n_regionkey"].to_numpy().astype(np.int32)
    rkey = region["r_regionkey"].to_numpy()
    reg_names = [""] * (int(rkey.max()) + 1)
    for k, nm in zip(rkey, region["r_name"].to_pylist()):
        reg_names[int(k)] = nm

    skeys = supp["s_suppkey"].to_numpy()
    s_ord = np.argsort(skeys)
    ckeys = cust["c_custkey"].to_numpy()
    c_ord = np.argsort(ckeys)
    dims_ref = ray.put(
        (
            skeys[s_ord],
            supp["s_nationkey"].to_numpy()[s_ord].astype(np.int32),
            ckeys[c_ord],
            cust["c_nationkey"].to_numpy()[c_ord].astype(np.int32),
            nat2reg,
            nat_names,
            reg_names,
        )
    )

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])

    def prep_li(b: pa.Table) -> pa.Table:
        price = b["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = b["l_discount"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "l_orderkey": b["l_orderkey"],
                "l_suppkey": b["l_suppkey"],
                "rev_cents": pa.array(_cents(price * (1.0 - disc))),
            }
        )

    li = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]
    ).map_batches(prep_li, batch_format="pyarrow", zero_copy_batch=True, batch_size=BATCH)
    from ..functions.join import partitioned_lookup_join

    joined = partitioned_lookup_join(
        li,
        orders,
        "l_orderkey",
        "o_orderkey",
        [("l_suppkey", pa.int64()), ("rev_cents", pa.int64())],
        [("o_custkey", pa.int64(), "o_custkey")],
        _join_partitions(),
    )

    def tag(b: pa.Table) -> pa.Table:
        sk_s, sn_s, ck_s, cn_s, nat2reg_, nat_names_, reg_names_ = ray.get(dims_ref)
        sk = b["l_suppkey"].to_numpy(zero_copy_only=False)
        ck = b["o_custkey"].to_numpy(zero_copy_only=False)
        sp = np.minimum(np.searchsorted(sk_s, sk), len(sk_s) - 1)
        sn = np.where(sk_s[sp] == sk, sn_s[sp], -1).astype(np.int32)
        cp = np.minimum(np.searchsorted(ck_s, ck), len(ck_s) - 1)
        cn = np.where(ck_s[cp] == ck, cn_s[cp], -2).astype(np.int32)
        keep = sn == cn
        b = b.filter(pa.array(keep))
        sn = sn[keep]
        return pa.table(
            {
                "r_name": pa.DictionaryArray.from_arrays(
                    pa.array(nat2reg_[sn]), pa.array(reg_names_, type=pa.string())
                ).cast(pa.string()),
                "n_name": pa.DictionaryArray.from_arrays(
                    pa.array(sn), pa.array(nat_names_, type=pa.string())
                ).cast(pa.string()),
                "rev_cents": b["rev_cents"],
            }
        )

    tagged = joined.map_batches(
        tag, batch_format="pyarrow", zero_copy_batch=True, batch_size=BATCH
    )
    return hash_grouped_aggregate(
        tagged, ["r_name", "n_name"], [("rev_cents", "sum", "revenue_cents")]
    )


def q18_big_orders(
    sf_dir: str, min_qty: int = 200, broadcast_cap: int = 5_000_000
) -> ray.data.Dataset:
    """Q18-style: orders whose total lineitem quantity exceeds
    ``min_qty``, with customer key and order date.

    The HAVING + back-join shape: per-order quantity totals via the
    combiner-first aggregate, the HAVING filter applied partition-side
    (only survivors leave the exchange), and the filtered key->total
    map broadcast to filter/annotate the orders table — the HAVING
    result is the small side by construction (the threshold exists to
    make it selective), so the back-join is shuffle-free.

    A low threshold breaks that assumption, so the survivor count is
    checked first (cheap: ``big`` is already the aggregated exchange
    output, materialized once); past ``broadcast_cap`` rows the
    back-join falls back to the partitioned lookup join instead of a
    driver-side broadcast table.
    """
    import pyarrow.compute as pc

    from ..functions.agg import hash_grouped_aggregate

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": b["l_orderkey"],
                "qty": pc.cast(b["l_quantity"], pa.int64()),
            }
        )

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"]).map_batches(
        prep, batch_format="pyarrow", zero_copy_batch=True, batch_size=BATCH
    )
    per_order = hash_grouped_aggregate(li, ["l_orderkey"], [("qty", "sum", "total_qty")])

    def having(b: pa.Table) -> pa.Table:
        return b.filter(pc.greater(b["total_qty"], min_qty))

    big_ds = per_order.map_batches(
        having, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    ).materialize()
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
    if big_ds.count() > broadcast_cap:
        from ..functions.join import partitioned_lookup_join

        return partitioned_lookup_join(
            orders,
            big_ds,
            "o_orderkey",
            "l_orderkey",
            [
                ("o_orderkey", pa.int64()),
                ("o_custkey", pa.int64()),
                ("o_orderdate", pa.timestamp("us")),
            ],
            [("total_qty", pa.int64(), "total_qty")],
            _join_partitions(),
        )

    big = big_ds.to_pandas()
    keys = np.sort(big["l_orderkey"].to_numpy())
    totals = big.set_index("l_orderkey")["total_qty"]
    totals_sorted = totals.loc[keys].to_numpy()
    ref = ray.put((keys, totals_sorted))

    def annotate(b: pa.Table) -> pa.Table:
        wanted, tq = ray.get(ref)
        ok = b["o_orderkey"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(wanted, ok)
        pos_c = np.minimum(pos, max(len(wanted) - 1, 0))
        keep = (wanted[pos_c] == ok) if len(wanted) else np.zeros(len(ok), dtype=bool)
        b = b.filter(pa.array(keep))
        ok = b["o_orderkey"].to_numpy(zero_copy_only=False)
        t = tq[np.searchsorted(wanted, ok)]
        return b.append_column("total_qty", pa.array(t, type=pa.int64()))

    return orders.map_batches(
        annotate, batch_format="pyarrow", zero_copy_batch=True, batch_size=BATCH
    )


def q4_order_priority(
    sf_dir: str, returnflag: str = "R", use_bloom: bool = False
) -> ray.data.Dataset:
    """Q4-style order-priority check: count orders per priority where
    EXISTS a lineitem with the given return flag.

    The distributed EXISTS (semi-join) shape (reference Q4's correlated
    subquery): both sides are fact tables, so neither broadcasts — the
    filtered lineitem keys are batch-deduplicated (combiner) and meet
    the orders in one partitioned union exchange
    (``functions/join.py:partitioned_exists_join``); the surviving
    orders feed the usual combiner-first grouped count.  Group
    cardinality is the priority enum, so the final merge is tiny.

    ``use_bloom=True`` adds the bloom pre-filter (``functions/bloom``):
    one extra streaming pass builds a bitmap over the flagged lineitem
    keys, broadcast once, and orders rows that cannot match are dropped
    *before* the exchange.  Bloom false positives are resolved by the
    exact join that follows, so the result is identical — the knob
    trades a cheap re-scan for exchange volume, which wins whenever the
    semi-join is selective at scale.
    """
    import pyarrow.compute as pc

    def flagged(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b["l_returnflag"], returnflag))
        return b.select(["l_orderkey"])

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_returnflag"]).map_batches(
        flagged, batch_format="pyarrow", zero_copy_batch=True, batch_size=BATCH
    )
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])

    if use_bloom:
        from ..functions.bloom import bloom_from_dataset

        # the filter carries its own k — probing with a different k
        # than inserted would drop matching orders (false negatives)
        bf_ref = ray.put(bloom_from_dataset(li, "l_orderkey"))

        def prefilter(b: pa.Table) -> pa.Table:
            bf = ray.get(bf_ref)
            keys = b["o_orderkey"].to_numpy(zero_copy_only=False)
            return b.filter(pa.array(bf.contains(keys)))

        orders = orders.map_batches(
            prefilter, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=BATCH,
        )

    from ..functions.join import partitioned_exists_join

    semi = partitioned_exists_join(
        orders,
        li,
        "o_orderkey",
        "l_orderkey",
        [("o_orderpriority", pa.string())],
        _join_partitions(),
    )
    return hash_grouped_aggregate(
        semi, ["o_orderpriority"], [(None, "count", "order_count")]
    )


def q22_idle_customers(sf_dir: str, priority: str = "1-URGENT") -> ray.data.Dataset:
    """Q22-style global-sales-opportunity: per nation, count and total
    balance of above-average-balance customers who have never placed an
    order at the given priority.

    Three distributed shapes in one query, mirroring reference Q22:
    (1) an uncorrelated scalar subquery — the positive-balance average
    — computed as one-row partials merged driver-side and folded into
    the filter as *exact integer* math (``cents * n > sum_cents``
    instead of a float divide, so the Ray and SQL sides cannot diverge;
    the product is safe while cents·count < 2^63 — ~1e18, i.e. beyond
    100 TB customer counts); (2) a distributed NOT EXISTS (anti-join)
    against the orders fact via the partitioned union exchange; (3) the
    grouped count/sum final over nation keys."""
    import pyarrow.compute as pc

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"])

    def pos_cents(b: pa.Table) -> pa.Table:
        bal = b["c_acctbal"].to_numpy(zero_copy_only=False)
        b = b.filter(pa.array(bal > 0.0))
        bal = b["c_acctbal"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "c_custkey": b["c_custkey"],
                "c_nationkey": b["c_nationkey"],
                "cents": pa.array(_cents(bal)),
            }
        )

    pos = cust.map_batches(
        pos_cents, batch_format="pyarrow", zero_copy_batch=True, batch_size=BATCH
    )

    # scalar subquery: (sum, count) partials -> driver merge (tiny)
    def partial(b: pa.Table) -> pa.Table:
        c = b["cents"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "s": pa.array([int(c.sum())], type=pa.int64()),
                "n": pa.array([int(len(c))], type=pa.int64()),
            }
        )

    agg = (
        pos.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .to_pandas()
        .sum()
    )
    s_total, n_total = int(agg["s"]), int(agg["n"])

    def above_avg(b: pa.Table) -> pa.Table:
        c = b["cents"].to_numpy(zero_copy_only=False)
        return b.filter(pa.array(c * n_total > s_total))

    rich = pos.map_batches(
        above_avg, batch_format="pyarrow", zero_copy_batch=True, batch_size=BATCH
    )

    def urgent(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b["o_orderpriority"], priority))
        return b.select(["o_custkey"])

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"]).map_batches(
        urgent, batch_format="pyarrow", zero_copy_batch=True, batch_size=BATCH
    )

    from ..functions.join import partitioned_exists_join

    idle = partitioned_exists_join(
        rich,
        orders,
        "c_custkey",
        "o_custkey",
        [("c_nationkey", pa.int64()), ("cents", pa.int64())],
        _join_partitions(),
        anti=True,
    )
    return hash_grouped_aggregate(
        idle,
        ["c_nationkey"],
        [(None, "count", "numcust"), ("cents", "sum", "total_cents")],
    )


def q10_returned_revenue(
    sf_dir: str,
    date_from: str = "1996-01-01",
    date_to: str = "1996-04-01",
    k: int = 20,
) -> ray.data.Dataset:
    """Q10-style returned-item report: top-``k`` customers by revenue
    from RETURNED lines of orders placed in one quarter, annotated with
    balance and nation.

    The four-table shape done scale-first: both fact scans are pruned
    and filtered per batch *before* the one partitioned orders x
    lineitem exchange; revenue aggregates combiner-first per customer
    key; the global top-k is the distributed local-cut + tiny merge
    (``functions.agg.distributed_topk``), never a global sort; and the
    customer / nation attributes are attached to the ``k`` survivors
    only — a broadcast back-join over k rows, not a fourth join over
    the fact stream.
    """
    import pyarrow.compute as pc

    from ..functions.agg import distributed_topk
    from ..functions.join import partitioned_lookup_join

    lo = np.datetime64(date_from, "us").astype(np.int64)
    hi = np.datetime64(date_to, "us").astype(np.int64)

    def in_window(b: pa.Table) -> pa.Table:
        d = b["o_orderdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return b.filter(pa.array((d >= lo) & (d < hi))).select(
            ["o_orderkey", "o_custkey"]
        )

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        in_window, batch_format="pyarrow", zero_copy_batch=True, batch_size=BATCH
    )

    def returned(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b["l_returnflag"], "R"))
        price = b["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = b["l_discount"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "l_orderkey": b["l_orderkey"],
                "rev_cents": pa.array(_cents(price * (1.0 - disc))),
            }
        )

    li = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
    ).map_batches(returned, batch_format="pyarrow", zero_copy_batch=True, batch_size=BATCH)

    joined = partitioned_lookup_join(
        li,
        orders,
        "l_orderkey",
        "o_orderkey",
        [("rev_cents", pa.int64())],
        [("o_custkey", pa.int64(), "o_custkey")],
        _join_partitions(),
    )
    per_cust = hash_grouped_aggregate(
        joined, ["o_custkey"], [("rev_cents", "sum", "revenue_cents")]
    )
    top = distributed_topk(per_cust, k, ["revenue_cents", "o_custkey"], [False, True])

    # back-join customer + nation attributes onto the k survivors
    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_name", "c_nationkey", "c_acctbal"],
    )
    nation = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"), columns=["n_nationkey", "n_name"]
    )
    ckeys = cust["c_custkey"].to_numpy()
    c_ord = np.argsort(ckeys)
    nkey = nation["n_nationkey"].to_numpy()
    nat_names = [""] * (int(nkey.max()) + 1)
    for kk, nm in zip(nkey, nation["n_name"].to_pylist()):
        nat_names[int(kk)] = nm
    names = cust["c_name"].combine_chunks().take(pa.array(c_ord))
    dims_ref = ray.put(
        (
            ckeys[c_ord],
            names,
            cust["c_nationkey"].to_numpy().astype(np.int32)[c_ord],
            _cents(cust["c_acctbal"].to_numpy())[c_ord],
            nat_names,
        )
    )

    def annotate(df):
        import pandas as pd  # noqa: F401

        ck_s, names_, cn_s, bal_s, nat_names_ = ray.get(dims_ref)
        ck = df["o_custkey"].to_numpy()
        pos = np.searchsorted(ck_s, ck)  # custkeys exist by FK integrity
        out = df.rename(columns={"o_custkey": "c_custkey"}).copy()
        out["c_name"] = np.asarray(names_.take(pa.array(pos)).to_pylist(), dtype=object)
        out["acctbal_cents"] = bal_s[pos]
        out["n_name"] = np.asarray(nat_names_, dtype=object)[cn_s[pos]]
        return out

    return top.map_batches(annotate, batch_format="pandas", batch_size=None)


def q12_priority_lines(
    sf_dir: str,
    ship_from: str = "1996-01-01",
    ship_to: str = "1997-01-01",
) -> ray.data.Dataset:
    """Q12-style shipping-priority check (adapted to the fixture's
    columns): per linestatus, how many lines shipped in the window
    belong to URGENT/HIGH-priority orders vs the rest.

    The conditional-aggregate join shape: the filtered lineitem stream
    meets orders in the partitioned exchange carrying only
    (linestatus, priority); the CASE collapses per batch into two int
    columns before the tiny grouped final (linestatus enum keys).
    """
    import pyarrow.compute as pc

    from ..functions.join import partitioned_lookup_join

    lo = np.datetime64(ship_from, "us").astype(np.int64)
    hi = np.datetime64(ship_to, "us").astype(np.int64)

    def in_window(b: pa.Table) -> pa.Table:
        d = b["l_shipdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return b.filter(pa.array((d >= lo) & (d < hi))).select(
            ["l_orderkey", "l_linestatus"]
        )

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_linestatus", "l_shipdate"]).map_batches(
        in_window, batch_format="pyarrow", zero_copy_batch=True, batch_size=BATCH
    )
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    joined = partitioned_lookup_join(
        li,
        orders,
        "l_orderkey",
        "o_orderkey",
        [("l_linestatus", pa.string())],
        [("o_orderpriority", pa.string(), "prio")],
        _join_partitions(),
    )

    def cases(b: pa.Table) -> pa.Table:
        high = pc.is_in(b["prio"],
                        value_set=pa.array(["1-URGENT", "2-HIGH"]))
        h = high.to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "l_linestatus": b["l_linestatus"],
            "high": pa.array(h),
            "low": pa.array(1 - h),
        })

    tagged = joined.map_batches(
        cases, batch_format="pyarrow", zero_copy_batch=True, batch_size=BATCH
    )
    return hash_grouped_aggregate(
        tagged, ["l_linestatus"],
        [("high", "sum", "high_line_count"), ("low", "sum", "low_line_count")],
        final_mode="tree",
    )


def q7_volume_shipping(sf_dir: str, nation_a: str = "NATION_0",
                       nation_b: str = "NATION_1") -> ray.data.Dataset:
    """Q7-style volume shipping: discounted revenue between two nations
    by (supplier nation, customer nation, ship year) — trade in BOTH
    directions, the classic two-sided dimension filter.

    Same physical shape as q5: supplier/customer key->nation maps are
    the broadcast side (sorted key arrays, searchsorted per batch); the
    lineitem scan streams with revenue pre-folded to integer cents and
    the ship year extracted per batch; orders x lineitem is the one
    partitioned exchange; the (nation, nation) pair filter collapses
    rows map-side BEFORE the tiny grouped final.
    """
    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet"))
    supp = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"), columns=["s_suppkey", "s_nationkey"]
    )
    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_nationkey"]
    )
    nkey = nation["n_nationkey"].to_numpy()
    n_max = int(nkey.max()) + 1
    nat_names = [""] * n_max
    for k, nm in zip(nkey, nation["n_name"].to_pylist()):
        nat_names[int(k)] = nm
    want = {nat_names.index(nation_a), nat_names.index(nation_b)}
    a_key, b_key = sorted(want)

    skeys = supp["s_suppkey"].to_numpy()
    s_ord = np.argsort(skeys)
    ckeys = cust["c_custkey"].to_numpy()
    c_ord = np.argsort(ckeys)
    dims_ref = ray.put(
        (
            skeys[s_ord],
            supp["s_nationkey"].to_numpy()[s_ord].astype(np.int32),
            ckeys[c_ord],
            cust["c_nationkey"].to_numpy()[c_ord].astype(np.int32),
            nat_names,
        )
    )

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])

    def prep_li(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        price = b["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = b["l_discount"].to_numpy(zero_copy_only=False)
        year = pc.year(b["l_shipdate"]).cast(pa.int64())
        return pa.table(
            {
                "l_orderkey": b["l_orderkey"],
                "l_suppkey": b["l_suppkey"],
                "l_year": year,
                "rev_cents": pa.array(_cents(price * (1.0 - disc))),
            }
        )

    li = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
    ).map_batches(prep_li, batch_format="pyarrow", zero_copy_batch=True, batch_size=BATCH)
    from ..functions.join import partitioned_lookup_join

    joined = partitioned_lookup_join(
        li,
        orders,
        "l_orderkey",
        "o_orderkey",
        [("l_suppkey", pa.int64()), ("l_year", pa.int64()), ("rev_cents", pa.int64())],
        [("o_custkey", pa.int64(), "o_custkey")],
        _join_partitions(),
    )

    def tag(b: pa.Table) -> pa.Table:
        sk_s, sn_s, ck_s, cn_s, nat_names_ = ray.get(dims_ref)
        sk = b["l_suppkey"].to_numpy(zero_copy_only=False)
        ck = b["o_custkey"].to_numpy(zero_copy_only=False)
        sp = np.minimum(np.searchsorted(sk_s, sk), len(sk_s) - 1)
        sn = np.where(sk_s[sp] == sk, sn_s[sp], -1).astype(np.int32)
        cp = np.minimum(np.searchsorted(ck_s, ck), len(ck_s) - 1)
        cn = np.where(ck_s[cp] == ck, cn_s[cp], -2).astype(np.int32)
        keep = ((sn == a_key) & (cn == b_key)) | ((sn == b_key) & (cn == a_key))
        b = b.filter(pa.array(keep))
        sn, cn = sn[keep], cn[keep]
        return pa.table(
            {
                "supp_nation": pa.DictionaryArray.from_arrays(
                    pa.array(sn), pa.array(nat_names_, type=pa.string())
                ).cast(pa.string()),
                "cust_nation": pa.DictionaryArray.from_arrays(
                    pa.array(cn), pa.array(nat_names_, type=pa.string())
                ).cast(pa.string()),
                "l_year": b["l_year"],
                "rev_cents": b["rev_cents"],
            }
        )

    tagged = joined.map_batches(
        tag, batch_format="pyarrow", zero_copy_batch=True, batch_size=BATCH
    )
    return hash_grouped_aggregate(
        tagged, ["supp_nation", "cust_nation", "l_year"],
        [("rev_cents", "sum", "revenue_cents")],
    )


def q13_customer_distribution(sf_dir: str) -> pa.Table:
    """Q13-style customer-order-count distribution: for each order
    count c_count (INCLUDING 0), the number of customers with exactly
    that many orders — the LEFT OUTER JOIN + double-aggregate shape.

    The plan exploits referential integrity to DELETE the join: every
    ``o_custkey`` is a customer (FK contract of the fixture and of
    TPC-H), so the >=1-order half of the distribution is a pure
    re-aggregation of the per-customer order counts (combiner-first
    exchange over custkey, then a tiny groupby over count values), and
    the 0-orders bucket is ``count(customer) - count(distinct
    ordering customers)`` — two scalar counts.  No customer-to-orders
    exchange at any scale (the reference plan's LEFT JOIN exists only
    to manufacture the zero bucket).
    """
    counts = hash_grouped_aggregate(
        _read(sf_dir, "orders", ["o_custkey"]),
        ["o_custkey"],
        [(None, "count", "c_count")],
    ).materialize()
    dist = hash_grouped_aggregate(
        counts.select_columns(["c_count"]),
        ["c_count"],
        [(None, "count", "custdist")],
    ).to_arrow_refs()
    parts = [t for t in ray.get(dist) if t.num_rows]
    tbl = pa.concat_tables(parts) if parts else pa.table(
        {"c_count": pa.array([], pa.int64()), "custdist": pa.array([], pa.int64())}
    )
    n_zero = _read(sf_dir, "customer", ["c_custkey"]).count() - counts.count()
    out = tbl.select(["c_count", "custdist"])
    if n_zero > 0:  # emit the 0 bucket only when it exists (SQL parity)
        out = pa.concat_tables([out, pa.table(
            {"c_count": pa.array([0], pa.int64()),
             "custdist": pa.array([n_zero], pa.int64())}
        )])
    return out


def q17_small_quantity_revenue(
    sf_dir: str, brand: str = "Brand#4", frac_num: int = 1, frac_den: int = 5,
    broadcast_cap: int = 5_000_000,
) -> ray.data.Dataset:
    """Q17-style small-quantity-order revenue: total extended price (in
    integer cents) and count of lineitems for parts of ``brand`` whose
    quantity is below ``frac_num/frac_den`` of that part's average
    quantity — the correlated-average self-join.

    Two passes over lineitem (unavoidable: the threshold is a function
    of the full fact table): pass 1 builds per-part (sum_qty, n) for
    the brand's parts; pass 2 re-scans with the thresholds attached and
    keeps rows where ``qty * frac_den * n < frac_num * sum_qty`` —
    EXACT integer math, no float average to diverge on.  The brand
    part-key set and the per-part threshold map are small by
    construction (one brand) and broadcast under ``broadcast_cap``;
    past it the attach falls back to the partitioned lookup join.  The
    final is the q6 scalar shape: one-row partials, repartition(1).
    """
    import pyarrow.compute as pc

    def brand_parts(b: pa.Table) -> pa.Table:
        return b.filter(pc.equal(b["p_brand"], brand)).select(["p_partkey"])

    part_keys = _read(sf_dir, "part", ["p_partkey", "p_brand"]).map_batches(
        brand_parts, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=BATCH,
    ).to_pandas()["p_partkey"].to_numpy()
    pk_sorted = np.sort(part_keys)
    pk_ref = ray.put(pk_sorted)

    def brand_lines(b: pa.Table) -> pa.Table:
        wanted = ray.get(pk_ref)
        lp = b["l_partkey"].to_numpy(zero_copy_only=False)
        pos = np.minimum(np.searchsorted(wanted, lp), max(len(wanted) - 1, 0))
        keep = (wanted[pos] == lp) if len(wanted) else np.zeros(len(lp), bool)
        b = b.filter(pa.array(keep))
        return pa.table({
            "l_partkey": b["l_partkey"],
            "qty": pc.cast(b["l_quantity"], pa.int64()),
            "cents": pa.array(_cents(
                b["l_extendedprice"].to_numpy(zero_copy_only=False)
            )),
        })

    def li():
        return _read(
            sf_dir, "lineitem", ["l_partkey", "l_quantity", "l_extendedprice"]
        ).map_batches(
            brand_lines, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=BATCH,
        )

    thresholds = hash_grouped_aggregate(
        li().select_columns(["l_partkey", "qty"]),
        ["l_partkey"],
        [("qty", "sum", "sum_qty"), (None, "count", "n")],
    ).materialize()

    if thresholds.count() > broadcast_cap:
        from ..functions.join import partitioned_lookup_join

        joined = partitioned_lookup_join(
            li(), thresholds, "l_partkey", "l_partkey",
            [("qty", pa.int64()), ("cents", pa.int64())],
            [("sum_qty", pa.int64(), "sum_qty"), ("n", pa.int64(), "n")],
            _join_partitions(),
        )

        def small_joined(b: pa.Table) -> pa.Table:
            qty = b["qty"].to_numpy(zero_copy_only=False)
            s = b["sum_qty"].to_numpy(zero_copy_only=False)
            n = b["n"].to_numpy(zero_copy_only=False)
            keep = qty * frac_den * n < frac_num * s
            cents = b["cents"].to_numpy(zero_copy_only=False)[keep]
            return pa.table({
                "revenue_cents": pa.array([int(cents.sum())], pa.int64()),
                "n_lines": pa.array([int(keep.sum())], pa.int64()),
            })

        partials = joined.map_batches(
            small_joined, batch_format="pyarrow", batch_size=None
        )
    else:
        th = thresholds.to_pandas().set_index("l_partkey")
        tk = np.sort(th.index.to_numpy())
        t_ref = ray.put((tk, th.loc[tk, "sum_qty"].to_numpy(),
                         th.loc[tk, "n"].to_numpy()))

        def small_bcast(b: pa.Table) -> pa.Table:
            keys, sums, ns = ray.get(t_ref)
            lp = b["l_partkey"].to_numpy(zero_copy_only=False)
            qty = b["qty"].to_numpy(zero_copy_only=False)
            pos = np.minimum(np.searchsorted(keys, lp), max(len(keys) - 1, 0))
            hit = (keys[pos] == lp) if len(keys) else np.zeros(len(lp), bool)
            keep = hit & (qty * frac_den * ns[pos] < frac_num * sums[pos])
            cents = b["cents"].to_numpy(zero_copy_only=False)[keep]
            return pa.table({
                "revenue_cents": pa.array([int(cents.sum())], pa.int64()),
                "n_lines": pa.array([int(keep.sum())], pa.int64()),
            })

        partials = li().map_batches(
            small_bcast, batch_format="pyarrow", batch_size=None
        )

    def merge(b: pa.Table) -> pa.Table:
        return pa.table({
            "revenue_cents": pa.array(
                [int(b["revenue_cents"].to_numpy(zero_copy_only=False).sum())],
                pa.int64()),
            "n_lines": pa.array(
                [int(b["n_lines"].to_numpy(zero_copy_only=False).sum())],
                pa.int64()),
        })

    return partials.repartition(1).map_batches(
        merge, batch_format="pyarrow", batch_size=None
    )


def q21_returns_suppliers(
    sf_dir: str, status: str = "F", priority: str = "1-URGENT",
    big_qty: float = 45.0, broadcast_cap: int = 5_000_000,
) -> ray.data.Dataset:
    """Q21-style EXISTS + NOT EXISTS composition: suppliers with at
    least one returned ('R') line in a finished (status ``'F'``) order,
    EXCLUDING any supplier with a large (quantity > ``big_qty``)
    returned line in a finished URGENT order.

    Both subqueries share the same returned-lines x finished-orders
    join, so the plan runs ONE fact-level partitioned lookup join
    (returned lines, carrying quantity, against finished orders,
    carrying an is-urgent flag) and folds the EXISTS and the NOT EXISTS
    into a single combiner-first per-supplier aggregate: ``seen`` =
    any joined line, ``bad`` = max(quantity > big_qty AND urgent).
    The flag table is bounded by supplier cardinality: under
    ``broadcast_cap`` it ships once via ``ray.put`` and the supplier
    scan applies both predicates in one vectorized membership pass
    (zero further exchanges); past the cap it falls back to a semi +
    anti pair of partitioned exists-joins over the flag table.
    """
    import pyarrow.compute as pc

    from ..functions.join import partitioned_exists_join, partitioned_lookup_join

    def orders_f(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b["o_orderstatus"], status))
        urgent = pc.equal(b["o_orderpriority"], priority).cast(pa.int8())
        return pa.table({"o_orderkey": b["o_orderkey"], "urgent": urgent})

    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_orderstatus", "o_orderpriority"]
    ).map_batches(orders_f, batch_format="pyarrow", zero_copy_batch=True,
                  batch_size=BATCH)

    def lines_r(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b["l_returnflag"], "R"))
        return pa.table({
            "l_orderkey": b["l_orderkey"],
            "l_suppkey": b["l_suppkey"],
            "big": pa.array(
                b["l_quantity"].to_numpy(zero_copy_only=False) > big_qty
            ).cast(pa.int8()),
        })

    lines = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_returnflag",
                             "l_quantity"]
    ).map_batches(lines_r, batch_format="pyarrow", zero_copy_batch=True,
                  batch_size=BATCH)

    joined = partitioned_lookup_join(
        lines, orders, "l_orderkey", "o_orderkey",
        [("l_suppkey", pa.int64()), ("big", pa.int8())],
        [("urgent", pa.int8(), "urgent")],
        _join_partitions(),
    )

    def flagify(b: pa.Table) -> pa.Table:
        bad = (
            b["big"].to_numpy(zero_copy_only=False).astype(np.int64)
            * b["urgent"].to_numpy(zero_copy_only=False).astype(np.int64)
        )
        return pa.table({"l_suppkey": b["l_suppkey"], "bad": pa.array(bad)})

    flags = hash_grouped_aggregate(
        joined.map_batches(flagify, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=None),
        ["l_suppkey"], [("bad", "max", "bad")],
    ).materialize()
    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_name"])

    if flags.count() <= broadcast_cap:
        parts = [t for t in ray.get(flags.to_arrow_refs()) if t.num_rows]
        if parts:
            tbl = pa.concat_tables(parts)
            keys = tbl["l_suppkey"].to_numpy(zero_copy_only=False)
            order = np.argsort(keys)
            ref = ray.put((keys[order],
                           tbl["bad"].to_numpy(zero_copy_only=False)[order]))
        else:
            ref = ray.put((np.zeros(0, np.int64), np.zeros(0, np.int64)))

        def both(b: pa.Table) -> pa.Table:
            keys, bad = ray.get(ref)
            sk = b["s_suppkey"].to_numpy(zero_copy_only=False)
            if not len(keys):
                return b.filter(pa.array(np.zeros(len(sk), bool)))
            pos = np.minimum(np.searchsorted(keys, sk), len(keys) - 1)
            hit = keys[pos] == sk
            return b.filter(pa.array(hit & (bad[pos] == 0)))

        return sup.map_batches(
            both, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=BATCH,
        )

    # flags holds ONE row per supplier with bad = max, so EXISTS AND
    # NOT-bad collapses to a single semi-join against the bad=0 rows
    def good_only(b: pa.Table) -> pa.Table:
        return b.filter(pc.equal(b["bad"], 0)).select(["l_suppkey"])

    return partitioned_exists_join(
        sup,
        flags.map_batches(good_only, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=None),
        "s_suppkey", "l_suppkey",
        [("s_suppkey", pa.int64()), ("s_name", pa.string())],
        _join_partitions(),
    )
