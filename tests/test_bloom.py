"""Bloom filter: no false negatives ever, bounded false-positive rate,
distributed build parity, and bloom-join result identity."""

import numpy as np
import pyarrow as pa

from rios_ray.functions.bloom import (
    bloom_contains,
    bloom_from_dataset,
    bloom_insert,
)

K = 7


def test_no_false_negatives_and_fpr_bound():
    rng = np.random.default_rng(5)
    present = rng.choice(10_000_000, size=200_000, replace=False).astype(np.int64)
    words = np.zeros((1 << 21) // 64, dtype=np.uint64)  # ~10.5 bits/key
    bloom_insert(words, present, K)
    assert bloom_contains(words, present, K).all()
    absent = np.setdiff1d(
        rng.choice(10_000_000, size=100_000, replace=False).astype(np.int64),
        present,
    )
    fpr = bloom_contains(words, absent, K).mean()
    assert fpr < 0.02, fpr  # theory ~0.8% at 10.5 bits/key, k=7


def test_distributed_build_matches_local(ray_session):
    import ray.data

    keys = np.arange(50_000, dtype=np.int64) * 13 + 7
    ds = ray.data.from_arrow(pa.table({"k": keys})).repartition(8)
    got = bloom_from_dataset(ds, "k", m_bits=1 << 20, k=K)
    want = np.zeros((1 << 20) // 64, dtype=np.uint64)
    bloom_insert(want, keys, K)
    np.testing.assert_array_equal(got.words, want)
    # the built k travels with the bitmap (probing with a different k
    # than inserted would produce false negatives)
    assert got.k == K
    assert got.contains(keys).all()


def test_bloom_join_identical_result(ray_session):
    from rios_ray.pipelines import relational as R

    SF = "/root/testdata/sf0.001"
    plain = R.q4_order_priority(SF).to_pandas().sort_values(
        "o_orderpriority").reset_index(drop=True)
    bloom = R.q4_order_priority(SF, use_bloom=True).to_pandas().sort_values(
        "o_orderpriority").reset_index(drop=True)
    assert plain.equals(bloom)
