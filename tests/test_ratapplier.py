"""RAT applier tests: chunked apply, probe-based column pruning,
row-group-aligned multi-input, weighted column stats vs DuckDB."""

import duckdb
import os
import numpy as np
import pyarrow as pa
import pytest

from rios_ray import ratapplier as R

DOCS = "/root/testdata/sf0.001/documents.parquet"


def _make_user_fn():
    # defined as a closure so cloudpickle ships it by value (the test
    # module is not importable on Ray workers)
    def user_fn(inputs, outputs):
        outputs.doc_id = inputs.doc_id
        outputs.chars_k = inputs.n_chars / 1000.0
        outputs.long_doc = (inputs.n_chars > 500).astype(np.int32)

    return user_fn


def test_probe_records_projection():
    cols = R.probe_columns(_make_user_fn(), DOCS)
    assert cols == ["doc_id", "n_chars"]


def test_rat_apply_matches_duckdb(ray_session, tmp_path):
    out = str(tmp_path / "out_rat")
    ds = R.rat_apply(_make_user_fn(), DOCS, out_path=out, block_len=100)
    got = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    want = duckdb.sql(f"""
        SELECT doc_id, n_chars/1000.0 AS chars_k,
               CAST(n_chars > 500 AS INT) AS long_doc
          FROM read_parquet('{DOCS}') ORDER BY doc_id""").df()
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["chars_k"].tolist() == want["chars_k"].tolist()
    assert got["long_doc"].tolist() == want["long_doc"].tolist()
    # written output equals returned dataset
    back = duckdb.sql(f"SELECT count(*) FROM read_parquet('{out}/*.parquet')").fetchone()
    assert back[0] == len(want)


def test_rcm_equals_input_enforced(ray_session):
    def bad(inputs, outputs):
        outputs.doc_id = inputs.doc_id[:1]

    with pytest.raises(Exception):
        R.rat_apply(bad, DOCS).to_pandas()


def test_rcm_fixed_allows_other_lengths(ray_session):
    def agg(inputs, outputs):
        outputs.total = np.array([inputs.n_chars.sum()])

    got = R.rat_apply(agg, DOCS, row_count_mode=R.RCM_FIXED, block_len=100).to_pandas()
    want = duckdb.sql(f"SELECT sum(n_chars) FROM read_parquet('{DOCS}')").fetchone()[0]
    assert got["total"].sum() == want


def test_multi_input_row_group_alignment(ray_session, tmp_path):
    a = pa.table({"v": np.arange(1000, dtype=np.int64)})
    b = pa.table({"w": np.arange(1000, dtype=np.int64) * 10})
    pa_ = str(tmp_path / "a.parquet")
    pb_ = str(tmp_path / "b.parquet")
    R.write_rat(a, pa_, block_len=200)
    R.write_rat(b, pb_, block_len=200)

    def fn(inputs, outputs):
        outputs.s = inputs["a"].v + inputs["b"].w

    got = R.rat_apply_multi(fn, {"a": pa_, "b": pb_}).to_pandas()
    assert sorted(got["s"].tolist()) == sorted((np.arange(1000) * 11).tolist())


def test_multi_input_mismatch_rejected(tmp_path):
    p1 = str(tmp_path / "x.parquet")
    p2 = str(tmp_path / "y.parquet")
    R.write_rat(pa.table({"v": np.arange(10, dtype=np.int64)}), p1)
    R.write_rat(pa.table({"v": np.arange(11, dtype=np.int64)}), p2)
    with pytest.raises(ValueError, match="row counts differ"):
        R.rat_apply_multi(lambda i, o: None, {"x": p1, "y": p2})


def test_column_stats_weighted_vs_duckdb(ray_session):
    got = R.rat_column_stats(DOCS, "n_chars", weight_col="doc_id", block_len=100)
    want = duckdb.sql(f"""
        SELECT sum(doc_id * n_chars) / sum(doc_id) AS mean,
               min(n_chars) FILTER (doc_id > 0) AS minv,
               max(n_chars) FILTER (doc_id > 0) AS maxv,
               sum(doc_id * n_chars) AS s, sum(doc_id) AS c
          FROM read_parquet('{DOCS}')""").fetchone()
    assert got["mean"] == pytest.approx(want[0], rel=1e-12)
    assert got["min"] == want[1]
    assert got["max"] == want[2]
    assert got["sum"] == pytest.approx(want[3], rel=1e-12)
    assert got["count"] == pytest.approx(want[4], rel=1e-12)
    # unweighted sanity
    uw = R.rat_column_stats(DOCS, "n_chars")
    want2 = duckdb.sql(
        f"SELECT avg(n_chars), stddev_pop(n_chars) FROM read_parquet('{DOCS}')"
    ).fetchone()
    assert uw["mean"] == pytest.approx(want2[0], rel=1e-12)
    assert uw["stddev"] == pytest.approx(want2[1], rel=1e-9)


def test_string_rat_column_derive(ray_session, tmp_path):
    """String-typed RAT columns (the reference's numpy-2 StringDType
    path, /root/reference/rios/ratapplier.py:430-444): a user function
    can READ a string column and WRITE a derived string column, and
    both survive the chunked round trip exactly."""
    def user_fn(inputs, outputs):
        outputs.doc_id = inputs.doc_id
        outputs.lang_in = inputs.lang
        # derived string column from numpy unicode ops
        outputs.tag = np.char.add(
            np.char.upper(inputs.lang.astype(str)),
            np.where(inputs.n_chars > 500, "_long", "_short"),
        )

    out = str(tmp_path / "out_rat_str")
    ds = R.rat_apply(user_fn, DOCS, out_path=out, block_len=100)
    got = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    want = duckdb.sql(f"""
        SELECT doc_id, lang AS lang_in,
               upper(lang) || CASE WHEN n_chars > 500 THEN '_long' ELSE '_short' END AS tag
          FROM read_parquet('{DOCS}') ORDER BY doc_id""").df()
    assert got["lang_in"].tolist() == want["lang_in"].tolist()
    assert got["tag"].tolist() == want["tag"].tolist()
    # arrow schema of the written parquet keeps the string type
    import pyarrow.parquet as pq_mod
    sch = pq_mod.read_schema(os.listdir(out) and [
        os.path.join(out, f) for f in os.listdir(out) if f.endswith(".parquet")
    ][0])
    assert pa.types.is_string(sch.field("tag").type) or pa.types.is_large_string(sch.field("tag").type)
