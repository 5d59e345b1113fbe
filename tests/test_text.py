"""Text-analysis golden tests: Ray pipeline vs DuckDB / numpy oracle.

Mirrors the reference's dual-implementation check style
(/root/reference/rios/riostests/riostestutils.py:3-10): the oracle is
computed by an independent engine (DuckDB's RE2 SQL, plain numpy) and
compared exactly.
"""

import duckdb
import numpy as np
import pyarrow.parquet as pq
import pytest

from rios_ray.pipelines import text as T
from rios_ray.text import analysis as A

SF = "/root/testdata/sf0.001"
DOCS = f"{SF}/documents.parquet"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(f"CREATE VIEW docs AS SELECT * FROM read_parquet('{DOCS}')")
    return c


def _cmp(ray_tbl, sql_tbl, cols):
    ray_tbl = ray_tbl.sort_by("doc_id")
    sql_tbl = sql_tbl.sort_by("doc_id")
    assert ray_tbl.num_rows == sql_tbl.num_rows
    for c in cols:
        a, b = ray_tbl[c].to_pylist(), sql_tbl[c].to_pylist()
        assert a == b, f"column {c} mismatch"


def test_token_stats(ray_session, con):
    got = T.token_stats(SF).to_arrow_refs()
    import pyarrow as pa
    import ray

    got = pa.concat_tables([t for t in ray.get(got) if t.num_rows])
    want = con.execute(r"""
        SELECT doc_id,
               length(text) AS n_chars_txt,
               len(regexp_extract_all(text, '\S+')) AS n_tokens,
               len(regexp_extract_all(text, '[A-Za-z]+')) AS n_alpha,
               len(regexp_extract_all(text, '[^\w\s]')) AS n_punct,
               len(regexp_extract_all(text, ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+')) AS n_bpe
          FROM docs""").arrow()
    _cmp(got, want, ["n_chars_txt", "n_tokens", "n_alpha", "n_punct", "n_bpe"])


def test_quality_bitexact(ray_session, con):
    got = T.quality(SF).to_pandas().sort_values("doc_id")
    en = A.STOPWORD_RES["en"]
    want = con.execute(rf"""
        SELECT doc_id,
               LEAST(1.0, len(regexp_extract_all(text,'\S+'))/64.0)*0.5
             + LEAST(1.0, (len(regexp_extract_all(lower(text),'{en}'))
                 / GREATEST(len(regexp_extract_all(text,'\S+')),1)) * 8.0)*0.3
             + (1.0 - LEAST(1.0, (len(regexp_extract_all(text,'[^\w\s]'))
                 / GREATEST(length(text),1)) * 10.0))*0.2 AS quality
          FROM docs ORDER BY doc_id""").df()
    # bit-exact float64 equality — same IEEE ops in the same order
    assert np.array_equal(got["quality"].to_numpy(), want["quality"].to_numpy())


def test_lang_id(ray_session, con):
    got = T.lang_id(SF).to_pandas().sort_values("doc_id")
    cases = " ".join(f"WHEN c_{l} = m THEN '{l}'" for l in A.LANG_PRIORITY)
    counts = ", ".join(
        rf"len(regexp_extract_all(lower(text),'{A.STOPWORD_RES[l]}')) AS c_{l}"
        for l in A.LANG_PRIORITY
    )
    want = con.execute(rf"""
        WITH c AS (SELECT doc_id, {counts} FROM docs),
             m AS (SELECT *, GREATEST(c_en,c_de,c_fr,c_es,c_zh) AS m FROM c)
        SELECT doc_id, CASE WHEN m=0 THEN 'und' {cases} END AS lang_pred
          FROM m ORDER BY doc_id""").df()
    assert got["lang_pred"].tolist() == want["lang_pred"].tolist()


def test_md5_fingerprint(ray_session, con):
    got = T.fingerprints(SF).to_pandas().sort_values("doc_id")
    want = con.execute(r"""
        SELECT doc_id, md5(trim(regexp_replace(lower(text),'\s+',' ','g'))) AS text_md5
          FROM docs ORDER BY doc_id""").df()
    assert got["text_md5"].tolist() == want["text_md5"].tolist()
    assert (got["fp_size"] >= 0).all()


def test_winnow_properties():
    """Winnowing invariants: deterministic, containment under append,
    robust to where the duplicate sits (pure-numpy unit test)."""
    a = "the quick brown fox jumps over the lazy dog " * 4
    fp1 = A.winnow_fingerprint_one(a)
    fp2 = A.winnow_fingerprint_one(a)
    assert np.array_equal(fp1, fp2)
    # a document containing `a` verbatim shares most fingerprint hashes
    b = "PREFIX 123 " + a + " SUFFIX"
    fpb = A.winnow_fingerprint_one(b)
    shared = np.intersect1d(fp1, fpb)
    assert len(shared) >= 0.8 * len(fp1)
    # unrelated text shares (almost) nothing
    c = A.winnow_fingerprint_one("zyx wvu tsr qpo nml kji hgf edc ba " * 8)
    assert len(np.intersect1d(fp1, c)) <= 0.05 * len(fp1)
    # short-input edge cases
    assert len(A.winnow_fingerprint_one("")) == 0
    assert len(A.winnow_fingerprint_one("abc")) == 0  # < k
    assert len(A.winnow_fingerprint_one("abcdefgh")) == 1  # exactly one gram


def test_top_token_pages_vs_duckdb(ray_session, con):
    from rios_ray.pipelines.text import top_token_pages

    got = top_token_pages(SF, k=50).to_pandas().sort_values("rank").reset_index(drop=True)
    want = con.execute(r"""
        SELECT doc_id, n_tokens,
               row_number() OVER (ORDER BY n_tokens DESC, doc_id) AS rank
          FROM (SELECT doc_id, len(regexp_extract_all(text, '\S+')) AS n_tokens FROM docs)
        QUALIFY rank <= 50 ORDER BY rank""").df()
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["n_tokens"].tolist() == want["n_tokens"].tolist()
