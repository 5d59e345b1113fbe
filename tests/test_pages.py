"""Pages-pipeline extras: the GROUPING SETS cube (multi-level rollup
derived from one finest-level aggregate pass)."""

import duckdb
import pytest

from rios_ray import synth

SF = "/root/testdata/sf0.001"


def test_pages_cube_vs_duckdb(ray_session):
    from rios_ray.pipelines.pages import pages_cube

    got = (
        pages_cube(SF)
        .to_pandas()
        .sort_values(["lang", "tld"])
        .reset_index(drop=True)
    )
    pages = synth.ensure_pages(SF)
    want = duckdb.sql(f"""
        WITH b AS (
            SELECT lang,
                   regexp_extract(
                       regexp_extract(url, '^[a-z]+://([^/]+)', 1),
                       '\\.([a-z]+)$', 1) AS tld
              FROM read_parquet('{pages}/*.parquet')
        )
        SELECT COALESCE(lang, 'ALL') AS lang, COALESCE(tld, 'ALL') AS tld,
               CAST(count(*) AS BIGINT) AS n_pages
          FROM b GROUP BY GROUPING SETS ((lang, tld), (lang), (tld), ())
         ORDER BY lang, tld
    """).df()
    assert got["lang"].tolist() == want["lang"].tolist()
    assert got["tld"].tolist() == want["tld"].tolist()
    assert got["n_pages"].tolist() == want["n_pages"].tolist()
    # internal consistency: the grand total equals the sum of the
    # finest level, and each lang roll-up equals the sum of its tlds
    fin = got[(got.lang != "ALL") & (got.tld != "ALL")]
    grand = got[(got.lang == "ALL") & (got.tld == "ALL")]["n_pages"].iloc[0]
    assert fin["n_pages"].sum() == grand
    for lang, grp in fin.groupby("lang"):
        roll = got[(got.lang == lang) & (got.tld == "ALL")]["n_pages"].iloc[0]
        assert grp["n_pages"].sum() == roll
