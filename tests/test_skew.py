"""Skew-handling tests: fan-out cap correctness vs DuckDB row_number
oracle; hot-cell boundedness on the deliberately-skewed fixture."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from rios_ray import synth
from rios_ray.stages.skew import capped_per_key, head_per_key

SF = "/root/testdata/sf0.001"
CAP = 5


def test_head_per_key_vectorized_oracle():
    rng = np.random.default_rng(1)
    t = pa.table(
        {
            "k": pa.array(rng.integers(0, 50, 2000)),
            "o": pa.array(rng.permutation(2000)),
        }
    )
    got = head_per_key(t, "k", 3, "o").to_pandas()
    want = (
        t.to_pandas()
        .sort_values(["k", "o"])
        .groupby("k")
        .head(3)
        .reset_index(drop=True)
    )
    got = got.sort_values(["k", "o"]).reset_index(drop=True)
    assert got.equals(want)
    assert head_per_key(t.slice(0, 0), "k", 3, "o").num_rows == 0


def test_capped_per_key_vs_duckdb(ray_session):
    from rios_ray.pipelines.pages import geocoded_pages

    ds = geocoded_pages(SF, keep_text=False).select_columns(["cell", "url"])
    got = capped_per_key(ds, "cell", CAP, "url").to_pandas()
    path = synth.pages_path(SF)
    want = duckdb.sql(rf"""
        WITH pts AS (
            SELECT url,
                   CAST(regexp_extract(text, 'geo:(-?\d+\.\d+),(-?\d+\.\d+)', 1) AS DOUBLE) AS lat,
                   CAST(regexp_extract(text, 'geo:(-?\d+\.\d+),(-?\d+\.\d+)', 2) AS DOUBLE) AS lon
              FROM read_parquet('{path}/*.parquet'))
        SELECT cell, url FROM (
            SELECT *, row_number() OVER (PARTITION BY cell ORDER BY url) AS rn
              FROM (SELECT url, {_cell_sql()} AS cell FROM pts))
         WHERE rn <= {CAP}""").df()
    g = set(zip(got["cell"], got["url"]))
    w = set(zip(want["cell"], want["url"]))
    assert g == w
    # every cell capped
    counts = got.groupby("cell").size()
    assert counts.max() <= CAP
    # the hot cluster cells were actually over cap before (skew present)
    pre = duckdb.sql(rf"""
        WITH pts AS (
            SELECT CAST(regexp_extract(text, 'geo:(-?\d+\.\d+),(-?\d+\.\d+)', 1) AS DOUBLE) AS lat,
                   CAST(regexp_extract(text, 'geo:(-?\d+\.\d+),(-?\d+\.\d+)', 2) AS DOUBLE) AS lon
              FROM read_parquet('{path}/*.parquet'))
        SELECT max(c) FROM (SELECT count(*) c FROM (SELECT {_cell_sql()} AS cell FROM pts) GROUP BY cell)
    """).fetchone()[0]
    assert pre > CAP


def _cell_sql():
    from rios_ray.cells import grid_cell_step
    from rios_ray.stages.cellassign import DEFAULT_GRID_RES

    step = grid_cell_step(DEFAULT_GRID_RES)
    ny, nx = 1 << DEFAULT_GRID_RES, 2 << DEFAULT_GRID_RES
    return (
        f"LEAST(GREATEST(CAST(floor((90.0 - lat) / {step!r}) AS BIGINT), 0), {ny - 1})"
        f" * {nx}"
        f" + LEAST(GREATEST(CAST(floor((lon + 180.0) / {step!r}) AS BIGINT), 0), {nx - 1})"
    )
