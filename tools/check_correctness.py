"""Driver-simulator: run queries() vs oracle_sql() side by side at sf0.01.

Mirrors the graft driver's correctness gate: row count + schema (column
names) + order-insensitive value hash.  Usage::

    python tools/check_correctness.py [sf_dir] [query ...]
    python tools/check_correctness.py [sf_dir] --window   # first 50 only
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(ray_df.columns) != sorted(sql_df.columns):
        problems.append(f"schema: ray={sorted(ray_df.columns)} sql={sorted(sql_df.columns)}")
        return problems
    if len(ray_df) != len(sql_df):
        problems.append(f"rows: ray={len(ray_df)} sql={len(sql_df)}")
    a, b = canon(ray_df), canon(sql_df)
    if len(a) == len(b):
        for col in a.columns:
            av, bv = a[col], b[col]
            try:
                # Dtype-strict, like the driver's value hash: an int64 Ray
                # column vs a float64 (HUGEINT-derived) oracle column is a
                # FAIL even when the values coerce equal.
                if av.dtype != bv.dtype:
                    problems.append(
                        f"dtype mismatch in column {col!r}: "
                        f"ray={av.dtype} sql={bv.dtype}"
                    )
                    continue
                if av.dtype.kind == "f":
                    import numpy as np

                    if not np.array_equal(
                        av.to_numpy(dtype=float), bv.to_numpy(dtype=float), equal_nan=True
                    ):
                        problems.append(f"values differ in column {col!r}")
                else:
                    if not av.astype(object).equals(bv.astype(object)):
                        problems.append(f"values differ in column {col!r}")
            except Exception as e:  # noqa: BLE001
                problems.append(f"compare error in {col!r}: {e}")
    return problems


def main() -> int:
    import ray

    args = [a for a in sys.argv[1:] if a != "--window"]
    window_only = "--window" in sys.argv
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    if window_only:  # exactly what the driver gates: the first 50 entries
        qs = dict(list(qs.items())[:50])
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    import glob
    import os

    for t in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.splitext(os.path.basename(t))[0]
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{t}')")

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        import time

        t0 = time.time()
        ray_df = to_pandas(fn(sf_dir))
        t_ray = time.time() - t0
        if name not in oracles:
            print(f"  {name:28s} rows-only: {len(ray_df)} rows  ({t_ray:.1f}s ray)")
            continue
        t0 = time.time()
        sql_df = con.sql(oracles[name]).df()
        t_sql = time.time() - t0
        problems = compare(name, ray_df, sql_df)
        status = "OK " if not problems else "FAIL"
        print(
            f"  {name:28s} {status} rows={len(ray_df)}  ({t_ray:.1f}s ray, {t_sql:.1f}s sql)"
            + ("" if not problems else f"  -> {problems}")
        )
        failures += bool(problems)
    ray.shutdown()
    return failures


if __name__ == "__main__":
    raise SystemExit(main())
