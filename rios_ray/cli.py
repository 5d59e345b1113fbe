"""CLI entry points — the ``rioscalcstats`` / ``riosprintstats``
analogues (reference ``cmdline/rioscalcstats.py:53-73`` and
``cmdline/riosprintstats.py:40-58``) over tile-raster parquet files.

Usage::

    python -m rios_ray.cli calcstats  <tileraster> [<tileraster> ...]
    python -m rios_ray.cli printstats <tileraster> [<tileraster> ...]

``calcstats`` recomputes single-pass basic stats (+ histogram-derived
median/mode) and rewrites the manifest sidecar; ``printstats`` dumps
the stored stats.  These own a Ray session (scripts, not library code).
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def _calc_one(path: str, include_hist: bool = True, approx: bool = False,
              sample_frac: float = 0.25, seed: int = 42) -> dict:
    import pyarrow.parquet as pq
    import ray.data

    from .sources.tileraster import TileRasterInfo, write_tile_raster
    from .stats import dataset_band_stats

    info = TileRasterInfo.read(path)
    ds = ray.data.read_parquet(path)
    if approx:
        # sampled scan — the reference's approx_ok path computes from
        # pyramid-subsampled pixels (calcstats.py:176-198); a seeded
        # random tile sample is the keyed-parquet equivalent
        ds = ds.random_sample(sample_frac, seed=seed)
    res = dataset_band_stats(
        ds, info.np_dtype, nullval=info.nullval, thematic=info.thematic,
        include_hist=include_hist,
    )
    stats = {}
    for band, r in res.items():
        minv, maxv, mean, stddev = r["stats"]
        entry = {
            "min": float(minv), "max": float(maxv),
            "mean": float(mean), "stddev": float(stddev),
        }
        if r["hist"] is not None and r["hist"][0] is not None:
            hmin, hmax, counts = r["hist"]
            # histogram-derived estimates (reference calcstats.py:954-970):
            # first bin with cumsum >= half the count; argmax bin
            half = counts.sum() / 2.0
            entry["median"] = float(hmin + int(np.searchsorted(np.cumsum(counts), half)))
            entry["mode"] = float(hmin + int(np.argmax(counts)))
        if approx:
            entry["approx"] = True
        stats[str(band)] = entry
    # rewrite sidecar with fresh stats, preserving grid metadata
    table = pq.read_table(path)
    write_tile_raster(
        path, table, info.grid, info.nbands, info.np_dtype,
        nullval=info.nullval, thematic=info.thematic,
        layer_names=info.layer_names, stats=stats,
    )
    return stats


def cmd_calcstats(paths: list[str], include_hist: bool = True,
                  approx: bool = False) -> int:
    import ray

    own_session = not ray.is_initialized()
    if own_session:
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    for p in paths:
        stats = _calc_one(p, include_hist, approx=approx)
        print(json.dumps({"file": p, "stats": stats}))
    if own_session:
        ray.shutdown()
    return 0


def cmd_printstats(paths: list[str]) -> int:
    from .sources.tileraster import read_stats_sidecar

    rc = 0
    for p in paths:
        stats = read_stats_sidecar(p)
        if stats is None:
            print(json.dumps({"file": p, "error": "no stats stored"}))
            rc = 1
        else:
            print(json.dumps({"file": p, "stats": stats}))
    return rc


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="rios_ray.cli")
    sub = ap.add_subparsers(dest="cmd", required=True)
    c = sub.add_parser("calcstats", help="recompute stats into the sidecar")
    c.add_argument("paths", nargs="+")
    c.add_argument("--no-hist", action="store_true")
    c.add_argument("--approx", action="store_true",
                   help="sampled-scan approximate stats (reference approx_ok)")
    p = sub.add_parser("printstats", help="print stored stats")
    p.add_argument("paths", nargs="+")
    args = ap.parse_args(argv)
    if args.cmd == "calcstats":
        return cmd_calcstats(args.paths, include_hist=not args.no_hist,
                             approx=args.approx)
    return cmd_printstats(args.paths)


if __name__ == "__main__":
    sys.exit(main())
