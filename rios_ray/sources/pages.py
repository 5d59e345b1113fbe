"""Dataset sources.

The planning-time probe pattern mirrors the reference's open/probe step
(``/root/reference/rios/fileinfo.py:35-108`` ImageInfo): schema and row
counts come from parquet metadata on the driver, no cluster work.
"""

from __future__ import annotations

import pyarrow.parquet as pq
import ray.data

from .. import synth


def read_pages(
    sf_dir: str,
    columns: list[str] | None = None,
    paths: list[str] | None = None,
) -> ray.data.Dataset:
    """Pages table for a testdata sf dir (synthesized idempotently).

    ``columns`` prunes at the read (parquet column projection) — a read
    that loads `html` for a lat/lon-only pipeline is wasted I/O.
    ``paths`` restricts the read to specific shard files (the
    checkpoint-resume unit — see rios_ray.runtime).
    """
    path = synth.ensure_pages(sf_dir)
    return ray.data.read_parquet(paths if paths is not None else path, columns=columns)


def read_polygons() -> ray.data.Dataset:
    path, _ = synth.ensure_polygons()
    return ray.data.read_parquet(path)


def probe_schema(path: str):
    """Driver-side metadata probe (ImageInfo analogue): schema + rows."""
    f = pq.ParquetFile(path)
    return f.schema_arrow, f.metadata.num_rows
