"""Chunked columnar RAT store — the Zarr-backend analogue (SURVEY S13).

Reference semantics (``/root/reference/rios/ratapplier.py:283-311`` —
``RatZarrHandle`` — and the chunk-size negotiation at ``:719-747``):
a RAT whose columns live as independently addressable fixed-length
chunk objects, so a processor fetches exactly the ``(column, chunk)``
objects it needs — the object-store access pattern (one S3 GET per
column-chunk) rather than a row-oriented file scan.  The zarr package
is not in this environment, so the store is implemented natively with
the same layout contract:

::

    store.ratz/
      _meta.json                  nrows / chunk_len / column dtypes
      <column>/c<i>.parquet       rows [i*chunk_len, (i+1)*chunk_len)

Every chunk write is atomic (tmp + rename), which makes chunk-parallel
writers idempotent — the property ``rat_apply_store`` uses for
checkpoint-resume (a re-run skips chunks whose outputs already exist,
the ``runtime.py`` lineage contract applied to RATs).
"""

from __future__ import annotations

import json
import os
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DEFAULT_CHUNK_LEN = 100_000  # reference ratapplier.py:370

_META = "_meta.json"


class RatChunkStore:
    """Handle onto one chunked columnar RAT directory."""

    def __init__(self, path: str):
        self.path = path

    # -- creation ----------------------------------------------------------

    @classmethod
    def create(cls, path: str, nrows: int, chunk_len: int = DEFAULT_CHUNK_LEN,
               columns: dict[str, str] | None = None) -> "RatChunkStore":
        os.makedirs(path, exist_ok=True)
        meta = {"nrows": int(nrows), "chunk_len": int(chunk_len),
                "columns": dict(columns or {})}
        tmp = os.path.join(path, f".{_META}.{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, os.path.join(path, _META))
        return cls(path)

    @classmethod
    def from_table(cls, table: pa.Table, path: str,
                   chunk_len: int = DEFAULT_CHUNK_LEN) -> "RatChunkStore":
        """Materialize a pyarrow table as a chunk store (driver-side
        convenience for small RATs; big RATs are written chunk-parallel
        by ``rat_apply_store``)."""
        store = cls.create(
            path, table.num_rows, chunk_len,
            {c: str(table.schema.field(c).type) for c in table.column_names},
        )
        for i in range(store.n_chunks):
            lo = i * chunk_len
            sl = table.slice(lo, chunk_len)
            for c in table.column_names:
                store.write_column_chunk(c, i, sl[c])
        return store

    # -- metadata ----------------------------------------------------------

    @property
    def meta(self) -> dict:
        with open(os.path.join(self.path, _META)) as f:
            return json.load(f)

    @property
    def nrows(self) -> int:
        return self.meta["nrows"]

    @property
    def chunk_len(self) -> int:
        return self.meta["chunk_len"]

    @property
    def n_chunks(self) -> int:
        m = self.meta
        return max(1, -(-m["nrows"] // m["chunk_len"])) if m["nrows"] else 0

    @property
    def columns(self) -> list[str]:
        return sorted(self.meta["columns"])

    def _chunk_path(self, column: str, i: int) -> str:
        return os.path.join(self.path, column, f"c{i}.parquet")

    def has_chunk(self, column: str, i: int) -> bool:
        return os.path.exists(self._chunk_path(column, i))

    # -- chunk I/O (the per-object access pattern) ---------------------------

    def write_column_chunk(self, column: str, i: int, values) -> None:
        """Atomic single-(column, chunk) object write."""
        if isinstance(values, pa.ChunkedArray):
            values = values.combine_chunks()
        elif not isinstance(values, pa.Array):
            values = pa.array(np.asarray(values))
        d = os.path.join(self.path, column)
        os.makedirs(d, exist_ok=True)
        final = self._chunk_path(column, i)
        tmp = f"{final}.{uuid.uuid4().hex}.tmp"
        pq.write_table(pa.table({column: values}), tmp)
        os.replace(tmp, final)

    def read_column_chunk(self, column: str, i: int) -> pa.Array:
        t = pq.read_table(self._chunk_path(column, i))
        return t[column].combine_chunks()

    def read_chunk(self, i: int, columns: list[str] | None = None) -> pa.Table:
        """One chunk as a table, touching ONLY the requested columns'
        objects (the pruned-GET pattern)."""
        cols = columns if columns is not None else self.columns
        return pa.table({c: self.read_column_chunk(c, i) for c in cols})

    def read_all(self, columns: list[str] | None = None) -> pa.Table:
        return pa.concat_tables(
            self.read_chunk(i, columns) for i in range(self.n_chunks)
        )


def rat_apply_store(
    user_fn,
    in_store: RatChunkStore | str,
    out_path: str,
    columns: list[str] | None = None,
    resume: bool = False,
) -> RatChunkStore:
    """Chunk-parallel RAT apply over a chunk store.

    The Ray-native replacement for the reference's strictly sequential
    zarr chunk loop (``ratapplier.py:69``: "one chunk at a time"):
    chunks are independent, so they become one streaming Dataset over
    chunk indices; each task GETs only the probed input columns' chunk
    objects, runs the user function, and PUTs each output column's
    chunk object atomically.  ``resume=True`` skips chunks whose output
    objects all exist — safe because writes are atomic and chunk ids
    are deterministic.
    """
    import ray.data

    from ..ratapplier import RatChunkInputs, RatChunkOutputs

    in_store = RatChunkStore(in_store) if isinstance(in_store, str) else in_store
    if columns is None:
        accessed: set[str] = set()
        probe = in_store.read_chunk(0)
        out0 = RatChunkOutputs()
        user_fn(RatChunkInputs(probe, accessed), out0)
        columns = sorted(accessed)
        out_cols = {
            c: str(out0.to_table().schema.field(c).type)
            for c in out0.to_table().column_names
        }
    else:
        probe = in_store.read_chunk(0, columns)
        out0 = RatChunkOutputs()
        user_fn(RatChunkInputs(probe), out0)
        out_cols = {
            c: str(out0.to_table().schema.field(c).type)
            for c in out0.to_table().column_names
        }

    out_store = RatChunkStore.create(
        out_path, in_store.nrows, in_store.chunk_len, out_cols
    )
    in_path, out_dir = in_store.path, out_store.path
    names = list(out_cols)

    def run(b: pa.Table) -> pa.Table:
        src = RatChunkStore(in_path)
        dst = RatChunkStore(out_dir)
        done = []
        for i in b["chunk"].to_pylist():
            if resume and all(dst.has_chunk(c, i) for c in names):
                done.append((i, 0))
                continue
            t = src.read_chunk(i, columns)
            outputs = RatChunkOutputs()
            user_fn(RatChunkInputs(t), outputs)
            out = outputs.to_table()
            if out.num_rows != t.num_rows:
                raise ValueError(
                    f"chunk {i}: wrote {out.num_rows} rows, input has {t.num_rows}"
                )
            for c in out.column_names:
                dst.write_column_chunk(c, i, out[c])
            done.append((i, out.num_rows))
        return pa.table({
            "chunk": pa.array([d[0] for d in done], type=pa.int64()),
            "rows_written": pa.array([d[1] for d in done], type=pa.int64()),
        })

    idx = ray.data.from_items([{"chunk": i} for i in range(in_store.n_chunks)])
    # consume for effect; the lineage table is tiny (one row per chunk)
    idx.map_batches(run, batch_format="pyarrow", batch_size=1).materialize()
    return out_store
