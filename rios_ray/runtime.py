"""Checkpoint-resume runtime: per-partition lineage records + metrics.

The reference has no checkpointing (any worker exception aborts the
run, ``/root/reference/rios/applier.py:1047-1052``); the BASELINE north
rule requires it, so this layer is designed rather than ported:

- **Partition** = resumable unit of work (an input shard, a key-range
  bucket).  Each partition runs as its own short Ray Data pipeline
  writing to ``out_dir/part=<name>/`` — failure mid-partition leaves no
  lineage record, so a re-run redoes exactly that partition (the
  partition write is idempotent: the directory is replaced on retry).
- **Lineage record** = one JSON file per committed partition under
  ``out_dir/_lineage/`` carrying inputs, rows/bytes out, wall time,
  attempt count and Ray job id.  Commit is atomic (tmp + rename), so a
  record either exists complete or not at all.
- **Metrics** = a per-run actor accumulating (stage, partition) ->
  rows/bytes/batches from a zero-copy pass-through ``map_batches``
  wrapper; fire-and-forget remote adds keep the hot path non-blocking.

At cluster scale the driver loop issues partitions; each is a bounded
streaming job, so the object store never holds more than a partition's
working set and a preempted node costs one partition of rework.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict, dataclass, field

import pyarrow as pa
import ray

LINEAGE_DIRNAME = "_lineage"


# --------------------------------------------------------------------------
# metrics
# --------------------------------------------------------------------------


@ray.remote(num_cpus=0)
class MetricsCollector:
    """Run-long (stage, partition) -> {rows, bytes, batches} accumulator.

    The RIOS analogue is the merged ``Timers``/accumulator state
    (``/root/reference/rios/structures.py:770-902``), kept here in one
    zero-CPU actor instead of per-thread dicts merged at exit.
    """

    def __init__(self):
        self._m: dict[tuple, dict] = {}

    def add(self, stage: str, partition: str, rows: int, nbytes: int) -> None:
        key = (stage, partition)
        e = self._m.setdefault(key, {"rows": 0, "bytes": 0, "batches": 0})
        e["rows"] += rows
        e["bytes"] += nbytes
        e["batches"] += 1

    def summary(self) -> dict:
        return {f"{s}/{p}": dict(v) for (s, p), v in sorted(self._m.items())}

    def partition_totals(self, stage: str) -> dict[str, dict]:
        return {p: dict(v) for (s, p), v in self._m.items() if s == stage}


def with_metrics(ds, collector, stage: str, partition: str):
    """Pass-through stage that reports every batch's rows/bytes.

    Zero-copy: the batch is returned as-is; only its counters travel to
    the collector (remote call, not awaited on the hot path).
    """

    def observe(b: pa.Table) -> pa.Table:
        collector.add.remote(stage, partition, b.num_rows, b.nbytes)
        return b

    return ds.map_batches(observe, batch_format="pyarrow", zero_copy_batch=True)


# --------------------------------------------------------------------------
# lineage manifest
# --------------------------------------------------------------------------


@dataclass
class LineageRecord:
    partition: str
    inputs: list[str]
    rows_out: int
    bytes_out: int
    wall_s: float
    attempt: int
    job_id: str
    committed_at: float
    extra: dict = field(default_factory=dict)


class Manifest:
    """Directory of per-partition lineage JSON records (atomic commit)."""

    def __init__(self, out_dir: str):
        self.dir = os.path.join(out_dir, LINEAGE_DIRNAME)
        os.makedirs(self.dir, exist_ok=True)

    def _path(self, partition: str) -> str:
        return os.path.join(self.dir, f"{partition}.json")

    def done(self) -> set[str]:
        return {f[:-5] for f in os.listdir(self.dir) if f.endswith(".json")}

    def read(self, partition: str) -> LineageRecord:
        with open(self._path(partition)) as f:
            return LineageRecord(**json.load(f))

    def commit(self, rec: LineageRecord) -> None:
        tmp = self._path(rec.partition) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(asdict(rec), f)
        os.replace(tmp, self._path(rec.partition))

    def invalidate(self, partition: str) -> None:
        try:
            os.remove(self._path(partition))
        except FileNotFoundError:
            pass


# --------------------------------------------------------------------------
# resumable partitioned run
# --------------------------------------------------------------------------


def run_resumable(
    partitions: dict[str, list[str]],
    build,
    out_dir: str,
    collector=None,
    stage: str = "write",
) -> dict:
    """Run ``build(name, inputs) -> Dataset`` per partition, skipping
    committed ones; write each to ``out_dir/part=<name>/`` and commit a
    lineage record.

    ``partitions``: partition name -> list of input paths (recorded as
    lineage).  Returns {"ran": [...], "skipped": [...], "manifest": M}.
    """
    manifest = Manifest(out_dir)
    done = manifest.done()
    own_collector = collector is None
    if own_collector:
        collector = MetricsCollector.remote()
    ran, skipped = [], []
    try:
        job_id = ray.get_runtime_context().get_job_id()
    except Exception:
        job_id = "driver"

    for name, inputs in partitions.items():
        if name in done:
            skipped.append(name)
            continue
        part_dir = os.path.join(out_dir, f"part={name}")
        t0 = time.time()
        ds = build(name, inputs)
        ds = with_metrics(ds, collector, stage, name)
        # idempotent retry: replace any partial output from a failed try
        import shutil

        shutil.rmtree(part_dir, ignore_errors=True)
        ds.write_parquet(part_dir)
        # metric adds are fire-and-forget from workers; the write being
        # done means they were submitted, not landed — poll until two
        # consecutive reads agree (bounded)
        totals = None
        for _ in range(40):
            cur = ray.get(collector.partition_totals.remote(stage)).get(name)
            if cur is not None and cur == totals:
                break
            totals = cur
            time.sleep(0.05)
        totals = totals or {"rows": 0, "bytes": 0}
        manifest.commit(
            LineageRecord(
                partition=name,
                inputs=list(inputs),
                rows_out=totals["rows"],
                bytes_out=totals["bytes"],
                wall_s=round(time.time() - t0, 3),
                attempt=1,
                job_id=job_id,
                committed_at=time.time(),
            )
        )
        ran.append(name)
    return {"ran": ran, "skipped": skipped, "manifest": manifest, "collector": collector}


def shard_partitions(path: str) -> dict[str, list[str]]:
    """One partition per input shard file (the resumable layout the
    synth pages fixture is written in — synth.py SHARD_ROWS)."""
    shards = sorted(
        f for f in os.listdir(path) if f.endswith(".parquet")
    )
    return {os.path.splitext(f)[0]: [os.path.join(path, f)] for f in shards}
