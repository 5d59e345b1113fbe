"""Chunked columnar RAT store (the zarr-backend analogue, SURVEY S13):
layout roundtrip, pruned column access, chunk-parallel apply parity
with the row-group ratapplier, and idempotent resume."""

import os

import numpy as np
import pyarrow as pa
import pytest

from rios_ray.sources.ratstore import RatChunkStore, rat_apply_store

N = 2500
CHUNK = 400


@pytest.fixture()
def rat_table():
    rng = np.random.default_rng(11)
    return pa.table(
        {
            "value": pa.array(rng.integers(0, 1000, N)),
            "weight": pa.array(rng.uniform(0, 1, N)),
            "label": pa.array([f"c{i % 9}" for i in range(N)]),
        }
    )


def test_roundtrip(tmp_path, rat_table):
    store = RatChunkStore.from_table(rat_table, str(tmp_path / "r.ratz"), CHUNK)
    assert store.nrows == N
    assert store.n_chunks == -(-N // CHUNK)
    back = store.read_all()
    assert back.select(rat_table.column_names).equals(rat_table)


def test_pruned_column_access(tmp_path, rat_table):
    # reading a column subset must not touch the other columns' objects:
    # delete them and prove the read still works
    store = RatChunkStore.from_table(rat_table, str(tmp_path / "r.ratz"), CHUNK)
    for i in range(store.n_chunks):
        os.remove(store._chunk_path("label", i))
    got = store.read_all(["value", "weight"])
    assert got.num_rows == N
    with pytest.raises(FileNotFoundError):
        store.read_chunk(0, ["label"])


def test_apply_store_parity_with_ratapplier(tmp_path, rat_table, ray_session):
    from rios_ray.ratapplier import rat_apply, write_rat

    def derive(inputs, outputs):
        outputs.scaled = inputs.value * 2 + 1
        outputs.w2 = inputs.weight * inputs.weight

    store = RatChunkStore.from_table(rat_table, str(tmp_path / "in.ratz"), CHUNK)
    out = rat_apply_store(derive, store, str(tmp_path / "out.ratz"))
    got = out.read_all().to_pandas()

    ppath = str(tmp_path / "in.parquet")
    write_rat(rat_table, ppath, CHUNK)
    want = rat_apply(derive, ppath, block_len=CHUNK).to_pandas()
    np.testing.assert_array_equal(got["scaled"], want["scaled"])
    np.testing.assert_allclose(got["w2"], want["w2"], rtol=0, atol=0)
    # probe pruned the projection: 'label' never read
    assert out.columns == ["scaled", "w2"]


def test_apply_store_resume_skips_done_chunks(tmp_path, rat_table, ray_session):
    calls_path = str(tmp_path / "calls")
    os.makedirs(calls_path)

    def derive(inputs, outputs):
        # record every real chunk execution (probe + run); id by content
        v = inputs.value
        open(os.path.join(calls_path, f"{int(v[0])}_{len(v)}"), "w").close()
        outputs.scaled = v + 1

    store = RatChunkStore.from_table(rat_table, str(tmp_path / "in.ratz"), CHUNK)
    out1 = rat_apply_store(derive, store, str(tmp_path / "out.ratz"))
    n_first = len(os.listdir(calls_path))
    # wipe one chunk's output, re-run with resume: only that chunk re-executes
    os.remove(out1._chunk_path("scaled", 2))
    before = set(os.listdir(calls_path))
    out2 = rat_apply_store(derive, store, str(tmp_path / "out.ratz"), resume=True)
    after = set(os.listdir(calls_path))
    assert n_first >= out1.n_chunks  # every chunk ran once (+ probe)
    # resume re-ran the probe and the missing chunk only; all chunks present
    got = out2.read_all().to_pandas()
    np.testing.assert_array_equal(
        got["scaled"], rat_table["value"].to_numpy() + 1
    )
    assert len(after - before) <= 2


def test_string_column_through_store(tmp_path, rat_table, ray_session):
    """String RAT columns through the chunk store: read a stored string
    column, derive a new string column, chunked write + full read-back."""
    store = RatChunkStore.from_table(rat_table, str(tmp_path / "s.ratz"), CHUNK)

    def user_fn(inputs, outputs):
        outputs.value = inputs.value
        outputs.tagged = np.char.add(inputs.label.astype(str), "_t")

    out = rat_apply_store(user_fn, store, str(tmp_path / "s_out.ratz"))
    got = out.read_all(["value", "tagged"])
    want = [f"c{i % 9}_t" for i in range(N)]
    assert got["tagged"].to_pylist() == want
    assert got["value"].to_pylist() == rat_table["value"].to_pylist()
