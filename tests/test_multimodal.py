"""Multimodal stage tests: real kernels (resize, features, sampling)
against numpy oracles; stubbed decode is deterministic; the Ray-side
plumbing (schema, actor pool, batch flow) is exercised end-to-end."""

import numpy as np
import pyarrow as pa
import pytest

from rios_ray.pipelines import multimodal as M
from rios_ray.stages import multimodal as S

SF = "/root/testdata/sf0.001"


def test_fake_decode_deterministic_and_shaped():
    a = S.fake_decode(b"payload-bytes", 5, 7)
    b = S.fake_decode(b"payload-bytes", 5, 7)
    c = S.fake_decode(b"other-bytes", 5, 7)
    assert a.shape == (5, 7, 3) and a.dtype == np.uint8
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)
    assert S.fake_decode(b"", 2, 2).shape == (2, 2, 3)


def test_decode_real_codec_raises_without_pil():
    with pytest.raises(NotImplementedError):
        S.ImageDecodeStage(codec="real")


def test_resize_nearest_matches_numpy_oracle():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (10, 14, 3), dtype=np.uint8)
    got = S.resize_nearest(img, 4, 6)
    # independent oracle: explicit per-pixel index math
    want = np.empty((4, 6, 3), dtype=np.uint8)
    for r in range(4):
        for c in range(6):
            want[r, c] = img[(r * 10) // 4, (c * 14) // 6]
    assert np.array_equal(got, want)
    # upscale too
    up = S.resize_nearest(img, 20, 28)
    assert up.shape == (20, 28, 3)
    assert np.array_equal(up[::2, ::2], img)


def test_feature_stage_matches_numpy(ray_session):
    ds = M.image_features(SF, out_h=8, out_w=8)
    df = ds.to_pandas().sort_values("url").reset_index(drop=True)
    schema = set(df.columns)
    assert schema == {
        "url", "mean_r", "mean_g", "mean_b", "std_r", "std_g", "std_b", "luma_hist",
    }
    assert (df["mean_r"] >= 0).all() and (df["mean_r"] <= 255).all()
    assert all(len(h) == S.ImageFeatureStage.N_BINS for h in df["luma_hist"])
    assert all(sum(h) == 64 for h in df["luma_hist"])  # 8x8 pixels

    # recompute one row end-to-end with plain numpy
    import pyarrow.parquet as pq

    from rios_ray import synth
    from rios_ray.dedup.hashing import fnv1a64

    t = pq.read_table(synth.pages_path(SF), columns=["url", "html"])
    url0 = df["url"][0]
    i = t["url"].to_pylist().index(url0)
    payload = t["html"][i].as_py()
    h = fnv1a64([url0])[0]
    mh, mw = int(8 + h % np.uint64(9)), int(8 + (h >> np.uint64(8)) % np.uint64(9))
    img = S.resize_nearest(S.fake_decode(payload, mh, mw), 8, 8)
    f = img.reshape(-1, 3).astype(np.float64)
    assert df["mean_r"][0] == pytest.approx(f[:, 0].mean(), abs=0)
    assert df["std_b"][0] == pytest.approx(f[:, 2].std(), abs=0)


def test_frame_samples_match_python(ray_session):
    got = M.frame_samples(SF).to_pandas()
    import pyarrow.parquet as pq

    from rios_ray import synth

    t = pq.read_table(synth.pages_path(SF), columns=["url", "html"])
    want = []
    for u, p in zip(t["url"].to_pylist(), t["html"].to_pylist()):
        n = len(p) // M.FRAME_BYTES
        for k in range(0, n, M.FRAME_EVERY):
            want.append((u, k, p[k * M.FRAME_BYTES:(k + 1) * M.FRAME_BYTES]))
    assert len(got) == len(want)
    got_set = set(zip(got["url"], got["frame_idx"], got["frame"]))
    assert got_set == set(want)
    assert all(len(f) == M.FRAME_BYTES for _, _, f in want)


def _rows_matrices(batch: pa.Table) -> list:
    """Scalar oracle: (h, w, c) views of each row's pixels."""
    px = batch["pixels"]
    if isinstance(px, pa.ChunkedArray):
        px = px.combine_chunks()
    flat = px.flatten().to_numpy(zero_copy_only=False)
    offs = px.offsets.to_numpy(zero_copy_only=False)
    h = batch["height"].to_numpy()
    w = batch["width"].to_numpy()
    return [
        flat[offs[i]: offs[i + 1]].reshape(h[i], w[i], 3)
        for i in range(len(h))
    ]


def test_pixels_roundtrip_schema():
    base = {"url": pa.array(["a", "b"])}
    rows = [
        np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3),
        np.arange(4 * 2 * 3, dtype=np.uint8).reshape(4, 2, 3),
    ]
    t = S._pixels_table(base, rows, np.array([2, 4]), np.array([3, 2]))
    back = _rows_matrices(t)
    assert np.array_equal(back[0], rows[0])
    assert np.array_equal(back[1], rows[1])


def test_frame_dedup_vs_duckdb(ray_session):
    import duckdb

    from rios_ray import synth
    from rios_ray.pipelines.multimodal import FRAME_BYTES, FRAME_EVERY, frame_dedup

    got = frame_dedup(SF, key="md5").to_pandas()
    want = duckdb.sql(f"""
        WITH m AS (SELECT url, html,
                          CAST(floor(octet_length(html) / {FRAME_BYTES}) AS BIGINT) AS n_frames
                     FROM read_parquet('{synth.pages_path(SF)}/*.parquet')),
        idx AS (SELECT url, html,
                       unnest(generate_series(0, n_frames - 1, {FRAME_EVERY})) AS frame_idx
                  FROM m WHERE n_frames > 0),
        f AS (SELECT url, frame_idx,
                     md5(substring(decode(html),
                                   CAST(frame_idx * {FRAME_BYTES} + 1 AS BIGINT),
                                   {FRAME_BYTES})) AS frame_key
                FROM idx),
        d AS (SELECT frame_key, url, frame_idx,
                     row_number() OVER (PARTITION BY frame_key ORDER BY url, frame_idx) AS rn,
                     count(*) OVER (PARTITION BY frame_key) AS n_copies
                FROM f)
        SELECT frame_key, url AS keep_url, frame_idx AS keep_idx, n_copies
          FROM d WHERE rn = 1""").df()
    assert len(got) == len(want) > 0
    g = sorted(map(tuple, got[["frame_key", "keep_url", "keep_idx", "n_copies"]].itertuples(index=False)))
    w = sorted(map(tuple, want[["frame_key", "keep_url", "keep_idx", "n_copies"]].itertuples(index=False)))
    assert g == w
    # total copies reconstruct the sampled frame count
    assert got["n_copies"].sum() == duckdb.sql(f"""
        SELECT count(*) FROM (
          SELECT unnest(generate_series(0,
                   CAST(floor(octet_length(html) / {FRAME_BYTES}) AS BIGINT) - 1,
                   {FRAME_EVERY}))
            FROM read_parquet('{synth.pages_path(SF)}/*.parquet')
           WHERE octet_length(html) >= {FRAME_BYTES})""").fetchone()[0]


def test_frame_dedup_fnv_matches_md5_groups(ray_session):
    """The vectorized FNV default finds the SAME duplicate groups as
    the md5 oracle-parity path (keys differ; group structure — keeper
    and copy count — must not)."""
    from rios_ray.pipelines.multimodal import frame_dedup

    fnv = frame_dedup(SF, key="fnv").to_pandas()
    md5 = frame_dedup(SF, key="md5").to_pandas()
    assert len(fnv) == len(md5) > 0
    assert fnv["frame_key"].str.fullmatch("[0-9a-f]{16}").all()
    cols = ["keep_url", "keep_idx", "n_copies"]
    g = sorted(map(tuple, fnv[cols].itertuples(index=False)))
    w = sorted(map(tuple, md5[cols].itertuples(index=False)))
    assert g == w


def test_image_ahash_properties(ray_session):
    """aHash is 64 '0'/'1' chars, matches a per-image scalar recompute
    through the independent (scalar) decode+resize path, and identical
    payloads hash identically."""
    import numpy as np

    from rios_ray.dedup.hashing import fnv1a64
    from rios_ray.pipelines.multimodal import image_ahash
    from rios_ray.stages.multimodal import fake_decode, resize_nearest

    sf = "/root/testdata/sf0.001"
    got = image_ahash(sf).to_pandas().set_index("url")["ahash"]
    assert got.str.len().eq(64).all()
    assert got.str.fullmatch("[01]{64}").all()

    import pyarrow.parquet as pq

    from rios_ray.synth import ensure_pages
    pages = pq.read_table(ensure_pages(sf), columns=["url", "html"])
    # scalar recompute on a sample of 25 urls
    urls = pages["url"].to_pylist()[:25]
    payloads = [b.as_py() for b in pages["html"][:25]]
    hs = fnv1a64(urls)
    for u, p, h in zip(urls, payloads, hs):
        hh = int(h)
        img = fake_decode(p, 8 + hh % 9, 8 + (hh >> 8) % 9)
        small = resize_nearest(img, 8, 8).reshape(64, 3).astype(np.int64)
        luma = 299 * small[:, 0] + 587 * small[:, 1] + 114 * small[:, 2]
        want = "".join("1" if v * 64 > luma.sum() else "0" for v in luma)
        assert got[u] == want, u
