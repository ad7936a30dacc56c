"""Multimodal plumbing tests: schema contract, Arrow batch shape,
deterministic stub decode, metadata-only column pruning."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from flights_data_pipeline_spark.extensions import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    df = mm.synthetic_media(spark, n=64)
    df.cache().count()
    return df


def test_schema_contract(media):
    assert media.schema == mm.MEDIA_SCHEMA


def test_extract_image_features_deterministic(spark, media):
    feats = mm.extract_image_features(media, n_features=8)
    assert feats.schema == mm.IMAGE_FEATURES_SCHEMA
    rows = {r.media_id: r for r in feats.collect()}
    assert len(rows) == 64
    # independently recompute one row's stub decode
    payload = bytes(hashlib.sha256(b"media-3").digest() * (4 + 3 % 7))
    mean_pixel, feature = mm.decode_image_stub(payload, 8)
    got = rows[3]
    assert got.payload_sha == hashlib.sha256(payload).hexdigest()
    assert got.n_bytes == len(payload)
    assert got.mean_pixel == pytest.approx(mean_pixel)
    assert [pytest.approx(x, rel=1e-6) for x in got.feature] == list(feature)


def test_extract_runs_partitioned(spark, media):
    """mapInPandas must work across multiple partitions (batch-per-part)."""
    feats = mm.extract_image_features(media.repartition(8))
    assert feats.count() == 64


def test_frame_sampling(media):
    frames = mm.sample_frames(media, every_n=10)
    rows = frames.collect()
    assert all(r.frame_idx % 10 == 0 for r in rows)
    by_id = {}
    for r in rows:
        by_id.setdefault(r.media_id, []).append(r.frame_idx)
    # a 120-frame video sampled every 10 → 12 frames
    meta = {r.media_id: r.meta.n_frames for r in media.filter("meta.kind = 'video'").collect()}
    for mid, idxs in by_id.items():
        assert len(idxs) == -(-meta[mid] // 10)


def test_resize_plan_bounds(media):
    plan = mm.resize_plan(media, max_side=224).collect()
    assert len(plan) > 0
    for r in plan:
        assert max(r.target_width, r.target_height) <= 224
        # aspect ratio preserved within rounding
        assert abs(r.target_width / r.target_height - r.width / r.height) < 0.02


def test_metadata_plan_prunes_payload(media, spark):
    """A metadata-only query must not read the payload column."""
    tmp = "/tmp/fdp_media_prune"
    media.write.mode("overwrite").parquet(tmp)
    spark.read.parquet(tmp).createOrReplaceTempView("media_prune")
    formatted = "\n".join(
        r[0]
        for r in spark.sql(
            "EXPLAIN FORMATTED SELECT media_id, meta.format "
            "FROM media_prune WHERE meta.kind = 'image'"
        ).collect()
    )
    read_schema = [l for l in formatted.splitlines() if "ReadSchema" in l]
    assert read_schema and all("payload" not in l for l in read_schema), formatted


def test_real_decode_is_gated():
    with pytest.raises(NotImplementedError):
        mm.decode_image_real(b"\x89PNG")


def test_audio_features_deterministic(spark, media):
    feats = mm.extract_audio_features(media)
    rows = {r.media_id: r for r in feats.collect()}
    # media fixture assigns kind round-robin: audio = ids 1, 4, 7, ...
    assert set(rows) == {i for i in range(64) if i % 3 == 1}
    payload = bytes(hashlib.sha256(b"media-1").digest() * (4 + 1 % 7))
    n_windows, rms = mm.decode_audio_stub(payload, 16000)
    assert rows[1].n_bytes == len(payload)
    assert rows[1].n_windows == n_windows
    assert rows[1].rms == pytest.approx(rms)


def test_arrow_batch_bound_is_respected(spark, media):
    """With maxRecordsPerBatch set from the payload-size math, no Arrow
    batch handed to Python may exceed the bound."""
    bound = 4
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(bound))
    try:
        feats = mm.extract_audio_features(media.coalesce(1))
        batch_sizes = [r.batch_rows for r in feats.collect()]
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert batch_sizes and max(batch_sizes) <= bound


def test_arrow_batch_records_math():
    MiB = 1024 * 1024
    assert mm.arrow_batch_records(1 * MiB) == 64          # 1 MiB images
    assert mm.arrow_batch_records(10 * 1024) == 6553      # 10 KiB thumbs
    assert mm.arrow_batch_records(512 * MiB) == 1         # video segments
    with pytest.raises(ValueError):
        mm.arrow_batch_records(0)


def test_frame_features_deterministic_and_sampled(spark, media):
    feats = mm.extract_frame_features(media, every_n=10)
    rows = [(r.media_id, r.frame_idx, r.frame_sha, r.mean_intensity) for r in feats.collect()]
    by_media = {}
    for m, i, sha, mi in rows:
        by_media.setdefault(m, []).append((i, sha, mi))
    # only video rows (kind round-robin: ids 2, 5, 8, ...)
    assert set(by_media) == {i for i in range(64) if i % 3 == 2}
    # media 2: n_frames = 30 * (1 + 2 % 4) = 90 → frames 0,10,...,80
    assert sorted(i for i, _, _ in by_media[2]) == list(range(0, 90, 10))
    # recompute one frame's stub independently
    payload = bytes(hashlib.sha256(b"media-2").digest() * (4 + 2 % 7))
    sha, mi = mm.decode_frame_stub(payload, 10)
    got = {i: (s, m) for i, s, m in by_media[2]}
    assert got[10] == (sha, pytest.approx(mi))


def test_sample_frames_payload_accounting(media):
    """Byte accounting comes from metadata only: payload_bytes is the
    container size, frame_bytes_est its per-frame integer share."""
    frames = mm.sample_frames(media, every_n=10)
    meta = {
        r.media_id: (len(r.payload), r.meta.n_frames)
        for r in media.filter("meta.kind = 'video'").collect()
    }
    for r in frames.collect():
        nbytes, nframes = meta[r.media_id]
        assert r.payload_bytes == nbytes
        assert r.frame_bytes_est == nbytes // nframes


def test_resize_images_deterministic_and_bounded(spark, media):
    """The numpy box-filter resize: bounded target dims, deterministic
    checksums across runs, means within pixel range."""
    out1 = {r.media_id: r for r in mm.resize_images(media, max_side=32).collect()}
    out2 = {r.media_id: r for r in mm.resize_images(media, max_side=32).collect()}
    assert out1.keys() == out2.keys() and len(out1) > 0
    for mid, r in out1.items():
        assert max(r.target_width, r.target_height) <= 32
        assert 0.0 <= r.resized_mean <= 255.0
        assert r.resized_sha == out2[mid].resized_sha
        # aspect ratio preserved within rounding
        assert abs(
            r.width / r.height - r.target_width / r.target_height
        ) < 0.2


def test_resize_stub_exact_small_case():
    """4x2 image of known bytes halved to 2x1: each target pixel is the
    mean of its 2x2 block — verifiable by hand through the hash
    expansion."""
    import hashlib

    import numpy as np

    payload = b"px"
    # reproduce the expansion: first block after seed
    seed = hashlib.sha256(payload).digest()
    block = hashlib.sha256(seed).digest()
    px = np.frombuffer(block[:8], dtype=np.uint8).reshape(2, 4)
    want = np.clip(
        np.floor(
            np.array(
                [[px[0:2, 0:2].mean(), px[0:2, 2:4].mean()]]
            ) + 0.5
        ), 0, 255,
    ).astype(np.uint8)
    mean, sha = mm.resize_image_stub(payload, 4, 2, 2, 1)
    assert sha == hashlib.sha256(want.tobytes()).hexdigest()
    assert mean == float(want.mean())


def test_resize_stub_upscale_no_nan():
    """Upscaling (tw > w) makes interior buckets empty under the old
    boundary-only guard, yielding NaN means (ADVICE round 3); every
    bucket must clamp to span >= 1 source pixel."""
    import math

    mean, sha = mm.resize_image_stub(b"px", 2, 2, 5, 3)
    assert mean is not None and not math.isnan(mean)
    m2, s2 = mm.resize_image_stub(b"px", 2, 2, 5, 3)
    assert (mean, sha) == (m2, s2)


# ---------------------------------------------------------------------------
# Perceptual hashing: locality, banding recall, popcount verification.
# ---------------------------------------------------------------------------
def test_ahash_locality_and_near_dup_join(spark):
    from flights_data_pipeline_spark.extensions.multimodal import (
        MEDIA_SCHEMA,
        ahash_stub,
        near_dup_media,
        perceptual_hash_media,
        synthetic_media,
    )

    media = synthetic_media(spark, n=32).select("media_id", "payload", "meta")
    rows = media.select("media_id", "payload").collect()
    base = {r["media_id"]: bytes(r["payload"]) for r in rows}

    # plant a near-dup of media 0: flip a couple of bytes mid-payload
    src = bytearray(base[0])
    src[3] = (src[3] + 1) % 256
    src[len(src) // 2] = (src[len(src) // 2] + 1) % 256
    planted_id = 10_000
    planted = spark.createDataFrame(
        [(planted_id, bytes(src), None)], MEDIA_SCHEMA
    )
    all_media = media.unionByName(planted)

    hashes = perceptual_hash_media(all_media)
    hv = {r["media_id"]: r["ahash"] for r in hashes.collect()}
    # mapInPandas output matches the pure-Python kernel bit-for-bit
    assert hv[0] == ahash_stub(base[0])
    # locality: the planted twin is within a few bits of its source...
    def ham(x, y):
        return bin((x ^ y) & ((1 << 64) - 1)).count("1")

    assert ham(hv[0], hv[planted_id]) <= 6
    # ...while unrelated payloads are far apart
    far = [ham(hv[0], hv[i]) for i in base if i != 0]
    assert min(far) > 6

    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in near_dup_media(hashes).collect()
    }
    assert (0, planted_id) in pairs
    assert pairs[(0, planted_id)] == ham(hv[0], hv[planted_id])
    # every emitted pair actually satisfies the verification bound,
    # with the reported hamming recomputed from the hashes directly
    for (a, b), h in pairs.items():
        assert h == ham(hv[a], hv[b])
        assert h <= 6
