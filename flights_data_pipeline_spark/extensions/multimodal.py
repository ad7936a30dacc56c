"""Multimodal column handling: opaque binary payloads + typed metadata.

Extension surface for large-scale training-data pipelines: image/audio/
video ride through the engine as ``BinaryType`` columns with a typed
metadata struct, and per-batch Python transforms (decode, resize,
feature-extract, frame-sample) run as Arrow-batched ``mapInPandas``
stages — the *only* place this engine drops out of the JVM, and it does
so vectorized (Arrow batch transfer), never row-at-a-time.

The container has no image/audio codecs, so the decode kernels are
STUBBED: ``decode_image_stub`` is a deterministic fake that derives
"pixels" from the payload bytes (so tests pin real schemas, batch
shapes and partitioning), and ``decode_image_real`` raises
``NotImplementedError`` with the dependency it would use. The
Spark-side plumbing — schema contract, ``mapInPandas`` signature,
Arrow batching, partition parallelism — is real and tested
(``tests/test_multimodal.py``).

Scale posture: payloads stay opaque end-to-end (no driver collect);
per-partition Python workers stream Arrow batches, so memory is
bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch`` × row
size. Metadata-only plans (filter/join on the struct) never touch the
binary column — column pruning drops it at the parquet scan.

**Batch-size math for binary columns (the config that bites first at
scale):** Arrow's records-per-batch default (10,000) is tuned for
scalar rows. A media table with 1 MiB payloads would hand each Python
worker ~10 GiB Arrow batches — a guaranteed OOM long before shuffle
or scan limits matter. The worker-memory bound is

    batch_bytes ≈ maxRecordsPerBatch × avg_payload_bytes

so records-per-batch must be derived from payload size
(``arrow_batch_records`` below: target ~64 MiB per batch ⇒ 64 rows
for 1 MiB images, 6553 rows for 10 KiB thumbnails). The same math
applies to ``spark.sql.files.maxPartitionBytes``: with 1 MiB rows a
128 MiB split is only ~128 rows — fine — but parquet stores binary
unencoded, so scan splits already track payload bytes; it is the
ARROW hop that silently multiplies memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: the multimodal column contract: payload + typed metadata.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("kind", T.StringType(), False),  # image|audio|video
                    T.StructField("format", T.StringType(), True),  # png|wav|mp4|...
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

#: output schema of the (stubbed) image feature extractor.
IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload_sha", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("mean_pixel", T.DoubleType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def decode_image_real(payload: bytes):  # pragma: no cover - env-gated
    """Real decode path — requires an image codec absent from this
    container; the stub below keeps the pipeline testable."""
    raise NotImplementedError(
        "image decode requires Pillow/opencv (not installed in this "
        "environment); use decode_image_stub for plumbing tests"
    )


def decode_image_stub(payload: bytes, n_features: int = 8) -> tuple[float, list[float]]:
    """Deterministic fake decode: derives a 'mean pixel' and a feature
    vector purely from the payload bytes (stable across runs/engines)."""
    if payload is None:
        return None, None
    digest = hashlib.sha256(payload).digest()
    mean_pixel = sum(payload) / len(payload) if len(payload) else 0.0
    feature = [digest[i] / 255.0 for i in range(n_features)]
    return mean_pixel, feature


def extract_image_features(df: DataFrame, n_features: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over media rows (``mapInPandas``).

    The generator signature (iterator of pandas batches in/out) is the
    100 TB-safe shape: constant memory per worker, one Python process
    per core, Arrow transfer both ways.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "media_id": pdf["media_id"],
                "payload_sha": pdf["payload"].map(
                    lambda b: hashlib.sha256(b).hexdigest() if b is not None else None
                ),
                "n_bytes": pdf["payload"].map(
                    lambda b: len(b) if b is not None else 0
                ),
            }
            decoded = pdf["payload"].map(lambda b: decode_image_stub(b, n_features))
            out["mean_pixel"] = decoded.map(lambda d: d[0])
            out["feature"] = decoded.map(lambda d: d[1])
            yield pd.DataFrame(out)

    return df.mapInPandas(batches, IMAGE_FEATURES_SCHEMA)


def arrow_batch_records(
    avg_payload_bytes: int, target_batch_bytes: int = 64 * 1024 * 1024
) -> int:
    """Records-per-Arrow-batch that keeps one batch near
    ``target_batch_bytes`` for a given average payload size — the
    value to set as ``spark.sql.execution.arrow.maxRecordsPerBatch``
    for media tables (see module docstring for the failure mode the
    default causes).
    """
    if avg_payload_bytes <= 0:
        raise ValueError("avg_payload_bytes must be positive")
    return max(1, target_batch_bytes // avg_payload_bytes)


#: output schema of the (stubbed) audio feature extractor.
AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("n_windows", T.IntegerType(), True),
        T.StructField("rms", T.DoubleType(), True),
        T.StructField("batch_rows", T.IntegerType(), False),
    ]
)


def decode_audio_stub(
    payload: bytes, sample_rate: int | None, window: int = 1024
) -> tuple[int, float]:
    """Deterministic fake audio decode: treats payload bytes as 8-bit
    samples; returns (window count, RMS amplitude in [0,1])."""
    if payload is None or not len(payload):
        return 0, 0.0
    n_windows = (len(payload) + window - 1) // window
    acc = 0.0
    for b in payload:
        centered = (b - 128) / 128.0
        acc += centered * centered
    return n_windows, (acc / len(payload)) ** 0.5


def extract_audio_features(df: DataFrame, window: int = 1024) -> DataFrame:
    """Arrow-batched audio feature extraction over media rows.

    Emits ``batch_rows`` (the size of the Arrow batch each row arrived
    in) so tests — and production canaries — can ASSERT the batch-size
    contract instead of trusting it: with maxRecordsPerBatch set per
    ``arrow_batch_records``, no batch may exceed that bound.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [
                decode_audio_stub(p, sr, window)
                for p, sr in zip(pdf["payload"], pdf["meta"].map(lambda m: m["sample_rate"]))
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["payload"].map(
                        lambda b: len(b) if b is not None else 0
                    ),
                    "n_windows": [d[0] for d in decoded],
                    "rms": [d[1] for d in decoded],
                    "batch_rows": len(pdf),
                }
            )

    return df.filter(F.col("meta.kind") == "audio").mapInPandas(
        batches, AUDIO_FEATURES_SCHEMA
    )


def sample_frames(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plan for video rows: explode frame indices 0,
    ``every_n``, 2·``every_n``… per video — pure JVM (sequence+explode),
    the decode of each sampled frame would then be a ``mapInPandas``
    stage like ``extract_image_features``.

    Each sampled row carries byte accounting — ``payload_bytes`` (the
    whole container) and ``frame_bytes_est`` (container bytes / frame
    count, integer division) — so a planner can size Arrow batches and
    executor memory for the decode stage BEFORE shipping any payload:
    at 100 TB the decision "how many frame rows per Arrow batch" must
    come from metadata, not from decoding."""
    n_frames = F.coalesce(F.col("meta.n_frames"), F.lit(1))
    return (
        df.filter(F.col("meta.kind") == "video")
        .select(
            "media_id",
            F.octet_length("payload").cast("bigint").alias("payload_bytes"),
            (F.octet_length("payload").cast("bigint") / n_frames)
            .cast("bigint")
            .alias("frame_bytes_est"),
            F.explode(
                F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
            ).alias("frame_idx"),
        )
    )


#: output schema of the (stubbed) video frame feature extractor.
FRAME_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_sha", T.StringType(), True),
        T.StructField("mean_intensity", T.DoubleType(), True),
    ]
)


def decode_frame_stub(payload: bytes, frame_idx: int) -> tuple[str, float]:
    """Deterministic fake frame decode: derives a per-frame digest and
    'mean intensity' from (payload, frame index) — stable across
    runs/engines, like the image/audio stubs."""
    if payload is None:
        return None, None
    h = hashlib.sha256(payload + frame_idx.to_bytes(4, "big")).digest()
    return h.hex(), sum(h[:16]) / (16 * 255.0)


def extract_frame_features(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video path end-to-end: JVM-side frame sampling (sequence +
    explode — the frame LIST never materializes in Python) feeding an
    Arrow-batched per-frame decode stage. One video row fans out to
    n_frames/every_n rows BEFORE the Python hop, so Arrow batch-size
    math (``arrow_batch_records``) applies to the per-frame payload
    slice a real decoder would carry, not the whole video."""
    frames = (
        df.filter(F.col("meta.kind") == "video")
        .select(
            "media_id",
            "payload",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.coalesce(F.col("meta.n_frames"), F.lit(1)) - 1,
                    F.lit(every_n),
                )
            ).alias("frame_idx"),
        )
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [
                decode_frame_stub(p, int(i))
                for p, i in zip(pdf["payload"], pdf["frame_idx"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "frame_idx": pdf["frame_idx"].astype("int32"),
                    "frame_sha": [d[0] for d in decoded],
                    "mean_intensity": [d[1] for d in decoded],
                }
            )

    return frames.mapInPandas(batches, FRAME_FEATURES_SCHEMA)


def resize_plan(df: DataFrame, max_side: int = 224) -> DataFrame:
    """Resize bookkeeping (pure JVM): compute target dims preserving
    aspect ratio; the pixel work itself is the stubbed decode stage."""
    w, h = F.col("meta.width"), F.col("meta.height")
    scale = F.when(
        F.greatest(w, h) > max_side, F.greatest(w, h) / F.lit(max_side)
    ).otherwise(F.lit(1.0))
    return df.filter(F.col("meta.kind") == "image").select(
        "media_id",
        w.alias("width"),
        h.alias("height"),
        F.ceil(w / scale).cast("int").alias("target_width"),
        F.ceil(h / scale).cast("int").alias("target_height"),
    )


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic in-repo media fixture (no external files needed)."""
    rows = []
    for i in range(n):
        payload = hashlib.sha256(f"media-{i}".encode()).digest() * (4 + i % 7)
        kind = ["image", "audio", "video"][i % 3]
        meta = {
            "kind": kind,
            "format": {"image": "png", "audio": "wav", "video": "mp4"}[kind],
            "width": 640 + (i % 5) * 160 if kind != "audio" else None,
            "height": 360 + (i % 5) * 90 if kind != "audio" else None,
            "n_frames": 30 * (1 + i % 4) if kind == "video" else None,
            "sample_rate": 16000 if kind == "audio" else None,
        }
        rows.append((i, bytearray(payload), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


#: output schema of the deterministic resize pass.
RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("target_width", T.IntegerType(), True),
        T.StructField("target_height", T.IntegerType(), True),
        T.StructField("resized_mean", T.DoubleType(), True),
        T.StructField("resized_sha", T.StringType(), True),
    ]
)


def resize_image_stub(
    payload: bytes, w: int, h: int, tw: int, th: int
) -> tuple[float, str]:
    """Deterministic resize MATH on fake pixels: expand the payload
    hash into a w×h grayscale image, area-average down to tw×th, and
    return (mean, sha256 of the resized bytes).

    The arithmetic (box-filter area averaging over integer bucket
    boundaries) is exactly what a real grayscale downscale does; only
    the pixel SOURCE is fake (hash-expanded instead of codec-decoded).
    numpy end-to-end — the per-batch work a real resize stage would
    put through each Arrow batch, so batch-size planning against this
    stub transfers to the real codec path.
    """
    if payload is None or not w or not h:
        return None, None
    import numpy as np

    # hash-expand payload → deterministic w*h bytes
    n = w * h
    reps = -(-n // 32)
    seed = hashlib.sha256(payload).digest()
    buf = bytearray()
    block = seed
    for _ in range(reps):
        block = hashlib.sha256(block).digest()
        buf.extend(block)
    px = np.frombuffer(bytes(buf[:n]), dtype=np.uint8).reshape(h, w)
    # integer-boundary box filter: pixel (y, x) of the target averages
    # source rows [y*h//th, (y+1)*h//th) × cols [x*w//tw, (x+1)*w//tw)
    ys = [(y * h) // th for y in range(th + 1)]
    xs = [(x * w) // tw for x in range(tw + 1)]
    out = np.empty((th, tw), dtype=np.float64)
    for y in range(th):
        for x in range(tw):
            # every bucket must span ≥1 source pixel: upscales (tw > w
            # or th > h) make interior buckets empty, not just the
            # boundary-zero case — clamp both ends, not `or`-fix zero
            out[y, x] = px[ys[y] : max(ys[y + 1], ys[y] + 1),
                           xs[x] : max(xs[x + 1], xs[x] + 1)].mean()
    q = np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)
    return float(q.mean()), hashlib.sha256(q.tobytes()).hexdigest()


def resize_images(df: DataFrame, max_side: int = 64) -> DataFrame:
    """Image resize stage end-to-end: JVM-side target-dimension math
    (``resize_plan``'s aspect-preserving rule) feeding an Arrow-batched
    numpy box-filter resize per row. Deterministic: same payload →
    same resized checksum on every engine and run."""
    w, h = F.col("meta.width"), F.col("meta.height")
    scale = F.when(
        F.greatest(w, h) > max_side, F.greatest(w, h) / F.lit(max_side)
    ).otherwise(F.lit(1.0))
    planned = df.filter(F.col("meta.kind") == "image").select(
        "media_id",
        "payload",
        w.alias("width"),
        h.alias("height"),
        F.ceil(w / scale).cast("int").alias("target_width"),
        F.ceil(h / scale).cast("int").alias("target_height"),
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            res = [
                resize_image_stub(p, int(w_), int(h_), int(tw), int(th))
                for p, w_, h_, tw, th in zip(
                    pdf["payload"], pdf["width"], pdf["height"],
                    pdf["target_width"], pdf["target_height"],
                )
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": pdf["width"].astype("int32"),
                    "height": pdf["height"].astype("int32"),
                    "target_width": pdf["target_width"].astype("int32"),
                    "target_height": pdf["target_height"].astype("int32"),
                    "resized_mean": [r[0] for r in res],
                    "resized_sha": [r[1] for r in res],
                }
            )

    return planned.mapInPandas(batches, RESIZE_SCHEMA)


# ---------------------------------------------------------------------------
# Perceptual hashing: near-dup detection for media payloads.
# ---------------------------------------------------------------------------
def ahash_stub(payload: bytes, grid: int = 8) -> int | None:
    """Average-hash (aHash) over the stubbed "pixel" view of a payload:
    resample the bytes into ``grid²`` cells (mean of each byte slice),
    set bit i iff cell i ≥ the overall cell mean, pack LSB-first.

    This is the REAL aHash algorithm applied to fake pixels: unlike a
    cryptographic digest, it has byte-space LOCALITY — flipping a few
    payload bytes moves a few cells a little, so near-identical
    payloads land at small Hamming distance while sha256 scatters them.
    That locality is what the near-dup join below exploits, and what a
    codec-enabled deployment gets for free by swapping the cell source
    for real luminance pixels (``decode_image_real``).
    """
    if payload is None:
        return None
    n = grid * grid
    if len(payload) == 0:
        return 0
    cells = []
    for i in range(n):
        lo = i * len(payload) // n
        hi = max((i + 1) * len(payload) // n, lo + 1)
        chunk = payload[lo:hi] if lo < len(payload) else payload[-1:]
        cells.append(sum(chunk) / len(chunk))
    mean = sum(cells) / n
    bits = 0
    for i, c in enumerate(cells):
        if c >= mean:
            bits |= 1 << i
    # two's-complement into signed int64 (Spark LongType)
    if bits >= 1 << 63:
        bits -= 1 << 64
    return bits


def perceptual_hash_media(df: DataFrame, grid: int = 8) -> DataFrame:
    """(media_id, ahash) via Arrow-batched ``mapInPandas`` — the same
    bounded-batch posture as the feature extractor."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "ahash": pdf["payload"].map(
                        lambda b: ahash_stub(b, grid)
                    ),
                }
            )

    return df.mapInPandas(batches, "media_id BIGINT, ahash BIGINT")


def near_dup_media(
    hashes: DataFrame, max_hamming: int = 6, n_bands: int = 4
) -> DataFrame:
    """Near-dup media pairs from 64-bit perceptual hashes: band the
    hash into ``n_bands`` disjoint 16-bit keys, equi-join on any
    matching band (pigeonhole: any pair within Hamming distance
    ``n_bands − 1`` SHARES an untouched band — guaranteed recall ≤ 3
    for 4 bands; larger radii are probabilistic), then verify the
    exact Hamming distance with a popcount of the XOR — all JVM-side
    bit arithmetic, the same band-then-verify plan as
    ``simhash_band_pairs``. Output: (id_a < id_b, hamming ≤ bound).
    """
    width = 64 // n_bands
    mask = (1 << width) - 1
    bands = hashes.select(
        "media_id",
        "ahash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band"),
                        F.shiftright("ahash", j * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("bkey"),
                    )
                    for j in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select("media_id", "ahash", "bk.band", "bk.bkey")
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .select(
            F.col("a.media_id").alias("id_a"),
            F.col("b.media_id").alias("id_b"),
            F.col("a.ahash").alias("ha"),
            F.col("b.ahash").alias("hb"),
        )
        .distinct()
    )
    hamming = F.bit_count(
        F.col("ha").bitwiseXOR(F.col("hb"))
    ).cast("int")
    return (
        cand.select("id_a", "id_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )
