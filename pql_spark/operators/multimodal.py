"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed in Arrow batches via mapInPandas.

The codec libraries (Pillow, librosa, ffmpeg) are NOT in this container,
so the decode kernels are stubbed: ``decoder="fake"`` produces
deterministic hash-derived features (testable end-to-end); ``decoder=
"real"`` raises NotImplementedError at the exact point a codec call
would go.  Everything Spark-side — schema, batch iteration, partition
sizing, UDF signatures — is real and tested.

Scale notes: media blobs are large; the iterator-of-batches mapInPandas
form never materializes a whole partition, so executor memory is bounded
by ``spark.sql.execution.arrow.maxRecordsPerBatch`` × blob size.  Set
``maxRecordsPerBatch`` low (e.g. 64) for >1 MB blobs, and size input
splits with ``spark.sql.files.maxPartitionBytes`` so a partition's blobs
fit the executor heap.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def synthesize_media(
    spark, n: int = 256, kind: str = "image", payload_bytes: int = 1024
) -> DataFrame:
    """Deterministic fake media table (seeded payloads) for exercising
    the plumbing without codec libraries."""
    def gen(ids: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in ids:
            rows = []
            for media_id in pdf["id"]:
                seed = hashlib.sha256(f"media-{media_id}".encode()).digest()
                payload = (seed * (payload_bytes // len(seed) + 1))[:payload_bytes]
                rows.append(
                    {
                        "media_id": int(media_id),
                        "kind": kind,
                        "payload": payload,
                        "meta": {
                            "width": 64 + int(media_id) % 64,
                            "height": 64,
                            "duration_ms": 0,
                            "codec": "fake",
                        },
                    }
                )
            yield pd.DataFrame(rows)

    # ≥16 rows per partition: each partition is one Arrow batch through
    # the Python worker, so over-splitting tiny tables just multiplies
    # per-task/worker overhead
    parts = max(1, min(n // 16, spark.sparkContext.defaultParallelism))
    return spark.range(0, n, 1, parts).mapInPandas(gen, MEDIA_SCHEMA)


def _fake_feature(payload: bytes, dim: int) -> list[float]:
    """Deterministic pseudo-feature from the payload hash (stands in for
    a real encoder's embedding)."""
    out: list[float] = []
    counter = 0
    while len(out) < dim:
        h = hashlib.sha256(payload + counter.to_bytes(4, "big")).digest()
        out.extend(b / 255.0 for b in h)
        counter += 1
    return out[:dim]


def extract_features(
    df: DataFrame, dim: int = 16, decoder: str = "fake"
) -> DataFrame:
    """Decode + feature-extract media payloads in Arrow batches.

    ``decoder="real"`` marks where Pillow/librosa/ffmpeg calls belong —
    unavailable in this container, so it raises.
    """
    if decoder not in ("fake", "real"):
        raise ValueError(f"unknown decoder {decoder!r}")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "real":
                raise NotImplementedError(
                    "codec libraries (Pillow/librosa/ffmpeg) are not "
                    "available in this environment; use decoder='fake'"
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "feature": pdf["payload"].map(
                        lambda p: _fake_feature(bytes(p), dim)
                    ),
                }
            )

    return df.mapInPandas(kernel, FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Per-video frame-sampling plan: one row per (media_id, frame_ts_ms)
    computed from metadata only — pure Catalyst (sequence+explode), no
    decode.  The decode of each planned frame would go through
    :func:`extract_features`-style kernels."""
    return (
        df.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )
