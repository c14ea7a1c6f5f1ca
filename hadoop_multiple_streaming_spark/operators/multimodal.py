"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by Arrow-batched pandas iterators
(``mapInPandas``) — the one place Python-side compute is the right
tool (codec libraries aren't SQL).

The DECODE step is stubbed: this container ships no image/audio codecs
(PIL/cv2/ffmpeg), so ``decode_content`` raises NotImplementedError and
tests/pipelines inject ``fake_decode_meta`` (deterministic, md5-seeded)
instead. Everything AROUND the decode — schema, batch iteration,
partitioning, UDF signatures, metadata propagation — is real and
tested; swapping in a real decoder is a one-argument change.

Scale notes (100 TB of media):
  * binary payloads ride Parquet binary columns; keep them OUT of
    shuffles — extract features first (small rows), join later.
  * mapInPandas streams Arrow batches; bound executor memory with
    spark.sql.execution.arrow.maxRecordsPerBatch when payloads are
    large (e.g. 64 rows/batch for multi-MB images).
  * frame sampling computes byte offsets from metadata only — no
    decode, no shuffle; the downstream decode then touches only the
    sampled frames.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

#: canonical multimodal record: opaque payload + typed metadata
MULTIMODAL_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("modality", StringType()),  # image | audio | video
        StructField("content", BinaryType()),
        StructField("meta", MapType(StringType(), StringType())),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("modality", StringType()),
        StructField("n_bytes", LongType()),
        StructField("content_sha", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
    ]
)


def decode_content(payload: bytes, modality: str) -> Any:
    """Real decoder hook — requires codec libraries not present in
    this environment. Inject a decoder into extract_features instead."""
    raise NotImplementedError(
        "no codec libraries in this environment; pass decoder=... "
        "(e.g. PIL.Image.open / soundfile.read / pyav) to extract_features"
    )


def fake_decode_meta(payload: bytes, modality: str) -> dict[str, int]:
    """Deterministic stand-in decoder: pseudo-dimensions derived from
    the payload's own leading bytes (synthesize_media payloads are
    already md5-derived, so this stays hash-distributed) — and, unlike
    a re-hash of the raw bytes, replicable in plain SQL from the
    payload's hex rendering, which makes the whole feature pipeline
    oracle-checkable cross-engine. Same batch shape and dtypes as a
    real decoder. Payloads shorter than 3 bytes fall back to hashing."""
    h = payload if payload is not None and len(payload) >= 3 else hashlib.md5(
        payload or b""
    ).digest()
    return {
        "width": 16 + h[0] % 64,
        "height": 16 + h[1] % 64,
        "channels": 1 + h[2] % 3,
    }


def extract_features(
    df: DataFrame,
    decoder: Callable[[bytes, str], dict[str, int]] | None = None,
) -> DataFrame:
    """Arrow-batched feature extraction over multimodal records:
    (id, modality, content, meta) -> FEATURE_SCHEMA rows. One decoder
    call per row, pandas batch in/out — the canonical mapInPandas
    shape for media pipelines."""
    decode = decoder if decoder is not None else decode_content

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            metas = [
                decode(bytes(c) if c is not None else b"", m)
                for c, m in zip(pdf["content"], pdf["modality"])
            ]
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "modality": pdf["modality"],
                    "n_bytes": [len(c) if c is not None else 0 for c in pdf["content"]],
                    # fingerprint over the LOWERCASE-HEX rendering of
                    # the payload, not the raw bytes: hex is bijective
                    # with the bytes (same dedup/collision power), and
                    # engines whose hash functions only take strings
                    # (DuckDB sha256(VARCHAR)) can replay it exactly
                    "content_sha": [
                        hashlib.sha256(
                            (bytes(c) if c is not None else b"").hex().encode()
                        ).hexdigest()
                        for c in pdf["content"]
                    ],
                    "width": [m["width"] for m in metas],
                    "height": [m["height"] for m in metas],
                    "channels": [m["channels"] for m in metas],
                }
            )

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def sample_frame_offsets(
    df: DataFrame,
    every_n_seconds: float = 1.0,
) -> DataFrame:
    """Video frame sampling WITHOUT decoding: compute deterministic
    frame indices/byte offsets from metadata alone (fps, duration_s,
    frame_bytes in the meta map). Pure Column expressions — the decode
    of the selected frames happens downstream on a tiny fraction of
    the bytes."""
    fps = F.col("meta").getItem("fps").cast("double")
    duration = F.col("meta").getItem("duration_s").cast("double")
    frame_bytes = F.col("meta").getItem("frame_bytes").cast("long")
    n_frames = F.floor(duration / every_n_seconds).cast("int")
    return (
        df.where(F.col("modality") == "video")
        .where(fps.isNotNull() & duration.isNotNull())
        .select(
            "id",
            F.explode(F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))).alias(
                "sample_idx"
            ),
            fps.alias("fps"),
            frame_bytes.alias("frame_bytes"),
        )
        .select(
            "id",
            "sample_idx",
            F.floor(F.col("sample_idx") * every_n_seconds * F.col("fps"))
            .cast("long")
            .alias("frame_idx"),
            (
                F.floor(F.col("sample_idx") * every_n_seconds * F.col("fps"))
                * F.col("frame_bytes")
            ).cast("long").alias("byte_offset"),
        )
    )


def synthesize_media(spark, n: int = 64, modality: str = "image") -> DataFrame:
    """Deterministic synthetic multimodal records for tests/demos
    (payload = md5-stream bytes; meta carries fake codec fields)."""
    rows = []
    for i in range(n):
        payload = hashlib.md5(f"media-{i}".encode()).digest() * (4 + i % 7)
        meta = {"codec": "fake", "fps": "30", "duration_s": "4", "frame_bytes": "1024"}
        rows.append((i, modality if i % 3 else "video", bytearray(payload), meta))
    return spark.createDataFrame(rows, MULTIMODAL_SCHEMA)
