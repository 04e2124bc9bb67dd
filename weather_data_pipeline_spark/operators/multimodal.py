"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schema, partitioning, Arrow
batch shapes, mapInPandas signatures; the actual media decoding is stubbed
(this container ships no image/audio libraries): `decode_real` raises
NotImplementedError unless PIL is importable, and `extract_features` uses a
deterministic md5-seeded fake embedding so the full distributed path
(binary → per-batch pandas → feature vector column) executes end-to-end.

Design for 100 TB: payloads stay opaque bytes in parquet (never exploded or
stringified), metadata is a struct column so pruning works (a query that only
needs `meta.width` never reads payload bytes thanks to parquet column
pruning), and decode runs via `mapInPandas` so each Arrow batch of payloads
is processed vectorized inside one Python worker call.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

try:  # real decoder availability is environment-dependent
    import PIL.Image  # type: ignore # noqa: F401

    HAS_PIL = True
except ImportError:
    HAS_PIL = False

FEATURE_DIM = 16

MEDIA_SCHEMA = (
    "doc_id long, payload binary, "
    "meta struct<kind: string, width: int, height: int, sample_rate: int, n_frames: int>"
)


def synth_media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic media-shaped table derived from `documents`: the text
    bytes stand in for an encoded payload; metadata varies by doc_id. (The
    driver ships no binary table — this makes the plumbing testable on its
    data without synthesizing our own inputs elsewhere.)"""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kind = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            kind.alias("kind"),
            (F.lit(64) + (F.col("doc_id") % 8) * 16).cast("int").alias("width"),
            (F.lit(64) + (F.col("doc_id") % 5) * 16).cast("int").alias("height"),
            F.lit(16000).cast("int").alias("sample_rate"),
            (F.lit(1) + (F.col("doc_id") % 30)).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def decode_real(payload: bytes, kind: str):
    """The real decode path — requires media libraries not present in this
    container. Kept as an explicit, clearly-marked stub."""
    if kind == "image" and HAS_PIL:
        import io

        return PIL.Image.open(io.BytesIO(payload))
    raise NotImplementedError(
        f"real {kind} decoding requires media libraries not installed here; "
        "use extract_features (deterministic fake) for plumbing tests"
    )


def _fake_embedding(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in for a decoded-media feature vector: md5-seeded
    floats in [0,1). Stable across runs/machines, so tests can assert."""
    h = hashlib.md5(payload).digest()
    seeds = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=np.uint32)
    return (seeds % 10_000).astype(np.float64) / 10_000.0


def extract_features(df: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """payload → fixed-dim feature vector via mapInPandas (Arrow batches).
    Output keeps doc_id + meta for downstream joins; payload is dropped so
    the result is narrow."""
    out_schema = (
        "doc_id long, kind string, byte_len long, "
        f"features array<double>"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": pdf["meta"].map(lambda m: m["kind"]),
                    "byte_len": payloads.map(len).astype("int64"),
                    "features": payloads.map(
                        lambda b: _fake_embedding(bytes(b), dim).tolist()
                    ),
                }
            )

    # a NULL payload (missing/corrupt blob) has no bytes to featurize; drop
    # it JVM-side before the Arrow transfer — at 100 TB one bad object must
    # not kill the extraction job (registry-wide degenerate-input contract)
    return df.where(F.col("payload").isNotNull()).mapInPandas(
        batches, schema=out_schema
    )


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: passes metadata through with the new dimensions; the
    pixel transform itself is the stubbed decode step. Shows the pattern —
    filter to the modality, mapInPandas over payload, rewrite meta."""
    out_schema = MEDIA_SCHEMA

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            meta = pdf["meta"].map(
                lambda m: {**m, "width": width, "height": height}
            )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": pdf["payload"], "meta": meta}
            )

    return df.where(F.col("meta.kind") == "image").mapInPandas(
        batches, schema=out_schema
    )


def sample_frames(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame sampling plumbing for video rows: emits one row per sampled
    frame index (explode is JVM-side; no Python needed for the fan-out).

    Zero-frame guard (r8): `sequence(0, n_frames-1, every_n)` THROWS for
    n_frames = 0 (positive step with start > stop) — a truncated/corrupt
    video row at ingest scale must yield no sampled frames, not fail the
    whole job. Null n_frames rows likewise drop (sequence of NULL → NULL,
    and explode of NULL emits nothing)."""
    frames = F.when(
        F.col("meta.n_frames") >= 1,
        F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_n)),
    )
    return (
        df.where(F.col("meta.kind") == "video")
        .select("doc_id", "meta", F.explode(frames).alias("frame_idx"))
    )
