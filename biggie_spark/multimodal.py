"""Multimodal column support: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas functions.

The container has no image/audio codecs (no PIL/ffmpeg), so the actual
decode kernels are STUBS behind import-tries (`decode_image_batch` raises
NotImplementedError with installation guidance).  Everything Spark-side —
schemas, mapInPandas batch shapes, partitioning, deterministic fake decode
for testing — is real and oracle-tested (see ops/multimodal_ops.py).

At 100 TB: binary payloads ride in their own parquet column (column pruning
keeps metadata-only queries from touching bytes); decode fans out via
mapInPandas over row-group-aligned partitions; frame/feature outputs are
long-format rows so downstream aggregation stays JVM-side.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Typed metadata schema every multimodal payload column carries alongside
# the opaque bytes.
MM_META_SCHEMA = (
    "kind string, n_bytes bigint, content_md5 string, width int, height int"
)

FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_hash string, width int, height int"


def attach_binary_meta(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Wrap a payload column as (binary, typed metadata) — the multimodal
    column convention.  Pure JVM expressions, no Python."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.withColumn("payload", payload).withColumn(
        "meta",
        F.struct(
            F.lit("text/utf-8").alias("kind"),
            F.octet_length(F.col(text_col)).cast("bigint").alias("n_bytes"),
            F.md5(payload).alias("content_md5"),
        ),
    )


def fake_decode_frames(df: DataFrame, n_frames: int = 2) -> DataFrame:
    """Deterministic stand-in for a frame decoder, via mapInPandas — the
    REAL plumbing (Arrow batches in, long-format frame rows out) with a
    hash-derived fake kernel, so the whole path is oracle-checkable."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": [],
                "frame_idx": [],
                "frame_hash": [],
                "width": [],
                "height": [],
            }
            for doc_id, text, n_chars in zip(
                pdf["doc_id"], pdf["text"], pdf["n_chars"]
            ):
                for k in range(n_frames):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(k)
                    out["frame_hash"].append(
                        hashlib.md5(f"{text}:{k}".encode()).hexdigest()
                    )
                    out["width"].append(64 + int(n_chars) % 32)
                    out["height"].append(48)
            yield pd.DataFrame(out)

    return df.select("doc_id", "text", "n_chars").mapInPandas(decode, FRAME_SCHEMA)


SAMPLED_FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_hash string"


def sample_frames(df: DataFrame, stride: int = 4, chars_per_frame: int = 64) -> DataFrame:
    """Frame sampling with variable per-document fan-out: each document
    decodes to ``1 + n_chars // chars_per_frame`` frames and every
    ``stride``-th frame is kept.  Same mapInPandas plumbing a real video
    frame-sampler uses — the fan-out count rides on row data, so batch
    output size is data-dependent (the reason this is mapInPandas and not
    a 1:1 pandas_udf)."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_hash": []}
            for doc_id, text, n_chars in zip(
                pdf["doc_id"], pdf["text"], pdf["n_chars"]
            ):
                for k in range(0, 1 + int(n_chars) // chars_per_frame, stride):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(k)
                    out["frame_hash"].append(
                        hashlib.md5(f"{text}:{k}".encode()).hexdigest()
                    )
            yield pd.DataFrame(out)

    return df.select("doc_id", "text", "n_chars").mapInPandas(
        decode, SAMPLED_FRAME_SCHEMA
    )


def decode_image_batch(payload: pd.Series) -> pd.DataFrame:
    """Real image decode (resize / feature-extract) — requires an imaging
    library this container doesn't ship."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image decode requires pillow; install it on the cluster image "
            "and swap fake_decode_frames for the PIL kernel — the mapInPandas "
            "plumbing, schemas and partitioning above are codec-agnostic"
        ) from e
    raise NotImplementedError("wire the PIL kernel here")
