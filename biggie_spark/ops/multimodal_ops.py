"""Multimodal-column operators (north-star extension; plumbing in
biggie_spark/multimodal.py — decode kernels are stubbed, the Spark-side
schema/batch/partitioning path is real and fully oracle-checked)."""

from __future__ import annotations

from pyspark.sql import functions as F

from biggie_spark.io import load_table
from biggie_spark.multimodal import attach_binary_meta, fake_decode_frames
from biggie_spark.registry import register


@register(
    "mm_binary_meta",
    oracle="""
    SELECT doc_id,
           'text/utf-8' AS kind,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS content_md5
    FROM documents
    """,
)
def mm_binary_meta(spark, sf_dir):
    """Opaque binary payload + typed metadata struct; metadata-only reads
    never touch the payload bytes (column pruning)."""
    d = attach_binary_meta(load_table(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        F.col("meta.kind").alias("kind"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.content_md5").alias("content_md5"),
    )


@register(
    "mm_decode_frames",
    oracle="""
    SELECT doc_id, k AS frame_idx,
           md5(text || ':' || CAST(k AS VARCHAR)) AS frame_hash,
           64 + n_chars % 32 AS width, 48 AS height
    FROM documents, range(2) t(k)
    """,
)
def mm_decode_frames(spark, sf_dir):
    """mapInPandas frame 'decode' (deterministic fake kernel): Arrow batches
    in, long-format frame rows out — the exact shape a real image/video
    decoder plugs into."""
    return fake_decode_frames(load_table(spark, sf_dir, "documents"))
