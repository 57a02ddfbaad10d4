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


@register(
    "mm_frame_sample",
    oracle="""
    SELECT doc_id, CAST(k AS INTEGER) AS frame_idx,
           md5(text || ':' || CAST(k AS VARCHAR)) AS frame_hash
    FROM (SELECT doc_id, text,
                 unnest(range(0, 1 + n_chars // 64)) AS k
          FROM documents)
    WHERE k % 4 = 0
    """,
)
def mm_frame_sample(spark, sf_dir):
    """Variable-fan-out frame sampling via mapInPandas: one document emits
    ``1 + n_chars // 64`` frames and every 4th is kept — the data-dependent
    explode shape of a real video frame sampler, with a deterministic
    hash kernel standing in for the codec."""
    from biggie_spark.multimodal import sample_frames

    return sample_frames(load_table(spark, sf_dir, "documents"))


@register(
    "mm_feature_extract",
    oracle="""
    SELECT doc_id,
           array_to_string(
             list_transform(range(1, 9),
                            i -> ascii(substr(md5(text), CAST(i AS INTEGER), 1))),
             '|') AS feat
    FROM documents
    """,
)
def mm_feature_extract(spark, sf_dir):
    """Arrow-vectorized feature extraction over the opaque payload bytes:
    a pandas_udf consumes the binary column in columnar batches and emits
    a fixed-dim vector per row (here a deterministic digest-derived fake;
    a real image/audio embedding kernel drops into the same signature).
    1:1 row mapping, so this is a pandas_udf, not mapInPandas — Spark can
    keep it inside the surrounding projection."""
    import hashlib

    from pyspark.sql.functions import pandas_udf

    def _feat_kernel(payload):
        return payload.map(
            lambda b: [ord(c) for c in hashlib.md5(b).hexdigest()[:8]]
        )

    # function form, no type hints: `from __future__ import annotations`
    # stringifies hints, which pandas_udf cannot resolve for inference
    feat = pandas_udf(_feat_kernel, "array<int>")

    from biggie_spark.multimodal import attach_binary_meta

    d = attach_binary_meta(load_table(spark, sf_dir, "documents"))
    return d.select(
        "doc_id", F.concat_ws("|", feat(F.col("payload"))).alias("feat")
    )


@register(
    "mm_resize_plan",
    oracle="""
    SELECT doc_id,
           64 + n_chars % 32 AS w, 32 + n_chars % 64 AS h,
           (64 + n_chars % 32) * 32
             // greatest(64 + n_chars % 32, 32 + n_chars % 64) AS new_w,
           (32 + n_chars % 64) * 32
             // greatest(64 + n_chars % 32, 32 + n_chars % 64) AS new_h
    FROM documents
    """,
)
def mm_resize_plan(spark, sf_dir):
    """Resize planning on typed metadata only: compute aspect-preserving
    target dimensions (max side 32) in exact integer math without ever
    touching payload bytes — at 100 TB the payload column is never read
    (column pruning), which is the point of the (binary, metadata) split."""
    d = load_table(spark, sf_dir, "documents")
    w = F.lit(64) + F.col("n_chars") % 32
    h = F.lit(32) + F.col("n_chars") % 64
    g = F.greatest(w, h)
    return d.select(
        "doc_id",
        w.alias("w"),
        h.alias("h"),
        F.expr(
            "(64 + n_chars % 32) * 32 div greatest(64 + n_chars % 32, 32 + n_chars % 64)"
        ).alias("new_w"),
        F.expr(
            "(32 + n_chars % 64) * 32 div greatest(64 + n_chars % 32, 32 + n_chars % 64)"
        ).alias("new_h"),
    )
