"""Multimodal-column operators (north-star extension; plumbing in
biggie_spark/multimodal.py — decode kernels are stubbed, the Spark-side
schema/batch/partitioning path is real and fully oracle-checked)."""

from __future__ import annotations

import pandas as pd

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


@register(
    "mm_codec_ppm",
    oracle="""
    WITH probe AS (SELECT doc_id FROM documents WHERE doc_id < 64),
    dims AS (
      SELECT doc_id,
             4 + doc_id % 4 AS w, 3 AS h,
             doc_id % 100 AS rb, (doc_id * 7) % 100 AS gb, (doc_id * 13) % 100 AS bb
      FROM probe)
    SELECT doc_id,
           CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           CAST(w * h AS BIGINT) AS n_px,
           CAST(w*h*rb + h*(w*(w-1)//2) + w*(h*(h-1)//2) AS BIGINT) AS sum_r,
           CAST(w*h*gb + h*(w*(w-1)//2) + w*(h*(h-1)//2) AS BIGINT) AS sum_g,
           CAST(w*h*bb + h*(w*(w-1)//2) + w*(h*(h-1)//2) AS BIGINT) AS sum_b
    FROM dims
    """,
)
def mm_codec_ppm(spark, sf_dir):
    """REAL image codec round-trip, no external imaging library: synthetic
    P6 PPM rasters (gradient pixels, per-doc dimensions and base color) are
    encoded to raw bytes and decoded back — actual netpbm header parsing
    (token grammar incl. '#' comments) and numpy stride math, not a fake
    hash kernel (biggie_spark/multimodal.py encode_ppm/decode_ppm).  The
    oracle predicts the decoded pixel sums in closed form, so any header,
    offset, or stride bug in the decoder breaks the value hash.

    Scale shape: both kernels are Arrow-batched pandas_udfs (1:1 row maps,
    so pandas_udf not mapInPandas); payload bytes live in one binary
    column, stats in typed columns — at 100 TB the decode fans out with
    partition parallelism and metadata-only readers never touch bytes."""
    from pyspark.sql.functions import pandas_udf

    from biggie_spark.multimodal import PPM_STATS_SCHEMA, decode_ppm, encode_ppm

    @pandas_udf("binary")
    def encode_udf(doc_id: pd.Series) -> pd.Series:
        return pd.Series(
            [
                encode_ppm(
                    4 + int(d) % 4,
                    3,
                    (int(d) % 100, (int(d) * 7) % 100, (int(d) * 13) % 100),
                )
                for d in doc_id
            ]
        )

    @pandas_udf(f"struct<{PPM_STATS_SCHEMA}>")
    def decode_udf(payload: pd.Series) -> pd.DataFrame:
        rows = [decode_ppm(bytes(b)) for b in payload]
        return pd.DataFrame(
            rows, columns=["width", "height", "n_px", "sum_r", "sum_g", "sum_b"]
        )

    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 64)
        .select("doc_id")
    )
    decoded = d.withColumn("payload", encode_udf("doc_id")).withColumn(
        "st", decode_udf("payload")
    )
    return decoded.select(
        "doc_id",
        F.col("st.width").alias("width"),
        F.col("st.height").alias("height"),
        F.col("st.n_px").alias("n_px"),
        F.col("st.sum_r").alias("sum_r"),
        F.col("st.sum_g").alias("sum_g"),
        F.col("st.sum_b").alias("sum_b"),
    )


@register(
    "mm_codec_wav",
    oracle="""
    WITH probe AS (SELECT doc_id FROM documents WHERE doc_id < 64),
    dims AS (
      SELECT doc_id,
             100 + doc_id % 50 AS n, doc_id % 50 AS base
      FROM probe)
    SELECT doc_id,
           8000 AS sample_rate, 1 AS channels,
           CAST(n AS BIGINT) AS n_samples,
           CAST(n*base + (n//7)*21 + (n%7)*((n%7)-1)//2 AS BIGINT) AS sum_amp,
           CAST(base + CASE WHEN n >= 7 THEN 6 ELSE n-1 END AS INT) AS peak
    FROM dims
    """,
)
def mm_codec_wav(spark, sf_dir):
    """REAL audio codec round-trip, numpy-only: deterministic int16 PCM
    waveforms (sample i = base + i mod 7, per-doc length) are packed into
    canonical RIFF/WAVE containers and decoded back via actual chunk-list
    walking (even-byte padding, fmt/data discovery, PCM validation —
    biggie_spark/multimodal.py encode_wav/decode_wav).  The oracle
    predicts sample count, amplitude sum, and peak in closed form, so any
    container-offset or sample-width bug breaks the value hash.  Same
    Arrow-batched 1:1 pandas_udf shape as mm_codec_ppm."""
    from pyspark.sql.functions import pandas_udf

    from biggie_spark.multimodal import WAV_STATS_SCHEMA, decode_wav, encode_wav

    @pandas_udf("binary")
    def encode_udf(doc_id: pd.Series) -> pd.Series:
        out = []
        for d in doc_id:
            n, base = 100 + int(d) % 50, int(d) % 50
            out.append(encode_wav([base + (i % 7) for i in range(n)]))
        return pd.Series(out)

    @pandas_udf(f"struct<{WAV_STATS_SCHEMA}>")
    def decode_udf(payload: pd.Series) -> pd.DataFrame:
        rows = [decode_wav(bytes(b)) for b in payload]
        return pd.DataFrame(
            rows,
            columns=["sample_rate", "channels", "n_samples", "sum_amp", "peak"],
        )

    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 64)
        .select("doc_id")
    )
    decoded = d.withColumn("payload", encode_udf("doc_id")).withColumn(
        "st", decode_udf("payload")
    )
    return decoded.select(
        "doc_id",
        F.col("st.sample_rate").alias("sample_rate"),
        F.col("st.channels").alias("channels"),
        F.col("st.n_samples").alias("n_samples"),
        F.col("st.sum_amp").alias("sum_amp"),
        F.col("st.peak").alias("peak"),
    )


@register(
    "mm_decode_dispatch",
    oracle="""
    WITH dims AS (
      SELECT doc_id, 3 + doc_id % 5 AS w, 2 + doc_id % 3 AS h,
             doc_id % 90 AS rb, (doc_id * 3) % 90 AS gb, (doc_id * 11) % 90 AS bb
      FROM documents WHERE doc_id < 48)
    SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           CAST(w*h AS BIGINT) AS n_px,
           CAST(w*h*rb + h*(w*(w-1)//2) + w*(h*(h-1)//2) AS BIGINT) AS sum_r,
           CAST(w*h*gb + h*(w*(w-1)//2) + w*(h*(h-1)//2) AS BIGINT) AS sum_g,
           CAST(w*h*bb + h*(w*(w-1)//2) + w*(h*(h-1)//2) AS BIGINT) AS sum_b
    FROM dims
    """,
)
def mm_decode_dispatch(spark, sf_dir):
    """The format-dispatching image kernel (`decode_image_batch`,
    biggie_spark/multimodal.py) in the Spark path: payloads enter as an
    opaque binary column, the kernel sniffs the magic bytes per payload and
    decodes through the right codec (PPM natively; JPEG/PNG via pillow when
    the cluster image ships it).  Same closed-form gradient oracle as
    mm_codec_ppm but through the DISPATCH surface — so a regression in the
    sniffing/dispatch layer (not just the codec) breaks the hash.  1:1 row
    map -> Arrow-batched pandas_udf."""
    from pyspark.sql.functions import pandas_udf

    from biggie_spark.multimodal import (
        PPM_STATS_SCHEMA,
        decode_image_batch,
        encode_ppm,
    )

    @pandas_udf("binary")
    def encode_udf(doc_id: pd.Series) -> pd.Series:
        return pd.Series(
            [
                encode_ppm(
                    3 + int(d) % 5,
                    2 + int(d) % 3,
                    (int(d) % 90, (int(d) * 3) % 90, (int(d) * 11) % 90),
                )
                for d in doc_id
            ]
        )

    @pandas_udf(f"struct<{PPM_STATS_SCHEMA}>")
    def decode_udf(payload: pd.Series) -> pd.DataFrame:
        return decode_image_batch(payload)

    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 48)
        .select("doc_id")
    )
    decoded = d.withColumn("st", decode_udf(encode_udf("doc_id")))
    return decoded.select(
        "doc_id", "st.width", "st.height", "st.n_px", "st.sum_r", "st.sum_g",
        "st.sum_b",
    )


def _ppm_dims(header: bytes) -> tuple[int, int]:
    """Width/height from a P6 header blob (same token grammar as
    decode_ppm: whitespace-separated tokens, '#' comments to EOL)."""
    pos, toks = 2, []
    while len(toks) < 2:
        while header[pos : pos + 1].isspace():
            pos += 1
        if header[pos : pos + 1] == b"#":
            while header[pos : pos + 1] not in (b"\n", b""):
                pos += 1
            continue
        start = pos
        while pos < len(header) and not header[pos : pos + 1].isspace():
            pos += 1
        toks.append(int(header[start:pos]))
    return toks[0], toks[1]


@register(
    "mm_video_keyframes",
    oracle="""
    WITH docs AS (
      SELECT doc_id, 2 + doc_id % 3 AS n_frames, 3 + doc_id % 4 AS w, 3 AS h
      FROM documents WHERE doc_id < 40),
    frames AS (
      SELECT doc_id, w, h, unnest(range(n_frames)) AS f
      FROM docs),
    kept AS (SELECT * FROM frames WHERE f % 2 = 0)
    SELECT doc_id, CAST(f AS INT) AS frame_idx,
           CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           CAST(3 * (w*h*((doc_id + 17*f) % 60)
                     + h*(w*(w-1)//2) + w*(h*(h-1)//2)) AS BIGINT) AS sum_rgb
    FROM kept
    """,
)
def mm_video_keyframes(spark, sf_dir):
    """Keyframe extraction from a PACKED multi-frame binary container —
    the video-pipeline pattern: one opaque payload holds N concatenated
    P6 PPM frames, the kernel walks the byte stream parsing frame
    boundaries from the headers (real incremental container parsing, no
    frame index), keeps every 2nd frame, and emits per-keyframe pixel
    stats.  Encode and decode both run inside one mapInPandas pass
    (fan-out: 1 row in, ceil(n_frames/2) rows out); frame f of doc d uses
    base (d + 17f) % 60 on all three channels, so the oracle states each
    keyframe's stats in closed form — a mis-parsed frame boundary shifts
    every subsequent frame and breaks the hash.  At 100 TB: payloads stay
    in one binary column; the walk is sequential per row, parallelism =
    partitions."""
    from biggie_spark.multimodal import decode_ppm, encode_ppm

    def work(batches):
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "width": [], "height": [],
                   "sum_rgb": []}
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n_frames, w, h = 2 + d % 3, 3 + d % 4, 3
                payload = b"".join(
                    encode_ppm(w, h, ((d + 17 * f) % 60,) * 3)
                    for f in range(n_frames)
                )
                # walk the container: parse each frame's header, compute
                # its exact byte length (header + w*h*3 samples), advance —
                # content-independent framing, no magic-byte scanning
                # (pixel bytes may legally contain 'P6')
                pos, f = 0, 0
                while pos < len(payload):
                    hdr_end = payload.index(b"\n255\n", pos) + 5
                    chunk_head = payload[pos:hdr_end]
                    fw, fh = _ppm_dims(chunk_head)
                    frame_len = (hdr_end - pos) + fw * fh * 3
                    chunk = payload[pos : pos + frame_len]
                    fw, fh, _, sr, sg, sb = decode_ppm(chunk)
                    if f % 2 == 0:
                        out["doc_id"].append(d)
                        out["frame_idx"].append(f)
                        out["width"].append(fw)
                        out["height"].append(fh)
                        out["sum_rgb"].append(sr + sg + sb)
                    pos, f = pos + frame_len, f + 1
            yield pd.DataFrame(out)

    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 40)
        .select("doc_id")
    )
    return d.mapInPandas(
        work, "doc_id bigint, frame_idx int, width int, height int, sum_rgb bigint"
    )


@register(
    "mm_image_resize",
    oracle="""
    WITH probe AS (SELECT doc_id FROM documents WHERE doc_id < 64),
    dims AS (
      SELECT doc_id,
             (4 + 2 * (doc_id % 3)) // 2 AS w2, 2 AS h2,
             doc_id % 100 AS rb, (doc_id * 7) % 100 AS gb, (doc_id * 13) % 100 AS bb
      FROM probe)
    SELECT doc_id,
           CAST(w2 AS INT) AS new_w, CAST(h2 AS INT) AS new_h,
           CAST(w2*h2*(rb+1) + h2*w2*(w2-1) + w2*h2*(h2-1) AS BIGINT) AS sum_r,
           CAST(w2*h2*(gb+1) + h2*w2*(w2-1) + w2*h2*(h2-1) AS BIGINT) AS sum_g,
           CAST(w2*h2*(bb+1) + h2*w2*(w2-1) + w2*h2*(h2-1) AS BIGINT) AS sum_b
    FROM dims
    """,
)
def mm_image_resize(spark, sf_dir):
    """REAL image resize kernel — 2x2 average pooling over decoded P6 PPM
    rasters, re-encoded and re-decoded so the header/stride path is
    exercised in BOTH directions (encode -> resize -> decode, three real
    codec passes; biggie_spark/multimodal.py resize_ppm_half).  On the
    synthetic gradient image (pixel = base + x + y) the pooled pixel is
    exactly base + 2X + 2Y + 1, so the oracle states the resized channel
    sums in closed form — an off-by-one in the pooling window, crop, or
    re-encode header breaks the hash.

    Scale shape: Arrow-batched pandas_udfs, 1:1 row maps; the resize fans
    out with partition parallelism and shuffles nothing."""
    from pyspark.sql.functions import pandas_udf

    from biggie_spark.multimodal import (
        PPM_STATS_SCHEMA,
        decode_ppm,
        encode_ppm,
        resize_ppm_half,
    )

    @pandas_udf("binary")
    def encode_udf(doc_id: pd.Series) -> pd.Series:
        return pd.Series(
            [
                encode_ppm(
                    4 + 2 * (int(d) % 3),
                    4,
                    (int(d) % 100, (int(d) * 7) % 100, (int(d) * 13) % 100),
                )
                for d in doc_id
            ]
        )

    @pandas_udf("binary")
    def resize_udf(payload: pd.Series) -> pd.Series:
        return pd.Series([resize_ppm_half(bytes(b)) for b in payload])

    @pandas_udf(f"struct<{PPM_STATS_SCHEMA}>")
    def decode_udf(payload: pd.Series) -> pd.DataFrame:
        rows = [decode_ppm(bytes(b)) for b in payload]
        return pd.DataFrame(
            rows, columns=["width", "height", "n_px", "sum_r", "sum_g", "sum_b"]
        )

    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 64)
        .select("doc_id")
    )
    out = (
        d.withColumn("payload", encode_udf("doc_id"))
        .withColumn("small", resize_udf("payload"))
        .withColumn("st", decode_udf("small"))
    )
    return out.select(
        "doc_id",
        F.col("st.width").alias("new_w"),
        F.col("st.height").alias("new_h"),
        F.col("st.sum_r").alias("sum_r"),
        F.col("st.sum_g").alias("sum_g"),
        F.col("st.sum_b").alias("sum_b"),
    )


@register(
    "mm_audio_clip_detect",
    oracle="""
    WITH probe AS (SELECT doc_id, 120 + doc_id % 60 AS n
                   FROM documents WHERE doc_id < 64),
    s AS (SELECT doc_id, n,
                 ((unnest(range(n)) * 2654435761) % 65536) - 32768 AS samp
          FROM probe)
    SELECT doc_id, CAST(n AS BIGINT) AS n_samples,
           CAST(sum(CASE WHEN abs(samp) >= 30000 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_clipped,
           CAST(max(abs(samp)) AS BIGINT) AS peak
    FROM s GROUP BY doc_id, n
    """,
)
def mm_audio_clip_detect(spark, sf_dir):
    """REAL audio analysis kernel — clipping detection over decoded PCM:
    synthesize a deterministic Knuth-hash sample stream per doc, encode it
    as a RIFF/WAVE container, decode the container back (real chunk walk,
    biggie_spark/multimodal.py wav_samples) and count samples at or above
    the clip threshold (|s| >= 30000).  The oracle regenerates the identical
    stream arithmetically, so a byte-order, chunk-offset, or dtype bug in
    either codec direction breaks the hash."""
    import numpy as np

    from pyspark.sql.functions import pandas_udf

    from biggie_spark.multimodal import encode_wav, wav_samples

    @pandas_udf("binary")
    def encode_udf(doc_id: pd.Series) -> pd.Series:
        out = []
        for d in doc_id:
            n = 120 + int(d) % 60
            s = ((np.arange(n, dtype=np.int64) * 2654435761) % 65536) - 32768
            out.append(encode_wav(s.astype("<i2")))
        return pd.Series(out)

    @pandas_udf("struct<n_samples bigint, n_clipped bigint, peak bigint>")
    def clip_udf(payload: pd.Series) -> pd.DataFrame:
        rows = []
        for b in payload:
            s = wav_samples(bytes(b))
            a = np.abs(s)
            rows.append((len(s), int((a >= 30000).sum()), int(a.max(initial=0))))
        return pd.DataFrame(rows, columns=["n_samples", "n_clipped", "peak"])

    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 64)
        .select("doc_id")
    )
    out = d.withColumn("payload", encode_udf("doc_id")).withColumn(
        "st", clip_udf("payload")
    )
    return out.select(
        "doc_id",
        F.col("st.n_samples").alias("n_samples"),
        F.col("st.n_clipped").alias("n_clipped"),
        F.col("st.peak").alias("peak"),
    )


@register(
    "mm_image_histogram",
    oracle="""
    WITH probe AS (SELECT doc_id, 16 + doc_id % 8 AS w, 8 AS h,
                          (doc_id * 5) % 200 AS base
                   FROM documents WHERE doc_id < 64),
    px AS (
      SELECT doc_id, w, h, (base + x.v + y.v) // 64 AS bin
      FROM probe, range(24) x(v), range(8) y(v)
      WHERE x.v < w AND y.v < h)
    SELECT doc_id,
           CAST(sum(CASE WHEN bin = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b0,
           CAST(sum(CASE WHEN bin = 1 THEN 1 ELSE 0 END) AS BIGINT) AS b1,
           CAST(sum(CASE WHEN bin = 2 THEN 1 ELSE 0 END) AS BIGINT) AS b2,
           CAST(sum(CASE WHEN bin = 3 THEN 1 ELSE 0 END) AS BIGINT) AS b3
    FROM px GROUP BY doc_id
    """,
)
def mm_image_histogram(spark, sf_dir):
    """Decode → analyze: 4-bin intensity histogram (64-wide bins over the
    red channel) of real P6 PPM rasters — the feature-extraction step that
    follows decode in any vision-data pipeline (brightness filtering,
    exposure bucketing, near-black frame drops).

    Images are synthesized with wider gradients than the codec op
    (w = 16 + doc_id % 8, h = 8, base = 5·doc_id mod 200, so intensities
    span all four bins), encoded to actual PPM bytes, decoded back through
    the full netpbm header grammar (`decode_ppm_array`), and histogrammed
    with one `np.bincount` per image inside an Arrow-batched pandas_udf.
    The oracle re-derives every pixel from the generating grid — any
    stride/offset bug in decode shifts a bin count and breaks the hash.
    Scale shape identical to mm_codec_ppm: 1:1 row map, payload isolated
    in one binary column."""
    import numpy as np

    from pyspark.sql.functions import pandas_udf

    from biggie_spark.multimodal import decode_ppm_array, encode_ppm

    @pandas_udf("binary")
    def encode_udf(doc_id: pd.Series) -> pd.Series:
        out = []
        for d in doc_id:
            b = (int(d) * 5) % 200
            out.append(encode_ppm(16 + int(d) % 8, 8, (b, b, b)))
        return pd.Series(out)

    @pandas_udf("struct<b0 bigint, b1 bigint, b2 bigint, b3 bigint>")
    def hist_udf(payload: pd.Series) -> pd.DataFrame:
        rows = []
        for b in payload:
            px = decode_ppm_array(bytes(b))
            counts = np.bincount(px[:, :, 0].ravel() // 64, minlength=4)
            rows.append(tuple(int(c) for c in counts[:4]))
        return pd.DataFrame(rows, columns=["b0", "b1", "b2", "b3"])

    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 64)
        .select("doc_id")
    )
    out = d.withColumn("payload", encode_udf("doc_id")).withColumn(
        "st", hist_udf("payload")
    )
    return out.select(
        "doc_id",
        F.col("st.b0").alias("b0"),
        F.col("st.b1").alias("b1"),
        F.col("st.b2").alias("b2"),
        F.col("st.b3").alias("b3"),
    )


@register(
    "mm_audio_spectrum",
    oracle="""
    WITH probe AS (SELECT doc_id FROM documents WHERE doc_id < 64),
    terms AS (
      SELECT p.doc_id, t.t, k.k,
             CAST(((p.doc_id * 31 + t.t) * 2654435761) % 65536 - 32768
                  AS DOUBLE) AS x,
             2 * pi() * k.k * t.t / 64 AS th
      FROM probe p, range(64) t(t), (VALUES (1), (3)) k(k)),
    r AS (
      SELECT doc_id, k,
             CAST(sum(CAST(sign(x * cos(th)) *
                  floor(abs(x * cos(th)) * 1000 + 0.5) AS BIGINT)) AS BIGINT)
                 AS c_e3,
             CAST(sum(CAST(sign(x * sin(th)) *
                  floor(abs(x * sin(th)) * 1000 + 0.5) AS BIGINT)) AS BIGINT)
                 AS s_e3
      FROM terms GROUP BY doc_id, k)
    SELECT doc_id,
           max(CASE WHEN k = 1 THEN c_e3 END) AS c1_e3,
           max(CASE WHEN k = 1 THEN s_e3 END) AS s1_e3,
           max(CASE WHEN k = 3 THEN c_e3 END) AS c3_e3,
           max(CASE WHEN k = 3 THEN s_e3 END) AS s3_e3
    FROM r GROUP BY doc_id
    """,
)
def mm_audio_spectrum(spark, sf_dir):
    """REAL spectral analysis on the audio path: synthesize deterministic
    int16 PCM, encode to actual RIFF/WAVE bytes, decode back through the
    container parser, and compute DFT coefficients (k = 1, 3) from the
    decoded samples — the feature-extraction step under voice-activity
    detection, music fingerprinting, and band-energy filters.

    Determinism across engines is engineered, not hoped for: each DFT
    term x_t·cos(θ)/x_t·sin(θ) is rounded to integer milli-units with an
    explicit half-away rule (sign·floor(|v|·1000 + 0.5) — numpy's
    half-even and SQL's round() disagree, floor does not) BEFORE the sum,
    so the accumulation is exact integer arithmetic in any order on any
    partitioning.  The oracle reconstructs the same signal arithmetically
    — a container-offset or byte-order bug in the WAV path shifts every
    coefficient.  Kernel shape: Arrow-batched pandas_udf, 1:1 rows,
    payload bytes in one binary column."""
    import math

    import numpy as np

    from pyspark.sql.functions import pandas_udf

    from biggie_spark.multimodal import demo_pcm, encode_wav, wav_samples

    @pandas_udf("binary")
    def encode_udf(doc_id: pd.Series) -> pd.Series:
        return pd.Series([encode_wav(demo_pcm(d).astype("<i2")) for d in doc_id])

    @pandas_udf("struct<c1_e3 bigint, s1_e3 bigint, c3_e3 bigint, s3_e3 bigint>")
    def dft_udf(payload: pd.Series) -> pd.DataFrame:
        def half_away(v: float) -> int:
            return int(math.copysign(math.floor(abs(v) * 1000 + 0.5), v))

        rows = []
        for b in payload:
            x = wav_samples(bytes(b)).astype(np.float64)
            vals = []
            for k in (1, 3):
                c = s = 0
                for t in range(64):
                    th = 2 * math.pi * k * t / 64
                    c += half_away(x[t] * math.cos(th))
                    s += half_away(x[t] * math.sin(th))
                vals += [c, s]
            rows.append(tuple(vals))
        return pd.DataFrame(rows, columns=["c1_e3", "s1_e3", "c3_e3", "s3_e3"])

    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 64)
        .select("doc_id")
    )
    out = d.withColumn("payload", encode_udf("doc_id")).withColumn(
        "st", dft_udf("payload")
    )
    return out.select(
        "doc_id",
        F.col("st.c1_e3").alias("c1_e3"),
        F.col("st.s1_e3").alias("s1_e3"),
        F.col("st.c3_e3").alias("c3_e3"),
        F.col("st.s3_e3").alias("s3_e3"),
    )


@register(
    "mm_image_conv_sobel",
    oracle="""
    WITH probe AS (SELECT doc_id, 16 + doc_id % 8 AS w, 8 AS h,
                          (doc_id * 5) % 100 AS base
                   FROM documents WHERE doc_id < 64),
    px AS (
      SELECT doc_id, w, h, x.v AS x, y.v AS y,
             base + 3 * x.v + 7 * y.v + (x.v * y.v) % 11 AS p
      FROM probe, range(24) x(v), range(8) y(v)
      WHERE x.v < w AND y.v < h),
    gx AS (
      SELECT c.doc_id, c.x, c.y,
             (r1.p + 2 * r2.p + r3.p) - (l1.p + 2 * l2.p + l3.p) AS gxv,
             (d1.p + 2 * d2.p + d3.p) - (u1.p + 2 * u2.p + u3.p) AS gyv
      FROM px c
      JOIN px l1 ON l1.doc_id = c.doc_id AND l1.x = c.x - 1 AND l1.y = c.y - 1
      JOIN px l2 ON l2.doc_id = c.doc_id AND l2.x = c.x - 1 AND l2.y = c.y
      JOIN px l3 ON l3.doc_id = c.doc_id AND l3.x = c.x - 1 AND l3.y = c.y + 1
      JOIN px r1 ON r1.doc_id = c.doc_id AND r1.x = c.x + 1 AND r1.y = c.y - 1
      JOIN px r2 ON r2.doc_id = c.doc_id AND r2.x = c.x + 1 AND r2.y = c.y
      JOIN px r3 ON r3.doc_id = c.doc_id AND r3.x = c.x + 1 AND r3.y = c.y + 1
      JOIN px u1 ON u1.doc_id = c.doc_id AND u1.x = c.x - 1 AND u1.y = c.y - 1
      JOIN px u2 ON u2.doc_id = c.doc_id AND u2.x = c.x AND u2.y = c.y - 1
      JOIN px u3 ON u3.doc_id = c.doc_id AND u3.x = c.x + 1 AND u3.y = c.y - 1
      JOIN px d1 ON d1.doc_id = c.doc_id AND d1.x = c.x - 1 AND d1.y = c.y + 1
      JOIN px d2 ON d2.doc_id = c.doc_id AND d2.x = c.x AND d2.y = c.y + 1
      JOIN px d3 ON d3.doc_id = c.doc_id AND d3.x = c.x + 1 AND d3.y = c.y + 1)
    SELECT doc_id,
           CAST(sum(abs(gxv)) AS BIGINT) AS edge_gx,
           CAST(sum(abs(gyv)) AS BIGINT) AS edge_gy,
           CAST(count(*) AS BIGINT) AS n_interior
    FROM gx GROUP BY doc_id
    """,
)
def mm_image_conv_sobel(spark, sf_dir):
    """REAL 3x3 convolution on the image path: Sobel edge energy over
    decoded PPM rasters — the kernel under blur detection, edge-density
    quality filters, and saliency crops.

    Images carry a non-separable pattern (p = base + 3x + 7y + xy mod 11,
    all < 256) so the gradients are position-dependent; the numpy kernel
    computes Gx/Gy with explicit slice arithmetic over interior pixels
    (no scipy dependency), all in int64 — convolution of integer pixels
    with a +/-1/+/-2 kernel is exact, so the per-image edge sums are
    integers and the oracle reconstructs them from the generating grid
    with 12 self-joins (one per stencil tap).  Any decode stride bug
    shifts a neighborhood and breaks every sum.  Same Arrow-batched
    pandas_udf shape as the other codecs."""
    import numpy as np

    from pyspark.sql.functions import pandas_udf

    from biggie_spark.multimodal import decode_ppm_array, encode_ppm

    @pandas_udf("binary")
    def encode_udf(doc_id: pd.Series) -> pd.Series:
        out = []
        for d in doc_id:
            w, h, base = 16 + int(d) % 8, 8, (int(d) * 5) % 100
            y, x = np.mgrid[0:h, 0:w]
            p = (base + 3 * x + 7 * y + (x * y) % 11).astype(np.uint8)
            # encode_ppm writes base+x+y; build bytes directly for the
            # custom pattern via the same header path
            header = f"P6\n{w} {h}\n255\n".encode()
            px = np.repeat(p[:, :, None], 3, axis=2)
            out.append(header + px.tobytes())
        return pd.Series(out)

    @pandas_udf("struct<edge_gx bigint, edge_gy bigint, n_interior bigint>")
    def sobel_udf(payload: pd.Series) -> pd.DataFrame:
        rows = []
        for b in payload:
            a = decode_ppm_array(bytes(b))[:, :, 0].astype(np.int64)
            gx = (
                (a[:-2, 2:] + 2 * a[1:-1, 2:] + a[2:, 2:])
                - (a[:-2, :-2] + 2 * a[1:-1, :-2] + a[2:, :-2])
            )
            gy = (
                (a[2:, :-2] + 2 * a[2:, 1:-1] + a[2:, 2:])
                - (a[:-2, :-2] + 2 * a[:-2, 1:-1] + a[:-2, 2:])
            )
            rows.append(
                (int(np.abs(gx).sum()), int(np.abs(gy).sum()), gx.size)
            )
        return pd.DataFrame(rows, columns=["edge_gx", "edge_gy", "n_interior"])

    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 64)
        .select("doc_id")
    )
    out = d.withColumn("payload", encode_udf("doc_id")).withColumn(
        "st", sobel_udf("payload")
    )
    return out.select(
        "doc_id",
        F.col("st.edge_gx").alias("edge_gx"),
        F.col("st.edge_gy").alias("edge_gy"),
        F.col("st.n_interior").alias("n_interior"),
    )


@register(
    "mm_image_phash_dedup",
    oracle="""
    WITH px AS (
      SELECT g.v AS g, y.v AS y, x.v AS x,
             (7 + (g.v + 1) * (x.v + 1) * (y.v + 1)) % 101 AS p
      FROM range(32) g(v), range(8) y(v), range(8) x(v)),
    s AS (SELECT g, sum(p) AS psum FROM px GROUP BY g),
    bits AS (
      SELECT px.g,
             string_agg(CASE WHEN px.p > s.psum // 64 THEN '1' ELSE '0' END,
                        '' ORDER BY px.y, px.x) AS ahash
      FROM px JOIN s ON s.g = px.g GROUP BY px.g),
    docs AS (SELECT doc_id, doc_id % 32 AS g FROM documents WHERE doc_id < 256)
    SELECT b.ahash,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(d.doc_id) AS BIGINT) AS canonical_id,
           CAST(count(DISTINCT d.g) AS BIGINT) AS n_groups
    FROM docs d JOIN bits b ON b.g = d.g
    GROUP BY b.ahash
    """,
)
def mm_image_phash_dedup(spark, sf_dir):
    """Perceptual-hash image dedup over DECODED rasters: every probe doc
    carries an 8x8 P6 PPM whose pixel pattern depends only on doc_id mod
    32, so exact byte-level dup groups exist by construction; the op
    computes each image's 64-bit average-hash (bit = pixel > integer mean)
    from the decoded pixels and groups by the hash -- the standard
    near-dup pipeline for image corpora (aHash/pHash bucket -> verify),
    here with the bucketing stage made fully oracle-checkable.

    The mean threshold is integer (`pixel_sum div 64`), so the bit pattern
    is exact arithmetic end-to-end; the oracle re-derives every pixel,
    threshold, and bit from the generating formula -- a stride, header, or
    channel bug in the real PPM decode (`decode_ppm_array`) flips bits and
    breaks the hash.  Scale shape: encode/decode are Arrow-batched 1:1
    pandas_udfs over the isolated binary column; the dedup is one hash
    aggregate on the 64-char hash string -- the shuffle key -- exactly the
    exact-dedup shape (`llm_dedup_exact`) with a perceptual key, and at
    100 TB Hamming-near matching adds band-of-bits equi-joins (the
    `llm_neardup_cosine` table trick), never a cross product."""
    import numpy as np

    from pyspark.sql.functions import pandas_udf

    from biggie_spark.multimodal import decode_ppm_array

    @pandas_udf("binary")
    def encode_udf(doc_id: pd.Series) -> pd.Series:
        out = []
        for d in doc_id:
            g = int(d) % 32
            y = np.arange(8, dtype=np.int64)[:, None]
            x = np.arange(8, dtype=np.int64)[None, :]
            val = (7 + (g + 1) * (x + 1) * (y + 1)) % 101
            px = np.repeat(val[:, :, None], 3, axis=2).astype(np.uint8)
            header = b"P6\n# phash probe\n8 8\n255\n"
            out.append(header + px.tobytes())
        return pd.Series(out)

    @pandas_udf("string")
    def ahash_udf(payload: pd.Series) -> pd.Series:
        out = []
        for b in payload:
            r = decode_ppm_array(bytes(b))[:, :, 0].astype(np.int64)
            thr = int(r.sum()) // 64
            out.append("".join("1" if v > thr else "0" for v in r.ravel()))
        return pd.Series(out)

    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 256)
        .select("doc_id", (F.col("doc_id") % 32).alias("g"))
    )
    hashed = d.withColumn("payload", encode_udf("doc_id")).withColumn(
        "ahash", ahash_udf("payload")
    )
    return hashed.groupBy("ahash").agg(
        F.count("*").alias("n_docs"),
        F.min("doc_id").alias("canonical_id"),
        F.countDistinct("g").alias("n_groups"),
    )


@register(
    "mm_audio_vad",
    oracle="""
    WITH probe AS (SELECT doc_id, 100 + doc_id % 50 AS n, doc_id % 30 AS amp
                   FROM documents WHERE doc_id < 64),
    sm AS (
      /* the generating waveform: 25-sample talk/silence bursts with a
         small dither, s(i) = ((i div 25) mod 2)*(50+amp) + (i mod 3) */
      SELECT doc_id, i.v AS i,
             ((i.v // 25) % 2) * (50 + amp) + (i.v % 3) AS s
      FROM probe, range(150) i(v) WHERE i.v < n),
    act AS (
      SELECT doc_id, i, CASE WHEN s >= 10 THEN 1 ELSE 0 END AS a FROM sm),
    isl AS (
      SELECT doc_id, i, a,
             i - row_number() OVER (PARTITION BY doc_id, a ORDER BY i) AS grp
      FROM act),
    segs AS (
      SELECT doc_id, count(*) AS seg_len
      FROM isl WHERE a = 1 GROUP BY doc_id, grp)
    SELECT doc_id,
           CAST(coalesce(count(seg_len), 0) AS BIGINT) AS n_segments,
           CAST(coalesce(max(seg_len), 0) AS BIGINT) AS longest,
           CAST(coalesce(sum(seg_len), 0) AS BIGINT) AS n_active
    FROM (SELECT doc_id FROM probe) p
    LEFT JOIN segs USING (doc_id)
    GROUP BY doc_id
    """,
)
def mm_audio_vad(spark, sf_dir):
    """Voice-activity detection over DECODED audio: synthetic burst
    waveforms (25-sample talk/silence alternation plus dither) round-trip
    through the real RIFF/WAVE codec, then an energy gate (|s| >= 10)
    segments each clip into activity runs -- count, longest, and total
    active samples per clip.  This is the trim/segment primitive an
    audio-training pipeline runs before feature extraction (drop silence,
    split long takes).

    The run-length step happens INSIDE the Arrow batch with numpy (diff
    over the boolean gate -- each clip is one row's payload, so
    per-clip segmentation is embarrassingly row-parallel and never
    shuffles); the oracle recomputes the identical segmentation
    relationally (gaps-and-islands over the generating formula), so a
    codec offset bug OR a run-boundary bug breaks the hash.  Plan shape:
    two Arrow-batched 1:1 pandas_udfs on the isolated binary column, no
    exchange."""
    import numpy as np

    from pyspark.sql.functions import pandas_udf

    from biggie_spark.multimodal import encode_wav, wav_samples

    @pandas_udf("binary")
    def encode_udf(doc_id: pd.Series) -> pd.Series:
        out = []
        for d in doc_id:
            n, amp = 100 + int(d) % 50, int(d) % 30
            i = np.arange(n, dtype=np.int64)
            s = ((i // 25) % 2) * (50 + amp) + (i % 3)
            out.append(encode_wav(s))
        return pd.Series(out)

    @pandas_udf("struct<n_segments bigint, longest bigint, n_active bigint>")
    def vad_udf(payload: pd.Series) -> pd.DataFrame:
        rows = []
        for b in payload:
            s = np.abs(wav_samples(bytes(b)))
            a = (s >= 10).astype(np.int8)
            edges = np.diff(np.concatenate(([0], a, [0])))
            starts, ends = np.where(edges == 1)[0], np.where(edges == -1)[0]
            lens = ends - starts
            rows.append(
                (
                    int(len(lens)),
                    int(lens.max(initial=0)),
                    int(lens.sum()),
                )
            )
        return pd.DataFrame(rows, columns=["n_segments", "longest", "n_active"])

    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 64)
        .select("doc_id")
    )
    out = d.withColumn("payload", encode_udf("doc_id")).withColumn(
        "st", vad_udf("payload")
    )
    return out.select(
        "doc_id",
        F.col("st.n_segments").alias("n_segments"),
        F.col("st.longest").alias("longest"),
        F.col("st.n_active").alias("n_active"),
    )


@register(
    "mm_image_patches",
    oracle="""
    WITH probe AS (SELECT doc_id, doc_id % 50 AS base
                   FROM documents WHERE doc_id < 48),
    px AS (
      /* 8x8 raster, gradient base + x + y (the encode_ppm kernel) */
      SELECT doc_id, y.v AS y, x.v AS x, base + x.v + y.v AS p
      FROM probe, range(8) y(v), range(8) x(v)),
    patches AS (
      SELECT doc_id, y // 4 AS py, x // 4 AS px_,
             sum(p) AS psum, count(*) AS n
      FROM px GROUP BY doc_id, py, px_)
    SELECT doc_id, CAST(py AS INTEGER) AS py, CAST(px_ AS INTEGER) AS px,
           CAST(psum AS BIGINT) AS patch_sum,
           CAST(psum // n AS BIGINT) AS patch_mean_floor
    FROM patches
    """,
)
def mm_image_patches(spark, sf_dir):
    """ViT-style patchify over decoded rasters: each 8x8 image splits
    into a 2x2 grid of 4x4 patches, and every patch reduces to exact
    integer statistics -- the patch-embedding front end of a vision
    transformer (images become patch sequences BEFORE any learned
    projection; the projection itself is llm_embed_project's shape).

    The patch split happens on the DECODED numpy array inside the Arrow
    batch (reshape to (2, 4, 2, 4) + axis sums -- real stride math, so a
    row-major/column-major bug flips patch assignment and breaks the
    oracle, which re-derives every pixel from the generating gradient).
    Patch means use integer floor division.  Plan: the standard mm shape
    -- encode/decode as 1:1 Arrow UDFs, a 4-rows-per-image explode, no
    shuffle until the (already tiny) output."""
    import numpy as np

    from pyspark.sql.functions import pandas_udf

    from biggie_spark.multimodal import decode_ppm_array, encode_ppm

    @pandas_udf("binary")
    def encode_udf(doc_id: pd.Series) -> pd.Series:
        return pd.Series(
            [encode_ppm(8, 8, (int(d) % 50, int(d) % 50, int(d) % 50)) for d in doc_id]
        )

    @pandas_udf("array<struct<py int, px int, patch_sum bigint>>")
    def patch_udf(payload: pd.Series) -> pd.Series:
        out = []
        for b in payload:
            r = decode_ppm_array(bytes(b))[:, :, 0].astype(np.int64)
            # (8, 8) -> (2, 4, 2, 4): axis 0/2 index the patch grid
            sums = r.reshape(2, 4, 2, 4).sum(axis=(1, 3))
            out.append(
                [
                    {"py": int(py), "px": int(px), "patch_sum": int(sums[py, px])}
                    for py in range(2)
                    for px in range(2)
                ]
            )
        return pd.Series(out)

    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 48)
        .select("doc_id")
    )
    patched = (
        d.withColumn("payload", encode_udf("doc_id"))
        .withColumn("patch", F.explode(patch_udf("payload")))
        .select(
            "doc_id",
            F.col("patch.py").alias("py"),
            F.col("patch.px").alias("px"),
            F.col("patch.patch_sum").alias("patch_sum"),
        )
    )
    return patched.withColumn(
        "patch_mean_floor", F.expr("patch_sum div 16")
    )
