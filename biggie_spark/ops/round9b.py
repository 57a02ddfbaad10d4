"""Round-9 second wave: the feature-stash loop, the inference-time data
layer, and distillation/fusion analytics.

Tiers in this module:
* feature stash — the reference domain's actual usage pattern closed
  end-to-end (VERDICT r8 "Next round" item 3): chroma features computed
  through the real WAV codec path, PERSISTED as rank-1 tensor fields
  partitioned for pruning, then queried across a key range the way the
  reference's users query stored feature matrices ("mean chroma over
  tracks 16..47"); plus tensor-field norms, adjacent-key chroma
  similarity, tempo-by-autocorrelation, and integral-image rect probes
  on the real PPM path;
* inference/serving — the data ops an LLM *serving* stack runs over its
  corpus: speculative-decoding acceptance accounting, prefix-cache (KV
  reuse) statistics, radix-tree depth profiles, PagedAttention page
  accounting, prefill/decode FLOPs split, SLA tier routing, FIFO batch
  queueing — plus streaming-capable prefix-reuse and spec-decode twins;
* distillation/eval — teacher/student score joins, hard-example mining
  under a token budget (the round-9 grid idiom, guard included),
  transfer-gap cross-tabs, exact pairwise win rates on bounded
  histograms, reciprocal-rank fusion of two retrievers, RAG context
  packing under a budget, self-consistency majority voting, and
  Matryoshka-truncation recall;
* surface/storage — GROUPING_ID and ordered-LISTAGG SQL parity, exact
  grid percentiles (the full-oracle counterpart to the rows-only
  approx-quantile), and persisted LSM-style stash compaction.

Registered after ops/round9.py: `ordered_queries()` floats the 19
released round-9 ops ahead of these (registry.py tier -1), so this wave
fills the window's remaining slots without displacing them.  All outputs
follow the repo's integer-exact conventions (BIGINT, floor division,
e2/e4/e6 scaling, nullif guards); every op carries a full DuckDB oracle.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pandas as pd  # module-level: pandas_udf type hints must resolve
# via func.__globals__ (see ops/round9.py note)

from pyspark.sql import Window
from pyspark.sql import functions as F

from biggie_spark.io import load_table
from biggie_spark.registry import ORACLES, register
from biggie_spark.util import tokens

# ---------------------------------------------------------------------------
# feature stash — closing the reference-domain loop
#
# The reference's dl4mir usage pattern is *store features per entity, then
# query across keys*: extract a chroma matrix per track into the stash,
# later answer "mean chroma over this key range" without touching audio.
# kv_chroma_stash_persisted is that loop end-to-end; the sibling ops read
# the same stashed-feature shapes.


def _chroma_tensors(spark, sf_dir):
    """(doc_id, tensor struct<shape:[12], data:array<long>>, kgrp) — each
    key's chroma as a rank-1 tensor field (SURVEY §1.2 layout, LONG data
    because the e2 energies are integer-exact and exceed float32
    precision), with the hex-fanout-style partition prefix kgrp =
    doc_id div 16 (4 groups over the 64-key probe)."""
    from biggie_spark.ops.round9 import chroma_frame

    ch = chroma_frame(spark, sf_dir)
    return (
        ch.groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("pc", "energy_e2"))
            ).alias("kv")
        )
        .select(
            "doc_id",
            F.struct(
                F.array(F.lit(12)).alias("shape"),
                F.transform("kv", lambda s: s.energy_e2).alias("data"),
            ).alias("tensor"),
            (F.col("doc_id") / 16).cast("long").alias("kgrp"),
        )
    )


@register(
    "kv_chroma_stash_persisted",
    oracle=f"""
    WITH ch AS ({ORACLES["mm_audio_chroma"]})
    SELECT pc,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(energy_e2) AS BIGINT) AS sum_energy_e2,
           CAST(sum(energy_e2) // count(*) AS BIGINT) AS mean_energy_e2
    FROM ch WHERE doc_id BETWEEN 16 AND 47
    GROUP BY pc
    """,
)
def kv_chroma_stash_persisted(spark, sf_dir):
    """The reference-domain loop closed end-to-end (VERDICT r8 item 3):
    compute chroma through the real WAV encode/decode kernel
    (``chroma_frame``, the identical code path mm_audio_chroma scores),
    PERSIST each key's 12-bin chroma as a rank-1 tensor field
    (``struct<shape, data>``, SURVEY §1.2) partitioned by the key-prefix
    group kgrp = doc_id div 16 — the Spark analog of the reference's
    hex-fanout stash sharding — then act as the *reader*: re-open the
    stash with an explicit schema and answer the domain's signature query
    ("mean chroma vector over tracks 16..47") from the STORED tensors,
    never re-touching audio.

    The key-range probe RAISES unless the executed scan shows the kgrp
    predicate inside PartitionFilters (the llm_training_manifest_persisted
    idiom): a key-range read touches 2 of 4 stash directories by
    construction, which is the property that makes feature re-query at
    100 TB an O(range) read, not a corpus scan.  Returned stats come from
    the re-read artifact, so a silent write failure fails the value
    check.  Mean is floor-division BIGINT on both engines."""
    tens = _chroma_tensors(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="biggie_chroma_stash_")
    try:
        tens.write.mode("overwrite").partitionBy("kgrp").parquet(root)
        stash = spark.read.schema(tens.schema).parquet(root)
        rng = stash.filter(F.col("kgrp").isin(1, 2))
        plan = rng._jdf.queryExecution().executedPlan().toString()
        pf = plan.split("PartitionFilters", 1)
        if len(pf) < 2 or "kgrp" not in pf[1].split("]")[0]:
            raise RuntimeError(
                "key-range stash read must prune on the kgrp directory "
                "partition (predicate missing from PartitionFilters)"
            )
        out = (
            rng.select(F.posexplode(F.col("tensor.data")))
            .select(
                F.col("pos").cast("long").alias("pc"),
                F.col("col").alias("e"),
            )
            .groupBy("pc")
            .agg(
                F.count("*").alias("n_keys"),
                F.sum("e").alias("sum_energy_e2"),
                F.expr("sum(e) div count(*)").alias("mean_energy_e2"),
            )
        )
        return out.localCheckpoint()
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register(
    "kv_chroma_pair_dot",
    oracle=f"""
    WITH ch AS ({ORACLES["mm_audio_chroma"]}),
    top AS (SELECT doc_id,
                   CAST(15 - max(energy_e2 * 16 + (15 - pc)) % 16 AS BIGINT)
                     AS top_pc
            FROM ch GROUP BY doc_id),
    d AS (SELECT a.doc_id,
                 CAST(sum((a.energy_e2 // 100000000)
                          * (b.energy_e2 // 100000000)) AS BIGINT) AS dot_s8
          FROM ch a JOIN ch b ON b.doc_id = a.doc_id + 1 AND b.pc = a.pc
          GROUP BY a.doc_id)
    SELECT d.doc_id, d.dot_s8, ta.top_pc AS top_pc_a, tb.top_pc AS top_pc_b,
           CAST(ta.top_pc = tb.top_pc AS BIGINT) AS same_top
    FROM d JOIN top ta ON ta.doc_id = d.doc_id
           JOIN top tb ON tb.doc_id = d.doc_id + 1
    """,
)
def kv_chroma_pair_dot(spark, sf_dir):
    """Adjacent-key chroma similarity — the "how alike are consecutive
    tracks" query a music-informatics user runs over STORED features:
    integer dot product of neighboring keys' 12-bin chroma vectors plus
    each side's dominant pitch class and a same-key-class flag (both
    branches live on this corpus: 23 same / 40 different).

    Arithmetic: energies are pre-scaled by div 1e8 before the product so
    the 12-term dot stays far inside int64 (raw e2 energies reach ~4e13;
    their raw products would overflow) — floor division on both engines,
    so the truncation is deterministic.  The dominant pitch class is the
    repo's BIGINT argmax encoding (max energy, min pc on ties; stride 16
    with energy*16 <= 6e14).  Shape: the pair join is a 1-off equi-join
    on the bounded 64-key probe frame; at stash scale it is the classic
    neighbor self-join, linear after the stash's key partitioning.  The
    chroma long frame is localCheckpoint'd once so the WAV/DFT kernel
    runs ONE pass over the probe, not one per join branch (review r9)."""
    from biggie_spark.ops.round9 import chroma_frame

    ch = chroma_frame(spark, sf_dir).localCheckpoint()
    top = ch.groupBy("doc_id").agg(
        (
            F.lit(15)
            - F.max(F.col("energy_e2") * 16 + (F.lit(15) - F.col("pc"))) % 16
        ).alias("top_pc")
    )
    a = ch.select(
        "doc_id", "pc", (F.col("energy_e2") / 100000000).cast("long").alias("sa")
    )
    b = ch.select(
        (F.col("doc_id") - 1).alias("doc_id"),
        "pc",
        (F.col("energy_e2") / 100000000).cast("long").alias("sb"),
    )
    d = (
        a.join(b, ["doc_id", "pc"])
        .groupBy("doc_id")
        .agg(F.sum(F.col("sa") * F.col("sb")).alias("dot_s8"))
    )
    tb = top.select((F.col("doc_id") - 1).alias("doc_id"), F.col("top_pc").alias("top_pc_b"))
    return (
        d.join(top, "doc_id")
        .join(tb, "doc_id")
        .select(
            "doc_id",
            "dot_s8",
            F.col("top_pc").alias("top_pc_a"),
            "top_pc_b",
            (F.col("top_pc") == F.col("top_pc_b")).cast("long").alias("same_top"),
        )
    )


@register(
    "kv_tensor_field_norms",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             3 AS n_rows, 4 + doc_id % 3 AS n_cols, doc_id % 50 AS base
      FROM documents WHERE doc_id < 100),
    g AS (SELECT doc_id, n_cols, base, i.v AS i, j.v AS j
          FROM t, range(3) i(v), range(8) j(v) WHERE j.v < n_cols)
    SELECT doc_id, CAST(i AS BIGINT) AS row_i,
           CAST(sum((base + 2*i + 3*j) * (base + 2*i + 3*j)) AS BIGINT)
             AS norm_sq
    FROM g GROUP BY doc_id, i
    """,
)
def kv_tensor_field_norms(spark, sf_dir):
    """Per-row squared L2 norms of a stored rank-2 tensor field — the
    per-frame feature-magnitude profile (e.g. per-frame spectrogram
    energy) computed WITHOUT leaving the JVM: an outer ``transform`` over
    the row index drives an inner ``aggregate`` fold over each row's
    flat-layout slice, then one posexplode emits the (key, row, norm)
    long format.  No UDF, no shuffle before the explode; the whole norm
    computation is a single codegen'd array kernel per key.

    Tensors are the kv_tensor_field synthetic (elem = base + 2i + 3j,
    integer-exact in float32), so the oracle states each row norm in
    closed form over the generating grid — a flat-index slip (i*cols vs
    i*cols+1) breaks the hash."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    rows = F.lit(3)
    cols = (F.lit(4) + F.col("doc_id") % 3).cast("int")
    base = (F.col("doc_id") % 50).cast("int")
    data = F.transform(
        F.sequence(F.lit(0), rows * cols - 1),
        lambda k: (base + 2 * (k / cols).cast("int") + 3 * (k % cols)).cast(
            "float"
        ),
    )
    t = d.select(
        "doc_id",
        F.struct(F.array(rows, cols).alias("shape"), data.alias("data")).alias(
            "tensor"
        ),
    )
    n_rows = F.element_at(F.col("tensor.shape"), 1)
    n_cols = F.element_at(F.col("tensor.shape"), 2)
    norms = F.transform(
        F.sequence(F.lit(0), n_rows - 1),
        lambda i: F.aggregate(
            F.slice(F.col("tensor.data"), i * n_cols + 1, n_cols),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x.cast("long") * x.cast("long"),
        ),
    )
    return t.select("doc_id", F.posexplode(norms)).select(
        "doc_id",
        F.col("pos").cast("long").alias("row_i"),
        F.col("col").alias("norm_sq"),
    )


# ---------------------------------------------------------------------------
# tempo by envelope autocorrelation — the rhythm feature beside onset flux

# Per-lag normalization (div by the 8-lag term count) removes the
# shorter-overlap bias that would otherwise make lag 1 win always;
# measured argmax distribution over the 64-key probe: 15/16/16/17 across
# lags 1..4 — every branch live.


@register(
    "mm_audio_tempo_autocorr",
    oracle="""
    WITH probe AS (SELECT doc_id FROM documents WHERE doc_id < 64),
    x AS (SELECT p.doc_id, t.t, (t.t // 16) AS f,
                 CAST(((p.doc_id * 31 + t.t) * 2654435761) % 65536 - 32768
                      AS BIGINT) AS v
          FROM probe p, range(128) t(t)),
    e AS (SELECT doc_id, f, sum(v * v) // 1000 AS e
          FROM x GROUP BY doc_id, f),
    r AS (SELECT a.doc_id, l.l,
                 CAST(sum(a.e * b.e) // (8 - l.l) AS BIGINT) AS r
          FROM e a JOIN e b ON b.doc_id = a.doc_id
          JOIN range(1, 5) l(l) ON b.f = a.f + l.l
          GROUP BY a.doc_id, l.l)
    SELECT doc_id,
           CAST(max(CASE WHEN l = 1 THEN r END) AS BIGINT) AS r1,
           CAST(max(CASE WHEN l = 2 THEN r END) AS BIGINT) AS r2,
           CAST(max(CASE WHEN l = 3 THEN r END) AS BIGINT) AS r3,
           CAST(max(CASE WHEN l = 4 THEN r END) AS BIGINT) AS r4,
           CAST(7 - max(r * 8 + (7 - l)) % 8 AS BIGINT) AS tempo_lag
    FROM r GROUP BY doc_id
    """,
)
def mm_audio_tempo_autocorr(spark, sf_dir):
    """Tempo estimation by envelope autocorrelation — the third classic
    music-informatics feature beside chroma and onset flux: a 128-sample
    PCM clip through the real WAV encode/decode path, 8 frame energies
    (16-sample frames, integer sum of squares scaled div 1000 so the lag
    products stay inside int64), then the normalized autocorrelation
    r_lag = (sum_f e_f * e_{f+lag}) div (8 - lag) for lags 1..4 and the
    argmax lag as the tempo class (max r, min lag on ties via the repo's
    BIGINT argmax stride — r*8 <= 2e16).  Normalizing by overlap length
    is what keeps the feature honest: the raw sums shrink with lag purely
    because fewer terms overlap, which would crown lag 1 on every key
    (measured: 64/64 before normalization; 15/16/16/17 after).

    Kernel shape: one Arrow-batched pandas_udf over the bounded 64-key
    probe — vectorized numpy envelope + lag products, one struct row per
    key, no shuffle."""
    import numpy as np

    from pyspark.sql.functions import pandas_udf

    from biggie_spark.multimodal import demo_pcm, encode_wav, wav_samples

    @pandas_udf("binary")
    def encode_udf(doc_id: pd.Series) -> pd.Series:
        return pd.Series(
            [encode_wav(demo_pcm(d, 128).astype("<i2")) for d in doc_id]
        )

    @pandas_udf("array<long>")
    def tempo_udf(payload: pd.Series) -> pd.Series:
        out = []
        for buf in payload:
            x = wav_samples(bytes(buf))
            e = (x.reshape(8, 16) ** 2).sum(axis=1) // 1000
            rs = [
                int((e[: 8 - lag] * e[lag:]).sum()) // (8 - lag)
                for lag in range(1, 5)
            ]
            key = max(rs[lag - 1] * 8 + (7 - lag) for lag in range(1, 5))
            out.append(rs + [7 - key % 8])
        return pd.Series(out)

    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 64)
        .select("doc_id")
    )
    return (
        d.withColumn("payload", encode_udf("doc_id"))
        .select("doc_id", tempo_udf("payload").alias("a"))
        .select(
            "doc_id",
            F.element_at("a", 1).alias("r1"),
            F.element_at("a", 2).alias("r2"),
            F.element_at("a", 3).alias("r3"),
            F.element_at("a", 4).alias("r4"),
            F.element_at("a", 5).alias("tempo_lag"),
        )
    )


# ---------------------------------------------------------------------------
# integral-image (summed-area table) rect probes on the real PPM path

# Fixed inner rect: cols 3..10 x rows 2..5 on every image (the smallest
# synthetic image is 16x8, so the rect is always interior).
_RECT_X0, _RECT_X1, _RECT_Y0, _RECT_Y1 = 3, 10, 2, 5


@register(
    "mm_image_integral_rect",
    oracle=f"""
    WITH probe AS (
      SELECT doc_id, 16 + doc_id % 8 AS w, 8 AS h,
             3 * (doc_id % 60) + 15 AS gb   /* gray base = sum_c base_c */
      FROM documents WHERE doc_id < 64)
    SELECT doc_id, r.rect,
           CASE r.rect
             WHEN 0 THEN CAST(
               ({_RECT_X1} - {_RECT_X0} + 1) * ({_RECT_Y1} - {_RECT_Y0} + 1)
                 * gb
               + 3 * ({_RECT_Y1} - {_RECT_Y0} + 1)
                   * (({_RECT_X0} + {_RECT_X1})
                      * ({_RECT_X1} - {_RECT_X0} + 1) // 2)
               + 3 * ({_RECT_X1} - {_RECT_X0} + 1)
                   * (({_RECT_Y0} + {_RECT_Y1})
                      * ({_RECT_Y1} - {_RECT_Y0} + 1) // 2) AS BIGINT)
             ELSE CAST(
               w * h * gb
               + 3 * h * ((w - 1) * w // 2)
               + 3 * w * ((h - 1) * h // 2) AS BIGINT)
           END AS rect_sum
    FROM probe, (VALUES (0), (1)) r(rect)
    """,
)
def mm_image_integral_rect(spark, sf_dir):
    """Integral-image (summed-area table) rectangle queries over DECODED
    images — the O(1)-per-rect primitive behind Viola-Jones-style feature
    extraction and tile statistics: synthesize a gradient P6 PPM per key
    (pixel_c = base_c + x + y, the encode_ppm kernel), decode through the
    real netpbm parser, build the SAT with two numpy cumsums over the
    gray (r+g+b) plane, and answer two rect sums from FOUR CORNER READS
    each — rect 0 the fixed interior window x3..10/y2..5, rect 1 the
    whole image (the SAT's hardest corner case: both inclusive bounds at
    the edges).

    The oracle states each rect sum in closed form over the gradient
    generator — any off-by-one in the SAT corner arithmetic (THE classic
    inclusive/exclusive bug) breaks the hash.  Kernel shape: Arrow-batched
    pandas_udf over the bounded 64-key probe, 1:2 fan-out via posexplode,
    no shuffle."""
    import numpy as np

    from pyspark.sql.functions import pandas_udf

    from biggie_spark.multimodal import decode_ppm_array, encode_ppm

    @pandas_udf("binary")
    def encode_udf(doc_id: pd.Series) -> pd.Series:
        out = []
        for d in doc_id:
            b = int(d) % 60
            out.append(
                encode_ppm(16 + int(d) % 8, 8, (b, b + 5, b + 10))
            )
        return pd.Series(out)

    x0, x1, y0, y1 = _RECT_X0, _RECT_X1, _RECT_Y0, _RECT_Y1

    @pandas_udf("array<long>")
    def rects_udf(payload: pd.Series) -> pd.Series:
        out = []
        for buf in payload:
            px = decode_ppm_array(bytes(buf)).astype(np.int64)
            gray = px.sum(axis=2)  # (h, w)
            sat = gray.cumsum(axis=0).cumsum(axis=1)

            def rect(a0, a1, b0, b1):
                s = sat[b1, a1]
                if a0 > 0:
                    s -= sat[b1, a0 - 1]
                if b0 > 0:
                    s -= sat[b0 - 1, a1]
                if a0 > 0 and b0 > 0:
                    s += sat[b0 - 1, a0 - 1]
                return int(s)

            h, w = gray.shape
            out.append(
                [rect(x0, x1, y0, y1), rect(0, w - 1, 0, h - 1)]
            )
        return pd.Series(out)

    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 64)
        .select("doc_id")
    )
    return (
        d.withColumn("payload", encode_udf("doc_id"))
        .select("doc_id", F.posexplode(rects_udf("payload")))
        .select(
            "doc_id",
            F.col("pos").cast("long").alias("rect"),
            F.col("col").alias("rect_sum"),
        )
    )


# ---------------------------------------------------------------------------
# inference/serving tier — the data ops an LLM serving stack runs
#
# These are corpus-side accounting ops: given the documents table as the
# request/trace log, compute the quantities a serving team actually reads
# (speculative-decoding acceptance, prefix-cache hit rates, radix-tree
# depth profiles, PagedAttention page/fragmentation counts, prefill vs
# decode FLOPs, tier routing, FIFO batch queueing).  All integer-exact.

# Draft vocabulary size for speculative decoding: the "small model" is
# modeled as predicting the K most frequent corpus tokens (coverage 55%
# measured at sf0.01), so per-position acceptance is deterministic and
# the accepted-prefix length per 4-token block spans 0..4 with every
# branch live (measured 3174/1721/912/471/696).
_SPEC_TOPK = 16
_SPEC_GAMMA = 4


@register(
    "llm_spec_decode_accept",
    oracle=f"""
    WITH t AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok,
                      generate_subscripts(string_split(lower(text), ' '), 1)
                        - 1 AS pos
               FROM documents),
    top AS (SELECT tok FROM (SELECT tok, count(*) AS c FROM t GROUP BY tok
                             ORDER BY c DESC, tok LIMIT {_SPEC_TOPK})),
    m AS (SELECT doc_id, pos // {_SPEC_GAMMA} AS blk,
                 pos % {_SPEC_GAMMA} AS pib,
                 (tok IN (SELECT tok FROM top)) AS ok
          FROM t),
    a AS (SELECT doc_id, blk, CAST(count(*) AS BIGINT) AS blk_len,
                 CAST(coalesce(min(CASE WHEN NOT ok THEN pib END),
                               count(*)) AS BIGINT) AS acc
          FROM m GROUP BY doc_id, blk)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_blocks,
           CAST(sum(blk_len) AS BIGINT) AS n_tokens,
           CAST(sum(acc) AS BIGINT) AS accepted,
           CAST(sum(CASE WHEN acc < blk_len THEN acc + 1 ELSE blk_len END)
             AS BIGINT) AS produced,
           CAST(sum(CASE WHEN acc < blk_len THEN acc + 1 ELSE blk_len END)
                * 10000 // count(*) AS BIGINT) AS tokens_per_step_e4
    FROM a GROUP BY doc_id
    """,
)
def llm_spec_decode_accept(spark, sf_dir):
    """Speculative-decoding acceptance accounting — the serving-side
    yield analysis: model the draft model as deterministically correct on
    the corpus's 16 most frequent tokens (_SPEC_TOPK), chop each
    document's token stream into gamma=4 (_SPEC_GAMMA) blocks, and
    compute per block the accepted prefix length (first draft miss
    truncates; the target's correction token is the +1), then per
    document the produced-tokens and tokens-per-target-step speedup —
    exactly the accounting that decides whether speculative decoding
    pays for a given traffic mix.

    The per-block frame is the SHARED ``_spec_accept_plan`` (the same
    body the streaming twin drains), so batch and streaming can never
    fork; this op adds only the per-doc rollup the single-aggregate
    streaming discipline excludes.  Shape at scale: the draft vocabulary
    is a bounded TakeOrdered broadcast against the exploded token
    stream; block reduction is a (doc, block)-keyed partial+final hash
    aggregate and the rollup reuses the doc key — no windows, no sorts
    beyond the K-row TakeOrdered.  Integer throughout; ties at
    vocabulary rank K break on (count desc, token asc) identically on
    both engines."""
    from biggie_spark.util import fan_out

    # fan_out (optimization r14, guide §2.5): both the vocabulary count
    # and the acceptance plan explode ~816k tokens (sf0.1) off a
    # single-row-group scan — one task otherwise.  Batch-only: the
    # streaming twin calls _spec_accept_plan with a readStream frame and
    # is untouched.
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    a = _spec_accept_plan(docs, _spec_top_vocab(docs))
    return a.groupBy("doc_id").agg(
        F.count("*").alias("n_blocks"),
        F.sum("blk_len").alias("n_tokens"),
        F.sum("accepted").alias("accepted"),
        F.sum("produced").alias("produced"),
        F.expr("sum(produced) * 10000 div count(*)").alias(
            "tokens_per_step_e4"
        ),
    )


# Prefix-cache depth: 8 tokens — deep enough that sharing is real reuse
# (23 multi-doc groups / 47 docs at sf0.01), shallow enough to exist in
# every doc (min corpus doc is 10 tokens).
_PREFIX_DEPTH = 8


def _prefix_frame(docs, *extra):
    """(doc_id, *extra, prefix_md5) — the _PREFIX_DEPTH-token prefix
    fingerprint frame.  The ONE definition of what a 'prefix' is, shared
    by llm_kv_prefix_reuse and the streaming _prefix_reuse_plan so the
    two prefix-cache ops can never compute different prefix groups."""
    return (
        docs.select("doc_id", *extra, tokens("text").alias("ws"))
        .filter(F.size("ws") >= _PREFIX_DEPTH)
        .select(
            "doc_id",
            *extra,
            F.md5(F.array_join(F.slice("ws", 1, _PREFIX_DEPTH), " ")).alias(
                "prefix_md5"
            ),
        )
    )


@register(
    "llm_kv_prefix_reuse",
    oracle=f"""
    WITH p AS (SELECT doc_id, source,
                      md5(array_to_string(list_slice(
                        string_split(lower(text), ' '), 1, {_PREFIX_DEPTH}),
                        ' ')) AS h
               FROM documents
               WHERE len(string_split(lower(text), ' ')) >= {_PREFIX_DEPTH}),
    g AS (SELECT h, min(doc_id) AS first_doc FROM p GROUP BY h),
    j AS (SELECT p.source,
                 CASE WHEN p.doc_id = g.first_doc THEN 0 ELSE 1 END AS hit
          FROM p JOIN g USING (h))
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_reqs,
           CAST(sum(hit) AS BIGINT) AS cache_hits,
           CAST({_PREFIX_DEPTH} * sum(hit) AS BIGINT) AS saved_tokens,
           CAST(sum(hit) * 1000000 // count(*) AS BIGINT) AS hit_rate_e6
    FROM j GROUP BY source
    """,
)
def llm_kv_prefix_reuse(spark, sf_dir):
    """Prefix-cache (KV-reuse) accounting — the serving-side statistic
    behind prompt caching: requests sharing an identical leading
    8-token (_PREFIX_DEPTH) span reuse the cached KV pages of the first
    request that filled them.  The cache is GLOBAL (one serving fleet);
    attribution is per source, so the output is each tenant's hit count,
    saved prefill tokens, and hit rate — the numbers that justify cache
    capacity.  First-filler per prefix group is min(doc_id), the arrival
    order's deterministic proxy.

    Shape at scale: one hash aggregate onto the prefix-hash grid, a
    same-key equi-join back (both sides partitioned by the 16-byte md5 —
    the classic fingerprint join, linear), then a per-source rollup.
    The md5 prefix hash is what ships across the exchange, never the
    text.  The prefix fingerprint itself is the shared ``_prefix_frame``
    (one definition for batch and streaming)."""
    p = _prefix_frame(
        load_table(spark, sf_dir, "documents"), "source"
    ).withColumnRenamed("prefix_md5", "h")
    g = p.groupBy("h").agg(F.min("doc_id").alias("first_doc"))
    return (
        p.join(g, "h")
        .select(
            "source",
            F.when(F.col("doc_id") == F.col("first_doc"), 0)
            .otherwise(1)
            .alias("hit"),
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("n_reqs"),
            F.sum("hit").alias("cache_hits"),
            (F.lit(_PREFIX_DEPTH) * F.sum("hit")).alias("saved_tokens"),
            F.expr("sum(hit) * 1000000 div count(*)").alias("hit_rate_e6"),
        )
    )


_RADIX_DEPTHS = (1, 2, 4, 8)


@register(
    "llm_radix_cache_depth",
    oracle=f"""
    WITH d AS (SELECT unnest(ARRAY{list(_RADIX_DEPTHS)}) AS depth),
    t AS (SELECT doc_id, string_split(lower(text), ' ') AS ws
          FROM documents),
    g AS (SELECT d.depth,
                 md5(array_to_string(list_slice(t.ws, 1, d.depth), ' '))
                   AS h
          FROM t JOIN d ON len(t.ws) >= d.depth)
    SELECT depth,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT h) AS BIGINT) AS n_prefixes,
           CAST(count(*) * 1000000 // count(DISTINCT h) AS BIGINT)
             AS dup_factor_e6,
           CAST(depth * count(DISTINCT h) AS BIGINT) AS node_tokens,
           CAST(depth * (count(*) - count(DISTINCT h)) AS BIGINT)
             AS saved_tokens
    FROM g GROUP BY depth
    """,
)
def llm_radix_cache_depth(spark, sf_dir):
    """Radix-tree (trie) cache depth profile — the capacity-planning
    curve behind RadixAttention-style prefix caches: at each tree depth
    d in (1, 2, 4, 8) (_RADIX_DEPTHS), how many distinct d-token
    prefixes exist, the
    duplication factor (docs per prefix), the token storage the tree's
    nodes need at that depth, and the prefill tokens saved if every
    shared prefix hits.  Depth 1 collapses the corpus to ~30 nodes;
    depth 8 is nearly distinct (476 prefixes / 500 docs at sf0.01) —
    the curve's knee tells the operator where cache depth stops paying.

    Shape at scale: the depth grid is a 4-row broadcast against one
    corpus pass; prefixes ship as md5 fingerprints; the per-depth
    distinct is a partial+final aggregate on the (depth, hash) key —
    no window, no sort.  count(DISTINCT) over the 16-byte hash is the
    exact form; the approx_count_distinct swap is the documented
    cluster-scale relaxation."""
    depths = spark.createDataFrame(
        [(d,) for d in _RADIX_DEPTHS], "depth int"
    )
    t = load_table(spark, sf_dir, "documents").select(
        "doc_id", tokens("text").alias("ws")
    )
    g = (
        t.join(F.broadcast(depths), F.size("ws") >= F.col("depth"))
        .select(
            "depth",
            F.md5(
                F.array_join(F.slice("ws", F.lit(1), F.col("depth")), " ")
            ).alias("h"),
        )
    )
    return g.groupBy("depth").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("h").alias("n_prefixes"),
        F.expr("count(*) * 1000000 div count(DISTINCT h)").alias(
            "dup_factor_e6"
        ),
        F.expr("depth * count(DISTINCT h)").cast("long").alias("node_tokens"),
        F.expr("depth * (count(*) - count(DISTINCT h))")
        .cast("long")
        .alias("saved_tokens"),
    )


_PAGE_SIZE = 16


@register(
    "llm_kv_cache_paging",
    oracle=f"""
    WITH t AS (SELECT source,
                      CAST(len(string_split(lower(text), ' ')) AS BIGINT)
                        AS tk
               FROM documents),
    p AS (SELECT source, tk, (tk + {_PAGE_SIZE - 1}) // {_PAGE_SIZE} AS pages
          FROM t)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_seqs,
           CAST(sum(tk) AS BIGINT) AS kv_tokens,
           CAST(sum(pages) AS BIGINT) AS pages,
           CAST(sum(pages * {_PAGE_SIZE} - tk) AS BIGINT) AS frag_tokens,
           CAST(sum(pages * {_PAGE_SIZE} - tk) * 1000000
                // (sum(pages) * {_PAGE_SIZE}) AS BIGINT) AS frag_e6
    FROM p GROUP BY source
    """,
)
def llm_kv_cache_paging(spark, sf_dir):
    """PagedAttention page accounting — KV-cache blocks of
    16 tokens (_PAGE_SIZE) per sequence: page counts, internal
    fragmentation (allocated-but-unused slots in each sequence's last
    page), and the fragmentation rate per tenant — the memory-planning
    numbers paged KV allocation exists to minimize (fragmentation is
    bounded by page_size-1 per sequence by construction; the measured
    per-doc range spans the full 0..15).

    ONE corpus scan into a per-source partial+final hash aggregate; every
    metric is sum-composable integer arithmetic (ceil division in both
    engines as (tk + p - 1) div p)."""
    t = load_table(spark, sf_dir, "documents").select(
        "source", F.size(tokens("text")).cast("long").alias("tk")
    )
    pages = F.expr(f"(tk + {_PAGE_SIZE - 1}) div {_PAGE_SIZE}")
    return (
        t.select("source", "tk", pages.alias("pages"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_seqs"),
            F.sum("tk").alias("kv_tokens"),
            F.sum("pages").alias("pages"),
            F.sum(F.col("pages") * _PAGE_SIZE - F.col("tk")).alias(
                "frag_tokens"
            ),
            F.expr(
                f"sum(pages * {_PAGE_SIZE} - tk) * 1000000 "
                f"div (sum(pages) * {_PAGE_SIZE})"
            ).alias("frag_e6"),
        )
    )


_PROMPT_CAP = 32


@register(
    "llm_prefill_decode_flops",
    oracle=f"""
    WITH t AS (SELECT lang,
                      CAST(len(string_split(lower(text), ' ')) AS BIGINT)
                        AS n
               FROM documents),
    s AS (SELECT lang, n, least(n // 2, {_PROMPT_CAP}) AS p FROM t)
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_reqs,
           CAST(sum(p) AS BIGINT) AS prefill_tokens,
           CAST(sum(n - p) AS BIGINT) AS decode_tokens,
           CAST(sum(p * p) AS BIGINT) AS prefill_units,
           CAST(sum((n - p) * n) AS BIGINT) AS decode_units,
           CAST(sum((n - p) * n) * 1000000
                // (sum(p * p) + sum((n - p) * n)) AS BIGINT)
             AS decode_share_e6
    FROM s GROUP BY lang
    """,
)
def llm_prefill_decode_flops(spark, sf_dir):
    """Prefill/decode FLOPs split — the serving cost model's first-order
    decomposition: each request's prompt is its first min(n div 2,
    32 = _PROMPT_CAP) tokens, attention work is quadratic in the prefill
    (p^2 units, one parallel pass) and linear-times-context in the
    decode ((n-p)·n units, one pass per produced token).  The per-lang
    decode share tells the operator which traffic is compute-bound
    (prefill-heavy) vs memory-bandwidth-bound (decode-heavy) — the
    split that decides chunked-prefill and batching policy.

    ONE scan, one partial+final aggregate; all products stay far inside
    int64 (n <= ~100 per doc here; at real scale the unit columns are
    the documented DECIMAL(38,0) switch point)."""
    t = load_table(spark, sf_dir, "documents").select(
        "lang", F.size(tokens("text")).cast("long").alias("n")
    )
    s = t.select(
        "lang", "n", F.expr(f"least(n div 2, {_PROMPT_CAP})").alias("p")
    )
    return s.groupBy("lang").agg(
        F.count("*").alias("n_reqs"),
        F.sum("p").alias("prefill_tokens"),
        F.sum(F.col("n") - F.col("p")).alias("decode_tokens"),
        F.sum(F.col("p") * F.col("p")).alias("prefill_units"),
        F.sum((F.col("n") - F.col("p")) * F.col("n")).alias("decode_units"),
        F.expr(
            "sum((n - p) * n) * 1000000 div (sum(p * p) + sum((n - p) * n))"
        ).alias("decode_share_e6"),
    )


# Tier thresholds chosen on the measured token distribution (10..99,
# mean 54): small <32 (121 docs at sf0.01), mid <64 (180), large (199) —
# every tier live at every SF.  Cost units per token: 1 / 3 / 10.
_TIER_SQL = (
    "CASE WHEN tk < 32 THEN 'small' WHEN tk < 64 THEN 'mid' "
    "ELSE 'large' END"
)
_TIER_COST = "CASE WHEN tk < 32 THEN 1 WHEN tk < 64 THEN 3 ELSE 10 END"


@register(
    "llm_sla_tier_routing",
    oracle=f"""
    WITH t AS (SELECT CAST(len(string_split(lower(text), ' ')) AS BIGINT)
                        AS tk
               FROM documents),
    r AS (SELECT tk, {_TIER_SQL} AS tier, {_TIER_COST} AS unit_cost FROM t)
    SELECT tier,
           CAST(count(*) AS BIGINT) AS n_reqs,
           CAST(sum(tk) AS BIGINT) AS tokens,
           CAST(sum(tk * unit_cost) AS BIGINT) AS routed_cost,
           CAST(sum(tk * 10) AS BIGINT) AS all_large_cost,
           CAST((sum(tk * 10) - sum(tk * unit_cost)) * 1000000
                // sum(tk * 10) AS BIGINT) AS saved_e6
    FROM r GROUP BY tier
    """,
)
def llm_sla_tier_routing(spark, sf_dir):
    """Model-tier routing accounting — requests routed to
    small/mid/large model tiers by prompt length, with per-tier cost in
    integer units against the all-requests-to-the-large-model baseline:
    the saved_e6 column is the routing policy's headline number.
    Thresholds sit inside the measured token distribution so every tier
    is populated at every SF (121/180/199 at sf0.01).

    ONE scan, one 3-row aggregate — the degenerate-cheap op shape; its
    value is the POLICY expressed declaratively (the CASE is the router),
    so Catalyst folds routing into the scan."""
    t = load_table(spark, sf_dir, "documents").select(
        F.size(tokens("text")).cast("long").alias("tk")
    )
    r = t.select(
        "tk",
        F.expr(_TIER_SQL).alias("tier"),
        F.expr(_TIER_COST).alias("unit_cost"),
    )
    return r.groupBy("tier").agg(
        F.count("*").alias("n_reqs"),
        F.sum("tk").alias("tokens"),
        F.sum(F.col("tk") * F.col("unit_cost")).alias("routed_cost"),
        F.sum(F.col("tk") * 10).alias("all_large_cost"),
        F.expr(
            "(sum(tk * 10) - sum(tk * unit_cost)) * 1000000 "
            "div sum(tk * 10)"
        ).alias("saved_e6"),
    )


_BATCH_B = 8


@register(
    "llm_batch_wait_time",
    oracle=f"""
    WITH t AS (SELECT source, doc_id,
                      CAST(len(string_split(lower(text), ' ')) AS BIGINT)
                        AS tk
               FROM documents),
    r AS (SELECT source, tk,
                 (row_number() OVER (PARTITION BY source ORDER BY doc_id)
                  - 1) // {_BATCH_B} AS b
          FROM t),
    l AS (SELECT source, b, CAST(max(tk) AS BIGINT) AS lat,
                 CAST(count(*) AS BIGINT) AS n
          FROM r GROUP BY source, b),
    w AS (SELECT source, b, n, lat,
                 CAST(coalesce(sum(lat) OVER (PARTITION BY source ORDER BY b
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS wait
          FROM l)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_batches,
           CAST(sum(lat) AS BIGINT) AS makespan,
           CAST(sum(n * wait) AS BIGINT) AS total_wait,
           CAST(sum(n * wait) // sum(n) AS BIGINT) AS mean_wait
    FROM w GROUP BY source
    """,
)
def llm_batch_wait_time(spark, sf_dir):
    """FIFO batch queueing accounting — static batching of B=8
    (_BATCH_B)
    requests per tenant queue in arrival (doc_id) order, where a batch's
    latency is its longest member (everything pads to the max) and a
    request's wait is the summed latency of every earlier batch in its
    queue: per tenant, the makespan, total and mean request wait — the
    queueing numbers that motivate continuous batching (compare
    ``llm_length_grouped_batches`` for the padding-cost axis; this op is
    the latency axis of the same tradeoff).

    Shape at scale: windows are PARTITIONED by source (the tenant queue
    is the natural parallelism unit), the batch reduction is a
    (source, batch)-keyed hash aggregate, and the running wait is a
    prefix sum over each tenant's bounded BATCH frame, never over
    requests."""
    t = load_table(spark, sf_dir, "documents").select(
        "source", "doc_id", F.size(tokens("text")).cast("long").alias("tk")
    )
    wq = Window.partitionBy("source").orderBy("doc_id")
    r = t.select(
        "source",
        "tk",
        ((F.row_number().over(wq) - 1) / _BATCH_B).cast("long").alias("b"),
    )
    l = r.groupBy("source", "b").agg(
        F.max("tk").alias("lat"), F.count("*").alias("n")
    )
    ww = (
        Window.partitionBy("source")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w = l.select(
        "source",
        "n",
        "lat",
        F.coalesce(F.sum("lat").over(ww), F.lit(0)).alias("wait"),
    )
    return w.groupBy("source").agg(
        F.count("*").alias("n_batches"),
        F.sum("lat").alias("makespan"),
        F.sum(F.col("n") * F.col("wait")).alias("total_wait"),
        F.expr("sum(n * wait) div sum(n)").alias("mean_wait"),
    )


@register(
    "stream_prefix_reuse_static",
    oracle=f"""
    WITH p AS (SELECT doc_id,
                      md5(array_to_string(list_slice(
                        string_split(lower(text), ' '), 1, {_PREFIX_DEPTH}),
                        ' ')) AS h
               FROM documents
               WHERE len(string_split(lower(text), ' ')) >= {_PREFIX_DEPTH})
    SELECT h AS prefix_md5,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(doc_id) AS BIGINT) AS first_doc,
           CAST({_PREFIX_DEPTH} * (count(*) - 1) AS BIGINT) AS saved_tokens
    FROM p GROUP BY h HAVING count(*) >= 2
    """,
)
def stream_prefix_reuse_static(spark, sf_dir):
    """Streaming-capable prefix-cache hit table — the online form of
    ``llm_kv_prefix_reuse``: ONE groupBy on the 8-token (_PREFIX_DEPTH)
    prefix fingerprint (no windows, no join, no second aggregation — the
    ``stream_containment_gate_static`` discipline), emitting each shared
    prefix's population, first filler, and saved prefill tokens.  Under
    readStream with update-mode output this is the live cache-hit
    dashboard: each arriving request increments exactly one prefix row's
    state.  The HAVING gate keeps only prefixes that actually save work
    (23 rows at sf0.01; filters-after-aggregate are streaming-legal).
    Live readStream drain equality is pinned by
    tests/test_streaming_demo.py."""
    return _prefix_reuse_plan(load_table(spark, sf_dir, "documents"))


def _prefix_reuse_plan(docs):
    """Frame-parametric prefix-reuse plan: the identical expressions run
    over a batch frame (the scored op) and a readStream source (the live
    drain demo) — the two can never fork.  The prefix fingerprint is the
    shared ``_prefix_frame`` (also used by llm_kv_prefix_reuse)."""
    return (
        _prefix_frame(docs)
        .groupBy("prefix_md5")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
            (F.lit(_PREFIX_DEPTH) * (F.count("*") - 1)).alias(
                "saved_tokens"
            ),
        )
        .filter(F.col("n_docs") >= 2)
    )


# ---------------------------------------------------------------------------
# distillation / eval / fusion tier
#
# Teacher = the round-9 unique-token quality score (score_e2, the shared
# _UNIQ_SCORE); student = the cheap length-capped proxy least(n_tok, 99).
# Real pipelines join a large model's scores against a small model's —
# here both sides are deterministic corpus functions so every op carries
# a full value oracle while exercising the same join/aggregate shapes.

_T_SCORE = (
    "size(array_distinct(split(lower(text), ' '))) * 100 "
    "div size(split(lower(text), ' '))"
)
_T_SCORE_SQL = (
    "len(list_distinct(string_split(lower(text), ' '))) * 100 "
    "// len(string_split(lower(text), ' '))"
)
_S_SCORE = "least(size(split(lower(text), ' ')), 99)"
_S_SCORE_SQL = "least(len(string_split(lower(text), ' ')), 99)"
# Binary keep-gates for the agreement flags (129 teacher-keeps and 277
# student-keeps at sf0.01 — all four confusion cells live).
_T_KEEP, _S_KEEP = 60, 50


def _distill_frame(spark, sf_dir):
    """(doc_id, source, n_tok, t_e2, s_e2) — the shared teacher/student
    score join both distillation ops read.  Teacher and student are
    computed as SEPARATE aggregable frames and equi-joined on doc_id —
    the join shape a real teacher-score table forces — rather than
    fused into one projection."""
    d = load_table(spark, sf_dir, "documents")
    teacher = d.select(
        "doc_id", "source", F.expr(_T_SCORE).cast("long").alias("t_e2")
    )
    student = d.select(
        "doc_id",
        F.size(tokens("text")).cast("long").alias("n_tok"),
        F.expr(_S_SCORE).cast("long").alias("s_e2"),
    )
    return teacher.join(student, "doc_id")


@register(
    "llm_distill_pairs",
    oracle=f"""
    WITH t AS (SELECT doc_id, source,
                      CAST({_T_SCORE_SQL} AS BIGINT) AS t_e2
               FROM documents),
    s AS (SELECT doc_id,
                 CAST(len(string_split(lower(text), ' ')) AS BIGINT)
                   AS n_tok,
                 CAST({_S_SCORE_SQL} AS BIGINT) AS s_e2
          FROM documents)
    SELECT t.doc_id, t.source, t.t_e2, s.s_e2,
           CAST(t.t_e2 - s.s_e2 AS BIGINT) AS gap_e2,
           CAST((t.t_e2 >= {_T_KEEP}) = (s.s_e2 >= {_S_KEEP}) AS BIGINT)
             AS gates_agree
    FROM t JOIN s USING (doc_id)
    """,
)
def llm_distill_pairs(spark, sf_dir):
    """Teacher/student score pairing — the distillation pipeline's first
    join: the expensive teacher's quality score against the cheap
    student proxy, per document, with the signed gap and a
    gates-agree flag (do the two models' keep decisions coincide?).
    Gap spans -70..88 on this corpus and all four keep-gate confusion
    cells are populated, so downstream threshold logic is never vacuous.

    Shape at scale: ONE equi-join on doc_id between two aggregable score
    frames — in production the teacher side is a separately-materialized
    scores table, so the op deliberately keeps the join rather than
    fusing both scores into one projection (bucketed layouts make it
    shuffle-free)."""
    f = _distill_frame(spark, sf_dir)
    return f.select(
        "doc_id",
        "source",
        "t_e2",
        "s_e2",
        (F.col("t_e2") - F.col("s_e2")).alias("gap_e2"),
        (
            (F.col("t_e2") >= _T_KEEP) == (F.col("s_e2") >= _S_KEEP)
        )
        .cast("long")
        .alias("gates_agree"),
    )


@register(
    "llm_distill_transfer_gap",
    oracle=f"""
    WITH p AS (SELECT CAST({_T_SCORE_SQL} AS BIGINT) // 20 AS t_bucket,
                      CAST({_S_SCORE_SQL} AS BIGINT) // 20 AS s_bucket,
                      CAST({_T_SCORE_SQL} AS BIGINT)
                        - CAST({_S_SCORE_SQL} AS BIGINT) AS gap
               FROM documents)
    SELECT t_bucket, s_bucket,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(gap) AS BIGINT) AS sum_gap_e2,
           CAST(sum(gap) // count(*) AS BIGINT) AS mean_gap_e2
    FROM p GROUP BY t_bucket, s_bucket
    """,
)
def llm_distill_transfer_gap(spark, sf_dir):
    """The teacher→student transfer matrix: documents cross-tabulated by
    quintile bucket of each model's score (a 5×5 grid at most), with the
    per-cell mean signed gap — the picture that shows WHERE the student
    tracks the teacher (diagonal mass) and where it fails (off-diagonal
    cells with large |mean gap|).  The distillation analog of a
    confusion matrix over continuous scores.

    ONE scan, one partial+final aggregate onto the bounded bucket grid —
    the cheapest possible shape; floor division keeps bucket edges and
    means identical on both engines."""
    d = load_table(spark, sf_dir, "documents")
    p = d.select(
        (F.expr(_T_SCORE).cast("long") / 20).cast("long").alias("t_bucket"),
        (F.expr(_S_SCORE).cast("long") / 20).cast("long").alias("s_bucket"),
        (F.expr(_T_SCORE).cast("long") - F.expr(_S_SCORE).cast("long")).alias(
            "gap"
        ),
    )
    return p.groupBy("t_bucket", "s_bucket").agg(
        F.count("*").alias("n"),
        F.sum("gap").alias("sum_gap_e2"),
        F.expr("sum(gap) div count(*)").alias("mean_gap_e2"),
    )


@register(
    "llm_distill_hard_mine",
    oracle=f"""
    WITH s AS (SELECT doc_id,
                      CAST(len(string_split(lower(text), ' ')) AS BIGINT)
                        AS n_tok,
                      abs(CAST({_T_SCORE_SQL} AS BIGINT)
                          - CAST({_S_SCORE_SQL} AS BIGINT)) AS ag
               FROM documents),
    b AS (SELECT ag, CAST(sum(n_tok) AS BIGINT) AS btok FROM s GROUP BY ag),
    c AS (SELECT ag,
                 sum(btok) OVER (ORDER BY ag DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum_incl,
                 sum(btok) OVER () AS tot
          FROM b),
    k AS (SELECT ag FROM c
          WHERE ag >= (SELECT coalesce(
                         min(CASE WHEN cum_incl <= tot // 5 THEN ag END),
                         max(ag)) FROM c))
    SELECT s.doc_id, s.ag AS gap_abs_e2, s.n_tok
    FROM s JOIN k USING (ag)
    """,
)
def llm_distill_hard_mine(spark, sf_dir):
    """Hard-example mining under a token budget — select the documents
    where teacher and student DISAGREE most (largest |gap|), up to 1/5 of
    corpus tokens: the classic distillation curriculum step (spend the
    student's training budget where the teacher has the most to teach).

    Shape: the round-9 threshold-bucket decomposition on the bounded
    |gap| grid (<= 189 integer values, inside round9's _GRID_BOUND
    guard): one corpus aggregate onto the gap grid, a descending prefix
    sum over that bounded frame picks the cutoff, the kept-gap set
    broadcast-joins back — never a global per-doc sort.  The whole
    algorithm — tie policy, degenerate-corpus coalesce, grid guard —
    IS round9's ``_kept_buckets``, called with (col='ag', budget 1/5),
    so the policy has exactly one Spark body."""
    from biggie_spark.ops.round9 import _kept_buckets

    d = load_table(spark, sf_dir, "documents")
    s = d.select(
        "doc_id",
        F.size(tokens("text")).cast("long").alias("n_tok"),
        F.abs(
            F.expr(_T_SCORE).cast("long") - F.expr(_S_SCORE).cast("long")
        ).alias("ag"),
    )
    kept = _kept_buckets(s, col="ag", num=1, den=5)
    return s.join(F.broadcast(kept), "ag").select(
        "doc_id", F.col("ag").alias("gap_abs_e2"), "n_tok"
    )


@register(
    "llm_pairwise_winrate",
    oracle=f"""
    WITH s AS (SELECT source,
                      CAST({_T_SCORE_SQL} AS BIGINT) AS sc
               FROM documents),
    h AS (SELECT source, sc, CAST(count(*) AS BIGINT) AS n
          FROM s GROUP BY source, sc),
    p AS (SELECT a.source AS src_a, b.source AS src_b,
                 CAST(sum(CASE WHEN a.sc > b.sc THEN a.n * b.n ELSE 0 END)
                   AS BIGINT) AS wins,
                 CAST(sum(CASE WHEN a.sc = b.sc THEN a.n * b.n ELSE 0 END)
                   AS BIGINT) AS ties,
                 CAST(sum(CASE WHEN a.sc < b.sc THEN a.n * b.n ELSE 0 END)
                   AS BIGINT) AS losses
          FROM h a JOIN h b ON a.source < b.source
          GROUP BY a.source, b.source)
    SELECT src_a, src_b, wins, ties, losses,
           CAST((2 * wins + ties) * 1000000
                // (2 * (wins + ties + losses)) AS BIGINT) AS winrate_e6
    FROM p
    """,
)
def llm_pairwise_winrate(spark, sf_dir):
    """Exact pairwise win rates between sources — the Elo/Bradley-Terry
    input matrix computed WITHOUT sampling: for each source pair,
    P(random doc of A outscores random doc of B) from the product of the
    two sources' score histograms (ties count half).  Because scores
    live on the bounded integer grid, the full quadratic comparison
    collapses to a histogram-product join — exact win counts over
    62.5k implicit pairings per source pair at sf0.01, never
    materialized.

    Shape at scale: one corpus aggregate onto the (source, score) grid
    (bounded: sources × 101 buckets), then a theta self-join of that
    bounded frame — broadcast both sides; corpus size only changes the
    histogram WEIGHTS.  The n*n products reach ~1e7 at sf0.1; the
    winrate is the standard (wins + ties/2) normalization in e6 integer
    form, floor-divided identically on both engines."""
    s = load_table(spark, sf_dir, "documents").select(
        "source", F.expr(_T_SCORE).cast("long").alias("sc")
    )
    h = s.groupBy("source", "sc").agg(F.count("*").alias("n"))
    a = h.select(
        F.col("source").alias("src_a"),
        F.col("sc").alias("sa"),
        F.col("n").alias("na"),
    )
    b = h.select(
        F.col("source").alias("src_b"),
        F.col("sc").alias("sb"),
        F.col("n").alias("nb"),
    )
    p = (
        a.join(F.broadcast(b), F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(
            F.sum(
                F.when(
                    F.col("sa") > F.col("sb"), F.col("na") * F.col("nb")
                ).otherwise(0)
            ).alias("wins"),
            F.sum(
                F.when(
                    F.col("sa") == F.col("sb"), F.col("na") * F.col("nb")
                ).otherwise(0)
            ).alias("ties"),
            F.sum(
                F.when(
                    F.col("sa") < F.col("sb"), F.col("na") * F.col("nb")
                ).otherwise(0)
            ).alias("losses"),
        )
    )
    return p.select(
        "src_a",
        "src_b",
        "wins",
        "ties",
        "losses",
        F.expr(
            "(2 * wins + ties) * 1000000 div (2 * (wins + ties + losses))"
        ).alias("winrate_e6"),
    )


# RRF constant (Cormack et al.): 60.
_RRF_K = 60


@register(
    "llm_rrf_fusion",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS a FROM embeddings),
    q AS (SELECT vec_id,
                 [CAST(CASE WHEN x >= 0 THEN floor(abs(x) * 100 + 0.5)
                            ELSE -floor(abs(x) * 100 + 0.5) END AS BIGINT)
                  FOR x IN a] AS qa
          FROM e),
    pr AS (SELECT e.vec_id AS probe_id, e.a AS pa, q.qa AS pqa
           FROM e JOIN q USING (vec_id) WHERE e.vec_id < 10),
    cand AS (SELECT pr.probe_id,
                    e.vec_id AS neighbor_id,
                    round(list_cosine_similarity(pr.pa, e.a), 4) AS s4,
                    list_dot_product(pr.pqa::DOUBLE[], q.qa::DOUBLE[])
                      AS idot
             FROM pr JOIN e ON e.vec_id <> pr.probe_id
                     JOIN q ON q.vec_id = e.vec_id),
    r AS (SELECT probe_id, neighbor_id,
                 row_number() OVER (PARTITION BY probe_id
                   ORDER BY s4 DESC, neighbor_id) AS r_cos,
                 row_number() OVER (PARTITION BY probe_id
                   ORDER BY idot DESC, neighbor_id) AS r_dot
          FROM cand),
    f AS (SELECT probe_id, neighbor_id,
                 CAST(r_cos AS BIGINT) AS rank_cos,
                 CAST(r_dot AS BIGINT) AS rank_dot,
                 CAST(1000000 // ({_RRF_K} + r_cos)
                      + 1000000 // ({_RRF_K} + r_dot) AS BIGINT) AS rrf_e6
          FROM r)
    SELECT probe_id, neighbor_id, rank_cos, rank_dot, rrf_e6
    FROM (SELECT *, row_number() OVER (PARTITION BY probe_id
            ORDER BY rrf_e6 DESC, neighbor_id) AS rn FROM f)
    WHERE rn <= 5
    """,
)
def llm_rrf_fusion(spark, sf_dir):
    """Reciprocal-rank fusion of two retrievers — the standard
    no-tuning ensemble (RRF, k=60 = _RRF_K): retriever 1 ranks candidates
    by double cosine (rounded to the repo's cross-engine-safe 4 decimals
    BEFORE ranking), retriever 2 by the INTEGER dot product of e2
    half-away-quantized embeddings (the SQ8-style coarse order — exact
    integer, zero float risk), and each candidate's fused score is
    sum(1e6 div (k + rank)).  Top-5 fused per probe, with both component
    ranks exposed so a reviewer sees WHY a candidate won.

    Shape at scale: the 10-probe frame broadcasts against one corpus
    pass (the llm_knn_cosine exact-baseline pattern); ranks are windows
    partitioned per probe over that probe's candidate list — in
    production each retriever contributes its own bounded top-N instead
    of the full corpus, same plan shape with a pre-cut."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("a"),
    )
    quant = F.transform(
        "a",
        lambda x: F.when(
            x >= 0, F.floor(F.abs(x) * 100 + 0.5)
        )
        .otherwise(-F.floor(F.abs(x) * 100 + 0.5))
        .cast("long"),
    )
    q = e.select("vec_id", "a", quant.alias("qa"))
    pr = q.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("probe_id"),
        F.col("a").alias("pa"),
        F.col("qa").alias("pqa"),
    )
    from biggie_spark.util import cosine, r4

    idot = F.aggregate(
        F.zip_with("pqa", "qa", lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    cand = (
        q.join(F.broadcast(pr), F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            F.col("vec_id").alias("neighbor_id"),
            r4(cosine(F.col("pa"), F.col("a"))).alias("s4"),
            idot.alias("idot"),
        )
    )
    wc = Window.partitionBy("probe_id").orderBy(
        F.desc("s4"), "neighbor_id"
    )
    wd = Window.partitionBy("probe_id").orderBy(
        F.desc("idot"), "neighbor_id"
    )
    r = cand.select(
        "probe_id",
        "neighbor_id",
        F.row_number().over(wc).cast("long").alias("rank_cos"),
        F.row_number().over(wd).cast("long").alias("rank_dot"),
    )
    f = r.withColumn(
        "rrf_e6",
        F.expr(
            f"1000000 div ({_RRF_K} + rank_cos) "
            f"+ 1000000 div ({_RRF_K} + rank_dot)"
        ),
    )
    wf = Window.partitionBy("probe_id").orderBy(
        F.desc("rrf_e6"), "neighbor_id"
    )
    return (
        f.withColumn("rn", F.row_number().over(wf))
        .filter(F.col("rn") <= 5)
        .select("probe_id", "neighbor_id", "rank_cos", "rank_dot", "rrf_e6")
    )


_RAG_BUDGET = 400


@register(
    "llm_rag_context_pack",
    oracle=f"""
    WITH s AS (SELECT doc_id, source,
                      CAST(len(string_split(lower(text), ' ')) AS BIGINT)
                        AS tk,
                      CAST({_T_SCORE_SQL} AS BIGINT) AS sc
               FROM documents),
    r AS (SELECT *, sum(tk) OVER (PARTITION BY source
                      ORDER BY sc DESC, doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS cum,
                 row_number() OVER (PARTITION BY source
                      ORDER BY sc DESC, doc_id) AS rnk
          FROM s)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_candidates,
           CAST(count(*) FILTER (cum <= {_RAG_BUDGET}) AS BIGINT) AS n_kept,
           CAST(coalesce(sum(tk) FILTER (cum <= {_RAG_BUDGET}), 0)
             AS BIGINT) AS tokens_used,
           CAST(coalesce(sum(tk) FILTER (cum <= {_RAG_BUDGET}), 0)
                * 1000000 // {_RAG_BUDGET} AS BIGINT) AS util_e6,
           CAST(min(CASE WHEN cum > {_RAG_BUDGET} THEN rnk END)
             AS BIGINT) AS first_excluded_rank
    FROM r GROUP BY source
    """,
)
def llm_rag_context_pack(spark, sf_dir):
    """RAG context packing under a token budget — per retrieval pool
    (source), greedily admit the highest-scored chunks in rank order
    until the next chunk would overflow the 400-token (_RAG_BUDGET)
    context:
    kept count, tokens used, budget utilization, and the rank of the
    first casualty (the number that tells you whether the budget or the
    retriever is the bottleneck).  Both kept and excluded branches are
    live at every SF (9..28 kept of 25..250 candidates).

    Shape at scale: ONE running-sum window PARTITIONED by the retrieval
    pool (never global), then a per-pool rollup — the greedy
    prefix-admission rule is exactly a cumulative sum threshold, so no
    iteration is needed.  Integer tokens; floor-division utilization."""
    s = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(tokens("text")).cast("long").alias("tk"),
        F.expr(_T_SCORE).cast("long").alias("sc"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.desc("sc"), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wr = Window.partitionBy("source").orderBy(F.desc("sc"), "doc_id")
    r = s.select(
        "source",
        "tk",
        F.sum("tk").over(w).alias("cum"),
        F.row_number().over(wr).alias("rnk"),
    )
    kept = F.col("cum") <= _RAG_BUDGET
    return r.groupBy("source").agg(
        F.count("*").alias("n_candidates"),
        F.count(F.when(kept, 1)).alias("n_kept"),
        F.coalesce(F.sum(F.when(kept, F.col("tk"))), F.lit(0)).alias(
            "tokens_used"
        ),
        (
            F.coalesce(F.sum(F.when(kept, F.col("tk"))), F.lit(0))
            * 1000000
            / _RAG_BUDGET
        )
        .cast("long")
        .alias("util_e6"),
        F.min(F.when(~kept, F.col("rnk"))).cast("long").alias(
            "first_excluded_rank"
        ),
    )


@register(
    "llm_self_consistency_vote",
    oracle=f"""
    WITH s AS (SELECT doc_id, doc_id // 4 AS prompt_id,
                      CAST({_T_SCORE_SQL} AS BIGINT) // 25 AS ans
               FROM documents),
    c AS (SELECT prompt_id, ans, CAST(count(*) AS BIGINT) AS n
          FROM s GROUP BY prompt_id, ans),
    v AS (SELECT prompt_id,
                 max(n * 8 + (7 - ans)) AS mk,
                 CAST(sum(n) AS BIGINT) AS n_samples,
                 CAST(count(*) AS BIGINT) AS n_distinct
          FROM c GROUP BY prompt_id)
    SELECT prompt_id,
           n_samples,
           n_distinct,
           CAST(7 - mk % 8 AS BIGINT) AS vote,
           CAST(mk // 8 AS BIGINT) AS vote_count,
           CAST((mk // 8) * 1000000 // n_samples AS BIGINT) AS margin_e6,
           CAST(n_distinct = 1 AS BIGINT) AS unanimous
    FROM v
    """,
)
def llm_self_consistency_vote(spark, sf_dir):
    """Self-consistency majority voting — k=4 samples per prompt (the
    round-9 prompt grouping), each sample's discrete answer being its
    quality-score quartile class (0..4, a deterministic stand-in for an
    extracted final answer): the modal answer wins, ties break to the
    SMALLEST answer class via the repo's BIGINT argmax encoding
    (count*8 + (7-ans); counts <= 4 so the stride never saturates), with
    the vote margin and a unanimity flag (modal counts 2/3/4 all
    populated: 65/50/10 at sf0.01).

    Shape: two chained hash aggregates on (prompt, answer) then prompt —
    no windows, no joins; under readStream the same plan shape is the
    online vote tracker (one stateful agg per stage).  At scale the
    answer grid per prompt is bounded by k, so state is O(prompts)."""
    s = load_table(spark, sf_dir, "documents").select(
        (F.col("doc_id") / 4).cast("long").alias("prompt_id"),
        (F.expr(_T_SCORE).cast("long") / 25).cast("long").alias("ans"),
    )
    c = s.groupBy("prompt_id", "ans").agg(F.count("*").alias("n"))
    v = c.groupBy("prompt_id").agg(
        F.max(F.col("n") * 8 + (F.lit(7) - F.col("ans"))).alias("mk"),
        F.sum("n").alias("n_samples"),
        F.count("*").alias("n_distinct"),
    )
    return v.select(
        "prompt_id",
        "n_samples",
        "n_distinct",
        (F.lit(7) - F.col("mk") % 8).alias("vote"),
        F.expr("mk div 8").alias("vote_count"),
        F.expr("(mk div 8) * 1000000 div n_samples").alias("margin_e6"),
        (F.col("n_distinct") == 1).cast("long").alias("unanimous"),
    )


# ---------------------------------------------------------------------------
# SQL-surface parity, exact percentiles, MRL truncation, compaction,
# and the streaming spec-decode twin


@register(
    "sql_grouping_id",
    oracle="""
    SELECT l_returnflag AS rf, l_linestatus AS ls,
           CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                            (l_returnflag), ())
    """,
)
def sql_grouping_id(spark, sf_dir):
    """``GROUPING_ID`` / ``GROUPING()`` parity over GROUPING SETS — the
    bitmask that lets a report consumer tell a real NULL group key from a
    rollup-aggregated one (THE classic grouping-sets footgun).  Spark's
    ``grouping_id(a, b)`` and DuckDB's two-argument ``GROUPING(a, b)``
    must emit the same bitmask (first argument = most-significant bit) on
    the same three grouping sets — the hash check certifies bit order,
    not just totals.

    Plan shape: one Expand + hash aggregate (Spark's grouping-sets
    lowering); the expansion factor is the number of sets (3), applied
    after partial aggregation where possible.  Quantities are integral
    doubles in this corpus, cast to BIGINT before summation on both
    engines."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "lineitem_gid"
    )
    return spark.sql(
        """
        SELECT l_returnflag AS rf, l_linestatus AS ls,
               CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT)
                 AS gid,
               count(*) AS n,
               sum(CAST(l_quantity AS BIGINT)) AS sum_qty
        FROM lineitem_gid
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag), ())
        """
    )


@register(
    "sql_listagg_ordered",
    oracle="""
    SELECT o_orderstatus AS status,
           CAST(count(*) AS BIGINT) AS n,
           string_agg(DISTINCT o_orderpriority, ','
                      ORDER BY o_orderpriority DESC) AS priorities_desc
    FROM orders GROUP BY o_orderstatus
    """,
)
def sql_listagg_ordered(spark, sf_dir):
    """Ordered ``LISTAGG ... WITHIN GROUP`` parity — the SQL:2023 string
    aggregation Spark 4 added, proved against DuckDB's ordered
    ``string_agg``: per order status, the DISTINCT priorities
    concatenated in DESCENDING order.  The hash check certifies the
    ORDER BY inside the aggregate actually orders (an engine that
    ignored it would emit a different string), the DISTINCT dedups
    before ordering, and the separator semantics match.

    Plan shape: a hash aggregate whose state is the collected distinct
    set (bounded: 5 priorities) — safe only because the group domain is
    tiny; the docstring-level contract for users is 'LISTAGG state is
    O(distinct values per group): never aggregate an unbounded text
    column'."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "orders_lga"
    )
    return spark.sql(
        """
        SELECT o_orderstatus AS status,
               count(*) AS n,
               listagg(DISTINCT o_orderpriority, ',')
                 WITHIN GROUP (ORDER BY o_orderpriority DESC)
                 AS priorities_desc
        FROM orders_lga GROUP BY o_orderstatus
        """
    )


_MRL_DIMS = (8, 16, 32)


def _mrl_rank_sql(dim: str) -> str:
    """DuckDB candidate frame at one truncation width: 4dp-rounded cosine
    between `dim`-prefix slices, ranked per probe."""
    return f"""
      SELECT probe_id, neighbor_id,
             row_number() OVER (PARTITION BY probe_id
               ORDER BY round(list_cosine_similarity(
                 pa[1:{dim}], a[1:{dim}]), 4) DESC, neighbor_id) AS rn
      FROM cand
    """


@register(
    "llm_matryoshka_truncate",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS a FROM embeddings),
    pr AS (SELECT vec_id AS probe_id, a AS pa FROM e WHERE vec_id < 10),
    cand AS (SELECT pr.probe_id, pr.pa, e.vec_id AS neighbor_id, e.a
             FROM pr JOIN e ON e.vec_id <> pr.probe_id),
    full5 AS (SELECT probe_id, neighbor_id FROM ({_mrl_rank_sql('64')})
              WHERE rn <= 5),
    t8 AS (SELECT 8 AS dim, * FROM ({_mrl_rank_sql('8')}) WHERE rn <= 5),
    t16 AS (SELECT 16 AS dim, * FROM ({_mrl_rank_sql('16')}) WHERE rn <= 5),
    t32 AS (SELECT 32 AS dim, * FROM ({_mrl_rank_sql('32')}) WHERE rn <= 5),
    t AS (SELECT * FROM t8 UNION ALL SELECT * FROM t16
          UNION ALL SELECT * FROM t32),
    ov AS (SELECT t.dim, t.probe_id,
                  CAST(count(f.neighbor_id) AS BIGINT) AS overlap5
           FROM t LEFT JOIN full5 f
             ON f.probe_id = t.probe_id AND f.neighbor_id = t.neighbor_id
           GROUP BY t.dim, t.probe_id)
    SELECT CAST(dim AS BIGINT) AS dim, probe_id, overlap5,
           CAST(overlap5 * 1000000 // 5 AS BIGINT) AS recall5_e6
    FROM ov
    """,
)
def llm_matryoshka_truncate(spark, sf_dir):
    """Matryoshka (MRL) truncation analysis — how much retrieval quality
    survives cutting embeddings to their leading 8/16/32 of 64
    dimensions: per (width, probe), the top-5 overlap between the
    truncated-cosine ranking and the full-width ranking, and the recall
    it implies.  On this corpus the curve is brutal (overlap 0..1 at
    width 8, 0..3 at 32) — the honest conclusion that RANDOM embeddings
    are not matryoshka-trained, exactly what the op exists to measure
    before a team ships truncated vectors.

    Shape at scale: the 10-probe frame broadcasts once; ONE candidate
    pass projects the cosine at all four widths (the slice is a
    zero-copy prefix of the stored array — column pruning still reads
    one vector column), and each width's top-5 is a window over the
    localCheckpoint'd scored frame — the candidate generation runs once,
    not once per width (review r9); overlap is an equi-join of two
    bounded top-5 frames.  Cosines round to the cross-engine-safe 4
    decimals BEFORE ranking."""
    from biggie_spark.util import cosine, r4

    from biggie_spark.util import fan_out

    # fan_out (optimization r14, guide §2.5): 12 cosine folds per pair
    # over a single-split scan.
    e = fan_out(
        load_table(spark, sf_dir, "embeddings").select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("a"),
        )
    )
    pr = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("probe_id"), F.col("a").alias("pa")
    )
    widths = list(_MRL_DIMS) + [64]
    scored = (
        e.join(F.broadcast(pr), F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            F.col("vec_id").alias("neighbor_id"),
            *[
                r4(cosine(F.slice("pa", 1, d), F.slice("a", 1, d))).alias(
                    f"s4_{d}"
                )
                for d in widths
            ],
        )
        .localCheckpoint()
    )

    def top5(dim):
        w = Window.partitionBy("probe_id").orderBy(
            F.desc(f"s4_{dim}"), "neighbor_id"
        )
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 5)
            .select("probe_id", "neighbor_id")
        )

    full5 = top5(64)
    parts = [
        top5(dim).select(
            F.lit(dim).cast("long").alias("dim"), "probe_id", "neighbor_id"
        )
        for dim in _MRL_DIMS
    ]
    t = parts[0].unionByName(parts[1]).unionByName(parts[2])
    f5 = full5.select(
        "probe_id", F.col("neighbor_id").alias("fn"), F.lit(1).alias("hit")
    )
    ov = (
        t.join(
            f5,
            (t.probe_id == f5.probe_id) & (t.neighbor_id == f5.fn),
            "left",
        )
        .select(t.dim, t.probe_id, "hit")
        .groupBy("dim", "probe_id")
        .agg(F.count("hit").alias("overlap5"))
    )
    return ov.select(
        "dim",
        "probe_id",
        "overlap5",
        F.expr("overlap5 * 1000000 div 5").alias("recall5_e6"),
    )


@register(
    "stream_spec_accept_static",
    oracle=f"""
    WITH t AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok,
                      generate_subscripts(string_split(lower(text), ' '), 1)
                        - 1 AS pos
               FROM documents),
    top AS (SELECT tok FROM (SELECT tok, count(*) AS c FROM t GROUP BY tok
                             ORDER BY c DESC, tok LIMIT {_SPEC_TOPK})),
    m AS (SELECT doc_id, pos // {_SPEC_GAMMA} AS blk,
                 pos % {_SPEC_GAMMA} AS pib,
                 (tok IN (SELECT tok FROM top)) AS ok
          FROM t)
    SELECT doc_id, CAST(blk AS BIGINT) AS blk,
           CAST(count(*) AS BIGINT) AS blk_len,
           CAST(coalesce(min(CASE WHEN NOT ok THEN pib END),
                         count(*)) AS BIGINT) AS accepted,
           CAST(least(coalesce(min(CASE WHEN NOT ok THEN pib END),
                               count(*)) + 1, count(*)) AS BIGINT)
             AS produced
    FROM m GROUP BY doc_id, blk
    """,
)
def stream_spec_accept_static(spark, sf_dir):
    """Streaming-capable speculative-decoding acceptance — the online
    form of ``llm_spec_decode_accept``: the draft vocabulary is a STATIC
    dimension (stream-static joins are streaming-legal), and the
    per-(request, block) acceptance reduction is ONE groupBy whose
    min/count state incrementalizes under update mode — the live
    acceptance dashboard a serving fleet tails per request.  The per-doc
    rollup (a second stateful stage) stays in the batch op; this twin
    deliberately stops at the single-aggregate frontier, the
    ``stream_containment_gate_static`` discipline.

    produced = min(accepted + 1, block_len) expressed with least() so
    the one aggregate emits it directly (no post-join).  Live readStream
    drain equality is pinned by tests/test_streaming_demo.py."""
    docs = load_table(spark, sf_dir, "documents")
    return _spec_accept_plan(docs, _spec_top_vocab(docs))


def _spec_top_vocab(batch_docs):
    """The static draft-vocabulary dimension (top-16 = _SPEC_TOPK corpus
    tokens) — always computed from a BATCH frame: in the live drain it is
    the static side of the stream-static join."""
    return (
        batch_docs.select(F.explode(tokens("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), "tok")
        .limit(_SPEC_TOPK)
        .select("tok", F.lit(True).alias("in_top"))
    )


def _spec_accept_plan(docs, top):
    """Frame-parametric acceptance plan: `docs` may be a batch frame or a
    readStream source; `top` is the static vocabulary dimension."""
    t = docs.select(
        "doc_id", F.posexplode(tokens("text")).alias("pos", "tok")
    ).select("doc_id", "pos", "tok")
    m = (
        t.join(F.broadcast(top), "tok", "left")
        .select(
            "doc_id",
            (F.col("pos") / _SPEC_GAMMA).cast("long").alias("blk"),
            (F.col("pos") % _SPEC_GAMMA).alias("pib"),
            F.coalesce("in_top", F.lit(False)).alias("ok"),
        )
    )
    acc = F.coalesce(
        F.min(F.when(~F.col("ok"), F.col("pib"))), F.count("*")
    ).cast("long")
    return m.groupBy("doc_id", "blk").agg(
        F.count("*").alias("blk_len"),
        acc.alias("accepted"),
        F.least(acc + 1, F.count("*")).alias("produced"),
    )


_PCTS = (25, 50, 75)


@register(
    "agg_percentile_grid",
    oracle="""
    WITH s AS (SELECT source,
                      CAST(len(string_split(lower(text), ' ')) AS BIGINT)
                        AS tk
               FROM documents),
    h AS (SELECT source, tk, CAST(count(*) AS BIGINT) AS n
          FROM s GROUP BY source, tk),
    c AS (SELECT source, tk,
                 sum(n) OVER (PARTITION BY source ORDER BY tk
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                 sum(n) OVER (PARTITION BY source) AS tot
          FROM h)
    SELECT source, CAST(max(tot) AS BIGINT) AS n,
           CAST(min(CASE WHEN 100 * cum >= 25 * tot THEN tk END)
             AS BIGINT) AS p25,
           CAST(min(CASE WHEN 100 * cum >= 50 * tot THEN tk END)
             AS BIGINT) AS p50,
           CAST(min(CASE WHEN 100 * cum >= 75 * tot THEN tk END)
             AS BIGINT) AS p75
    FROM c GROUP BY source
    """,
)
def agg_percentile_grid(spark, sf_dir):
    """EXACT nearest-rank percentiles (p25/p50/p75) per group via the
    bounded-value-grid decomposition — the full-oracle counterpart to the
    rows-only ``agg_approx_quantile``: when the value domain is a bounded
    integer grid (token counts, latencies in ms buckets, ages), exact
    percentiles need NO global sort and NO sketch — one hash aggregate
    onto the (group, value) grid, a prefix sum over each group's bounded
    grid slice, and the nearest-rank rule min{v : cum(v) >= ceil(p*n)}
    expressed as the integer cross-multiplication 100*cum >= p*n (exact:
    cum is integral, so cum >= ceil(q) iff cum >= q).

    Shape at scale: the window partitions by GROUP over <= 90 grid rows
    each — corpus size only changes the histogram weights, identical to
    the ``llm_pairwise_winrate`` posture.  This is how a 100 TB latency
    dashboard computes true p99 without touching a sort or accepting
    sketch error."""
    s = load_table(spark, sf_dir, "documents").select(
        "source", F.size(tokens("text")).cast("long").alias("tk")
    )
    h = s.groupBy("source", "tk").agg(F.count("*").alias("n"))
    wc = (
        Window.partitionBy("source")
        .orderBy("tk")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy("source")
    c = h.select(
        "source",
        "tk",
        F.sum("n").over(wc).alias("cum"),
        F.sum("n").over(wt).alias("tot"),
    )
    aggs = [F.max("tot").alias("n")] + [
        F.min(
            F.when(100 * F.col("cum") >= p * F.col("tot"), F.col("tk"))
        ).alias(f"p{p}")
        for p in _PCTS
    ]
    return c.groupBy("source").agg(*aggs)


@register(
    "kv_stash_compaction_persisted",
    oracle="""
    WITH m AS (
      SELECT doc_id,
             CASE WHEN doc_id BETWEEN 200 AND 399 THEN 2
                  WHEN doc_id BETWEEN 100 AND 199 THEN 1
                  ELSE 0 END AS ver,
             CASE WHEN doc_id BETWEEN 200 AND 399 THEN text || ' [v2]'
                  WHEN doc_id BETWEEN 100 AND 199 THEN text || ' [v1]'
                  ELSE text END AS payload
      FROM documents WHERE doc_id < 400)
    SELECT ver,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(doc_id) AS BIGINT) AS sum_key,
           CAST(sum(len(payload)) AS BIGINT) AS sum_len
    FROM m GROUP BY ver
    """,
)
def kv_stash_compaction_persisted(spark, sf_dir):
    """LSM-style stash compaction, persisted end-to-end: three write
    generations land as separate directories (gen=0 the 300-key base,
    gen=1 a 100-key update delta, gen=2 a 200-key update+insert delta),
    the read path resolves latest-version-wins per key with ONE hash
    aggregate (``max_by(payload, ver)`` — no window, no sort; version
    numbers are unique per key by construction), and compaction rewrites
    the merged state as a single-file artifact.  The op RAISES unless
    compaction actually shrank the file count — the structural claim a
    compactor exists to deliver — and the returned per-version stats
    (key counts, key sums, payload byte sums) are computed from
    RE-READING the compacted artifact, so a corrupted rewrite fails the
    value check, not just the file-count probe.

    Shape at 100 TB: generations are partition directories, the merge is
    one agg keyed by the stash key (bucketed layouts make it
    shuffle-free), and production compaction bounds file size with
    maxRecordsPerFile instead of coalesce(1) — the plan shape is
    identical, only the output split policy differs."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    gens = [
        docs.filter(F.col("doc_id") < 300).select(
            "doc_id", F.lit(0).alias("ver"), F.col("text").alias("payload")
        ),
        docs.filter(F.col("doc_id").between(100, 199)).select(
            "doc_id",
            F.lit(1).alias("ver"),
            F.concat("text", F.lit(" [v1]")).alias("payload"),
        ),
        docs.filter(F.col("doc_id").between(200, 399)).select(
            "doc_id",
            F.lit(2).alias("ver"),
            F.concat("text", F.lit(" [v2]")).alias("payload"),
        ),
    ]
    root = tempfile.mkdtemp(prefix="biggie_stash_compact_")
    try:
        for i, g in enumerate(gens):
            g.write.mode("overwrite").parquet(os.path.join(root, f"gen={i}"))

        def parquet_files(d):
            return [
                os.path.join(dp, f)
                for dp, _, fs in os.walk(d)
                for f in fs
                if f.endswith(".parquet")
            ]

        n_in = len(parquet_files(root))
        allg = spark.read.option("basePath", root).parquet(
            *[os.path.join(root, f"gen={i}") for i in range(3)]
        )
        latest = allg.groupBy("doc_id").agg(
            F.expr("max_by(payload, ver)").alias("payload"),
            F.max("ver").alias("ver"),
        )
        compact = os.path.join(root, "compact")
        latest.coalesce(1).write.mode("overwrite").parquet(compact)
        n_out = len(parquet_files(compact))
        if n_out >= n_in:
            raise RuntimeError(
                f"compaction must shrink the file count ({n_in} -> {n_out})"
            )
        merged = spark.read.schema(latest.schema).parquet(compact)
        out = merged.groupBy("ver").agg(
            F.count("*").alias("n_keys"),
            F.sum("doc_id").alias("sum_key"),
            F.sum(F.length("payload")).alias("sum_len"),
        )
        return out.localCheckpoint()
    finally:
        shutil.rmtree(root, ignore_errors=True)


# ---------------------------------------------------------------------------
# window-slot closer: the stash top-k coordinate query (the other
# direction of the feature-stash loop)

@register(
    "kv_tensor_stash_topk_keys",
    oracle=f"""
    WITH ch AS ({ORACLES["mm_audio_chroma"]})
    SELECT doc_id, energy_e2,
           CAST(row_number() OVER (ORDER BY energy_e2 DESC, doc_id)
             AS BIGINT) AS rnk
    FROM ch WHERE pc = 2
    ORDER BY energy_e2 DESC, doc_id LIMIT 8
    """,
)
def kv_tensor_stash_topk_keys(spark, sf_dir):
    """Top-k keys by one tensor coordinate — the OTHER direction of the
    feature-stash loop: ``kv_chroma_stash_persisted`` answers "aggregate
    a range of keys"; this answers "which keys rank highest on pitch
    class 2" (the D class that collects 7 DFT bins) — the 'find me the
    most D-heavy tracks' query, served from stored chroma tensors via
    ``element_at(data, pc+1)`` without touching audio.

    Plan shape: coordinate extraction is a struct/array projection
    (column-pruned to one field), and the top-8 is
    TakeOrderedAndProject — never a global sort.  Ties break on key
    ascending, identically on both engines."""
    tens = _chroma_tensors(spark, sf_dir)
    e2 = tens.select(
        "doc_id", F.element_at(F.col("tensor.data"), 3).alias("energy_e2")
    )
    w = Window.partitionBy().orderBy(F.desc("energy_e2"), "doc_id")
    return (
        e2.orderBy(F.desc("energy_e2"), "doc_id")
        .limit(8)
        .withColumn("rnk", F.row_number().over(w).cast("long"))
    )


@register(
    "agg_gini_concentration",
    oracle="""
    WITH s AS (SELECT source,
                      CAST(len(string_split(lower(text), ' ')) AS BIGINT)
                        AS tk
               FROM documents),
    h AS (SELECT source, tk, CAST(count(*) AS BIGINT) AS c
          FROM s GROUP BY source, tk),
    w AS (SELECT source, tk, c,
                 coalesce(sum(c) OVER (PARTITION BY source ORDER BY tk
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS base
          FROM h),
    a AS (SELECT source, CAST(sum(c) AS BIGINT) AS n,
                 CAST(sum(tk * c) AS BIGINT) AS total_tokens,
                 sum(tk * (c * base + c * (c + 1) // 2)) AS ranksum
          FROM w GROUP BY source)
    SELECT source, n, total_tokens,
           CAST((2 * ranksum - (n + 1) * total_tokens) * 1000000
                // (n * total_tokens) AS BIGINT) AS gini_e6
    FROM a
    """,
)
def agg_gini_concentration(spark, sf_dir):
    """EXACT Gini coefficient of token mass per source — the inequality
    measure a data-mix review reads ("is this source's contribution a
    few huge docs or many small ones?"), computed on the bounded value
    grid with ZERO sorting of the corpus: the classic rank formula
    G = (2·Σ i·x_(i) − (n+1)·Σx) / (n·Σx) needs sorted per-doc ranks,
    but on a histogram the rank sum collapses per grid row to
    v·(c·base + c(c+1)/2) where base is the exclusive cumulative count —
    so one hash aggregate onto the (source, value) grid plus a
    group-partitioned prefix sum replaces the global sort entirely (the
    ``agg_percentile_grid`` posture; corpus size only changes histogram
    weights).  All integer: the e6 Gini floor-divides identically on
    both engines."""
    s = load_table(spark, sf_dir, "documents").select(
        "source", F.size(tokens("text")).cast("long").alias("tk")
    )
    h = s.groupBy("source", "tk").agg(F.count("*").alias("c"))
    wb = (
        Window.partitionBy("source")
        .orderBy("tk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w = h.select(
        "source",
        "tk",
        "c",
        F.coalesce(F.sum("c").over(wb), F.lit(0)).alias("base"),
    )
    return (
        w.groupBy("source")
        .agg(
            F.sum("c").alias("n"),
            F.sum(F.col("tk") * F.col("c")).alias("total_tokens"),
            F.sum(
                F.col("tk")
                * (
                    F.col("c") * F.col("base")
                    + F.expr("c * (c + 1) div 2")
                )
            ).alias("ranksum"),
        )
        .select(
            "source",
            "n",
            "total_tokens",
            F.expr(
                "(2 * ranksum - (n + 1) * total_tokens) * 1000000 "
                "div (n * total_tokens)"
            ).alias("gini_e6"),
        )
    )


# ---------------------------------------------------------------------------
# rank-2 chroma matrix field — the stored feature MATRIX (frames x pcs)

from biggie_spark.ops.round9 import _CHROMA_PC_SQL  # noqa: E402  (round9
# is always imported first by ops/__init__, so this is cycle-safe; the pc
# fold table must be THE SAME literal in both modules' oracles)

@register(
    "kv_chroma_matrix_field",
    oracle=f"""
    WITH probe AS (SELECT doc_id FROM documents WHERE doc_id < 64),
    terms AS (
      SELECT p.doc_id, t.t, k.k, (t.t // 64) AS frame,
             CAST(((p.doc_id * 31 + t.t) * 2654435761) % 65536 - 32768
                  AS DOUBLE) AS x,
             2 * pi() * k.k * (t.t % 64) / 64 AS th
      FROM probe p, range(128) t(t), range(1, 33) k(k)),
    r AS (SELECT doc_id, frame, k,
             CAST(sum(CAST(sign(x * cos(th)) *
                  floor(abs(x * cos(th)) * 10 + 0.5) AS BIGINT)) AS BIGINT)
                 AS c,
             CAST(sum(CAST(sign(x * sin(th)) *
                  floor(abs(x * sin(th)) * 10 + 0.5) AS BIGINT)) AS BIGINT)
                 AS s
          FROM terms GROUP BY doc_id, frame, k),
    pctab AS (SELECT * FROM (VALUES {_CHROMA_PC_SQL}) v(k, pc)),
    e AS (SELECT r.doc_id, r.frame, pctab.pc,
                 CAST(sum(c*c + s*s) AS BIGINT) AS e
          FROM r JOIN pctab ON r.k = pctab.k
          GROUP BY r.doc_id, r.frame, pctab.pc),
    m AS (SELECT doc_id, pc,
                 max(CASE WHEN frame = 0 THEN e END) AS e0,
                 max(CASE WHEN frame = 1 THEN e END) AS e1
          FROM e GROUP BY doc_id, pc)
    SELECT doc_id,
           CAST(sum(e0) AS BIGINT) AS frame0_sum,
           CAST(sum(e1) AS BIGINT) AS frame1_sum,
           CAST(sum(abs(e1 - e0)) AS BIGINT) AS l1_change
    FROM m GROUP BY doc_id
    """,
)
def kv_chroma_matrix_field(spark, sf_dir):
    """The stored feature MATRIX — the reference's actual payload shape
    (a chromagram: frames × pitch classes, not a single vector): two
    consecutive 64-sample frames per key through the real WAV path, each
    frame's 12-bin chroma fold, assembled into a rank-2 tensor field
    ``struct<shape:[2,12], data:array<long>>`` (row-major, frame-major),
    then reduced THROUGH the flat layout: per-frame totals are row
    slices (``slice(data, f*12+1, 12)`` folds), and the frame-to-frame
    harmonic change is the L1 distance between the two rows — the
    chroma-flux feature that drives chord-change detection.

    The oracle restates both frames' folds in SQL from the generating
    signal; the Spark side must recover them from the FLAT tensor — a
    frame-stride slip breaks the hash.  Kernel: one Arrow-batched
    pandas_udf emits the 24-long flat matrix per key; every reduction
    after that is JVM array code."""
    import math as _math

    import numpy as np

    from pyspark.sql.functions import pandas_udf

    from biggie_spark.multimodal import demo_pcm, encode_wav, wav_samples
    from biggie_spark.ops.round9 import _CHROMA_PC

    @pandas_udf("binary")
    def encode_udf(doc_id: pd.Series) -> pd.Series:
        return pd.Series(
            [encode_wav(demo_pcm(d, 128).astype("<i2")) for d in doc_id]
        )

    _t = np.arange(64, dtype=np.float64)
    _ks = np.arange(1, 33, dtype=np.float64)
    _TH = (2 * _math.pi * _ks)[:, None] * _t / 64
    _COS, _SIN = np.cos(_TH), np.sin(_TH)
    _PC_ROWS = [
        [k - 1 for k in range(1, 33) if _CHROMA_PC[k] == pc]
        for pc in range(12)
    ]

    @pandas_udf("array<long>")
    def chromagram_udf(payload: pd.Series) -> pd.Series:
        out = []
        for buf in payload:
            x = wav_samples(bytes(buf)).astype(np.float64)
            flat = []
            for f in range(2):
                xf = x[f * 64 : (f + 1) * 64]
                vc, vs = xf * _COS, xf * _SIN
                c = (
                    np.copysign(np.floor(np.abs(vc) * 10 + 0.5), vc)
                    .sum(axis=1)
                    .astype(np.int64)
                )
                s = (
                    np.copysign(np.floor(np.abs(vs) * 10 + 0.5), vs)
                    .sum(axis=1)
                    .astype(np.int64)
                )
                e = c * c + s * s
                flat.extend(int(e[rows].sum()) for rows in _PC_ROWS)
            out.append(flat)
        return pd.Series(out)

    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 64)
        .select("doc_id")
    )
    t = d.withColumn("payload", encode_udf("doc_id")).select(
        "doc_id",
        F.struct(
            F.array(F.lit(2), F.lit(12)).alias("shape"),
            chromagram_udf("payload").alias("data"),
        ).alias("tensor"),
    )
    flat = F.col("tensor.data")
    row0 = F.slice(flat, 1, 12)
    row1 = F.slice(flat, 13, 12)
    from biggie_spark.util import long_sum as fsum
    l1 = F.aggregate(
        F.zip_with(row1, row0, lambda a, b: F.abs(a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return t.select(
        "doc_id",
        fsum(row0).alias("frame0_sum"),
        fsum(row1).alias("frame1_sum"),
        l1.alias("l1_change"),
    )
