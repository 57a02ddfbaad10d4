"""North-star text-analysis extensions, part 3: the three document-shaping
ops every LLM training-data pipeline runs between cleaning and training —
chunking (split long docs into overlapping context windows), sequence
packing (assign docs to fixed-token-budget bins), and decontamination
(drop training docs that share n-gram content with an evaluation set).

Scale notes: chunking is a pure per-row explode (no shuffle at all — the
parallelism is the scan's); packing is a per-partition running sum (one
shuffle on the partition column, state never leaves the executor);
decontamination shuffles 16-byte md5 shingle keys, not documents, and the
evaluation side is tiny by construction (broadcast semi-join).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from biggie_spark.io import load_table
from biggie_spark.registry import register
from biggie_spark.util import tokens

_CHUNK = 20  # tokens per chunk
_STRIDE = 15  # chunk start stride (CHUNK - STRIDE = 5 tokens of overlap)
_PACK = 512  # token budget per packed sequence
_DECON_K = 5  # shingle width for contamination matching


@register(
    "llm_chunk_overlap",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS tk
               FROM documents),
    s AS (SELECT doc_id, tk, unnest(range(0, len(tk), {_STRIDE})) AS st FROM t)
    SELECT doc_id,
           st // {_STRIDE} AS chunk_idx,
           array_to_string(tk[st + 1 : st + {_CHUNK}], ' ') AS chunk_text,
           len(tk[st + 1 : st + {_CHUNK}]) AS n_tokens
    FROM s
    """,
)
def llm_chunk_overlap(spark, sf_dir):
    """Overlapping fixed-size chunking: windows of 20 tokens every 15
    tokens (5-token overlap), the standard pre-embedding/pre-training
    split.  Pure projection + explode — no shuffle; at 100 TB the output
    partitioning is inherited from the scan and chunk rows stay on the
    executor that read the parent document.

    Start generation: Spark ``sequence(0, n-1, stride)`` is inclusive of
    its upper bound, DuckDB ``range(0, n, stride)`` is exclusive — both
    yield starts 0, 15, ... strictly below n (memory: determinism rule on
    sequence/range bounds).  Tail chunks shorter than 20 tokens are kept
    (both engines' slice truncates past the end)."""
    d = load_table(spark, sf_dir, "documents")
    tk = tokens(F.col("text"))
    d = d.select("doc_id", tk.alias("tk"))
    starts = F.sequence(F.lit(0), F.size("tk") - 1, F.lit(_STRIDE))
    return (
        d.select("doc_id", "tk", F.explode(starts).alias("st"))
        .select(
            "doc_id",
            F.expr(f"st div {_STRIDE}").alias("chunk_idx"),
            F.array_join(
                F.slice(F.col("tk"), F.col("st") + 1, F.lit(_CHUNK)), " "
            ).alias("chunk_text"),
            F.size(F.slice(F.col("tk"), F.col("st") + 1, F.lit(_CHUNK))).alias(
                "n_tokens"
            ),
        )
    )


@register(
    "llm_pack_sequences",
    oracle=f"""
    WITH t AS (SELECT doc_id, lang,
                      len(string_split(lower(text), ' ')) AS n_tokens
               FROM documents)
    SELECT doc_id, lang, n_tokens,
           CAST(coalesce(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                        ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND 1 PRECEDING), 0) // {_PACK} AS BIGINT) AS bin
    FROM t
    """,
)
def llm_pack_sequences(spark, sf_dir):
    """Deterministic concat-and-split sequence packing: docs are laid out
    in doc_id order within each language stream and assigned to the
    512-token bin where their first token lands (bin = tokens-before div
    512).  This is the packing layout GPT-style pretraining uses, made
    reproducible: the assignment depends only on (lang, doc_id) order,
    never on partitioning or scheduling.  One shuffle on lang; the running
    sum is executor-local per partition — no global window, so the op
    scales with the number of streams."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select("doc_id", "lang", F.size(tokens(F.col("text"))).alias("n_tokens"))
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return t.withColumn("bin", before.cast("long") / F.lit(_PACK)).withColumn(
        "bin", F.floor("bin").cast("long")
    )


@register(
    "llm_decontaminate",
    oracle=f"""
    WITH t AS (SELECT doc_id, source, string_split(lower(text), ' ') AS tk
               FROM documents),
    sh AS (SELECT doc_id, source,
                  md5(array_to_string(tk[i : i + {_DECON_K - 1}], ' ')) AS g
           FROM (SELECT doc_id, source, tk,
                        unnest(range(1, len(tk) - {_DECON_K - 2})) AS i
                 FROM t)),
    eval_sh AS (SELECT DISTINCT g FROM sh WHERE source = 'src0'),
    hits AS (SELECT DISTINCT sh.doc_id FROM sh
             JOIN eval_sh ON sh.g = eval_sh.g
             WHERE sh.source <> 'src0')
    SELECT t.doc_id,
           EXISTS (SELECT 1 FROM hits WHERE hits.doc_id = t.doc_id)
             AS contaminated
    FROM t WHERE source <> 'src0'
    """,
)
def llm_decontaminate(spark, sf_dir):
    """Evaluation-set decontamination: flag every training document (source
    <> 'src0') sharing at least one 5-token shingle with the held-out set
    (source = 'src0').  The match key is md5 of the shingle — the shuffle
    and the join carry 16-byte hashes, never text; the eval side is
    DISTINCT-collapsed and broadcast, so the training corpus is touched in
    one pass.  Spark ``sequence(1, n-k+1)`` == DuckDB
    ``range(1, n-k+2)`` = shingle starts (guarded: sequence descends when
    its upper bound < 1, so short docs short-circuit to no shingles)."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select("doc_id", "source", tokens(F.col("text")).alias("tk"))
    n = F.size("tk")
    starts = F.when(
        n >= _DECON_K, F.sequence(F.lit(1), n - (_DECON_K - 1))
    ).otherwise(F.array().cast("array<int>"))
    sh = t.select(
        "doc_id",
        "source",
        F.explode(starts).alias("i"),
        F.col("tk"),
    ).select(
        "doc_id",
        "source",
        F.md5(F.array_join(F.slice("tk", F.col("i"), F.lit(_DECON_K)), " ")).alias(
            "g"
        ),
    )
    eval_sh = sh.filter(F.col("source") == "src0").select("g").distinct()
    train_sh = sh.filter(F.col("source") != "src0")
    hits = (
        train_sh.join(F.broadcast(eval_sh), "g", "left_semi")
        .select("doc_id")
        .distinct()
    )
    return (
        t.filter(F.col("source") != "src0")
        .select("doc_id")
        .join(hits.withColumn("contaminated", F.lit(True)), "doc_id", "left")
        .select(
            "doc_id", F.coalesce("contaminated", F.lit(False)).alias("contaminated")
        )
    )


@register(
    "llm_ngram_lm",
    oracle="""
    WITH t AS (SELECT string_split(lower(text), ' ') AS tk FROM documents),
    bg AS (SELECT tk[i] AS w1, tk[i + 1] AS w2
           FROM (SELECT tk, unnest(range(1, len(tk))) AS i FROM t)),
    c2 AS (SELECT w1, w2, count(*) AS n2 FROM bg GROUP BY w1, w2),
    c1 AS (SELECT w1, count(*) AS n1 FROM bg GROUP BY w1)
    SELECT c2.w1, c2.w2, n2, n1, (n2 * 1000000) // n1 AS p_e6
    FROM c2 JOIN c1 ON c2.w1 = c1.w1
    WHERE n2 >= 5
    """,
)
def llm_ngram_lm(spark, sf_dir):
    """Bigram language-model statistics: corpus-wide bigram counts and the
    conditional probability p(w2|w1) = count(w1,w2)/count(w1 as bigram
    head), emitted as an integer-scaled BIGINT (units 1e-6, integer
    division — engine-portable).  Two hash aggregates over exploded
    bigrams joined on the head token; the shuffle carries (token, count)
    pairs bounded by vocabulary size, not corpus size — the canonical
    count-based LM estimation shape.  Bigram starts: Spark
    sequence(1, n-1) == DuckDB range(1, n), guarded for 1-token docs
    (sequence descends when its upper bound < its lower)."""
    d = load_table(spark, sf_dir, "documents")
    pairs = F.expr(
        "transform(sequence(1, size(tk) - 1),"
        " i -> struct(element_at(tk, i) AS w1, element_at(tk, i + 1) AS w2))"
    )
    bg = (
        d.select(tokens(F.col("text")).alias("tk"))
        .filter(F.size("tk") >= 2)  # sequence(1, 0) would DESCEND (rule 4)
        .select(F.explode(pairs).alias("p"))
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )
    c2 = bg.groupBy("w1", "w2").agg(F.count("*").alias("n2"))
    c1 = bg.groupBy("w1").agg(F.count("*").alias("n1"))
    return (
        c2.join(c1, "w1")
        .filter(F.col("n2") >= 5)
        .select("w1", "w2", "n2", "n1", F.expr("n2 * 1000000 div n1").alias("p_e6"))
    )


@register(
    "llm_repetition_filter",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS tk
               FROM documents),
         g AS (SELECT doc_id,
                      list_transform(range(1, len(tk) - 1),
                                     i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])
                          AS tris
               FROM t WHERE len(tk) >= 3)
    SELECT doc_id,
           CAST(len(tris) AS BIGINT) AS n_tri,
           CAST(len(tris) - len(list_distinct(tris)) AS BIGINT) AS n_dup,
           CAST((len(tris) - len(list_distinct(tris))) * 1000000 // len(tris)
                AS BIGINT) AS dup_e6,
           (len(tris) - len(list_distinct(tris))) * 1000000 // len(tris)
               < 300000 AS keep
    FROM g
    """,
)
def llm_repetition_filter(spark, sf_dir):
    """Repetition-based quality filter (the Gopher/MassiveText heuristic):
    per document, the fraction of word 3-grams that are duplicates of an
    earlier 3-gram in the same document; high repetition marks boilerplate,
    keyword stuffing, and generation loops.  keep = dup ratio < 30%.

    Pure per-row computation inside whole-stage codegen — the trigram
    array, distinct count, and ratio are all higher-order array functions
    on the scan, so the filter runs at full parallelism with NO shuffle at
    any scale; this is the shape every per-document quality score should
    have.  The ratio is integer-scaled (`n_dup * 1e6 div n_tri`) before
    the threshold compare (determinism rule 7).  Bounds care: Spark
    `sequence(0, n)` is inclusive and DESCENDS for n < 0 (rule 4) — docs
    with fewer than 3 tokens are filtered out on both sides before the
    trigram expansion."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.expr("split(lower(text), ' ')").alias("tk")
    )
    g = d.filter(F.expr("size(tk) >= 3")).select(
        "doc_id",
        F.expr(
            "transform(sequence(0, size(tk) - 3),"
            " i -> concat(tk[i], ' ', tk[i+1], ' ', tk[i+2]))"
        ).alias("tris"),
    )
    return g.select(
        "doc_id",
        F.expr("cast(size(tris) as bigint)").alias("n_tri"),
        F.expr("cast(size(tris) - size(array_distinct(tris)) as bigint)").alias(
            "n_dup"
        ),
        F.expr(
            "cast(size(tris) - size(array_distinct(tris)) as bigint) * 1000000"
            " div size(tris)"
        ).alias("dup_e6"),
        F.expr(
            "cast(size(tris) - size(array_distinct(tris)) as bigint) * 1000000"
            " div size(tris) < 300000"
        ).alias("keep"),
    )


@register(
    "llm_ngram_novelty",
    oracle="""
    WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS tk
               FROM documents),
         t AS (SELECT doc_id,
                      unnest(list_distinct(list_transform(
                          range(1, len(tk) - 1),
                          i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))) AS tri
               FROM d WHERE len(tk) >= 3),
         m AS (SELECT tri, min(doc_id) AS first_doc FROM t GROUP BY tri)
    SELECT t.doc_id,
           CAST(count(*) AS BIGINT) AS n_tri,
           CAST(sum(CASE WHEN m.first_doc = t.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           CAST(sum(CASE WHEN m.first_doc = t.doc_id THEN 1 ELSE 0 END)
                * 1000000 // count(*) AS BIGINT) AS novelty_e6
    FROM t JOIN m USING (tri)
    GROUP BY t.doc_id
    """,
)
def llm_ngram_novelty(spark, sf_dir):
    """Cross-document novelty score: per document, the fraction of its
    distinct word trigrams that first appear in THIS document (first =
    lowest doc_id over the whole corpus) — the corpus-level complement of
    llm_repetition_filter's within-document score, and the selection
    signal for "does this document add anything new?" curation.

    Shape at scale: explode distinct trigrams (map-side, no shuffle),
    ONE aggregate shuffled on the trigram — min(doc_id) partial-combines
    map-side, so the shuffle carries one row per distinct trigram per
    partition — then a shuffle join back on the trigram and a final
    per-document rollup.  The trigram key space is Zipf-skewed; the
    min-combiner absorbs the head before the wire, and AQE splits any
    residual hot key.  Ratio integer-scaled (rule 7); n-gram bounds per
    rule 4 (Spark sequence inclusive, DuckDB range exclusive)."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.expr("split(lower(text), ' ')").alias("tk")
    )
    t = (
        d.filter(F.expr("size(tk) >= 3"))
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "array_distinct(transform(sequence(0, size(tk) - 3),"
                    " i -> concat(tk[i], ' ', tk[i+1], ' ', tk[i+2])))"
                )
            ).alias("tri"),
        )
    )
    m = t.groupBy("tri").agg(F.min("doc_id").alias("first_doc"))
    return (
        t.join(m, "tri")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tri"),
            F.sum(
                F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
            ).cast("long").alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_tri",
            "n_novel",
            F.expr("CAST(n_novel * 1000000 div n_tri AS BIGINT)").alias(
                "novelty_e6"
            ),
        )
    )


_PREFIX_HX = "md5(concat_ws(' ', slice(split(lower(text), ' '), 1, 8)))"
_PREFIX_HX_SQL = "md5(array_to_string(string_split(lower(text), ' ')[1:8], ' '))"


@register(
    "llm_cross_dup_matrix",
    oracle=f"""
    WITH h AS (SELECT source, {_PREFIX_HX_SQL} AS hx FROM documents),
         s AS (SELECT DISTINCT hx, source FROM h)
    SELECT a.source AS src_a, b.source AS src_b,
           CAST(count(*) AS BIGINT) AS n_shared
    FROM s a JOIN s b USING (hx)
    WHERE a.source < b.source
    GROUP BY a.source, b.source
    """,
)
def llm_cross_dup_matrix(spark, sf_dir):
    """Cross-source contamination matrix: for every source pair, how many
    8-token-prefix fingerprints they share — the triage view that tells a
    curation pipeline WHICH ingest feeds are mirroring each other (web
    dumps re-crawling the same boilerplate) before any expensive pairwise
    dedup runs.  Prefix fingerprinting is the cheap first pass: O(1)
    per doc, catches templated/boilerplate openings that full-text
    hashing misses.

    Shape at scale: distinct (fingerprint, source) collapses each source's
    copies first — the self-join then runs on the DEDUPED frame, equi-keyed
    on the fingerprint, so join input is bounded by distinct fingerprints
    x sources (<< corpus size) and the output by source-pairs.  The
    canonical a<b orientation halves the join output and makes each pair
    unique (same trick as graph_triangles)."""
    d = load_table(spark, sf_dir, "documents")
    s = d.select("source", F.expr(_PREFIX_HX).alias("hx")).distinct()
    a = s.alias("a")
    b = s.alias("b")
    return (
        a.join(b, "hx")
        .filter(F.col("a.source") < F.col("b.source"))
        .groupBy(F.col("a.source").alias("src_a"), F.col("b.source").alias("src_b"))
        .agg(F.count("*").cast("long").alias("n_shared"))
    )


@register(
    "llm_dedup_keep_best",
    oracle=f"""
    WITH h AS (SELECT doc_id, source, n_chars, {_PREFIX_HX_SQL} AS hx
               FROM documents),
         r AS (SELECT doc_id, hx,
                      row_number() OVER (PARTITION BY hx
                                         ORDER BY n_chars DESC, doc_id) AS rn,
                      count(*) OVER (PARTITION BY hx) AS dup_n
               FROM h)
    SELECT doc_id, hx, CAST(dup_n AS BIGINT) AS dup_n, rn = 1 AS keep
    FROM r
    """,
)
def llm_dedup_keep_best(spark, sf_dir):
    """Canonical-document selection: within each 8-token-prefix fingerprint
    group, keep the highest-quality copy (longest text, doc_id tiebreak —
    a composite total order, rule 6) and mark the rest as drops — the
    policy step between candidate generation and the physical delete in a
    dedup pipeline (every real pipeline keeps ONE representative, it
    doesn't delete whole clusters).  One window rank partitioned by the
    fingerprint; group sizes are near-1 (dup groups are rare by
    construction), so the shuffle is uniform and AQE coalesces the tiny
    partitions."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("hx").orderBy(F.col("n_chars").desc(), "doc_id")
    wn = Window.partitionBy("hx")
    return (
        d.select("doc_id", "n_chars", F.expr(_PREFIX_HX).alias("hx"))
        .withColumn("rn", F.row_number().over(w))
        .withColumn("dup_n", F.count("*").over(wn).cast("long"))
        .select("doc_id", "hx", "dup_n", (F.col("rn") == 1).alias("keep"))
    )
