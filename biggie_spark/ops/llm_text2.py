"""North-star text-analysis extensions, part 2: n-gram Jaccard near-dup,
BPE-ish regex tokenization, and winnowing-style document fingerprints.

Scale notes: the n-gram Jaccard op here scores an explicit probe subset
exactly (array_intersect on shingle sets — one pass, no shuffle beyond the
pair join); at corpus scale candidates come from the MinHash/LSH banding of
ops/llm.py with shingles swapped in for tokens — the banding machinery is
tokenizer-agnostic.  Fingerprints are pure projections.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from biggie_spark.io import load_table
from biggie_spark.registry import register
from biggie_spark.util import fan_out, r4, tokens


def _shingles(col, n=4):
    """Distinct character n-grams (shingles) of lower(text).  Guarded for
    texts shorter than n: F.sequence(1, x) DESCENDS when x < 1 (yielding
    bogus negative substr positions), while the DuckDB range() twin is
    simply empty — so short texts must short-circuit to []."""
    t = F.lower(col)
    return F.when(
        F.length(t) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.length(t) - (n - 1)),
                lambda i: t.substr(i, F.lit(n)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


@register(
    "llm_neardup_ngram",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, length(text) - 2),
                                          i -> substr(lower(text), i, 4))) AS sh
      FROM documents WHERE doc_id < 60
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           round(len(list_intersect(a.sh, b.sh)) * 1.0 /
                 (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 4) AS jac
    FROM d a JOIN d b ON a.doc_id < b.doc_id
    WHERE len(list_intersect(a.sh, b.sh)) * 1.0 /
          (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.35
    """,
)
def llm_neardup_ngram(spark, sf_dir):
    """Character-4-gram (shingle) Jaccard near-duplicate pairs, exact, over
    a probe subset (threshold 0.35 — the synthetic corpus tops out at ~0.41).  (DuckDB's range(1, length-2) generates starts 1..len-3
    — 4-gram starts — matching Spark's sequence(1, len-3).)"""
    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 60)
        .select("doc_id", _shingles(F.col("text")).alias("sh"))
    )
    a = d.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sa"))
    b = d.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sb"))
    inter = F.size(F.array_intersect("sa", "sb"))
    union = F.size("sa") + F.size("sb") - inter
    jac = inter / union
    return (
        a.crossJoin(b)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("jac_raw", jac)
        .filter(F.col("jac_raw") >= 0.35)
        .select("doc_a", "doc_b", r4(F.col("jac_raw")).alias("jac"))
    )


@register(
    "llm_token_bpeish",
    oracle="""
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS BIGINT) AS total_toks,
           round(avg(len(list_distinct(
             regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')))), 4) AS avg_distinct
    FROM documents GROUP BY lang
    """,
)
def llm_token_bpeish(spark, sf_dir):
    """Token counting with a BPE-ish regex (letter runs / digit runs /
    single punctuation) instead of whitespace split — the pre-tokenizer
    shape real BPE pipelines use.  Pattern restricted to shared
    Java-regex/RE2 syntax."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.regexp_extract_all(F.lower("text"), F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), 0)
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(toks)).alias("total_toks"),
        r4(F.avg(F.size(F.array_distinct(toks)))).alias("avg_distinct"),
    )


@register(
    "llm_fingerprint_winnow",
    oracle="""
    SELECT doc_id,
           array_to_string(
             list_sort(list_distinct(list_transform(range(1, length(text) - 6),
                                                    i -> md5(substr(lower(text), i, 8)))))[1:4],
             '|') AS fp
    FROM documents
    """,
)
def llm_fingerprint_winnow(spark, sf_dir):
    """Winnowing-style fingerprint: hash all character 8-gram shingles and
    keep the 4 lexicographically smallest digests — the classic min-sampled
    rolling-shingle document signature (robust to insertions/reorderings,
    unlike a whole-text hash).  md5-based so the oracle reproduces it."""
    # fan_out (optimization r14, guide §2.5): one md5 per character
    # position is pure per-row CPU over a single-split scan.
    d = fan_out(load_table(spark, sf_dir, "documents"))
    t = F.lower("text")
    hashes = F.when(  # guard: sequence() descends for texts shorter than 8
        F.length(t) >= 8,
        F.transform(
            F.sequence(F.lit(1), F.length(t) - 7),
            lambda i: F.md5(t.substr(i, F.lit(8))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return d.select(
        "doc_id",
        F.concat_ws(
            "|", F.slice(F.sort_array(F.array_distinct(hashes)), 1, 4)
        ).alias("fp"),
    )


@register(
    "llm_bm25",
    oracle="""
    WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS tk FROM documents),
    stats AS (SELECT count(*) AS nn, CAST(sum(len(tk)) AS BIGINT) AS sumdl FROM d),
    toks AS (SELECT doc_id, len(tk) AS dl, unnest(tk) AS term FROM d),
    q AS (SELECT doc_id, dl, term, count(*) AS tf FROM toks
          WHERE term IN ('merge', 'window', 'vector') GROUP BY doc_id, dl, term),
    dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks
              WHERE term IN ('merge', 'window', 'vector') GROUP BY term),
    contrib AS (
      SELECT q.doc_id,
             q.term,
             ln((stats.nn - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)
               * (q.tf * 2.2)
               / (q.tf + 1.2 * (0.25 + 0.75 * q.dl * stats.nn / stats.sumdl)) AS c
      FROM q JOIN dfreq USING (term), stats),
    sc AS (
      SELECT doc_id,
             max(CASE WHEN term = 'merge'  THEN c ELSE 0.0 END) AS c1,
             max(CASE WHEN term = 'window' THEN c ELSE 0.0 END) AS c2,
             max(CASE WHEN term = 'vector' THEN c ELSE 0.0 END) AS c3
      FROM contrib GROUP BY doc_id)
    SELECT doc_id, CAST(round(c1 + c2 + c3, 4) AS DOUBLE) AS bm25
    FROM sc ORDER BY round(c1 + c2 + c3, 4) DESC, doc_id LIMIT 20
    """,
)
def llm_bm25(spark, sf_dir):
    """BM25 retrieval scoring (k1=1.2, b=0.75) for a fixed 3-term query —
    the classic lexical ranker a training-data pipeline uses for corpus
    search and decontamination probes.

    Scale shape: terms are filtered to the query vocabulary BEFORE any
    aggregate, so the shuffled intermediates are O(matching postings), not
    O(total tokens); per-term document frequencies and the corpus stats
    (N, total length) are single-row/broadcast joins; the only big shuffle
    is the (doc, term) tf aggregate — partial+final hash agg on the same
    key Spark already uses for tf-idf.

    Determinism: per-term contributions are pivoted to fixed columns and
    summed in a fixed order (c1+c2+c3) so the float result is
    bit-identical across engines regardless of row order; avgdl is kept as
    the exact integer pair (N, sum dl) and applied as dl*N/sumdl inside
    the formula — no early double division to drift.  Top-20 tie-broken by
    doc_id on the ROUNDED score (both sides)."""
    k1, b = 1.2, 0.75
    terms = ["merge", "window", "vector"]
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", tokens("text").alias("tk")
    )
    stats = d.agg(
        F.count("*").alias("nn"), F.sum(F.size("tk")).alias("sumdl")
    )
    toks = d.select(
        "doc_id", F.size("tk").alias("dl"), F.explode("tk").alias("term")
    ).filter(F.col("term").isin(terms))
    q = toks.groupBy("doc_id", "dl", "term").agg(F.count("*").alias("tf"))
    dfreq = toks.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    c = (
        F.log(
            (F.col("nn") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
        )
        * (F.col("tf") * (k1 + 1.0))
        / (
            F.col("tf")
            + k1 * ((1.0 - b) + b * F.col("dl") * F.col("nn") / F.col("sumdl"))
        )
    )
    contrib = (
        q.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", "term", c.alias("c"))
    )
    sc = contrib.groupBy("doc_id").agg(
        *[
            F.max(
                F.when(F.col("term") == t, F.col("c")).otherwise(0.0)
            ).alias(f"c{i + 1}")
            for i, t in enumerate(terms)
        ]
    )
    score = F.round(F.col("c1") + F.col("c2") + F.col("c3"), 4).cast("double")
    return (
        sc.select("doc_id", score.alias("bm25"))
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(20)
    )
