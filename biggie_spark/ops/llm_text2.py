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
from biggie_spark.util import r4


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
    d = load_table(spark, sf_dir, "documents")
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
