"""Distributed BPE merge training — the real tokenizer-building loop, not a
regex approximation (complements `llm_token_bpeish`, which only *applies* a
BPE-shaped segmentation).

Byte-pair encoding training is: count adjacent token-pair frequencies over
the corpus vocabulary (weighted by word frequency), merge the most frequent
pair everywhere, repeat.  Each iteration here is two hash aggregates
(vocab is tiny relative to the corpus — the corpus-sized work is the ONE
word-frequency aggregate up front) plus a broadcast of the single winning
pair; the merge itself is a string rewrite executed JVM-side with
``F.replace`` — no Python in the loop, no driver-side collect (the winning
pair rides as a broadcast 1-row frame, exactly like tf-idf's corpus-N).

Determinism/oracle: words are represented as space-separated symbol
strings with sentinel spaces (`' a b c '`); a merge is
``replace(rep, ' x y ', ' xy ')`` applied 4×.  Note this is NOT the
canonical greedy BPE merge on self-overlapping runs: for `'a a a a'` a
left-to-right non-overlapping replace yields `'aa aa'` on the first pass
but `'a a a a a'` (odd run) leaves a straggler whose placement alternates
across passes, so segmentation of repeated-symbol runs can diverge from a
reference BPE implementation.  What the 4 passes DO guarantee is a
deterministic fixpoint of the *non-overlapping* rewrite for words ≤32
symbols (runs at least halve each pass), and both engines' ``replace``
scans left-to-right non-overlapping (verified), so Spark and the DuckDB
oracle apply byte-identical semantics; ties break on (weight DESC,
pair ASC).

At 100 TB: the per-iteration aggregates run over the VOCABULARY (|V| words,
millions at web scale — still thousands of times smaller than the corpus),
so K merge steps cost K small shuffles after one corpus-sized count.  This
is the standard distributed BPE shape (word-counts once, then vocab-local
iterations)."""

from __future__ import annotations

from pyspark.sql import functions as F

from biggie_spark.io import load_table
from biggie_spark.registry import register
from biggie_spark.util import lineage_cap, tokens

N_MERGES = 3
N_PASSES = 4  # replace passes per merge; fixpoint for words <= 32 symbols


def _sql_rep_merge(rep_expr: str, step: int) -> str:
    """DuckDB: apply merge `step`'s winning pair to `rep_expr`, N_PASSES x."""
    pat = f"' ' || (SELECT pr FROM t{step}) || ' '"
    rpl = f"' ' || replace((SELECT pr FROM t{step}), ' ', '') || ' '"
    out = rep_expr
    for _ in range(N_PASSES):
        out = f"replace({out}, {pat}, {rpl})"
    return out


def _sql_pair_counts(rep_table: str) -> str:
    return f"""
      SELECT pr, CAST(sum(freq) AS BIGINT) AS weight FROM (
        SELECT unnest(list_transform(range(1, len(tk)),
                                     i -> tk[i] || ' ' || tk[i+1])) AS pr,
               freq
        FROM (SELECT string_split(trim(rep), ' ') AS tk, freq FROM {rep_table})
      ) GROUP BY pr"""


def _bpe_oracle() -> str:
    ctes = [
        """w AS (
          SELECT tok AS w, count(*) AS freq
          FROM (SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents)
          WHERE tok <> '' GROUP BY tok)""",
        """r0 AS (
          SELECT ' ' || regexp_replace(w, '(.)', '\\1 ', 'g') AS rep, freq FROM w)""",
    ]
    selects = []
    for k in range(N_MERGES):
        ctes.append(f"p{k} AS ({_sql_pair_counts(f'r{k}')})")
        ctes.append(
            f"t{k} AS (SELECT pr, weight FROM p{k} ORDER BY weight DESC, pr LIMIT 1)"
        )
        if k + 1 < N_MERGES:
            ctes.append(
                f"r{k + 1} AS (SELECT {_sql_rep_merge('rep', k)} AS rep, freq FROM r{k})"
            )
        selects.append(
            f"SELECT {k} AS step, pr AS pair, replace(pr, ' ', '') AS merged,"
            f" weight FROM t{k}"
        )
    return (
        "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL ".join(selects)
        + "\nORDER BY step"
    )


@register("llm_bpe_train", oracle=_bpe_oracle())
def llm_bpe_train(spark, sf_dir):
    """Train the first N_MERGES BPE merge rules over the document corpus;
    output one row per learned rule: (step, pair, merged, weight)."""
    d = load_table(spark, sf_dir, "documents")
    w = (
        d.select(F.explode(tokens("text")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
    )
    words = w.select(
        F.concat(F.lit(" "), F.regexp_replace("w", "(.)", "$1 ")).alias("rep"),
        "freq",
    )

    rules = []
    for k in range(N_MERGES):
        tk = F.split(F.trim(F.col("rep")), " ")
        bigrams = F.when(
            F.size(tk) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(tk) - 1),
                lambda i: F.concat(
                    F.element_at(tk, i), F.lit(" "), F.element_at(tk, i + 1)
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
        top1 = (
            words.select(F.explode(bigrams).alias("pair"), "freq")
            .groupBy("pair")
            .agg(F.sum("freq").alias("weight"))
            .orderBy(F.col("weight").desc(), "pair")
            .limit(1)
            # materialize the 1-row winner: without this each appended rule
            # AND the next iteration's vocab replay the whole aggregate
            # chain back to the scan (lineage grows per merge step)
            .transform(lineage_cap)
        )
        rules.append(
            top1.select(
                F.lit(k).alias("step"),
                "pair",
                F.replace(F.col("pair"), F.lit(" "), F.lit("")).alias("merged"),
                "weight",
            )
        )
        if k + 1 < N_MERGES:
            merged_words = words.crossJoin(
                F.broadcast(top1.select(F.col("pair").alias("_mp")))
            )
            rep = F.col("rep")
            pat = F.concat(F.lit(" "), F.col("_mp"), F.lit(" "))
            rpl = F.concat(
                F.lit(" "),
                F.replace(F.col("_mp"), F.lit(" "), F.lit("")),
                F.lit(" "),
            )
            for _ in range(N_PASSES):
                rep = F.replace(rep, pat, rpl)
            # keep the vocab lineage one step deep (same pattern as the IVF
            # training loop) — the vocab is |V| rows, tiny vs the corpus
            words = merged_words.select(rep.alias("rep"), "freq").transform(lineage_cap)

    out = rules[0]
    for r in rules[1:]:
        out = out.unionByName(r)
    return out.orderBy("step")


def _bpe_apply_oracle() -> str:
    """Like the train oracle, but CTEs carry the source word and one final
    merge (rule K-1) is applied; output = segmentation of the 20 most
    frequent words."""
    ctes = [
        """w AS (
          SELECT tok AS w, count(*) AS freq
          FROM (SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents)
          WHERE tok <> '' GROUP BY tok)""",
        """r0 AS MATERIALIZED (
          SELECT w, ' ' || regexp_replace(w, '(.)', '\\1 ', 'g') AS rep, freq FROM w)""",
    ]
    for k in range(N_MERGES):
        ctes.append(f"p{k} AS ({_sql_pair_counts(f'r{k}')})")
        ctes.append(
            f"t{k} AS (SELECT pr, weight FROM p{k} ORDER BY weight DESC, pr LIMIT 1)"
        )
        ctes.append(
            f"r{k + 1} AS MATERIALIZED (SELECT w, {_sql_rep_merge('rep', k)} AS rep, freq FROM r{k})"
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
    SELECT w, CAST(freq AS BIGINT) AS freq, trim(rep) AS segmented,
           CAST(len(string_split(trim(rep), ' ')) AS INT) AS n_pieces
    FROM r{N_MERGES} ORDER BY freq DESC, w LIMIT 20"""
    )


@register("llm_bpe_apply", oracle=_bpe_apply_oracle())
def llm_bpe_apply(spark, sf_dir):
    """Apply the N_MERGES learned merge rules to the vocabulary and emit the
    segmentation of the 20 most frequent words — the tokenizer-inference
    half of llm_bpe_train (same broadcast-rule, JVM-side replace loop; the
    training aggregates rerun here because each op is a self-contained
    query).  Output: (w, freq, segmented, n_pieces)."""
    d = load_table(spark, sf_dir, "documents")
    w = (
        d.select(F.explode(tokens("text")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
    )
    words = w.select(
        "w",
        F.concat(F.lit(" "), F.regexp_replace("w", "(.)", "$1 ")).alias("rep"),
        "freq",
    )
    for _k in range(N_MERGES):
        tk = F.split(F.trim(F.col("rep")), " ")
        bigrams = F.when(
            F.size(tk) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(tk) - 1),
                lambda i: F.concat(
                    F.element_at(tk, i), F.lit(" "), F.element_at(tk, i + 1)
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
        top1 = (
            words.select(F.explode(bigrams).alias("pair"), "freq")
            .groupBy("pair")
            .agg(F.sum("freq").alias("weight"))
            .orderBy(F.col("weight").desc(), "pair")
            .limit(1)
            .transform(lineage_cap)  # 1-row winner; see llm_bpe_train
        )
        merged_words = words.crossJoin(
            F.broadcast(top1.select(F.col("pair").alias("_mp")))
        )
        rep = F.col("rep")
        pat = F.concat(F.lit(" "), F.col("_mp"), F.lit(" "))
        rpl = F.concat(
            F.lit(" "), F.replace(F.col("_mp"), F.lit(" "), F.lit("")), F.lit(" ")
        )
        for _ in range(N_PASSES):
            rep = F.replace(rep, pat, rpl)
        words = merged_words.select("w", rep.alias("rep"), "freq").transform(lineage_cap)
    seg = F.trim(F.col("rep"))
    return (
        words.select(
            "w",
            "freq",
            seg.alias("segmented"),
            F.size(F.split(seg, " ")).alias("n_pieces"),
        )
        .orderBy(F.col("freq").desc(), "w")
        .limit(20)
    )
