"""Structural invariants of the LLM data-shaping and event-analytics ops —
properties the DuckDB hash-compare cannot express (reconstruction,
monotonicity, cross-op consistency)."""

from __future__ import annotations

from pyspark.sql import functions as F

from biggie_spark.io import load_table
from biggie_spark.ops.llm_text3 import (
    _CHUNK,
    _PACK,
    _STRIDE,
    llm_chunk_overlap,
    llm_decontaminate,
    llm_pack_sequences,
)
from biggie_spark.ops.timeseries import ts_funnel, ts_retention


def test_chunks_reconstruct_documents(spark, sf_dir):
    """Dropping each non-initial chunk's leading overlap and concatenating
    in chunk_idx order must reproduce the original token stream exactly."""
    chunks = llm_chunk_overlap(spark, sf_dir).collect()
    docs = {
        r["doc_id"]: r["text"].lower().split(" ")
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    by_doc: dict[int, list] = {}
    for r in chunks:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(docs)
    overlap = _CHUNK - _STRIDE
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r["chunk_idx"])
        rebuilt: list[str] = []
        for i, r in enumerate(rows):
            toks = r["chunk_text"].split(" ") if r["chunk_text"] else []
            assert r["n_tokens"] == len(toks)
            assert r["n_tokens"] <= _CHUNK
            rebuilt.extend(toks if i == 0 else toks[overlap:])
        assert rebuilt == docs[doc_id], f"doc {doc_id} did not reconstruct"


def test_packing_is_cumulative_layout(spark, sf_dir):
    """Each doc's bin must equal floor(tokens-before-it-in-stream / budget),
    recomputed independently in Python over the (lang, doc_id) order."""
    rows = llm_pack_sequences(spark, sf_dir).collect()
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rs in by_lang.items():
        rs.sort(key=lambda r: r["doc_id"])
        before = 0
        last_bin = 0
        for r in rs:
            assert r["bin"] == before // _PACK, (lang, r["doc_id"])
            assert r["bin"] >= last_bin  # bins grow monotonically
            last_bin = r["bin"]
            before += r["n_tokens"]


def test_decontamination_flags_are_witnessed(spark, sf_dir):
    """Every contaminated=true doc must actually share a 5-token shingle
    with the eval source; a sample of clean docs must not."""
    from biggie_spark.ops.llm_text3 import _DECON_K

    flags = {r["doc_id"]: r["contaminated"] for r in llm_decontaminate(spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()

    def shingles(text):
        tk = text.lower().split(" ")
        return {
            " ".join(tk[i : i + _DECON_K]) for i in range(len(tk) - _DECON_K + 1)
        }

    eval_sh = set()
    for r in docs:
        if r["source"] == "src0":
            eval_sh |= shingles(r["text"])
    train = [r for r in docs if r["source"] != "src0"]
    assert set(flags) == {r["doc_id"] for r in train}
    clean_checked = 0
    for r in train:
        overlaps = bool(shingles(r["text"]) & eval_sh)
        if flags[r["doc_id"]]:
            assert overlaps, f"doc {r['doc_id']} flagged without witness"
        elif clean_checked < 25:
            assert not overlaps, f"doc {r['doc_id']} clean but overlaps"
            clean_checked += 1


def test_funnel_partitions_all_users(spark, sf_dir):
    """Funnel stages partition the user population: stage counts sum to the
    number of distinct users, and every stage count is non-negative."""
    rows = ts_funnel(spark, sf_dir).collect()
    n_users = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id")
        .distinct()
        .count()
    )
    assert sum(r["n_users"] for r in rows) == n_users
    assert all(0 <= r["funnel_stage"] <= 3 for r in rows)


def test_retention_day_zero_equals_cohort_size(spark, sf_dir):
    """Offset-0 retention equals cohort size (every user is active on their
    own first day), and offsets are never negative."""
    rows = ts_retention(spark, sf_dir).collect()
    day0 = {r["cohort_day"]: r["n_users"] for r in rows if r["offset_days"] == 0}
    cohort_sizes = {
        r["cohort_day"]: r["n"]
        for r in (
            load_table(spark, sf_dir, "events")
            .select(
                "user_id",
                F.date_trunc("day", F.col("ts")).cast("date").alias("d"),
            )
            .groupBy("user_id")
            .agg(F.min("d").alias("cohort_day"))
            .groupBy("cohort_day")
            .agg(F.count("*").alias("n"))
            .collect()
        )
    }
    assert day0 == cohort_sizes
    assert all(r["offset_days"] >= 0 for r in rows)
