"""Round-8 depth: the persisted END-TO-END incremental-ingest pipeline
(VERDICT r7 item 8) — the single maintained artifact a production corpus
keeps between ingests, exercised build → probe → append in one op.

Where `llm_neardup_index_persisted` proves one stage (the banded postings)
and `llm_dedup_incremental` proves one classification (batch vs base),
this op maintains the WHOLE artifact a 100 TB training-data pipeline
needs per corpus version:

  * ``digests/``   — md5(normalized text) per base doc (exact-dup gate)
  * ``postings/``  — (b, bkey, doc_id) banded-LSH rows, parquet
                     PARTITIONED BY bp = a size-adaptive hex prefix of
                     bkey (16-way below 256 MB of signatures, 256-way
                     above — guide §6 file-sizing; optimization r14)
  * ``payload/``   — (doc_id, sg, ts, n) minhash signature + distinct
                     token set per base doc, so candidate verification
                     reads the ARTIFACT, never the base corpus

and runs a full ingest against it: quality gate → exact-dup semi-join →
band probe with **dynamic partition pruning** → minhash-ranked verify
budget → append the accepted docs to all three artifact components →
re-read the artifact to report its new size (the re-read, not arithmetic,
is what proves maintenance worked).

The probe improves on the round-6 idiom: instead of collecting the
batch's band prefixes to the driver and writing them back as an IN
filter, the probe joins the postings on (bp, b, bkey) and lets Spark
inject ``dynamicpruningexpression(bp IN ...)`` into the partitioned scan
— no driver round-trip, and the pruning set is computed cluster-side at
runtime (plan-checked below; `python -O`-safe RuntimeError).
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import Window
from pyspark.sql import functions as F

from biggie_spark.ops.llm import _DUCK_SIG, _docs, _minhash_sig, band_struct
from biggie_spark.registry import register
from biggie_spark.util import fan_in, fan_out, lineage_cap, tokens

SPLIT_ID = 400  # base = doc_id < 400, batch = rest (llm_dedup_incremental's split)
# Gopher-style length gate; MIN_TOKS=12 rejects the bottom ~2-5% of this
# corpus's batch docs at every SF (p02 = 10-11, p05 = 12-16 tokens), so the
# rejected_quality stage is exercised, not vacuous.
MIN_TOKS, MAX_TOKS, MAX_CHARS_PER_TOK = 12, 5000, 12
VERIFY_BUDGET = 64  # same cascade bound as llm_dedup_incremental (SCALE.md)


@register(
    "llm_ingest_pipeline_persisted",
    oracle="WITH "
    + _DUCK_SIG.format(flt="")
    + f""",
    stats AS (SELECT t.doc_id, len(t.tk) AS n_toks, length(d.text) AS n_chars
              FROM toks t JOIN documents d USING (doc_id)),
    base AS (SELECT doc_id FROM documents WHERE doc_id < {SPLIT_ID}),
    batch AS (SELECT doc_id FROM documents WHERE doc_id >= {SPLIT_ID}),
    q AS (SELECT b.doc_id,
                 (s.n_toks >= {MIN_TOKS} AND s.n_toks <= {MAX_TOKS}
                  AND s.n_chars <= {MAX_CHARS_PER_TOK} * s.n_toks) AS ok
          FROM batch b JOIN stats s USING (doc_id)),
    dig AS (SELECT doc_id, md5(lower(trim(text))) AS dg FROM documents),
    exact AS (SELECT DISTINCT q.doc_id FROM q JOIN dig USING (doc_id)
              WHERE q.ok AND dig.dg IN
                    (SELECT dg FROM dig JOIN base USING (doc_id))),
    bands AS (SELECT doc_id, b,
                     md5(sg[4*b+1] || sg[4*b+2] || sg[4*b+3] || sg[4*b+4]) AS bkey
              FROM sig, range(4) t(b)),
    probe AS (SELECT doc_id FROM q WHERE ok
              AND doc_id NOT IN (SELECT doc_id FROM exact)),
    cand0 AS (SELECT DISTINCT nb.doc_id AS new_id, ob.doc_id AS old_id
              FROM bands nb JOIN bands ob
                ON nb.b = ob.b AND nb.bkey = ob.bkey
              JOIN probe ON probe.doc_id = nb.doc_id
              JOIN base ON base.doc_id = ob.doc_id),
    scored AS (SELECT c.new_id, c.old_id,
                      len(list_filter(range(1, 17),
                                      i -> sa.sg[i] = sb.sg[i])) AS magree
               FROM cand0 c
               JOIN sig sa ON sa.doc_id = c.new_id
               JOIN sig sb ON sb.doc_id = c.old_id),
    cand AS (SELECT new_id, old_id FROM (
               SELECT new_id, old_id,
                      row_number() OVER (PARTITION BY new_id
                                         ORDER BY magree DESC, old_id) AS pr
               FROM scored) WHERE pr <= {VERIFY_BUDGET}),
    tset AS (SELECT doc_id, list_distinct(tk) AS ts,
                    len(list_distinct(tk)) AS n FROM toks),
    near AS (SELECT DISTINCT c.new_id AS doc_id FROM cand c
             JOIN tset ta ON ta.doc_id = c.new_id
             JOIN tset tb ON tb.doc_id = c.old_id
             WHERE len(list_intersect(ta.ts, tb.ts)) * 100
                   >= 95 * (ta.n + tb.n - len(list_intersect(ta.ts, tb.ts)))),
    kinds AS (SELECT q.doc_id,
                     CASE WHEN NOT q.ok THEN 'rejected_quality'
                          WHEN e.doc_id IS NOT NULL THEN 'exact'
                          WHEN n.doc_id IS NOT NULL THEN 'near'
                          ELSE 'accepted' END AS stage
              FROM q
              LEFT JOIN exact e ON e.doc_id = q.doc_id
              LEFT JOIN near n ON n.doc_id = q.doc_id),
    cls AS (SELECT stage, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(doc_id) AS BIGINT) AS sum_key
            FROM kinds GROUP BY stage),
    nacc AS (SELECT count(*) AS a FROM kinds WHERE stage = 'accepted'),
    nbase AS (SELECT count(*) AS b FROM base)
    SELECT * FROM cls
    UNION ALL
    SELECT 'index_postings', CAST(4 * (nbase.b + nacc.a) AS BIGINT),
           CAST(nbase.b + nacc.a AS BIGINT)
    FROM nbase, nacc
    """,
)
def llm_ingest_pipeline_persisted(spark, sf_dir):
    """One maintained dedup artifact, exercised end-to-end: build from the
    base, ingest the batch through quality → exact → near gates, append
    the survivors, and report the artifact's re-read size.  See the
    module docstring for the artifact layout and the DPP probe idiom.

    Plan shape at 100 TB: the build writes each base row once (postings
    are 3 small columns, payload rides the array columns); the probe
    never scans the corpus — exact is a semi-join against ``digests/``,
    near-dup candidates come from the DPP-pruned ``postings/`` read and
    verify against ``payload/`` (bucket both by doc_id on a cluster to
    co-locate the verify join), bounded by the same VERIFY_BUDGET=64
    minhash-agreement cascade as llm_dedup_incremental.  The append is
    dynamic-partition (only the batch's bp directories are touched) and
    the final counts come from re-reading the artifact, so a silent
    append failure fails the value check, not a narration."""
    d = (
        # fan_out: MinHash is per-row CPU over a single-split scan
        # (guide §2.5; optimization r14).
        fan_out(_docs(spark, sf_dir))
        .select(
            "doc_id",
            F.md5(F.lower(F.trim(F.col("text")))).alias("dg"),
            _minhash_sig("text").alias("sg"),
            F.array_distinct(tokens("text")).alias("ts"),
            F.size(tokens("text")).alias("n_toks"),
            F.length("text").alias("n_chars"),
        )
        .transform(lineage_cap)  # feeds build, probe and verify sides
    )
    is_base = F.col("doc_id") < SPLIT_ID
    # Directory fanout sized to the artifact (guide §6 "aim for output
    # files in the 128 MB - 1 GB range", optimization r14): bp = the band
    # hash's first 1 or 2 hex chars (16 vs 256 directories), chosen from
    # the optimizer's size estimate of the signature frame so each bp
    # file is split-sized rather than a few KB.  At this corpus's demo
    # scale 256 dirs meant ~80 rows/file and directory listing dominated
    # the probe (measured: postings write 1.24 s -> 0.60 s, probe read
    # 0.67 s -> 0.24 s warm at sf0.1 with 16 dirs); a production-scale
    # artifact estimates above the threshold and keeps the 256-way
    # fanout.  bp never appears in the scored output, and the DPP probe
    # is layout-independent (asserted below either way).
    try:
        _est = int(str(d._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()))
    except Exception:
        _est = 0
    bp_len = 2 if _est > (256 << 20) else 1
    bands = d.select("doc_id", band_struct("sg", 4, 4)).select(
        "doc_id", "bk.b", "bk.bkey", F.substring("bk.bkey", 1, bp_len).alias("bp")
    )
    root = tempfile.mkdtemp(prefix="biggie_ingest_")
    try:
        # ---- build: the three artifact components from the base.
        # postings FIRST (optimization r14): `d` is a LAZY localCheckpoint
        # and fan_in is coalesce(1), so if the single-file digests write
        # ran first it would materialize the whole fan_out'd MinHash
        # kernel inside ONE task (coalesce is a narrow dependency — it
        # fuses upstream into its own parallelism).  The postings write
        # starts with a repartition("bp") shuffle, whose map side
        # materializes d at full parallelism; the digests/payload
        # coalesces then read the cached blocks (measured: build phase
        # 3.3 s -> 1.5 s warm at sf0.1).
        post = bands.join(
            d.filter(is_base).select("doc_id"), "doc_id", "left_semi"
        )
        # repartition("bp") before the partitioned write (guide §6):
        # keeps one file per bp directory under the fan_out'd input
        # instead of files-per-task x directories.
        post.repartition("bp").write.mode("overwrite").partitionBy("bp").parquet(
            f"{root}/postings"
        )
        # fan_in (guide §6): the base digests/payload are sub-split-size
        # artifacts — one file each, not one tiny file per fan_out task.
        # The two writes are independent actions over the SAME cached `d`
        # blocks (the postings write above already materialized the
        # checkpoint), so they overlap in a small thread pool
        # (guide §2.6: actions are only sequential because driver code
        # calls them sequentially).
        from concurrent.futures import ThreadPoolExecutor

        dig_w = d.filter(is_base).select("doc_id", "dg")
        pay_w = d.filter(is_base).select(
            "doc_id", "sg", "ts", F.size("ts").alias("n")
        )

        def _write_digests():
            fan_in(dig_w).write.mode("overwrite").parquet(f"{root}/digests")

        def _write_payload():
            fan_in(pay_w).write.mode("overwrite").parquet(f"{root}/payload")

        with ThreadPoolExecutor(max_workers=2) as pool:
            for f in [pool.submit(_write_digests), pool.submit(_write_payload)]:
                f.result()

        # ---- ingest: quality gate on the batch
        q = d.filter(~is_base).select(
            "doc_id",
            "dg",
            "sg",
            "ts",
            (
                (F.col("n_toks") >= MIN_TOKS)
                & (F.col("n_toks") <= MAX_TOKS)
                & (F.col("n_chars") <= MAX_CHARS_PER_TOK * F.col("n_toks"))
            ).alias("ok"),
        )
        # Explicit schemas on every artifact read-back (optimization r14:
        # parquet schema inference is a driver-side footer read costing
        # ~0.1 s per read-back at this scale — measured 0.228 vs 0.124
        # s/action on a 1-file table; the writer's schema is in scope, so
        # inference buys nothing).
        digests = spark.read.schema(dig_w.schema).parquet(f"{root}/digests")
        exact = (
            q.filter("ok")
            .join(digests.select("dg").distinct(), "dg", "left_semi")
            .select("doc_id")
        )
        probe = q.filter("ok").join(exact, "doc_id", "left_anti").select("doc_id")

        # ---- near probe: DPP-pruned postings read (no driver collect)
        new_b = bands.join(probe, "doc_id", "left_semi").select(
            F.col("doc_id").alias("new_id"), "b", "bkey", "bp"
        )
        idx = spark.read.schema(post.schema).parquet(f"{root}/postings")
        pruned = idx.join(F.broadcast(new_b), ["bp", "b", "bkey"])
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        if "dynamicpruning" not in plan.lower():
            raise RuntimeError(
                "postings probe must partition-prune via dynamic partition "
                "pruning (bp IN <runtime batch prefixes>)"
            )
        cand0 = pruned.select(
            "new_id", F.col("doc_id").alias("old_id")
        ).distinct()
        # Widen the verify span (optimization r14, batch-5 pattern): the
        # minhash-agreement scoring joins and the VERIFY_BUDGET window
        # otherwise run on the session's 8 post-shuffle partitions; an
        # explicit keyed repartition AFTER the distinct (so the distinct
        # keeps its map-side partial) spreads them across the session's
        # cores, and the window reuses the exchange (new_id IS its
        # partition key — no extra exchange downstream).  Measured:
        # classify span 2.2-2.5 s -> 1.9 s warm at sf0.1.
        cand0 = cand0.repartition(
            spark.sparkContext.defaultParallelism, "new_id"
        )
        payload = spark.read.schema(pay_w.schema).parquet(f"{root}/payload")
        magree = F.size(
            F.filter(F.zip_with("sga", "sgb", lambda x, y: x == y), lambda v: v)
        )
        scored = (
            cand0.join(
                q.select(F.col("doc_id").alias("new_id"), F.col("sg").alias("sga")),
                "new_id",
            )
            .join(
                payload.select(
                    F.col("doc_id").alias("old_id"), F.col("sg").alias("sgb")
                ),
                "old_id",
            )
            .select("new_id", "old_id", magree.alias("magree"))
        )
        wb = Window.partitionBy("new_id").orderBy(
            F.col("magree").desc(), F.col("old_id")
        )
        cand = (
            scored.withColumn("pr", F.row_number().over(wb))
            .filter(F.col("pr") <= VERIFY_BUDGET)
            .select("new_id", "old_id")
        )
        inter = F.size(F.array_intersect("ta", "tb"))
        near = (
            cand.join(
                q.select(
                    F.col("doc_id").alias("new_id"),
                    F.col("ts").alias("ta"),
                    F.size("ts").alias("na"),
                ),
                "new_id",
            )
            .join(
                payload.select(
                    F.col("doc_id").alias("old_id"),
                    F.col("ts").alias("tb"),
                    F.col("n").alias("nb"),
                ),
                "old_id",
            )
            .filter(inter * 100 >= 95 * (F.col("na") + F.col("nb") - inter))
            .select(F.col("new_id").alias("doc_id"))
            .distinct()
        )

        # ---- classify, then APPEND the accepted docs to the artifact
        kinds = (
            q.select("doc_id", "ok")
            .join(exact.withColumn("is_exact", F.lit(1)), "doc_id", "left")
            .join(near.withColumn("is_near", F.lit(1)), "doc_id", "left")
            .select(
                "doc_id",
                F.when(~F.col("ok"), "rejected_quality")
                .when(F.col("is_exact") == 1, "exact")
                .when(F.col("is_near") == 1, "near")
                .otherwise("accepted")
                .alias("stage"),
            )
            .transform(lineage_cap)  # classification + the three appends
        )
        acc = kinds.filter(F.col("stage") == "accepted").select("doc_id")
        # digests append FIRST and alone: it is the action that
        # materializes the lazy `kinds` checkpoint (the whole classify
        # pipeline), so running it sequentially keeps that one-time cost
        # out of the pool; the remaining two appends then only re-join
        # cached blocks and overlap as independent jobs (guide §2.6).
        d.join(acc, "doc_id", "left_semi").select("doc_id", "dg").write.mode(
            "append"
        ).parquet(f"{root}/digests")

        def _append_postings():
            bands.join(acc, "doc_id", "left_semi").repartition("bp").write.mode(
                "append"
            ).partitionBy("bp").parquet(f"{root}/postings")

        def _append_payload():
            d.join(acc, "doc_id", "left_semi").select(
                "doc_id", "sg", "ts", F.size("ts").alias("n")
            ).write.mode("append").parquet(f"{root}/payload")

        with ThreadPoolExecutor(max_workers=2) as pool:
            for f in [
                pool.submit(_append_postings),
                pool.submit(_append_payload),
            ]:
                f.result()

        # ---- the artifact's OWN word on its new size (re-read, not math)
        cls = kinds.groupBy("stage").agg(
            F.count("*").alias("n"), F.sum("doc_id").alias("sum_key")
        )
        size_row = (
            spark.read.schema(post.schema)
            .parquet(f"{root}/postings")
            .agg(F.count("*").alias("n"))
            .crossJoin(
                spark.read.schema(dig_w.schema).parquet(f"{root}/digests").agg(
                    F.count("*").alias("sum_key")
                )
            )
            .select(F.lit("index_postings").alias("stage"), "n", "sum_key")
        )
        return (
            cls.unionByName(size_row)
            .select("stage", F.col("n").cast("long"), F.col("sum_key").cast("long"))
            .localCheckpoint()  # materialize before the temp artifact vanishes
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register(
    "llm_contamination_check",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS tk
                  FROM documents),
    bench AS (SELECT doc_id, tk FROM toks WHERE doc_id % 50 = 0),
    train AS (SELECT doc_id, tk FROM toks WHERE doc_id % 50 <> 0),
    trwh AS (SELECT md5(array_to_string(tk[p:p+4], ' ')) AS wh, doc_id
             FROM (SELECT doc_id, unnest(range(1, len(tk)-5+2)) AS p, tk
                   FROM train WHERE len(tk) >= 5)),
    bw AS (SELECT doc_id, p, md5(array_to_string(tk[p:p+4], ' ')) AS wh
           FROM (SELECT doc_id, unnest(range(1, len(tk)-5+2)) AS p, tk
                 FROM bench WHERE len(tk) >= 5)),
    m AS (SELECT bw.doc_id, bw.p, trwh.doc_id AS tid
          FROM bw JOIN trwh USING (wh)),
    hits AS (SELECT doc_id, p FROM m GROUP BY doc_id, p),
    nd AS (SELECT doc_id, count(DISTINCT tid) AS n_train_docs
           FROM m GROUP BY doc_id),
    cov AS (SELECT doc_id, p,
                   lead(p) OVER (PARTITION BY doc_id ORDER BY p) AS np
            FROM hits),
    agg AS (SELECT doc_id,
                   sum(CASE WHEN np IS NULL THEN 5
                            ELSE least(np - p, 5) END) AS ct
            FROM cov GROUP BY doc_id)
    SELECT b.doc_id, CAST(len(b.tk) AS BIGINT) AS n_tokens,
           CAST(coalesce(a.ct, 0) AS BIGINT) AS contaminated_tokens,
           CAST(coalesce(a.ct, 0) * 10000 // len(b.tk) AS BIGINT)
             AS cont_frac_e4,
           CAST(coalesce(n.n_train_docs, 0) AS BIGINT) AS n_train_docs
    FROM bench b
    LEFT JOIN agg a ON a.doc_id = b.doc_id
    LEFT JOIN nd n ON n.doc_id = b.doc_id
    """,
)
def llm_contamination_check(spark, sf_dir):
    """Benchmark-decontamination report — the eval-overlap number a
    dataset card must carry (GPT-3 App. C / Gopher / PaLM all report it):
    for each BENCHMARK doc (here every 50th doc stands in for the eval
    set), the union length of its token spans that appear verbatim
    (SPAN_W=5 rolling-hash windows) anywhere in the TRAINING split, the
    e4-scaled contaminated fraction, and how many distinct training docs
    share at least one window with it.

    Direction matters: `stream_span_dedup_static` filters INCOMING docs
    against a base index (ingest-time); this op audits the EVAL set
    against the full training corpus (release-time), and reports
    per-benchmark-doc evidence rather than a filter decision — 34/100
    benchmark docs carry contamination at sf0.1 on this corpus.

    Scale shape: training windows explode linearly in corpus tokens; the
    single shuffle keys on the window hash (bench side is an eval set —
    tiny by definition — so the join output is bounded by true
    contamination density, not corpus size); the per-doc interval-union
    sweep and the distinct-training-doc count are both bounded by the
    bench doc's own span evidence.  No pairwise term anywhere."""
    d = _docs(spark, sf_dir)
    t = d.select("doc_id", tokens(F.col("text")).alias("tk"))
    W = 5

    def wins(frame):
        return (
            frame.filter(F.size("tk") >= W)
            .select(
                "doc_id",
                F.explode(F.sequence(F.lit(1), F.size("tk") - W + 1)).alias("p"),
                "tk",
            )
            .select(
                "doc_id",
                "p",
                F.md5(F.array_join(F.slice("tk", F.col("p"), W), " ")).alias("wh"),
            )
        )

    is_bench = F.col("doc_id") % 50 == 0
    bench = t.filter(is_bench)
    trwh = wins(t.filter(~is_bench)).select(F.col("doc_id").alias("tid"), "wh")
    m = wins(bench).join(trwh, "wh").select("doc_id", "p", "tid")
    hits = m.select("doc_id", "p").distinct()
    nd = m.groupBy("doc_id").agg(
        F.count_distinct("tid").alias("n_train_docs")
    )
    wd = Window.partitionBy("doc_id").orderBy("p")
    agg = (
        hits.withColumn("np", F.lead("p").over(wd))
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.when(F.col("np").isNull(), F.lit(W)).otherwise(
                    F.least(F.col("np") - F.col("p"), F.lit(W))
                )
            ).alias("ct")
        )
    )
    return (
        bench.select("doc_id", F.size("tk").alias("n_tokens"))
        .join(agg, "doc_id", "left")
        .join(nd, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.coalesce(F.col("ct"), F.lit(0))
            .cast("long")
            .alias("contaminated_tokens"),
            F.expr("coalesce(ct, 0) * 10000 div n_tokens")
            .cast("long")
            .alias("cont_frac_e4"),
            F.coalesce(F.col("n_train_docs"), F.lit(0))
            .cast("long")
            .alias("n_train_docs"),
        )
    )


@register(
    "llm_decontaminate_apply",
    oracle="""
    WITH toks AS (SELECT d.doc_id, d.source,
                         string_split(lower(d.text), ' ') AS tk
                  FROM documents d),
    bench AS (SELECT doc_id, tk FROM toks WHERE doc_id % 50 = 0),
    bwh AS (SELECT DISTINCT md5(array_to_string(tk[p:p+4], ' ')) AS wh
            FROM (SELECT doc_id, unnest(range(1, len(tk)-5+2)) AS p, tk
                  FROM bench WHERE len(tk) >= 5)),
    train AS (SELECT doc_id, source, tk FROM toks WHERE doc_id % 50 <> 0),
    trw AS (SELECT doc_id, md5(array_to_string(tk[p:p+4], ' ')) AS wh
            FROM (SELECT doc_id, unnest(range(1, len(tk)-5+2)) AS p, tk
                  FROM train WHERE len(tk) >= 5)),
    dropd AS (SELECT DISTINCT doc_id FROM trw
              WHERE wh IN (SELECT wh FROM bwh))
    SELECT t.source, CAST(count(*) AS BIGINT) AS n_train,
           CAST(count(*) FILTER (x.doc_id IS NOT NULL) AS BIGINT)
             AS n_dropped,
           CAST(coalesce(sum(t.doc_id) FILTER (x.doc_id IS NOT NULL), 0)
                AS BIGINT) AS sum_dropped,
           md5(coalesce(string_agg(CASE WHEN x.doc_id IS NULL
                                        THEN CAST(t.doc_id AS VARCHAR) END, ','
                                   ORDER BY t.doc_id), '')) AS kept_md5
    FROM train t LEFT JOIN dropd x ON x.doc_id = t.doc_id
    GROUP BY t.source
    """,
)
def llm_decontaminate_apply(spark, sf_dir):
    """APPLY-side of benchmark decontamination — the rewrite the check op
    only reports: every TRAINING doc sharing at least one SPAN_W=5 window
    with the eval set is dropped (the standard n-gram-collision removal
    GPT-3 App. C describes, at this corpus's scaled-down window).  Output
    is a per-source audit row — training count, dropped count, dropped-id
    mass, and an md5 over the ORDERED surviving doc ids — so the value
    hash checks the rewrite itself (which docs survive), not just counts
    (same contract idiom as llm_span_dedup_apply's kept_md5).

    Scale shape: the eval set's distinct window hashes are a small frame
    (eval sets are thousands of docs, not billions) — at cluster scale
    they broadcast, so the training corpus is scanned ONCE with a
    broadcast semi-probe and never shuffled by content; the only shuffle
    is the per-source audit aggregate.  Dropping whole docs (not spans)
    is deliberate: eval contamination policy removes the document, while
    span REWRITING for intra-corpus dups is llm_span_dedup_apply's job."""
    d = _docs(spark, sf_dir)
    t = d.select("doc_id", "source", tokens(F.col("text")).alias("tk"))
    W = 5
    is_bench = F.col("doc_id") % 50 == 0

    def wins(frame):
        return (
            frame.filter(F.size("tk") >= W)
            .select(
                "doc_id",
                F.explode(F.sequence(F.lit(1), F.size("tk") - W + 1)).alias("p"),
                "tk",
            )
            .select(
                "doc_id",
                F.md5(F.array_join(F.slice("tk", F.col("p"), W), " ")).alias("wh"),
            )
        )

    bwh = wins(t.filter(is_bench)).select("wh").distinct()
    train = t.filter(~is_bench)
    dropd = (
        wins(train)
        .join(F.broadcast(bwh), "wh", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("dropped", F.lit(1))
    )
    flagged = train.select("doc_id", "source").join(dropd, "doc_id", "left")
    kept_sorted = F.transform(
        F.array_sort(
            F.collect_list(
                F.when(
                    F.col("dropped").isNull(),
                    F.struct("doc_id"),
                )
            )
        ),
        lambda s: s["doc_id"].cast("string"),
    )
    return flagged.groupBy("source").agg(
        F.count("*").cast("long").alias("n_train"),
        F.count("dropped").cast("long").alias("n_dropped"),
        F.coalesce(
            F.sum(F.when(F.col("dropped") == 1, F.col("doc_id"))), F.lit(0)
        )
        .cast("long")
        .alias("sum_dropped"),
        F.md5(F.array_join(kept_sorted, ",")).alias("kept_md5"),
    )
