"""§2.J — LLM-data-pipeline operators (the north-star extension):
text statistics, tokenization, tf-idf, exact + MinHash/LSH + SimHash +
embedding-cosine deduplication, similarity search, centroids, quality
filtering, language ID, multimodal struct columns.

Scale design (each op, at 100 TB):
* tokenization/stats/fingerprints — embarrassingly parallel projections,
  no shuffle beyond the final aggregate.
* MinHash -> LSH banding turns O(n^2) near-dup search into
  O(n * bands) + a self-join only within band buckets; the md5 hash family
  is used (NOT xxhash64/MinHashLSH) because it is byte-identical in DuckDB,
  which makes the whole pipeline oracle-checkable (SURVEY.md §2.J, §7.4.8).
* brute-force cosine top-k is the correctness baseline; the banded/bucketed
  variants (`llm_neardup_cosine` via SimHash prefilter at scale) are the
  approximate scale path.
* determinism: integer arithmetic for ratios (`x * 10000 div y`) — float
  division at decimal-exact boundaries rounds differently across engines.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from biggie_spark.io import load_table
from biggie_spark.registry import register
from biggie_spark.util import (
    cosine,
    fan_out,
    knn_exact,
    l2_norm_sq,
    lineage_cap,
    r4,
    tokens,
)


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def _emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


@register(
    "llm_text_stats",
    oracle="""
    SELECT lang, count(*) AS n_docs,
           round(avg(n_chars), 4) AS avg_chars,
           round(avg(len(string_split(text, ' '))), 4) AS avg_tokens,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
    FROM documents GROUP BY lang
    """,
)
def llm_text_stats(spark, sf_dir):
    """Per-language document/token statistics (bench `q_text_tokens`)."""
    d = _docs(spark, sf_dir)
    ntok = F.size(F.split("text", " "))
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        r4(F.avg("n_chars")).alias("avg_chars"),
        r4(F.avg(ntok)).alias("avg_tokens"),
        F.sum(ntok).alias("total_tokens"),
    )


@register(
    "llm_tokenize_ngrams",
    oracle="""
    WITH toks AS (SELECT string_split(lower(text), ' ') AS tk FROM documents),
    bi AS (SELECT unnest(list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1])) AS bigram
           FROM toks)
    SELECT bigram, count(*) AS n FROM bi
    GROUP BY bigram ORDER BY n DESC, bigram LIMIT 20
    """,
)
def llm_tokenize_ngrams(spark, sf_dir):
    """Tokenize -> bigrams -> global top-20 (tie-broken by term).
    fan_out (optimization r14, guide §2.5): the bigram explode + partial
    aggregate otherwise run inside the single-split scan task."""
    d = fan_out(_docs(spark, sf_dir))
    tk = tokens("text")
    bigrams = F.when(
        F.size(tk) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(tk) - 1),
            lambda i: F.concat(
                F.element_at(tk, i), F.lit(" "), F.element_at(tk, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        d.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "bigram")
        .limit(20)
    )


@register(
    "llm_tf_idf",
    oracle="""
    WITH toks AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
                  FROM documents),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
    df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY term),
    nn AS (SELECT count(*) AS n FROM documents),
    s AS (SELECT tf.doc_id, tf.term, tf.tf, df.df,
                 round(tf.tf * ln((nn.n + 1.0) / (df.df + 1.0)), 4) AS score,
                 row_number() OVER (
                   PARTITION BY tf.doc_id
                   ORDER BY tf.tf * ln((nn.n + 1.0) / (df.df + 1.0)) DESC, tf.term
                 ) AS rn
          FROM tf JOIN df USING (term), nn)
    SELECT doc_id, term, tf, df, score, rn FROM s WHERE rn <= 3 AND doc_id < 50
    """,
)
def llm_tf_idf(spark, sf_dir):
    """tf-idf per (doc, term); top-3 terms per document.  Document frequency
    is computed over the FULL corpus; the probe set is filtered after.
    Pure DataFrame: explode -> two hash aggregates -> broadcast N -> window."""
    d = _docs(spark, sf_dir)
    toks = d.select("doc_id", F.explode(tokens("text")).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = toks.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    nn = d.agg(F.count("*").alias("n"))
    score = F.col("tf") * F.log((F.col("n") + 1.0) / (F.col("df") + 1.0))
    w = Window.partitionBy("doc_id").orderBy(score.desc(), "term")
    return (
        tf.filter(F.col("doc_id") < 50)
        .join(df, "term")
        .crossJoin(F.broadcast(nn))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "term", "tf", "df", r4(score).alias("score"), "rn")
    )


@register(
    "llm_dedup_exact",
    oracle="""
    SELECT source, count(*) AS n,
           count(DISTINCT md5(lower(trim(text)))) AS n_distinct
    FROM documents GROUP BY source
    """,
)
def llm_dedup_exact(spark, sf_dir):
    """Exact dedup on normalized text via md5 fingerprint (bench
    `q_dedup_minhash_proxy`) — the O(n) hash-aggregate dedup path."""
    d = _docs(spark, sf_dir)
    return d.groupBy("source").agg(
        F.count("*").alias("n"),
        F.countDistinct(F.md5(F.lower(F.trim(F.col("text"))))).alias("n_distinct"),
    )


def _minhash_of(arr):
    """k=16 MinHash signature of an array<string> column:
    sig[i] = min over elements of md5(elem ':' i).  md5-based so DuckDB
    reproduces it byte-for-byte (SURVEY.md §7.4.8); Spark's
    xxhash64/MinHashLSH are deliberately avoided (not portable).

    Optimization r14 (guide §1.2 "per-task work"): the min over a multiset
    equals the min over its support set, so each of the 16 slots hashes
    only DISTINCT elements — natural text repeats tokens heavily, so this
    drops the md5 count by the duplication factor (measured 2.3x on the
    corpus: 816k tokens -> 349k distinct per-doc at sf0.1) with a
    bit-identical signature.  ``array_distinct`` itself is evaluated once,
    not once per slot: it is bound as the element of a 1-element array
    whose ``transform`` lambda the 16-slot loop nests inside (a lambda
    variable is evaluated once per element; inlining the expression into
    the slot lambda would re-run the dedup 16x).  The DuckDB twin
    (`_DUCK_SIG`) keeps hashing the multiset — min() makes the two
    formulations equal by construction, and the scored hash proves it on
    every run."""
    return F.element_at(
        F.transform(
            F.array(F.array_distinct(arr)),
            lambda u: F.transform(
                F.sequence(F.lit(0), F.lit(15)),
                lambda i: F.array_min(
                    F.transform(
                        u, lambda t: F.md5(F.concat(t, F.lit(":"), i.cast("string")))
                    )
                ),
            ),
        ),
        1,
    )


def _minhash_sig(text_col):
    """MinHash over whitespace tokens (the unigram variant — see
    llm_neardup_shingle for the order-sensitive shingle variant)."""
    return _minhash_of(tokens(text_col))


def _shingles(text_col):
    """3-gram word shingles: tokens t1..tn -> 't_i t_i+1 t_i+2' for
    i in 1..n-2.  F.concat (NOT concat_ws) mirrors DuckDB `||` null
    semantics exactly; callers filter docs with < 3 tokens so no
    out-of-bounds NULLs arise."""
    tk = tokens(text_col)
    return F.transform(
        F.sequence(F.lit(1), F.size(tk) - 2),
        lambda i: F.concat(
            F.element_at(tk, i),
            F.lit(" "),
            F.element_at(tk, i + 1),
            F.lit(" "),
            F.element_at(tk, i + 2),
        ),
    )


def band_struct(sig_col, n_bands: int, rows: int):
    """The LSH banding exploder every banded consumer shares: emit one
    (b, bkey) struct per band, bkey = md5 of ``rows`` consecutive
    signature slots.  SINGLE POINT OF TRUTH (round-6 review finding: this
    expression was copy-pasted at five sites; each must stay
    byte-equivalent to the DuckDB twin
    ``md5(sg[rows*b+1] || ... || sg[rows*b+rows])`` or the engine and its
    oracle silently band differently).  Callers:
    ``df.select("doc_id", band_struct("sig", 4, 4)).select("doc_id",
    "bk.b", "bk.bkey")``."""
    return F.explode(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_bands - 1)),
            lambda b: F.struct(
                b.alias("b"),
                F.md5(
                    F.concat_ws("", F.slice(sig_col, b * rows + 1, rows))
                ).alias("bkey"),
            ),
        )
    ).alias("bk")


_DUCK_SIG = """
    toks AS (SELECT doc_id, string_split(lower(text), ' ') AS tk FROM documents{flt}),
    exp AS (SELECT doc_id, unnest(tk) AS tok FROM toks),
    h AS (SELECT doc_id, i, min(md5(tok || ':' || CAST(i AS VARCHAR))) AS mh
          FROM exp, range(16) t(i) GROUP BY doc_id, i),
    sig AS (SELECT doc_id, list(mh ORDER BY i) AS sg FROM h GROUP BY doc_id)
"""


@register(
    "llm_minhash_sig",
    oracle="WITH "
    + _DUCK_SIG.format(flt=" WHERE doc_id < 100")
    + " SELECT doc_id, array_to_string(sg, '|') AS sig FROM sig",
)
def llm_minhash_sig(spark, sf_dir):
    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 100)
    return d.select("doc_id", F.concat_ws("|", _minhash_sig("text")).alias("sig"))


@register(
    "llm_neardup_pairs",
    oracle="WITH "
    + _DUCK_SIG.format(flt="")
    + """,
    bands AS (SELECT doc_id, b, md5(sg[4*b+1] || sg[4*b+2] || sg[4*b+3] || sg[4*b+4]) AS bkey
              FROM sig, range(4) t(b)),
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             FROM bands a JOIN bands b ON a.b = b.b AND a.bkey = b.bkey
                                      AND a.doc_id < b.doc_id),
    tset AS (SELECT doc_id, list_distinct(tk) AS ts, len(list_distinct(tk)) AS n FROM toks),
    ver AS (SELECT c.doc_a, c.doc_b,
                   len(list_intersect(ta.ts, tb.ts)) AS i, ta.n AS na, tb.n AS nb
            FROM cand c
            JOIN tset ta ON ta.doc_id = c.doc_a
            JOIN tset tb ON tb.doc_id = c.doc_b)
    SELECT doc_a, doc_b, round(i * 1.0 / (na + nb - i), 4) AS jaccard
    FROM ver WHERE i * 1.0 / (na + nb - i) >= 0.95
    """,
)
def llm_neardup_pairs(spark, sf_dir, threshold: float = 0.95):
    """Near-duplicate pairs: MinHash -> LSH banding (4 bands x 4 rows) for
    candidate generation, then exact Jaccard >= threshold verification
    (registered/oracled at the 0.95 default).  The
    banding self-join touches only same-bucket pairs; band hashes become
    the shuffle key so each bucket is verified locally.

    Candidate-volume honesty (round-5 probe, SCALE.md): token-SET Jaccard
    is word-order-insensitive, and this corpus's template generator emits
    many same-multiset docs — the TRUE J>=0.95 answer is itself ~1.5% of
    all pairs (190,925 at sf0.1), so candidates here track the quadratic
    output (~30x the verified pairs), not n.  The scale guarantee this op
    can honestly make is candidates proportional to true-duplicate density;
    for corpora where near-dups are sparse (the web case), use
    llm_neardup_shingle — order-sensitive 3-shingles + 8-row bands,
    measured exactly linear (exponent 1.00) on the same data."""
    # fan_out: the MinHash kernel is per-row CPU over a single-split scan
    # (guide §2.5) — spread the raw docs across cores before hashing.
    d = fan_out(_docs(spark, sf_dir)).select(
        "doc_id", _minhash_sig("text").alias("sig"),
        F.array_distinct(tokens("text")).alias("ts"))
    # Materialize once: four consumers below (band self-join a/b + both
    # verify sides) otherwise recompute the minhash kernel each (A/B at
    # sf0.01: cold 14.2 s plain vs 3.1 s checkpointed; warm 2.9 vs 2.4).
    # A real cache/checkpoint of an O(n) frame on a cluster.
    d = d.transform(lineage_cap)
    bands = d.select("doc_id", F.size("ts").alias("n"), band_struct("sig", 4, 4)).select(
        "doc_id", "n", "bk.b", "bk.bkey"
    )
    a = bands.alias("a")
    b = bands.alias("b")
    # Size-ratio prefilter (optimization r14, guide §3.2 "reduce the big
    # side before shuffling"): J(A,B) >= t implies |A∩B| >= t(|A|+|B|-|A∩B|)
    # and |A∩B| <= min(|A|,|B|), hence (1+t)*min(|A|,|B|) >= t*(|A|+|B|) —
    # a NECESSARY condition on the two distinct-set sizes alone (the
    # PPJoin/AllPairs length filter).  Applying it inside the band join
    # prunes candidates before the distinct and before the per-pair
    # intersect: measured at sf0.1, 6,025,644 -> 1,753,644 candidates and
    # 15.3 s -> 5.6 s warm, with the verified output bit-identical
    # (190,925 rows, same hash).  The 1e-6 slack only ever ADMITS extra
    # candidates near the float boundary (exact verify still decides), so
    # no true pair can be lost.
    szfilt = (1 + threshold) * F.least(F.col("a.n"), F.col("b.n")) >= (
        threshold * (F.col("a.n") + F.col("b.n")) - 1e-6
    )
    cand = (
        a.join(
            b,
            (F.col("a.b") == F.col("b.b"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & szfilt,
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        # Widen the candidate dedup + verify span to session parallelism
        # (optimization r14): the session's shuffle.partitions=8 is sized
        # for the registry's typical tiny aggregate shuffles, but here the
        # post-exchange work is ~1.75M candidate pairs each paying an
        # array-intersect — 8 tasks left 3/4 of the cores idle.  The
        # repartition hash-partitions on the distinct's own grouping keys,
        # so the aggregate reuses this exchange (guide §2.4 — exchange
        # count unchanged, measured 5 before and after) and the whole
        # dedup+verify span runs at defaultParallelism.  Measured warm at
        # sf0.1: 3.27 s -> 1.78 s, output hash identical.  (A union-free
        # jaccard via |A|+|B|-i was also A/B'd: wash, rejected.)
        .repartition(
            spark.sparkContext.defaultParallelism, "doc_a", "doc_b"
        )
        .distinct()
    )
    ta = d.select(F.col("doc_id").alias("doc_a"), F.col("ts").alias("ts_a"))
    tb = d.select(F.col("doc_id").alias("doc_b"), F.col("ts").alias("ts_b"))
    jac = F.size(F.array_intersect("ts_a", "ts_b")) / F.size(
        F.array_union("ts_a", "ts_b")
    )
    # Broadcast the per-doc token-set sides so the O(candidates) pair list
    # is never shuffled by the verify joins (guide §3.1): |docs| rows vs
    # |candidates| ~ 30x the true-pair count here, and the planner's size
    # estimate over the checkpointed array column is too pessimistic to
    # fire auto-broadcast (measured SMJ 14.3 s vs broadcast 12.4 s before
    # the prefilter).  The hint is a deliberate bounded-side choice, not
    # size-gated: on a corpus where the per-doc set frame outgrows
    # broadcast, drop the hint and let both sides shuffle on doc_id — the
    # candidate list stays the smaller relation per key either way.
    return (
        cand.join(F.broadcast(ta), "doc_a")
        .join(F.broadcast(tb), "doc_b")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", r4(F.col("jaccard")).alias("jaccard"))
    )


@register(
    "llm_neardup_shingle",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS tk
                  FROM documents),
    ft AS (SELECT doc_id, tk FROM toks WHERE len(tk) >= 3),
    sh AS (SELECT doc_id,
                  list_transform(range(1, len(tk) - 1),
                                 i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])
                    AS sg
           FROM ft),
    exp AS (SELECT doc_id, unnest(sg) AS s FROM sh),
    h AS (SELECT doc_id, i, min(md5(s || ':' || CAST(i AS VARCHAR))) AS mh
          FROM exp, range(16) t(i) GROUP BY doc_id, i),
    sig AS (SELECT doc_id, list(mh ORDER BY i) AS s FROM h GROUP BY doc_id),
    bands AS (SELECT doc_id, b,
                     md5(s[8*b+1] || s[8*b+2] || s[8*b+3] || s[8*b+4] ||
                         s[8*b+5] || s[8*b+6] || s[8*b+7] || s[8*b+8]) AS bkey
              FROM sig, range(2) t(b)),
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             FROM bands a JOIN bands b ON a.b = b.b AND a.bkey = b.bkey
                                      AND a.doc_id < b.doc_id),
    tset AS (SELECT doc_id, list_distinct(sg) AS ts, len(list_distinct(sg)) AS n
             FROM sh)
    SELECT c.doc_a, c.doc_b,
           CAST(round(len(list_intersect(ta.ts, tb.ts)) * 1.0
                      / (ta.n + tb.n - len(list_intersect(ta.ts, tb.ts))), 4)
                AS DOUBLE) AS jaccard
    FROM cand c
    JOIN tset ta ON ta.doc_id = c.doc_a
    JOIN tset tb ON tb.doc_id = c.doc_b
    """,
)
def llm_neardup_shingle(spark, sf_dir):
    """Near-duplicate candidate audit via 3-gram SHINGLE MinHash + selective
    LSH banding (2 bands x 8 rows) — the web-scale dedup standard, and the
    measured fix for the token-set variant's candidate explosion.

    Round-5 scale probe (tools/scale_probe.py --ann-exponents, SCALE.md):
    on this template-vocabulary corpus the background TOKEN-SET Jaccard
    between random docs averages 0.6 (word multisets collide even when
    texts differ), so llm_neardup_pairs' 4x4 banding (s-curve threshold
    ~0.71) admits ~48% of ALL pairs as candidates — measured exponent 1.98,
    i.e. quadratic, tracking its genuinely quadratic token-level true
    answer (190,925 J>=0.95 pairs at sf0.1).  Order-sensitive 3-shingles
    drop background Jaccard to ~0.001, and 8-row bands put the s-curve
    threshold at (1/2)^(1/8) ~ 0.92: measured candidates are 24 -> 240
    over the 500 -> 5000-doc step — exponent 1.00, exactly linear, with
    the true near-dup pairs (the 8 exact duplicates) all retained.

    Output is every banding candidate WITH its exact shingle Jaccard (no
    threshold filter): the dedup-audit view a curation pipeline thresholds
    downstream, and a non-vacuous scored result on corpora with no true
    near-dups.  Plan: map-only shingle+signature pass, equi-join on
    (band, band-hash) — the shuffle key — then a self-join verify on the
    bounded candidate set; no cross join anywhere at any scale."""
    cand, d = _shingle_candidates(spark, sf_dir)
    ta = d.select(F.col("doc_id").alias("doc_a"), F.col("ts").alias("ts_a"))
    tb = d.select(F.col("doc_id").alias("doc_b"), F.col("ts").alias("ts_b"))
    jac = F.size(F.array_intersect("ts_a", "ts_b")) / F.size(
        F.array_union("ts_a", "ts_b")
    )
    return (
        cand.join(ta, "doc_a")
        .join(tb, "doc_b")
        .select("doc_a", "doc_b", r4(jac).alias("jaccard"))
    )


def _shingle_sig_frame(spark, sf_dir):
    """(doc_id, sig, ts) for every >=3-token document: 16-slot MinHash over
    3-gram word shingles plus the distinct shingle set for exact verify.
    Materialized once (lineage_cap): the frame feeds four consumers (both
    band self-join sides + both verify sides) and the shingle+minhash
    kernel is the dominant cost (measured 16 s -> ~4 s at sf0.01)."""
    return (
        # fan_out before the shingle+MinHash kernel: single-split scan vs
        # per-row md5 CPU (guide §2.5; measured 6.2 s -> 0.75 s at sf0.1).
        fan_out(_docs(spark, sf_dir).filter(F.size(tokens("text")) >= 3))
        .select("doc_id", _shingles("text").alias("sg"))
        .select(
            "doc_id",
            _minhash_of(F.col("sg")).alias("sig"),
            F.array_distinct("sg").alias("ts"),
        )
        .transform(lineage_cap)
    )


def _shingle_candidates(spark, sf_dir):
    """Shingle-banding candidate pairs (2 bands x 8 rows): returns
    (cand, sig_frame) where cand = distinct (doc_a < doc_b) same-bucket
    pairs.  The band hash is the equi-join/shuffle key — candidate volume
    is measured LINEAR in corpus size on this corpus (exponent 1.00,
    SCALE.md round-5), the property that makes this the edge source every
    downstream graph op can safely build on."""
    d = _shingle_sig_frame(spark, sf_dir)
    bands = d.select("doc_id", band_struct("sig", 2, 8)).select(
        "doc_id", "bk.b", "bk.bkey"
    )
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.b") == F.col("b.b"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    return cand, d


def neardup_edges_shingle(spark, sf_dir, num: int = 4, den: int = 5):
    """Scale-safe near-dup EDGE source for the graph family: shingle-banding
    candidates verified at shingle-Jaccard >= num/den via the integer
    cross-multiplied compare (|i| * den >= |union| * num — exact and
    engine-portable, SURVEY.md §8 convention c; no float threshold).

    This replaced ``llm_neardup_pairs(threshold=0.8)`` as the edge source
    for llm_dedup_clusters / graph_triangles in round 6: the token-set
    path's candidates are measured quadratic on this dup-dense corpus
    (exponent 1.98 — an sf0.1 full-registry sweep wedged >40 min inside its
    verify stage), while the shingle path is measured linear (exponent
    1.00; 240 edges at sf0.1 vs the token path's 190,925 verified pairs).
    Returns distinct (doc_a < doc_b) verified edges."""
    cand, d = _shingle_candidates(spark, sf_dir)
    ta = d.select(F.col("doc_id").alias("doc_a"), F.col("ts").alias("ts_a"))
    tb = d.select(F.col("doc_id").alias("doc_b"), F.col("ts").alias("ts_b"))
    i = F.size(F.array_intersect("ts_a", "ts_b"))
    u = F.size(F.array_union("ts_a", "ts_b"))
    return (
        cand.join(ta, "doc_a")
        .join(tb, "doc_b")
        .filter(i * den >= u * num)
        .select("doc_a", "doc_b")
    )


# DuckDB twin of neardup_edges_shingle: shingle sig -> 2x8 banding ->
# integer-ratio verify, ending in an `edges` CTE (MATERIALIZED so the
# iterative/multi-reference graph oracles evaluate the chain once).
DUCK_SHINGLE_EDGES = """
    toks AS (SELECT doc_id, string_split(lower(text), ' ') AS tk
             FROM documents),
    ft AS (SELECT doc_id, tk FROM toks WHERE len(tk) >= 3),
    sh AS (SELECT doc_id,
                  list_transform(range(1, len(tk) - 1),
                                 i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])
                    AS sg
           FROM ft),
    exp AS (SELECT doc_id, unnest(sg) AS s FROM sh),
    h AS (SELECT doc_id, i, min(md5(s || ':' || CAST(i AS VARCHAR))) AS mh
          FROM exp, range(16) t(i) GROUP BY doc_id, i),
    sig AS (SELECT doc_id, list(mh ORDER BY i) AS s FROM h GROUP BY doc_id),
    bands AS (SELECT doc_id, b,
                     md5(s[8*b+1] || s[8*b+2] || s[8*b+3] || s[8*b+4] ||
                         s[8*b+5] || s[8*b+6] || s[8*b+7] || s[8*b+8]) AS bkey
              FROM sig, range(2) t(b)),
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             FROM bands a JOIN bands b ON a.b = b.b AND a.bkey = b.bkey
                                      AND a.doc_id < b.doc_id),
    tset AS MATERIALIZED (SELECT doc_id, list_distinct(sg) AS ts,
                                 len(list_distinct(sg)) AS n
                          FROM sh),
    edges AS MATERIALIZED (
        SELECT c.doc_a, c.doc_b
        FROM cand c
        JOIN tset ta ON ta.doc_id = c.doc_a
        JOIN tset tb ON tb.doc_id = c.doc_b
        WHERE len(list_intersect(ta.ts, tb.ts)) * 5
              >= (ta.n + tb.n - len(list_intersect(ta.ts, tb.ts))) * 4)
"""


@register(
    "llm_neardup_incremental",
    oracle="WITH "
    + _DUCK_SIG.format(flt="")
    + """,
    bands AS (SELECT doc_id, b, md5(sg[4*b+1] || sg[4*b+2] || sg[4*b+3] || sg[4*b+4]) AS bkey
              FROM sig, range(4) t(b)),
    cand AS (SELECT DISTINCT n.doc_id AS doc_new, i.doc_id AS doc_idx
             FROM bands n JOIN bands i ON n.b = i.b AND n.bkey = i.bkey
             WHERE n.doc_id % 10 = 0 AND i.doc_id % 10 <> 0),
    tset AS (SELECT doc_id, list_distinct(tk) AS ts, len(list_distinct(tk)) AS n FROM toks),
    ver AS (SELECT c.doc_new, c.doc_idx,
                   len(list_intersect(ta.ts, tb.ts)) AS i, ta.n AS na, tb.n AS nb
            FROM cand c
            JOIN tset ta ON ta.doc_id = c.doc_new
            JOIN tset tb ON tb.doc_id = c.doc_idx)
    SELECT doc_new, doc_idx, round(i * 1.0 / (na + nb - i), 4) AS jaccard
    FROM ver WHERE i * 1.0 / (na + nb - i) >= 0.95
    """,
)
def llm_neardup_incremental(spark, sf_dir):
    """Incremental near-dup: dedup a NEW ingest batch against the existing
    corpus index without any corpus-vs-corpus work — the production daily-
    ingest pattern (a 100 TB corpus is never re-deduped against itself;
    each increment checks in against the standing LSH index).

    Batch = every 10th doc (deterministic 10% increment), index = the rest.
    The batch's band hashes BROADCAST (an increment is small by definition)
    and the index streams through one equi-probe on (band, band-hash) —
    cost O(index scan + batch x density), zero shuffle of the index side,
    versus the symmetric self-join that reshuffles the whole corpus per
    run.  In production the banded index is the persisted artifact
    (kv_put_bucketed layout keyed by band hash) so the scan prunes to the
    batch's buckets; here it derives from the scan to stay oracle-exact.
    Output = (new doc, existing doc, token-Jaccard) for verified duplicate
    hits >= 0.95 — the rows an ingest pipeline uses to drop or link
    incoming docs."""
    d = fan_out(_docs(spark, sf_dir)).select(
        "doc_id",
        _minhash_sig("text").alias("sig"),
        F.array_distinct(tokens("text")).alias("ts"),
    ).transform(lineage_cap)  # feeds bands + both verify sides (one kernel pass)
    bands = d.select("doc_id", band_struct("sig", 4, 4)).select(
        "doc_id", "bk.b", "bk.bkey"
    )
    new_b = bands.filter(F.col("doc_id") % 10 == 0).select(
        F.col("doc_id").alias("doc_new"), "b", "bkey"
    )
    idx_b = bands.filter(F.col("doc_id") % 10 != 0).select(
        F.col("doc_id").alias("doc_idx"), "b", "bkey"
    )
    cand = (
        idx_b.join(F.broadcast(new_b), ["b", "bkey"])
        .select("doc_new", "doc_idx")
        .distinct()
    )
    ta = d.select(F.col("doc_id").alias("doc_new"), F.col("ts").alias("ts_a"))
    tb = d.select(F.col("doc_id").alias("doc_idx"), F.col("ts").alias("ts_b"))
    jac = F.size(F.array_intersect("ts_a", "ts_b")) / F.size(
        F.array_union("ts_a", "ts_b")
    )
    return (
        cand.join(ta, "doc_new")
        .join(tb, "doc_idx")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= 0.95)
        .select("doc_new", "doc_idx", r4(F.col("jaccard")).alias("jaccard"))
    )


@register(
    "llm_simhash",
    oracle="""
    WITH toks AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
                  FROM documents),
    bits AS (SELECT doc_id, b,
                    sum(CASE WHEN substr(md5(tok), b + 1, 1) >= '8' THEN 1 ELSE -1 END) AS s
             FROM toks, range(16) t(b) GROUP BY doc_id, b)
    SELECT doc_id,
           CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT) << b ELSE 0 END) AS BIGINT) AS simhash
    FROM bits GROUP BY doc_id
    """,
)
def llm_simhash(spark, sf_dir):
    """16-bit SimHash document fingerprint: per bit, +/-1 votes from each
    token's md5 nibble; the sign of the vote sum sets the bit.  Token
    multiplicity is intentionally counted (frequency-weighted SimHash).

    Optimization r14 (guide §2.3/§2.4): formerly explode(tokens) x
    explode(16 bits) -> groupBy(doc, b) -> groupBy(doc), which computed
    md5(tok) once per (token, bit) — 16x redundant — and shuffled the
    13M-row (doc, tok, b) frame through two aggregates.  Now a pure
    per-row array program: md5 each token ONCE (bound via the 1-element
    array/transform trick so the hash array is evaluated a single time),
    fold the 16 vote sums per document, and assemble the bit mask with a
    zip against the power-of-two table — zero Exchange, zero redundant
    hashing.  Vote sums are order-independent integer additions and the
    bit test is the same nibble compare, so the output is bit-identical
    (oracle hash re-verified at sf0.001/0.01); measured 1.8 s -> 0.2 s
    warm at sf0.1.  The null-text filter mirrors the old explode
    semantics (a null text produced no vote rows, dropping the doc)."""
    d = fan_out(_docs(spark, sf_dir)).filter(F.col("text").isNotNull())
    hs = F.transform(tokens("text"), lambda tk: F.md5(tk))
    powers = F.array(*[F.lit(1 << b).cast("long") for b in range(16)])

    def _sim_of(hv):
        votes = F.transform(
            F.sequence(F.lit(0), F.lit(15)),
            lambda b: F.aggregate(
                hv,
                F.lit(0),
                lambda acc, h: acc
                + F.when(
                    h.substr(b + F.lit(1), F.lit(1)) >= F.lit("8"), F.lit(1)
                ).otherwise(F.lit(-1)),
            ),
        )
        return F.aggregate(
            F.zip_with(
                votes,
                powers,
                lambda s, p: F.when(s > 0, p).otherwise(F.lit(0).cast("long")),
            ),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        )

    sim = F.element_at(F.transform(F.array(hs), _sim_of), 1)
    return d.select("doc_id", sim.alias("simhash"))


@register(
    "llm_knn_cosine",
    oracle="""
    WITH pairs AS (
      SELECT a.vec_id AS probe_id, b.vec_id AS neighbor_id,
             list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) AS s
      FROM embeddings a JOIN embeddings b
        ON a.vec_id < 10 AND b.vec_id != a.vec_id
    )
    SELECT probe_id, neighbor_id, round(CAST(s AS DOUBLE), 4) AS sim FROM (
      SELECT *, row_number() OVER (
        PARTITION BY probe_id ORDER BY s DESC, neighbor_id) AS rn
      FROM pairs
    ) WHERE rn <= 5
    """,
)
def llm_knn_cosine(spark, sf_dir):
    """Brute-force cosine top-5 (bench `q_knn_self`): the exact baseline for
    similarity search.  Probes broadcast against the full vector table, so
    the scan is one pass with no shuffle of the big side; ranking is a
    per-probe window.  Cross-engine float convention per SURVEY.md §7.4.7
    (double fold vs DuckDB list_cosine_similarity with DOUBLE casts)."""
    return knn_exact(_emb(spark, sf_dir), range(10), k=5)


_NDC_TABLES = 4
_NDC_BITS = 6


def _ndc_sql_code(t: int) -> str:
    """DuckDB twin of :func:`_ndc_code`: 8-bit coordinate-sign SimHash code
    for hash table ``t`` (bit b = sign of dimension t*8+b)."""
    return " + ".join(
        f"(CASE WHEN a[{t * _NDC_BITS + b + 1}] > 0 THEN {1 << b} ELSE 0 END)"
        for b in range(_NDC_BITS)
    )


def _ndc_code(emb, t: int):
    """6-bit sign code of dims [t*6, t*6+6): axis-aligned hyperplanes are
    valid SimHash planes and, unlike md5-derived random planes, both
    engines can evaluate them bit-identically."""
    code = F.lit(0)
    for b in range(_NDC_BITS):
        code = code + F.when(
            F.element_at(emb, t * _NDC_BITS + b + 1).cast("double") > 0,
            F.lit(1 << b),
        ).otherwise(F.lit(0))
    return code


@register(
    "llm_neardup_cosine",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS a FROM embeddings),
    codes AS (
      SELECT vec_id, a, t,
             CASE t {' '.join(f'WHEN {t} THEN {_ndc_sql_code(t)}' for t in range(_NDC_TABLES))} END AS code
      FROM e, range({_NDC_TABLES}) r(t)),
    cand AS (
      SELECT DISTINCT x.vec_id AS a_id, y.vec_id AS b_id
      FROM codes x JOIN codes y ON x.t = y.t AND x.code = y.code
                               AND x.vec_id < y.vec_id)
    SELECT c.a_id, c.b_id,
           round(CAST(list_cosine_similarity(ea.a, eb.a) AS DOUBLE), 4) AS sim
    FROM cand c JOIN e ea ON ea.vec_id = c.a_id JOIN e eb ON eb.vec_id = c.b_id
    WHERE list_cosine_similarity(ea.a, eb.a) >= 0.30
    """,
)
def llm_neardup_cosine(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs, LSH-bucketed (threshold 0.30):
    4 independent 6-bit coordinate-sign SimHash tables generate candidates
    (pair collides in >= 1 table), exact cosine verifies only within
    buckets.  This is the 100 TB shape — the shuffle key is (table, code),
    candidate volume is O(n x tables x bucket_occupancy), and there is no
    CartesianProduct anywhere in the plan (pinned in tests/test_plans.py).
    The oracle implements the *identical* bucketing, so the scored output
    is exact, not probabilistic; recall vs all-pairs is the documented LSH
    trade (the exact small-probe baseline is `llm_knn_cosine`).

    Measured recall (round 6, sf0.001 vs numpy all-pairs): 0.19 on pairs
    with sim in [0.3, 0.4), 0.33 in [0.4, 0.5) — and this corpus has NO
    embedding pairs above 0.5, so those bands are the whole population.
    That matches the SimHash s-curve exactly (collision = (1-(1-(1-
    arccos(s)/pi)^6)^4): ~0.17 at s=0.30, ~0.87 at s=0.90): a 6-bit x
    4-table configuration is a HIGH-similarity near-dup detector, and the
    0.30 threshold here keeps the scored output non-vacuous on a corpus
    with no true embedding dups rather than promising completeness at low
    sim.  On a corpus with real semantic duplicates (s >= 0.9) expected
    recall is ~0.87; for completeness below ~0.7, raise tables or shrink
    codes (both are the standard LSH knobs, at candidate-volume cost)."""
    e = _emb(spark, sf_dir)
    coded = e.select(
        "vec_id",
        "embedding",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("t"),
                        _ndc_code(F.col("embedding"), t).alias("code"),
                    )
                    for t in range(_NDC_TABLES)
                ]
            )
        ).alias("bk"),
    ).select("vec_id", "embedding", "bk.t", "bk.code")
    x = coded.select("t", "code", F.col("vec_id").alias("a_id"))
    y = coded.select("t", "code", F.col("vec_id").alias("b_id"))
    cand = (
        x.join(y, ["t", "code"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
    )
    ea = e.select(F.col("vec_id").alias("a_id"), F.col("embedding").alias("ea"))
    eb = e.select(F.col("vec_id").alias("b_id"), F.col("embedding").alias("eb"))
    pairs = cand.join(ea, "a_id").join(eb, "b_id")
    sim = cosine(F.col("ea"), F.col("eb"))
    return (
        pairs.withColumn("s", sim)
        .filter(F.col("s") >= 0.30)
        .select("a_id", "b_id", r4(F.col("s")).alias("sim"))
    )


@register(
    "llm_dedup_semantic",
    oracle=f"""
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS a FROM embeddings),
    codes AS (
      SELECT vec_id, a, t,
             CASE t {' '.join(f'WHEN {t} THEN {_ndc_sql_code(t)}' for t in range(_NDC_TABLES))} END AS code
      FROM e, range({_NDC_TABLES}) r(t)),
    cand AS (
      SELECT DISTINCT x.vec_id AS a_id, y.vec_id AS b_id
      FROM codes x JOIN codes y ON x.t = y.t AND x.code = y.code
                               AND x.vec_id < y.vec_id),
    dropped AS (
      SELECT DISTINCT c.b_id AS vec_id
      FROM cand c JOIN e ea ON ea.vec_id = c.a_id JOIN e eb ON eb.vec_id = c.b_id
      WHERE list_cosine_similarity(ea.a, eb.a) >= 0.30)
    SELECT e.label AS label, count(*) AS n_total,
           CAST(sum(CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM e LEFT JOIN dropped d ON e.vec_id = d.vec_id
    GROUP BY e.label
    """,
)
def llm_dedup_semantic(spark, sf_dir):
    """SemDeDup-style semantic dedup SELECTION: from the LSH-bucketed
    cosine near-dup pairs (llm_neardup_cosine's exact machinery), drop the
    higher vec_id of every verified pair and keep the min-id canonical —
    the embedding-space twin of llm_dedup_keep_best.  Output is the
    per-label survivor census (total vs kept), i.e. how much the corpus
    shrinks under semantic dedup at threshold 0.30.

    Scale: the pair generation is the banded-LSH shape (shuffle key =
    (table, code), no all-pairs); the drop set is one distinct projection
    of the pair list; survivorship is an anti-join — broadcastable while
    |near-dups| is small, shuffle-joinable when it is not."""
    pairs = llm_neardup_cosine(spark, sf_dir)
    dropped = pairs.select(F.col("b_id").alias("vec_id")).distinct()
    e = _emb(spark, sf_dir).select("vec_id", "label")
    kept_flag = F.when(F.col("dropped_id").isNull(), 1).otherwise(0)
    joined = e.join(
        dropped.select(F.col("vec_id").alias("dropped_id")),
        e.vec_id == F.col("dropped_id"),
        "left",
    )
    return joined.groupBy("label").agg(
        F.count("*").alias("n_total"), F.sum(kept_flag).alias("n_kept")
    )


@register(
    "llm_embed_norm",
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS a FROM embeddings WHERE vec_id < 10)
    SELECT x.vec_id AS a_id, y.vec_id AS b_id,
           round(CAST(list_distance(x.a, y.a) AS DOUBLE), 4) AS dist_l2,
           round(sqrt(CAST(list_aggregate(list_transform(x.a, v -> v * v), 'sum')
                           AS DOUBLE)), 4) AS norm_a
    FROM e x JOIN e y ON x.vec_id < y.vec_id
    """,
)
def llm_embed_norm(spark, sf_dir):
    """L2 norms + pairwise L2 distances (the normalize/score primitives
    under embedding dedup and ANN)."""
    e = _emb(spark, sf_dir).filter(F.col("vec_id") < 10)
    x = e.select(F.col("vec_id").alias("a_id"), F.col("embedding").alias("ea"))
    y = e.select(F.col("vec_id").alias("b_id"), F.col("embedding").alias("eb"))
    dist = F.sqrt(
        F.aggregate(
            F.zip_with(
                F.col("ea"),
                F.col("eb"),
                lambda p, q: (p.cast("double") - q.cast("double"))
                * (p.cast("double") - q.cast("double")),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    return (
        x.crossJoin(y)
        .filter(F.col("a_id") < F.col("b_id"))
        .select(
            "a_id",
            "b_id",
            r4(dist).alias("dist_l2"),
            r4(F.sqrt(l2_norm_sq(F.col("ea")))).alias("norm_a"),
        )
    )


@register(
    "llm_centroid",
    oracle="""
    SELECT label, i AS pos,
           /* + 0 normalizes -0.0 (a tiny negative mean rounds to a signed
              zero); the driver hash distinguishes signed zeros */
           round(avg(CAST(embedding[i + 1] AS DOUBLE)), 4) + 0 AS centroid,
           count(*) AS n
    FROM embeddings, range(64) t(i)
    GROUP BY label, i
    """,
)
def llm_centroid(spark, sf_dir):
    """Per-label centroid, long format (label, pos, value): posexplode ->
    one hash aggregate on (label, pos) — fully partial-aggregated, so the
    shuffle carries labels x 64 rows regardless of corpus size."""
    e = _emb(spark, sf_dir)
    return (
        e.select("label", F.posexplode("embedding").alias("pos", "v"))
        .groupBy("label", "pos")
        .agg(r4(F.avg(F.col("v").cast("double"))).alias("centroid"), F.count("*").alias("n"))
    )


@register(
    "llm_quality_filter",
    oracle="""
    SELECT doc_id, lang, n_chars,
           len(string_split(text, ' ')) AS n_tokens,
           (len(string_split(text, ' ')) * 10000) // length(text) AS tok_density_bp
    FROM documents
    WHERE n_chars BETWEEN 120 AND 400
      AND lang IN ('en', 'de', 'fr')
      AND (len(string_split(text, ' ')) * 10000) // length(text) BETWEEN 1000 AND 3500
    """,
)
def llm_quality_filter(spark, sf_dir):
    """Composite quality filter: length bounds, language allowlist, token
    density (basis points, INTEGER arithmetic — float ratios at decimal
    boundaries round differently across engines)."""
    d = _docs(spark, sf_dir)
    ntok = F.size(F.split("text", " "))
    density = F.expr("(size(split(text, ' ')) * 10000) div length(text)")
    return (
        d.filter(
            F.col("n_chars").between(120, 400)
            & F.col("lang").isin("en", "de", "fr")
            & density.between(1000, 3500)
        )
        .select("doc_id", "lang", "n_chars", ntok.alias("n_tokens"),
                density.alias("tok_density_bp"))
    )


@register(
    "llm_lang_id",
    oracle="""
    WITH scored AS (
      SELECT lang,
             CASE WHEN (len(list_filter(string_split(lower(text), ' '),
                                        t -> t IN ('the', 'a'))) * 10000)
                       // len(string_split(lower(text), ' ')) >= 400
                  THEN 'en_like' ELSE 'other' END AS predicted
      FROM documents)
    SELECT lang, predicted, count(*) AS n FROM scored GROUP BY lang, predicted
    """,
)
def llm_lang_id(spark, sf_dir):
    """Language-ID heuristic: English stopword density in basis points
    (n-gram/stopword heuristics are the standard cheap lang-ID signal;
    integer arithmetic for cross-engine determinism)."""
    d = _docs(spark, sf_dir).select(
        "lang",
        F.expr(
            "CASE WHEN (size(filter(split(lower(text), ' '), t -> t IN ('the', 'a'))) * 10000) "
            "div size(split(lower(text), ' ')) >= 400 THEN 'en_like' ELSE 'other' END"
        ).alias("predicted"),
    )
    return d.groupBy("lang", "predicted").agg(F.count("*").alias("n"))


@register(
    "llm_multimodal_struct",
    oracle="""
    SELECT d.doc_id AS doc_id, d.n_chars AS n_chars, md5(d.text) AS text_md5,
           round(sqrt(CAST(list_aggregate(list_transform(e.embedding::DOUBLE[],
                                                         v -> v * v), 'sum')
                           AS DOUBLE)), 4) AS emb_norm
    FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    WHERE d.n_chars > 200
      AND CAST(list_aggregate(e.embedding::DOUBLE[], 'sum') AS DOUBLE) > 0
    """,
)
def llm_multimodal_struct(spark, sf_dir):
    """Multimodal column: text + embedding fused into one struct column,
    filtered on BOTH modalities through nested-field access (the pattern for
    image/audio payload structs — see biggie_spark/multimodal.py)."""
    d = _docs(spark, sf_dir)
    e = _emb(spark, sf_dir)
    fused = (
        d.join(e, d.doc_id == e.vec_id)
        .select(
            "doc_id",
            F.struct(
                F.col("text").alias("text"),
                F.col("n_chars").alias("n_chars"),
                F.col("embedding").alias("embedding"),
            ).alias("mm"),
        )
    )
    emb = F.col("mm.embedding")
    esum = F.aggregate(emb, F.lit(0.0), lambda acc, v: acc + v.cast("double"))
    return (
        fused.filter((F.col("mm.n_chars") > 200) & (esum > 0))
        .select(
            "doc_id",
            F.col("mm.n_chars").alias("n_chars"),
            F.md5(F.col("mm.text")).alias("text_md5"),
            r4(F.sqrt(l2_norm_sq(emb))).alias("emb_norm"),
        )
    )
