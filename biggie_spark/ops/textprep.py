"""Text-preparation operators — the boilerplate-removal / normalization /
scrubbing front end of a training-data pipeline (strip markup, compose
Unicode, remove PII, catch small-edit near-duplicates).

Scale design (100 TB):
* `llm_html_strip`, `llm_pii_scrub` are pure per-row string kernels
  (regexp_replace / regexp_count) inside whole-stage codegen — zero
  shuffles; the scan is the plan.  Patterns are chosen to behave
  identically under Java regex (Spark) and RE2 (DuckDB), and DuckDB's
  non-global-by-default regexp_replace always gets the 'g' flag (the
  rule-8 trap fn_redact documents).
* `llm_unicode_nfc` is the one text kernel Spark genuinely lacks a
  built-in for (no NFC normalization expression) — so it demonstrates
  the sanctioned slow-path shape: an Arrow-batched pandas_udf (1:1 row
  map, NOT mapInPandas) around `unicodedata.normalize`, with everything
  before and after it (injection, length accounting, md5) staying
  JVM-side.  DuckDB's `nfc_normalize` is the oracle twin.
* `llm_dedup_editdist` is block-then-verify near-dup at the document
  level: candidates must share a cheap blocking key (source + exact
  char-length band + 16-char prefix), so the quadratic Levenshtein
  verify runs only inside tiny co-shuffled buckets — the same
  O(n²)→O(Σ block²) shape as the MinHash/LSH family, but exact for
  SMALL edits, which banding can miss (a 3-char edit barely moves any
  shingle set when docs are short).  Spark's 3-arg
  ``levenshtein(l, r, threshold)`` gives the early-exit kernel — cost
  per pair is O(len·threshold), not O(len²).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F

from biggie_spark.io import load_table
from biggie_spark.registry import register


@register(
    "llm_html_strip",
    oracle="""
    WITH page AS (
      SELECT doc_id,
             '<html><body><h1>Doc ' || CAST(doc_id AS VARCHAR)
               || '</h1><p class="t">' || text
               || '</p><hr/><br/></body></html>' AS html
      FROM documents),
    s AS (
      SELECT doc_id, html,
             trim(regexp_replace(regexp_replace(html, '<[^>]*>', ' ', 'g'),
                                 ' +', ' ', 'g')) AS clean
      FROM page)
    SELECT doc_id,
           CAST(length(html) AS BIGINT) AS n_html,
           CAST(length(clean) AS BIGINT) AS n_clean,
           md5(clean) AS clean_md5
    FROM s
    """,
)
def llm_html_strip(spark, sf_dir):
    """Markup removal — the first pass over web-crawl text.  A
    deterministic HTML wrapper (headline, attributes, void
    elements) is synthesized around each document so the stripper faces
    real tag grammar; tags collapse to spaces (word-boundary-safe: the
    oracle's fingerprint catches strippers that glue adjacent words),
    whitespace re-collapses, and the cleaned text is fingerprinted.
    Two regexp_replace kernels per row, no shuffle at any scale."""
    page = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("<html><body><h1>Doc "),
            F.col("doc_id").cast("string"),
            F.lit('</h1><p class="t">'),
            F.col("text"),
            F.lit("</p><hr/><br/></body></html>"),
        ).alias("html"),
    )
    clean = F.trim(
        F.regexp_replace(F.regexp_replace("html", "<[^>]*>", " "), " +", " ")
    )
    return page.select(
        "doc_id",
        F.length("html").cast("long").alias("n_html"),
        F.length(clean).cast("long").alias("n_clean"),
        F.md5(clean).alias("clean_md5"),
    )


@register(
    "llm_pii_scrub",
    oracle="""
    WITH raw AS (
      SELECT doc_id,
             'from user' || CAST(doc_id AS VARCHAR)
               || '@example.com tel +1-555-'
               || CAST(doc_id % 10000 AS VARCHAR) || ' :: ' || text AS msg
      FROM documents),
    s AS (
      SELECT doc_id, msg,
             regexp_replace(
               regexp_replace(msg, '[a-z0-9.]+@[a-z.]+[a-z]', '<EMAIL>', 'g'),
               '\\+1-[0-9]{3}-[0-9]+', '<PHONE>', 'g') AS scrubbed,
             len(regexp_extract_all(msg, '[a-z0-9.]+@[a-z.]+[a-z]')) AS n_email,
             len(regexp_extract_all(msg, '\\+1-[0-9]{3}-[0-9]+')) AS n_phone
      FROM raw)
    SELECT doc_id, CAST(n_email AS BIGINT) AS n_email,
           CAST(n_phone AS BIGINT) AS n_phone,
           md5(scrubbed) AS scrubbed_md5
    FROM s
    """,
)
def llm_pii_scrub(spark, sf_dir):
    """Typed PII scrubbing (emails, phone numbers) with per-kind
    redaction counts — the compliance pass before text ships to
    training.  Known PII is deterministically injected into every
    document, then scrubbed back out; the oracle's per-kind counts prove
    each pattern actually fired (an injection→scrub round trip, so a
    broken regex can't pass silently — unlike a scrubber run on clean
    text, which vacuously reports zero).  Both kernels are per-row
    regexp expressions in codegen; counting uses regexp_count (Spark) /
    regexp_extract_all length (DuckDB) on identical RE2-safe patterns."""
    raw = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("from user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com tel +1-555-"),
            (F.col("doc_id") % 10000).cast("string"),
            F.lit(" :: "),
            F.col("text"),
        ).alias("msg"),
    )
    email = "[a-z0-9.]+@[a-z.]+[a-z]"
    phone = r"\+1-[0-9]{3}-[0-9]+"
    scrubbed = F.regexp_replace(
        F.regexp_replace("msg", email, "<EMAIL>"), phone, "<PHONE>"
    )
    return raw.select(
        "doc_id",
        F.expr(f"regexp_count(msg, '{email}')").cast("long").alias("n_email"),
        F.expr(rf"regexp_count(msg, '\\+1-[0-9]{{3}}-[0-9]+')")
        .cast("long")
        .alias("n_phone"),
        F.md5(scrubbed).alias("scrubbed_md5"),
    )


@register(
    "llm_unicode_nfc",
    oracle="""
    WITH raw AS (
      SELECT doc_id, text || ' cafe' || chr(769) || ' nai' || chr(776) || 've'
               AS dirty
      FROM documents WHERE doc_id < 300),
    n AS (SELECT doc_id, dirty, nfc_normalize(dirty) AS clean FROM raw)
    SELECT doc_id,
           CAST(length(dirty) AS BIGINT) AS n_dirty,
           CAST(length(clean) AS BIGINT) AS n_clean,
           md5(clean) AS clean_md5
    FROM n
    """,
)
def llm_unicode_nfc(spark, sf_dir):
    """Unicode NFC composition — dedup and tokenization break when the
    same glyph arrives decomposed ('e' + COMBINING ACUTE) from one crawl
    and precomposed ('é') from another.  Spark has NO built-in
    normalization expression, so this is the sanctioned pandas_udf
    slow-path: an Arrow-batched 1:1 kernel around
    ``unicodedata.normalize("NFC", s)``, with the dirty-text synthesis
    (two decomposed sequences appended per doc) and the post-kernel
    length/md5 accounting staying JVM-side.  Codepoint counts drop by
    exactly 2 per doc when composition works — the oracle
    (``nfc_normalize``) pins both the counts and the byte-level md5."""
    from pyspark.sql.functions import pandas_udf

    def _nfc_kernel(s):
        import unicodedata

        return s.map(lambda x: unicodedata.normalize("NFC", x))

    nfc = pandas_udf(_nfc_kernel, "string")

    raw = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 300)
        .select(
            "doc_id",
            F.concat(
                F.col("text"),
                # decomposed on purpose: 'e'+U+0301, 'i'+U+0308 — matches the
                # oracle's chr(769)/chr(776) construction byte-for-byte
                F.lit(" cafe\u0301 nai\u0308ve"),
            ).alias("dirty"),
        )
    )
    out = raw.withColumn("clean", nfc(F.col("dirty")))
    return out.select(
        "doc_id",
        F.length("dirty").cast("long").alias("n_dirty"),
        F.length("clean").cast("long").alias("n_clean"),
        F.md5("clean").alias("clean_md5"),
    )


@register(
    "llm_dedup_editdist",
    oracle="""
    WITH a AS (SELECT doc_id, text FROM documents),
    b AS (
      /* mutated twin corpus: every 3rd doc re-arrives with a 3-char
         suffix typo and doc_id offset by 100000 */
      SELECT doc_id + 100000 AS doc_id, text || ' zq' AS text
      FROM documents WHERE doc_id % 3 = 0),
    blk_a AS (SELECT doc_id, text,
                     length(text) // 16 AS band, substr(text, 1, 16) AS pfx
              FROM a),
    blk_b AS (SELECT doc_id, text,
                     length(text) // 16 AS band, substr(text, 1, 16) AS pfx
              FROM b),
    pairs AS (
      SELECT blk_a.doc_id AS id_a, blk_b.doc_id AS id_b,
             levenshtein(blk_a.text, blk_b.text) AS dist
      FROM blk_a JOIN blk_b
        ON blk_a.pfx = blk_b.pfx
       AND abs(blk_a.band - blk_b.band) <= 1)
    SELECT id_a, id_b, CAST(dist AS BIGINT) AS dist
    FROM pairs WHERE dist <= 4
    """,
)
def llm_dedup_editdist(spark, sf_dir):
    """Small-edit near-duplicate detection across two corpus snapshots —
    the case MinHash banding is WORST at: a 3-character typo barely
    perturbs any shingle set on a short doc, but it is exactly what a
    re-crawl produces.  A mutated twin corpus (every 3rd doc + a 3-char
    suffix) re-arrives under new ids; blocking on (16-char prefix,
    ±1 char-length band) makes candidates an EQUI-join on the prefix with
    a band residual, and exact Levenshtein ≤ 4 verifies inside each tiny
    bucket.  Spark's 3-arg ``levenshtein(l, r, 5)`` early-exits any pair
    past the threshold (O(len·k) per pair, not O(len²)) — the distance it
    returns for kept pairs (≤ 4) is exact, so the oracle's plain
    levenshtein agrees."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    b = (
        docs.filter(F.col("doc_id") % 3 == 0)
        .select(
            (F.col("doc_id") + 100000).alias("id_b"),
            F.concat(F.col("text"), F.lit(" zq")).alias("text_b"),
        )
    )
    blk_a = docs.select(
        F.col("doc_id").alias("id_a"),
        F.col("text").alias("text_a"),
        (F.length("text") / 16).cast("int").alias("band_a"),
        F.substring("text", 1, 16).alias("pfx"),
    )
    blk_b = b.select(
        "id_b",
        "text_b",
        (F.length("text_b") / 16).cast("int").alias("band_b"),
        F.substring("text_b", 1, 16).alias("pfx"),
    )
    pairs = blk_a.join(blk_b, "pfx").filter(
        F.abs(F.col("band_a") - F.col("band_b")) <= 1
    )
    # threshold-capped kernel: returns -1 past the cap, exact value inside.
    # Cap = 4 (the emit threshold itself, optimization r14): the op keeps
    # dist <= 4 only, so capping at 4 returns -1 for every rejected pair
    # (identical keep-set, one fewer edit-row per kernel) and the filter
    # becomes the single-reference `dist >= 0` — the old `>= 0 AND <= 4`
    # double-referenced the alias, evaluating the kernel twice per pair
    # after predicate-pushdown alias substitution (guide §4.4's
    # duplicated-expression trap, JVM edition).
    dist = F.expr("levenshtein(text_a, text_b, 4)")
    return (
        pairs.withColumn("dist", dist.cast("long"))
        .filter(F.col("dist") >= 0)
        .select("id_a", "id_b", "dist")
    )


def _jaro_winkler(a: str, b: str) -> float:
    """Textbook Jaro-Winkler (match window max(|a|,|b|)//2 - 1, half
    transpositions, Winkler prefix boost p=0.1 capped at 4) — the same
    definition DuckDB's native jaro_winkler_similarity implements, which
    is the point: the oracle cross-validates this Python kernel against
    an independent C++ implementation."""
    if a == b:
        return 1.0
    la, lb = len(a), len(b)
    if not la or not lb:
        return 0.0
    window = max(la, lb) // 2 - 1
    ma = [False] * la
    mb = [False] * lb
    matches = 0
    for i, ca in enumerate(a):
        lo, hi = max(0, i - window), min(lb, i + window + 1)
        for j in range(lo, hi):
            if not mb[j] and b[j] == ca:
                ma[i] = mb[j] = True
                matches += 1
                break
    if not matches:
        return 0.0
    t = 0
    j = 0
    for i in range(la):
        if ma[i]:
            while not mb[j]:
                j += 1
            if a[i] != b[j]:
                t += 1
            j += 1
    jaro = (matches / la + matches / lb + (matches - t / 2) / matches) / 3
    prefix = 0
    for ca, cb in zip(a[:4], b[:4]):
        if ca != cb:
            break
        prefix += 1
    return jaro + prefix * 0.1 * (1 - jaro)


@register(
    "llm_jaro_winkler_match",
    oracle="""
    WITH names AS (
      SELECT DISTINCT p_name,
             string_split(p_name, ' ')[2] AS blk
      FROM part),
    pairs AS (
      SELECT a.p_name AS name_a, b.p_name AS name_b,
             jaro_winkler_similarity(a.p_name, b.p_name) AS jw
      FROM names a JOIN names b
        ON a.blk = b.blk AND a.p_name < b.p_name)
    SELECT name_a, name_b, CAST(round(jw, 4) AS DOUBLE) AS jw
    FROM pairs WHERE round(jw, 4) >= 0.85
    """,
)
def llm_jaro_winkler_match(spark, sf_dir):
    """Jaro-Winkler fuzzy matching over blocked part-name pairs — the
    record-linkage scorer (census/MDM lineage) that catches transposed
    and prefix-sharing name variants edit distance over-penalizes.

    Spark has no Jaro-Winkler builtin, so this is a genuine
    pandas_udf-required kernel (like the NFC op): an Arrow-batched
    two-column scorer around the textbook algorithm, cross-validated
    under r4 against DuckDB's INDEPENDENT native C++ implementation —
    two codebases agreeing on every blocked pair is strong evidence both
    are the standard definition.  The filter compares the ROUNDED score
    on both sides so the 0.85 cut cannot flip on a last-ulp divergence.
    Blocking (shared noun token) keeps the pair space O(Σ block²), same
    scale shape as join_fuzzy_name; the kernel cost is per-pair
    O(|a|·window)."""
    from pyspark.sql.functions import pandas_udf

    def _jw_kernel(a, b):
        return pd.Series([_jaro_winkler(x, y) for x, y in zip(a, b)])

    jw = pandas_udf(_jw_kernel, "double")

    names = (
        load_table(spark, sf_dir, "part")
        .select("p_name")
        .distinct()
        .withColumn("blk", F.element_at(F.split("p_name", " "), 2))
    )
    a = names.select(F.col("p_name").alias("name_a"), F.col("blk").alias("ba"))
    b = names.select(F.col("p_name").alias("name_b"), F.col("blk").alias("bb"))
    pairs = a.join(
        b, (F.col("ba") == F.col("bb")) & (F.col("name_a") < F.col("name_b"))
    )
    return (
        pairs.withColumn("jw", F.round(jw(F.col("name_a"), F.col("name_b")), 4))
        .filter(F.col("jw") >= 0.85)
        .select("name_a", "name_b", F.col("jw").cast("double").alias("jw"))
    )


@register(
    "fn_luhn_pii",
    oracle="""
    WITH cand AS (
      /* synthetic 16-digit runs: half constructed to PASS Luhn (the
         check digit is computed), half with the check digit off by one */
      SELECT doc_id,
             CAST(doc_id * 7919 % 100000000 AS VARCHAR)
               || CAST(doc_id * 104729 % 10000000 AS VARCHAR) AS body
      FROM documents WHERE doc_id < 200),
    pad AS (SELECT doc_id, lpad(body, 15, '4') AS b15 FROM cand),
    dsum AS (
      SELECT doc_id, b15,
             list_aggregate(list_transform(range(1, 16), i ->
               CASE WHEN (15 - i) % 2 = 0
                    THEN CASE WHEN CAST(b15[i] AS INTEGER) * 2 > 9
                              THEN CAST(b15[i] AS INTEGER) * 2 - 9
                              ELSE CAST(b15[i] AS INTEGER) * 2 END
                    ELSE CAST(b15[i] AS INTEGER) END), 'sum') AS s
      FROM pad),
    full16 AS (
      SELECT doc_id,
             b15 || CAST((10 - s % 10) % 10 AS VARCHAR) AS good,
             b15 || CAST(((10 - s % 10) % 10 + 1) % 10 AS VARCHAR) AS bad
      FROM dsum),
    verify AS (
      SELECT doc_id, num, expect_valid,
             list_aggregate(list_transform(range(1, 17), i ->
               CASE WHEN (16 - i) % 2 = 1
                    THEN CASE WHEN CAST(num[i] AS INTEGER) * 2 > 9
                              THEN CAST(num[i] AS INTEGER) * 2 - 9
                              ELSE CAST(num[i] AS INTEGER) * 2 END
                    ELSE CAST(num[i] AS INTEGER) END), 'sum') % 10 = 0
               AS luhn_ok
      FROM (SELECT doc_id, good AS num, TRUE AS expect_valid FROM full16
            UNION ALL
            SELECT doc_id, bad, FALSE FROM full16))
    SELECT doc_id, num, expect_valid, luhn_ok
    FROM verify
    """,
)
def fn_luhn_pii(spark, sf_dir):
    """Luhn checksum validation — the filter that separates REAL payment
    card numbers from random 16-digit runs in a PII scan (a digit-run
    regex alone massively over-redacts; Luhn-valid runs are the
    high-confidence hits).  Synthetic numbers are built in matched pairs
    — one with the correct Luhn check digit, one off by exactly one — and
    the validator must accept precisely the constructed-valid half.

    The double-every-second-digit-from-the-right fold is a higher-order
    array expression over the digit string in BOTH engines (transform +
    aggregate in Spark, list_transform + list_aggregate in DuckDB) — all
    integer, zero UDFs, codegen-resident.  The self-verifying pair
    construction means a parity or direction bug in either fold breaks
    the hash."""
    cand = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 200)
        .select(
            "doc_id",
            F.lpad(
                F.concat(
                    (F.col("doc_id") * 7919 % 100000000).cast("string"),
                    (F.col("doc_id") * 104729 % 10000000).cast("string"),
                ),
                15,
                "4",
            ).alias("b15"),
        )
    )

    def luhn_sum(col_name: str, n: int, double_parity: int) -> F.Column:
        # digit i (1-based); double when (n - i) % 2 == double_parity
        return F.expr(
            f"aggregate(transform(sequence(1, {n}), i -> "
            f"CASE WHEN ({n} - i) % 2 = {double_parity} THEN "
            f"  CASE WHEN CAST(substring({col_name}, i, 1) AS INT) * 2 > 9 "
            f"       THEN CAST(substring({col_name}, i, 1) AS INT) * 2 - 9 "
            f"       ELSE CAST(substring({col_name}, i, 1) AS INT) * 2 END "
            f"ELSE CAST(substring({col_name}, i, 1) AS INT) END), 0, "
            f"(a, x) -> a + x)"
        )

    with_sum = cand.withColumn("s", luhn_sum("b15", 15, 0))
    full16 = with_sum.select(
        "doc_id",
        F.concat(
            F.col("b15"), (((10 - F.col("s") % 10) % 10)).cast("string")
        ).alias("good"),
        F.concat(
            F.col("b15"),
            ((((10 - F.col("s") % 10) % 10) + 1) % 10).cast("string"),
        ).alias("bad"),
    )
    pairs = full16.select(
        "doc_id", F.col("good").alias("num"), F.lit(True).alias("expect_valid")
    ).unionByName(
        full16.select(
            "doc_id", F.col("bad").alias("num"), F.lit(False).alias("expect_valid")
        )
    )
    return pairs.withColumn(
        "luhn_ok", (luhn_sum("num", 16, 1) % 10) == 0
    )
