"""ML-evaluation metric operators — the model-quality analytics a
training-data engine runs at corpus scale (score a filter/classifier on
millions of rows, then: ROC-AUC, calibration, annotator agreement,
confusion/PRF).  All metrics reduce to exact integer sufficient
statistics, so they are bit-stable on any cluster layout — the same
discipline as ops/stats.py, applied to the ML-eval family.

The synthetic "classifier" is deterministic by construction: the binary
truth label is `lang = 'en'` and the score is a hash-derived integer in
basis points, shifted upward for positives — so the score is genuinely
informative (AUC ≈ 0.75, calibration bins populated at every decile)
without any RNG, and both engines derive the identical score column.

Scale design (100 TB):
* AUC uses the rank-sum identity AUC = U/(n⁺·n⁻) on SCORE BINS (scores
  are integer basis points → ≤ 10001 bins at any row count), the same
  bounded-domain trick as agg_mann_whitney — no global row sort, one
  hash aggregate + one window over the bin frame.
* Calibration, confusion, and kappa are single hash aggregates of
  conditional counts; ratios emit as integer basis points (convention
  (b)), with kappa's final algebra in double under r4 on ONE row.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from biggie_spark.io import load_table
from biggie_spark.registry import register
from biggie_spark.util import r4

# score = base hash noise (0..5999 bp) + 3000 bp lift for positives,
# giving overlapping but separated score distributions.
_SCORE_SQL = """
    CAST(('0x' || substr(md5('sc' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
      % 6000
    + CASE WHEN lang = 'en' THEN 3000 ELSE 0 END
"""


def _scored(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    score = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("sc"), F.col("doc_id").cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % 6000
        + F.when(F.col("lang") == "en", 3000).otherwise(0)
    )
    return d.select(
        "doc_id",
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
        score.alias("s"),
    )


@register(
    "agg_auc_roc",
    oracle=f"""
    WITH sc AS (
      SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
             {_SCORE_SQL} AS s
      FROM documents),
    bins AS (SELECT s, sum(y) AS pos, count(*) - sum(y) AS neg
             FROM sc GROUP BY s),
    pre AS (
      SELECT s, pos, neg,
             coalesce(sum(neg) OVER (ORDER BY s
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS neg_below
      FROM bins),
    u AS (
      /* doubled U: ties at a bin contribute half -> pos*(2*neg_below + neg) */
      SELECT sum(pos * (2 * neg_below + neg)) AS u_x2,
             sum(pos) AS n_pos, sum(neg) AS n_neg
      FROM pre)
    SELECT CAST(n_pos AS BIGINT) AS n_pos, CAST(n_neg AS BIGINT) AS n_neg,
           CAST(u_x2 AS BIGINT) AS u_x2,
           CAST(round(CAST(u_x2 AS DOUBLE) / (2.0 * n_pos * n_neg), 4)
                AS DOUBLE) AS auc
    FROM u
    """,
)
def agg_auc_roc(spark, sf_dir):
    """Exact ROC-AUC at corpus scale via the rank-sum identity
    AUC = P(score⁺ > score⁻) + ½P(tie) = U/(n⁺·n⁻) — computed on SCORE
    BINS, never a global row sort: integer-bp scores bound the bin
    domain at ~9000 regardless of row count, each bin carries (pos, neg)
    counts, and the doubled U statistic Σ pos·(2·neg_below + neg) stays
    an exact integer (ties counted half, hence the ×2).  One hash
    aggregate + one cumulative window over the bin frame + a 1-row
    reduction; the only float op is the final division under r4."""
    sc = _scored(spark, sf_dir)
    bins = sc.groupBy("s").agg(
        F.sum("y").alias("pos"), (F.count("*") - F.sum("y")).alias("neg")
    )
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    pre = bins.withColumn(
        "neg_below", F.coalesce(F.sum("neg").over(w), F.lit(0))
    )
    u = pre.agg(
        F.sum(F.col("pos") * (2 * F.col("neg_below") + F.col("neg"))).alias("u_x2"),
        F.sum("pos").alias("n_pos"),
        F.sum("neg").alias("n_neg"),
    )
    return u.select(
        F.col("n_pos").cast("long").alias("n_pos"),
        F.col("n_neg").cast("long").alias("n_neg"),
        F.col("u_x2").cast("long").alias("u_x2"),
        r4(
            F.col("u_x2").cast("double") / (2.0 * F.col("n_pos") * F.col("n_neg"))
        ).alias("auc"),
    )


@register(
    "agg_calibration_bins",
    oracle=f"""
    WITH sc AS (
      SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
             {_SCORE_SQL} AS s
      FROM documents),
    b AS (SELECT least(s // 1000, 8) AS bin, y FROM sc)
    SELECT CAST(bin AS BIGINT) AS bin,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(y) AS BIGINT) AS n_pos,
           CAST(sum(y) * 10000 // count(*) AS BIGINT) AS empirical_bp,
           CAST(bin * 1000 + 500 AS BIGINT) AS predicted_mid_bp
    FROM b GROUP BY bin
    """,
)
def agg_calibration_bins(spark, sf_dir):
    """Reliability diagram (calibration) bins: group predictions by
    score decile and compare the bin's EMPIRICAL positive rate to its
    predicted midpoint — the diagnostic that separates a well-ranked
    model (high AUC) from a well-CALIBRATED one (rates match scores),
    which drift monitoring and threshold picking both need.

    One hash aggregate into ≤ 9 bins; rates are integer basis points
    (floor division — convention (b)), so the scored table is integer
    end-to-end and bit-stable at any scale."""
    sc = _scored(spark, sf_dir)
    b = sc.select(F.least(F.expr("s div 1000"), F.lit(8)).alias("bin"), "y")
    return b.groupBy("bin").agg(
        F.count("*").alias("n"),
        F.sum("y").alias("n_pos"),
        F.expr("sum(y) * 10000 div count(*)").alias("empirical_bp"),
        (F.col("bin") * 1000 + 500).cast("long").alias("predicted_mid_bp"),
    ).select("bin", "n", "n_pos", "empirical_bp", "predicted_mid_bp")


@register(
    "agg_confusion_prf",
    oracle=f"""
    WITH sc AS (
      SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
             CASE WHEN {_SCORE_SQL} >= 5000 THEN 1 ELSE 0 END AS p
      FROM documents),
    cm AS (
      SELECT sum(CASE WHEN p = 1 AND y = 1 THEN 1 ELSE 0 END) AS tp,
             sum(CASE WHEN p = 1 AND y = 0 THEN 1 ELSE 0 END) AS fp,
             sum(CASE WHEN p = 0 AND y = 1 THEN 1 ELSE 0 END) AS fn,
             sum(CASE WHEN p = 0 AND y = 0 THEN 1 ELSE 0 END) AS tn
      FROM sc)
    SELECT CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
           CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
           CAST(tp * 10000 // (tp + fp) AS BIGINT) AS precision_bp,
           CAST(tp * 10000 // (tp + fn) AS BIGINT) AS recall_bp,
           CAST(2 * tp * 10000 // (2 * tp + fp + fn) AS BIGINT) AS f1_bp
    FROM cm
    """,
)
def agg_confusion_prf(spark, sf_dir):
    """Confusion matrix + precision/recall/F1 at a fixed 0.5 threshold —
    the headline numbers of every filter evaluation, as ONE conditional
    hash aggregate (four CASE counters fold map-side; the metric ratios
    are integer basis points on the 1-row result, including F1 in its
    division-safe 2tp/(2tp+fp+fn) form)."""
    sc = _scored(spark, sf_dir).select(
        "y", F.when(F.col("s") >= 5000, 1).otherwise(0).alias("p")
    )
    cm = sc.agg(
        F.sum(F.when((F.col("p") == 1) & (F.col("y") == 1), 1).otherwise(0)).alias(
            "tp"
        ),
        F.sum(F.when((F.col("p") == 1) & (F.col("y") == 0), 1).otherwise(0)).alias(
            "fp"
        ),
        F.sum(F.when((F.col("p") == 0) & (F.col("y") == 1), 1).otherwise(0)).alias(
            "fn"
        ),
        F.sum(F.when((F.col("p") == 0) & (F.col("y") == 0), 1).otherwise(0)).alias(
            "tn"
        ),
    )
    return cm.select(
        "tp",
        "fp",
        "fn",
        "tn",
        F.expr("tp * 10000 div (tp + fp)").alias("precision_bp"),
        F.expr("tp * 10000 div (tp + fn)").alias("recall_bp"),
        F.expr("2 * tp * 10000 div (2 * tp + fp + fn)").alias("f1_bp"),
    )


@register(
    "agg_cohens_kappa",
    oracle="""
    WITH lab AS (
      SELECT CASE WHEN n_chars >= 250 THEN 1 ELSE 0 END AS a,
             CASE WHEN len(string_split(text, ' ')) >= 45 THEN 1 ELSE 0 END AS b
      FROM documents),
    cm AS (
      SELECT count(*) AS n,
             sum(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END) AS n11,
             sum(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END) AS n10,
             sum(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END) AS n01,
             sum(CASE WHEN a = 0 AND b = 0 THEN 1 ELSE 0 END) AS n00
      FROM lab)
    SELECT CAST(n AS BIGINT) AS n,
           CAST(n11 + n00 AS BIGINT) AS n_agree,
           CAST(round(
             (CAST(n AS DOUBLE) * (n11 + n00)
              - (CAST(n11 + n10 AS DOUBLE) * (n11 + n01)
                 + CAST(n01 + n00 AS DOUBLE) * (n10 + n00)))
             / (CAST(n AS DOUBLE) * n
                - (CAST(n11 + n10 AS DOUBLE) * (n11 + n01)
                   + CAST(n01 + n00 AS DOUBLE) * (n10 + n00))),
             4) + 0 AS DOUBLE) AS kappa
    FROM cm
    """,
)
def agg_cohens_kappa(spark, sf_dir):
    """Cohen's kappa between two label sources — the chance-corrected
    agreement score for annotator QA and heuristic-vs-model label audits
    (raw % agreement is inflated whenever one class dominates; kappa
    subtracts the agreement two independent raters would reach by
    chance).  The two 'annotators' here are deterministic quality rules
    (char-length ≥ 250 vs token-count ≥ 45 — correlated but not
    identical, so kappa is meaningfully between 0 and 1).

    One conditional hash aggregate produces the 2×2 table; kappa's
    (po − pe)/(1 − pe) runs cross-multiplied by n² so the only doubles
    are one textually-identical expression on the 1-row frame under
    r4."""
    lab = load_table(spark, sf_dir, "documents").select(
        F.when(F.col("n_chars") >= 250, 1).otherwise(0).alias("a"),
        F.when(F.size(F.split("text", " ")) >= 45, 1).otherwise(0).alias("b"),
    )
    cm = lab.agg(
        F.count("*").alias("n"),
        F.sum(F.when((F.col("a") == 1) & (F.col("b") == 1), 1).otherwise(0)).alias(
            "n11"
        ),
        F.sum(F.when((F.col("a") == 1) & (F.col("b") == 0), 1).otherwise(0)).alias(
            "n10"
        ),
        F.sum(F.when((F.col("a") == 0) & (F.col("b") == 1), 1).otherwise(0)).alias(
            "n01"
        ),
        F.sum(F.when((F.col("a") == 0) & (F.col("b") == 0), 1).otherwise(0)).alias(
            "n00"
        ),
    )
    n = F.col("n").cast("double")
    po_n = F.col("n11") + F.col("n00")
    pe_n2 = (F.col("n11") + F.col("n10")).cast("double") * (
        F.col("n11") + F.col("n01")
    ) + (F.col("n01") + F.col("n00")).cast("double") * (F.col("n10") + F.col("n00"))
    return cm.select(
        F.col("n").cast("long").alias("n"),
        po_n.cast("long").alias("n_agree"),
        r4((n * po_n - pe_n2) / (n * n - pe_n2)).alias("kappa"),
    )
