"""Distributed hypothesis-testing operators — the A/B-experiment and
data-drift battery a pipeline runs before/after every curation change
(did the quality filter shift the value distribution? is a metric
independent of segment? does a money column look fabricated?).

Scale design (100 TB):
* Every test reduces the corpus to SUFFICIENT STATISTICS with one hash
  aggregate of exact integers (cents via the ``round(value*100)``
  convention) — associative, order-independent partials in
  BIGINT/DECIMAL(38,0), so the statistic is bit-identical on any cluster
  layout.  The closed-form test algebra then runs in double on a frame of
  at most a few dozen rows (event types, contingency cells, digits).
* The rank tests (KS, Mann-Whitney) avoid the global sort a textbook
  implementation needs: values are exact cent integers, so the corpus
  first collapses to per-cent bin counts (domain-bounded — ≤ ~49k bins
  for this value range NO MATTER HOW MANY ROWS), and the ECDF/rank
  window runs over the tiny binned frame.  1e12 rows still produce the
  same ≤49k-row windowed stage; the unpartitioned window is over the
  bounded bin domain, never over raw rows.
* Argmax selections (KS location) compare INTEGER cross-products
  (n2·cum1 − n1·cum2) instead of float ECDF differences, so the peak
  position can never flip on a last-ulp disagreement between engines.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from biggie_spark.io import load_table
from biggie_spark.registry import register
from biggie_spark.util import lineage_cap, r4


def _cents(col: str = "value") -> F.Column:
    return F.round(F.col(col) * 100, 0).cast("long")


@register(
    "agg_ttest_welch",
    oracle="""
    WITH m AS (
      SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS c
      FROM events),
    s AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(c) AS DOUBLE) AS s1,
             CAST(sum(CAST(c AS HUGEINT) * c) AS DOUBLE) AS s2
      FROM m GROUP BY event_type),
    v AS (
      SELECT event_type, n, s1 / n AS mu,
             (s2 - s1 * s1 / n) / (n - 1) AS var
      FROM s)
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           a.n AS n_a, b.n AS n_b,
           CAST(round((a.mu - b.mu)
                / sqrt(a.var / a.n + b.var / b.n), 4) + 0 AS DOUBLE) AS t_stat,
           CAST(round(pow(a.var / a.n + b.var / b.n, 2)
                / (pow(a.var / a.n, 2) / (a.n - 1)
                   + pow(b.var / b.n, 2) / (b.n - 1)), 4) AS DOUBLE) AS dof
    FROM v a JOIN v b ON a.event_type < b.event_type
    """,
)
def agg_ttest_welch(spark, sf_dir):
    """Welch's unequal-variance t-test for every pair of event types — the
    default two-sample mean comparison (experiment readouts, before/after
    filter drift) because it never assumes equal variances.

    One corpus scan folds each type to (n, Σc, Σc²) in exact integers
    (Σc² in DECIMAL(38,0)/HUGEINT — cents² ≈ 2.4e9 per row overflows
    BIGINT past ~4e9 rows); the t statistic and Welch–Satterthwaite dof
    run in textually identical double algebra on the ~5-row moment frame,
    self-joined pairwise (a 5×5 broadcast triangle, never a data-side
    cross product)."""
    s = (
        load_table(spark, sf_dir, "events")
        .select("event_type", _cents().alias("c"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("c").cast("double").alias("s1"),
            F.sum((F.col("c") * F.col("c")).cast("decimal(38,0)"))
            .cast("double")
            .alias("s2"),
        )
    )
    v = s.select(
        "event_type",
        "n",
        (F.col("s1") / F.col("n")).alias("mu"),
        ((F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1)).alias(
            "var"
        ),
    )
    a = v.select(
        F.col("event_type").alias("type_a"),
        F.col("n").alias("n_a"),
        F.col("mu").alias("mu_a"),
        F.col("var").alias("var_a"),
    )
    b = v.select(
        F.col("event_type").alias("type_b"),
        F.col("n").alias("n_b"),
        F.col("mu").alias("mu_b"),
        F.col("var").alias("var_b"),
    )
    se_a = F.col("var_a") / F.col("n_a")
    se_b = F.col("var_b") / F.col("n_b")
    return (
        a.join(F.broadcast(b), F.col("type_a") < F.col("type_b"))
        .select(
            "type_a",
            "type_b",
            "n_a",
            "n_b",
            r4((F.col("mu_a") - F.col("mu_b")) / F.sqrt(se_a + se_b)).alias("t_stat"),
            r4(
                F.pow(se_a + se_b, 2)
                / (
                    F.pow(se_a, 2) / (F.col("n_a") - 1)
                    + F.pow(se_b, 2) / (F.col("n_b") - 1)
                )
            ).alias("dof"),
        )
    )


@register(
    "agg_chi2_independence",
    oracle="""
    WITH obs AS (
      SELECT o_orderpriority AS r, o_orderstatus AS col, count(*) AS o
      FROM orders GROUP BY r, col),
    rm AS (SELECT r, sum(o) AS rt FROM obs GROUP BY r),
    cm AS (SELECT col, sum(o) AS ct FROM obs GROUP BY col),
    tot AS (SELECT sum(o) AS n FROM obs),
    cells AS (
      SELECT obs.r, obs.col, obs.o,
             CAST(rm.rt AS DOUBLE) * cm.ct / tot.n AS e
      FROM obs JOIN rm USING (r) JOIN cm USING (col) CROSS JOIN tot)
    SELECT CAST(count(*) AS BIGINT) AS n_cells,
           CAST(round(sum((o - e) * (o - e) / e), 4) AS DOUBLE) AS chi2,
           CAST((SELECT count(*) FROM rm) - 1 AS BIGINT)
             * CAST((SELECT count(*) FROM cm) - 1 AS BIGINT) AS dof
    FROM cells
    """,
)
def agg_chi2_independence(spark, sf_dir):
    """Pearson chi-square test of independence between order priority and
    order status — the categorical-drift / segment-dependence check.

    The contingency table is ONE hash aggregate of the fact table (exact
    integer counts); marginals derive from the tiny cell frame itself
    (15 rows here, never a rescan), join back as broadcasts, and the
    χ² = Σ(o−e)²/e fold plus (r−1)(c−1) dof run on that cell frame.  The
    only corpus-sized work is the first groupBy — everything after is
    O(cells)."""
    obs = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("r"), F.col("o_orderstatus").alias("col")
        )
        .agg(F.count("*").alias("o"))
    )
    obs = obs.transform(lineage_cap)  # tiny cell frame feeds 4 branches
    rm = obs.groupBy("r").agg(F.sum("o").alias("rt"))
    cm = obs.groupBy("col").agg(F.sum("o").alias("ct"))
    tot = obs.agg(F.sum("o").alias("n"))
    n_r = rm.agg(F.count("*").alias("nr"))
    n_c = cm.agg(F.count("*").alias("nc"))
    cells = (
        obs.join(F.broadcast(rm), "r")
        .join(F.broadcast(cm), "col")
        .crossJoin(F.broadcast(tot))
        .select(
            "o",
            (F.col("rt").cast("double") * F.col("ct") / F.col("n")).alias("e"),
        )
    )
    chi = cells.agg(
        F.count("*").alias("n_cells"),
        r4(F.sum((F.col("o") - F.col("e")) * (F.col("o") - F.col("e")) / F.col("e"))).alias(
            "chi2"
        ),
    )
    return (
        chi.crossJoin(F.broadcast(n_r))
        .crossJoin(F.broadcast(n_c))
        .select(
            "n_cells",
            "chi2",
            ((F.col("nr") - 1) * (F.col("nc") - 1)).cast("long").alias("dof"),
        )
    )


@register(
    "agg_ks_twosample",
    oracle="""
    WITH m AS (
      SELECT CAST(round(value * 100, 0) AS BIGINT) AS c,
             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS s1,
             CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS s2
      FROM events WHERE event_type IN ('click', 'view')),
    bins AS (
      SELECT c, sum(s1) AS a, sum(s2) AS b FROM m GROUP BY c),
    tot AS (SELECT sum(a) AS n1, sum(b) AS n2 FROM bins),
    ecdf AS (
      SELECT c,
             sum(a) OVER (ORDER BY c) AS ca,
             sum(b) OVER (ORDER BY c) AS cb
      FROM bins),
    dev AS (
      SELECT c, abs(tot.n2 * ca - tot.n1 * cb) AS d_scaled, tot.n1, tot.n2
      FROM ecdf CROSS JOIN tot),
    peak AS (
      SELECT c, d_scaled, n1, n2,
             row_number() OVER (ORDER BY d_scaled DESC, c) AS rn
      FROM dev)
    SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
           CAST(round(CAST(d_scaled AS DOUBLE) / (n1 * n2), 4) AS DOUBLE)
             AS ks_d,
           CAST(round(c / 100.0, 4) AS DOUBLE) AS ks_at_value
    FROM peak WHERE rn = 1
    """,
)
def agg_ks_twosample(spark, sf_dir):
    """Two-sample Kolmogorov–Smirnov statistic (click vs view values) with
    its location — the standard distribution-drift detector.

    No global row sort: values are exact cents, so the corpus collapses
    to per-cent bin counts first (domain-bounded at ~49k bins for this
    value range REGARDLESS of row count — 1e12 rows yield the same binned
    frame), and the ECDF cumsum windows over that tiny frame.  The max
    deviation compares the integer cross-product |n2·cum1 − n1·cum2|, so
    the argmax (tie-break: smallest value) is exact; the float D = that
    integer / (n1·n2) is a single deterministic division under r4."""
    m = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "view"))
        .select(
            _cents().alias("c"),
            F.when(F.col("event_type") == "click", 1).otherwise(0).alias("s1"),
            F.when(F.col("event_type") == "view", 1).otherwise(0).alias("s2"),
        )
    )
    bins = m.groupBy("c").agg(F.sum("s1").alias("a"), F.sum("s2").alias("b"))
    bins = bins.transform(lineage_cap)  # bounded-domain frame feeds ecdf + totals
    tot = bins.agg(F.sum("a").alias("n1"), F.sum("b").alias("n2"))
    w = Window.orderBy("c").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ecdf = bins.select(
        "c", F.sum("a").over(w).alias("ca"), F.sum("b").over(w).alias("cb")
    )
    dev = ecdf.crossJoin(F.broadcast(tot)).select(
        "c",
        F.abs(F.col("n2") * F.col("ca") - F.col("n1") * F.col("cb")).alias("d_scaled"),
        "n1",
        "n2",
    )
    rw = Window.orderBy(F.col("d_scaled").desc(), "c")
    return (
        dev.withColumn("rn", F.row_number().over(rw))
        .filter(F.col("rn") == 1)
        .select(
            "n1",
            "n2",
            r4(F.col("d_scaled").cast("double") / (F.col("n1") * F.col("n2"))).alias(
                "ks_d"
            ),
            r4(F.col("c") / 100.0).alias("ks_at_value"),
        )
    )


@register(
    "agg_mann_whitney",
    oracle="""
    WITH m AS (
      SELECT CAST(round(value * 100, 0) AS BIGINT) AS c,
             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS s1,
             CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS s2
      FROM events WHERE event_type IN ('click', 'view')),
    bins AS (SELECT c, sum(s1) AS a, sum(s2) AS b FROM m GROUP BY c),
    tot AS (SELECT sum(a) AS n1, sum(b) AS n2 FROM bins),
    pre AS (
      SELECT c, a, b,
             coalesce(sum(a + b) OVER (ORDER BY c
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
      FROM bins),
    ranks AS (
      /* doubled rank-sum of sample 1: ties share the average rank of
         their bin's occupied positions -> 2*avg = 2*cum_before + (a+b) + 1 */
      SELECT sum(a * (2 * cum_before + a + b + 1)) AS r1_x2,
             sum(CAST(a + b AS HUGEINT) * (a + b) * (a + b) - (a + b)) AS tie_term
      FROM pre)
    SELECT CAST(tot.n1 AS BIGINT) AS n1, CAST(tot.n2 AS BIGINT) AS n2,
           CAST(ranks.r1_x2 - tot.n1 * (tot.n1 + 1) AS BIGINT) AS u1_x2,
           CAST(round(
             (CAST(ranks.r1_x2 - tot.n1 * (tot.n1 + 1) AS DOUBLE) / 2
              - CAST(tot.n1 AS DOUBLE) * tot.n2 / 2)
             / sqrt(CAST(tot.n1 AS DOUBLE) * tot.n2 / 12
                    * ((tot.n1 + tot.n2 + 1)
                       - CAST(ranks.tie_term AS DOUBLE)
                         / ((tot.n1 + tot.n2) * (tot.n1 + tot.n2 - 1)))),
             4) + 0 AS DOUBLE) AS z
    FROM ranks CROSS JOIN tot
    """,
)
def agg_mann_whitney(spark, sf_dir):
    """Mann–Whitney U (Wilcoxon rank-sum) test, click vs view — the
    nonparametric location test that survives the heavy-tailed metric
    distributions where a t-test misleads.

    The textbook version ranks the pooled sample (a global sort).  Here
    ranks come from the SAME bounded cent-bin frame as the KS op: a bin
    holding (a, b) occurrences occupies positions cum_before+1 …
    cum_before+a+b, so its shared average rank is (2·cum_before+a+b+1)/2
    — kept DOUBLED so the rank-sum R1 and U1 stay exact integers.  The
    tie-corrected normal z-score runs in double on the 1-row reduction.
    The corpus-sized work is one hash aggregate; the window is over ≤49k
    bins at any data scale."""
    m = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "view"))
        .select(
            _cents().alias("c"),
            F.when(F.col("event_type") == "click", 1).otherwise(0).alias("s1"),
            F.when(F.col("event_type") == "view", 1).otherwise(0).alias("s2"),
        )
    )
    bins = m.groupBy("c").agg(F.sum("s1").alias("a"), F.sum("s2").alias("b"))
    bins = bins.transform(lineage_cap)
    tot = bins.agg(F.sum("a").alias("n1"), F.sum("b").alias("n2"))
    w = Window.orderBy("c").rowsBetween(Window.unboundedPreceding, -1)
    pre = bins.select(
        "a",
        "b",
        F.coalesce(F.sum(F.col("a") + F.col("b")).over(w), F.lit(0)).alias(
            "cum_before"
        ),
    )
    t = F.col("a") + F.col("b")
    ranks = pre.agg(
        F.sum(F.col("a") * (2 * F.col("cum_before") + t + 1)).alias("r1_x2"),
        F.sum(t.cast("decimal(38,0)") * t * t - t).alias("tie_term"),
    )
    j = ranks.crossJoin(F.broadcast(tot))
    u1_x2 = F.col("r1_x2") - F.col("n1") * (F.col("n1") + 1)
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    var = (
        n1d
        * n2d
        / 12
        * (
            (F.col("n1") + F.col("n2") + 1)
            - F.col("tie_term").cast("double")
            / ((F.col("n1") + F.col("n2")) * (F.col("n1") + F.col("n2") - 1))
        )
    )
    return j.select(
        F.col("n1").cast("long").alias("n1"),
        F.col("n2").cast("long").alias("n2"),
        u1_x2.cast("long").alias("u1_x2"),
        r4((u1_x2.cast("double") / 2 - n1d * n2d / 2) / F.sqrt(var)).alias("z"),
    )


@register(
    "agg_benford_digits",
    oracle="""
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT)
                         AS VARCHAR), 1, 1) AS INTEGER) AS digit
      FROM orders),
    obs AS (SELECT digit, count(*) AS o FROM d GROUP BY digit),
    tot AS (SELECT sum(o) AS n FROM obs)
    SELECT digit, CAST(o AS BIGINT) AS obs,
           CAST(round(tot.n * log10(1 + 1.0 / digit), 4) AS DOUBLE)
             AS expected,
           CAST(round(pow(o - tot.n * log10(1 + 1.0 / digit), 2)
                / (tot.n * log10(1 + 1.0 / digit)), 4) AS DOUBLE)
             AS chi2_part
    FROM obs CROSS JOIN tot
    """,
)
def agg_benford_digits(spark, sf_dir):
    """Benford's-law first-digit audit of order totals — the classic
    fabricated-data / corrupted-ingest smell test for money columns.

    The first significant digit is extracted from the STRING form of the
    exact cent integer (cents ≥ 1, so the leading character IS the first
    significant digit) — no float log10 of the value, whose boundary
    behavior (99.999…) differs between engines.  Digit counts are one
    exact hash aggregate; expected Benford mass n·log10(1+1/d) and the
    per-digit χ² contribution run on the 9-row frame against the 1-row
    total broadcast."""
    d = load_table(spark, sf_dir, "orders").select(
        F.substring(
            F.round(F.col("o_totalprice") * 100, 0).cast("long").cast("string"), 1, 1
        )
        .cast("int")
        .alias("digit")
    )
    obs = d.groupBy("digit").agg(F.count("*").alias("o"))
    tot = obs.agg(F.sum("o").alias("n"))
    exp = F.col("n") * F.log10(1 + 1.0 / F.col("digit"))
    return obs.crossJoin(F.broadcast(tot)).select(
        "digit",
        F.col("o").cast("long").alias("obs"),
        r4(exp).alias("expected"),
        r4(F.pow(F.col("o") - exp, 2) / exp).alias("chi2_part"),
    )


_BS_B = 32  # bootstrap replicas
# Poisson(1) pmf quantized to u ~ Uniform{0..999}: cumulative cut points for
# w = 0,1,2,3,4,5 (the >=5 tail folds into 5; total mass error < 0.4%)
_BS_CUTS = (368, 736, 920, 981, 996)


def _bs_w_sql(u: str) -> str:
    c = _BS_CUTS
    return (
        f"CASE WHEN {u} < {c[0]} THEN 0 WHEN {u} < {c[1]} THEN 1 "
        f"WHEN {u} < {c[2]} THEN 2 WHEN {u} < {c[3]} THEN 3 "
        f"WHEN {u} < {c[4]} THEN 4 ELSE 5 END"
    )


@register(
    "agg_bootstrap_ci",
    oracle=f"""
    WITH e AS (
      SELECT event_id, CAST(round(value * 100, 0) AS BIGINT) AS c
      FROM events WHERE event_type = 'purchase'),
    rep AS (
      SELECT b.v AS b, e.event_id, e.c,
             {_bs_w_sql("CAST(('0x' || substr(md5('bs:' || CAST(b.v AS VARCHAR) "
                        "|| ':' || CAST(e.event_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000")}
               AS w
      FROM e, range({_BS_B}) b(v)),
    means AS (
      SELECT b, CAST(sum(w * c) AS DOUBLE) / sum(w) AS m
      FROM rep GROUP BY b),
    ranked AS (
      SELECT m, row_number() OVER (ORDER BY m, b) AS rn FROM means),
    point AS (SELECT CAST(sum(c) AS DOUBLE) / count(*) AS pm,
                     CAST(count(*) AS BIGINT) AS n
              FROM e)
    SELECT CAST(point.n AS BIGINT) AS n,
           CAST(round(point.pm / 100, 4) AS DOUBLE) AS mean_value,
           CAST(round((SELECT m FROM ranked WHERE rn = 2) / 100, 4) AS DOUBLE)
             AS ci_lo,
           CAST(round((SELECT m FROM ranked WHERE rn = {_BS_B - 1}) / 100, 4)
                AS DOUBLE) AS ci_hi
    FROM point
    """,
)
def agg_bootstrap_ci(spark, sf_dir):
    """Poisson-bootstrap confidence interval for the mean purchase value —
    THE distributed error-bar technique: classic bootstrap resampling
    needs n draws per replica from the full dataset (impossible without
    a global index), but for large n the per-row multiplicity in a
    resample is ~Poisson(1), so each row independently assigns itself a
    weight per replica in ONE streaming pass — no sampling coordination,
    no second scan.

    Determinism: the Poisson draw is the portable md5 idiom quantized
    through a fixed 1000-cell inverse-CDF table (cut points 368/736/920/
    981/996 — the Poisson(1) pmf to 3 digits, >=5 tail folded), so both
    engines draw the IDENTICAL weights and every replica mean matches
    exactly.  Replica means use exact integer (Σw·c, Σw) pairs; the 95%
    interval takes the 2nd/31st order statistic of the 32 replica means
    (rank over the 32-row frame, b tie-break).  Scale: the ×32 replica
    fan-out is map-side (explode + hash agg with partial combine —
    shuffle carries 32 partial pairs per partition, not rows); at 100 TB
    the cost is 32 extra integer multiplies per row."""
    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("event_id", _cents().alias("c"))
    )
    e = e.transform(lineage_cap)  # feeds point estimate + replica fan-out
    reps = e.select(
        "event_id",
        "c",
        F.explode(F.array(*[F.lit(i) for i in range(_BS_B)])).alias("b"),
    )
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("bs:"),
                        F.col("b").cast("string"),
                        F.lit(":"),
                        F.col("event_id").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 1000
    )
    c0, c1, c2, c3, c4 = _BS_CUTS
    w = (
        F.when(u < c0, 0)
        .when(u < c1, 1)
        .when(u < c2, 2)
        .when(u < c3, 3)
        .when(u < c4, 4)
        .otherwise(5)
    )
    means = (
        reps.withColumn("w", w)
        .groupBy("b")
        .agg(
            (F.sum(F.col("w") * F.col("c")).cast("double") / F.sum("w")).alias("m")
        )
    )
    from pyspark.sql import Window

    ranked = means.withColumn(
        "rn", F.row_number().over(Window.orderBy("m", "b"))
    )
    lo = ranked.filter(F.col("rn") == 2).select(F.col("m").alias("lo"))
    hi = ranked.filter(F.col("rn") == _BS_B - 1).select(F.col("m").alias("hi"))
    point = e.agg(
        F.count("*").alias("n"),
        (F.sum("c").cast("double") / F.count("*")).alias("pm"),
    )
    return (
        point.crossJoin(F.broadcast(lo))
        .crossJoin(F.broadcast(hi))
        .select(
            "n",
            r4(F.col("pm") / 100).alias("mean_value"),
            r4(F.col("lo") / 100).alias("ci_lo"),
            r4(F.col("hi") / 100).alias("ci_hi"),
        )
    )


@register(
    "agg_survival_km",
    oracle="""
    WITH v AS (
      SELECT user_id, min(epoch_us(ts)) AS t_view
      FROM events WHERE event_type = 'view' GROUP BY user_id),
    p AS (
      SELECT e.user_id,
             min(epoch_us(e.ts)) FILTER (
               WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= v.t_view)
               AS t_buy
      FROM events e JOIN v USING (user_id) GROUP BY e.user_id),
    horizon AS (SELECT max(epoch_us(ts)) AS t_end FROM events),
    subj AS (
      SELECT v.user_id,
             CASE WHEN p.t_buy IS NULL
                  THEN ((SELECT t_end FROM horizon) - v.t_view) // 3600000000
                  ELSE (p.t_buy - v.t_view) // 3600000000 END AS t_h,
             CASE WHEN p.t_buy IS NULL THEN 0 ELSE 1 END AS ev
      FROM v JOIN p USING (user_id)),
    risk AS (
      SELECT t_h, sum(ev) AS d,
             (SELECT count(*) FROM subj) 
               - coalesce(sum(count(*)) OVER (ORDER BY t_h
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n
      FROM subj GROUP BY t_h),
    km AS (
      /* d = n empties the risk set: the factor is 0 and survival is 0
         from there on; the ln-fold skips it via a neutral 1.0 and a
         cumulative zero flag applies the hard zero */
      SELECT t_h, d, n,
             CASE WHEN max(CASE WHEN d = n THEN 1 ELSE 0 END)
                       OVER (ORDER BY t_h) = 1
                  THEN 0.0
                  ELSE exp(sum(ln(CASE WHEN d = n THEN 1.0
                                       ELSE 1.0 - CAST(d AS DOUBLE) / n END))
                           OVER (ORDER BY t_h)) END AS s
      FROM risk WHERE d > 0)
    SELECT CAST(t_h AS BIGINT) AS t_hours, CAST(d AS BIGINT) AS n_events,
           CAST(n AS BIGINT) AS n_at_risk,
           CAST(round(s, 4) AS DOUBLE) AS survival
    FROM km
    """,
)
def agg_survival_km(spark, sf_dir):
    """Kaplan-Meier survival curve for time-to-purchase after first view,
    with right-censoring at the corpus horizon -- the product-limit
    estimator behind churn, conversion-lag, and reliability analysis
    (users who never purchase are CENSORED at t_end, not dropped: naive
    'average time to buy' over converters only is biased).

    Event times quantize to whole hours (exact integer microseconds
    div 3600000000), so the risk-set table is domain-bounded like the
    KS/Mann-Whitney bins; the at-risk count n(t) derives from one
    cumulative window over the grouped frame (no per-subject window),
    and the survival product folds as exp(Σ ln(1 - d/n)) -- a SEQUENTIAL
    cumulative window in ascending t on both engines, so the float fold
    order is pinned and r4 agrees.  Plan: two groupBy(user) passes
    (first-view, first-purchase -- both shuffle on user_id), a 1-row
    horizon broadcast, then everything runs on the bounded hour frame."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    ev = ev.transform(lineage_cap)  # feeds views + purchases + horizon
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("us").alias("t_view"))
    )
    p = (
        ev.join(v, "user_id")
        .groupBy("user_id")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("us") >= F.col("t_view")),
                    F.col("us"),
                )
            ).alias("t_buy")
        )
    )
    horizon = ev.agg(F.max("us").alias("t_end"))
    subj = (
        v.join(p, "user_id")
        .crossJoin(F.broadcast(horizon))
        .select(
            F.when(
                F.col("t_buy").isNull(),
                F.expr("(t_end - t_view) div 3600000000"),
            )
            .otherwise(F.expr("(t_buy - t_view) div 3600000000"))
            .alias("t_h"),
            F.when(F.col("t_buy").isNull(), 0).otherwise(1).alias("ev"),
        )
    )
    subj = subj.transform(lineage_cap)  # bounded frame feeds total + risk sets
    n_total = subj.agg(F.count("*").alias("n_subj"))
    from pyspark.sql import Window

    w_before = Window.orderBy("t_h").rowsBetween(Window.unboundedPreceding, -1)
    risk = (
        subj.groupBy("t_h")
        .agg(F.sum("ev").alias("d"), F.count("*").alias("c"))
        .crossJoin(F.broadcast(n_total))
        .withColumn(
            "n",
            F.col("n_subj") - F.coalesce(F.sum("c").over(w_before), F.lit(0)),
        )
    )
    w_cum = Window.orderBy("t_h").rowsBetween(Window.unboundedPreceding, 0)
    factor = F.when(F.col("d") == F.col("n"), F.lit(1.0)).otherwise(
        1.0 - F.col("d").cast("double") / F.col("n")
    )
    zeroed = F.max(F.when(F.col("d") == F.col("n"), 1).otherwise(0)).over(w_cum)
    km = (
        risk.filter(F.col("d") > 0)
        # d = n (risk set empties) -> hard zero survival from that point;
        # the ln fold sees a neutral 1.0 so it never takes log(0)
        .withColumn(
            "s",
            F.when(zeroed == 1, F.lit(0.0)).otherwise(
                F.exp(F.sum(F.log(factor)).over(w_cum))
            ),
        )
    )
    return km.select(
        F.col("t_h").cast("long").alias("t_hours"),
        F.col("d").cast("long").alias("n_events"),
        F.col("n").cast("long").alias("n_at_risk"),
        r4(F.col("s")).alias("survival"),
    )


@register(
    "agg_outlier_iqr",
    oracle="""
    WITH c AS (
      SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS cents,
             event_id
      FROM events),
    r AS (
      SELECT event_type, cents,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY cents, event_id) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM c),
    q AS (
      /* discrete quartiles via rank positions (the engine-portable
         formulation from agg_percentile_disc) */
      SELECT event_type,
             max(CASE WHEN rn * 4 <= n THEN cents END) AS q1,
             max(CASE WHEN rn * 4 <= 3 * n THEN cents END) AS q3
      FROM r GROUP BY event_type),
    flagged AS (
      /* Tukey fences at 1.5 IQR, cross-multiplied by 2 to stay integer:
         outlier iff 2c < 2q1 - 3(q3 - q1) or 2c > 2q3 + 3(q3 - q1) */
      SELECT c.event_type, c.cents, q.q1, q.q3,
             CASE WHEN 2 * c.cents < 2 * q.q1 - 3 * (q.q3 - q.q1)
                    OR 2 * c.cents > 2 * q.q3 + 3 * (q.q3 - q.q1)
                  THEN 1 ELSE 0 END AS is_out
      FROM c JOIN q ON q.event_type = c.event_type)
    SELECT event_type,
           CAST(any_value(q1) AS BIGINT) AS q1_cents,
           CAST(any_value(q3) AS BIGINT) AS q3_cents,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(is_out) AS BIGINT) AS n_outliers,
           CAST(max(CASE WHEN is_out = 1 THEN cents END) AS BIGINT)
             AS worst_cents
    FROM flagged GROUP BY event_type
    """,
)
def agg_outlier_iqr(spark, sf_dir):
    """Tukey-fence (boxplot) outlier detection per event type — the
    robust univariate screen (1.5×IQR beyond the quartiles) that data
    validation runs before z-scores, because quartiles shrug off the
    very outliers being hunted.

    Quartiles are DISCRETE rank positions over exact cents (the
    portable formulation — no interpolation, no float percentile), and
    the fences cross-multiply by 2 so the outlier predicate is pure
    BIGINT: a value on the fence classifies identically in both engines,
    which a float 1.5×IQR cannot promise.  Plan: one ranking window per
    type for the quartiles (bounded output), broadcast back onto the
    corpus scan for the flag-and-count pass — two reads or one window,
    both linear; the broadcast form shown here keeps the second pass
    scan-shaped for 100 TB."""
    c = load_table(spark, sf_dir, "events").select(
        "event_type", _cents().alias("cents"), "event_id"
    )
    c = c.transform(lineage_cap)  # feeds quartile + flag passes
    w = Window.partitionBy("event_type").orderBy("cents", "event_id")
    wn = Window.partitionBy("event_type")
    r = c.select(
        "event_type",
        "cents",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wn).alias("n"),
    )
    q = r.groupBy("event_type").agg(
        F.max(F.when(F.col("rn") * 4 <= F.col("n"), F.col("cents"))).alias("q1"),
        F.max(F.when(F.col("rn") * 4 <= 3 * F.col("n"), F.col("cents"))).alias("q3"),
    )
    iqr3 = 3 * (F.col("q3") - F.col("q1"))
    is_out = (
        (2 * F.col("cents") < 2 * F.col("q1") - iqr3)
        | (2 * F.col("cents") > 2 * F.col("q3") + iqr3)
    ).cast("int")
    flagged = c.join(F.broadcast(q), "event_type").withColumn("is_out", is_out)
    return flagged.groupBy("event_type").agg(
        F.first("q1").alias("q1_cents"),
        F.first("q3").alias("q3_cents"),
        F.count("*").alias("n"),
        F.sum("is_out").alias("n_outliers"),
        F.max(F.when(F.col("is_out") == 1, F.col("cents"))).alias("worst_cents"),
    )


@register(
    "agg_cuped",
    oracle="""
    WITH span AS (
      SELECT min(epoch_us(ts)) AS t0, max(epoch_us(ts)) AS t1 FROM events),
    u AS (
      SELECT user_id,
             sum(CASE WHEN epoch_us(ts) < (SELECT (t0 + t1) / 2 FROM span)
                      THEN CAST(round(value * 100, 0) AS BIGINT) ELSE 0 END)
               AS pre,
             sum(CASE WHEN epoch_us(ts) >= (SELECT (t0 + t1) / 2 FROM span)
                      THEN CAST(round(value * 100, 0) AS BIGINT) ELSE 0 END)
               AS post
      FROM events GROUP BY user_id),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(pre) AS DOUBLE) AS sx,
             CAST(sum(post) AS DOUBLE) AS sy,
             CAST(sum(CAST(pre AS HUGEINT) * post) AS DOUBLE) AS sxy,
             CAST(sum(CAST(pre AS HUGEINT) * pre) AS DOUBLE) AS sxx,
             CAST(sum(CAST(post AS HUGEINT) * post) AS DOUBLE) AS syy
      FROM u),
    d AS (
      SELECT n,
             (sxy - sx * sy / n) / (sxx - sx * sx / n) AS theta,
             (syy - sy * sy / n) / n AS var_post,
             pow(sxy - sx * sy / n, 2)
               / ((sxx - sx * sx / n) * (syy - sy * sy / n)) AS rho2
      FROM s)
    SELECT n,
           CAST(round(theta, 4) + 0 AS DOUBLE) AS theta,
           CAST(round(var_post / 10000, 4) AS DOUBLE) AS var_post_dollars2,
           CAST(round(var_post * (1 - rho2) / 10000, 4) AS DOUBLE)
             AS var_cuped_dollars2,
           CAST(round(rho2 * 10000, 4) AS DOUBLE) AS var_reduction_bp
    FROM d
    """,
)
def agg_cuped(spark, sf_dir):
    """CUPED variance reduction — the experimentation-platform standard
    (Deng et al.): adjust each user's experiment-period metric by their
    PRE-period value, Y' = Y − θ(X − X̄) with θ = cov(X,Y)/var(X), and
    the metric's variance drops by exactly the squared correlation ρ² —
    here measured on the corpus split at its temporal midpoint (first
    half = covariate, second half = metric).

    All five sufficient statistics accumulate as exact integers
    (HUGEINT/DECIMAL(38,0) cross-products of per-user cent totals — the
    agg_ols_fit discipline), so θ, the raw and CUPED-adjusted variances,
    and the variance-reduction share are one textually-identical double
    expression on a 1-row frame under r4.  One groupBy(user) pass plus a
    1-row span broadcast — the cheap pre-analysis that tells an
    experiment team how much sample size CUPED will buy BEFORE they run
    the experiment."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("us"), _cents().alias("c")
    )
    ev = ev.transform(lineage_cap)  # feeds span + per-user split
    span = ev.agg(F.min("us").alias("t0"), F.max("us").alias("t1"))
    u = (
        ev.crossJoin(F.broadcast(span))
        .withColumn("mid", (F.col("t0") + F.col("t1")) / 2)
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("us") < F.col("mid"), F.col("c")).otherwise(0)).alias(
                "pre"
            ),
            F.sum(
                F.when(F.col("us") >= F.col("mid"), F.col("c")).otherwise(0)
            ).alias("post"),
        )
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    s = u.agg(
        F.count("*").alias("n"),
        F.sum("pre").cast("double").alias("sx"),
        F.sum("post").cast("double").alias("sy"),
        F.sum(dec(F.col("pre")) * dec(F.col("post"))).cast("double").alias("sxy"),
        F.sum(dec(F.col("pre")) * dec(F.col("pre"))).cast("double").alias("sxx"),
        F.sum(dec(F.col("post")) * dec(F.col("post"))).cast("double").alias("syy"),
    )
    n = F.col("n")
    cxy = F.col("sxy") - F.col("sx") * F.col("sy") / n
    cxx = F.col("sxx") - F.col("sx") * F.col("sx") / n
    cyy = F.col("syy") - F.col("sy") * F.col("sy") / n
    theta = cxy / cxx
    var_post = cyy / n
    rho2 = F.pow(cxy, 2) / (cxx * cyy)
    return s.select(
        F.col("n").cast("long").alias("n"),
        r4(theta).alias("theta"),
        r4(var_post / 10000).alias("var_post_dollars2"),
        r4(var_post * (1 - rho2) / 10000).alias("var_cuped_dollars2"),
        r4(rho2 * 10000).alias("var_reduction_bp"),
    )


@register(
    "agg_power_analysis",
    oracle="""
    WITH m AS (
      SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS c
      FROM events),
    s AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(c) AS DOUBLE) AS s1,
             CAST(sum(CAST(c AS HUGEINT) * c) AS DOUBLE) AS s2
      FROM m GROUP BY event_type),
    v AS (
      SELECT event_type, n, s1 / n AS mu,
             (s2 - s1 * s1 / n) / (n - 1) AS var
      FROM s)
    SELECT event_type, n AS n_current,
           CAST(round(mu / 100, 4) AS DOUBLE) AS mean_value,
           /* n per arm = 2 (z_{0.975} + z_{0.80})^2 sigma^2 / delta^2,
              delta = 5% of the mean.  (z_{0.975}+z_{0.80})^2 is pinned as
              the fully-evaluated 17-digit double literal on BOTH sides —
              a 1-ulp pow() divergence between engines could flip ceil()
              to n±1 (ADVICE r4) */
           CAST(CAST(ceil(2.0 * 7.848878512225001 * var
                          / pow(0.05 * mu, 2)) AS BIGINT) AS BIGINT)
             AS n_per_arm_5pct
    FROM v
    """,
)
def agg_power_analysis(spark, sf_dir):
    """A/B-test power analysis from live data — the planning step before
    any experiment: with each event type's CURRENT variance, how many
    samples per arm detect a 5% lift in the mean at alpha = 0.05 / power
    = 0.80?  n = 2(z_{0.975}+z_{0.80})^2 * sigma^2 / delta^2, with the z
    constants pinned as 6-decimal literals (both engines evaluate the
    identical expression; no quantile function at runtime).

    Pairs with agg_cuped (whose variance-reduction share divides
    straight into this n) and agg_ttest_welch (the readout once the
    experiment runs).  Sufficient statistics accumulate as exact
    integers, same as the rest of the family; one pass, five rows out."""
    s = (
        load_table(spark, sf_dir, "events")
        .select("event_type", _cents().alias("c"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("c").cast("double").alias("s1"),
            F.sum((F.col("c") * F.col("c")).cast("decimal(38,0)"))
            .cast("double")
            .alias("s2"),
        )
    )
    mu = F.col("s1") / F.col("n")
    var = (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1)
    # (z_{0.975}+z_{0.80})^2 pinned as the same fully-evaluated double
    # literal the oracle uses — never recomputed via pow() (ADVICE r4:
    # a 1-ulp pow divergence can flip the ceil() below to n±1).
    z = 7.848878512225001
    return s.select(
        "event_type",
        F.col("n").alias("n_current"),
        r4(mu / 100).alias("mean_value"),
        F.ceil(2.0 * F.lit(z) * var / F.pow(0.05 * mu, 2))
        .cast("long")
        .alias("n_per_arm_5pct"),
    )


@register(
    "llm_winsorize",
    oracle="""
    WITH c AS (
      SELECT event_type, event_id,
             CAST(round(value * 100, 0) AS BIGINT) AS cents
      FROM events),
    r AS (
      SELECT event_type, cents,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY cents, event_id) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM c),
    b AS (
      SELECT event_type,
             max(CASE WHEN rn * 100 <= 5 * n THEN cents END) AS p05,
             max(CASE WHEN rn * 100 <= 95 * n THEN cents END) AS p95
      FROM r GROUP BY event_type),
    w AS (
      SELECT c.event_type,
             CASE WHEN c.cents < b.p05 THEN b.p05
                  WHEN c.cents > b.p95 THEN b.p95
                  ELSE c.cents END AS wc,
             CASE WHEN c.cents < b.p05 OR c.cents > b.p95 THEN 1 ELSE 0 END
               AS clipped
      FROM c JOIN b ON b.event_type = c.event_type)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(clipped) AS BIGINT) AS n_clipped,
           CAST(sum(wc) AS BIGINT) AS winsorized_sum_cents
    FROM w GROUP BY event_type
    """,
)
def llm_winsorize(spark, sf_dir):
    """Winsorization at the 5th/95th percentiles per event type — the
    robust-metric preprocessing every heavy-tailed KPI needs (a single
    whale order otherwise owns the mean): values CLAMP to the percentile
    bounds rather than dropping (trimming loses mass; clamping keeps n).

    Bounds are discrete rank-position percentiles over exact cents (the
    agg_percentile_disc / agg_outlier_iqr formulation — no interpolation,
    so the clamp threshold is a real data value and classifies
    identically in both engines), broadcast back onto the scan for the
    clamp-and-sum pass.  All outputs exact integers."""
    c = load_table(spark, sf_dir, "events").select(
        "event_type", "event_id", _cents().alias("cents")
    )
    c = c.transform(lineage_cap)  # feeds bounds + clamp passes
    w = Window.partitionBy("event_type").orderBy("cents", "event_id")
    wn = Window.partitionBy("event_type")
    r = c.select(
        "event_type",
        "cents",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wn).alias("n"),
    )
    b = r.groupBy("event_type").agg(
        F.max(F.when(F.col("rn") * 100 <= 5 * F.col("n"), F.col("cents"))).alias(
            "p05"
        ),
        F.max(F.when(F.col("rn") * 100 <= 95 * F.col("n"), F.col("cents"))).alias(
            "p95"
        ),
    )
    j = c.join(F.broadcast(b), "event_type")
    wc = (
        F.when(F.col("cents") < F.col("p05"), F.col("p05"))
        .when(F.col("cents") > F.col("p95"), F.col("p95"))
        .otherwise(F.col("cents"))
    )
    clipped = (
        (F.col("cents") < F.col("p05")) | (F.col("cents") > F.col("p95"))
    ).cast("int")
    return j.select("event_type", wc.alias("wc"), clipped.alias("clipped")).groupBy(
        "event_type"
    ).agg(
        F.count("*").alias("n"),
        F.sum("clipped").alias("n_clipped"),
        F.sum("wc").alias("winsorized_sum_cents"),
    )
