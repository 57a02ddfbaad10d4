"""Property-based invariants for the round-4 families — the guarantees the
oracles check by value, re-stated as the STRUCTURAL properties a user
relies on (sketch bounds, test-statistic ranges, metric axioms), so a
future change that happens to keep both engines wrong-in-the-same-way
still fails here.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from biggie_spark.ops.textprep import _jaro_winkler
from biggie_spark.registry import QUERIES

_words = st.text(alphabet="abcdefgh ", min_size=0, max_size=24)


@given(_words, _words)
@settings(max_examples=300, deadline=None)
def test_jaro_winkler_axioms(a, b):
    s = _jaro_winkler(a, b)
    assert 0.0 <= s <= 1.0
    assert s == _jaro_winkler(b, a)  # symmetric
    if a == b:
        assert s == 1.0


@given(_words)
@settings(max_examples=100, deadline=None)
def test_jaro_winkler_identity_and_disjoint(a):
    assert _jaro_winkler(a, a) == 1.0
    if a and all(c in "abcdefgh " for c in a):
        assert _jaro_winkler(a, "zzzz") == 0.0 or "z" in a


def test_cms_never_underestimates(spark, sf_dir):
    rows = QUERIES["agg_cms_topk"](spark, sf_dir).collect()
    assert rows, "probe set must be non-empty"
    for r in rows:
        assert r.cms_est >= r.true_c, (r.tok, r.cms_est, r.true_c)


def test_bloom_no_false_negatives(spark, sf_dir):
    r = QUERIES["fn_bloom_probe"](spark, sf_dir).collect()[0]
    # every true member among the probes must be claimed (structural
    # property of bloom filters): claimed = true + false_pos exactly
    assert r.n_claimed == r.n_true + r.n_false_pos
    assert r.n_false_pos >= 0
    assert 0 < r.n_bits_set <= 4096


def test_hll_estimate_within_band(spark, sf_dir):
    # m = 64 registers -> standard error ~1.04/sqrt(64) = 13%; allow 3 sigma
    for r in QUERIES["agg_hll_portable"](spark, sf_dir).collect():
        assert r.true_nd > 0
        rel = abs(r.hll_est - r.true_nd) / r.true_nd
        assert rel < 0.4, (r.grp, r.true_nd, r.hll_est)


def test_bootstrap_ci_brackets_mean(spark, sf_dir):
    r = QUERIES["agg_bootstrap_ci"](spark, sf_dir).collect()[0]
    assert r.ci_lo <= r.ci_hi
    # the point estimate should fall inside (or on) the interval — the
    # Poisson bootstrap centers on the sample mean
    assert r.ci_lo <= r.mean_value <= r.ci_hi


def test_ks_statistic_in_unit_interval(spark, sf_dir):
    r = QUERIES["agg_ks_twosample"](spark, sf_dir).collect()[0]
    assert 0.0 <= r.ks_d <= 1.0
    assert r.n1 > 0 and r.n2 > 0


def test_mann_whitney_u_in_range(spark, sf_dir):
    r = QUERIES["agg_mann_whitney"](spark, sf_dir).collect()[0]
    assert 0 <= r.u1_x2 <= 2 * r.n1 * r.n2


def test_rfm_codes_are_valid_quartiles(spark, sf_dir):
    for r in QUERIES["ts_rfm_segments"](spark, sf_dir).collect():
        d1, d2, d3 = r.rfm_code // 100, (r.rfm_code // 10) % 10, r.rfm_code % 10
        assert 1 <= d1 <= 4 and 1 <= d2 <= 4 and 1 <= d3 <= 4


def test_spatial_grid_matches_brute_force(spark, sf_dir):
    """The gridded radius join must equal the O(n²) ground truth on the
    small corpus — the bucketing can neither drop nor duplicate pairs."""
    import duckdb

    rows = {
        r.probe_key: (r.n_neighbors, r.nearest_d2)
        for r in QUERIES["join_spatial_grid"](spark, sf_dir).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW customer AS SELECT * FROM '{sf_dir}/customer.parquet'"
    )
    truth = con.execute(
        """
        WITH pts AS (
          SELECT c_custkey AS k,
                 CAST(('0x' || substr(md5('x' || CAST(c_custkey AS VARCHAR)), 1, 8))
                      AS BIGINT) % 100000 AS x,
                 CAST(('0x' || substr(md5('y' || CAST(c_custkey AS VARCHAR)), 1, 8))
                      AS BIGINT) % 100000 AS y
          FROM customer)
        SELECT p.k, count(q.k), min((p.x-q.x)*(p.x-q.x) + (p.y-q.y)*(p.y-q.y))
        FROM pts p LEFT JOIN pts q
          ON q.k <> p.k
         AND (p.x-q.x)*(p.x-q.x) + (p.y-q.y)*(p.y-q.y) <= 1500*1500
        WHERE p.k % 37 = 0 GROUP BY p.k
        """
    ).fetchall()
    assert rows == {k: (n, d2) for k, n, d2 in truth}


def test_phash_groups_cover_probe(spark, sf_dir):
    rows = QUERIES["mm_image_phash_dedup"](spark, sf_dir).collect()
    # every probe doc lands in exactly one hash group
    assert sum(r.n_docs for r in rows) == min(256, 500)
    # content groups g = doc_id % 32 produce at most 32 distinct hashes
    assert len(rows) <= 32


def test_r4_normalizes_negative_zero(spark):
    """Round-5 binding convention (util.r4 docstring): a negative value
    that rounds to zero must emit +0.0, never -0.0 — the driver's value
    hash distinguishes signed zeros and the engines disagree on the sign
    of a rounded zero (ts_rolling_corr, r4 postmortem)."""
    import math

    from pyspark.sql import functions as F

    from biggie_spark.util import r4

    df = spark.range(1).select(
        r4(F.lit(-1e-9)).alias("z"), r4(F.lit(-0.12344)).alias("neg")
    )
    row = df.collect()[0]
    assert row["z"] == 0.0 and math.copysign(1.0, row["z"]) > 0
    assert row["neg"] == -0.1234
