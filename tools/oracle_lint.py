"""Oracle output-type lint: run every registered oracle through DuckDB and
flag output columns whose type the driver's pandas canonicalizer mangles.

The driver canonicalizes the DuckDB side via pandas (fetchdf):
- HUGEINT/INT128 (DuckDB's sum(BIGINT) result) renders as float64 while
  Spark emits int64 -> value-hash mismatch on identical values.
- LIST/STRUCT/MAP columns arrive as Python lists/dicts and crash the
  canonicalizer's sort_values (`unhashable type: 'list'`).

Run:  python tools/oracle_lint.py            # report offenders, exit 1 if any
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from biggie_spark.io import TABLES  # noqa: E402
from biggie_spark.registry import ORACLES, load_all_ops  # noqa: E402

BAD_TOKENS = ("HUGEINT", "INT128", "UHUGEINT", "[]", "LIST", "STRUCT(", "MAP(")

SF_DIR = os.environ.get("BIGGIE_TEST_SF", "/root/testdata/sf0.001")

# ---------------------------------------------------------------------------
# Signed-zero rule (round-5 advice): the engine normalizes every rounded
# float through util.r4 (`+ 0.0`), so an oracle `round(expr, n)` whose expr
# can be negative-near-zero MUST append `+ 0` or the driver's value hash
# splits on -0.0 vs +0.0 (round-4 postmortem, ts_rolling_corr).  We flag
# round() sites without a `+ 0` suffix whose inner expression matches a
# signable pattern.  Ops audited as structurally non-negative (money sums,
# counts, quantile/percentile of non-negative columns, distances, norms)
# are allowlisted — extend the list ONLY after checking the expression
# cannot round to a signed zero on ANY data.
import re

_SIGNABLE = re.compile(
    r"(corr\(|covar|slope|regr|\bsin\(|\bcos\(|\btan\(|atan|skew|kurt|"
    r"entropy|zscore|\bz\b|acf|pmi|theta|delta|drawdown|cusum|"
    r"- 3\b|\bln\(.*-|-.*\bln\(|\) - |\b- sum| - s\.| - t\.)",
    re.I,
)

# Audited non-negative / already-matching sites (see docstrings at each op).
NEGZERO_ALLOW = {
    # integer-cents quantization: round(x, 0) cast to BIGINT — no signed
    # zero in integers, pattern `* 100, 0` / `* 10000, 0` / `* 1000000, 0`
    # is stripped structurally below, not listed here.
    "agg_benford_digits",  # log10(1 + 1/d) > 0
    "llm_policy_kl_budget",  # already normalized: greatest(round(..),0)+0.0
    # wraps every KL column on BOTH engines (round12e.py)
    "agg_hoeffding_sample_bound",  # bound = (mx-mn)*sqrt(ln40/2n) is
    # strictly positive (range > 0 whenever lengths vary; measured 21+);
    # the signable abs_dev column already carries + 0
    "agg_chi2_independence",  # sum of squares / e >= 0
    "agg_hll_portable",  # err_bp normalized; hll_est > 0
    "llm_tf_idf",  # ln((n+1)/(df+1)) >= 0 since df <= n
    "llm_minhash_calibration",  # avg(abs(..)) >= 0
    "llm_embed_outlier",  # z filtered > 2.0; dist2 >= 0
    "ts_resample_interp",  # interpolation of positive event values
    "llm_neardup_pairs",  # jaccard in [0, 1]
    "llm_neardup_shingle",  # jaccard in [0, 1]
    "llm_neardup_incremental",  # jaccard in [0, 1]
    "llm_neardup_ngram",  # jaccard in [0, 1]
    "llm_entropy_filter",  # normalized (+ 0 appended)
    "agg_cuped",  # var_* and rho2 >= 0; theta normalized
    "agg_ttest_welch",  # dof > 0; t_stat normalized
    "agg_mann_whitney",  # z normalized; counts non-negative
    "ts_stl_lite",  # strength normalized
    "agg_ols_fit",  # slope/intercept normalized; r2 >= 0
    "llm_token_zipf",  # slope normalized
    "ts_autocorr",  # acf1 normalized
    "agg_moments",  # skew/kurt normalized; mean of positive values
    "win_lag_lead",  # delta normalized; prices > 0
    "fn_math",  # abs() >= 0
    "fn_null",  # sum_val normalized
    "fn_array",  # scalar aggs normalized; array cells printf '+ 0.0'
    "agg_cohens_kappa",  # kappa normalized
    "agg_stats",  # corr normalized; stddev/var >= 0
    "llm_token_pmi",  # pmi normalized
    "agg_groupby",  # revenue/qty sums of positive values
    "llm_token_bpeish",  # avg of list lengths >= 0
    "udf_python_scalar",  # vowel-count ratio in [0, 1]
}

# integer-quantization rounds: round(x * 10^k, 0) immediately cast to an
# integer type — signed zero cannot survive the cast.  The cast must be AT
# THE SITE (`... AS BIGINT` / `::BIGINT` right after the close paren): a
# whole-query `"BIGINT" in sql` test exempted every round(x, 0) in any
# oracle that merely mentioned BIGINT somewhere (round-7 advice).
_INT_QUANT = re.compile(r"^\s*.*,\s*0\s*$")
_INT_CAST_AFTER = re.compile(r"^\s*(AS\s+(BIG)?INT(EGER)?\b|::\s*(BIG)?INT)", re.I)


def _round_sites(sql: str):
    """Yield (inner_expr, suffix_after_close) for each round( in sql."""
    for m in re.finditer(r"\bround\s*\(", sql, re.I):
        depth, i = 0, m.end() - 1
        while i < len(sql):
            if sql[i] == "(":
                depth += 1
            elif sql[i] == ")":
                depth -= 1
                if depth == 0:
                    break
            i += 1
        yield sql[m.end() : i], sql[i + 1 : i + 12]


def audit_negzero() -> dict[str, list[str]]:
    """Return {op: [offending round() inner expressions]} for oracles with
    a signable un-normalized round site."""
    load_all_ops()
    out: dict[str, list[str]] = {}
    for name, sql in ORACLES.items():
        if name in NEGZERO_ALLOW:
            continue
        hits = []
        for inner, after in _round_sites(sql):
            if re.match(r"\s*\+\s*0", after):
                continue  # normalized
            if _INT_QUANT.match(inner) and _INT_CAST_AFTER.match(after):
                continue  # integer quantization cast at the site
            if _SIGNABLE.search(inner):
                hits.append(inner[:80])
        if hits:
            out[name] = hits
    return out


def audit(sf_dir: str = SF_DIR) -> dict[str, list[tuple[str, str]]]:
    """Return {op_name: [(col, bad_type), ...]} for every oracle whose
    relation output types would be mangled by the driver canonicalizer."""
    load_all_ops()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    bad: dict[str, list[tuple[str, str]]] = {}
    errs: dict[str, str] = {}
    for name, sql in ORACLES.items():
        try:
            rel = con.sql(sql)
            cols = list(zip(rel.columns, [str(t) for t in rel.types]))
        except Exception as e:  # noqa: BLE001
            errs[name] = str(e).splitlines()[0]
            continue
        hits = [
            (c, t)
            for c, t in cols
            if any(tok in t.upper() for tok in BAD_TOKENS)
        ]
        if hits:
            bad[name] = hits
    con.close()
    if errs:
        bad["__oracle_errors__"] = sorted(errs.items())
    return bad


if __name__ == "__main__":
    offenders = audit()
    nz = audit_negzero()
    if not offenders and not nz:
        print("OK: oracle types canonicalizer-safe; no signed-zero risks")
        sys.exit(0)
    for name, hits in sorted(offenders.items()):
        print(f"{name}: {hits}")
    for name, hits in sorted(nz.items()):
        print(f"NEGZERO {name}: {hits}")
    print(f"\n{len(offenders)} type + {len(nz)} signed-zero offenders")
    sys.exit(1)
