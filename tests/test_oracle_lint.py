"""Registry-wide oracle output-type lint (round-1 postmortem, VERDICT.md).

Fails CI if any registered oracle produces a column type the driver's
pandas canonicalizer mangles: HUGEINT/INT128 (renders float64, hash-fails
against Spark's int64) or LIST/STRUCT/MAP (crashes sort_values).  This is
the ~20-line check that would have caught all seven of round 1's driver
failures before they shipped.
"""

from __future__ import annotations

from tools.oracle_lint import audit, audit_negzero


def test_all_oracles_pandas_safe(sf_dir):
    offenders = audit(sf_dir)
    assert not offenders, f"pandas-unsafe oracle output types: {offenders}"


def test_no_unnormalized_signable_rounds():
    """Signed-zero rule (round-5 advice): every oracle round() over a
    signable expression must append `+ 0`, because the engine side
    normalizes -0.0 -> +0.0 through util.r4 and the driver's value hash
    distinguishes the signs.  New oracles either normalize or — after an
    audit that the expression cannot round to a signed zero on ANY data —
    join tools.oracle_lint.NEGZERO_ALLOW with a reason comment."""
    offenders = audit_negzero()
    assert not offenders, f"un-normalized signable round() sites: {offenders}"
