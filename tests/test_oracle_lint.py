"""Registry-wide oracle output-type lint (round-1 postmortem, VERDICT.md).

Fails CI if any registered oracle produces a column type the driver's
pandas canonicalizer mangles: HUGEINT/INT128 (renders float64, hash-fails
against Spark's int64) or LIST/STRUCT/MAP (crashes sort_values).  This is
the ~20-line check that would have caught all seven of round 1's driver
failures before they shipped.
"""

from __future__ import annotations

from tools.oracle_lint import audit


def test_all_oracles_pandas_safe(sf_dir):
    offenders = audit(sf_dir)
    assert not offenders, f"pandas-unsafe oracle output types: {offenders}"
