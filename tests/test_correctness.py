"""Per-operator Spark-vs-DuckDB correctness — the local mirror of the
driver's t2 gate, parametrized over the full registry (SURVEY.md §5.2.4)."""

from __future__ import annotations

import pytest

from biggie_spark.registry import ORACLES, QUERIES

from tests.compare import compare


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_operator(name, spark, duck, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    if name in ORACLES:
        compare(df, duck, ORACLES[name])
    else:
        # weaker rows-only check (non-SQL-expressible op)
        assert df.collect() is not None
