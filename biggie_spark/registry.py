"""Operator registry — the single source of truth for the driver contract.

Every operator from SURVEY.md §2 registers here as
``name -> callable(spark, sf_dir) -> DataFrame`` plus (where the semantics
are SQL-expressible) a DuckDB oracle SQL string.  ``__spark_entry__.py``
re-exports these dicts verbatim.

Determinism conventions (SURVEY.md §2, binding):
1. every float output column is ``round(x, 4)`` on BOTH sides;
2. top-k / LIMIT outputs are tie-broken by key columns;
3. ``events.ts`` is only emitted through date_trunc / date / epoch-seconds;
4. no rand(), no unseeded sampling, no non-windowed first().
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query callable; ``oracle=None`` means the driver applies
    its weaker rows-only check (reserved for genuinely non-SQL-expressible
    ops: write paths, sampling, approximate sketches, streaming demos)."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = " ".join(oracle.split())
        return fn

    return deco


def load_all_ops() -> None:
    """Import every operator module so registration side-effects run."""
    import biggie_spark.ops  # noqa: F401
