"""Shared expression helpers (determinism conventions + vector math).

All vector math is built from Spark higher-order functions so it runs
JVM-side inside whole-stage codegen — no Python UDFs in any hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def r4(col: Column | str) -> Column:
    """The binding float convention: round(double, 4) on every float output
    (summation order differs between engines; SURVEY.md §2 convention 1)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c.cast("double"), 4)


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization of normalized text — identical semantics to
    DuckDB ``string_split(lower(text), ' ')`` (verified: both keep empty
    strings on doubled separators)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.lower(c), " ")


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<numeric> columns, computed in double with a
    left-to-right fold (deterministic summation order, matches DuckDB's
    sequential list kernels)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm_sq(a: Column) -> Column:
    return F.aggregate(
        a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity in double precision.

    Formulated as dot/(sqrt(na)*sqrt(nb)) — cross-engine-verified against
    DuckDB ``list_cosine_similarity(a::DOUBLE[], b::DOUBLE[])`` at 4-decimal
    rounding (SURVEY.md §7.4.7: the oracle must cast float32 inputs up to
    DOUBLE or DuckDB rounds in float32)."""
    return dot(a, b) / (F.sqrt(l2_norm_sq(a)) * F.sqrt(l2_norm_sq(b)))


def epoch_s(col: Column | str) -> Column:
    """Timestamp -> epoch seconds (bigint). The only sanctioned way to emit
    event-time in a scored output (SURVEY.md §2 convention 3)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_timestamp(c)
