"""SparkSession factory with the configuration this engine requires.

The settings below are chosen for correctness + 100 TB-scale design:

* ``spark.sql.adaptive.*`` — AQE re-plans joins/shuffles at runtime
  (broadcast conversion, partition coalescing, skew-join splitting).
* ``spark.sql.legacy.parquet.nanosAsLong`` — the driver's ``events``
  table stores ``timestamp[ns]`` which Spark 4 otherwise rejects
  (SURVEY.md §7.4.1); the loader repairs the column to TimestampType.
* UTC session timezone — deterministic epoch math vs the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Confs that are safe (and necessary) to apply to an externally supplied
# session at runtime; all of these are runtime-settable SQL confs.
RUNTIME_CONFS = {
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
}


# Sessions already configured by apply_runtime_confs — each conf.set is a
# Py4J round-trip, measurable in sub-second queries when load_table repeats
# it per read, so apply once per live session object.
_CONFIGURED: "weakref.WeakSet[SparkSession]" = None  # type: ignore[assignment]


def apply_runtime_confs(spark: SparkSession) -> SparkSession:
    """Defensively apply runtime-settable confs to any session (incl. the
    driver's own session, which may not have been built by :func:`get_spark`).
    Idempotent and cached: repeat calls on the same session are free.
    """
    global _CONFIGURED
    if _CONFIGURED is None:
        import weakref

        _CONFIGURED = weakref.WeakSet()
    if spark in _CONFIGURED:
        # One conf is correctness-critical rather than merely performance-
        # tuning: the NTZ->timestamp repair in io.load_table and epoch math
        # vs the DuckDB oracle silently break if anything reset the session
        # timezone mid-run.  Re-pin it on every call (a single Py4J
        # round-trip) instead of trusting the cache blindly.
        try:
            spark.conf.set("spark.sql.session.timeZone", "UTC")
        except Exception:
            pass
        return spark
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # non-settable in this build; session-level default applies
    _CONFIGURED.add(spark)
    return spark


def get_spark(
    app_name: str = "biggie-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or ``local[*]``).
    ``shuffle_partitions`` defaults to 8 at test scale factors — measured
    faster than 32/200 on sub-GB inputs (BASELINE.md config); on a real
    cluster leave it high and let AQE coalesce.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "8"))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    return apply_runtime_confs(spark)
