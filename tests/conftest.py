"""Shared fixtures: one SparkSession + one DuckDB connection per test
session, with the driver's corpus registered under identical view names in
both engines (mirrors the driver's t2 harness, __spark_entry__.py docs)."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from biggie_spark.io import TABLES  # noqa: E402
from biggie_spark.registry import load_all_ops  # noqa: E402
from biggie_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("BIGGIE_TEST_SF", "/root/testdata/sf0.001")

load_all_ops()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="biggie-spark-tests")
    yield spark


@pytest.fixture(scope="session")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    yield con
    con.close()
