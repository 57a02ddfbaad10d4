"""Operator modules — importing this package registers every operator
(SURVEY.md §2 inventory) into biggie_spark.registry."""

from biggie_spark.ops import sources  # noqa: F401
from biggie_spark.ops import kv  # noqa: F401
from biggie_spark.ops import filters  # noqa: F401
from biggie_spark.ops import joins  # noqa: F401
from biggie_spark.ops import aggs  # noqa: F401
from biggie_spark.ops import windows  # noqa: F401
from biggie_spark.ops import setops  # noqa: F401
from biggie_spark.ops import streaming  # noqa: F401
from biggie_spark.ops import scalars  # noqa: F401
from biggie_spark.ops import llm  # noqa: F401
from biggie_spark.ops import udfs  # noqa: F401
from biggie_spark.ops import multimodal_ops  # noqa: F401
from biggie_spark.ops import ann  # noqa: F401
from biggie_spark.ops import bucketing  # noqa: F401
from biggie_spark.ops import extras  # noqa: F401
from biggie_spark.ops import llm_bpe  # noqa: F401
from biggie_spark.ops import llm_text2  # noqa: F401
from biggie_spark.ops import ivf  # noqa: F401
from biggie_spark.ops import graph  # noqa: F401
from biggie_spark.ops import timeseries  # noqa: F401
from biggie_spark.ops import tpch  # noqa: F401
from biggie_spark.ops import llm_text3  # noqa: F401
from biggie_spark.ops import llm_sampling  # noqa: F401
from biggie_spark.ops import diagnostics  # noqa: F401
from biggie_spark.ops import incremental  # noqa: F401
from biggie_spark.ops import pipeline2  # noqa: F401
from biggie_spark.ops import curation  # noqa: F401
from biggie_spark.ops import spark4  # noqa: F401
from biggie_spark.ops import analytics4  # noqa: F401
from biggie_spark.ops import stats  # noqa: F401
from biggie_spark.ops import textprep  # noqa: F401
from biggie_spark.ops import sketches  # noqa: F401
from biggie_spark.ops import sql_surface  # noqa: F401
from biggie_spark.ops import embeddings2  # noqa: F401
from biggie_spark.ops import mleval  # noqa: F401

# round-6 additions import LAST: within an ordered_queries() tier the window
# order is registration order, so late registration keeps the not-yet-scored
# extension backlog (r5 verdict item 1) ahead of anything new.
from biggie_spark.ops import dedup_index  # noqa: E402,F401
from biggie_spark.ops import training_data  # noqa: E402,F401
from biggie_spark.ops import ingest  # noqa: E402,F401
from biggie_spark.ops import round8  # noqa: E402,F401
from biggie_spark.ops import round9  # noqa: E402,F401
from biggie_spark.ops import round9b  # noqa: E402,F401
from biggie_spark.ops import round10  # noqa: E402,F401
from biggie_spark.ops import round10b  # noqa: E402,F401
from biggie_spark.ops import round11  # noqa: E402,F401
from biggie_spark.ops import round12  # noqa: E402,F401
from biggie_spark.ops import round12b  # noqa: E402,F401
from biggie_spark.ops import round12c  # noqa: E402,F401
from biggie_spark.ops import round12d  # noqa: E402,F401
from biggie_spark.ops import round12e  # noqa: E402,F401
from biggie_spark.ops import round12f  # noqa: E402,F401
from biggie_spark.ops import round12g  # noqa: E402,F401
from biggie_spark.ops import round12h  # noqa: E402,F401
from biggie_spark.ops import round12i  # noqa: E402,F401
from biggie_spark.ops import round13a  # noqa: E402,F401
from biggie_spark.ops import round13b  # noqa: E402,F401
from biggie_spark.ops import round13c  # noqa: E402,F401
from biggie_spark.ops import round13d  # noqa: E402,F401
from biggie_spark.ops import round13e  # noqa: E402,F401
from biggie_spark.ops import round13f  # noqa: E402,F401
from biggie_spark.ops import round13g  # noqa: E402,F401
from biggie_spark.ops import round14a  # noqa: E402,F401
from biggie_spark.ops import round14b  # noqa: E402,F401
from biggie_spark.ops import round14c  # noqa: E402,F401
from biggie_spark.ops import round14d  # noqa: E402,F401
from biggie_spark.ops import round14e  # noqa: E402,F401
from biggie_spark.ops import round14f  # noqa: E402,F401
from biggie_spark.ops import btable_ops  # noqa: E402,F401
from biggie_spark.ops import btable_cdf  # noqa: E402,F401
