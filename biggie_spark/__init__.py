"""biggie-spark: a PySpark-native analytics engine with the query /
data-processing capabilities of the ``ejhumphrey/biggie`` key-value store,
re-expressed Spark-first and extended with LLM-data-pipeline operators.

Design notes
------------
The reference (`/root/reference`, category "kv-store") is a key->object store
over HDF5 (Stash / Entity / lazy Field).  The Spark mapping (SURVEY.md §1.2):

* Stash      -> Parquet-backed DataFrame dataset, registered temp view
* Entity     -> row keyed by a string/int ``key`` column
* lazy Field -> Parquet column pruning (Catalyst does it automatically)
* hex fanout -> hash partitioning / bucketing on the key column

Everything is DataFrame/SQL-first so Catalyst + AQE + whole-stage codegen
stay in play; no RDDs anywhere.
"""

from biggie_spark.session import get_spark
from biggie_spark.io import load_table, load_tables, TABLES
from biggie_spark.registry import QUERIES, ORACLES, register
from biggie_spark.stash import Stash

__all__ = [
    "get_spark",
    "load_table",
    "load_tables",
    "TABLES",
    "QUERIES",
    "ORACLES",
    "register",
    "Stash",
]

__version__ = "0.1.0"
