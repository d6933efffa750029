"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The actual catalog lives in ``cosmo_spark.queries`` — each entry is a Spark
callable plus (where SQL-expressible) a DuckDB oracle with identical column
names and rounding.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

# make the repo importable regardless of the driver's CWD
sys.path.insert(0, str(Path(__file__).resolve().parent))

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: the pricing-summary rollup (filter +
    group-aggregate sweep over the fact table)."""
    from cosmo_spark.queries import all_queries

    return all_queries()["q01_pricing_summary"].spark_fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator/query (SURVEY.md §2 ids recorded on
    each catalog entry)."""
    from cosmo_spark.queries import all_queries

    return {name: q.spark_fn for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for every SQL-expressible query."""
    from cosmo_spark.queries import all_queries

    return {name: q.oracle for name, q in all_queries().items() if q.oracle}
