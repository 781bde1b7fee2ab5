"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)    — flagship query smoke check at sf0.001.
queries()       — implemented-operator catalog (SURVEY.md §2).
oracle_sql()    — DuckDB-equivalent SQL per query for the correctness gate.

Implementations live in postgresml_spark/queries.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from postgresml_spark.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Uses the star-join revenue rollup (scan → broadcast dims → agg) —
    exercises parquet pushdown, broadcast hash joins, and partial aggs.
    """
    return QUERIES["q02_revenue_by_nation"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents (same column names)."""
    return dict(ORACLES)
