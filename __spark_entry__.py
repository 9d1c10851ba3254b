"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (BM25 top-k through the full
index-build → prune → score → merge → fetch path) on sf0.001.
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 plus the training-data pipeline ops; see
quickwit_spark/driver_queries.py for the implementations and the DuckDB
oracles.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from quickwit_spark import driver_queries as dq


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return dq.ft_topk_single(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dq.queries()


def oracle_sql() -> dict[str, str]:
    return dq.oracle_sql()
