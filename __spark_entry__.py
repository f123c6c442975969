"""Driver contract for the spark-graft builder (PySpark target).

Aggregates every operator module in ``duck_server_spark.operators`` (each
exports ``QUERIES`` builders and ``ORACLE`` SQL twins — see SURVEY.md §2's
inventory) into the driver's three entry points.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from duck_server_spark.operators import all_queries, all_oracle_sql


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on /root/testdata/sf0.001."""
    from duck_server_spark.operators.tpch import q1_pricing_summary

    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracle_sql()
