"""UDF/UDAF/UDTF surface: the engine-side extension points (SURVEY.md
§2B "UDF/UDAF/UDTF surface").

The reference exposes only SQL macros to clients (CREATE FUNCTION …,
pg_server.go:40-42 — mirrored in engine/executor._bootstrap); these are
the richer Spark-native extension points our engine adds for pipeline
authors, each in its preferred-performance order:

1. SQL UDF      — CREATE TEMPORARY FUNCTION … RETURN expr (pure Catalyst,
                  codegen'd, zero Python)
2. pandas_udf   — Arrow-vectorized scalar / grouped-agg (the UDAF path)
3. applyInPandas— grouped-map (UDTF-like: group in → frame out)
Row-at-a-time @udf exists but is deliberately NOT used anywhere in this
repo (10-100× slower; the guide's "slow path" warning).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def register_sql_macros(spark: SparkSession) -> None:
    """SQL-macro UDFs (the reference's only client-visible function kind)."""
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION revenue_of(price DOUBLE, disc DOUBLE) "
        "RETURNS DOUBLE RETURN CAST(CAST(price AS DECIMAL(18,2)) * "
        "(CAST(1 AS DECIMAL(18,2)) - CAST(disc AS DECIMAL(18,2))) AS DOUBLE)"
    )


def make_zscore():
    """Vectorized scalar pandas UDF (Arrow batches, per-batch numpy).
    Built lazily: pandas_udf needs an active SparkSession."""

    @pandas_udf("double")
    def zscore(v: pd.Series) -> pd.Series:
        s = v.std(ddof=1)
        return (v - v.mean()) / (s if s else 1.0)

    return zscore


def make_weighted_mean():
    """Grouped-aggregate pandas UDF — the UDAF surface: whole group's
    columns arrive as Series, one scalar returns."""

    @pandas_udf("double")
    def weighted_mean(value: pd.Series, weight: pd.Series) -> float:  # type: ignore[misc]
        tw = float(weight.sum())
        return float((value * weight).sum() / tw) if tw else 0.0

    return weighted_mean


def grouped_weighted_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDAF demo: quantity-weighted mean price per return flag."""
    from duck_server_spark.engine.session import load_table

    li = load_table(spark, sf_dir, "lineitem")
    wm = make_weighted_mean()
    return li.groupBy("l_returnflag").agg(
        wm(F.col("l_extendedprice"), F.col("l_quantity")).alias("wmean_price")
    )


def per_group_minmax_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map (applyInPandas, UDTF-like): min-max scale each
    customer's order totals within their own history."""
    from duck_server_spark.engine.session import load_table

    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_totalprice")

    def scale(pdf: pd.DataFrame) -> pd.DataFrame:
        lo, hi = pdf["o_totalprice"].min(), pdf["o_totalprice"].max()
        rng = (hi - lo) or 1.0
        return pdf.assign(scaled=(pdf["o_totalprice"] - lo) / rng)

    return orders.groupBy("o_custkey").applyInPandas(
        scale, "o_custkey BIGINT, o_orderkey BIGINT, o_totalprice DOUBLE, scaled DOUBLE"
    )
