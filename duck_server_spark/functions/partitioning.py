"""Partitioning strategies for 100 TB joins: bucketed co-located joins
and salted skew joins.

These are the two manual levers beyond AQE (SURVEY.md §4.3 / the scale
charter): bucketing pre-pays the shuffle once at write time so every
later join/agg on the bucket key is exchange-free; salting splinters a
hot key across `salt_n` sub-keys so no single task owns the whole skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame, table: str, bucket_col: str, n_buckets: int = 8, sort: bool = True
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table.
    Joins/aggs on `bucket_col` between tables bucketed the same way run
    WITHOUT an Exchange — the shuffle was paid at write time."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table)


def bucketed_join_is_exchange_free(spark: SparkSession, left: str, right: str, on: str) -> bool:
    """True if the bucketed join plan contains no shuffle Exchange
    (`Exchange hashpartitioning`). Broadcast is disabled for the probe —
    bucketing matters exactly when neither side is broadcastable, which
    is the 100 TB case this table layout exists for."""
    import contextlib
    import io

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = spark.table(left).join(spark.table(right), on)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain()
        plan = buf.getvalue()
        return "Exchange hashpartitioning" not in plan and "SortMergeJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def salted_join(
    fact: DataFrame, dim: DataFrame, key: str, salt_n: int = 8
) -> DataFrame:
    """Skew-resistant equi-join: the fact side gets a random salt in
    [0, salt_n); the dim side is exploded ×salt_n so every salted fact
    key finds its match. A hot key's rows spread over salt_n tasks
    instead of one.

    Use when AQE's skew-join splitting isn't available (e.g. the join
    feeds a window) or the skew is extreme. Dim explosion costs
    |dim|×salt_n — only salt against broadcast-scale dims."""
    salted_fact = fact.withColumn("__salt", (F.rand(seed=42) * salt_n).cast("int"))
    salted_dim = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_n - 1)))
    )
    out = salted_fact.join(salted_dim, [key, "__salt"]).drop("__salt")
    return out
