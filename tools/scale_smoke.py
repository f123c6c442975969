"""Scale smoke: synthesize a 10× lineitem/orders (≈6M / 150k rows) by
unioning key-shifted copies of sf0.1, then run headline queries at 1×
and 10× and report the wall-time ratio. A scale-ready plan should grow
≈linearly (ratio ≈ 10 or less with fixed overheads amortized); a
quadratic or driver-bound operator would blow past it.

Run: python tools/scale_smoke.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")

SF = "/root/testdata/sf0.1"
COPIES = 10


def main() -> None:
    from pyspark.sql import functions as F

    from duck_server_spark.engine.session import get_session, load_table

    spark = get_session("scale_smoke")
    spark.sparkContext.setLogLevel("ERROR")
    # 10× fact tables with disjoint key spaces per copy
    li = load_table(spark, SF, "lineitem")
    orders = load_table(spark, SF, "orders")
    li_n = None
    orders_n = None
    for i in range(COPIES):
        shift = F.lit(i * 10_000_000)
        li_i = li.withColumn("l_orderkey", F.col("l_orderkey") + shift)
        o_i = orders.withColumn("o_orderkey", F.col("o_orderkey") + shift)
        li_n = li_i if li_n is None else li_n.unionAll(li_i)
        orders_n = o_i if orders_n is None else orders_n.unionAll(o_i)
    li_n.createOrReplaceTempView("lineitem_10x")
    orders_n.createOrReplaceTempView("orders_10x")
    li.createOrReplaceTempView("lineitem_1x")
    orders.createOrReplaceTempView("orders_1x")

    queries = {
        "q1_agg": """
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                   count(*) AS n
            FROM {li} WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "join_agg": """
            SELECT o_orderpriority, count(*) AS n,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
            FROM {li} JOIN {o} ON l_orderkey = o_orderkey
            GROUP BY o_orderpriority
        """,
        "window_topk": """
            SELECT * FROM (
              SELECT l_suppkey, l_orderkey, l_extendedprice,
                     row_number() OVER (PARTITION BY l_suppkey ORDER BY l_extendedprice DESC, l_orderkey) AS rn
              FROM {li}
            ) WHERE rn <= 3
        """,
    }

    def run(sql: str) -> float:
        t0 = time.perf_counter()
        spark.sql(sql).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # warmup
    run(queries["q1_agg"].format(li="lineitem_1x", o="orders_1x"))
    print(f"{'query':<14} {'1x sec':>8} {'10x sec':>8} {'ratio':>6}")
    for name, sql in queries.items():
        t1 = run(sql.format(li="lineitem_1x", o="orders_1x"))
        t10 = run(sql.format(li="lineitem_10x", o="orders_10x"))
        print(f"{name:<14} {t1:>8.2f} {t10:>8.2f} {t10 / t1:>6.1f}")


if __name__ == "__main__":
    main()
