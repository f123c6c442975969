#!/usr/bin/env python3
"""Derive a larger benchmark fixture from /root/testdata/sf0.1 by
replicating every table K times with disjoint key offsets (default K=10
→ an sf1-equivalent volume). Used ONLY for the scaling curve in
SCALE.md — correctness gates always run on the driver's pristine
fixtures (TESTDATA.md says don't synthesize correctness inputs; this is
a perf fixture, written to scratch space).

Key discipline: every replica shifts ALL primary/foreign keys by
i * OFFSET, so per-key join fan-outs and group sizes match the source
distribution exactly — the data is K× bigger, not K× more skewed.

Usage: python tools/make_scale_fixture.py [K] [out_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OFFSET = 100_000_000  # larger than any key in sf0.1 incl. injected +1M ids

# table -> columns to shift per replica
KEYED = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def main() -> None:
    from pyspark.sql import functions as F

    from duck_server_spark.engine.session import get_session

    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf_scaled"
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session("make_scale_fixture")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out, exist_ok=True)
    for table, keys in KEYED.items():
        df = spark.read.parquet(f"{src}/{table}.parquet")
        if keys:
            parts = []
            for i in range(k):
                rep = df
                for c in keys:
                    rep = rep.withColumn(c, (F.col(c) + F.lit(i * OFFSET)).cast(df.schema[c].dataType))
                parts.append(rep)
            big = parts[0]
            for p in parts[1:]:
                big = big.unionAll(p)
        else:
            big = df  # shared dims (region/nation) keep reference keys
        big.write.mode("overwrite").parquet(f"{out}/{table}.parquet")
        print(f"{table}: {df.count()} -> {spark.read.parquet(f'{out}/{table}.parquet').count()}")
    print(f"wrote {out} at {k}x {src}")


if __name__ == "__main__":
    main()
