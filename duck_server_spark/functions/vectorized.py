"""Vectorized (Arrow/numpy) implementations of the hot numeric operators
— the designated "slow path done right": when built-in expressions can't
express the math efficiently, use Arrow-batched pandas/numpy, never
row-at-a-time Python UDFs.

similarity_topk_numpy: brute-force cosine top-k as a per-partition numpy
GEMM. The query matrix (Q×d, small) is broadcast once; each partition
converts its Arrow batch to a (B×d) float32 matrix and computes B×Q dot
products with one BLAS call — orders of magnitude fewer interpreter
dispatches than per-element SQL lambdas. Per-partition local top-k is
emitted, so only partitions×Q×k candidate rows reach the final global
top-k — the exact pattern that scales to 100 TB corpora (the shuffle
carries candidates, never the corpus).

No DuckDB oracle: numpy's pairwise-summed float64 dot differs in last
bits from a left-to-right fold (the oracle-verified exact twin is
operators/similarity.similarity_topk_bruteforce); a recall test against
that twin guards correctness instead.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from duck_server_spark.engine.session import load_table

_OUT_SCHEMA = "query_id BIGINT, cand_id BIGINT, cosine DOUBLE"


def similarity_topk_numpy(
    spark: SparkSession, sf_dir: str, n_queries: int = 5, k: int = 10
) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    # the collected query set is the broadcast side: keep it bounded no
    # matter what a caller passes (the corpus side never leaves executors)
    assert n_queries <= 4096, f"query set must stay broadcast-small: {n_queries}"
    queries = emb.filter(F.col("vec_id") < n_queries).select("vec_id", "embedding").collect()
    q_ids = np.array([r["vec_id"] for r in queries], dtype=np.int64)
    q_mat = np.array([r["embedding"] for r in queries], dtype=np.float64)
    q_mat /= np.linalg.norm(q_mat, axis=1, keepdims=True)
    bq_ids = spark.sparkContext.broadcast(q_ids)
    bq_mat = spark.sparkContext.broadcast(q_mat)

    def score_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qi, qm = bq_ids.value, bq_mat.value
        for pdf in batches:
            if not len(pdf):
                continue
            c_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            c_mat = np.array(list(pdf["embedding"]), dtype=np.float64)
            c_mat /= np.linalg.norm(c_mat, axis=1, keepdims=True)
            sims = c_mat @ qm.T  # (B, Q) — one BLAS call per Arrow batch
            out_q, out_c, out_s = [], [], []
            for j in range(len(qi)):
                col = sims[:, j]
                mask = c_ids != qi[j]
                order = np.argsort(-col[mask], kind="stable")[:k]
                sel_ids = c_ids[mask][order]
                out_q.extend([qi[j]] * len(sel_ids))
                out_c.extend(sel_ids.tolist())
                out_s.extend(col[mask][order].tolist())
            yield pd.DataFrame({"query_id": out_q, "cand_id": out_c, "cosine": out_s})

    local_topk = emb.select("vec_id", "embedding").mapInPandas(score_batches, _OUT_SCHEMA)
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("cand_id").asc())
    return (
        local_topk.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "cand_id", "cosine", "rnk")
    )
