"""Scale-path tests: numpy-vectorized similarity recall, bucketed
exchange-free joins, salted skew joins."""

import shutil

import pytest

from duck_server_spark.functions import partitioning as pt
from duck_server_spark.functions.vectorized import similarity_topk_numpy


def test_numpy_topk_matches_exact_twin(spark, sf_dir):
    """The GEMM path must return the same neighbor sets as the
    oracle-verified exact fold implementation (cosines may differ in
    last bits; the ranking must agree)."""
    from duck_server_spark.operators.similarity import QUERIES

    exact = {
        (r["query_id"], r["rnk"]): r["cand_id"]
        for r in QUERIES["similarity_topk_bruteforce"](spark, sf_dir).collect()
    }
    fast = {
        (r["query_id"], r["rnk"]): r["cand_id"]
        for r in similarity_topk_numpy(spark, sf_dir).collect()
    }
    assert fast == exact


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    from duck_server_spark.engine.session import load_table

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    pt.write_bucketed(load_table(spark, sf_dir, "orders"), "b_orders", "o_orderkey")
    li = load_table(spark, sf_dir, "lineitem").withColumnRenamed("l_orderkey", "o_orderkey")
    pt.write_bucketed(li, "b_lineitem", "o_orderkey")
    assert pt.bucketed_join_is_exchange_free(spark, "b_orders", "b_lineitem", "o_orderkey")
    # and the join result is right
    n = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey").count()
    assert n == li.count()


def test_connected_components_plan_is_flat(spark, sf_dir):
    """The iterative label-propagation loop must not leak its per-round
    join lineage into the returned plan: each generation is persisted,
    every 3rd localCheckpoint()ed, and the final frame is checkpointed —
    so the caller's physical plan has NO joins at all (VERDICT round-1
    scale fix)."""
    from duck_server_spark.operators.dedup import dedup_connected_components

    df = dedup_connected_components(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan[:2000]
    rows = df.collect()
    assert rows and all(r["cluster_size"] >= 2 for r in rows)


def test_salted_join_correctness(spark, sf_dir):
    from duck_server_spark.engine.session import load_table

    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    plain = li.join(supp, li.l_suppkey == supp.s_suppkey).count()
    salted = pt.salted_join(
        li.withColumnRenamed("l_suppkey", "k"), supp.withColumnRenamed("s_suppkey", "k"), "k"
    ).count()
    assert salted == plain


def test_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    """Hive-style date-partitioned layout: a month filter on the
    partition column must plan as partition pruning (PartitionFilters,
    few files listed), not a full scan + row filter — the 100 TB lever
    for time-series tables."""
    from duck_server_spark.engine.session import load_table
    import pyspark.sql.functions as F

    out = str(tmp_path / "events_by_day")
    ev = load_table(spark, sf_dir, "events").withColumn(
        "d", F.to_date("ts")
    )
    ev.write.partitionBy("d").mode("overwrite").parquet(out)

    back = spark.read.parquet(out).where("d = DATE '2024-01-05'")
    import contextlib, io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        back.explain(True)
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "2024-01-05" in plan
    # row counts agree with the unpartitioned path
    direct = ev.where("d = DATE '2024-01-05'").count()
    assert back.count() == direct and direct > 0


def test_minhash_vectorized_recall_vs_md5_variant(spark, sf_dir):
    """The Arrow/numpy signature stage uses a different shingle hash than
    the md5 oracle variant; both verify candidates with exact Jaccard, so
    outputs are subsets of the true pair set. Banding recall must stay
    comparable: the vectorized pair set must cover >=80% of the md5
    variant's verified pairs (and vice versa) on the fixture corpus."""
    from duck_server_spark.operators import dedup

    vec = {
        (r.id1, r.id2)
        for r in dedup.QUERIES["dedup_minhash_vectorized"](spark, sf_dir).collect()
    }
    md5v = {
        (r.id1, r.id2)
        for r in dedup.QUERIES["dedup_minhash_lsh"](spark, sf_dir).collect()
    }
    assert len(md5v) > 0
    assert len(vec & md5v) / len(md5v) >= 0.8
    assert len(vec & md5v) / max(len(vec), 1) >= 0.8


def test_minhash_sig_batch_matches_per_doc_reference():
    """The round-13 batch-vectorized signature stage (pd.factorize +
    np.minimum.reduceat over a padded flat token layout) must be
    BIT-IDENTICAL to the r12 per-document loop it replaced — same int64
    op sequence, so every signature matches exactly, including the
    degenerate zero-padded short-doc windows."""
    import zlib

    import numpy as np

    from duck_server_spark.operators.dedup import (
        _MHV_AB,
        _MHV_C,
        _MHV_P,
        _NUM_HASHES,
        _minhash_sig_batch,
    )

    C1, C2, C3 = _MHV_C
    P = _MHV_P

    def ref_one(text):
        toks = text.strip().split()
        th = np.fromiter(
            (zlib.crc32(t.encode()) for t in toks), dtype=np.int64, count=len(toks)
        )
        if len(th) < 3:
            th = np.pad(th, (0, 3 - len(th)))
        hp = ((th[:-2] * C1) % P + (th[1:-1] * C2) % P + (th[2:] * C3) % P) % P
        return [int(((hp * a + b) % P).min()) for a, b in _MHV_AB]

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "",
        " ",
        "one",
        "one two",
        "one two three",
        "a b c d e f g h i j k " * 30,
        "repeated repeated repeated repeated",
        "  leading and trailing   whitespace  ",
        "unicode tökens ünïcode tökens mixed",
    ]
    batch = _minhash_sig_batch(texts)
    assert len(batch) == _NUM_HASHES
    for i, t in enumerate(texts):
        assert ref_one(t) == [int(batch[j][i]) for j in range(_NUM_HASHES)], t[:40]
    # empty batch keeps the schema shape
    assert all(len(a) == 0 for a in _minhash_sig_batch([]))


def test_pq_vectorized_codes_match_sql_encoder(spark, sf_dir):
    """The round-13 numpy PQ encoder must emit BIT-IDENTICAL codes to
    the SQL encode stage it replaced (same float64 op order: sequential
    dim folds, argmin first-hit tie-break == min_by struct(l2, code))."""
    from duck_server_spark.engine.session import register_views
    from duck_server_spark.operators import similarity as sim

    register_views(spark, sf_dir)
    # builder registers pq_codes_<seq> from the numpy encoder
    sim.similarity_ann_pq(spark, sf_dir)
    fast = {
        (r.vec_id, r.m): r.code
        for r in spark.table(f"pq_codes_{sim._PQ_SEQ[0]}").collect()
    }

    d = sim._PQ_DIM // sim._PQ_M
    sub = f"slice(e.ne, b.m * {d} + 1, {d})"
    l2 = (
        f"aggregate(zip_with({sub}, b.centroid, (x, y) -> (x - y) * (x - y)), "
        "0.0D, (acc, v) -> acc + v)"
    )
    nrm = (
        "greatest(sqrt(aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * x), "
        "0.0D, (acc, v) -> acc + v)), CAST(1e-12 AS DOUBLE))"
    )
    ref = {
        (r.vec_id, r.m): r.code
        for r in spark.sql(f"""
WITH e AS (
  SELECT vec_id, transform(embedding, x -> CAST(x AS DOUBLE) / nrm) AS ne
  FROM (SELECT vec_id, embedding, {nrm} AS nrm FROM embeddings)
)
SELECT e.vec_id, b.m, min_by(b.code, struct({l2}, b.code)) AS code
FROM e CROSS JOIN pq_codebook b
GROUP BY e.vec_id, b.m
""").collect()
    }
    assert fast == ref


def test_ivf_kernel_matches_sql_reference(spark, sf_dir):
    """The round-13 numpy assignment kernel behind similarity_ann_ivf
    must reproduce the full output of the pure-SQL reference spelling
    (SIM_IVF_SPARK) EXACTLY — the kernel replays the d2 fold's float64
    op order, so assignments, probe lists and cosines are bit-identical."""
    from duck_server_spark.engine.session import register_views
    from duck_server_spark.operators import similarity as sim

    register_views(spark, sf_dir)
    fast = sorted(map(tuple, sim.similarity_ann_ivf(spark, sf_dir).collect()))
    ref = sorted(map(tuple, spark.sql(sim.SIM_IVF_SPARK).collect()))
    assert fast == ref and len(fast) > 0


def test_semantic_kernel_matches_sql_reference(spark, sf_dir):
    """The round-13 numpy assignment+bucket kernel behind
    dedup_semantic_clusters must reproduce the full output of the
    pure-SQL reference spelling (SEM_DEDUP_SPARK) EXACTLY."""
    from duck_server_spark.engine.session import register_views
    from duck_server_spark.operators import similarity as sim

    register_views(spark, sf_dir)
    fast = sorted(map(tuple, sim.dedup_semantic_clusters(spark, sf_dir).collect()))
    ref = sorted(map(tuple, spark.sql(sim.SEM_DEDUP_SPARK).collect()))
    assert fast == ref and len(fast) > 0


def test_substring_kernel_matches_sql_reference(spark, sf_dir):
    """The round-13 per-document span-Counter kernel behind
    dedup_substring_spans must reproduce the full ordered output of the
    pure-SQL reference spelling (DEDUP_SUBSTRING_SPARK) EXACTLY — the
    (n_docs, n_occ, span) ordering is a total order over span groups,
    so the top-k list is deterministic."""
    from duck_server_spark.engine.session import register_views
    from duck_server_spark.operators import dedup as dd

    register_views(spark, sf_dir)
    fast = [tuple(r) for r in dd.dedup_substring_spans(spark, sf_dir).collect()]
    ref = [tuple(r) for r in spark.sql(dd.DEDUP_SUBSTRING_SPARK).collect()]
    assert fast == ref and len(fast) > 0


def test_clean_sig_kernel_matches_sql_reference(spark, sf_dir):
    """The round-13 shingle+signature kernel behind pipeline_corpus_clean
    must reproduce the full output of the retained SQL spelling
    (_CLEAN_SHING_SPARK + _CLEAN_TAIL_SPARK over _CLEAN_ANN_SPARK)
    EXACTLY — hashlib.md5/int(hex,16)/int64 perms replay the SQL
    arithmetic bit-for-bit."""
    from duck_server_spark.engine.session import register_views
    from duck_server_spark.operators import pipeline as pl

    fast = sorted(tuple(r) for r in pl.corpus_clean_staged(spark, sf_dir).collect())
    register_views(spark, sf_dir)
    spark.sql(pl._CLEAN_ANN_SPARK).createOrReplaceTempView("__clean_ann")
    spark.sql(pl._CLEAN_SHING_SPARK).createOrReplaceTempView("__clean_shing")
    ref = sorted(tuple(r) for r in spark.sql(pl._CLEAN_TAIL_SPARK).collect())
    assert fast == ref and len(fast) > 0


def test_bloom_distributed_chunk_build_matches_driver_build(spark, sf_dir, monkeypatch):
    """The round-13 bloom build is scale-adaptive: below the
    SPARK_GRAFT_BLOOM_DRIVER_BITS threshold the driver packs the
    distinct bit positions directly; above it the r12 distributed chunk
    pack runs. Both must produce the same bitmap, hence the same novel
    set."""
    from duck_server_spark.operators import dedup

    drv = sorted(
        r.doc_id for r in dedup.QUERIES["dedup_bloom_incremental"](spark, sf_dir).collect()
    )
    monkeypatch.setenv("SPARK_GRAFT_BLOOM_DRIVER_BITS", "1")
    dist = sorted(
        r.doc_id for r in dedup.QUERIES["dedup_bloom_incremental"](spark, sf_dir).collect()
    )
    assert drv == dist and len(drv) > 0


def test_embedding_pair_kernel_matches_sql_reference(spark, sf_dir):
    """The round-13 per-label pair-scoring numpy kernel behind
    dedup_embedding_cosine must reproduce the full output of the
    pure-SQL reference spelling (DEDUP_EMBEDDING_SPARK) EXACTLY —
    the kernel replays the dot/norm folds' sequential float64 op order,
    so pairs AND cosines are bit-identical."""
    from duck_server_spark.engine.session import register_views
    from duck_server_spark.operators import dedup as dd

    register_views(spark, sf_dir)
    fast = sorted(map(tuple, dd.dedup_embedding_cosine(spark, sf_dir).collect()))
    ref = sorted(map(tuple, dd._emb_q(spark, sf_dir).collect()))
    assert fast == ref and len(fast) > 0


def test_plan_memo_denylist_covers_every_materializing_builder():
    """The all_queries() lazy-plan memo must NEVER wrap a builder that
    materializes state at build time (eager localCheckpoints, stream
    replays) — memoizing one would carry computed results across
    invocations, which the bench contract forbids. Pin the invariant:
    every registry builder whose source touches tracked_local_checkpoint
    is in the denylist, and streaming builders come back unwrapped."""
    import importlib
    import inspect

    from duck_server_spark.operators import (
        _MODULES,
        _STATEFUL_BUILDERS,
        all_queries,
    )

    streaming = set(
        importlib.import_module("duck_server_spark.operators.streaming_ops").QUERIES
    )
    for mname in _MODULES:
        mod = importlib.import_module(f"duck_server_spark.operators.{mname}")
        for name, fn in mod.QUERIES.items():
            try:
                src = inspect.getsource(fn)
            except (OSError, TypeError):
                continue
            if "tracked_local_checkpoint" in src and "def test" not in src:
                assert name in _STATEFUL_BUILDERS, (
                    f"{name} materializes checkpoints at build time but is "
                    "not in _STATEFUL_BUILDERS — the plan memo would cache "
                    "its materialized state across invocations"
                )
    wrapped = all_queries()
    for name in _STATEFUL_BUILDERS | streaming:
        assert not hasattr(wrapped[name], "__wrapped__"), (
            f"{name} must not be plan-memoized"
        )
    # and a stateless row IS memoized (the optimization actually applies)
    assert hasattr(wrapped["tpch_q1_pricing_summary"], "__wrapped__")
