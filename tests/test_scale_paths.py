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


# Materializing-call markers for the plan-memo guard below. `.collect(`
# and `.count()` are build-time Spark ACTIONS; the others pin partitions
# either at build (eager=True / persist+count loops) or on first action
# (eager=False, .persist(, .cache() — the memo would then serve the
# pinned partitions to every later invocation.
_MATERIALIZING_MARKERS = (
    "tracked_local_checkpoint",
    ".localCheckpoint(",
    ".persist(",
    ".cache()",
    ".collect()",
    ".count()",
    ".toPandas()",
)


def _expand_builder_source(fn, seen=None):
    """Source of fn PLUS (recursively) every same-package function it
    references by name — so a builder that materializes through a helper
    (e.g. llm_text._eval_gram_index) is caught, not just direct calls."""
    import inspect
    import re

    if seen is None:
        seen = set()
    key = getattr(fn, "__qualname__", repr(fn))
    if key in seen:
        return ""
    seen.add(key)
    fn = getattr(fn, "__wrapped__", fn)
    try:
        src = inspect.getsource(fn)
    except (OSError, TypeError):
        return ""
    out = [src]
    names: dict = dict(getattr(fn, "__globals__", {}))
    try:
        cv = inspect.getclosurevars(fn)
        names.update(cv.nonlocals)
    except TypeError:
        pass
    for ident in set(re.findall(r"\b\w+\b", src)):
        ref = names.get(ident)
        if (
            inspect.isfunction(ref)
            and getattr(ref, "__module__", "").startswith("duck_server_spark")
        ):
            out.append(_expand_builder_source(ref, seen))
    return "\n".join(out)


def test_plan_memo_denylist_covers_every_materializing_builder():
    """The all_queries() lazy-plan memo must NEVER wrap a builder that
    materializes state at build time (checkpoints — tracked, raw eager,
    or pin-on-first-action —, persist/cache, or build-time actions like
    collect/count) — memoizing one would carry computed results across
    invocations, which the bench contract forbids. Round 14 (VERDICT r13
    item 1): the scan is now TRANSITIVE over same-package helpers and
    matches every materializing spelling, not just
    tracked_local_checkpoint."""
    import importlib

    from duck_server_spark.operators import (
        _IDEMPOTENT_MATERIALIZERS,
        _MODULES,
        _STATEFUL_BUILDERS,
        all_queries,
    )

    streaming = set(
        importlib.import_module("duck_server_spark.operators.streaming_ops").QUERIES
    )
    for mname in _MODULES:
        if mname == "streaming_ops":
            continue  # excluded wholesale from the memo already
        mod = importlib.import_module(f"duck_server_spark.operators.{mname}")
        for name, fn in mod.QUERIES.items():
            src = _expand_builder_source(fn)
            hits = [m for m in _MATERIALIZING_MARKERS if m in src]
            if hits and name not in _IDEMPOTENT_MATERIALIZERS:
                assert name in _STATEFUL_BUILDERS, (
                    f"{name} materializes at build time ({hits}) but is "
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


def test_plan_memo_scan_flags_synthetic_violator():
    """The transitive source scan must actually catch a builder that
    materializes through a helper — the failure mode VERDICT r13 found
    in the round-13 test (direct-source grep only)."""

    def _sneaky_helper(df):
        return df.persist()

    # emulate a module-level helper in the operators package (real
    # helpers live there; the scanner filters on the package prefix)
    _sneaky_helper.__module__ = "duck_server_spark.operators.synthetic"

    def synthetic_builder(spark, sf_dir):
        return _sneaky_helper(spark.range(1))

    src = _expand_builder_source(synthetic_builder)
    assert any(m in src for m in _MATERIALIZING_MARKERS), (
        "transitive scan failed to flag a helper-mediated .persist()"
    )

    def clean_builder(spark, sf_dir):
        return spark.range(1)

    src = _expand_builder_source(clean_builder)
    assert not any(m in src for m in _MATERIALIZING_MARKERS)


def test_fixture_sample_matches_spark_collect(spark, sf_dir):
    """Round 14 (VERDICT r13 items 1/2): the similarity builders derive
    their tiny plan parameters (query vectors, coarse centroids, trainer
    sample) from a driver-side pyarrow read of the fixture parquet
    instead of build-time Spark collects — so the lazy-plan memo never
    carries a collected Spark result across invocations. Pin that the
    pyarrow read is bit-identical to the SQL spelling it replaced."""
    import numpy as np

    from duck_server_spark.engine.session import register_views
    from duck_server_spark.operators import similarity as sim

    register_views(spark, sf_dir)
    vid, mat = sim._fixture_embeddings(sf_dir)
    # unique, sorted ids; fixed-width matrix
    assert np.all(np.diff(vid) > 0) and mat.shape[1] == sim._EMB_DIM

    # query vectors (vec_id < 5) == the old collect
    q_rows = sorted(
        spark.sql(
            "SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5"
        ).collect(),
        key=lambda r: r.vec_id,
    )
    sel = vid < 5
    assert list(vid[sel]) == [r.vec_id for r in q_rows]
    assert np.array_equal(
        mat[sel], np.array([r.embedding for r in q_rows], dtype=np.float64)
    )

    # trainer sample (vec_id % 3 = 0 ORDER BY vec_id LIMIT 256) == collect
    s_rows = spark.sql(
        "SELECT embedding FROM embeddings WHERE vec_id % 3 = 0 "
        "ORDER BY vec_id LIMIT 256"
    ).collect()
    X = sim._train_sample_matrix(sf_dir)
    assert np.array_equal(X, np.array([r.embedding for r in s_rows], dtype=np.float64))

    # coarse centroids are the sample's first K rows
    assert np.array_equal(sim._ivf_centroid_matrix(sf_dir), X[: sim._IVF_K])

    # parquet-footer row count == the old build-time .count()
    import os

    import pyarrow.parquet as pq

    n = pq.ParquetFile(os.path.join(sf_dir, "embeddings.parquet")).metadata.num_rows
    assert n == spark.table("embeddings").count()


def test_embedding_kernel_zero_norm_matches_ansi_sql(spark):
    """Round 14 (ADVICE r13, adjudicated by measurement): ADVICE assumed
    a zero-norm pair scores NaN and silently passes `cosine >= 0.85` in
    Spark SQL. Under this engine's ANSI mode (Spark 4 default) the SQL
    fold actually RAISES DIVIDE_BY_ZERO — pin (a) that reference
    behavior, and (b) that the numpy kernel raises the same loud error
    instead of silently dropping the pair."""
    import numpy as np
    import pandas as pd
    import pytest

    from duck_server_spark.operators.dedup import _emb_label_pairs

    # (a) the ANSI SQL reference errors on a zero-norm divisor
    df = spark.sql(
        "SELECT aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * "
        "CAST(y AS DOUBLE)), 0.0D, (acc, v) -> acc + v) / "
        "(sqrt(aggregate(transform(a, x -> CAST(x AS DOUBLE) * CAST(x AS "
        "DOUBLE)), 0.0D, (acc, v) -> acc + v)) * "
        "sqrt(aggregate(transform(b, x -> CAST(x AS DOUBLE) * CAST(x AS "
        "DOUBLE)), 0.0D, (acc, v) -> acc + v))) AS cos "
        "FROM VALUES (array(CAST(0.0 AS FLOAT)), array(CAST(1.0 AS FLOAT))) "
        "t(a, b)"
    )
    with pytest.raises(Exception, match="DIVIDE_BY_ZERO"):
        df.collect()

    # (b) the kernel raises the matching error, not a silent drop
    z = np.zeros(4, dtype=np.float32)
    v = np.array([1.0, 0.0, 0.0, 0.0], dtype=np.float32)
    pdf = pd.DataFrame(
        {"label": [1, 1], "rep_id": [10, 20], "embedding": [z, v]}
    )
    with pytest.raises(ArithmeticError, match="DIVIDE_BY_ZERO"):
        _emb_label_pairs(pdf)


def test_pair_bucket_cap_skew_fixture(spark, tmp_path):
    """VERDICT r13 item 2 'done' bar: a deliberately skewed fixture (one
    block key / band signature shared by many docs) must complete
    through the salted-triangle pair-generation path, and the pair sets
    must be IDENTICAL across cap settings: cap=1 salts maximally (ns =
    bucket size, every pair from a cross- or single-salt group), cap=8
    splits the hot bucket into several salt groups while cold buckets
    stay ns=1, and cap=10**9 degenerates everything to the r13
    one-group-per-bucket shape."""
    import os
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    from duck_server_spark.engine.session import register_views
    from duck_server_spark.operators import dedup as dd

    # fixture dir: sf0.001 tables with a skewed documents.parquet —
    # 60 docs sharing their minimum shingle ("aaa aaa aaa") hence one
    # block key, plus 30 docs with distinct min shingles (small buckets)
    src = "/root/testdata/sf0.001"
    fdir = str(tmp_path / "skewfix")
    os.makedirs(fdir)
    for f in os.listdir(src):
        if f != "documents.parquet":
            shutil.copy(os.path.join(src, f), os.path.join(fdir, f))
    # 4 tokens → shingles {"aaa aaa aaa", "aaa aaa zzz<i>"}: every hot
    # pair scores jaccard 1/3 ≥ 0.3, so the whole O(b²) bucket reaches
    # the output
    hot = [f"aaa aaa aaa zzz{i:05d}" for i in range(60)]
    cold = [f"bbb{i:05d} ccc{i:05d} ddd{i:05d} eee{i:05d}" for i in range(30)]
    texts = hot + cold
    n = len(texts)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), type=pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * n),
                "source": pa.array(["src1"] * n),
                "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
            }
        ),
        os.path.join(fdir, "documents.parquet"),
    )
    register_views(spark, fdir)

    # the hot block really is oversized for the small cap
    hot_bsz = spark.sql(f"""
        WITH {dd._STAGED_SHINGLES_S},
        blocked AS (SELECT doc_id, substring(md5(array_min(sh)), 1, 8) AS blk FROM shing)
        SELECT max(cnt) AS m FROM (SELECT blk, count(*) AS cnt FROM blocked GROUP BY blk)
    """).collect()[0].m
    assert hot_bsz > 8, hot_bsz

    def run(sql):
        return sorted(map(tuple, spark.sql(sql).collect()))

    # ngram-jaccard (block-key) shape
    outs = [
        run(dd._collapsed_pairwise_spark(dd._blk_group_pairs(cap), threshold=0.3))
        for cap in (1, 8, 10**9)
    ]
    assert outs[0] == outs[1] == outs[2] and len(outs[0]) > 1500

    # banded-minhash shape (md5 twin's sigs CTE)
    sigs_cte = f"""sigs AS (
  SELECT doc_id,
         {dd._minhash_cols("array_min", "transform")}
  FROM shing
)"""
    bouts = [
        run(dd._collapsed_pairwise_spark(dd._banded_candidates(sigs_cte, cap=cap)))
        for cap in (1, 8, 10**9)
    ]
    assert bouts[0] == bouts[1] == bouts[2] and len(bouts[0]) > 0

    # simhash (chunk-key, struct payload) shape
    souts = [run(dd._simhash_spark_sql(cap)) for cap in (1, 8, 10**9)]
    assert souts[0] == souts[1] == souts[2] and len(souts[0]) > 0

    # leave the shared session back on the standard fixture
    register_views(spark, os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))


def test_simhash_kernel_matches_sql_reference(spark, sf_dir):
    """Round 14 (guide §4.2): the vectorized simhash signature kernel
    must reproduce the full output of the retained SQL spelling
    (_simhash_spark_sql) EXACTLY — integer signatures, so pairs AND
    hamming values are identical."""
    from duck_server_spark.engine.session import register_views
    from duck_server_spark.operators import dedup as dd

    register_views(spark, sf_dir)
    fast = sorted(map(tuple, dd.dedup_simhash(spark, sf_dir).collect()))
    ref = sorted(map(tuple, spark.sql(dd._simhash_spark_sql()).collect()))
    assert fast == ref and len(fast) > 0


def test_md5_minhash_kernel_matches_sql_reference(spark, sf_dir):
    """Round 14 (guide §4.2): the vectorized md5-minhash signature
    kernel must reproduce the full output of the retained SQL spelling
    (DEDUP_MINHASH_SPARK) EXACTLY — hex-string signatures feed the same
    banding, so pairs AND jaccards are identical."""
    from duck_server_spark.engine.session import register_views
    from duck_server_spark.operators import dedup as dd

    register_views(spark, sf_dir)
    fast = sorted(map(tuple, dd.dedup_minhash_lsh(spark, sf_dir).collect()))
    ref = sorted(map(tuple, spark.sql(dd.DEDUP_MINHASH_SPARK).collect()))
    assert fast == ref and len(fast) > 0
