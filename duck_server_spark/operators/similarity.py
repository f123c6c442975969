"""Similarity search over the embeddings table: brute-force cosine top-k
(the exactness baseline) and a sign-LSH bucketed ANN variant (the scale
path).

North-star extension (BASELINE.json). Scale design:
- Brute force: queries × corpus is a broadcast-nested-loop with the
  (small) query set broadcast; per-query top-k via window row_number.
  Exact, O(Q·N) — the baseline you verify ANN recall against. At 100 TB
  the corpus side stays partition-parallel: each task scores its
  partition against the broadcast queries and emits local top-k; only
  Q·k rows shuffle to finalize. (Catalyst gets this shape from
  broadcast-join + window.)
- Sign-LSH ANN: bucket = sign bits of the first B dimensions
  (axis-aligned random-hyperplane LSH — deterministic and portable).
  Probe only the query's bucket: the join becomes an equi-join on
  bucket id → one shuffle, no Q×N blowup. Recall is tunable via B and
  multi-probe; the oracle twin computes the identical buckets so
  results match exactly.
- Cosines are computed in double via left-to-right folds — bit-identical
  across engines (see operators/dedup.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from duck_server_spark.engine.session import register_views


def _fixture_embeddings(sf_dir: str):
    """(vec_id int64 vector, n×64 float64 matrix) of the embeddings
    fixture, sorted by vec_id — read driver-side with pyarrow, NOT a
    Spark job. The similarity family parameterizes its plans with tiny
    deterministic samples of this table (Q=5 query vectors, K=16 coarse
    centroids, the 256-row trainer sample); round 14 (VERDICT r13 item
    1/2): deriving them via build-time ``collect()`` meant the
    lazy-plan memo carried a materialized Spark result across
    invocations — reps ≥ 2 of a bench skipped a real job. Reading the
    source parquet directly makes every build recompute the sample from
    the input file (µs-scale), so the builders are genuinely stateless:
    the memoized object is a pure plan handle and every invocation costs
    the same. Values are bit-identical to the SQL spelling: parquet
    float32 → float64 widening is exact in both numpy and the JVM, and
    vec_id is a unique sort key (pinned by
    tests/test_scale_paths.py::test_fixture_sample_matches_spark_collect).
    At 100 TB the samples come from a small dedicated sample table read
    the same way (never the full corpus)."""
    import numpy as np
    import pyarrow.parquet as pq

    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    vid = t.column("vec_id").to_numpy()
    arr = t.column("embedding").combine_chunks()
    flat = np.asarray(arr.values, dtype=np.float32)
    if len(vid) * _EMB_DIM == flat.size:
        mat = flat.reshape(len(vid), _EMB_DIM).astype(np.float64)
    else:  # ragged/guard path — never taken on the fixed-width fixture
        mat = np.vstack(arr.to_numpy(zero_copy_only=False)).astype(np.float64)
    order = np.argsort(vid)
    return vid[order], mat[order]


_EMB_DIM = 64

_DOT_S = "aggregate(zip_with(q.embedding, c.embedding, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0.0D, (acc, v) -> acc + v)"
_NRM_S = "aggregate(transform({0}.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 0.0D, (acc, v) -> acc + v)"
_DOT_D = "list_reduce(list_prepend(0.0, list_transform(generate_series(1, len(q.embedding)), i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE))), (acc, v) -> acc + v)"
_NRM_D = "list_reduce(list_prepend(0.0, list_transform({0}.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (acc, v) -> acc + v)"

_COS_S = f"{_DOT_S} / (sqrt({_NRM_S.format('q')}) * sqrt({_NRM_S.format('c')}))"
_COS_D = f"{_DOT_D} / (sqrt({_NRM_D.format('q')}) * sqrt({_NRM_D.format('c')}))"

# 8-bit sign-LSH bucket over the first 8 dimensions.
_BUCKET_BITS = 8
_BUCKET_S = " + ".join(
    f"(CASE WHEN element_at({{0}}.embedding, {j + 1}) > 0 THEN {2**j} ELSE 0 END)"
    for j in range(_BUCKET_BITS)
)
_BUCKET_D = " + ".join(
    f"(CASE WHEN {{0}}.embedding[{j + 1}] > 0 THEN {2**j} ELSE 0 END)"
    for j in range(_BUCKET_BITS)
)

SIM_BRUTE_SPARK = f"""
WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS cand_id, {_COS_S} AS cosine
  FROM q JOIN embeddings c ON q.vec_id <> c.vec_id
),
ranked AS (
  SELECT query_id, cand_id, cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id ASC) AS rnk
  FROM scored
)
SELECT query_id, cand_id, cosine, rnk FROM ranked WHERE rnk <= 10
"""

SIM_BRUTE_DUCK = f"""
WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS cand_id, {_COS_D} AS cosine
  FROM q JOIN embeddings c ON q.vec_id <> c.vec_id
),
ranked AS (
  SELECT query_id, cand_id, cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id ASC) AS rnk
  FROM scored
)
SELECT query_id, cand_id, cosine, rnk FROM ranked WHERE rnk <= 10
"""

SIM_LSH_SPARK = f"""
WITH b AS (
  SELECT vec_id, embedding, {_BUCKET_S.format('embeddings')} AS bucket
  FROM embeddings
),
q AS (SELECT vec_id, embedding, bucket FROM b WHERE vec_id < 20),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS cand_id, c.bucket AS bucket, {_COS_S} AS cosine
  FROM q JOIN b c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
),
ranked AS (
  SELECT query_id, cand_id, bucket, cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id ASC) AS rnk
  FROM scored
)
SELECT query_id, cand_id, bucket, cosine, rnk FROM ranked WHERE rnk <= 5
"""

SIM_LSH_DUCK = f"""
WITH b AS (
  SELECT vec_id, embedding, {_BUCKET_D.format('b0')} AS bucket
  FROM embeddings b0
),
q AS (SELECT vec_id, embedding, bucket FROM b WHERE vec_id < 20),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS cand_id, c.bucket AS bucket, {_COS_D} AS cosine
  FROM q JOIN b c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
),
ranked AS (
  SELECT query_id, cand_id, bucket, cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id ASC) AS rnk
  FROM scored
)
SELECT query_id, cand_id, bucket, cosine, rnk FROM ranked WHERE rnk <= 5
"""


def _sql(spark_sql: str):
    def build(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_views(spark, sf_dir)
        return spark.sql(spark_sql)

    return build


_BRUTE_SEQ = [0]


def similarity_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 13 (guide §4.2): the Q×N cosine scoring — ~700k interpreted
    zip_with/aggregate lambda evaluations through the broadcast
    nested-loop join — moves to a mapInPandas numpy kernel over the
    2-column embeddings scan with the Q=5 query vectors broadcast. The
    float64 arithmetic replays the SQL fold's exact op order (sequential
    dim-by-dim dot/norm accumulation from 0.0; denominator multiplied
    before the division), so every cosine is bit-identical and the
    oracle hash is unchanged (gate-verified; measured 0.57 -> 0.35 s at
    sf0.1). Top-k stays the SQL window over the Q·N slim score rows —
    at 100 TB each task still scores its partition against the broadcast
    queries and only Q·k rows survive per partition after the window's
    partial WindowGroupLimit."""
    import numpy as np

    register_views(spark, sf_dir)
    # Round 14: query vectors come from a driver-side pyarrow read of the
    # fixture (see _fixture_embeddings) — no build-time Spark job, so the
    # plan memo never carries a collected result across invocations.
    vid, mat = _fixture_embeddings(sf_dir)
    sel = vid < 5
    qids = vid[sel]
    Q = mat[sel]
    nq = np.zeros(len(Q))
    for j in range(Q.shape[1]):
        nq += Q[:, j] * Q[:, j]
    sq = np.sqrt(nq)
    bq = spark.sparkContext.broadcast((qids, Q, sq))

    def score(batches):
        import pandas as pd

        qids_, Q_, sq_ = bq.value
        nqv = len(qids_)
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            C = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
            nc = np.zeros(n)
            for j in range(C.shape[1]):
                nc += C[:, j] * C[:, j]
            sc = np.sqrt(nc)
            acc = np.zeros((n, nqv))
            for j in range(C.shape[1]):
                acc += C[:, j][:, None] * Q_[:, j][None, :]
            cos = acc / (sc[:, None] * sq_[None, :])
            cid = pdf["vec_id"].to_numpy()
            out_q = np.tile(qids_, n)
            out_c = np.repeat(cid, nqv)
            out_cos = cos.reshape(-1)
            keep = out_q != out_c
            yield pd.DataFrame(
                {
                    "query_id": out_q[keep],
                    "cand_id": out_c[keep],
                    "cosine": out_cos[keep],
                }
            )

    _BRUTE_SEQ[0] += 1
    view = f"brute_scores_{_BRUTE_SEQ[0]}"
    (
        spark.table("embeddings")
        .select("vec_id", "embedding")
        .mapInPandas(score, "query_id BIGINT, cand_id BIGINT, cosine DOUBLE")
        .createOrReplaceTempView(view)
    )
    return spark.sql(f"""
SELECT query_id, cand_id, cosine, rnk FROM (
  SELECT query_id, cand_id, cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id ASC) AS rnk
  FROM {view}
) WHERE rnk <= 10
""")


QUERIES = {
    "similarity_topk_bruteforce": similarity_topk_bruteforce,
    "similarity_ann_lsh": _sql(SIM_LSH_SPARK),
}

ORACLE = {
    "similarity_topk_bruteforce": SIM_BRUTE_DUCK,
    "similarity_ann_lsh": SIM_LSH_DUCK,
}


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the coarse-quantizer scale path
# ---------------------------------------------------------------------------
# Classic IVF shape (the Faiss IVFFlat layout, built from Spark
# primitives): (1) pick K coarse centroids; (2) assign every corpus
# vector to its nearest centroid via a broadcast join (N x K
# comparisons, each task scores its partition against the broadcast
# centroid table; min_by collapses to one row per vector BEFORE any
# shuffle); (3) queries probe their nprobe nearest centroid lists only,
# turning the search into an equi-join on centroid_id → one shuffle
# sized by the probed lists, never Q x N. Recall is tuned by K/nprobe.
#
# TWO variants:
# - `similarity_ann_ivf`: the coarse centroids are DETERMINISTIC and
#   SQL-expressible (the first K corpus vectors with vec_id % 3 = 0,
#   zero Lloyd iterations — a valid quantizer, just untrained), so the
#   ENTIRE assignment→probe→top-k pipeline has a DuckDB oracle twin and
#   hash-checks in the driver. All float math is left-to-right folds in
#   double — bit-identical across engines (see module docstring).
# - `similarity_ann_ivf_trained`: same pipeline with Lloyd-trained
#   centroids (numpy on a small deterministic sample — production
#   samples ~1M of the 100 TB corpus the same way). The trainer has no
#   SQL twin → rows-only; recall vs exact brute force is asserted in
#   tests/test_operators.py.

_IVF_K = 16
_IVF_NPROBE = 4
_IVF_TOPK = 5

_IVF_DIST_S = (
    "aggregate(zip_with(e.embedding, t.centroid, "
    "(x, y) -> (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)), 0.0D, (acc, v) -> acc + v)"
)
_IVF_DIST_D = (
    "list_reduce(list_prepend(0.0, list_transform(generate_series(1, len(e.embedding)), "
    "i -> (CAST(e.embedding[i] AS DOUBLE) - t.centroid[i]) * (CAST(e.embedding[i] AS DOUBLE) - t.centroid[i]))), "
    "(acc, v) -> acc + v)"
)

SIM_IVF_SPARK = f"""
WITH cents AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INT) - 1 AS centroid_id,
         transform(embedding, x -> CAST(x AS DOUBLE)) AS centroid
  FROM (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 3 = 0 ORDER BY vec_id LIMIT {_IVF_K})
),
corpus_scored AS (
  SELECT e.vec_id, t.centroid_id, {_IVF_DIST_S} AS d2
  FROM embeddings e CROSS JOIN cents t
),
-- assignment as an aggregation, not a window: the broadcast cross join
-- scores N x K inside each task and the partial min_by collapses to one
-- row per vector BEFORE the shuffle (a window here would shuffle N x K)
-- (round-13 note: an assignment-as-projection variant — argmin over a
-- collected centroid array, no join/agg — MEASURED SLOWER at sf0.1
-- (1.0 -> 1.1 s; semantic clusters 1.8 -> 2.1 s): the min_by exchange
-- subtree is canonical-identical across CTE references, so AQE reuses
-- the shuffle stage, while a projection recomputes per reference)
assign AS (
  SELECT vec_id, min_by(centroid_id, struct(d2, centroid_id)) AS centroid_id
  FROM corpus_scored GROUP BY vec_id
),
lists AS (
  SELECT e.vec_id, e.embedding, a.centroid_id
  FROM embeddings e JOIN assign a ON e.vec_id = a.vec_id
),
-- the query side is tiny: filter first, then the window is over Q x K rows
qprobe AS (
  SELECT vec_id, embedding, centroid_id FROM (
    SELECT e.vec_id, e.embedding, t.centroid_id,
           row_number() OVER (PARTITION BY e.vec_id ORDER BY {_IVF_DIST_S} ASC, t.centroid_id ASC) AS crnk
    FROM embeddings e CROSS JOIN cents t
    WHERE e.vec_id < 5
  ) WHERE crnk <= {_IVF_NPROBE}
),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS cand_id, {_COS_S} AS cosine
  FROM qprobe q JOIN lists c
    ON q.centroid_id = c.centroid_id AND q.vec_id <> c.vec_id
),
ranked AS (
  SELECT query_id, cand_id, cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id ASC) AS rnk
  FROM scored
)
SELECT query_id, cand_id, cosine, rnk FROM ranked WHERE rnk <= {_IVF_TOPK}
"""

SIM_IVF_DUCK = f"""
WITH cents AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INT) - 1 AS centroid_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS centroid
  FROM (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 3 = 0 ORDER BY vec_id LIMIT {_IVF_K})
),
corpus_scored AS (
  SELECT e.vec_id, t.centroid_id, {_IVF_DIST_D} AS d2
  FROM embeddings e CROSS JOIN cents t
),
assign AS (
  SELECT vec_id, centroid_id FROM (
    SELECT vec_id, centroid_id,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, centroid_id ASC) AS arnk
    FROM corpus_scored
  ) WHERE arnk = 1
),
lists AS (
  SELECT e.vec_id, e.embedding, a.centroid_id
  FROM embeddings e JOIN assign a ON e.vec_id = a.vec_id
),
qprobe AS (
  SELECT vec_id, embedding, centroid_id FROM (
    SELECT e.vec_id, e.embedding, t.centroid_id,
           row_number() OVER (PARTITION BY e.vec_id ORDER BY {_IVF_DIST_D} ASC, t.centroid_id ASC) AS crnk
    FROM embeddings e CROSS JOIN cents t
    WHERE e.vec_id < 5
  ) WHERE crnk <= {_IVF_NPROBE}
),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS cand_id, {_COS_D} AS cosine
  FROM qprobe q JOIN lists c
    ON q.centroid_id = c.centroid_id AND q.vec_id <> c.vec_id
),
ranked AS (
  SELECT query_id, cand_id, cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id ASC) AS rnk
  FROM scored
)
SELECT query_id, cand_id, cosine, rnk FROM ranked WHERE rnk <= {_IVF_TOPK}
"""


def _train_sample_matrix(sf_dir: str):
    """The bounded deterministic trainer sample shared by the IVF and PQ
    trainers — the first 256 embeddings with vec_id % 3 = 0 ordered by
    vec_id, as a float64 matrix. Driver-side pyarrow read (see
    _fixture_embeddings): no Spark job at build time."""
    vid, mat = _fixture_embeddings(sf_dir)
    X = mat[vid % 3 == 0][:256]
    # hard cap: the driver-side matrix must stay O(sample·dim) no matter
    # how the sampling slice above is edited
    assert len(X) <= 256, f"training sample unbounded: {len(X)}"
    return X


def _train_ivf_centroids(sf_dir: str):
    """SPHERICAL k-means on a bounded deterministic sample: vectors are
    L2-normalized and centroids re-normalized each Lloyd round, so
    Voronoi cells partition by ANGLE — matching the cosine ranking the
    probe stage uses (measured recall@5 at nprobe=8: 0.96 spherical vs
    0.92 euclidean on the near-random fixture; the gap widens on corpora
    with real angular cluster structure). Training cost is
    O(256·K·dim) regardless of corpus size — the 256-vector cap is the
    guard; production trains on a ~1M sample of the 100 TB corpus the
    same way."""
    import numpy as np

    X = _train_sample_matrix(sf_dir).copy()
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    C = X[: _IVF_K].copy()  # deterministic init: first K sampled vectors
    for _ in range(10):
        assign = (X @ C.T).argmax(1)  # max cosine == min angle
        for j in range(_IVF_K):
            members = X[assign == j]
            if len(members):
                m = members.mean(0)
                C[j] = m / max(float(np.linalg.norm(m)), 1e-12)
    return [(int(j), [float(v) for v in C[j]]) for j in range(_IVF_K)]


def similarity_ann_ivf_trained(
    spark: SparkSession, sf_dir: str, nprobe: int = _IVF_NPROBE, topk: int = _IVF_TOPK
) -> DataFrame:
    """Lloyd-trained IVF with a tunable multi-probe width.

    nprobe is THE recall/cost dial of an IVF index: each query scores
    only the vectors in its nprobe nearest centroid lists, so probe cost
    grows ~linearly in nprobe (nprobe/K of the corpus at uniform list
    sizes) while recall@k climbs toward 1.0 at nprobe=K (probing every
    list = exhaustive search). The recall@k-vs-nprobe curve is asserted
    in tests/test_operators.py::test_ivf_recall_curve_vs_nprobe and the
    tradeoff is documented in SCALE.md."""
    register_views(spark, sf_dir)
    cents = _train_ivf_centroids(sf_dir)
    cdf = spark.createDataFrame(cents, "centroid_id INT, centroid ARRAY<DOUBLE>")
    cdf.createOrReplaceTempView("ivf_centroids")
    # centroids are unit-norm (spherical k-means), so argmin angle ==
    # argmax raw dot product — the per-vector norm is a constant factor
    # that never changes the ordering, and no normalization runs per row
    dot = (
        "aggregate(zip_with(e.embedding, t.centroid, "
        "(x, y) -> CAST(x AS DOUBLE) * y), 0.0D, (acc, v) -> acc + v)"
    )
    return spark.sql(f"""
WITH corpus_scored AS (
  SELECT e.vec_id, t.centroid_id, {dot} AS dp
  FROM embeddings e CROSS JOIN ivf_centroids t
),
-- assignment as an aggregation, not a window: the broadcast cross join
-- scores N x K inside each task and the partial min_by collapses to one
-- row per vector BEFORE the shuffle (a window here would shuffle N x K)
assign AS (
  SELECT vec_id, min_by(centroid_id, struct(-dp, centroid_id)) AS centroid_id
  FROM corpus_scored GROUP BY vec_id
),
lists AS (
  SELECT e.vec_id, e.embedding, a.centroid_id
  FROM embeddings e JOIN assign a ON e.vec_id = a.vec_id
),
-- the query side is tiny: filter first, then the window is over Q x K rows
qprobe AS (
  SELECT vec_id, embedding, centroid_id FROM (
    SELECT e.vec_id, e.embedding, t.centroid_id,
           row_number() OVER (PARTITION BY e.vec_id ORDER BY {dot} DESC, t.centroid_id ASC) AS crnk
    FROM embeddings e CROSS JOIN ivf_centroids t
    WHERE e.vec_id < 5
  ) WHERE crnk <= {nprobe}
),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS cand_id, {_COS_S} AS cosine
  FROM qprobe q JOIN lists c
    ON q.centroid_id = c.centroid_id AND q.vec_id <> c.vec_id
),
ranked AS (
  SELECT query_id, cand_id, cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id ASC) AS rnk
  FROM scored
)
SELECT query_id, cand_id, cosine, rnk FROM ranked WHERE rnk <= {topk}
""")


# Round 13 session 3 (guide §4.2): the corpus-assignment subtree of
# SIM_IVF_SPARK — the N·K·dim interpreted lambda fold through the
# broadcast cross join, the min_by exchange and the embeddings ⋈ assign
# join — moves to one mapInPandas numpy kernel (shared replay helpers
# `_ivf_centroid_matrix`/`_centroid_argmin`, defined with the SemDeDup
# kernel below): bit-identical assignments, pinned by
# tests/test_scale_paths.py::test_ivf_kernel_matches_sql_reference.
# The query-probe stage (Q·K = 80 rows) stays in SQL over a driver-built
# centroid view — identical doubles, trivial cost.

_IVF_SEQ = [0]


def similarity_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    register_views(spark, sf_dir)
    Cmat = _ivf_centroid_matrix(sf_dir)
    bc = spark.sparkContext.broadcast(Cmat)

    def assign(batches):
        C = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            E = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "embedding": pdf["embedding"],
                    "centroid_id": _centroid_argmin(E, C),
                }
            )

    _IVF_SEQ[0] += 1
    lview = f"ivf_lists_{_IVF_SEQ[0]}"
    (
        spark.table("embeddings")
        .select("vec_id", "embedding")
        .mapInPandas(assign, "vec_id BIGINT, embedding ARRAY<FLOAT>, centroid_id INT")
        .createOrReplaceTempView(lview)
    )
    cview = f"ivf_cents_{_IVF_SEQ[0]}"
    spark.createDataFrame(
        [(int(i), [float(v) for v in Cmat[i]]) for i in range(len(Cmat))],
        "centroid_id INT, centroid ARRAY<DOUBLE>",
    ).createOrReplaceTempView(cview)
    return spark.sql(f"""
WITH qprobe AS (
  SELECT vec_id, embedding, centroid_id FROM (
    SELECT e.vec_id, e.embedding, t.centroid_id,
           row_number() OVER (PARTITION BY e.vec_id ORDER BY {_IVF_DIST_S} ASC, t.centroid_id ASC) AS crnk
    FROM embeddings e CROSS JOIN {cview} t
    WHERE e.vec_id < 5
  ) WHERE crnk <= {_IVF_NPROBE}
),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS cand_id, {_COS_S} AS cosine
  FROM qprobe q JOIN {lview} c
    ON q.centroid_id = c.centroid_id AND q.vec_id <> c.vec_id
),
ranked AS (
  SELECT query_id, cand_id, cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id ASC) AS rnk
  FROM scored
)
SELECT query_id, cand_id, cosine, rnk FROM ranked WHERE rnk <= {_IVF_TOPK}
""")


QUERIES["similarity_ann_ivf"] = similarity_ann_ivf
ORACLE["similarity_ann_ivf"] = SIM_IVF_DUCK

QUERIES["similarity_ann_ivf_trained"] = similarity_ann_ivf_trained
# rows-only: driver-side k-means trainer has no SQL twin; recall vs the
# brute-force oracle is asserted in tests/test_operators.py


# ---------------------------------------------------------------------------
# Product-quantization ANN (asymmetric distance computation)
# ---------------------------------------------------------------------------
# Jégou et al. 2011 "Product Quantization for Nearest Neighbor Search" —
# the memory-side counterpart to IVF's probe-side pruning and the
# standard scale recipe for billion-vector indexes (FAISS IVFPQ): each
# vector is encoded as M sub-codes (one byte each — here M=8 over a
# 64-dim embedding, 16 centroids per subspace), a 32x compression that
# makes the whole corpus index RAM-resident at 100 TB where raw floats
# cannot be. Queries stay UNquantized: the M×K table of
# query-subvector→centroid distances is precomputed per query (ADC),
# and a candidate's approximate distance is M table lookups + a sum.
#
# Spark shape: the codebook (M·K = 128 rows) broadcasts; encoding is a
# broadcast cross join + min_by partial aggregation (the same
# assignment-as-aggregation plan as IVF — one shuffle of N·M slim code
# rows, never N·M·K); the ADC scoring is a broadcast hash join of the
# code table against the per-query distance table on (subspace, code)
# followed by one map-side-combined sum onto (query, candidate). No
# full-vector math touches the corpus after encoding.

_PQ_M = 8          # subspaces (64-dim embedding → 8 dims each)
_PQ_K = 16         # centroids per subspace → 4-bit codes, 8B/vector
_PQ_DIM = 64
_PQ_TOPK = 10


def _train_pq_codebook(sf_dir: str):
    """Per-subspace Lloyd's k-means on the SAME bounded deterministic
    sample as the IVF trainer (≤256 vectors, unit-normalized so L2 on
    subvectors tracks angle). O(256·M·K·dim) driver cost regardless of
    corpus size; production trains on a ~1M sample identically.
    Round 14: the sample comes from the pyarrow fixture read — training
    re-runs per build call (ms-scale numpy), so no trained state is ever
    carried across invocations and the old _PQ_CB_CACHE is gone."""
    import numpy as np

    X = _train_sample_matrix(sf_dir).copy()
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    d = _PQ_DIM // _PQ_M
    rows = []
    for m in range(_PQ_M):
        S = X[:, m * d : (m + 1) * d]
        C = S[:_PQ_K].copy()  # deterministic init: first K sample rows
        for _ in range(10):
            d2 = ((S[:, None, :] - C[None, :, :]) ** 2).sum(-1)
            assign = d2.argmin(1)
            for j in range(_PQ_K):
                members = S[assign == j]
                if len(members):
                    C[j] = members.mean(0)
        rows += [
            (m, j, [float(v) for v in C[j]]) for j in range(_PQ_K)
        ]
    return rows


# ---------------------------------------------------------------------------
# Matryoshka (MRL) prefix-dimension retrieval (round 5)
# ---------------------------------------------------------------------------
# Kusupati et al. 2022 "Matryoshka Representation Learning" — modern
# embedding models are trained so PREFIXES of the vector are themselves
# valid embeddings; retrieval stacks exploit this by ranking with a
# cheap low-dim prefix and refining with the full vector (cost of the
# first pass ∝ prefix dim — an 8x-cheaper scan at dim 8 of 64). This op
# materializes the top-5 ranking at prefix dims 8 / 16 / 64 side by
# side (dim 64 IS the full-vector ranking); the recall-vs-dim curve is
# asserted in tests/test_operators.py. Exact SQL on both engines: dot
# and norms fold left-to-right over the sliced prefix, so the doubles
# are bit-identical.

_PDOT_S = (
    "aggregate(zip_with(slice(q.embedding, 1, d.dim), slice(c.embedding, 1, d.dim), "
    "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0.0D, (acc, v) -> acc + v)"
)
_PNRM_S = (
    "aggregate(transform(slice({0}.embedding, 1, d.dim), "
    "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 0.0D, (acc, v) -> acc + v)"
)
_PCOS_S = f"{_PDOT_S} / (sqrt({_PNRM_S.format('q')}) * sqrt({_PNRM_S.format('c')}))"

_PDOT_D = (
    "list_reduce(list_prepend(0.0, list_transform(generate_series(1, d.dim), "
    "i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE))), "
    "(acc, v) -> acc + v)"
)
_PNRM_D = (
    "list_reduce(list_prepend(0.0, list_transform(generate_series(1, d.dim), "
    "i -> CAST({0}.embedding[i] AS DOUBLE) * CAST({0}.embedding[i] AS DOUBLE))), "
    "(acc, v) -> acc + v)"
)
_PCOS_D = f"{_PDOT_D} / (sqrt({_PNRM_D.format('q')}) * sqrt({_PNRM_D.format('c')}))"

SIM_MATRYOSHKA_SPARK = f"""
WITH d AS (SELECT * FROM VALUES (8), (16), (64) AS t(dim)),
q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5),
scored AS (
  SELECT d.dim, q.vec_id AS query_id, c.vec_id AS cand_id, {_PCOS_S} AS cosine
  FROM q JOIN embeddings c ON q.vec_id <> c.vec_id CROSS JOIN d
),
ranked AS (
  SELECT dim, query_id, cand_id, cosine,
         row_number() OVER (PARTITION BY dim, query_id ORDER BY cosine DESC, cand_id ASC) AS rnk
  FROM scored
)
SELECT dim, query_id, cand_id, cosine, rnk FROM ranked WHERE rnk <= 5
"""

SIM_MATRYOSHKA_DUCK = f"""
WITH d AS (SELECT * FROM (VALUES (8), (16), (64)) t(dim)),
q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5),
scored AS (
  SELECT d.dim, q.vec_id AS query_id, c.vec_id AS cand_id, {_PCOS_D} AS cosine
  FROM q JOIN embeddings c ON q.vec_id <> c.vec_id CROSS JOIN d
),
ranked AS (
  SELECT dim, query_id, cand_id, cosine,
         row_number() OVER (PARTITION BY dim, query_id ORDER BY cosine DESC, cand_id ASC) AS rnk
  FROM scored
)
SELECT dim, query_id, cand_id, cosine, rnk FROM ranked WHERE rnk <= 5
"""

QUERIES["similarity_matryoshka_topk"] = _sql(SIM_MATRYOSHKA_SPARK)
ORACLE["similarity_matryoshka_topk"] = SIM_MATRYOSHKA_DUCK


_PQ_SEQ = [0]


def similarity_ann_pq(
    spark: SparkSession, sf_dir: str, topk: int = _PQ_TOPK, shortlist: int = 100
) -> DataFrame:
    """PQ-ADC shortlist + exact re-rank (the FAISS IVFPQ+refine recipe):
    the compressed codes produce a `shortlist`-sized candidate set per
    query via table-lookup distances, and only those candidates get the
    exact cosine — full-vector math touches shortlist·Q rows, never the
    corpus. `shortlist` is the recall/cost dial (measured on the
    near-random fixture: top-10-in-shortlist recall 0.66 @ 50 → 0.82
    @ 100; code-only ranking without re-rank is 0.16 — asserted in
    tests/test_operators.py). At 100 TB the shortlist is a fixed-size
    per-query constant while the corpus index stays 8 B/vector.

    Round 13 (guide §4.2): the corpus ENCODE stage — N·M·K interpreted
    zip_with/aggregate lambdas, measured as ~75% of the 2.1 s sf0.1
    query — is now a mapInPandas numpy kernel over the (pruned) 2-column
    embeddings scan, with the 128-row codebook broadcast to the workers.
    The float64 arithmetic replays the SQL fold's exact op order
    (sequential accumulation dim-by-dim; argmin first-hit tie-break ==
    min_by struct(l2, code)), so the emitted codes are bit-identical —
    asserted against the SQL encoder in tests/test_scale_paths.py. The
    query-side ADC table (Q·M·K, tiny) stays in SQL."""
    import numpy as np

    register_views(spark, sf_dir)
    cb_rows = _train_pq_codebook(sf_dir)
    cb = spark.createDataFrame(cb_rows, "m INT, code INT, centroid ARRAY<DOUBLE>")
    cb.createOrReplaceTempView("pq_codebook")
    d = _PQ_DIM // _PQ_M
    # STAGED lambdas (the repo-wide rule — Spark evaluates higher-order
    # fns interpreted with no CSE): the unit-normalized vector is
    # materialized ONCE per row in `e`; the per-(row × codebook-entry)
    # work is then just one slice + one zip_with, not a re-normalization
    # of the full 64-dim vector 128 times
    sub = f"slice(e.ne, b.m * {d} + 1, {d})"
    l2 = (
        f"aggregate(zip_with({sub}, b.centroid, (x, y) -> (x - y) * (x - y)), "
        "0.0D, (acc, v) -> acc + v)"
    )
    nrm = (
        "greatest(sqrt(aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * x), "
        "0.0D, (acc, v) -> acc + v)), CAST(1e-12 AS DOUBLE))"
    )

    Carr = np.zeros((_PQ_M, _PQ_K, d), dtype=np.float64)
    for m, k, cent in cb_rows:
        Carr[m, k] = cent
    bc = spark.sparkContext.broadcast(Carr)

    def encode(batches):
        import pandas as pd

        C = bc.value
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            E = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
            # sequential dim-by-dim accumulation == the SQL fold's order
            acc = np.zeros(n)
            for j in range(E.shape[1]):
                acc += E[:, j] * E[:, j]
            ne = E / np.maximum(np.sqrt(acc), 1e-12)[:, None]
            codes = np.empty((n, _PQ_M), dtype=np.int32)
            for m in range(_PQ_M):
                smat = ne[:, m * d : (m + 1) * d]
                l2m = np.empty((n, _PQ_K))
                for k in range(_PQ_K):
                    a = np.zeros(n)
                    for j in range(d):
                        t = smat[:, j] - C[m, k, j]
                        a += t * t
                    l2m[:, k] = a
                # argmin's first-hit tie-break == min_by struct(l2, code)
                codes[:, m] = l2m.argmin(1)
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(pdf["vec_id"].to_numpy(), _PQ_M),
                    "m": np.tile(np.arange(_PQ_M, dtype=np.int32), n),
                    "code": codes.reshape(-1),
                }
            )

    _PQ_SEQ[0] += 1
    codes_view = f"pq_codes_{_PQ_SEQ[0]}"
    (
        spark.table("embeddings")
        .select("vec_id", "embedding")
        .mapInPandas(encode, "vec_id BIGINT, m INT, code INT")
        .createOrReplaceTempView(codes_view)
    )
    return spark.sql(f"""
WITH e AS (
  SELECT vec_id, transform(embedding, x -> CAST(x AS DOUBLE) / nrm) AS ne
  FROM (SELECT vec_id, embedding, {nrm} AS nrm FROM embeddings WHERE vec_id < 5)
),
-- ADC TABLE: per query, distance from each query subvector to every
-- centroid (Q·M·K rows — tiny, broadcasts)
adc AS (
  SELECT e.vec_id AS query_id, b.m, b.code, {l2} AS dist
  FROM e CROSS JOIN pq_codebook b
),
-- SCORE: M table lookups + one map-side-combined sum per candidate
-- (codes come from the vectorized encoder view — N·M slim rows)
scored AS (
  SELECT a.query_id, c.vec_id AS cand_id, sum(a.dist) AS approx_d2
  FROM {codes_view} c JOIN adc a ON c.m = a.m AND c.code = a.code
  WHERE c.vec_id <> a.query_id
  GROUP BY a.query_id, c.vec_id
),
-- SHORTLIST: per-query top-`shortlist` by approximate distance
short AS (
  SELECT query_id, cand_id FROM (
    SELECT query_id, cand_id,
           row_number() OVER (PARTITION BY query_id ORDER BY approx_d2 ASC, cand_id ASC) AS arnk
    FROM scored
  ) WHERE arnk <= {shortlist}
),
-- RE-RANK: exact cosine on shortlist rows only (never the corpus)
exact AS (
  SELECT s.query_id, s.cand_id, {_COS_S} AS cosine
  FROM short s
  JOIN embeddings q ON q.vec_id = s.query_id
  JOIN embeddings c ON c.vec_id = s.cand_id
),
ranked AS (
  SELECT query_id, cand_id, cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id ASC) AS rnk
  FROM exact
)
SELECT query_id, cand_id, cosine, rnk FROM ranked WHERE rnk <= {topk}
""")


def similarity_ann_pq_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BOUNDED-ERROR ORACLE GATE for the PQ-ADC pipeline (round 8,
    VERDICT r7 punch item 3 — the r6 HLL/Theta recipe applied to ANN):
    ADC estimates are approximate by design and the codebook trainer has
    no SQL twin, so the gate can't hash the ANN output directly. Instead
    this row outputs, per query, the EXACT brute-force top-10 membership
    (sorted, comma-joined — fully DuckDB-expressible) plus `recall_ok` =
    (PQ recall@10 at shortlist=100 ≥ 0.5). The oracle emits the same
    exact top-10 with TRUE, so the hash matches iff every query meets
    the recall bound. The SHORTLIST SCALES WITH THE CORPUS (round-8
    sf0.1 gate catch: a fixed shortlist=100 is 20% of the sf0.01 corpus
    but 5% of sf0.1's, and recall fell to 0.4 — the FAISS contract is
    that the shortlist is the recall dial, so the gate pins recall AT A
    FIXED CORPUS FRACTION: shortlist = max(100, N/5), measured per-query
    ≥ 0.6 at both fixtures, deterministic — codebook training samples
    are fixed). The raw estimate plan stays registered as
    `similarity_ann_pq_est` (rows-only) and is what bench.py times."""
    register_views(spark, sf_dir)
    # corpus size from the parquet footer (round 14): the old count()
    # action was a build-time Spark job the plan memo would skip on
    # reps ≥ 2; the footer row count is the same number with no job.
    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, "embeddings.parquet")
    try:
        n = pq.ParquetFile(path).metadata.num_rows
    except (OSError, IsADirectoryError):  # multi-file fixture copies
        n = pq.read_table(path, columns=["vec_id"]).num_rows
    ann = similarity_ann_pq(spark, sf_dir, shortlist=max(100, n // 5))
    exact = _sql(SIM_BRUTE_SPARK)(spark, sf_dir).where("rnk <= 10")
    from pyspark.sql import functions as F

    # ONE pass over the exact pipeline (round 13 session 5, guide §2.4):
    # the old shape consumed `exact` twice (the top-10 aggregate AND the
    # hit join), re-running the whole brute-force scoring per consumer.
    # (query_id, cand_id) is unique in both sides, so a LEFT join
    # preserves exactly the exact rows; count(hit) is the old
    # coalesce(n_hit, 0) and the sorted collect_list is order-insensitive.
    marked = exact.select("query_id", "cand_id").join(
        ann.select("query_id", "cand_id").withColumn("hit", F.lit(1)),
        ["query_id", "cand_id"],
        "left",
    )
    return (
        marked.groupBy("query_id")
        .agg(
            F.array_join(F.sort_array(F.collect_list("cand_id")), ",").alias(
                "exact_top"
            ),
            F.count(F.lit(1)).alias("k"),
            F.count("hit").alias("n_hit"),
        )
        .select(
            "query_id",
            "exact_top",
            (F.col("n_hit") >= 0.5 * F.col("k")).alias("recall_ok"),
        )
        .orderBy("query_id")
    )


QUERIES["similarity_ann_pq"] = similarity_ann_pq_gate
ORACLE["similarity_ann_pq"] = f"""
WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS cand_id, {_COS_D} AS cosine
  FROM q JOIN embeddings c ON q.vec_id <> c.vec_id
),
ranked AS (
  SELECT query_id, cand_id,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id ASC) AS rnk
  FROM scored
)
SELECT query_id,
       array_to_string(list_sort(list(cand_id)), ',') AS exact_top,
       TRUE AS recall_ok
FROM ranked WHERE rnk <= 10 GROUP BY query_id
"""
# The raw PQ-ADC plan (the one a 100 TB user runs, and the one bench.py
# times under the same name it has carried since round 5's measurements):
QUERIES["similarity_ann_pq_est"] = similarity_ann_pq
# rows-only: ADC distances are engine-specific estimates; the recall
# contract is hashed by the `similarity_ann_pq` gate row above and
# asserted at multiple shortlist settings in tests/test_operators.py


# ---------------------------------------------------------------------------
# Per-label embedding centroids — element-wise array aggregation
# ---------------------------------------------------------------------------
# The embedding-pipeline aggregation shape (class centroids, cluster
# means, prototype vectors): positions explode to (label, pos, val)
# rows, ONE shuffle on (label, pos) with map-side partial sums, and the
# centroid reassembles via a sorted collect of 64 elements per label.
# Float addition is not associative, so partition-parallel double sums
# would differ from the sequential oracle in last bits; components are
# summed in fixed-point (floor(val * 1e6) as BIGINT — exact, organized
# like the integer-cents moments in aggregates.py). The centroid is
# emitted as a ','-joined string of exact per-element rationals
# "sum_micros/n" (recover the double as sv/1e6/n): BIGINT→string
# formatting is engine-identical, double→string is not, and the
# verification driver's pandas canonicalizer can't hash ARRAY cells.

SIM_CENTROIDS_SPARK = """
WITH expl AS (
  SELECT label, i, CAST(floor(CAST(element_at(embedding, i) AS DOUBLE) * 1000000) AS BIGINT) AS v
  FROM embeddings LATERAL VIEW explode(sequence(1, 64)) t AS i
),
comp AS (
  SELECT label, i, sum(v) AS sv, count(*) AS n
  FROM expl GROUP BY label, i
)
SELECT label, max(n) AS n_vectors,
       array_join(transform(sort_array(collect_list(struct(i, sv, n))),
                 x -> concat(CAST(x.sv AS STRING), '/', CAST(x.n AS STRING))), ',') AS centroid
FROM comp GROUP BY label
"""

SIM_CENTROIDS_DUCK = """
WITH expl AS (
  SELECT label, i, CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS v
  FROM embeddings, generate_series(1, 64) t(i)
),
comp AS (
  SELECT label, i, sum(v) AS sv, count(*) AS n
  FROM expl GROUP BY label, i
)
SELECT label, max(n) AS n_vectors,
       array_to_string(list_transform(list_sort(list((i, sv, n))),
                      x -> concat(CAST(x[2] AS VARCHAR), '/', CAST(x[3] AS VARCHAR))), ',') AS centroid
FROM comp GROUP BY label
"""

QUERIES["embedding_centroids"] = _sql(SIM_CENTROIDS_SPARK)
ORACLE["embedding_centroids"] = SIM_CENTROIDS_DUCK


# ---------------------------------------------------------------------------
# Symmetric int8 embedding quantization — per-label error report
# ---------------------------------------------------------------------------
# The vector-store compression pass: q_i = round(x_i · 127 / max|x|)
# clamped to ±127, scale recorded per vector. Report per label:
# max / mean of the per-vector worst reconstruction error, mean scale,
# and the fraction of elements that quantize to zero (sparsity — the
# signal for whether int8 is losslessly droppable to int4).
#
# Scale shape: ONE scan, all per-element work in JVM higher-order
# functions over the 64-dim arrays (O(d) per row, no explode — the
# (row × dim) explode of the centroid op is unnecessary here because
# nothing aggregates across positions), then a single map-side-combined
# hash agg of 4 integer columns per label. Rounding uses
# floor(x + 0.5), whose double semantics both engines share (round()
# half-even vs half-up differs between engines); error/scale moments
# cross the shuffle as fixed-point BIGINTs (floor(x·1e9)) — exact
# integer sums at any parallelism, one cast to double at the end
# (same discipline as embedding_centroids above).

_QUANT_COMMON_HEAD = """
  SELECT vec_id, label,
         {tf}(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
"""

EMBED_QUANT_SPARK = f"""
WITH prep AS ({_QUANT_COMMON_HEAD.format(tf="transform")}),
scaled AS (
  SELECT vec_id, label, v,
         array_max(transform(v, x -> abs(x))) AS maxabs
  FROM prep
),
quant AS (
  SELECT vec_id, label, v, maxabs,
         CASE WHEN maxabs = 0.0 THEN transform(v, x -> CAST(0 AS BIGINT))
              ELSE transform(v, x -> CAST(greatest(-127.0,
                     least(127.0, floor(x * 127.0 / maxabs + 0.5))) AS BIGINT))
         END AS q
  FROM scaled
),
err AS (
  SELECT label,
         CAST(floor(array_max(transform(sequence(1, 64),
                i -> abs(element_at(v, i) - element_at(q, i) * maxabs / 127.0)))
              * 1000000000) AS BIGINT) AS err_fp,
         CAST(floor(maxabs * 1000000000) AS BIGINT) AS scale_fp,
         CAST(size(filter(q, x -> x = 0)) AS BIGINT) AS n_zero
  FROM quant
)
SELECT label, count(*) AS n_vectors,
       CAST(max(err_fp) AS DOUBLE) / 1000000000.0 AS max_abs_err,
       CAST(sum(err_fp) AS DOUBLE) / (1000000000.0 * count(*)) AS mean_max_err,
       CAST(sum(scale_fp) AS DOUBLE) / (1000000000.0 * count(*)) AS mean_scale,
       CAST(sum(n_zero) AS DOUBLE) / (64.0 * count(*)) AS zero_frac
FROM err
GROUP BY label
"""

EMBED_QUANT_DUCK = f"""
WITH prep AS ({_QUANT_COMMON_HEAD.format(tf="list_transform")}),
scaled AS (
  SELECT vec_id, label, v,
         list_max(list_transform(v, x -> abs(x))) AS maxabs
  FROM prep
),
quant AS (
  SELECT vec_id, label, v, maxabs,
         CASE WHEN maxabs = 0.0 THEN list_transform(v, x -> CAST(0 AS BIGINT))
              ELSE list_transform(v, x -> CAST(greatest(-127.0,
                     least(127.0, floor(x * 127.0 / maxabs + 0.5))) AS BIGINT))
         END AS q
  FROM scaled
),
err AS (
  SELECT label,
         CAST(floor(list_max(list_transform(generate_series(1, 64),
                i -> abs(v[i] - q[i] * maxabs / 127.0)))
              * 1000000000) AS BIGINT) AS err_fp,
         CAST(floor(maxabs * 1000000000) AS BIGINT) AS scale_fp,
         CAST(len(list_filter(q, x -> x = 0)) AS BIGINT) AS n_zero
  FROM quant
)
SELECT label, count(*) AS n_vectors,
       CAST(max(err_fp) AS DOUBLE) / 1000000000.0 AS max_abs_err,
       CAST(sum(err_fp) AS DOUBLE) / (1000000000.0 * count(*)) AS mean_max_err,
       CAST(sum(scale_fp) AS DOUBLE) / (1000000000.0 * count(*)) AS mean_scale,
       CAST(sum(n_zero) AS DOUBLE) / (64.0 * count(*)) AS zero_frac
FROM err
GROUP BY label
"""

QUERIES["embedding_quantization"] = _sql(EMBED_QUANT_SPARK)
ORACLE["embedding_quantization"] = EMBED_QUANT_DUCK


# ---------------------------------------------------------------------------
# SemDeDup-style semantic deduplication (Abbas et al. 2023)
# ---------------------------------------------------------------------------
# Embedding-space dedup at corpus scale: coarse k-means cells (the IVF
# quantizer above) give the first blocking level, an 8-bit sign-LSH
# bucket the second, and pairwise cosine runs ONLY inside a
# (centroid_id, bucket) block — never corpus². Pairs at cosine >= tau mark the
# higher vec_id as a drop, keeping the strongest keeper per dropped
# vector (deterministic cosine-then-id tie-break). Scale story: at
# 100 TB the pair space is sum(block²); K scales with the corpus (the
# paper uses ~100k clusters for billions of docs) and the sign bucket
# subdivides every cell by 256, so blocks stay bounded — the same
# two-level candidate discipline as dedup_minhash_lsh's bands. Both
# blocking joins are equi-joins on (centroid_id, bucket); assignment
# reuses the broadcast-centroids + min_by-aggregation plan audited for
# similarity_ann_ivf.
#
# Round 7: byte-identical embeddings COLLAPSE to one representative
# (GROUP BY the array — exact, the dedup_minhash_vectorized discipline)
# BEFORE assignment and pairwise scoring; their drops are emitted
# directly (kept_by = group-min rep, cosine = 1.0 — ties at cosine 1.0
# resolve to the smallest keep_id, which IS the rep, so this equals the
# rank-1 answer) and only distinct vectors enter the block-pair join.
# Exact duplicates are the one case two-level blocking can't bound —
# identical vectors share a cell AND a bucket by construction, so a K×
# verbatim-replicated corpus grew in-block pairs K² (the 10× sweep
# measured 5.2×); collapsed, the pair space is duplicate-free and the
# sweep is linear again.

# The raw fixture has no near-dup vector pairs (verified: zero pairs at
# cosine >= 0.5), so SemDeDup runs over the same injected near-dup
# corpus the dedup.py embedding op uses: every 10th vector re-appears
# with its first component overwritten (vec_id + 1_000_000).
_SEM_CORPUS_S = """
  SELECT vec_id, label, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000 AS vec_id, label,
         concat(array(CAST(0.5 AS FLOAT)), slice(embedding, 2, size(embedding) - 1)) AS embedding
  FROM embeddings WHERE vec_id % 10 = 0
"""

_SEM_CORPUS_D = """
  SELECT vec_id, label, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000 AS vec_id, label,
         list_concat([CAST(0.5 AS FLOAT)], list_slice(embedding, 2, len(embedding))) AS embedding
  FROM embeddings WHERE vec_id % 10 = 0
"""

_SEM_TAU = 0.85

SEM_DEDUP_SPARK = f"""
WITH raw AS ({_SEM_CORPUS_S}),
grp AS (
  SELECT min(vec_id) AS rep_id, embedding,
         sort_array(collect_list(vec_id)) AS ids
  FROM raw GROUP BY embedding
),
cents AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INT) - 1 AS centroid_id,
         transform(embedding, x -> CAST(x AS DOUBLE)) AS centroid
  FROM (SELECT vec_id, embedding FROM raw WHERE vec_id % 3 = 0 AND vec_id < 1000000 ORDER BY vec_id LIMIT {_IVF_K})
),
corpus_scored AS (
  SELECT e.rep_id AS vec_id, t.centroid_id, {_IVF_DIST_S} AS d2
  FROM grp e CROSS JOIN cents t
),
assign AS (
  SELECT vec_id, min_by(centroid_id, struct(d2, centroid_id)) AS centroid_id
  FROM corpus_scored GROUP BY vec_id
),
members AS (
  SELECT e.rep_id AS vec_id, e.embedding, a.centroid_id, {_BUCKET_S.format('e')} AS bucket
  FROM grp e JOIN assign a ON e.rep_id = a.vec_id
),
scored AS (
  SELECT q.vec_id AS drop_id, c.vec_id AS keep_id, q.centroid_id, {_COS_S} AS cosine
  FROM members q JOIN members c
    ON q.centroid_id = c.centroid_id AND q.bucket = c.bucket AND q.vec_id > c.vec_id
),
ranked AS (
  SELECT drop_id, keep_id, centroid_id, cosine,
         row_number() OVER (PARTITION BY drop_id ORDER BY cosine DESC, keep_id ASC) AS rnk
  FROM scored WHERE cosine >= {_SEM_TAU}
),
twin_drops AS (
  SELECT t.vid AS vec_id, g.rep_id AS kept_by, a.centroid_id,
         CAST(1.0 AS DOUBLE) AS cosine
  FROM grp g
  JOIN assign a ON a.vec_id = g.rep_id
  LATERAL VIEW explode(g.ids) t AS vid
  WHERE t.vid > g.rep_id
)
SELECT drop_id AS vec_id, keep_id AS kept_by, centroid_id, cosine
FROM ranked WHERE rnk = 1
UNION ALL
SELECT vec_id, kept_by, centroid_id, cosine FROM twin_drops
"""

SEM_DEDUP_DUCK = f"""
WITH raw AS ({_SEM_CORPUS_D}),
grp AS (
  SELECT min(vec_id) AS rep_id, embedding,
         list_sort(list(vec_id)) AS ids
  FROM raw GROUP BY embedding
),
cents AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INT) - 1 AS centroid_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS centroid
  FROM (SELECT vec_id, embedding FROM raw WHERE vec_id % 3 = 0 AND vec_id < 1000000 ORDER BY vec_id LIMIT {_IVF_K})
),
corpus_scored AS (
  SELECT e.rep_id AS vec_id, t.centroid_id, {_IVF_DIST_D} AS d2
  FROM grp e CROSS JOIN cents t
),
assign AS (
  SELECT vec_id, centroid_id FROM (
    SELECT vec_id, centroid_id,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, centroid_id ASC) AS arnk
    FROM corpus_scored
  ) WHERE arnk = 1
),
members AS (
  SELECT e.rep_id AS vec_id, e.embedding, a.centroid_id, {_BUCKET_D.format('e')} AS bucket
  FROM grp e JOIN assign a ON e.rep_id = a.vec_id
),
scored AS (
  SELECT q.vec_id AS drop_id, c.vec_id AS keep_id, q.centroid_id, {_COS_D} AS cosine
  FROM members q JOIN members c
    ON q.centroid_id = c.centroid_id AND q.bucket = c.bucket AND q.vec_id > c.vec_id
),
ranked AS (
  SELECT drop_id, keep_id, centroid_id, cosine,
         row_number() OVER (PARTITION BY drop_id ORDER BY cosine DESC, keep_id ASC) AS rnk
  FROM scored WHERE cosine >= {_SEM_TAU}
),
twin_drops AS (
  SELECT t.vid AS vec_id, g.rep_id AS kept_by, a.centroid_id,
         CAST(1.0 AS DOUBLE) AS cosine
  FROM grp g
  JOIN assign a ON a.vec_id = g.rep_id
  CROSS JOIN unnest(g.ids) AS t(vid)
  WHERE t.vid > g.rep_id
)
SELECT drop_id AS vec_id, keep_id AS kept_by, centroid_id, cosine
FROM ranked WHERE rnk = 1
UNION ALL
SELECT vec_id, kept_by, centroid_id, cosine FROM twin_drops
"""

# Round 13 session 3 (guide §4.2): the centroid-assignment fold —
# N·K·dim ≈ 10M interpreted zip_with/aggregate lambda evaluations
# through the grp × cents broadcast cross join, plus the assign
# exchange and the grp ⋈ assign join — moves to one mapInPandas numpy
# kernel over the grp rows with the 16 centroids broadcast. This is NOT
# the reverted assignment-as-projection variant (that kept the
# interpreted per-row lambda cost and recomputed it per CTE reference);
# the numpy kernel is ~ms per execution, so even recomputed per
# reference it undercuts the min_by subtree it replaces. The float64
# arithmetic replays the SQL fold's exact op order (sequential
# dim-by-dim (x−y)² accumulation from 0.0; argmin first-hit tie-break
# == min_by struct(d2, centroid_id)), so assignments are bit-identical —
# pinned by tests/test_scale_paths.py::
# test_semantic_kernel_matches_sql_reference (full-output equality vs
# SEM_DEDUP_SPARK). The sign-LSH bucket moves into the same kernel
# (integer sign bits — trivially exact). The pair scoring, ranking and
# twin expansion stay in SQL, unchanged.

_SEM_SEQ = [0]


def _ivf_centroid_matrix(sf_dir: str):
    """The deterministic coarse-centroid table of SIM_IVF/SEM_DEDUP as a
    K×dim float64 matrix. Matches both SQL spellings: SEM_DEDUP's cents
    filter `vec_id % 3 = 0 AND vec_id < 1000000` over the injected-union
    corpus equals this slice of `embeddings` because every injected id
    is >= 1000000 by construction and fixture ids are not. Round 14:
    pyarrow fixture read, no build-time Spark job (see
    _fixture_embeddings) — the old per-(session, fixture) collect memo
    is gone because there is nothing left worth memoizing."""
    return _train_sample_matrix(sf_dir)[:_IVF_K]


def _centroid_argmin(E, C):
    """argmin_k of the SQL d2 fold, replayed in float64: for each row,
    acc_k is accumulated dim-by-dim in array order (the zip_with +
    left-to-right aggregate), and argmin's first-hit tie-break equals
    min_by struct(d2, centroid_id)."""
    import numpy as np

    n = E.shape[0]
    acc = np.zeros((n, C.shape[0]))
    for j in range(E.shape[1]):
        dj = E[:, j : j + 1] - C[None, :, j]
        acc += dj * dj
    return acc.argmin(1).astype(np.int32)


def dedup_semantic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    register_views(spark, sf_dir)
    bc = spark.sparkContext.broadcast(_ivf_centroid_matrix(sf_dir))

    def assign(batches):
        C = bc.value
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            E = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
            cid = _centroid_argmin(E, C)
            # sign-LSH bucket: same bits as _BUCKET_S (embedding[j] > 0)
            bucket = np.zeros(n, dtype=np.int32)
            for j in range(_BUCKET_BITS):
                bucket += (E[:, j] > 0).astype(np.int32) << j
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "embedding": pdf["embedding"],
                    "ids": pdf["ids"],
                    "centroid_id": cid,
                    "bucket": bucket,
                }
            )

    _SEM_SEQ[0] += 1
    mview = f"sem_members_{_SEM_SEQ[0]}"
    (
        spark.sql(f"""
            SELECT min(vec_id) AS vec_id, embedding,
                   sort_array(collect_list(vec_id)) AS ids
            FROM ({_SEM_CORPUS_S}) GROUP BY embedding
        """)
        .mapInPandas(
            assign,
            "vec_id BIGINT, embedding ARRAY<FLOAT>, ids ARRAY<BIGINT>, "
            "centroid_id INT, bucket INT",
        )
        .createOrReplaceTempView(mview)
    )
    return spark.sql(f"""
WITH scored AS (
  SELECT q.vec_id AS drop_id, c.vec_id AS keep_id, q.centroid_id, {_COS_S} AS cosine
  FROM {mview} q JOIN {mview} c
    ON q.centroid_id = c.centroid_id AND q.bucket = c.bucket AND q.vec_id > c.vec_id
),
ranked AS (
  SELECT drop_id, keep_id, centroid_id, cosine,
         row_number() OVER (PARTITION BY drop_id ORDER BY cosine DESC, keep_id ASC) AS rnk
  FROM scored WHERE cosine >= {_SEM_TAU}
),
twin_drops AS (
  SELECT t.vid AS vec_id, m.vec_id AS kept_by, m.centroid_id,
         CAST(1.0 AS DOUBLE) AS cosine
  FROM {mview} m
  LATERAL VIEW explode(m.ids) t AS vid
  WHERE t.vid > m.vec_id
)
SELECT drop_id AS vec_id, keep_id AS kept_by, centroid_id, cosine
FROM ranked WHERE rnk = 1
UNION ALL
SELECT vec_id, kept_by, centroid_id, cosine FROM twin_drops
""")


QUERIES["dedup_semantic_clusters"] = dedup_semantic_clusters
ORACLE["dedup_semantic_clusters"] = SEM_DEDUP_DUCK
