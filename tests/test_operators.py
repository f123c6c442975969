"""Differential tests for the relational / aggregate / window operator
modules (each QUERIES entry vs its ORACLE twin; oracle-less entries just
smoke-run)."""

import pytest

from duck_server_spark.operators import (
    aggregates,
    dedup,
    events_time,
    llm_text,
    multimodal_ops,
    pipeline,
    relational,
    scalars,
    similarity,
    streaming_ops,
    windows,
)
from tests.conftest import assert_matches_oracle

MODULES = {
    "relational": relational,
    "aggregates": aggregates,
    "windows": windows,
    "scalars": scalars,
    "events_time": events_time,
    "llm_text": llm_text,
    "dedup": dedup,
    "similarity": similarity,
    "pipeline": pipeline,
    "multimodal_ops": multimodal_ops,
    "streaming_ops": streaming_ops,
}
CASES = [(mname, q) for mname, mod in sorted(MODULES.items()) for q in sorted(mod.QUERIES)]


@pytest.mark.parametrize("mname,name", CASES)
def test_operator(spark, duck, sf_dir, mname, name):
    mod = MODULES[mname]
    if name in mod.ORACLE:
        assert_matches_oracle(spark, duck, mod.QUERIES[name], mod.ORACLE[name], sf_dir)
    else:
        df = mod.QUERIES[name](spark, sf_dir)
        assert df.count() >= 0


def test_pipeline_clean_statuses_nonvacuous(spark, sf_dir):
    """The cleaning pass must exercise every drop reason on the fixture
    (a vacuous filter passing everything would still hash-match)."""
    from pyspark.sql import functions as F

    df = pipeline.QUERIES["pipeline_corpus_clean"](spark, sf_dir)
    counts = dict(df.groupBy("status").count().collect())
    assert counts.get("kept", 0) > 0
    assert counts.get("exact_dup", 0) > 0, "verbatim copies must be dropped"
    assert counts.get("near_dup", 0) > 0, "mutated copies must be dropped"
    assert counts.get("quality", 0) > 0, "short docs must be dropped"


def test_stratified_rates(spark, sf_dir):
    """Per-stratum sample rates should track the configured weights."""
    df = pipeline.QUERIES["sample_stratified"](spark, sf_dir)
    got = dict(
        (r["source"], r["count"]) for r in df.groupBy("source").count().collect()
    )
    # src0-3 ~100%, src15-19 ~10%: high-rate strata must dominate
    assert got.get("src0", 0) > 3 * max(got.get("src15", 0), 1)


def test_sequence_packing_invariants(spark, sf_dir):
    """Packing must never overflow a bin, must keep bins contiguous from
    0 within each (source, shard), and must cover every document."""
    from duck_server_spark.operators.pipeline import _PACK_CAPACITY

    rows = pipeline.QUERIES["sequence_packing"](spark, sf_dir).collect()
    total_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(rows) == total_docs
    fills: dict = {}
    for r in rows:
        key = (r.source, r.shard, r.bin_id)
        fills[key] = fills.get(key, 0) + r.n_tokens
    assert all(v <= _PACK_CAPACITY for v in fills.values()), "bin overflow"
    by_group: dict = {}
    for s, sh, b in fills:
        by_group.setdefault((s, sh), set()).add(b)
    for bins in by_group.values():
        assert bins == set(range(len(bins))), "bins must be 0..k contiguous"
    # packing must actually pack (multiple docs per bin somewhere)
    assert len(fills) < total_docs


def test_train_valid_test_fractions(spark, sf_dir):
    """Global split fractions must track 78/10/9 (out of 97)."""
    rows = pipeline.QUERIES["train_valid_test_split"](spark, sf_dir).collect()
    tot: dict = {}
    for r in rows:
        tot[r.split] = tot.get(r.split, 0) + r.n_docs
    n = sum(tot.values())
    assert 0.70 < tot["train"] / n < 0.90
    assert 0.04 < tot["valid"] / n < 0.18
    assert 0.03 < tot["test"] / n < 0.17


def test_embedding_quantization_error_bound(spark, sf_dir):
    """Symmetric int8 reconstruction error is bounded by half a
    quantization step: per-vector max err <= scale/254, so every
    label's max_abs_err <= (global max scale)/254."""
    rows = similarity.QUERIES["embedding_quantization"](spark, sf_dir).collect()
    assert rows, "must produce per-label stats"
    global_max_scale = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .selectExpr("max(array_max(transform(embedding, x -> abs(CAST(x AS DOUBLE))))) AS m")
        .collect()[0]["m"]
    )
    for r in rows:
        assert r.n_vectors > 0
        assert r.max_abs_err <= global_max_scale / 254 + 1e-9
        assert r.mean_max_err <= r.max_abs_err + 1e-12
        assert 0.0 <= r.zero_frac < 1.0


def test_doc_chunking_coverage(spark, sf_dir):
    """Chunks must tile every document: first chunk starts at 1, strides
    are 30, the last chunk reaches the final token, and no chunk
    exceeds 40 tokens."""
    rows = llm_text.QUERIES["doc_chunking"](spark, sf_dir).collect()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert by_doc
    multi = 0
    for chunks in by_doc.values():
        chunks.sort(key=lambda r: r.chunk_idx)
        assert chunks[0].chunk_start == 1
        for c in chunks:
            assert 1 <= c.chunk_len <= 40
            assert c.chunk_start == c.chunk_idx * 30 + 1
            assert len(c.chunk_text.split()) == c.chunk_len
        multi += len(chunks) > 1
    assert multi > 0, "fixture has >40-token docs; chunking must split them"


def test_oov_rate_bounds(spark, sf_dir):
    """OOV fraction is a proper rate and the top-30 vocab must actually
    cover some tokens (rate < 1 somewhere) without covering everything
    (rate > 0 somewhere)."""
    rows = llm_text.QUERIES["text_oov_rate"](spark, sf_dir).collect()
    assert rows
    assert all(0.0 <= r.oov_rate <= 1.0 for r in rows)
    assert any(r.oov_rate > 0 for r in rows)
    assert any(r.oov_rate < 1 for r in rows)


def test_quality_weighted_ht_unbiased(spark, sf_dir):
    """Horvitz-Thompson weights over the quality-weighted sample must
    estimate the full corpus size (one deterministic draw; envelope a
    few sigma wide)."""
    rows = pipeline.QUERIES["sample_quality_weighted"](spark, sf_dir).collect()
    assert rows
    total = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(rows) < total, "sampling must drop something"
    est = sum(r.ht_weight for r in rows)
    assert abs(est - total) / total < 0.15, f"HT estimate {est} vs {total}"


def test_kmv_estimate_tracks_exact(spark, sf_dir):
    """KMV estimate must land within the k=64 error envelope of the
    exact distinct count (std ~ 1/sqrt(k) = 12.5%; 3-sigma bound)."""
    r = aggregates.QUERIES["agg_kmv_distinct"](spark, sf_dir).collect()[0]
    assert r.exact_distinct > r.k, "estimator needs distinct > k"
    rel_err = abs(r.est_distinct - r.exact_distinct) / r.exact_distinct
    assert rel_err < 0.375, f"KMV rel err {rel_err:.3f} out of envelope"


@pytest.mark.parametrize("variant", ["similarity_ann_ivf", "similarity_ann_ivf_trained"])
def test_ivf_recall_vs_bruteforce(spark, sf_dir, variant):
    """IVF ANN must find a substantial share of the true top-5 (recall is
    tunable via K/nprobe; the floor guards against a broken bucketer).
    Covers both the deterministic-centroid (oracle-twinned) and the
    Lloyd-trained variant."""
    ivf = {
        (r.query_id, r.cand_id)
        for r in similarity.QUERIES[variant](spark, sf_dir).collect()
    }
    brute = {
        (r.query_id, r.cand_id)
        for r in similarity.QUERIES["similarity_topk_bruteforce"](spark, sf_dir).collect()
        if r.rnk <= 5
    }
    assert len(ivf) > 0
    assert len(ivf & brute) / len(brute) >= 0.5


def test_ivf_recall_curve_vs_nprobe(spark, sf_dir):
    """Multi-probe recall curve: recall@5 vs the exact top-5 must climb
    monotonically in nprobe and reach 1.0 at nprobe=K (probing every
    list IS exhaustive search). Measured fixture curve (spherical
    k-means, K=16): 1→0.48, 2→0.60, 4→0.76, 8→0.96, 12+→1.00.

    Why the thresholds sit where they do: the fixture embeddings are
    near-random (mean pairwise cosine 0.002, σ 0.13, max 0.48), so a
    query's true top-5 scatter across angular cells — no list structure
    can concentrate them. Real embedding corpora cluster far more
    sharply, pushing the curve left; the cost/recall tradeoff is
    documented in SCALE.md. The spherical (angle-partitioned) trainer
    aligns the cell metric with the cosine ranking metric; on this
    near-random fixture it measures modestly better than euclidean cells
    (0.96 vs 0.92 at nprobe=8) — the gap widens on corpora with real
    angular cluster structure."""
    brute = {
        (r.query_id, r.cand_id)
        for r in similarity.QUERIES["similarity_topk_bruteforce"](spark, sf_dir).collect()
        if r.rnk <= 5
    }
    assert brute
    recalls = {}
    for nprobe in (2, 8, 16):  # 16 = _IVF_K: exhaustive
        ivf = {
            (r.query_id, r.cand_id)
            for r in similarity.similarity_ann_ivf_trained(
                spark, sf_dir, nprobe=nprobe
            ).collect()
        }
        recalls[nprobe] = len(ivf & brute) / len(brute)
    assert recalls[8] >= 0.9, f"recall@5 at nprobe=8: {recalls}"
    assert recalls[16] == 1.0, f"nprobe=K must be exhaustive: {recalls}"
    assert recalls[2] <= recalls[8] <= recalls[16], f"curve not monotone: {recalls}"
    assert recalls[2] >= 0.5, f"nprobe=2 floor: {recalls}"


def test_bloom_incremental_routes_only_sliver_to_exact_join(spark, sf_dir):
    """Bloom prefilter must have no false negatives (novel set == exact
    anti-join) and the en-route invariant: every true duplicate is
    bloom-positive, so novel count == incoming − exact dups."""
    from duck_server_spark.operators.dedup import (
        _BLOOM_INCOMING,
        dedup_bloom_incremental,
    )

    novel = {r.doc_id for r in dedup_bloom_incremental(spark, sf_dir).collect()}
    counts = spark.sql(
        f"""SELECT count(*) AS n_inc,
                   count_if(text IN (SELECT text FROM documents)) AS n_dup
            FROM ({_BLOOM_INCOMING})"""
    ).first()
    assert len(novel) == counts.n_inc - counts.n_dup
    # definite-negative path really fired: the flags view the operator
    # leaves behind shows some rows skipped the exact join entirely
    from duck_server_spark.operators.dedup import _BLOOM_LAST_VIEWS

    flags = spark.table(_BLOOM_LAST_VIEWS[0][1]).groupBy("might").count().collect()
    assert {r.might for r in flags} == {True, False}


def test_dsir_selection_enriches_target_distribution(spark, sf_dir):
    """Importance resampling must shift the kept set toward the target
    (English) distribution relative to the raw corpus base rate."""
    from duck_server_spark.operators.llm_text import sample_dsir_importance

    kept = sample_dsir_importance(spark, sf_dir).collect()
    en_share = sum(1 for r in kept if r.lang == "en") / len(kept)
    base = spark.sql(
        "SELECT avg(CASE WHEN lang = 'en' THEN 1.0 ELSE 0 END) AS p FROM documents"
    ).first().p
    assert en_share > float(base) + 0.05
    # scores are exact rationals of the two integer masses
    for r in kept:
        assert abs(r.importance - r.target_mass / r.raw_mass) < 1e-15


def test_semdedup_precision_vs_exact_pairs(spark, sf_dir):
    """Every (drop, keep) pair SemDeDup emits must be a true near-dup
    pair in the exact label-blocked inventory (dedup_embedding_cosine
    runs the same injected corpus at the same 0.85 threshold with label
    blocking, which is strictly wider than SemDeDup's cell x sign-bucket
    blocking for this fixture's intra-label injected dups) — precision
    1.0. Recall < 1 is the two-level-blocking tradeoff; the floor
    guards against a broken bucketer."""
    from duck_server_spark.operators import dedup

    sem = {
        (r.kept_by, r.vec_id)
        for r in similarity.QUERIES["dedup_semantic_clusters"](spark, sf_dir).collect()
    }
    exact = {
        (r.id1, r.id2)
        for r in dedup.QUERIES["dedup_embedding_cosine"](spark, sf_dir).collect()
    }
    assert len(sem) > 0, "SemDeDup found nothing on the injected corpus"
    assert sem <= exact, f"false positives: {sem - exact}"
    assert len(sem) / len(exact) >= 0.25, f"recall collapsed: {len(sem)}/{len(exact)}"


def test_pq_rerank_recall(spark, sf_dir):
    """PQ-ADC shortlist + exact re-rank (round 5): recall@10 vs the
    exact brute-force top-10 must clear 0.6 at shortlist=100 (measured
    0.82 on the near-random fixture — real embedding corpora quantize
    far better), re-ranking must strictly beat code-only ranking (the
    refine step is what buys the recall: measured 0.82 vs 0.16), and a
    wider shortlist can only help."""
    brute = {}
    for r in similarity.QUERIES["similarity_topk_bruteforce"](spark, sf_dir).collect():
        if r.rnk <= 10:
            brute.setdefault(r.query_id, set()).add(r.cand_id)
    assert brute

    def recall(rows):
        got = {}
        for r in rows:
            got.setdefault(r.query_id, set()).add(r.cand_id)
        vals = [
            len(brute[q] & got.get(q, set())) / len(brute[q]) for q in brute
        ]
        return sum(vals) / len(vals)

    rerank100 = recall(similarity.similarity_ann_pq(spark, sf_dir, shortlist=100).collect())
    rerank25 = recall(similarity.similarity_ann_pq(spark, sf_dir, shortlist=25).collect())
    # code-only: shortlist == topk means the ADC order IS the output
    code_only = recall(similarity.similarity_ann_pq(spark, sf_dir, shortlist=10).collect())
    assert rerank100 >= 0.6, f"shortlist=100 recall: {rerank100}"
    assert rerank100 >= rerank25 - 1e-9, f"curve not monotone: {rerank25} > {rerank100}"
    assert rerank100 > code_only, f"re-rank must beat code-only: {rerank100} vs {code_only}"


def test_matryoshka_full_dim_equals_bruteforce(spark, sf_dir):
    """MRL prefix retrieval (round 5): the dim=64 slice IS the full
    vector, so its ranking must equal the exact brute-force top-5
    row-for-row; prefix dims are strictly cheaper scans whose recall
    floors on this NEAR-RANDOM fixture (~0.08 at dim 8/16 — real MRL
    embeddings concentrate signal in the prefix by training)."""
    mrl = similarity.QUERIES["similarity_matryoshka_topk"](spark, sf_dir).collect()
    full = {
        (r.query_id, r.rnk): r.cand_id
        for r in similarity.QUERIES["similarity_topk_bruteforce"](spark, sf_dir).collect()
        if r.rnk <= 5
    }
    d64 = {(r.query_id, r.rnk): r.cand_id for r in mrl if r.dim == 64}
    assert d64 == full
    # every dim emits exactly 5 per query
    from collections import Counter
    c = Counter((r.dim, r.query_id) for r in mrl)
    assert set(c.values()) == {5}


def test_hll_mergeable_distinct_accuracy(spark, sf_dir):
    """Sketch mergeability: per-slice HLL estimates and the UNION-of-
    sketches global estimate must each land within 5% (±2 abs) of the
    exact distinct counts (lgK=12 standard error ~1.6%). Round 6: the
    query itself now carries the bound as `within_bound` (so the driver
    oracle gate checks it too); this test asserts the RAW estimates
    directly from the sketch pipeline — a second, independent witness."""
    from pyspark.sql import functions as F

    from duck_server_spark.engine.session import load_table, register_views
    from duck_server_spark.operators import aggregates as agg

    gate = agg.QUERIES["agg_hll_mergeable_distinct"](spark, sf_dir).collect()
    assert all(r.within_bound for r in gate), gate
    # raw estimates straight from the sketch rollup
    register_views(spark, sf_dir)
    sketches = spark.sql(
        "SELECT event_type, hll_sketch_agg(user_id) AS sk FROM events GROUP BY event_type"
    )
    rows = {
        r.event_type: r.est
        for r in sketches.selectExpr("event_type", "hll_sketch_estimate(sk) AS est").collect()
    }
    rows["__all__"] = sketches.selectExpr(
        "hll_sketch_estimate(hll_union_agg(sk)) AS est"
    ).collect()[0].est
    ev = load_table(spark, sf_dir, "events")
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type").agg(
            F.countDistinct("user_id").alias("n")).collect()
    }
    exact["__all__"] = ev.select("user_id").distinct().count()
    assert set(rows) == set(exact)
    for k, est in rows.items():
        assert abs(est - exact[k]) <= max(0.05 * exact[k], 2.0), (k, est, exact[k])


def test_theta_overlap_accuracy(spark, sf_dir):
    """Theta-sketch pairwise audience overlap within 10% (or ±3 users)
    of the exact intersections for every event-type pair — asserted on
    the gate query's own `within_bound` column (round 6) AND recomputed
    from raw collect_set intersections."""
    from itertools import combinations

    from pyspark.sql import functions as F

    from duck_server_spark.engine.session import load_table
    from duck_server_spark.operators import aggregates as agg

    gate = agg.QUERIES["agg_theta_audience_overlap"](spark, sf_dir).collect()
    assert all(r.within_bound for r in gate), gate
    exact_out = {(r.type_a, r.type_b): r.exact_overlap for r in gate}
    ev = load_table(spark, sf_dir, "events")
    users = {
        r.event_type: set(r.us)
        for r in ev.groupBy("event_type").agg(
            F.collect_set("user_id").alias("us")).collect()
    }
    expected_pairs = {tuple(sorted(p)) for p in combinations(users, 2)}
    assert set(exact_out) == expected_pairs
    for (a, b), got in exact_out.items():
        assert got == len(users[a] & users[b]), (a, b, got)


def test_priority_window_fits_driver():
    """The driver's CORRECTNESS artifact records EXACTLY the first 50
    registry entries — round 10's 57-name _PRIORITY list silently
    dropped its 7-row tail (incl. the never-witnessed *_est rows), so
    the window size is now pinned (VERDICT r10 item 1): every _PRIORITY
    name must be unique, resolvable, and inside the 50-row window."""
    from duck_server_spark.operators import _PRIORITY, all_queries

    assert len(_PRIORITY) <= 50, (
        f"_PRIORITY has {len(_PRIORITY)} names; the driver records only "
        "the first 50 registry rows — trim the tail or rotate"
    )
    assert len(set(_PRIORITY)) == len(_PRIORITY), "duplicate _PRIORITY name"
    registry = all_queries()
    unknown = [n for n in _PRIORITY if n not in registry]
    assert not unknown, f"_PRIORITY names not in the registry: {unknown}"
    # the window IS the registry head: priority order must survive the
    # dict merge in all_queries()
    assert list(registry)[: len(_PRIORITY)] == _PRIORITY
