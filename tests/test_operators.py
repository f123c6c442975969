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


def test_ivf_recall_vs_bruteforce(spark, sf_dir):
    """IVF ANN must find a substantial share of the true top-5 (recall is
    tunable via K/nprobe; the floor guards against a broken bucketer)."""
    ivf = {
        (r.query_id, r.cand_id)
        for r in similarity.QUERIES["similarity_ann_ivf"](spark, sf_dir).collect()
    }
    brute = {
        (r.query_id, r.cand_id)
        for r in similarity.QUERIES["similarity_topk_bruteforce"](spark, sf_dir).collect()
        if r.rnk <= 5
    }
    assert len(ivf) > 0
    assert len(ivf & brute) / len(brute) >= 0.5
