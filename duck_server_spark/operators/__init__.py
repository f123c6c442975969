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
# below. Round 14 rotates exactly as the r13 queue ordered (VERDICT r13
# item 9): the three r9 deferrals lead (scalar_list_aliases,
# scalar_array_higher_order, scalar_struct_map — last witnessed r9),
# then 47 of the 50 r10-witnessed rows. The three r10 rows deferred to
# lead the r15 queue (raw_literal_sql, infix_ops_sql, quoted_idents_sql)
# are the most redundantly covered outside the driver: each maps onto
# whole probe families of the dialect battery (literal/operator/quoting
# probes) that run as a pytest gate every round. The r11 block follows
# them in the r15 queue. Everything outside the window is still fully
# self-gated per-round by tools/drive_contract.py.
_PRIORITY = [
    # 1-3: last witnessed r9 — the r13 deferrals, honored first.
    "scalar_list_aliases",
    "scalar_array_higher_order",
    "scalar_struct_map",
    # 4-50: the r10-witnessed block (47 of 50; deferral note above).
    "fn_shim_embedding_sql",
    "fn_shim_scalars_sql",
    "fn_shim_aggs_sql",
    "query_shapes_sql",
    "window_shapes_sql",
    "scalar_struct_range_list",
    "agg_collect_sorted",
    "agg_incremental_merge",
    "dedup_bloom_incremental",
    "dedup_canonical_docs",
    "dedup_line_level",
    "dedup_substring_spans",
    "embedding_centroids",
    "graph_pagerank",
    "inverted_index",
    "join_positional",
    "mixture_sampling_quotas",
    "multimodal_audio_features",
    "multimodal_phash_dedup",
    "multimodal_resize",
    "pipeline_dataset_card",
    "pipeline_file_sizing",
    "pipeline_global_shuffle",
    "pipeline_length_buckets",
    "pipeline_skew_report",
    "pipeline_token_drift",
    "sample_dsir_importance",
    "sessionize",
    "similarity_ann_ivf",
    "similarity_matryoshka_topk",
    "streaming_click_attribution",
    "streaming_click_attribution_outer",
    "streaming_dedup_watermark",
    "streaming_quality_gate",
    "streaming_running_totals",
    "streaming_session_windows",
    "streaming_tumbling_counts",
    "text_cooccurrence_lift",
    "text_tokenizer_fertility",
    "text_unigram_score",
    "text_winnowing_fingerprints",
    "zorder_layout",
    "agg_bool_any_every",
    "agg_count_star_global",
    "agg_hll_mergeable_distinct",
    "agg_median_quantile",
    "agg_stats_moments",
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
    # tracked_local_checkpoint at build time
    "dedup_minhash_vectorized",
    "dedup_bloom_incremental",
    "text_cooccurrence_lift",
    "text_bm25_retrieval",
    "pipeline_corpus_clean",
    # round 14 (VERDICT r13 item 1): builders that materialize through
    # OTHER means — raw localCheckpoint (eager=True runs the job at
    # build; eager=False pins partitions on first action), persist
    # loops, or build-time actions. Memoizing any of these would serve
    # stored partitions on a second same-session invocation.
    "agg_hll_mergeable_distinct",            # localCheckpoint(eager=False)
    "agg_hll_mergeable_distinct_prod",       # localCheckpoint(eager=True)
    "agg_theta_audience_overlap",            # localCheckpoint(eager=False)
    "agg_theta_audience_overlap_prod",       # localCheckpoint(eager=True)
    "dedup_connected_components",            # persist/checkpoint loop + counts
    "graph_triangles",                       # edge localCheckpoint(eager=True)
    "dedup_source_matrix",                   # pair localCheckpoint(eager=True)
    "graph_pagerank",                        # edge localCheckpoint(eager=True)
}

# Builders whose build-time materialization is ITSELF memoized per
# (session, fixture) by a disclosed domain cache, making the build
# idempotent: the plan memo adds no state a re-build would not reuse
# anyway. contamination_check's eval-gram index (llm_text.py
# _eval_gram_index) is the bar-adjudicated design — the bench gives it a
# cold-cache extra rep. Listed explicitly so the guard test's source
# scan stays exhaustive without denylisting them.
_IDEMPOTENT_MATERIALIZERS = {
    "contamination_check",
}

def _memoized(name: str, fn: Callable) -> Callable:
    # memo entries live in the per-session store (engine/session.py):
    # keyed on the LIVE session object, so a recycled id() can never be
    # served a dead session's plan and entries are GC'd with the session
    # (round 14, ADVICE r13)
    from duck_server_spark.engine.session import session_store

    def build(spark: SparkSession, sf_dir: str) -> DataFrame:
        store = session_store(spark)
        key = ("plan", name, sf_dir)
        df = store.get(key)
        if df is None:
            df = fn(spark, sf_dir)
            store[key] = df
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
