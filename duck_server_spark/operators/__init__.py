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
# below; next round, rotate in the then-stalest block (the r8-witnessed
# rows: agg matrix, joins, setops, tpch q7/q13/q15-q19/q21, subqueries,
# samples, distinct_on, lateral, qualify, union_by_name, values_inline,
# plus window_range_frame / window_ranking which missed this window) —
# everything outside the window is still fully self-gated per-round by
# tools/drive_contract.py.
_PRIORITY = [
    # 1-3: NEW round 11 — the probe-battery closure gates (date−date →
    # BIGINT days, duck-1.0 map-subscript [v] shape, bar(), nested
    # shims, ^-with-cast; FROM-unnest rendered-expression column name;
    # #n positional refs + LIMIT n% through the engine path).
    "dialect_probe_sql",
    "unnest_tvf_sql",
    "positional_ref_sql",
    # 4-6: never driver-witnessed in rounds 1-10 (VERDICT r10 item 1):
    # the two rows-only estimate plans (their correctness is carried by
    # gate twins + plan-containment audit; these witness the row-count
    # side) and the r10 text-similarity gate row.
    "similarity_ann_pq_est",
    "dedup_minhash_lsh_fast_est",
    "scalar_text_similarity",
    # 7-11: last witnessed r7 — contamination_check FIRST (clears the
    # r10 bench-bar flag with a fresh correctness witness).
    "contamination_check",
    "agg_theta_audience_overlap",
    "asof_join",
    "asof_join_sql",
    "dedup_embedding_cosine",
    # 12-16: the stalest tail — r1/r4/r6 witnesses.
    "sample_bernoulli",
    "dedup_minhash_vectorized",
    "scalar_array",
    "similarity_ann_ivf_trained",
    "streaming_hll_window_distinct",
    # 17-50: the remaining r7-witnessed rows (34 of 36 fit; the two
    # window stragglers window_range_frame / window_ranking rotate in
    # next round with the r8 block).
    "agg_hll_mergeable_distinct_prod",
    "agg_theta_audience_overlap_prod",
    "dedup_minhash_lsh",
    "dedup_ngram_containment",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "distinct_on_sql",
    "mixture_domain_upsampling",
    "pipeline_filter_cascade",
    "pivot_status",
    "pivot_stmt_sql",
    "scalar_binary",
    "scalar_bits",
    "scalar_cond_cast",
    "scalar_date",
    "scalar_json",
    "scalar_list_slice",
    "scalar_math",
    "scalar_series_unnest",
    "scalar_string",
    "similarity_ann_lsh",
    "similarity_topk_bruteforce",
    "text_bm25_retrieval",
    "text_char_jaccard",
    "text_fingerprint",
    "text_lang_id",
    "text_quality_score",
    "text_token_stats",
    "time_bucket_tumbling",
    "unpivot_prices",
    "unpivot_stmt_sql",
    "window_first_last_nth",
    "window_frames_rows",
    "window_lag_lead",
]


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    flat: dict[str, Callable] = {}
    for mod in _modules():
        for name, fn in mod.QUERIES.items():
            if name in flat:
                raise ValueError(f"duplicate query name: {name}")
            flat[name] = fn
    out = {name: flat[name] for name in _PRIORITY if name in flat}
    out.update(flat)
    return out


def all_oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _modules():
        for name, sql in getattr(mod, "ORACLE", {}).items():
            out[name] = sql.strip()
    return out
