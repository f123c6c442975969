"""Oracle-gated STREAMING operators: each entry stages the events fixture
as a file-source stream, replays it bounded (availableNow trigger) through
the Structured Streaming builder in ``streaming/windows.py`` into a memory
sink, and returns the result as a batch DataFrame — so the driver's
DuckDB oracle comparison applies to the STREAMING execution path, not
just its batch twin.

Why this matters: streaming operators are usually the weakest-verified
part of an engine (rows-only smoke checks). Here the watermark is set
wider than the fixture's replay span, so bounded-replay semantics are
exactly the batch semantics and the full row-count + schema + value-hash
gate applies to the stateful streaming operators themselves (windowed
aggregation state, session-window state merging).

Scale notes: availableNow is also the production backfill mode — the
same watermarks/state stores process an object-store backlog in bounded
batches. The memory sink exists only for the verification harness; a
production job writes to parquet/Kafka.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duck_server_spark.engine.session import load_table
from duck_server_spark.streaming import windows as sw

# One staged stream-source directory per (session, sf_dir): the file
# source needs a directory, and staging through load_table normalizes
# the ts column to TIMESTAMP regardless of fixture parquet shape.
_STAGED: dict[tuple[int, str], str] = {}
_SINK_SEQ = [0]


def _events_stream_dir(spark: SparkSession, sf_dir: str) -> str:
    key = (id(spark), sf_dir)
    hit = _STAGED.get(key)
    if hit is not None and os.path.isdir(hit):
        return hit
    path = tempfile.mkdtemp(prefix="events_stream_")
    load_table(spark, sf_dir, "events").repartition(4).write.mode("overwrite").parquet(path)
    _STAGED[key] = path
    return path


def _replay(spark: SparkSession, sf_dir: str, builder, output_mode: str) -> DataFrame:
    stream = sw.read_events_stream(spark, _events_stream_dir(spark, sf_dir))
    _SINK_SEQ[0] += 1
    name = f"__stream_oracle_sink_{_SINK_SEQ[0]}"
    return sw.run_to_memory_sink(spark, builder(stream), name, output_mode=output_mode)


def streaming_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-minute tumbling windowed aggregation executed by Structured
    Streaming (windowed state store), replayed bounded; oracle = the
    batch time_bucket SQL. Watermark 60 days > fixture span, so no rows
    drop and streaming == batch semantics exactly."""
    out = _replay(
        spark, sf_dir, lambda ev: sw.tumbling_counts(ev, watermark="60 days"), "complete"
    )
    return out.select("bucket_start", "event_type", "n", "sum_value")


STREAMING_TUMBLING_ORACLE = """
SELECT time_bucket(INTERVAL '5 minutes', ts) AS bucket_start, event_type,
       count(*) AS n,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY time_bucket(INTERVAL '5 minutes', ts), event_type
"""


def streaming_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based session windows via the built-in session_window state
    (streaming session merging), replayed bounded; oracle = the batch
    lag→flag→prefix-sum sessionization grouped to the same shape."""
    out = _replay(
        spark, sf_dir, lambda ev: sw.session_windows(ev, watermark="60 days"), "complete"
    )
    return out.select("user_id", "n_events", "session_start", "session_end", "duration_s")


STREAMING_SESSIONS_ORACLE = """
WITH g AS (
  SELECT user_id, event_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_ts
  FROM events
), f AS (
  SELECT user_id, event_id, ts,
         -- >= (not >): Spark session_window sessions are half-open
         -- [start, last+gap), so an event at EXACTLY last+gap starts a
         -- NEW session; the batch sessionize operator keeps its own
         -- (> , closed-boundary) convention and documents the difference
         CASE WHEN prev_ts IS NULL OR epoch_us(ts) - epoch_us(prev_ts) >= 1800 * 1000000 THEN 1 ELSE 0 END AS new_session
  FROM g
), s AS (
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
  FROM f
)
SELECT user_id,
       count(*) AS n_events,
       min(ts) AS session_start,
       max(ts) AS session_end,
       (epoch_us(max(ts)) - epoch_us(min(ts))) / 1000000 AS duration_s
FROM s GROUP BY user_id, session_seq
"""


def streaming_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-STREAM interval join (purchase attributed to a same-user
    click within the following hour) through the real streaming join
    state machine, replayed bounded; oracle = the equivalent batch
    interval join. The watermark + two-sided time bound is what lets
    Spark prune join state — the production-runnable shape."""
    from pyspark.sql import functions as F

    def build(ev):
        clicks = ev.filter(F.col("event_type") == "click")
        purchases = ev.filter(F.col("event_type") == "purchase")
        return sw.click_purchase_join(clicks, purchases, watermark="60 days")

    out = _replay(spark, sf_dir, build, "append")
    return out.select(
        "user_id", "click_id", "purchase_id", "click_ts", "purchase_ts", "amount"
    )


STREAMING_CLICK_ATTR_ORACLE = """
WITH c AS (
  SELECT user_id, ts AS click_ts, event_id AS click_id
  FROM events WHERE event_type = 'click'
),
p AS (
  SELECT user_id, ts AS purchase_ts, event_id AS purchase_id, value AS amount
  FROM events WHERE event_type = 'purchase'
)
SELECT c.user_id, click_id, purchase_id, click_ts, purchase_ts, amount
FROM c JOIN p ON c.user_id = p.user_id
 AND purchase_ts >= click_ts
 AND purchase_ts <= click_ts + INTERVAL 1 HOUR
"""


def streaming_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState) under the
    oracle gate: per-user running totals carried across micro-batches in
    integer-cents state (exact at any batch order). Update mode emits
    one row per user per touching batch; the final state per user is the
    row with the highest n_events (strictly increasing per emission)."""
    from pyspark.sql import functions as F

    out = _replay(spark, sf_dir, sw.running_user_totals, "update")
    return out.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.expr("max_by(total_value, n_events)").alias("total_value"),
    )


STREAMING_RUNNING_TOTALS_ORACLE = """
SELECT user_id, count(*) AS n_events,
       CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_value
FROM events
GROUP BY user_id
"""


_DUP_STAGED: dict[tuple[int, str], str] = {}


def _events_dup_stream_dir(spark: SparkSession, sf_dir: str) -> str:
    """Events with exact-duplicate rows injected (every 10th event_id is
    replayed verbatim in a second file) — the at-least-once-delivery
    input shape streaming dedup exists for. Duplicates are byte-identical
    full rows, so whichever copy the state store keeps, output is
    deterministic and the batch DISTINCT oracle applies exactly."""
    key = (id(spark), sf_dir)
    hit = _DUP_STAGED.get(key)
    if hit is not None and os.path.isdir(hit):
        return hit
    path = tempfile.mkdtemp(prefix="events_dup_stream_")
    ev = load_table(spark, sf_dir, "events")
    ev.repartition(4).write.mode("overwrite").parquet(path)
    ev.where("event_id % 10 = 0").repartition(1).write.mode("append").parquet(path)
    _DUP_STAGED[key] = path
    return path


def streaming_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-bounded streaming deduplication (dropDuplicates on
    event_id through the streaming state store): exactly-once emission
    per key with O(keys within the watermark) state — the ingest-dedup
    front of every at-least-once pipeline. Replayed bounded over the
    duplicate-injected stage; oracle = batch row set of the unique
    events (duplicates are exact row copies)."""
    stream = sw.read_events_stream(spark, _events_dup_stream_dir(spark, sf_dir))
    _SINK_SEQ[0] += 1
    name = f"__stream_oracle_sink_dedup_{_SINK_SEQ[0]}"
    out = sw.run_to_memory_sink(
        spark, sw.stream_dedup(stream, watermark="60 days"), name, output_mode="append"
    )
    return out.selectExpr(
        "event_id", "ts", "user_id", "event_type",
        "CAST(floor(value * 100) AS BIGINT) AS value_cents",
    )


STREAMING_DEDUP_ORACLE = """
SELECT event_id, ts, user_id, event_type,
       CAST(floor(value * 100) AS BIGINT) AS value_cents
FROM events
"""


_ORD_STAGED: dict[tuple[int, str], str] = {}


def _events_ordered_stream_dir(spark: SparkSession, sf_dir: str) -> str:
    """Events staged as four TIME-ORDERED range files plus one flush
    sentinel file (user_id -1, ts = max + 10 days). Ordered replay means
    each micro-batch's minimum event time exceeds the previous batch's
    watermark — no rows are late, so outer-join semantics under bounded
    replay equal the batch twin exactly; the sentinel advances the final
    watermark past every click's join window so eviction (= unmatched
    emission) drains completely. This is the production backfill recipe
    for watermarked outer joins: replay logs in time order, close with a
    barrier event."""
    import time as _time

    from pyspark.sql import Window

    key = (id(spark), sf_dir)
    hit = _ORD_STAGED.get(key)
    if hit is not None and os.path.isdir(hit):
        return hit
    path = tempfile.mkdtemp(prefix="events_ordered_stream_")
    ev = load_table(spark, sf_dir, "events")
    qt = ev.withColumn("qt", F.ntile(4).over(Window.orderBy("ts", "event_id")))
    for i in range(1, 5):
        qt.where(F.col("qt") == i).drop("qt").coalesce(1).write.mode("append").parquet(path)
        _time.sleep(0.05)  # distinct mtimes: the file source replays in mtime order
    max_ts = ev.agg(F.max("ts")).first()[0]
    # TWO sentinel files → two final micro-batches: the watermark a batch
    # computes only applies to eviction in the NEXT batch, so the first
    # sentinel advances it and the second flushes the remaining state
    import datetime as _dt

    # each sentinel file carries BOTH event types: the join watermarks
    # are per-side (clicks / purchases filters), the engine's global
    # watermark is their MIN, and a click-only sentinel leaves the
    # purchase side (and so the global mark) pinned at the data's edge
    for days in (10, 20):
        st = max_ts + _dt.timedelta(days=days)
        sentinel = spark.createDataFrame(
            [(-1, st, -1, "click", 0.0, None), (-2, st, -2, "purchase", 0.0, None)],
            schema=ev.schema,
        )
        sentinel.coalesce(1).write.mode("append").parquet(path)
        _time.sleep(0.05)
    _ORD_STAGED[key] = path
    return path


def streaming_click_attribution_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER interval join: every click emits, with
    its attributed purchase or NULLs — through the real outer-join state
    machine where unmatched-row emission IS state eviction at watermark
    passage (a 30-minute delay, not the replay-wide one: outer results
    only materialize when the watermark moves). Time-ordered staged
    replay + flush sentinel make the bounded run equal the batch LEFT
    JOIN row-for-row; the sentinel click filters out by user_id."""
    stream = sw.read_events_stream(spark, _events_ordered_stream_dir(spark, sf_dir))
    clicks = stream.filter(F.col("event_type") == "click")
    purchases = stream.filter(F.col("event_type") == "purchase")
    joined = sw.click_purchase_join(clicks, purchases, watermark="30 minutes", how="leftOuter")
    _SINK_SEQ[0] += 1
    name = f"__stream_oracle_sink_attr_outer_{_SINK_SEQ[0]}"
    out = sw.run_to_memory_sink(spark, joined, name, output_mode="append")
    return out.where("user_id >= 0").select(
        "user_id", "click_id", "purchase_id", "click_ts", "purchase_ts", "amount"
    )


STREAMING_CLICK_ATTR_OUTER_ORACLE = """
WITH c AS (
  SELECT user_id, ts AS click_ts, event_id AS click_id
  FROM events WHERE event_type = 'click'
),
p AS (
  SELECT user_id, ts AS purchase_ts, event_id AS purchase_id, value AS amount
  FROM events WHERE event_type = 'purchase'
)
SELECT c.user_id, click_id, purchase_id, click_ts, purchase_ts, amount
FROM c LEFT JOIN p ON c.user_id = p.user_id
 AND purchase_ts >= click_ts
 AND purchase_ts <= click_ts + INTERVAL 1 HOUR
"""


# ---------------------------------------------------------------------------
# Streaming quality gate (round 5)
# ---------------------------------------------------------------------------

_QDOCS_STAGED: dict[tuple[int, str], str] = {}


def _docs_multi_stream_dir(spark: SparkSession, sf_dir: str) -> str:
    """Documents staged as 4 mtime-ordered files → 4 real micro-batches
    under availableNow replay (the gate is stateless, so batching must
    not matter — that invariance IS what the oracle twin checks)."""
    import time as _time

    key = (id(spark), sf_dir)
    hit = _QDOCS_STAGED.get(key)
    if hit is not None and os.path.isdir(hit):
        return hit
    path = tempfile.mkdtemp(prefix="docs_gate_stream_")
    docs = load_table(spark, sf_dir, "documents")
    for i in range(4):
        docs.where(f"doc_id % 4 = {i}").coalesce(1).write.mode("append").parquet(path)
        _time.sleep(0.05)
    _QDOCS_STAGED[key] = path
    return path


def streaming_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-side corpus cleaning: the cascade's row-local quality
    predicates (length floor, language allowlist, stopword-ratio floor —
    pipeline_filter_cascade's stages 1-3) applied to documents AS THEY
    ARRIVE — the online ingest gate in front of a training-data lake.
    Stateless scan-stage filters: no state store, no watermark, so
    output is exactly the batch filter no matter how the input batches
    (replayed here over a 4-file staged stream); the only cross-row
    stage (exact dedup) correctly stays OUT of the gate — that is the
    watermarked streaming_dedup_watermark operator downstream. At scale
    this runs at source speed with zero shuffle per micro-batch."""
    stream = sw.read_documents_stream(spark, _docs_multi_stream_dir(spark, sf_dir))
    gated = (
        stream.selectExpr(
            "doc_id", "source", "lang",
            r"split(trim(text), '\\s+') AS t", "length(text) AS n_chars_txt",
        )
        .where(
            "n_chars_txt >= 150 AND lang IN ('en', 'de', 'fr', 'es') "
            "AND 100 * size(filter(t, x -> x IN ('a', 'the'))) >= 3 * size(t)"
        )
        .selectExpr("doc_id", "source", "lang", "CAST(size(t) AS BIGINT) AS n_tokens")
    )
    _SINK_SEQ[0] += 1
    name = f"__stream_oracle_sink_gate_{_SINK_SEQ[0]}"
    return sw.run_to_memory_sink(spark, gated, name, output_mode="append")


STREAMING_QUALITY_GATE_ORACLE = r"""
WITH toks AS (
  SELECT doc_id, source, lang,
         regexp_split_to_array(trim(text), '\s+') AS t, length(text) AS n_chars_txt
  FROM documents
)
SELECT doc_id, source, lang, CAST(len(t) AS BIGINT) AS n_tokens
FROM toks
WHERE n_chars_txt >= 150 AND lang IN ('en', 'de', 'fr', 'es')
  AND 100 * len(list_filter(t, x -> x IN ('a', 'the'))) >= 3 * len(t)
"""

# ---------------------------------------------------------------------------
# Streaming windowed HLL distinct (round 5)
# ---------------------------------------------------------------------------


def streaming_hll_window_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per 5-minute window, maintained as an HLL SKETCH in
    the streaming state store (DataSketches hll_sketch_agg is a typed
    streaming aggregate): the dashboard-cardinality pattern where exact
    per-window distinct state would grow with the id universe while the
    sketch stays O(lgK) per window — and closed windows' sketches remain
    mergeable into coarser rollups downstream (agg_hll_mergeable_distinct
    is the batch side of the same design). Bounded replay; rows-only in
    the driver gate (sketch estimates are engine-specific), accuracy vs
    exact per-window distincts asserted in tests/test_streaming.py."""
    from pyspark.sql import functions as F

    def build(ev):
        return (
            ev.withWatermark("ts", "60 days")
            .groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
            .agg(F.expr("CAST(hll_sketch_estimate(hll_sketch_agg(user_id)) AS BIGINT)").alias("est_users"))
            .select(F.col("w.start").alias("bucket_start"), "event_type", "est_users")
        )

    return _replay(spark, sf_dir, build, "complete")


QUERIES = {
    "streaming_tumbling_counts": streaming_tumbling_counts,
    "streaming_session_windows": streaming_session_windows,
    "streaming_click_attribution": streaming_click_attribution,
    "streaming_running_totals": streaming_running_totals,
    "streaming_dedup_watermark": streaming_dedup_watermark,
    "streaming_click_attribution_outer": streaming_click_attribution_outer,
    "streaming_quality_gate": streaming_quality_gate,
    "streaming_hll_window_distinct": streaming_hll_window_distinct,
}

ORACLE = {
    "streaming_tumbling_counts": STREAMING_TUMBLING_ORACLE,
    "streaming_session_windows": STREAMING_SESSIONS_ORACLE,
    "streaming_click_attribution": STREAMING_CLICK_ATTR_ORACLE,
    "streaming_running_totals": STREAMING_RUNNING_TOTALS_ORACLE,
    "streaming_dedup_watermark": STREAMING_DEDUP_ORACLE,
    "streaming_click_attribution_outer": STREAMING_CLICK_ATTR_OUTER_ORACLE,
    "streaming_quality_gate": STREAMING_QUALITY_GATE_ORACLE,
}
