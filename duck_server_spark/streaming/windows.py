"""Structured Streaming extensions over the events table.

The reference is strictly batch request/response (SURVEY.md §1.1: its
only stream-ish behaviors are chunked HTTP relay and COPY/Appender
ingest), so nothing here is required for parity — these are the
north-star streaming operators (BASELINE.json) expressed the idiomatic
Spark way: readStream → event-time transformations with watermarks →
writeStream.

Each builder takes a *streaming* DataFrame of the events schema
(event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING,
value DOUBLE, props STRING) and returns the transformed streaming frame;
the batch twins in operators/events_time.py compute the same answers on
bounded data (that equivalence is what tests/test_streaming.py checks
via availableNow-triggered runs against the parquet fixture).

Scale notes:
- Watermarks bound state: a 10-minute watermark on a 5-minute window
  keeps at most ~3 windows of state per (window, event_type) group —
  state size is O(active keys), independent of stream length.
- Windowed aggregation shuffles once on the (window, key) pair, same as
  the batch groupBy; AQE does not apply to streaming, so
  spark.sql.shuffle.partitions is the state-store partition count — set
  it once before the first run (state re-partitioning needs a new
  checkpoint).
- The sessionization operator uses session_window (gap-based, built-in
  since Spark 3.2) — the streaming twin of the batch lag+cumsum idiom.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, "
    "value DOUBLE, props STRING"
)


def read_events_stream(spark: SparkSession, sf_dir: str, max_files: int = 1) -> DataFrame:
    """File-source stream over the fixture parquet (one file per
    micro-batch; in production this is Kafka/object-store paths)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(f"{sf_dir}")
    )


def tumbling_counts(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """5-minute tumbling windows per event_type. Rows later than the
    watermark are dropped and state is pruned; pass a watermark wider
    than the replay span for exact bounded-replay equivalence."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").alias("bucket_start"), "event_type", "n", "sum_value")
    )


def sliding_rates(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """10-minute windows sliding every 5 minutes — each event lands in 2
    windows; watermark still bounds total state."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("win_start"), F.col("w.end").alias("win_end"), "event_type", "n")
    )


def session_windows(events: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Gap-based session windows (30-minute inactivity gap) per user —
    the streaming twin of operators/events_time.sessionize."""
    # NTZ-tolerant (unix_micros below rejects TIMESTAMP_NTZ inputs).
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .select(
            "user_id",
            "n_events",
            "session_start",
            "session_end",
            ((F.unix_micros(F.col("session_end")) - F.unix_micros(F.col("session_start"))) / F.lit(1_000_000)).alias("duration_s"),
        )
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user
    running event count + value sum carried across micro-batches.

    This is the pattern for operators Spark's built-ins can't express
    (reference-free custom state machines). State is one small tuple per
    user; timeouts would evict idle users in production. The value sum
    is carried as integer CENTS (floor(value·100) per row): float state
    would accumulate batch-order-dependent rounding, integer state is
    exact forever — which also gives the operator an exact SQL oracle
    (operators/streaming_ops.py)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdf_iter, state: GroupState):
        import numpy as np
        import pandas as pd

        n, cents = state.get if state.exists else (0, 0)
        for pdf in pdf_iter:
            n += len(pdf)
            cents += int(np.floor(pdf["value"].to_numpy() * 100).sum())
        state.update((n, cents))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [cents / 100.0]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id BIGINT, n_events BIGINT, total_value DOUBLE",
        stateStructType="n BIGINT, cents BIGINT",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_to_memory_sink(
    spark: SparkSession, streaming_df: DataFrame, name: str, output_mode: str = "append"
):
    """Drive a streaming frame to completion with availableNow (bounded
    replay of all currently-available input) into an in-memory table —
    the test/verification harness."""
    query = (
        streaming_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table(name)


def stream_dedup(events: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Streaming deduplication: dropDuplicates on event_id bounded by the
    event-time watermark — exactly-once-per-key emission with O(keys in
    the watermark window) state, the ingest-dedup front of a streaming
    pipeline."""
    return events.withWatermark("ts", watermark).dropDuplicates(["event_id"])


def click_purchase_join(
    clicks: DataFrame, purchases: DataFrame, watermark: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream interval join: purchases attributed to a click by
    the same user within the preceding hour. Both sides carry
    watermarks and the join condition bounds event time on both ends,
    so Spark can prune join state (unbounded stream-stream joins never
    release state — the interval bound is what makes this runnable
    forever). One shuffle on user_id; state is O(events per user-hour).
    Batch twin: events_time.attributed_purchases."""
    c = clicks.withWatermark("ts", watermark).select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    p = purchases.withWatermark("ts", watermark).select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("amount"),
    )
    # how="leftOuter": unmatched clicks emit once the watermark passes
    # click_ts + 1 hour (state eviction IS the emission trigger) — the
    # replay harness appends a flush sentinel so the bounded run drains
    return c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR")),
        how,
    ).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        "click_ts",
        "purchase_ts",
        "amount",
    )


def outlier_flagging(events: DataFrame, moments: DataFrame) -> DataFrame:
    """Stream-STATIC join: score each in-flight event against a static
    per-event_type moments table (mean/std trained by the batch
    events_outliers pass) and keep |z| > 2. The static side is a plain
    DataFrame — Spark broadcasts it into every micro-batch with no
    streaming state at all, the standard model-scoring / enrichment
    topology (dimension lookup at stream speed). Batch twin:
    events_time.events_outliers (identical moment arithmetic).
    """
    return (
        events.join(moments, "event_type")
        .withColumn(
            "zscore",
            (F.expr("CAST(CAST(floor(value * 1000000) AS BIGINT) AS DOUBLE)") - F.col("s") / F.col("n"))
            / F.sqrt((F.col("ss") - F.col("s") * F.col("s") / F.col("n")) / (F.col("n") - F.lit(1.0))),
        )
        .where(F.abs(F.col("zscore")) > 2.0)
        .select("event_id", "event_type", "value", "zscore")
    )


def moments_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The static moments side for outlier_flagging — same fixed-point
    sums as the batch twin, computed once and reused across every
    micro-batch."""
    from duck_server_spark.engine.session import register_views

    register_views(spark, sf_dir)
    return spark.sql("""
SELECT event_type,
       CAST(count(*) AS DOUBLE) AS n,
       CAST(sum(CAST(CAST(floor(value * 1000000) AS BIGINT) AS DECIMAL(18,0))) AS DOUBLE) AS s,
       CAST(sum(CAST(CAST(CAST(floor(value * 1000000) AS BIGINT) AS DECIMAL(18,0))
                     * CAST(CAST(floor(value * 1000000) AS BIGINT) AS DECIMAL(18,0)) AS DECIMAL(38,0))) AS DOUBLE) AS ss
FROM events GROUP BY event_type
""")


DOCUMENTS_SCHEMA = "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"


def read_documents_stream(spark: SparkSession, docs_path: str, max_files: int = 1) -> DataFrame:
    """File-source stream over the documents fixture parquet."""
    return (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(docs_path)
    )


def streaming_sequence_packing(
    docs: DataFrame, capacity: int = 96, shards: int = 4
) -> DataFrame:
    """Streaming twin of operators/pipeline.py sequence_packing: next-fit
    context-window packing where each (source, shard) carries its open
    bin (id + fill) across micro-batches via applyInPandasWithState —
    a continuously-arriving corpus packs into training windows without
    ever re-reading finished bins.

    Semantics note: streaming packing is ARRIVAL-order next-fit (docs
    are packed as they arrive, sorted within each micro-batch); on an
    availableNow replay of a single input file the whole corpus is one
    batch, so the output coincides exactly with the batch operator —
    that equivalence is the test. Token counts are computed JVM-side in
    the projection; the Python state fn sees four narrow columns and
    keeps 3 scalars per group."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    base = docs.selectExpr(
        "doc_id",
        "source",
        f"doc_id % {shards} AS shard",
        f"CAST(least(size(split(trim(text), '\\\\s+')), {capacity}) AS BIGINT) AS n_tokens",
    )

    def update(key, pdf_iter, state: GroupState):
        import pandas as pd

        bin_id, fill, started = state.get if state.exists else (0, 0, False)
        ids, bins, toks = [], [], []
        for pdf in pdf_iter:
            pdf = pdf.sort_values("doc_id")
            for did, t in zip(pdf["doc_id"], pdf["n_tokens"]):
                t = int(t)
                if not started:
                    started = True
                    fill = t
                elif fill + t > capacity:
                    bin_id += 1
                    fill = t
                else:
                    fill += t
                ids.append(int(did))
                bins.append(bin_id)
                toks.append(t)
        state.update((bin_id, fill, started))
        yield pd.DataFrame(
            {
                "doc_id": ids,
                "source": [key[0]] * len(ids),
                "shard": [key[1]] * len(ids),
                "bin_id": bins,
                "n_tokens": toks,
            }
        )

    return base.groupBy("source", "shard").applyInPandasWithState(
        update,
        outputStructType="doc_id BIGINT, source STRING, shard BIGINT, bin_id BIGINT, n_tokens BIGINT",
        stateStructType="bin_id BIGINT, fill BIGINT, started BOOLEAN",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
