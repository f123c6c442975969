"""SparkSession factory + table registration.

Reference analogue: the embedded engine bootstrap in
``/root/reference/pg_server.go:78-104`` (open one DuckDB database, run the
compat-view init, share it across client connections). Here the shared
engine is a single SparkSession; per-connection state lives in the server
layer, as in the reference (`pg_conn.go:50-68`).

Scale notes (100 TB design intent):
- One SparkSession per process; Spark is safe for concurrent actions from
  many server connections (each query gets its own job group for cancel).
- AQE on: runtime shuffle-partition coalescing, skew-join splitting, and
  broadcast-join conversion replace hand-tuned plans at scale.
- Arrow enabled: result collection to the protocol edge is columnar.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def get_session(app_name: str = "duck_server_spark", cpus: int | None = None) -> SparkSession:
    """Build (or reuse) the shared SparkSession.

    local[N] for tests/bench; on a real cluster the master/memory settings
    come from spark-submit and everything else here still applies.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # events.parquet stores TIMESTAMP(NANOS) which Spark's reader rejects;
        # read as long and convert in load_table (values are micro-granular).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # duck's TIME type: Spark 4.1 ships it behind a flag — with it
        # on, TIME literals, CAST('..' AS TIME), and make_time() all
        # work natively (round 12)
        .config("spark.sql.timeType.enabled", "true")
        # fixture files are single ~2-10 MB parquets; the 128 MB default
        # gives 1-task scans. 4 MB splits the big tables across cores
        # (row-group granularity). On a real cluster with TB inputs the
        # default is right — this is the local[N] small-file knob.
        .config("spark.sql.files.maxPartitionBytes", str(4 * 1024 * 1024))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    from duck_server_spark.functions.text_similarity import (
        register_text_similarity,
    )

    register_text_similarity(spark)
    return spark


import weakref

# Per-session scratch store for the engine's plan-handle memos
# (load_table relations, register_views state, the operator plan memo,
# the contamination eval index). Round 14 (ADVICE r13): the old dicts
# keyed on id(spark) never evicted — a stopped session's id() can be
# reused by a NEW session, which would then be served DataFrames bound
# to the dead session, and the strong refs grew unboundedly. A
# WeakKeyDictionary keyed on the LIVE session object fixes both: entries
# die with the session, and id reuse is impossible while the key is
# alive.
_SESSION_STORES: "weakref.WeakKeyDictionary[SparkSession, dict]" = (
    weakref.WeakKeyDictionary()
)


def session_store(spark: SparkSession) -> dict:
    store = _SESSION_STORES.get(spark)
    if store is None:
        store = {}
        _SESSION_STORES[spark] = store
    return store


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Memoized per (session, dir, table): repeated builders reuse the
    analyzed relation instead of re-listing files and re-reading footers
    (~100-200 ms per call). The fixture dirs are immutable."""
    store = session_store(spark)
    key = ("table", sf_dir, name)
    hit = store.get(key)
    if hit is not None:
        return hit
    df = _load_table_uncached(spark, sf_dir, name)
    store[key] = df
    return df


def _load_table_uncached(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Self-sufficient against sessions we didn't build (the verification
    # driver constructs its own): UTC pins every session-TZ-sensitive
    # expression (timestamp literals in filters, date→timestamp casts) to
    # the oracle's naive-timestamp semantics. Runtime-settable SQLConf.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # nanosAsLong lets the TIMESTAMP(NANOS) file load (as BIGINT).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # The fixture's ts physical type has changed across driver
        # regenerations; accept all three shapes and normalize to TIMESTAMP
        # (session TZ is pinned to UTC above, so NTZ→TIMESTAMP is the
        # identity on the wall-clock values — same semantics as the DuckDB
        # oracle's naive timestamps):
        #   - TIMESTAMP(NANOS): nanosAsLong reads it as epoch-nanos BIGINT
        #     (values are micro-granular, so div 1000 is lossless)
        #   - TIMESTAMP(MICROS, isAdjustedToUTC=false): read as
        #     TIMESTAMP_NTZ, which F.unix_micros et al. reject — cast
        #   - TIMESTAMP(MICROS, isAdjustedToUTC=true): already TIMESTAMP
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType, TimestampNTZType

        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(ts_type, TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view (name == table name).

    Parquet-backed temp views keep predicate pushdown / column pruning —
    Catalyst sees straight through the view to the file scan.

    Memoized per (session, sf_dir) — round 13 (guide §1.2 per-task
    work): the 10 createOrReplaceTempView py4j round-trips cost ~96 ms
    warm, and every operator builder calls this, so a 25-query bench
    paid ~5 s of pure view re-registration. Re-registering is only
    needed when the SAME session switches fixture dirs (the comparison
    below); nothing in the engine ever drops or shadows fixture-named
    temp views (the executor's transient views are all __duck_*-named).
    """
    store = session_store(spark)
    if store.get("views_dir") == sf_dir:
        return
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    store["views_dir"] = sf_dir
    # DuckDB-named pandas-UDF scalars (damerau_levenshtein, jaro_*) —
    # registered here too so sessions we didn't build (the verification
    # driver constructs its own) can run the similarity gate rows;
    # id()-guarded no-op after the first call
    from duck_server_spark.functions.text_similarity import (
        register_text_similarity,
    )

    register_text_similarity(spark)
