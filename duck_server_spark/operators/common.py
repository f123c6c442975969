"""Shared helpers for operator modules.

The reference engine's surface is SQL-in → rows-out (every client query
reaches DuckDB as text through `c.conn.Prepare(query)`,
/root/reference/pg_conn.go:314). Our Spark-first equivalents are written
either as DataFrame builders or as Spark-SQL over registered temp views —
both produce the same Catalyst plan; we use whichever is the clearer
expression of the operator.
"""

from __future__ import annotations

import threading
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duck_server_spark.engine.session import register_views


def sql_op(sql: str) -> Callable[[SparkSession, str], DataFrame]:
    """Wrap a Spark-SQL string as a (spark, sf_dir) -> DataFrame builder.

    Re-registers the fixture temp views on each call (cheap: view
    registration is metadata-only; the parquet scan stays lazy and keeps
    pushdown/pruning through the view).
    """

    def build(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_views(spark, sf_dir)
        return spark.sql(sql)

    return build


def dec2(col) -> F.Column:
    """Cast to DECIMAL(18,2) — the exact-arithmetic carrier for money math
    (see operators/tpch.py docstring for why this guarantees cross-engine
    bit-identical aggregates)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("decimal(18,2)")


# SQL fragment twins of dec2 for oracle strings.
DEC = "DECIMAL(18,2)"


_CKPT_LOCK = threading.Lock()


def tracked_local_checkpoint(spark: SparkSession, df: DataFrame, registry: list) -> DataFrame:
    """Eager localCheckpoint whose materialized RDD ids are recorded in
    `registry` so `release_checkpoints` can free their block-manager
    storage DETERMINISTICALLY. Dropping the Python references alone
    leaves cleanup to GC + the ContextCleaner — repeated invocations
    (bench loops, sweeps) would accumulate generations of stored
    partitions until a collection happens to run.

    The before/after diff of getPersistentRDDs is serialized under a
    process-wide lock: two operators checkpointing concurrently on the
    shared session would otherwise each capture the other's RDD ids, and
    (because localCheckpoint truncates lineage) a cross-release would turn
    a recompute into an unrecoverable job failure."""
    with _CKPT_LOCK:
        before = {int(i) for i in spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()}
        out = df.localCheckpoint()
        after = {int(i) for i in spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()}
        registry.extend(sorted(after - before))
    return out


def tracked_local_checkpoint_many(
    spark: SparkSession, dfs: list, registry: list
) -> list:
    """Checkpoint several INDEPENDENT frames with their jobs submitted
    concurrently (guide §2.6 — actions are only sequential because the
    driver calls them sequentially; overlapping lets the second job's
    tasks back-fill executors freed by the first job's tail). Wall time
    is ~max(job times) instead of their sum. The RDD-id bookkeeping is
    one before/after diff around the whole batch, still under the
    process-wide lock, so concurrent operators cannot cross-release."""
    from concurrent.futures import ThreadPoolExecutor

    with _CKPT_LOCK:
        before = {int(i) for i in spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()}
        with ThreadPoolExecutor(max_workers=len(dfs)) as pool:
            outs = list(pool.map(lambda d: d.localCheckpoint(), dfs))
        after = {int(i) for i in spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()}
        registry.extend(sorted(after - before))
    return outs


def release_checkpoints(spark: SparkSession, registry: list) -> None:
    """Unpersist every RDD id recorded by tracked_local_checkpoint and
    clear the registry. Safe against already-released ids."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for rid in registry:
        try:
            if jmap.containsKey(rid):
                jmap.get(rid).unpersist(False)
        except Exception:  # noqa: BLE001 — release must never fail a query
            pass
    registry.clear()
