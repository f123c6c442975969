"""Copy-on-write DML tests at the engine layer: stage-and-swap rewrite,
single-pass Observation row counts, no driver materialization.

Reference context: the reference gets UPDATE/DELETE from its embedded
engine's MVCC (/root/reference/README.md:21-22); vanilla Spark parquet
tables need the rewrite strategy (SURVEY.md §7 hard list)."""

import shutil

import pytest

from duck_server_spark.engine.executor import Engine


@pytest.fixture(scope="module")
def engine(spark):
    eng = Engine(spark)
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in (
        "dml_t1",
        "dml_t2",
        "dml_big",
        "dml_t1__cow_staging",
        "dml_t2__cow_staging",
        "dml_big__cow_staging",
    ):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    return eng


def test_update_reports_matched_rows(engine, spark):
    spark.sql("CREATE TABLE dml_t1 (id BIGINT, v DOUBLE) USING parquet")
    spark.sql("INSERT INTO dml_t1 VALUES (1, 10.0), (2, 20.0), (3, 30.0)")
    tag = engine.execute("UPDATE dml_t1 SET v = v + 1 WHERE id >= 2")
    assert tag == "UPDATE 2"
    assert {tuple(r) for r in spark.table("dml_t1").collect()} == {
        (1, 10.0), (2, 21.0), (3, 31.0)
    }


def test_delete_reports_matched_rows(engine, spark):
    spark.sql("CREATE TABLE dml_t2 (id BIGINT) USING parquet")
    spark.sql("INSERT INTO dml_t2 VALUES (1), (2), (3), (4)")
    tag = engine.execute("DELETE FROM dml_t2 WHERE id % 2 = 0")
    assert tag == "DELETE 2"
    assert sorted(r.id for r in spark.table("dml_t2").collect()) == [1, 3]
    tag = engine.execute("DELETE FROM dml_t2")
    assert tag == "DELETE 2"
    assert spark.table("dml_t2").count() == 0


def test_update_large_table_stays_off_driver(engine, spark):
    """>1M rows — beyond the old driver-collect threshold; the staging
    path must handle it in one executor-side pass and leave no staging
    table behind."""
    n = 1_200_000
    spark.range(n).selectExpr("id", "CAST(id % 100 AS DOUBLE) AS v").write.mode(
        "overwrite"
    ).saveAsTable("dml_big")
    tag = engine.execute("UPDATE dml_big SET v = -1.0 WHERE id % 100 = 7")
    assert tag == f"UPDATE {n // 100}"
    assert spark.table("dml_big").filter("v = -1.0").count() == n // 100
    assert spark.table("dml_big").count() == n
    assert not spark.catalog.tableExists("dml_big__cow_staging")


def test_bootstrap_janitor_sweeps_orphan_dirs(spark):
    """VERDICT r6 item 2: stale `<t>__txn_<id>` / `<t>__cow_staging`
    dirs with no catalog entry and no live shadow registration are
    removed when an Engine boots (a crashed process leaks them; random
    txn ids mean the reuse-time cleanup never fires)."""
    import os

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    orphans = [
        f"{warehouse}/orph_j1__txn_314159",
        f"{warehouse}/orph_j2__cow_staging",
    ]
    for p in orphans:
        os.makedirs(p, exist_ok=True)
        with open(f"{p}/part-junk", "w") as f:
            f.write("x")
    Engine(spark)
    for p in orphans:
        assert not os.path.exists(p), p


def test_create_table_recovers_orphaned_base_location(spark):
    """VERDICT r6 item 2: CREATE TABLE over a warehouse dir that no
    catalog entry owns (crash orphan) must recover, not 42710 forever —
    embedded DuckDB (reference pg_server.go:90) can't get into this
    state, so parity demands we can get OUT of it."""
    import os

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    spark.sql("DROP TABLE IF EXISTS orph_base1")
    path = f"{warehouse}/orph_base1"
    os.makedirs(path, exist_ok=True)
    with open(f"{path}/part-stale.parquet", "w") as f:
        f.write("not parquet")
    eng = Engine(spark)
    tag = eng.execute("CREATE TABLE orph_base1 (id BIGINT, v DOUBLE) USING parquet")
    assert tag == "CREATE TABLE"
    eng.execute("INSERT INTO orph_base1 VALUES (1, 1.5)")
    assert spark.table("orph_base1").count() == 1
    # a location the catalog DOES own is never silently clobbered
    with pytest.raises(Exception):
        eng.execute("CREATE TABLE orph_base1 (id BIGINT) USING parquet")
    assert spark.table("orph_base1").count() == 1
    spark.sql("DROP TABLE orph_base1")
    shutil.rmtree(path, ignore_errors=True)
