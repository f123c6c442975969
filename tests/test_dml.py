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
