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

    import time as _time

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    orphans = [
        f"{warehouse}/orph_j1__txn_314159",
        f"{warehouse}/orph_j2__cow_staging",
    ]
    fresh = f"{warehouse}/orph_j3__txn_271828"
    for p in orphans + [fresh]:
        os.makedirs(p, exist_ok=True)
        with open(f"{p}/part-junk", "w") as f:
            f.write("x")
    # crashed-process leftovers are old by the time a new engine boots;
    # the sweep's age guard (round 13) protects IN-FLIGHT sibling writes
    # whose dirs exist before their catalog entries — backdate the real
    # orphans, leave one fresh to pin that it SURVIVES
    old = _time.time() - 3600
    for p in orphans:
        os.utime(p, (old, old))
    Engine(spark)
    for p in orphans:
        assert not os.path.exists(p), p
    assert os.path.exists(fresh), "fresh dir must survive the age guard"
    import shutil

    shutil.rmtree(fresh, ignore_errors=True)


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


# ---------------------------------------------------------------------------
# DML RETURNING (round 7): INSERT → inserted post-image, UPDATE →
# post-update matched rows, DELETE → deleted pre-image. Semantics pinned
# live against DuckDB in test_returning_semantics_match_duckdb.
# ---------------------------------------------------------------------------


@pytest.fixture()
def ret_table(engine, spark):
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    spark.sql("DROP TABLE IF EXISTS dml_ret")
    shutil.rmtree(f"{warehouse}/dml_ret", ignore_errors=True)
    engine.execute("CREATE TABLE dml_ret (id INT, name TEXT, val DOUBLE)")
    yield "dml_ret"
    spark.sql("DROP TABLE IF EXISTS dml_ret")
    shutil.rmtree(f"{warehouse}/dml_ret", ignore_errors=True)


def test_returning_insert_update_delete(engine, spark, ret_table):
    df, tag = engine.execute_returning(
        "INSERT INTO dml_ret VALUES (1,'a',1.5), (2,'b',2.5) "
        "RETURNING id, upper(name) AS u"
    )
    assert tag == "INSERT 0 2"
    assert sorted(tuple(r) for r in df.collect()) == [(1, "A"), (2, "B")]

    df, tag = engine.execute_returning(
        "UPDATE dml_ret SET val = val * 2 WHERE id = 2 RETURNING *"
    )
    assert tag == "UPDATE 1"
    assert [tuple(r) for r in df.collect()] == [(2, "b", 5.0)]

    df, tag = engine.execute_returning(
        "DELETE FROM dml_ret WHERE id = 1 RETURNING id, val"
    )
    assert tag == "DELETE 1"
    assert [tuple(r) for r in df.collect()] == [(1, 1.5)]
    # whole-table DELETE (truncate fast path) still returns the pre-image
    df, tag = engine.execute_returning("DELETE FROM dml_ret RETURNING *")
    assert tag == "DELETE 1"
    assert [tuple(r) for r in df.collect()] == [(2, "b", 5.0)]
    assert spark.table("dml_ret").count() == 0


def test_returning_none_without_clause_and_guards(engine, spark, ret_table):
    assert engine.execute_returning("UPDATE dml_ret SET val = 1") is None
    # RETURNING in a string literal or subquery never splits
    assert engine.execute_returning(
        "INSERT INTO dml_ret VALUES (1, 'RETURNING x', 0)"
    ) is None
    from duck_server_spark.engine.errors import PgError

    with pytest.raises(PgError) as ei:
        engine.execute_returning(
            "INSERT INTO dml_ret VALUES (9,'z',0) ON CONFLICT DO NOTHING RETURNING id"
        )
    assert ei.value.pgcode == "0A000"


def test_returning_describe_schema_without_execution(engine, spark, ret_table):
    engine.execute("INSERT INTO dml_ret VALUES (5, 'x', 1.0)")
    schema = engine.describe_returning(
        "UPDATE dml_ret SET val = 0 RETURNING id, val * 2 AS d"
    )
    assert [(f.name, f.dataType.simpleString()) for f in schema] == [
        ("id", "int"), ("d", "double")
    ]
    # describing must NOT have executed the update
    assert [tuple(r) for r in spark.table("dml_ret").collect()] == [(5, "x", 1.0)]


def test_returning_semantics_match_duckdb(engine, spark, duck, ret_table):
    """Pin the three verbs' RETURNING semantics against live DuckDB on
    identical data: DuckDB is what the reference's clients see."""
    duck.execute("CREATE OR REPLACE TABLE d_ret (id INT, name TEXT, val DOUBLE)")
    stmts = [
        ("INSERT INTO {t} VALUES (1,'a',1.5), (2,'b',2.5) RETURNING id, val + 1 AS v1", "INSERT"),
        ("UPDATE {t} SET val = val * 10 WHERE id = 1 RETURNING id, name, val", "UPDATE"),
        ("DELETE FROM {t} WHERE val > 20 RETURNING id", "DELETE"),
    ]
    for templ, _verb in stmts:
        dres = sorted(tuple(r) for r in duck.execute(templ.format(t="d_ret")).fetchall())
        sdf, _tag = engine.execute_returning(templ.format(t="dml_ret"))
        sres = sorted(tuple(r) for r in sdf.collect())
        assert sres == dres, templ
    duck.execute("DROP TABLE d_ret")


def test_insert_by_name_pinned_vs_duckdb(engine, spark):
    """DuckDB's INSERT INTO … BY NAME (round 9), lifecycle pinned vs
    live DuckDB: name-matched columns in any order, absent columns get
    declared defaults (incl. a sequence DEFAULT) / NULL, RETURNING
    interplay, only-SELECT-source rule, unknown-column binder error."""
    import shutil

    import duckdb

    from duck_server_spark.engine.errors import PgError

    duck = duckdb.connect()
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    spark.sql("DROP TABLE IF EXISTS byn_t")
    shutil.rmtree(f"{wh}/byn_t", ignore_errors=True)
    try:
        engine.execute("DROP SEQUENCE IF EXISTS byn_s")
    except Exception:  # noqa: BLE001
        pass
    for stmt in (
        "CREATE SEQUENCE byn_s",
        "CREATE TABLE byn_t (id INT DEFAULT nextval('byn_s'), a INT, "
        "b VARCHAR DEFAULT 'dd', c DOUBLE)",
        "INSERT INTO byn_t BY NAME SELECT 5.5 AS c, 7 AS a",
        "INSERT INTO byn_t BY NAME (SELECT 1 AS a UNION ALL SELECT 2)",
    ):
        engine.execute(stmt.replace("VARCHAR", "STRING"))
        duck.execute(stmt)
    got = sorted(tuple(r) for r in spark.table("byn_t").collect())
    want = sorted(duck.execute("SELECT * FROM byn_t").fetchall())
    assert got == want, (got, want)
    # RETURNING interplay: post-image rows with defaults filled
    ret, tag = engine.execute_returning(
        "INSERT INTO byn_t BY NAME SELECT 4 AS a RETURNING id, a, b"
    )
    assert tag == "INSERT 0 1"
    dret = duck.execute(
        "INSERT INTO byn_t BY NAME SELECT 4 AS a RETURNING id, a, b"
    ).fetchall()
    assert [tuple(r) for r in ret.collect()] == dret
    # BY NAME composes with an ON CONFLICT tail on a KEYED table
    # (review finding: the upsert tail must be split off before the
    # source schema probe, not fed to the analyzer)
    engine.execute("DROP TABLE IF EXISTS byn_k")
    shutil.rmtree(f"{wh}/byn_k", ignore_errors=True)
    for stmt in (
        "CREATE TABLE byn_k (id INT PRIMARY KEY, a INT)",
        "INSERT INTO byn_k BY NAME SELECT 100 AS id, 1 AS a",
        "INSERT INTO byn_k BY NAME SELECT 100 AS id, 2 AS a "
        "ON CONFLICT (id) DO NOTHING",
    ):
        engine.execute(stmt)
        duck.execute(stmt)
    got = sorted(tuple(r) for r in spark.table("byn_k").collect())
    want = sorted(duck.execute("SELECT * FROM byn_k").fetchall())
    assert got == want == [(100, 1)], (got, want)
    engine.execute("DROP TABLE IF EXISTS byn_k")
    shutil.rmtree(f"{wh}/byn_k", ignore_errors=True)
    # only a SELECT source is legal (pinned binder error)
    with pytest.raises(PgError) as ei:
        engine.execute("INSERT INTO byn_t BY NAME VALUES (1, 2)")
    assert ei.value.pgcode == "42601"
    with pytest.raises(Exception):
        duck.execute("INSERT INTO byn_t BY NAME VALUES (1, 2)")
    # unknown source column: loud binder error in both engines
    with pytest.raises(PgError) as ei:
        engine.execute("INSERT INTO byn_t BY NAME SELECT 3 AS a, 9 AS zz")
    assert ei.value.pgcode == "42703" and "zz" in str(ei.value)
    with pytest.raises(Exception):
        duck.execute("INSERT INTO byn_t BY NAME SELECT 3 AS a, 9 AS zz")
    spark.sql("DROP TABLE IF EXISTS byn_t")
    shutil.rmtree(f"{wh}/byn_t", ignore_errors=True)
    engine.execute("DROP SEQUENCE IF EXISTS byn_s")
