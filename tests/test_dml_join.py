"""UPDATE … FROM / DELETE … USING (engine/dml_join.py), pinned against
live DuckDB like tests/test_upsert.py."""

import shutil

import duckdb
import pytest

from duck_server_spark.engine.errors import PgError
from duck_server_spark.engine.executor import Engine

TABLES = ("dj_t", "dj_s", "dj_p", "dj_c")


@pytest.fixture(scope="module")
def engine(spark):
    eng = Engine(spark)
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in TABLES:
        eng.execute(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    yield eng
    for t in TABLES:
        eng.execute(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)


@pytest.fixture()
def fresh(engine, spark):
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")

    def make(duck, name: str, ddl: str, *seed: str):
        engine.execute(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(f"{warehouse}/{name}", ignore_errors=True)
        engine.execute(ddl)
        duck.execute(ddl)
        for s in seed:
            engine.execute(s)
            duck.execute(s)

    return make


def _state(spark, table):
    return sorted(
        (tuple(r) for r in spark.table(table).collect()),
        key=lambda t: tuple((v is None, v) for v in t),
    )


def _dstate(duck, table):
    return sorted(
        duck.execute(f"SELECT * FROM {table}").fetchall(),
        key=lambda t: tuple((v is None, v) for v in t),
    )


def test_update_from_table(engine, spark, fresh):
    duck = duckdb.connect()
    fresh(duck, "dj_t", "CREATE TABLE dj_t (id INT, v INT)",
          "INSERT INTO dj_t VALUES (1,10),(2,20),(3,30)")
    fresh(duck, "dj_s", "CREATE TABLE dj_s (id INT, v INT)",
          "INSERT INTO dj_s VALUES (1,99),(3,77)")
    stmt = "UPDATE dj_t SET v = dj_s.v FROM dj_s WHERE dj_t.id = dj_s.id"
    tag = engine.execute(stmt)
    dn = duck.execute(stmt).fetchall()[0][0]
    assert tag == f"UPDATE {dn}" == "UPDATE 2"
    assert _state(spark, "dj_t") == _dstate(duck, "dj_t")


def test_update_from_subquery_with_expressions(engine, spark, fresh):
    duck = duckdb.connect()
    fresh(duck, "dj_t", "CREATE TABLE dj_t (id INT, v INT)",
          "INSERT INTO dj_t VALUES (1,0),(2,0),(3,0)")
    stmt = ("UPDATE dj_t SET v = s.v + dj_t.id FROM (SELECT 2 AS id, 5 AS v) s "
            "WHERE dj_t.id = s.id")
    tag = engine.execute(stmt)
    dn = duck.execute(stmt).fetchall()[0][0]
    assert tag == f"UPDATE {dn}" == "UPDATE 1"
    assert _state(spark, "dj_t") == _dstate(duck, "dj_t") == [(1, 0), (2, 7), (3, 0)]


def test_update_from_counts_join_matches(engine, spark, fresh):
    """Pinned oddity: the tag counts join matches, and the picked value
    among multiple matches is arbitrary — assert the count and that the
    final value is one of the candidates."""
    duck = duckdb.connect()
    fresh(duck, "dj_t", "CREATE TABLE dj_t (id INT, v INT)",
          "INSERT INTO dj_t VALUES (3,0)")
    fresh(duck, "dj_s", "CREATE TABLE dj_s (id INT, v INT)",
          "INSERT INTO dj_s VALUES (3,77),(3,88)")
    stmt = "UPDATE dj_t SET v = dj_s.v FROM dj_s WHERE dj_t.id = dj_s.id"
    tag = engine.execute(stmt)
    dn = duck.execute(stmt).fetchall()[0][0]
    assert tag == f"UPDATE {dn}" == "UPDATE 2"
    assert _state(spark, "dj_t")[0][1] in (77, 88)


def test_update_from_no_where_is_cross(engine, spark, fresh):
    duck = duckdb.connect()
    fresh(duck, "dj_t", "CREATE TABLE dj_t (a INT)", "INSERT INTO dj_t VALUES (1),(2)")
    fresh(duck, "dj_s", "CREATE TABLE dj_s (id INT, v INT)",
          "INSERT INTO dj_s VALUES (9,0),(9,0),(9,0)")
    stmt = "UPDATE dj_t SET a = dj_s.id FROM dj_s"
    tag = engine.execute(stmt)
    dn = duck.execute(stmt).fetchall()[0][0]
    assert tag == f"UPDATE {dn}" == "UPDATE 6"
    assert _state(spark, "dj_t") == _dstate(duck, "dj_t") == [(9,), (9,)]


def test_plain_update_with_extract_from_stays_plain(engine, spark, fresh):
    """EXTRACT(epoch FROM ts)-style FROM inside parens must NOT trigger
    the join path."""
    duck = duckdb.connect()
    fresh(duck, "dj_t", "CREATE TABLE dj_t (id INT, v INT)",
          "INSERT INTO dj_t VALUES (1,0)")
    tag = engine.execute("UPDATE dj_t SET v = CAST(substr('from', 1, 1) = 'f' AS INT) WHERE id = 1")
    assert tag == "UPDATE 1"
    assert _state(spark, "dj_t") == [(1, 1)]


def test_delete_using(engine, spark, fresh):
    duck = duckdb.connect()
    fresh(duck, "dj_t", "CREATE TABLE dj_t (id INT, v INT)",
          "INSERT INTO dj_t VALUES (1,10),(2,20),(3,30)")
    fresh(duck, "dj_s", "CREATE TABLE dj_s (id INT, v INT)",
          "INSERT INTO dj_s VALUES (1,0),(3,0),(3,1)")
    stmt = "DELETE FROM dj_t USING dj_s WHERE dj_t.id = dj_s.id"
    tag = engine.execute(stmt)
    dn = duck.execute(stmt).fetchall()[0][0]
    assert tag == f"DELETE {dn}" == "DELETE 2"
    assert _state(spark, "dj_t") == _dstate(duck, "dj_t") == [(2, 20)]


def test_delete_using_subquery(engine, spark, fresh):
    duck = duckdb.connect()
    fresh(duck, "dj_t", "CREATE TABLE dj_t (id INT, v INT)",
          "INSERT INTO dj_t VALUES (1,10),(2,20)")
    stmt = "DELETE FROM dj_t USING (SELECT 2 AS id) d WHERE dj_t.id = d.id"
    tag = engine.execute(stmt)
    dn = duck.execute(stmt).fetchall()[0][0]
    assert tag == f"DELETE {dn}" == "DELETE 1"
    assert _state(spark, "dj_t") == _dstate(duck, "dj_t") == [(1, 10)]


def test_update_from_key_validation(engine, spark, fresh):
    """Assigning a key column through UPDATE…FROM still validates."""
    duck = duckdb.connect()
    fresh(duck, "dj_t", "CREATE TABLE dj_t (id INT PRIMARY KEY, v INT)",
          "INSERT INTO dj_t VALUES (1,10),(2,20)")
    with pytest.raises(PgError) as ei:
        engine.execute(
            "UPDATE dj_t SET id = s.nid FROM (SELECT 9 AS nid) s WHERE dj_t.v > 0"
        )
    assert ei.value.pgcode == "23505"
    assert _state(spark, "dj_t") == [(1, 10), (2, 20)]  # untouched


def test_delete_using_fk_restrict(engine, spark, fresh):
    duck = duckdb.connect()
    fresh(duck, "dj_p", "CREATE TABLE dj_p (id INT PRIMARY KEY)",
          "INSERT INTO dj_p VALUES (1),(2)")
    fresh(duck, "dj_c",
          "CREATE TABLE dj_c (cid INT, pid INT REFERENCES dj_p (id))",
          "INSERT INTO dj_c VALUES (100, 1)")
    stmt = "DELETE FROM dj_p USING (SELECT 1 AS id) d WHERE dj_p.id = d.id"
    with pytest.raises(duckdb.Error):
        duck.execute(stmt)
    with pytest.raises(PgError) as ei:
        engine.execute(stmt)
    assert ei.value.pgcode == "23503"
    # deleting the unreferenced parent is fine
    tag = engine.execute("DELETE FROM dj_p USING (SELECT 2 AS id) d WHERE dj_p.id = d.id")
    assert tag == "DELETE 1"
