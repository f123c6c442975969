"""ALTER TABLE column surgery + CREATE/DROP INDEX (engine/alter.py).

DuckDB (the reference's embedded engine) executes these natively; each
behavioral rule is pinned by running the same script on live duckdb and
comparing final state, as in tests/test_upsert.py.
"""

import os
import shutil

import duckdb
import pytest

from duck_server_spark.engine.errors import PgError
from duck_server_spark.engine.executor import Engine

TABLES = ("alt_t", "alt_t2", "alt_ren", "alt_idx", "alt_crash", "alt_fkp", "alt_fkc")


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

    def make(name: str, spark_ddl: str, duck_ddl: str, *seed: str):
        engine.execute(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(f"{warehouse}/{name}", ignore_errors=True)
        engine.execute(spark_ddl)
        duck = duckdb.connect()
        duck.execute(duck_ddl)
        for s in seed:
            engine.execute(s)
            duck.execute(s)
        return duck

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


def test_drop_column(engine, spark, fresh):
    duck = fresh(
        "alt_t",
        "CREATE TABLE alt_t (id INT PRIMARY KEY, v STRING, w INT)",
        "CREATE TABLE alt_t (id INT PRIMARY KEY, v TEXT, w INT)",
        "INSERT INTO alt_t VALUES (1,'a',10),(2,'b',20)",
    )
    stmt = "ALTER TABLE alt_t DROP COLUMN w"
    assert engine.execute(stmt) == "ALTER TABLE"
    duck.execute(stmt)
    assert _state(spark, "alt_t") == _dstate(duck, "alt_t")
    assert [f.name for f in spark.table("alt_t").schema.fields] == ["id", "v"]


def test_drop_key_column_is_an_error(engine, spark, fresh):
    duck = fresh(
        "alt_t",
        "CREATE TABLE alt_t (id INT PRIMARY KEY, v STRING)",
        "CREATE TABLE alt_t (id INT PRIMARY KEY, v TEXT)",
    )
    with pytest.raises(duckdb.Error):
        duck.execute("ALTER TABLE alt_t DROP COLUMN id")
    with pytest.raises(PgError) as ei:
        engine.execute("ALTER TABLE alt_t DROP COLUMN id")
    assert ei.value.pgcode == "2BP01"


def test_rename_column_keys_follow(engine, spark, fresh):
    duck = fresh(
        "alt_t",
        "CREATE TABLE alt_t (id INT PRIMARY KEY, v STRING)",
        "CREATE TABLE alt_t (id INT PRIMARY KEY, v TEXT)",
        "INSERT INTO alt_t VALUES (1,'a')",
    )
    stmt = "ALTER TABLE alt_t RENAME COLUMN id TO id2"
    engine.execute(stmt)
    duck.execute(stmt)
    assert _state(spark, "alt_t") == _dstate(duck, "alt_t")
    # the PK followed the rename: duplicate id2 must still be rejected
    with pytest.raises(PgError) as ei:
        engine.execute("INSERT INTO alt_t VALUES (1,'dup')")
    assert ei.value.pgcode == "23505"


def test_alter_type_strict_and_using(engine, spark, fresh):
    duck = fresh(
        "alt_t",
        "CREATE TABLE alt_t (s STRING)",
        "CREATE TABLE alt_t (s TEXT)",
        "INSERT INTO alt_t VALUES ('12'),('34')",
    )
    stmt = "ALTER TABLE alt_t ALTER COLUMN s SET DATA TYPE INT USING CAST(s AS INT) + 1"
    engine.execute(stmt)
    duck.execute(stmt)
    assert _state(spark, "alt_t") == _dstate(duck, "alt_t") == [(13,), (35,)]
    # strict conversion: non-castable content errors, table unchanged
    engine.execute("DROP TABLE alt_t")
    fresh(
        "alt_t",
        "CREATE TABLE alt_t (s STRING)",
        "CREATE TABLE alt_t (s TEXT)",
        "INSERT INTO alt_t VALUES ('oops')",
    )
    with pytest.raises(Exception):
        engine.execute("ALTER TABLE alt_t ALTER COLUMN s TYPE INT")
    assert _state(spark, "alt_t") == [("oops",)]


def test_add_column_default_backfills(engine, spark, fresh):
    duck = fresh(
        "alt_t",
        "CREATE TABLE alt_t (id INT)",
        "CREATE TABLE alt_t (id INT)",
        "INSERT INTO alt_t VALUES (1),(2)",
    )
    stmt = "ALTER TABLE alt_t ADD COLUMN z INT DEFAULT 5"
    engine.execute(stmt)
    duck.execute(stmt)
    # pinned: DuckDB back-fills EXISTING rows with the default
    assert _state(spark, "alt_t") == _dstate(duck, "alt_t") == [(1, 5), (2, 5)]


def test_plain_add_column_null_fills(engine, spark, fresh):
    fresh("alt_t", "CREATE TABLE alt_t (id INT)", "CREATE TABLE alt_t (id INT)",
          "INSERT INTO alt_t VALUES (1)")
    engine.execute("ALTER TABLE alt_t ADD COLUMN z INT")
    assert _state(spark, "alt_t") == [(1, None)]


def test_rename_table_migrates_registries(engine, spark, fresh):
    fresh(
        "alt_ren",
        "CREATE TABLE alt_ren (id INT PRIMARY KEY, v STRING)",
        "CREATE TABLE alt_ren (id INT PRIMARY KEY, v TEXT)",
        "INSERT INTO alt_ren VALUES (1,'a')",
    )
    engine.execute("DROP TABLE IF EXISTS alt_t2")
    engine.execute("ALTER TABLE alt_ren RENAME TO alt_t2")
    assert spark.table("alt_t2").count() == 1
    # PK enforcement moved with the table
    with pytest.raises(PgError) as ei:
        engine.execute("INSERT INTO alt_t2 VALUES (1,'dup')")
    assert ei.value.pgcode == "23505"
    assert engine.constraints.get("alt_ren") == []
    engine.execute("DROP TABLE alt_t2")


def test_unique_index_registers_and_enforces(engine, spark, fresh):
    duck = fresh(
        "alt_idx",
        "CREATE TABLE alt_idx (a INT, b INT)",
        "CREATE TABLE alt_idx (a INT, b INT)",
        "INSERT INTO alt_idx VALUES (1,1),(2,1)",
    )
    assert engine.execute("CREATE UNIQUE INDEX alt_ux ON alt_idx (a)") == "CREATE INDEX"
    duck.execute("CREATE UNIQUE INDEX alt_ux ON alt_idx (a)")
    # later inserts are enforced like a declared UNIQUE
    stmt = "INSERT INTO alt_idx VALUES (1, 9)"
    with pytest.raises(duckdb.Error):
        duck.execute(stmt)
    with pytest.raises(PgError) as ei:
        engine.execute(stmt)
    assert ei.value.pgcode == "23505"
    # ... and upserts can use it as a conflict target
    n = engine.execute(
        "INSERT INTO alt_idx VALUES (1, 42) ON CONFLICT (a) DO UPDATE SET b = excluded.b"
    )
    assert n == "INSERT 0 1"
    # duplicate name errors; IF NOT EXISTS is quiet
    with pytest.raises(PgError):
        engine.execute("CREATE INDEX alt_ux ON alt_idx (b)")
    assert engine.execute("CREATE INDEX IF NOT EXISTS alt_ux ON alt_idx (b)") == "CREATE INDEX"
    # drop deregisters the unique key
    assert engine.execute("DROP INDEX alt_ux") == "DROP INDEX"
    assert engine.execute("INSERT INTO alt_idx VALUES (1, 7)") .startswith("INSERT")
    engine.execute("DROP INDEX IF EXISTS alt_ux")
    with pytest.raises(PgError) as ei:
        engine.execute("DROP INDEX alt_ux")
    assert ei.value.pgcode == "42704"


def test_unique_index_on_duplicate_data_is_an_error(engine, spark, fresh):
    duck = fresh(
        "alt_idx",
        "CREATE TABLE alt_idx (a INT, b INT)",
        "CREATE TABLE alt_idx (a INT, b INT)",
        "INSERT INTO alt_idx VALUES (1,1),(1,2)",
    )
    with pytest.raises(duckdb.Error):
        duck.execute("CREATE UNIQUE INDEX alt_ux2 ON alt_idx (a)")
    with pytest.raises(PgError) as ei:
        engine.execute("CREATE UNIQUE INDEX alt_ux2 ON alt_idx (a)")
    assert ei.value.pgcode == "23505"
    assert "alt_ux2" not in engine.indexes


def test_alter_inside_transaction_is_rejected(engine, spark, fresh):
    from duck_server_spark.engine.transactions import TxnOverlay

    fresh("alt_t", "CREATE TABLE alt_t (id INT)", "CREATE TABLE alt_t (id INT)")
    txn = TxnOverlay(engine, 990021)
    try:
        with pytest.raises(PgError) as ei:
            txn.intercept_ddl("ALTER TABLE alt_t DROP COLUMN id")
        assert ei.value.pgcode == "0A000"
    finally:
        txn.rollback()


def test_crashed_alter_swap_recovers_at_bootstrap(engine, spark, fresh):
    """Simulate a crash between DROP base and RENAME staging: the
    staging dir holds the only copy; the bootstrap janitor must move it
    into place (and must NOT generic-sweep it)."""
    from duck_server_spark.engine.alter import ALTER_STAGING_MARK

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    fresh(
        "alt_crash",
        "CREATE TABLE alt_crash (id INT)",
        "CREATE TABLE alt_crash (id INT)",
        "INSERT INTO alt_crash VALUES (1),(2),(3)",
    )
    base = f"{warehouse}/alt_crash"
    staging = f"{warehouse}/alt_crash{ALTER_STAGING_MARK}999_1"
    # orphan the data exactly as a crash mid-swap would: the staged copy
    # exists on disk, then the base (catalog entry AND files) goes away
    shutil.copytree(base, staging)
    spark.sql("DROP TABLE alt_crash")  # managed drop removes base files
    assert not os.path.exists(base) and os.path.isdir(staging)
    eng2 = Engine(spark)  # bootstrap runs the janitor
    assert os.path.isdir(base) and not os.path.exists(staging)
    # the recovered dir is a valid parquet table payload
    assert spark.read.parquet(base).count() == 3
    shutil.rmtree(base, ignore_errors=True)


def test_stale_alter_staging_is_swept_when_base_survives(engine, spark, fresh):
    from duck_server_spark.engine.alter import ALTER_STAGING_MARK

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    fresh(
        "alt_crash",
        "CREATE TABLE alt_crash (id INT)",
        "CREATE TABLE alt_crash (id INT)",
        "INSERT INTO alt_crash VALUES (1)",
    )
    stale = f"{warehouse}/alt_crash{ALTER_STAGING_MARK}999_2"
    os.makedirs(stale, exist_ok=True)
    Engine(spark)
    assert not os.path.exists(stale)
    assert spark.table("alt_crash").count() == 1
