"""NOT NULL + CHECK constraint enforcement (engine/constraints.py,
engine/alter.py) — each behavior pinned against live DuckDB, the
reference's executor (duck_server delegates constraint enforcement to
embedded DuckDB, README.md:21-22)."""

import shutil

import duckdb
import pytest

from duck_server_spark.engine.constraints import extract_constraints
from duck_server_spark.engine.errors import PgError
from duck_server_spark.engine.executor import Engine

TABLES = ("rc_t", "rc_u", "rc_d")


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
        if duck is not None:
            duck.execute(ddl)
        for s in seed:
            engine.execute(s)
            if duck is not None:
                duck.execute(s)

    return make


# ---------- parsing ----------


def test_extract_notnull_and_check():
    ddl = (
        "CREATE TABLE t (a INT NOT NULL, b INT DEFAULT 5 CHECK (b > 0), "
        "c STRING DEFAULT 'not null (really)', CHECK (a < b))"
    )
    stripped, table, found = extract_constraints(ddl)
    assert table == "t"
    kinds = sorted((c["kind"], tuple(c["cols"])) for c in found)
    assert kinds == [
        ("check", ("a", "b")),
        ("check", ("b",)),
        ("notnull", ("a",)),
    ]
    # CHECK text must be gone from the DDL; NOT NULL stays; the string
    # literal containing "not null (really)" must be untouched
    assert "CHECK" not in stripped.upper()
    assert "NOT NULL" in stripped.upper()
    assert "'not null (really)'" in stripped
    inline = next(c for c in found if c["kind"] == "check" and c["cols"] == ["b"])
    assert inline["on"] == "b" and inline["expr"] == "b > 0"


def test_extract_check_nested_parens_and_constraint_name():
    ddl = (
        "CREATE TABLE t (a INT, b INT, "
        "CONSTRAINT pos CHECK (abs(a - (b + 1)) < 10))"
    )
    _, _, found = extract_constraints(ddl)
    assert found == [
        {"kind": "check", "expr": "abs(a - (b + 1)) < 10", "cols": ["a", "b"]}
    ]


# ---------- INSERT enforcement ----------


def test_insert_null_into_not_null(engine, spark, fresh):
    duck = duckdb.connect()
    fresh(duck, "rc_t", "CREATE TABLE rc_t (a INT NOT NULL, b INT)",
          "INSERT INTO rc_t VALUES (1, 1)")
    stmt = "INSERT INTO rc_t VALUES (NULL, 2)"
    with pytest.raises(duckdb.Error):
        duck.execute(stmt)
    with pytest.raises(PgError) as ei:
        engine.execute(stmt)
    assert ei.value.pgcode == "23502" and '"a"' in str(ei.value)
    assert spark.table("rc_t").count() == 1  # untouched


def test_insert_check_violation(engine, spark, fresh):
    duck = duckdb.connect()
    fresh(duck, "rc_t", "CREATE TABLE rc_t (a INT CHECK (a > 0))")
    with pytest.raises(duckdb.Error):
        duck.execute("INSERT INTO rc_t VALUES (-1)")
    with pytest.raises(PgError) as ei:
        engine.execute("INSERT INTO rc_t VALUES (-1)")
    assert ei.value.pgcode == "23514"
    # NULL passes the check (three-valued logic) — both engines agree
    duck.execute("INSERT INTO rc_t VALUES (NULL), (5)")
    engine.execute("INSERT INTO rc_t VALUES (NULL), (5)")
    assert spark.table("rc_t").count() == 2


def test_insert_table_level_check_multi_column(engine, spark, fresh):
    duck = duckdb.connect()
    fresh(duck, "rc_t", "CREATE TABLE rc_t (a INT, b INT, CHECK (a < b))",
          "INSERT INTO rc_t VALUES (1, 2)")
    stmt = "INSERT INTO rc_t VALUES (5, 3)"
    with pytest.raises(duckdb.Error):
        duck.execute(stmt)
    with pytest.raises(PgError) as ei:
        engine.execute(stmt)
    assert ei.value.pgcode == "23514"
    assert spark.table("rc_t").count() == 1


def test_insert_subset_fills_default_not_null(engine, spark, fresh):
    """Column-list INSERT on a CONSTRAINED table must apply the omitted
    column's DEFAULT (the validated-insert DataFrame path bypasses
    Spark's native default fill)."""
    duck = duckdb.connect()
    fresh(duck, "rc_t",
          "CREATE TABLE rc_t (a INT NOT NULL, b INT DEFAULT 7)",
          "INSERT INTO rc_t (a) VALUES (1)")
    assert [tuple(r) for r in spark.table("rc_t").collect()] == [(1, 7)]
    assert duck.execute("SELECT * FROM rc_t").fetchall() == [(1, 7)]


# ---------- UPDATE / upsert enforcement ----------


def test_update_violating_check(engine, spark, fresh):
    duck = duckdb.connect()
    fresh(duck, "rc_t", "CREATE TABLE rc_t (a INT CHECK (a > 0), b INT)",
          "INSERT INTO rc_t VALUES (1, 10), (2, 20)")
    stmt = "UPDATE rc_t SET a = -a WHERE b = 20"
    with pytest.raises(duckdb.Error):
        duck.execute(stmt)
    with pytest.raises(PgError) as ei:
        engine.execute(stmt)
    assert ei.value.pgcode == "23514"
    assert sorted(tuple(r) for r in spark.table("rc_t").collect()) == [
        (1, 10), (2, 20)]  # rewrite never published


def test_update_violating_not_null(engine, spark, fresh):
    duck = duckdb.connect()
    fresh(duck, "rc_t", "CREATE TABLE rc_t (a INT NOT NULL, b INT)",
          "INSERT INTO rc_t VALUES (1, 10)")
    stmt = "UPDATE rc_t SET a = NULL"
    with pytest.raises(duckdb.Error):
        duck.execute(stmt)
    with pytest.raises(PgError) as ei:
        engine.execute(stmt)
    assert ei.value.pgcode == "23502"


def test_update_untouched_column_skips_revalidation(engine, spark, fresh):
    """Updating a column no constraint references publishes without
    running the validators (the trigger is column-intersection)."""
    fresh(None, "rc_t", "CREATE TABLE rc_t (a INT CHECK (a > 0), b INT)",
          "INSERT INTO rc_t VALUES (1, 10)")
    assert engine.execute("UPDATE rc_t SET b = 99") == "UPDATE 1"
    assert [tuple(r) for r in spark.table("rc_t").collect()] == [(1, 99)]


def test_upsert_respects_check(engine, spark, fresh):
    duck = duckdb.connect()
    fresh(duck, "rc_t",
          "CREATE TABLE rc_t (k INT PRIMARY KEY, v INT CHECK (v >= 0))",
          "INSERT INTO rc_t VALUES (1, 5)")
    stmt = ("INSERT INTO rc_t VALUES (1, 9) "
            "ON CONFLICT (k) DO UPDATE SET v = -1")
    with pytest.raises(duckdb.Error):
        duck.execute(stmt)
    with pytest.raises(PgError) as ei:
        engine.execute(stmt)
    assert ei.value.pgcode == "23514"
    assert [tuple(r) for r in spark.table("rc_t").collect()] == [(1, 5)]


# ---------- COPY path ----------


def test_copy_batch_not_null(engine, spark, fresh):
    """The COPY/CH ingest micro-batch path validates NOT NULL before the
    append (same BatchAppender wiring the servers use)."""
    fresh(None, "rc_t", "CREATE TABLE rc_t (a INT NOT NULL, b INT)")
    app = engine.appender("rc_t", None)
    app.add((1, 2))
    app.add((None, 3))
    with pytest.raises(PgError) as ei:
        app.flush()
    assert ei.value.pgcode == "23502"
    assert spark.table("rc_t").count() == 0


def test_copy_subset_fills_default(engine, spark, fresh):
    """PG COPY (col-list) fills unlisted columns with their DEFAULT."""
    fresh(None, "rc_t", "CREATE TABLE rc_t (a INT NOT NULL, b INT DEFAULT 7)")
    app = engine.appender("rc_t", ["a"])
    app.add((3,))
    app.flush()
    assert [tuple(r) for r in spark.table("rc_t").collect()] == [(3, 7)]


# ---------- ALTER interactions (each pinned against DuckDB) ----------


def test_drop_column_inline_check_drops_with_column(engine, spark, fresh):
    duck = duckdb.connect()
    fresh(duck, "rc_t", "CREATE TABLE rc_t (a INT CHECK (a > 0), b INT)")
    duck.execute("ALTER TABLE rc_t DROP COLUMN a")  # DuckDB allows
    engine.execute("ALTER TABLE rc_t DROP COLUMN a")
    engine.execute("INSERT INTO rc_t VALUES (1)")  # no stale check fires
    assert engine.constraints.get("rc_t") == []


def test_drop_column_table_check_blocks(engine, spark, fresh):
    duck = duckdb.connect()
    fresh(duck, "rc_t", "CREATE TABLE rc_t (a INT, b INT, CHECK (a < b))")
    with pytest.raises(duckdb.Error):
        duck.execute("ALTER TABLE rc_t DROP COLUMN a")
    with pytest.raises(PgError) as ei:
        engine.execute("ALTER TABLE rc_t DROP COLUMN a")
    assert ei.value.pgcode == "2BP01" and "CHECK" in str(ei.value)


def test_drop_column_not_null_goes_with_it(engine, spark, fresh):
    fresh(None, "rc_t", "CREATE TABLE rc_t (a INT NOT NULL, b INT)")
    engine.execute("ALTER TABLE rc_t DROP COLUMN a")
    assert engine.constraints.get("rc_t") == []


def test_rename_column_check_follows(engine, spark, fresh):
    duck = duckdb.connect()
    fresh(duck, "rc_t", "CREATE TABLE rc_t (a INT CHECK (a > 0), b INT)")
    duck.execute("ALTER TABLE rc_t RENAME COLUMN a TO z")
    engine.execute("ALTER TABLE rc_t RENAME COLUMN a TO z")
    stmt = "INSERT INTO rc_t VALUES (-1, 1)"
    with pytest.raises(duckdb.Error):
        duck.execute(stmt)
    with pytest.raises(PgError) as ei:
        engine.execute(stmt)
    assert ei.value.pgcode == "23514"


def test_set_not_null_validates_existing(engine, spark, fresh):
    duck = duckdb.connect()
    fresh(duck, "rc_t", "CREATE TABLE rc_t (a INT)",
          "INSERT INTO rc_t VALUES (NULL)")
    stmt = "ALTER TABLE rc_t ALTER COLUMN a SET NOT NULL"
    with pytest.raises(duckdb.Error):
        duck.execute(stmt)
    with pytest.raises(PgError) as ei:
        engine.execute(stmt)
    assert ei.value.pgcode == "23502"
    # clear the NULL, then the alter takes and enforces
    engine.execute("DELETE FROM rc_t")
    duck.execute("DELETE FROM rc_t")
    engine.execute(stmt)
    duck.execute(stmt)
    with pytest.raises(duckdb.Error):
        duck.execute("INSERT INTO rc_t VALUES (NULL)")
    with pytest.raises(PgError):
        engine.execute("INSERT INTO rc_t VALUES (NULL)")
    # DROP NOT NULL deregisters
    engine.execute("ALTER TABLE rc_t ALTER COLUMN a DROP NOT NULL")
    engine.execute("INSERT INTO rc_t VALUES (NULL)")
    assert spark.table("rc_t").count() == 1


# ---------- review-pass fixes (round 7) ----------


def test_check_with_pg_regex_operator(engine, spark, fresh):
    """A PG/DuckDB-spelled CHECK (`~` regex) must ENFORCE — the stored
    expr goes through the dialect rewrites before F.expr."""
    duck = duckdb.connect()
    fresh(duck, "rc_t", "CREATE TABLE rc_t (name VARCHAR CHECK (name ~ '^[a-z]+$'))")
    stmt = "INSERT INTO rc_t VALUES ('UPPER')"
    with pytest.raises(duckdb.Error):
        duck.execute(stmt)
    with pytest.raises(PgError) as ei:
        engine.execute(stmt)
    assert ei.value.pgcode == "23514"
    engine.execute("INSERT INTO rc_t VALUES ('lower')")
    duck.execute("INSERT INTO rc_t VALUES ('lower')")
    assert spark.table("rc_t").count() == 1


def test_check_with_quoted_identifier(engine, spark, fresh):
    """CHECK ("price" > 0): the double-quoted identifier must (a) be
    attributed to the column so UPDATE revalidation triggers, and (b)
    evaluate as an identifier, not a string literal."""
    duck = duckdb.connect()
    fresh(duck, "rc_t", 'CREATE TABLE rc_t (price INT CHECK ("price" > 0))')
    with pytest.raises(duckdb.Error):
        duck.execute("INSERT INTO rc_t VALUES (-1)")
    with pytest.raises(PgError) as ei:
        engine.execute("INSERT INTO rc_t VALUES (-1)")
    assert ei.value.pgcode == "23514"
    engine.execute("INSERT INTO rc_t VALUES (5)")
    duck.execute("INSERT INTO rc_t VALUES (5)")
    stmt = "UPDATE rc_t SET price = -5"
    with pytest.raises(duckdb.Error):
        duck.execute(stmt)
    with pytest.raises(PgError) as ei:
        engine.execute(stmt)  # revalidation must FIRE (cols attribution)
    assert ei.value.pgcode == "23514"
    assert [tuple(r) for r in spark.table("rc_t").collect()] == [(5,)]


def test_rename_column_never_rewrites_literals(engine, spark, fresh):
    """Renaming a column must not corrupt string literals inside a CHECK
    that happen to spell the old name."""
    duck = duckdb.connect()
    fresh(duck, "rc_t",
          "CREATE TABLE rc_t (status VARCHAR, active INT, CHECK (status <> 'active'))")
    duck.execute("ALTER TABLE rc_t RENAME COLUMN active TO enabled")
    engine.execute("ALTER TABLE rc_t RENAME COLUMN active TO enabled")
    stmt = "INSERT INTO rc_t VALUES ('active', 1)"
    with pytest.raises(duckdb.Error):
        duck.execute(stmt)
    with pytest.raises(PgError):
        engine.execute(stmt)  # 'active' literal untouched: still rejects
    engine.execute("INSERT INTO rc_t VALUES ('other', 1)")
    duck.execute("INSERT INTO rc_t VALUES ('other', 1)")
    assert spark.table("rc_t").count() == 1


def test_insert_values_default_keyword(engine, spark, fresh):
    """INSERT … VALUES (…, DEFAULT) on a CONSTRAINED table: the
    validated-insert path must expand DEFAULT positionally (Spark can't
    resolve the keyword in a standalone VALUES)."""
    duck = duckdb.connect()
    fresh(duck, "rc_t",
          "CREATE TABLE rc_t (a INT NOT NULL, b INT DEFAULT 7)",
          "INSERT INTO rc_t VALUES (1, DEFAULT), (2, 3)")
    assert sorted(tuple(r) for r in spark.table("rc_t").collect()) == [(1, 7), (2, 3)]
    assert sorted(duck.execute("SELECT * FROM rc_t").fetchall()) == [(1, 7), (2, 3)]
    # column-list form: DEFAULT lands on the listed column's default
    engine.execute("INSERT INTO rc_t (b, a) VALUES (DEFAULT, 9)")
    duck.execute("INSERT INTO rc_t (b, a) VALUES (DEFAULT, 9)")
    assert sorted(tuple(r) for r in spark.table("rc_t").collect()) == sorted(
        duck.execute("SELECT * FROM rc_t").fetchall()
    )


def test_update_rekey_referenced_parent_blocked(engine, spark, fresh):
    """UPDATE that rewrites a referenced parent key must not orphan
    children (pinned: DuckDB raises a constraint error)."""
    duck = duckdb.connect()
    fresh(duck, "rc_d", "CREATE TABLE rc_d (id INT PRIMARY KEY)",
          "INSERT INTO rc_d VALUES (1), (2)")
    fresh(duck, "rc_u",
          "CREATE TABLE rc_u (cid INT, pid INT REFERENCES rc_d (id))",
          "INSERT INTO rc_u VALUES (100, 1)")
    stmt = "UPDATE rc_d SET id = 9 WHERE id = 1"
    with pytest.raises(duckdb.Error):
        duck.execute(stmt)
    with pytest.raises(PgError) as ei:
        engine.execute(stmt)
    assert ei.value.pgcode == "23503"
    assert sorted(tuple(r) for r in spark.table("rc_d").collect()) == [(1,), (2,)]
    # re-keying the UNREFERENCED parent row is fine on both engines
    engine.execute("UPDATE rc_d SET id = 8 WHERE id = 2")
    duck.execute("UPDATE rc_d SET id = 8 WHERE id = 2")
    assert sorted(tuple(r) for r in spark.table("rc_d").collect()) == [(1,), (8,)]
