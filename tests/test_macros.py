"""DuckDB SQL macros (round 8): CREATE/DROP MACRO + untyped CREATE
FUNCTION, inlined at statement-prepare time (engine/macros.py). The
reference's own bootstrap issues exactly this statement shape
(/root/reference/pg_server.go:40-42) and delegates client macro DDL to
embedded DuckDB. Every behavioral pin is re-derived from live duckdb in
the same test."""

import duckdb
import pytest

from duck_server_spark.engine.errors import PgError
from duck_server_spark.engine.executor import Engine


@pytest.fixture(scope="module")
def eng(spark):
    e = Engine(spark)
    # clean slate for this module's macro names (both kinds)
    for n in ("addm", "ff", "chainm", "dflt", "dfn", "discm", "grow", "tmac"):
        e.macros.drop(n, if_exists=True)
        e.macros.drop(n, if_exists=True, table=True)
    yield e
    for n in ("addm", "ff", "chainm", "dflt", "dfn", "discm", "grow", "tmac"):
        e.macros.drop(n, if_exists=True)
        e.macros.drop(n, if_exists=True, table=True)


def _one(eng, sql):
    return eng.query(sql).collect()[0][0]


def test_macro_lifecycle_pinned_vs_duckdb(eng):
    duck = duckdb.connect()

    def both(sql_stmt, probe):
        eng.execute(sql_stmt)
        duck.execute(sql_stmt)
        got = _one(eng, probe)
        want = duck.execute(probe).fetchone()[0]
        assert str(got) == str(want), (probe, got, want)

    both("CREATE MACRO addm(a, b) AS a + b", "SELECT addm(1, 2) AS v")
    # OR REPLACE swaps the body
    both("CREATE OR REPLACE MACRO addm(a, b) AS a * b", "SELECT addm(3, 4) AS v")
    # duplicate without OR REPLACE errors (DuckDB: "already exists")
    with pytest.raises(PgError) as ei:
        eng.execute("CREATE MACRO addm(x) AS x")
    assert ei.value.pgcode == "42723"
    with pytest.raises(Exception):
        duck.execute("CREATE MACRO addm(x) AS x")
    # IF NOT EXISTS is a no-op on an existing name
    eng.execute("CREATE MACRO IF NOT EXISTS addm(x) AS x")
    assert _one(eng, "SELECT addm(3, 4) AS v") == 12
    # CREATE FUNCTION is the same statement (the reference's spelling)
    both("CREATE FUNCTION ff(x) AS x + 10", "SELECT ff(5) AS v")
    # macros can call macros (bind-time inlining chains)
    both("CREATE MACRO chainm(x) AS addm(x, 1) + ff(x)", "SELECT chainm(2) AS v")
    # wrong positional arity errors, never silently NULLs
    with pytest.raises(PgError) as ei:
        _one(eng, "SELECT addm(1) AS v")
    assert ei.value.pgcode == "42883"
    # parameter defaults: omitted → default; overridden BY NAME
    both("CREATE MACRO dflt(a, b := 10) AS a + b", "SELECT dflt(1) AS v")
    assert _one(eng, "SELECT dflt(1, b := 2) AS v") == 3
    assert duck.execute("SELECT dflt(1, b := 2)").fetchone()[0] == 3
    # positional arg for a defaulted param errors (DuckDB pins this)
    with pytest.raises(PgError):
        _one(eng, "SELECT dflt(1, 2) AS v")
    with pytest.raises(Exception):
        duck.execute("SELECT dflt(1, 2)")
    # DROP MACRO; missing name errors unless IF EXISTS
    eng.execute("DROP MACRO chainm")
    duck.execute("DROP MACRO chainm")
    with pytest.raises(PgError) as ei:
        eng.execute("DROP MACRO chainm")
    assert ei.value.pgcode == "42883"
    eng.execute("DROP MACRO IF EXISTS chainm")
    eng.execute("DROP MACRO addm")
    eng.execute("DROP FUNCTION ff")  # FUNCTION spelling drops a macro too
    eng.execute("DROP MACRO dflt")


def test_macro_body_dialect_and_literals(eng):
    """Macro bodies get the full dialect-shim treatment after inlining,
    and parameter names inside STRING LITERALS are never substituted."""
    eng.execute("CREATE MACRO discm(price, d) AS list_value(price, price * (1 - d))")
    try:
        row = eng.query("SELECT discm(100.0, 0.25) AS v").collect()[0][0]
        assert [float(x) for x in row] == [100.0, 75.0]
    finally:
        eng.execute("DROP MACRO discm")
    eng.execute("CREATE MACRO grow(x) AS concat('x=', CAST(x AS STRING))")
    try:
        assert _one(eng, "SELECT grow(7) AS v") == "x=7"
    finally:
        eng.execute("DROP MACRO grow")


def test_macro_recursion_errors_loudly(eng):
    eng.execute("CREATE MACRO grow(x) AS grow(x + 1)")
    try:
        with pytest.raises(PgError) as ei:
            _one(eng, "SELECT grow(1) AS v")
        assert ei.value.pgcode == "54001"
    finally:
        eng.execute("DROP MACRO grow")


def test_typed_function_shapes_fall_through(eng, spark):
    """Spark's own typed SQL UDF must NOT be claimed by the macro
    parser (typed params → Spark-native path)."""
    eng.execute(
        "CREATE OR REPLACE TEMPORARY FUNCTION typedf(a INT) RETURNS INT RETURN a + 1"
    )
    assert _one(eng, "SELECT typedf(1) AS v") == 2
    assert "typedf" not in eng.macros.names()
    spark.sql("DROP TEMPORARY FUNCTION typedf")


def test_table_macros_pinned_vs_duckdb(eng, spark):
    """TABLE macros (round 8): expand to a derived table in FROM/JOIN
    position; results pinned vs live DuckDB; scalar-position use stays a
    loud error (DuckDB bind-errors it; here the call stays unexpanded)."""
    duck = duckdb.connect()
    for stmt in (
        "CREATE MACRO tmac(x) AS TABLE SELECT x AS a, x * 2 AS b",
    ):
        eng.execute(stmt)
        duck.execute(stmt)
    try:
        for probe in (
            "SELECT a, b FROM tmac(5)",
            "SELECT t1.a, t1.b FROM tmac(3) t1 WHERE t1.a = 3",
        ):
            got = [tuple(r) for r in eng.query(probe).collect()]
            want = duck.execute(probe).fetchall()
            assert got == want, (probe, got, want)
        # JOIN position — asserted vs DuckDB on a self-contained inline
        # table (ADVICE r8: the old nation-guarded probe never asserted)
        join_probe = (
            "SELECT v.k, t.b FROM (VALUES (1), (2)) AS v(k) "
            "JOIN tmac(1) t ON v.k = t.a"
        )
        got = sorted(tuple(r) for r in eng.query(join_probe).collect())
        want = sorted(duck.execute(join_probe).fetchall())
        assert got == want, (join_probe, got, want)
        # scalar position: loud error, never a silent scalar subquery
        with pytest.raises(Exception):
            eng.query("SELECT tmac(1)").collect()
        with pytest.raises(Exception):
            duck.execute("SELECT tmac(1)")
        # plain DROP MACRO on a table macro: "does not exist" (DuckDB
        # pins the drop spelling to the kind)
        with pytest.raises(PgError) as ei:
            eng.execute("DROP MACRO tmac")
        assert ei.value.pgcode == "42883"
        with pytest.raises(Exception):
            duck.execute("DROP MACRO tmac")
    finally:
        eng.execute("DROP MACRO TABLE IF EXISTS tmac")
        duck.execute("DROP MACRO TABLE IF EXISTS tmac")


def test_macro_param_capture_and_default_rules(eng, spark):
    """Round-8 review findings, pinned vs live DuckDB: (1) an ARGUMENT
    whose text contains a later parameter's NAME must not be captured by
    that parameter's substitution (simultaneous binding, like DuckDB's
    binder); (2) parameter defaults are LITERAL CONSTANTS only — numbers,
    strings, NULL; expressions/calls are 'Invalid parameter' in both
    engines (pinned: DuckDB rejects abs(-5), 1 + 2, true)."""
    duck = duckdb.connect()
    duck.execute("CREATE TABLE capt (b INT)")
    duck.execute("INSERT INTO capt VALUES (7)")
    spark.sql("DROP TABLE IF EXISTS capt")
    import shutil

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{wh}/capt", ignore_errors=True)
    eng.execute("CREATE TABLE capt (b INT)")
    eng.execute("INSERT INTO capt VALUES (7)")
    for stmt in (
        "CREATE MACRO addm(a, b) AS a + b",
        "CREATE MACRO dfn(a, b := -5) AS a + b",
    ):
        eng.execute(stmt)
        duck.execute(stmt)
    try:
        # the column named b as the FIRST argument: must be 7 + 10,
        # never (10) + (10) — the sequential-substitution capture bug
        probe = "SELECT addm(b, 10) AS v FROM capt"
        assert _one(eng, probe) == duck.execute(probe).fetchone()[0] == 17
        probe = "SELECT dfn(1) AS v"
        assert _one(eng, probe) == duck.execute(probe).fetchone()[0] == -4
        # non-constant defaults: clean 42601 in both engines, never a
        # fall-through Spark parse error
        with pytest.raises(PgError) as ei:
            eng.execute("CREATE MACRO bad1(a, b := abs(-5)) AS a + b")
        assert ei.value.pgcode == "42601"
        with pytest.raises(Exception):
            duck.execute("CREATE MACRO bad1(a, b := abs(-5)) AS a + b")
        # a named argument targeting a REQUIRED (non-default) parameter:
        # clean binder error, never '(a := 1)' substituted verbatim into
        # the body (ADVICE r8); DuckDB also bind-errors this call
        with pytest.raises(PgError) as ei:
            eng.query("SELECT addm(a := 1, b := 2) AS v").collect()
        assert ei.value.pgcode == "42883"
        with pytest.raises(Exception):
            duck.execute("SELECT addm(a := 1, b := 2) AS v")
        # …and a name that is no parameter at all
        with pytest.raises(PgError) as ei:
            eng.query("SELECT dfn(1, zz := 2) AS v").collect()
        assert ei.value.pgcode == "42883"
        with pytest.raises(Exception):
            duck.execute("SELECT dfn(1, zz := 2) AS v")
    finally:
        for stmt in ("DROP MACRO addm", "DROP MACRO dfn"):
            eng.execute(stmt)
            duck.execute(stmt)
        eng.execute("DROP TABLE capt")
        shutil.rmtree(f"{wh}/capt", ignore_errors=True)


def test_macro_bind_time_in_views_pinned_vs_duckdb(eng, spark):
    """Round 9 (VERDICT r8 punch item 4): DuckDB binds macros at USE —
    a view over a macro errors after DROP MACRO (Catalog Error, never
    the baked expansion served silently) and picks up a REDEFINED macro
    on the next read. Pinned vs live DuckDB for scalar and table macros;
    DROP VIEW clears the dependency record."""
    duck = duckdb.connect()
    for stmt in (
        "CREATE MACRO bindm(x) AS x * 2",
        "CREATE VIEW bindv AS SELECT bindm(21) AS a",
    ):
        eng.execute(stmt)
        duck.execute(stmt)
    try:
        probe = "SELECT * FROM bindv"
        assert _one(eng, probe) == duck.execute(probe).fetchone()[0] == 42
        # DROP MACRO then read the view: Catalog Error in both engines
        eng.execute("DROP MACRO bindm")
        duck.execute("DROP MACRO bindm")
        with pytest.raises(PgError) as ei:
            eng.query(probe).collect()
        assert ei.value.pgcode == "42883" and "bindm" in str(ei.value)
        with pytest.raises(Exception) as dei:
            duck.execute(probe)
        assert "bindm does not exist" in str(dei.value)
        # REDEFINE: the view serves the new body (bind at use)
        eng.execute("CREATE MACRO bindm(x) AS x + 1")
        duck.execute("CREATE MACRO bindm(x) AS x + 1")
        assert _one(eng, probe) == duck.execute(probe).fetchone()[0] == 22
        # …and repeatedly (the re-bake is cached until the next change)
        assert _one(eng, probe) == 22
        eng.execute("CREATE OR REPLACE MACRO bindm(x) AS x - 1")
        duck.execute("CREATE OR REPLACE MACRO bindm(x) AS x - 1")
        assert _one(eng, probe) == duck.execute(probe).fetchone()[0] == 20
        # table macro in a view: same lifecycle, DuckDB's Table Function error
        eng.execute("CREATE MACRO bindtm(x) AS TABLE SELECT x AS k, x * 2 AS v")
        duck.execute("CREATE MACRO bindtm(x) AS TABLE SELECT x AS k, x * 2 AS v")
        eng.execute("CREATE VIEW bindtv AS SELECT * FROM bindtm(3)")
        duck.execute("CREATE VIEW bindtv AS SELECT * FROM bindtm(3)")
        probe2 = "SELECT * FROM bindtv"
        assert [tuple(r) for r in eng.query(probe2).collect()] == duck.execute(probe2).fetchall()
        eng.execute("DROP MACRO TABLE bindtm")
        duck.execute("DROP MACRO TABLE bindtm")
        with pytest.raises(PgError) as ei:
            eng.query(probe2).collect()
        assert ei.value.pgcode == "42883" and "Table Function" in str(ei.value)
        with pytest.raises(Exception):
            duck.execute(probe2)
        # a BROKEN macro-view stays droppable/replaceable (review
        # finding: the dependency check must not block the escape
        # hatches — DuckDB drops/replaces such views fine, only
        # QUERYING them errors)
        eng.execute("DROP MACRO bindm")
        duck.execute("DROP MACRO bindm")
        eng.execute("CREATE OR REPLACE VIEW bindv AS SELECT 6 AS a")
        duck.execute("CREATE OR REPLACE VIEW bindv AS SELECT 6 AS a")
        assert _one(eng, "SELECT * FROM bindv") == duck.execute(
            "SELECT * FROM bindv"
        ).fetchone()[0] == 6
        # the escape hatch works for QUOTED spellings too (review
        # finding: strip-then-split missed quoted names) — BOTH backtick
        # quoting and PG double quotes (the round-10 global
        # normalize_quoted_idents closed the former DDL-identifier gap)
        eng.execute("CREATE MACRO bindm(x) AS x * 2")
        eng.execute('CREATE OR REPLACE VIEW bindv AS SELECT bindm(1) AS a')
        eng.execute("DROP MACRO bindm")
        eng.execute("DROP VIEW `bindv`")
        eng.execute("CREATE MACRO bindm(x) AS x * 2")
        eng.execute('CREATE OR REPLACE VIEW "bindv" AS SELECT bindm(1) AS a')
        eng.execute("DROP MACRO bindm")
        eng.execute('DROP VIEW "bindv"')
        eng.execute("CREATE VIEW bindv AS SELECT 6 AS a")
        duck.execute("CREATE MACRO bindm(x) AS x * 2")  # re-sync duck state
        # DROP VIEW clears the record: recreating WITHOUT macros works
        # even while the macro is gone
        eng.execute("DROP VIEW bindv")
        eng.execute("CREATE VIEW bindv AS SELECT 7 AS a")
        assert _one(eng, "SELECT * FROM bindv") == 7
    finally:
        for stmt in (
            "DROP VIEW IF EXISTS bindv",
            "DROP VIEW IF EXISTS bindtv",
            "DROP MACRO IF EXISTS bindm",
            "DROP MACRO TABLE IF EXISTS bindtm",
        ):
            try:
                eng.execute(stmt)
            except Exception:  # noqa: BLE001
                pass
            try:
                duck.execute(stmt)
            except Exception:  # noqa: BLE001
                pass


def test_broken_macro_view_only_blocks_binding_statements(eng, spark):
    """Round-10 advice finding: after DROP MACRO, only statements that
    can actually BIND the broken view raise the Catalog Error. Naming
    the view in a string literal, or DROP TABLE of a same-named table,
    must pass — DuckDB only errors when the view is queried."""
    spark.sql("DROP VIEW IF EXISTS brokv")
    spark.sql("DROP TABLE IF EXISTS brokv_twin")
    eng.macros.drop("brokm", if_exists=True)
    eng.execute("CREATE MACRO brokm(x) AS x * 2")
    eng.execute("CREATE VIEW brokv AS SELECT brokm(1) AS a")
    eng.execute("CREATE TABLE brokv_twin (note STRING)")
    try:
        eng.execute("DROP MACRO brokm")
        # string literal merely CONTAINING the view name: fine
        assert (
            eng.query("SELECT 'see brokv for details' AS s").collect()[0][0]
            == "see brokv for details"
        )
        eng.execute("INSERT INTO brokv_twin VALUES ('brokv is broken')")
        # comments naming the view: fine
        assert eng.query("SELECT 2 AS a -- brokv\n").collect()[0][0] == 2
        assert eng.query("SELECT /* brokv */ 3 AS a").collect()[0][0] == 3
        # DDL on OTHER objects that happens to name-match: fine
        eng.execute("DROP TABLE brokv_twin")
        # but actually binding the view still errors
        with pytest.raises(PgError) as ei:
            eng.query("SELECT * FROM brokv").collect()
        assert ei.value.pgcode == "42883" and "brokm" in str(ei.value)
        # ...including with a leading ORM comment (review finding: the
        # head was read from the RAW text, so '/* c */ SELECT' had head
        # '' and silently skipped the check, serving stale rows)
        with pytest.raises(PgError):
            eng.query("/* sqlcommenter */ SELECT * FROM brokv").collect()
        with pytest.raises(PgError):
            eng.query("-- note\nSELECT * FROM brokv").collect()
        with pytest.raises(PgError):
            eng.query("(SELECT * FROM brokv)").collect()
        # ... including through DML that reads it
        with pytest.raises(PgError):
            eng.query("SELECT (SELECT a FROM brokv) AS x").collect()
    finally:
        for stmt in (
            "DROP VIEW IF EXISTS brokv",
            "DROP TABLE IF EXISTS brokv_twin",
        ):
            try:
                eng.execute(stmt)
            except Exception:  # noqa: BLE001
                pass
        eng.macros.drop("brokm", if_exists=True)


def test_macro_view_bookkeeping_through_transactions(eng, spark):
    """Review finding: transactional CREATE/DROP VIEW must join the
    macro-view registry exactly like the autocommit path — a committed
    view over a macro binds at use, and a committed DROP kills the
    record so later macro changes cannot resurrect the view."""
    from duck_server_spark.engine.transactions import TxnOverlay

    spark.sql("DROP VIEW IF EXISTS txv")
    eng.macros.drop("txm", if_exists=True)
    eng.execute("CREATE MACRO txm(x) AS x * 3")
    try:
        txn = TxnOverlay(eng, 777001)
        assert txn.intercept_ddl("CREATE VIEW txv AS SELECT txm(2) AS a") is not None
        txn.commit()
        assert _one(eng, "SELECT * FROM txv") == 6
        eng.execute("DROP MACRO txm")
        with pytest.raises(PgError) as ei:
            eng.query("SELECT * FROM txv").collect()
        assert ei.value.pgcode == "42883"
        eng.execute("CREATE MACRO txm(x) AS x + 100")
        assert _one(eng, "SELECT * FROM txv") == 102  # re-bound at use
        # committed DROP VIEW kills the dependency record
        txn2 = TxnOverlay(eng, 777002)
        assert txn2.intercept_ddl("DROP VIEW txv") is not None
        txn2.commit()
        eng.execute("CREATE OR REPLACE MACRO txm(x) AS x + 1")
        # a statement merely NAMING the dead view must not re-bake it
        eng.query("SELECT 'txv' AS s").collect()
        assert not any(t.name == "txv" for t in spark.catalog.listTables())
    finally:
        spark.sql("DROP VIEW IF EXISTS txv")
        eng.macros.drop("txm", if_exists=True)
        eng.macro_views.drop("txv")
