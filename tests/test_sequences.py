"""DuckDB sequences: CREATE/DROP SEQUENCE + nextval()/currval().

The reference delegates these to embedded DuckDB (README.md:26); here
the registry is engine-owned (engine/sequences.py) and the functions
resolve driver-side. Value semantics are pinned live against DuckDB in
test_sequence_semantics_match_duckdb."""

import shutil

import pytest

from duck_server_spark.engine.errors import PgError
from duck_server_spark.engine.executor import Engine


@pytest.fixture(scope="module")
def engine(spark):
    eng = Engine(spark)
    # fresh registry per module run (the JSON store persists on purpose)
    for s in ("sq1", "sq2", "sq3", "sqw", "sqd", "sqr"):
        try:
            eng.sequences.drop(s, if_exists=True)
        except Exception:  # noqa: BLE001
            pass
    return eng


def test_create_nextval_currval_drop(engine):
    assert engine.execute("CREATE SEQUENCE sq1") == "CREATE SEQUENCE"
    df = engine.query("SELECT nextval('sq1') AS a, nextval('sq1') AS b")
    assert [tuple(r) for r in df.collect()] == [(1, 2)]
    assert [tuple(r) for r in engine.query("SELECT currval('sq1') AS c").collect()] == [(2,)]
    # persisted across Engine instances (same warehouse registry)
    eng2 = Engine(engine.spark)
    assert [tuple(r) for r in eng2.query("SELECT nextval('sq1') AS n").collect()] == [(3,)]
    assert engine.execute("DROP SEQUENCE sq1") == "DROP SEQUENCE"
    with pytest.raises(PgError) as ei:
        engine.query("SELECT nextval('sq1') AS n").collect()
    assert ei.value.pgcode == "42704"


def test_start_increment_and_descending_default(engine):
    engine.execute("CREATE SEQUENCE sq2 START 100 INCREMENT 5")
    vals = [
        engine.query("SELECT nextval('sq2') AS n").collect()[0][0] for _ in range(3)
    ]
    assert vals == [100, 105, 110]
    # DuckDB: negative increment without START begins at -1
    engine.execute("CREATE SEQUENCE sq3 INCREMENT -2")
    assert engine.query("SELECT nextval('sq3') AS n").collect()[0][0] == -1
    engine.execute("DROP SEQUENCE sq2")
    engine.execute("DROP SEQUENCE sq3")


def test_ddl_errors_and_guards(engine):
    engine.execute("CREATE SEQUENCE sqd")
    with pytest.raises(PgError) as ei:
        engine.execute("CREATE SEQUENCE sqd")
    assert ei.value.pgcode == "42P07"
    assert engine.execute("CREATE SEQUENCE IF NOT EXISTS sqd") == "CREATE SEQUENCE"
    with pytest.raises(PgError) as ei:
        engine.execute("DROP SEQUENCE nope_missing")
    assert ei.value.pgcode == "42704"
    assert engine.execute("DROP SEQUENCE IF EXISTS nope_missing") == "DROP SEQUENCE"
    # currval before any nextval: DuckDB "not yet defined in this session"
    with pytest.raises(PgError) as ei:
        engine.query("SELECT currval('sqd') AS c").collect()
    assert ei.value.pgcode == "55000"
    # unsupported clauses fail LOUDLY, never silently ignored
    with pytest.raises(PgError) as ei:
        engine.execute("CREATE SEQUENCE sx MINVALUE 5")
    assert ei.value.pgcode == "0A000"
    # row-stream shapes are rejected (sequences serialize)
    with pytest.raises(PgError) as ei:
        engine.query("SELECT nextval('sqd') AS n FROM range(3)").collect()
    assert ei.value.pgcode == "0A000"
    with pytest.raises(PgError) as ei:
        engine.execute("UPDATE some_t SET id = nextval('sqd')")
    assert ei.value.pgcode == "0A000"
    engine.execute("DROP SEQUENCE sqd")


def test_insert_values_with_sequence(engine, spark):
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    spark.sql("DROP TABLE IF EXISTS seq_t")
    shutil.rmtree(f"{wh}/seq_t", ignore_errors=True)
    engine.execute("CREATE SEQUENCE sqr START 10")
    engine.execute("CREATE TABLE seq_t (id BIGINT, v STRING)")
    tag = engine.execute(
        "INSERT INTO seq_t VALUES (nextval('sqr'), 'x'), (nextval('sqr'), 'y')"
    )
    assert tag.startswith("INSERT")
    assert sorted(tuple(r) for r in spark.table("seq_t").collect()) == [
        (10, "x"), (11, "y")
    ]
    # works with RETURNING too (values reserved once, on the run path)
    df, tag = engine.execute_returning(
        "INSERT INTO seq_t VALUES (nextval('sqr'), 'z') RETURNING id"
    )
    assert tag == "INSERT 0 1"
    assert [tuple(r) for r in df.collect()] == [(12,)]
    engine.execute("DROP SEQUENCE sqr")
    spark.sql("DROP TABLE seq_t")
    shutil.rmtree(f"{wh}/seq_t", ignore_errors=True)


def test_sequence_semantics_match_duckdb(engine, duck):
    """The full lifecycle, value-for-value against live DuckDB."""
    duck.execute("CREATE SEQUENCE dsq START 7 INCREMENT 3")
    engine.execute("CREATE SEQUENCE dsq START 7 INCREMENT 3")
    for _ in range(3):
        dv = duck.execute("SELECT nextval('dsq')").fetchone()[0]
        sv = engine.query("SELECT nextval('dsq') AS n").collect()[0][0]
        assert sv == dv
    dv = duck.execute("SELECT currval('dsq')").fetchone()[0]
    sv = engine.query("SELECT currval('dsq') AS c").collect()[0][0]
    assert sv == dv
    duck.execute("DROP SEQUENCE dsq")
    engine.execute("DROP SEQUENCE dsq")


def test_sequence_over_wire(spark, sf_dir):
    import socket
    import time as _t

    from duck_server_spark.server.pg.wire_server import run_threaded
    from tests.pg_client import PgClient

    eng = Engine(spark)
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    server, _loop = run_threaded(eng, port=port)
    _t.sleep(0.5)
    try:
        c = PgClient("127.0.0.1", port)
        c.simple_query("DROP SEQUENCE IF EXISTS wsq")
        _, _, tag = c.simple_query("CREATE SEQUENCE wsq START 42")
        assert tag == "CREATE SEQUENCE"
        _, rows, _ = c.simple_query("SELECT nextval('wsq') AS n")
        assert rows == [("42",)]
        _, rows, _ = c.simple_query("SELECT currval('wsq') AS c")
        assert rows == [("42",)]
        _, _, tag = c.simple_query("DROP SEQUENCE wsq")
        assert tag == "DROP SEQUENCE"
        c.terminate()
    finally:
        server.close()


# ---------------------------------------------------------------------------
# SERIAL-style DEFAULT nextval('seq') (round 7 follow-on)
# ---------------------------------------------------------------------------


def test_serial_default_fill_matches_duckdb(engine, spark, duck):
    """Full SERIAL lifecycle against live DuckDB: column-list insert,
    explicit DEFAULT keyword, and an INSERT…SELECT with the id omitted
    (range reserved once, assigned dense in row order)."""
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    spark.sql("DROP TABLE IF EXISTS ser_t")
    shutil.rmtree(f"{wh}/ser_t", ignore_errors=True)
    engine.sequences.drop("ssq", if_exists=True)
    stmts = [
        "CREATE SEQUENCE ssq",
        "CREATE TABLE ser_t (id INT DEFAULT nextval('ssq'), v TEXT NOT NULL)",
        "INSERT INTO ser_t (v) VALUES ('a'), ('b')",
        "INSERT INTO ser_t VALUES (DEFAULT, 'c')",
        "INSERT INTO ser_t (v) SELECT upper(v) FROM ser_t WHERE v = 'a'",
    ]
    for s in stmts:
        engine.execute(s)
        duck.execute(s)
    srows = sorted(tuple(r) for r in spark.table("ser_t").collect())
    drows = sorted(tuple(r) for r in duck.execute("SELECT * FROM ser_t").fetchall())
    assert srows == drows == [(1, "a"), (2, "b"), (3, "c"), (4, "A")]
    # DESCRIBE surfaces the sequence default like DuckDB does
    desc = {r[0]: r[4] for r in engine.query("DESCRIBE ser_t").collect()}
    assert desc["id"] == "nextval('ssq')"
    duck.execute("DROP TABLE ser_t")
    duck.execute("DROP SEQUENCE ssq")
    spark.sql("DROP TABLE ser_t")
    shutil.rmtree(f"{wh}/ser_t", ignore_errors=True)
    engine.execute("DROP SEQUENCE ssq")


def test_serial_with_pk_and_drop_column(engine, spark):
    """seq_default coexists with PK validation (the filled ids ARE the
    key) and drops with its column."""
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    spark.sql("DROP TABLE IF EXISTS ser_pk")
    shutil.rmtree(f"{wh}/ser_pk", ignore_errors=True)
    engine.sequences.drop("spk", if_exists=True)
    engine.execute("CREATE SEQUENCE spk START 5")
    engine.execute(
        "CREATE TABLE ser_pk (id INT PRIMARY KEY DEFAULT nextval('spk'), v TEXT)"
    )
    engine.execute("INSERT INTO ser_pk (v) VALUES ('x'), ('y')")
    assert sorted(tuple(r) for r in spark.table("ser_pk").collect()) == [
        (5, "x"), (6, "y")
    ]
    # dup key still rejected when id given explicitly
    with pytest.raises(PgError) as ei:
        engine.execute("INSERT INTO ser_pk VALUES (5, 'dup')")
    assert ei.value.pgcode == "23505"
    engine.execute("ALTER TABLE ser_pk DROP COLUMN v")
    assert sorted(c["kind"] for c in engine.constraints.get("ser_pk")) == [
        "primary", "seq_default"
    ]
    spark.sql("DROP TABLE ser_pk")
    shutil.rmtree(f"{wh}/ser_pk", ignore_errors=True)
    engine.execute("DROP SEQUENCE spk")


def test_copy_stdin_fills_sequence_default(spark, sf_dir):
    """COPY t (cols) FROM STDIN with the sequence column omitted fills a
    reserved dense range per micro-batch (DuckDB fills the default the
    same way) — not NULLs."""
    import shutil
    import socket
    import time as _t

    from duck_server_spark.server.pg.wire_server import run_threaded
    from tests.pg_client import PgClient

    eng = Engine(spark)
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    spark.sql("DROP TABLE IF EXISTS cseq_t")
    shutil.rmtree(f"{wh}/cseq_t", ignore_errors=True)
    eng.sequences.drop("cseq", if_exists=True)
    eng.execute("CREATE SEQUENCE cseq START 50")
    eng.execute(
        "CREATE TABLE cseq_t (id INT PRIMARY KEY DEFAULT nextval('cseq'), v TEXT)"
    )
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    server, _loop = run_threaded(eng, port=port)
    _t.sleep(0.5)
    try:
        c = PgClient("127.0.0.1", port)
        _, _, tag = c.copy_in("COPY cseq_t (v) FROM STDIN WITH csv", "a\nb\nc\n")
        assert tag == "COPY 3"
        assert sorted(tuple(r) for r in spark.table("cseq_t").collect()) == [
            (50, "a"), (51, "b"), (52, "c")
        ]
        c.terminate()
    finally:
        server.close()
        spark.sql("DROP TABLE IF EXISTS cseq_t")
        shutil.rmtree(f"{wh}/cseq_t", ignore_errors=True)
        eng.sequences.drop("cseq", if_exists=True)
