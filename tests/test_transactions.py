"""Real BEGIN/COMMIT/ROLLBACK over the PG wire (round 4).

The reference inherits transactions from embedded DuckDB
(/root/reference/pg_conn.go:215-272, README.md:21-22); this engine builds
the same client-visible semantics with session-scoped staged writes
(duck_server_spark/engine/transactions.py). These tests drive the live
server exactly as a JDBC autocommit=false client would and assert BOTH
the data outcome and the ReadyForQuery status byte transitions (I/T/E).
"""

import shutil
import time

import pytest

from duck_server_spark.engine.executor import Engine
from duck_server_spark.server.pg.wire_server import run_threaded

from tests.pg_client import PgClient
from tests.test_pg_server import _free_port


@pytest.fixture(scope="module")
def pgt(spark):
    engine = Engine(spark)
    port = _free_port()
    server, _loop = run_threaded(engine, port=port)
    time.sleep(0.5)
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("txn_t1", "txn_t2", "txn_t3", "txn_t4", "txn_t5", "txn_t6"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
        shutil.rmtree(f"{warehouse}/{t}__txn_0", ignore_errors=True)
    yield ("127.0.0.1", port), engine
    server.close()


def _mk_table(c: PgClient, name: str) -> None:
    c.simple_query(f"CREATE TABLE {name} (id BIGINT, v DOUBLE) USING parquet")
    c.simple_query(f"INSERT INTO {name} VALUES (1, 10.0), (2, 20.0), (3, 30.0)")


def _snapshot(c: PgClient, name: str):
    _, rows, _ = c.simple_query(f"SELECT id, v FROM {name} ORDER BY id")
    return rows


def test_rollback_leaves_table_unchanged(pgt):
    (host, port), _ = pgt
    c = PgClient(host, port)
    _mk_table(c, "txn_t1")
    before = _snapshot(c, "txn_t1")
    assert c.last_ready_status == "I"
    _, _, tag = c.simple_query("BEGIN")
    assert tag == "BEGIN" and c.last_ready_status == "T"
    _, _, tag = c.simple_query("UPDATE txn_t1 SET v = v + 100 WHERE id >= 2")
    assert tag == "UPDATE 2" and c.last_ready_status == "T"
    _, _, tag = c.simple_query("ROLLBACK")
    assert tag == "ROLLBACK" and c.last_ready_status == "I"
    assert _snapshot(c, "txn_t1") == before
    c.terminate()


def test_commit_applies_changes(pgt):
    (host, port), _ = pgt
    c = PgClient(host, port)
    _mk_table(c, "txn_t2")
    c.simple_query("BEGIN")
    c.simple_query("UPDATE txn_t2 SET v = v + 1 WHERE id = 1")
    c.simple_query("DELETE FROM txn_t2 WHERE id = 3")
    _, _, tag = c.simple_query("COMMIT")
    assert tag == "COMMIT" and c.last_ready_status == "I"
    assert _snapshot(c, "txn_t2") == [("1", "11.0"), ("2", "20.0")]
    c.terminate()


def test_read_your_writes_and_isolation(pgt):
    """The writing connection sees its staged UPDATE; a concurrent
    connection keeps seeing the pre-transaction state until COMMIT."""
    (host, port), _ = pgt
    c1 = PgClient(host, port)
    c2 = PgClient(host, port)
    _mk_table(c1, "txn_t3")
    c1.simple_query("BEGIN")
    c1.simple_query("UPDATE txn_t3 SET v = 99.0 WHERE id = 1")
    _, rows_in_txn, _ = c1.simple_query("SELECT v FROM txn_t3 WHERE id = 1")
    assert rows_in_txn == [("99.0",)]  # read-your-writes
    _, rows_other, _ = c2.simple_query("SELECT v FROM txn_t3 WHERE id = 1")
    assert rows_other == [("10.0",)]  # isolation: other conn sees base
    c1.simple_query("COMMIT")
    _, rows_after, _ = c2.simple_query("SELECT v FROM txn_t3 WHERE id = 1")
    assert rows_after == [("99.0",)]
    c1.terminate()
    c2.terminate()


def test_error_aborts_block_until_rollback(pgt):
    """A failed statement flips the block to E: subsequent statements get
    25P02, COMMIT degrades to ROLLBACK, and no staged write survives."""
    (host, port), _ = pgt
    c = PgClient(host, port)
    _mk_table(c, "txn_t4")
    before = _snapshot(c, "txn_t4")
    c.simple_query("BEGIN")
    c.simple_query("UPDATE txn_t4 SET v = 0.0 WHERE id = 1")
    with pytest.raises(RuntimeError):
        c.simple_query("SELECT * FROM no_such_table_xyz")
    assert c.last_ready_status == "E"
    with pytest.raises(RuntimeError, match="25P02"):
        c.simple_query("SELECT 1")
    assert c.last_ready_status == "E"
    _, _, tag = c.simple_query("COMMIT")  # PG: commit of failed txn = rollback
    assert tag == "ROLLBACK" and c.last_ready_status == "I"
    assert _snapshot(c, "txn_t4") == before
    c.terminate()


def test_insert_and_extended_protocol_txn(pgt):
    """INSERT staged through a transaction via the extended protocol
    (Parse/Bind/Execute), committed, visible after."""
    (host, port), _ = pgt
    c = PgClient(host, port)
    _mk_table(c, "txn_t5")
    c.parse("tb", "BEGIN")
    c.bind("", "tb", [])
    c.execute("")
    rows, tag = c.collect_execute()
    assert tag == "BEGIN"
    c.sync_collect()
    assert c.last_ready_status == "T"
    c.parse("ti", "INSERT INTO txn_t5 VALUES (4, 40.0)")
    c.bind("", "ti", [])
    c.execute("")
    _, tag = c.collect_execute()
    assert tag.startswith("INSERT")
    c.sync_collect()
    # read-your-writes through the extended protocol
    c.parse("ts", "SELECT count(*) AS n FROM txn_t5")
    c.bind("", "ts", [])
    c.execute("")
    rows, _ = c.collect_execute()
    assert rows == [("4",)]
    c.sync_collect()
    _, _, tag = c.simple_query("COMMIT")
    assert tag == "COMMIT"
    assert _snapshot(c, "txn_t5") == [
        ("1", "10.0"), ("2", "20.0"), ("3", "30.0"), ("4", "40.0")
    ]
    c.terminate()


def test_disconnect_mid_txn_rolls_back(pgt):
    (host, port), _ = pgt
    c = PgClient(host, port)
    c.simple_query("DROP TABLE IF EXISTS txn_t1")  # reuse a fresh table
    _mk_table(c, "txn_t1")
    before = _snapshot(c, "txn_t1")
    c.simple_query("BEGIN")
    c.simple_query("DELETE FROM txn_t1")
    c.terminate()  # implicit rollback
    time.sleep(1.0)
    c2 = PgClient(host, port)
    assert _snapshot(c2, "txn_t1") == before
    c2.terminate()


def test_constraints_enforced_inside_transaction(pgt):
    """DML inside BEGIN..COMMIT is redirected to the shadow table — the
    constraint registry must resolve the shadow back to its base so a
    duplicate key fails AT STATEMENT TIME inside the transaction (the
    reference gets this from DuckDB's index inside its txn), leaving the
    transaction aborted (E) and the base table clean after ROLLBACK."""
    (host, port), _ = pgt
    c = PgClient(host, port)
    c.simple_query("CREATE TABLE txn_t6 (id BIGINT PRIMARY KEY, v DOUBLE) USING parquet")
    c.simple_query("INSERT INTO txn_t6 VALUES (1, 10.0), (2, 20.0)")
    c.simple_query("BEGIN")
    # read-your-writes append inside the txn, valid key
    c.simple_query("INSERT INTO txn_t6 VALUES (3, 30.0)")
    # duplicate vs a row staged IN this txn → statement-time error, and
    # the violation message names the BASE table, not the shadow
    with pytest.raises(RuntimeError) as ei:
        c.simple_query("INSERT INTO txn_t6 VALUES (3, 99.0)")
    assert "23505" in str(ei.value)
    assert "txn_t6_pkey" in str(ei.value)
    assert c.last_ready_status == "E"
    c.simple_query("ROLLBACK")
    _, rows, _ = c.simple_query("SELECT id FROM txn_t6 ORDER BY id")
    assert [r[0] for r in rows] == ["1", "2"]
    c.terminate()
