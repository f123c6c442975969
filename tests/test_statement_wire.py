"""Wire-mode statement gate (round 13, VERDICT r12 item 3).

The 98-sequence statement battery (tools/statement_probe.py) exercised
execute()/query() directly, so a wire-layer write bug — framing of a
parameterized INSERT, COPY chunk reassembly, txn status tracking —
could escape it. Here a representative subset of the SAME sequences
drives a LIVE PG socket: every statement travels as a simple-protocol
Query (and a smaller subset through Parse/Bind/Describe/Execute/Sync),
with the final table state compared against DuckDB exactly like the
direct gate. One probe sends COPY FROM STDIN end-to-end over
CopyInResponse/CopyData/CopyDone (the first wire-mode run of this gate
caught a real divergence there: unquoted empty CSV fields must be NULL,
not '' — sources/ingest.py csv_rows_null_aware).

The full battery stays on the direct path (tests/test_statement_gate.py)
so this module adds socket coverage without doubling wall-clock;
`python tools/statement_probe.py --wire` runs ALL 98 over the socket.
"""

from __future__ import annotations

import socket
import time

import pytest

from tools.statement_probe import (
    EXPECTED_STMT_DIVERGENCES,
    SEQS,
    WireSession,
    run_probe,
    run_wire_copy_probe,
)

# Simple-protocol subset: every write FAMILY (create/insert/update/
# delete/alter/constraint/upsert/returning/txn/sequence/view/macro),
# biased toward sequences with error steps and txn state — the shapes
# where wire status tracking (ReadyForQuery 'I'/'T'/'E') can diverge.
WIRE_SIMPLE = [
    "create_insert_basic",
    "insert_subset_cols",
    "insert_defaults",
    "insert_select",
    "insert_by_name",
    "ctas_values",
    "create_or_replace_table",
    "wide_types_roundtrip",
    "insert_list_column",
    "update_where",
    "update_from_join",
    "update_scalar_subquery",
    "delete_using",
    "delete_in_subquery",
    "truncate_table",
    "alter_add_column_default",
    "alter_rename_column",
    "alter_column_type",
    "not_null_violation",
    "pk_duplicate",
    "unique_violation",
    "check_violation",
    "fk_violation",
    "insert_wrong_arity",
    "on_conflict_do_update",
    "insert_or_replace",
    "insert_returning_state",
    "update_returning_state",
    "txn_commit",
    "txn_rollback",
    "txn_rollback_ddl",
    "view_reflects_dml",
    "insert_cast_overflow",
    "comment_hostile_dml",
    "quoted_ident_dml",
    "sequence_nextval_insert",
    "macro_in_dml",
    "schema_qualified_dml",
]

# Extended-protocol subset: single-statement-per-message shapes (no
# explicit txns — BEGIN/COMMIT stay simple-protocol by PG convention).
WIRE_EXTENDED = [
    "create_insert_basic",
    "insert_defaults",
    "update_where",
    "delete_where",
    "alter_add_column",
    "pk_duplicate",
    "insert_returning_state",
    "on_conflict_do_nothing",
    "insert_with_cte",
    "ctas_order_limit",
]

_BY_NAME = {n: (n, s, t) for n, s, t in SEQS}
assert all(n in _BY_NAME for n in WIRE_SIMPLE + WIRE_EXTENDED)


@pytest.fixture(scope="module")
def wired(spark):
    from duck_server_spark.engine.executor import Engine
    from duck_server_spark.server.pg.wire_server import run_threaded

    eng = Engine(spark)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    server, _loop = run_threaded(eng, port=port)
    time.sleep(0.5)
    yield eng, port
    server.close()


@pytest.mark.parametrize("name", WIRE_SIMPLE)
def test_wire_simple_sequence(wired, name):
    if name in EXPECTED_STMT_DIVERGENCES:
        pytest.skip(f"documented divergence: {EXPECTED_STMT_DIVERGENCES[name]}")
    eng, port = wired
    _, stmts, tables = _BY_NAME[name]
    problems = run_probe(
        eng, name, stmts, tables,
        session_factory=lambda: WireSession("127.0.0.1", port),
    )
    assert not problems, f"{name} (wire): " + "\n".join(problems)


@pytest.mark.parametrize("name", WIRE_EXTENDED)
def test_wire_extended_sequence(wired, name):
    if name in EXPECTED_STMT_DIVERGENCES:
        pytest.skip(f"documented divergence: {EXPECTED_STMT_DIVERGENCES[name]}")
    eng, port = wired
    _, stmts, tables = _BY_NAME[name]
    problems = run_probe(
        eng, name, stmts, tables,
        session_factory=lambda: WireSession("127.0.0.1", port, extended=True),
    )
    assert not problems, f"{name} (wire-ext): " + "\n".join(problems)


def test_wire_copy_stdin(wired):
    eng, port = wired
    problems = run_wire_copy_probe(eng, "127.0.0.1", port)
    assert not problems, "wire_copy_stdin: " + "\n".join(problems)
