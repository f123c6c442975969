"""Statement-level differential regression gate (round 12, VERDICT r11
item 5).

The SELECT-only probe battery found round 10's highest-leverage bug;
writes deserve the same sweep. Every sequence in
tools/statement_probe.py runs on BOTH engines (this engine's
execute()/query() path and live DuckDB) and the final table contents
must match value-for-value, with error steps agreeing. The battery
already paid for itself: round 12 it found the INSERT string-coercion
gap, the decimal-to-int write rounding, CREATE OR REPLACE TABLE,
TRUNCATE without TABLE, ADD COLUMN type normalization + lost DEFAULTs,
IN-subquery DML predicates breaking the observe metric, nextval inside
a wrapped source, and comment-hostile DML intercepts.
"""

from __future__ import annotations

import pytest

from tools.statement_probe import EXPECTED_STMT_DIVERGENCES, SEQS, run_probe


@pytest.fixture(scope="module")
def eng(spark):
    from duck_server_spark.engine.executor import Engine

    return Engine(spark)


@pytest.mark.parametrize(
    "name,stmts,tables", SEQS, ids=[n for n, _, _ in SEQS]
)
def test_statement_sequence_matches_duckdb(eng, name, stmts, tables):
    if name in EXPECTED_STMT_DIVERGENCES:
        pytest.skip(f"documented divergence: {EXPECTED_STMT_DIVERGENCES[name]}")
    problems = run_probe(eng, name, stmts, tables)
    assert not problems, f"{name}: " + "\n".join(problems)


def test_divergence_list_is_current():
    names = {n for n, _, _ in SEQS}
    stale = [n for n in EXPECTED_STMT_DIVERGENCES if n not in names]
    assert not stale, f"EXPECTED_STMT_DIVERGENCES names dead probes: {stale}"


# ---- mutation-sweep regression pins (round 13, VERDICT r12 item 7):
# the full hostile sweep lives in tools/statement_mutation_sweep.py
# (~15 min, run per-round); these pin the three bug classes it caught
# so they can't silently return.

_MUT_PINNED = [
    # comment between verb and table name must not bypass the txn
    # overlay (prepare/rewrite were comment-blind -> base-table writes)
    ("txn_rollback", "blockcomment"),
    ("err_rollback_after_error", "blockcomment"),
    # case-flipped SET / ALTER column names must bind like duck's
    # case-insensitive resolution
    ("on_conflict_do_update", "case"),
    ("alter_drop_keeps_other_defaults", "case"),
    ("rename_col_keeps_default", "case"),
    ("alter_type_using", "case"),
]


@pytest.mark.parametrize(
    "name,axis", _MUT_PINNED, ids=[f"{n}-{a}" for n, a in _MUT_PINNED]
)
def test_mutated_sequence_matches_duckdb(eng, name, axis):
    from tools.statement_mutation_sweep import MUTATIONS

    fn = dict(MUTATIONS)[axis]
    _, stmts, tables = next(x for x in SEQS if x[0] == name)
    mut = [fn(s) for s in stmts]
    assert mut != list(stmts), "mutation was a no-op; pin is dead"
    problems = run_probe(eng, name, mut, tables)
    assert not problems, f"{name}/{axis}: " + "\n".join(problems)
