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
