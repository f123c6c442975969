#!/usr/bin/env python3
"""Hostile-mutation sweep over the STATEMENT battery (round 13,
VERDICT r12 item 7 — the SELECT sweep exists since round 11; the write
battery had never been mutation-swept).

Every sequence in tools/statement_probe.py re-runs with each statement
mutated in a meaning-preserving way — an injected block comment with
quotes and keywords after the leading verb, keyword/identifier case
flips, whitespace collapse — through the same run_probe differential
(final table state + err-step sets vs live DuckDB). A mutation that
makes a statement invalid is still a valid differential (both engines
must reject the same step).

Usage: python tools/statement_mutation_sweep.py [filter] → one line per
failure, summary at the end, exit 1 on failures.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

from tools.statement_probe import (  # noqa: E402
    EXPECTED_STMT_DIVERGENCES,
    SEQS,
    run_probe,
)


def mutate_block_comment(stmt: str) -> str:
    # after the leading verb: a comment whose body carries a quote and
    # a keyword — splicing bugs resurface it as live SQL
    return re.sub(
        r"^(\s*\w+\b)", r"\1 /* don't UNION 'x */", stmt, count=1
    )


def mutate_case(stmt: str) -> str:
    # literal-free statements only (swapcase in a literal changes data)
    if "'" in stmt or '"' in stmt:
        return stmt
    return stmt.swapcase()


def mutate_collapse_ws(stmt: str) -> str:
    if "'" in stmt or '"' in stmt:
        return stmt
    return re.sub(r"\s+", " ", stmt).strip()


MUTATIONS = (
    ("blockcomment", mutate_block_comment),
    ("case", mutate_case),
    ("collapse_ws", mutate_collapse_ws),
)


def main() -> int:
    filt = sys.argv[1] if len(sys.argv) > 1 else ""
    from duck_server_spark.engine.executor import Engine
    from duck_server_spark.engine.session import get_session

    spark = get_session("statement_mutation_sweep")
    spark.sparkContext.setLogLevel("ERROR")
    eng = Engine(spark)

    checked = failures = 0
    for name, stmts, tables in SEQS:
        if name in EXPECTED_STMT_DIVERGENCES or (filt and filt not in name):
            continue
        for label, fn in MUTATIONS:
            mut = [fn(s) for s in stmts]
            if mut == list(stmts):
                continue
            checked += 1
            try:
                problems = run_probe(eng, name, mut, tables)
            except Exception as exc:  # noqa: BLE001
                failures += 1
                print(f"ENGINE_ERR {name}/{label}: "
                      f"{str(exc).splitlines()[0][:110]}")
                continue
            if problems:
                failures += 1
                print(f"MISMATCH   {name}/{label}")
                for p in problems:
                    print("  " + p.replace("\n", "\n  "))
    print(f"\nchecked {checked} mutated sequences, {failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
