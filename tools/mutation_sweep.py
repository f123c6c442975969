#!/usr/bin/env python3
"""Hostile-mutation sweep over the dialect probe battery (round 11).

Every PASSING probe statement is re-run under mutations that must not
change its meaning — an injected block comment containing quotes and
keywords, a line comment before FROM, and keyword/identifier case
flips — through BOTH engines, comparing the MUTATED statements
side-by-side. This is the harness that caught the round-11 comment-
splice family (a surviving `--` swallowed the rest of the line after
DISTINCT ON / unnest-item rewrites re-spliced the statement onto one
line — fixed by blanking comment spans in normalize_literals).

Known-divergence class skipped here: result-column CASE for
case-insensitively matched identifiers (duck renders the STORED case,
Spark keeps the TYPED spelling — values identical; probe
`ident_case_output`, EXPECTED_DIVERGENCES).

Usage: python tools/mutation_sweep.py   → one line per failure,
summary at the end, exit 1 on failures.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

import duckdb  # noqa: E402

from tools.dialect_probe import (  # noqa: E402
    EXPECTED_DIVERGENCES,
    PROBES,
    SF,
    TABLES,
    canon,
)


def mutate_block_comment(sql: str) -> str | None:
    out = re.sub(
        r"(?i)^(\s*SELECT\b)", r"\1 /* don't UNION 'x */", sql, count=1
    )
    return out if out != sql else None


def mutate_line_comment(sql: str) -> str | None:
    if "\n" in sql or not re.search(r"(?i)\bFROM\b", sql):
        return None
    return re.sub(r"(?i)\bFROM\b", "-- it's a trap\nFROM", sql, count=1)


def mutate_collapse_ws(sql: str) -> str | None:
    # collapse every whitespace run to ONE space — catches rewrites
    # that depend on newlines/indentation; literal-free statements only
    # (a run inside a literal is data)
    if "'" in sql or '"' in sql:
        return None
    out = re.sub(r"\s+", " ", sql).strip()
    return out if out != sql else None


def mutate_case(sql: str) -> str | None:
    # keyword/identifier case flip — only on literal-free statements
    # (swapcase inside a literal would change the VALUE); result-column
    # case is compared case-INSENSITIVELY here (the documented
    # stored-vs-typed case divergence is orthogonal to this sweep)
    if "'" in sql or '"' in sql:
        return None
    out = sql.swapcase()
    return out if out != sql else None


def main() -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    from duck_server_spark.engine.executor import Engine
    from duck_server_spark.engine.session import get_session

    spark = get_session("mutation_sweep")
    for t in TABLES:
        spark.read.parquet(f"{SF}/{t}.parquet").createOrReplaceTempView(t)
    eng = Engine(spark)

    checked = failures = 0
    for name, sql in PROBES:
        if name in EXPECTED_DIVERGENCES:
            continue
        for label, mut in (
            ("blockcomment", mutate_block_comment(sql)),
            ("linecomment", mutate_line_comment(sql)),
            ("case", mutate_case(sql)),
            ("collapse_ws", mutate_collapse_ws(sql)),
        ):
            if mut is None:
                continue
            try:
                want = con.execute(mut).fetchdf()
            except Exception:  # noqa: BLE001 — mutation invalid in duck
                continue
            checked += 1
            try:
                got = eng.query(mut, dialect="pg").toPandas()
            except Exception as exc:  # noqa: BLE001
                failures += 1
                print(f"ENGINE_ERR {name}/{label}: "
                      f"{str(exc).splitlines()[0][:110]}")
                continue
            try:
                # column names compared case-insensitively (see header):
                # lowercase BEFORE canon so its sort-by-name ordering
                # agrees across engines
                g = got.rename(columns={c: c.lower() for c in got.columns})
                w = want.rename(columns={c: c.lower() for c in want.columns})
                ok = canon(g) == canon(w) and sorted(g.columns) == sorted(
                    w.columns
                )
            except Exception:  # noqa: BLE001
                ok = False
            if not ok:
                failures += 1
                print(f"MISMATCH   {name}/{label}: {mut[:120]!r}")
    print(f"\nchecked {checked} mutations, {failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
