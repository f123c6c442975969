"""PRIMARY KEY / UNIQUE declaration + ingest-time enforcement.

The reference delegates constraint enforcement to embedded DuckDB, which
indexes the key and rejects violating appends
(/root/reference/README.md:21-22 "primary key"; the COPY/INSERT paths
surface the engine error). Vanilla Spark tables have neither constraint
DDL nor indexes, so we do both halves ourselves:

- DDL: ``CREATE TABLE`` accepts inline ``PRIMARY KEY``/``UNIQUE`` column
  constraints and table-level ``PRIMARY KEY (a, b)`` / ``UNIQUE (...)``
  clauses. They are stripped before the DDL reaches Spark and recorded in
  a JSON registry next to the warehouse (same persistence pattern as the
  user store).
- Ingest: every constrained append (COPY FROM STDIN batches, INSERT)
  first runs TWO distributed checks per key — an intra-batch duplicate
  group-by and a left-semi join against the existing table — both
  ``limit(1)`` so they stop at the first hit. A violation raises
  SQLSTATE 23505 (or 23502 for NULLs in a primary key) BEFORE anything
  is appended, leaving the table unchanged.

Scale: the semi-join is a broadcast of the (usually small) incoming
batch against the table's key columns — a column-pruned scan, no index
needed; the intra-batch check is a partial-aggregated group-by on the
batch only. At 100 TB the per-append cost is one key-column scan, the
honest price of uniqueness without a table format's index support.
PG null semantics: UNIQUE ignores rows with NULL key parts (multiple
NULLs allowed); PRIMARY KEY rejects them.
"""

from __future__ import annotations

import json
import os
import re
import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duck_server_spark.engine.errors import PgError

# table-level:  [CONSTRAINT name] PRIMARY KEY (a, b) | UNIQUE (a, b)
_TABLE_LEVEL = re.compile(
    r"^\s*(?:CONSTRAINT\s+\w+\s+)?(PRIMARY\s+KEY|UNIQUE)\s*\(([^)]*)\)\s*$",
    re.IGNORECASE,
)
# inline:  <col> <type...> PRIMARY KEY | UNIQUE  (strip just the keyword)
_INLINE = re.compile(r"\b(PRIMARY\s+KEY|UNIQUE)\b", re.IGNORECASE)
_CREATE_HEAD = re.compile(
    r"^\s*create\s+table\s+(?:if\s+not\s+exists\s+)?([\w.]+)\s*\(",
    re.IGNORECASE,
)


def _match_create_table(ddl: str):
    """→ (table, body, tail) for CREATE TABLE, else None. The column
    body ends at the close paren that BALANCES the opening one — a
    greedy regex would swallow into a parenthesized tail like
    ``USING parquet OPTIONS (path '…')`` and corrupt the rebuilt DDL."""
    m = _CREATE_HEAD.match(ddl)
    if not m:
        return None
    depth, start = 1, m.end()
    for i in range(start, len(ddl)):
        ch = ddl[i]
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                tail = ddl[i + 1 :].strip().rstrip(";").strip()
                return m.group(1), ddl[start:i], tail
    return None


def _split_columns(body: str) -> list[str]:
    """Split a CREATE TABLE body on top-level commas."""
    parts, depth, start = [], 0, 0
    for i, ch in enumerate(body):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(body[start:i])
            start = i + 1
    parts.append(body[start:])
    return [p for p in (s.strip() for s in parts) if p]


def extract_constraints(ddl: str) -> tuple[str, str | None, list[dict]]:
    """→ (ddl with constraints stripped, table name, constraint list).

    Each constraint is {"kind": "primary"|"unique", "cols": [...]}.
    Non-CREATE-TABLE statements pass through untouched.
    """
    m = _match_create_table(ddl)
    if not m:
        return ddl, None, []
    table, body, tail = m
    found: list[dict] = []
    cols_out: list[str] = []
    for item in _split_columns(body):
        tl = _TABLE_LEVEL.match(item)
        if tl:
            kind = "primary" if tl.group(1).upper().startswith("PRIMARY") else "unique"
            cols = [c.strip().strip('`"') for c in tl.group(2).split(",") if c.strip()]
            found.append({"kind": kind, "cols": cols})
            continue  # table-level clause: drop the whole item
        im = _INLINE.search(item)
        if im:
            colname = item.split(None, 1)[0].strip('`"')
            kind = "primary" if im.group(1).upper().startswith("PRIMARY") else "unique"
            found.append({"kind": kind, "cols": [colname]})
            item = _INLINE.sub("", item).strip()
        cols_out.append(item)
    if not found:
        return ddl, table, []
    # rebuild: CREATE TABLE <name> (cols) <tail>
    head = re.match(r"^\s*create\s+table\s+(?:if\s+not\s+exists\s+)?[\w.]+", ddl, re.IGNORECASE)
    rebuilt = f"{head.group(0)} ({', '.join(cols_out)}) {tail or ''}".strip()
    return rebuilt, table, found


class ConstraintStore:
    """Persisted table-constraint registry (JSON next to the warehouse)."""

    def __init__(self, path: str):
        self._path = path
        self._lock = threading.Lock()

    def _load(self) -> dict:
        try:
            with open(self._path) as f:
                return json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            return {}

    def get(self, table: str) -> list[dict]:
        # transaction shadows (<name>__txn_<id>, engine/transactions.py)
        # carry their base table's constraints: DML inside BEGIN..COMMIT
        # is redirected to the shadow BEFORE the executor's constraint
        # lookup, and a dup key must fail at statement time there too
        base = re.sub(r"__txn_\d+$", "", table.lower())
        return self._load().get(base, [])

    def put(self, table: str, constraints: list[dict]) -> None:
        with self._lock:
            data = self._load()
            data[table.lower()] = constraints
            with open(self._path, "w") as f:
                json.dump(data, f)

    def drop(self, table: str) -> None:
        with self._lock:
            data = self._load()
            if data.pop(table.lower(), None) is not None:
                with open(self._path, "w") as f:
                    json.dump(data, f)


def _display_name(table: str) -> str:
    """User-facing relation name: a transaction shadow reports its BASE
    table in constraint-violation messages, like the reference would."""
    return re.sub(r"__txn_\d+$", "", table)


def validate_append(
    spark: SparkSession, table: str, incoming: DataFrame, constraints: list[dict]
) -> None:
    """Raise PgError 23505/23502 if appending `incoming` to `table` would
    violate any key. Runs BEFORE the append; both checks early-exit via
    limit(1)."""
    disp = _display_name(table)
    for c in constraints:
        keys = c["cols"]
        kind = c["kind"]
        cname = f"{disp}_{'pkey' if kind == 'primary' else '_'.join(keys) + '_key'}"
        nonnull = incoming
        if kind == "primary":
            null_pred = None
            for k in keys:
                p = F.col(k).isNull()
                null_pred = p if null_pred is None else (null_pred | p)
            if incoming.filter(null_pred).limit(1).count() > 0:
                raise PgError(
                    "23502",
                    f'null value in column of primary key "{cname}" of relation "{disp}"',
                )
        else:
            for k in keys:
                nonnull = nonnull.filter(F.col(k).isNotNull())
        # intra-batch duplicates (partial-aggregated group-by on the batch)
        dup = nonnull.groupBy(*keys).count().filter(F.col("count") > 1).limit(1)
        if dup.count() > 0:
            raise PgError(
                "23505", f'duplicate key value violates unique constraint "{cname}"'
            )
        # vs the existing table: column-pruned key scan, semi join
        existing = spark.table(table).select(*keys)
        hit = nonnull.select(*keys).join(existing, on=keys, how="left_semi").limit(1)
        if hit.count() > 0:
            raise PgError(
                "23505", f'duplicate key value violates unique constraint "{cname}"'
            )


def validate_table_keys(table: str, staged: DataFrame, constraints: list[dict]) -> None:
    """Raise PgError 23505/23502 if the full (post-rewrite) contents in
    `staged` violate any declared key — the UPDATE-path check: an
    ``UPDATE t SET pk = const`` can mint duplicates that append-time
    validation never sees. Same early-exit limit(1) probes as
    validate_append, run on the staged rewrite BEFORE it replaces the
    base table."""
    disp = _display_name(table)
    for c in constraints:
        keys = c["cols"]
        kind = c["kind"]
        cname = f"{disp}_{'pkey' if kind == 'primary' else '_'.join(keys) + '_key'}"
        nonnull = staged
        if kind == "primary":
            null_pred = None
            for k in keys:
                p = F.col(k).isNull()
                null_pred = p if null_pred is None else (null_pred | p)
            if staged.filter(null_pred).limit(1).count() > 0:
                raise PgError(
                    "23502",
                    f'null value in column of primary key "{cname}" of relation "{disp}"',
                )
        else:
            for k in keys:
                nonnull = nonnull.filter(F.col(k).isNotNull())
        dup = nonnull.groupBy(*keys).count().filter(F.col("count") > 1).limit(1)
        if dup.count() > 0:
            raise PgError(
                "23505", f'duplicate key value violates unique constraint "{cname}"'
            )
