"""DuckDB sequences: CREATE/DROP SEQUENCE + nextval()/currval().

The reference delegates sequence DDL and the two functions to embedded
DuckDB (README.md:26 — "full SQL" surface; pg_conn.go:314 hands the raw
statement through). Spark has no sequence object, so the registry lives
beside the other engine-owned catalogs (constraints, indexes, users) as
a JSON file next to the warehouse, and the functions resolve driver-side
before the statement reaches Spark.

Semantics (pinned against live DuckDB in tests/test_sequences.py):
- CREATE SEQUENCE name [START [WITH] n] [INCREMENT [BY] n]; duplicate →
  42P07 unless IF NOT EXISTS; DROP SEQUENCE missing → 42704 unless
  IF EXISTS.
- nextval('s') returns start on first call, then prior + increment.
  Values are handed out under a process-wide lock and persisted BEFORE
  being returned — a crash never re-issues a value (gaps are fine, the
  PG/DuckDB contract).
- currval('s') returns the last value nextval handed out; calling it
  before any nextval errors (DuckDB raises; we use 55000).

Scale note: a sequence is inherently a serialized counter — the ONLY
correct distributed use is reserving a contiguous RANGE per statement
(one fetch-and-add for N rows), which is what the INSERT…VALUES path
does textually (each occurrence = one reservation). Per-row nextval
inside a distributed SELECT would serialize the scan through the driver,
so those shapes raise 0A000 loudly instead — at 100 TB you want
monotonically_increasing_id()/uuid, not a counter."""

from __future__ import annotations

import json
import os
import re
import threading

from duck_server_spark.engine.errors import PgError

CREATE_SEQ = re.compile(
    r"^\s*create\s+sequence\s+(?P<ine>if\s+not\s+exists\s+)?(?P<name>[\w.]+)"
    r"(?P<opts>(?:\s+(?:start(?:\s+with)?|increment(?:\s+by)?)\s+-?\d+)*)"
    r"\s*;?\s*$",
    re.IGNORECASE,
)
DROP_SEQ = re.compile(
    r"^\s*drop\s+sequence\s+(?P<ie>if\s+exists\s+)?(?P<name>[\w.]+)\s*;?\s*$",
    re.IGNORECASE,
)
_OPT = re.compile(
    r"(start(?:\s+with)?|increment(?:\s+by)?)\s+(-?\d+)", re.IGNORECASE
)
# nextval/currval call sites are FOUND on the literal-masked text (so a
# string containing "nextval('x')" is never rewritten) but the argument
# is read from the raw text (it IS a string literal)
SEQ_FN = re.compile(r"\b(nextval|currval)\s*\(", re.IGNORECASE)
_ARG = re.compile(r"^\s*'([^']+)'\s*$")


class SequenceStore:
    """JSON-persisted sequence registry with fetch-and-add reservation."""

    def __init__(self, path: str):
        self._path = path
        self._lock = threading.Lock()
        self._last: dict[str, int] = {}  # currval, per process

    def _load(self) -> dict:
        try:
            with open(self._path) as f:
                return json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            return {}

    def _save(self, data: dict) -> None:
        tmp = self._path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(data, f)
        os.replace(tmp, self._path)

    def create(self, name: str, start: int, inc: int, if_not_exists: bool) -> None:
        if inc == 0:
            raise PgError("22023", "INCREMENT must not be zero")
        key = name.lower()
        with self._lock:
            data = self._load()
            if key in data:
                if if_not_exists:
                    return
                raise PgError("42P07", f'sequence "{name}" already exists')
            # "next" is the value the NEXT nextval returns; "start" is
            # kept for introspection (duckdb_sequences' start_value /
            # last_value derivation — round 10)
            data[key] = {"next": start, "inc": inc, "start": start}
            self._save(data)

    def drop(self, name: str, if_exists: bool) -> None:
        key = name.lower()
        with self._lock:
            data = self._load()
            if key not in data:
                if if_exists:
                    return
                raise PgError("42704", f'sequence "{name}" does not exist')
            del data[key]
            self._last.pop(key, None)
            self._save(data)

    def nextval(self, name: str, count: int = 1) -> int:
        """Reserve `count` consecutive values; return the FIRST. The new
        high-water mark is persisted before any value is returned."""
        key = name.lower()
        with self._lock:
            data = self._load()
            rec = data.get(key)
            if rec is None:
                raise PgError("42704", f'sequence "{name}" does not exist')
            first = rec["next"]
            rec["next"] = first + rec["inc"] * count
            self._save(data)
            self._last[key] = first + rec["inc"] * (count - 1)
            return first

    def increment_of(self, name: str) -> int:
        rec = self._load().get(name.lower())
        if rec is None:
            raise PgError("42704", f'sequence "{name}" does not exist')
        return rec["inc"]

    def currval(self, name: str) -> int:
        key = name.lower()
        if key not in self._load():
            raise PgError("42704", f'sequence "{name}" does not exist')
        if key not in self._last:
            raise PgError(
                "55000",
                f'currval: sequence "{name}" has not been used by nextval yet',
            )
        return self._last[key]


def parse_create(q: str):
    """→ (name, start, inc, if_not_exists) or None. Unsupported clauses
    (MINVALUE/MAXVALUE/CYCLE/…) fail the anchored regex and the caller
    raises loudly — never a silently ignored clause."""
    m = CREATE_SEQ.match(q)
    if m is None:
        return None
    start, inc = None, 1
    for om in _OPT.finditer(m.group("opts") or ""):
        if om.group(1).lower().startswith("start"):
            start = int(om.group(2))
        else:
            inc = int(om.group(2))
    if start is None:
        start = 1 if inc > 0 else -1  # DuckDB: descending default start
    return m.group("name"), start, inc, bool(m.group("ine"))


def resolve_calls(q: str, masked: str, store: SequenceStore) -> str:
    """Replace every nextval('s')/currval('s') call with its reserved
    value (one reservation per occurrence — exactly one row-cell in a
    VALUES list or a FROM-less select). Non-literal arguments raise
    0A000 loudly."""
    from duck_server_spark.plans.rewrites import _scan_balanced

    out, pos = [], 0
    while True:
        m = SEQ_FN.search(masked, pos)
        if m is None:
            out.append(q[pos:])
            return "".join(out)
        end = _scan_balanced(masked, m.end())
        arg = q[m.end() : end - 1]
        am = _ARG.match(arg)
        if am is None:
            raise PgError(
                "0A000",
                f"{m.group(1)} requires a string-literal sequence name; "
                f"got: {arg.strip()[:50]}",
            )
        fn = m.group(1).lower()
        val = store.nextval(am.group(1)) if fn == "nextval" else store.currval(am.group(1))
        out.append(q[pos : m.start()])
        out.append(str(val))
        pos = end
