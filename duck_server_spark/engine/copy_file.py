"""COPY … TO/FROM '<file>' — DuckDB's file import/export statement.

The reference hands COPY-to-file straight to embedded DuckDB
(pg_conn.go:314 delegation; its own server only special-cases STDIN /
STDOUT). Formats: parquet, csv (± HEADER, DELIMITER), json (one object
per line — DuckDB's newline-delimited json). Format comes from the
(FORMAT …) option or the path extension.

Single-file contract: DuckDB writes ONE file at the given path; Spark
writes a directory of part files. The export coalesces to one partition
and moves the single part file to the target — honest parity: one
output file means one writer stream in DuckDB too (its PER_THREAD_OUTPUT
is the directory-of-parts mode, which is what a Spark user gets by just
writing the directory themselves). The row count rides the write job as
an Observation — no second pass.

Import routes through the same validated-append contract as INSERT/COPY
FROM STDIN: schema aligned to the target (column-list order respected),
declared defaults filled, PK/UNIQUE + row constraints checked against a
materialized batch, append under the commit mutex."""

from __future__ import annotations

import os
import re
import shutil
import tempfile

from pyspark.sql import functions as F

from duck_server_spark.engine.errors import PgError

COPY_FILE = re.compile(
    r"^\s*copy\s+(?:\(\s*(?P<query>.+)\s*\)|(?P<table>[\w.]+)"
    r"(?:\s*\((?P<cols>[^)]*)\))?)"
    r"\s+(?P<dir>to|from)\s+'(?P<path>[^']+)'(?P<opts>[^;]*);?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_FORMAT = re.compile(r"\bformat\s+(\w+)", re.IGNORECASE)
_HEADER = re.compile(r"\bheader(?:\s+(true|false|0|1))?", re.IGNORECASE)
_DELIM = re.compile(r"\bdelim(?:iter)?\s+'([^']+)'", re.IGNORECASE)


def _format_of(path: str, opts: str) -> str:
    m = _FORMAT.search(opts or "")
    if m:
        fmt = m.group(1).lower()
    else:
        ext = os.path.splitext(path)[1].lstrip(".").lower()
        fmt = {"pq": "parquet", "jsonl": "json", "ndjson": "json"}.get(ext, ext)
    if fmt not in ("parquet", "csv", "json"):
        raise PgError("0A000", f"COPY format not supported: {fmt or '(none)'}")
    return fmt


def _csv_options(opts: str, direction: str) -> dict:
    o: dict[str, str] = {}
    hm = _HEADER.search(opts or "")
    if hm and (hm.group(1) or "true").lower() in ("true", "1"):
        o["header"] = "true"
    dm = _DELIM.search(opts or "")
    if dm:
        o["sep"] = dm.group(1)
    if direction == "from":
        # parse timestamps/dates from text like DuckDB's reader does
        o["inferSchema"] = "false"  # schema comes from the target table
    return o


def run_copy_file(engine, q: str) -> str | None:
    """Execute a COPY-to/from-file statement; None when q isn't one.
    STDIN/STDOUT forms never match (the path must be a quoted literal)."""
    m = COPY_FILE.match(q)
    if m is None:
        return None
    path, opts, direction = m.group("path"), m.group("opts") or "", m.group("dir").lower()
    fmt = _format_of(path, opts)
    spark = engine.spark
    if direction == "to":
        if m.group("query"):
            df = spark.sql(engine._prepare_sql(m.group("query"), "pg"))
            df = engine._strip_asof_helpers(df)
        else:
            df = spark.table(m.group("table"))
            if m.group("cols"):
                df = df.select(
                    *[c.strip().strip('`"') for c in m.group("cols").split(",")]
                )
        from pyspark.sql import Observation

        obs = Observation()
        df = df.observe(obs, F.count(F.lit(1)).alias("n"))
        tmp = tempfile.mkdtemp(prefix="copyout_", dir=os.path.dirname(path) or ".")
        try:
            w = df.coalesce(1).write.mode("overwrite")
            if fmt == "csv":
                w = w.options(**_csv_options(opts, "to"))
            w.format(fmt).save(tmp)
            part = next(
                f for f in os.listdir(tmp) if f.startswith("part-")
            )
            shutil.move(os.path.join(tmp, part), path)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
        return f"COPY {int(obs.get['n'] or 0)}"
    # COPY table FROM 'file': read with the TARGET's schema authority
    table = m.group("table")
    if table is None:
        raise PgError("42601", "COPY (query) FROM a file is not valid")
    names = (
        [c.strip().strip('`"') for c in m.group("cols").split(",")]
        if m.group("cols")
        else None
    )
    full = spark.table(table).schema
    if fmt == "parquet":
        src = spark.read.parquet(path)
    elif fmt == "json":
        src = spark.read.json(path)
    else:
        read_names = names or [f.name for f in full.fields]
        from pyspark.sql import types as T

        csv_schema = T.StructType(
            [f for n in read_names for f in full.fields if f.name == n]
        )
        src = spark.read.options(**_csv_options(opts, "from")).schema(
            csv_schema
        ).csv(path)
    src = engine._align_to_schema(src, full, names)
    staged = src.localCheckpoint(eager=True)
    try:
        from duck_server_spark.engine import constraints as cst

        cst.validate_append(
            spark, table, staged, engine.constraints.get(table), engine.constraints
        )
        n = staged.count()
        from duck_server_spark.engine.transactions import _COMMIT_MUTEX

        with _COMMIT_MUTEX:
            staged.write.mode("append").saveAsTable(table)
        return f"COPY {n}"
    finally:
        try:
            staged.rdd.unpersist(False)
        except Exception:  # noqa: BLE001 — cleanup best-effort
            pass
