"""DuckDB's PRAGMA statement family (round 9, VERDICT r8 punch item 2).

DuckDB clients, ORMs and IDEs routinely send `PRAGMA table_info('t')`,
`PRAGMA show_tables`, `PRAGMA database_list`, `PRAGMA version` — the
reference forwards them verbatim to embedded DuckDB through its
delegation points (/root/reference/pg_conn.go:314,
/root/reference/ch_server.go:227). Spark has no PRAGMA verb, so the
statement shapes are re-served here from metadata the engine already
owns (catalog schema, the constraint registry, CURRENT_DEFAULT field
metadata) — a statement-shape shim, not new machinery. Output schemas
and values are pinned against live DuckDB 1.0 in tests/test_compat.py.

Unknown pragmas error with DuckDB's message shape ("Pragma Function
with name X does not exist!") — loud, never silently ignored.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from duck_server_spark.engine.errors import PgError

# `PRAGMA name`, `PRAGMA name(args)`, `PRAGMA name='value'` (DuckDB
# accepts all three spellings; the assignment form is config-setting)
_PRAGMA = re.compile(
    r"^\s*pragma\s+(?P<name>[A-Za-z_]\w*)\s*"
    r"(?:\(\s*(?P<args>[^)]*)\s*\)|=\s*(?P<val>.+?))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)

# DuckDB version the compat surface advertises everywhere else
# (server_version = "16.0-duckdb-1.0.0", engine/gucs.py — same pin the
# reference hard-codes at pg_conn.go:22). source_id identifies THIS
# engine honestly instead of impersonating a DuckDB build hash.
_LIBRARY_VERSION = "v1.0.0"
_SOURCE_ID = "duck_server_spark"


def _one_name_arg(name: str, args: str | None) -> str:
    if args is None or not args.strip():
        raise PgError(
            "42601", f"Pragma {name} requires a single table-name argument"
        )
    a = args.strip()
    # backticked segments appear when the global quoted-identifier
    # normalizer ran first — PRAGMA table_info("order") reaches here as
    # table_info(`order`) (review finding: the double-quote alternative
    # alone was dead code for exactly the names that need quoting)
    m = re.match(r"^'([^']*)'$|^\"([^\"]*)\"$|^([\w.`]+)$", a)
    if m is None:
        raise PgError("42601", f"invalid pragma argument: {a}")
    return (m.group(1) or m.group(2) or m.group(3)).replace("`", "").strip()


def run_pragma(engine, q: str) -> DataFrame | None:
    """Execute a PRAGMA statement; None when q isn't one."""
    m = _PRAGMA.match(q)
    if m is None:
        return None
    name = m.group("name").lower()
    spark = engine.spark
    if name == "table_info":
        return _table_info(engine, _one_name_arg(name, m.group("args")))
    if name == "show_tables":
        # same single-column catalog listing SHOW TABLES serves — one
        # code path, one filter policy (executor._user_table_names)
        names = engine._user_table_names()
        return spark.createDataFrame(
            [(n,) for n in names],
            T.StructType([T.StructField("name", T.StringType())]),
        )
    if name == "show_tables_expanded":
        return _show_tables_expanded(engine)
    if name == "database_list":
        # DuckDB's (seq, name, file): seq is an internal object id (not
        # stable across sessions even in DuckDB), name is the attached
        # database, file is NULL for in-memory — the shape clients key on
        return spark.createDataFrame(
            [(0, spark.catalog.currentDatabase(), None)],
            T.StructType(
                [
                    T.StructField("seq", T.IntegerType(), False),
                    T.StructField("name", T.StringType(), False),
                    T.StructField("file", T.StringType(), True),
                ]
            ),
        )
    if name == "version":
        return spark.createDataFrame(
            [(_LIBRARY_VERSION, _SOURCE_ID)],
            T.StructType(
                [
                    T.StructField("library_version", T.StringType(), False),
                    T.StructField("source_id", T.StringType(), False),
                ]
            ),
        )
    raise PgError(
        "42883", f"Catalog Error: Pragma Function with name {name} does not exist!"
    )


def _table_info(engine, table: str) -> DataFrame:
    """DuckDB's sqlite-heritage table_info shape: (cid, name, type,
    notnull, dflt_value, pk). notnull is True for PK columns too (PK
    implies NOT NULL — pinned vs live DuckDB); dflt_value is the
    declared default's SQL text as a string."""
    from duck_server_spark.engine.executor import _duckdb_type_name

    spark = engine.spark
    # keep a database qualifier intact — PRAGMA table_info('db.t') must
    # resolve in db, not strip to the bare name and hit the current
    # database's same-named table (round-10 advice finding). DuckDB's
    # own schema spelling 'main.t' (the schema_name this engine
    # advertises in duckdb_tables/duckdb_schemas) maps to the bare name
    # (review finding: treating 'main' as a Spark database 42P01'd the
    # canonical qualified probe); 'db.main.t' likewise drops 'main'.
    tbl = table.strip()
    parts = tbl.split(".")
    if len(parts) >= 2 and parts[-2].lower() == "main":
        tbl = ".".join(parts[:-2] + [parts[-1]])
    if not spark.catalog.tableExists(tbl):
        raise PgError(
            "42P01",
            f"Catalog Error: Table with name {tbl.split('.')[-1]} does not exist!",
        )
    schema = spark.table(tbl).schema
    # constraint registry keys follow the CREATE statement's spelling;
    # a `<current_db>.t` spelling of a table registered unqualified falls
    # back to the bare key — but ONLY for the current database, so a
    # same-named table elsewhere never inherits foreign constraints
    cons = engine.constraints.get(tbl)
    if not cons and "." in tbl:
        db, bare = tbl.rsplit(".", 1)
        if db.strip('`"').lower() == spark.catalog.currentDatabase().lower():
            cons = engine.constraints.get(bare)
    cons = cons or []
    pk = {c for cc in cons if cc["kind"] == "primary" for c in cc["cols"]}
    nn = {c for cc in cons if cc["kind"] == "notnull" for c in cc["cols"]}
    seqd = {
        cc["cols"][0]: f"nextval('{cc['seq']}')"
        for cc in cons
        if cc["kind"] == "seq_default"
    }
    rows = []
    for i, f in enumerate(schema.fields):
        dflt = seqd.get(f.name) or (
            f.metadata.get("CURRENT_DEFAULT") if isinstance(f.metadata, dict) else None
        )
        rows.append(
            (
                i,
                f.name,
                _duckdb_type_name(f.dataType),
                f.name in pk or f.name in nn,
                str(dflt) if dflt is not None else None,
                f.name in pk,
            )
        )
    return engine.spark.createDataFrame(
        rows,
        T.StructType(
            [
                T.StructField("cid", T.IntegerType(), False),
                T.StructField("name", T.StringType(), False),
                T.StructField("type", T.StringType(), False),
                T.StructField("notnull", T.BooleanType(), False),
                T.StructField("dflt_value", T.StringType(), True),
                T.StructField("pk", T.BooleanType(), False),
            ]
        ),
    )


def _show_tables_expanded(engine) -> DataFrame:
    """DuckDB's (database, schema, name, column_names, column_types,
    temporary) listing. Metadata-only: one catalog pass, no data jobs —
    at 100 TB this must stay O(tables), never O(rows)."""
    from duck_server_spark.engine.executor import _duckdb_type_name

    spark = engine.spark
    db = spark.catalog.currentDatabase()
    rows = []
    for n in engine._user_table_names():
        fields = spark.table(n).schema.fields
        rows.append(
            (
                db,
                "main",
                n,
                [f.name for f in fields],
                [_duckdb_type_name(f.dataType) for f in fields],
                False,
            )
        )
    return spark.createDataFrame(
        rows,
        T.StructType(
            [
                T.StructField("database", T.StringType(), False),
                T.StructField("schema", T.StringType(), False),
                T.StructField("name", T.StringType(), False),
                T.StructField("column_names", T.ArrayType(T.StringType()), False),
                T.StructField("column_types", T.ArrayType(T.StringType()), False),
                T.StructField("temporary", T.BooleanType(), False),
            ]
        ),
    )
