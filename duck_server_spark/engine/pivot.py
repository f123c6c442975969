"""DuckDB's simplified PIVOT statement → Spark's SQL-standard PIVOT
clause (which DuckDB also accepts, but clients use the short form:
/root/reference delegates the statement to embedded DuckDB wholesale).

    PIVOT tbl ON col [IN (v1, …)] [USING agg [AS a], …] [GROUP BY g, …]

Spark's PIVOT clause needs a static IN list, so the distinct pivot
values are discovered first — the same two-phase shape DuckDB itself
runs (its PIVOT is sugar over an ENUM scan + CASE aggregation).

DuckDB semantics pinned live in tests/test_compat.py:
- pivot columns = distinct non-NULL values, sorted ascending (NULL
  cells never mint a column; their rows still group)
- no USING → count(*), and missing combos read 0 (not NULL)
- no GROUP BY → implicit group over every remaining column (Spark's
  PIVOT clause has identical implicit grouping)
- multiple aggregates name columns `value_alias` (same scheme both)

Scale: value discovery is driver-side by necessity (column NAMES cannot
be data-dependent in a distributed plan otherwise) and capped at 10k —
a pivot wider than that is a modeling error at any scale, and DuckDB's
own pivot_limit defaults to 100k. The pivoted aggregation itself is one
hash-aggregate shuffle on the group keys, exactly the manual
groupBy().pivot() plan."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duck_server_spark.plans import rewrites

PIVOT_STMT = re.compile(
    r"^\s*pivot\s+([\w.`\"]+)\s+on\s+(.+?)"
    r"(?:\s+using\s+(.+?))?(?:\s+group\s+by\s+(.+?))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_PIVOT_ON = re.compile(
    r"^([\w`\"]+)\s*(?:in\s*\((.+)\))?\s*$", re.IGNORECASE | re.DOTALL
)


def _split_commas(s: str) -> list[str]:
    # the shared literal-masked top-level splitter (review finding: a
    # duplicate here didn't mask literals, so an IN value like 'a,b'
    # would split mid-string)
    return rewrites._split_top_level(s, rewrites._mask_literals(s))


def run_pivot(
    spark: SparkSession,
    table: str,
    on: str,
    using: str | None,
    group_by: str | None,
) -> DataFrame:
    from duck_server_spark.engine.errors import PgError

    om = _PIVOT_ON.match(on.strip())
    if om is None:
        raise PgError(
            "0A000",
            "PIVOT ON expressions/multiple columns are not supported; "
            "use a single column (optionally with IN (…))",
        )
    col = om.group(1).strip().strip('`"')
    tbl_cols = [f.name for f in spark.table(table).schema.fields]
    if col not in tbl_cols:
        # case-insensitive resolution like duck's (round 12, found by
        # the mutation sweep: an uppercased statement's ON column must
        # still match the stored-case source column)
        ci = [c for c in tbl_cols if c.lower() == col.lower()]
        if len(ci) != 1:
            raise PgError("42703", f'column "{col}" not found in "{table}"')
        col = ci[0]
    if om.group(2):
        raw = [v.strip() for v in _split_commas(om.group(2))]
        pairs = [(v, v.strip("'\"")) for v in raw]
    else:
        vals = [
            r[0]
            for r in spark.table(table)
            .select(f"`{col}`")
            .where(F.col(col).isNotNull())
            .distinct()
            .limit(10001)
            .collect()
        ]
        if len(vals) > 10000:
            raise PgError(
                "54000", f'pivot column "{col}" exceeds 10000 distinct values'
            )
        name_of = (
            lambda v: ("true" if v else "false") if isinstance(v, bool) else str(v)
        )
        pairs = [(rewrites.render_literal(v), name_of(v)) for v in sorted(vals)]
    default_count = using is None
    aggs_sql = using.strip() if using else "count(1)"
    agg_items = _split_commas(aggs_sql)
    if group_by is not None:
        # restrict the implicit grouping: project group cols + pivot col
        # + the agg expressions' source columns
        gb_cols = [g.strip().strip('`"') for g in group_by.split(",")]
        ident_rx = re.compile(r"[A-Za-z_]\w*")
        gb_lower = {g.lower() for g in gb_cols}
        src_cols = [
            c
            for c in tbl_cols
            if c.lower() not in gb_lower
            and c.lower() != col.lower()
            and any(
                c.lower() == t.lower()
                for it in agg_items
                for t in ident_rx.findall(it)
            )
        ]
        proj = ", ".join(f"`{c}`" for c in [*gb_cols, col, *src_cols])
        source = f"(SELECT {proj} FROM {table})"
    else:
        source = table
    in_list = ", ".join(f"{lit} AS `{name}`" for lit, name in pairs)
    df = spark.sql(
        f"SELECT * FROM {source} PIVOT ({aggs_sql} FOR `{col}` IN ({in_list}))"
    )
    if default_count:
        # DuckDB's default count pivot reads 0 for missing combos;
        # Spark's pivot cell over an empty group is NULL
        keep = [c for c in df.columns if c not in {n for _, n in pairs}]
        df = df.select(
            *[F.col(f"`{c}`") for c in keep],
            *[F.coalesce(F.col(f"`{n}`"), F.lit(0)).alias(n) for _, n in pairs],
        )
    return df


def pivot_statement(spark: SparkSession, q: str) -> DataFrame | None:
    """Run q when it is a simplified-PIVOT statement, else None."""
    m = PIVOT_STMT.match(q)
    if m is None:
        return None
    return run_pivot(spark, *m.groups())
