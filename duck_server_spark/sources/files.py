"""File source/sink functions: the DuckDB file-function surface
(`read_csv` / `read_parquet` / `read_json`, `COPY … TO`) re-expressed as
Spark readers/writers.

Reference parity: SURVEY.md §2B "Scans / sources / sinks" — DuckDB 1.0
core file functions reachable through the delegation points ([duck]
tier). The SQL-facing spellings are provided as table-function-style
helpers; the engine's front-end maps `read_csv('p')` etc. onto these.

Scale notes:
- Readers return lazy DataFrames — pushdown/pruning reach the file scan
  (parquet natively; csv/json get column pruning + partition-file
  parallelism).
- Writers default to snappy parquet with per-partition files; callers
  pick partition columns for layout (`partition_by`), the single-file
  convenience path coalesces explicitly and is documented as the
  driver-bottleneck variant you do NOT use at scale.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

_READ_FN = re.compile(
    r"\b(read_csv_auto|read_csv|read_parquet|read_json_auto|read_json|parquet_scan)\s*\(\s*'([^']+)'\s*\)",
    re.IGNORECASE,
)


def read_csv(spark: SparkSession, path: str, header: bool = True, infer: bool = True) -> DataFrame:
    return (
        spark.read.option("header", str(header).lower())
        .option("inferSchema", str(infer).lower())
        .csv(path)
    )


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_json(spark: SparkSession, path: str) -> DataFrame:
    # JSONL (one object per line) — the shape DuckDB's read_json defaults
    # to for newline-delimited files
    return spark.read.json(path)


def copy_to(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_by: list[str] | None = None,
    single_file: bool = False,
    header: bool = True,
) -> None:
    """`COPY (query) TO 'path' (FORMAT fmt)` analogue.

    single_file=True coalesces to 1 task — convenient for small exports,
    a deliberate anti-pattern at scale (documented, not default)."""
    out = df.coalesce(1) if single_file else df
    writer = out.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "parquet":
        writer.parquet(path)
    elif fmt == "csv":
        writer.option("header", str(header).lower()).csv(path)
    elif fmt == "json":
        writer.json(path)
    else:
        raise ValueError(f"unsupported COPY format: {fmt}")


def rewrite_file_functions(q: str) -> str:
    """Front-end shim: DuckDB table functions in FROM clauses →
    Spark path-scan syntax (`parquet.`/`csv.`/`json.` file relations)."""

    def repl(m: re.Match) -> str:
        fn, path = m.group(1).lower(), m.group(2)
        if "parquet" in fn:
            return f"parquet.`{path}`"
        if "csv" in fn:
            return f"csv.`{path}`"
        return f"json.`{path}`"

    return _READ_FN.sub(repl, q)
