"""Operator registry.

Each module exports ``QUERIES: dict[name, (spark, sf_dir) -> DataFrame]``
and ``ORACLE: dict[name, sql]`` (oracle omitted for non-SQL-expressible
ops). ``all_queries`` / ``all_oracle_sql`` aggregate them for the driver
contract in ``__spark_entry__.py``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_MODULES = (
    "tpch",
    "relational",
    "aggregates",
    "windows",
    "scalars",
    "events_time",
    "llm_text",
    "dedup",
    "similarity",
)


def _modules():
    import importlib

    for m in _MODULES:
        yield importlib.import_module(f"duck_server_spark.operators.{m}")


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable] = {}
    for mod in _modules():
        for name, fn in mod.QUERIES.items():
            if name in out:
                raise ValueError(f"duplicate query name: {name}")
            out[name] = fn
    return out


def all_oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _modules():
        for name, sql in getattr(mod, "ORACLE", {}).items():
            out[name] = sql.strip()
    return out
