"""Shared test fixtures: one SparkSession per test session + a DuckDB
oracle comparator that mimics the driver's t2 gate (row count + schema +
order-insensitive value comparison, columns sorted by name)."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from duck_server_spark.engine.session import get_session

    s = get_session("duck_server_spark_tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _norm_cell(v):
    """Normalize a value for cross-engine comparison."""
    import datetime
    import decimal

    import numpy as np

    if v is None:
        return None
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, np.generic):
        return _norm_cell(v.item())
    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    return v


def rows_of(pdf):
    cols = sorted(pdf.columns)
    out = []
    for row in pdf[cols].itertuples(index=False, name=None):
        out.append(tuple(_norm_cell(v) for v in row))
    return sorted(out, key=repr)


def assert_matches_oracle(spark, duck, fn, sql, sf_dir=SF_DIR, float_tol=0.0):
    """Run the Spark builder and the DuckDB oracle SQL; compare like the
    driver: row count, sorted-by-name columns, order-insensitive values.

    float_tol=0.0 demands bit-exact floats (what the driver's value hash
    effectively demands) — keep operators designed so this holds.
    """
    sdf = fn(spark, sf_dir)
    spark_pdf = sdf.toPandas()
    duck_pdf = duck.execute(sql).fetchdf()

    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"column mismatch: spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}"
    )
    assert len(spark_pdf) == len(duck_pdf), (
        f"row count mismatch: spark={len(spark_pdf)} duck={len(duck_pdf)}"
    )
    # the driver's value hash is string-based — dtype differences (e.g.
    # float32 vs float64 arrays) change rendering even when values match,
    # so compare the string form too.
    scols = sorted(spark_pdf.columns)
    s_str = sorted(spark_pdf[scols].astype(str).itertuples(index=False, name=None))
    d_str = sorted(duck_pdf[scols].astype(str).itertuples(index=False, name=None))
    if not float_tol:
        assert s_str == d_str, (
            "string-render mismatch (dtype or formatting): "
            + repr([(a, b) for a, b in zip(s_str, d_str) if a != b][:3])
        )
    srows, drows = rows_of(spark_pdf), rows_of(duck_pdf)
    mismatches = []
    for i, (a, b) in enumerate(zip(srows, drows)):
        if a == b:
            continue
        if float_tol and len(a) == len(b):
            ok = True
            for x, y in zip(a, b):
                if x == y:
                    continue
                if isinstance(x, float) and isinstance(y, float) and abs(x - y) <= float_tol * max(1.0, abs(x), abs(y)):
                    continue
                ok = False
                break
            if ok:
                continue
        mismatches.append((i, a, b))
        if len(mismatches) >= 5:
            break
    assert not mismatches, f"value mismatches (spark vs duck): {mismatches}"
