"""Differential tests for the relational / aggregate / window operator
modules (each QUERIES entry vs its ORACLE twin; oracle-less entries just
smoke-run)."""

import pytest

from duck_server_spark.operators import (
    aggregates,
    dedup,
    events_time,
    llm_text,
    relational,
    scalars,
    similarity,
    windows,
)
from tests.conftest import assert_matches_oracle

MODULES = {
    "relational": relational,
    "aggregates": aggregates,
    "windows": windows,
    "scalars": scalars,
    "events_time": events_time,
    "llm_text": llm_text,
    "dedup": dedup,
    "similarity": similarity,
}
CASES = [(mname, q) for mname, mod in sorted(MODULES.items()) for q in sorted(mod.QUERIES)]


@pytest.mark.parametrize("mname,name", CASES)
def test_operator(spark, duck, sf_dir, mname, name):
    mod = MODULES[mname]
    if name in mod.ORACLE:
        assert_matches_oracle(spark, duck, mod.QUERIES[name], mod.ORACLE[name], sf_dir)
    else:
        df = mod.QUERIES[name](spark, sf_dir)
        assert df.count() >= 0
