"""Differential tests for the TPC-H-shaped flagship queries."""

import pytest

from duck_server_spark.operators import tpch
from tests.conftest import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(tpch.QUERIES))
def test_tpch_matches_oracle(spark, duck, sf_dir, name):
    assert_matches_oracle(spark, duck, tpch.QUERIES[name], tpch.ORACLE[name], sf_dir)
