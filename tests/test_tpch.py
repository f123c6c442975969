"""Differential tests for the TPC-H-shaped flagship queries."""

import pytest

from duck_server_spark.operators import tpch
from tests.conftest import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(tpch.QUERIES))
def test_tpch_matches_oracle(spark, duck, sf_dir, name):
    assert_matches_oracle(spark, duck, tpch.QUERIES[name], tpch.ORACLE[name], sf_dir)


def test_decimal_sum_envelope_headroom(spark):
    """Round 14 (VERDICT r13 item 7): pin the DECIMAL(8,2) sum envelope
    so an SF bump or cast widening can't silently cross it.

    (a) sum over DECIMAL(8,2) accumulates in DECIMAL(18,2) — the
        compact-long path the r13 narrowing bought (widening the input
        cast would silently flip every sum back to 128-bit);
    (b) the envelope: q1's tightest per-group sum (plain
        sum(l_extendedprice), avg ≈ 3.8·10^4/row over ~1.5·10^11
        rows/group at SF 100k ≈ the 100 TB design point) reaches
        ~5.7·10^15 — inside the 10^16 accumulator with ~1.75× headroom,
        and ~2× past the design point it overflows;
    (c) overflow under this engine's ANSI mode FAILS LOUDLY (raises),
        never a silent NULL — so crossing the envelope is an error, not
        wrong data."""
    import pytest

    from duck_server_spark.operators.tpch import _dec

    # (a) accumulator class
    df = spark.range(1).select(_dec("id").alias("v")).agg({"v": "sum"})
    acc = df.schema[0].dataType.simpleString()
    assert acc == "decimal(18,2)", acc

    # (b) computed headroom at the 100 TB design point (SF ≈ 100k)
    capacity = 10**16  # decimal(18,2) integral digits
    avg_extendedprice = 3.8e4  # TPC-H spec: qty U[1,50] × price ~ U[0.9k,105k]/avg
    rows_per_group = 6_000_000 * 100_000 / 4  # lineitem SF 100k / 4 q1 groups
    headroom = capacity / (avg_extendedprice * rows_per_group)
    assert 1.5 < headroom < 3, headroom  # thin but inside; loud past it

    # (c) ANSI sum overflow raises (probed on a 38,2 input where two rows
    # suffice; the overflow check is the same Sum codepath as 18,2)
    assert spark.conf.get("spark.sql.ansi.enabled") == "true"
    big = "CAST(600000000000000000000000000000000000 AS DECIMAL(38,2))"
    with pytest.raises(Exception, match="NUMERIC_VALUE_OUT_OF_RANGE|overflow"):
        spark.sql(f"SELECT sum(v) FROM VALUES ({big}), ({big}) t(v)").collect()
