"""Direct codec round-trips for every registered ClickHouse format
(writer → bytes → reader → identical typed rows)."""

import pytest
from pyspark.sql import types as T

from duck_server_spark.sources import formats as fm

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("v", T.DoubleType()),
        T.StructField("ok", T.BooleanType()),
    ]
)
ROWS = [(1, "alpha", 1.5, True), (2, "be,ta", -2.0, False), (3, None, None, None)]


@pytest.mark.parametrize("fmt", ["TabSeparated", "CSV", "JSONEachRow"])
def test_roundtrip(fmt):
    payload = b"".join(fm.write_all(fm.WRITERS[fmt](SCHEMA), ROWS))
    back = list(fm.READERS[fmt](SCHEMA).read(payload))
    assert len(back) == 3
    assert back[0] == (1, "alpha", 1.5, True)
    # nulls survive (bool renders 1/0 in CH formats, reparsed as truthy)
    assert back[2][1] is None and back[2][2] is None


@pytest.mark.parametrize("fmt", ["TabSeparatedWithNames", "CSVWithNames"])
def test_roundtrip_with_names(fmt):
    payload = b"".join(fm.write_all(fm.WRITERS[fmt](SCHEMA), ROWS))
    first_line = payload.split(b"\n", 1)[0].decode()
    assert "id" in first_line and "name" in first_line
    back = list(fm.READERS[fmt](SCHEMA).read(payload))
    assert len(back) == 3 and back[0][0] == 1


def test_with_names_and_types_header():
    payload = b"".join(
        fm.write_all(fm.WRITERS["TabSeparatedWithNamesAndTypes"](SCHEMA), ROWS[:1])
    )
    lines = payload.decode().splitlines()
    assert lines[0] == "id\tname\tv\tok"
    assert lines[1] == "Int64\tString\tFloat64\tUInt8"


def test_tsv_escapes_embedded_tabs():
    rows = [(1, "a\tb\nc", 0.0, True)]
    payload = b"".join(fm.write_all(fm.WRITERS["TabSeparated"](SCHEMA), rows))
    assert payload == b"1\ta\\tb\\nc\t0.0\t1\n"


# ---------------------------------------------------------------------------
# Property-based round-trips (hypothesis): any string/number/null content
# must survive writer → bytes → reader for every bidirectional format.
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

# the literal string "\N" is indistinguishable from the NULL marker in
# SV formats — the REFERENCE has the same ambiguity (duckdb_types.go:88
# renders NULL as \N and strings verbatim), so it's excluded by design.
_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)),  # no lone surrogates
    max_size=60,
).filter(lambda s: s != "\\N")
_row = st.tuples(
    st.one_of(st.none(), st.integers(min_value=-(2**63), max_value=2**63 - 1)),
    st.one_of(st.none(), _text),
    st.one_of(st.none(), st.floats(allow_nan=False, allow_infinity=False, width=64)),
    st.one_of(st.none(), st.booleans()),
)


@settings(max_examples=60, deadline=None)
@given(rows=st.lists(_row, min_size=1, max_size=5))
@pytest.mark.parametrize("fmt", ["TabSeparated", "TabSeparatedWithNames", "CSV", "CSVWithNames", "JSONEachRow"])
def test_roundtrip_property(fmt, rows):
    payload = b"".join(fm.write_all(fm.WRITERS[fmt](SCHEMA), rows))
    back = list(fm.READERS[fmt](SCHEMA).read(payload))
    assert back == rows
