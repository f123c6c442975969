"""Round-10 scalar/aggregate shim registry (plans/fn_shims.py), every
template pinned value-for-value against live DuckDB. One battery, one
canonicalizer — a new shim is done when its probe rows land here."""

from __future__ import annotations

import math

import pytest


@pytest.fixture(scope="module")
def eng(spark):
    from duck_server_spark.engine.executor import Engine

    return Engine(spark)


def _norm(v):
    if isinstance(v, float):
        return "nan" if math.isnan(v) else f"{v:.6g}"
    if isinstance(v, dict):
        # duckdb-python renders a MAP as {'key': [...], 'value': [...]}
        if set(v) == {"key", "value"} and isinstance(v.get("key"), list):
            return str(sorted(zip(map(_norm, v["key"]), map(_norm, v["value"]))))
        return str(sorted((_norm(k), _norm(x)) for k, x in v.items()))
    if hasattr(v, "asDict"):  # Spark Row: structs (named) vs duck tuples
        d = v.asDict()
        if all(k.startswith(("list_", "col")) or k.isdigit() for k in d):
            return str([_norm(x) for x in d.values()])
        return str(sorted((k, _norm(x)) for k, x in d.items()))
    if isinstance(v, (list, tuple)):
        return str([_norm(x) for x in v])
    s = str(v)
    return s[:-9] if s.endswith(" 00:00:00") else s


def _canon(rows):
    return sorted(tuple(_norm(v) for v in r) for r in rows)


BATTERY = [
    # strings
    "SELECT sha256('x') AS a, to_base(255, 16) AS b, unicode('€') AS c",
    "SELECT parse_filename('/a/b/c.txt') AS a, parse_dirname('/a/b/c.txt') AS b",
    "SELECT parse_path('/a/b/c.txt') AS a, parse_path('rel/x') AS b",
    "SELECT strpos('hello', 'll') AS a",
    # math
    "SELECT even(2) AS a, even(2.5) AS b, even(-2.5) AS c, even(3) AS d",
    "SELECT signbit(-0.0) AS a, signbit(1.5) AS b, signbit(-2) AS c",
    "SELECT xor(5, 3) AS a, xor(0, 7) AS b",
    "SELECT divide(7, 2) AS a, fdiv(-7, 2) AS b, fmod(-7, 3) AS c, fmod(7.5, -2) AS d",
    "SELECT isfinite(1.5) AS a, isinf(1.5) AS b",
    # date/time
    "SELECT epoch(TIMESTAMP '1970-01-01 00:00:01.5') AS a, "
    "epoch_us(TIMESTAMP '1970-01-01 00:00:01') AS b, "
    "epoch_ns(TIMESTAMP '1970-01-01 00:00:01') AS c",
    "SELECT isoyear(DATE '2021-01-01') AS a, isoyear(DATE '2021-01-04') AS b",
    "SELECT monthname(DATE '2024-02-10') AS a, dayname(DATE '2024-02-12') AS b",
    "SELECT extract(dow FROM DATE '2024-01-07') AS a, "
    "extract(isodow FROM DATE '2024-01-07') AS b, "
    "extract(isoyear FROM DATE '2021-01-01') AS c, "
    "extract(dayofweek FROM DATE '2024-01-08') AS d",
    "SELECT time_bucket(INTERVAL '15 minutes', TIMESTAMP '2024-01-01 00:37:00') AS a, "
    "time_bucket(INTERVAL '1 week', DATE '2024-05-15') AS b, "
    "time_bucket(INTERVAL '2 months', DATE '2024-05-15') AS c",
    "SELECT date_part(['year', 'month'], DATE '2024-05-06') AS a",
    # lists / maps
    "SELECT list_zip([1, 2], [3, 4, 5]) AS a",
    "SELECT map_extract(MAP {'k': 5}, 'k') AS a, map_extract(MAP {'k': 5}, 'z') AS b",
    "SELECT map(['a', 'b'], [10, 20])['b'] IS NOT NULL AS a",
    # duck-1.0 map subscript shape (round 11): [v] / [] / NULL key → []
    "SELECT (MAP {'k': 5})['k'] AS a, (MAP {'k': 5})['z'] AS b, "
    "map(['a', 'b'], [10, 20])['b'] AS c, map([1, 2], [10, 20])[2] AS d, "
    "(MAP {'k': 5})[NULL] AS e",
    "SELECT list_transform([10, 20], (x, i) -> x + i) AS a, "
    "list_filter([10, 20, 30], (x, i) -> i > 1) AS b",
    # aggregates
    "SELECT product(x) AS a FROM (SELECT unnest([1.0, 2, 4]) x)",
    "SELECT product(x) AS a FROM (SELECT CAST(NULL AS DOUBLE) x)",
    "SELECT entropy(x) AS a FROM (SELECT unnest([1, 1, 2, 3]) x)",
    "SELECT histogram(x) AS a FROM (SELECT unnest([2, 1, 1]) x)",
    "SELECT mad(x) AS a FROM (SELECT unnest([1, 2, 3, 10]) x)",
    "SELECT mad(x) AS a FROM (SELECT unnest([1, 2, 3]) x)",
    "SELECT quantile_disc(x, 0.25) AS a, quantile_disc(x, 0.0) AS b, "
    "quantile_disc(x, 1.0) AS c, quantile(x, 0.5) AS d "
    "FROM (SELECT unnest([3, 1, 2, 4]) x)",
    "SELECT quantile_disc(x, 0.4) AS a FROM (SELECT unnest([5, 1, 3, 2, 4]) x)",
    "SELECT quantile_cont(x, 0.25) AS a, quantile_cont(x, [0.25, 0.75]) AS b "
    "FROM (SELECT unnest([1, 2, 3, 4]) x)",
    "SELECT round(kurtosis(x), 6) AS a FROM (SELECT unnest([1.0, 2, 3, 4]) x)",
    "SELECT kurtosis(x) AS a FROM (SELECT unnest([1.0, 2, 3]) x)",
    "SELECT round(skewness(x), 6) AS a FROM (SELECT unnest([1.0, 2, 4, 8]) x)",
    "SELECT round(kurtosis_pop(x), 6) AS a FROM (SELECT unnest([1.0, 2, 3, 4]) x)",
    "SELECT favg(x) AS a, fsum(x) AS b FROM (SELECT unnest([1.0, 2, 3]) x)",
    "SELECT count() AS a, count(t.*) AS b FROM (SELECT 1 UNION ALL SELECT NULL) t(c)",
    # regex
    "SELECT regexp_extract('ab12', '[0-9]+') AS a",
    "SELECT regexp_extract('ab12', '(?P<L>[a-z]+)(?P<D>[0-9]+)', ['L', 'D']) AS a",
    "SELECT regexp_extract_all('a1b2', '[0-9]') AS a",
    "SELECT regexp_replace('aaa', 'a', 'b') AS a, "
    "regexp_replace('aaa', 'a', 'b', 'g') AS b",
    "SELECT regexp_replace('abab', '(a)(b)', '\\2\\1') AS a, "
    "regexp_replace('abab', '(a)(b)', '\\2\\1', 'g') AS b",
    "SELECT regexp_replace('AAA', 'a', 'b', 'gi') AS a, "
    "regexp_replace('no-match', 'zz', 'y') AS b",
    # misc
    "SELECT format('{} x {}', 1, 'b') AS a, format('{1}-{0}', 'a', 'b') AS b, "
    "format('{{}} {}', 9) AS c",
    "SELECT alias(42) IS NOT NULL AS a",
    # type-spelling tail + typeof + the pandas-UDF tier
    "SELECT 200::UTINYINT AS a, 40000::USMALLINT AS b",
    "SELECT 'a0eebc99-9c0b-4ef8-bb6d-6bb9bd380a11'::UUID AS a",
    "SELECT 'happy'::ENUM('sad', 'ok', 'happy') AS a",
    "SELECT typeof(1::SMALLINT) AS a, typeof(1) AS b, "
    "typeof(1.5::DOUBLE) AS c, typeof(CAST(1.5 AS DECIMAL(10,2))) AS d, "
    "typeof('x') AS e, typeof(DATE '2024-01-01') AS f",
    "SELECT round(gamma(5), 6) AS a, round(lgamma(5), 6) AS b",
    "SELECT strip_accents('âéö') AS a, nfc_normalize('ö') = 'ö' AS b",
    "SELECT setseed(0.5) AS a",
    "SELECT txid_current() >= 0 AS a",
    # ADVICE r10: a shimmed call nested inside another shimmed call's
    # ARGUMENTS must be converted too — duck's first-match-only inner
    # regexp_replace / group-0 2-arg regexp_extract must not silently
    # take Spark's global-replace / group-1 defaults
    "SELECT regexp_replace(regexp_replace('aaa', 'a', 'b'), 'a', 'c') AS a",
    "SELECT strpos(regexp_replace('aaa', 'a', 'b'), 'b') AS a, "
    "strpos(regexp_extract('ab12', '[0-9]+'), '2') AS b",
    "SELECT even(strpos('hello', 'l')) AS a, "
    "list_zip(regexp_extract_all('a1b2', '[0-9]'), ['x']) AS b",
]


SHAPES = [
    # numeric underscores / CTE materialization hints
    "SELECT 1_000_000 AS a, 1_500.5 AS b",
    "WITH c AS MATERIALIZED (SELECT 1 AS x) SELECT * FROM c",
    "WITH c AS NOT MATERIALIZED (SELECT 1 AS x) SELECT * FROM c",
    # list comprehensions
    "SELECT [x * 2 FOR x IN [1, 2, 3] IF x > 1] AS a",
    "SELECT [x + 1 FOR x IN [1, 2]] AS a",
    # ORDER BY inside aggregate args
    "SELECT list(x ORDER BY y) AS a, list(x ORDER BY y DESC) AS b, "
    "any_value(x ORDER BY y) AS c, first(x ORDER BY y DESC) AS d, "
    "last(x ORDER BY y) AS e FROM (VALUES (1, 30), (2, 10), (3, 20)) t(x, y)",
    "SELECT array_agg(x ORDER BY y, x) AS a "
    "FROM (VALUES (1, 10), (2, 10), (3, 5)) t(x, y)",
    "SELECT list(x) AS a FROM (VALUES (3), (1)) t(x)",
    # FILTER over a window
    "SELECT x, count(*) FILTER (x > 1) OVER (ORDER BY x) AS a, "
    "sum(x) FILTER (WHERE x <> 2) OVER (ORDER BY x) AS b "
    "FROM (VALUES (1), (2), (3)) t(x) ORDER BY x",
    # window frame EXCLUDE CURRENT ROW
    "SELECT x, sum(x) OVER (ORDER BY x ROWS BETWEEN 1 PRECEDING AND 1 "
    "FOLLOWING EXCLUDE CURRENT ROW) AS a, count(*) OVER (ORDER BY x ROWS "
    "BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW EXCLUDE CURRENT ROW) AS b, "
    "avg(x) OVER (ORDER BY x ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING "
    "EXCLUDE CURRENT ROW) AS c FROM (VALUES (1), (2), (3), (4)) t(x) ORDER BY x",
    # multi-unnest ZIP (pads with NULL), struct-unnest, recursive unnest
    "SELECT unnest([1, 2, 3]) AS u, unnest([10, 20]) AS v",
    "SELECT unnest({'a': 1, 'b': 'x'})",
    "SELECT unnest([[1, 2], [3]], recursive := true) AS u",
    "SELECT unnest([{'a': 1}, {'a': 2}], recursive := true)",
    "SELECT 'k' AS tag, unnest([1, 2]) AS a, unnest([4, 5, 6]) AS b",
    # repeat()/glob() table functions
    "SELECT count(*) AS c FROM repeat('x', 5)",
    "SELECT * FROM repeat('x', 2)",
    "SELECT file FROM glob('/root/testdata/sf0.001/r*.parquet')",
    # DESCRIBE as a FROM relation
    "SELECT count(*) AS c FROM (DESCRIBE SELECT 1 AS x)",
    # quantified comparisons over LIST arguments
    "SELECT 2 = ANY([1, 2, 3]) AS a, 9 = ANY([1, 2]) AS b, "
    "3 > ANY([1, 5]) AS c, 3 = ALL([3, 3]) AS d, 1 = ALL([1, 2]) AS e",
    "SELECT row(1, 'x') IS NOT NULL AS a",
    "SELECT unnest([{'a': 1}, {'a': 2}], recursive := true) ORDER BY 1",
    "SELECT extract(epoch FROM TIMESTAMP '2024-01-02 03:04:05.25') AS a",
    # review-round fixes, each pinned: NULLS LAST default in ordered
    # aggregates (incl. the NULL-key row last() must return), explicit
    # NULLS FIRST, mixed directions in list(); FILTER over a 2-arg
    # window aggregate (excluded rows must not contribute their KEY);
    # EXCLUDE CURRENT ROW on an empty remaining frame → NULL
    "SELECT list(x ORDER BY y) AS a, last(x ORDER BY y) AS b, "
    "first(x ORDER BY y) AS c "
    "FROM (VALUES (1, 30), (2, NULL), (3, 10)) t(x, y)",
    "SELECT list(x ORDER BY y NULLS FIRST) AS a, "
    "first(x ORDER BY y NULLS FIRST) AS b "
    "FROM (VALUES (1, 30), (2, NULL), (3, 10)) t(x, y)",
    "SELECT list(x ORDER BY y DESC, z ASC) AS a "
    "FROM (VALUES (1, 5, 'b'), (2, 5, 'a'), (3, 9, 'c')) t(x, y, z)",
    "SELECT arg_max(x, y) FILTER (x <> 1) OVER () AS a "
    "FROM (VALUES (1, 30), (2, 20), (3, 10)) t(x, y) LIMIT 1",
    "SELECT x, sum(x) OVER (ORDER BY x ROWS BETWEEN 1 PRECEDING AND "
    "CURRENT ROW EXCLUDE CURRENT ROW) AS s "
    "FROM (VALUES (1), (2)) t(x) ORDER BY x",
    # comments must not desynchronize the literal pass
    "SELECT regexp_matches('a1', '\\d') AS a, -- don't strip\n"
    "  regexp_matches('b2', '\\d') AS b",
    # keyword-looking text inside dollar-quoted DATA stays data
    "SELECT $$take LIMIT 5% off$$ AS s",
    "SELECT $$a union all by name b$$ AS s",
    # JSON extraction arrows: -> keeps JSON (quoted string leaves),
    # ->> extracts TEXT; integer keys are 0-based array indexes;
    # chains, ::JSON casts, quoted keys, missing keys
    'SELECT \'{"a": {"b": 2}}\'::JSON->\'a\'->>\'b\' AS x',
    'SELECT \'{"a": "s"}\'::JSON->\'a\' AS x, \'{"a": 1}\'->>\'a\' AS y',
    "SELECT '[5,6]'::JSON->>1 AS x",
    'SELECT \'{"k v": 3}\'::JSON->>\'k v\' AS x, '
    '\'{"a": 9}\'::JSON->>\'zz\' IS NULL AS y',
    # lambda arrows stay lambdas next to JSON arrows
    'SELECT list_transform([1, 2], x -> x + 1) AS lam, '
    "'{\"a\":2}'->>'a' AS jt",
    # round-10 batch-2 alias tail
    "SELECT list_apply([1, 2], x -> x * 2) AS a, list_cat([1], [2]) AS b, "
    "array_cat([3], [4]) AS c",
    "SELECT prefix('hello', 'he') AS a, suffix('hello', 'lo') AS b, "
    "starts_with('ab', 'a') AS c, ends_with('ab', 'b') AS d",
    "SELECT ord('A') AS a, to_hex(255) AS b, len('abc') AS c, "
    "ucase('ab') AS d, lcase('AB') AS e",
    "SELECT gen_random_uuid() IS NOT NULL AS a",
    "SELECT string_to_array('a.b.c', '.') AS a, string_to_array('x,y', ',') AS b",
    "SELECT list_resize([1, 2], 4) AS a, list_resize([1, 2, 3], 2) AS b",
    "SELECT array_pop_back([1, 2, 3]) AS a, array_pop_front([1, 2, 3]) AS b",
    "SELECT list_select([10, 20, 30], [1, 3]) AS a, "
    "list_where([1, 2, 3], [true, false, true]) AS b",
    "SELECT grade_up([30, 10, 20]) AS a",
    # second review pass: NULL values rank LAST in grade_up, OOB gather
    # yields NULL, whitespace-tolerant :: casts, constant lambda bodies
    # in alias spellings stay lambdas, literal window-FILTER parameters
    # stay foldable
    "SELECT grade_up([NULL, 10, 5]) AS a, list_select([1, 2], [5]) AS b",
    "SELECT '{\"a\":1}' :: JSON ->> 'a' AS x",
    "SELECT list_apply([1, 2], x -> 2) AS a",
    "SELECT x, string_agg(CAST(x AS VARCHAR), ',') FILTER (x > 1) "
    "OVER (ORDER BY x) AS a FROM (VALUES (1), (2), (3)) t(x) ORDER BY x",
    "SELECT quantile_cont(x, 0.5) FILTER (x > 1) OVER () AS a "
    "FROM (VALUES (1), (2), (3)) t(x) LIMIT 1",
    # frame EXCLUDE TIES / GROUP via peers-frame arithmetic (peers =
    # RANGE CURRENT ROW AND CURRENT ROW; exact when the frame contains
    # the whole peer group — RANGE mode or full-partition ROWS)
    "SELECT x, sum(x) OVER (ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING "
    "AND UNBOUNDED FOLLOWING EXCLUDE TIES) AS t, sum(x) OVER (ORDER BY k "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING "
    "EXCLUDE GROUP) AS g FROM (VALUES (1, 10), (2, 10), (3, 20)) v(x, k) "
    "ORDER BY x",
    "SELECT x, sum(x) OVER (ORDER BY k RANGE BETWEEN UNBOUNDED PRECEDING "
    "AND CURRENT ROW EXCLUDE GROUP) AS g, count(*) OVER (ORDER BY k "
    "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW EXCLUDE TIES) AS c "
    "FROM (VALUES (1, 10), (2, 10), (3, 20), (4, 20)) v(x, k) ORDER BY x",
    # string-LITERAL subscripts take duck's 1-based substring semantics
    "SELECT ('abcde')[2] AS a, ('abcde')[2:4] AS b, 'xyz'[1] AS c, "
    "'xyz'[2:] AS d, upper('ab'[1]) AS e",
    # embedding math: cosine (zero-norm -> -1 like duck), dot, L2
    "SELECT list_cosine_similarity([1.0, 2], [2.0, 4]) AS a, "
    "list_inner_product([1.0, 2], [3.0, 4]) AS b, "
    "list_dot_product([1.0, 2], [3.0, 4]) AS c, "
    "list_distance([1.0, 2], [4.0, 6]) AS d",
    "SELECT list_cosine_similarity([1.0], [0.0]) AS a, "
    "list_cosine_similarity([0.0], [0.0]) AS b",
    "SELECT array_sort(list_intersect([1, 2, 3], [2, 3, 4])) AS a",
    "SELECT list_grade_up([3, 1, 2]) AS a, list_grade_up([3, NULL, 2]) AS b",
    # third review pass: NULL args -> NULL (not -1), NULL-dropping
    # intersect, 0-start subscripts/slices, ''-bearing literal bases
    "SELECT list_cosine_similarity(NULL, [1.0, 2.0]) IS NULL AS a",
    "SELECT list_intersect([1, NULL, 2], [NULL, 2]) AS a",
    "SELECT 'abcde'[0:2] AS a, 'abc'[0] AS b, [1, 2, 3][0:2] AS c, "
    "'it''s'[2] AS d",
    # ADVICE r10: '::' cast-type scan must stop at a depth-0 comma /
    # close-paren — the right operand of ^ with a cast, in an
    # expression list and with a parameterized type
    "SELECT 2 ^ 3::INT AS a, 5 AS c",
    "SELECT 2 ^ 2::DECIMAL(10, 2) AS a",
    "SELECT round(2 ^ CAST(2.5 AS DECIMAL(10, 2)), 4) AS a, 7 AS b",
    # ADVICE r10: 'LIMIT 40 % 5' is modulo, not a percent limit
    "SELECT x FROM (VALUES (1), (2), (3)) t(x) ORDER BY x LIMIT 40 % 3",
    # ADVICE r10: multi-unnest ZIP inside the OUTER select after a CTE
    "WITH c AS (SELECT 1 AS o) "
    "SELECT unnest([1, 2, 3]) AS u, unnest([10, 20]) AS v FROM c",
    # later set-op arm
    "SELECT 0 AS u, 0 AS v UNION ALL "
    "SELECT unnest([1, 2]) AS u, unnest([7]) AS v ORDER BY u",
]


@pytest.mark.parametrize("q", SHAPES, ids=lambda q: q[:60])
def test_query_shapes_vs_duckdb(eng, duck, q):
    want = _canon(duck.execute(q).fetchall())
    got = _canon(eng.query(q).collect())
    assert got == want, f"\nduck : {want}\nspark: {got}"


def test_limit_percent(eng, duck, sf_dir, spark):
    spark.read.parquet(f"{sf_dir}/region.parquet").createOrReplaceTempView(
        "region"
    )
    q = "SELECT r_regionkey FROM region ORDER BY r_regionkey LIMIT 40%"
    want = duck.execute(q).fetchall()
    got = eng.query(q).collect()
    assert len(got) == len(want) == 2
    # nested percent-limit: the enclosing subquery materializes first
    q2 = "SELECT count(*) AS a FROM (SELECT * FROM region LIMIT 40%)"
    assert (
        eng.query(q2).collect()[0][0]
        == duck.execute(q2).fetchall()[0][0]
        == 2
    )


@pytest.mark.parametrize("q", BATTERY, ids=lambda q: q[:60])
def test_fn_shim_vs_duckdb(eng, duck, q):
    want = _canon(duck.execute(q).fetchall())
    got = _canon(eng.query(q).collect())
    assert got == want, f"\nduck : {want}\nspark: {got}"


def test_age_instant_value(eng, duck):
    """age() returns the instant difference; duck's month-normalized
    INTERVAL converts to the same timedelta client-side (pinned)."""
    q = "SELECT age(TIMESTAMP '2024-03-15 10:30:00', TIMESTAMP '2024-01-10 05:00:00') AS a"
    want = duck.execute(q).fetchall()[0][0]
    got = eng.query(q).collect()[0][0]
    assert got == want  # both datetime.timedelta


def test_quantile_disc_rank_rule_sweep(eng, duck):
    """The floor(q*(n-1))+1 rank rule across q × n — the shim is done
    only if the whole grid matches duck."""
    for n in (1, 2, 3, 4, 5, 7):
        vals = ", ".join(str(v) for v in range(1, n + 1))
        for qq in (0.0, 0.1, 0.25, 1 / 3, 0.5, 0.75, 0.9, 1.0):
            q = (
                f"SELECT quantile_disc(x, {qq}) AS a "
                f"FROM (SELECT unnest([{vals}]) x)"
            )
            want = duck.execute(q).fetchall()[0][0]
            got = eng.query(q).collect()[0][0]
            assert got == want, f"n={n} q={qq}: {got} != {want}"


def test_materialization_views_hidden(eng):
    """(DESCRIBE …)-in-FROM materialization views must not appear in
    catalog listings (review catch: they polluted SHOW TABLES)."""
    eng.query("SELECT count(*) AS c FROM (DESCRIBE SELECT 1 AS x)").collect()
    names = [r[0] for r in eng.query("SHOW TABLES").collect()]
    assert not any(n.startswith("__duck_meta_") for n in names)


def test_cow_update_raw_literal_semantics(eng, spark):
    """UPDATE SET/WHERE fragments bypass _prepare_sql into selectExpr —
    they must get the SAME raw-literal conversion (review high finding:
    a backslash-bearing value was stored escape-processed, and a
    trailing-backslash param broke out of its literal)."""
    spark.sql("DROP TABLE IF EXISTS cowlit_t")
    eng.execute("CREATE TABLE cowlit_t (id INT, v VARCHAR)")
    eng.execute("INSERT INTO cowlit_t VALUES (1, 'old'), (2, 'keep')")
    eng.execute(r"UPDATE cowlit_t SET v = '(\d)' WHERE v ~ 'o.d'")
    rows = {
        tuple(r)
        for r in eng.query("SELECT id, v FROM cowlit_t ORDER BY id").collect()
    }
    assert rows == {(1, r"(\d)"), (2, "keep")}
    # trailing backslash (the wire renders params duck-dialect)
    eng.execute(r"UPDATE cowlit_t SET v = 'x\' WHERE id = 2")
    got = eng.query("SELECT v FROM cowlit_t WHERE id = 2").collect()[0][0]
    assert got == "x\\"
    # DELETE WHERE with a raw regex class
    eng.execute(r"DELETE FROM cowlit_t WHERE v ~ '\(\\d\)'")
    assert eng.query("SELECT count(*) AS c FROM cowlit_t").collect()[0][0] == 1
    eng.execute("DROP TABLE cowlit_t")


def test_unnest_struct_column(eng, spark):
    """unnest of a struct COLUMN (not a literal) expands into field
    columns via the schema probe — the fast-path heuristic must not
    swallow it (second review pass)."""
    spark.sql(
        "SELECT named_struct('a', 1, 'b', 'x') AS s"
    ).createOrReplaceTempView("structs_v")
    df = eng.query("SELECT unnest(s) FROM structs_v")
    assert df.columns == ["a", "b"]
    assert [tuple(r) for r in df.collect()] == [(1, "x")]


def test_alter_raw_literal_fragments(eng, spark):
    """ALTER ADD COLUMN DEFAULT and ALTER TYPE USING are raw
    duck-dialect fragments — the duck_expr_to_spark invariant applies
    (second review pass: DEFAULT 'a\\d' back-filled 'ad')."""
    spark.sql("DROP TABLE IF EXISTS altlit_t")
    eng.execute("CREATE TABLE altlit_t (id INT)")
    eng.execute("INSERT INTO altlit_t VALUES (1)")
    eng.execute(r"ALTER TABLE altlit_t ADD COLUMN c VARCHAR DEFAULT 'a\d'")
    assert eng.query("SELECT c FROM altlit_t").collect()[0][0] == r"a\d"
    eng.execute(
        r"ALTER TABLE altlit_t ALTER COLUMN c TYPE VARCHAR "
        r"USING regexp_replace(c, '\\', '_', 'g')"
    )
    assert eng.query("SELECT c FROM altlit_t").collect()[0][0] == "a_d"
    eng.execute("DROP TABLE altlit_t")


def test_bit_literal_packed(eng, duck):
    """'101'::BIT packs to duck's client bytes encoding (round 11):
    first byte = pad-bit count, then MSB-first packed bits with pad
    bits SET — the fetchdf/probe rendering. Errors mirror duck."""
    got = eng.query("SELECT '101'::BIT AS a").collect()[0][0]
    want = duck.execute("SELECT '101'::BIT AS a").fetchdf().iloc[0, 0]
    assert bytes(got) == bytes(want) == b"\x05\xfd"
    got2 = eng.query("SELECT CAST('10000001' AS BITSTRING) AS a").collect()[0][0]
    want2 = duck.execute("SELECT CAST('10000001' AS BITSTRING) AS a").fetchdf().iloc[0, 0]
    assert bytes(got2) == bytes(want2)
    with pytest.raises(Exception, match="empty string"):
        eng.query("SELECT ''::BIT AS a").collect()
    with pytest.raises(Exception, match="bit conversion"):
        eng.query("SELECT 'a01'::BIT AS a").collect()


def test_bar_vs_duckdb(eng, duck):
    """bar() pinned value-for-value against live duck (incl. the
    byte-length padding rule and clamping)."""
    q = (
        "SELECT bar(3, 0, 10, 10) AS a, bar(3.3, 0, 10, 10) AS b, "
        "bar(0, 0, 10, 10) AS c, bar(12, 0, 10, 10) AS d, "
        "bar(2.5, 0, 10, 10) AS e, bar(9.99, 0, 10, 10) AS f, "
        "bar(3, 0, 10) AS g, bar(1, 0, 256, 4) AS h, bar(7.9, 0, 8, 1) AS i"
    )
    assert _canon(eng.query(q).collect()) == _canon(duck.execute(q).fetchall())
    with pytest.raises(Exception, match="must be >= 1"):
        eng.query("SELECT bar(3, 0, 10, 0) AS a").collect()


def test_review_r11_fixes(eng, duck, spark, sf_dir):
    """Round-11 review findings, each pinned: #n inside WHERE/GROUP BY
    must not recurse the schema probe; unnest(range(…)) keeps duck's
    rendered column name; signed CAST literals round half-away;
    identifier-suffix date spellings never splice."""
    spark.read.parquet(f"{sf_dir}/region.parquet").createOrReplaceTempView("region")
    for q in [
        "SELECT r_name FROM region WHERE #1 = 0",
        "SELECT #1, count(*) AS c FROM region GROUP BY #1 ORDER BY #1",
        "SELECT * FROM unnest(range(1, 4)) ORDER BY 1",
        "SELECT CAST(-2.5 AS INT) AS a, TRY_CAST(-1.5 AS INT) AS b",
        "SELECT range(5, 1, -2) AS a, range(0, 6, 2) AS b",
    ]:
        got = eng.query(q)
        want = duck.execute(q).fetchdf()
        assert sorted(got.columns) == sorted(want.columns), q
        assert _canon(got.collect()) == _canon(duck.execute(q).fetchall()), q
    from duck_server_spark.plans import rewrites as rw

    assert (
        rw.rewrite_pg_query("SELECT my_current_date - current_date FROM t")
        == "SELECT my_current_date - current_date FROM t"
    )


def test_round11_shims_in_dml_exprs(eng):
    """The round-11 shims flow through duck_expr_to_spark into the COW
    UPDATE SET path: duck log() = log10 and 2-arg trim(str, chars) must
    apply to DML expression fragments exactly like SELECT items."""
    eng.execute("CREATE TABLE r11dml (k INT, x DOUBLE, s VARCHAR)")
    try:
        eng.execute(
            "INSERT INTO r11dml VALUES (1, 100.0, 'xxaxx'), (2, 1000.0, 'ok')"
        )
        eng.execute("UPDATE r11dml SET x = log(x), s = trim(s, 'x') WHERE k = 1")
        rows = {
            r.k: (r.x, r.s)
            for r in eng.query("SELECT k, x, s FROM r11dml").collect()
        }
        assert rows[1] == (2.0, "a") and rows[2] == (1000.0, "ok")
    finally:
        eng.execute("DROP TABLE r11dml")


def test_positional_refs(eng, duck):
    """#n positional references resolve against the FROM relation's
    columns (round 11), matching duck in select/order positions."""
    for q in [
        "SELECT #1 FROM (SELECT 5 AS x)",
        "SELECT #2, #1 FROM (SELECT 5 AS x, 6 AS y)",
        "SELECT x FROM (VALUES (2), (1)) t(x) ORDER BY #1",
    ]:
        got = eng.query(q)
        want = duck.execute(q).fetchdf()
        assert sorted(got.columns) == sorted(want.columns)
        assert _canon(got.collect()) == _canon(
            duck.execute(q).fetchall()
        )


def test_documented_divergences(eng):
    """Pinned-loud divergences: alias() of a non-identifier is the raw
    argument text, not duck's AST rendering. (The map[key] divergence is
    CLOSED in round 11: provable map bases return duck 1.0's [v] list
    shape — see SHAPES battery + probes map_literal_access / map_fn.)"""
    assert eng.query("SELECT map(['k'], [7])['k'] AS a").collect()[0][0] == [7]
    assert eng.query("SELECT alias(42) AS a").collect()[0][0] == "42"
