"""Scalar function families: string / date-time / math / conditional /
cast / array (incl. higher-order) / JSON / struct+map.

Reference parity: SURVEY.md §2B "Scalar function families" — pass-through
surface of the embedded engine, exercised here with cross-engine-exact
semantics. Dialect gaps handled (and worth knowing at any scale):

- DuckDB `date_trunc` returns DATE for coarse units; Spark returns
  TIMESTAMP → we use Spark `trunc()`/`to_date` or cast to align.
- DuckDB CAST(double AS INT) *rounds*, Spark *truncates* → never cast
  float→int directly; use floor/ceil/round explicitly.
- DuckDB `dayofweek` is 0=Sunday, Spark `dayofweek` 1=Sunday → offset.
- `list_distinct` (DuckDB) has unspecified order → always sort after.
- Everything stays in built-in functions (JVM codegen, no Python UDFs):
  the whole module is WholeStageCodegen-able and scale-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duck_server_spark.engine.session import load_table


def str_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.upper("c_name").alias("up"),
        F.lower("c_mktsegment").alias("lo"),
        F.substring("c_name", 1, 8).alias("sub"),
        F.length("c_name").alias("len"),
        F.concat_ws("-", "c_mktsegment", "c_name").alias("joined"),
        F.lpad("c_mktsegment", 12, ".").alias("pad"),
        F.regexp_replace("c_name", "[0-9]+", "#").alias("renum"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("digits"),
        F.col("c_name").like("%1%").alias("has1"),
        F.reverse("c_mktsegment").alias("rev"),
        F.trim(F.lit("  x  ")).alias("trimmed"),
        F.instr("c_name", "1").alias("pos1"),
        F.repeat(F.lit("ab"), 3).alias("rep"),
        F.col("c_name").startswith("Customer").alias("sw"),
        F.translate("c_mktsegment", "AEIOU", "aeiou").alias("tr"),
    )


STR_FUNCS_ORACLE = """
SELECT c_custkey,
       upper(c_name) AS up,
       lower(c_mktsegment) AS lo,
       substring(c_name, 1, 8) AS sub,
       length(c_name) AS len,
       concat_ws('-', c_mktsegment, c_name) AS joined,
       lpad(c_mktsegment, 12, '.') AS pad,
       regexp_replace(c_name, '[0-9]+', '#', 'g') AS renum,
       regexp_extract(c_name, '([0-9]+)', 1) AS digits,
       c_name LIKE '%1%' AS has1,
       reverse(c_mktsegment) AS rev,
       trim('  x  ') AS trimmed,
       instr(c_name, '1') AS pos1,
       repeat('ab', 3) AS rep,
       starts_with(c_name, 'Customer') AS sw,
       translate(c_mktsegment, 'AEIOU', 'aeiou') AS tr
FROM customer
"""


def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.quarter("o_orderdate").alias("q"),
        (F.dayofweek("o_orderdate") - 1).alias("dow_sun0"),
        F.trunc(F.col("o_orderdate").cast("date"), "month").cast("timestamp").alias("month_start"),
        F.date_trunc("hour", "o_orderdate").alias("hour_ts"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).cast("timestamp").alias("plus30"),
        F.add_months(F.col("o_orderdate").cast("date"), 2).cast("timestamp").alias("plus2mo"),
        F.last_day(F.col("o_orderdate").cast("date")).cast("timestamp").alias("eom"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate").cast("date")).alias("days_to_2002"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("iso"),
        F.make_date(F.year("o_orderdate"), F.lit(1), F.lit(1)).cast("timestamp").alias("year_start"),
    )


DATE_FUNCS_ORACLE = """
SELECT o_orderkey,
       year(o_orderdate) AS y,
       month(o_orderdate) AS m,
       day(o_orderdate) AS d,
       quarter(o_orderdate) AS q,
       dayofweek(o_orderdate) AS dow_sun0,
       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
       date_trunc('hour', o_orderdate) AS hour_ts,
       CAST(CAST(o_orderdate AS DATE) + 30 AS TIMESTAMP) AS plus30,
       CAST(CAST(o_orderdate + INTERVAL 2 MONTH AS DATE) AS TIMESTAMP) AS plus2mo,
       CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS eom,
       date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS days_to_2002,
       CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
       strftime(o_orderdate, '%Y-%m-%d') AS iso,
       CAST(make_date(CAST(year(o_orderdate) AS BIGINT), 1, 1) AS TIMESTAMP) AS year_start
FROM orders
"""


def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.abs(F.col("p_size") - 25).alias("absdev"),
        F.round(F.col("p_retailprice") / 7.0, 2).alias("rounded"),
        F.floor(F.col("p_retailprice") / 100.0).cast("long").alias("floored"),
        F.ceil(F.col("p_retailprice") / 100.0).cast("long").alias("ceiled"),
        F.sqrt(F.col("p_retailprice")).alias("root"),
        (F.col("p_size") % 7).alias("mod7"),
        F.signum(F.col("p_size") - 25).cast("double").alias("sgn"),
        (F.col("p_retailprice") * F.col("p_retailprice")).alias("sq"),
        F.greatest("p_size", F.lit(10)).alias("gmax"),
        F.least("p_size", F.lit(10)).alias("gmin"),
    )


MATH_FUNCS_ORACLE = """
SELECT p_partkey,
       abs(p_size - 25) AS absdev,
       round(p_retailprice / 7.0, 2) AS rounded,
       CAST(floor(p_retailprice / 100.0) AS BIGINT) AS floored,
       CAST(ceil(p_retailprice / 100.0) AS BIGINT) AS ceiled,
       sqrt(p_retailprice) AS root,
       p_size % 7 AS mod7,
       CAST(sign(p_size - 25) AS DOUBLE) AS sgn,
       p_retailprice * p_retailprice AS sq,
       greatest(p_size, 10) AS gmax,
       least(p_size, 10) AS gmin
FROM part
"""


def cond_cast_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE / coalesce / nullif / if + explicit casts (incl. the
    truncate-vs-round double→int trap, handled with floor)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 300000.0, "big")
        .when(F.col("o_totalprice") > 100000.0, "mid")
        .otherwise("small")
        .alias("bucket"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("open")).alias("status_x"),
        F.col("o_totalprice").cast("decimal(18,2)").cast("string").alias("price_str"),
        F.floor("o_totalprice").cast("long").alias("price_int"),
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.col("o_orderdate").cast("date").cast("timestamp").alias("as_date"),
        (F.col("o_orderstatus") == "F").cast("int").alias("is_f"),
    )


COND_CAST_FUNCS_ORACLE = """
SELECT o_orderkey,
       CASE WHEN o_totalprice > 300000.0 THEN 'big'
            WHEN o_totalprice > 100000.0 THEN 'mid'
            ELSE 'small' END AS bucket,
       coalesce(nullif(o_orderstatus, 'O'), 'open') AS status_x,
       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS price_str,
       CAST(floor(o_totalprice) AS BIGINT) AS price_int,
       CAST(o_orderkey AS VARCHAR) AS key_str,
       CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS as_date,
       CAST(o_orderstatus = 'F' AS INTEGER) AS is_f
FROM orders
"""


# Float arrays are serialized to ','-joined fixed-point BIGINT strings
# (floor(x·1e6)): the verification driver's pandas canonicalizer cannot
# hash list cells, and BIGINT→string formatting is engine-identical
# where double→string is not. The array ops under test (slice / sort /
# flatten / sequence) still run on the native arrays; only the final
# projection serializes.
_FP_SER_S = "array_join(transform({0}, x -> CAST(CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT) AS STRING)), ',')"
_FP_SER_D = "array_to_string(list_transform({0}, x -> CAST(CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT) AS VARCHAR)), ',')"


def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).alias("first_el"),
        F.expr(_FP_SER_S.format("slice(embedding, 1, 3)")).alias("head3"),
        F.array_contains("embedding", F.lit(0.0)).alias("has_zero"),
        F.array_join(F.array(F.lit("1"), F.lit("2"), F.lit("3")), ",").alias("lit_arr"),
        F.expr(
            "array_join(transform(sequence(1, CAST(label AS BIGINT) + 1), x -> CAST(x AS STRING)), ',')"
        ).alias("seq"),
        F.expr(_FP_SER_S.format("array_sort(slice(embedding, 1, 4))")).alias("sorted4"),
        F.expr(
            _FP_SER_S.format("flatten(array(slice(embedding, 1, 2), slice(embedding, 3, 2)))")
        ).alias("flat4"),
    )


ARRAY_FUNCS_ORACLE = f"""
SELECT vec_id,
       len(embedding) AS dim,
       embedding[1] AS first_el,
       {_FP_SER_D.format("list_slice(embedding, 1, 3)")} AS head3,
       list_contains(embedding, 0.0) AS has_zero,
       '1,2,3' AS lit_arr,
       array_to_string(generate_series(1, CAST(label AS BIGINT) + 1), ',') AS seq,
       {_FP_SER_D.format("list_sort(list_slice(embedding, 1, 4))")} AS sorted4,
       {_FP_SER_D.format("flatten([list_slice(embedding, 1, 2), list_slice(embedding, 3, 4)])")} AS flat4
FROM embeddings
"""


def array_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order lambdas: transform/filter/aggregate (≙ DuckDB
    list_transform/list_filter/list_reduce). The F.aggregate dot-product
    pattern here is the scale path for embedding math — stays in codegen,
    no Python."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.col("embedding")
    return emb.select(
        "vec_id",
        F.expr(
            _FP_SER_S.format("transform(embedding, x -> CAST(x AS DOUBLE) * 2.0)")
        ).alias("doubled"),
        F.expr(_FP_SER_S.format("filter(embedding, x -> x > 0)")).alias("positives"),
        F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x.cast("double")).alias("el_sum"),
        F.aggregate(
            F.zip_with(v, v, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double"),
        ).alias("self_dot"),
        F.exists(v, lambda x: x > 2.0).alias("any_gt2"),
    )


ARRAY_HIGHER_ORDER_ORACLE = f"""
SELECT vec_id,
       {_FP_SER_D.format("list_transform(embedding, x -> CAST(x AS DOUBLE) * 2.0)")} AS doubled,
       {_FP_SER_D.format("list_filter(embedding, x -> x > 0)")} AS positives,
       list_reduce(list_prepend(0.0, list_transform(embedding, x -> CAST(x AS DOUBLE))), (acc, x) -> acc + x) AS el_sum,
       list_reduce(list_prepend(0.0, list_transform(list_transform(embedding, x -> x * x), x -> CAST(x AS DOUBLE))), (acc, x) -> acc + x) AS self_dot,
       len(list_filter(embedding, x -> x > 2.0)) > 0 AS any_gt2
FROM embeddings
"""


def json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar extraction over events.props (get_json_object ≙
    json_extract_string)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("long").alias("k_num"),
        F.get_json_object("props", "$.missing").alias("absent"),
    )


JSON_FUNCS_ORACLE = """
SELECT event_id,
       json_extract_string(props, '$.k') AS k_str,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num,
       json_extract_string(props, '$.missing') AS absent
FROM events
"""


def struct_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRUCT construction + field access and MAP build + lookup, with
    flattened (scalar) outputs so the comparison is representation-free."""
    nation = load_table(spark, sf_dir, "nation")
    s = F.struct(F.col("n_name").alias("name"), F.col("n_regionkey").alias("rk"))
    m = F.create_map(F.lit("a"), F.col("n_nationkey"), F.lit("b"), F.col("n_regionkey"))
    return nation.select(
        "n_nationkey",
        s.getField("name").alias("s_name"),
        s.getField("rk").alias("s_rk"),
        F.element_at(m, F.lit("a")).alias("m_a"),
        F.element_at(m, F.lit("b")).alias("m_b"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("mkeys"),
    )


STRUCT_MAP_FUNCS_ORACLE = """
SELECT n_nationkey,
       struct_extract({'name': n_name, 'rk': n_regionkey}, 'name') AS s_name,
       struct_extract({'name': n_name, 'rk': n_regionkey}, 'rk') AS s_rk,
       map_extract(map(['a','b'], [n_nationkey, n_regionkey]), 'a')[1] AS m_a,
       map_extract(map(['a','b'], [n_nationkey, n_regionkey]), 'b')[1] AS m_b,
       array_to_string(list_sort(map_keys(map(['a','b'], [n_nationkey, n_regionkey]))), ',') AS mkeys
FROM nation
"""


# list_slice through the DIALECT SHIM (round 6): the Spark side runs
# DuckDB-spelled list_slice text through rewrite_pg_query (exact rewrite
# to slice(l, a, b-a+1) — plans/rewrites.py _rewrite_list_slice); the
# oracle runs list_slice natively. Edges covered: interior slice, end
# past the list (clamps), end < start (empty). Floats are floored to
# integer millis so the hash compares exactly.
_LIST_SLICE_SPARK_TEXT = """
SELECT vec_id,
       size(list_slice(embedding, 2, 5)) AS slice_len,
       CAST(floor(list_slice(embedding, 2, 5)[1] * 1000) AS BIGINT) AS first_mill,
       size(list_slice(embedding, 4, 2)) AS empty_len,
       size(list_slice(embedding, 3, 999)) AS clamped_len
FROM embeddings
"""

LIST_SLICE_ORACLE = """
SELECT vec_id,
       len(list_slice(embedding, 2, 5)) AS slice_len,
       CAST(floor(list_slice(embedding, 2, 5)[1] * 1000) AS BIGINT) AS first_mill,
       len(list_slice(embedding, 4, 2)) AS empty_len,
       len(list_slice(embedding, 3, 999)) AS clamped_len
FROM embeddings
"""


def list_slice_shim(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duck_server_spark.engine.session import register_views
    from duck_server_spark.plans import rewrites

    register_views(spark, sf_dir)
    return spark.sql(rewrites.rewrite_pg_query(_LIST_SLICE_SPARK_TEXT))


# generate_series / unnest through the DIALECT SHIM (round 7): ONE
# DuckDB-spelled text serves both engines — the oracle runs it natively,
# the Spark side goes through rewrite_pg_query (FROM generate_series →
# explode(sequence(…, 1)) under DuckDB's default column name; scalar
# unnest → explode; list_value → array). plans/rewrites.py
# _rewrite_series_unnest. The tiny series/unnest sides stay broadcast
# nested-loop joins against the nation scan — no shuffle.
SERIES_UNNEST_TEXT = """
SELECT s.step AS step, u.bucket AS bucket,
       count(*) AS n_rows,
       CAST(sum(n_nationkey) AS BIGINT) AS key_sum
FROM nation
CROSS JOIN (SELECT generate_series AS step FROM generate_series(1, 3)) s
CROSS JOIN (SELECT unnest(list_value(10, 20)) AS bucket) u
GROUP BY s.step, u.bucket
ORDER BY step, bucket
"""


def series_unnest_shim(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duck_server_spark.engine.session import register_views
    from duck_server_spark.plans import rewrites

    register_views(spark, sf_dir)
    return spark.sql(rewrites.rewrite_pg_query(SERIES_UNNEST_TEXT))


# Bracket/brace literal + 1-based subscript shims (round 7): the exact
# DuckDB spellings clients write — `[…]` list literals, `{'k': v}`
# struct literals (field-accessed to scalars so both engines hash the
# same shapes), integer subscripts (1-based, NULL OOB, negative from
# end, [0] → NULL) and positive-literal slices. The oracle runs the SAME
# text natively on DuckDB. Map subscripts are deliberately absent: DuckDB
# returns a single-element LIST there (documented divergence, pinned in
# tests/test_compat.py).
#
# Registry convention (round 8, after the r7 driver failure): DRIVER-WINDOW
# QUERIES MUST PROJECT SCALAR COLUMNS ONLY. The driver canonicalizes results
# with a pandas sort whose hasher crashes on LIST cells (unhashable type);
# the slice is therefore projected through array_to_string — valid in both
# engines since the shim rewrites the brackets before Spark sees them.
BRACKET_LITERALS_TEXT = """
SELECT n_nationkey,
       ['zz', n_name][2] AS second,
       [n_nationkey, n_regionkey][-1] AS last_k,
       [n_nationkey, n_regionkey, 7][4] AS oob,
       array_to_string([10, 20, 30, 40][2:3], ',') AS sl,
       {'k': n_name, 'r': n_regionkey}.r AS sr
FROM nation
"""


def bracket_literals_shim(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duck_server_spark.engine.session import register_views
    from duck_server_spark.plans import rewrites

    register_views(spark, sf_dir)
    return spark.sql(rewrites.rewrite_pg_query(BRACKET_LITERALS_TEXT))


# List alias shims (round 8): the DuckDB list_* spellings whose Spark twin
# is an EXACT pure rename — list_transform→transform, list_filter→filter
# (lambda syntax identical), list_position/list_indexof→array_position
# (verified live on DuckDB 1.x: 1-based hit index, 0 for missing, NULL
# when either arg is NULL — matching Spark exactly), and
# array_to_string→array_join (both 2-arg forms skip NULL elements). ONE
# shared text; the oracle runs it natively; outer-column references
# inside the lambdas exercise the capture path in both engines. All
# projections are scalars (driver-window convention).
LIST_ALIASES_TEXT = """
SELECT n_nationkey,
       list_position([10, 20, 30], CAST(n_regionkey AS INT) * 10) AS pos_dyn,
       list_position([10, 20, 30], 99) AS pos_miss,
       list_indexof(['a', 'b', 'c'], 'c') AS idx_c,
       array_to_string(list_transform([1, 2, 3], x -> x + n_regionkey), ',') AS xform,
       array_to_string(list_filter([1, 2, 3, 4], x -> x % 2 = 0), ',') AS evens,
       array_to_string(list_transform(list_sort([3, 1, NULL, CAST(n_regionkey AS INT)]),
                                      x -> coalesce(CAST(x AS VARCHAR), 'N')), ',') AS sorted_nulls,
       array_to_string(list_transform(list_reverse_sort([3, 1, NULL, CAST(n_regionkey AS INT)]),
                                      x -> coalesce(CAST(x AS VARCHAR), 'N')), ',') AS rsorted_nulls,
       array_to_string(list_sort(list_distinct([2, 1, 2, NULL, CAST(n_regionkey AS INT)])), ',') AS dist_sorted,
       list_unique([1, 2, 2, NULL, CAST(n_regionkey AS INT)]) AS uniq_n,
       array_to_string(list_reverse([1, 2, CAST(n_nationkey AS INT)]), ',') AS rev
FROM nation
"""


def list_aliases_shim(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duck_server_spark.engine.session import register_views
    from duck_server_spark.plans import rewrites

    register_views(spark, sf_dir)
    return spark.sql(rewrites.rewrite_pg_query(LIST_ALIASES_TEXT))


# struct/range/list surface (round 10, session 4): ONE shared
# DuckDB-spelled text covering the newest expression shims — the
# half-open range TVF (Spark's NATIVE distributed range source with the
# output column renamed to DuckDB's `range`), the SCALAR range forms
# (incl. the clamp-to-[] descending asymmetry DuckDB itself has),
# list_prepend's swapped argument order, list_has_all's NULL-needle
# pins, the array_* spellings that share list_* NULL-dropping semantics
# (DuckDB's array_distinct DROPS NULLs; Spark's native keeps them),
# struct_pack(name := expr) → named_struct, struct_extract → field
# access, and regexp_split_to_array → split. The oracle runs the text
# natively; all projections are scalars (driver-window convention).
# Empty-capable stringified lists go through nullif(…, ''): DuckDB's
# array_to_string([]) is NULL while Spark's array_join is '' — the
# nullif collapses both to NULL (the duckdb_types-view lesson, r10).
STRUCT_RANGE_LIST_TEXT = """
SELECT r AS rk,
       nullif(array_to_string(range(CAST(r AS INT)), ','), '') AS rng_n,
       nullif(array_to_string(range(CAST(r AS INT), 4), ','), '') AS rng_ab,
       nullif(array_to_string(range(3, CAST(r AS INT)), ','), '') AS rng_desc,
       array_to_string(list_prepend(CAST(r AS INT), [7, 8]), ',') AS prep,
       list_has_all([1, 2, 3], [CAST(r AS INT), NULL]) AS hasall,
       list_has_all([1, 2, 3], CAST([] AS INT[])) AS hasall_empty,
       array_to_string(list_sort(array_distinct([1, 1, NULL, CAST(r AS INT)])), ',') AS adist,
       array_unique([1, NULL, CAST(r AS INT)]) AS auniq,
       struct_extract(struct_pack(lo := CAST(r AS INT), hi := CAST(r AS INT) * 10), 'hi') AS spack_hi,
       array_to_string(regexp_split_to_array('a1b' || CAST(r AS VARCHAR) || '2cc', '[0-9]+'), '|') AS rsplit
FROM range(0, 5) t(r)
"""


def struct_range_list_shim(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duck_server_spark.engine.session import register_views
    from duck_server_spark.plans import rewrites

    register_views(spark, sf_dir)
    return spark.sql(rewrites.rewrite_pg_query(STRUCT_RANGE_LIST_TEXT))


# Text-similarity scalar family (round 10): ONE shared DuckDB-spelled
# text — jaccard/hamming/mismatches lower to JVM expression templates
# (plans/rewrites.py _rewrite_text_similarity, whole-stage codegen),
# editdist3 is a levenshtein alias, and damerau_levenshtein/jaro_*
# are Arrow-batched pandas UDFs registered under their DuckDB names
# (functions/text_similarity.py — bit-exact vs DuckDB across a
# 1000-pair randomized sweep, so raw doubles hash-match with no
# rounding crutch). Pairs are substrings of each document's own text:
# deterministic, non-empty at every offset (n_chars >= 48 in the
# fixtures; the WHERE guards regenerated fixtures).
TEXT_SIMILARITY_TEXT = """
SELECT doc_id,
       jaccard(substr(text, 1, 20), substr(text, 9, 20)) AS jac,
       hamming(substr(text, 1, 16), substr(text, 17, 16)) AS ham,
       mismatches(lower(substr(text, 1, 12)), substr(text, 1, 12)) AS mism,
       editdist3(substr(text, 1, 14), substr(text, 3, 14)) AS ed3,
       levenshtein(substr(text, 1, 14), substr(text, 5, 14)) AS lev,
       damerau_levenshtein(substr(text, 1, 12), substr(text, 2, 12)) AS dl,
       jaro_similarity(substr(text, 1, 16), substr(text, 5, 16)) AS js,
       jaro_winkler_similarity(substr(text, 1, 16), substr(text, 3, 16)) AS jw
FROM documents
WHERE n_chars >= 40
"""


def text_similarity_shim(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duck_server_spark.engine.session import register_views
    from duck_server_spark.plans import rewrites

    register_views(spark, sf_dir)
    return spark.sql(rewrites.rewrite_pg_query(TEXT_SIMILARITY_TEXT))


# strftime / strptime / date_diff shims (round 8): ONE shared
# DuckDB-spelled text — the oracle runs it natively, the Spark side goes
# through rewrite_pg_query (%-codes → Java patterns; date_diff →
# boundary-crossing arithmetic, which is NOT Spark's complete-units
# timestampdiff — plans/rewrites.py _rewrite_strftime/_rewrite_date_diff).
# The strptime∘strftime round trip exercises BOTH directions on real
# event timestamps; the hour/month columns pin the boundary semantics
# (00:59 → 02:01 must be 2, Jan-31 → Feb-01 must be 1).
DATETIME_SHIMS_TEXT = """
SELECT event_id,
       strftime(ts, '%Y-%m-%dT%H:%M:%S') AS iso,
       strftime(ts, '%a %d %b %Y %I%p') AS pretty,
       date_diff('day', TIMESTAMP '2024-01-01 00:00:00', ts) AS dd,
       date_diff('hour', TIMESTAMP '2024-01-01 00:59:00', ts) AS dh,
       date_diff('month', DATE '2023-11-30', CAST(ts AS DATE)) AS dm,
       date_diff('minute', TIMESTAMP '2024-01-01 00:00:59', ts) AS dmin,
       date_diff('second', TIMESTAMP '2024-01-01 00:00:00', ts) AS ds,
       CAST(strptime(strftime(ts, '%Y-%m-%d %H:%M:%S'), '%Y-%m-%d %H:%M:%S') AS TIMESTAMP) AS rt
FROM events
"""


def datetime_shims(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duck_server_spark.engine.session import register_views
    from duck_server_spark.plans import rewrites

    register_views(spark, sf_dir)
    return spark.sql(rewrites.rewrite_pg_query(DATETIME_SHIMS_TEXT))


# SQL macro inlining gate (round 8): the SAME macro definitions run
# natively on DuckDB (multi-statement oracle: DDL then query) while the
# Spark side inlines them with engine/macros.expand_calls — hash
# equality proves the bind-time expansion (positional + named-default
# binding, scalar + TABLE kinds, macro-calls-macro chaining) computes
# exactly what DuckDB's native macro engine computes. Bodies use DuckDB
# spellings (list_value) so the post-expansion dialect rewrite is
# exercised too.
MACRO_DEFS = [
    "CREATE MACRO disc_price(p, d) AS CAST(p * (1 - d) AS DOUBLE)",
    "CREATE MACRO keytag(k, pre := 'n') AS concat(pre, '-', CAST(k AS VARCHAR))",
    "CREATE MACRO both_tags(k) AS concat(keytag(k), '|', keytag(k, pre := 'x'))",
    "CREATE MACRO key_rows(lim) AS TABLE "
    "SELECT n_nationkey, n_regionkey FROM nation WHERE n_nationkey < lim",
]
MACRO_QUERY = """
SELECT t.n_nationkey,
       disc_price(100.0 + t.n_nationkey, 0.25) AS dp,
       both_tags(t.n_regionkey) AS tags
FROM key_rows(10) t
"""


def macro_inline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duck_server_spark.engine.macros import expand_calls, parse_create
    from duck_server_spark.engine.session import register_views
    from duck_server_spark.plans import rewrites

    register_views(spark, sf_dir)
    defs = {}
    for ddl in MACRO_DEFS:
        name, params, defaults, body, _r, _i, kind = parse_create(ddl)
        defs[name.lower()] = {
            "params": params,
            "defaults": defaults,
            "body": body,
            "kind": kind,
        }

    class _Shim:  # duck-typed registry: expand_calls only needs .names()
        @staticmethod
        def names() -> dict:
            return defs

    return spark.sql(rewrites.rewrite_pg_query(expand_calls(MACRO_QUERY, _Shim)))


MACRO_INLINE_ORACLE = "; ".join(MACRO_DEFS) + "; " + MACRO_QUERY


QUERIES = {
    "scalar_bracket_literals": bracket_literals_shim,
    "scalar_list_aliases": list_aliases_shim,
    "scalar_struct_range_list": struct_range_list_shim,
    "scalar_text_similarity": text_similarity_shim,
    "scalar_datetime_shims": datetime_shims,
    "scalar_macro_inline": macro_inline,
    "scalar_series_unnest": series_unnest_shim,
    "scalar_list_slice": list_slice_shim,
    "scalar_string": str_funcs,
    "scalar_date": date_funcs,
    "scalar_math": math_funcs,
    "scalar_cond_cast": cond_cast_funcs,
    "scalar_array": array_funcs,
    "scalar_array_higher_order": array_higher_order,
    "scalar_json": json_funcs,
    "scalar_struct_map": struct_map_funcs,
}

ORACLE = {
    "scalar_bracket_literals": BRACKET_LITERALS_TEXT,
    "scalar_list_aliases": LIST_ALIASES_TEXT,
    "scalar_struct_range_list": STRUCT_RANGE_LIST_TEXT,
    "scalar_text_similarity": TEXT_SIMILARITY_TEXT,
    "scalar_datetime_shims": DATETIME_SHIMS_TEXT,
    "scalar_macro_inline": MACRO_INLINE_ORACLE,
    "scalar_series_unnest": SERIES_UNNEST_TEXT,
    "scalar_list_slice": LIST_SLICE_ORACLE,
    "scalar_string": STR_FUNCS_ORACLE,
    "scalar_date": DATE_FUNCS_ORACLE,
    "scalar_math": MATH_FUNCS_ORACLE,
    "scalar_cond_cast": COND_CAST_FUNCS_ORACLE,
    "scalar_array": ARRAY_FUNCS_ORACLE,
    "scalar_array_higher_order": ARRAY_HIGHER_ORDER_ORACLE,
    "scalar_json": JSON_FUNCS_ORACLE,
    "scalar_struct_map": STRUCT_MAP_FUNCS_ORACLE,
}


def bit_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise operators (&, |, xor, shifts, bit_count) over integer keys."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        (F.col("p_partkey").bitwiseAND(F.lit(255))).alias("and255"),
        (F.col("p_partkey").bitwiseOR(F.lit(4096))).alias("or4096"),
        (F.col("p_partkey").bitwiseXOR(F.col("p_size"))).alias("xor_size"),
        F.shiftleft(F.col("p_size"), 3).alias("shl3"),
        F.shiftright(F.col("p_partkey"), 2).alias("shr2"),
        F.bit_count(F.col("p_partkey")).alias("popcount"),
    )


BIT_FUNCS_ORACLE = """
SELECT p_partkey,
       p_partkey & 255 AS and255,
       p_partkey | 4096 AS or4096,
       xor(p_partkey, CAST(p_size AS BIGINT)) AS xor_size,
       CAST(p_size AS INTEGER) << 3 AS shl3,
       p_partkey >> 2 AS shr2,
       bit_count(p_partkey) AS popcount
FROM part
"""

QUERIES["scalar_bits"] = bit_funcs
ORACLE["scalar_bits"] = BIT_FUNCS_ORACLE


def binary_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BLOB/BINARY handling (stretch type, SURVEY.md §1.3): hex/unhex
    round-trips, binary length, md5-of-binary. Outputs are hex STRINGS —
    pandas renders bytes differently per engine, hex is representation-
    free."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.hex(F.unhex(F.md5("text"))).alias("md5_roundtrip_hex"),
        F.length(F.unhex(F.md5("text"))).alias("bin_len"),
        F.hex(F.encode(F.substring("text", 1, 8), "UTF-8")).alias("prefix_hex"),
        F.base64(F.encode(F.substring("text", 1, 8), "UTF-8")).alias("prefix_b64"),
    )


BINARY_FUNCS_ORACLE = """
SELECT doc_id,
       upper(hex(unhex(md5(text)))) AS md5_roundtrip_hex,
       CAST(octet_length(unhex(md5(text))) AS INTEGER) AS bin_len,
       upper(hex(encode(substring(text, 1, 8)))) AS prefix_hex,
       to_base64(encode(substring(text, 1, 8))) AS prefix_b64
FROM documents
"""

QUERIES["scalar_binary"] = binary_funcs
ORACLE["scalar_binary"] = BINARY_FUNCS_ORACLE
