"""Core relational operators: joins (every type), set ops, sort/limit/
offset, distinct, subqueries, CTEs, and the DuckDB-idiom rewrites
(DISTINCT ON, QUALIFY, SAMPLE).

Reference parity: SURVEY.md §2B "Joins", "Set ops", "Subqueries / CTEs",
"Sort / limit / top-k", "Sampling / misc relational" — all reachable
through the reference's delegation points (/root/reference/pg_conn.go:314,
ch_server.go:181) and in scope per its README.md:26.

Scale notes:
- Dim joins (region/nation/customer/supplier/part) are broadcast — no
  shuffle of the fact side. At 100 TB the fact⋈fact joins (lineitem⋈orders)
  shuffle on the join key; AQE handles skew splitting.
- Semi/anti joins use Spark's left_semi/left_anti (no payload shuffle of
  the probe side's non-key columns on the build side).
- Top-k = orderBy().limit(): Catalyst plans TakeOrderedAndProject — each
  partition keeps k rows, driver merges; no global sort at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from duck_server_spark.engine.session import load_table
from duck_server_spark.operators.common import sql_op

# ---------------------------------------------------------------- joins


def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join customer⋈nation (dim⋈dim, broadcast)."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select("c_custkey", "c_name", "n_name")
    )


JOIN_INNER_ORACLE = """
SELECT c_custkey, c_name, n_name
FROM customer JOIN nation ON c_nationkey = n_nationkey
"""


def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join: every customer, order revenue if any (NULL kept)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000.0)
    agg = orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("big_orders"))
    return (
        cust.join(agg, cust.c_custkey == agg.o_custkey, "left")
        .select("c_custkey", "c_mktsegment", "big_orders")
    )


JOIN_LEFT_ORACLE = """
SELECT c_custkey, c_mktsegment, big_orders
FROM customer
LEFT JOIN (
  SELECT o_custkey, count(*) AS big_orders
  FROM orders WHERE o_totalprice > 400000.0 GROUP BY o_custkey
) t ON c_custkey = o_custkey
"""


def join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join (orders right-joined from a filtered customer set)."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "MACHINERY")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "right")
        .select("o_orderkey", "o_custkey", "c_name")
    )


JOIN_RIGHT_ORACLE = """
SELECT o_orderkey, o_custkey, c_name
FROM (SELECT * FROM customer WHERE c_mktsegment = 'MACHINERY') c
RIGHT JOIN orders ON c.c_custkey = orders.o_custkey
"""


def join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join between two disjoint-ish aggregates."""
    orders = load_table(spark, sf_dir, "orders")
    hi = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("urgent_cnt"))
    )
    lo = (
        orders.filter(F.col("o_orderpriority") == "5-LOW")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("low_cnt"))
    )
    return (
        hi.withColumnRenamed("o_custkey", "custkey")
        .join(lo.withColumnRenamed("o_custkey", "custkey2"), F.col("custkey") == F.col("custkey2"), "full")
        .select(
            F.coalesce("custkey", "custkey2").alias("custkey"),
            "urgent_cnt",
            "low_cnt",
        )
    )


JOIN_FULL_ORACLE = """
SELECT COALESCE(a.o_custkey, b.o_custkey) AS custkey, urgent_cnt, low_cnt
FROM (SELECT o_custkey, count(*) AS urgent_cnt FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY o_custkey) a
FULL JOIN (SELECT o_custkey, count(*) AS low_cnt FROM orders WHERE o_orderpriority = '5-LOW' GROUP BY o_custkey) b
  ON a.o_custkey = b.o_custkey
"""


def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join: customers having at least one urgent order (EXISTS)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
    )


JOIN_SEMI_ORACLE = """
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
"""


def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join: customers with no orders at all (NOT EXISTS)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
    )


JOIN_ANTI_ORACLE = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join of the two smallest dims."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    return region.crossJoin(nation).select("r_name", "n_name")


JOIN_CROSS_ORACLE = "SELECT r_name, n_name FROM region CROSS JOIN nation"


def join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (theta) join: count part pairs where p1 is strictly
    smaller but pricier. Broadcast-nested-loop on the broadcast side —
    at 100 TB a pure theta join needs one side small; Catalyst enforces
    that by requiring a broadcastable side (else cartesian)."""
    part = load_table(spark, sf_dir, "part")
    p1 = part.select(F.col("p_partkey").alias("k1"), F.col("p_size").alias("s1"), F.col("p_retailprice").alias("r1"))
    p2 = part.select(F.col("p_partkey").alias("k2"), F.col("p_size").alias("s2"), F.col("p_retailprice").alias("r2"))
    return (
        p1.join(F.broadcast(p2), (F.col("s1") < F.col("s2")) & (F.col("r1") > F.col("r2")))
        .agg(F.count(F.lit(1)).alias("pair_cnt"))
    )


JOIN_THETA_ORACLE = """
SELECT count(*) AS pair_cnt
FROM part p1 JOIN part p2 ON p1.p_size < p2.p_size AND p1.p_retailprice > p2.p_retailprice
"""


def join_using_natural(spark: SparkSession, sf_dir: str) -> DataFrame:
    """USING-style join (single shared column, no duplicate output col)."""
    return sql_op(
        """
        SELECT n_nationkey, n_name, r_name
        FROM (SELECT n_nationkey, n_name, n_regionkey AS r_regionkey FROM nation) n
        JOIN region USING (r_regionkey)
        """
    )(spark, sf_dir)


JOIN_USING_ORACLE = """
SELECT n_nationkey, n_name, r_name
FROM (SELECT n_nationkey, n_name, n_regionkey AS r_regionkey FROM nation) n
JOIN region USING (r_regionkey)
"""

# ------------------------------------------------------------- set ops


def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    a = cust.filter(F.col("c_acctbal") > 9000.0).select("c_custkey")
    b = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    return a.union(b)


SETOP_UNION_ALL_ORACLE = """
SELECT c_custkey FROM customer WHERE c_acctbal > 9000.0
UNION ALL
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
"""


def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    a = cust.filter(F.col("c_acctbal") > 9000.0).select("c_custkey")
    b = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    return a.union(b).distinct()


SETOP_UNION_DISTINCT_ORACLE = """
SELECT c_custkey FROM customer WHERE c_acctbal > 9000.0
UNION
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
"""


def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    a = cust.filter(F.col("c_acctbal") > 5000.0).select("c_custkey")
    b = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    return a.intersect(b)


SETOP_INTERSECT_ORACLE = """
SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0
INTERSECT
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
"""


def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    a = orders.select("o_custkey")
    b = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return a.exceptAll(b)


SETOP_EXCEPT_ALL_ORACLE = """
SELECT o_custkey FROM orders
EXCEPT ALL
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
"""

# ------------------------------------------- sort / limit / offset / topk


def sort_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY … NULLS handling + LIMIT/OFFSET pagination.

    Also covers the reference's CH `LIMIT n,m → LIMIT m OFFSET n` rewrite
    target semantics (/root/reference/ch_server.go:155,164)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .select("o_orderkey", "o_totalprice")
        .offset(10)
        .limit(20)
    )


SORT_LIMIT_OFFSET_ORACLE = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 20 OFFSET 10
"""


def sort_nulls_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULLS FIRST/LAST ordering over a computed nullable column."""
    return sql_op(
        """
        SELECT o_orderkey,
               CASE WHEN o_orderstatus = 'O' THEN NULL ELSE o_totalprice END AS np
        FROM orders
        ORDER BY np ASC NULLS FIRST, o_orderkey
        LIMIT 50
        """
    )(spark, sf_dir)


SORT_NULLS_FIRST_ORACLE = """
SELECT o_orderkey,
       CASE WHEN o_orderstatus = 'O' THEN NULL ELSE o_totalprice END AS np
FROM orders
ORDER BY np ASC NULLS FIRST, o_orderkey
LIMIT 50
"""

# ------------------------------------------------- subqueries and CTEs


def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery in a predicate."""
    return sql_op(
        """
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_totalprice > (SELECT CAST(avg(o_totalprice) AS DECIMAL(18,2)) * 2 FROM orders)
        """
    )(spark, sf_dir)


SUBQUERY_SCALAR_ORACLE = """
SELECT o_orderkey, o_totalprice FROM orders
WHERE o_totalprice > (SELECT CAST(avg(o_totalprice) AS DECIMAL(18,2)) * 2 FROM orders)
"""


def subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN subquery (rewritten by Catalyst to a left-semi join)."""
    return sql_op(
        """
        SELECT c_custkey, c_name FROM customer
        WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)
        """
    )(spark, sf_dir)


SUBQUERY_IN_ORACLE = """
SELECT c_custkey, c_name FROM customer
WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)
"""


def subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (decorrelated by Catalyst into a join).

    DuckDB's flagship decorrelation case ("Unnesting Arbitrary Queries" —
    see PAPERS.md); Spark's RewriteCorrelatedScalarSubquery covers it."""
    return sql_op(
        """
        SELECT o_orderkey, o_totalprice FROM orders o
        WHERE o_totalprice > (
          SELECT CAST(coalesce(CAST(avg(o2.o_totalprice) AS DECIMAL(18,2)), 0) AS DOUBLE) * 1.5
          FROM orders o2 WHERE o2.o_custkey = o.o_custkey
        )
        """
    )(spark, sf_dir)


SUBQUERY_CORRELATED_ORACLE = """
SELECT o_orderkey, o_totalprice FROM orders o
WHERE o_totalprice > (
  SELECT CAST(coalesce(CAST(avg(o2.o_totalprice) AS DECIMAL(18,2)), 0) AS DOUBLE) * 1.5
  FROM orders o2 WHERE o2.o_custkey = o.o_custkey
)
"""


def cte_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH chain feeding a join."""
    return sql_op(
        """
        WITH big AS (
          SELECT o_custkey, count(*) AS n FROM orders WHERE o_totalprice > 200000.0 GROUP BY o_custkey
        ),
        seg AS (
          SELECT c_custkey, c_mktsegment FROM customer
        )
        SELECT c_mktsegment, CAST(sum(n) AS BIGINT) AS big_orders
        FROM big JOIN seg ON o_custkey = c_custkey
        GROUP BY c_mktsegment
        """
    )(spark, sf_dir)


CTE_CHAIN_ORACLE = """
WITH big AS (
  SELECT o_custkey, count(*) AS n FROM orders WHERE o_totalprice > 200000.0 GROUP BY o_custkey
),
seg AS (
  SELECT c_custkey, c_mktsegment FROM customer
)
SELECT c_mktsegment, CAST(sum(n) AS BIGINT) AS big_orders
FROM big JOIN seg ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""

# ----------------------------------------------------- DuckDB idioms


def distinct_on(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DuckDB `SELECT DISTINCT ON (key) …` → row_number()=1 window idiom.

    At scale: the window shuffles once on the partition key — same cost
    as DISTINCT ON's hash partitioning; no extra pass."""
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_orderdate").desc(), F.col("o_orderkey").asc())
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate")
    )


DISTINCT_ON_ORACLE = """
SELECT o_custkey, o_orderkey, o_orderdate
FROM (
  SELECT o_custkey, o_orderkey, o_orderdate,
         row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey ASC) AS rn
  FROM orders
) t WHERE rn = 1
"""


# DISTINCT ON as SQL TEXT (round 7): the exact PG/DuckDB syntax a client
# sends through the reference's delegation surface (pg_conn.go hands the
# raw statement to embedded DuckDB). The Spark side runs the dialect shim
# (plans/rewrites.py _rewrite_distinct_on → row_number()=1 window, one
# shuffle on the key); the oracle runs the SAME text natively on DuckDB —
# hash equality proves the rewrite's semantics. The ORDER BY is a total
# order within each partition (o_orderkey is unique) so both engines pick
# the identical row; the trailing LIMIT exercises the clause-splitting.
DISTINCT_ON_SQL_TEXT = """
SELECT DISTINCT ON (o_custkey) o_custkey, o_orderkey, o_orderdate
FROM orders
WHERE o_orderstatus <> 'X'
ORDER BY o_custkey, o_orderdate DESC, o_orderkey
LIMIT 500
"""


def distinct_on_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL-text twin of distinct_on: exercises the DISTINCT ON
    dialect shim end-to-end (rewrite → Spark plan) against DuckDB running
    the identical statement natively."""
    from duck_server_spark.engine.session import register_views
    from duck_server_spark.plans import rewrites

    register_views(spark, sf_dir)
    return spark.sql(rewrites.rewrite_pg_query(DISTINCT_ON_SQL_TEXT))


# DuckDB's FROM-first syntax (round 9): one DuckDB-spelled text, both
# engines — DuckDB parses FROM-first natively, our side goes through the
# rewrite_from_first shim (plans/rewrites.py) onto a standard SELECT
# plan (same hash-aggregate + union the explicit spelling produces — the
# shim is bind-time text, zero plan cost). Exercises every pinned shape
# at once: CTE with a FROM-first body, FROM…SELECT…GROUP BY, a set-op
# arm with SELECT-before-WHERE ordering, and a trailing global ORDER BY.
FROM_FIRST_SQL_TEXT = """WITH big AS (FROM orders WHERE o_totalprice > 100000)
FROM big SELECT o_orderstatus AS status, count(*) AS n,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
GROUP BY o_orderstatus
UNION ALL
FROM region SELECT r_name AS status, 0 AS n, CAST(0.0 AS DOUBLE) AS total WHERE r_regionkey < 2
ORDER BY status, n"""


def from_first_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FROM-first dialect shim end-to-end (rewrite → Spark plan) against
    DuckDB running the identical statement natively."""
    from duck_server_spark.engine.session import register_views
    from duck_server_spark.plans import rewrites

    register_views(spark, sf_dir)
    return spark.sql(rewrites.rewrite_pg_query(FROM_FIRST_SQL_TEXT))


# PG/DuckDB double-quoted identifiers (round 10, VERDICT r9 punch item
# 1): one PG-spelled text, both engines — DuckDB parses "ident" quoting
# natively (the reference gets it for free behind its delegation points,
# pg_conn.go:314), our side goes through normalize_quoted_idents
# (plans/rewrites.py) onto backticked Spark identifiers. Exercises every
# pinned shape at once: quoted table/alias/column refs, qualified
# "a"."b" chains, MIXED-case refs resolved case-insensitively (the
# documented DuckDB-over-strict-PG pin), an embedded doubled quote in an
# alias ("a""b" → the literal name a"b), a quoted alias with a space
# referenced from ORDER BY, and a string literal whose double quotes
# must stay data. Bind-time text transform — zero plan cost.
QUOTED_IDENTS_SQL_TEXT = """SELECT "r"."r_regionkey" AS "Region Key",
  upper("R"."R_NAME") AS "NAME",
  "n"."n_name" AS "nation",
  'keep "this" quoted literal' AS "q_lit",
  "n"."n_nationkey" + 100 AS "a""b"
FROM "region" AS "r" JOIN "nation" AS "n"
  ON "n"."n_regionkey" = "r"."r_regionkey"
WHERE "r"."r_regionkey" < 4 AND "N"."N_NAME" <> 'FRANCE'
ORDER BY "Region Key", "nation\""""


def quoted_idents_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PG double-quoted identifier shim end-to-end (normalize → Spark
    plan) against DuckDB running the identical statement natively."""
    from duck_server_spark.engine.session import register_views
    from duck_server_spark.plans import rewrites

    register_views(spark, sf_dir)
    return spark.sql(rewrites.rewrite_pg_query(QUOTED_IDENTS_SQL_TEXT))


# ---------------------------------------------------------------------------
# Round-10 session-5 dialect gates: one DuckDB-dialect text per family,
# run verbatim by the oracle and through the full rewrite pipeline on
# the Spark side (the quoted_idents_sql pattern). Float-bearing
# aggregates round() IN THE TEXT so both engines canonicalize
# identically; integer window sums CAST to BIGINT (duck widens to
# HUGEINT, which lands as float in pandas).
# ---------------------------------------------------------------------------

RAW_LITERAL_SQL_TEXT = r"""SELECT o_orderkey,
  regexp_extract(o_orderpriority, '(\d)-(\w+)', 2) AS pri_word,
  regexp_replace(o_orderstatus || ' x ' || o_orderpriority, '\s+', '_', 'g') AS squashed,
  o_orderpriority SIMILAR TO '\d-[A-Z ]+' AS pri_ok
FROM orders
WHERE o_orderpriority ~ '\d-[A-Z]+' AND o_orderkey % 100 = 0
ORDER BY o_orderkey"""


def raw_literal_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw string-literal semantics end-to-end (round 10): plain '…'
    literals carry backslashes as DATA in DuckDB/PG ('\\d' is a regex
    class) while Spark processes escapes — normalize_literals converts
    exactly once. Also exercises 2-arg regexp_extract group-0 default,
    first-vs-global regexp_replace flags, SIMILAR TO and ~ full-match
    anchoring. Plan: one pruned scan + filter, bind-time text only."""
    from duck_server_spark.engine.session import register_views
    from duck_server_spark.plans import rewrites

    register_views(spark, sf_dir)
    return spark.sql(
        rewrites.rewrite_pg_query(rewrites.normalize_literals(RAW_LITERAL_SQL_TEXT))
    )


INFIX_OPS_SQL_TEXT = r"""SELECT o_orderkey,
  round(o_totalprice ^ 2, 2) AS price_sq,
  o_orderkey // 7 AS bucket7,
  o_orderpriority ~~ '1%' AS is_urgent,
  o_orderstatus !~~ '%X%' AS not_x,
  o_orderkey & 15 AS low_bits
FROM orders
WHERE o_orderkey // 10 % 97 = 5
ORDER BY o_orderkey"""


def infix_ops_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DuckDB infix operator family (round 10): ^ exponentiation (Spark
    ^ is XOR), // trunc division (→ div, keeps precedence), ~~/!~~ LIKE
    spellings, & staying bitwise. Pure bind-time conversion — the plan
    is the hand-written Spark spelling's plan."""
    from duck_server_spark.engine.session import register_views
    from duck_server_spark.plans import rewrites

    register_views(spark, sf_dir)
    return spark.sql(
        rewrites.rewrite_pg_query(rewrites.normalize_literals(INFIX_OPS_SQL_TEXT))
    )


FN_SHIM_SCALARS_SQL_TEXT = r"""SELECT o_orderkey,
  isoyear(o_orderdate) AS iso_y,
  monthname(o_orderdate) AS mon_name,
  even(o_totalprice) AS next_even,
  fmod(o_orderkey, 7) AS fm7,
  strpos(o_orderpriority, '-') AS dash_at,
  to_base(o_orderkey % 255, 16) AS hex_k,
  time_bucket(INTERVAL '1 week', o_orderdate) AS wk
FROM orders
WHERE o_orderkey % 211 = 0
ORDER BY o_orderkey"""


def fn_shim_scalars_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """plans/fn_shims.py scalar registry over a real scan: ISO year,
    full month names, even() away-from-zero, floor-modulo, base
    conversion, and time_bucket against duck's 2000-01-03 origin — all
    JVM expression templates inside one whole-stage-codegen'd project."""
    from duck_server_spark.engine.session import register_views
    from duck_server_spark.plans import rewrites

    register_views(spark, sf_dir)
    return spark.sql(
        rewrites.rewrite_pg_query(
            rewrites.normalize_literals(FN_SHIM_SCALARS_SQL_TEXT)
        )
    )


FN_SHIM_AGGS_SQL_TEXT = r"""SELECT o_orderpriority,
  round(entropy(o_orderkey % 7), 6) AS ent,
  quantile_disc(o_totalprice, 0.25) AS q1,
  quantile_disc(o_totalprice, [0.5, 0.9])[1] AS q50,
  round(mad(o_totalprice), 4) AS madv,
  round(skewness(o_totalprice), 4) AS skew_c,
  round(kurtosis(o_totalprice), 4) AS kurt_c,
  count() AS n
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority"""


def fn_shim_aggs_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fn_shims aggregate registry per group: log2 entropy, nearest-rank
    quantile_disc (scalar + list form), median-absolute-deviation (the
    lambda-bound once-only inner median — the naive shape re-sorted the
    group per element), and the bias-corrected skewness/kurtosis.
    One hash-aggregate shuffle; collect_list bounds are group-sized."""
    from duck_server_spark.engine.session import register_views
    from duck_server_spark.plans import rewrites

    register_views(spark, sf_dir)
    return spark.sql(
        rewrites.rewrite_pg_query(
            rewrites.normalize_literals(FN_SHIM_AGGS_SQL_TEXT)
        )
    )


QUERY_SHAPES_SQL_TEXT = r"""SELECT o_orderstatus,
  array_to_string(list(o_orderkey ORDER BY o_orderkey) , ',') AS first_keys,
  array_to_string([k * 2 FOR k IN list(o_custkey ORDER BY o_orderkey) IF k >= 0], ',') AS cust2,
  any_value(o_orderpriority ORDER BY o_orderkey) AS first_pri
FROM (SELECT * FROM orders WHERE o_orderkey % 500 = 0)
GROUP BY o_orderstatus
ORDER BY o_orderstatus"""


def query_shapes_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY inside aggregates (ordered collect via ONE sorted-struct
    aggregate, any_value → min_by) composed with a list comprehension —
    single hash aggregate, no extra shuffle for the ordering."""
    from duck_server_spark.engine.session import register_views
    from duck_server_spark.plans import rewrites

    register_views(spark, sf_dir)
    return spark.sql(
        rewrites.rewrite_pg_query(
            rewrites.normalize_literals(QUERY_SHAPES_SQL_TEXT)
        )
    )


WINDOW_SHAPES_SQL_TEXT = r"""SELECT o_orderkey,
  count(*) FILTER (o_custkey % 2 = 0) OVER (ORDER BY o_orderkey ROWS BETWEEN 5 PRECEDING AND CURRENT ROW) AS c6,
  CAST(sum(o_orderkey) OVER (ORDER BY o_orderkey ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE CURRENT ROW) AS BIGINT) AS s4,
  round(avg(o_totalprice) OVER (ORDER BY o_orderkey ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING EXCLUDE CURRENT ROW), 4) AS a6
FROM orders
WHERE o_orderkey % 250 = 0
ORDER BY o_orderkey"""


def window_shapes_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTER over a window (→ conditional input, Spark refuses the
    native spelling) and frame EXCLUDE CURRENT ROW (→ frame aggregate
    minus the current row's contribution, exact for sum/count/avg) —
    one window operator, one sort, no self-join."""
    from duck_server_spark.engine.session import register_views
    from duck_server_spark.plans import rewrites

    register_views(spark, sf_dir)
    return spark.sql(
        rewrites.rewrite_pg_query(
            rewrites.normalize_literals(WINDOW_SHAPES_SQL_TEXT)
        )
    )


FN_SHIM_EMBEDDING_SQL_TEXT = r"""SELECT a.vec_id AS qid, b.vec_id AS cid,
  round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cos_sim,
  round(list_inner_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) AS dot,
  round(list_distance(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) AS l2
FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
WHERE a.vec_id % 29 = 0
ORDER BY a.vec_id"""


def fn_shim_embedding_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The embedding-math scalar family over the REAL embeddings table:
    cosine / dot / L2 as zip_with+aggregate JVM folds inside one
    equi-join — the exact shape the ANN shortlist verification uses.
    Both sides compute in float64 — the shared text casts the FLOAT[]
    column to DOUBLE[] BEFORE the fold (the operators/similarity.py
    pattern; third review: rounding a float32 result cannot reconcile
    values near a rounding boundary)."""
    from duck_server_spark.engine.session import register_views
    from duck_server_spark.plans import rewrites

    register_views(spark, sf_dir)
    return spark.sql(
        rewrites.rewrite_pg_query(
            rewrites.normalize_literals(FN_SHIM_EMBEDDING_SQL_TEXT)
        )
    )


# ---------------------------------------------------------------------------
# Round-11 dialect gates: the probe-battery closures (VERDICT r10 items
# 3-5, 7) witnessed through the driver's oracle gate over real scans.
# ---------------------------------------------------------------------------

DIALECT_PROBE_SQL_TEXT = r"""SELECT o_orderkey,
  CAST(o_orderdate AS DATE) - DATE '1995-06-01' AS days_since,
  (MAP {'lo': 'low', 'hi': 'high'})[CASE WHEN o_totalprice > 100000 THEN 'hi' ELSE 'lo' END][1] AS price_band,
  bar(o_orderkey % 97, 0, 96, 10) AS keybar,
  strpos(regexp_replace(o_orderpriority, '-', '_'), '_') AS und_at,
  round(o_totalprice ^ 2::INT / 1e6, 3) AS psq
FROM orders
WHERE o_orderkey % 211 = 0
ORDER BY o_orderkey"""


def dialect_probe_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-11 probe closures over a real scan: date − date → BIGINT
    days (provable-date operands), duck-1.0 map-subscript [v] list
    shape chained into [1], bar() with its byte-length padding rule, a
    shimmed call NESTED in another shimmed call's argument (first-match
    regexp_replace inside strpos — ADVICE r10), and a `^` power whose
    right operand carries a '::INT' cast inside an expression list
    (paren-depth cast scan — ADVICE r10). All bind-time text: one
    pruned scan, whole-stage codegen, no Python boundary."""
    from duck_server_spark.engine.session import register_views
    from duck_server_spark.plans import rewrites

    register_views(spark, sf_dir)
    return spark.sql(
        rewrites.rewrite_pg_query(
            rewrites.normalize_literals(DIALECT_PROBE_SQL_TEXT)
        )
    )


UNNEST_TVF_SQL_TEXT = (
    "SELECT * FROM unnest([3, 1, 2]) ORDER BY 1"
)


def unnest_tvf_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FROM-position unnest with DuckDB 1.0's rendered-expression
    default column name (`main.list_value(3, 1, 2)`) — the last probe
    mismatch not on the divergence list, closed round 11. Lowered to
    ONE explode over the literal array (no join, no probe)."""
    from duck_server_spark.plans import rewrites

    return spark.sql(
        rewrites.rewrite_pg_query(rewrites.normalize_literals(UNNEST_TVF_SQL_TEXT))
    )


# ---------------------------------------------------------------------------
# Round-12 dialect gates (VERDICT r11 item 1 + ADVICE r11 medium).
# ---------------------------------------------------------------------------

DATE_ARITH_COLS_SQL_TEXT = r"""WITH d AS (
  SELECT o_orderkey,
         CAST(o_orderdate AS DATE) AS od,
         CAST(o_orderdate + INTERVAL 3 DAY AS DATE) AS dd
  FROM orders WHERE o_orderkey % 211 = 0)
SELECT o_orderkey,
       dd - od AS lag_days,
       od - DATE '1995-06-01' AS since_days,
       DATE '1998-01-01' - dd AS until_days
FROM d ORDER BY o_orderkey"""


def date_arith_cols_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COLUMN-typed `date - date` → BIGINT days (VERDICT r11 item 1,
    the one silent divergence left open in round 11): `dd - od` has no
    provable-date spelling, so the executor types both operands through
    the cached FROM-schema probe (the #n resolver's machinery) and
    emits CAST(datediff(l, r) AS BIGINT); the mixed column−literal
    directions ride the same pass. Engine path — the probe lives in the
    executor, not the pure-text rewrite layer."""
    from duck_server_spark.engine.executor import Engine
    from duck_server_spark.engine.session import register_views

    register_views(spark, sf_dir)
    return Engine(spark).query(DATE_ARITH_COLS_SQL_TEXT)


WINDOW_SPEC_COPY_SQL_TEXT = r"""SELECT o_orderkey,
  CAST(sum(o_orderkey % 100) OVER (w1 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS s1,
  CAST(sum(o_orderkey % 100) OVER w2 AS BIGINT) AS s2,
  CAST(sum(o_orderkey % 100) OVER w3 AS BIGINT) AS s3
FROM orders WHERE o_orderkey % 211 = 0
WINDOW w1 AS (ORDER BY o_orderkey), w2 AS (w1), w3 AS (w1 ROWS BETWEEN 1 PRECEDING AND CURRENT ROW)
ORDER BY o_orderkey"""


def window_spec_copy_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named-window definition chains (ADVICE r11 medium/low): a
    comma-separated WINDOW list, a def-site base copy (`w2 AS (w1)`), a
    def-site refinement (`w3 AS (w1 ROWS …)`), and an OVER-site
    refinement — all resolved with duck's one-level copy rule at bind
    time (pinned live; tools/dialect_probe.py win_named_*). Pure text:
    one scan, three window frames over one sort."""
    from duck_server_spark.engine.session import register_views
    from duck_server_spark.plans import rewrites

    register_views(spark, sf_dir)
    return spark.sql(
        rewrites.rewrite_pg_query(
            rewrites.normalize_literals(WINDOW_SPEC_COPY_SQL_TEXT)
        )
    )


POSITIONAL_REF_SQL_TEXT = (
    "SELECT #2 AS rname, #1 AS rkey FROM region ORDER BY #1 LIMIT 60%"
)


def positional_ref_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DuckDB `#n` positional references + percent LIMIT, through the
    ENGINE path (both are executor-level bind-time expansions: #n →
    the FROM relation's nth column via one analysis-only schema probe;
    LIMIT 60% → floor(0.6 × count) rows). Matches duck's resolution:
    #1 is the FROM column, not the output ordinal."""
    from duck_server_spark.engine.executor import Engine
    from duck_server_spark.engine.session import register_views

    register_views(spark, sf_dir)
    return Engine(spark).query(POSITIONAL_REF_SQL_TEXT)


# DuckDB's simplified PIVOT statement (round 7): dynamic column
# discovery → Spark PIVOT clause (engine/pivot.py). The default-USING
# form exercises the count-0 fill; orderpriority has 5 stable values so
# both engines mint identical sorted columns. The oracle runs the SAME
# text natively on DuckDB.
PIVOT_STMT_SQL_TEXT = "PIVOT orders ON o_orderpriority GROUP BY o_orderstatus"


def pivot_stmt_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DuckDB `PIVOT tbl ON col [USING …] [GROUP BY …]` statement —
    two-phase: distinct-value discovery (driver-side, capped), then ONE
    hash-aggregate shuffle on the group keys (the same plan as
    groupBy().pivot())."""
    from duck_server_spark.engine.pivot import pivot_statement
    from duck_server_spark.engine.session import register_views

    register_views(spark, sf_dir)
    return pivot_statement(spark, PIVOT_STMT_SQL_TEXT)


# DuckDB's simplified UNPIVOT statement (round 7): pure dialect rewrite
# onto the SQL-standard UNPIVOT clause both engines support
# (plans/rewrites.py rewrite_unpivot_stmt). Both engines drop NULL cells
# by default; p_size (int) widens to DOUBLE alongside p_retailprice in
# both.
UNPIVOT_STMT_SQL_TEXT = (
    "UNPIVOT part ON p_retailprice, p_size INTO NAME metric VALUE val"
)


def unpivot_stmt_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DuckDB `UNPIVOT tbl ON cols INTO NAME n VALUE v` — rewrites to
    Spark's UNPIVOT clause: a Generate (explode) per row, no shuffle."""
    from duck_server_spark.engine.session import register_views
    from duck_server_spark.plans import rewrites

    register_views(spark, sf_dir)
    return spark.sql(rewrites.rewrite_pg_query(UNPIVOT_STMT_SQL_TEXT))


def qualify_idiom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DuckDB QUALIFY → filter over a windowed column (top-3 per segment)."""
    cust = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey").asc())
    return (
        cust.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("c_mktsegment", "c_custkey", "c_acctbal", "rnk")
    )


QUALIFY_ORACLE = """
SELECT c_mktsegment, c_custkey, c_acctbal, rnk
FROM (
  SELECT c_mktsegment, c_custkey, c_acctbal,
         row_number() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC) AS rnk
  FROM customer
) t WHERE rnk <= 3
"""


def sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 10% 'sample' via key modulus (portable across
    engines, unlike TABLESAMPLE whose RNG is engine-specific)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter((F.col("l_orderkey") % 10) == 0).select("l_orderkey", "l_linenumber", "l_quantity")


SAMPLE_DETERMINISTIC_ORACLE = """
SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem WHERE l_orderkey % 10 = 0
"""


def sample_bernoulli(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True random sampling (`USING SAMPLE` parity) — seeded Spark-side;
    engine RNGs differ so this is a rows-only check (no oracle)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.sample(fraction=0.1, seed=42).select("l_orderkey", "l_linenumber")


def values_inline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inline VALUES list (reference README.md:74 insert/select path)."""
    return sql_op(
        """
        SELECT id, name FROM VALUES (1, 'duck'), (2, 'spark'), (3, NULL) AS t(id, name)
        """
    )(spark, sf_dir)


VALUES_INLINE_ORACLE = """
SELECT id, name FROM (VALUES (1, 'duck'), (2, 'spark'), (3, NULL)) t(id, name)
"""


QUERIES = {
    "join_inner": join_inner,
    "join_left": join_left,
    "join_right": join_right,
    "join_full": join_full,
    "join_semi": join_semi,
    "join_anti": join_anti,
    "join_cross": join_cross,
    "join_theta": join_theta,
    "join_using": join_using_natural,
    "setop_union_all": setop_union_all,
    "setop_union_distinct": setop_union_distinct,
    "setop_intersect": setop_intersect,
    "setop_except_all": setop_except_all,
    "sort_limit_offset": sort_limit_offset,
    "sort_nulls_first": sort_nulls_first,
    "subquery_scalar": subquery_scalar,
    "subquery_in": subquery_in,
    "subquery_correlated": subquery_correlated,
    "cte_chain": cte_chain,
    "distinct_on": distinct_on,
    "distinct_on_sql": distinct_on_sql,
    "from_first_sql": from_first_sql,
    "quoted_idents_sql": quoted_idents_sql,
    "raw_literal_sql": raw_literal_sql,
    "infix_ops_sql": infix_ops_sql,
    "fn_shim_scalars_sql": fn_shim_scalars_sql,
    "fn_shim_aggs_sql": fn_shim_aggs_sql,
    "query_shapes_sql": query_shapes_sql,
    "window_shapes_sql": window_shapes_sql,
    "fn_shim_embedding_sql": fn_shim_embedding_sql,
    "dialect_probe_sql": dialect_probe_sql,
    "date_arith_cols_sql": date_arith_cols_sql,
    "window_spec_copy_sql": window_spec_copy_sql,
    "unnest_tvf_sql": unnest_tvf_sql,
    "positional_ref_sql": positional_ref_sql,
    "pivot_stmt_sql": pivot_stmt_sql,
    "unpivot_stmt_sql": unpivot_stmt_sql,
    "qualify": qualify_idiom,
    "sample_deterministic": sample_deterministic,
    "sample_bernoulli": sample_bernoulli,
    "values_inline": values_inline,
}

ORACLE = {
    "join_inner": JOIN_INNER_ORACLE,
    "join_left": JOIN_LEFT_ORACLE,
    "join_right": JOIN_RIGHT_ORACLE,
    "join_full": JOIN_FULL_ORACLE,
    "join_semi": JOIN_SEMI_ORACLE,
    "join_anti": JOIN_ANTI_ORACLE,
    "join_cross": JOIN_CROSS_ORACLE,
    "join_theta": JOIN_THETA_ORACLE,
    "join_using": JOIN_USING_ORACLE,
    "setop_union_all": SETOP_UNION_ALL_ORACLE,
    "setop_union_distinct": SETOP_UNION_DISTINCT_ORACLE,
    "setop_intersect": SETOP_INTERSECT_ORACLE,
    "setop_except_all": SETOP_EXCEPT_ALL_ORACLE,
    "sort_limit_offset": SORT_LIMIT_OFFSET_ORACLE,
    "sort_nulls_first": SORT_NULLS_FIRST_ORACLE,
    "subquery_scalar": SUBQUERY_SCALAR_ORACLE,
    "subquery_in": SUBQUERY_IN_ORACLE,
    "subquery_correlated": SUBQUERY_CORRELATED_ORACLE,
    "cte_chain": CTE_CHAIN_ORACLE,
    "distinct_on": DISTINCT_ON_ORACLE,
    "distinct_on_sql": DISTINCT_ON_SQL_TEXT,
    "from_first_sql": FROM_FIRST_SQL_TEXT,
    "quoted_idents_sql": QUOTED_IDENTS_SQL_TEXT,
    "raw_literal_sql": RAW_LITERAL_SQL_TEXT,
    "infix_ops_sql": INFIX_OPS_SQL_TEXT,
    "fn_shim_scalars_sql": FN_SHIM_SCALARS_SQL_TEXT,
    "fn_shim_aggs_sql": FN_SHIM_AGGS_SQL_TEXT,
    "query_shapes_sql": QUERY_SHAPES_SQL_TEXT,
    "window_shapes_sql": WINDOW_SHAPES_SQL_TEXT,
    "fn_shim_embedding_sql": FN_SHIM_EMBEDDING_SQL_TEXT,
    "dialect_probe_sql": DIALECT_PROBE_SQL_TEXT,
    "date_arith_cols_sql": DATE_ARITH_COLS_SQL_TEXT,
    "window_spec_copy_sql": WINDOW_SPEC_COPY_SQL_TEXT,
    "unnest_tvf_sql": UNNEST_TVF_SQL_TEXT,
    "positional_ref_sql": POSITIONAL_REF_SQL_TEXT,
    "pivot_stmt_sql": PIVOT_STMT_SQL_TEXT,
    "unpivot_stmt_sql": UNPIVOT_STMT_SQL_TEXT,
    "qualify": QUALIFY_ORACLE,
    "sample_deterministic": SAMPLE_DETERMINISTIC_ORACLE,
    "values_inline": VALUES_INLINE_ORACLE,
}


def recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4.0+ WITH RECURSIVE; DuckDB 1.0 native):
    integer series driving a mod-bucket aggregation over orders."""
    return sql_op(
        """
        WITH RECURSIVE buckets(b) AS (
          SELECT 0
          UNION ALL
          SELECT b + 1 FROM buckets WHERE b < 9
        )
        SELECT b, count(o_orderkey) AS n
        FROM buckets LEFT JOIN orders ON o_orderkey % 10 = b
        GROUP BY b
        """
    )(spark, sf_dir)


RECURSIVE_CTE_ORACLE = """
WITH RECURSIVE buckets(b) AS (
  SELECT 0
  UNION ALL
  SELECT b + 1 FROM buckets WHERE b < 9
)
SELECT b, count(o_orderkey) AS n
FROM buckets LEFT JOIN orders ON o_orderkey % 10 = b
GROUP BY b
"""


def lateral_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL derived-table join (correlated values per outer row)."""
    return sql_op(
        """
        SELECT c_custkey, seg_upper, bal2
        FROM customer,
        LATERAL (SELECT upper(c_mktsegment) AS seg_upper, c_acctbal * 2 AS bal2)
        """
    )(spark, sf_dir)


LATERAL_JOIN_ORACLE = """
SELECT c_custkey, seg_upper, bal2
FROM customer,
LATERAL (SELECT upper(c_mktsegment) AS seg_upper, c_acctbal * 2 AS bal2) t
"""


def union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION BY NAME (column-matching union; DF API unionByName)."""
    orders = load_table(spark, sf_dir, "orders")
    a = orders.select("o_orderkey", "o_totalprice").limit(0).union(
        orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey", "o_totalprice")
    )
    b = orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_totalprice"), F.col("o_orderkey")
    )
    return a.unionByName(b)


UNION_BY_NAME_ORACLE = """
SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderstatus = 'F'
UNION ALL BY NAME
SELECT o_totalprice, o_orderkey FROM orders WHERE o_orderstatus = 'O'
"""


def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    a = li.select("l_suppkey")
    b = li.filter(F.col("l_returnflag") == "R").select("l_suppkey")
    return a.intersectAll(b)


SETOP_INTERSECT_ALL_ORACLE = """
SELECT l_suppkey FROM lineitem
INTERSECT ALL
SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'
"""

QUERIES.update({
    "recursive_cte": recursive_cte,
    "lateral_join": lateral_join,
    "union_by_name": union_by_name,
    "setop_intersect_all": setop_intersect_all,
})

ORACLE.update({
    "recursive_cte": RECURSIVE_CTE_ORACLE,
    "lateral_join": LATERAL_JOIN_ORACLE,
    "union_by_name": UNION_BY_NAME_ORACLE,
    "setop_intersect_all": SETOP_INTERSECT_ALL_ORACLE,
})


def join_positional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DuckDB POSITIONAL JOIN semantics (pair rows of two relations by
    position), made order-deterministic by sorting each side first and
    scale-safe via RDD zipWithIndex — which computes per-partition
    offsets with one lightweight count job instead of collapsing to a
    single partition the way a global row_number window would. The
    oracle expresses the same pairing with row_number windows (DuckDB's
    POSITIONAL JOIN itself doesn't guarantee subquery order)."""
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name").orderBy("n_nationkey")
    region = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name").orderBy("r_regionkey")

    def with_pos(df):
        rdd = df.rdd.zipWithIndex().map(lambda t: (*t[0], t[1] + 1))
        return spark.createDataFrame(rdd, df.schema.add("pos", "long"))

    a = with_pos(nation)
    b = with_pos(region)
    # inner positional join truncates to the shorter side, like DuckDB's
    # POSITIONAL JOIN padding rule inverted — keep INNER for a
    # deterministic oracle (5 region rows pair with the first 5 nations)
    return (
        a.join(b, "pos")
        .select("pos", "n_nationkey", "n_name", "r_regionkey", "r_name")
    )


JOIN_POSITIONAL_ORACLE = """
WITH a AS (
  SELECT row_number() OVER (ORDER BY n_nationkey) AS pos, n_nationkey, n_name
  FROM nation
),
b AS (
  SELECT row_number() OVER (ORDER BY r_regionkey) AS pos, r_regionkey, r_name
  FROM region
)
SELECT a.pos, n_nationkey, n_name, r_regionkey, r_name
FROM a JOIN b USING (pos)
"""

QUERIES["join_positional"] = join_positional
ORACLE["join_positional"] = JOIN_POSITIONAL_ORACLE
