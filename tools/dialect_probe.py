"""Dialect gap prober (round 10): run a battery of real DuckDB
statements through BOTH the engine's query path and live DuckDB and
diff the results. Purpose: systematically surface the remaining
dialect gaps a reference user would hit, instead of guessing.

Usage: python tools/dialect_probe.py [filter-substring]
Prints one line per probe: PASS / MISMATCH / ENGINE_ERR / DUCK_ERR.
DUCK_ERR rows are probes the local DuckDB build itself rejects — they
are dropped from the gap list (not part of the reference surface).
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

import duckdb  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

# The ONE documented-divergence list (round 11, VERDICT r10 item 6):
# probes named here are EXPECTED to differ from live DuckDB, each with
# its pinned reason — everything else in the battery must match
# byte-for-byte, and tests/test_dialect_gate.py fails loudly if a
# previously-passing probe regresses.
EXPECTED_DIVERGENCES = {
    "div_zero": (
        "deliberate: ANSI mode raises loudly on integer division by "
        "zero where duck returns NULL — repo never-silent convention"
    ),
    "fdiv_zero": (
        "deliberate: ANSI mode raises loudly on float division by zero "
        "where duck returns NULL"
    ),
    "ident_case_lower_typed": (
        "documented (narrowed round 13): stored-case result headers are "
        "closed for refs typed with any uppercase letter (probe "
        "ident_case_output) AND for all-lowercase refs in any statement "
        "some pass already schema-probed — the shared per-statement "
        "probe cache makes that restoration free (probes "
        "ident_case_lower_cached / ident_case_lower_probed PASS); the "
        "residue is an all-lowercase ref in a statement NOTHING probed, "
        "where closing it would add a schema analysis to every bare "
        "SELECT for a corner duck clients essentially never hit"
    ),
    "struct_dbl_to_str_cast": (
        "documented (round 13): struct/list/map COLUMN→VARCHAR duck-"
        "text is closed for all leaf types whose SCALAR rendering "
        "already matches (probes struct_col_to_str_cast, "
        "list_col_to_str_cast, map_col_to_str_cast, nested/NULL "
        "variants PASS via the expression-type probe + recursive "
        "concat template); a DOUBLE/FLOAT leaf keeps Spark rendering "
        "because the scalar text itself diverges (duck 1e-07 vs Spark "
        "1.0E-7 — same class as the documented scalar float rendering). "
        "The wire path renders duck-text for RESULT values either way "
        "(engine/types.py)"
    ),
}

# (name, sql) — every probe is a SELECT DuckDB runs verbatim.
PROBES = [
    # ---- operators & literals ----
    ("int_div", "SELECT 7 // 2 AS a, -7 // 2 AS b"),
    ("pow_caret", "SELECT 2 ^ 10 AS a"),
    ("pow_star2", "SELECT 2 ** 10 AS a"),
    ("mod_op", "SELECT 7 % 3 AS a, -7 % 3 AS b"),
    ("concat_pipes", "SELECT 'a' || 'b' || NULL AS a"),
    ("is_distinct", "SELECT 1 IS DISTINCT FROM NULL AS a, NULL IS NOT DISTINCT FROM NULL AS b"),
    ("regex_tilde", "SELECT 'abc' ~ 'b.' AS a, 'abc' !~ 'z' AS b"),
    ("like_ops", "SELECT 'abc' ~~ 'a%' AS a, 'abc' !~~ 'z%' AS b"),
    ("ilike", "SELECT 'ABC' ILIKE 'a%' AS a"),
    ("similar_to", "SELECT 'abc' SIMILAR TO 'a(b|z)c' AS a"),
    ("glob_op", "SELECT 'abc' GLOB 'a*' AS a"),
    ("between_not", "SELECT 5 NOT BETWEEN 1 AND 3 AS a"),
    ("bitstring_lit", "SELECT '101'::BIT AS a"),
    ("blob_lit", "SELECT '\\xAA'::BLOB IS NOT NULL AS a"),
    ("escape_str", "SELECT e'a\\tb' AS a"),
    ("dollar_str", "SELECT $$ab'c$$ AS a"),
    ("num_underscore", "SELECT 1_000_000 AS a"),
    ("hex_lit", "SELECT 0xFF AS a"),
    # ---- list/array semantics ----
    ("list_index_1based", "SELECT ([10,20,30])[1] AS a, ([10,20,30])[-1] AS b"),
    ("list_slice", "SELECT ([1,2,3,4,5])[2:4] AS a"),
    ("str_index", "SELECT ('abcde')[2] AS a"),
    ("str_slice", "SELECT ('abcde')[2:4] AS a"),
    ("list_comprehension", "SELECT [x * 2 FOR x IN [1, 2, 3] IF x > 1] AS a"),
    ("lambda_arrow", "SELECT list_transform([1,2,3], x -> x + 1) AS a"),
    ("lambda_filter", "SELECT list_filter([1,2,3,4], x -> x % 2 = 0) AS a"),
    ("lambda_reduce", "SELECT list_reduce([1,2,3,4], (a, b) -> a + b) AS a"),
    ("lambda_two_arg", "SELECT list_transform([10,20], (x, i) -> x + i) AS a"),
    ("flatten", "SELECT flatten([[1,2],[3]]) AS a"),
    ("list_zip", "SELECT list_zip([1,2],[3,4]) IS NOT NULL AS a"),
    ("range_scalar", "SELECT range(1, 4) AS a"),
    ("list_value", "SELECT list_value(1,2,3) AS a"),
    ("array_indexing_chain", "SELECT [[1,2],[3,4]][2][1] AS a"),
    ("list_contains_op", "SELECT 2 IN (SELECT unnest([1,2,3])) AS a"),
    ("list_any_all", "SELECT 2 = ANY([1,2,3]) AS a"),
    # ---- struct/map ----
    ("struct_dot", "SELECT ({'a': 1, 'b': 2}).a AS a"),
    ("struct_star", "SELECT s.* FROM (SELECT {'a': 1, 'b': 2} AS s)"),
    ("map_literal_access", "SELECT (MAP {'k': 5})['k'] AS a"),
    ("map_fn", "SELECT map([1,2],[10,20])[2] AS a"),
    ("row_fn", "SELECT row(1, 'x') IS NOT NULL AS a"),
    # ---- strings ----
    ("printf", "SELECT printf('%d-%s', 7, 'x') AS a"),
    ("format_fn", "SELECT format('{}-{}', 1, 'b') AS a"),
    ("repeat_str", "SELECT repeat('ab', 3) AS a"),
    ("str_split_regex", "SELECT string_split_regex('a1b2c', '[0-9]') AS a"),
    ("regexp_extract_grp", "SELECT regexp_extract('2023-07-05', '(\\d+)-(\\d+)', 2) AS a"),
    ("regexp_extract_named", "SELECT regexp_extract('ab12', '(?P<L>[a-z]+)(?P<D>[0-9]+)', ['L','D']) AS a"),
    ("regexp_matches", "SELECT regexp_matches('abc', 'b') AS a"),
    ("regexp_replace_g", "SELECT regexp_replace('aaa', 'a', 'b', 'g') AS a"),
    ("regexp_extract_all", "SELECT regexp_extract_all('a1b2', '[0-9]') AS a"),
    ("left_right", "SELECT left('abcde', 2) AS a, right('abcde', 2) AS b"),
    ("strpos", "SELECT strpos('hello', 'll') AS a, instr('hello', 'll') AS b"),
    ("translate", "SELECT translate('abc', 'ab', 'xy') AS a"),
    ("ascii_chr", "SELECT ascii('A') AS a, chr(66) AS b"),
    ("to_base", "SELECT to_base(255, 16) AS a"),
    ("bar_fn", "SELECT length(bar(3, 0, 10, 10)) > 0 AS a"),
    ("md5_hex", "SELECT md5('x') AS a"),
    ("sha256_hex", "SELECT sha256('x') AS a"),
    ("hash_fn", "SELECT hash('x') IS NOT NULL AS a"),
    ("levenshtein", "SELECT levenshtein('kitten', 'sitting') AS a"),
    ("unicode_fn", "SELECT unicode('€') AS a"),
    ("strip_accents", "SELECT strip_accents('âé') AS a"),
    ("nfc_normalize", "SELECT nfc_normalize('ö') = 'ö' AS a"),
    ("parse_path", "SELECT parse_filename('/a/b/c.txt') AS a, parse_dirname('/a/b/c.txt') AS b"),
    ("url_codec", "SELECT url_encode('a b') AS a, url_decode('a%20b') AS b"),
    # ---- dates/times ----
    ("date_plus_int", "SELECT DATE '2024-01-31' + 1 AS a"),
    ("date_minus_date", "SELECT DATE '2024-02-10' - DATE '2024-02-01' AS a"),
    ("date_minus_date_col", "SELECT event_id, d2 - d1 AS days FROM (SELECT event_id, CAST(ts AS DATE) AS d1, CAST(ts + INTERVAL 3 DAY AS DATE) AS d2 FROM events) t ORDER BY event_id LIMIT 5"),
    ("date_minus_date_col_qual", "SELECT t.event_id, t.d2 - t.d1 AS days FROM (SELECT event_id, CAST(ts AS DATE) AS d1, CAST(ts + INTERVAL 10 DAY AS DATE) AS d2 FROM events) t ORDER BY t.event_id LIMIT 5"),
    ("date_minus_lit_col_mixed", "SELECT event_id, d1 - DATE '2024-01-01' AS days, DATE '2026-01-01' - d1 AS days2 FROM (SELECT event_id, CAST(ts AS DATE) AS d1 FROM events) t ORDER BY event_id LIMIT 5"),
    ("date_minus_date_col_cte", "WITH c AS (SELECT event_id, CAST(ts AS DATE) AS d1, CAST(ts + INTERVAL 7 DAY AS DATE) AS d2 FROM events) SELECT event_id, d2 - d1 AS days FROM c ORDER BY event_id LIMIT 5"),
    ("ts_minus_ts_col", "SELECT event_id, (ts + INTERVAL 90 MINUTE) - ts AS iv FROM events ORDER BY event_id LIMIT 3"),
    ("ts_minus_ts_bare_cols", "SELECT event_id, t2 - t1 AS iv FROM (SELECT event_id, ts AS t1, ts + INTERVAL 90 MINUTE AS t2 FROM events) x ORDER BY event_id LIMIT 3"),
    ("interval_arith", "SELECT DATE '2024-01-31' + INTERVAL 1 MONTH AS a"),
    ("interval_str", "SELECT TIMESTAMP '2024-01-01 00:00:00' + INTERVAL '90 minutes' AS a"),
    ("extract_parts", "SELECT extract(epoch FROM TIMESTAMP '2024-01-02 03:04:05') AS a, extract(dow FROM DATE '2024-01-07') AS b, extract(isodow FROM DATE '2024-01-07') AS c"),
    ("date_part_list", "SELECT date_part(['year','month'], DATE '2024-05-06') AS a"),
    ("make_date", "SELECT make_date(2024, 2, 29) AS a, make_timestamp(2024,1,2,3,4,5.5) AS b"),
    ("epoch_fns", "SELECT epoch_ms(TIMESTAMP '2024-01-01 00:00:01') AS a, to_timestamp(86400) AS b"),
    ("time_type", "SELECT TIME '13:14:15' AS a"),
    ("age_fn", "SELECT age(TIMESTAMP '2024-03-15', TIMESTAMP '2024-01-10') IS NOT NULL AS a"),
    ("date_trunc_week", "SELECT date_trunc('week', DATE '2024-01-10') AS a"),
    ("last_day", "SELECT last_day(DATE '2024-02-10') AS a"),
    ("monthname", "SELECT monthname(DATE '2024-02-10') AS a, dayname(DATE '2024-02-12') AS b"),
    ("time_bucket", "SELECT time_bucket(INTERVAL '15 minutes', TIMESTAMP '2024-01-01 00:37:00') AS a"),
    ("generate_ts_series", "SELECT count(*) AS a FROM generate_series(TIMESTAMP '2024-01-01', TIMESTAMP '2024-01-02', INTERVAL '1 hour')"),
    ("at_time_zone", "SELECT (TIMESTAMP '2024-01-01 12:00:00' AT TIME ZONE 'UTC') IS NOT NULL AS a"),
    ("strftime_pct", "SELECT strftime(DATE '2024-02-05', '%Y/%m/%d %a') AS a"),
    ("strptime_pct", "SELECT strptime('05.02.2024', '%d.%m.%Y') AS a"),
    ("iso_year_week", "SELECT isoyear(DATE '2021-01-01') AS a, weekofyear(DATE '2021-01-01') AS b"),
    # ---- casts/types ----
    ("try_cast", "SELECT TRY_CAST('xx' AS INT) AS a"),
    ("cast_bool_int", "SELECT TRUE::INT AS a, 1::BOOL AS b"),
    ("uhugeint", "SELECT 1::HUGEINT + 1 AS a"),
    ("utinyint", "SELECT 200::UTINYINT AS a"),
    ("decimal_prec", "SELECT 1.5::DECIMAL(12,3) * 2 AS a"),
    ("implicit_str_num", "SELECT '5' + 2 AS a"),
    ("uuid_cast", "SELECT 'a0eebc99-9c0b-4ef8-bb6d-6bb9bd380a11'::UUID IS NOT NULL AS a"),
    ("enum_type", "SELECT 'happy'::ENUM('sad','ok','happy') AS a"),
    ("bool_sum", "SELECT sum(CASE WHEN TRUE THEN 1 ELSE 0 END) AS a"),
    ("typeof", "SELECT typeof(1::SMALLINT) AS a"),
    # ---- aggregates ----
    ("agg_min_n", "SELECT min(o_totalprice, 3) AS a FROM orders"),
    ("agg_arg_max_n", "SELECT arg_max(o_orderkey, o_totalprice, 2) AS a FROM orders"),
    ("agg_histogram", "SELECT histogram(r_regionkey) IS NOT NULL AS a FROM region"),
    ("agg_bit", "SELECT bit_and(7) AS a, bit_or(1) AS b, bit_xor(3) AS c FROM range(1)"),
    ("agg_bool", "SELECT bool_and(r_regionkey >= 0) AS a, bool_or(r_regionkey > 3) AS b FROM region"),
    ("agg_product", "SELECT product(x) AS a FROM (SELECT unnest([1.0,2.0,3.0]) x)"),
    ("agg_string_agg_order", "SELECT string_agg(r_name, ',' ORDER BY r_name DESC) AS a FROM region"),
    ("agg_list_order", "SELECT list(r_name ORDER BY r_name) AS a FROM region"),
    ("agg_any_value", "SELECT any_value(r_name ORDER BY r_regionkey) AS a FROM region"),
    ("agg_entropy", "SELECT round(entropy(r_regionkey), 6) AS a FROM region"),
    ("agg_kurtosis", "SELECT round(kurtosis(o_totalprice), 4) AS a FROM orders"),
    ("agg_mad", "SELECT mad(r_regionkey) AS a FROM region"),
    ("agg_mode", "SELECT mode(o_orderpriority) AS a FROM orders"),
    ("agg_quantile_disc", "SELECT quantile_disc(o_totalprice, 0.5) AS a FROM orders"),
    ("agg_quantile_list", "SELECT quantile_cont(o_totalprice, [0.25, 0.75]) AS a FROM orders"),
    ("agg_favg", "SELECT round(favg(o_totalprice), 4) AS a FROM orders"),
    ("agg_count_no_args", "SELECT count() AS a FROM region"),
    ("distinct_agg_order", "SELECT count(DISTINCT o_orderpriority) AS a FROM orders"),
    # ---- window extras ----
    ("win_exclude", "SELECT r_regionkey, sum(r_regionkey) OVER (ORDER BY r_regionkey ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE CURRENT ROW) AS a FROM region ORDER BY r_regionkey"),
    ("win_named", "SELECT r_regionkey, sum(r_regionkey) OVER w AS a FROM region WINDOW w AS (ORDER BY r_regionkey) ORDER BY r_regionkey"),
    ("win_groups_frame", "SELECT r_regionkey, count(*) OVER (ORDER BY r_regionkey GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW) AS a FROM region ORDER BY r_regionkey"),
    ("win_filter", "SELECT r_regionkey, count(*) FILTER (r_regionkey > 1) OVER (ORDER BY r_regionkey) AS a FROM region ORDER BY r_regionkey"),
    # ---- query shapes ----
    ("group_by_all", "SELECT o_orderpriority, count(*) AS c FROM orders GROUP BY ALL ORDER BY ALL"),
    ("select_no_from", "SELECT 42 AS a"),
    ("values_from", "SELECT * FROM (VALUES (1, 'a'), (2, 'b')) t(x, y) ORDER BY x"),
    ("positional_params", "SELECT #1 FROM (SELECT 5 AS x)"),
    ("positional_in_cte", "WITH a AS (SELECT 5 AS x, 6 AS y), b AS (SELECT #2 FROM a) SELECT * FROM b"),
    ("positional_in_first_cte", "WITH a AS (SELECT #1 FROM (SELECT 7 AS z)) SELECT * FROM a"),
    ("order_positional", "SELECT r_name, r_regionkey FROM region ORDER BY 2 DESC LIMIT 2"),
    ("group_positional", "SELECT o_orderpriority, count(*) AS c FROM orders GROUP BY 1 ORDER BY 1"),
    ("limit_pct", "SELECT count(*) AS a FROM (SELECT * FROM region LIMIT 40%)"),
    ("offset_no_limit", "SELECT r_regionkey FROM region ORDER BY r_regionkey OFFSET 3"),
    ("distinct_on_multi", "SELECT DISTINCT ON (o_orderpriority) o_orderpriority, o_orderkey FROM orders ORDER BY o_orderpriority, o_orderkey"),
    ("cte_materialized", "WITH c AS MATERIALIZED (SELECT 1 AS x) SELECT * FROM c"),
    ("cte_not_materialized", "WITH c AS NOT MATERIALIZED (SELECT 1 AS x) SELECT * FROM c"),
    ("nested_corr_subq", "SELECT r_name FROM region r WHERE EXISTS (SELECT 1 FROM nation n WHERE n.n_regionkey = r.r_regionkey AND n.n_nationkey > 20) ORDER BY r_name"),
    ("in_subquery_tuple", "SELECT count(*) AS a FROM nation WHERE (n_regionkey) IN (SELECT r_regionkey FROM region WHERE r_regionkey < 2)"),
    ("table_star_count", "SELECT count(region.*) AS a FROM region"),
    ("select_table_star", "SELECT region.* FROM region ORDER BY r_regionkey LIMIT 1"),
    ("unnest_struct", "SELECT unnest({'a': 1, 'b': 2}) "),
    ("unnest_recursive", "SELECT unnest([{'a': 1}, {'a': 2}], recursive := true) ORDER BY 1"),
    ("named_args", "SELECT round(3.14159, 2) AS a"),
    ("describe_select", "SELECT count(*) > 0 AS a FROM (DESCRIBE SELECT 1 AS x)"),
    ("from_first_where", "FROM region WHERE r_regionkey < 2 SELECT r_name ORDER BY r_name"),
    ("join_using_multi", "SELECT count(*) AS a FROM nation n JOIN nation m USING (n_regionkey, n_nationkey)"),
    ("cross_lateral", "SELECT r_regionkey, x FROM region, LATERAL (SELECT r_regionkey * 2 AS x) ORDER BY r_regionkey"),
    ("tablesample_bernoulli", "SELECT count(*) >= 0 AS a FROM orders TABLESAMPLE 10%"),
    ("exists_anti", "SELECT count(*) AS a FROM region r ANTI JOIN nation n ON r.r_regionkey = n.n_regionkey"),
    # ---- TVFs / catalog fns ----
    ("repeat_tvf", "SELECT count(*) AS a FROM repeat('x', 5)"),
    ("unnest_tvf_pos", "SELECT * FROM unnest([1,2,3]) ORDER BY 1"),
    ("glob_tvf", "SELECT count(*) >= 0 AS a FROM glob('/tmp/*')"),
    ("current_schemas", "SELECT current_schema() IS NOT NULL AS a"),
    ("txid", "SELECT txid_current() >= 0 AS a"),
    # ---- misc scalar fns ----
    ("coalesce_chain", "SELECT coalesce(NULL, NULL, 3) AS a, ifnull(NULL, 2) AS b, nullif(2, 2) AS c"),
    ("if_3arg", "SELECT if(1 > 0, 'y', 'n') AS a"),
    ("greatest_null", "SELECT greatest(1, NULL, 3) AS a, least(NULL, NULL) AS b"),
    ("div_zero", "SELECT 1 / 0 AS a"),
    ("fdiv_zero", "SELECT 1.0 / 0 AS a"),
    ("divide_fn", "SELECT divide(7, 2) AS a, fdiv(7, 2) AS b, fmod(7, 2.5) AS c"),
    ("gamma_fns", "SELECT round(gamma(5), 6) AS a, round(lgamma(5), 6) AS b"),
    ("even_fn", "SELECT even(2.5) AS a"),
    ("signbit", "SELECT signbit(-0.0) AS a"),
    ("cot_fn", "SELECT round(cot(1), 6) AS a"),
    ("bit_count", "SELECT bit_count(7::INT) AS a"),
    ("xor_fn", "SELECT xor(5, 3) AS a"),
    ("setseed", "SELECT setseed(0.5) IS NULL AS a"),
    ("random_bounds", "SELECT random() BETWEEN 0 AND 1 AS a"),
    ("uuid_fn", "SELECT length(uuid()::VARCHAR) AS a"),
    ("constant_pi", "SELECT round(pi(), 6) AS a"),
    ("alias_fn", "SELECT alias(42) IS NOT NULL AS a"),
    ("can_cast", "SELECT try_cast('5' AS INT) IS NOT NULL AS a"),
    ("case_no_else", "SELECT CASE WHEN 1 = 2 THEN 'x' END AS a"),
    ("in_list_null", "SELECT (NULL IN (1, 2)) IS NULL AS a"),
    # ---- round-10 session-5 surface (each landed this session) ----
    ("json_arrow", "SELECT '{\"a\": {\"b\": 2}}'::JSON->'a'->>'b' AS a"),
    ("json_arrow_idx", "SELECT '[5,6]'::JSON->>1 AS a"),
    ("agg_order_by_list", "SELECT list(r_name ORDER BY r_regionkey DESC) AS a FROM region"),
    ("agg_order_by_last", "SELECT last(r_name ORDER BY r_regionkey) AS a FROM region"),
    ("comprehension", "SELECT [x * 2 FOR x IN [1,2,3] IF x > 1] AS a"),
    ("multi_unnest_zip", "SELECT unnest([1,2,3]) AS u, unnest([10,20]) AS v"),
    ("unnest_struct_cols", "SELECT unnest({'a': 1, 'b': 'x'})"),
    ("filter_over_window", "SELECT r_regionkey, count(*) FILTER (r_regionkey > 1) OVER (ORDER BY r_regionkey) AS a FROM region ORDER BY r_regionkey"),
    ("window_exclude_sum", "SELECT r_regionkey, sum(r_regionkey) OVER (ORDER BY r_regionkey ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE CURRENT ROW) AS a FROM region ORDER BY r_regionkey"),
    ("repeat_tvf2", "SELECT count(*) AS a FROM repeat('x', 5)"),
    ("describe_in_from", "SELECT count(*) > 0 AS a FROM (DESCRIBE SELECT 1 AS x)"),
    ("limit_percent", "SELECT count(*) AS a FROM (SELECT * FROM region LIMIT 40%)"),
    ("any_over_list", "SELECT 2 = ANY([1,2,3]) AS a, 1 = ALL([1,2]) AS b"),
    ("quantile_family", "SELECT quantile_disc(r_regionkey, 0.5) AS a, quantile_cont(r_regionkey, 0.25) AS b FROM region"),
    ("mad_entropy", "SELECT mad(r_regionkey) AS a, round(entropy(r_regionkey), 6) AS b FROM region"),
    ("corrected_moments", "SELECT round(kurtosis(o_totalprice), 4) AS a, round(skewness(o_totalprice), 4) AS b FROM orders"),
    ("replace_first_only", "SELECT regexp_replace('aaa', 'a', 'b') AS a, regexp_replace('aaa', 'a', 'b', 'g') AS b"),
    ("raw_regex_literal", r"SELECT regexp_extract('x12', '(\d+)') AS a"),
    ("typeof_spellings", "SELECT typeof(1::SMALLINT) AS a, typeof('s') AS b"),
    ("comment_apostrophe", "SELECT regexp_matches('a1', '\\d') AS a, -- don't strip\n regexp_matches('b2', '\\d') AS b"),
    # ---- round-11 widening: string fns ----
    ("bin_hex", "SELECT bin(5::INT) AS a, hex(255) AS b"),
    ("split_part", "SELECT split_part('a,b,c', ',', 2) AS a, split_part('a,b', ',', 9) AS b"),
    ("position_in", "SELECT position('b' IN 'abc') AS a"),
    ("substr_neg", "SELECT substring('abcde', 2) AS a, substr('abcde', 2, 2) AS b"),
    ("pad_fns", "SELECT lpad('7', 3, '0') AS a, rpad('x', 4, '.') AS b"),
    ("trim_chars", "SELECT trim('xxaxx', 'x') AS a, ltrim('xxa', 'x') AS b, rtrim('axx', 'x') AS c"),
    ("reverse_str", "SELECT reverse('abc') AS a"),
    ("contains_fn", "SELECT contains('abc', 'b') AS a, list_contains([1,2], 2) AS b"),
    ("replace_fn", "SELECT replace('aaa', 'a', 'b') AS a"),
    ("concat_ws_nulls", "SELECT concat_ws('-', 'a', NULL, 'b') AS a"),
    ("like_escape", "SELECT 'a_c' LIKE 'a!_c' ESCAPE '!' AS a"),
    ("caseless", "SELECT upper('straße') AS a, lower('ÄB') AS b"),
    # ---- list fns ----
    ("list_aggregate_fn", "SELECT list_aggregate([1,2,3], 'sum') AS a, list_aggregate([3,1], 'min') AS b"),
    ("list_sum_avg", "SELECT list_sum([1,2,3]) AS a, round(list_avg([1.0,2,3]), 6) AS b"),
    ("list_sort_params", "SELECT list_sort([3,1,2], 'DESC') AS a, list_reverse_sort([1,3,2]) AS b"),
    ("list_unique_fn", "SELECT list_unique([1,1,2,NULL]) AS a, array_sort(list_distinct([1,1,2])) AS b"),
    ("list_position_fn", "SELECT list_position([10,20], 20) AS a, list_contains([1,2], 3) AS b"),
    ("list_has_any_all", "SELECT list_has_any([1,2],[2,9]) AS a, list_has_all([1,2,3],[1,3]) AS b"),
    ("list_append_prepend", "SELECT list_append([1,2], 3) AS a, list_prepend(0, [1,2]) AS b"),
    ("array_slice_fn", "SELECT array_slice([1,2,3,4], 2, 3) AS a, list_slice('abcde', 2, 3) AS b"),
    ("list_reverse_fn", "SELECT list_reverse([1,2,3]) AS a"),
    ("list_reduce_fn", "SELECT list_reduce([1,2,3], (a, b) -> a * b) AS a"),
    ("len_of_list", "SELECT len([1,2,3]) AS a, array_length([1,2]) AS b"),
    ("range_negative", "SELECT range(5, 1, -2) AS a"),
    # ---- struct / map ----
    ("struct_insert_fn", "SELECT struct_insert({'a': 1}, b := 2) AS a"),
    ("struct_extract_fn", "SELECT struct_extract({'a': 7, 'b': 2}, 'a') AS a"),
    ("map_keys_values", "SELECT map_keys(MAP {'k': 1, 'j': 2}) AS a, map_values(MAP {'k': 1}) AS b"),
    ("map_entries_card", "SELECT cardinality(MAP {'k': 1, 'j': 2}) AS a"),
    ("map_from_entries_fn", "SELECT map_from_entries([{'k': 'a', 'v': 1}]) IS NOT NULL AS a"),
    ("struct_eq", "SELECT {'a': 1, 'b': 2} = {'a': 1, 'b': 2} AS a"),
    # ---- date/time ----
    ("date_diff_fn", "SELECT date_diff('day', DATE '2024-01-01', DATE '2024-03-01') AS a, datediff('month', DATE '2024-01-15', DATE '2024-03-01') AS b"),
    ("date_add_fn", "SELECT date_add(DATE '2024-01-31', INTERVAL 1 MONTH) AS a"),
    ("day_parts", "SELECT dayofyear(DATE '2024-03-01') AS a, quarter(DATE '2024-05-01') AS b, week(DATE '2024-01-05') AS c"),
    ("make_ts_ms", "SELECT make_timestamp(1704164645000000::BIGINT) AS a"),
    ("current_date_arith", "SELECT (current_date + 1) > current_date AS a"),
    ("greatest_dates", "SELECT greatest(DATE '2024-01-01', DATE '2023-01-01') AS a"),
    ("ts_precision", "SELECT TIMESTAMP '2024-01-01 01:02:03.456789' AS a"),
    # ---- JSON ----
    ("json_extract_path", "SELECT json_extract('{\"a\": {\"b\": [1, 2]}}', '$.a.b[1]') AS a"),
    ("json_extract_string", "SELECT json_extract_string('{\"a\": \"x\"}', '$.a') AS a"),
    ("json_array_length_fn", "SELECT json_array_length('[1,2,3]') AS a"),
    ("json_valid_fn", "SELECT json_valid('{\"a\":1}') AS a, json_valid('{nope') AS b"),
    ("json_keys_fn", "SELECT json_keys('{\"a\":1,\"b\":2}') AS a"),
    ("row_to_json", "SELECT to_json({'a': 1}) AS a"),
    # ---- casts & numerics ----
    ("str_to_int_round", "SELECT TRY_CAST('1.9' AS INT) AS a, CAST(' 5 ' AS INT) AS b"),
    ("lit_int_cast_round", "SELECT 2.5::INT AS a, 1.9::INT AS b, CAST(2.45 AS INT) AS c, '-1.5'::INT AS d"),
    ("col_int_cast_round", "SELECT CAST(x AS INT) AS a FROM (VALUES (1.9), (2.5), (-2.5), (3.5)) t(x)"),
    ("col_int_cast_round_dbl", "SELECT CAST(x AS INT) AS a, x::BIGINT AS b FROM (VALUES (CAST(2.5 AS DOUBLE)), (CAST(3.5 AS DOUBLE)), (CAST(-2.5 AS DOUBLE)), (CAST(1.9 AS DOUBLE))) t(x)"),
    ("col_int_cast_round_str", "SELECT CAST(x AS INT) AS a FROM (VALUES ('2.5'), ('1.9'), ('-2.5'), ('7')) t(x)"),
    ("col_int_cast_round_table", "SELECT o_orderkey, CAST(o_totalprice AS BIGINT) AS p FROM orders WHERE o_orderkey % 211 = 0 ORDER BY o_orderkey LIMIT 5"),
    ("expr_int_cast_round", "SELECT CAST(x + 0.0 AS INT) AS a FROM (VALUES (CAST(3.5 AS DOUBLE))) t(x)"),
    ("bool_spellings", "SELECT 'true'::BOOL AS a, 't'::BOOL AS b, '0'::BOOL AS c"),
    ("float_specials", "SELECT 'inf'::DOUBLE > 0 AS a, isnan('nan'::DOUBLE) AS b"),
    ("neg_zero", "SELECT -0.0 = 0.0 AS a"),
    ("round_half", "SELECT round(2.5) AS a, round(-2.5) AS b, round(2.345, 2) AS c"),
    ("ceil_floor_trunc", "SELECT ceil(1.2) AS a, floor(-1.2) AS b, trunc(-1.7) AS c"),
    ("log_fns", "SELECT round(log(100), 6) AS a, round(ln(exp(1)), 6) AS b, round(log2(8), 6) AS c"),
    ("int_overflow_guard", "SELECT 127::TINYINT + 0 AS a"),
    # ---- aggregates ----
    ("string_agg_distinct", "SELECT string_agg(DISTINCT x, ',' ORDER BY x) AS a FROM (VALUES ('b'), ('a'), ('b')) t(x)"),
    ("multi_col_distinct", "SELECT count(DISTINCT (o_orderpriority, o_orderstatus)) AS a FROM orders"),
    ("corr_covar", "SELECT round(corr(o_totalprice, o_orderkey), 6) AS a, round(covar_pop(o_totalprice, o_orderkey), 4) AS b FROM orders"),
    ("var_std", "SELECT round(var_pop(r_regionkey), 6) AS a, round(stddev_samp(r_regionkey), 6) AS b FROM region"),
    ("first_last_agg", "SELECT first(x ORDER BY x) AS a, last(x ORDER BY x) AS b, arbitrary(x) IS NOT NULL AS c FROM (VALUES (2), (1)) t(x)"),
    ("agg_list_structs", "SELECT list({'k': x} ORDER BY x) AS a FROM (VALUES (2), (1)) t(x)"),
    ("approx_quantile_fn", "SELECT approx_quantile(o_totalprice, 0.5) BETWEEN 1 AND 1e9 AS a FROM orders"),
    ("median_fn", "SELECT median(x) AS a FROM (VALUES (1), (2), (3), (4)) t(x)"),
    # ---- window extras ----
    ("win_ntile_pct", "SELECT r_regionkey, ntile(2) OVER (ORDER BY r_regionkey) AS a, round(percent_rank() OVER (ORDER BY r_regionkey), 6) AS b, round(cume_dist() OVER (ORDER BY r_regionkey), 6) AS c FROM region ORDER BY r_regionkey"),
    ("win_lead_default", "SELECT r_regionkey, lead(r_regionkey, 1, -1) OVER (ORDER BY r_regionkey) AS a FROM region ORDER BY r_regionkey"),
    ("win_first_ignore_nulls", "SELECT x, first_value(y IGNORE NULLS) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS a FROM (VALUES (1, NULL), (2, 'v'), (3, 'w')) t(x, y) ORDER BY x"),
    ("win_named_frame", "SELECT x, sum(x) OVER (w ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS a FROM (VALUES (1), (2), (3)) t(x) WINDOW w AS (ORDER BY x) ORDER BY x"),
    ("win_named_selfref", "SELECT x, sum(x) OVER (w ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS a FROM (VALUES (1), (2), (3)) t(x) WINDOW w AS (w ORDER BY x) ORDER BY x"),
    ("win_named_commalist", "SELECT x, sum(x) OVER (b ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS a FROM (VALUES (1), (2), (3)) t(x) WINDOW a AS (ORDER BY x DESC), b AS (ORDER BY x) ORDER BY x"),
    ("win_named_base_chain", "SELECT x, sum(x) OVER w2 AS a FROM (VALUES (1), (2), (3)) t(x) WINDOW w1 AS (ORDER BY x), w2 AS (w1 ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) ORDER BY x"),
    ("win_named_cycle", "SELECT x, sum(x) OVER (a ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS a FROM (VALUES (1), (2), (3)) t(x) WINDOW a AS (b ORDER BY x), b AS (a) ORDER BY x"),
    ("win_named_paren_ref", "SELECT x, sum(x) OVER (b) AS a FROM (VALUES (1), (2), (3)) t(x) WINDOW a AS (ORDER BY x), b AS (a) ORDER BY x"),
    ("win_named_paren_direct", "SELECT x, sum(x) OVER (a) AS a FROM (VALUES (1), (2), (3)) t(x) WINDOW a AS (ORDER BY x) ORDER BY x"),
    ("win_named_refine_shallow", "SELECT x, sum(x) OVER (b ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS a FROM (VALUES (1), (2), (3)) t(x) WINDOW a AS (ORDER BY x DESC), b AS (a) ORDER BY x"),
    ("win_named_copy_droppart", "SELECT x, y, sum(x) OVER (b) AS a FROM (VALUES (1, 1), (2, 1), (3, 2)) t(x, y) WINDOW a AS (PARTITION BY y ORDER BY x), b AS (a) ORDER BY x"),
    # ---- query shapes ----
    ("having_no_group", "SELECT count(*) AS c FROM region HAVING count(*) > 1"),
    ("order_by_all_desc", "SELECT r_regionkey % 2 AS m, r_regionkey FROM region ORDER BY ALL DESC"),
    ("select_exclude_replace", "SELECT * EXCLUDE (r_name) REPLACE (r_regionkey * 10 AS r_regionkey) FROM region ORDER BY r_regionkey LIMIT 2"),
    ("union_coercion", "SELECT 1 AS v UNION ALL SELECT 2.5 ORDER BY v"),
    ("exists_in_select", "SELECT r_regionkey, EXISTS (SELECT 1 FROM nation n WHERE n.n_regionkey = r.r_regionkey) AS has_n FROM region r ORDER BY r_regionkey"),
    ("scalar_subq_expr", "SELECT r_regionkey + (SELECT min(n_nationkey) FROM nation) AS a FROM region ORDER BY a LIMIT 2"),
    ("row_compare", "SELECT (1, 2) = (1, 2) AS a, (1, 2) < (1, 3) AS b"),
    ("grouping_fn", "SELECT o_orderpriority, grouping(o_orderpriority) AS g, count(*) AS c FROM orders GROUP BY ROLLUP (o_orderpriority) ORDER BY g, o_orderpriority NULLS FIRST LIMIT 3"),
    ("distinct_expr", "SELECT DISTINCT o_orderkey % 3 AS m FROM orders ORDER BY m"),
    ("nested_cte_reuse", "WITH a AS (SELECT 1 AS x), b AS (SELECT x + 1 AS y FROM a) SELECT y FROM b"),
    # ---- round-11 second discovery pass ----
    ("win_range_interval", "SELECT o_orderkey, count(*) OVER (ORDER BY o_orderdate RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW) AS c FROM orders WHERE o_orderkey % 500 = 0 ORDER BY o_orderkey"),
    ("collate_nocase", "SELECT 'ABC' COLLATE NOCASE = 'abc' AS a, 'ABC' COLLATE NOCASE AS v"),
    ("nested_comprehension", "SELECT [[y * 2 FOR y IN x] FOR x IN [[1], [2, 3]]] AS a"),
    ("interval_mult", "SELECT INTERVAL 2 DAY * 3 AS a"),
    ("interval_extract", "SELECT extract(day FROM INTERVAL '3 days 4 hours') AS a"),
    ("date_trunc_quarter", "SELECT date_trunc('quarter', DATE '2024-05-10') AS a"),
    ("is_true", "SELECT (1 = 1) IS TRUE AS a, (NULL = 1) IS NOT FALSE AS b"),
    ("null_order_agg", "SELECT string_agg(x, ',' ORDER BY x NULLS FIRST) AS a FROM (VALUES ('b'), (NULL), ('a')) t(x)"),
    ("count_if", "SELECT count_if(r_regionkey > 1) AS a FROM region"),
    ("lead_over_partition", "SELECT n_nationkey, lag(n_name, 2) OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) AS p FROM nation ORDER BY n_nationkey LIMIT 5"),
    ("array_agg_distinct", "SELECT array_sort(array_agg(DISTINCT n_regionkey)) AS a FROM nation"),
    ("substring_for", "SELECT substring('abcde' FROM 2 FOR 3) AS a"),
    ("case_expr_form", "SELECT CASE 2 WHEN 1 THEN 'a' WHEN 2 THEN 'b' END AS a"),
    ("values_ordered", "VALUES (2), (1) ORDER BY 1"),
    ("values_two_cols", "VALUES (2, 'b'), (1, 'a') ORDER BY 1 LIMIT 1"),
    ("select_from_values_alias", "FROM (VALUES (1, 'x')) t(a, b) SELECT b, a"),
    ("str_concat_num", "SELECT 'v' || 5 AS a"),
    ("grouping_sets_partial", "SELECT o_orderpriority, o_orderstatus, count(*) AS c FROM orders GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus)) ORDER BY 1 NULLS FIRST, 2 NULLS FIRST LIMIT 4"),
    ("window_rows_unbounded_short", "SELECT r_regionkey, sum(r_regionkey) OVER (ORDER BY r_regionkey ROWS UNBOUNDED PRECEDING) AS s FROM region ORDER BY r_regionkey"),
    ("negative_array_slice", "SELECT ([1,2,3,4,5])[-3:-2] AS a, ([1,2,3])[-9:-2] AS b, ([1,2,3,4,5])[2:-2] AS c"),
    ("string_neg_slice", "SELECT ('abcde')[-3:-2] AS a, ('abcde')[:-2] AS b, ('abcde')[-3:] AS c"),
    ("epoch_literal", "SELECT 'epoch'::TIMESTAMP AS a, CAST('epoch' AS TIMESTAMP) AS b"),
    ("epoch_literal_tz", "SELECT 'epoch'::TIMESTAMPTZ AS a, CAST('epoch' AS TIMESTAMPTZ) AS b, 'epoch'::TIMESTAMP WITH TIME ZONE AS c"),
    ("ts_compare_date", "SELECT TIMESTAMP '2024-01-01 05:00:00' > DATE '2024-01-01' AS a"),
    ("ident_case_output", "SELECT R_NAME FROM REGION ORDER BY R_NAME LIMIT 1"),
    ("ident_case_qualified", "SELECT region.R_NAME FROM region ORDER BY 1 LIMIT 1"),
    ("ident_case_lower_typed", "SELECT rname FROM (SELECT r_name AS RName FROM region) t ORDER BY 1 LIMIT 1"),
    # ---- round-11 third discovery pass ----
    ("math_family2", "SELECT round(atan2(1, 1), 6) AS a, round(degrees(pi()), 4) AS b, round(radians(180), 6) AS c, sign(-5) AS d, round(cbrt(27), 6) AS e"),
    ("factorial_gcd", "SELECT factorial(5) AS a, gcd(12, 18) AS b, gcd(0, 5) AS c, gcd(-12, 18) AS d, lcm(4, 6) AS e"),
    ("min_max_by", "SELECT min_by(r_name, r_regionkey) AS a, max_by(r_name, r_regionkey) AS b FROM region"),
    ("octet_length_fn", "SELECT octet_length('abc'::BLOB) AS a"),
    ("base64_fns", "SELECT base64('ab'::BLOB) AS a, from_base64('YWI=') = 'ab'::BLOB AS b"),
    ("encode_decode", "SELECT decode(encode('hé')) AS a, octet_length(encode('hé')) AS b"),
    ("format_bytes", "SELECT format_bytes(1024) AS a, format_bytes(1590) AS b, format_bytes(1126) AS c, format_bytes(0) AS d, format_bytes(1073741824) AS e, format_bytes(1023) AS f"),
    ("format_readable", "SELECT formatReadableDecimalSize(1000) AS a, formatReadableDecimalSize(999) AS b, formatReadableDecimalSize(1500000) AS c, formatReadableSize(1048576) AS d"),
    ("timezone_fn", "SELECT timezone('UTC', TIMESTAMP '2024-01-01 05:00:00') AS a"),
    ("century_millennium", "SELECT century(DATE '2024-01-01') AS a, century(DATE '2000-12-31') AS b, millennium(DATE '2024-01-01') AS c, era(DATE '2024-01-01') AS d, decade(DATE '2024-01-01') AS e"),
    ("julian_day", "SELECT julian(DATE '2024-01-01') AS a, julian(DATE '2000-01-01') AS b, julian(TIMESTAMP '2024-01-01 12:00:00') AS c"),
    ("timestamp_tz_cast", "SELECT TIMESTAMPTZ '2024-01-01 00:00:00+00' IS NOT NULL AS a"),
    ("list_concat_null", "SELECT list_concat([1], NULL) AS a, list_concat(NULL, [2]) AS b, list_concat(NULL, NULL) IS NULL AS c, list_concat([1], [2]) AS d"),
    ("list_any_value", "SELECT list_any_value([NULL, 3, 4]) AS a, list_any_value([NULL]) IS NULL AS b"),
    ("interval_ctors", "SELECT to_days(30) = INTERVAL 30 DAY AS a, to_hours(5) = INTERVAL 5 HOUR AS b, to_weeks(2) = INTERVAL 14 DAY AS c"),
    ("regex_escape", "SELECT regexp_escape('a.b[c]') AS a"),
    ("like_escape_fns", "SELECT like_escape('a_c', 'a!_c', '!') AS a, not_like_escape('a_c', 'a!_c', '!') AS b, ilike_escape('A_C', 'a!_c', '!') AS c"),
    ("nextafter_fn", "SELECT nextafter(1.0, 2.0) > 1.0 AS a, nextafter(1.0, 0.0) < 1.0 AS b"),
    ("current_localtime", "SELECT current_localtimestamp() IS NOT NULL AS a"),
    ("regr_family", "SELECT round(regr_slope(o_totalprice, o_orderkey), 8) IS NOT NULL AS a, regr_count(o_totalprice, o_orderkey) AS b FROM orders"),
    ("bool_agg_filter", "SELECT bool_and(r_regionkey < 3) FILTER (r_regionkey > 0) AS a FROM region"),
    ("ntile_tail", "SELECT ntile(7) OVER (ORDER BY r_regionkey) AS a FROM region ORDER BY r_regionkey"),
    # second review-pass pins (round 11)
    ("format_bytes_edge", "SELECT format_bytes(-1590) AS a, format_bytes(9223372036854775807) AS b"),
    ("lcm_big", "SELECT lcm(1099511627776, 1099511627776) AS a"),
    ("regexp_escape_nonword", "SELECT regexp_escape('a-b c/d') AS a"),
    ("bc_date_parts", "SELECT decade(make_date(-5,1,1)) AS a, century(make_date(-5,1,1)) AS b, millennium(make_date(-5,1,1)) AS c, century(make_date(-101,1,1)) AS d"),
    ("timezone_tz_overload", "SELECT timezone('America/New_York', TIMESTAMPTZ '2024-01-01 05:00:00+00') AS a"),
    ("keyword_alias", "SELECT #1 FROM region AS \"window\" ORDER BY 1 LIMIT 1"),
    # engine features previously gate-only, pinned into the battery
    ("from_first_select", "FROM region SELECT r_name ORDER BY r_name LIMIT 2"),
    ("from_first_bare", "FROM region ORDER BY r_regionkey LIMIT 1"),
    ("qualify_clause", "SELECT n_nationkey, n_regionkey FROM nation QUALIFY row_number() OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) = 1 ORDER BY n_nationkey"),
    ("union_by_name_probe", "SELECT r_regionkey AS k, r_name AS nm FROM region UNION ALL BY NAME SELECT n_name AS nm, n_regionkey AS k FROM nation WHERE n_nationkey < 3 ORDER BY k, nm"),
    ("asof_join_probe", "SELECT e.user_id, e.event_time, p.event_time AS asof_time FROM (SELECT user_id, event_time FROM events WHERE event_type = 'click' AND user_id % 97 = 0) e ASOF JOIN (SELECT user_id, event_time FROM events WHERE event_type = 'purchase') p ON e.user_id = p.user_id AND e.event_time >= p.event_time ORDER BY e.user_id, e.event_time"),
    ("summarize_shape", "SELECT count(*) > 0 AS a FROM (SUMMARIZE region)"),
    ("pivot_stmt_probe", "PIVOT (SELECT o_orderpriority, o_orderstatus FROM orders) ON o_orderstatus USING count(*) GROUP BY o_orderpriority ORDER BY o_orderpriority"),
    ("nested_comprehension2", "SELECT [x * 2 FOR x IN [y + 1 FOR y IN [1, 2, 3]]] AS a"),
    ("scalar_subq_in_case", "SELECT CASE WHEN (SELECT count(*) FROM region) > 3 THEN 'big' ELSE 'small' END AS a"),
    ("deep_struct_chain", "SELECT {'a': {'b': {'c': 7}}}.a.b.c AS v"),
    ("in_values_subq", "SELECT r_name FROM region WHERE r_regionkey IN (VALUES (0), (1)) ORDER BY r_name"),
    ("nth_last_value", "SELECT r_regionkey, nth_value(r_name, 2) OVER (ORDER BY r_regionkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS a, last_value(r_name) OVER (ORDER BY r_regionkey) AS b FROM region ORDER BY r_regionkey"),
    ("lag_ignore_nulls", "SELECT x, lag(y IGNORE NULLS) OVER (ORDER BY x) AS a FROM (VALUES (1, 'v'), (2, NULL), (3, 'w')) t(x, y) ORDER BY x"),
    ("intersect_all_dups", "SELECT x FROM (VALUES (1), (1), (2)) t(x) INTERSECT ALL SELECT x FROM (VALUES (1), (1), (1)) s(x) ORDER BY x"),
    ("in_null_semantics", "SELECT (1 IN (2, NULL)) IS NULL AS a, (1 NOT IN (2, NULL)) IS NULL AS b"),
    ("group_concat_default", "SELECT group_concat(x) AS a FROM (VALUES ('b'), ('a')) t(x)"),
    ("empty_group_aggs", "SELECT sum(x) AS a, count(x) AS b, bool_or(x > 1) AS c FROM (SELECT 1 AS x WHERE false)"),
    # ---- fifth discovery pass (round 12) ----
    ("method_chaining", "SELECT 'abc'.upper() AS a, [3,1,2].list_sort() AS b, ('x').length() AS c"),
    ("method_chain_args", "SELECT 'hello'.replace('l', 'L').left(4) AS a"),
    ("abs_at_operator", "SELECT @-5 AS a, @(3 - 10) AS b"),
    ("list_step_slice", "SELECT ([1,2,3,4,5,6])[1:6:2] AS a, ([1,2,3,4,5,6])[6:1:-2] AS b, ([1,2,3])[2:9:3] AS c"),
    ("str_to_list_cast", "SELECT '[1, 2, 3]'::INT[] AS a, '[a, b]'::VARCHAR[] AS b"),
    ("list_to_str_cast", "SELECT ([1,2,3])::VARCHAR AS a, ({'k': 1})::VARCHAR AS b, {'k': NULL, 's': 'a b', 'n': {'x': 1.5}}::VARCHAR AS c"),
    ("struct_col_to_str_cast", "SELECT s::VARCHAR AS a FROM (SELECT {'k': 1} AS s) t"),
    ("within_group_pct", "SELECT percentile_cont(0.5) WITHIN GROUP (ORDER BY r_regionkey) AS a, percentile_disc(0.25) WITHIN GROUP (ORDER BY r_regionkey DESC) AS b FROM region"),
    ("within_group_mode", "SELECT mode() WITHIN GROUP (ORDER BY n_regionkey) AS a FROM nation"),
    ("filter_where_kw", "SELECT count(*) FILTER (WHERE r_regionkey > 1) AS a, sum(r_regionkey) FILTER (WHERE r_regionkey % 2 = 0) AS b FROM region"),
    ("semi_anti_join_kw", "SELECT n_name FROM nation SEMI JOIN region ON n_regionkey = r_regionkey AND r_regionkey < 2 ORDER BY n_name LIMIT 3"),
    ("anti_join_kw", "SELECT r_name FROM region ANTI JOIN nation ON r_regionkey = n_regionkey ORDER BY r_name"),
    ("asof_left_join", "SELECT e.user_id, e.event_time, p.event_time AS asof_time FROM (SELECT user_id, ts AS event_time FROM events WHERE event_type = 'click' AND user_id % 97 = 0) e ASOF LEFT JOIN (SELECT user_id, ts AS event_time FROM events WHERE event_type = 'purchase') p ON e.user_id = p.user_id AND e.event_time >= p.event_time ORDER BY e.user_id, e.event_time LIMIT 20"),
    ("positional_join_probe", "SELECT a.x, b.y FROM (SELECT r_regionkey AS x FROM region ORDER BY r_regionkey) a POSITIONAL JOIN (SELECT r_name AS y FROM region ORDER BY r_name) b ORDER BY a.x"),
    ("positional_join_pad", "SELECT a.x, b.y FROM (SELECT r_regionkey AS x FROM region ORDER BY r_regionkey) a POSITIONAL JOIN (SELECT n_name AS y FROM nation ORDER BY n_name) b ORDER BY b.y NULLS FIRST LIMIT 8"),
    ("positional_join_tables", "SELECT region.r_name, n.n_name FROM region POSITIONAL JOIN nation AS n ORDER BY n.n_name LIMIT 5"),
    ("json_group_aggs", "SELECT json_group_array(r_regionkey) AS a, json_group_object(r_name, r_regionkey) AS b FROM (SELECT * FROM region ORDER BY r_regionkey)"),
    ("to_json_shapes", "SELECT to_json([1,2]) AS a, to_json({'k': 'v'}) AS b, to_json(MAP {'m': 1}) AS c"),
    ("json_merge_patch", "SELECT json_merge_patch('{\"a\":1,\"b\":2}', '{\"b\":3}') AS a"),
    ("json_transform_fn", "SELECT json_transform('{\"n\": \"7\"}', '{\"n\": \"INTEGER\"}') AS a"),
    ("bin_int_literal", "SELECT 0b1010 AS a, 0b1 + 0b1 AS b"),
    ("decimal_scale_round", "SELECT 2.45::DECIMAL(3,1) AS a, 2.55::DECIMAL(3,1) AS b, CAST(1.005 AS DECIMAL(4,2)) AS c, 99.99::DECIMAL(3,1) AS d, -2.456::DECIMAL(3,1) AS e, 2.4567::DECIMAL AS f"),
    ("decimal_scale_round_col", "SELECT CAST(x AS DECIMAL(4,1)) AS a, x::DECIMAL(10,2) AS b FROM (VALUES (12.349), (0.05), (-2.455)) t(x) ORDER BY 1"),
    ("decimal_scale_str", "SELECT '2.45'::DECIMAL(3,1) AS a, '-2.55'::DECIMAL(3,1) AS b"),
    ("like_escape_clause", "SELECT 'a_c' LIKE 'a!_c' ESCAPE '!' AS a, '10%' LIKE '10!%' ESCAPE '!' AS b"),
    ("trim_leading_trailing", "SELECT trim(LEADING 'x' FROM 'xxaxx') AS a, trim(TRAILING 'x' FROM 'xxaxx') AS b, trim(BOTH 'x' FROM 'xxaxx') AS c"),
    ("overlay_fn", "SELECT overlay('hello' PLACING 'XX' FROM 2 FOR 3) AS a"),
    ("starts_ends_with", "SELECT starts_with('abc', 'ab') AS a, ends_with('abc', 'bc') AS b, prefix('abc', 'a') AS c, suffix('abc', 'c') AS d"),
    ("bitstring_agg_fn", "SELECT bitstring_agg(r_regionkey)::VARCHAR AS a, bitstring_agg(r_regionkey, 0, 6)::VARCHAR AS b FROM region"),
    ("grouping_in_having", "SELECT n_regionkey, count(*) AS c FROM nation GROUP BY ROLLUP(n_regionkey) HAVING GROUPING(n_regionkey) = 0 ORDER BY n_regionkey"),
    ("grouping_id_fn", "SELECT n_regionkey, n_nationkey % 2 AS p, GROUPING_ID(n_regionkey, n_nationkey % 2) AS g, count(*) AS c FROM nation GROUP BY CUBE(n_regionkey, n_nationkey % 2) ORDER BY g, n_regionkey NULLS FIRST, p NULLS FIRST"),
    ("win_order_nulls", "SELECT x, row_number() OVER (ORDER BY y NULLS FIRST, x) AS r FROM (VALUES (1, NULL), (2, 5), (3, NULL)) t(x, y) ORDER BY x"),
    ("unnest_map", "SELECT * FROM (SELECT unnest(map_entries(MAP {'a': 1, 'b': 2})) AS e) ORDER BY 1"),
    ("map_concat_fn", "SELECT (map_concat(MAP {'a': 1}, MAP {'b': 2}))['b'][1] AS v, cardinality(map_concat(MAP {'a': 1}, MAP {'b': 2})) AS n"),
    ("columns_lambda", "SELECT COLUMNS(c -> c LIKE 'r_r%') FROM region ORDER BY 1 LIMIT 2"),
    ("repeat_list", "SELECT repeat([1, 2], 3) AS a"),
    ("list_grade_up_fn", "SELECT list_grade_up([30, 10, 20]) AS a"),
    ("list_select_where", "SELECT list_select([10, 20, 30], [3, 1]) AS a, list_where([10, 20, 30], [true, false, true]) AS b"),
    ("str_split_aliases", "SELECT string_split('a,b', ',') AS a, str_split('a,b', ',') AS b, string_to_array('a,b', ',') AS c, regexp_split_to_array('a1b', '[0-9]') AS d"),
    ("between_symmetric", "SELECT 5 BETWEEN SYMMETRIC 10 AND 1 AS a"),
    ("time_edge_casts", "SELECT '15:30:00'::TIME AS a, make_time(1, 2, 3.5) AS b, CAST('01:02:03' AS TIME) AS c"),
    ("extract_subsecond", "SELECT extract(microseconds FROM TIME '00:00:01.5') AS a, extract(milliseconds FROM TIME '00:00:02.25') AS b, extract(second FROM TIME '00:00:02.25') AS c, extract(seconds FROM TIMESTAMP '2024-01-01 00:00:01.5') AS d, date_part('microseconds', TIMESTAMP '2024-01-01 00:00:01.5') AS e"),
    ("tz_offset_literal", "SELECT '2024-01-01 10:00:00+05:30'::TIMESTAMPTZ AS a"),
    ("list_concat_op", "SELECT [1,2] || [3] AS a, [1] || [] AS b"),
    ("bit_ops_full", "SELECT 5 & 3 AS a, 5 | 3 AS b, xor(5, 3) AS c, 1 << 3 AS d, 16 >> 2 AS e, ~5 AS f"),
    ("date_plus_time", "SELECT DATE '2024-01-01' + TIME '10:30:00' AS a"),
    ("regex_flags", "SELECT regexp_matches('ABC', 'abc', 'i') AS a, regexp_replace('aAa', 'a', 'x', 'gi') AS b, regexp_extract('AB12', '([a-z]+)', 1, 'i') AS c"),
    ("split_part_neg", "SELECT split_part('a,b,c', ',', -1) AS a, split_part('a,b,c', ',', -2) AS b"),
    ("similar_quant", "SELECT 'aab' SIMILAR TO 'a{2}b' AS a"),
    ("prefix_caret_at", "SELECT 'abc' ^@ 'ab' AS a, 'abc' ^@ 'z' AS b"),
    # ---- sixth discovery pass (round 13) ----
    # ADVICE r12: NULL elements must survive json_group_array
    ("json_group_array_nulls", "SELECT json_group_array(y) AS a FROM (SELECT x AS y FROM (VALUES (1), (NULL), (2)) t(x) ORDER BY x NULLS LAST)"),
    # ADVICE r12: milliseconds TRUNCATE (1.9996s → 1999, not 2000)
    ("extract_subsec_trunc", "SELECT extract(milliseconds FROM TIMESTAMP '2024-01-01 00:00:01.9996') AS a, extract(milliseconds FROM TIME '00:00:01.9996') AS b, extract(seconds FROM TIMESTAMP '2024-01-01 00:00:01.9996') AS c"),
    # ADVICE r12: double-quoted list-text segments are atomic but verbatim
    ("str_list_cast_quoted", "SELECT '[\"a,b\", c]'::VARCHAR[] AS a, '[a, \"b]x\", c]'::VARCHAR[] AS b"),
    # ADVICE r12: quoted mixed-case column ref must still hit the
    # FROM-schema tie rule (backtick operand lowercased for the match)
    ("col_int_cast_quoted_ident", "SELECT CAST(\"MixedCase\" AS INT) AS a FROM (VALUES (2.5), (3.5), (-2.5)) t(\"MixedCase\")"),
    # VERDICT r12 item 2: EXPRESSION-typed int casts take duck's
    # source-type tie rule via the analysis probe (round 13)
    ("expr_int_cast_postfix", "SELECT (x + 0.5)::INT AS a, (x * 1.0)::INT AS b FROM (VALUES (CAST(2.0 AS DOUBLE)), (CAST(3.0 AS DOUBLE))) t(x)"),
    ("expr_int_cast_decimal", "SELECT CAST(x + 0.5 AS INT) AS a FROM (VALUES (CAST(2.0 AS DECIMAL(4,1))), (CAST(3.0 AS DECIMAL(4,1))), (CAST(-2.0 AS DECIMAL(4,1)))) t(x)"),
    ("expr_int_cast_string", "SELECT CAST(x || '.5' AS INT) AS a FROM (VALUES ('2'), ('3'), ('-2')) t(x)"),
    ("expr_int_cast_agg", "SELECT CAST(avg(x) AS INT) AS a FROM (VALUES (2), (3)) t(x)"),
    ("expr_int_cast_nested", "SELECT CAST(CAST(x + 0.2 AS INT) + 0.5 AS INT) AS a FROM (VALUES (CAST(3.0 AS DECIMAL(4,1)))) t(x)"),
    # VERDICT r12 item 6: all-lowercase refs restore stored case when
    # the scope schema is already probed — by an uppercase ref in the
    # same scope (…cached) or by another pass, here #n (…probed)
    ("ident_case_lower_cached", "SELECT rname, NUMCOL FROM (SELECT r_name AS RName, 7 AS NumCol FROM region) t ORDER BY 1 LIMIT 1"),
    ("ident_case_lower_probed", "SELECT rname, #2 FROM (SELECT r_name AS RName, 7 AS Num FROM region) t ORDER BY 1 LIMIT 1"),
    # VERDICT r12 item 8: struct/list/map COLUMN → VARCHAR duck-text
    # via the expression-type probe (round 13); double leaves stay
    # Spark-rendered (struct_dbl_to_str_cast, documented)
    ("list_col_to_str_cast", "SELECT l::VARCHAR AS a FROM (SELECT ['a b', NULL, 'c'] AS l) t"),
    ("map_col_to_str_cast", "SELECT m::VARCHAR AS a FROM (SELECT MAP([1,2],['a','b']) AS m) t"),
    ("struct_col_nested_str_cast", "SELECT s::VARCHAR AS a FROM (SELECT {'k': [1,2], 'd': DATE '2024-01-02', 'n': {'x': 'it''s'}} AS s) t"),
    ("struct_col_null_str_cast", "SELECT s::VARCHAR AS a, ({'k': CAST(NULL AS INT)})::VARCHAR AS b FROM (SELECT CASE WHEN 1=0 THEN {'k': 1} END AS s) t"),
    ("struct_dbl_to_str_cast", "SELECT s::VARCHAR AS a FROM (SELECT {'x': 0.0000001::DOUBLE} AS s) t"),
    # ---- seventh discovery pass (round 13) ----
    ("try_cast_tie_col", "SELECT TRY_CAST(x AS INT) AS a FROM (VALUES (CAST(2.5 AS DOUBLE)), (CAST(3.5 AS DOUBLE))) t(x)"),
    ("try_cast_tie_str", "SELECT TRY_CAST(x AS INT) AS a FROM (VALUES ('2.5'), ('3.5'), ('abc')) t(x)"),
    ("try_cast_tie_expr", "SELECT TRY_CAST(x + 0.5 AS INT) AS a FROM (VALUES (CAST(3.0 AS DOUBLE))) t(x)"),
    ("element_at_map", "SELECT element_at(MAP([1],['a']), 1) AS a, element_at(MAP([1],['a']), 9) AS b"),
    ("format_specs", "SELECT format('{} = {:.2f}', 'x', 3.14159) AS a, format('{:d} {:>5} {:x} {:05d} {:<3}|', 7, 'ab', 255, 42, 'z') AS b, format('{1:.1f} {0}', 'a', 2.75) AS c"),
    ("printf_decimal_args", "SELECT printf('%5.2f|%x|%05d', 3.14159, 255, 42) AS a"),
    ("strftime_week_nopad", "SELECT strftime(DATE '2024-03-05', '%j %W %-d %a') AS a, strftime(DATE '2024-01-01', 'w%W') AS b, strftime(TIMESTAMP '2024-03-05 07:08:09.123', '%H:%M:%S %g %p %I') AS c"),
    ("date_trunc_coarse_type", "SELECT date_trunc('week', DATE '2024-01-04') AS a, date_trunc('month', TIMESTAMP '2024-05-06 10:00:00') AS b, date_trunc('minute', TIMESTAMP '2024-05-06 10:07:08') AS c"),
    ("quantile_decimal_rescale", "SELECT quantile_cont(x, 0.25) AS a, quantile_cont(x, [0.25, 0.75])::VARCHAR AS b FROM (VALUES (1.0),(2.0),(3.0),(4.0)) t(x)"),
    ("quantile_decimal_negative", "SELECT quantile_cont(x, 0.25) AS a FROM (VALUES (CAST(-1.11 AS DECIMAL(5,2))),(CAST(-2.22 AS DECIMAL(5,2)))) t(x)"),
    ("median_decimal_discrete", "SELECT median(x) AS a FROM (VALUES (1.0),(2.0),(4.0),(5.0)) t(x)"),
    ("median_int_interpolates", "SELECT median(x) AS a FROM (VALUES (CAST(1 AS INT)),(2),(4),(5)) t(x)"),
    ("greatest_least_null_skip", "SELECT greatest(1, NULL, 3) AS a, least(2, NULL) AS b"),
    ("histogram_to_varchar", "SELECT histogram(x)::VARCHAR AS a FROM (VALUES (1),(2),(2)) t(x)"),
    ("agg_extras", "SELECT mode(x) AS a, product(x) AS b, bit_and(x) AS c, bit_or(x) AS d, bit_xor(x) AS e, any_value(x) AS f FROM (VALUES (12),(10),(6),(12)) t(x)"),
    ("entropy_skew_kurt", "SELECT round(entropy(x),6) AS a, round(skewness(x),6) AS b, round(kurtosis(x),6) AS c FROM (VALUES (1.0),(1.0),(2.0),(8.0)) t(x)"),
    ("win_filter_clause", "SELECT x, count(*) FILTER (x > 1) OVER () AS a FROM (VALUES (1),(2),(3)) t(x) ORDER BY x"),
    # list_sum is type-preserving in duck (HUGEINT/DECIMAL(38,s)) —
    # closed round 13 via the expression probe's typed accumulator
    ("list_sum_typed", "SELECT list_sum([1,2,3]) AS a, list_aggregate([1,NULL,3], 'sum') AS b, list_sum(x) AS c FROM (VALUES ([1.5, 2.5])) t(x)"),
    # ---- eighth discovery pass (round 13) ----
    ("time_bucket_origin", "SELECT time_bucket(INTERVAL '10 minutes', TIMESTAMP '2024-01-01 00:37:00', TIMESTAMP '2024-01-01 00:02:00') AS a, time_bucket(INTERVAL 2 MONTH, DATE '2024-05-20', DATE '2024-02-15') AS b, time_bucket(INTERVAL 3 MONTH, DATE '2024-05-20', DATE '2023-12-10') AS c"),
    ("array_slice_negative", "SELECT array_slice([1,2,3,4,5], -3, -1) AS a, array_slice([1,2,3,4,5], 2, -2) AS b, array_slice([1,2,3], -9, 2) AS c, array_slice('hello', 2, -2) AS d, array_slice('hello', -3, 5) AS e"),
    ("left_right_negative", "SELECT left('hello', -2) AS a, right('hello', -2) AS b, left('hello', 2) AS c, right('hi', 9) AS d, left('ab', 0) AS e"),
    ("generate_subscripts_tvf", "SELECT generate_subscripts([10,20,30], 1) AS a"),
    ("regexp_split_table", "SELECT regexp_split_to_table('a1b2c', '\\d') AS a"),
    ("datetime_ctors", "SELECT last_day(DATE '2024-02-05') AS a, make_date(2024, 2, 29) AS b, make_timestamp(2024, 2, 29, 1, 2, 3.5) AS c, epoch_ms(TIMESTAMP '2024-01-01 00:00:01.5') AS d, epoch(TIMESTAMP '2024-01-01 00:00:01.5') AS e"),
    ("list_membership", "SELECT list_position([10,20,30], 20) AS a, list_position([10],99) AS b, list_contains([1,2],2) AS c, list_has_any([1,2],[2,9]) AS d, list_has_all([1,2,3],[1,3]) AS e"),
    ("string_normalize", "SELECT strip_accents('café') AS a, nfc_normalize('café') AS b, like_escape('a%c', 'a!%c', '!') AS c, lpad('x', 5, 'ab') AS d, trim('xxaxx', 'x') AS e"),
    ("float_predicates", "SELECT isnan('nan'::DOUBLE) AS a, isinf('inf'::DOUBLE) AS b, isfinite(1.0::DOUBLE) AS c, signbit(-0.0) AS d, fdiv(7.5, 2.0) AS e, fmod(7.5, 2.0) AS f"),
    ("window_distribution_fns", "SELECT x, ntile(2) OVER (ORDER BY x) AS a, cume_dist() OVER (ORDER BY x) AS b, percent_rank() OVER (ORDER BY x) AS c FROM (VALUES (1),(2),(3),(4)) t(x) ORDER BY x"),
    ("grouping_id_sets", "SELECT x, y, grouping_id(x, y) AS g FROM (VALUES (1,2)) t(x,y) GROUP BY GROUPING SETS ((x), (y), (x,y), ()) ORDER BY g, x NULLS LAST, y NULLS LAST"),
    ("unnest_recursive_flag", "SELECT unnest([[1,2],[3]], recursive := true) AS a"),
    ("json_misc_fns", "SELECT json_array_length('[1,2,3]') AS a, json_valid('{x}') AS b, json_merge_patch('{\"a\":1}', '{\"b\":2}') AS c"),
    # SQL-standard information_schema shapes (round 13; previously
    # aliased to CH-shaped system.* views → UNRESOLVED_COLUMN for
    # standard clients). Schema-qualified data: compare fixed columns
    # over the shared parquet views' BASE tables is host-dependent, so
    # probe a CREATEd table via the statement battery instead — here we
    # pin the column SHAPES resolve and the literal-schema row.
    ("info_schema_schemata_main", "SELECT DISTINCT schema_name FROM information_schema.schemata WHERE schema_name = 'main'"),
]


def canon(pdf):
    import datetime
    import decimal
    import math

    import pandas as pd

    cols = sorted(pdf.columns)
    pdf = pdf[cols]

    def cell(v):
        # normalize representation artifacts, NOT values: DuckDB's
        # DATE → pandas datetime64 (midnight) vs Spark's date object,
        # Decimal scale rendering, NaN-vs-None for SQL NULL, tz suffix
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "∅"
        if v is pd.NaT:
            return "∅"
        if isinstance(v, decimal.Decimal):
            return f"{float(v):.6g}"
        if isinstance(v, float):
            return f"{v:.6g}"
        if isinstance(v, pd.Timestamp) or isinstance(v, datetime.datetime):
            try:
                v = v.replace(tzinfo=None) if getattr(v, "tzinfo", None) else v
            except TypeError:
                pass
            s = str(v)
            return s[:-9] if s.endswith(" 00:00:00") else s
        return str(v)

    rows = sorted(
        tuple(cell(v) for v in row)
        for row in pdf.itertuples(index=False, name=None)
    )
    return rows


def main():
    filt = sys.argv[1] if len(sys.argv) > 1 else ""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )

    from duck_server_spark.engine.executor import Engine
    from duck_server_spark.engine.session import get_session

    spark = get_session("dialect_probe")
    eng = Engine(spark)
    for t in TABLES:
        spark.read.parquet(f"{SF}/{t}.parquet").createOrReplaceTempView(t)

    results = {"PASS": [], "MISMATCH": [], "ENGINE_ERR": [], "DUCK_ERR": []}
    for name, sql in PROBES:
        if filt and filt not in name:
            continue
        try:
            want = con.execute(sql).fetchdf()
        except Exception as exc:  # noqa: BLE001
            results["DUCK_ERR"].append((name, str(exc).splitlines()[0]))
            continue
        try:
            got = eng.query(sql, dialect="pg").toPandas()
        except Exception as exc:  # noqa: BLE001
            msg = str(exc).splitlines()[0][:160]
            results["ENGINE_ERR"].append((name, msg))
            print(f"ENGINE_ERR {name}: {msg}")
            continue
        try:
            ok = canon(got) == canon(want) and sorted(got.columns) == sorted(
                want.columns
            )
        except Exception:  # noqa: BLE001
            ok = False
        if ok:
            results["PASS"].append((name, ""))
            print(f"PASS       {name}")
        else:
            results["MISMATCH"].append((name, ""))
            print(f"MISMATCH   {name}")
            print(f"  duck : cols={list(want.columns)} rows={canon(want)[:3]}")
            print(f"  spark: cols={list(got.columns)} rows={canon(got)[:3]}")

    print("\n==== SUMMARY ====")
    for k in ("PASS", "MISMATCH", "ENGINE_ERR", "DUCK_ERR"):
        print(f"{k}: {len(results[k])}")
    for name, msg in results["ENGINE_ERR"]:
        print(f"  ENGINE_ERR {name}: {msg}")
    for name, _ in results["MISMATCH"]:
        print(f"  MISMATCH   {name}")
    for name, msg in results["DUCK_ERR"]:
        print(f"  DUCK_ERR   {name}: {msg}")


if __name__ == "__main__":
    main()
    traceback  # quiet linters
