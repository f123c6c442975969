"""DuckDB scalar/aggregate function surface Spark lacks, as bind-time
expression templates (round 10, found by tools/dialect_probe.py).

One generic scanning pass (`rewrite_fn_shims`) drives a registry of
name → arity → template (or callable for argument-dependent shapes).
Templates are pure Spark SQL expression text — JVM-side, whole-stage
codegen, zero Python boundary — so every shim keeps the 100 TB scan
path as cheap as the hand-written Spark spelling.

Semantics pinned against live DuckDB 1.0 in tests/test_fn_shims.py;
every pinned quirk is commented at its template. A call whose shape the
registry doesn't cover (wrong arity, non-literal where a literal is
required) passes through untouched and fails LOUDLY in Spark — never a
silent semantics change (repo convention since round 6).

Self-trigger safety: templates that emit their own trigger name use a
__SPARK_<NAME>__ placeholder, resolved once at the end of the pass —
the rescan loop can never re-match its own replacement.
"""

from __future__ import annotations

import re

from duck_server_spark.plans.rewrites import (  # shared scanning utilities
    _mask_literals,
    _PLAIN_STR_LIT,
    _scan_balanced,
)


def _split_args(s: str, masked: str | None = None) -> list[str]:
    """Split on commas at depth 0 of (), [] AND {} — this pass runs
    BEFORE the bracket/brace-literal rewrites (it needs the literal
    list shapes), so unlike rewrites._split_top_level it must treat
    `[0.25, 0.75]` and `{'k': 1}` as single arguments."""
    scan = masked if masked is not None else s
    parts, depth, start = [], 0, 0
    for i, ch in enumerate(scan):
        if ch in "([{":
            depth += 1
        elif ch in ")]}":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(s[start:i])
            start = i + 1
    parts.append(s[start:])
    return [p.strip() for p in parts if p.strip()]

# ---------------------------------------------------------------------------
# building blocks
# ---------------------------------------------------------------------------

# sorted-list median, quantile_cont(0.5) interpolation (midpoint of the
# two middle elements for even n) — pinned: duck mad([1,2,3,10]) = 1.0
_SORTED = "array_sort(collect_list(CAST({0} AS DOUBLE)))"


def _median_of(arr: str) -> str:
    return (
        f"((element_at({arr}, CAST((size({arr}) + 1) div 2 AS INT)) + "
        f"element_at({arr}, CAST(size({arr}) div 2 + 1 AS INT))) / 2)"
    )


# mad needs the inner median ONCE, not per element — Spark SQL has no
# LET, but transform() over a single-element array binds a value to a
# lambda variable (evaluated once). Found the hard way: the naive
# template re-sorted the whole group per element (O(n² log n) — 360 s
# on a 30k-row group where this shape takes 1 s).
_MAD_TPL = (
    "CASE WHEN size(" + _SORTED + ") > 0 THEN "
    "element_at(transform(array(" + _median_of(_SORTED) + "), md_m -> "
    "element_at(transform(array(array_sort(transform(" + _SORTED + ", "
    "md_v -> abs(md_v - md_m)))), md_d -> " + _median_of("md_d") + "), 1)"
    "), 1) ELSE NULL END"
)

# embedding math (round 10 batch 2): dot product / squared-norm folds
# as zip_with + aggregate — pure JVM expressions, the same shape the
# similarity operators use (operators/similarity.py)
def _dot(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (ip_a, ip_b) -> "
        "CAST(ip_a AS DOUBLE) * ip_b), CAST(0 AS DOUBLE), "
        "(ip_s, ip_v) -> ip_s + ip_v)"
    )


def _dim_guard(body: str) -> str:
    """NULL args → NULL; unequal dimensions → duck's binder error."""
    return (
        "CASE WHEN {0} IS NULL OR {1} IS NULL THEN NULL "
        "WHEN size({0}) <> size({1}) THEN "
        "raise_error('Invalid Input Error: list dimensions must be equal') "
        f"ELSE {body} END"
    )


# frequency of one distinct value inside the group's collected values
_FREQ = "try_divide(size(filter(collect_list({0}), en_v -> en_v = en_k)), size(collect_list({0})))"


# bounded Euclid as a JVM fold (round 11): 94 iterations cover the
# int64 worst case (consecutive Fibonacci numbers)
_GCD_TPL = (
    "aggregate(sequence(1, 94), "
    "struct(CAST(abs({0}) AS BIGINT) AS g_a, CAST(abs({1}) AS BIGINT) AS g_b), "
    "(g_acc, g_i) -> CASE WHEN g_acc.g_b = 0 THEN g_acc "
    "ELSE struct(g_acc.g_b AS g_a, (g_acc.g_a % g_acc.g_b) AS g_b) END).g_a"
)


def _bytes_ladder(base: int, units: list[str]) -> str:
    """duck's human-readable size renderers: below `base` the integer
    count + ' bytes'; above, ONE decimal TRUNCATED TOWARD ZERO in
    INTEGER arithmetic (review r11 pins: 1126 → '1.0 KiB', -1590 →
    '-1.5 KiB', int64-max → '8191.9 PiB' — a double intermediate
    rounds that last one to 8192.0, and floor() breaks negatives)."""
    absd = "abs(CAST({0} AS DECIMAL(38,0)))"
    sign = "(CASE WHEN ({0}) < 0 THEN '-' ELSE '' END)"
    parts = [
        f"WHEN {absd} < {base} THEN "
        "concat(CAST(CAST({0} AS BIGINT) AS STRING), ' bytes')"
    ]
    for i, u in enumerate(units):
        div = base ** (i + 1)
        tenths = f"CAST({absd} * 10 div {div} AS BIGINT)"
        fmt = (
            f"concat({sign}, CAST({tenths} div 10 AS STRING), '.', "
            f"CAST({tenths} % 10 AS STRING), ' {u}')"
        )
        if i < len(units) - 1:
            ub = base ** (i + 2)
            parts.append(f"WHEN {absd} < {ub} THEN {fmt}")
        else:
            parts.append(f"ELSE {fmt}")
    return "CASE " + " ".join(parts) + " END"


_FMT_BYTES_TPL = _bytes_ladder(1024, ["KiB", "MiB", "GiB", "TiB", "PiB"])
_FMT_DECIMAL_TPL = _bytes_ladder(1000, ["kB", "MB", "GB", "TB", "PB"])

_LIST_CONCAT_TPL = (
    "CASE WHEN {0} IS NULL AND {1} IS NULL THEN NULL "
    "ELSE concat(coalesce({0}, slice({1}, 1, 0)), "
    "coalesce({1}, slice({0}, 1, 0))) END"
)

# ---------------------------------------------------------------------------
# the registry: name → arity → Spark expression template
# ---------------------------------------------------------------------------

TEMPLATES: dict[str, dict[int, str]] = {
    # ---- strings ----
    "sha256": {1: "sha2({0}, 256)"},
    # duck's JSON aggregates (round 12): compact-JSON rendering matches
    # to_json exactly ('[1,2]' / '{"a":1}'); arrival order preserved by
    # collect_list → map_from_entries. Group-bounded (dialect tier).
    # NULL elements must survive ('[1,null,2]', pinned live):
    # collect_list(x) drops NULLs, but struct(x) is non-NULL even when
    # x is NULL, so carry through a struct and unwrap in a transform
    "json_group_array": {
        1: "to_json(transform(collect_list(struct({0} AS jga_v)), jga_s -> jga_s.jga_v))"
    },
    "json_group_object": {
        2: "to_json(map_from_entries(collect_list(struct({0}, {1}))))"
    },
    "strpos": {2: "instr({0}, {1})"},
    # to_base(255, 16) = 'FF' — Spark conv is uppercase too (pinned)
    "to_base": {2: "conv(CAST({0} AS STRING), 10, CAST({1} AS INT))"},
    # unicode('€') = 8364 in BOTH engines (Spark ascii is codepoint)
    "unicode": {1: "ascii({0})"},
    "parse_filename": {1: "element_at(split({0}, '/'), -1)"},
    # parse_dirname('/a/b/c.txt') = '/' — the TOP-level component
    # (pinned live); relative paths yield the first component
    "parse_dirname": {
        1: (
            "CASE WHEN startswith({0}, '/') THEN '/' "
            "ELSE element_at(filter(split({0}, '/'), pd_x -> pd_x <> ''), 1) END"
        )
    },
    "parse_path": {
        1: (
            "concat(CASE WHEN startswith({0}, '/') THEN array('/') "
            "ELSE CAST(array() AS ARRAY<STRING>) END, "
            "filter(split({0}, '/'), pp_x -> pp_x <> ''))"
        )
    },
    # ---- math ----
    # even(): round AWAY from zero to the next even number — pinned:
    # even(2)=2, even(3)=4, even(2.5)=4, even(-2.5)=-4; result DOUBLE
    "even": {
        1: (
            "CAST(CASE WHEN {0} < 0 THEN -ceil(abs(CAST({0} AS DOUBLE)) / 2) * 2 "
            "ELSE ceil(CAST({0} AS DOUBLE) / 2) * 2 END AS DOUBLE)"
        )
    },
    # signbit(-0.0) = true: the double's string rendering keeps the sign
    "signbit": {1: "startswith(CAST(CAST({0} AS DOUBLE) AS STRING), '-')"},
    "xor": {2: "((({0}) | ({1})) & ~(({0}) & ({1})))"},
    # divide() is the function spelling of integer division (pinned:
    # divide(7,2)=3); fdiv/fmod are FLOOR division/modulo (pinned:
    # fdiv(-7,2)=-4, fmod(-7,3)=2, fmod(7.5,-2)=-0.5); try_divide keeps
    # duck's NULL-on-zero-divisor
    "divide": {2: "({0} div {1})"},
    "fdiv": {2: "CAST(floor(try_divide(CAST({0} AS DOUBLE), {1})) AS DOUBLE)"},
    "fmod": {
        2: (
            "(CAST({0} AS DOUBLE) - "
            "floor(try_divide(CAST({0} AS DOUBLE), {1})) * {1})"
        )
    },
    "isfinite": {
        1: (
            "(NOT isnan(CAST({0} AS DOUBLE)) AND "
            "abs(CAST({0} AS DOUBLE)) <> CAST('Infinity' AS DOUBLE))"
        )
    },
    "isinf": {1: "(abs(CAST({0} AS DOUBLE)) = CAST('Infinity' AS DOUBLE))"},
    # ---- session/introspection ----
    "setseed": {1: "CAST(NULL AS STRING)"},  # engine RNG is per-executor;
    # a session seed is not implementable on a cluster — duck's void
    # return shape is preserved, the seeding itself is a documented no-op
    "txid_current": {0: "CAST(0 AS BIGINT)"},
    # ---- date/time ----
    "epoch": {1: "(CAST(unix_micros(CAST({0} AS TIMESTAMP)) AS DOUBLE) / 1000000)"},
    "epoch_us": {1: "unix_micros(CAST({0} AS TIMESTAMP))"},
    "epoch_ns": {1: "(unix_micros(CAST({0} AS TIMESTAMP)) * 1000)"},
    # ISO year = year of the Thursday of the value's ISO week
    # (pinned: isoyear(DATE '2021-01-01') = 2020)
    "isoyear": {1: "year(date_add(CAST({0} AS DATE), 3 - weekday(CAST({0} AS DATE))))"},
    "monthname": {1: "date_format({0}, 'MMMM')"},
    "dayname": {1: "date_format({0}, 'EEEE')"},
    # PG age(): duck returns a month-normalized INTERVAL whose client
    # value equals the plain timestamp difference (pinned via
    # duckdb-python timedelta); Spark's ts-minus-ts DayTimeInterval is
    # that same instant difference. Calendar-month normalization of the
    # SQL-side rendering is a documented divergence.
    "age": {
        2: "(CAST({0} AS TIMESTAMP) - CAST({1} AS TIMESTAMP))",
        1: "(CAST(current_date() AS TIMESTAMP) - CAST({0} AS TIMESTAMP))",
    },
    # duck's left/right accept NEGATIVE n = all-but-|n| from the other
    # end (pinned live round 13: left('hello',-2)='hel'); Spark returns
    # '' for negative n
    "left": {
        2: (
            "CASE WHEN ({1}) >= 0 THEN left({0}, ({1})) "
            "ELSE left({0}, greatest(length({0}) + ({1}), 0)) END"
        )
    },
    "right": {
        2: (
            "CASE WHEN ({1}) >= 0 THEN right({0}, ({1})) "
            "ELSE right({0}, greatest(length({0}) + ({1}), 0)) END"
        )
    },
    "regexp_split_to_table": {2: "explode(split({0}, {1}))"},
    # ---- cheap alias tail (round-10 batch 2, all pinned live) ----
    "prefix": {2: "startswith({0}, {1})"},
    "suffix": {2: "endswith({0}, {1})"},
    "ord": {1: "ascii({0})"},
    "to_hex": {1: "hex({0})"},
    "from_hex": {1: "unhex({0})"},
    "gen_random_uuid": {0: "uuid()"},
    "starts_with": {2: "startswith({0}, {1})"},
    "ends_with": {2: "endswith({0}, {1})"},
    # duck upper() is utf8proc's 1:1 codepoint map: ß → ẞ (U+1E9E),
    # never length-changing; Java's toUpperCase does ß → SS. The
    # pre-translate pins the one common divergent mapping (round 11);
    # rarer ligature mappings (ﬁ → FI in Java, unchanged in utf8proc)
    # remain engine variance — documented, not silently claimed.
    "upper": {1: "upper(translate({0}, 'ß', 'ẞ'))"},
    "ucase": {1: "upper(translate({0}, 'ß', 'ẞ'))"},
    "lcase": {1: "lower({0})"},
    # len() is duck's polymorphic length — strings are the common case;
    # a PROVABLE list argument routes to size() via the _len callable,
    # list-typed COLUMNS error loudly (use array_length/size)
    "len": {1: "length({0})"},
    # array_length is list-only in duck (round 11)
    "array_length": {1: "size({0})"},
    # ---- round-11 probe-widening closures (each pinned live) ----
    # duck log(x) is LOG BASE 10 (Spark's is ln) — a silent-value trap
    # the widened battery caught; 2-arg log(b, x) matches natively
    "log": {1: "log10({0})"},
    # 2-arg trim family: duck is (string, chars); Spark's 2-arg
    # function spelling is (trimStr, str) — SWAPPED (silent-value trap)
    "trim": {2: "trim(BOTH {1} FROM {0})"},
    "ltrim": {2: "trim(LEADING {1} FROM {0})"},
    "rtrim": {2: "trim(TRAILING {1} FROM {0})"},
    # numeric trunc-toward-zero (Spark's 1-arg trunc is date-only)
    "trunc": {
        1: "(CASE WHEN {0} >= 0 THEN floor({0}) ELSE ceil({0}) END)"
    },
    "arbitrary": {1: "any_value({0})"},
    "week": {1: "weekofyear({0})"},
    # duck date_add(date, INTERVAL) ≡ date + interval. Superset note
    # (review r11): duck BINDER-REJECTS an integer second argument; the
    # emitted '+' accepts it with Spark's date+days meaning — the same
    # documented-harmless-superset class as the TVF paren spellings
    # (valid-duck inputs are value-identical; only duck-ERROR inputs
    # gain an answer).
    "date_add": {2: "({0} + {1})"},
    "json_keys": {1: "json_object_keys({0})"},
    # ---- round-11 third discovery pass (each pinned live) ----
    # gcd/lcm: bounded Euclid as a JVM fold — 94 iterations cover the
    # int64 worst case (Fibonacci pair); duck takes |a|,|b| and
    # gcd(0, n) = n (pinned)
    "gcd": {2: _GCD_TPL},
    # divide FIRST (review r11: abs(a*b) overflowed BIGINT where duck's
    # own div-first evaluation succeeds)
    "lcm": {
        2: (
            "CASE WHEN ({0}) = 0 OR ({1}) = 0 THEN CAST(0 AS BIGINT) "
            f"ELSE (abs(CAST({{0}} AS BIGINT)) div {_GCD_TPL}) "
            "* abs(CAST({1} AS BIGINT)) END"
        )
    },
    "from_base64": {1: "unbase64({0})"},
    # duck 1-arg encode/decode are the utf-8 blob codecs
    "encode": {1: "encode({0}, 'utf-8')"},
    "decode": {1: "decode({0}, 'utf-8')"},
    # format_bytes / formatReadableSize: binary ladder, ONE decimal
    # TRUNCATED (pinned: 1126 → '1.0 KiB', 1590 → '1.5 KiB', 1023 →
    # '1023 bytes'); formatReadableDecimalSize: decimal kB/MB ladder
    "format_bytes": {1: _FMT_BYTES_TPL},
    "formatreadablesize": {1: _FMT_BYTES_TPL},
    "formatreadabledecimalsize": {1: _FMT_DECIMAL_TPL},

    # BC (negative) years take the PG rules (review r11, pinned live:
    # decade(-5)=0 trunc-toward-zero, century(-5)=-1, century(-101)=-2,
    # millennium(-5)=-1 — i.e. floor for negatives, ceil for positives)
    "century": {
        1: (
            "CAST(CASE WHEN year({0}) > 0 THEN ceil(year({0}) / 100.0) "
            "ELSE floor(year({0}) / 100.0) END AS BIGINT)"
        )
    },
    "millennium": {
        1: (
            "CAST(CASE WHEN year({0}) > 0 THEN ceil(year({0}) / 1000.0) "
            "ELSE floor(year({0}) / 1000.0) END AS BIGINT)"
        )
    },
    "era": {1: "(CASE WHEN year({0}) > 0 THEN 1 ELSE 0 END)"},
    "decade": {
        1: (
            "CAST(CASE WHEN year({0}) >= 0 THEN floor(year({0}) / 10.0) "
            "ELSE ceil(year({0}) / 10.0) END AS BIGINT)"
        )
    },
    # duck julian() counts midnight as .0 (JD + 0.5): unix epoch is
    # 2440588.0 (pinned: DATE '2000-01-01' → 2451545.0, noon → x.5)
    "julian": {
        1: (
            "(CAST(unix_micros(CAST({0} AS TIMESTAMP)) AS DOUBLE) "
            "/ 86400000000.0 + 2440588.0)"
        )
    },
    # duck list_concat treats a NULL side as empty, both-NULL → NULL
    "list_concat": {2: _LIST_CONCAT_TPL},
    "list_cat": {2: _LIST_CONCAT_TPL},
    "array_cat": {2: _LIST_CONCAT_TPL},
    "list_any_value": {
        1: "try_element_at(filter({0}, lav_v -> lav_v IS NOT NULL), 1)"
    },
    # interval constructors (day-time family; the year-month family
    # renders differently client-side and stays loud)
    # INTERVAL-multiplication, not make_interval: the latter returns
    # CalendarIntervalType which PySpark cannot collect (pinned)
    "to_days": {1: "(CAST({0} AS INT) * INTERVAL '1' DAY)"},
    "to_weeks": {1: "(CAST({0} AS INT) * 7 * INTERVAL '1' DAY)"},
    "to_hours": {1: "(CAST({0} AS INT) * INTERVAL '1' HOUR)"},
    "to_minutes": {1: "(CAST({0} AS INT) * INTERVAL '1' MINUTE)"},
    "to_seconds": {1: "(CAST({0} AS DOUBLE) * INTERVAL '1' SECOND)"},
    "to_milliseconds": {
        1: "(CAST({0} AS DOUBLE) / 1000.0 * INTERVAL '1' SECOND)"
    },
    "to_microseconds": {
        1: "(CAST({0} AS DOUBLE) / 1000000.0 * INTERVAL '1' SECOND)"
    },
    "current_localtimestamp": {0: "localtimestamp()"},
    # regexp_escape: backslash every regex metacharacter (pinned:
    # 'a.b[c]' → 'a\\.b\\[c\\]')
    # RE2 QuoteMeta escapes EVERY non-word character (review r11,
    # pinned: 'a-b c/d' -> 'a\\-b\\ c\\/d')
    "regexp_escape": {
        1: r"regexp_replace({0}, '([^a-zA-Z0-9_])', '\\\\$1')"
    },
    "like_escape": {3: "({0} LIKE {1} ESCAPE {2})"},
    "not_like_escape": {3: "(NOT ({0} LIKE {1} ESCAPE {2}))"},
    "ilike_escape": {3: "({0} ILIKE {1} ESCAPE {2})"},
    "not_ilike_escape": {3: "(NOT ({0} ILIKE {1} ESCAPE {2}))"},
    # one JVM-reflection call per row — fine for the scalar tail, not a
    # hot-path function (documented)
    "nextafter": {
        2: (
            "CAST(reflect('java.lang.Math', 'nextAfter', "
            "CAST({0} AS DOUBLE), CAST({1} AS DOUBLE)) AS DOUBLE)"
        )
    },
    "json_valid": {
        1: (
            "CASE WHEN {0} IS NULL THEN NULL "
            "ELSE try_parse_json(CAST({0} AS STRING)) IS NOT NULL END"
        )
    },
    # list_resize pads with NULL / truncates (pinned: [1,2]→4 =
    # [1,2,NULL,NULL]); slice-guard keeps n=0 from reversing sequence()
    "list_resize": {
        2: (
            "slice(transform(sequence(1, greatest(CAST({1} AS INT), 1)), "
            "lr_i -> try_element_at({0}, lr_i)), 1, "
            "greatest(CAST({1} AS INT), 0))"
        )
    },
    "array_pop_back": {1: "slice({0}, 1, greatest(size({0}) - 1, 0))"},
    "array_pop_front": {1: "slice({0}, 2, greatest(size({0}) - 1, 0))"},
    # list_select(l, idxs): 1-based gather; out-of-range indexes yield
    # NULL like duck (pinned: list_select([1,2],[5]) = [NULL])
    "list_select": {2: "transform({1}, ls_i -> try_element_at({0}, ls_i))"},
    # list_where(l, mask): boolean gather (pinned: keeps mask-true)
    "list_where": {
        2: (
            "transform(filter(zip_with({0}, {1}, (lw_v, lw_m) -> "
            "struct(lw_v AS v, lw_m AS m)), lw_s -> lw_s.m), "
            "lw_s -> lw_s.v)"
        )
    },
    # grade_up: 1-based positions that sort the list ascending with
    # NULL values LAST (pinned: [30,10,20] → [2,3,1] and
    # [NULL,10,5] → [3,2,1]; Spark's default struct sort puts NULL
    # fields FIRST, so a null-rank marker leads the key)
    "grade_up": {
        1: (
            "transform(array_sort(zip_with({0}, "
            "slice(sequence(1, greatest(size({0}), 1)), 1, "
            "greatest(size({0}), 0)), "
            "(gu_v, gu_i) -> struct((gu_v IS NULL) AS n, gu_v AS v, "
            "gu_i AS i))), gu_s -> gu_s.i)"
        )
    },
    # ---- embedding math (pinned live) ----
    # dimension mismatch raises duck's error (third-review catch: the
    # NULL-padding zip_with silently returned NULL where the oracle
    # errors); a NULL ELEMENT yields NULL — documented divergence (duck
    # errors; an exists() scan per row would add ~66% to the fold)
    "list_inner_product": {2: _dim_guard(_dot("{0}", "{1}"))},
    "list_dot_product": {2: _dim_guard(_dot("{0}", "{1}"))},
    # L2 distance (pinned: ([1,2],[4,6]) = 5.0)
    "list_distance": {
        2: _dim_guard(
            "sqrt(aggregate(zip_with({0}, {1}, (ld_a, ld_b) -> "
            "power(CAST(ld_a AS DOUBLE) - ld_b, 2)), CAST(0 AS DOUBLE), "
            "(ld_s, ld_v) -> ld_s + ld_v))"
        )
    },
    # cosine similarity: NULL argument → NULL (third-review catch — the
    # first version's coalesce swallowed it to -1); zero-norm → -1.0
    # like duck (pinned: ([1],[0]) = -1.0, ([0],[0]) = -1.0); NULL
    # element → NULL (documented divergence, duck errors)
    "list_cosine_similarity": {
        2: _dim_guard(
            "CASE WHEN " + _dot("{0}", "{1}") + " IS NULL THEN NULL "
            "ELSE coalesce(try_divide(" + _dot("{0}", "{1}") + ", "
            "sqrt(" + _dot("{0}", "{0}") + ") * "
            "sqrt(" + _dot("{1}", "{1}") + ")), CAST(-1 AS DOUBLE)) END"
        )
    },
    # list_intersect DROPS NULL elements (pinned: duck [1,NULL,2]∩
    # [NULL,2] = [2]; Spark's native array_intersect keeps the NULL)
    "list_intersect": {
        2: "filter(array_intersect({0}, {1}), li_x -> li_x IS NOT NULL)"
    },
    # ---- lists ----
    # list_zip pads to the LONGEST input with NULLs (pinned); duck's
    # field names are list_1/list_2
    "list_zip": {
        2: (
            "zip_with({0}, {1}, (lz_a, lz_b) -> "
            "struct(lz_a AS list_1, lz_b AS list_2))"
        )
    },
    # map_extract / map bracket-extract returns a LIST: [v] or []
    # (DuckDB 1.0 semantics, pinned)
    # key test via null-safe lambda equality, not map_contains_key —
    # Spark rejects an untyped NULL literal key there; duck's
    # map_extract(m, NULL) is [] (round 11, same shape as subscripts)
    "map_extract": {
        2: (
            "CASE WHEN size(filter(map_keys({0}), mk_k -> mk_k <=> ({1}))) > 0 "
            "THEN array(try_element_at({0}, {1})) ELSE array() END"
        )
    },
    # duck's element_at is MAP-only (Binder Error on lists, pinned
    # round 13) and returns the same 0/1-element value list as
    # map_extract — Spark's list element_at never reaches duck clients
    "element_at": {
        2: (
            "CASE WHEN size(filter(map_keys({0}), mk_k -> mk_k <=> ({1}))) > 0 "
            "THEN array(try_element_at({0}, {1})) ELSE array() END"
        )
    },
    # ---- aggregates ----
    # product: NULL elements skipped (collect_list drops them), empty /
    # all-NULL group → NULL (pinned), accumulates in DOUBLE like duck
    "product": {
        1: (
            "CASE WHEN size(collect_list(CAST({0} AS DOUBLE))) > 0 "
            "THEN aggregate(collect_list(CAST({0} AS DOUBLE)), "
            "CAST(1 AS DOUBLE), (pr_a, pr_b) -> pr_a * pr_b) ELSE NULL END"
        )
    },
    # histogram → MAP ordered by key, NULLs dropped (pinned:
    # histogram([2,1,1,NULL]) = {1:2, 2:1})
    "histogram": {
        1: (
            "map_from_entries(transform(array_sort(array_distinct("
            "collect_list({0}))), hg_k -> struct(hg_k, "
            "size(filter(collect_list({0}), hg_v -> hg_v = hg_k)))))"
        )
    },
    # Shannon entropy, log base 2, over non-NULL value frequencies
    # (pinned: entropy([1,1,2,3]) = 1.5); empty group → 0.0 like duck
    "entropy": {
        1: (
            "CASE WHEN size(collect_list({0})) > 0 THEN "
            "aggregate(array_distinct(collect_list({0})), CAST(0 AS DOUBLE), "
            f"(en_a, en_k) -> en_a - {_FREQ} * log2({_FREQ})) "
            "ELSE CAST(0 AS DOUBLE) END"
        )
    },
    # median absolute deviation = median(|x - median(x)|), both medians
    # interpolated like quantile_cont(0.5) (pinned: mad([1,2,3,10])=1.0)
    "mad": {1: _MAD_TPL},
    # favg/fsum are Kahan-compensated sums — Spark aggregates partial
    # sums per partition in double; values agree to double precision
    "favg": {1: "avg(CAST({0} AS DOUBLE))"},
    "fsum": {1: "sum(CAST({0} AS DOUBLE))"},
    "sumkahan": {1: "sum(CAST({0} AS DOUBLE))"},
    "kahan_sum": {1: "sum(CAST({0} AS DOUBLE))"},
    "approx_quantile": {2: "percentile_approx({0}, {1})"},
    # duck kurtosis/skewness are BIAS-CORRECTED (sample) statistics;
    # Spark's are population. Exact correction formulas, pinned:
    # kurtosis([1,2,3,4]) = -1.2 (NULL when n<=3),
    # skewness([1,2,4,8]) = 1.1376243669576889 (NULL when n<=2)
    "kurtosis": {
        1: (
            "CASE WHEN count({0}) > 3 THEN "
            "try_divide((count({0}) - 1) * 1.0, "
            "(count({0}) - 2) * (count({0}) - 3)) * "
            "((count({0}) + 1) * __SPARK_KURTOSIS__({0}) + 6) "
            "ELSE NULL END"
        )
    },
    "skewness": {
        1: (
            "CASE WHEN count({0}) > 2 THEN "
            "__SPARK_SKEWNESS__({0}) * sqrt(count({0}) * (count({0}) - 1.0)) "
            "/ (count({0}) - 2) ELSE NULL END"
        )
    },
    "kurtosis_pop": {1: "__SPARK_KURTOSIS__({0})"},
    # duck's list(x) aggregate (the ORDER BY form is handled by
    # _rewrite_agg_order_by before this registry runs)
    "list": {1: "collect_list({0})"},
    # typeof → duck's type spellings for the scalar types (pinned:
    # SMALLINT not smallint, VARCHAR not string, TIMESTAMP '…' is a
    # TIMESTAMP); parameterized/nested types fall back to UPPER(spark
    # name) — DECIMAL(10,2) matches, ARRAY spellings diverge loudly
    "typeof": {
        1: (
            "coalesce(element_at(map("
            "'tinyint', 'TINYINT', 'smallint', 'SMALLINT', 'int', 'INTEGER', "
            "'integer', 'INTEGER', 'bigint', 'BIGINT', 'float', 'FLOAT', "
            "'double', 'DOUBLE', 'string', 'VARCHAR', 'boolean', 'BOOLEAN', "
            "'date', 'DATE', 'binary', 'BLOB', 'timestamp', 'TIMESTAMP', "
            "'timestamp_ntz', 'TIMESTAMP'), __SPARK_TYPEOF__({0})), "
            "upper(__SPARK_TYPEOF__({0})))"
        )
    },
}


# list_grade_up is duck's alias of grade_up (pinned: same NULLS-LAST
# ranking)
TEMPLATES["list_grade_up"] = TEMPLATES["grade_up"]

_PLACEHOLDERS = (
    ("__SPARK_KURTOSIS__(", "kurtosis("),
    ("__SPARK_SKEWNESS__(", "skewness("),
    ("__SPARK_TYPEOF__(", "typeof("),
)


# ---------------------------------------------------------------------------
# argument-dependent shims
# ---------------------------------------------------------------------------

_BRACKET_LIST = re.compile(r"^\s*\[(.*)\]\s*$", re.DOTALL)


def _quantile_disc(args: list[str]) -> str | None:
    """quantile_disc / quantile: NEAREST-RANK — the sorted element at
    ceil(q*n), clamped to [1, n] — pinned live by a q × n sweep in
    tests (the floor(q*(n-1))+1 rule diverges at q=0.75, n=2). A
    bracket-list q yields a LIST of quantiles."""
    if len(args) == 1:
        args = args + ["0.5"]  # duck's default median form
    if len(args) != 2:
        return None
    x, qq = args
    one = (
        "element_at(array_sort(collect_list({x})), "
        "greatest(1, CAST(ceil(({q}) * size(collect_list({x}))) AS INT)))"
    )
    lm = _BRACKET_LIST.match(qq)
    if lm:
        inner = one.replace("{x}", x).replace("{q}", "qd_q")
        return f"transform(array({lm.group(1)}), qd_q -> {inner})"
    return one.replace("{x}", x).replace("{q}", qq)


def _quantile_cont(args: list[str]) -> str | None:
    if len(args) == 1:
        args = args + ["0.5"]
    if len(args) != 2:
        return None
    x, qq = args
    lm = _BRACKET_LIST.match(qq)
    if lm:
        return f"percentile({x}, array({lm.group(1)}))"
    return f"percentile({x}, {qq})"


def _string_to_array(args: list[str]) -> str | None:
    """PG/duck string_to_array splits on a PLAIN separator; Spark's
    split is regex — literal separators regex-escape at bind time,
    expression separators pass through loudly (a '.'-separator would
    silently split on everything otherwise)."""
    if len(args) != 2:
        return None
    sm = _PLAIN_STR_LIT.match(args[1])
    if sm is None:
        return None
    sep = sm.group(1).replace("''", "'")
    escaped = re.escape(sep.replace("\\\\", "\\"))
    lit = escaped.replace("\\", "\\\\").replace("'", "''")
    return f"split({args[0]}, '{lit}')"


def _map_fn(args: list[str]) -> str | None:
    """duck map(keys_list, values_list) — Spark's map() is interleaved
    scalars, and BOTH are 2-arg-able, so only the unambiguous shape
    rewrites: a bracket-list literal first argument. Column-valued list
    args keep Spark's interleaved semantics (documented; duck users
    write map_from_arrays-able literals, Spark users write pairs)."""
    if len(args) == 2 and _BRACKET_LIST.match(args[0]):
        return f"map_from_arrays({args[0]}, {args[1]})"
    return None


def _inline_flags(pat: str, opts_arg: str) -> str | None:
    """duck's regex OPTIONS argument ('i', 's', 'm'/'n', 'c', 'g') →
    an inline (?ism) prefix on the pattern (round 12). Returns the
    flagged pattern, or None for non-literal / unknown options."""
    fm = _PLAIN_STR_LIT.match(opts_arg)
    if fm is None or not set(fm.group(1)) <= set("gismnc"):
        return None
    inline = "".join(
        ch for ch in fm.group(1).replace("n", "m") if ch in "ism"
    )
    if not inline:
        return pat
    pm = _PLAIN_STR_LIT.match(pat)
    if pm is None:
        return f"concat('(?{inline})', {pat})"
    return f"'(?{inline}){pm.group(1)}'"


def _regexp_matches(args: list[str]) -> str | None:
    """duck regexp_matches(x, p[, options]) — partial match; the
    3-arg options form inlines flags (round 12)."""
    if len(args) == 2:
        return None  # native regexp_like(x, p) is exact
    if len(args) == 3:
        pat = _inline_flags(args[1], args[2])
        if pat is None:
            return None
        return f"regexp_like({args[0]}, {pat})"
    return None


def _regexp_extract(args: list[str]) -> str | None:
    """duck regexp_extract defaults to group 0 (whole match) — Spark
    defaults to group 1 and ERRORS on group-free patterns (pinned).
    The name-list form returns a STRUCT of named groups."""
    if len(args) == 2:
        return f"regexp_extract({args[0]}, {args[1]}, 0)"
    if len(args) == 3:
        lm = _BRACKET_LIST.match(args[2])
        if lm:
            pat = args[1]
            pm = _PLAIN_STR_LIT.match(pat)
            if pm is not None:
                # RE2's (?P<name>…) group syntax → Java's (?<name>…)
                pat = "'" + pm.group(1).replace("(?P<", "(?<") + "'"
            names = _split_args(lm.group(1))
            fields = []
            for i, nm in enumerate(names, start=1):
                litm = _PLAIN_STR_LIT.match(nm)
                if litm is None:
                    return None
                fields.append(
                    f"'{litm.group(1)}', regexp_extract({args[0]}, {pat}, {i})"
                )
            return "named_struct(" + ", ".join(fields) + ")"
    if len(args) == 4:
        # (x, p, group, options) — options inline as flags (round 12)
        pat = _inline_flags(args[1], args[3])
        if pat is None:
            return None
        return f"regexp_extract({args[0]}, {pat}, {args[2]})"
    return None


def _regexp_extract_all(args: list[str]) -> str | None:
    if len(args) == 2:
        return f"regexp_extract_all({args[0]}, {args[1]}, 0)"
    if len(args) == 4:
        pat = _inline_flags(args[1], args[3])
        if pat is None:
            return None
        return f"regexp_extract_all({args[0]}, {pat}, {args[2]})"
    return None


def _backrefs_to_java(lit_body: str) -> str:
    """duck/RE2 replacement backrefs (\\N in the VALUE, rendered \\\\N in
    the Spark-escaped statement text) → Java's $N; literal $ escaped."""
    s = lit_body.replace("$", "\\$")
    return re.sub(r"\\\\(\d)", r"$\1", s)


def _regexp_replace(args: list[str]) -> str | None:
    """duck regexp_replace WITHOUT the 'g' flag replaces the FIRST match
    only (pinned: regexp_replace('aaa','a','b') = 'baa'); Spark is
    always-global. 'g' lowers to the native call; first-only is
    composed from regexp_instr + a prefix-bounded native replace (the
    prefix ends exactly at the first match's end, so backrefs work).
    Flags i/s/m become inline (?ism) prefixes on literal patterns."""
    if len(args) not in (3, 4):
        return None
    s, pat, rep = args[0], args[1], args[2]
    flags = ""
    if len(args) == 4:
        fm = _PLAIN_STR_LIT.match(args[3])
        if fm is None:
            return None  # non-literal flags: loud
        flags = fm.group(1)
        if not set(flags) <= set("gism"):
            return None
    inline = "".join(ch for ch in flags if ch in "ism")
    if inline:
        pm = _PLAIN_STR_LIT.match(pat)
        if pm is None:
            pat = f"concat('(?{inline})', {pat})"
        else:
            pat = f"'(?{inline}){pm.group(1)}'"
    rm = _PLAIN_STR_LIT.match(rep)
    if rm is not None:
        rep = f"'{_backrefs_to_java(rm.group(1))}'"
    if "g" in flags:
        return f"regexp_replace({s}, {pat}, {rep})"
    first = (
        "CASE WHEN regexp_instr({s}, {p}) = 0 THEN {s} ELSE "
        "concat(regexp_replace(substring({s}, 1, regexp_instr({s}, {p}) "
        "+ length(regexp_extract({s}, {p}, 0)) - 1), {p}, {r}), "
        "substring({s}, regexp_instr({s}, {p}) "
        "+ length(regexp_extract({s}, {p}, 0)))) END"
    )
    return first.replace("{s}", s).replace("{p}", pat).replace("{r}", rep)


_FMT_SPEC = re.compile(
    r"^(?P<idx>\d+)?(?::(?P<fill>[^{}](?=[<>^]))?(?P<align>[<>^])?(?P<sign>[-+ ])?"
    r"(?P<zero>0)?(?P<width>\d+)?(?:\.(?P<prec>\d+))?(?P<type>[dfsxXeEgGo])?)?$"
)


def _fmt_spec_to_printf(spec: str) -> str | None:
    """One fmt-style `{...}` spec → printf conversion for format_string
    (round 13): `{}`→%s, `{N}`→%N$s, `{:.2f}`→%.2f, `{:d}`→%d,
    `{:>8}`→%8s, `{:05d}`→%05d, `{:x}`→%x. Left-align (<) maps to the
    printf '-' flag; center (^) and fill chars have no printf twin →
    None (loud). Pinned live: duck format('{:.2f}', 3.14159)='3.14',
    format('{:>5}', 'ab')='   ab', format('{:x}', 255)='ff'."""
    m = _FMT_SPEC.match(spec)
    if m is None or (m.group("fill") and m.group("fill") != " "):
        return None
    if m.group("align") == "^":
        return None
    flags = ""
    if m.group("align") == "<":
        flags += "-"
    if m.group("sign") in ("+", " "):
        flags += m.group("sign")
    if m.group("zero"):
        flags += "0"
    width = m.group("width") or ""
    prec = f".{m.group('prec')}" if m.group("prec") else ""
    ty = m.group("type") or ("f" if prec else "s")
    pos = f"{int(m.group('idx')) + 1}$" if m.group("idx") else ""
    return f"%{pos}{flags}{width}{prec}{ty}"


def _format(args: list[str]) -> str | None:
    """duck format('{} x {}', …) (fmt-style) → format_string (printf).
    Literal formats only; {} auto-indexes, {N} is explicit (mixing the
    two is a duck error — pinned); {{ }} are literal braces. Specs
    ({:.2f}) pass through untouched → loud."""
    if not args:
        return None
    fm = _PLAIN_STR_LIT.match(args[0])
    if fm is None:
        return None
    body = fm.group(1)
    out, i, n = [], 0, len(body)
    convs: list[tuple[int | None, str]] = []
    while i < n:
        c = body[i]
        if c == "{":
            if body.startswith("{{", i):
                out.append("{")
                i += 2
                continue
            j = body.find("}", i)
            if j == -1:
                return None
            spec = body[i + 1 : j]
            conv = _fmt_spec_to_printf(spec)
            if conv is None:
                return None  # exotic format specs: loud pass-through
            sm = _FMT_SPEC.match(spec)
            argslot = (
                int(sm.group("idx")) + 1 if sm.group("idx") else None
            )
            convs.append((argslot, conv[-1]))
            out.append(conv)
            i = j + 1
            continue
        if c == "}":
            if body.startswith("}}", i):
                out.append("}")
                i += 2
                continue
            return None
        if c == "%":
            out.append("%%")
            i += 1
            continue
        out.append(c)
        i += 1
    fmt = "".join(out).replace("'", "''")
    # Java's String.format is strict about argument CLASSES where duck
    # coerces (%f on a DECIMAL literal throws) — cast each consumed
    # argument to the conversion's natural type (round 13, pinned:
    # format('{:.2f}', 3.0) = '3.00')
    casts = {"f": "DOUBLE", "e": "DOUBLE", "g": "DOUBLE",
             "d": "BIGINT", "x": "BIGINT", "X": "BIGINT", "o": "BIGINT"}
    rest_args = list(args[1:])
    auto = 0
    for slot, ty in convs:
        if slot is None:
            slot = auto = auto + 1
        if ty in casts and 1 <= slot <= len(rest_args):
            rest_args[slot - 1] = (
                f"CAST(({rest_args[slot - 1]}) AS {casts[ty]})"
            )
    rest = ", ".join(rest_args)
    return f"format_string('{fmt}'{', ' + rest if rest else ''})"


_PRINTF_CONV = re.compile(r"%(?:(\d+)\$)?[-+ 0#]*\d*(?:\.\d+)?([diufFeEgGxXos%])")


def _printf(args: list[str]) -> str | None:
    """printf passes through to Spark's native printf, but Java's
    String.format is strict about argument classes where duck coerces
    (%f rejects a DECIMAL, %d rejects an INT-typed DECIMAL) — for a
    LITERAL format, cast each consumed argument to the conversion's
    natural type (round 13, pinned: printf('%5.2f', 3.14159)=' 3.14').
    Non-literal formats pass through untouched."""
    if not args:
        return None
    fm = _PLAIN_STR_LIT.match(args[0])
    if fm is None:
        return None
    casts = {"f": "DOUBLE", "F": "DOUBLE", "e": "DOUBLE", "E": "DOUBLE",
             "g": "DOUBLE", "G": "DOUBLE", "d": "BIGINT", "i": "BIGINT",
             "u": "BIGINT", "x": "BIGINT", "X": "BIGINT", "o": "BIGINT"}
    rest = list(args[1:])
    auto = 0
    for pos, ty in _PRINTF_CONV.findall(fm.group(1)):
        if ty == "%":
            continue
        slot = int(pos) if pos else (auto := auto + 1)
        if ty in casts and 1 <= slot <= len(rest):
            rest[slot - 1] = f"CAST(({rest[slot - 1]}) AS {casts[ty]})"
    # duck's %i/%u aren't Java conversions — normalize to %d
    body = re.sub(
        r"(%(?:\d+\$)?[-+ 0#]*\d*(?:\.\d+)?)[iu]", r"\1d", fm.group(1)
    )
    lit = "'" + body.replace("'", "''") + "'"
    return f"printf({', '.join([lit] + rest)})" if rest else f"printf({lit})"


def _alias(args: list[str]) -> str | None:
    """alias(expr) returns duck's rendered NAME of the expression —
    exact for identifiers (last path segment, pinned: alias(t.c)='c');
    other shapes use the argument text (documented approximation of
    duck's AST rendering)."""
    if len(args) != 1:
        return None
    a = args[0].strip()
    if re.fullmatch(r"[\w.]+", a):
        name = a.split(".")[-1]
    else:
        name = a
    return "'" + name.replace("'", "''") + "'"


_INTERVAL_LIT = re.compile(
    r"^\s*INTERVAL\s+(?:'(\d+)\s*(\w+)'|(\d+)\s*(\w+))\s*$", re.IGNORECASE
)
_UNIT_SECONDS = {
    "second": 1, "seconds": 1, "minute": 60, "minutes": 60,
    "hour": 3600, "hours": 3600, "day": 86400, "days": 86400,
    "week": 604800, "weeks": 604800,
}
_TB_ORIGIN = 946857600  # 2000-01-03 00:00:00 UTC — duck's sub-month origin


def _time_bucket(args: list[str]) -> str | None:
    """time_bucket(width, ts[, origin]): epoch-floor against duck's
    documented origins (2000-01-03 for sub-month widths — a Monday, so
    weekly buckets align to ISO weeks; 2000-01-01 for month multiples),
    or the explicit 3rd-arg origin (round 13, pinned live: 10-minute
    buckets from :02 put :37 in :32). Literal widths only; offset
    variants pass through → loud."""
    if len(args) not in (2, 3):
        return None
    m = _INTERVAL_LIT.match(args[0])
    if m is None:
        return None
    qty = int(m.group(1) or m.group(3))
    unit = (m.group(2) or m.group(4)).lower()
    ts = args[1]
    origin = args[2] if len(args) == 3 else None
    if unit in _UNIT_SECONDS:
        w = qty * _UNIT_SECONDS[unit]
        o = (
            f"unix_timestamp(CAST({origin} AS TIMESTAMP))"
            if origin
            else str(_TB_ORIGIN)
        )
        return (
            f"timestamp_seconds((floor(try_divide(unix_timestamp(CAST({ts} AS "
            f"TIMESTAMP)) - {o}, {w})) * {w}) + {o})"
        )
    months = {"month": 1, "months": 1, "year": 12, "years": 12}.get(unit)
    if months is None:
        return None
    mm = qty * months
    # month-width origins are month-ALIGNED: duck ignores the origin's
    # day (pinned live: 2-month buckets from 2024-01-15 put 2024-05-20
    # in 2024-05-01, from 2024-02-15 in 2024-04-01)
    od = (
        f"trunc(CAST({origin} AS DATE), 'MM')"
        if origin
        else "DATE '2000-01-01'"
    )
    return (
        f"add_months({od}, CAST(floor(try_divide("
        f"months_between(trunc(CAST({ts} AS DATE), 'MM'), {od}), {mm})) "
        f"* {mm} AS INT))"
    )


def _date_part(args: list[str]) -> str | None:
    """date_part(['year','month'], d) → STRUCT of parts (duck's
    multi-part form); scalar dow/isodow/isoyear parts get the
    offset-corrected spellings (duck: Sunday dow=0, isodow=7 — pinned;
    Spark extract dow: Sunday=1)."""
    if len(args) != 2:
        return None
    lm = _BRACKET_LIST.match(args[0])
    d = args[1]
    if lm:
        parts = _split_args(lm.group(1))
        fields = []
        for p in parts:
            pm = _PLAIN_STR_LIT.match(p)
            if pm is None:
                return None
            nm = pm.group(1).lower()
            fields.append(f"'{nm}', {_one_part(nm, d)}")
        return "named_struct(" + ", ".join(fields) + ")"
    pm = _PLAIN_STR_LIT.match(args[0])
    if pm and pm.group(1).lower() in (
        "dow", "isodow", "isoyear", "dayofweek",
        "second", "seconds", "millisecond", "milliseconds",
        "microsecond", "microseconds",
    ):
        return _one_part(pm.group(1).lower(), d)
    return None  # native date_part covers the rest


def _one_part(name: str, d: str) -> str:
    if name in ("dow", "dayofweek"):
        return f"(dayofweek({d}) - 1)"
    if name == "isodow":
        return f"(weekday({d}) + 1)"
    if name == "isoyear":
        return TEMPLATES["isoyear"][1].replace("{0}", d)
    # duck's sub-second parts (round 12, pinned live): second TRUNCATES
    # to BIGINT; milli/microseconds scale the fractional seconds. The
    # date_part('SECOND', …) spelling on purpose: fn_shims skips past
    # its own replacements, and the later _rewrite_extract_subsec pass
    # matches only the EXTRACT keyword — an extract(SECOND …) here
    # would be double-rewritten (its truncation would eat the fraction
    # the milli/micro scalers need)
    if name in ("second", "seconds"):
        return f"CAST(floor(date_part('SECOND', {d})) AS BIGINT)"
    # milliseconds TRUNCATE too (pinned live: 01.9996 → 1999, not
    # 2000); microseconds are exact at µs granularity so floor == round
    if name in ("millisecond", "milliseconds"):
        return f"CAST(floor(date_part('SECOND', {d}) * 1000) AS BIGINT)"
    if name in ("microsecond", "microseconds"):
        return f"CAST(floor(date_part('SECOND', {d}) * 1000000) AS BIGINT)"
    return f"date_part('{name}', {d})"


def _count(args: list[str]) -> str | None:
    """count() → count(*); count(t.*) counts rows like count(*) in duck
    (pinned: NULL columns do not exclude the row)."""
    if not args or all(not a.strip() for a in args):
        return "count(*)"
    if len(args) == 1 and re.fullmatch(r"[\w.]+\.\*", args[0].strip()):
        return "count(*)"
    return None


_TWO_ARG_LAMBDA = re.compile(
    r"^\s*\(\s*(\w+)\s*,\s*(\w+)\s*\)\s*->(.*)$", re.DOTALL
)


def _index_lambda(fname: str):
    """list_transform/list_filter two-parameter lambdas: duck's index
    parameter is 1-BASED (pinned: list_transform([10,20],(x,i)->x+i) =
    [11,22]); Spark's is 0-based — substitute i → (i + 1) in the body."""

    def shim(args: list[str]) -> str | None:
        if len(args) != 2:
            return None
        m = _TWO_ARG_LAMBDA.match(args[1])
        if m is None:
            return None
        var, idx, body = m.group(1), m.group(2), m.group(3)
        masked = _mask_literals(body)
        out, pos = [], 0
        for wm in re.finditer(rf"\b{re.escape(idx)}\b", masked):
            out.append(body[pos : wm.start()])
            out.append(f"({idx} + 1)")
            pos = wm.end()
        out.append(body[pos:])
        target = "transform" if fname == "list_transform" else "filter"
        return f"{target}({args[0]}, ({var}, {idx}) -> {''.join(out)})"

    return shim


def _bar(args: list[str]) -> str | None:
    """duck bar(x, min, max[, width=80]) — the Unicode block-glyph bar
    chart helper (duckdb core_functions bar.cpp, pinned live 1.0):
    width = clamp-to-[0, w] linear fraction, rendered as full blocks +
    one partial-eighth glyph, then space-padded up to `width` BYTES
    (each block glyph is 3 UTF-8 bytes — 'bar(3,0,10,10)' is 3 blocks +
    ONE space). Loud duck errors for width < 1 / > 1000. Pure JVM
    expression — deterministic, codegen'd."""
    if len(args) == 3:
        args = [*args, "80"]
    if len(args) != 4:
        return None
    x, lo, hi, w = (a.strip() for a in args)
    wd = f"CAST({w} AS DOUBLE)"
    width = (
        f"(CASE WHEN ({x}) <= ({lo}) THEN CAST(0 AS DOUBLE) "
        f"WHEN ({x}) >= ({hi}) THEN {wd} "
        f"ELSE {wd} * (({x}) - ({lo})) / (({hi}) - ({lo})) END)"
    )
    wi = f"CAST({width} * 8 AS BIGINT)"
    full = f"CAST({wi} div 8 AS INT)"
    rem = f"CAST({wi} % 8 AS INT)"
    partials = "'', '▏', '▎', '▍', '▌', '▋', '▊', '▉'"
    barstr = (
        f"concat(repeat('█', {full}), "
        f"element_at(array({partials}), {rem} + 1))"
    )
    nbytes = f"({full} * 3 + CASE WHEN {rem} > 0 THEN 3 ELSE 0 END)"
    pad = f"greatest(CAST({w} AS INT) - {nbytes}, 0)"
    return (
        f"CASE WHEN ({w}) < 1 THEN raise_error("
        "'Out of Range Error: Max bar width must be >= 1') "
        f"WHEN ({w}) > 1000 THEN raise_error("
        "'Out of Range Error: Max bar width must be <= 1000') "
        f"ELSE concat({barstr}, repeat(' ', {pad})) END"
    )


_BRACKET_LIST_HEAD = re.compile(
    r"^\s*(\[|array\s*\(|list_value\s*\(|collect_list\s*\(|collect_set\s*\()",
    re.IGNORECASE,
)


def _len(args: list[str]) -> str | None:
    """duck len() is polymorphic string/list — a PROVABLE list argument
    routes to size(); everything else falls to the length() template."""
    if len(args) == 1 and _BRACKET_LIST_HEAD.match(args[0]):
        return f"size({args[0]})"
    return None


def _make_timestamp(args: list[str]) -> str | None:
    """duck 1-arg make_timestamp(microseconds) (round 11); the 6-arg
    calendar form matches Spark natively and passes through."""
    if len(args) == 1:
        return f"timestamp_micros(CAST({args[0]} AS BIGINT))"
    return None


def _json_path(p: str) -> str | None:
    """Normalize a duck json path LITERAL ('a', '$.a.b[1]', '/a/b') to
    Spark's $-rooted form; None for non-literal / list paths (loud)."""
    pm = re.fullmatch(r"\s*'((?:[^']|'')*)'\s*", p)
    if pm is None:
        return None
    raw = pm.group(1)
    if raw.startswith("$"):
        return raw
    if raw.startswith("/"):
        segs = [s for s in raw.split("/") if s]
        out = "$"
        for s in segs:
            out += f"[{s}]" if s.isdigit() else f".{s}"
        return out
    return f"$.{raw}"


def _json_extract(args: list[str]) -> str | None:
    """duck json_extract returns JSON text (string leaves KEEP their
    quotes — '\"x\"'); Spark's variant path extraction + to_json
    reproduces that rendering exactly (pinned live round 11). Only
    literal scalar paths rewrite; list-path / dynamic forms are loud."""
    if len(args) != 2:
        return None
    path = _json_path(args[1])
    if path is None:
        return None
    return f"to_json(variant_get(try_parse_json(CAST({args[0]} AS STRING)), '{path}'))"


def _json_extract_string(args: list[str]) -> str | None:
    """->> semantics: TEXT extraction (string leaves unquoted)."""
    if len(args) != 2:
        return None
    path = _json_path(args[1])
    if path is None:
        return None
    return f"get_json_object(CAST({args[0]} AS STRING), '{path}')"


def _duck_structure_to_schema(txt: str, all_strings: bool = False) -> str | None:
    """duck json_transform's STRUCTURE argument ({"n": "INTEGER"}) →
    a Spark DDL schema string for from_json. Nested objects/arrays
    recurse; unknown spellings return None (pass through loudly).
    all_strings swaps every leaf for STRING (same shape) — the read
    schema behind duck's leaf coercion."""
    import json as _json

    try:
        v = _json.loads(txt)
    except Exception:
        return None
    from duck_server_spark.plans.rewrites import normalize_type

    def conv(node):
        if isinstance(node, dict):
            inner = []
            for k, x in node.items():
                cx = conv(x)
                if cx is None:
                    return None
                inner.append(f"`{k}`: {cx}")
            return "STRUCT<" + ", ".join(inner) + ">"
        if isinstance(node, list) and node:
            cx = conv(node[0])
            return None if cx is None else f"ARRAY<{cx}>"
        if isinstance(node, str):
            return "STRING" if all_strings else normalize_type(node)
        return None

    return conv(v)


def _json_transform(args: list[str]) -> str | None:
    """duck json_transform(j, structure) casts a JSON document to the
    given structure → from_json with an all-STRING twin of the schema,
    then a struct cast to the target (round 12): duck COERCES JSON
    string leaves to the target type ('"7"' → INTEGER 7) where Spark's
    from_json strictly nulls them — reading as strings first and
    casting reproduces the coercion. Only literal structure strings
    rewrite; dynamic ones are loud."""
    if len(args) != 2:
        return None
    sm = _PLAIN_STR_LIT.match(args[1])
    if sm is None:
        return None
    raw = sm.group(1).replace("''", "'")
    target = _duck_structure_to_schema(raw)
    stringly = _duck_structure_to_schema(raw, all_strings=True)
    if target is None or not target.startswith(("STRUCT", "ARRAY")):
        return None
    return (
        f"CAST(from_json(CAST({args[0]} AS STRING), '{stringly}') "
        f"AS {target})"
    )


def _bitstring_agg(args: list[str]) -> str | None:
    """duck bitstring_agg(x[, lo, hi]): a bit per value in [lo, hi]
    (defaults: the group's min/max), rendered as duck's BIT text
    ('0101100', leftmost = lo). Composed from built-ins — sequence over
    the span + a collect_set membership test — so it stays JVM-side;
    group-bounded like the other collect shims (dialect tier). Pinned:
    bitstring_agg(x, 0, 6) over {1,3,4} = '0101100'."""
    if len(args) == 1:
        x, lo, hi = args[0], f"min({args[0]})", f"max({args[0]})"
    elif len(args) == 3:
        x, lo, hi = args
    else:
        return None
    return (
        f"array_join(transform(sequence(0, CAST(({hi}) - ({lo}) AS INT)), "
        f"bs_i -> CASE WHEN array_contains(collect_set({x}), "
        f"bs_i + ({lo})) THEN '1' ELSE '0' END), '')"
    )


def _struct_insert(args: list[str]) -> str | None:
    """struct_insert({…}, name := expr, …) with a BRACE-LITERAL struct:
    merged at bind time into one literal (the later brace pass converts
    it to named_struct). Non-literal struct args pass through (loud —
    Spark has no SQL-level field insert)."""
    if len(args) < 2:
        return None
    base = args[0].strip()
    if not (base.startswith("{") and base.endswith("}")):
        return None
    adds = []
    for a in args[1:]:
        am = re.match(r"\s*([A-Za-z_]\w*)\s*:=(.*)$", a, re.DOTALL)
        if am is None:
            return None
        adds.append(f"'{am.group(1)}': {am.group(2).strip()}")
    inner = base[1:-1].strip()
    joined = (inner + ", " if inner else "") + ", ".join(adds)
    return "{" + joined + "}"


def _timezone(args: list[str]) -> str | None:
    """duck timezone(tz, ts) has TWO overloads (review r11, pinned
    live): a NAIVE timestamp is wall time in tz -> instant
    (to_utc_timestamp), while a TIMESTAMPTZ is an instant -> wall time
    in tz (from_utc_timestamp — duck returned NY 00:00 for the 05:00+00
    instant). The TZ form is provable for TIMESTAMPTZ literals / '::'
    casts; anything else takes the naive reading (the common column
    case — documented)."""
    if len(args) != 2:
        return None
    ts = args[1].strip()
    if re.match(r"^TIMESTAMPTZ\s*'", ts, re.IGNORECASE) or re.search(
        r"::\s*TIMESTAMPTZ\s*$", ts, re.IGNORECASE
    ):
        naive = re.sub(r"(?i)\bTIMESTAMPTZ\b", "TIMESTAMP", ts)
        return f"from_utc_timestamp({naive}, {args[0]})"
    return f"to_utc_timestamp({ts}, {args[0]})"


def _null_literal_arg(args: list[str]) -> str | None:
    """A bare untyped NULL literal argument can't reach zip_with (typed
    NULL columns ride the CASE guard): short-circuit to NULL."""
    if any(re.fullmatch(r"\s*NULL\s*", a, re.IGNORECASE) for a in args):
        return "CAST(NULL AS DOUBLE)"
    return None  # fall through to the template


def _generate_subscripts(args: list[str]) -> str | None:
    """generate_subscripts(l, 1) enumerates 1-based positions (a row
    generator, pinned live round 13). Only dimension literal 1 — lists
    have one dimension here; other dims pass through → loud."""
    if len(args) != 2 or args[1].strip() != "1":
        return None
    return f"explode(sequence(1, size({args[0]})))"


CALLABLES: dict[str, object] = {
    "printf": _printf,
    "generate_subscripts": _generate_subscripts,
    "list_cosine_similarity": _null_literal_arg,
    "list_inner_product": _null_literal_arg,
    "list_dot_product": _null_literal_arg,
    "list_distance": _null_literal_arg,
    "string_to_array": _string_to_array,
    "quantile_disc": _quantile_disc,
    "quantile": _quantile_disc,
    "quantile_cont": _quantile_cont,
    "map": _map_fn,
    "regexp_matches": _regexp_matches,
    "regexp_extract": _regexp_extract,
    "regexp_extract_all": _regexp_extract_all,
    "regexp_replace": _regexp_replace,
    "format": _format,
    "alias": _alias,
    "time_bucket": _time_bucket,
    "bar": _bar,
    "len": _len,
    "make_timestamp": _make_timestamp,
    "json_extract": _json_extract,
    "json_extract_path": _json_extract,
    "json_extract_string": _json_extract_string,
    "json_extract_path_text": _json_extract_string,
    "struct_insert": _struct_insert,
    "json_transform": _json_transform,
    "from_json": _json_transform,  # duck aliases from_json to it
    "bitstring_agg": _bitstring_agg,
    "timezone": _timezone,
    "date_part": _date_part,
    "datepart": _date_part,
    "count": _count,
    "list_transform": _index_lambda("list_transform"),
    "list_filter": _index_lambda("list_filter"),
    # alias spellings share the 1-based-index lambda handling
    "list_apply": _index_lambda("list_transform"),
    "array_apply": _index_lambda("list_transform"),
    "array_transform": _index_lambda("list_transform"),
    "array_filter": _index_lambda("list_filter"),
}

# ---------------------------------------------------------------------------
# ORDER BY inside aggregate arguments (duck: list/array_agg/first/last/
# any_value accept `agg(x ORDER BY k [DESC])`)
# ---------------------------------------------------------------------------

_AGG_ORDER = re.compile(
    r"\b(list|array_agg|collect_list|any_value|first|last)\s*\(", re.IGNORECASE
)
_ORDER_IN_ARGS = re.compile(r"\bORDER\s+BY\b", re.IGNORECASE)


def _rewrite_agg_order_by(q: str) -> str:
    """`agg(x ORDER BY k [ASC|DESC] [NULLS FIRST|LAST], …)` →
    order-aware Spark spellings. DuckDB's default is NULLS LAST in
    BOTH directions (the _rewrite_string_agg pin; review-caught —
    the first version sorted NULL keys first and dropped the NULL-key
    row first/last should return):

    - first/last/any_value → min_by/max_by over a NULL-RANKED struct
      key ((k IS [NOT] NULL, k) — the marker orients NULL-key rows to
      win or lose the extremization per the NULLS spec), so
      `last(x ORDER BY y)` returns the NULL-key row exactly like duck.
      Keys must share one direction (else loud).
    - list/array_agg → ONE sorted-struct collect with an explicit
      COMPARATOR lambda (per-key direction + NULLS placement — mixed
      directions supported), value projected back out. One aggregate,
      no extra shuffle."""
    pos = 0
    while True:
        masked = _mask_literals(q)
        m = _AGG_ORDER.search(masked, pos)
        if m is None:
            return q
        end = _scan_balanced(masked, m.end())
        inner, minner = q[m.end() : end - 1], masked[m.end() : end - 1]
        om = None
        for cand in _ORDER_IN_ARGS.finditer(minner):
            before = minner[: cand.start()]
            if all(before.count(o) == before.count(c) for o, c in ("()", "[]", "{}")):
                om = cand
                break
        if om is None:
            pos = m.end()
            continue
        expr = inner[: om.start()].strip()
        keys = _split_args(inner[om.end() :], minner[om.end() :])
        parsed = []  # (key_expr, asc, nulls_last)
        ok = True
        for k in keys:
            km = re.match(
                r"^(.*?)(?:\s+(ASC|DESC))?(?:\s+NULLS\s+(FIRST|LAST))?$",
                k.strip(),
                re.IGNORECASE | re.DOTALL,
            )
            if km is None:
                ok = False
                break
            asc = (km.group(2) or "ASC").upper() == "ASC"
            nulls_last = (km.group(3) or "LAST").upper() == "LAST"
            parsed.append((km.group(1).strip(), asc, nulls_last))
        if not ok or not parsed:
            pos = m.end()
            continue
        name = m.group(1).lower()
        ascs = {a for _, a, _ in parsed}
        if name in ("any_value", "first", "last"):
            if len(ascs) > 1:
                pos = m.end()  # mixed-direction multi-key: loud
                continue
            asc = parsed[0][1]
            # marker (k IS NULL) iff direction == NULLS placement (see
            # docstring); encoded key's lexicographic extreme matches
            # the requested order's first/last row including NULL keys
            fields = []
            for k, a, nl in parsed:
                marker = "IS NULL" if a == nl else "IS NOT NULL"
                fields.append(f"(({k}) {marker})")
                fields.append(k)
            key = "struct(" + ", ".join(fields) + ")"
            want_max = (name == "last") == asc
            fn = "max_by" if want_max else "min_by"
            repl = f"{fn}({expr}, {key})"
        else:  # list / array_agg / collect_list
            key_fields = ", ".join(
                f"({k}) AS ao_k{i}" for i, (k, _a, _n) in enumerate(parsed)
            )
            cmp = "0"
            for i in reversed(range(len(parsed))):
                _k, a, nl = parsed[i]
                lt, gt = ("-1", "1") if a else ("1", "-1")
                anull, bnull = ("1", "-1") if nl else ("-1", "1")
                cmp = (
                    f"CASE WHEN ao_a.ao_k{i} IS NULL AND ao_b.ao_k{i} IS NULL "
                    f"THEN {cmp} "
                    f"WHEN ao_a.ao_k{i} IS NULL THEN {anull} "
                    f"WHEN ao_b.ao_k{i} IS NULL THEN {bnull} "
                    f"WHEN ao_a.ao_k{i} < ao_b.ao_k{i} THEN {lt} "
                    f"WHEN ao_a.ao_k{i} > ao_b.ao_k{i} THEN {gt} "
                    f"ELSE {cmp} END"
                )
            repl = (
                f"transform(array_sort(collect_list(struct({key_fields}, "
                f"({expr}) AS ao_v)), (ao_a, ao_b) -> {cmp}), "
                "ao_s -> ao_s.ao_v)"
            )
        q = q[: m.start()] + repl + q[end:]
        pos = m.start() + len(repl)


# ---------------------------------------------------------------------------
# list comprehensions: [expr FOR var IN src IF cond] (duck syntax) →
# transform(filter(src, var -> cond), var -> expr)
# ---------------------------------------------------------------------------

_COMPREHENSION = re.compile(r"\bFOR\s+(\w+)\s+IN\b", re.IGNORECASE)


def _rewrite_list_comprehension(q: str) -> str:
    while True:
        masked = _mask_literals(q)
        hit = None
        for m in _COMPREHENSION.finditer(masked):
            # enclosing [ … ] at depth 1 relative to the bracket
            depth = 0
            j = m.start()
            while j >= 0:
                if masked[j] in ")]}":
                    depth += 1
                elif masked[j] in "([{":
                    depth -= 1
                    if depth < 0:
                        break
                j -= 1
            if j < 0 or masked[j] != "[":
                continue
            # bracket end
            depth2, k = 0, j
            while k < len(masked):
                if masked[k] == "[":
                    depth2 += 1
                elif masked[k] == "]":
                    depth2 -= 1
                    if depth2 == 0:
                        break
                k += 1
            if k >= len(masked):
                continue
            hit = (j, k, m)
            break
        if hit is None:
            return q
        j, k, m = hit
        expr = q[j + 1 : m.start()].strip()
        var = m.group(1)
        tail = q[m.end() : k]
        mtail = _mask_literals(tail) if "'" in tail else tail
        im = None
        for cand in re.finditer(r"\bIF\b", mtail, re.IGNORECASE):
            before = mtail[: cand.start()]
            if all(before.count(o) == before.count(c) for o, c in ("()", "[]", "{}")):
                im = cand
                break
        if im is not None:
            src = tail[: im.start()].strip()
            cond = tail[im.end() :].strip()
            repl = f"transform(filter({src}, {var} -> {cond}), {var} -> {expr})"
        else:
            repl = f"transform({tail.strip()}, {var} -> {expr})"
        q = q[:j] + repl + q[k + 1 :]


_ALL_NAMES = sorted(set(TEMPLATES) | set(CALLABLES), key=len, reverse=True)
_FN_RE = re.compile(r"\b(" + "|".join(_ALL_NAMES) + r")\s*\(", re.IGNORECASE)

# extract(dow|isodow|isoyear FROM x) — the parts whose numbering/shape
# diverges; everything else stays native
_EXTRACT_PART = re.compile(
    r"\bextract\s*\(\s*(dow|isodow|isoyear|dayofweek)\s+from\b", re.IGNORECASE
)


def rewrite_fn_shims(q: str) -> str:
    """The registry pass + the extract-part fixups. Idempotent: every
    replacement either removes its trigger or hides it behind a
    placeholder resolved at the end."""
    q = _rewrite_list_comprehension(q)  # before bracket literals exist
    q = _rewrite_agg_order_by(q)  # before the registry sees list(…)
    # extract(diverging-part FROM x) first — the rewritten form contains
    # no extract( trigger for these parts
    while True:
        masked = _mask_literals(q)
        m = _EXTRACT_PART.search(masked)
        if m is None:
            break
        op = masked.index("(", m.start())
        end = _scan_balanced(masked, op + 1)
        inner = q[m.end() : end - 1]
        q = q[: m.start()] + _one_part(m.group(1).lower(), inner.strip()) + q[end:]
    q = _registry_scan(q)
    for ph, real in _PLACEHOLDERS:
        q = q.replace(ph, real)
    return q


def _registry_scan(q: str) -> str:
    """The name→template scan. Recurses into each call's ARGUMENTS before
    substituting (ADVICE r10): a shimmed call nested inside another
    shimmed call's argument list — regexp_replace(regexp_replace(x,…),…)
    — must be converted too, or duck's first-match-only inner semantics
    silently become Spark's global-replace ones. The skip-past-repl
    resume then never needs to look inside the replacement: everything
    user-written in it was already converted, and everything
    template-emitted is either a native Spark name or a placeholder."""
    pos = 0
    while True:
        masked = _mask_literals(q)
        m = _FN_RE.search(masked, pos)
        if m is None:
            break
        name = m.group(1).lower()
        end = _scan_balanced(masked, m.end())
        inner, minner = q[m.end() : end - 1], masked[m.end() : end - 1]
        args = _split_args(inner, minner)
        if len(args) == 1 and not args[0].strip():
            args = []
        # recurse into the arguments only when a shim can actually
        # consume them (review r11: unconditional recursion made deeply
        # nested UNSHIMMED calls quadratic — each depth re-scanned the
        # same text the main loop would visit anyway)
        if name in CALLABLES or (
            name in TEMPLATES and len(args) in TEMPLATES[name]
        ):
            args = [_registry_scan(a) for a in args]
        repl: str | None = None
        if name in CALLABLES:
            repl = CALLABLES[name](args)  # type: ignore[operator]
        if repl is None and name in TEMPLATES:
            tpl = TEMPLATES[name].get(len(args))
            if tpl is not None:
                # callback substitution, not sequential str.replace: an
                # argument whose TEXT contains "{1}" (brace literals)
                # must never be re-scanned for placeholders (the ADVICE
                # r8 date_diff lesson)
                repl = re.sub(
                    r"\{(\d)\}",
                    lambda pm: args[int(pm.group(1))].strip(),
                    tpl,
                )
        if repl is None:
            pos = m.end()  # uncovered shape: loud pass-through
            continue
        q = q[: m.start()] + repl + q[end:]
        pos = m.start() + len(repl)
    return q
