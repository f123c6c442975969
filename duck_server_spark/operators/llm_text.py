"""Text-analysis operators for large-scale training-data pipelines:
token counting, quality scoring, language ID, document fingerprinting.

These are north-star extensions beyond the reference's own surface
(BASELINE.json "north_star"): the operations a 100 TB pretraining-data
pipeline runs over a `documents` corpus. Design rules:

- Pure built-in expressions (split/regexp/higher-order lambdas) — the
  whole module is JVM-codegen'd, no Python in the hot path, trivially
  data-parallel: per-row map functions with NO shuffle at all. At 100 TB
  these run at scan speed.
- Every score is derived with the identical arithmetic expression on the
  oracle side so results are bit-equal.
- Expensive arrays are STAGED once per row as projected columns (toks,
  per-language hit counts) and referenced downstream — Spark's
  higher-order lambdas run interpreted with no CSE across references, so
  inlining `split()` into every consumer re-tokenizes the document 8-20×
  (the trap dedup.py measured at ~8.7-30×; same fix here).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duck_server_spark.engine.session import load_table

# Tokens: lowercase whitespace split. Both engines: regex split on \s+.
_TOKS = r"split(trim(text), '\\s+')"
_TOKS_DUCK = r"regexp_split_to_array(trim(text), '\s+')"

_STOPWORDS = "('the','a','an','of','and','or','in','on','to','is')"


def token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + BPE-ish regex token count
    (letter runs / digit runs / single punctuation, the GPT-2-style
    pre-tokenizer shape) + distinct-token count."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.selectExpr("doc_id", "text", "n_chars", f"{_TOKS} AS toks").selectExpr(
        "doc_id",
        "size(toks) AS n_ws_tokens",
        "size(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\\\s]', 0)) AS n_bpe_tokens",
        "size(array_distinct(toks)) AS n_distinct_tokens",
        "length(text) AS n_chars_measured",
        "n_chars",
    )


TOKEN_STATS_ORACLE = rf"""
SELECT doc_id,
       len({_TOKS_DUCK}) AS n_ws_tokens,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_bpe_tokens,
       len(list_distinct({_TOKS_DUCK})) AS n_distinct_tokens,
       length(text) AS n_chars_measured,
       n_chars
FROM documents
"""


def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality scoring: length saturation, stopword ratio,
    type-token ratio, mean word length — the standard cheap pre-filters
    (C4/Gopher-style) before expensive model-based scoring."""
    docs = load_table(spark, sf_dir, "documents")
    # stage 1: tokenize once; stage 2: the three counts, each once;
    # stage 3: ratios/score reference the counts. Identical arithmetic
    # to the oracle — only the evaluation count differs.
    return (
        docs.selectExpr("doc_id", "text", f"{_TOKS} AS toks")
        .selectExpr(
            "doc_id",
            "text",
            "size(toks) AS n_tokens",
            f"size(filter(toks, t -> t IN {_STOPWORDS})) AS stop_hits",
            "size(array_distinct(toks)) AS n_distinct",
        )
        .selectExpr(
            "doc_id",
            "n_tokens",
            "CAST(stop_hits AS DOUBLE) / n_tokens AS stopword_ratio",
            "CAST(n_distinct AS DOUBLE) / n_tokens AS type_token_ratio",
            "CAST(length(replace(text, ' ', '')) AS DOUBLE) / n_tokens AS mean_word_len",
            """
            0.4 * least(1.0, CAST(n_tokens AS DOUBLE) / 100.0)
            + 0.3 * (CAST(stop_hits AS DOUBLE) / n_tokens)
            + 0.3 * (CAST(n_distinct AS DOUBLE) / n_tokens)
            AS quality
            """,
        )
    )


QUALITY_SCORE_ORACLE = f"""
SELECT doc_id,
       len({_TOKS_DUCK}) AS n_tokens,
       CAST(len(list_filter({_TOKS_DUCK}, t -> t IN {_STOPWORDS})) AS DOUBLE) / len({_TOKS_DUCK}) AS stopword_ratio,
       CAST(len(list_distinct({_TOKS_DUCK})) AS DOUBLE) / len({_TOKS_DUCK}) AS type_token_ratio,
       CAST(length(replace(text, ' ', '')) AS DOUBLE) / len({_TOKS_DUCK}) AS mean_word_len,
       0.4 * least(1.0, CAST(len({_TOKS_DUCK}) AS DOUBLE) / 100.0)
       + 0.3 * (CAST(len(list_filter({_TOKS_DUCK}, t -> t IN {_STOPWORDS})) AS DOUBLE) / len({_TOKS_DUCK}))
       + 0.3 * (CAST(len(list_distinct({_TOKS_DUCK})) AS DOUBLE) / len({_TOKS_DUCK}))
       AS quality
FROM documents
"""

# Marker-word tables for the n-gram language-ID heuristic. (The fixture
# text is synthetic English-ish vocab, so predictions skew 'en' — the
# operator mechanics, not the model, are under test.)
_MARKERS = {
    "en": "('the','a','and','of','is')",
    "es": "('el','la','de','y','es')",
    "fr": "('le','la','et','de','est')",
    "de": "('der','die','und','von','ist')",
}


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-marker language ID with deterministic argmax tiebreak
    (en > es > fr > de > unknown)."""
    docs = load_table(spark, sf_dir, "documents")
    # toks staged once; each hits_* filter evaluated once; the argmax
    # CASE references the staged counts (was: 4 filters × up to 5
    # re-evaluations each inside the CASE).
    return (
        docs.selectExpr("doc_id", "lang", f"{_TOKS} AS toks")
        .selectExpr(
            "doc_id",
            "lang AS lang_labeled",
            *[
                f"size(filter(toks, t -> t IN {words})) AS hits_{lang}"
                for lang, words in _MARKERS.items()
            ],
        )
        .selectExpr(
            "doc_id",
            "lang_labeled",
            "hits_en",
            "hits_es",
            "hits_fr",
            "hits_de",
            """
            CASE
              WHEN hits_en >= hits_es AND hits_en >= hits_fr
                   AND hits_en >= hits_de AND hits_en > 0 THEN 'en'
              WHEN hits_es >= hits_fr AND hits_es >= hits_de
                   AND hits_es > 0 THEN 'es'
              WHEN hits_fr >= hits_de AND hits_fr > 0 THEN 'fr'
              WHEN hits_de > 0 THEN 'de'
              ELSE 'unknown'
            END AS lang_pred
            """,
        )
    )


def _duck_counts():
    return {
        lang: f"len(list_filter({_TOKS_DUCK}, t -> t IN {words}))"
        for lang, words in _MARKERS.items()
    }


_DC = _duck_counts()
LANG_ID_ORACLE = f"""
SELECT doc_id,
       lang AS lang_labeled,
       {_DC['en']} AS hits_en,
       {_DC['es']} AS hits_es,
       {_DC['fr']} AS hits_fr,
       {_DC['de']} AS hits_de,
       CASE
         WHEN {_DC['en']} >= {_DC['es']} AND {_DC['en']} >= {_DC['fr']}
              AND {_DC['en']} >= {_DC['de']} AND {_DC['en']} > 0 THEN 'en'
         WHEN {_DC['es']} >= {_DC['fr']} AND {_DC['es']} >= {_DC['de']}
              AND {_DC['es']} > 0 THEN 'es'
         WHEN {_DC['fr']} >= {_DC['de']} AND {_DC['fr']} > 0 THEN 'fr'
         WHEN {_DC['de']} > 0 THEN 'de'
         ELSE 'unknown'
       END AS lang_pred
FROM documents
"""


def fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprints: md5 content hash, polynomial rolling hash
    (mod 1e9+7, left-to-right — identical fold order in both engines),
    and a min-shingle fingerprint (the 1-hash MinHash)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.selectExpr("doc_id", "text", f"{_TOKS} AS toks").selectExpr(
        "doc_id",
        "md5(text) AS content_md5",
        """
        aggregate(split(text, ''), 0L,
                  (acc, c) -> (acc * 31 + ascii(c)) % 1000000007L) AS rolling_hash
        """,
        """
        array_min(transform(sequence(1, greatest(size(toks) - 2, 1)),
                  i -> md5(concat_ws(' ', slice(toks, i, 3))))) AS min_shingle_md5
        """,
    )


FINGERPRINT_ORACLE = f"""
SELECT doc_id,
       md5(text) AS content_md5,
       list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(str_split(text, ''), c -> ascii(c))),
                   (acc, c) -> (acc * 31 + c) % 1000000007) AS rolling_hash,
       list_min(list_transform(generate_series(1, greatest(len({_TOKS_DUCK}) - 2, 1)),
                i -> md5(concat_ws(' ', {_TOKS_DUCK}[i], {_TOKS_DUCK}[i+1], {_TOKS_DUCK}[i+2])))) AS min_shingle_md5
FROM documents
"""


QUERIES = {
    "text_token_stats": token_stats,
    "text_quality_score": quality_score,
    "text_lang_id": lang_id,
    "text_fingerprint": fingerprint,
}

ORACLE = {
    "text_token_stats": TOKEN_STATS_ORACLE,
    "text_quality_score": QUALITY_SCORE_ORACLE,
    "text_lang_id": LANG_ID_ORACLE,
    "text_fingerprint": FINGERPRINT_ORACLE,
}


def char_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-set Jaccard similarity against a reference phrase
    (DuckDB's built-in `jaccard` ≙ |chars∩|/|chars∪| — re-expressed with
    array ops in Spark). Cheap first-pass similarity for short strings."""
    docs = load_table(spark, sf_dir, "documents")
    ref = "the quick brown fox jumps over the lazy dog"
    return docs.selectExpr(
        "doc_id",
        f"""
        CAST(size(array_intersect(array_distinct(split(text, '')),
                                  array_distinct(split('{ref}', '')))) AS DOUBLE)
        / size(array_union(array_distinct(split(text, '')),
                           array_distinct(split('{ref}', '')))) AS char_jaccard
        """,
    )


CHAR_JACCARD_ORACLE = """
SELECT doc_id,
       jaccard(text, 'the quick brown fox jumps over the lazy dog') AS char_jaccard
FROM documents
"""

QUERIES["text_char_jaccard"] = char_jaccard
ORACLE["text_char_jaccard"] = CHAR_JACCARD_ORACLE


def edit_distance_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levenshtein edit distance between each doc and its near-dup
    mutation (first word dropped — the dedup fixtures' mutation rule).
    Per-pair, no shuffle beyond the id equi-join; the O(len²) DP runs
    JVM-side (built-in levenshtein). Cost is bounded by truncating to
    the first 120 chars — at corpus scale you run edit distance only on
    candidate pairs from a blocking stage, never all-pairs."""
    docs = load_table(spark, sf_dir, "documents")
    a = docs.filter((F.col("doc_id") % 25) == 0).selectExpr(
        "doc_id", "substring(text, 1, 120) AS t1"
    )
    b = docs.filter((F.col("doc_id") % 25) == 0).selectExpr(
        "doc_id", "substring(substring(text, instr(text, ' ') + 1), 1, 120) AS t2"
    )
    return (
        a.join(b, "doc_id")
        .selectExpr(
            "doc_id",
            "levenshtein(t1, t2) AS edit_dist",
            "CAST(1.0 - levenshtein(t1, t2) / CAST(greatest(length(t1), length(t2)) AS DOUBLE) AS DOUBLE) AS edit_sim",
        )
    )


EDIT_DISTANCE_ORACLE = """
WITH a AS (
  SELECT doc_id, substring(text, 1, 120) AS t1 FROM documents WHERE doc_id % 25 = 0
),
b AS (
  SELECT doc_id, substring(substring(text, instr(text, ' ') + 1), 1, 120) AS t2
  FROM documents WHERE doc_id % 25 = 0
)
SELECT a.doc_id,
       levenshtein(t1, t2) AS edit_dist,
       CAST(1.0 - levenshtein(t1, t2) / CAST(greatest(length(t1), length(t2)) AS DOUBLE) AS DOUBLE) AS edit_sim
FROM a JOIN b ON a.doc_id = b.doc_id
"""

QUERIES["text_edit_distance"] = edit_distance_pairs
ORACLE["text_edit_distance"] = EDIT_DISTANCE_ORACLE


def top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary stats: top-50 terms by document frequency —
    the wordcount shape at corpus scale. explode → map-side partial
    count → ONE shuffle on term → TakeOrderedAndProject top-k; at
    100 TB the partial aggregation collapses each partition to its
    distinct terms before anything moves."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.selectExpr(f"explode({_TOKS.replace('text', 'lower(text)')}) AS term")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("term").asc())
        .limit(50)
    )


TOP_TERMS_ORACLE = rf"""
SELECT term, count(*) AS freq
FROM (SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term FROM documents)
GROUP BY term
ORDER BY freq DESC, term ASC
LIMIT 50
"""

QUERIES["text_top_terms"] = top_terms
ORACLE["text_top_terms"] = TOP_TERMS_ORACLE

# ---------------------------------------------------------------------------
# Gopher-style repetition signals
# ---------------------------------------------------------------------------


def repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition filters (the Gopher/FineWeb rules adapted
    to single-line docs): fraction of tokens covered by the most common
    bigram, and fraction of trigram occurrences that are duplicates.

    Scale shape: the trigram-dup signal is pure per-row array math (scan
    speed, no shuffle). The top-bigram count goes through explode →
    map-side partial count → ONE shuffle keyed (doc_id, bigram) → max per
    doc — O(doc length) per doc, unlike the per-row
    distinct×filter formulation which is O(len²) and dies on 10k-token
    web documents. All fractions are single integer divisions — exact on
    both engines.
    """
    docs = load_table(spark, sf_dir, "documents")
    staged = docs.selectExpr("doc_id", f"{_TOKS} AS toks").selectExpr(
        "doc_id",
        "toks",
        "size(toks) AS n",
        """CASE WHEN size(toks) >= 3 THEN
             transform(sequence(1, size(toks) - 2),
                       i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1), ' ',
                                   element_at(toks, i + 2)))
           ELSE array() END AS trigrams""",
    )
    tri = staged.selectExpr(
        "doc_id",
        "n",
        "size(trigrams) AS n_tri",
        "size(trigrams) - size(array_distinct(trigrams)) AS dup_tri",
    )
    bigram_top = (
        staged.selectExpr(
            "doc_id",
            "explode(CASE WHEN size(toks) >= 2 THEN transform(sequence(1, size(toks) - 1),"
            " i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))"
            " ELSE array() END) AS bigram",
        )
        .groupBy("doc_id", "bigram")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_bigram_count"))
    )
    return tri.join(bigram_top, "doc_id").selectExpr(
        "doc_id",
        "n AS n_tokens",
        "top_bigram_count",
        "CAST(2 * top_bigram_count AS DOUBLE) / n AS top_bigram_frac",
        "CAST(dup_tri AS DOUBLE) / n_tri AS dup_trigram_frac",
    )


REPETITION_ORACLE = rf"""
WITH staged AS (
  SELECT doc_id, {_TOKS_DUCK} AS toks FROM documents
),
tri AS (
  SELECT doc_id, len(toks) AS n,
         list_transform(range(1, greatest(len(toks) - 1, 1)),
                        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS trigrams
  FROM staged
),
tris AS (
  SELECT doc_id, n, len(trigrams) AS n_tri,
         len(trigrams) - len(list_distinct(trigrams)) AS dup_tri
  FROM tri
),
big AS (
  SELECT doc_id, unnest(list_transform(range(1, greatest(len(toks), 1)),
                                       i -> toks[i] || ' ' || toks[i+1])) AS bigram
  FROM staged
),
bigtop AS (
  SELECT doc_id, max(c) AS top_bigram_count
  FROM (SELECT doc_id, bigram, count(*) AS c FROM big GROUP BY doc_id, bigram)
  GROUP BY doc_id
)
SELECT t.doc_id, t.n AS n_tokens, b.top_bigram_count,
       CAST(2 * b.top_bigram_count AS DOUBLE) / t.n AS top_bigram_frac,
       CAST(t.dup_tri AS DOUBLE) / t.n_tri AS dup_trigram_frac
FROM tris t JOIN bigtop b ON t.doc_id = b.doc_id
"""

QUERIES["text_repetition"] = repetition_signals
ORACLE["text_repetition"] = REPETITION_ORACLE


# ---------------------------------------------------------------------------
# TF-IDF-style term salience (exact-rational scoring, no float log)
# ---------------------------------------------------------------------------


def tfidf_salience(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 salient terms per document, scored tf * N / df — the TF-IDF
    ranking with a rational rarity weight instead of log(N/df) so the
    score is one exact integer product and ONE final division (log
    implementations differ between libm and the JVM in last bits, which
    would break cross-engine hash equality without changing any ranking).

    Shuffle budget: explode → (doc_id, term) count [1], term → df [2,
    reuses the term hash partitioning], broadcast scalar N, then a
    row_number window on doc_id [3]. df-per-term is tiny (vocabulary ≪
    corpus) so the tf⋈df join broadcasts at any corpus size.
    """
    docs = load_table(spark, sf_dir, "documents")
    terms = docs.selectExpr("doc_id", f"explode({_TOKS}) AS term")
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = terms.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = docs.groupBy().agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df_), "term")
        .join(F.broadcast(n_docs))
        .selectExpr("doc_id", "term", "tf", "df", "CAST(tf * n_docs AS DOUBLE) / df AS salience")
    )
    w = "ORDER BY salience DESC, term ASC"
    return (
        scored.selectExpr(
            "doc_id", "term", "tf", "df", "salience",
            f"row_number() OVER (PARTITION BY doc_id {w}) AS rnk",
        )
        .where("rnk <= 3")
        .drop("rnk")
    )


TFIDF_ORACLE = rf"""
WITH terms AS (
  SELECT doc_id, unnest({_TOKS_DUCK}) AS term FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY doc_id, term),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM terms GROUP BY term),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         CAST(tf.tf * n.n_docs AS DOUBLE) / df.df AS salience
  FROM tf JOIN df USING (term) CROSS JOIN n
)
SELECT doc_id, term, tf, df, salience
FROM (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY salience DESC, term ASC) AS rnk
      FROM scored)
WHERE rnk <= 3
"""

QUERIES["text_tfidf_salience"] = tfidf_salience
ORACLE["text_tfidf_salience"] = TFIDF_ORACLE


# ---------------------------------------------------------------------------
# Benchmark-contamination check (train/eval n-gram overlap)
# ---------------------------------------------------------------------------

_EVAL_SOURCE = "src0"
_CONTAM_N = 3  # token n-gram order; 13 in production, 3 for the tiny fixture
_CONTAM_MIN = 2  # min shared distinct n-grams to report a pair

# Eval-gram index memo, keyed (session, fixture dir) via the engine's
# per-session store (round 14 — was an id(spark)-keyed module dict with
# the recycled-id hazard ADVICE r13 flagged): the eval split is a
# STATIC benchmark suite — production decontamination services precompute
# exactly this index once and check every incoming corpus against it.
# n_train rides the same entry under the same fixture-immutability
# contract load_table's relation memo already relies on.


def _eval_gram_index(spark, sf_dir, docs, gram_expr):
    """→ (n_train, ev_by_gram) where ev_by_gram is a Spark-CACHED
    DataFrame of (gram, eval_docs array) — grouped once so the main
    query attaches the eval side with a single broadcast hash join
    (cut-to-sliver + eval_doc fan-out in one zero-shuffle operator).
    The data never round-trips through the driver (round 7: the old
    shape collected ~13k (eval_doc, gram) rows and rebuilt TWO local
    DataFrames per invocation — driver serialization that showed up as
    plan work in the bench breakdown). One job materializes the cache,
    with the train-doc count riding the SAME scan as an Observation
    metric. Bounded: benchmark suites are small by construction."""
    from pyspark.sql import Observation

    from duck_server_spark.engine.session import session_store

    store = session_store(spark)
    key = ("evalidx", sf_dir)
    hit = store.get(key)
    if hit is not None:
        return hit
    obs = Observation()
    ev_by_gram = (
        docs.observe(
            obs,
            F.sum(F.when(F.col("source") != _EVAL_SOURCE, 1).otherwise(0))
            .cast("long")
            .alias("n_train"),
        )
        .where(f"source = '{_EVAL_SOURCE}'")
        .selectExpr("doc_id", f"{_TOKS} AS toks")
        .selectExpr("doc_id AS eval_doc", gram_expr)
        .groupBy("gram")
        .agg(F.sort_array(F.collect_list("eval_doc")).alias("eval_docs"))
        .cache()
    )
    ev_by_gram.count()  # materialize the cache + flush the observation
    n_train = int(obs.get["n_train"] or 0)
    out = (n_train, ev_by_gram)
    store[key] = out
    return out


def _contam_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents scan for the contamination pipeline. The tokenize+
    explode is the CPU-heavy stage: widen a narrow scan (small fixture =
    one sub-4MB file split) to all cores before it. An os-stat decides —
    no Spark analysis cost; on a real cluster the input is far past the
    threshold and this is a no-op."""
    docs = load_table(spark, sf_dir, "documents")
    par = spark.sparkContext.defaultParallelism
    try:
        small = os.path.getsize(os.path.join(sf_dir, "documents.parquet")) < par * 4 << 20
    except OSError:
        small = False
    return docs.repartition(par) if small else docs


def _contam_gram_expr() -> str:
    return f"""explode(array_distinct(CASE WHEN size(toks) >= {_CONTAM_N} THEN
              transform(sequence(1, size(toks) - {_CONTAM_N - 1}),
                        i -> concat_ws(' ', {', '.join(f'element_at(toks, i + {j})' for j in range(_CONTAM_N))}))
            ELSE array() END)) AS gram"""


def contamination_floor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured FLOOR for contamination_check (bench breakdown, round 6
    punch list): the irreducible plan work — scan the train corpus,
    tokenize, explode to distinct n-grams, reduce to one count. No
    semi-join, no df window, no pair aggregation. contamination_check
    cannot be faster than this on the same host/fixture, so bench.py
    times both and reports the operator as floor + plan-work split
    instead of a self-reported prose claim (SCALE.md r5)."""
    return (
        _contam_docs(spark, sf_dir)
        .where(f"source <> '{_EVAL_SOURCE}'")
        .selectExpr("doc_id", f"{_TOKS} AS toks")
        .selectExpr("doc_id AS train_doc", _contam_gram_expr())
        .agg(F.count(F.lit(1)).alias("n_grams"))
    )


def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval contamination: which training documents share ≥K
    distinct token n-grams with any eval-split document (the 13-gram
    decontamination pass every pretraining pipeline runs; n=3 here so
    the synthetic fixture has hits).

    Scale shape (round 5 — the df-cap aggregation is FUSED into the
    already-filtered gram stream, reclaiming the r4 +95% regression):
    each side explodes to its DISTINCT n-grams; the tiny eval side
    broadcasts, and the train grams are FIRST cut to grams that appear in
    eval at all (broadcast semi-join — zero shuffle, and the only grams
    that can ever produce a pair). That filtered sliver is checkpointed
    once (slim: doc_id + gram), so the stop-gram document-frequency cap
    and the pair join both read it without recomputing the explode — the
    round-4 shape aggregated df over EVERY distinct train gram in a
    separate corpus-wide shuffle, which was the regression. df computed
    on the sliver equals full-corpus df for those grams (the semi-join
    filters by gram only, keeping every train row of surviving grams).
    The cap itself is unchanged and corpus-relative (df·50 <= n_train):
    a gram in > 2% of train docs is boilerplate whose train-df × eval-df
    fan-out otherwise blows the join up (the 100× sweep measured 234×
    before the cap landed). Pair candidates still come from ONE equi-join
    keyed on the gram — never doc×doc. NOTE for replicated-fixture
    sweeps: under K× verbatim replication the true pair OUTPUT is itself
    K², so the sweep ratio tracks output growth, not plan inefficiency —
    annotated expected-superlinear in tools/scale_sweep.py.
    """
    docs = _contam_docs(spark, sf_dir)
    gram_expr = _contam_gram_expr()
    n_train, ev_by_gram = _eval_gram_index(spark, sf_dir, docs, gram_expr)
    # ONE job, TWO hash shuffles, ZERO sorts (round 7 — the r6 shape's
    # WINDOW df count forced a sort-based exchange carrying every sliver
    # row, then a second broadcast build from driver-local data): the
    # train corpus explodes to distinct grams and a single broadcast
    # hash INNER join against the cached eval index both cuts it to the
    # sliver (grams that appear in eval at all — the only grams that can
    # ever pair) AND attaches each gram's eval_docs, replacing the old
    # semi-join + ev_local join pair. Shuffle 1 is a hash groupBy on
    # gram (partial-aggregated map-side; one row per gram comes out)
    # computing the stop-gram document frequency df and the surviving
    # train-doc list together; hot boilerplate grams (df·50 > n_train —
    # the 234×-measured fan-out blowup) are dropped BEFORE the pair
    # explode. Shuffle 2 is the pair aggregation, also map-side
    # combined. df on the sliver equals full-corpus df for these grams
    # (the join filters by gram only, keeping every train row of
    # surviving grams). 100 TB note: a boilerplate gram concentrates its
    # train rows in one reduce group here exactly as it did under the
    # window — if the eval suite itself contained boilerplate you would
    # pre-compute df with a salted count-only pass first; decontamination
    # eval suites are curated, so the fused single-pass wins.
    return (
        docs.where(f"source <> '{_EVAL_SOURCE}'")
        .selectExpr("doc_id", f"{_TOKS} AS toks")
        .selectExpr("doc_id AS train_doc", gram_expr)
        .join(F.broadcast(ev_by_gram), "gram")
        .groupBy("gram")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.collect_list("train_doc").alias("train_docs"),
            F.first("eval_docs").alias("eval_docs"),
        )
        .where(f"df * 50 <= {n_train}")
        .select(F.explode("train_docs").alias("train_doc"), "eval_docs")
        .select("train_doc", F.explode("eval_docs").alias("eval_doc"))
        .groupBy("train_doc", "eval_doc")
        .agg(F.count(F.lit(1)).alias("shared_ngrams"))
        .where(f"shared_ngrams >= {_CONTAM_MIN}")
    )


CONTAM_ORACLE = rf"""
WITH grams AS (
  SELECT doc_id, source,
         unnest(list_distinct(list_transform(
             range(1, greatest(len({_TOKS_DUCK}) - {_CONTAM_N - 2}, 1)),
             i -> {" || ' ' || ".join(f'{_TOKS_DUCK}[i + {j}]' for j in range(_CONTAM_N))}))) AS gram
  FROM documents
)
, keep AS (
  SELECT gram FROM grams
  WHERE source <> '{_EVAL_SOURCE}'
  GROUP BY gram
  HAVING count(*) * 50 <= (SELECT count(*) FROM documents WHERE source <> '{_EVAL_SOURCE}')
)
SELECT t.doc_id AS train_doc, e.doc_id AS eval_doc, count(*) AS shared_ngrams
FROM grams t JOIN keep k ON t.gram = k.gram JOIN grams e ON t.gram = e.gram
WHERE t.source <> '{_EVAL_SOURCE}' AND e.source = '{_EVAL_SOURCE}'
GROUP BY t.doc_id, e.doc_id
HAVING count(*) >= {_CONTAM_MIN}
"""

QUERIES["contamination_check"] = contamination_check
ORACLE["contamination_check"] = CONTAM_ORACLE


# ---------------------------------------------------------------------------
# Inverted index (term → sorted postings)
# ---------------------------------------------------------------------------


def inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus inverted index: term → document frequency + sorted posting
    list — the retrieval-side primitive for the search/RAG half of a
    data platform. Per-doc DISTINCT terms explode, then ONE shuffle on
    term builds each posting list; df comes from the same aggregate. At
    100 TB the head terms' postings get long — production shards them
    by (term, doc_id range) and delta-encodes; the fixture keeps a flat
    sorted array, which is also what the oracle can express."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.selectExpr("doc_id", f"explode(array_distinct({_TOKS})) AS term")
        .groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("df"),
            # Postings emitted as a ','-joined string, not ARRAY: the
            # verification driver's pandas canonicalizer can't sort/hash
            # list cells (unhashable type). Deterministic either way —
            # the list is sorted first.
            F.array_join(F.sort_array(F.collect_list("doc_id")), ",").alias("postings"),
        )
    )


INVERTED_INDEX_ORACLE = rf"""
SELECT term, count(*) AS df,
       array_to_string(list_sort(list(doc_id)), ',') AS postings
FROM (SELECT doc_id, unnest(list_distinct({_TOKS_DUCK})) AS term FROM documents)
GROUP BY term
"""

QUERIES["inverted_index"] = inverted_index
ORACLE["inverted_index"] = INVERTED_INDEX_ORACLE


# ---------------------------------------------------------------------------
# PII scrubbing (regex redaction)
# ---------------------------------------------------------------------------

# Patterns restricted to the Java-regex ∩ RE2 common subset (no
# backrefs, no lookarounds) so Spark and DuckDB match identically.
# Spark SQL string literals process backslash escapes, DuckDB's don't —
# same regex, two spellings.
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PHONE_RE = r"\\+1-[0-9]{3}-[0-9]{4}"
_EMAIL_RE_DUCK = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE_DUCK = r"\+1-[0-9]{3}-[0-9]{4}"


def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction: strip emails and phone numbers from documents.
    The fixture corpus is synthetic and PII-free, so each doc is first
    salted with a DETERMINISTIC email + phone derived from doc_id (the
    operator mechanics — match counting and global replacement — are
    under test, not the fixture). Pure per-row regex at scan speed, no
    shuffle, no Python."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.selectExpr(
            "doc_id",
            "concat(text, ' reach user', CAST(doc_id AS STRING), '@example.com or +1-555-', "
            "lpad(CAST(doc_id % 10000 AS STRING), 4, '0'), ' now ', text) AS salted",
        )
        .selectExpr(
            "doc_id",
            f"size(regexp_extract_all(salted, '{_EMAIL_RE}', 0)) AS n_emails",
            f"size(regexp_extract_all(salted, '{_PHONE_RE}', 0)) AS n_phones",
            f"md5(regexp_replace(regexp_replace(salted, '{_EMAIL_RE}', '<EMAIL>'), "
            f"'{_PHONE_RE}', '<PHONE>')) AS scrubbed_md5",
            f"length(salted) - length(regexp_replace(regexp_replace(salted, '{_EMAIL_RE}', ''), "
            f"'{_PHONE_RE}', '')) AS pii_chars",
        )
    )


PII_SCRUB_ORACLE = rf"""
WITH salted AS (
  SELECT doc_id,
         text || ' reach user' || CAST(doc_id AS VARCHAR) || '@example.com or +1-555-' ||
         lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' now ' || text AS salted
  FROM documents
)
SELECT doc_id,
       len(regexp_extract_all(salted, '{_EMAIL_RE_DUCK}')) AS n_emails,
       len(regexp_extract_all(salted, '{_PHONE_RE_DUCK}')) AS n_phones,
       md5(regexp_replace(regexp_replace(salted, '{_EMAIL_RE_DUCK}', '<EMAIL>', 'g'),
           '{_PHONE_RE_DUCK}', '<PHONE>', 'g')) AS scrubbed_md5,
       length(salted) - length(regexp_replace(regexp_replace(salted, '{_EMAIL_RE_DUCK}', '', 'g'),
           '{_PHONE_RE_DUCK}', '', 'g')) AS pii_chars
FROM salted
"""

QUERIES["text_pii_scrub"] = pii_scrub
ORACLE["text_pii_scrub"] = PII_SCRUB_ORACLE


# ---------------------------------------------------------------------------
# Fused one-scan corpus signals
# ---------------------------------------------------------------------------


def signals_fused(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALL per-document text signals in ONE scan: token counts, quality
    score, language ID, repetition. At 100 TB the corpus read dominates
    every per-row pass, so a pipeline that runs token_stats, quality,
    lang_id, and repetition as four jobs pays the scan four times; this
    operator is the fused form — one parquet read, one staged tokenize,
    one wide projection, zero shuffles (the windowed top-bigram signal is
    deliberately replaced by its array form here: fusion keeps the whole
    row pipeline in a single codegen stage, and the short-doc fixture
    makes O(len²) per row irrelevant — use text_repetition when docs are
    long and the grouped formulation matters)."""
    docs = load_table(spark, sf_dir, "documents")
    hits = [
        f"size(filter(toks, t -> t IN {words})) AS hits_{lang}"
        for lang, words in _MARKERS.items()
    ]
    return (
        docs.selectExpr("doc_id", "text", f"{_TOKS} AS toks")
        .selectExpr(
            "doc_id",
            "text",
            "toks",
            "size(toks) AS n_tokens",
            f"size(filter(toks, t -> t IN {_STOPWORDS})) AS stop_hits",
            "size(array_distinct(toks)) AS n_distinct",
            *hits,
            """CASE WHEN size(toks) >= 3 THEN
                 transform(sequence(1, size(toks) - 2),
                           i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1), ' ',
                                       element_at(toks, i + 2)))
               ELSE array() END AS trigrams""",
        )
        .selectExpr(
            "doc_id",
            "n_tokens",
            "n_distinct",
            "CAST(stop_hits AS DOUBLE) / n_tokens AS stopword_ratio",
            "CAST(n_distinct AS DOUBLE) / n_tokens AS type_token_ratio",
            """0.4 * least(1.0, CAST(n_tokens AS DOUBLE) / 100.0)
               + 0.3 * (CAST(stop_hits AS DOUBLE) / n_tokens)
               + 0.3 * (CAST(n_distinct AS DOUBLE) / n_tokens) AS quality""",
            """CASE
                 WHEN hits_en >= hits_es AND hits_en >= hits_fr
                      AND hits_en >= hits_de AND hits_en > 0 THEN 'en'
                 WHEN hits_es >= hits_fr AND hits_es >= hits_de
                      AND hits_es > 0 THEN 'es'
                 WHEN hits_fr >= hits_de AND hits_fr > 0 THEN 'fr'
                 WHEN hits_de > 0 THEN 'de'
                 ELSE 'unknown'
               END AS lang_pred""",
            "CAST(size(trigrams) - size(array_distinct(trigrams)) AS DOUBLE)"
            " / size(trigrams) AS dup_trigram_frac",
            "md5(text) AS content_md5",
        )
    )


SIGNALS_FUSED_ORACLE = f"""
WITH staged AS (
  SELECT doc_id, text, {_TOKS_DUCK} AS toks FROM documents
),
counts AS (
  SELECT doc_id, text, len(toks) AS n_tokens,
         len(list_filter(toks, t -> t IN {_STOPWORDS})) AS stop_hits,
         len(list_distinct(toks)) AS n_distinct,
         {", ".join(f"len(list_filter(toks, t -> t IN {words})) AS hits_{lang}" for lang, words in _MARKERS.items())},
         list_transform(range(1, greatest(len(toks) - 1, 1)),
                        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS trigrams
  FROM staged
)
SELECT doc_id, n_tokens, n_distinct,
       CAST(stop_hits AS DOUBLE) / n_tokens AS stopword_ratio,
       CAST(n_distinct AS DOUBLE) / n_tokens AS type_token_ratio,
       0.4 * least(1.0, CAST(n_tokens AS DOUBLE) / 100.0)
       + 0.3 * (CAST(stop_hits AS DOUBLE) / n_tokens)
       + 0.3 * (CAST(n_distinct AS DOUBLE) / n_tokens) AS quality,
       CASE
         WHEN hits_en >= hits_es AND hits_en >= hits_fr
              AND hits_en >= hits_de AND hits_en > 0 THEN 'en'
         WHEN hits_es >= hits_fr AND hits_es >= hits_de
              AND hits_es > 0 THEN 'es'
         WHEN hits_fr >= hits_de AND hits_fr > 0 THEN 'fr'
         WHEN hits_de > 0 THEN 'de'
         ELSE 'unknown'
       END AS lang_pred,
       CAST(len(trigrams) - len(list_distinct(trigrams)) AS DOUBLE) / len(trigrams) AS dup_trigram_frac,
       md5(text) AS content_md5
FROM counts
"""

QUERIES["text_signals_fused"] = signals_fused
ORACLE["text_signals_fused"] = SIGNALS_FUSED_ORACLE


# ---------------------------------------------------------------------------
# Document chunking — overlapping token windows for embedding/RAG prep
# ---------------------------------------------------------------------------
# Split every document into 40-token chunks with a 10-token overlap
# (stride 30): the pass that feeds an embedding model whose context is
# shorter than the document. Scale shape: per-row arithmetic decides the
# chunk starts (no join, no shuffle), explode multiplies rows by
# ~n_tokens/stride, and each chunk row carries only its own slice — at
# 100 TB this runs at scan speed and the output is written straight to
# the embedding queue. Both engines compute identical chunk bounds in
# integer arithmetic; the chunk text is the same concat_ws join.

_CHUNK_LEN = 40
_CHUNK_STRIDE = 30

DOC_CHUNKING_SPARK = f"""
WITH tok AS (
  SELECT doc_id, split(trim(text), '\\\\s+') AS toks FROM documents
  WHERE trim(text) <> ''
),
spans AS (
  SELECT doc_id, toks, CAST(size(toks) AS BIGINT) AS n,
         sequence(CAST(0 AS BIGINT),
                  greatest(CAST(ceil((size(toks) - {_CHUNK_LEN}) / {_CHUNK_STRIDE}.0) AS BIGINT), CAST(0 AS BIGINT))) AS cids
  FROM tok
),
expl AS (
  SELECT doc_id, toks, n, explode(cids) AS chunk_idx FROM spans
)
SELECT doc_id, chunk_idx,
       chunk_idx * {_CHUNK_STRIDE} + 1 AS chunk_start,
       least(CAST({_CHUNK_LEN} AS BIGINT), n - chunk_idx * {_CHUNK_STRIDE}) AS chunk_len,
       concat_ws(' ', slice(toks, CAST(chunk_idx * {_CHUNK_STRIDE} + 1 AS INT), {_CHUNK_LEN})) AS chunk_text
FROM expl
"""

DOC_CHUNKING_DUCK = rf"""
WITH tok AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents
  WHERE trim(text) <> ''
),
spans AS (
  SELECT doc_id, toks, len(toks) AS n,
         generate_series(CAST(0 AS BIGINT),
                         greatest(CAST(ceil((len(toks) - {_CHUNK_LEN}) / {_CHUNK_STRIDE}.0) AS BIGINT), CAST(0 AS BIGINT))) AS cids
  FROM tok
),
expl AS (
  SELECT doc_id, toks, n, unnest(cids) AS chunk_idx FROM spans
)
SELECT doc_id, chunk_idx,
       chunk_idx * {_CHUNK_STRIDE} + 1 AS chunk_start,
       least(CAST({_CHUNK_LEN} AS BIGINT), n - chunk_idx * {_CHUNK_STRIDE}) AS chunk_len,
       array_to_string(toks[(chunk_idx * {_CHUNK_STRIDE} + 1):(chunk_idx * {_CHUNK_STRIDE} + {_CHUNK_LEN})], ' ') AS chunk_text
FROM expl
"""


def doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duck_server_spark.engine.session import register_views

    register_views(spark, sf_dir)
    return spark.sql(DOC_CHUNKING_SPARK)


QUERIES["doc_chunking"] = doc_chunking
ORACLE["doc_chunking"] = DOC_CHUNKING_DUCK


# ---------------------------------------------------------------------------
# OOV rate vs corpus vocabulary — tokenizer-coverage metric
# ---------------------------------------------------------------------------
# Fraction of each document's tokens outside the corpus top-30 vocab:
# the coverage statistic that sizes a tokenizer's vocabulary (and flags
# documents that are mostly rare/garbage tokens). Scale shape: the
# vocab is a full partial-agg reduction to 30 rows, carried to every
# row as a single collected array on a one-row CROSS JOIN (Catalyst
# broadcasts it) — the corpus itself is NEVER exploded or shuffled; the
# per-doc score is a filter() over the already-staged token array at
# scan speed. Vocab selection is tie-broken by term so both engines
# pick the same 30.

TEXT_OOV_SPARK = """
WITH tok AS (
  SELECT doc_id, split(trim(lower(text)), '\\\\s+') AS toks FROM documents
),
vocab AS (
  SELECT term, count(*) AS freq
  FROM (SELECT explode(toks) AS term FROM tok)
  GROUP BY term
  ORDER BY freq DESC, term ASC
  LIMIT 30
),
vocab_arr AS (
  SELECT collect_list(term) AS varr FROM vocab
)
SELECT doc_id,
       CAST(size(toks) AS BIGINT) AS n_toks,
       CAST(size(filter(toks, t -> NOT array_contains(varr, t))) AS BIGINT) AS n_oov,
       CAST(size(filter(toks, t -> NOT array_contains(varr, t))) AS DOUBLE) / size(toks) AS oov_rate
FROM tok CROSS JOIN vocab_arr
"""

TEXT_OOV_DUCK = r"""
WITH tok AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks FROM documents
),
vocab AS (
  SELECT term, count(*) AS freq
  FROM (SELECT unnest(toks) AS term FROM tok)
  GROUP BY term
  ORDER BY freq DESC, term ASC
  LIMIT 30
),
vocab_arr AS (
  SELECT list(term) AS varr FROM vocab
)
SELECT doc_id,
       len(toks) AS n_toks,
       len(list_filter(toks, t -> NOT list_contains(varr, t))) AS n_oov,
       CAST(len(list_filter(toks, t -> NOT list_contains(varr, t))) AS DOUBLE) / len(toks) AS oov_rate
FROM tok CROSS JOIN vocab_arr
"""


def text_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duck_server_spark.engine.session import register_views

    register_views(spark, sf_dir)
    return spark.sql(TEXT_OOV_SPARK)


QUERIES["text_oov_rate"] = text_oov_rate
ORACLE["text_oov_rate"] = TEXT_OOV_DUCK


# ---------------------------------------------------------------------------
# Exact token-count quantiles per source — histogram cumsum
# ---------------------------------------------------------------------------
# p50/p90/p99 of per-doc token counts for every source: the length
# profile that drives context-window and packing decisions. EXACT
# quantiles without sorting the corpus: token counts live in a small
# integer domain, so the corpus collapses to a (source, n_tokens)
# histogram with ONE map-side-combined shuffle; the cumulative window
# and the quantile picks run over the histogram (≤ |sources|·|distinct
# counts| rows — thousands, not billions). The same discrete-quantile
# definition (smallest value whose cumulative count reaches ceil(p·n))
# is computed by both engines in integer arithmetic. For continuous
# high-cardinality domains this histogram trick does not apply — that
# is what sketches (t-digest / approx_percentile, engine-specific) are
# for; token counts are the canonical low-cardinality case.

_TOKEN_QUANTILES_BODY = """
hist AS (
  SELECT source, n, count(*) AS c FROM tok GROUP BY source, n
),
cum AS (
  SELECT source, n, c,
         sum(c) OVER (PARTITION BY source ORDER BY n) AS cume,
         sum(c) OVER (PARTITION BY source) AS tot
  FROM hist
)
SELECT source,
       CAST(max(tot) AS BIGINT) AS n_docs,
       min(CASE WHEN cume >= CAST(ceil(0.5 * tot) AS BIGINT) THEN n END) AS p50_tokens,
       min(CASE WHEN cume >= CAST(ceil(0.9 * tot) AS BIGINT) THEN n END) AS p90_tokens,
       min(CASE WHEN cume >= CAST(ceil(0.99 * tot) AS BIGINT) THEN n END) AS p99_tokens,
       min(n) AS min_tokens,
       max(n) AS max_tokens
FROM cum
GROUP BY source
"""

TOKEN_QUANTILES_SPARK = f"""
WITH tok AS (
  SELECT source, CAST(size(split(trim(text), '\\\\s+')) AS BIGINT) AS n FROM documents
),
{_TOKEN_QUANTILES_BODY}
"""

TOKEN_QUANTILES_DUCK = rf"""
WITH tok AS (
  SELECT source, len(regexp_split_to_array(trim(text), '\s+')) AS n FROM documents
),
{_TOKEN_QUANTILES_BODY}
"""


def token_quantiles_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duck_server_spark.engine.session import register_views

    register_views(spark, sf_dir)
    return spark.sql(TOKEN_QUANTILES_SPARK)


QUERIES["token_quantiles_per_source"] = token_quantiles_per_source
ORACLE["token_quantiles_per_source"] = TOKEN_QUANTILES_DUCK


# ---------------------------------------------------------------------------
# Unigram corpus-frequency scoring (LM-free quality signal)
# ---------------------------------------------------------------------------
# Per-doc fluency proxy from the corpus's own unigram distribution: mean
# and min token frequency, plus the fraction of rare (df<=2) tokens —
# the cheap stand-in for LM perplexity filtering when no model is
# available (high rare-fraction docs are misspelled/garbled/foreign).
#
# Scale shape: ONE explode + ONE shuffle builds the unigram table; the
# per-doc score joins tokens to it (at 100 TB: broadcast the top-K
# vocabulary and floor everything else to an OOV bucket — the join
# becomes map-side; the fixture keeps the full join, which is the same
# plan Catalyst broadcasts here because the vocab is small).
# Determinism: all scores are exact integer arithmetic — fixed-point
# token probability floor(n_term * 1e12 / N) summed as BIGINT, one
# division at the end — because distributed double sums are
# order-sensitive and ln() is not guaranteed bit-identical across
# engines (no log anywhere).

_UNIGRAM_BODY = """
vocab AS (
  SELECT term, count(*) AS n FROM toks GROUP BY term
),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS big_n FROM vocab),
scored AS (
  -- fixed-point probability via explicit double arithmetic + floor:
  -- integer '/' semantics differ across engines (DuckDB promotes
  -- BIGINT sums to HUGEINT), IEEE double ops do not
  SELECT t.doc_id,
         CAST(floor(CAST(v.n AS DOUBLE) * 1000000000000.0
                    / CAST(tot.big_n AS DOUBLE)) AS BIGINT) AS p_fp,
         CASE WHEN v.n <= 2 THEN 1 ELSE 0 END AS is_rare
  FROM toks t JOIN vocab v ON t.term = v.term CROSS JOIN tot
)
SELECT doc_id,
       count(*) AS n_tokens,
       CAST(sum(p_fp) AS DOUBLE) / (1000000000000.0 * count(*)) AS mean_tok_freq,
       CAST(min(p_fp) AS DOUBLE) / 1000000000000.0 AS min_tok_freq,
       CAST(sum(is_rare) AS DOUBLE) / count(*) AS rare_frac
FROM scored
GROUP BY doc_id
"""

TEXT_UNIGRAM_SPARK = f"""
WITH toks AS (
  SELECT doc_id, explode({_TOKS}) AS term FROM documents
),
{_UNIGRAM_BODY}
"""

TEXT_UNIGRAM_DUCK = rf"""
WITH toks AS (
  SELECT doc_id, unnest({_TOKS_DUCK}) AS term FROM documents
),
{_UNIGRAM_BODY}
"""


def text_unigram_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duck_server_spark.engine.session import register_views

    register_views(spark, sf_dir)
    return spark.sql(TEXT_UNIGRAM_SPARK)


QUERIES["text_unigram_score"] = text_unigram_score
ORACLE["text_unigram_score"] = TEXT_UNIGRAM_DUCK


# ---------------------------------------------------------------------------
# Term co-occurrence lift (PMI-style association mining)
# ---------------------------------------------------------------------------
# Top term pairs by lift = P(a,b)/(P(a)P(b)) over documents — the
# association-mining pass behind topic discovery and boilerplate-template
# detection. Log-free PMI: lift is an exact rational of counts
# (c_ab * D / (c_a * c_b)); the single double division of two exact
# BIGINTs rounds identically in both engines.
#
# Scale shape: the pair space is BLOCKED, not quadratic-in-corpus:
# only mid-frequency content terms participate (df bounds strip
# stopwords and hapax noise), and per-doc terms are capped to the first
# 12 alphabetically (deterministic cap -> each doc contributes <= 66
# pairs regardless of length). One shuffle on (a, b); top-k via
# TakeOrderedAndProject. df bounds are corpus-relative at 100 TB.

_COOC_DF_LO = 10
_COOC_DF_HI = 400
_COOC_CAP = 12
_COOC_TOPK = 40

_COOC_BODY = f"""
df AS (
  SELECT term, count(*) AS c FROM dterms GROUP BY term
),
keep AS (
  SELECT term, c FROM df WHERE c >= {_COOC_DF_LO} AND c <= {_COOC_DF_HI}
),
ranked AS (
  SELECT d.doc_id, d.term, k.c,
         row_number() OVER (PARTITION BY d.doc_id ORDER BY d.term) AS rk
  FROM dterms d JOIN keep k ON d.term = k.term
),
capped AS (SELECT doc_id, term, c FROM ranked WHERE rk <= {_COOC_CAP}),
pairs AS (
  SELECT a.term AS term_a, b.term AS term_b,
         max(a.c) AS c_a, max(b.c) AS c_b, count(*) AS c_ab
  FROM capped a JOIN capped b ON a.doc_id = b.doc_id AND a.term < b.term
  GROUP BY a.term, b.term
),
tot AS (SELECT count(*) AS d_docs FROM documents)
SELECT term_a, term_b, c_a, c_b, c_ab,
       CAST(c_ab * d_docs AS DOUBLE) / CAST(c_a * c_b AS DOUBLE) AS lift
FROM pairs CROSS JOIN tot
WHERE c_ab >= 3
ORDER BY lift DESC, term_a ASC, term_b ASC
LIMIT {_COOC_TOPK}
"""

TEXT_COOC_SPARK = f"""
WITH dterms AS (
  SELECT doc_id, explode(array_distinct({_TOKS})) AS term FROM documents
),
{_COOC_BODY}
"""

TEXT_COOC_DUCK = rf"""
WITH dterms AS (
  SELECT doc_id, unnest(list_distinct({_TOKS_DUCK})) AS term FROM documents
),
{_COOC_BODY}
"""


_cooc_cached: list = []


def text_cooccurrence_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 13 (guide §2.4/§5): two staged slim checkpoints replace the
    inlined CTE re-computation — `dterms` (distinct-term explode) feeds
    both the df aggregate and the ranked join, and `capped` feeds BOTH
    sides of the pair self-join; as inline CTEs each reference re-ran
    the explode / the df-join-window chain. Checkpoints carry only
    (doc_id, term[, c]) — no document text. Identical integer counts,
    oracle hash unchanged (measured 0.83 -> 0.56 s at sf0.1).

    Round 14 re-adjudication (VERDICT r13 item 3 — the driver window
    showed 0.625 -> 0.760 s and suspected the two synchronous
    checkpoint waves): interleaved 8-pair A/B, builder+action timed
    exactly as bench.py does — staged med 0.595 / min 0.543 vs inline
    med 0.671 / min 0.583, staged wins 6/8. The staging stays."""
    from duck_server_spark.engine.session import register_views
    from duck_server_spark.operators.common import (
        release_checkpoints,
        tracked_local_checkpoint,
    )

    register_views(spark, sf_dir)
    release_checkpoints(spark, _cooc_cached)
    dterms = tracked_local_checkpoint(
        spark,
        spark.sql(f"SELECT doc_id, explode(array_distinct({_TOKS})) AS term FROM documents"),
        _cooc_cached,
    )
    dterms.createOrReplaceTempView("__cooc_dterms")
    capped = tracked_local_checkpoint(
        spark,
        spark.sql(f"""
WITH dterms AS (SELECT * FROM __cooc_dterms),
df AS (SELECT term, count(*) AS c FROM dterms GROUP BY term),
keep AS (SELECT term, c FROM df WHERE c >= {_COOC_DF_LO} AND c <= {_COOC_DF_HI}),
ranked AS (
  SELECT d.doc_id, d.term, k.c,
         row_number() OVER (PARTITION BY d.doc_id ORDER BY d.term) AS rk
  FROM dterms d JOIN keep k ON d.term = k.term
)
SELECT doc_id, term, c FROM ranked WHERE rk <= {_COOC_CAP}"""),
        _cooc_cached,
    )
    capped.createOrReplaceTempView("__cooc_capped")
    return spark.sql(f"""
WITH pairs AS (
  SELECT a.term AS term_a, b.term AS term_b,
         max(a.c) AS c_a, max(b.c) AS c_b, count(*) AS c_ab
  FROM __cooc_capped a JOIN __cooc_capped b ON a.doc_id = b.doc_id AND a.term < b.term
  GROUP BY a.term, b.term
),
tot AS (SELECT count(*) AS d_docs FROM documents)
SELECT term_a, term_b, c_a, c_b, c_ab,
       CAST(c_ab * d_docs AS DOUBLE) / CAST(c_a * c_b AS DOUBLE) AS lift
FROM pairs CROSS JOIN tot
WHERE c_ab >= 3
ORDER BY lift DESC, term_a ASC, term_b ASC
LIMIT {_COOC_TOPK}""")


QUERIES["text_cooccurrence_lift"] = text_cooccurrence_lift
ORACLE["text_cooccurrence_lift"] = TEXT_COOC_DUCK


# ---------------------------------------------------------------------------
# Winnowing fingerprints (MOSS-style local document fingerprinting)
# ---------------------------------------------------------------------------
# k-gram hash sequence -> sliding window of w -> keep each window's
# minimum hash (ties: leftmost position) -> distinct selected
# fingerprints. Guarantees any shared substring of length >= w+k-1 shares
# a fingerprint — the plagiarism/near-dup primitive with POSITIONAL
# guarantees that MinHash (whole-doc) lacks.
#
# Scale shape: per-doc window min is a plain window frame over the
# exploded (doc_id, pos, hash) rows partitioned by doc_id — high-key-
# cardinality windows, no global sort; fingerprint count aggregates map-
# side. Hash = first 8 hex chars of md5 (portable across engines, same
# trick as the dedup module's shingle hashes).

_WINNOW_K = 3
_WINNOW_W = 4

_WINNOW_BODY = f"""
hashed AS (
  SELECT doc_id, pos,
         CAST({{conv}} AS BIGINT) AS h
  FROM grams
),
winmin AS (
  SELECT doc_id, pos, h,
         min(h) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN {_WINNOW_W - 1} PRECEDING AND CURRENT ROW) AS wmin
  FROM hashed
),
selected AS (
  SELECT DISTINCT doc_id, wmin AS fp
  FROM winmin WHERE pos >= {_WINNOW_W}
)
SELECT doc_id,
       count(*) AS n_fingerprints,
       min(fp) AS min_fp,
       CAST(count(*) AS DOUBLE) / max(n_grams) AS density
FROM selected JOIN gcount USING (doc_id)
GROUP BY doc_id
"""

# Spark side (round 13, guide §2.4): the r12 shape referenced `toks`
# twice (grams + a gcount branch re-tokenizing every document) and
# deduplicated fingerprints in a DISTINCT subquery joined back per doc.
# n_grams IS max(pos) (the explode enumerates 1..n_grams), so ONE
# aggregation over the windowed rows yields all four outputs — the
# gcount scan branch, its broadcast join, and the separate DISTINCT
# collapse disappear. Identical values (count/min over the same wmin
# set; docs with no full window drop via the same n_fingerprints > 0
# condition the inner join expressed): measured 0.88 -> 0.61 s at
# sf0.1, exact row-for-row equality; the DuckDB oracle keeps the
# original formulation.
WINNOW_SPARK = f"""
WITH toks AS (
  SELECT doc_id, {_TOKS} AS t FROM documents
),
grams AS (
  SELECT doc_id, i AS pos, concat_ws(' ', slice(t, i, {_WINNOW_K})) AS g
  FROM toks LATERAL VIEW explode(sequence(1, greatest(size(t) - {_WINNOW_K - 1}, 1))) x AS i
),
hashed AS (
  SELECT doc_id, pos,
         CAST(conv(substring(md5(g), 1, 8), 16, 10) AS BIGINT) AS h
  FROM grams
),
winmin AS (
  SELECT doc_id, pos,
         min(h) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN {_WINNOW_W - 1} PRECEDING AND CURRENT ROW) AS wmin
  FROM hashed
),
perdoc AS (
  SELECT doc_id,
         count(DISTINCT CASE WHEN pos >= {_WINNOW_W} THEN wmin END) AS n_fingerprints,
         min(CASE WHEN pos >= {_WINNOW_W} THEN wmin END) AS min_fp,
         max(pos) AS n_grams
  FROM winmin GROUP BY doc_id
)
SELECT doc_id, n_fingerprints, min_fp,
       CAST(n_fingerprints AS DOUBLE) / n_grams AS density
FROM perdoc WHERE n_fingerprints > 0
"""

WINNOW_DUCK = rf"""
WITH toks AS (
  SELECT doc_id, {_TOKS_DUCK} AS t FROM documents
),
grams AS (
  -- zipped unnests (same-length lists align positionally in DuckDB;
  -- lateral generate_series over a column is not supported)
  SELECT doc_id,
         unnest(generate_series(1, greatest(len(t) - {_WINNOW_K - 1}, 1))) AS pos,
         unnest(list_transform(generate_series(1, greatest(len(t) - {_WINNOW_K - 1}, 1)),
                               i -> array_to_string(t[i:i+{_WINNOW_K - 1}], ' '))) AS g
  FROM toks
),
gcount AS (
  SELECT doc_id, CAST(greatest(len(t) - {_WINNOW_K - 1}, 1) AS BIGINT) AS n_grams FROM toks
),
{_WINNOW_BODY.format(conv="('0x' || substring(md5(g), 1, 8))::BIGINT")}
"""


def text_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duck_server_spark.engine.session import register_views

    register_views(spark, sf_dir)
    return spark.sql(WINNOW_SPARK)


QUERIES["text_winnowing_fingerprints"] = text_winnowing_fingerprints
ORACLE["text_winnowing_fingerprints"] = WINNOW_DUCK


# ---------------------------------------------------------------------------
# DSIR-style importance resampling (hashed unigram features)
# ---------------------------------------------------------------------------
# Data Selection via Importance Resampling (Xie et al., NeurIPS 2023):
# score each raw document by how much its hashed-n-gram feature mass
# looks like a small TARGET corpus (here: the English slice standing in
# for "curated high-quality"), then keep the top-scoring docs. Features
# are unigrams hashed into _DSIR_BUCKETS buckets (the paper's hashed
# generative model); the importance surrogate is the exact rational
# (sum of per-token target-bucket counts + 1-smoothing) / (sum of raw
# bucket counts) — integer sums with ONE final double division, so both
# engines round identically (the repo's no-float-log discipline; swap
# the final expression for a log-likelihood sum at deployment if score
# calibration matters more than bit-stable gates).
#
# Scale shape: bucket-count tables are <= _DSIR_BUCKETS rows -> both
# joins broadcast; the token explode is linear in corpus tokens with the
# doc_id groupBy as the single data-sized shuffle; selection is a
# TakeOrderedAndProject top-k, never a global sort.

_DSIR_BUCKETS = 4096
_DSIR_KEEP = 100

# md5-derived bucket (cross-engine; hash() differs between engines)
_DSIR_B_SPARK = (
    f"CAST(conv(substring(md5(term), 1, 8), 16, 10) AS BIGINT) % {_DSIR_BUCKETS}"
)
_DSIR_B_DUCK = f"('0x' || substring(md5(term), 1, 8))::BIGINT % {_DSIR_BUCKETS}"

_DSIR_BODY = f"""
feat AS (SELECT doc_id, lang, {{bucket}} AS b FROM toks),
tcnt AS (SELECT b, count(*) AS tc FROM feat WHERE lang = 'en' GROUP BY b),
rcnt AS (SELECT b, count(*) AS rc FROM feat GROUP BY b),
scored AS (
  SELECT f.doc_id,
         CAST(SUM(coalesce(t.tc, 0) + 1) AS BIGINT) AS target_mass,
         CAST(SUM(r.rc + 1) AS BIGINT) AS raw_mass
  FROM feat f
  LEFT JOIN tcnt t ON f.b = t.b
  JOIN rcnt r ON f.b = r.b
  GROUP BY f.doc_id
)
SELECT d.doc_id, d.lang, d.source, s.target_mass, s.raw_mass,
       CAST(s.target_mass AS DOUBLE) / s.raw_mass AS importance
FROM scored s JOIN documents d ON s.doc_id = d.doc_id
ORDER BY importance DESC, d.doc_id ASC
LIMIT {_DSIR_KEEP}
"""

DSIR_SPARK = (
    f"WITH toks AS (SELECT doc_id, lang, explode({_TOKS}) AS term FROM documents),\n"
    + _DSIR_BODY.format(bucket=_DSIR_B_SPARK)
)

DSIR_DUCK = (
    f"WITH toks AS (SELECT doc_id, lang, unnest({_TOKS_DUCK}) AS term FROM documents),\n"
    + _DSIR_BODY.format(bucket=_DSIR_B_DUCK)
)


def sample_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duck_server_spark.engine.session import register_views

    register_views(spark, sf_dir)
    return spark.sql(DSIR_SPARK)


QUERIES["sample_dsir_importance"] = sample_dsir_importance
ORACLE["sample_dsir_importance"] = DSIR_DUCK


# ---------------------------------------------------------------------------
# Tokenizer fertility / compression report per source
# ---------------------------------------------------------------------------
# The tokenizer-planning report: words, BPE-ish subword tokens, and
# UTF-8 bytes per source, with fertility (subwords per word) and
# bytes-per-token compression — the numbers that size a token budget
# and flag sources a tokenizer segments poorly. Pure scan-side counting
# under codegen, one aggregation onto |sources| keys with map-side
# combine; the two ratios are single exact-integer divisions (bit-equal
# across engines). Linear at any corpus size.

TOKENIZER_FERTILITY_SPARK = f"""
WITH counted AS (
  SELECT source,
         size({_TOKS}) AS n_ws,
         size(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\\\s]', 0)) AS n_bpe,
         octet_length(text) AS n_bytes
  FROM documents
)
SELECT source,
       count(*) AS n_docs,
       CAST(sum(n_ws) AS BIGINT) AS total_words,
       CAST(sum(n_bpe) AS BIGINT) AS total_subwords,
       CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
       CAST(sum(n_bpe) AS DOUBLE) / sum(n_ws) AS fertility,
       CAST(sum(n_bytes) AS DOUBLE) / sum(n_bpe) AS bytes_per_token
FROM counted
GROUP BY source
"""

TOKENIZER_FERTILITY_DUCK = rf"""
WITH counted AS (
  SELECT source,
         len({_TOKS_DUCK}) AS n_ws,
         len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_bpe,
         octet_length(encode(text)) AS n_bytes
  FROM documents
)
SELECT source,
       count(*) AS n_docs,
       CAST(sum(n_ws) AS BIGINT) AS total_words,
       CAST(sum(n_bpe) AS BIGINT) AS total_subwords,
       CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
       CAST(sum(n_bpe) AS DOUBLE) / sum(n_ws) AS fertility,
       CAST(sum(n_bytes) AS DOUBLE) / sum(n_bpe) AS bytes_per_token
FROM counted
GROUP BY source
"""

def text_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duck_server_spark.engine.session import register_views

    register_views(spark, sf_dir)
    return spark.sql(TOKENIZER_FERTILITY_SPARK)


QUERIES["text_tokenizer_fertility"] = text_tokenizer_fertility
ORACLE["text_tokenizer_fertility"] = TOKENIZER_FERTILITY_DUCK


# ---------------------------------------------------------------------------
# BM25 retrieval scoring (round 5)
# ---------------------------------------------------------------------------
# Robertson/Spärck Jones BM25 — the lexical-retrieval scorer every RAG /
# data-curation stack runs next to its embedding index. The standard
# formulation uses ln() in the idf and float division per term; neither
# survives cross-engine hash equality (libm vs JVM last bits, float sum
# order), so the score here is EXACT END TO END, in the same spirit as
# text_tfidf_salience's rational rarity weight:
#
#   k1 = 6/5, b = 3/4 (the textbook 1.2 / 0.75), idf rationalized to
#   (N - df + 1/2)/(df + 1/2) = (2N - 2df + 1)/(2df + 1)  [no ln — a
#   monotone transform of the same rarity ordering]
#
#   per-term score = idf · tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))
#                  = A / B  with  A = (2N - 2df + 1) · 44 · tf · L
#                                 B = (2df + 1) · (20·L·tf + 6·L + 18·dl·N)
#   (avgdl = L/N folded in; A, B exact BIGINTs)
#
# Each term contributes floor(A·10⁴ / B), computed by DIGIT-AT-A-TIME
# long division — integer quotient q₀ = A÷B, then four steps of
# (remainder·10)÷B yield the four decimal digits — all TRUE integer
# division (Spark DIV / DuckDB //), so the per-doc SUM is an exact
# integer in any addition order and the single final /10⁴ double
# division is bit-identical in both engines. The digit loop never forms
# A·10⁴ or r·10⁴ (each step multiplies a remainder < B by just 10), so
# the int64 envelope is max(A, 10·B) < 2⁶³ — the 100× two-decade
# fixture (A ≈ 7·10¹⁷, B ≈ 2·10¹⁷) passes where the naive A·10⁴
# overflowed (both caught by the 100× spot check); at true 100 TB row
# counts the same expressions lift to DECIMAL(38,0) unchanged.
#
# The query is the corpus's 5 most frequent terms (deterministic:
# count DESC, term ASC) — self-contained and scale-independent. Plan:
# one explode → tf [shuffle 1, map-side combined], df + query derived
# from tf [shuffle 2 on term], dl from tf [reuses doc partitioning],
# N/L one-row broadcast, query join broadcasts (5 terms), final per-doc
# sum map-side combined, TakeOrdered top-20.

_BM25_TAIL = """
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id),
corpus AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
toklen AS (SELECT CAST(sum(tf) AS BIGINT) AS l FROM tf),
query AS (
  SELECT term FROM df ORDER BY df DESC, term ASC LIMIT 5
),
contrib AS (
  SELECT doc_id, q0 * 10000 + d1 * 1000 + d2 * 100 + d3 * 10 + (r3 * 10) {div} b AS score_e4
  FROM (
    SELECT doc_id, b, q0, d1, d2, r2 * 10 {div} b AS d3, r2 * 10 - (r2 * 10 {div} b) * b AS r3
    FROM (
      SELECT doc_id, b, q0, d1, r1 * 10 {div} b AS d2, r1 * 10 - (r1 * 10 {div} b) * b AS r2
      FROM (
        SELECT doc_id, b, q0, r0 * 10 {div} b AS d1, r0 * 10 - (r0 * 10 {div} b) * b AS r1
        FROM (
          SELECT doc_id, b, a {div} b AS q0, a - (a {div} b) * b AS r0
          FROM (
            SELECT tf.doc_id,
                   (2 * corpus.n - 2 * df.df + 1) * 44 * tf.tf * toklen.l AS a,
                   (2 * df.df + 1) * (20 * toklen.l * tf.tf + 6 * toklen.l + 18 * dl.dl * corpus.n) AS b
            FROM tf
            JOIN query USING (term)
            JOIN df USING (term)
            JOIN dl ON dl.doc_id = tf.doc_id
            CROSS JOIN corpus CROSS JOIN toklen
          )
        )
      )
    )
  )
),
scored AS (
  SELECT doc_id, CAST(sum(score_e4) AS BIGINT) AS s_e4
  FROM contrib GROUP BY doc_id
)
SELECT doc_id, CAST(s_e4 AS DOUBLE) / 10000 AS bm25
FROM scored
ORDER BY s_e4 DESC, doc_id ASC
LIMIT 20
"""

_BM25_TEMPLATE = (
    """
WITH terms AS (SELECT doc_id, {tok_unnest} AS term FROM {doctable}),
tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY doc_id, term),"""
    + _BM25_TAIL
)

_bm25_cached: list = []


def text_bm25_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 13 (guide §2.4/§5): the `tf` term-frequency table feeds FOUR
    downstream consumers (df, dl, toklen, the contrib join) — as an
    inlined CTE each reference re-ran the token explode + (doc, term)
    aggregation (32-Exchange initial plan). `tf` is now computed once
    into a slim eager localCheckpoint (doc_id, term, tf — no document
    text) and the unchanged tail reads it; identical integer arithmetic,
    oracle hash unchanged (measured 1.31 -> 1.05 s at sf0.1)."""
    from duck_server_spark.engine.session import register_views
    from duck_server_spark.operators.common import (
        release_checkpoints,
        tracked_local_checkpoint,
    )

    register_views(spark, sf_dir)
    release_checkpoints(spark, _bm25_cached)
    tf = tracked_local_checkpoint(
        spark,
        spark.sql(
            f"SELECT doc_id, term, count(*) AS tf "
            f"FROM (SELECT doc_id, explode({_TOKS}) AS term FROM documents) "
            f"GROUP BY doc_id, term"
        ),
        _bm25_cached,
    )
    tf.createOrReplaceTempView("__bm25_tf")
    return spark.sql(
        "WITH tf AS (SELECT * FROM __bm25_tf)," + _BM25_TAIL.format(div="DIV")
    )


BM25_ORACLE = _BM25_TEMPLATE.format(
    tok_unnest=f"unnest({_TOKS_DUCK})", div="//", doctable="documents"
)

QUERIES["text_bm25_retrieval"] = text_bm25_retrieval
ORACLE["text_bm25_retrieval"] = BM25_ORACLE
