"""Deduplication operators for training-data pipelines: exact,
MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.

North-star extensions (BASELINE.json). The fixture corpus has no true
duplicates, so each operator first INJECTS deterministic near/exact
duplicates (a mutated copy of every 25th doc, doc_id + 1_000_000) — the
pipeline then has real work to do and the oracle must find the identical
pairs.

Scale design (the part that matters at 100 TB):
- exact dedup: hash-groupBy on md5(text) — one shuffle on a uniform key,
  no skew (hash of content), survivors via min(doc_id).
- MinHash+LSH: per-doc signature is a pure map (no shuffle); banding
  converts O(n²) similarity into equi-join on (band_id, band_hash) —
  shuffle on band buckets, then candidate verification only within
  buckets. This is THE standard web-scale near-dedup (Broder; used by
  C4/RefinedWeb/FineWeb pipelines).
- SimHash: 64-bit signature per doc as a map; near-dup = small Hamming
  distance; banding over 4×16-bit chunks makes it equi-joinable the same
  way.
- portable hashing: every hash is md5-based (hex-string compare), NOT
  engine hash() — both engines agree bit-for-bit, and md5 is uniform
  enough that bucket skew is bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from duck_server_spark.engine.session import register_views

# ---------------------------------------------------------------------------
# Shared SQL fragments (Spark dialect + DuckDB dialect twins)
# ---------------------------------------------------------------------------

# documents ∪ mutated copies: every 25th doc re-appears with its first
# word dropped (near-dup), every 50th verbatim (exact dup).
_CORPUS_SPARK = """
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id,
         CASE WHEN doc_id % 50 = 0 THEN text
              ELSE substring(text, instr(text, ' ') + 1) END AS text
  FROM documents WHERE doc_id % 25 = 0
"""

_CORPUS_DUCK = """
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id,
         CASE WHEN doc_id % 50 = 0 THEN text
              ELSE substring(text, instr(text, ' ') + 1) END AS text
  FROM documents WHERE doc_id % 25 = 0
"""

_TOKS_S = r"split(trim(text), '\\s+')"
_TOKS_D = r"regexp_split_to_array(trim(text), '\s+')"

# word-3-gram shingles
_SHINGLES_S = f"transform(sequence(1, greatest(size({_TOKS_S}) - 2, 1)), i -> concat_ws(' ', slice({_TOKS_S}, i, 3)))"
_SHINGLES_D = f"list_transform(generate_series(1, greatest(len({_TOKS_D}) - 2, 1)), i -> concat_ws(' ', {_TOKS_D}[i], {_TOKS_D}[i+1], {_TOKS_D}[i+2]))"


def _sql_pair(spark_sql: str, duck_sql: str):
    def build(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_views(spark, sf_dir)
        return spark.sql(spark_sql)

    return build, duck_sql


# ---------------------------------------------------------------------------
# 1. Exact dedup
# ---------------------------------------------------------------------------

DEDUP_EXACT_SPARK = f"""
WITH corpus AS ({_CORPUS_SPARK}),
hashed AS (SELECT doc_id, md5(text) AS h FROM corpus)
SELECT h, min(doc_id) AS keeper, count(*) AS n_copies,
       sort_array(collect_list(doc_id)) AS members
FROM hashed GROUP BY h HAVING count(*) > 1
"""

DEDUP_EXACT_DUCK = f"""
WITH corpus AS ({_CORPUS_DUCK}),
hashed AS (SELECT doc_id, md5(text) AS h FROM corpus)
SELECT h, min(doc_id) AS keeper, count(*) AS n_copies,
       list_sort(list(doc_id)) AS members
FROM hashed GROUP BY h HAVING count(*) > 1
"""

# ---------------------------------------------------------------------------
# 2. MinHash + LSH banding
# ---------------------------------------------------------------------------
# 8 md5-based min-hashes, 2 bands × 4 rows. Bucket-join on (band, sig),
# verify candidates with exact shingle-set Jaccard ≥ 0.5.

_NUM_HASHES = 8
_BAND_ROWS = 4


def _minhash_cols(shingles: str, concat_fn: str, minfn: str, tfm: str) -> list[str]:
    return [
        f"{minfn}({tfm}({shingles}, s -> md5({concat_fn}('{j}|', s)))) AS mh{j}"
        for j in range(_NUM_HASHES)
    ]


_MH_S = ",\n       ".join(_minhash_cols(_SHINGLES_S, "concat", "array_min", "transform"))
_MH_D = ",\n       ".join(_minhash_cols(_SHINGLES_D, "concat", "list_min", "list_transform"))

_BANDS = [
    ("band0", ["mh0", "mh1", "mh2", "mh3"]),
    ("band1", ["mh4", "mh5", "mh6", "mh7"]),
]
_BAND_SEL = ", ".join(f"concat({', '.join(cols)}) AS {name}" for name, cols in _BANDS)

DEDUP_MINHASH_SPARK = f"""
WITH corpus AS ({_CORPUS_SPARK}),
sigs AS (
  SELECT doc_id, {_SHINGLES_S} AS sh,
       {_MH_S}
  FROM corpus
),
banded AS (
  SELECT doc_id, sh, {_BAND_SEL} FROM sigs
),
pairs AS (
  SELECT a.doc_id AS id1, b2.doc_id AS id2, a.sh AS sh1, b2.sh AS sh2
  FROM (
    SELECT doc_id, sh, stack(2, 0, band0, 1, band1) AS (bnd, sig) FROM banded
  ) a
  JOIN (
    SELECT doc_id, sh, stack(2, 0, band0, 1, band1) AS (bnd, sig) FROM banded
  ) b2
  ON a.bnd = b2.bnd AND a.sig = b2.sig AND a.doc_id < b2.doc_id
),
cand AS (
  SELECT DISTINCT id1, id2, sh1, sh2 FROM pairs
)
SELECT id1, id2,
       CAST(size(array_intersect(sh1, sh2)) AS DOUBLE)
         / size(array_union(sh1, sh2)) AS jaccard
FROM cand
WHERE CAST(size(array_intersect(sh1, sh2)) AS DOUBLE)
        / size(array_union(sh1, sh2)) >= 0.5
"""

DEDUP_MINHASH_DUCK = f"""
WITH corpus AS ({_CORPUS_DUCK}),
sigs AS (
  SELECT doc_id, {_SHINGLES_D} AS sh,
       {_MH_D}
  FROM corpus
),
banded AS (
  SELECT doc_id, sh, {_BAND_SEL} FROM sigs
),
long AS (
  SELECT doc_id, sh, 0 AS b, band0 AS sig FROM banded
  UNION ALL
  SELECT doc_id, sh, 1 AS b, band1 AS sig FROM banded
),
pairs AS (
  SELECT a.doc_id AS id1, c.doc_id AS id2, a.sh AS sh1, c.sh AS sh2
  FROM long a JOIN long c
  ON a.b = c.b AND a.sig = c.sig AND a.doc_id < c.doc_id
),
cand AS (
  SELECT DISTINCT id1, id2, sh1, sh2 FROM pairs
)
SELECT id1, id2,
       CAST(len(list_intersect(list_distinct(sh1), list_distinct(sh2))) AS DOUBLE)
         / len(list_distinct(list_concat(sh1, sh2))) AS jaccard
FROM cand
WHERE CAST(len(list_intersect(list_distinct(sh1), list_distinct(sh2))) AS DOUBLE)
        / len(list_distinct(list_concat(sh1, sh2))) >= 0.5
"""

# ---------------------------------------------------------------------------
# 3. SimHash (32-bit, md5-derived per-token hashes)
# ---------------------------------------------------------------------------
# bit_j(simhash) = 1 iff Σ_tokens (bit_j(md5_32(token)) ? 1 : -1) > 0.
# Computed as: for each bit j, count tokens with bit set vs total.

_SIMHASH_BITS = 32


def _simhash_expr(toks: str, tfm: str, filt: str, hex2int: str) -> str:
    # per-token 32-bit hash from first 8 md5 hex chars
    tok_hashes = f"{tfm}({toks}, t -> {hex2int})"
    bits = []
    for j in range(_SIMHASH_BITS):
        # bit j set in majority of tokens → contribute 2^j
        bits.append(
            f"(CASE WHEN 2 * size({filt}({tok_hashes}, h -> (h div {2**j}) % 2 = 1)) > size({tok_hashes}) THEN {2**j} ELSE 0 END)"
        )
    return " + ".join(bits)


def _simhash_expr_duck(toks: str) -> str:
    tok_hashes = f"list_transform({toks}, t -> ('0x' || substring(md5(t), 1, 8))::BIGINT)"
    bits = []
    for j in range(_SIMHASH_BITS):
        bits.append(
            f"(CASE WHEN 2 * len(list_filter({tok_hashes}, h -> (h // {2**j}) % 2 = 1)) > len({tok_hashes}) THEN {2**j} ELSE 0 END)"
        )
    return " + ".join(bits)


_H2I_S = "CAST(conv(substring(md5(t), 1, 8), 16, 10) AS BIGINT)"

DEDUP_SIMHASH_SPARK = f"""
WITH corpus AS ({_CORPUS_SPARK}),
sigs AS (
  SELECT doc_id, {_simhash_expr(_TOKS_S, "transform", "filter", _H2I_S)} AS simhash
  FROM corpus
),
chunks AS (
  SELECT doc_id, simhash, stack(2, 0, simhash % 65536, 1, simhash div 65536) AS (cid, cval)
  FROM sigs
),
pairs AS (
  SELECT a.doc_id AS id1, b.doc_id AS id2, a.simhash AS sh1, b.simhash AS sh2
  FROM chunks a JOIN chunks b
    ON a.cid = b.cid AND a.cval = b.cval AND a.doc_id < b.doc_id
)
SELECT DISTINCT id1, id2,
       bit_count(sh1 ^ sh2) AS hamming
FROM pairs
WHERE bit_count(sh1 ^ sh2) <= 3
"""

DEDUP_SIMHASH_DUCK = f"""
WITH corpus AS ({_CORPUS_DUCK}),
sigs AS (
  SELECT doc_id, {_simhash_expr_duck(_TOKS_D)} AS simhash
  FROM corpus
),
chunks AS (
  SELECT doc_id, simhash, 0 AS cid, simhash % 65536 AS cval FROM sigs
  UNION ALL
  SELECT doc_id, simhash, 1 AS cid, simhash // 65536 AS cval FROM sigs
),
pairs AS (
  SELECT a.doc_id AS id1, b.doc_id AS id2, a.simhash AS sh1, b.simhash AS sh2
  FROM chunks a JOIN chunks b
    ON a.cid = b.cid AND a.cval = b.cval AND a.doc_id < b.doc_id
)
SELECT DISTINCT id1, id2,
       bit_count(xor(sh1, sh2)) AS hamming
FROM pairs
WHERE bit_count(xor(sh1, sh2)) <= 3
"""

# ---------------------------------------------------------------------------
# 4. N-gram Jaccard (blocked pairwise)
# ---------------------------------------------------------------------------
# Exact Jaccard over word-3-gram sets, blocked by (first shingle's md5
# prefix) to bound the pair count — the verification stage of LSH run
# standalone with a cheaper blocking key.

DEDUP_NGRAM_JACCARD_SPARK = f"""
WITH corpus AS ({_CORPUS_SPARK}),
sh AS (
  SELECT doc_id, array_distinct({_SHINGLES_S}) AS sh,
         substring(md5(element_at(sort_array({_SHINGLES_S}), 1)), 1, 2) AS blk
  FROM corpus
),
pairs AS (
  SELECT a.doc_id AS id1, b.doc_id AS id2, a.sh AS sh1, b.sh AS sh2
  FROM sh a JOIN sh b ON a.blk = b.blk AND a.doc_id < b.doc_id
)
SELECT id1, id2,
       CAST(size(array_intersect(sh1, sh2)) AS DOUBLE) / size(array_union(sh1, sh2)) AS jaccard
FROM pairs
WHERE CAST(size(array_intersect(sh1, sh2)) AS DOUBLE) / size(array_union(sh1, sh2)) >= 0.3
"""

DEDUP_NGRAM_JACCARD_DUCK = f"""
WITH corpus AS ({_CORPUS_DUCK}),
sh AS (
  SELECT doc_id, list_distinct({_SHINGLES_D}) AS sh,
         substring(md5(list_sort({_SHINGLES_D})[1]), 1, 2) AS blk
  FROM corpus
),
pairs AS (
  SELECT a.doc_id AS id1, b.doc_id AS id2, a.sh AS sh1, b.sh AS sh2
  FROM sh a JOIN sh b ON a.blk = b.blk AND a.doc_id < b.doc_id
)
SELECT id1, id2,
       CAST(len(list_intersect(sh1, sh2)) AS DOUBLE) / len(list_distinct(list_concat(sh1, sh2))) AS jaccard
FROM pairs
WHERE CAST(len(list_intersect(sh1, sh2)) AS DOUBLE) / len(list_distinct(list_concat(sh1, sh2))) >= 0.3
"""

# ---------------------------------------------------------------------------
# 5. Embedding-cosine near-dup (label-blocked)
# ---------------------------------------------------------------------------
# Cosine in double via left-to-right fold (bit-identical both engines,
# see operators/scalars.py). Blocking on label bounds pairs; at 100 TB
# the blocking key would be an LSH/IVF bucket (see similarity.py).

_DOT_S = "aggregate(zip_with(a.embedding, b.embedding, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0.0D, (acc, v) -> acc + v)"
_NRM_S = "aggregate(transform({0}.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 0.0D, (acc, v) -> acc + v)"

_DOT_D = "list_reduce(list_prepend(0.0, list_transform(generate_series(1, len(a.embedding)), i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))), (acc, v) -> acc + v)"
_NRM_D = "list_reduce(list_prepend(0.0, list_transform({0}.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (acc, v) -> acc + v)"

# embeddings ∪ perturbed copies (first component -> 0.5) so the fixture
# has true near-dup pairs; cos(orig, copy) ≈ 0.9 for unit-norm vectors.
_EMB_CORPUS_SPARK = """
  SELECT vec_id, label, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000 AS vec_id, label,
         concat(array(CAST(0.5 AS FLOAT)), slice(embedding, 2, size(embedding) - 1)) AS embedding
  FROM embeddings WHERE vec_id % 10 = 0
"""

_EMB_CORPUS_DUCK = """
  SELECT vec_id, label, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000 AS vec_id, label,
         list_concat([CAST(0.5 AS FLOAT)], list_slice(embedding, 2, len(embedding))) AS embedding
  FROM embeddings WHERE vec_id % 10 = 0
"""

DEDUP_EMBEDDING_SPARK = f"""
WITH emb AS ({_EMB_CORPUS_SPARK})
SELECT a.vec_id AS id1, b.vec_id AS id2,
       {_DOT_S} / (sqrt({_NRM_S.format('a')}) * sqrt({_NRM_S.format('b')})) AS cosine
FROM emb a JOIN emb b
  ON a.label = b.label AND a.vec_id < b.vec_id
WHERE {_DOT_S} / (sqrt({_NRM_S.format('a')}) * sqrt({_NRM_S.format('b')})) >= 0.85
"""

DEDUP_EMBEDDING_DUCK = f"""
WITH emb AS ({_EMB_CORPUS_DUCK})
SELECT a.vec_id AS id1, b.vec_id AS id2,
       {_DOT_D} / (sqrt({_NRM_D.format('a')}) * sqrt({_NRM_D.format('b')})) AS cosine
FROM emb a JOIN emb b
  ON a.label = b.label AND a.vec_id < b.vec_id
WHERE {_DOT_D} / (sqrt({_NRM_D.format('a')}) * sqrt({_NRM_D.format('b')})) >= 0.85
"""


_exact_q, _exact_o = _sql_pair(DEDUP_EXACT_SPARK, DEDUP_EXACT_DUCK)
_minhash_q, _minhash_o = _sql_pair(DEDUP_MINHASH_SPARK, DEDUP_MINHASH_DUCK)
_simhash_q, _simhash_o = _sql_pair(DEDUP_SIMHASH_SPARK, DEDUP_SIMHASH_DUCK)
_jaccard_q, _jaccard_o = _sql_pair(DEDUP_NGRAM_JACCARD_SPARK, DEDUP_NGRAM_JACCARD_DUCK)
_emb_q, _emb_o = _sql_pair(DEDUP_EMBEDDING_SPARK, DEDUP_EMBEDDING_DUCK)

QUERIES = {
    "dedup_exact": _exact_q,
    "dedup_minhash_lsh": _minhash_q,
    "dedup_simhash": _simhash_q,
    "dedup_ngram_jaccard": _jaccard_q,
    "dedup_embedding_cosine": _emb_q,
}

ORACLE = {
    "dedup_exact": _exact_o,
    "dedup_minhash_lsh": _minhash_o,
    "dedup_simhash": _simhash_o,
    "dedup_ngram_jaccard": _jaccard_o,
    "dedup_embedding_cosine": _emb_o,
}
