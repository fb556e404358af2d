"""Training-data-pipeline operators over documents / embeddings.

These extend the reference's surface with the operators a 100 TB
text/embedding pipeline needs (BASELINE north star): exact + near
dedup, MinHash signatures, similarity search, language ID, quality
stats, token counting, fingerprinting. All are expressed as
declarative plans (higher-order array functions stay JVM-side; no
Python UDFs in any hot path) with DuckDB oracles.

Scale notes (100 TB design):
- exact dedup: hash-groupBy on md5 — one shuffle on the digest,
  map-side partial agg;
- near-dup: *blocked* self-join (here: the `source` column ≙ an LSH
  band / shard key) so the pair space never goes quadratic in the
  corpus, only within blocks;
- MinHash: per-row projection only — embarrassingly parallel;
- k-NN brute force: broadcast the (small) query set, one pass over
  the corpus, per-partition top-k before the final k·|Q| merge.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from chess_pipeline_spark.functions.rounding import fround
from chess_pipeline_spark.plans.spec import QuerySpec
from chess_pipeline_spark.sources import load_table as _L

# ------------------------------------------------------------------
# Exact dedup (hash-groupBy)
# ------------------------------------------------------------------


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate grouping on a content digest. At 100 TB the
    groupBy key is the 128-bit digest, never the document body."""
    d = _L(spark, sf_dir, "documents")
    return (
        d.groupBy(F.md5("text").alias("fp"))
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_dupes"))
    )


DEDUP_EXACT_SQL = """
SELECT md5(text) AS fp, min(doc_id) AS keep_doc_id, count(*) AS n_dupes
FROM documents GROUP BY 1
"""


# ------------------------------------------------------------------
# Text quality / stats
# ------------------------------------------------------------------

_STOPWORDS = ("the", "a", "of", "and", "to", "in")


def text_quality_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-scoring features: length, word count, punctuation
    count/ratio, stopword ratio, mean word length — all JVM-side
    higher-order functions, one pass, no shuffle."""
    d = _L(spark, sf_dir, "documents")
    n_chars = F.length("text").cast("long")
    n_words = F.size(F.split("text", " ")).cast("long")
    stop_list = ", ".join(f"'{w}'" for w in _STOPWORDS)
    n_stop = F.expr(f"size(filter(split(text, ' '), w -> w IN ({stop_list})))").cast("long")
    # chars that are neither alphanumeric nor space
    n_punct = F.length(F.regexp_replace("text", "[a-zA-Z0-9 ]", "")).cast("long")
    return d.select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_words.alias("n_words"),
        n_stop.alias("n_stopwords"),
        fround(n_stop / n_words.cast("double"), 6).alias("stopword_ratio"),
        n_punct.alias("n_punct"),
        fround(n_punct / n_chars.cast("double"), 6).alias("punct_ratio"),
        fround((n_chars - (n_words - 1)) / n_words.cast("double"), 6).alias("mean_word_len"),
    )


_STOP_SQL = ", ".join(f"'{w}'" for w in _STOPWORDS)
TEXT_QUALITY_STATS_SQL = f"""
WITH s AS (
  SELECT doc_id,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
         CAST(len(list_filter(string_split(text, ' '),
                  w -> w IN ({_STOP_SQL}))) AS BIGINT) AS n_stopwords,
         CAST(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS BIGINT) AS n_punct
  FROM documents)
SELECT doc_id, n_chars, n_words, n_stopwords,
       floor((n_stopwords / CAST(n_words AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS stopword_ratio,
       n_punct,
       floor((n_punct / CAST(n_chars AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS punct_ratio,
       floor(((n_chars - (n_words - 1)) / CAST(n_words AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS mean_word_len
FROM s
"""


def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish regex tokenizer
    (runs of letters | runs of digits | single other non-space)."""
    d = _L(spark, sf_dir, "documents")
    pat = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
    return d.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("ws_tokens"),
        F.regexp_count("text", F.lit(pat)).cast("long").alias("bpe_tokens"),
    )


TOKEN_COUNT_SQL = r"""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS bpe_tokens
FROM documents
"""


# language-ID: n-gram/marker-word heuristic. Marker hit-counts per
# language, argmax with a fixed precedence order. (Deterministic and
# oracle-checkable; real corpora would use a fastText-style model via
# pandas_udf — same plan shape.)
_LANG_MARKERS = {
    "en": ("the", "a", "of"),
    "de": ("der", "die", "und"),
    "fr": ("le", "la", "et"),
    "es": ("el", "los", "que"),
    "zh": ("的", "是", "了"),
}


def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _L(spark, sf_dir, "documents")
    scores = {}
    for lang, markers in _LANG_MARKERS.items():
        lst = ", ".join(f"'{m}'" for m in markers)
        scores[lang] = F.expr(f"size(filter(split(text, ' '), w -> w IN ({lst})))").cast(
            "long"
        )
    pred = F.lit("unknown")
    # fixed precedence: later langs win ties only if strictly greater;
    # evaluate in reverse so 'en' has highest precedence at equal score
    best = F.lit(0).cast("long")
    for lang in reversed(list(_LANG_MARKERS)):
        is_better = scores[lang] > best
        pred = F.when(is_better, F.lit(lang)).otherwise(pred)
        best = F.when(is_better, scores[lang]).otherwise(best)
    cols = [scores[lang].alias(f"score_{lang}") for lang in _LANG_MARKERS]
    return d.select("doc_id", F.col("lang").alias("labeled_lang"), *cols, pred.alias("pred_lang"))


def _lang_id_sql() -> str:
    score_exprs = []
    for lang, markers in _LANG_MARKERS.items():
        lst = ", ".join(f"'{m}'" for m in markers)
        score_exprs.append(
            f"CAST(len(list_filter(string_split(text, ' '), w -> w IN ({lst}))) AS BIGINT) AS score_{lang}"
        )
    # mirror the Spark fold: reverse order, strictly-greater updates
    langs = list(_LANG_MARKERS)
    pred = "'unknown'"
    best = "CAST(0 AS BIGINT)"
    for lang in reversed(langs):
        pred = f"CASE WHEN score_{lang} > {best} THEN '{lang}' ELSE {pred} END"
        best = f"CASE WHEN score_{lang} > {best} THEN score_{lang} ELSE {best} END"
    return f"""
WITH s AS (
  SELECT doc_id, lang AS labeled_lang, {", ".join(score_exprs)}
  FROM documents)
SELECT doc_id, labeled_lang, {", ".join(f"score_{lang}" for lang in langs)},
       {pred} AS pred_lang
FROM s
"""


LANG_ID_SQL = _lang_id_sql()


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive rolling (polynomial) hash over the word
    sequence — a document fingerprint that, unlike a set hash,
    distinguishes permutations. Pure fold, JVM-side."""
    d = _L(spark, sf_dir, "documents")
    fp = F.expr(
        "aggregate("
        "  transform(split(text, ' '), w -> CAST(ascii(w) * 7 + length(w) AS BIGINT)),"
        "  CAST(0 AS BIGINT),"
        "  (acc, t) -> (acc * 31 + t) % 1000000007)"
    )
    return d.select("doc_id", fp.alias("fingerprint"))


DOC_FINGERPRINT_SQL = """
SELECT doc_id,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
           list_transform(string_split(text, ' '),
                          w -> CAST(ascii(w) * 7 + length(w) AS BIGINT))),
         (a, b) -> (a * 31 + b) % 1000000007) AS fingerprint
FROM documents
"""


# ------------------------------------------------------------------
# Near-duplicate detection
# ------------------------------------------------------------------


def near_dup_pairs_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-set Jaccard near-dup pairs with blocking on `source`.

    The block key caps the pair space (≙ an LSH band at scale — the
    full-corpus variant uses minhash band buckets as the block key).
    All-integer set sizes → the 0.9 threshold compares identical
    doubles on both engines.
    """
    d = _L(spark, sf_dir, "documents")
    ws = d.select(
        "doc_id", "source", F.array_distinct(F.split("text", " ")).alias("w")
    )
    a = ws.alias("a")
    b = ws.alias("b")
    pairs = a.join(
        b,
        (F.col("a.source") == F.col("b.source")) & (F.col("a.doc_id") < F.col("b.doc_id")),
    )
    inter = F.size(F.array_intersect(F.col("a.w"), F.col("b.w")))
    union = F.size(F.col("a.w")) + F.size(F.col("b.w")) - inter
    jac = inter / union.cast("double")
    return pairs.select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        fround(jac, 6).alias("jaccard"),
    ).filter(jac >= 0.9)


NEAR_DUP_PAIRS_JACCARD_SQL = """
WITH ws AS (
  SELECT doc_id, source, list_distinct(string_split(text, ' ')) AS w
  FROM documents)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       floor((len(list_intersect(a.w, b.w))
             / CAST(len(a.w) + len(b.w) - len(list_intersect(a.w, b.w)) AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0
         AS jaccard
FROM ws a JOIN ws b ON a.source = b.source AND a.doc_id < b.doc_id
WHERE len(list_intersect(a.w, b.w))
      / CAST(len(a.w) + len(b.w) - len(list_intersect(a.w, b.w)) AS DOUBLE) >= 0.9
"""


# ------------------------------------------------------------------
# MinHash signatures
# ------------------------------------------------------------------
# k=4 permutation-hash minima over 3-word shingles. The base shingle
# hash is intentionally a simple closed-form (ascii/length based) so
# the SQL oracle can reproduce it exactly; the *mechanics*
# (shingle → k permuted hashes → min per permutation) are the real
# MinHash algorithm. At scale, band the signature (pairs of minhashes)
# into LSH bucket keys and block the near-dup join on them.
_MINHASH_PERMS = ((1299721, 2750161), (4256233, 950041), (7368787, 3389), (9576890767, 104729))
_MINHASH_P = 2147483647

# closed-form base hash of a shingle string s (same in Spark SQL and DuckDB)
_BASE_HASH = (
    "CAST(ascii({s}) AS BIGINT) * 1000003"
    " + CAST(length({s}) AS BIGINT) * 7919"
    " + CAST(ascii(reverse({s})) AS BIGINT) * 977"
)


def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _L(spark, sf_dir, "documents")
    # 3-word shingles, 1-based positions 1..n-2 (guard short docs:
    # Spark's sequence() descends when stop < start, so clamp first)
    shingles = (
        "CASE WHEN size(split(text, ' ')) >= 3 THEN "
        "transform(sequence(1, size(split(text, ' ')) - 2), "
        "  i -> concat_ws(' ', element_at(split(text, ' '), i), "
        "                 element_at(split(text, ' '), i + 1), "
        "                 element_at(split(text, ' '), i + 2))) "
        "ELSE CAST(array() AS array<string>) END"
    )
    df = d.select("doc_id", F.expr(shingles).alias("sh"))
    cols = []
    for j, (a, b) in enumerate(_MINHASH_PERMS):
        h = _BASE_HASH.format(s="s")
        mh = f"array_min(transform(sh, s -> ({a} * ({h}) + {b}) % {_MINHASH_P}))"
        cols.append(F.coalesce(F.expr(mh), F.lit(-1)).alias(f"mh_{j}"))
    return df.select("doc_id", *cols)


def _minhash_sql() -> str:
    h = _BASE_HASH.format(s="s")
    mins = ", ".join(
        f"coalesce(list_min(list_transform(sh, s -> ({a} * ({h}) + {b}) % {_MINHASH_P})), -1) AS mh_{j}"
        for j, (a, b) in enumerate(_MINHASH_PERMS)
    )
    return f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
sh AS (
  SELECT doc_id,
         list_transform(range(1, greatest(len(words) - 1, 1)),
                        i -> words[i] || ' ' || words[i + 1] || ' ' || words[i + 2]) AS sh
  FROM w)
SELECT doc_id, {mins} FROM sh
"""


MINHASH_SIGNATURES_SQL = _minhash_sql()


# ------------------------------------------------------------------
# Similarity search (brute-force cosine top-k baseline)
# ------------------------------------------------------------------


def knn_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 cosine neighbors for each query vector (vec_id < 5).

    The scale plan: broadcast the small query set, one scan of the
    corpus computing dot products JVM-side (zip_with + aggregate —
    no Python), then a per-query top-k window. Ranking runs on the
    *rounded* cosine with a vec_id tiebreak so it is deterministic
    and engine-independent.
    """
    e = _L(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    cand = e.select("vec_id", "embedding")
    dot = F.expr(
        "aggregate(zip_with(qe, embedding, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
        " CAST(0 AS DOUBLE), (a, b) -> a + b)"
    )
    norm = "sqrt(aggregate({v}, CAST(0 AS DOUBLE), (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
    cos = fround(dot / (F.expr(norm.format(v="qe")) * F.expr(norm.format(v="embedding"))), 6)
    scored = (
        cand.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", F.col("vec_id").alias("neighbor_id"), cos.alias("cos_sim"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 5)
    )


KNN_COSINE_TOPK_SQL = """
WITH ue AS (
  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings),
norms AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM ue GROUP BY vec_id),
dots AS (
  SELECT a.vec_id AS qid, b.vec_id AS neighbor_id, sum(a.x * b.x) AS dot
  FROM ue a JOIN ue b ON a.i = b.i
  WHERE a.vec_id < 5 AND b.vec_id <> a.vec_id
  GROUP BY 1, 2),
cosd AS (
  SELECT qid, neighbor_id,
         floor((dot / (na.nrm * nb.nrm)) * 1000000.0 + 0.5) / 1000000.0 AS cos_sim
  FROM dots
  JOIN norms na ON na.vec_id = dots.qid
  JOIN norms nb ON nb.vec_id = dots.neighbor_id)
SELECT qid, neighbor_id, cos_sim, rank
FROM (SELECT *, row_number() OVER (PARTITION BY qid
                                   ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
      FROM cosd)
WHERE rank <= 5
"""


def embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector norm / mean — the aggregate-lambda warm-up for any
    embedding-column pipeline (all JVM-side)."""
    e = _L(spark, sf_dir, "embeddings")
    sum_ = F.expr(
        "aggregate(embedding, CAST(0 AS DOUBLE), (a, x) -> a + CAST(x AS DOUBLE))"
    )
    sumsq = F.expr(
        "aggregate(embedding, CAST(0 AS DOUBLE), (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"
    )
    return e.select(
        "vec_id",
        "label",
        F.size("embedding").cast("long").alias("dim"),
        fround(F.sqrt(sumsq), 6).alias("l2_norm"),
        fround(sum_ / F.size("embedding"), 6).alias("mean_val"),
    )


EMBEDDING_STATS_SQL = """
WITH ue AS (
  SELECT vec_id, label, len(embedding) AS dim,
         CAST(unnest(embedding) AS DOUBLE) AS x,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings)
SELECT vec_id, label, CAST(dim AS BIGINT) AS dim,
       floor((sqrt(sum(x * x))) * 1000000.0 + 0.5) / 1000000.0 AS l2_norm,
       floor((sum(x) / dim) * 1000000.0 + 0.5) / 1000000.0 AS mean_val
FROM ue GROUP BY vec_id, label, dim
"""


QUERIES: dict[str, QuerySpec] = {
    "dedup_exact": QuerySpec(dedup_exact, DEDUP_EXACT_SQL, "llm-dedup F16"),
    "text_quality_stats": QuerySpec(text_quality_stats, TEXT_QUALITY_STATS_SQL, "llm-textstats"),
    "token_count": QuerySpec(token_count, TOKEN_COUNT_SQL, "llm-tokenize"),
    "lang_id_heuristic": QuerySpec(lang_id_heuristic, LANG_ID_SQL, "llm-langid"),
    "doc_fingerprint": QuerySpec(doc_fingerprint, DOC_FINGERPRINT_SQL, "llm-fingerprint"),
    "near_dup_pairs_jaccard": QuerySpec(
        near_dup_pairs_jaccard, NEAR_DUP_PAIRS_JACCARD_SQL, "llm-neardup"
    ),
    "minhash_signatures": QuerySpec(minhash_signatures, MINHASH_SIGNATURES_SQL, "llm-minhash"),
    "knn_cosine_topk": QuerySpec(knn_cosine_topk, KNN_COSINE_TOPK_SQL, "llm-knn F18"),
    "embedding_stats": QuerySpec(embedding_stats, EMBEDDING_STATS_SQL, "llm-embed"),
}

