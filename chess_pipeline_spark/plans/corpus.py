"""Corpus-preparation operators for training-data pipelines.

The step AFTER analysis/dedup: choosing what to keep and how to lay
it out for a trainer. The operators a 100 TB text pipeline runs on
every refresh, each with a DuckDB oracle:

- dedup_keep_best: quality-aware representative selection per
  near-dup group (the "which copy do we keep" policy — reference
  pipelines keep min-id; real corpora keep the longest/cleanest);
- stratified_sample / mixture_sample: deterministic hash sampling,
  uniform or mixture-weighted per stratum (reproducible holdouts and
  dataset mixtures — re-runs and backfills pick the same documents,
  no RNG state to ship);
- pack_sequences: token-budget concat-and-chunk shard assignment
  (the batch-packing layout LLM trainers consume);
- tfidf_top_terms / bm25_top_terms: per-source term ranking
  (corpus-drift dashboards; BM25 adds tf saturation and length
  normalization);
- decontaminate_ngram_overlap: benchmark contamination check;
- repetition_stats / quality_filter_verdicts: Gopher-style intra-doc
  repetition signal and the auditable keep/drop gate.

The composed flow (quality -> dedup -> sample -> pack as one lazy
plan) lives in pipeline.run_corpus_etl.

Scale notes (100 TB design):
- keep-best: labels ⋈ tokens co-partition on doc_id, then ONE
  label-keyed shuffle whose representative comes from a partial
  max(struct) — no rank window, no join-back, no second pass over
  the group;
- sampling: pure per-row projection (md5 fold) — the filter runs in
  the scan stage before any exchange, and the scan reads only the
  two columns the output needs;
- packing: one window per (source) partition — the running sum is
  the only state, and source blocks are bounded (a stratum fits an
  executor); at larger strata the same plan runs per (source, day);
- tfidf: two map-side-combined shuffles, both on (source, word) /
  (word) — vocabulary-scale, not corpus-scale.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from chess_pipeline_spark.functions.rounding import (
    fround,
    grid_sum,
    sql_grid_sum,
    sql_round,
)
from chess_pipeline_spark.plans.llm import (
    BPE_TOKEN_PATTERN,
    COMPONENT_LABELS_CTES,
    component_labels,
)
from chess_pipeline_spark.plans.spec import QuerySpec
from chess_pipeline_spark.sources import load_table as _L
from chess_pipeline_spark.sources import spread

_TOKENS_SQL = (
    "CAST(len(regexp_extract_all(text, "
    r"'[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT)"
)


def _with_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(_L(spark, sf_dir, "documents"), "doc_id")
    return d.select(
        "doc_id",
        "source",
        F.regexp_count("text", F.lit(BPE_TOKEN_PATTERN)).cast("long").alias("n_tokens"),
    )


# ------------------------------------------------------------------
# Quality-aware dedup representative selection
# ------------------------------------------------------------------


def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each near-dup group (connected component over the
    MinHash-LSH candidate graph, labels from
    plans.llm.component_labels), keep the HIGHEST-token-count member
    rather than the min-id one — the "keep the longest copy" policy
    corpus curation actually wants (truncated mirrors lose to their
    fuller original).

    Plan shape: labels ⋈ token counts on doc_id (one shuffle), then
    a single groupBy(label) whose representative comes from
    max(struct(n_tokens, -doc_id)) — max-by with a deterministic
    min-id tiebreak, no window and no second pass over the group.
    """
    labels = component_labels(spark, sf_dir)
    toks = _with_tokens(spark, sf_dir).select("doc_id", "n_tokens")
    joined = labels.join(toks, "doc_id")
    agg = joined.groupBy("label").agg(
        F.count("*").cast("long").alias("group_size"),
        # max over (tokens, -doc_id): most tokens wins, lowest doc_id
        # breaks ties — one aggregate instead of a rank window
        F.max(F.struct(F.col("n_tokens"), (-F.col("doc_id")).alias("nid"))).alias("b"),
    )
    return agg.select(
        F.col("label").alias("group_id"),
        (-F.col("b.nid")).cast("long").alias("best_doc_id"),
        F.col("b.n_tokens").alias("best_tokens"),
        "group_size",
    )


DEDUP_KEEP_BEST_SQL = f"""
WITH RECURSIVE {COMPONENT_LABELS_CTES},
toks AS (SELECT doc_id, {_TOKENS_SQL} AS n_tokens FROM documents),
ranked AS (
  SELECT l.label, t.doc_id, t.n_tokens,
         row_number() OVER (PARTITION BY l.label
                            ORDER BY t.n_tokens DESC, t.doc_id ASC) AS rn,
         count(*) OVER (PARTITION BY l.label) AS gs
  FROM labels l JOIN toks t USING (doc_id))
SELECT label AS group_id, doc_id AS best_doc_id, n_tokens AS best_tokens,
       CAST(gs AS BIGINT) AS group_size
FROM ranked WHERE rn = 1
"""


# ------------------------------------------------------------------
# Deterministic stratified sampling
# ------------------------------------------------------------------

# Engine-portable uniform hash in [0, 1000): fold the first 6 hex
# chars of md5(source:doc_id) to an integer. instr/substr/md5 behave
# identically in Spark SQL and DuckDB, so the SAME expression string
# runs on both engines — no closed-form re-derivation to keep in
# sync. Salting the key with the stratum (source) makes strata
# sample independently: dropping or adding one stratum never changes
# another's picks.
_HEX = "0123456789abcdef"
_SAMPLE_KEY = "concat(source, ':', CAST(doc_id AS STRING))"
_BUCKET_EXPR = (
    "CAST(("
    + " + ".join(
        f"(instr('{_HEX}', substr(md5({_SAMPLE_KEY}), {k}, 1)) - 1) * {16 ** (6 - k)}"
        for k in range(1, 7)
    )
    + ") % 1000 AS BIGINT)"
)
_SAMPLE_PERMILLE = 100  # keep ~10% of every stratum


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% deterministic sample of every source stratum: keep rows
    whose per-stratum hash bucket < 100 of 1000. Pure per-row
    projection — no shuffle, no RNG state; the bucket filter runs in
    the scan stage (before any exchange), and re-running at any
    later date (or on a backfill subset) selects the same
    documents."""
    d = spread(_L(spark, sf_dir, "documents"), "doc_id")
    return (
        d.select("doc_id", "source", F.expr(_BUCKET_EXPR).alias("bucket"))
        .filter(F.col("bucket") < _SAMPLE_PERMILLE)
    )


STRATIFIED_SAMPLE_SQL = f"""
SELECT doc_id, source, {_BUCKET_EXPR} AS bucket
FROM documents
WHERE {_BUCKET_EXPR} < {_SAMPLE_PERMILLE}
"""


# Dataset-mixture weights: keep-rate permille per source tier. The
# mixture step of an LLM data pipeline — upweight curated tiers,
# downweight bulk crawl — expressed as deterministic per-stratum
# thresholds over the same salted hash as stratified_sample, so
# mixtures are reproducible and each stratum's picks are independent.
_MIX_HIGH = ("src0", "src1")     # 300‰ — "curated" tier
_MIX_MID = ("src2", "src3")      # 150‰ — "reference" tier
_MIX_DEFAULT = 50                # 50‰  — bulk tier


def mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted dataset-mixture sampling: each source tier keeps a
    different deterministic fraction (300/150/50 permille). Same
    scale posture as stratified_sample — pure per-row projection, the
    tier CASE and bucket filter both run in the scan stage, zero
    shuffles; changing mixture weights is a constant edit, not a new
    shuffle plan."""
    d = spread(_L(spark, sf_dir, "documents"), "doc_id")
    high = ", ".join(f"'{s}'" for s in _MIX_HIGH)
    mid = ", ".join(f"'{s}'" for s in _MIX_MID)
    rate = F.expr(
        f"CAST(CASE WHEN source IN ({high}) THEN 300 "
        f"WHEN source IN ({mid}) THEN 150 "
        f"ELSE {_MIX_DEFAULT} END AS BIGINT)"
    )
    return (
        d.select(
            "doc_id",
            "source",
            F.expr(_BUCKET_EXPR).alias("bucket"),
            rate.alias("keep_permille"),
        )
        .filter(F.col("bucket") < F.col("keep_permille"))
    )


_MIX_HIGH_SQL = ", ".join(f"'{s}'" for s in _MIX_HIGH)
_MIX_MID_SQL = ", ".join(f"'{s}'" for s in _MIX_MID)
MIXTURE_SAMPLE_SQL = f"""
WITH r AS (
  SELECT doc_id, source, {_BUCKET_EXPR} AS bucket,
         CAST(CASE WHEN source IN ({_MIX_HIGH_SQL}) THEN 300
                   WHEN source IN ({_MIX_MID_SQL}) THEN 150
                   ELSE {_MIX_DEFAULT} END AS BIGINT) AS keep_permille
  FROM documents)
SELECT doc_id, source, bucket, keep_permille
FROM r WHERE bucket < keep_permille
"""


# ------------------------------------------------------------------
# Temperature-scaled mixture sampling: p_s ∝ n_s^α
# ------------------------------------------------------------------

_TEMP_ALPHA = 0.7  # the multilingual-LM standard (mBERT/XLM lineage)
_TEMP_BUDGET_PERMILLE = 200  # target sample ≈ 20% of the corpus


def temperature_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture report: per-source keep rates
    derived FROM the observed source sizes as p_s ∝ n_s^{_TEMP_ALPHA}
    — the standard low-resource-upweighting rule (α = 1 keeps natural
    proportions, α → 0 approaches uniform-per-source). Unlike
    mixture_sample's hand-pinned tiers, the rates here move with the
    data: a source that shrinks next refresh automatically gets a
    higher keep rate. The sample itself is the same deterministic
    per-doc hash-bucket rule as every sampler in this repo, so
    membership is stable across runs and backfills.

    rate_s (permille) = min(1000, round(B · w_s / (Σw · n_s) · 1000))
    with w_s = n_s^α and B = {_TEMP_BUDGET_PERMILLE}‰ of the corpus —
    one rounded comparison per source, after which everything is
    integer (bucket < rate).

    Output per source: n_docs, rate_permille, n_sampled — the
    curator's mixing table, aggregate so the driver hash is small.

    100 TB shape: pass 1 aggregates (source) counts — a source-keyed
    map-side-combined shuffle of the source column only; the ≤
    |sources| rate frame broadcasts onto the scan-stage bucket filter
    in pass 2; the rollup shuffles ≤ |sources| keys. No corpus-scale
    exchange anywhere.

    r14 (guide §2.4): the ≤|sources|-row sizes frame is pinned — the
    rates frame is consumed twice (kept filter + final report join)
    and tot once more, and each consumption re-ran the pass-1 corpus
    aggregation through its lineage (5 document scans -> 2,
    plans/r14/temperature_mixture_sample_{before,after}.txt). All
    rate arithmetic (the float pow/sum ordering included) is
    untouched — the pin only stops the re-evaluation. Interleaved
    A/B min-of-6 at sf0.1: 0.80x min / 0.77x median, rows identical.
    """
    d = spread(_L(spark, sf_dir, "documents"), "doc_id")
    sizes = (
        d.groupBy("source")
        .agg(F.count("*").cast("long").alias("n_s"))
        .localCheckpoint()
    )
    w = F.pow(F.col("n_s").cast("double"), F.lit(_TEMP_ALPHA))
    tot = sizes.agg(
        F.sum(w).alias("sum_w"), F.sum("n_s").cast("long").alias("n_corpus")
    )
    rates = sizes.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_s",
        F.least(
            F.lit(1000),
            F.floor(
                F.lit(_TEMP_BUDGET_PERMILLE / 1000.0)
                * F.col("n_corpus")
                * w
                / F.col("sum_w")
                / F.col("n_s")
                * 1000.0
                + F.lit(0.5)
            ),
        )
        .cast("long")
        .alias("rate_permille"),
    )
    kept = (
        d.select("doc_id", "source", F.expr(_BUCKET_EXPR).alias("bucket"))
        .join(F.broadcast(rates), "source")
        .filter(F.col("bucket") < F.col("rate_permille"))
    )
    return (
        kept.groupBy("source")
        .agg(F.count("*").cast("long").alias("n_sampled"))
        .join(F.broadcast(rates), "source")
        .select(
            "source",
            F.col("n_s").alias("n_docs"),
            "rate_permille",
            "n_sampled",
        )
    )


TEMPERATURE_MIXTURE_SAMPLE_SQL = f"""
WITH sizes AS (
  SELECT source, count(*) AS n_s FROM documents GROUP BY 1),
tot AS (
  SELECT sum(pow(CAST(n_s AS DOUBLE), {_TEMP_ALPHA})) AS sum_w,
         sum(n_s) AS n_corpus
  FROM sizes),
rates AS (
  SELECT source, n_s,
         least(1000, CAST(floor(
           {_TEMP_BUDGET_PERMILLE / 1000.0} * t.n_corpus
           * pow(CAST(n_s AS DOUBLE), {_TEMP_ALPHA}) / t.sum_w
           / n_s * 1000.0 + 0.5) AS BIGINT)) AS rate_permille
  FROM sizes, tot t),
kept AS (
  SELECT d.source
  FROM (SELECT doc_id, source, {_BUCKET_EXPR} AS bucket FROM documents) d
  JOIN rates r ON d.source = r.source
  WHERE d.bucket < r.rate_permille)
SELECT k.source,
       CAST(r.n_s AS BIGINT) AS n_docs,
       r.rate_permille,
       CAST(count(*) AS BIGINT) AS n_sampled
FROM kept k JOIN rates r ON k.source = r.source
GROUP BY 1, 2, 3
"""


def curate_documents(docs: DataFrame) -> DataFrame:
    """Mode-agnostic curation spec: deterministic per-stratum sample
    + minimal quality gate (non-empty tokenization). Every expression
    is row-local (no state, no window), so the SAME function runs
    over a batch read or a readStream — the streaming ingest twin is
    tests/test_streaming.py::test_stream_curation_matches_batch via
    streaming/jobs.py::read_documents_stream."""
    return docs.select(
        "doc_id",
        "source",
        F.expr(_BUCKET_EXPR).alias("bucket"),
        F.regexp_count("text", F.lit(BPE_TOKEN_PATTERN)).cast("long").alias("n_tokens"),
    ).filter((F.col("bucket") < _SAMPLE_PERMILLE) & (F.col("n_tokens") > 0))


# ------------------------------------------------------------------
# Weighted sampling without replacement (Efraimidis–Spirakis)
# ------------------------------------------------------------------

_ES_K = 100  # sample size
# 6-hex-digit uniform from md5: u6 in 0..16^6-1; u = (u6+1)/16^6 in
# (0, 1] (the +1 keeps ln(u) finite)
_ES_KEY = "concat('es:', source, ':', CAST(doc_id AS STRING))"
_ES_U6 = (
    "("
    + " + ".join(
        f"(instr('{_HEX}', substr(md5({_ES_KEY}), {k}, 1)) - 1) * {16 ** (6 - k)}"
        for k in range(1, 7)
    )
    + ")"
)


def weighted_sample_es(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement, k={_ES_K}, by the
    Efraimidis–Spirakis exponential race: each doc draws a
    deterministic uniform u from md5 and gets priority u^(1/w) with
    weight w = its length (a stand-in for any curation quality
    score); the sample is the global top-k by priority. One pass, no
    rejection loop, exactly k rows, and P(doc in sample) increases
    with w — the weighted complement of the rate-based
    stratified/mixture samplers, for "spend the token budget on the
    best documents" curation.

    Determinism (the micro-nat lesson): ranking uses
    floor(ln(u)/w * 1e6 + 0.5) — u is an exact dyadic rational, the
    quantized key is integer, and (key, doc_id) is a total order, so
    both engines pick the identical k rows.

    100 TB shape: the key is a scan-stage projection (zero shuffles);
    top-k runs as per-partition heaps + a single k-row driver merge
    (TakeOrderedAndProject — plan-gated), never a global sort. The
    sample size is a constant, so the final hop is k rows regardless
    of corpus size.
    """
    d = spread(_L(spark, sf_dir, "documents"), "doc_id")
    return es_top_k(es_scored(d))


def es_scored(docs: DataFrame) -> DataFrame:
    """(doc_id, source, n_chars) -> + weight, priority_micro: the
    deterministic ES race key (scan-stage projection). Shared by the
    catalog query and the streaming sample ledger — the key depends
    only on the document, so re-scoring a replayed batch yields the
    identical priorities."""
    w = F.greatest(F.col("n_chars"), F.lit(1)).cast("double")
    u = (F.expr(_ES_U6).cast("double") + 1.0) / F.lit(float(16**6))
    key = F.floor(F.log(u) / w * 1e6 + F.lit(0.5)).cast("long")
    return docs.select(
        "doc_id",
        "source",
        F.col("n_chars").cast("long").alias("weight"),
        key.alias("priority_micro"),
    )


def es_top_k(scored: DataFrame, k: int = _ES_K) -> DataFrame:
    """Global top-k of the ES race — TakeOrdered partial heaps, total
    (priority, doc_id) order. top-k is a MERGEABLE, IDEMPOTENT fold:
    top_k(A ∪ B) = top_k(top_k(A) ∪ B), which is what lets the
    streaming ledger keep only k rows of state."""
    return scored.orderBy(
        F.col("priority_micro").desc(), F.col("doc_id").asc()
    ).limit(k)


WEIGHTED_SAMPLE_ES_SQL = f"""
SELECT doc_id, source,
       CAST(n_chars AS BIGINT) AS weight,
       CAST(floor(ln(({_ES_U6} + 1.0) / {float(16**6)})
                  / CAST(greatest(n_chars, 1) AS DOUBLE) * 1000000.0 + 0.5)
         AS BIGINT) AS priority_micro
FROM documents
ORDER BY priority_micro DESC, doc_id ASC
LIMIT {_ES_K}
"""


_ES_PER_SRC_K = 10  # per-stratum reservoir size


def weighted_sample_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum weighted reservoirs: the top-{_ES_PER_SRC_K} of the
    SAME deterministic ES race, ranked WITHIN each source — exact
    weighted sampling-without-replacement per stratum, the form a
    mixture curator uses when every source must contribute a fixed
    quota regardless of its size (the global race lets one huge
    source crowd the sample; mixture targets usually forbid that).

    100 TB shape: same scan-stage key as weighted_sample_es, then one
    rank window PARTITIONED BY source — per-partition state is one
    stratum's rows, no global order anywhere; the result is
    |sources|·k rows. Same total (priority, doc_id) order within
    strata, so both engines pick identical rows.
    """
    d = spread(_L(spark, sf_dir, "documents"), "doc_id")
    w = Window.partitionBy("source").orderBy(
        F.col("priority_micro").desc(), F.col("doc_id").asc()
    )
    return (
        es_scored(d)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _ES_PER_SRC_K)
        .select(
            "source",
            F.col("rk").cast("long").alias("rk"),
            "doc_id",
            "weight",
            "priority_micro",
        )
    )


WEIGHTED_SAMPLE_PER_SOURCE_SQL = f"""
WITH scored AS (
  SELECT doc_id, source,
         CAST(n_chars AS BIGINT) AS weight,
         CAST(floor(ln(({_ES_U6} + 1.0) / {float(16**6)})
                    / CAST(greatest(n_chars, 1) AS DOUBLE) * 1000000.0 + 0.5)
           AS BIGINT) AS priority_micro
  FROM documents),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY source
              ORDER BY priority_micro DESC, doc_id ASC) AS rk
  FROM scored)
SELECT source, CAST(rk AS BIGINT) AS rk, doc_id, weight, priority_micro
FROM ranked WHERE rk <= {_ES_PER_SRC_K}
"""


# ------------------------------------------------------------------
# Deterministic negative sampling for contrastive training
# ------------------------------------------------------------------


def _md5_u6(key_sql: str) -> str:
    """Engine-portable uniform integer in [0, 16^6) from md5(key):
    the same fold as _BUCKET_EXPR/_ES_U6, parameterized by the key
    expression so each operator salts its own stream."""
    return (
        "("
        + " + ".join(
            f"(instr('{_HEX}', substr(md5({key_sql}), {k}, 1)) - 1) * {16 ** (6 - k)}"
            for k in range(1, 7)
        )
        + ")"
    )


_NEG_B = 64   # candidate buckets (scale ~N/1000 in production)
_NEG_K = 4    # negatives per anchor
_NEG_ANCHOR_PERMILLE = 100  # anchor ~10% of the corpus

_NEG_BUCKET_KEY = "concat('nb:', CAST(doc_id AS STRING))"
_NEG_TIEBREAK_KEY = "concat('nr:', CAST(doc_id AS STRING))"
_NEG_ANCHOR_KEY = "concat('na:', CAST(doc_id AS STRING))"
_NEG_TARGET_KEY = "concat('nj:', CAST(anchor_id AS STRING), ':', CAST(j AS STRING))"
_NEG_BUCKET = f"({_md5_u6(_NEG_BUCKET_KEY)} % {_NEG_B})"
_NEG_TIEBREAK = _md5_u6(_NEG_TIEBREAK_KEY)
_NEG_ANCHOR_GATE = f"({_md5_u6(_NEG_ANCHOR_KEY)} % 1000)"
_NEG_TARGET = f"({_md5_u6(_NEG_TARGET_KEY)} % {_NEG_B})"


def neg_scored(docs: DataFrame) -> DataFrame:
    """(doc_id, ...) -> (doc_id, bucket, tb): the scan-stage hashing
    that places every document in its candidate bucket with its
    deterministic representative-race tiebreak. Shared by the catalog
    query and the streaming representative ledger — both depend only
    on the document, so replays re-derive identical rows."""
    return docs.select(
        "doc_id",
        F.expr(_NEG_BUCKET).alias("bucket"),
        F.expr(_NEG_TIEBREAK).alias("tb"),
    )


def neg_rep_rows(scored: DataFrame) -> DataFrame:
    """Per-bucket TWO lowest-(tb, doc_id) rows — the mergeable,
    idempotent fold the streaming ledger persists: reps(A ∪ B) =
    reps(reps(A) ∪ B), and a replayed batch re-contributes identical
    rows, so set-union + re-rank is exactly-once by algebra. State is
    bounded at 2 rows per bucket forever."""
    w = Window.partitionBy("bucket").orderBy("tb", "doc_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .drop("rn")
    )


def neg_rep_frame(scored: DataFrame) -> DataFrame:
    """Collapse scored (or persisted rep) rows to the broadcastable
    (bucket, rep1, rep2) lookup frame the pair join consumes."""
    w = Window.partitionBy("bucket").orderBy("tb", "doc_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .groupBy("bucket")
        .agg(
            F.min(F.when(F.col("rn") == 1, F.col("doc_id"))).alias("rep1"),
            F.min(F.when(F.col("rn") == 2, F.col("doc_id"))).alias("rep2"),
        )
    )


def negative_sample_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic in-corpus negative sampling for contrastive
    training: every anchor document gets {_NEG_K} pseudo-random but
    REPRODUCIBLE negatives — rerunning on the same corpus (or a
    backfill shard) emits identical (anchor, negative) pairs, so
    training data is versionable without storing an RNG trace.

    Scheme: hash every doc into one of {_NEG_B} buckets; per bucket
    keep the two lowest-tiebreak representatives; each (anchor, j)
    slot hashes to a target bucket and takes that bucket's first
    representative, falling back to the second when the first IS the
    anchor (so a pair never collides with its own anchor). Anchors
    are a deterministic ~10% gate so the pair table is a bounded
    multiple of the corpus.

    100 TB shape: representative selection is ONE shuffle keyed on
    bucket (row_number over buckets whose population is N/B — B
    scales with the corpus, so partitions stay bounded) collapsed to
    a B-row frame; the anchor→bucket lookup then BROADCASTS that
    frame, so the pair join is shuffle-free on the corpus side. No
    corpus×corpus anywhere; output ≤ anchors × {_NEG_K}.
    """
    d = spread(_L(spark, sf_dir, "documents"), "doc_id").select("doc_id")
    reps = neg_rep_frame(neg_scored(d))
    anchors = d.filter(F.expr(_NEG_ANCHOR_GATE) < _NEG_ANCHOR_PERMILLE).select(
        F.col("doc_id").alias("anchor_id")
    )
    pairs = anchors.select(
        "anchor_id",
        F.explode(F.array(*[F.lit(j) for j in range(_NEG_K)])).alias("j"),
    ).withColumn("tgt", F.expr(_NEG_TARGET))
    neg = F.when(F.col("rep1") != F.col("anchor_id"), F.col("rep1")).otherwise(
        F.col("rep2")
    )
    return (
        pairs.join(F.broadcast(reps), pairs["tgt"] == reps["bucket"], "inner")
        .select(
            "anchor_id",
            F.col("j").cast("long").alias("j"),
            neg.alias("neg_id"),
        )
        .filter(F.col("neg_id").isNotNull())
        .orderBy("anchor_id", "j")
    )


NEGATIVE_SAMPLE_PAIRS_SQL = f"""
WITH base AS (
  SELECT doc_id, {_NEG_BUCKET} AS bucket, {_NEG_TIEBREAK} AS tb
  FROM documents),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY bucket
              ORDER BY tb, doc_id) AS rn
  FROM base),
reps AS (
  SELECT bucket,
         min(CASE WHEN rn = 1 THEN doc_id END) AS rep1,
         min(CASE WHEN rn = 2 THEN doc_id END) AS rep2
  FROM ranked WHERE rn <= 2 GROUP BY bucket),
anchors AS (
  SELECT doc_id AS anchor_id FROM documents
  WHERE {_NEG_ANCHOR_GATE} < {_NEG_ANCHOR_PERMILLE}),
pairs AS (
  SELECT anchor_id, j, {_NEG_TARGET} AS tgt
  FROM anchors
  CROSS JOIN (VALUES (0), (1), (2), (3)) AS js(j)),
chosen AS (
  SELECT p.anchor_id, CAST(p.j AS BIGINT) AS j,
         CASE WHEN r.rep1 <> p.anchor_id THEN r.rep1 ELSE r.rep2 END AS neg_id
  FROM pairs p JOIN reps r ON p.tgt = r.bucket)
SELECT * FROM chosen WHERE neg_id IS NOT NULL
ORDER BY anchor_id, j
"""


# ------------------------------------------------------------------
# Deterministic span-corruption planning (T5-style masking)
# ------------------------------------------------------------------

_SPAN_BUDGET_PERMILLE = 50  # n_spans = floor(n_tok * 0.05) (~15% of
#                             tokens at mean span length 3)
_SPAN_MAX_LEN = 5
_SPAN_START_KEY = "concat('ss:', CAST(doc_id AS STRING), ':', CAST(span_idx AS STRING))"
_SPAN_LEN_KEY = "concat('sl:', CAST(doc_id AS STRING), ':', CAST(span_idx AS STRING))"


def span_corruption_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic span-corruption schedule (the T5 denoising
    objective's masking step, planned ahead of tokenization): for
    every document, floor(n_tok · 5%) corruption spans, each with an
    md5-derived start position in [1, n_tok] and length in
    [1, {_SPAN_MAX_LEN}] (clipped at the document end). Masks are a
    pure function of (doc_id, span_idx), so a re-run, a backfill, or
    a different worker partitioning produces the identical masking
    plan — the property RNG-based maskers lose the moment the data
    order changes.

    n_tok is the whitespace-word count (the repo's token-count
    proxy); spans may overlap, as in the reference objective — the
    consumer merges at application time.

    100 TB shape: entirely row-local — token count, span count, and
    both hashes are scan-stage projections; the explode fans out by
    the bounded per-doc span count. ZERO keyed exchanges (the
    deterministic ORDER BY is the only exchange in the plan).
    """
    d = spread(_L(spark, sf_dir, "documents"), "doc_id")
    toks = F.size(F.split(F.trim("text"), "\\s+"))
    n_tok = F.when(F.length(F.trim("text")) > 0, toks).otherwise(F.lit(0))
    planned = d.select(
        "doc_id",
        n_tok.cast("long").alias("n_tok"),
        F.floor(n_tok * _SPAN_BUDGET_PERMILLE / 1000.0).cast("long").alias("n_spans"),
    ).filter(F.col("n_spans") >= 1)
    spans = planned.select(
        "doc_id",
        "n_tok",
        F.explode(
            F.sequence(F.lit(1).cast("long"), F.col("n_spans"))
        ).alias("span_idx"),
    )
    start = F.expr(_md5_u6(_SPAN_START_KEY)) % F.col("n_tok") + 1
    raw_len = F.expr(_md5_u6(_SPAN_LEN_KEY)) % _SPAN_MAX_LEN + 1
    return spans.select(
        "doc_id",
        "span_idx",
        start.cast("long").alias("start_tok"),
        F.least(
            raw_len.cast("long"),
            F.col("n_tok") - start.cast("long") + 1,
        ).alias("span_len"),
    ).orderBy("doc_id", "span_idx")


SPAN_CORRUPTION_PLAN_SQL = f"""
WITH planned AS (
  SELECT doc_id,
         CAST(CASE WHEN length(trim(text)) > 0
                   THEN length(regexp_replace(trim(text), '\\S+\\s*', 'x', 'g'))
                   ELSE 0 END AS BIGINT) AS n_tok
  FROM documents),
counted AS (
  SELECT doc_id, n_tok,
         CAST(floor(n_tok * {_SPAN_BUDGET_PERMILLE} / 1000.0) AS BIGINT) AS n_spans
  FROM planned WHERE n_tok * {_SPAN_BUDGET_PERMILLE} >= 1000),
spans AS (
  SELECT doc_id, n_tok, unnest(range(1, n_spans + 1)) AS span_idx
  FROM counted)
SELECT doc_id, span_idx,
       CAST({_md5_u6(_SPAN_START_KEY)} % n_tok + 1 AS BIGINT) AS start_tok,
       least(CAST({_md5_u6(_SPAN_LEN_KEY)} % {_SPAN_MAX_LEN} + 1 AS BIGINT),
             n_tok - ({_md5_u6(_SPAN_START_KEY)} % n_tok + 1) + 1) AS span_len
FROM spans
ORDER BY doc_id, span_idx
"""


# ------------------------------------------------------------------
# Length-balanced shard assignment for distributed training
# ------------------------------------------------------------------

_SHARD_N = 8        # training shards
_SHARD_BIN_W = 100  # length-bin width (chars)


def shard_assign(docs: DataFrame) -> DataFrame:
    """Frame-level core of token_balanced_shards: (doc_id, n_chars,
    ...) -> (doc_id, n_chars, shard). Shared by the catalog query and
    the training-export CLI."""
    d = docs.select("doc_id", F.col("n_chars").cast("long").alias("n_chars"))
    binned = d.withColumn(
        "bin_idx",
        F.floor(F.col("n_chars") / float(_SHARD_BIN_W)).cast("long"),
    )
    counts = binned.groupBy("bin_idx").agg(F.count("*").alias("n_bin"))
    off_w = (
        Window.orderBy("bin_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    )
    offsets = counts.select(
        "bin_idx",
        F.coalesce(F.sum("n_bin").over(off_w), F.lit(0)).alias("bin_offset"),
    )
    rank_w = Window.partitionBy("bin_idx").orderBy("doc_id")
    ranked = (
        binned.withColumn("rn", F.row_number().over(rank_w))
        .join(F.broadcast(offsets), "bin_idx")
        .withColumn("pos", F.col("bin_offset") + F.col("rn") - 1)
    )
    return ranked.select(
        "doc_id",
        "n_chars",
        (F.col("pos") % _SHARD_N).cast("long").alias("shard"),
    )


def token_balanced_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign every document to one of {_SHARD_N} training shards so
    the per-shard LENGTH totals come out near-equal — the data-loader
    sharding step where random assignment leaves one worker with the
    long-document tail and stalls every synchronous step. Round-robin
    over the corpus in length order gives each shard every
    {_SHARD_N}th document of any length region, which equalizes
    totals to within one document per region.

    The scale trick (same decomposition as the sketch-cut deciles):
    a global length-ordered row_number would be a SINGLE-PARTITION
    window — the 100 TB anti-pattern — so the total order
    (length_bin, doc_id) is decomposed into (a) per-bin dense ranks
    (a KEYED window: bins have bounded population) and (b) bin start
    offsets from the ≤few-thousand-row bin-count frame (a window
    over a bounded frame, then broadcast back). global_pos =
    bin_offset + rank_in_bin - 1, shard = global_pos mod {_SHARD_N},
    and the result equals the global-sort definition EXACTLY — the
    DuckDB oracle computes it with the naive global row_number.
    """
    return shard_assign(
        spread(_L(spark, sf_dir, "documents"), "doc_id")
    ).orderBy("doc_id")


TOKEN_BALANCED_SHARDS_SQL = f"""
WITH ranked AS (
  SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
         row_number() OVER (
           ORDER BY CAST(floor(n_chars / {float(_SHARD_BIN_W)}) AS BIGINT),
                    doc_id) - 1 AS pos
  FROM documents)
SELECT doc_id, n_chars, CAST(pos % {_SHARD_N} AS BIGINT) AS shard
FROM ranked
ORDER BY doc_id
"""


# ------------------------------------------------------------------
# Deterministic class-balancing oversampling (with replacement)
# ------------------------------------------------------------------

_OVS_CAP_PERMILLE = 4000  # replication capped at 4x the original
_OVS_KEY = "concat('ov:', source, ':', CAST(doc_id AS STRING))"
_OVS_GATE = f"({_md5_u6(_OVS_KEY)} % 1000)"


def oversample_balance_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic oversampling WITH replacement that balances
    strata toward the largest source: every document of source s is
    replicated rate_s = min({_OVS_CAP_PERMILLE}‰, n_max/n_s) times —
    the integer part unconditionally, the fractional part by the
    same per-doc md5 permille gate as every sampler here — so a
    minority stratum approaches the majority's row count without RNG
    state, and a backfilled shard replicates exactly the same docs.
    The 4x cap is the standard guard against a tiny stratum turning
    into wall-to-wall repeats.

    Output (doc_id, source, copy_idx): training-set rows, copy_idx
    distinguishing replicas so downstream shuffles/packing treat
    them as distinct examples.

    100 TB shape: pass 1 is a source-keyed map-side-combined count;
    the ≤|sources| rate frame broadcasts back onto the scan; the
    replicate step is a row-local explode of sequence(1, copies) —
    output bounded by cap x corpus, no corpus-scale keyed exchange.
    """
    d = spread(_L(spark, sf_dir, "documents"), "doc_id")
    sizes = d.groupBy("source").agg(F.count("*").cast("long").alias("n_s"))
    mx = sizes.agg(F.max("n_s").cast("double").alias("n_max"))
    rates = sizes.crossJoin(F.broadcast(mx)).select(
        "source",
        F.least(
            F.lit(_OVS_CAP_PERMILLE).cast("long"),
            F.floor(F.col("n_max") * 1000.0 / F.col("n_s")).cast("long"),
        ).alias("rate_permille"),
    )
    gated = d.select("doc_id", "source", F.expr(_OVS_GATE).alias("gate")).join(
        F.broadcast(rates), "source"
    )
    base = F.floor(F.col("rate_permille") / 1000.0).cast("long")
    extra = (
        F.col("gate") < (F.col("rate_permille") - base * 1000)
    ).cast("long")
    return (
        gated.withColumn("copies", base + extra)
        .select(
            "doc_id",
            "source",
            F.explode(
                F.sequence(F.lit(1).cast("long"), F.col("copies"))
            ).alias("copy_idx"),
        )
        .orderBy("doc_id", "copy_idx")
    )


OVERSAMPLE_BALANCE_SOURCES_SQL = f"""
WITH sizes AS (
  SELECT source, count(*) AS n_s FROM documents GROUP BY 1),
mx AS (SELECT CAST(max(n_s) AS DOUBLE) AS n_max FROM sizes),
rates AS (
  SELECT source,
         least(CAST({_OVS_CAP_PERMILLE} AS BIGINT),
               CAST(floor(n_max * 1000.0 / n_s) AS BIGINT))
           AS rate_permille
  FROM sizes CROSS JOIN mx),
gated AS (
  SELECT d.doc_id, d.source, {_OVS_GATE} AS gate, r.rate_permille,
         CAST(floor(r.rate_permille / 1000.0) AS BIGINT) AS base
  FROM documents d JOIN rates r USING (source))
SELECT * FROM (
  SELECT doc_id, source,
         unnest(range(1, base + CASE WHEN gate < rate_permille - base * 1000
                                     THEN 1 ELSE 0 END + 1)) AS copy_idx
  FROM gated)
ORDER BY doc_id, copy_idx
"""


# ------------------------------------------------------------------
# Leakage-safe train/valid/test split
# ------------------------------------------------------------------

_SPLIT_TRAIN_PERMILLE = 800   # [0, 800) → train
_SPLIT_VALID_PERMILLE = 900   # [800, 900) → valid; rest → test
_SPLIT_KEY = "concat('sp:', CAST(group_rep AS STRING))"
_SPLIT_GATE = f"({_md5_u6(_SPLIT_KEY)} % 1000)"


def split_assign(docs: DataFrame) -> DataFrame:
    """Frame-level core of leakage_safe_split: (doc_id, text, ...) ->
    (doc_id, group_rep, split). Shared by the catalog query and the
    training-export CLI so both assign identical splits."""
    d = docs.select("doc_id", F.md5("text").alias("dg"))
    rep = F.min("doc_id").over(Window.partitionBy("dg"))
    gated = d.select("doc_id", rep.alias("group_rep")).withColumn(
        "gate", F.expr(_SPLIT_GATE)
    )
    split = (
        F.when(F.col("gate") < _SPLIT_TRAIN_PERMILLE, F.lit("train"))
        .when(F.col("gate") < _SPLIT_VALID_PERMILLE, F.lit("valid"))
        .otherwise(F.lit("test"))
    )
    return gated.select("doc_id", "group_rep", split.alias("split"))


def leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/valid/test assignment that can never leak a duplicate
    across splits: the split hash is keyed on the document's exact-
    dup GROUP REPRESENTATIVE (min doc_id per md5(text) digest), not
    the document itself, so byte-identical copies land in the same
    split by construction — the eval-contamination failure mode of
    naive per-doc hashing (a test doc whose twin sits in train).

    80/10/10 deterministic permille gates over the same engine-
    portable md5 fold as the samplers; rerunning (or splitting a
    late-arriving shard) reproduces the identical assignment.

    100 TB shape: ONE digest-keyed shuffle — the group representative
    is a window min over md5(text), no groupBy+join round trip — and
    the gate itself is a row-local projection. Text never moves:
    only (doc_id, 32-byte digest) enters the exchange.
    """
    return split_assign(
        spread(_L(spark, sf_dir, "documents"), "doc_id")
    ).orderBy("doc_id")


LEAKAGE_SAFE_SPLIT_SQL = f"""
WITH grouped AS (
  SELECT doc_id,
         min(doc_id) OVER (PARTITION BY md5(text)) AS group_rep
  FROM documents),
gated AS (
  SELECT doc_id, group_rep, {_SPLIT_GATE} AS gate FROM grouped)
SELECT doc_id, group_rep,
       CASE WHEN gate < {_SPLIT_TRAIN_PERMILLE} THEN 'train'
            WHEN gate < {_SPLIT_VALID_PERMILLE} THEN 'valid'
            ELSE 'test' END AS split
FROM gated
ORDER BY doc_id
"""


# ------------------------------------------------------------------
# Token-budget sequence packing
# ------------------------------------------------------------------

_SHARD_TOKENS = 4096


def pack_tokens(toks: DataFrame, shard_tokens: int = _SHARD_TOKENS) -> DataFrame:
    """(doc_id, source, n_tokens) -> + cum_tokens, shard_id: the
    concat-and-chunk layout rule, shared by the pack_sequences
    catalog query and the composed ETL (pipeline.run_corpus_etl) so
    the packing semantics exist in exactly one place."""
    w = Window.partitionBy("source").orderBy("doc_id")
    cum = F.sum("n_tokens").over(w).cast("long")
    return toks.select(
        "doc_id",
        "source",
        "n_tokens",
        cum.alias("cum_tokens"),
        F.floor((cum - F.col("n_tokens")) / F.lit(shard_tokens)).cast("long").alias(
            "shard_id"
        ),
    )


def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk packing: within each source (ordered by
    doc_id), documents are laid end-to-end and cut into
    4096-token shards; a document's shard_id is the shard its first
    token lands in. One running-sum window per source partition —
    the layout step between a curated corpus and a trainer's
    dataloader. Docs longer than the budget simply span shards
    (chunk semantics), so no per-doc size cap is needed."""
    return pack_tokens(_with_tokens(spark, sf_dir))


PACK_SEQUENCES_SQL = f"""
WITH toks AS (
  SELECT doc_id, source, {_TOKENS_SQL} AS n_tokens FROM documents)
SELECT doc_id, source, n_tokens,
       CAST(sum(n_tokens) OVER w AS BIGINT) AS cum_tokens,
       CAST(floor((CAST(sum(n_tokens) OVER w AS BIGINT) - n_tokens)
                  / {_SHARD_TOKENS}.0) AS BIGINT) AS shard_id
FROM toks
WINDOW w AS (PARTITION BY source ORDER BY doc_id)
"""


# ------------------------------------------------------------------
# TF-IDF term ranking per source
# ------------------------------------------------------------------


def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 terms per source by TF-IDF: tf = term occurrences within
    the source, idf = ln(#sources / #sources containing the term).
    Upgrades top_terms_per_source's raw document-frequency ranking —
    stopwords shared by every source get idf 0 and drop out.

    Cross-engine determinism: idf is floor-rounded at 1e-6 (fround)
    BEFORE the tf multiply — ln differs by 1 ulp between libm and the
    JVM on some arguments, and tf * ln(...) can reach magnitudes
    where a 1e-6 grid sits at double-ulp distance; tf * rounded-idf
    is a single IEEE multiply, bit-identical on both engines."""
    d = spread(_L(spark, sf_dir, "documents"), "doc_id")
    tokens = d.select("source", F.explode(F.split("text", " ")).alias("word"))
    tf = tokens.groupBy("source", "word").agg(F.count("*").cast("long").alias("tf"))
    df_ = (
        tokens.select("source", "word")
        .distinct()
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("df_sources"))
    )
    n = d.agg(F.countDistinct("source").cast("long").alias("n_sources"))
    idf = fround(
        F.log(F.col("n_sources").cast("double") / F.col("df_sources")), 6
    )
    scored = (
        tf.join(df_, "word")
        .crossJoin(F.broadcast(n))
        .select(
            "source", "word", "tf", "df_sources", (F.col("tf") * idf).alias("score")
        )
    )
    w = Window.partitionBy("source").orderBy(
        F.desc("score"), F.asc("word")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 5)
    )


TFIDF_TOP_TERMS_SQL = """
WITH tokens AS (
  SELECT source, unnest(string_split(text, ' ')) AS word FROM documents),
tf AS (SELECT source, word, CAST(count(*) AS BIGINT) AS tf
       FROM tokens GROUP BY 1, 2),
docfreq AS (SELECT word, CAST(count(DISTINCT source) AS BIGINT) AS df_sources
            FROM tokens GROUP BY 1),
n AS (SELECT CAST(count(DISTINCT source) AS BIGINT) AS n_sources FROM documents),
scored AS (
  SELECT tf.source, tf.word, tf.tf, docfreq.df_sources,
         tf.tf * (floor(ln(CAST(n.n_sources AS DOUBLE) / docfreq.df_sources)
                        * 1000000.0 + 0.5) / 1000000.0) AS score
  FROM tf JOIN docfreq USING (word) CROSS JOIN n)
SELECT source, word, tf, df_sources, score, rank
FROM (SELECT *, row_number() OVER (PARTITION BY source
                                   ORDER BY score DESC, word ASC) AS rank
      FROM scored)
WHERE rank <= 5
"""


# ------------------------------------------------------------------
# BM25 term ranking per source
# ------------------------------------------------------------------

_BM25_K1 = 1.2
_BM25_B = 0.75


def bm25_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 terms per source by BM25 — TF-IDF with saturating term
    frequency and document-length normalization (Robertson/Sparck
    Jones probabilistic idf), treating each source stratum as one
    "document". The practical upgrade over tfidf_top_terms: a source
    twice as long no longer doubles every term's score, and repeated
    terms saturate instead of growing linearly.

    score = idf(w) * tf / (tf + k1 * (1 - b + b * len_s / avg_len)),
    idf(w) = ln((N - df + 0.5) / (df + 0.5) + 1)

    Shuffle budget: the same two vocabulary-scale exchanges as tfidf
    ((source, word) tf and word df, both map-side combined); source
    lengths reuse the tf frame (no third pass over the corpus); N and
    avg_len are one broadcast row.

    Cross-engine determinism: both ln-bearing factors are
    floor-rounded at 1e-6 before the final multiply (same discipline
    as tfidf_top_terms), and avg_len is one exact-integer division,
    never an engine-accumulated avg().
    """
    d = spread(_L(spark, sf_dir, "documents"), "doc_id")
    tokens = d.select("source", F.explode(F.split("text", " ")).alias("word"))
    tf = tokens.groupBy("source", "word").agg(F.count("*").cast("long").alias("tf"))
    slen = tf.groupBy("source").agg(F.sum("tf").cast("long").alias("len_s"))
    df_ = (
        tokens.select("source", "word")
        .distinct()
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("df_sources"))
    )
    glob = slen.agg(
        F.count("*").cast("long").alias("n_sources"),
        F.sum("len_s").cast("long").alias("total_len"),
    )
    idf = fround(
        F.log(
            (F.col("n_sources") - F.col("df_sources") + F.lit(0.5))
            / (F.col("df_sources") + F.lit(0.5))
            + F.lit(1.0)
        ),
        6,
    )
    avg_len = F.col("total_len").cast("double") / F.col("n_sources")
    tf_norm = fround(
        F.col("tf")
        / (
            F.col("tf")
            + F.lit(_BM25_K1)
            * (F.lit(1.0 - _BM25_B) + F.lit(_BM25_B) * F.col("len_s") / avg_len)
        ),
        6,
    )
    scored = (
        tf.join(df_, "word")
        .join(F.broadcast(slen), "source")
        .crossJoin(F.broadcast(glob))
        .select(
            "source",
            "word",
            "tf",
            "df_sources",
            fround(idf * tf_norm, 6).alias("score"),
        )
    )
    w = Window.partitionBy("source").orderBy(F.desc("score"), F.asc("word"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 5)
    )


BM25_TOP_TERMS_SQL = f"""
WITH tokens AS (
  SELECT source, unnest(string_split(text, ' ')) AS word FROM documents),
tf AS (SELECT source, word, CAST(count(*) AS BIGINT) AS tf
       FROM tokens GROUP BY 1, 2),
slen AS (SELECT source, CAST(sum(tf) AS BIGINT) AS len_s FROM tf GROUP BY 1),
docfreq AS (SELECT word, CAST(count(DISTINCT source) AS BIGINT) AS df_sources
            FROM tokens GROUP BY 1),
gstats AS (SELECT CAST(count(*) AS BIGINT) AS n_sources,
                CAST(sum(len_s) AS BIGINT) AS total_len FROM slen),
scored AS (
  SELECT tf.source, tf.word, tf.tf, docfreq.df_sources,
         floor((
           (floor(ln((gstats.n_sources - docfreq.df_sources + 0.5)
                     / (docfreq.df_sources + 0.5) + 1.0)
                  * 1000000.0 + 0.5) / 1000000.0)
           *
           (floor((tf.tf / (tf.tf + {_BM25_K1} * ({1.0 - _BM25_B} + {_BM25_B}
                    * slen.len_s / (CAST(gstats.total_len AS DOUBLE) / gstats.n_sources))))
                  * 1000000.0 + 0.5) / 1000000.0)
         ) * 1000000.0 + 0.5) / 1000000.0 AS score
  FROM tf JOIN docfreq USING (word) JOIN slen USING (source) CROSS JOIN gstats)
SELECT source, word, tf, df_sources, score, rank
FROM (SELECT *, row_number() OVER (PARTITION BY source
                                   ORDER BY score DESC, word ASC) AS rank
      FROM scored)
WHERE rank <= 5
"""


# ------------------------------------------------------------------
# Benchmark decontamination (n-gram overlap)
# ------------------------------------------------------------------

# Word n-gram width for overlap detection. Production pipelines use
# 8-13-gram windows; the synthetic docs average ~55 words of a tiny
# vocabulary, so 4-grams give the equivalent specificity here.
_DECONTAM_N = 4

# Deterministic "benchmark suite" slice: every 40th document plays
# the role of the held-out eval set the training corpus must not
# contain verbatim spans of.
_BENCH_MOD = 40


def decontaminate_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flag training documents that share any word 4-gram with the
    benchmark slice — the contamination check an LLM corpus runs
    against its eval suites before training.

    Plan shape (100 TB): the benchmark gram set is tiny by
    construction (eval suites are MBs against a TB-scale corpus), so
    it BROADCASTS; the training side generates grams inside the scan
    stage projection and never shuffles until the final
    groupBy(doc_id), which partial-aggregates map-side. At real scale
    the join key would be xxhash64(gram) to keep the exchange narrow;
    here it stays the gram string so the DuckDB oracle can join on
    identical values.
    """
    d = spread(_L(spark, sf_dir, "documents"), "doc_id")
    toks = d.select("doc_id", F.split("text", " ").alias("w")).filter(
        F.size("w") >= _DECONTAM_N
    )
    grams = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, size(w) - {_DECONTAM_N - 1}), "
                f"i -> concat_ws(' ', slice(w, i, {_DECONTAM_N})))"
            )
        ).alias("g"),
    ).distinct()
    bench = (
        grams.filter(F.col("doc_id") % _BENCH_MOD == 0)
        .select("g", F.col("doc_id").alias("bench_id"))
    )
    train = grams.filter(F.col("doc_id") % _BENCH_MOD != 0)
    return (
        train.join(F.broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("g").cast("long").alias("n_shared"),
            F.countDistinct("bench_id").cast("long").alias("n_bench_docs"),
        )
    )


DECONTAMINATE_NGRAM_OVERLAP_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
  WHERE len(string_split(text, ' ')) >= {_DECONTAM_N}),
grams AS (
  SELECT DISTINCT doc_id, array_to_string(w[i:i+{_DECONTAM_N - 1}], ' ') AS g
  FROM toks, unnest(range(1, len(w) - {_DECONTAM_N - 2})) AS t(i)),
bench AS (
  SELECT g, doc_id AS bench_id FROM grams WHERE doc_id % {_BENCH_MOD} = 0)
SELECT tr.doc_id,
       CAST(count(DISTINCT tr.g) AS BIGINT) AS n_shared,
       CAST(count(DISTINCT bench.bench_id) AS BIGINT) AS n_bench_docs
FROM grams tr JOIN bench USING (g)
WHERE tr.doc_id % {_BENCH_MOD} <> 0
GROUP BY 1
"""


# ------------------------------------------------------------------
# Within-document repetition stats (Gopher-style repetition signal)
# ------------------------------------------------------------------

_REP_N = 3  # word n-gram width for the repetition signal


def repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repeated-n-gram stats — the intra-doc repetition
    signal corpus-quality rules (Rae et al. 2021 "Gopher" §A1.1; also
    C4's heuristics) threshold on: boilerplate and looping generations
    repeat the same short spans.

    Plan shape (100 TB): the gram multiset of one document is
    row-local, so everything here is a per-row JVM projection — no
    explode, no shuffle, nothing leaves the scan stage. The
    most-repeated-gram count folds over the distinct grams with a
    nested higher-order filter (O(unique x total) string compares per
    row, bounded by document length).
    """
    d = spread(_L(spark, sf_dir, "documents"), "doc_id")
    toks = d.select("doc_id", F.split("text", " ").alias("w")).filter(
        F.size("w") >= _REP_N
    )
    grams = toks.select(
        "doc_id",
        F.expr(
            f"transform(sequence(1, size(w) - {_REP_N - 1}), "
            f"i -> concat_ws(' ', slice(w, i, {_REP_N})))"
        ).alias("grams"),
    )
    n_grams = F.size("grams").cast("long")
    n_unique = F.size(F.array_distinct("grams")).cast("long")
    return grams.select(
        "doc_id",
        n_grams.alias("n_grams"),
        n_unique.alias("n_unique"),
        fround(F.lit(1.0) - n_unique / n_grams.cast("double"), 6).alias("dup_ratio"),
        F.expr(
            "aggregate(array_distinct(grams), 0, "
            "(acc, x) -> greatest(acc, size(filter(grams, y -> y = x))))"
        )
        .cast("long")
        .alias("max_gram_rep"),
    )


REPETITION_STATS_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
  WHERE len(string_split(text, ' ')) >= {_REP_N}),
g AS (
  SELECT doc_id,
         list_transform(range(1, len(w) - {_REP_N - 2}),
                        i -> array_to_string(array_slice(w, i, i + {_REP_N - 1}), ' ')) AS grams
  FROM toks)
SELECT doc_id,
       CAST(len(grams) AS BIGINT) AS n_grams,
       CAST(len(list_distinct(grams)) AS BIGINT) AS n_unique,
       floor((1.0 - len(list_distinct(grams)) / CAST(len(grams) AS DOUBLE))
             * 1000000.0 + 0.5) / 1000000.0 AS dup_ratio,
       CAST(list_aggregate(
         list_transform(list_distinct(grams),
                        x -> len(list_filter(grams, y -> y = x))), 'max')
         AS BIGINT) AS max_gram_rep
FROM g
"""


# ------------------------------------------------------------------
# Quality-filter verdicts (threshold rules with reasons)
# ------------------------------------------------------------------

# same six-word stopword list as plans.llm.text_quality_stats
_QUALITY_STOPWORDS = ("the", "a", "of", "and", "to", "in")

# Gopher/C4-style keep rules, thresholds fitted to the synthetic
# corpus so each discriminating rule actually fires (~75% keep):
#   min_words       n_words >= 20
#   max_words       n_words <= 90
#   stopword_floor  stopword_ratio >= 0.02
#   word_len_band   3 <= mean_word_len <= 7
# All ratios are integer-over-integer double divisions, so the
# boundary comparisons are bit-identical across engines.


def with_quality_verdicts(docs: DataFrame) -> DataFrame:
    """Append `n_words`, `keep`, `fail_reasons` to a documents frame —
    the DataFrame-level quality gate shared by the catalog query and
    the composed corpus ETL (pipeline.run_corpus_etl). Pure row-local
    projection; the verdict boolean lets the survivor filter push into
    the same scan stage."""
    n_chars = F.length("text").cast("long")
    n_words = F.size(F.split("text", " ")).cast("long")
    stop_list = ", ".join(f"'{w}'" for w in _QUALITY_STOPWORDS)
    stop_ratio = (
        F.expr(f"size(filter(split(text, ' '), w -> w IN ({stop_list})))").cast("double")
        / n_words.cast("double")
    )
    mwl = (n_chars - (n_words - 1)) / n_words.cast("double")
    rules = [
        ("min_words", n_words >= 20),
        ("max_words", n_words <= 90),
        ("stopword_floor", stop_ratio >= 0.02),
        ("word_len_band", (mwl >= 3.0) & (mwl <= 7.0)),
    ]
    # NULL text makes every rule NULL; without an explicit gate such a
    # row would pass NEITHER keep-filter nor its negation and vanish
    # from both ledgers of the composed ETL — force it to a drop with
    # its own reason instead
    null_text = F.col("text").isNull()
    fails = F.concat_ws(
        ",",
        F.when(null_text, F.lit("null_text")),
        *[F.when(~ok, F.lit(rname)) for rname, ok in rules],
    )
    keep = ~null_text
    for _, ok in rules:
        keep = keep & ok
    return docs.select(
        "*",
        n_words.alias("n_words"),
        F.coalesce(keep, F.lit(False)).alias("keep"),
        fails.alias("fail_reasons"),
    )


def quality_filter_verdicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep/drop verdict per document with the failed rule names —
    the auditable form of a corpus quality gate (a curation run wants
    WHY a document dropped, not just the survivor set).

    Plan shape (100 TB): per-row scan-stage projection, zero
    shuffles (see with_quality_verdicts).
    """
    d = spread(_L(spark, sf_dir, "documents"), "doc_id")
    return with_quality_verdicts(d).select("doc_id", "n_words", "keep", "fail_reasons")


_Q_STOP_SQL = ", ".join(f"'{w}'" for w in _QUALITY_STOPWORDS)
QUALITY_FILTER_VERDICTS_SQL = f"""
WITH s AS (
  SELECT doc_id,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
         len(list_filter(string_split(text, ' '),
             w -> w IN ({_Q_STOP_SQL}))) / CAST(len(string_split(text, ' ')) AS DOUBLE)
           AS stop_ratio
  FROM documents),
r AS (
  SELECT doc_id, n_words,
         n_words IS NULL AS null_text,
         n_words >= 20 AS ok_min,
         n_words <= 90 AS ok_max,
         stop_ratio >= 0.02 AS ok_stop,
         ((n_chars - (n_words - 1)) / CAST(n_words AS DOUBLE)) BETWEEN 3.0 AND 7.0
           AS ok_band
  FROM s)
SELECT doc_id, n_words,
       coalesce(NOT null_text AND ok_min AND ok_max AND ok_stop AND ok_band,
                FALSE) AS keep,
       concat_ws(',',
         CASE WHEN null_text THEN 'null_text' END,
         CASE WHEN NOT ok_min THEN 'min_words' END,
         CASE WHEN NOT ok_max THEN 'max_words' END,
         CASE WHEN NOT ok_stop THEN 'stopword_floor' END,
         CASE WHEN NOT ok_band THEN 'word_len_band' END) AS fail_reasons
FROM r
"""


# ------------------------------------------------------------------
# Paragraph-level exact dedup (C4/RefinedWeb-style)
# ------------------------------------------------------------------

_PARA_WORDS = 20  # chunk width in words; real corpora split on \n\n —
                  # the synthetic docs are single-line word streams,
                  # so a fixed-width word chunker stands in


def paragraph_chunks(docs: DataFrame, carry: tuple[str, ...] = ()) -> DataFrame:
    """(doc_id, text) -> (doc_id, *carry, chunk_idx, chunk): the
    fixed-width word chunker as a row-local scan-stage explode.
    NULL-text docs produce no chunks (paragraph_rollup restores their
    verdict row); `carry` columns ride along so callers don't need a
    join-back."""
    w = docs.filter(F.col("text").isNotNull()).select(
        "doc_id", *carry, F.split("text", " ").alias("ws")
    )
    return w.select(
        "doc_id",
        *carry,
        F.posexplode(
            F.expr(
                f"transform(sequence(0, int((size(ws) - 1) / {_PARA_WORDS})), "
                f"i -> array_join(slice(ws, i * {_PARA_WORDS} + 1, {_PARA_WORDS}), ' '))"
            )
        ).alias("chunk_idx", "chunk"),
    )


def paragraph_rollup(docs: DataFrame, flagged: DataFrame) -> DataFrame:
    """flagged: (doc_id, chunk_idx, chunk, is_dup) -> one verdict row
    per input document: (doc_id, n_chunks, n_dup_chunks, kept_hash),
    kept_hash = md5 of the surviving chunks rejoined in order (NULL
    when nothing survives or the text was NULL)."""
    agg = flagged.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_chunks"),
        F.sum(F.when(F.col("is_dup"), 1).otherwise(0))
        .cast("long")
        .alias("n_dup_chunks"),
        F.array_sort(
            F.collect_list(
                F.when(~F.col("is_dup"), F.struct("chunk_idx", "chunk"))
            )
        ).alias("kept"),
    )
    kept_hash = F.when(F.size("kept") > 0, F.md5(
        F.array_join(F.expr("transform(kept, k -> k.chunk)"), " ")
    ))
    return (
        docs.select("doc_id")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_chunks", F.lit(0)).cast("long").alias("n_chunks"),
            F.coalesce("n_dup_chunks", F.lit(0)).cast("long").alias("n_dup_chunks"),
            kept_hash.alias("kept_hash"),
        )
    )


def paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document exact dedup: chunk every document, keep only the
    corpus-wide FIRST occurrence of each chunk (min doc_id, then min
    chunk index), and report per document how much of it survived —
    the C4/RefinedWeb trick that removes boilerplate repeated across
    pages without dropping whole documents.

    100 TB shape: chunking is a row-local explode inside the scan
    stage; first-occurrence marking shuffles ONCE on the chunk's md5
    digest (never the chunk body — the exchange key is 32 bytes per
    chunk at any corpus size); the per-doc rollup shuffles once on
    doc_id. No self-join, no pair space at all — this is the cheapest
    dedup family in the catalog and the first pass a real pipeline
    runs before the fuzzy ones. The streaming twin
    (streaming/jobs.py::stream_paragraph_dedup) runs the same chunker
    and rollup against a persisted digest ledger.
    """
    d = spread(_L(spark, sf_dir, "documents"), "doc_id").select("doc_id", "text")
    chunks = paragraph_chunks(d)
    win = Window.partitionBy(F.md5("chunk")).orderBy("doc_id", "chunk_idx")
    flagged = chunks.withColumn("rn", F.row_number().over(win)).withColumn(
        "is_dup", F.col("rn") > 1
    )
    return paragraph_rollup(d, flagged)


PARAGRAPH_DEDUP_SQL = f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws
  FROM documents WHERE text IS NOT NULL),
ch AS (
  SELECT doc_id, CAST(t.i AS BIGINT) AS chunk_idx,
         array_to_string(
           ws[(CAST(t.i AS BIGINT) * {_PARA_WORDS} + 1):
              (CAST(t.i AS BIGINT) * {_PARA_WORDS} + {_PARA_WORDS})], ' ') AS chunk
  FROM w, LATERAL unnest(range(0, (len(ws) - 1) // {_PARA_WORDS} + 1)) AS t(i)),
marked AS (
  SELECT doc_id, chunk_idx, chunk,
         row_number() OVER (PARTITION BY md5(chunk)
                            ORDER BY doc_id, chunk_idx) AS rn
  FROM ch),
agg AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_chunks,
         CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
         md5(string_agg(CASE WHEN rn = 1 THEN chunk END, ' '
                        ORDER BY chunk_idx)) AS kept_hash
  FROM marked GROUP BY doc_id)
SELECT d.doc_id,
       coalesce(a.n_chunks, 0) AS n_chunks,
       coalesce(a.n_dup_chunks, 0) AS n_dup_chunks,
       a.kept_hash
FROM documents d LEFT JOIN agg a USING (doc_id)
"""


# ------------------------------------------------------------------
# PII detection + redaction (row-local scrub pass)
# ------------------------------------------------------------------

# Java-regex/RE2-compatible subset: no backrefs, no lookaround, so the
# same pattern strings run in Spark (Java) and DuckDB (RE2)
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_SSN = r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"
_PII_PHONE = r"\b\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b"
_PII_IP = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"

# applied in this order: emails first (their host part would otherwise
# feed the IP pattern), then the more specific numeric shapes
_PII_RULES: tuple[tuple[str, str], ...] = (
    (_PII_EMAIL, "<EMAIL>"),
    (_PII_SSN, "<SSN>"),
    (_PII_PHONE, "<PHONE>"),
    (_PII_IP, "<IP>"),
)


def pii_redact_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document PII scrub: count email/SSN/phone/IPv4 hits and
    emit the md5 of the fully redacted text plus a changed flag —
    the privacy pass every training-data pipeline runs before
    packing. Counts are per-pattern on the ORIGINAL text (a token
    consumed by an earlier rule can still be counted by a later one;
    the redaction chain itself is sequential so replacements never
    cascade).

    The synthetic corpus contains no PII, so at the catalog level
    this verifies the full chain produces identical hashes and zero
    counts across engines; detection semantics on PII-bearing text
    are pinned by tests/test_corpus_properties.py fixtures.

    100 TB shape: pure per-row projection in the scan stage — zero
    shuffles, zero joins; the regex work is JVM-side codegen, no UDF.
    """
    d = spread(_L(spark, sf_dir, "documents"), "doc_id").select("doc_id", "text")
    red = F.col("text")
    for pat, repl in _PII_RULES:
        red = F.regexp_replace(red, pat, repl)
    counts = {
        "n_emails": _PII_EMAIL,
        "n_ssns": _PII_SSN,
        "n_phones": _PII_PHONE,
        "n_ips": _PII_IP,
    }
    return d.select(
        "doc_id",
        *[
            F.regexp_count("text", F.lit(p)).cast("long").alias(name)
            for name, p in counts.items()
        ],
        F.when(F.col("text").isNotNull(), red != F.col("text")).alias("changed"),
        F.md5(red).alias("redacted_hash"),
    )


_PII_RED_SQL = "text"
for _pat, _repl in _PII_RULES:
    _PII_RED_SQL = f"regexp_replace({_PII_RED_SQL}, '{_pat}', '{_repl}', 'g')"

PII_REDACT_STATS_SQL = f"""
WITH r AS (
  SELECT doc_id, text, {_PII_RED_SQL} AS redacted FROM documents)
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{_PII_EMAIL}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(text, '{_PII_SSN}')) AS BIGINT) AS n_ssns,
       CAST(len(regexp_extract_all(text, '{_PII_PHONE}')) AS BIGINT) AS n_phones,
       CAST(len(regexp_extract_all(text, '{_PII_IP}')) AS BIGINT) AS n_ips,
       CASE WHEN text IS NULL THEN NULL ELSE redacted <> text END AS changed,
       md5(redacted) AS redacted_hash
FROM r
"""


# ------------------------------------------------------------------
# OOV rate vs the corpus's own head vocabulary
# ------------------------------------------------------------------

_OOV_TOP_K = 1000


def oov_rate_top1k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document out-of-vocabulary rate against the corpus's own
    top-1000 words — the tokenizer-free cousin of a perplexity
    filter (documents full of rare tokens are boilerplate, code, or
    noise). Integer-only arithmetic end-to-end: the head vocabulary
    ranks by (count DESC, word ASC) — a total order — and the rate
    is a small-denominator rational, so no transcendental or
    engine-ordered float summation can diverge (the JL lesson).

    100 TB shape: vocabulary counting is a map-side-combined shuffle
    at vocabulary scale; the top-K set is KBs and broadcasts; the
    per-doc membership check and rollup shuffle once on doc_id.
    """
    d = spread(_L(spark, sf_dir, "documents"), "doc_id").select("doc_id", "text")
    tokens = d.filter(F.col("text").isNotNull()).select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    )
    wvocab = Window.orderBy(F.desc("cnt"), F.asc("word"))
    top = (
        tokens.groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .withColumn("rk", F.row_number().over(wvocab))
        .filter(F.col("rk") <= _OOV_TOP_K)
        .select("word", F.lit(True).alias("in_vocab"))
    )
    rate = F.col("n_oov") / F.col("n_words").cast("double")
    return (
        tokens.join(F.broadcast(top), "word", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_oov"),
        )
        .select("doc_id", "n_words", "n_oov", fround(rate, 6).alias("oov_rate"))
    )


OOV_RATE_TOP1K_SQL = f"""
WITH tokens AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word
  FROM documents WHERE text IS NOT NULL),
vocab AS (
  SELECT word FROM (
    SELECT word, row_number() OVER (ORDER BY count(*) DESC, word ASC) AS rk
    FROM tokens GROUP BY word)
  WHERE rk <= {_OOV_TOP_K}),
agg AS (
  SELECT t.doc_id,
         CAST(count(*) AS BIGINT) AS n_words,
         CAST(sum(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_oov
  FROM tokens t LEFT JOIN vocab v ON t.word = v.word
  GROUP BY t.doc_id)
SELECT doc_id, n_words, n_oov,
       floor((n_oov / CAST(n_words AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0
         AS oov_rate
FROM agg
"""


# ------------------------------------------------------------------
# Corpus-frequency boilerplate removal (RefinedWeb repeated-line rule)
# ------------------------------------------------------------------

_BOILER_MIN_DOCS = 2  # a chunk in >= this many DISTINCT docs is boilerplate


def boilerplate_chunk_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Remove chunks whose cross-document frequency marks them as
    template boilerplate (nav bars, license headers, cookie banners)
    — the RefinedWeb repeated-line rule. Distinct from
    paragraph_dedup, which KEEPS the first occurrence of each
    repeated chunk: here every occurrence of a chunk seen in
    >= _BOILER_MIN_DOCS distinct documents is dropped, including the
    first (a license header is noise in all of its hosts, not just
    the copies). Frequency counts distinct documents, so a doc
    repeating its own chunk is repetition (repetition_stats' job),
    not boilerplate.

    Output per input document: (doc_id, n_chunks, n_boiler_chunks,
    kept_hash) with kept_hash = md5 of the surviving chunks rejoined
    in order (NULL when nothing survives or the text was NULL).

    100 TB shape: chunking is a row-local scan-stage explode; the
    digest-frequency aggregate shuffles 32-byte digests with
    map-side combine; the surviving boilerplate set is tiny
    (high-frequency chunks are by definition few) and broadcasts
    back onto the chunk stream; the per-doc rollup shuffles once on
    doc_id. No self-join, no pair space.
    """
    d = spread(_L(spark, sf_dir, "documents"), "doc_id").select("doc_id", "text")
    chunks = paragraph_chunks(d).withColumn("dg", F.md5("chunk"))
    boiler = (
        chunks.groupBy("dg")
        .agg(F.count_distinct("doc_id").alias("df"))
        .filter(F.col("df") >= _BOILER_MIN_DOCS)
        .select("dg")
    )
    flagged = (
        chunks.join(F.broadcast(boiler.withColumn("hit", F.lit(True))), "dg", "left")
        .withColumn("is_dup", F.col("hit").isNotNull())
    )
    return paragraph_rollup(d, flagged).withColumnRenamed(
        "n_dup_chunks", "n_boiler_chunks"
    )


BOILERPLATE_CHUNK_REMOVAL_SQL = f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws
  FROM documents WHERE text IS NOT NULL),
ch AS (
  SELECT doc_id, CAST(t.i AS BIGINT) AS chunk_idx,
         array_to_string(
           ws[(CAST(t.i AS BIGINT) * {_PARA_WORDS} + 1):
              (CAST(t.i AS BIGINT) * {_PARA_WORDS} + {_PARA_WORDS})], ' ') AS chunk
  FROM w, LATERAL unnest(range(0, (len(ws) - 1) // {_PARA_WORDS} + 1)) AS t(i)),
boiler AS (
  SELECT md5(chunk) AS dg FROM ch
  GROUP BY md5(chunk)
  HAVING count(DISTINCT doc_id) >= {_BOILER_MIN_DOCS}),
flagged AS (
  SELECT c.doc_id, c.chunk_idx, c.chunk, b.dg IS NOT NULL AS is_dup
  FROM ch c LEFT JOIN boiler b ON md5(c.chunk) = b.dg),
agg AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_chunks,
         CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT)
           AS n_boiler_chunks,
         md5(string_agg(CASE WHEN NOT is_dup THEN chunk END, ' '
                        ORDER BY chunk_idx)) AS kept_hash
  FROM flagged GROUP BY doc_id)
SELECT d.doc_id,
       coalesce(a.n_chunks, 0) AS n_chunks,
       coalesce(a.n_boiler_chunks, 0) AS n_boiler_chunks,
       a.kept_hash
FROM documents d LEFT JOIN agg a USING (doc_id)
"""


# ------------------------------------------------------------------
# Corpus composition report (the dataset card)
# ------------------------------------------------------------------

_COMP_BUCKET_CHARS = 200  # length-bucket width in characters


def corpus_composition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-card composition report: documents, characters, and
    whitespace words per (source, lang, length-bucket) cell, plus
    each cell's share of the corpus — the first table a dataset
    audit prints and the input to mixture re-weighting decisions.

    100 TB shape: one map-side-combined groupBy at cell scale (a few
    hundred rows regardless of corpus size); the global total joins
    back as a broadcast single-row aggregate (the same shape the
    TF-IDF idf join uses). The share is a small-denominator rational
    rounded on the fixed 1e-6 grid, so there is no float
    summation-order hazard for the oracle to diverge on.
    """
    d = spread(_L(spark, sf_dir, "documents"), "doc_id")
    words = (
        F.when(F.col("text").isNotNull(), F.size(F.split("text", " ")))
        .otherwise(0)
        .cast("long")
    )
    cells = (
        d.select(
            "source",
            "lang",
            F.floor(F.col("n_chars") / F.lit(float(_COMP_BUCKET_CHARS)))
            .cast("long")
            .alias("len_bucket"),
            words.alias("nw"),
            "n_chars",
        )
        .groupBy("source", "lang", "len_bucket")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.sum("nw").cast("long").alias("total_words"),
        )
    )
    total = d.groupBy().agg(F.count("*").alias("corpus_docs"))
    share = F.col("n_docs") / F.col("corpus_docs").cast("double")
    return cells.crossJoin(F.broadcast(total)).select(
        "source",
        "lang",
        "len_bucket",
        "n_docs",
        "total_chars",
        "total_words",
        fround(share, 6).alias("doc_share"),
    )


CORPUS_COMPOSITION_SQL = f"""
WITH cells AS (
  SELECT source, lang,
         CAST(floor(n_chars / {float(_COMP_BUCKET_CHARS)}) AS BIGINT)
           AS len_bucket,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_chars) AS BIGINT) AS total_chars,
         CAST(sum(CASE WHEN text IS NULL THEN 0
                       ELSE len(string_split(text, ' ')) END) AS BIGINT)
           AS total_words
  FROM documents GROUP BY 1, 2, 3),
total AS (SELECT count(*) AS corpus_docs FROM documents)
SELECT source, lang, len_bucket, n_docs, total_chars, total_words,
       floor((n_docs / CAST(corpus_docs AS DOUBLE)) * 1000000.0 + 0.5)
         / 1000000.0 AS doc_share
FROM cells, total
"""


# ------------------------------------------------------------------
# Unigram-LM log-probability quality score (CCNet-style)
# ------------------------------------------------------------------


def unigram_logprob_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean unigram log-probability under a
    Laplace-smoothed LM fit on the held-out half of the corpus (even
    doc_ids) — the tokenizer-free stand-in for the CCNet/KenLM
    perplexity filter: documents whose words are systematically rare
    under the reference distribution score low and get routed to the
    tail quality bucket.

    Determinism (the TWA/JL lesson): each word's log-prob is
    quantized to integer micro-nats (floor(ln(p)*1e6+0.5) as BIGINT)
    BEFORE aggregation, so the per-doc sum is exact integer
    arithmetic — no engine-defined float summation order anywhere.
    Only the single per-word ln() carries float semantics, and it is
    computed from identical rationals on both engines.

    100 TB shape: LM counting is a map-side-combined word shuffle;
    the (N, V) scalars and the vocabulary broadcast (a real corpus
    caps the vocab at top-K exactly like oov_rate_top1k — documented
    swap); scoring joins words against the broadcast LM and rolls up
    once on doc_id.

    r14 (guide §2.4, the hll_cumulative pin precedent): the train
    word-count frame is pinned (vocab-bounded — top-K-capped at real
    scale) and scal derives FROM it (n_train = Σc, v_train = row
    count — identical longs by construction), so the corpus explode
    runs ONCE for the model instead of three times (scal, lm, and
    oov each re-ran it: 4 document scans -> 2 in the plan,
    plans/r14/unigram_logprob_score_{before,after}.txt). Interleaved
    A/B min-of-6 at sf0.1: 0.78x min / 0.77x median, rows identical.
    """
    d = spread(_L(spark, sf_dir, "documents"), "doc_id").select("doc_id", "text")
    tokens = d.filter(F.col("text").isNotNull()).select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    )
    train = tokens.filter(F.col("doc_id") % 2 == 0)
    cn = train.groupBy("word").agg(F.count("*").alias("c")).localCheckpoint()
    scal = cn.agg(
        F.sum("c").alias("n_train"),
        F.count("*").alias("v_train"),
    )
    lm = (
        cn.crossJoin(F.broadcast(scal))
        .select(
            "word",
            F.floor(
                F.log(
                    (F.col("c") + 1).cast("double")
                    / (F.col("n_train") + F.col("v_train")).cast("double")
                )
                * 1e6
                + F.lit(0.5)
            )
            .cast("long")
            .alias("lp_int"),
        )
    )
    oov = scal.select(
        F.floor(
            F.log(
                F.lit(1.0) / (F.col("n_train") + F.col("v_train")).cast("double")
            )
            * 1e6
            + F.lit(0.5)
        )
        .cast("long")
        .alias("lp_oov")
    )
    agg = (
        tokens.join(F.broadcast(lm), "word", "left")
        .crossJoin(F.broadcast(oov))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.sum(F.when(F.col("lp_int").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_oov"),
            F.sum(F.coalesce("lp_int", "lp_oov")).cast("long").alias("sum_lp"),
        )
    )
    return agg.select(
        "doc_id",
        "n_words",
        "n_oov",
        fround(F.col("sum_lp") / F.lit(1e6) / F.col("n_words").cast("double"), 6).alias(
            "avg_logprob"
        ),
    )


UNIGRAM_LOGPROB_SCORE_SQL = """
WITH tokens AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word
  FROM documents WHERE text IS NOT NULL),
train AS (SELECT * FROM tokens WHERE doc_id % 2 = 0),
scal AS (
  SELECT count(*) AS n_train, count(DISTINCT word) AS v_train FROM train),
lm AS (
  SELECT word,
         CAST(floor(ln(CAST(c + 1 AS DOUBLE)
                       / CAST(n_train + v_train AS DOUBLE)) * 1000000.0 + 0.5)
              AS BIGINT) AS lp_int
  FROM (SELECT word, count(*) AS c FROM train GROUP BY 1), scal),
oov AS (
  SELECT CAST(floor(ln(1.0 / CAST(n_train + v_train AS DOUBLE))
                    * 1000000.0 + 0.5) AS BIGINT) AS lp_oov
  FROM scal),
agg AS (
  SELECT t.doc_id,
         CAST(count(*) AS BIGINT) AS n_words,
         CAST(sum(CASE WHEN l.lp_int IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_oov,
         CAST(sum(coalesce(l.lp_int, o.lp_oov)) AS BIGINT) AS sum_lp
  FROM tokens t LEFT JOIN lm l ON t.word = l.word, oov o
  GROUP BY t.doc_id)
SELECT doc_id, n_words, n_oov,
       floor((sum_lp / 1000000.0 / CAST(n_words AS DOUBLE)) * 1000000.0 + 0.5)
         / 1000000.0 AS avg_logprob
FROM agg
"""


# ------------------------------------------------------------------
# DSIR importance weights (hashed n-gram domain selection)
# ------------------------------------------------------------------

# hashed n-gram buckets. Xie et al. 2023 ("Data Selection for
# Language Models via Importance Resampling", NeurIPS) use 10^4;
# the synthetic corpus' vocabulary saturates far below that, and
# 1024 keeps the bucket frame comfortably broadcastable while still
# exercising real hash collisions at fixture scale.
_DSIR_B = 1024


def _dsir_gram_buckets(d: DataFrame) -> DataFrame:
    """(doc_id, source, b): one row per unigram+bigram OCCURRENCE,
    folded to its md5 bucket in [0, _DSIR_B). The words array is
    materialized first (the minhash lesson: element_at over a split
    inside a lambda re-splits per element)."""
    words = d.filter(F.col("text").isNotNull()).select(
        "doc_id", "source", F.split("text", " ").alias("ws")
    )
    grams = words.select(
        "doc_id",
        "source",
        F.explode(
            F.expr(
                "concat(ws, CASE WHEN size(ws) >= 2 THEN "
                "transform(sequence(1, size(ws) - 1), "
                "i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1))) "
                "ELSE CAST(array() AS ARRAY<STRING>) END)"
            )
        ).alias("g"),
    )
    return grams.select(
        "doc_id",
        "source",
        F.expr(f"({_md5_u6('g')} % {_DSIR_B})").alias("b"),
    )


def dsir_importance_weights(
    spark: SparkSession, sf_dir: str, postings: str | None = None
) -> DataFrame:
    """Per-document DSIR importance log-weight — hashed n-gram
    importance resampling (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): fit two
    bag-of-hashed-ngram multinomials — p on the TARGET domain, q on
    the whole raw pool — and score every document with
    log w(x) = sum over x's gram occurrences of log(p[b]/q[b]).
    Selection then resamples by weight; this query materializes the
    per-doc scores a curator thresholds or samples against. The
    target domain is the lexicographically first source (a small,
    deterministic stratum — DSIR's regime of a small high-quality
    target against a large raw pool).

    Determinism (the unigram_logprob_score pattern): each bucket's
    log-ratio is quantized to integer micro-nats BEFORE any per-doc
    aggregation, so document sums are exact integer arithmetic and
    the output is all-integer (no float summation order anywhere);
    only the two ln() calls per bucket carry float semantics, and
    they are computed from identical rationals on both engines.

    100 TB shape: one tokenize pass feeds a lazily localCheckpointed
    occurrence-postings frame (doc_id, source, 24-bit md5 bucket —
    gram text never persists and never shuffles); the bucket counts
    map-side-combine to <= 1024 rows and broadcast back; the only
    corpus-scale shuffle is the per-doc rollup on narrow integer
    rows. Both model fits and the scoring pass are ONE job over ONE
    corpus scan — the paper's own n-gram pipeline, re-expressed as
    two KB-scale broadcast frames around a posting aggregation.
    Consumed by release discipline: the checkpoint pins free on plan
    completion (checkpoints.scoped_checkpoints consumers).

    MEMORY KNOB (r12 judge advisory): the postings pin is the one
    corpus-SCALE pin in the catalog (~2 GB at 500k docs), and it
    coexists with the per-doc rollup's concurrent hash-aggs — the
    DSIRSOAK_r12 law run needed >8 g heap at 500k docs under the
    default. ``postings`` (or env SPARK_GRAFT_DSIR_POSTINGS) picks
    the trade-off, all three modes byte-identical in output
    (tests/test_dsir_ledger.py pins the equality):

    * ``checkpoint`` (default) — localCheckpoint, memory+disk pin;
      fastest, highest heap floor.
    * ``disk`` — localCheckpoint at DISK_ONLY: same one-tokenize
      plan and release discipline, but the pinned partitions never
      occupy storage heap, so the rollup's execution memory gets the
      whole pool (the 8 g escape hatch; A/B cost in SCALING.md).
    * ``recompute`` — no pin at all: the tokenize stage runs twice
      (model fit + scoring). Zero pin; right when a second corpus
      scan is cheaper than the postings footprint (small corpora or
      heavily filtered scans).
    """
    import os

    mode = postings or os.environ.get(
        "SPARK_GRAFT_DSIR_POSTINGS", "checkpoint"
    )
    if mode not in ("checkpoint", "disk", "recompute"):
        raise ValueError(
            f"dsir_importance_weights: unknown postings mode {mode!r} "
            "(expected 'checkpoint', 'disk', or 'recompute')"
        )
    from chess_pipeline_spark.checkpoints import pin_corpus_frame

    d = spread(_L(spark, sf_dir, "documents"), "doc_id").select(
        "doc_id", "source", "text"
    )
    # r14 (guide §2.4): tgt comes from the RAW scan, not the spread
    # frame — the 1-row min(source) broadcast was re-built from the
    # full spread repartition in every crossJoin site (3 corpus-row
    # shuffles per run, each a 2-Exchange SortAggregate over
    # (doc_id, source)); the raw-scan form prunes to the one column
    # and aggregates at the scan. Values identical: same rows, same
    # min.
    tgt = _L(spark, sf_dir, "documents").agg(F.min("source").alias("t"))
    posts = pin_corpus_frame(_dsir_gram_buckets(d), mode=mode)
    counts = (
        posts.crossJoin(F.broadcast(tgt))
        .groupBy("b")
        .agg(
            F.sum(F.when(F.col("source") == F.col("t"), 1).otherwise(0))
            .cast("long")
            .alias("cp"),
            F.count("*").cast("long").alias("cq"),
        )
    )
    # r14 (guide §2.4): (np, nq) fold into a GLOBAL window over the
    # <=1024-row counts frame instead of a crossJoin(broadcast(agg)) —
    # the agg form embedded the whole counts subtree a second time
    # (its bucket exchange and posts pass re-ran per execution). The
    # window is one single-partition exchange of the KB-scale frame;
    # the sums are the identical integers, so every downstream double
    # and floor is unchanged. Plan 30 -> 16 Exchange with the tgt fix;
    # interleaved A/B min-of-6 at sf0.1: 0.73x min / 0.75x median.
    _w_all = Window.partitionBy()
    np_ = F.sum("cp").over(_w_all).cast("long")
    nq_ = F.sum("cq").over(_w_all).cast("long")
    lr = counts.select(
        "b",
        F.floor(
            (
                F.log(
                    (F.col("cp") + 1).cast("double")
                    / (np_ + _DSIR_B).cast("double")
                )
                - F.log(
                    (F.col("cq") + 1).cast("double")
                    / (nq_ + _DSIR_B).cast("double")
                )
            )
            * 1e6
            + F.lit(0.5)
        )
        .cast("long")
        .alias("lr_unats"),
    )
    agg = (
        posts.join(F.broadcast(lr), "b")
        .crossJoin(F.broadcast(tgt))
        .groupBy("doc_id", "source")
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.sum("lr_unats").cast("long").alias("logweight_unats"),
            F.max(F.col("source") == F.col("t")).alias("is_target"),
        )
    )
    return agg.select(
        "doc_id", "source", "is_target", "n_grams", "logweight_unats"
    )


DSIR_IMPORTANCE_WEIGHTS_SQL = f"""
WITH d AS (
  SELECT doc_id, source, text FROM documents WHERE text IS NOT NULL),
tgt AS (SELECT min(source) AS t FROM d),
words AS (SELECT doc_id, source, string_split(text, ' ') AS ws FROM d),
grams AS (
  SELECT doc_id, source, unnest(ws) AS g FROM words
  UNION ALL
  SELECT doc_id, source, ws[CAST(t.i AS BIGINT)] || ' ' ||
         ws[CAST(t.i + 1 AS BIGINT)] AS g
  FROM words, LATERAL unnest(range(1, len(ws))) AS t(i)
  WHERE len(ws) >= 2),
posts AS (
  SELECT doc_id, source, ({_md5_u6('g')} % {_DSIR_B}) AS b FROM grams),
counts AS (
  SELECT b,
         CAST(sum(CASE WHEN source = (SELECT t FROM tgt)
                       THEN 1 ELSE 0 END) AS BIGINT) AS cp,
         CAST(count(*) AS BIGINT) AS cq
  FROM posts GROUP BY b),
tot AS (
  SELECT CAST(sum(cp) AS BIGINT) AS np, CAST(sum(cq) AS BIGINT) AS nq
  FROM counts),
lr AS (
  SELECT b,
         CAST(floor((ln(CAST(cp + 1 AS DOUBLE) / CAST(np + {_DSIR_B} AS DOUBLE))
                   - ln(CAST(cq + 1 AS DOUBLE) / CAST(nq + {_DSIR_B} AS DOUBLE)))
                    * 1000000.0 + 0.5) AS BIGINT) AS lr_unats
  FROM counts, tot)
SELECT p.doc_id, p.source,
       max(p.source = (SELECT t FROM tgt)) AS is_target,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(sum(l.lr_unats) AS BIGINT) AS logweight_unats
FROM posts p JOIN lr l USING (b)
GROUP BY p.doc_id, p.source
"""


# resampling budget: how many documents the DSIR selection keeps
_DSIR_RES_K = 100


def dsir_resample_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance RESAMPLING — the selection step the weights
    exist for (Xie et al. 2023 §2: sample k documents from the raw
    pool with probability proportional to their importance weight,
    without replacement). The Gumbel-top-k identity makes it exact
    and one-pass: draw one Gumbel per document and keep the k largest
    (log w + Gumbel) keys — distributionally identical to sequential
    weighted draws without replacement, with no rejection loop, no
    global normalizer, and no RNG state to ship (the
    Efraimidis–Spirakis race in log space; weighted_sample_es is the
    u^(1/w) form of the same identity).

    Determinism (the micro-nat lesson): u is a dyadic rational from a
    salted md5 fold, the Gumbel -ln(-ln(u)) is quantized to integer
    micro-nats, and the ranking key is the exact integer sum
    logweight_unats + gumbel_micro under a (key, doc_id) total order
    — both engines keep the identical k documents.

    100 TB shape: everything before the top-k is the
    dsir_importance_weights plan (one corpus scan, broadcast model
    frames, one rollup shuffle) plus a row-local key projection; the
    selection itself is TakeOrdered partial heaps + a k-row driver
    merge (plan-gated), never a global sort. k is a constant, so the
    final hop is k rows at any corpus size.
    """
    w = dsir_importance_weights(spark, sf_dir)
    u = (
        F.expr(
            _md5_u6("concat('dsirres:', CAST(doc_id AS STRING))")
        ).cast("double")
        + F.lit(0.5)
    ) / F.lit(float(16**6))
    g = F.floor(-F.log(-F.log(u)) * 1e6 + F.lit(0.5)).cast("long")
    scored = w.select(
        "doc_id",
        "source",
        "logweight_unats",
        (F.col("logweight_unats") + g).cast("long").alias("key_micro"),
    )
    return scored.orderBy(
        F.col("key_micro").desc(), F.col("doc_id").asc()
    ).limit(_DSIR_RES_K)


_DSIR_RES_U = _md5_u6("concat('dsirres:', CAST(doc_id AS STRING))")

DSIR_RESAMPLE_TOPK_SQL = f"""
WITH w AS ({DSIR_IMPORTANCE_WEIGHTS_SQL})
SELECT doc_id, source, logweight_unats,
       CAST(logweight_unats
            + floor(-ln(-ln(({_DSIR_RES_U} + 0.5) / {float(16**6)}))
                    * 1000000.0 + 0.5) AS BIGINT) AS key_micro
FROM w
ORDER BY key_micro DESC, doc_id ASC
LIMIT {_DSIR_RES_K}
"""


# ------------------------------------------------------------------
# Per-source distribution drift: unigram KL divergence vs the corpus
# ------------------------------------------------------------------


def source_kl_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-drift report: KL(P_source ‖ Q_corpus) over unigram
    distributions, per source stratum — the dashboard number a
    mixture curator watches to see which source's language is
    diverging from the blend (a spiking KL means that source's next
    refresh shifted vocabulary: spam flood, language drift, template
    churn). Q is the add-one-smoothed whole-corpus distribution;
    P_source needs no smoothing because source words are a subset of
    corpus words, so every ratio is finite.

    Determinism (the unigram-LM lesson): each word's log-ratio
    ln(c_sw·(N+V) / (n_s·(c_w+1))) is computed from identical
    rationals on both engines and quantized to integer micro-nats
    BEFORE the c_sw-weighted sum, so the per-source rollup is exact
    integer arithmetic — no float summation order anywhere.

    100 TB shape: ONE corpus-scale map-side-combined shuffle (the
    (source, word) count); everything after is vocabulary-scale and
    rides that ONE frame through chained windows — corpus counts,
    per-source totals, and the (N, V) scalars are window sums over
    the sw rows, so no consumer ever re-runs the corpus explode and
    nothing vocabulary-sized broadcasts. A real corpus caps the
    vocab at top-K + OOV bucket exactly like oov_rate_top1k
    (documented swap).

    r14 (guide §2.4): the previous form re-derived cw/ns/scal as
    separate aggregations of sw and joined them back — Catalyst
    shares no subtrees across branches, so the corpus explode +
    (source, word) exchange executed FIVE times per run (5 document
    scans in the before-plan). The window chain keeps one sw frame:
    plan 40 -> 10 Exchange, 5 document scans -> 1
    (plans/r14/source_kl_divergence_{before,after}.txt); interleaved
    A/B min-of-6 at sf0.1: 0.56x min / 0.39x median (an eager pin of
    sw also won, 0.61x/0.56x, but the window chain beat it in 4/6
    rounds and needs no pin memory). Integer equality: every window
    sum is the same long arithmetic as the aggregate it replaces;
    v_corpus counts first-row-per-word indicators under a
    deterministic (word, source) order.
    """
    d = spread(_L(spark, sf_dir, "documents"), "doc_id")
    words = d.filter(F.col("text").isNotNull()).select(
        "source", F.explode(F.split("text", " ")).alias("word")
    )
    sw = words.groupBy("source", "word").agg(F.count("*").alias("c_sw"))
    w_src = Window.partitionBy("source")
    w_word = Window.partitionBy("word")
    w_word_rn = Window.partitionBy("word").orderBy("source")
    w_all = Window.partitionBy()
    en = sw.select(
        "source",
        "word",
        "c_sw",
        F.sum("c_sw").over(w_src).alias("n_src"),
        F.count("*").over(w_src).alias("v_src"),
        F.sum("c_sw").over(w_word).alias("c_w"),
        (F.row_number().over(w_word_rn) == 1).cast("long").alias("wfirst"),
    ).select(
        "*",
        F.sum("c_sw").over(w_all).alias("n_corpus"),
        F.sum("wfirst").over(w_all).alias("v_corpus"),
    )
    contrib = en.select(
        "source",
        "n_src",
        "v_src",
        (
            F.col("c_sw")
            * F.floor(
                F.log(
                    (F.col("c_sw") * (F.col("n_corpus") + F.col("v_corpus")))
                    .cast("double")
                    / (F.col("n_src") * (F.col("c_w") + 1)).cast("double")
                )
                * 1e6
                + F.lit(0.5)
            ).cast("long")
        ).alias("contrib"),
    )
    agg = contrib.groupBy("source", "n_src", "v_src").agg(
        F.sum("contrib").alias("kl_sum")
    )
    return agg.select(
        "source",
        F.col("n_src").cast("long").alias("n_words"),
        F.col("v_src").cast("long").alias("src_vocab"),
        fround(F.col("kl_sum") / F.lit(1e6) / F.col("n_src").cast("double"), 6).alias(
            "kl_nats"
        ),
    )


SOURCE_KL_DIVERGENCE_SQL = """
WITH words AS (
  SELECT source, unnest(string_split(text, ' ')) AS word
  FROM documents WHERE text IS NOT NULL),
sw AS (SELECT source, word, count(*) AS c_sw FROM words GROUP BY 1, 2),
cw AS (SELECT word, sum(c_sw) AS c_w FROM sw GROUP BY 1),
scal AS (SELECT sum(c_w) AS n_corpus, count(*) AS v_corpus FROM cw),
ns AS (
  SELECT source, sum(c_sw) AS n_src, count(*) AS v_src FROM sw GROUP BY 1),
contrib AS (
  SELECT s.source,
         s.c_sw * CAST(floor(ln(
             CAST(s.c_sw * (sc.n_corpus + sc.v_corpus) AS DOUBLE)
             / CAST(n.n_src * (c.c_w + 1) AS DOUBLE)) * 1000000.0 + 0.5)
           AS BIGINT) AS contrib
  FROM sw s
  JOIN cw c ON s.word = c.word
  JOIN ns n ON s.source = n.source, scal sc),
agg AS (SELECT source, sum(contrib) AS kl_sum FROM contrib GROUP BY 1)
SELECT a.source,
       CAST(n.n_src AS BIGINT) AS n_words,
       CAST(n.v_src AS BIGINT) AS src_vocab,
       floor((kl_sum / 1000000.0 / CAST(n.n_src AS DOUBLE)) * 1000000.0 + 0.5)
         / 1000000.0 AS kl_nats
FROM agg a JOIN ns n ON a.source = n.source
"""


# the fixed retrieval query for bm25_doc_search: two common terms and
# one rare ("dup" — high idf) from the synthetic vocabulary, so the
# ranking exercises both ends of the idf spectrum at every SF
_BM25_QUERY_TERMS = ("merge", "hash", "dup")


def bm25_doc_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document retrieval: rank documents against a fixed keyword
    query by summed BM25 (per-DOCUMENT granularity — the user-facing
    search op; bm25_top_terms ranks terms per source stratum). Top-20
    by (score desc, doc_id) for a stable driver hash.

    100 TB shape: the query-term df/idf frame is 3 rows (broadcast);
    candidate docs come from an inverted probe — only documents
    containing >= 1 query term are scored (the semi-join prunes the
    corpus before any scoring math); per-doc lengths ride the same
    token pass. Same determinism discipline as bm25_top_terms: both
    ln factors floor-rounded at 1e-6 pre-multiply, avg length as one
    exact integer division.
    """
    d = spread(_L(spark, sf_dir, "documents"), "doc_id")
    # row-local everything: per-doc length and per-term tf come from
    # size/filter lambdas over the split array — the corpus is never
    # exploded and never shuffled on doc_id (the explode variant
    # measured ~2.4x slower at sf0.1: it pays a corpus-scale exchange
    # just to count tokens)
    base = d.filter(F.col("text").isNotNull()).select(
        "doc_id",
        F.expr("size(split(text, ' '))").cast("long").alias("len_d"),
        *[
            F.expr(
                f"size(filter(split(text, ' '), w -> w = '{t}'))"
            )
            .cast("long")
            .alias(f"tf_{i}")
            for i, t in enumerate(_BM25_QUERY_TERMS)
        ],
    )
    glob = base.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("len_d").cast("long").alias("total_len"),
    )
    stack_args = ", ".join(
        f"'{t}', tf_{i}" for i, t in enumerate(_BM25_QUERY_TERMS)
    )
    tf = (
        base.select(
            "doc_id",
            "len_d",
            F.expr(
                f"stack({len(_BM25_QUERY_TERMS)}, {stack_args}) AS (word, tf)"
            ),
        )
        .filter(F.col("tf") > 0)
        .select("doc_id", "len_d", "word", "tf")
    )
    df_ = tf.groupBy("word").agg(F.count("*").cast("long").alias("df_docs"))
    idf = fround(
        F.log(
            (F.col("n_docs") - F.col("df_docs") + F.lit(0.5))
            / (F.col("df_docs") + F.lit(0.5))
            + F.lit(1.0)
        ),
        6,
    )
    avg_len = F.col("total_len").cast("double") / F.col("n_docs")
    tf_norm = fround(
        F.col("tf")
        / (
            F.col("tf")
            + F.lit(_BM25_K1)
            * (F.lit(1.0 - _BM25_B) + F.lit(_BM25_B) * F.col("len_d") / avg_len)
        ),
        6,
    )
    scored = (
        tf.join(F.broadcast(df_.crossJoin(glob)), "word")
        .select("doc_id", (idf * tf_norm).alias("term_score"))
        .groupBy("doc_id")
        .agg(fround(grid_sum("term_score", 12), 6).alias("bm25"))
    )
    return scored.orderBy(F.desc("bm25"), F.asc("doc_id")).limit(20)


def _bm25_search_sql() -> str:
    terms = ", ".join(f"'{t}'" for t in _BM25_QUERY_TERMS)
    return f"""
WITH tokens AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word
  FROM documents WHERE text IS NOT NULL),
dlen AS (
  SELECT doc_id, count(*) AS len_d FROM tokens GROUP BY 1),
gstats AS (
  SELECT count(*) AS n_docs, CAST(sum(len_d) AS BIGINT) AS total_len FROM dlen),
tf AS (
  SELECT doc_id, word, count(*) AS tf FROM tokens
  WHERE word IN ({{terms}}) GROUP BY 1, 2),
dfreq AS (
  SELECT word, count(*) AS df_docs FROM tf GROUP BY 1),
scored AS (
  SELECT t.doc_id,
         {{idf}} * {{tfn}} AS term_score
  FROM tf t JOIN dfreq f USING (word) JOIN dlen l USING (doc_id), gstats g)
SELECT doc_id, {{total}} AS bm25
FROM scored GROUP BY 1
ORDER BY bm25 DESC, doc_id ASC
LIMIT 20
""".format(
        terms=terms,
        idf=sql_round(
            "ln((g.n_docs - f.df_docs + 0.5) / (f.df_docs + 0.5) + 1.0)", 6
        ),
        tfn=sql_round(
            f"t.tf / (t.tf + {_BM25_K1!r} * ((1.0 - {_BM25_B!r}) "
            f"+ {_BM25_B!r} * l.len_d / (CAST(g.total_len AS DOUBLE) / g.n_docs)))",
            6,
        ),
        total=sql_round(sql_grid_sum("term_score", 12), 6),
    )


BM25_DOC_SEARCH_SQL = _bm25_search_sql()


def bm25_index_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SERVING path of bm25_doc_search: build the persisted
    inverted index (text_index.build_text_index — bucket-partitioned
    postings + doc lengths + stats ledger on disk) and answer the
    same fixed query through text_index.probe_bm25, whose postings
    scan reads ONLY the buckets the query terms hash to (partition
    pruning, plan-asserted in tests/test_text_index.py). Scoring is
    expression-identical to the in-plan query, so this shares its
    oracle — the driver hash certifies that the index round-trip
    (tokenize → partitioned write → pruned read → score) loses
    nothing. Index rebuilt per run for catalog self-containment; a
    production deployment builds once and serves thousands of
    queries off the amortized layout (module docstring)."""
    from chess_pipeline_spark.plans.llm import _scratch_index_dir
    from chess_pipeline_spark.text_index import build_text_index, probe_bm25

    idx = _scratch_index_dir("bm25_text")
    build_text_index(
        spread(_L(spark, sf_dir, "documents"), "doc_id"), idx
    )
    return probe_bm25(spark, idx, _BM25_QUERY_TERMS)




_RRF_K = 60  # standard reciprocal-rank-fusion damping


def hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: fuse the BM25 keyword ranking with an
    embedding-cosine ranking by reciprocal-rank fusion —
    score = Σ floor(1e6 / (60 + rank)) over the lists that ranked the
    doc. RRF is the standard no-tuning fusion for lexical+semantic
    search; expressing it over INTEGER micro-units makes the fused
    score exact on any engine (rank arithmetic only — no float
    summation anywhere, the strongest determinism class in the
    catalog).

    The semantic side scores documents against the corpus's own
    vec_id-0 embedding (a fixed query vector); ids are shared between
    documents and embeddings in the synthetic lake, and docs ranked
    by only one list still fuse (outer union semantics). Top-10 by
    (fused score desc, doc_id).

    100 TB shape: both input rankings are already top-20 frames
    (KB-sized), so the fusion is driver-trivial regardless of corpus
    size; the heavy lifting lives in the two underlying retrievers,
    each already plan-gated.
    """
    lex = bm25_doc_search(spark, sf_dir)
    wl = Window.orderBy(F.desc("bm25"), F.asc("doc_id"))
    lex_r = lex.select("doc_id", F.row_number().over(wl).alias("rank_lex"))

    e = spread(_L(spark, sf_dir, "embeddings"), "vec_id")
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qe"))
    dot = (
        "aggregate(zip_with(embedding, qe, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
        " CAST(0 AS DOUBLE), (a, b) -> a + b)"
    )
    nrm = (
        "sqrt(aggregate({v}, CAST(0 AS DOUBLE),"
        " (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
    )
    cos = F.expr(dot) / (F.expr(nrm.format(v="embedding")) * F.expr(nrm.format(v="qe")))
    sem = (
        e.crossJoin(F.broadcast(q))
        .select("vec_id", fround(cos, 6).alias("cos"))
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(20)
    )
    ws = Window.orderBy(F.desc("cos"), F.asc("vec_id"))
    sem_r = sem.select(
        F.col("vec_id").alias("doc_id"), F.row_number().over(ws).alias("rank_sem")
    )

    fused = lex_r.join(sem_r, "doc_id", "full_outer").select(
        "doc_id",
        "rank_lex",
        "rank_sem",
        (
            F.coalesce(
                F.floor(F.lit(1000000) / (F.lit(_RRF_K) + F.col("rank_lex"))),
                F.lit(0),
            )
            + F.coalesce(
                F.floor(F.lit(1000000) / (F.lit(_RRF_K) + F.col("rank_sem"))),
                F.lit(0),
            )
        )
        .cast("long")
        .alias("rrf_micro"),
    )
    return fused.orderBy(F.desc("rrf_micro"), F.asc("doc_id")).limit(10)


HYBRID_SEARCH_RRF_SQL = f"""
WITH lex AS (
  SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS rank_lex
  FROM ({BM25_DOC_SEARCH_SQL.strip()})
), ue AS (
  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings
), qv AS (
  SELECT i, x AS qx FROM ue WHERE vec_id = 0
), qn AS (SELECT sqrt(sum(qx * qx)) AS qnrm FROM qv),
cosines AS (
  SELECT u.vec_id,
         floor((sum(u.x * q.qx) / (sqrt(sum(u.x * u.x)) * any_value(n.qnrm)))
               * 1000000.0 + 0.5) / 1000000.0 AS cos
  FROM ue u JOIN qv q USING (i), qn n
  GROUP BY u.vec_id
), sem AS (
  SELECT vec_id AS doc_id,
         row_number() OVER (ORDER BY cos DESC, vec_id ASC) AS rank_sem
  FROM (SELECT * FROM cosines ORDER BY cos DESC, vec_id ASC LIMIT 20)
)
SELECT coalesce(l.doc_id, s.doc_id) AS doc_id,
       CAST(l.rank_lex AS INT) AS rank_lex,
       CAST(s.rank_sem AS INT) AS rank_sem,
       CAST(coalesce(CAST(floor(1000000 / ({_RRF_K} + l.rank_lex)) AS BIGINT), 0)
            + coalesce(CAST(floor(1000000 / ({_RRF_K} + s.rank_sem)) AS BIGINT), 0)
            AS BIGINT) AS rrf_micro
FROM lex l FULL OUTER JOIN sem s ON l.doc_id = s.doc_id
ORDER BY rrf_micro DESC, doc_id ASC
LIMIT 10
"""


# ------------------------------------------------------------------
# BPE merge candidates (tokenizer induction, first merge iteration)
# ------------------------------------------------------------------

_BPE_TOP_MERGES = 50


def bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First iteration of byte-pair-encoding vocabulary induction:
    the adjacent-character-pair frequencies a BPE trainer would use
    to pick its first merges (Sennrich et al.'s word-frequency
    formulation). Top {_BPE_TOP_MERGES} pairs by corpus count, ties
    broken by pair text — the report that seeds tokenizer training
    over a curated corpus (extension tier; no reference analogue).

    The classic scale trick IS the plan: pair counting runs over the
    DISTINCT-WORD frame weighted by word frequency, never over the
    corpus. Corpus-scale work is one tokenize + map-side-combined
    groupBy(word) (shuffles bare words); the per-position pair
    explode then touches |vocab| rows — millions, not billions —
    and the final pair aggregate is vocab-scale too. The top-k is
    orderBy+limit = TakeOrdered (per-partition heaps, no global
    sort). Words are lowercased alpha runs; 1-char words contribute
    no pairs and are filtered before the explode.
    """
    d = spread(_L(spark, sf_dir, "documents"), "doc_id")
    words = d.select(
        F.explode(
            F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
        ).alias("word")
    )
    vocab = words.groupBy("word").agg(F.count("*").cast("long").alias("wfreq"))
    pairs = (
        vocab.filter(F.length("word") >= 2)
        .select(
            "wfreq",
            F.explode(
                F.expr(
                    "transform(sequence(1, length(word) - 1), "
                    "i -> substring(word, i, 2))"
                )
            ).alias("pair"),
        )
        .groupBy("pair")
        .agg(F.sum("wfreq").alias("merge_count"))
    )
    return (
        pairs.select("pair", "merge_count")
        .orderBy(F.desc("merge_count"), F.asc("pair"))
        .limit(_BPE_TOP_MERGES)
    )


BPE_MERGE_CANDIDATES_SQL = f"""
WITH words AS (
  SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
  FROM documents),
vocab AS (
  SELECT word, CAST(count(*) AS BIGINT) AS wfreq FROM words GROUP BY 1),
pairs AS (
  SELECT substr(word, CAST(t.i AS INTEGER), 2) AS pair, wfreq
  FROM vocab, LATERAL unnest(range(1, length(word))) AS t(i)
  WHERE length(word) >= 2)
SELECT pair, CAST(sum(wfreq) AS BIGINT) AS merge_count
FROM pairs GROUP BY 1
ORDER BY merge_count DESC, pair ASC
LIMIT {_BPE_TOP_MERGES}
"""




_BPE_TRAIN_STEPS = 3


def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL byte-pair-encoding training, {_BPE_TRAIN_STEPS} merge
    steps, entirely in-plan (Sennrich et al.'s word-frequency
    formulation — bpe_merge_candidates reports step 1's candidate
    table; this runs the actual loop: count pairs → pick the best →
    MERGE it into every word → recount on the merged vocabulary).

    Representation trick that keeps both engines exact and UDF-free:
    each word's symbol sequence is one string of '<sym>' wrapped
    tokens ('<'/'>' cannot occur in the lowercase-alpha vocabulary),
    so applying a merge is plain `replace('<a><b>' → '<ab>')` —
    left-to-right, non-overlapping, token-aligned by construction
    (a prefix like '<a><bc>' cannot match because the pattern's
    closing '>' misses), which IS greedy BPE application. The chosen
    pair never leaves the cluster: the 1-row argmax broadcast-joins
    onto the vocabulary and the replace pattern is built from its
    COLUMNS — no driver collect, no Python.

    100 TB shape: corpus-scale work is the single tokenize +
    map-side-combined groupBy(word); every training step after that
    is vocab-scale (pair explode ≈ Σ|word| over DISTINCT words,
    weighted by precomputed frequency — the same Sennrich trick the
    candidate report uses), and each argmax is a 1-row TakeOrdered.
    Steps are unrolled, so the whole train is ONE Catalyst plan; a
    1000-merge production run wraps the same step in a driver loop
    with localCheckpoint every ~30 steps, the documented CC-iteration
    pattern.

    Output: one row per merge step — (step, left_sym, right_sym,
    merged, merge_count), the merge table a tokenizer ships.
    """
    d = spread(_L(spark, sf_dir, "documents"), "doc_id")
    words = d.select(
        F.explode(
            F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
        ).alias("word")
    )
    vocab = (
        words.groupBy("word")
        .agg(F.count("*").cast("long").alias("wfreq"))
        .select(
            "word",
            "wfreq",
            F.concat(
                F.lit("<"),
                F.array_join(F.expr("regexp_extract_all(word, '.', 0)"), "><"),
                F.lit(">"),
            ).alias("v"),
        )
    )

    def pair_counts(voc: DataFrame) -> DataFrame:
        syms = voc.select(
            "wfreq", F.expr("regexp_extract_all(v, '<([^>]+)>', 1)").alias("ss")
        )
        return (
            syms.filter(F.size("ss") >= 2)
            .select(
                "wfreq",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(ss) - 1), "
                        "i -> struct(element_at(ss, i) AS a, "
                        "element_at(ss, i + 1) AS b))"
                    )
                ).alias("p"),
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("wfreq").alias("c"))
        )

    def best_of(pairs: DataFrame, step: int) -> DataFrame:
        return (
            pairs.orderBy(F.desc("c"), F.asc("a"), F.asc("b"))
            .limit(1)
            .select(
                F.lit(step).cast("long").alias("step"),
                F.col("a").alias("left_sym"),
                F.col("b").alias("right_sym"),
                F.concat("a", "b").alias("merged"),
                F.col("c").alias("merge_count"),
            )
        )

    outs, _final = _bpe_merge_chain(vocab, pair_counts, best_of)
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("step")


def _bpe_merge_chain(vocab: DataFrame, pair_counts, best_of):
    """Run the {_BPE_TRAIN_STEPS}-step merge loop; return (the merge
    frames, the post-merge vocabulary with its `word` key intact) —
    shared by the train report and the encode report.

    The input vocabulary is materialized ONCE up front: without it,
    every step's pair_counts (and the caller's post-merge report)
    re-executes the corpus-scale tokenize + word-count that produced
    the vocab — k merge steps cost k corpus scans instead of one.
    The vocab is word-scale (≪ corpus; bounded by distinct words),
    so checkpointing it is the cheap side of that trade at any SF."""
    outs = []
    voc = vocab.localCheckpoint()
    for step in range(1, _BPE_TRAIN_STEPS + 1):
        best = best_of(pair_counts(voc), step).localCheckpoint()
        outs.append(best)
        voc = voc.crossJoin(F.broadcast(best)).select(
            "word",
            "wfreq",
            F.replace(
                F.col("v"),
                F.concat(F.lit("<"), "left_sym", F.lit("><"), "right_sym", F.lit(">")),
                F.concat(F.lit("<"), "merged", F.lit(">")),
            ).alias("v"),
        )
    return outs, voc


def _bpe_step_sql(k: int) -> str:
    return f"""syms_{k} AS (
  SELECT wfreq, regexp_extract_all(v, '<([^>]+)>', 1) AS ss FROM vocab_{k}),
pairs_{k} AS (
  SELECT ss[CAST(t.i AS INTEGER)] AS a, ss[CAST(t.i AS INTEGER) + 1] AS b,
         CAST(sum(wfreq) AS BIGINT) AS c
  FROM syms_{k}, LATERAL unnest(range(1, len(ss))) AS t(i)
  WHERE len(ss) >= 2
  GROUP BY 1, 2),
best_{k} AS (
  SELECT CAST({k} AS BIGINT) AS step, a AS left_sym, b AS right_sym,
         a || b AS merged, c AS merge_count
  FROM pairs_{k} ORDER BY c DESC, a ASC, b ASC LIMIT 1),
vocab_{k + 1} AS (
  SELECT word, wfreq,
         replace(v, '<' || left_sym || '><' || right_sym || '>',
                 '<' || merged || '>') AS v
  FROM vocab_{k}, best_{k})"""


_NL_JOIN = ",\n"

BPE_TRAIN_MERGES_SQL = f"""
WITH words AS (
  SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
  FROM documents),
vocab_1 AS (
  SELECT word, CAST(count(*) AS BIGINT) AS wfreq,
         '<' || list_aggregate(
           list_transform(range(1, length(word) + 1),
                          i -> substr(word, CAST(i AS INTEGER), 1)),
           'string_agg', '><') || '>' AS v
  FROM words GROUP BY word),
{_NL_JOIN.join(_bpe_step_sql(k) for k in range(1, _BPE_TRAIN_STEPS + 1))}
SELECT step, left_sym, right_sym, merged, merge_count FROM best_1
UNION ALL SELECT step, left_sym, right_sym, merged, merge_count FROM best_2
UNION ALL SELECT step, left_sym, right_sym, merged, merge_count FROM best_3
ORDER BY step
"""




def bpe_encode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOKENIZER APPLICATION — the other half of the BPE lifecycle:
    learn the {_BPE_TRAIN_STEPS} merges on the whole corpus
    (identical chain to bpe_train_merges), APPLY them, and report
    per-source what the tokenizer bought: word occurrences,
    character-level token count before, merged token count after,
    and the saving in basis points.

    Scale decomposition: merges are learned and applied at VOCAB
    scale (each word's post-merge symbol count is computed once), and
    the per-source report is a word-key join of per-source
    frequencies against that vocabulary — corpus-scale work is the
    one tokenize + two map-side-combined word counts; nothing
    corpus-scale ever meets the merge machinery. Integer arithmetic
    throughout (counts, floored basis points).
    """
    d = spread(_L(spark, sf_dir, "documents"), "doc_id")
    words_src = d.select(
        "source",
        F.explode(
            F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
        ).alias("word"),
    )
    # r13 (guide §2.3): the per-source frequencies are pinned once
    # (word×source scale — the same "word-scale ≪ corpus" class as
    # the merge chain's vocab pin) and the global vocabulary derives
    # from them by a second-level sum — the corpus is tokenized ONCE
    # instead of twice (the vocab groupBy previously re-ran the full
    # regexp tokenize + explode). Σ per-source counts == global
    # count, so wfreq is value-identical.
    src_freq = words_src.groupBy("source", "word").agg(
        F.count("*").cast("long").alias("f")
    ).localCheckpoint()
    vocab = (
        src_freq.groupBy("word")
        .agg(F.sum("f").cast("long").alias("wfreq"))
        .select(
            "word",
            "wfreq",
            F.concat(
                F.lit("<"),
                F.array_join(F.expr("regexp_extract_all(word, '.', 0)"), "><"),
                F.lit(">"),
            ).alias("v"),
        )
    )

    def pair_counts(voc: DataFrame) -> DataFrame:
        syms = voc.select(
            "wfreq", F.expr("regexp_extract_all(v, '<([^>]+)>', 1)").alias("ss")
        )
        return (
            syms.filter(F.size("ss") >= 2)
            .select(
                "wfreq",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(ss) - 1), "
                        "i -> struct(element_at(ss, i) AS a, "
                        "element_at(ss, i + 1) AS b))"
                    )
                ).alias("p"),
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("wfreq").alias("c"))
        )

    def best_of(pairs: DataFrame, step: int) -> DataFrame:
        return (
            pairs.orderBy(F.desc("c"), F.asc("a"), F.asc("b"))
            .limit(1)
            .select(
                F.lit(step).cast("long").alias("step"),
                F.col("a").alias("left_sym"),
                F.col("b").alias("right_sym"),
                F.concat("a", "b").alias("merged"),
                F.col("c").alias("merge_count"),
            )
        )

    _outs, final_voc = _bpe_merge_chain(vocab, pair_counts, best_of)
    syms_per_word = final_voc.select(
        "word",
        F.length("word").cast("long").alias("chars"),
        F.size(F.expr("regexp_extract_all(v, '<([^>]+)>', 1)"))
        .cast("long")
        .alias("n_syms"),
    )
    joined = src_freq.join(syms_per_word, "word")
    return (
        joined.groupBy("source")
        .agg(
            F.sum("f").cast("long").alias("n_words"),
            F.sum(F.col("f") * F.col("chars")).cast("long").alias("tokens_char"),
            F.sum(F.col("f") * F.col("n_syms")).cast("long").alias("tokens_bpe"),
        )
        .select(
            "source",
            "n_words",
            "tokens_char",
            "tokens_bpe",
            F.floor(
                (F.col("tokens_char") - F.col("tokens_bpe"))
                / F.col("tokens_char")
                * F.lit(10000.0)
                + F.lit(0.5)
            )
            .cast("long")
            .alias("saved_bp"),
        )
        .orderBy("source")
    )


BPE_ENCODE_TOKENS_SQL = f"""
WITH words_src AS (
  SELECT source, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
  FROM documents),
words AS (SELECT word FROM words_src),
vocab_1 AS (
  SELECT word, CAST(count(*) AS BIGINT) AS wfreq,
         '<' || list_aggregate(
           list_transform(range(1, length(word) + 1),
                          i -> substr(word, CAST(i AS INTEGER), 1)),
           'string_agg', '><') || '>' AS v
  FROM words GROUP BY word),
{_NL_JOIN.join(_bpe_step_sql(k) for k in range(1, _BPE_TRAIN_STEPS + 1))},
spw AS (
  SELECT word, CAST(length(word) AS BIGINT) AS chars,
         CAST(len(regexp_extract_all(v, '<([^>]+)>', 1)) AS BIGINT) AS n_syms
  FROM vocab_{_BPE_TRAIN_STEPS + 1}),
sf AS (
  SELECT source, word, CAST(count(*) AS BIGINT) AS f
  FROM words_src GROUP BY 1, 2)
SELECT sf.source,
       CAST(sum(sf.f) AS BIGINT) AS n_words,
       CAST(sum(sf.f * spw.chars) AS BIGINT) AS tokens_char,
       CAST(sum(sf.f * spw.n_syms) AS BIGINT) AS tokens_bpe,
       CAST(floor((sum(sf.f * spw.chars) - sum(sf.f * spw.n_syms))
         / CAST(sum(sf.f * spw.chars) AS DOUBLE) * 10000.0 + 0.5) AS BIGINT)
         AS saved_bp
FROM sf JOIN spw USING (word)
GROUP BY 1
ORDER BY 1
"""


_CHUNK_W = 200  # chars per chunk
_CHUNK_STRIDE = 150  # 50-char overlap between consecutive chunks


def sliding_window_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking — the step that fans documents
    out into overlapping {_CHUNK_W}-char windows (stride
    {_CHUNK_STRIDE}) before embedding/indexing. Emits per chunk:
    (doc_id, chunk_idx, chunk_start, chunk_len, chunk_md5, n_chunks)
    — the DIGEST, not the text, so the report is driver-hashable and
    the chunk table is join-key material for the dedup/ANN tiers
    without moving bodies.

    Chunk-count law: ceil(max(len - overlap, 1) / stride), min 1 — an
    empty or NULL-text doc still yields exactly one (empty) chunk so
    downstream joins never silently drop documents.

    100 TB shape: pure narrow explode (sequence + substring + md5
    inside codegen) — zero shuffles, output partitioning inherits the
    scan; the overlap factor (w/stride = {_CHUNK_W}/{_CHUNK_STRIDE})
    bounds the data amplification at 1.34x.
    """
    d = spread(_L(spark, sf_dir, "documents"), "doc_id")
    n_expr = (
        f"greatest(CAST(ceil(greatest(length(t) - {_CHUNK_W - _CHUNK_STRIDE}, 1)"
        f" / {float(_CHUNK_STRIDE)}) AS BIGINT), CAST(1 AS BIGINT))"
    )
    chunks = (
        d.select(
            "doc_id", F.coalesce(F.col("text"), F.lit("")).alias("t")
        )
        .withColumn("n_chunks", F.expr(n_expr))
        .select(
            "doc_id",
            "t",
            "n_chunks",
            F.explode(F.expr("sequence(0, n_chunks - 1)")).alias("chunk_idx"),
        )
    )
    piece = F.expr(
        f"substring(t, CAST(chunk_idx * {_CHUNK_STRIDE} + 1 AS INT), {_CHUNK_W})"
    )
    return chunks.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        (F.col("chunk_idx") * _CHUNK_STRIDE).cast("long").alias("chunk_start"),
        F.length(piece).cast("long").alias("chunk_len"),
        F.md5(piece).alias("chunk_md5"),
        "n_chunks",
    ).orderBy("doc_id", "chunk_idx")


SLIDING_WINDOW_CHUNKS_SQL = f"""
WITH d AS (
  SELECT doc_id, coalesce(text, '') AS t FROM documents),
n AS (
  SELECT doc_id, t,
         greatest(CAST(ceil(greatest(length(t) - {_CHUNK_W - _CHUNK_STRIDE}, 1)
           / {float(_CHUNK_STRIDE)}) AS BIGINT), 1) AS n_chunks
  FROM d),
c AS (
  SELECT doc_id, t, n_chunks, CAST(u.i AS BIGINT) AS chunk_idx
  FROM n, LATERAL unnest(range(0, n_chunks)) AS u(i))
SELECT doc_id, chunk_idx,
       CAST(chunk_idx * {_CHUNK_STRIDE} AS BIGINT) AS chunk_start,
       CAST(length(substr(t, CAST(chunk_idx * {_CHUNK_STRIDE} + 1 AS INTEGER), {_CHUNK_W})) AS BIGINT) AS chunk_len,
       md5(substr(t, CAST(chunk_idx * {_CHUNK_STRIDE} + 1 AS INTEGER), {_CHUNK_W})) AS chunk_md5,
       n_chunks
FROM c
ORDER BY doc_id, chunk_idx
"""


# ------------------------------------------------------------------
# Cross-document duplicate-n-gram fraction (per-doc quality signal)
# ------------------------------------------------------------------

_DUPGRAM_N = 5  # word n-gram width for the cross-doc duplication signal
# postings whose gram df reaches this take the broadcast (hot) join
# path: the hot set is bounded at total_postings/threshold rows, so
# it broadcasts at any corpus scale while the cold shuffle join stays
# skew-free by construction (see dup_ngram_fraction's docstring)
_DUPGRAM_HOT_DF = 1_000_000


def word_gram_postings(docs: DataFrame) -> DataFrame:
    """Distinct per-doc word {_DUPGRAM_N}-gram postings
    (doc_id, source, g) — the one tokenize rule shared by the batch
    dup_ngram_fraction and the streaming dup-gram ledger
    (streaming/jobs.py::stream_dupgram_ledger), so incremental df
    counts and the batch recompute can never diverge on
    tokenization. Docs with fewer than {_DUPGRAM_N} words produce no
    postings."""
    words = docs.select(
        "doc_id",
        "source",
        F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)").alias("w"),
    ).filter(F.size("w") >= _DUPGRAM_N)
    return words.select(
        "doc_id",
        "source",
        F.explode(
            F.array_distinct(
                F.expr(
                    f"transform(sequence(1, size(w) - {_DUPGRAM_N - 1}), "
                    f"i -> concat_ws(' ', slice(w, i, {_DUPGRAM_N})))"
                )
            )
        ).alias("g"),
    )


def exposure_fold(gdf: DataFrame) -> DataFrame:
    """Per-doc duplication-exposure fold over a postings frame that
    already carries each gram's document frequency as `df` — shared
    verbatim by the batch query and the ledger probe so their
    outputs are comparable byte-for-byte."""
    return (
        gdf.groupBy("doc_id", "source")
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.sum(F.when(F.col("df") >= 2, 1).otherwise(0))
            .cast("long")
            .alias("n_dup_grams"),
        )
        .select(
            "doc_id",
            "source",
            "n_grams",
            "n_dup_grams",
            F.expr("n_dup_grams * 10000 div n_grams").alias("dup_bp"),
        )
        .orderBy("doc_id")
    )


def dup_ngram_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document CROSS-doc duplicate-n-gram share — the
    "fraction of this document's {_DUPGRAM_N}-grams that appear in
    at least one OTHER document", the duplication-exposure signal
    quality pipelines threshold on (the per-doc scalar behind the
    duplicate-text analyses of Lee et al. 2022 "Deduplicating
    Training Data Makes Language Models Better"; Dolma/RedPajama
    ship the same family as `fraction_of_duplicate_ngrams`). It
    complements the dedup tier from a different angle: the pair/
    group detectors answer "which docs are copies", this answers
    "how much of THIS doc is copied from anywhere" — partial
    boilerplate and quote-farms score high long before any pair
    crosses a near-dup threshold. repetition_stats is the INTRA-doc
    twin; this one's df counts distinct documents, so internal
    looping cannot inflate it.

    100 TB shape: distinct word-grams per doc (row-local transform +
    array_distinct), FOLDED TO xxhash64 DIGESTS in the scan stage
    (r9 — exactly like the streaming ledger, jobs.py::
    ingest_dupgram_delta, whose gd key this matches): the gram-keyed
    df count and the join of df back onto the postings shuffle 8-byte
    digests instead of ~30-60 B gram strings, a ~5x narrower
    corpus-scale shuffle. Linear end to end — unlike the pair
    detectors nothing squares in df, so NO stop-gram cap is needed:
    a boilerplate gram with df = 10^9 contributes one counter row
    and fans back out to exactly its own postings.

    Hot-gram skew (r9, measured — scripts/dupgram_skew.py): AQE's
    skew-join splitter does NOT cover this join's natural plan shape
    (OptimizeSkewedJoin pattern-matches Sort-over-ShuffleRead on BOTH
    children with ENSURE_REQUIREMENTS origin; the df side's final
    HashAggregate sits between its sort and its shuffle, and a
    repartition() work-around is rejected for its REPARTITION_BY_COL
    origin), so a df=10^9 boilerplate gram would put 10^9 postings
    rows in one join task with no runtime rescue. The plan therefore
    removes the skew STRUCTURALLY: grams whose df >= {_DUPGRAM_HOT_DF}
    (the hot set — at most total_postings/threshold rows, KB-scale by
    construction) join via BROADCAST in the scan stage, and only the
    skew-free cold remainder takes the shuffle join. The postings
    frame is lazily localCheckpointed first (the BPE-vocab precedent,
    r8): the hot/cold branches and the df count would otherwise each
    re-run the tokenize pass — 3 corpus scans; with the checkpoint
    the corpus is tokenized ONCE and the branches re-read a
    digest-only postings spill (~24 B/row, text never persisted).
    Measured (scripts/dupgram_skew.py, 500k docs, 90% hot):
    checkpoint+split 4.26 s vs the plain double-scan join 5.94 s
    (0.72x) — the skew-safe plan is also the faster one. At test
    scale the hot set is empty and results are byte-identical to the
    plain join (law test).

    2^-64-class digest collisions are the documented approximation (a
    collision can only nudge df upward); a law test pins digest path
    == text path byte-for-byte on the fixture corpus, and the DuckDB
    oracle stays on gram text. All-integer output (counts + floored
    basis points), engine-exact by construction.

    Docs with fewer than {_DUPGRAM_N} words have no gram set and are
    excluded (same contract as the shingle detectors' size gate).
    """
    from chess_pipeline_spark.checkpoints import pin_corpus_frame

    d = spread(_L(spark, sf_dir, "documents"), "doc_id")
    grams = pin_corpus_frame(
        word_gram_postings(d).select(
            "doc_id", "source", F.xxhash64("g").alias("gd")
        )
    )
    return dup_exposure_skew_safe(grams)


def dup_exposure_skew_safe(
    grams: DataFrame, hot_df: int = _DUPGRAM_HOT_DF
) -> DataFrame:
    """df count + hot/cold split join + exposure fold over a digest
    postings frame (doc_id, source, gd) — the skew-safe core shared
    by dup_ngram_fraction and its law/skew tests (which lower
    `hot_df` to exercise the broadcast branch at fixture scale)."""
    dfreq = grams.groupBy("gd").agg(F.count("*").cast("long").alias("df"))
    hot = dfreq.filter(F.col("df") >= hot_df)
    cold = dfreq.filter(F.col("df") < hot_df)
    tagged = grams.join(F.broadcast(hot), "gd", "left")
    hot_rows = tagged.filter(F.col("df").isNotNull())
    cold_rows = tagged.filter(F.col("df").isNull()).drop("df").join(cold, "gd")
    return exposure_fold(hot_rows.unionByName(cold_rows))


DUP_NGRAM_FRACTION_SQL = f"""
WITH words AS (
  SELECT doc_id, source, regexp_extract_all(lower(text), '[a-z]+') AS w
  FROM documents),
grams AS (
  SELECT DISTINCT doc_id, source,
         array_to_string(w[CAST(t.i AS BIGINT):CAST(t.i + {_DUPGRAM_N - 1} AS BIGINT)], ' ') AS g
  FROM words, LATERAL unnest(range(1, len(w) - {_DUPGRAM_N - 2})) AS t(i)
  WHERE len(w) >= {_DUPGRAM_N}),
dfreq AS (SELECT g, CAST(count(*) AS BIGINT) AS df FROM grams GROUP BY g)
SELECT doc_id, source,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_grams,
       CAST((sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) * 10000) // count(*) AS BIGINT) AS dup_bp
FROM grams JOIN dfreq USING (g)
GROUP BY doc_id, source
ORDER BY doc_id
"""


# ------------------------------------------------------------------
# Exact-substring repeated-span extraction (ExactSubstr planning)
# ------------------------------------------------------------------

_SPANGRAM_N = 10  # word-gram width ≙ the minimum repeated-run length
# same structural role as _DUPGRAM_HOT_DF: grams whose occurrence
# count reaches this join via broadcast, bounding the per-task fanout
# of the repeated-flag join (see dup_ngram_fraction's skew note)
_SPANGRAM_HOT_CNT = 1_000_000


def span_positions(docs: DataFrame, n: int = _SPANGRAM_N) -> DataFrame:
    """POSITIONAL word n-gram postings (doc_id, i, gd) — one row per
    gram START POSITION (1-based), NOT deduplicated: unlike
    word_gram_postings, position identity is the payload here (spans
    are position intervals) and intra-doc repeats must count toward
    the corpus occurrence total. Same tokenize rule as the dup-gram
    family; docs with fewer than n words produce no positions."""
    words = docs.select(
        "doc_id",
        F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)").alias("w"),
    ).filter(F.size("w") >= n)
    return words.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(1, size(w) - {n - 1}), "
                f"i -> xxhash64(concat_ws(' ', slice(w, i, {n}))))"
            )
        ).alias("p0", "gd"),
    ).select("doc_id", (F.col("p0") + 1).cast("long").alias("i"), "gd")


def exact_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document REPEATED-SUBSTRING SPANS — the planning pass of
    exact-substring deduplication (Lee et al. 2022 "Deduplicating
    Training Data Makes Language Models Better", the ExactSubstr
    mode): find every maximal run of ≥ {_SPANGRAM_N} consecutive
    words that occurs more than once ANYWHERE in the corpus
    (cross-doc or within-doc), and report per doc the merged span
    count, the covered-word total, the longest single span, and the
    covered share in floored basis points. This is the third member
    of the duplication-signal family: the pair/group detectors say
    "which docs are copies", dup_ngram_fraction says "how much of
    this doc is copied", this one says "WHERE — which exact
    contiguous runs would ExactSubstr cut", the shape an actual
    span-removal rewrite consumes. Lee et al. operate on 50-BPE-token
    suffix-array matches; this is the word-granularity formulation
    (the gram width is the module knob), which is how the pass is
    realized on a shuffle engine: a suffix array is a single-machine
    data structure, while positional-gram counting is one keyed
    aggregate — same detected spans for runs ≥ the gram width.

    Algorithm: positional n-gram digests (scan stage, row-local) →
    corpus-wide occurrence count per digest (ONE map-side-combined
    shuffle; occurrences, not distinct docs, so an internal loop is
    repetition too) → positions whose gram count ≥ 2 flow back
    (hot/cold split: counts ≥ {_SPANGRAM_HOT_CNT} broadcast, the
    dup_ngram_fraction skew posture — AQE cannot split this join
    shape, measured in scripts/dupgram_skew.py) → per-doc
    gaps-and-islands merge of the fixed-length intervals
    [i, i+n-1] (same-length intervals overlap iff the start gap
    ≤ n, so one lag + one running sum inside the doc_id window —
    state bounded by the doc's own positions) → span rollup joined
    back to every ≥n-word doc (zero-fill: a doc with no repeats is
    a 0-span row, not a missing row).

    100 TB shape: shuffles carry (doc_id, i, gd) = 24 bytes — gram
    text never leaves the scan stage (xxhash64 fold inside the
    transform, the r9 dup-gram lesson); the positions frame is
    lazily localCheckpointed so the count and the flag join tokenize
    the corpus ONCE; windows partition by doc_id (naturally bounded);
    nothing squares — a gram with 10^9 occurrences fans back to
    exactly its own positions, and the hot/cold split keeps any one
    join task bounded. 2^-64 digest collisions can only merge two
    distinct grams (nudging spans upward); the oracle stays on gram
    text, and the law tests pin planted span geometry exactly.
    """
    from chess_pipeline_spark.checkpoints import pin_corpus_frame

    d = spread(_L(spark, sf_dir, "documents"), "doc_id")
    pos = pin_corpus_frame(span_positions(d))
    return repeated_spans(pos)


def repeated_span_intervals(
    pos: DataFrame,
    n: int = _SPANGRAM_N,
    hot_cnt: int = _SPANGRAM_HOT_CNT,
) -> DataFrame:
    """(doc_id, s, e) merged repeated-run word intervals (1-based,
    inclusive) from a positional postings frame (doc_id, i, gd):
    corpus occurrence count per digest → skew-safe repeated-flag join
    (counts >= hot_cnt broadcast, the dup-gram posture) → per-doc
    gaps-and-islands merge of the fixed-length intervals [i, i+n-1]
    (same-length intervals overlap iff the start gap <= n, so one lag
    + one running sum inside the doc_id window — state bounded by the
    doc's own positions). Shared by the spans ROLLUP
    (exact_substring_spans) and the span-removal REWRITE
    (exact_substring_rewrite), which consume the same intervals."""
    cnt = pos.groupBy("gd").agg(F.count("*").cast("long").alias("cnt"))
    rep = cnt.filter(F.col("cnt") >= 2).select("gd", "cnt")
    hot = rep.filter(F.col("cnt") >= hot_cnt).select("gd")
    cold = rep.filter(F.col("cnt") < hot_cnt).select("gd")
    tagged = pos.join(
        F.broadcast(hot.withColumn("__hot", F.lit(True))), "gd", "left"
    )
    hot_rows = tagged.filter(F.col("__hot").isNotNull()).drop("__hot")
    cold_rows = (
        tagged.filter(F.col("__hot").isNull())
        .drop("__hot")
        .join(cold, "gd", "left_semi")
    )
    repeated = hot_rows.unionByName(cold_rows).select("doc_id", "i")
    return merge_span_islands(repeated, n=n)


def merge_span_islands(repeated: DataFrame, n: int = _SPANGRAM_N) -> DataFrame:
    """(doc_id, i) repeated-gram start positions -> (doc_id, s, e)
    merged word intervals: fixed-length intervals [i, i+n-1] overlap
    iff the start gap <= n, so the merge is one lag + one running sum
    inside the doc_id window — state bounded by the doc's own
    positions. Shared by the batch flag-join path
    (repeated_span_intervals) and the ledger-served probe
    (streaming.jobs.spans_from_ledger), which flag repeats by
    different means but merge identically."""
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("i")
    isl = (
        repeated.withColumn("prev", F.lag("i").over(w))
        .withColumn(
            "island",
            F.sum(
                F.when(
                    F.col("prev").isNull()
                    | (F.col("i") - F.col("prev") > n),
                    1,
                ).otherwise(0)
            ).over(w),
        )
    )
    return isl.groupBy("doc_id", "island").agg(
        F.min("i").alias("s"), (F.max("i") + n - 1).alias("e")
    ).select("doc_id", "s", "e")


def repeated_spans(
    pos: DataFrame,
    n: int = _SPANGRAM_N,
    hot_cnt: int = _SPANGRAM_HOT_CNT,
) -> DataFrame:
    """Occurrence count + skew-safe repeated-flag join + per-doc
    island merge over a positional postings frame (doc_id, i, gd) —
    the core of exact_substring_spans, parameterized so law/skew
    tests can lower `hot_cnt` to force the broadcast branch and
    shrink `n` against planted fixtures.

    The per-doc word count is DERIVED from the positions frame
    (n_words = max(i) + n - 1, exact because position max(i) is
    size(w) - n + 1), so the document text is scanned exactly once —
    the positions checkpoint feeds the occurrence count, the flag
    join, AND the word-count rollup."""
    doc_words = pos.groupBy("doc_id").agg(
        (F.max("i") + n - 1).cast("long").alias("n_words")
    )
    return span_rollup(doc_words, repeated_span_intervals(pos, n=n, hot_cnt=hot_cnt))


def span_rollup(doc_words: DataFrame, spans: DataFrame) -> DataFrame:
    """(doc_id, n_words) x (doc_id, s, e) -> the exact_substring_spans
    output schema (zero-filled: a doc with no repeats is a 0-span row,
    not a missing row). Shared by the batch query and the
    ledger-served streaming probe."""
    per_doc = spans.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_spans"),
        F.sum(F.col("e") - F.col("s") + 1).cast("long").alias("dup_words"),
        F.max(F.col("e") - F.col("s") + 1).cast("long").alias("max_span_words"),
    )
    return (
        doc_words.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_words",
            F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
            F.coalesce("dup_words", F.lit(0)).cast("long").alias("dup_words"),
            F.coalesce("max_span_words", F.lit(0))
            .cast("long")
            .alias("max_span_words"),
            F.expr(
                "coalesce(dup_words, 0) * 10000 div n_words"
            ).cast("long").alias("dup_word_bp"),
        )
        .orderBy("doc_id")
    )


EXACT_SUBSTRING_SPANS_SQL = f"""
WITH words AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS w
  FROM documents),
docs AS (
  SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words, w
  FROM words WHERE len(w) >= {_SPANGRAM_N}),
pos AS (
  SELECT doc_id, CAST(t.i AS BIGINT) AS i,
         array_to_string(w[CAST(t.i AS BIGINT):CAST(t.i + {_SPANGRAM_N - 1} AS BIGINT)], ' ') AS g
  FROM docs, LATERAL unnest(range(1, len(w) - {_SPANGRAM_N - 2})) AS t(i)),
rep_g AS (SELECT g FROM pos GROUP BY g HAVING count(*) >= 2),
rep AS (SELECT doc_id, i FROM pos SEMI JOIN rep_g USING (g)),
lagged AS (
  SELECT doc_id, i,
         lag(i) OVER (PARTITION BY doc_id ORDER BY i) AS prev
  FROM rep),
isl AS (
  SELECT doc_id, i,
         SUM(CASE WHEN prev IS NULL OR i - prev > {_SPANGRAM_N}
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY i) AS island
  FROM lagged),
spans AS (
  SELECT doc_id, island, MIN(i) AS s, MAX(i) + {_SPANGRAM_N - 1} AS e
  FROM isl GROUP BY doc_id, island),
per_doc AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_spans,
         CAST(SUM(e - s + 1) AS BIGINT) AS dup_words,
         CAST(MAX(e - s + 1) AS BIGINT) AS max_span_words
  FROM spans GROUP BY doc_id)
SELECT d.doc_id, d.n_words,
       CAST(COALESCE(p.n_spans, 0) AS BIGINT) AS n_spans,
       CAST(COALESCE(p.dup_words, 0) AS BIGINT) AS dup_words,
       CAST(COALESCE(p.max_span_words, 0) AS BIGINT) AS max_span_words,
       CAST(COALESCE(p.dup_words, 0) * 10000 // d.n_words AS BIGINT) AS dup_word_bp
FROM docs d LEFT JOIN per_doc p USING (doc_id)
ORDER BY doc_id
"""


def exact_substring_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document SPAN-REMOVAL REWRITE — the execution pass of
    exact-substring deduplication (Lee et al. 2022, ExactSubstr
    "remove" step; reference anchor: the repo models data-cleaning
    transforms like reference transforms.py's column scrubs, lifted
    to corpus scale): drop every word covered by a repeated run of
    >= {_SPANGRAM_N} consecutive words (ALL occurrences — Lee et al.
    remove every copy; what survives is text that appears once in
    the corpus) and emit the cleaned token stream. Operates on the
    normalized token sequence (lowered [a-z]+ runs — the same
    tokenization the span detector and the downstream LM tokenizer
    consume), so `text_clean` is the training-ready form, not a
    byte-offset patch of the raw string.

    Output: one row per >= n-word doc — n_words, removed_words, and
    text_clean ('' when the whole doc is repeated material; such
    rows are the ExactSubstr drop set).

    100 TB shape: the span detection is exact_substring_spans'
    machinery verbatim (digest-only shuffles, hot/cold flag join,
    per-doc island windows — see repeated_span_intervals); the only
    additions are one collect_list of (s, e) intervals per doc
    (bounded by the doc's own span count, not the corpus) and a
    row-local rewrite expression (filter over the words array with
    an exists() probe into the doc's own interval list). The words
    array is re-materialized for the rewrite scan — text must flow
    to the OUTPUT here, so unlike the spans rollup the doc body
    legitimately crosses one exchange: the (doc_id, spans) frame
    joins to the words scan on doc_id, and at real scale the spans
    side is the small one (only docs WITH repeats) and broadcasts.
    """
    d = spread(_L(spark, sf_dir, "documents"), "doc_id")
    words = d.select(
        "doc_id",
        F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)").alias("w"),
    ).filter(F.size("w") >= _SPANGRAM_N)
    from chess_pipeline_spark.checkpoints import pin_corpus_frame

    pos = pin_corpus_frame(span_positions(d))
    doc_spans = (
        repeated_span_intervals(pos)
        .groupBy("doc_id")
        .agg(F.collect_list(F.struct("s", "e")).alias("spans"))
    )
    kept = (
        "filter(transform(w, (x, j) -> struct(x AS t, CAST(j + 1 AS BIGINT)"
        " AS i)), p -> NOT exists(coalesce(spans, array()),"
        " sp -> p.i >= sp.s AND p.i <= sp.e))"
    )
    return (
        words.join(doc_spans, "doc_id", "left")
        .select(
            "doc_id",
            F.size("w").cast("long").alias("n_words"),
            F.expr(kept).alias("k"),
        )
        .select(
            "doc_id",
            "n_words",
            (F.col("n_words") - F.size("k")).cast("long").alias("removed_words"),
            F.expr("concat_ws(' ', transform(k, p -> p.t))").alias("text_clean"),
        )
        .orderBy("doc_id")
    )


EXACT_SUBSTRING_REWRITE_SQL = f"""
WITH words AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS w
  FROM documents),
docs AS (
  SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words, w
  FROM words WHERE len(w) >= {{n}}),
pos AS (
  SELECT doc_id, CAST(t.i AS BIGINT) AS i,
         array_to_string(w[CAST(t.i AS BIGINT):CAST(t.i + {{n1}} AS BIGINT)], ' ') AS g
  FROM docs, LATERAL unnest(range(1, len(w) - {{n2}})) AS t(i)),
rep_g AS (SELECT g FROM pos GROUP BY g HAVING count(*) >= 2),
rep AS (SELECT doc_id, i FROM pos SEMI JOIN rep_g USING (g)),
lagged AS (
  SELECT doc_id, i,
         lag(i) OVER (PARTITION BY doc_id ORDER BY i) AS prev
  FROM rep),
isl AS (
  SELECT doc_id, i,
         SUM(CASE WHEN prev IS NULL OR i - prev > {{n}}
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY i) AS island
  FROM lagged),
spans AS (
  SELECT doc_id, island, MIN(i) AS s, MAX(i) + {{n1}} AS e
  FROM isl GROUP BY doc_id, island),
tok AS (
  SELECT doc_id, CAST(t.j AS BIGINT) AS j, w[CAST(t.j AS BIGINT)] AS tok
  FROM docs, LATERAL unnest(range(1, len(w) + 1)) AS t(j)),
kept AS (
  SELECT doc_id, j, tok FROM tok t
  WHERE NOT EXISTS (SELECT 1 FROM spans s
                    WHERE s.doc_id = t.doc_id AND t.j BETWEEN s.s AND s.e)),
kc AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
         string_agg(tok, ' ' ORDER BY j) AS txt
  FROM kept GROUP BY doc_id)
SELECT d.doc_id, d.n_words,
       CAST(d.n_words - COALESCE(kc.n_kept, 0) AS BIGINT) AS removed_words,
       COALESCE(kc.txt, '') AS text_clean
FROM docs d LEFT JOIN kc USING (doc_id)
ORDER BY d.doc_id
""".format(n=_SPANGRAM_N, n1=_SPANGRAM_N - 1, n2=_SPANGRAM_N - 2)


QUERIES: dict[str, QuerySpec] = {
    "dup_ngram_fraction": QuerySpec(
        dup_ngram_fraction, DUP_NGRAM_FRACTION_SQL, "corpus-dup-exposure"
    ),
    "dsir_importance_weights": QuerySpec(
        dsir_importance_weights,
        DSIR_IMPORTANCE_WEIGHTS_SQL,
        "corpus-dsir-importance",
    ),
    "dsir_resample_topk": QuerySpec(
        dsir_resample_topk,
        DSIR_RESAMPLE_TOPK_SQL,
        "corpus-dsir-resample",
    ),
    "exact_substring_spans": QuerySpec(
        exact_substring_spans,
        EXACT_SUBSTRING_SPANS_SQL,
        "corpus-exact-substring-spans",
    ),
    "exact_substring_rewrite": QuerySpec(
        exact_substring_rewrite,
        EXACT_SUBSTRING_REWRITE_SQL,
        "corpus-exact-substring-rewrite",
    ),
    "dedup_keep_best": QuerySpec(
        dedup_keep_best, DEDUP_KEEP_BEST_SQL, "corpus-keep-best"
    ),
    "bpe_merge_candidates": QuerySpec(
        bpe_merge_candidates, BPE_MERGE_CANDIDATES_SQL, "corpus-bpe-induction"
    ),
    "bpe_train_merges": QuerySpec(
        bpe_train_merges, BPE_TRAIN_MERGES_SQL, "corpus-bpe-train iterative"
    ),
    "sliding_window_chunks": QuerySpec(
        sliding_window_chunks, SLIDING_WINDOW_CHUNKS_SQL, "corpus-chunking E1"
    ),
    "bpe_encode_tokens": QuerySpec(
        bpe_encode_tokens, BPE_ENCODE_TOKENS_SQL, "corpus-bpe-apply"
    ),
    "stratified_sample": QuerySpec(
        stratified_sample, STRATIFIED_SAMPLE_SQL, "corpus-sample"
    ),
    "mixture_sample": QuerySpec(mixture_sample, MIXTURE_SAMPLE_SQL, "corpus-mixture"),
    "weighted_sample_es": QuerySpec(
        weighted_sample_es, WEIGHTED_SAMPLE_ES_SQL, "corpus-weighted-sample"
    ),
    "temperature_mixture_sample": QuerySpec(
        temperature_mixture_sample,
        TEMPERATURE_MIXTURE_SAMPLE_SQL,
        "corpus-temperature-mixture",
    ),
    "weighted_sample_per_source": QuerySpec(
        weighted_sample_per_source,
        WEIGHTED_SAMPLE_PER_SOURCE_SQL,
        "corpus-stratified-reservoir",
    ),
    "negative_sample_pairs": QuerySpec(
        negative_sample_pairs,
        NEGATIVE_SAMPLE_PAIRS_SQL,
        "corpus-contrastive-negatives",
    ),
    "leakage_safe_split": QuerySpec(
        leakage_safe_split,
        LEAKAGE_SAFE_SPLIT_SQL,
        "corpus-leakage-safe-split",
    ),
    "oversample_balance_sources": QuerySpec(
        oversample_balance_sources,
        OVERSAMPLE_BALANCE_SOURCES_SQL,
        "corpus-balancing-oversample",
    ),
    "token_balanced_shards": QuerySpec(
        token_balanced_shards,
        TOKEN_BALANCED_SHARDS_SQL,
        "corpus-balanced-sharding",
    ),
    "span_corruption_plan": QuerySpec(
        span_corruption_plan,
        SPAN_CORRUPTION_PLAN_SQL,
        "corpus-span-corruption",
    ),
    "pack_sequences": QuerySpec(pack_sequences, PACK_SEQUENCES_SQL, "corpus-pack"),
    "tfidf_top_terms": QuerySpec(
        tfidf_top_terms, TFIDF_TOP_TERMS_SQL, "corpus-tfidf"
    ),
    "decontaminate_ngram_overlap": QuerySpec(
        decontaminate_ngram_overlap,
        DECONTAMINATE_NGRAM_OVERLAP_SQL,
        "corpus-decontam",
    ),
    "bm25_top_terms": QuerySpec(bm25_top_terms, BM25_TOP_TERMS_SQL, "corpus-bm25"),
    "repetition_stats": QuerySpec(
        repetition_stats, REPETITION_STATS_SQL, "corpus-repetition"
    ),
    "quality_filter_verdicts": QuerySpec(
        quality_filter_verdicts, QUALITY_FILTER_VERDICTS_SQL, "corpus-quality-gate"
    ),
    "paragraph_dedup": QuerySpec(
        paragraph_dedup, PARAGRAPH_DEDUP_SQL, "corpus-paragraph-dedup"
    ),
    "pii_redact_stats": QuerySpec(
        pii_redact_stats, PII_REDACT_STATS_SQL, "corpus-pii"
    ),
    "oov_rate_top1k": QuerySpec(oov_rate_top1k, OOV_RATE_TOP1K_SQL, "corpus-oov"),
    "boilerplate_chunk_removal": QuerySpec(
        boilerplate_chunk_removal,
        BOILERPLATE_CHUNK_REMOVAL_SQL,
        "corpus-boilerplate",
    ),
    "corpus_composition": QuerySpec(
        corpus_composition, CORPUS_COMPOSITION_SQL, "corpus-card"
    ),
    "unigram_logprob_score": QuerySpec(
        unigram_logprob_score, UNIGRAM_LOGPROB_SCORE_SQL, "corpus-lm-quality"
    ),
    "source_kl_divergence": QuerySpec(
        source_kl_divergence, SOURCE_KL_DIVERGENCE_SQL, "corpus-drift-kl"
    ),
    "bm25_doc_search": QuerySpec(
        bm25_doc_search, BM25_DOC_SEARCH_SQL, "corpus-retrieval"
    ),
    "bm25_index_probe": QuerySpec(
        bm25_index_probe, BM25_DOC_SEARCH_SQL, "corpus-retrieval-serving"
    ),
    "hybrid_search_rrf": QuerySpec(
        hybrid_search_rrf, HYBRID_SEARCH_RRF_SQL, "corpus-hybrid-retrieval"
    ),
}
