"""Data-profiling, sketch, and corpus-report queries.

Round-5 additions beyond the reference's own surface (the reference
has no profiling tier; its closest analogue is the ad-hoc sanity
aggregates in `src/utils/newsletter.py:59-77`): the operational
queries a training-data pipeline runs continuously over a 100 TB
lake — cardinality sketches, column profiles, robust outlier fences,
length histograms, and duplication-distribution reports.

Cross-engine determinism notes (the DuckDB oracle hash-compares
values):

* The HyperLogLog register math is done entirely in integer/string
  space (hex-digit parsing, CASE bit-length) — no floating log2 —
  and the harmonic sum is a sum of dyadic rationals 2^-M (M <= 25)
  whose partial sums are all exactly representable, so the register
  sum Z is bit-identical in any summation order on any IEEE engine.
  Only the bias constant multiply/divide and the small-range ln()
  touch inexact floats, both behind fround().
* Robust fences round the median/MAD to the 1e-6 grid BEFORE the
  fence arithmetic so both engines compare against bit-identical
  bounds.
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
from chess_pipeline_spark.plans.spec import QuerySpec
from chess_pipeline_spark.sources import load_table as _L
from chess_pipeline_spark.sources import spread

# ------------------------------------------------------------------
# Deterministic HyperLogLog (m = 256 registers)
# ------------------------------------------------------------------

_HLL_M = 256
# standard HLL bias correction for m = 256; repr() of the Python
# double is the literal both engines parse, so both start from the
# bit-identical constant
_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / 256.0)

_HEX = "0123456789abcdef"


def hll_rank_cols(h):
    """(register, rank) columns from a 32-hex-char md5 column.

    register = first 2 hex digits (0..255); rank = leading-zero count
    of the next 24 bits + 1 (1..25), computed with string ops + a
    16-way CASE so no float log is involved.
    """
    reg = (F.instr(F.lit(_HEX), F.substring(h, 1, 1)) - 1) * 16 + (
        F.instr(F.lit(_HEX), F.substring(h, 2, 1)) - 1
    )
    whex = F.substring(h, 3, 6)
    z = F.length(F.regexp_extract(whex, "^0*", 0))
    d = F.substring(F.concat(whex, F.lit("1")), z + 1, 1)  # pad guards z=6
    bitlen = (
        F.when(d.isin(*"89abcdef"), 4)
        .when(d.isin("4", "5", "6", "7"), 3)
        .when(d.isin("2", "3"), 2)
        .otherwise(1)
    )
    rank = F.when(z == 6, F.lit(25)).otherwise(z * 4 + 5 - bitlen)
    return reg.alias("reg"), rank.alias("rank")


def hll_registers_for(keyed: DataFrame, key: str = "event_type") -> DataFrame:
    """(key, h: md5-hex) -> (key, reg, m_j): the max-merged register
    table. This IS the sketch state — ≤ 256 rows per key, and
    max-merge is associative+commutative+idempotent, so partial
    register tables from any partitioning (or any micro-batch replay)
    merge to the identical result. The streaming twin
    (streaming/jobs.py::stream_hll_distinct) persists exactly this
    frame as its ledger."""
    reg, rank = hll_rank_cols(F.col("h"))
    return (
        keyed.select(key, reg, rank)
        .groupBy(key, "reg")
        .agg(F.max("rank").alias("m_j"))
    )


def hll_estimate_col():
    """The estimate expression over a per-key aggregate holding
    regs_used + z_used (sum of 2^-m_j over used registers): raw HLL
    with small-range linear counting, Flajolet et al. 2007."""
    zeros = F.lit(_HLL_M) - F.col("regs_used")
    z_tot = F.col("z_used") + zeros.cast("double")
    e_raw = F.lit(_HLL_ALPHA * _HLL_M * _HLL_M) / z_tot
    return F.when(
        (e_raw <= F.lit(2.5 * _HLL_M)) & (zeros > 0),
        F.lit(float(_HLL_M)) * F.log(F.lit(float(_HLL_M)) / zeros.cast("double")),
    ).otherwise(e_raw)


def hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type distinct-user cardinality: exact count next to a
    from-scratch deterministic HyperLogLog estimate (m=256, md5-based,
    Flajolet et al. 2007 constants, small-range linear counting).

    Scale shape: the register table is at most m rows per group —
    the groupBy(type, reg) max() is a mergeable map-side partial agg,
    and the final per-type reduce touches <= 256 rows per group. At
    100 TB the exact countDistinct branch is the one you'd drop (it
    shuffles every distinct user id); the sketch branch IS the plan —
    fixed 256-register state per group regardless of corpus size,
    the same mergeability argument as Spark's native HLL++
    (approx_count_distinct), which this re-derivation cross-checks.
    """
    ev = _L(spark, sf_dir, "events").select(
        "event_type", F.md5(F.col("user_id").cast("string")).alias("h")
    )
    per_type = hll_registers_for(ev).groupBy("event_type").agg(
        F.count("*").alias("regs_used"),
        F.sum(F.pow(F.lit(2.0), -F.col("m_j"))).alias("z_used"),
    )
    est = hll_estimate_col()
    exact = (
        _L(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n_exact"))
    )
    return (
        per_type.join(F.broadcast(exact), "event_type")
        .select(
            "event_type",
            "n_exact",
            "regs_used",
            fround(est, 4).alias("hll_estimate"),
        )
        .orderBy("event_type")
    )


HLL_DISTINCT_USERS_SQL = f"""
WITH h AS (
  SELECT event_type, md5(CAST(user_id AS VARCHAR)) AS hx
  FROM events
), rr AS (
  SELECT event_type,
         (instr('{_HEX}', substring(hx, 1, 1)) - 1) * 16
           + (instr('{_HEX}', substring(hx, 2, 1)) - 1) AS reg,
         CASE WHEN length(regexp_extract(substring(hx, 3, 6), '^0*')) = 6
              THEN 25
              ELSE length(regexp_extract(substring(hx, 3, 6), '^0*')) * 4 + 5
                   - (CASE substring(substring(hx, 3, 6) || '1',
                           length(regexp_extract(substring(hx, 3, 6), '^0*')) + 1, 1)
                      WHEN '1' THEN 1 WHEN '2' THEN 2 WHEN '3' THEN 2
                      ELSE CASE WHEN substring(substring(hx, 3, 6) || '1',
                                length(regexp_extract(substring(hx, 3, 6), '^0*')) + 1, 1)
                                IN ('4','5','6','7') THEN 3 ELSE 4 END END)
         END AS rank
  FROM h
), regs AS (
  SELECT event_type, reg, max(rank) AS m_j FROM rr GROUP BY 1, 2
), per_type AS (
  SELECT event_type, count(*) AS regs_used,
         sum(power(2.0, -m_j)) AS z_used
  FROM regs GROUP BY 1
), est AS (
  SELECT event_type, regs_used,
         CASE WHEN ({_HLL_ALPHA * _HLL_M * _HLL_M!r}
                    / (z_used + ({_HLL_M} - regs_used))) <= {2.5 * _HLL_M!r}
                   AND ({_HLL_M} - regs_used) > 0
              THEN {float(_HLL_M)!r} * ln({float(_HLL_M)!r}
                   / CAST({_HLL_M} - regs_used AS DOUBLE))
              ELSE {_HLL_ALPHA * _HLL_M * _HLL_M!r}
                   / (z_used + ({_HLL_M} - regs_used))
         END AS e
  FROM per_type
)
SELECT e.event_type, x.n_exact, e.regs_used,
       {sql_round('e.e', 4)} AS hll_estimate
FROM est e
JOIN (SELECT event_type, count(DISTINCT user_id) AS n_exact
      FROM events GROUP BY 1) x USING (event_type)
ORDER BY event_type
"""


# ------------------------------------------------------------------
# Column profiling (deequ-style data-quality pass)
# ------------------------------------------------------------------

_PROFILE_COLS = (
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderpriority",
)


def data_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass column profile of the orders table: per column the
    row count, NULL count, and exact distinct count — the
    schema-drift / data-quality report a lake pipeline runs per
    ingest batch (deequ/dqdl shape; no reference analogue).

    Plan shape: ONE scan; multiple count(distinct) in a single agg
    compile to a Catalyst Expand (one pass, k× rows in the shuffle,
    mergeable partials). At 100 TB swap exact distinct for
    approx_count_distinct and the Expand collapses to per-column HLL
    sketch state — the same report at a fraction of the shuffle; the
    exact variant is kept here because the oracle hash-compares
    values.
    """
    o = _L(spark, sf_dir, "orders")
    aggs = [F.count("*").alias("n_rows")]
    for c in _PROFILE_COLS:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"nn_{c}"))
        aggs.append(F.countDistinct(c).alias(f"nd_{c}"))
    wide = o.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', nn_{c}, nd_{c}" for c in _PROFILE_COLS
    )
    return wide.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack_args}) "
            "AS (column_name, n_nulls, n_distinct)"
        ),
        "n_rows",
    ).select("column_name", "n_rows", "n_nulls", "n_distinct")


DATA_PROFILE_ORDERS_SQL = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS column_name, count(*) AS n_rows,
       CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       count(DISTINCT {c}) AS n_distinct FROM orders"""
    for c in _PROFILE_COLS
)


# ------------------------------------------------------------------
# Robust (median/MAD) outlier fences
# ------------------------------------------------------------------

# 3 sigma-equivalents: 3 * 1.4826 (the normal-consistency constant)
_MAD_K = 4.4478


def mad_outlier_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type robust outlier fences: median ± 3·1.4826·MAD,
    plus how many observations fall outside — the
    monitoring/anomaly-gate pass over a metrics stream (no reference
    analogue; extension tier).

    Two grouped percentile aggs (median, then MAD of |value - med|)
    with the tiny per-type medians broadcast back — never a window
    over the full value set. med/MAD are grid-rounded (1e-6) before
    the fence arithmetic so both engines derive bit-identical fences.
    """
    ev = _L(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        fround(F.expr("percentile(value, 0.5)"), 6).alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", "value", "med", F.abs(F.col("value") - F.col("med")).alias("dev")
    )
    mad = dev.groupBy("event_type").agg(
        F.first("med").alias("med"),
        fround(F.expr("percentile(dev, 0.5)"), 6).alias("mad"),
        F.count("value").alias("n"),
    )
    lo = F.col("med") - F.lit(_MAD_K) * F.col("mad")
    hi = F.col("med") + F.lit(_MAD_K) * F.col("mad")
    fences = mad.select(
        "event_type", "med", "mad", "n", lo.alias("lo"), hi.alias("hi")
    )
    out = (
        ev.join(F.broadcast(fences), "event_type")
        .groupBy("event_type")
        .agg(
            F.first("med").alias("med"),
            F.first("mad").alias("mad"),
            F.first("n").alias("n"),
            F.sum(((F.col("value") < F.col("lo")) | (F.col("value") > F.col("hi"))).cast("long")).alias(
                "n_outliers"
            ),
            fround(F.first("lo"), 6).alias("fence_lo"),
            fround(F.first("hi"), 6).alias("fence_hi"),
        )
    )
    return out.select(
        "event_type", "med", "mad", "fence_lo", "fence_hi", "n", "n_outliers"
    )


MAD_OUTLIER_BOUNDS_SQL = f"""
WITH med AS (
  SELECT event_type, {sql_round('quantile_cont(value, 0.5)', 6)} AS med
  FROM events GROUP BY 1
), mad AS (
  SELECT e.event_type, m.med,
         {sql_round('quantile_cont(abs(e.value - m.med), 0.5)', 6)} AS mad,
         count(e.value) AS n
  FROM events e JOIN med m USING (event_type)
  GROUP BY 1, 2
), fences AS (
  SELECT event_type, med, mad, n,
         med - {_MAD_K!r} * mad AS lo,
         med + {_MAD_K!r} * mad AS hi
  FROM mad
)
SELECT f.event_type, f.med, f.mad,
       {sql_round('f.lo', 6)} AS fence_lo,
       {sql_round('f.hi', 6)} AS fence_hi,
       f.n,
       CAST(sum(CASE WHEN e.value < f.lo OR e.value > f.hi THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM events e JOIN fences f USING (event_type)
GROUP BY 1, 2, 3, 4, 5, 6
"""


# ------------------------------------------------------------------
# Sequence-length histogram (corpus length distribution)
# ------------------------------------------------------------------

_LEN_EDGES = (64, 256, 1024, 4096)


def _bucket_label(col):
    c = F.when(col < _LEN_EDGES[0], F.lit(f"00_lt_{_LEN_EDGES[0]}"))
    for i in range(1, len(_LEN_EDGES)):
        c = c.when(
            col < _LEN_EDGES[i], F.lit(f"{i:02d}_lt_{_LEN_EDGES[i]}")
        )
    return c.otherwise(F.lit(f"{len(_LEN_EDGES):02d}_ge_{_LEN_EDGES[-1]}"))


def seq_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-length distribution per source over fixed geometric
    buckets — the pre-training report that sizes packing shards and
    flags truncation exposure (extension tier; works off the same
    BPE-ish token split as pack_sequences).

    Fixed CASE edges (not float log2) keep bucketing integer-exact on
    both engines; one scan, one partial-aggregated groupBy. NULL-text
    documents are filtered out (matching the rest of the corpus tier);
    without the filter a NULL n_tokens would fall through every CASE
    arm into the top bucket and report null docs as the longest ones.
    """
    from chess_pipeline_spark.plans.llm import BPE_TOKEN_PATTERN

    d = spread(_L(spark, sf_dir, "documents"), "doc_id")
    toks = d.filter(F.col("text").isNotNull()).select(
        "source",
        F.regexp_count("text", F.lit(BPE_TOKEN_PATTERN)).cast("long").alias("n_tokens"),
    )
    return (
        toks.select("source", _bucket_label(F.col("n_tokens")).alias("len_bucket"), "n_tokens")
        .groupBy("source", "len_bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("sum_tokens"),
            fround(F.avg("n_tokens"), 4).alias("avg_tokens"),
        )
        .orderBy("source", "len_bucket")
    )


_TOKENS_SQL = (
    "CAST(len(regexp_extract_all(text, "
    r"'[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT)"
)

SEQ_LENGTH_HISTOGRAM_SQL = f"""
WITH toks AS (
  SELECT source, {_TOKENS_SQL} AS n_tokens FROM documents
  WHERE text IS NOT NULL
), b AS (
  SELECT source, n_tokens,
         CASE WHEN n_tokens < {_LEN_EDGES[0]} THEN '00_lt_{_LEN_EDGES[0]}'
              WHEN n_tokens < {_LEN_EDGES[1]} THEN '01_lt_{_LEN_EDGES[1]}'
              WHEN n_tokens < {_LEN_EDGES[2]} THEN '02_lt_{_LEN_EDGES[2]}'
              WHEN n_tokens < {_LEN_EDGES[3]} THEN '03_lt_{_LEN_EDGES[3]}'
              ELSE '04_ge_{_LEN_EDGES[-1]}' END AS len_bucket
  FROM toks
)
SELECT source, len_bucket, count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
       {sql_round('avg(n_tokens)', 4)} AS avg_tokens
FROM b GROUP BY 1, 2 ORDER BY 1, 2
"""


# ------------------------------------------------------------------
# TPC-H Q10-shaped returned-items report
# ------------------------------------------------------------------


def returned_items_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 customers by revenue lost to returned lineitems
    (TPC-H Q10 shape): lineitem('R') ⋈ orders ⋈ customer ⋈ nation,
    grouped by customer, ordered by revenue.

    Plan: the returnflag filter is pushed to the lineitem scan; the
    customer⋈nation dim side broadcasts; one fact shuffle
    (orders⋈lineitem) + one agg shuffle; the global top-20 is
    orderBy+limit, which Spark executes as TakeOrdered (per-partition
    top-20, driver merge of 20-row heaps — no full sort at any
    scale). Revenue is grid-rounded before ranking so the cutoff is
    engine-stable; ties broken by c_custkey for a total order.
    """
    li = _L(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = _L(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = _L(spark, sf_dir, "customer")
    nation = _L(spark, sf_dir, "nation")
    dims = cust.join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    ).select("c_custkey", "c_name", "n_name")
    rev = grid_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
    per_cust = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey")
        .agg(fround(rev, 2).alias("revenue"), F.count("*").alias("n_lines"))
    )
    return (
        per_cust.join(F.broadcast(dims), per_cust.o_custkey == dims.c_custkey)
        .select("c_custkey", "c_name", "n_name", "revenue", "n_lines")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


RETURNED_ITEMS_REPORT_SQL = f"""
WITH per_cust AS (
  SELECT o.o_custkey,
         {sql_round(sql_grid_sum('l.l_extendedprice * (1 - l.l_discount)', 4), 2)} AS revenue,
         count(*) AS n_lines
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_returnflag = 'R'
  GROUP BY 1
)
SELECT c.c_custkey, c.c_name, n.n_name, p.revenue, p.n_lines
FROM per_cust p
JOIN customer c ON p.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
ORDER BY p.revenue DESC, c.c_custkey ASC
LIMIT 20
"""


# ------------------------------------------------------------------
# Duplicate-cluster size distribution
# ------------------------------------------------------------------


def dup_cluster_size_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of exact-duplicate cluster sizes at CHUNK
    granularity: every paragraph chunk (the same fixed-width chunker
    paragraph_dedup and the corpus ETL share) is digested, clusters
    are chunks with an identical digest, and the report histograms
    cluster size → (how many clusters, chunks, redundant copies).
    The standard "how duplicated is this crawl" report that decides
    whether the fuzzy near-dup passes are worth their shuffle
    (extension tier; whole-document duplication shows up as many
    max-size chunk clusters).

    Scale shape: chunking is a row-local explode in the scan stage;
    the first groupBy shuffles only the 32-byte digest (never chunk
    bodies), the second runs over at most |distinct sizes| rows —
    both keep map-side partials.
    """
    from chess_pipeline_spark.plans.corpus import paragraph_chunks

    d = spread(_L(spark, sf_dir, "documents"), "doc_id").select("doc_id", "text")
    sizes = (
        paragraph_chunks(d)
        .select(F.md5("chunk").alias("digest"))
        .groupBy("digest")
        .agg(F.count("*").alias("sz"))
        .filter(F.col("sz") >= 2)
    )
    return (
        sizes.groupBy("sz")
        .agg(F.count("*").alias("n_clusters"))
        .select(
            F.col("sz").alias("cluster_size"),
            "n_clusters",
            (F.col("sz") * F.col("n_clusters")).alias("n_chunks"),
            ((F.col("sz") - 1) * F.col("n_clusters")).alias("n_redundant"),
        )
        .orderBy("cluster_size")
    )


from chess_pipeline_spark.plans.corpus import _PARA_WORDS as _PW

# the chunking CTEs mirror PARAGRAPH_DEDUP_SQL exactly (same chunker)
DUP_CLUSTER_SIZE_HIST_SQL = f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws
  FROM documents WHERE text IS NOT NULL),
ch AS (
  SELECT array_to_string(
           ws[(CAST(t.i AS BIGINT) * {_PW} + 1):
              (CAST(t.i AS BIGINT) * {_PW} + {_PW})], ' ') AS chunk
  FROM w, LATERAL unnest(range(0, (len(ws) - 1) // {_PW} + 1)) AS t(i)),
sizes AS (
  SELECT md5(chunk) AS digest, count(*) AS sz
  FROM ch GROUP BY 1 HAVING count(*) >= 2
)
SELECT sz AS cluster_size, count(*) AS n_clusters,
       CAST(sz * count(*) AS BIGINT) AS n_chunks,
       CAST((sz - 1) * count(*) AS BIGINT) AS n_redundant
FROM sizes GROUP BY 1 ORDER BY 1
"""




# ------------------------------------------------------------------
# Count-Min sketch heavy hitters (d = 4 rows x w = 1024 counters)
# ------------------------------------------------------------------

_CMS_D = 4
_CMS_W = 1024


def _hex3_to_int_spark(h):
    """First 3 hex chars of a digest column -> 0..4095, pure
    string/integer ops (no conv(); DuckDB has no conv, so both
    engines parse digits the same way)."""
    d0 = F.instr(F.lit(_HEX), F.substring(h, 1, 1)) - 1
    d1 = F.instr(F.lit(_HEX), F.substring(h, 2, 1)) - 1
    d2 = F.instr(F.lit(_HEX), F.substring(h, 3, 1)) - 1
    return (d0 * 256 + d1 * 16 + d2).cast("long")


def _hex3_to_int_sql(h: str) -> str:
    return (
        f"CAST((instr('{_HEX}', substring({h}, 1, 1)) - 1) * 256"
        f" + (instr('{_HEX}', substring({h}, 2, 1)) - 1) * 16"
        f" + (instr('{_HEX}', substring({h}, 3, 1)) - 1) AS BIGINT)"
    )


def cms_sketch_counters(words: DataFrame, *, weighted: bool = False) -> DataFrame:
    """(row_i, bucket, cnt) Count-Min counters for a `word` column —
    the mergeable core shared by the cms_heavy_hitters catalog query
    and the streaming CMS ledger (streaming/jobs.py). Vocab-weighted
    (r6): the {_CMS_D} md5 hashes run per DISTINCT word and the
    counters sum the word frequencies, which equals the
    per-occurrence count exactly while hashing |vocab| strings
    instead of every occurrence. Counter addition is associative and
    commutative, so counters built per micro-batch/partition merge by
    plain summation.

    Pass weighted=True when the input is ALREADY the aggregated
    (word, wf) vocabulary: cms_heavy_hitters computes that frame for
    its exact branch anyway, and re-aggregating it here would run the
    corpus-scale word shuffle twice (r6 advice)."""
    vocab = words if weighted else words.groupBy("word").agg(F.count("*").alias("wf"))
    rb = F.array(
        *[
            F.struct(
                F.lit(i).alias("row_i"),
                (
                    _hex3_to_int_spark(
                        F.md5(F.concat(F.lit(f"{i}:"), F.col("word")))
                    )
                    % _CMS_W
                ).alias("bucket"),
            )
            for i in range(_CMS_D)
        ]
    )
    return (
        vocab.select("wf", F.explode(rb).alias("rb"))
        .select("rb.row_i", "rb.bucket", "wf")
        .groupBy("row_i", "bucket")
        .agg(F.sum("wf").alias("cnt"))
    )


def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch word-frequency estimation validated against
    the exact heavy hitters: the corpus word stream folds into a
    4x1024 counter grid (hash row i buckets by md5(i || ':' || word)),
    and the top-20 exact words are then estimated as min over their 4
    counters — CMS guarantees estimate >= exact, with overflow bounded
    by the counter-grid load. Completes the sketch tier next to HLL
    (cardinality) and the binned quantile histogram (distribution).

    100 TB shape: the sketch is 4096 mergeable counters TOTAL —
    map-side partial agg shrinks every partition to <= 4096 rows
    before the single shuffle, identical to the HLL register
    argument; the exact branch exists only to quantify sketch error
    and is the piece you drop at scale. Deterministic cross-engine:
    md5 + integer hex parsing, integer counters, no floats anywhere.

    r6 rewrite (same counters, measured ~2x at sf0.1): the corpus
    folds to the word-frequency VOCAB first (one map-side-combined
    groupBy over bare words), and the 4 md5 hashes + hash-row explode
    run per DISTINCT word weighted by its count — md5 cost scales
    with |vocab|, not corpus occurrences (the Sennrich weighting
    trick bpe_merge_candidates uses). sum(weight) per (row, bucket)
    equals the per-occurrence count(*) exactly, so the sketch is
    bit-identical.
    """
    d = spread(_L(spark, sf_dir, "documents"), "doc_id")
    words = d.filter(F.col("text").isNotNull()).select(
        F.explode(F.split("text", " ")).alias("word")
    )
    # ONE corpus-scale word aggregation, materialized: both consumers
    # (exact top-20 branch, weighted sketch branch) read the pinned
    # vocab-scale frame instead of re-running the corpus shuffle —
    # Catalyst's ReuseExchange does not fire across these two AQE
    # subtrees (verified empirically r7), so the reuse is made
    # explicit. localCheckpoint cost is vocab-scale, bounded by
    # language, at any corpus size.
    vocab = (
        words.groupBy("word").agg(F.count("*").alias("n_exact")).localCheckpoint()
    )
    sketch = cms_sketch_counters(
        vocab.select("word", F.col("n_exact").alias("wf")), weighted=True
    )

    wtop = Window.orderBy(F.desc("n_exact"), F.asc("word"))
    top = vocab.withColumn("rk", F.row_number().over(wtop)).filter(
        F.col("rk") <= 20
    )
    probes = []
    for i in range(_CMS_D):
        h = F.md5(F.concat(F.lit(f"{i}:"), F.col("word")))
        probes.append(
            top.select(
                "word",
                "n_exact",
                "rk",
                F.lit(i).alias("row_i"),
                (_hex3_to_int_spark(h) % _CMS_W).alias("bucket"),
            )
        )
    pr = probes[0]
    for p in probes[1:]:
        pr = pr.unionByName(p)
    est = (
        pr.join(sketch, ["row_i", "bucket"])
        .groupBy("word", "n_exact", "rk")
        .agg(F.min("cnt").alias("cms_estimate"))
    )
    return est.select(
        "word",
        "n_exact",
        "cms_estimate",
        (F.col("cms_estimate") - F.col("n_exact")).alias("overcount"),
    ).orderBy(F.desc("n_exact"), F.asc("word"))


def _cms_sql() -> str:
    # mirrors the r6 vocab-weighted plan: hash per DISTINCT word,
    # weight by its count — counters identical to per-occurrence
    rows = "\nUNION ALL\n".join(
        f"SELECT {i} AS row_i, "
        + _hex3_to_int_sql(f"md5('{i}:' || word)")
        + f" % {_CMS_W} AS bucket, n_exact FROM vocab"
        for i in range(_CMS_D)
    )
    probe_rows = "\nUNION ALL\n".join(
        f"SELECT word, n_exact, {i} AS row_i, "
        + _hex3_to_int_sql(f"md5('{i}:' || word)")
        + f" % {_CMS_W} AS bucket FROM top"
        for i in range(_CMS_D)
    )
    return f"""
WITH words AS (
  SELECT unnest(string_split(text, ' ')) AS word
  FROM documents WHERE text IS NOT NULL),
vocab AS (
  SELECT word, count(*) AS n_exact FROM words GROUP BY 1),
hashed AS ({rows}),
sketch AS (
  SELECT row_i, bucket, sum(n_exact) AS cnt FROM hashed GROUP BY 1, 2),
top AS (
  SELECT word, n_exact FROM (
    SELECT word, n_exact,
           row_number() OVER (ORDER BY n_exact DESC, word ASC) AS rk
    FROM vocab)
  WHERE rk <= 20),
probes AS ({probe_rows}),
est AS (
  SELECT p.word, p.n_exact, min(s.cnt) AS cms_estimate
  FROM probes p JOIN sketch s USING (row_i, bucket)
  GROUP BY 1, 2)
SELECT word, CAST(n_exact AS BIGINT) AS n_exact,
       CAST(cms_estimate AS BIGINT) AS cms_estimate,
       CAST(cms_estimate - n_exact AS BIGINT) AS overcount
FROM est ORDER BY n_exact DESC, word ASC
"""


CMS_HEAVY_HITTERS_SQL = _cms_sql()


# ------------------------------------------------------------------
# Fixed-bin quantile histogram (mergeable distribution sketch)
# ------------------------------------------------------------------

# 0.5-wide bins over [0, 500): events.value spans ~0..490 in the
# synthetic data; values outside clamp into the edge bins (the
# estimate degrades gracefully instead of erroring)
_QBIN_W = 0.5
_QBIN_N = 1000


def value_quantiles_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate per-event-type quantiles from a fixed 1000-bin
    histogram — the mergeable-sketch answer to percentile at scale
    (exact percentile shuffles every value; the histogram is <= 1000
    integer counters per group, map-side combinable, and its error is
    bounded by the bin width). Reports the binned p50/p90/p99 (lower
    edge of the bin where the cumulative count crosses the rank) next
    to the exact interpolated percentile, so the catalog query itself
    quantifies the sketch's error.

    Integer-exact determinism: bin assignment is floor(value/width)
    clamped, ranks are ceil-integer thresholds, and the reported edge
    is bin * width on a fixed grid — no transcendental, no float
    summation ordering anywhere (exact branch aside, which reuses the
    percentile parity already proven by price_percentiles).
    """
    ev = _L(spark, sf_dir, "events").select("event_type", "value")
    b = F.least(
        F.greatest(F.floor(F.col("value") / F.lit(_QBIN_W)), F.lit(0)),
        F.lit(_QBIN_N - 1),
    ).cast("long")
    hist = (
        ev.filter(F.col("value").isNotNull())
        .select("event_type", b.alias("bin"))
        .groupBy("event_type", "bin")
        .agg(F.count("*").alias("cnt"))
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy("event_type")
    cum = hist.select(
        "event_type",
        "bin",
        F.sum("cnt").over(wcum).alias("cum"),
        F.sum("cnt").over(wtot).alias("n"),
    )

    def edge(q: float):
        # smallest bin whose cumulative count reaches ceil(q * n)
        need = F.ceil(F.lit(q) * F.col("n"))
        return F.min(F.when(F.col("cum") >= need, F.col("bin"))) * F.lit(_QBIN_W)

    ex = ev.groupBy("event_type").agg(
        fround(F.expr("percentile(value, 0.5)"), 4).alias("p50_exact"),
        fround(F.expr("percentile(value, 0.9)"), 4).alias("p90_exact"),
    )
    out = cum.groupBy("event_type").agg(
        F.max("n").alias("n"),
        fround(edge(0.5), 4).alias("p50_binned"),
        fround(edge(0.9), 4).alias("p90_binned"),
        fround(edge(0.99), 4).alias("p99_binned"),
    )
    return (
        out.join(F.broadcast(ex), "event_type")
        .select(
            "event_type", "n", "p50_binned", "p90_binned", "p99_binned",
            "p50_exact", "p90_exact",
        )
        .orderBy("event_type")
    )


VALUE_QUANTILES_BINNED_SQL = f"""
WITH hist AS (
  SELECT event_type,
         CAST(least(greatest(floor(value / {_QBIN_W!r}), 0), {_QBIN_N - 1}) AS BIGINT) AS bin,
         count(*) AS cnt
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
cum AS (
  SELECT event_type, bin,
         sum(cnt) OVER (PARTITION BY event_type ORDER BY bin
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(cnt) OVER (PARTITION BY event_type) AS n
  FROM hist),
binned AS (
  SELECT event_type, CAST(max(n) AS BIGINT) AS n,
         {sql_round(f'min(CASE WHEN cum >= ceil(0.5 * n) THEN bin END) * {_QBIN_W!r}', 4)} AS p50_binned,
         {sql_round(f'min(CASE WHEN cum >= ceil(0.9 * n) THEN bin END) * {_QBIN_W!r}', 4)} AS p90_binned,
         {sql_round(f'min(CASE WHEN cum >= ceil(0.99 * n) THEN bin END) * {_QBIN_W!r}', 4)} AS p99_binned
  FROM cum GROUP BY 1),
ex AS (
  SELECT event_type,
         {sql_round('quantile_cont(value, 0.5)', 4)} AS p50_exact,
         {sql_round('quantile_cont(value, 0.9)', 4)} AS p90_exact
  FROM events GROUP BY 1)
SELECT b.event_type, b.n, b.p50_binned, b.p90_binned, b.p99_binned,
       e.p50_exact, e.p90_exact
FROM binned b JOIN ex e USING (event_type)
ORDER BY event_type
"""




def hll_cumulative_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct-users-to-date per (event_type, day),
    computed the way a 100 TB warehouse actually does it: each day
    contributes a 256-register HLL table, and the to-date estimate is
    a forward-filled max-merge over the day axis — day N's answer
    never rescans days 1..N-1, it merges N tiny register tables (the
    incremental-sketch-column pattern; contrast exact cumulative
    count-distinct, whose state grows with the user population).
    The exact cumulative count rides along (first-appearance day +
    running sum — itself incremental) so every row quantifies the
    sketch's error.

    Determinism: the day key is integer epoch-days from the exact
    ts_sec (no date/timezone semantics in play), the forward fill is
    a max window over integers, and the estimate reuses the shared
    dyadic-sum register algebra.
    """
    ev = _L(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.col("ts_sec") / F.lit(86400)).cast("long").alias("day"),
        F.col("user_id"),
        F.md5(F.col("user_id").cast("string")).alias("h"),
    )
    reg, rank = hll_rank_cols(F.col("h"))
    # r13: the per-day register table is pinned (bin-bounded —
    # types × days × ≤256 rows regardless of corpus size) and the
    # day/reg axes both derive from it: every (type, day) with one
    # event has at least one register row, so the distincts are
    # identical to scanning the events again. Previously `days` was a
    # separate corpus scan and `regs` re-ran the daily aggregation's
    # whole lineage — two of the query's four event passes.
    daily = (
        ev.select("event_type", "day", reg, rank)
        .groupBy("event_type", "day", "reg")
        .agg(F.max("rank").alias("m_day"))
        .localCheckpoint()
    )
    days = daily.select("event_type", "day").distinct()
    regs = daily.select("event_type", "reg").distinct()
    grid = days.join(regs, "event_type")
    g = grid.join(daily, ["event_type", "day", "reg"], "left")
    wff = (
        Window.partitionBy("event_type", "reg")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = g.select(
        "event_type", "day", "reg", F.max("m_day").over(wff).alias("m_cum")
    )
    per_day = filled.filter(F.col("m_cum").isNotNull()).groupBy(
        "event_type", "day"
    ).agg(
        F.count("*").alias("regs_used"),
        F.sum(F.pow(F.lit(2.0), -F.col("m_cum"))).alias("z_used"),
    )
    est = per_day.select(
        "event_type", "day", "regs_used", hll_estimate_col().alias("e")
    )

    firsts = ev.groupBy("event_type", "user_id").agg(F.min("day").alias("d0"))
    newu = firsts.groupBy("event_type", F.col("d0").alias("day")).agg(
        F.count("*").alias("n_new")
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    exact = (
        days.join(newu, ["event_type", "day"], "left")
        .select(
            "event_type",
            "day",
            F.sum(F.coalesce("n_new", F.lit(0))).over(wcum).cast("long").alias("n_exact_cum"),
        )
    )
    return (
        est.join(exact, ["event_type", "day"])
        .select(
            "event_type",
            "day",
            "n_exact_cum",
            "regs_used",
            fround(F.col("e"), 4).alias("hll_estimate_cum"),
        )
        .orderBy("event_type", "day")
    )


_HLL_RANK_SQL = f"""
  CASE WHEN length(regexp_extract(substring(hx, 3, 6), '^0*')) = 6
       THEN 25
       ELSE length(regexp_extract(substring(hx, 3, 6), '^0*')) * 4 + 5
            - (CASE substring(substring(hx, 3, 6) || '1',
                    length(regexp_extract(substring(hx, 3, 6), '^0*')) + 1, 1)
               WHEN '1' THEN 1 WHEN '2' THEN 2 WHEN '3' THEN 2
               ELSE CASE WHEN substring(substring(hx, 3, 6) || '1',
                         length(regexp_extract(substring(hx, 3, 6), '^0*')) + 1, 1)
                         IN ('4','5','6','7') THEN 3 ELSE 4 END END)
  END"""

HLL_CUMULATIVE_DAILY_SQL = f"""
WITH h AS (
  SELECT event_type,
         CAST(floor((epoch_ns(ts) // 1000000000) / 86400.0) AS BIGINT) AS day,
         user_id,
         md5(CAST(user_id AS VARCHAR)) AS hx
  FROM events
), rr AS (
  SELECT event_type, day, user_id,
         (instr('{_HEX}', substring(hx, 1, 1)) - 1) * 16
           + (instr('{_HEX}', substring(hx, 2, 1)) - 1) AS reg,
         {_HLL_RANK_SQL} AS rank
  FROM h
), daily AS (
  SELECT event_type, day, reg, max(rank) AS m_day
  FROM rr GROUP BY 1, 2, 3
), days AS (SELECT DISTINCT event_type, day FROM rr),
regs AS (SELECT DISTINCT event_type, reg FROM daily),
grid AS (SELECT d.event_type, d.day, r.reg
         FROM days d JOIN regs r USING (event_type)),
filled AS (
  SELECT g.event_type, g.day, g.reg,
         max(dl.m_day) OVER (PARTITION BY g.event_type, g.reg
                             ORDER BY g.day
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS m_cum
  FROM grid g LEFT JOIN daily dl
    ON g.event_type = dl.event_type AND g.day = dl.day AND g.reg = dl.reg
), per_day AS (
  SELECT event_type, day, count(*) AS regs_used,
         sum(power(2.0, -m_cum)) AS z_used
  FROM filled WHERE m_cum IS NOT NULL GROUP BY 1, 2
), est AS (
  SELECT event_type, day, regs_used,
         CASE WHEN ({_HLL_ALPHA * _HLL_M * _HLL_M!r}
                    / (z_used + ({_HLL_M} - regs_used))) <= {2.5 * _HLL_M!r}
                   AND ({_HLL_M} - regs_used) > 0
              THEN {float(_HLL_M)!r} * ln({float(_HLL_M)!r}
                   / CAST({_HLL_M} - regs_used AS DOUBLE))
              ELSE {_HLL_ALPHA * _HLL_M * _HLL_M!r}
                   / (z_used + ({_HLL_M} - regs_used))
         END AS e
  FROM per_day
), firsts AS (
  SELECT event_type, user_id, min(day) AS d0 FROM h GROUP BY 1, 2
), newu AS (
  SELECT event_type, d0 AS day, count(*) AS n_new FROM firsts GROUP BY 1, 2
), exact AS (
  SELECT d.event_type, d.day,
         CAST(sum(coalesce(n.n_new, 0)) OVER (
           PARTITION BY d.event_type ORDER BY d.day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS n_exact_cum
  FROM days d LEFT JOIN newu n USING (event_type, day)
)
SELECT e.event_type, e.day, x.n_exact_cum, e.regs_used,
       {sql_round('e.e', 4)} AS hll_estimate_cum
FROM est e JOIN exact x USING (event_type, day)
ORDER BY event_type, day
"""




def referential_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table consistency audit: orphaned lineitems (no parent
    order), childless orders (no lineitems), and the healthy overlap
    — the referential-integrity report an ingest gate runs before
    promoting a batch (deequ/constraint-suite shape; the reference
    trusts its loader, a 100 TB lake cannot).

    One full-outer join on the key, classified with conditional
    counts — same single-join shape as the CDC snapshot diff; both
    sides pre-aggregate to key cardinality before joining, so the
    join never carries fact-row width.
    """
    o = _L(spark, sf_dir, "orders").groupBy("o_orderkey").agg(
        F.count("*").alias("n_o")
    )
    li = _L(spark, sf_dir, "lineitem").groupBy("l_orderkey").agg(
        F.count("*").alias("n_l")
    )
    j = o.join(li, o.o_orderkey == li.l_orderkey, "full_outer")
    return j.agg(
        F.sum(F.when(F.col("n_l").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("childless_orders"),
        F.sum(F.when(F.col("n_o").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("orphaned_lineitem_keys"),
        F.sum(F.when(F.col("n_o").isNotNull() & F.col("n_l").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("matched_keys"),
        F.coalesce(F.sum(F.when(F.col("n_o").isNull(), F.col("n_l"))), F.lit(0))
        .cast("long")
        .alias("orphaned_lineitem_rows"),
    )


REFERENTIAL_INTEGRITY_AUDIT_SQL = """
WITH o AS (SELECT o_orderkey, count(*) AS n_o FROM orders GROUP BY 1),
l AS (SELECT l_orderkey, count(*) AS n_l FROM lineitem GROUP BY 1),
j AS (SELECT o.o_orderkey, o.n_o, l.n_l
      FROM o FULL OUTER JOIN l ON o.o_orderkey = l.l_orderkey)
SELECT CAST(sum(CASE WHEN n_l IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS childless_orders,
       CAST(sum(CASE WHEN n_o IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS orphaned_lineitem_keys,
       CAST(sum(CASE WHEN n_o IS NOT NULL AND n_l IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS matched_keys,
       CAST(coalesce(sum(CASE WHEN n_o IS NULL THEN n_l END), 0) AS BIGINT)
         AS orphaned_lineitem_rows
FROM j
"""




# ------------------------------------------------------------------
# HLL set algebra (r7): mergeable-sketch UNION via register max-merge
# and INTERSECTION via inclusion-exclusion — the set-operation layer
# a segment-overlap / audience-sizing workload runs on top of the
# per-key sketches, validated against exact intersections.
# ------------------------------------------------------------------

# (set_name, membership predicate) — three partially-overlapping sets
# over event ids: two disjoint type slices plus a value band that
# cuts across both, so the report exercises near-zero AND substantial
# intersections in one result
_HLL_SETS: tuple[tuple[str, str], ...] = (
    ("error_events", "event_type = 'error'"),
    ("high_value_events", "value > 34.0"),
    ("purchase_events", "event_type = 'purchase'"),
)
_HLL_SET_PAIRS: tuple[tuple[str, str], ...] = (
    ("error_events", "high_value_events"),
    ("error_events", "purchase_events"),
    ("high_value_events", "purchase_events"),
)


def _hll_rank_sql(src_cte: str) -> str:
    """rr/regs CTE chain over a (set_name, hx) CTE named `src_cte` —
    the DuckDB mirror of hll_rank_cols, keyed by set_name."""
    z = f"length(regexp_extract(substring(hx, 3, 6), '^0*'))"
    d = f"substring(substring(hx, 3, 6) || '1', {z} + 1, 1)"
    return f"""rr AS (
  SELECT set_name,
         (instr('{_HEX}', substring(hx, 1, 1)) - 1) * 16
           + (instr('{_HEX}', substring(hx, 2, 1)) - 1) AS reg,
         CASE WHEN {z} = 6 THEN 25
              ELSE {z} * 4 + 5
                   - (CASE {d}
                      WHEN '1' THEN 1 WHEN '2' THEN 2 WHEN '3' THEN 2
                      ELSE CASE WHEN {d} IN ('4','5','6','7')
                                THEN 3 ELSE 4 END END)
         END AS rank
  FROM {src_cte}),
regs AS (
  SELECT set_name, reg, max(rank) AS m_j FROM rr GROUP BY 1, 2)"""


_HLL_EST_E4_SQL = (
    f"CAST(floor((CASE WHEN ({_HLL_ALPHA * _HLL_M * _HLL_M!r}"
    f" / (z_used + ({_HLL_M} - regs_used))) <= {2.5 * _HLL_M!r}"
    f" AND ({_HLL_M} - regs_used) > 0"
    f" THEN {float(_HLL_M)!r} * ln({float(_HLL_M)!r}"
    f" / CAST({_HLL_M} - regs_used AS DOUBLE))"
    f" ELSE {_HLL_ALPHA * _HLL_M * _HLL_M!r}"
    f" / (z_used + ({_HLL_M} - regs_used)) END) * 10000.0 + 0.5) AS BIGINT)"
)


def hll_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch set algebra over three event-id sets (two disjoint
    event-type slices + a value band overlapping both): per-pair
    UNION cardinality from max-merged registers — the only set
    operation HLL registers support natively, and the reason the
    sketch composes across partitions/days/segments for free — and
    INTERSECTION via inclusion-exclusion est(A)+est(B)-est(A∪B),
    next to exact counts for error measurement. Estimates are
    integer 1e-4 units so the arithmetic (including the possibly
    NEGATIVE inclusion-exclusion estimate on near-disjoint pairs —
    the textbook caveat, reported as-is) is engine-exact.

    100 TB shape: set membership is one scan (a 3-way CASE explode,
    no per-set passes); registers are ≤ {_HLL_M} rows per set and
    every downstream op (pair tagging, union max-merge, estimates)
    is over KB-scale frames. The exact branch (distinct ids +
    pair self-join) exists to measure sketch error and is the piece
    you drop at scale — the same split hll_distinct_users documents.
    """
    ev = _L(spark, sf_dir, "events")
    tagged = ev.select(
        F.explode(
            F.array(
                *[F.when(F.expr(cond), F.lit(name)) for name, cond in _HLL_SETS]
            )
        ).alias("set_name"),
        F.col("event_id"),
    ).filter(F.col("set_name").isNotNull())
    regs = hll_registers_for(
        tagged.select(
            "set_name", F.md5(F.col("event_id").cast("string")).alias("h")
        ),
        key="set_name",
    ).localCheckpoint()  # ≤ 3·256 rows; reused by 3 downstream branches

    est_e4 = F.floor(hll_estimate_col() * F.lit(10000.0) + F.lit(0.5)).cast("long")

    def estimates(reg_df: DataFrame, keys: list[str]) -> DataFrame:
        return (
            reg_df.groupBy(*keys)
            .agg(
                F.count("*").alias("regs_used"),
                F.sum(F.pow(F.lit(2.0), -F.col("m_j"))).alias("z_used"),
            )
            .select(*keys, est_e4.alias("est_e4"))
        )

    per_set = estimates(regs, ["set_name"])
    pair_df = spark.createDataFrame(
        list(_HLL_SET_PAIRS), "set_a string, set_b string"
    )
    both_sides = (
        F.broadcast(pair_df)
        .join(regs, regs.set_name == pair_df.set_a)
        .select("set_a", "set_b", "reg", "m_j")
        .unionByName(
            F.broadcast(pair_df)
            .join(regs, regs.set_name == pair_df.set_b)
            .select("set_a", "set_b", "reg", "m_j")
        )
    )
    union_regs = both_sides.groupBy("set_a", "set_b", "reg").agg(
        F.max("m_j").alias("m_j")
    )
    union_est = estimates(union_regs, ["set_a", "set_b"]).withColumnRenamed(
        "est_e4", "est_union_e4"
    )

    members = tagged.select("set_name", "event_id").distinct()
    exact_sets = members.groupBy("set_name").agg(
        F.count("*").cast("long").alias("n_exact")
    )
    a = members.select(
        F.col("set_name").alias("ia"), F.col("event_id").alias("eid")
    )
    b = members.select(
        F.col("set_name").alias("ib"), F.col("event_id").alias("eid")
    )
    exact_inter = (
        a.join(b, "eid")
        .filter(F.col("ia") < F.col("ib"))
        .groupBy("ia", "ib")
        .agg(F.count("*").cast("long").alias("n_exact_inter"))
    )

    out = (
        pair_df.join(
            F.broadcast(per_set.select(F.col("set_name").alias("set_a"),
                                       F.col("est_e4").alias("est_a_e4"))),
            "set_a",
        )
        .join(
            F.broadcast(per_set.select(F.col("set_name").alias("set_b"),
                                       F.col("est_e4").alias("est_b_e4"))),
            "set_b",
        )
        .join(F.broadcast(union_est), ["set_a", "set_b"])
        .join(
            F.broadcast(exact_sets.select(F.col("set_name").alias("set_a"),
                                          F.col("n_exact").alias("n_exact_a"))),
            "set_a",
        )
        .join(
            F.broadcast(exact_sets.select(F.col("set_name").alias("set_b"),
                                          F.col("n_exact").alias("n_exact_b"))),
            "set_b",
        )
        .join(
            exact_inter,
            (F.col("set_a") == F.col("ia")) & (F.col("set_b") == F.col("ib")),
            "left",
        )
    )
    return out.select(
        "set_a",
        "set_b",
        "n_exact_a",
        "n_exact_b",
        F.coalesce("n_exact_inter", F.lit(0)).alias("n_exact_inter"),
        "est_a_e4",
        "est_b_e4",
        "est_union_e4",
        (F.col("est_a_e4") + F.col("est_b_e4") - F.col("est_union_e4")).alias(
            "est_inter_e4"
        ),
    ).orderBy("set_a", "set_b")


_HLL_SETS_SRC_SQL = "\nUNION ALL\n".join(
    f"SELECT '{name}' AS set_name, md5(CAST(event_id AS VARCHAR)) AS hx, event_id "
    f"FROM events WHERE {cond}"
    for name, cond in _HLL_SETS
)
_HLL_PAIRS_SQL = ",\n  ".join(f"('{a}', '{b}')" for a, b in _HLL_SET_PAIRS)

HLL_SET_ALGEBRA_SQL = f"""
WITH src AS ({_HLL_SETS_SRC_SQL}),
{_hll_rank_sql("src")},
pairs AS (SELECT * FROM (VALUES
  {_HLL_PAIRS_SQL}) AS t(set_a, set_b)),
per_set_agg AS (
  SELECT set_name, count(*) AS regs_used,
         sum(power(2.0, -m_j)) AS z_used
  FROM regs GROUP BY 1),
per_set AS (
  SELECT set_name, {_HLL_EST_E4_SQL} AS est_e4 FROM per_set_agg),
union_regs AS (
  SELECT set_a, set_b, reg, max(m_j) AS m_j FROM (
    SELECT p.set_a, p.set_b, r.reg, r.m_j
    FROM pairs p JOIN regs r ON r.set_name = p.set_a
    UNION ALL
    SELECT p.set_a, p.set_b, r.reg, r.m_j
    FROM pairs p JOIN regs r ON r.set_name = p.set_b)
  GROUP BY 1, 2, 3),
union_agg AS (
  SELECT set_a, set_b, count(*) AS regs_used,
         sum(power(2.0, -m_j)) AS z_used
  FROM union_regs GROUP BY 1, 2),
union_est AS (
  SELECT set_a, set_b, {_HLL_EST_E4_SQL} AS est_union_e4 FROM union_agg),
members AS (SELECT DISTINCT set_name, event_id FROM src),
exact_sets AS (
  SELECT set_name, CAST(count(*) AS BIGINT) AS n_exact FROM members GROUP BY 1),
exact_inter AS (
  SELECT a.set_name AS set_a, b.set_name AS set_b,
         CAST(count(*) AS BIGINT) AS n_exact_inter
  FROM members a JOIN members b ON a.event_id = b.event_id
  WHERE a.set_name < b.set_name
  GROUP BY 1, 2)
SELECT p.set_a, p.set_b,
       ea.n_exact AS n_exact_a, eb.n_exact AS n_exact_b,
       CAST(coalesce(i.n_exact_inter, 0) AS BIGINT) AS n_exact_inter,
       sa.est_e4 AS est_a_e4, sb.est_e4 AS est_b_e4,
       u.est_union_e4,
       sa.est_e4 + sb.est_e4 - u.est_union_e4 AS est_inter_e4
FROM pairs p
JOIN per_set sa ON sa.set_name = p.set_a
JOIN per_set sb ON sb.set_name = p.set_b
JOIN union_est u USING (set_a, set_b)
JOIN exact_sets ea ON ea.set_name = p.set_a
JOIN exact_sets eb ON eb.set_name = p.set_b
LEFT JOIN exact_inter i ON i.set_a = p.set_a AND i.set_b = p.set_b
ORDER BY p.set_a, p.set_b
"""




def cms_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based JOIN-SIZE estimation (the AMS/Count-Min inner
    product, Alon-Matias-Szegedy / Cormode-Muthukrishnan): the join
    cardinality |A ⋈_k B| = Σ_k f_A(k)·f_B(k) is estimated as
    min over the {_CMS_D} hash rows of Σ_buckets cntA·cntB — each
    side sketched INDEPENDENTLY into its 4×{_CMS_W} counter grid,
    which is what makes this the join-planning primitive for a
    distributed optimizer: sides sketched where they live, only
    8 KB of counters meet. Estimate ≥ exact always (collision terms
    only add), overcount bounded by ‖A‖₁‖B‖₁/{_CMS_W}.

    Two join shapes over the same machinery:
    * orders ⋈ lineitem ON orderkey — FK join with real multiplicity
      on the lineitem side;
    * lineitem ⋈ lineitem ON suppkey — the SELF-join size, i.e. the
      second frequency moment F₂, the classic AMS target and the
      skew statistic a planner reads before choosing a salted join
      (operators/skew.py).

    All-integer math end to end. 100 TB shape: each side's counters
    are one map-side-combined aggregate over DISTINCT keys weighted
    by frequency (the cms_heavy_hitters trick); the inner product
    joins two ≤4096-row frames. The exact branch (key-cardinality
    join of per-key counts) exists to measure error and is the piece
    you drop at scale.
    """
    orders_keys = (
        _L(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderkey").cast("string").alias("word"))
        .agg(F.count("*").cast("long").alias("wf"))
    )
    li = _L(spark, sf_dir, "lineitem")
    li_orderkeys = (
        li.groupBy(F.col("l_orderkey").cast("string").alias("word"))
        .agg(F.count("*").cast("long").alias("wf"))
    )
    li_suppkeys = (
        li.groupBy(F.col("l_suppkey").cast("string").alias("word"))
        .agg(F.count("*").cast("long").alias("wf"))
    )

    def inner_product(a: DataFrame, b: DataFrame, name: str) -> DataFrame:
        ca = cms_sketch_counters(a, weighted=True).withColumnRenamed("cnt", "ca")
        cb = cms_sketch_counters(b, weighted=True).withColumnRenamed("cnt", "cb")
        return (
            ca.join(cb, ["row_i", "bucket"])
            .groupBy("row_i")
            .agg(F.sum(F.col("ca") * F.col("cb")).alias("ip"))
            .agg(F.min("ip").cast("long").alias("cms_estimate"))
            .select(F.lit(name).alias("join_name"), "cms_estimate")
        )

    def exact(a: DataFrame, b: DataFrame, name: str) -> DataFrame:
        return (
            a.join(b.withColumnRenamed("wf", "wfb"), "word")
            .agg(F.sum(F.col("wf") * F.col("wfb")).cast("long").alias("exact_size"))
            .select(F.lit(name).alias("join_name"), "exact_size")
        )

    est = inner_product(orders_keys, li_orderkeys, "orders_x_lineitem").unionByName(
        inner_product(li_suppkeys, li_suppkeys, "lineitem_selfjoin_suppkey")
    )
    ex = exact(orders_keys, li_orderkeys, "orders_x_lineitem").unionByName(
        exact(li_suppkeys, li_suppkeys, "lineitem_selfjoin_suppkey")
    )
    return (
        est.join(ex, "join_name")
        .select(
            "join_name",
            F.coalesce("exact_size", F.lit(0)).alias("exact_size"),
            "cms_estimate",
            (F.col("cms_estimate") - F.coalesce("exact_size", F.lit(0))).alias(
                "overcount"
            ),
        )
        .orderBy("join_name")
    )


def _cms_counters_sql(src: str) -> str:
    rows = "\nUNION ALL\n".join(
        f"SELECT {i} AS row_i, "
        + _hex3_to_int_sql(f"md5('{i}:' || word)")
        + f" % {_CMS_W} AS bucket, wf FROM {src}"
        for i in range(_CMS_D)
    )
    return f"SELECT row_i, bucket, CAST(sum(wf) AS BIGINT) AS cnt FROM ({rows}) GROUP BY 1, 2"


CMS_JOIN_SIZE_ESTIMATE_SQL = f"""
WITH ok AS (
  SELECT CAST(o_orderkey AS VARCHAR) AS word, CAST(count(*) AS BIGINT) AS wf
  FROM orders GROUP BY 1),
lk AS (
  SELECT CAST(l_orderkey AS VARCHAR) AS word, CAST(count(*) AS BIGINT) AS wf
  FROM lineitem GROUP BY 1),
sk AS (
  SELECT CAST(l_suppkey AS VARCHAR) AS word, CAST(count(*) AS BIGINT) AS wf
  FROM lineitem GROUP BY 1),
c_ok AS ({_cms_counters_sql("ok")}),
c_lk AS ({_cms_counters_sql("lk")}),
c_sk AS ({_cms_counters_sql("sk")}),
est1 AS (
  SELECT 'orders_x_lineitem' AS join_name,
         CAST(min(ip) AS BIGINT) AS cms_estimate
  FROM (SELECT a.row_i, sum(a.cnt * b.cnt) AS ip
        FROM c_ok a JOIN c_lk b USING (row_i, bucket) GROUP BY 1)),
est2 AS (
  SELECT 'lineitem_selfjoin_suppkey' AS join_name,
         CAST(min(ip) AS BIGINT) AS cms_estimate
  FROM (SELECT a.row_i, sum(a.cnt * b.cnt) AS ip
        FROM c_sk a JOIN c_sk b USING (row_i, bucket) GROUP BY 1)),
ex1 AS (
  SELECT 'orders_x_lineitem' AS join_name,
         CAST(coalesce(sum(a.wf * b.wf), 0) AS BIGINT) AS exact_size
  FROM ok a JOIN lk b USING (word)),
ex2 AS (
  SELECT 'lineitem_selfjoin_suppkey' AS join_name,
         CAST(coalesce(sum(a.wf * b.wf), 0) AS BIGINT) AS exact_size
  FROM sk a JOIN sk b USING (word)),
est AS (SELECT * FROM est1 UNION ALL SELECT * FROM est2),
ex AS (SELECT * FROM ex1 UNION ALL SELECT * FROM ex2)
SELECT est.join_name, ex.exact_size, est.cms_estimate,
       est.cms_estimate - ex.exact_size AS overcount
FROM est JOIN ex USING (join_name)
ORDER BY join_name
"""




_SKEW_KEYS = ("l_orderkey", "l_partkey", "l_suppkey")


def join_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-distribution skew report for the fact table's three join
    keys — the statistic that decides between a plain shuffle join,
    AQE skew splitting, and an explicit salted join
    (operators/skew.py; the measured decision table lives in
    SCALING.md). Per key: distinct-key count, max/median per-key row
    counts, the integer skew ratio max/median, and the share of rows
    owned by the single heaviest key in basis points.

    100 TB shape: one scan, three map-side-combined groupBys at key
    cardinality (a planner would sample; the full pass IS the oracle
    semantics here), then per-key-column aggregates over
    key-cardinality frames. Median via percentile on the count column
    — integer counts, so cross-engine exact.
    """
    li = _L(spark, sf_dir, "lineitem")
    outs = []
    for key in _SKEW_KEYS:
        counts = li.groupBy(F.col(key).alias("k")).agg(
            F.count("*").cast("long").alias("n")
        )
        outs.append(
            counts.agg(
                F.lit(key).alias("join_key"),
                F.count("*").cast("long").alias("n_keys"),
                F.sum("n").cast("long").alias("n_rows"),
                F.max("n").cast("long").alias("max_rows"),
                F.expr("CAST(percentile(n, 0.5) AS DOUBLE)").alias("median_rows"),
            ).select(
                "join_key",
                "n_keys",
                "n_rows",
                "max_rows",
                "median_rows",
                F.floor(
                    F.col("max_rows") / F.col("median_rows") * F.lit(100.0)
                    + F.lit(0.5)
                ).cast("long").alias("skew_ratio_pct"),
                F.floor(
                    F.col("max_rows") / F.col("n_rows") * F.lit(10000.0) + F.lit(0.5)
                ).cast("long").alias("top_key_share_bp"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("join_key")


def _skew_key_sql(key: str) -> str:
    return f"""SELECT '{key}' AS join_key,
       CAST(count(*) AS BIGINT) AS n_keys,
       CAST(sum(n) AS BIGINT) AS n_rows,
       CAST(max(n) AS BIGINT) AS max_rows,
       CAST(median(n) AS DOUBLE) AS median_rows,
       CAST(floor(max(n) / CAST(median(n) AS DOUBLE) * 100.0 + 0.5) AS BIGINT)
         AS skew_ratio_pct,
       CAST(floor(max(n) / CAST(sum(n) AS DOUBLE) * 10000.0 + 0.5) AS BIGINT)
         AS top_key_share_bp
FROM (SELECT {key}, CAST(count(*) AS BIGINT) AS n
      FROM lineitem GROUP BY 1)"""


JOIN_KEY_SKEW_PROFILE_SQL = (
    "\nUNION ALL\n".join(_skew_key_sql(k) for k in _SKEW_KEYS)
    + "\nORDER BY join_key"
)


# ------------------------------------------------------------------
# Z-order data-layout audit: min/max zone maps + file skipping
# ------------------------------------------------------------------

# ------------------------------------------------------------------
# PSI drift: numeric-feature distribution shift across time periods
# ------------------------------------------------------------------

_PSI_BIN_W = 25_000  # o_totalprice bin width (~20 bins over the range)
_PSI_SPLIT = "1998-01-01"  # reference period < split <= current


def psi_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of the order-value distribution,
    reference period (o_orderdate < {_PSI_SPLIT}) vs current, per
    order priority — the model-monitoring dashboard number for "has
    this numeric feature drifted since training": PSI =
    Σ_bins (p_i - q_i)·ln(p_i/q_i), with the usual thresholds (<0.1
    stable, 0.1–0.25 shifting, >0.25 retrain). The numeric-feature
    twin of source_kl_divergence's vocabulary drift.

    Laplace +1 smoothing over each priority's OBSERVED bin set keeps
    every ratio finite; both proportions are IEEE divisions of the
    same integers on both engines, and each bin's term is quantized
    to integer nano-nats BEFORE the per-priority sum (the micro-nat
    lesson, with 1e9 because PSI terms are O(1e-4)).

    100 TB shape: ONE map-side-combined shuffle to (priority, bin)
    counters — the histogram sketch tier's shape; periods fold in the
    same pass via conditional sums (no second scan, no join between
    period scans); everything after is ≤ |priorities|·|bins| rows.
    The fixed-width grid makes period histograms mergeable, so a
    daily PSI against a frozen reference is counter addition, not a
    rescan of the reference.
    """
    o = spread(_L(spark, sf_dir, "orders"), "o_orderkey")
    binned = o.select(
        "o_orderpriority",
        F.floor(F.col("o_totalprice") / _PSI_BIN_W).cast("long").alias("bin"),
        (F.col("o_orderdate") < F.lit(_PSI_SPLIT)).cast("int").alias("is_ref"),
    )
    cnt = binned.groupBy("o_orderpriority", "bin").agg(
        F.sum("is_ref").alias("c_ref"),
        F.sum(1 - F.col("is_ref")).alias("c_cur"),
    )
    # per-priority totals via a window over the COUNTER frame (≤
    # |priorities|·|bins| rows) — not a second scan or a self-join of
    # the aggregation subtree (the value_quantiles_binned discipline)
    wp = Window.partitionBy("o_orderpriority")
    j = cnt.select(
        "o_orderpriority",
        "bin",
        "c_ref",
        "c_cur",
        F.sum("c_ref").over(wp).alias("n_ref"),
        F.sum("c_cur").over(wp).alias("n_cur"),
        F.count("*").over(wp).alias("b"),
    )
    p = (F.col("c_ref") + 1).cast("double") / (F.col("n_ref") + F.col("b")).cast(
        "double"
    )
    q = (F.col("c_cur") + 1).cast("double") / (F.col("n_cur") + F.col("b")).cast(
        "double"
    )
    term = F.floor((p - q) * F.log(p / q) * 1e9 + F.lit(0.5)).cast("long")
    agg = j.select("o_orderpriority", "n_ref", "n_cur", "b", term.alias("t")).groupBy(
        "o_orderpriority"
    ).agg(
        F.max("n_ref").cast("long").alias("n_ref"),
        F.max("n_cur").cast("long").alias("n_cur"),
        F.max("b").cast("long").alias("bins_used"),
        F.sum("t").alias("psi_nano"),
    )
    return agg.select(
        "o_orderpriority",
        "n_ref",
        "n_cur",
        "bins_used",
        fround(F.col("psi_nano") / F.lit(1e9), 6).alias("psi"),
    )


PSI_VALUE_DRIFT_SQL = f"""
WITH binned AS (
  SELECT o_orderpriority,
         CAST(floor(o_totalprice / {_PSI_BIN_W}) AS BIGINT) AS bin,
         CASE WHEN o_orderdate < DATE '{_PSI_SPLIT}' THEN 1 ELSE 0 END AS is_ref
  FROM orders),
cnt AS (
  SELECT o_orderpriority, bin,
         sum(is_ref) AS c_ref, sum(1 - is_ref) AS c_cur
  FROM binned GROUP BY 1, 2),
tot AS (
  SELECT o_orderpriority, sum(c_ref) AS n_ref, sum(c_cur) AS n_cur,
         count(*) AS b
  FROM cnt GROUP BY 1),
terms AS (
  SELECT c.o_orderpriority, t.n_ref, t.n_cur, t.b,
         CAST(floor(
           (CAST(c.c_ref + 1 AS DOUBLE) / CAST(t.n_ref + t.b AS DOUBLE)
            - CAST(c.c_cur + 1 AS DOUBLE) / CAST(t.n_cur + t.b AS DOUBLE))
           * ln((CAST(c.c_ref + 1 AS DOUBLE) / CAST(t.n_ref + t.b AS DOUBLE))
                / (CAST(c.c_cur + 1 AS DOUBLE) / CAST(t.n_cur + t.b AS DOUBLE)))
           * 1000000000.0 + 0.5) AS BIGINT) AS t
  FROM cnt c JOIN tot t ON c.o_orderpriority = t.o_orderpriority)
SELECT o_orderpriority,
       CAST(max(n_ref) AS BIGINT) AS n_ref,
       CAST(max(n_cur) AS BIGINT) AS n_cur,
       CAST(max(b) AS BIGINT) AS bins_used,
       floor((sum(t) / 1000000000.0) * 1000000.0 + 0.5) / 1000000.0 AS psi
FROM terms GROUP BY 1
"""


_Z_BITS = 16  # per-dimension bits; z fits 32 bits, stays in BIGINT
_Z_NFILES = 64
# sample predicates: one per dimension, so the report shows the
# layout trade-off — the time-append layout prunes date queries
# perfectly and customer queries not at all; Z-order prunes BOTH
_Z_CUST_LO, _Z_CUST_HI = 100, 199
_Z_DAY_LO, _Z_DAY_HI = 731, 820  # 1997-01-01 .. 1997-03-31
_Z_EPOCH = "1995-01-01"


def _z_interleave(xc: str, yc: str, duck: bool) -> str:
    """Bit-interleave expression (x gets odd bit positions): identical
    integer arithmetic on both engines, unrolled over _Z_BITS."""
    shr = (lambda c, k: f"({c} >> {k})") if duck else (
        lambda c, k: f"shiftright({c}, {k})"
    )
    terms = []
    for k in range(_Z_BITS):
        terms.append(f"({shr(xc, k)} & 1) * {1 << (2 * k + 1)}")
        terms.append(f"({shr(yc, k)} & 1) * {1 << (2 * k)}")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def zorder_layout_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-layout engineering audit: lay `orders` out twice — the
    naive time-append layout (files in o_orderdate order) and a
    Z-ORDER layout (files in interleaved-bit order over (o_custkey,
    day)) — build each file's min/max zone map, and report how many
    files a single-dimension predicate can SKIP under each layout.
    This is the min/max-pruning story every lakehouse engine
    (Delta/Iceberg data skipping, Parquet row-group stats) lives on:
    the time-append layout answers date predicates with ~4% of files
    but must read EVERY file for a customer predicate, while the
    Z-order layout bounds both dimensions per file and prunes both
    predicate families.

    Output: one row per (layout, predicate) with files_total,
    files_scanned (zone-map overlap count), rows_scanned (sum of
    scanned files' rows) and rows_matching (true selectivity — layout
    invariant, so it doubles as a cross-layout consistency check).

    Determinism: file assignment is ntile({_Z_NFILES}) over a total
    order with a unique tiebreak (z, o_orderkey) — identical on both
    engines. On a cluster the global-order window is the one
    non-scalable piece; the production write path is
    `repartitionByRange({_Z_NFILES}, z).sortWithinPartitions(z)`
    (same file boundaries up to range-sampling), where the zone map
    comes from parquet footer stats instead of an explicit groupBy —
    the audit keeps the ntile form so the DuckDB oracle can replay
    the exact same layout.

    100 TB shape: the z-value is a row-local integer projection; the
    per-file zone map is a {_Z_NFILES}-group aggregate; the report is
    arithmetic over a {_Z_NFILES}-row frame. Nothing here is
    corpus-scale except the one layout sort every real table write
    pays anyway.
    """
    o = spread(_L(spark, sf_dir, "orders"), "o_orderkey")
    day = f"datediff(CAST(o_orderdate AS DATE), DATE '{_Z_EPOCH}')"
    base = o.select(
        "o_orderkey",
        F.expr("o_custkey & 65535").alias("x"),
        F.expr(f"{day} & 65535").alias("y"),
        F.expr(
            _z_interleave("(o_custkey & 65535)", f"({day} & 65535)", duck=False)
        ).alias("z"),
    )
    wz = Window.orderBy("z", "o_orderkey")
    wl = Window.orderBy("y", "o_orderkey")
    melted = base.select(
        F.lit("zorder").alias("layout"),
        F.ntile(_Z_NFILES).over(wz).alias("file_id"),
        "x",
        "y",
    ).unionByName(
        base.select(
            F.lit("linear").alias("layout"),
            F.ntile(_Z_NFILES).over(wl).alias("file_id"),
            "x",
            "y",
        )
    )
    cust_hit = (F.col("x") >= _Z_CUST_LO) & (F.col("x") <= _Z_CUST_HI)
    date_hit = (F.col("y") >= _Z_DAY_LO) & (F.col("y") <= _Z_DAY_HI)
    zones = melted.groupBy("layout", "file_id").agg(
        F.min("x").alias("x_min"),
        F.max("x").alias("x_max"),
        F.min("y").alias("y_min"),
        F.max("y").alias("y_max"),
        F.count("*").alias("rows"),
        F.sum(cust_hit.cast("long")).alias("m_cust"),
        F.sum(date_hit.cast("long")).alias("m_date"),
    )
    # r13 (guide §2.4): ONE aggregation over zones answers both
    # predicates — each file row melts into a (predicate, scan-hit,
    # match-count) pair and a single groupBy(layout, predicate)
    # produces all four report rows. The previous two-aggregation
    # union consumed `zones` twice, re-running the two global ntile
    # window sorts per branch (the whole corpus-scale piece of this
    # audit, twice). Same rows, same values.
    preds = []
    for pred, lo, hi, dim, mcol in (
        ("custkey", _Z_CUST_LO, _Z_CUST_HI, "x", "m_cust"),
        ("orderdate", _Z_DAY_LO, _Z_DAY_HI, "y", "m_date"),
    ):
        scan = (F.col(f"{dim}_max") >= lo) & (F.col(f"{dim}_min") <= hi)
        preds.append(
            F.struct(
                F.lit(pred).alias("predicate"),
                scan.cast("long").alias("scanned"),
                F.when(scan, F.col("rows")).otherwise(0).alias("rscan"),
                F.col(mcol).alias("m"),
            )
        )
    out = (
        zones.select("layout", "rows", F.explode(F.array(*preds)).alias("e"))
        .groupBy("layout", F.col("e.predicate").alias("predicate"))
        .agg(
            F.count("*").cast("long").alias("files_total"),
            F.sum("e.scanned").cast("long").alias("files_scanned"),
            F.sum("e.rscan").cast("long").alias("rows_scanned"),
            F.sum("e.m").cast("long").alias("rows_matching"),
        )
    )
    return out.select(
        "layout", "predicate", "files_total", "files_scanned",
        "rows_scanned", "rows_matching",
    ).orderBy("layout", "predicate")


_Z_DUCK_DAY = f"date_diff('day', DATE '{_Z_EPOCH}', CAST(o_orderdate AS DATE))"

ZORDER_LAYOUT_AUDIT_SQL = f"""
WITH base AS (
  SELECT o_orderkey,
         (o_custkey & 65535) AS x,
         ({_Z_DUCK_DAY} & 65535) AS y,
         {_z_interleave("(o_custkey & 65535)", f"({_Z_DUCK_DAY} & 65535)", duck=True)} AS z
  FROM orders),
melted AS (
  SELECT 'zorder' AS layout,
         ntile({_Z_NFILES}) OVER (ORDER BY z, o_orderkey) AS file_id, x, y
  FROM base
  UNION ALL
  SELECT 'linear' AS layout,
         ntile({_Z_NFILES}) OVER (ORDER BY y, o_orderkey) AS file_id, x, y
  FROM base),
zones AS (
  SELECT layout, file_id,
         min(x) AS x_min, max(x) AS x_max,
         min(y) AS y_min, max(y) AS y_max,
         count(*) AS n_rows,
         sum(CASE WHEN x BETWEEN {_Z_CUST_LO} AND {_Z_CUST_HI}
                  THEN 1 ELSE 0 END) AS m_cust,
         sum(CASE WHEN y BETWEEN {_Z_DAY_LO} AND {_Z_DAY_HI}
                  THEN 1 ELSE 0 END) AS m_date
  FROM melted GROUP BY 1, 2)
SELECT layout, 'custkey' AS predicate,
       CAST(count(*) AS BIGINT) AS files_total,
       CAST(sum(CASE WHEN x_max >= {_Z_CUST_LO} AND x_min <= {_Z_CUST_HI}
                     THEN 1 ELSE 0 END) AS BIGINT) AS files_scanned,
       CAST(sum(CASE WHEN x_max >= {_Z_CUST_LO} AND x_min <= {_Z_CUST_HI}
                     THEN n_rows ELSE 0 END) AS BIGINT) AS rows_scanned,
       CAST(sum(m_cust) AS BIGINT) AS rows_matching
FROM zones GROUP BY 1
UNION ALL
SELECT layout, 'orderdate' AS predicate,
       CAST(count(*) AS BIGINT) AS files_total,
       CAST(sum(CASE WHEN y_max >= {_Z_DAY_LO} AND y_min <= {_Z_DAY_HI}
                     THEN 1 ELSE 0 END) AS BIGINT) AS files_scanned,
       CAST(sum(CASE WHEN y_max >= {_Z_DAY_LO} AND y_min <= {_Z_DAY_HI}
                     THEN n_rows ELSE 0 END) AS BIGINT) AS rows_scanned,
       CAST(sum(m_date) AS BIGINT) AS rows_matching
FROM zones GROUP BY 1
ORDER BY layout, predicate
"""


# ------------------------------------------------------------------
# Bloom-filter join pruning: semi-join membership without shuffling
# the fact table
# ------------------------------------------------------------------

_BLOOM_M = 4096  # bits; 128 x 32-bit words (32-bit masks avoid any
# BIGINT sign-bit divergence between engines)
_BLOOM_W = 32
_BLOOM_K = 3  # hash functions; md5('j:' || key) -> 12-bit position
_BLOOM_SEG = "BUILDING"


def _bloom_pos_spark(key, j: int):
    """Hash position 0..4095 for hash function j — the CMS md5-hex
    idiom, identical arithmetic on both engines."""
    return _hex3_to_int_spark(F.md5(F.concat(F.lit(f"{j}:"), key.cast("string"))))


def _bloom_pos_sql(key: str, j: int) -> str:
    return _hex3_to_int_sql(f"md5('{j}:' || CAST({key} AS VARCHAR))")


def bloom_bitmap(keys: DataFrame) -> DataFrame:
    """(k) -> (word, bits): the {_BLOOM_M}-bit Bloom bitmap as <=
    {_BLOOM_M // _BLOOM_W} register rows — the mergeable core shared
    by the bloom_join_prune catalog query and the streaming Bloom
    ledger (streaming/jobs.py). bit_or is associative, commutative,
    AND idempotent, so per-batch/per-partition bitmaps merge by
    OR-ing registers and replayed batches cannot corrupt the ledger
    (the HLL max-merge property, bit algebra edition)."""
    pos = keys.select(
        F.explode(
            F.array(*[_bloom_pos_spark(F.col("k"), j) for j in range(_BLOOM_K)])
        ).alias("pos")
    )
    return (
        pos.select(
            (F.col("pos") / _BLOOM_W).cast("long").alias("word"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST(pos % {_BLOOM_W} AS INT))"
            ).alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_join_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join pruning audit: build a {_BLOOM_M}-bit
    Bloom filter over the custkeys of one market segment
    ('{_BLOOM_SEG}'), probe every order against it with ZERO shuffle
    of the orders side, and report — per order priority — how many
    orders the filter passes vs how many truly belong to the
    segment, i.e. the false-positive rate the filter actually
    achieves vs its m/n design point.

    This is the join-pruning pattern every distributed engine leans
    on (Spark's runtime bloom-filter join, Parquet bloom indexes,
    semi-join pushdown): membership of a big fact table in a small
    dim subset tested by K broadcast lookups into a <=128-row bitmap
    instead of a corpus-scale shuffle-hash semi join. A Bloom pass is
    a superset of true membership (no false negatives — asserted by
    construction here since every build key sets exactly the bits the
    probe checks), so the filter can PRE-prune a shuffle join's input
    down to pass-rate x |facts| rows.

    Determinism: positions are the CMS 3-hex-digit md5 parse (0..4095)
    with 32-bit words, so register contents are identical integer
    algebra on both engines; the bitmap is built by bit_or — an
    associative, commutative, mergeable aggregate (a per-partition /
    per-batch bloom ORs into the global one, the same algebra the
    streaming ledgers use).

    100 TB shape: the build side aggregates a dim subset into <=128
    (word, bits) rows — broadcast; the probe side is {_BLOOM_K}
    broadcast hash joins plus one broadcast join for ground truth, so
    the orders scan never shuffles; the per-priority rollup is a
    <=5-key map-side-combined aggregate. At scale the ground-truth
    join disappears (it exists here to measure the fp rate) and the
    bloom test becomes a scan-stage filter ahead of the real join.
    """
    cust = _L(spark, sf_dir, "customer")
    orders = spread(_L(spark, sf_dir, "orders"), "o_orderkey")
    keys = (
        cust.filter(F.col("c_mktsegment") == _BLOOM_SEG)
        .select(F.col("c_custkey").alias("k"))
        .distinct()
    )
    # r14 (guide §2.4): the bitmap folds into ONE broadcast 1-row map
    # (word -> bits) and the _BLOOM_K probes become row-local
    # element_at lookups — replacing _BLOOM_K separate broadcast hash
    # joins (each with its own broadcast build; the old form also
    # needed a localCheckpoint pin so the K alias-renamed builds
    # wouldn't re-run the dim scan). Same left-join semantics: a
    # missing word coalesces to 0 bits, so the hit test is false —
    # identically to the old NULL-propagating join. The orders scan
    # stage is now a pure row-local filter, which is exactly the
    # 100 TB shape the docstring promises. A/B 0.85x, joins 4 -> 2.
    bm = bloom_bitmap(keys).agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("word"), F.col("bits")))
        ).alias("bloom_map")
    )
    probe = orders.select(
        "o_orderkey",
        "o_custkey",
        "o_orderpriority",
        *[
            _bloom_pos_spark(F.col("o_custkey"), j).alias(f"p{j}")
            for j in range(_BLOOM_K)
        ],
    ).crossJoin(F.broadcast(bm))
    hit = [
        F.expr(
            f"(coalesce(element_at(bloom_map, CAST(p{j} / {_BLOOM_W} AS BIGINT)),"
            f" CAST(0 AS BIGINT))"
            f" & shiftleft(CAST(1 AS BIGINT), CAST(p{j} % {_BLOOM_W} AS INT))) != 0"
        )
        for j in range(_BLOOM_K)
    ]
    flags = probe.join(
        F.broadcast(keys.withColumn("is_member", F.lit(1))),
        F.col("o_custkey") == F.col("k"),
        "left",
    ).select(
        "o_orderpriority",
        F.when(hit[0] & hit[1] & hit[2], 1).otherwise(0).alias("bloom_pass"),
        F.coalesce("is_member", F.lit(0)).alias("member"),
    )
    agg = flags.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.sum("bloom_pass").cast("long").alias("bloom_pass"),
        F.sum("member").cast("long").alias("true_match"),
    )
    return agg.select(
        "o_orderpriority",
        "n_orders",
        "bloom_pass",
        "true_match",
        (F.col("bloom_pass") - F.col("true_match")).alias("false_pos"),
        fround(
            (F.col("bloom_pass") - F.col("true_match"))
            / F.nullif(
                (F.col("n_orders") - F.col("true_match")).cast("double"), F.lit(0.0)
            ),
            6,
        ).alias("fp_rate"),
    )


_BLOOM_PROBE_COLS = ",\n         ".join(
    f"{_bloom_pos_sql('o_custkey', j)} AS p{j}" for j in range(_BLOOM_K)
)
_BLOOM_HIT = " AND ".join(
    f"((b{j}.bits & (CAST(1 AS BIGINT) << CAST(p{j} % {_BLOOM_W} AS INTEGER))) != 0"
    f" AND b{j}.bits IS NOT NULL)"
    for j in range(_BLOOM_K)
)
_BLOOM_PROBE_JOINS = "\n  ".join(
    f"LEFT JOIN bloom b{j} ON CAST(floor(p.p{j} / {_BLOOM_W}) AS BIGINT) = b{j}.word"
    for j in range(_BLOOM_K)
)

BLOOM_JOIN_PRUNE_SQL = f"""
WITH keys AS (
  SELECT DISTINCT c_custkey AS k FROM customer
  WHERE c_mktsegment = '{_BLOOM_SEG}'),
pos AS (
  SELECT unnest([{", ".join(_bloom_pos_sql("k", j) for j in range(_BLOOM_K))}])
           AS pos
  FROM keys),
bloom AS (
  SELECT CAST(floor(pos / {_BLOOM_W}) AS BIGINT) AS word,
         bit_or(CAST(1 AS BIGINT) << CAST(pos % {_BLOOM_W} AS INTEGER)) AS bits
  FROM pos GROUP BY 1),
probe AS (
  SELECT o_orderkey, o_custkey, o_orderpriority,
         {_BLOOM_PROBE_COLS}
  FROM orders),
flags AS (
  SELECT p.o_orderpriority,
         CASE WHEN {_BLOOM_HIT} THEN 1 ELSE 0 END AS bloom_pass,
         CASE WHEN m.k IS NOT NULL THEN 1 ELSE 0 END AS member
  FROM probe p
  {_BLOOM_PROBE_JOINS}
  LEFT JOIN keys m ON p.o_custkey = m.k),
agg AS (
  SELECT o_orderpriority,
         count(*) AS n_orders,
         sum(bloom_pass) AS bloom_pass,
         sum(member) AS true_match
  FROM flags GROUP BY 1)
SELECT o_orderpriority,
       CAST(n_orders AS BIGINT) AS n_orders,
       CAST(bloom_pass AS BIGINT) AS bloom_pass,
       CAST(true_match AS BIGINT) AS true_match,
       CAST(bloom_pass - true_match AS BIGINT) AS false_pos,
       floor((bloom_pass - true_match)
             / nullif(CAST(n_orders - true_match AS DOUBLE), 0.0)
             * 1000000.0 + 0.5) / 1000000.0 AS fp_rate
FROM agg
"""


QUERIES: dict[str, QuerySpec] = {
    "hll_distinct_users": QuerySpec(
        hll_distinct_users, HLL_DISTINCT_USERS_SQL, "ext: cardinality sketch"
    ),
    "data_profile_orders": QuerySpec(
        data_profile_orders, DATA_PROFILE_ORDERS_SQL, "ext: column profiling"
    ),
    "mad_outlier_bounds": QuerySpec(
        mad_outlier_bounds, MAD_OUTLIER_BOUNDS_SQL, "ext: robust outlier fences"
    ),
    "seq_length_histogram": QuerySpec(
        seq_length_histogram, SEQ_LENGTH_HISTOGRAM_SQL, "ext: corpus length report"
    ),
    "returned_items_report": QuerySpec(
        returned_items_report, RETURNED_ITEMS_REPORT_SQL, "J4/J5+A: TPC-H Q10 shape"
    ),
    "dup_cluster_size_hist": QuerySpec(
        dup_cluster_size_hist, DUP_CLUSTER_SIZE_HIST_SQL, "ext: duplication report"
    ),
    "cms_heavy_hitters": QuerySpec(
        cms_heavy_hitters, CMS_HEAVY_HITTERS_SQL, "ext: frequency sketch"
    ),
    "value_quantiles_binned": QuerySpec(
        value_quantiles_binned, VALUE_QUANTILES_BINNED_SQL, "ext: quantile sketch"
    ),
    "hll_cumulative_daily": QuerySpec(
        hll_cumulative_daily, HLL_CUMULATIVE_DAILY_SQL, "ext: incremental sketch column"
    ),
    "hll_set_algebra": QuerySpec(
        hll_set_algebra, HLL_SET_ALGEBRA_SQL, "ext: sketch set algebra"
    ),
    "cms_join_size_estimate": QuerySpec(
        cms_join_size_estimate, CMS_JOIN_SIZE_ESTIMATE_SQL, "ext: AMS join-size sketch"
    ),
    "psi_value_drift": QuerySpec(
        psi_value_drift, PSI_VALUE_DRIFT_SQL, "drift-psi"
    ),
    "bloom_join_prune": QuerySpec(
        bloom_join_prune, BLOOM_JOIN_PRUNE_SQL, "sketch-join-prune"
    ),
    "join_key_skew_profile": QuerySpec(
        join_key_skew_profile, JOIN_KEY_SKEW_PROFILE_SQL, "ext: skew planner statistic"
    ),
    "zorder_layout_audit": QuerySpec(
        zorder_layout_audit, ZORDER_LAYOUT_AUDIT_SQL, "ext: zone-map layout audit"
    ),
    "referential_integrity_audit": QuerySpec(
        referential_integrity_audit,
        REFERENTIAL_INTEGRITY_AUDIT_SQL,
        "ext: constraint audit",
    ),
}
