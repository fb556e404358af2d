"""Persisted IVF index: build once, probe with partition pruning.

The catalog's `knn_cosine_ivf` demonstrates the IVF plan inline (one
job recomputes centroids every run). A real 100 TB deployment builds
the index ONCE and amortizes it across every query batch:

  build  — pick n_lists deterministic seed vectors, assign every
           corpus vector to its nearest seed by cosine, write the
           corpus parquet PARTITIONED BY list_id, and write the
           (tiny) centroid summary next to it;
  probe  — assign each query to its nprobe nearest centroids
           (broadcast — centroids are KBs), then scan ONLY those
           list partitions: Catalyst injects DYNAMIC partition
           pruning from the broadcast probe side
           (`PartitionFilters: [... dynamicpruningexpression(list_id
           IN ...)]`, asserted in the test), so non-probed
           directories are never read and the probe costs
           |corpus| * nprobe / n_lists bytes no matter how big the
           corpus is. Exact cosine top-k inside the probed lists.

tests/test_ann_index.py pins (1) result parity with a numpy
re-implementation restricted to the probed lists, (2) that the probe
scan's PartitionFilters actually contain list_id (the pruning is in
the plan, not just hoped for), and (3) measured recall vs global
brute force at nprobe=1 and nprobe=2.

Reference semantics anchor: the reference has no ANN surface; this
extends the training-data extension family (COVERAGE.md) with the
standard IVF-Flat layout (Johnson et al., billion-scale similarity
search) re-expressed as parquet partitioning + Catalyst pruning.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from chess_pipeline_spark.functions.rounding import fround

_DOT = (
    "aggregate(zip_with({u}, {v}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
    " CAST(0 AS DOUBLE), (a, b) -> a + b)"
)
_NORM = (
    "sqrt(aggregate({v}, CAST(0 AS DOUBLE),"
    " (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
)


def _nearest_lists(
    vecs: DataFrame, centroids: DataFrame, n: int, id_col: str
) -> DataFrame:
    """(id, embedding) x broadcast centroids -> the n nearest list ids
    per vector (cosine, rounded at 1e-9 before ranking so ties break
    identically everywhere; then lowest list_id)."""
    cos = F.expr(_DOT.format(u="embedding", v="centroid")) / (
        F.col("nrm") * F.col("c_nrm")
    )
    scored = (
        vecs.withColumn("nrm", F.expr(_NORM.format(v="embedding")))
        .crossJoin(F.broadcast(centroids))
        .select(
            id_col,
            "embedding",
            "list_id",
            fround(cos, 9).alias("c_cos"),
        )
    )
    # top-n lists per vector via max_by-style struct sort: collect the
    # (cos, -list_id) pairs and slice — centroid count is small by
    # construction, so the per-row array is bounded
    return (
        scored.groupBy(id_col)
        .agg(
            F.first("embedding").alias("embedding"),
            F.slice(
                F.reverse(
                    F.array_sort(
                        F.collect_list(
                            F.struct("c_cos", (-F.col("list_id")).alias("nl"))
                        )
                    )
                ),
                1,
                n,
            ).alias("top"),
        )
        .select(
            id_col,
            "embedding",
            F.explode(F.expr("transform(top, t -> -t.nl)")).alias("list_id"),
        )
    )


def build_ivf_index(
    corpus: DataFrame,
    out_path: str,
    n_lists: int = 8,
    id_col: str = "vec_id",
    lloyd_iterations: int = 0,
) -> None:
    """Assign every vector to its nearest centroid and persist the
    corpus partitioned by list_id (+ a centroids summary).

    Seeds are the n_lists lowest-id vectors — deterministic, no RNG
    to ship. `lloyd_iterations` optionally refines them k-means
    style: assign → recompute each list's element-wise mean →
    repeat. Each iteration is one broadcast-join assignment plus one
    narrow (list_id, dim) aggregation; a list that loses all members
    keeps its previous centroid. The final write is the only wide
    shuffle (partitioned by list).
    """
    seeds = (
        corpus.orderBy(id_col)
        .limit(n_lists)
        .select(
            F.row_number().over(Window.orderBy(id_col)).cast("long").alias("list_id"),
            F.col("embedding").alias("centroid"),
        )
        .withColumn("c_nrm", F.expr(_NORM.format(v="centroid")))
        .localCheckpoint()
    )
    vecs = corpus.select(id_col, "embedding")
    for _ in range(lloyd_iterations):
        assigned = _nearest_lists(vecs, seeds, 1, id_col)
        means = (
            assigned.select("list_id", F.posexplode("embedding").alias("i", "x"))
            .groupBy("list_id", "i")
            .agg(F.avg(F.col("x").cast("double")).alias("c"))
            .groupBy("list_id")
            .agg(F.array_sort(F.collect_list(F.struct("i", "c"))).alias("pairs"))
            .select(
                F.col("list_id").alias("m_list"),
                F.expr("transform(pairs, p -> CAST(p.c AS FLOAT))").alias("m_centroid"),
            )
        )
        seeds = (
            seeds.join(means, seeds.list_id == means.m_list, "left")
            .select(
                "list_id",
                F.coalesce(F.col("m_centroid"), F.col("centroid")).alias("centroid"),
            )
            .withColumn("c_nrm", F.expr(_NORM.format(v="centroid")))
            .localCheckpoint()
        )
    assigned = _nearest_lists(vecs, seeds, 1, id_col).withColumn(
        # norms are an index-build artifact: probes divide by them on
        # every scored pair, so compute once here, never at query time
        "nrm",
        F.expr(_NORM.format(v="embedding")),
    )
    # int8 affine codes (per-vector min/max, 256 levels): the
    # memory-side layout a billion-vector deployment actually scans —
    # 1 byte/dim in the page cache vs 4 — persisted next to the float
    # embedding so probes choose exact or coded per query batch.
    # Levels are zero-centered (level - 128) so they genuinely fit
    # TINYINT and parquet stores 1 byte/dim as advertised (an
    # unsigned 0..255 level does not fit a signed byte). The
    # flat-vector guard (mx == mn) pins scale to 1 so the transform
    # stays total.
    assigned = (
        assigned.withColumn("q_mn", F.expr("CAST(array_min(embedding) AS DOUBLE)"))
        .withColumn(
            "q_scale",
            F.expr(
                "CAST(CASE WHEN array_max(embedding) = array_min(embedding) THEN 1.0 "
                "ELSE (CAST(array_max(embedding) AS DOUBLE) - array_min(embedding)) / 255.0 "
                "END AS DOUBLE)"
            ),
        )
        .withColumn(
            "code",
            F.expr(
                "transform(embedding, x -> CAST(floor((CAST(x AS DOUBLE) - q_mn) "
                "/ q_scale + 0.5) - 128 AS TINYINT))"
            ),
        )
    )
    assigned.write.partitionBy("list_id").mode("overwrite").parquet(
        os.path.join(out_path, "lists")
    )
    seeds.write.mode("overwrite").parquet(os.path.join(out_path, "centroids"))


def probe_ivf_index(
    spark: SparkSession,
    index_path: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 1,
    id_col: str = "qid",
    coded: bool = False,
) -> DataFrame:
    """Exact top-k cosine inside the nprobe nearest lists per query.

    The returned plan scans the lists parquet with a partition filter
    on list_id — only probed directories are read. Queries broadcast
    twice (centroid assignment, then the probe join); the corpus side
    never shuffles.
    """
    centroids = spark.read.parquet(os.path.join(index_path, "centroids"))
    probed = _nearest_lists(queries, centroids, nprobe, id_col).select(
        F.col(id_col).alias("q_id"),
        F.col("embedding").alias("qe"),
        F.col("list_id").alias("probe_list"),
    ).withColumn("qnorm", F.expr(_NORM.format(v="qe")))
    lists = spark.read.parquet(os.path.join(index_path, "lists"))
    if "nrm" not in lists.columns:  # pre-r5 index layout
        lists = lists.withColumn("nrm", F.expr(_NORM.format(v="embedding")))
    if coded:
        # score against the dequantized int8 codes — the float
        # embedding column is never read (check ReadSchema), which is
        # the 4x page-cache win at scale; reconstruction error is
        # bounded by scale/2 per dimension (recall pinned in tests)
        if "code" not in lists.columns:
            raise ValueError(
                f"probe_ivf_index(coded=True): index at {index_path!r} has "
                "no 'code' column (built before int8 codes existed); "
                "rebuild with build_ivf_index or probe with coded=False"
            )
        from pyspark.sql.types import ByteType

        code_elem = lists.schema["code"].dataType.elementType
        # current layout stores zero-centered tinyint levels
        # (level-128); a pre-r6 index stored raw 0..255 ints — decode
        # each with its own affine so both layouts stay probe-able
        offset = "+ 128.0" if isinstance(code_elem, ByteType) else ""
        lists = lists.select(
            "vec_id",
            "list_id",
            F.expr(
                f"transform(code, c -> (CAST(c AS DOUBLE) {offset}) * q_scale + q_mn)"
            ).alias("embedding"),
        ).withColumn("nrm", F.expr(_NORM.format(v="embedding")))
    cos = F.expr(_DOT.format(u="qe", v="embedding")) / (
        F.col("qnorm") * F.col("nrm")
    )
    scored = (
        lists.join(
            F.broadcast(probed), lists.list_id == F.col("probe_list")
        )
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            F.col("q_id").alias("qid"),
            F.col("vec_id").alias("neighbor_id"),
            fround(cos, 6).alias("cos_sim"),
        )
        # a vector can appear via several probed lists only if the
        # index stored it twice — it does not (nprobe applies to
        # queries, each corpus vector lives in exactly one list)
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).filter(F.col("rank") <= k)
