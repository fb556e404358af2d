"""Robust per-group centroids: geometric median via Weiszfeld.

The arithmetic mean of an embedding cluster is dragged arbitrarily
far by one corrupt vector (a decode glitch, a mislabeled point); the
GEOMETRIC median — argmin_c Σ‖x_i − c‖ — has a 50% breakdown point
and is the standard robust cluster center. It has no closed form and
needs per-group iteration, which is exactly the semantics Catalyst
cannot express and the reason this operator is the repo's
grouped-map `applyInPandas` exemplar (SURVEY §2.10's surface:
scalar pandas_udf = win-prob, mapInPandas UDTF = PGN parse,
applyInPandasWithState = streaming state, grouped-map = here).

100 TB shape: one shuffle keyed on the label (the same exchange any
grouped aggregate pays); each group iterates locally in numpy over
an Arrow batch — work is O(group_size · dim · iters) with zero
cross-group coordination. Determinism: fixed iteration count and a
fixed mean start, no RNG; ties (all points identical) converge in
one step.

Groups too large for one Arrow batch take the TWO-LEVEL path
(robust_centroid_per_label_bucketed): deterministic content-hash
bucketing caps every grouped-map batch at ~group/n_buckets rows,
per-bucket Weiszfeld partials reduce each bucket to one vector, and
a count-weighted Weiszfeld merge over the <= n_buckets partials
yields the group centroid. The merge is the weighted geometric
median of the partial medians — a constant-factor approximation of
the exact objective (median-of-medians composition); the law test
bounds it at <= 2% objective excess on adversarial fixtures and
exact equality for n_buckets=1.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame

_ITERS = 32
_EPS = 1e-9


def _weiszfeld(mat, wts=None) -> "list[float]":
    """Fixed-iteration (optionally weighted) Weiszfeld: argmin_c
    Σ w_i·‖x_i − c‖, started from the weighted arithmetic mean.
    Rows are canonically sorted first so the float summation order —
    and therefore the result, bit for bit — is independent of Arrow
    batch arrival order (Spark gives no intra-group order guarantee,
    and the bucketed path's extra exchange reorders rows)."""
    import numpy as np

    if wts is None:
        wts = np.ones(len(mat))
    order = np.lexsort(np.vstack([mat.T[::-1], wts]))
    mat, wts = mat[order], wts[order]
    c = (mat * wts[:, None]).sum(axis=0) / wts.sum()
    for _ in range(_ITERS):
        d = np.sqrt(((mat - c) ** 2).sum(axis=1))
        # a point coinciding with the current estimate contributes a
        # zero distance; clamp so the weight stays finite (Vardi-Zhang
        # handling collapses to this for the fixed-iters contract)
        w = wts / np.maximum(d, _EPS)
        c = (mat * w[:, None]).sum(axis=0) / w.sum()
    return [float(x) for x in c]


def robust_centroid_per_label(
    embs: DataFrame, label_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """(label, embedding array<float|double>) -> one row per label:
    (label, centroid array<double>, n_vecs). Geometric median by
    _ITERS fixed Weiszfeld steps from the arithmetic mean."""
    spark_label_type = dict(embs.dtypes)[label_col]

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        mat = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
        return pd.DataFrame(
            {
                label_col: [pdf[label_col].iloc[0]],
                "centroid": [_weiszfeld(mat)],
                "n_vecs": [len(pdf)],
            }
        )

    from chess_pipeline_spark.deploy import ensure_package_on_executors

    ensure_package_on_executors(embs.sparkSession)
    out_schema = (
        f"{label_col} {spark_label_type}, centroid array<double>, n_vecs long"
    )
    return embs.select(label_col, vec_col).groupBy(label_col).applyInPandas(
        fold, out_schema
    )


def robust_centroid_per_label_bucketed(
    embs: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    n_buckets: int = 32,
    id_col: str | None = None,
) -> DataFrame:
    """Two-level geometric median for groups LARGER than one Arrow
    batch — the 100 TB path the single-level contract documents.

    Level 1: each row lands in a deterministic bucket and each
    (label, bucket) group folds to ONE partial: its Weiszfeld median
    + count. Every grouped-map batch is now ~group_size/n_buckets
    rows, so sizing n_buckets to the Arrow limit bounds executor
    memory regardless of group size. The bucket key mixes a per-row
    disambiguator into the content hash (the r9 ADVICE duplicate-skew
    fix): hashing the vector ALONE sends all identical vectors to one
    bucket, so a duplicate-heavy or mode-collapsed label — exactly
    the data the dedup/diversity tiers exist to catch — would still
    produce one near-group-sized Arrow batch. With `id_col` (a unique
    row id) the bucket is xxhash64(vec, id) — no extra exchange, and
    deterministic across re-runs. Without it, duplicates are spread
    round-robin via a row_number within each (label, content-hash)
    class; that costs one extra window exchange but the bucket COUNT
    assignment stays deterministic (identical rows are
    interchangeable, so which physical duplicate lands where cannot
    change any bucket's contents as a multiset).

    Level 2: per label, the <= n_buckets partials (a KB-scale frame)
    merge by COUNT-WEIGHTED Weiszfeld — the weighted geometric median
    of the partial medians. Composition is approximate (exact
    geometric medians need the full group); the law test bounds the
    objective excess vs the exact single-group result at <= 2% on
    outlier-planted fixtures, and n_buckets=1 degenerates to the
    exact path (one bucket = the whole group, and a single-row
    weighted merge returns it unchanged).

    Same output schema as robust_centroid_per_label.
    """
    import pyspark.sql.functions as F

    spark_label_type = dict(embs.dtypes)[label_col]

    def fold_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        mat = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
        return pd.DataFrame(
            {
                label_col: [pdf[label_col].iloc[0]],
                "partial": [_weiszfeld(mat)],
                "n_vecs": [len(pdf)],
            }
        )

    def merge_partials(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        mat = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["partial"]])
        wts = pdf["n_vecs"].to_numpy(dtype=np.float64)
        return pd.DataFrame(
            {
                label_col: [pdf[label_col].iloc[0]],
                "centroid": [_weiszfeld(mat, wts)],
                "n_vecs": [int(wts.sum())],
            }
        )

    from chess_pipeline_spark.deploy import ensure_package_on_executors

    ensure_package_on_executors(embs.sparkSession)
    partial_schema = (
        f"{label_col} {spark_label_type}, partial array<double>, n_vecs long"
    )
    out_schema = (
        f"{label_col} {spark_label_type}, centroid array<double>, n_vecs long"
    )
    bucketed = _bucketize(embs, label_col, vec_col, n_buckets, id_col)
    partials = bucketed.groupBy(label_col, "__bucket").applyInPandas(
        fold_bucket, partial_schema
    )
    return partials.groupBy(label_col).applyInPandas(merge_partials, out_schema)


def _bucketize(
    embs: DataFrame,
    label_col: str,
    vec_col: str,
    n_buckets: int,
    id_col: str | None,
) -> DataFrame:
    """Level-1 bucket assignment: content hash MIXED with a per-row
    disambiguator, so identical vectors spread across buckets instead
    of reuniting in one (the duplicate-skew failure the plain content
    hash had). With id_col: xxhash64(vec, id) — scan-stage projection,
    no extra exchange. Without: round-robin row_number within each
    (label, content-hash) duplicate class; identical rows are
    interchangeable, so the arbitrary intra-class order cannot change
    any bucket's multiset."""
    import pyspark.sql.functions as F

    if id_col is not None:
        return embs.select(
            label_col,
            vec_col,
            F.pmod(
                F.xxhash64(F.col(vec_col), F.col(id_col)), F.lit(n_buckets)
            ).alias("__bucket"),
        )
    from pyspark.sql import Window

    dup_rn = F.row_number().over(
        Window.partitionBy(label_col, F.xxhash64(F.col(vec_col))).orderBy(F.lit(1))
    )
    # Reduce the hash mod n_buckets BEFORE adding the row number:
    # xxhash64 is uniform over the full signed 64-bit range and Spark
    # runs ANSI mode, so `hash + rn` within row_number of Long.MAX
    # would throw ArithmeticException instead of wrapping (~2^-64 per
    # row — but a crash, not a nudge). Double-pmod is overflow-free
    # (both addends < n_buckets) and preserves the round-robin spread.
    return embs.select(label_col, vec_col).select(
        label_col,
        vec_col,
        F.pmod(
            F.pmod(F.xxhash64(F.col(vec_col)), F.lit(n_buckets)) + dup_rn,
            F.lit(n_buckets),
        ).alias("__bucket"),
    )
