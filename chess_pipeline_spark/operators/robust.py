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
one step. Groups too large for one batch should pre-aggregate to
per-bucket partial medians first (medians compose approximately;
exact medians need the full group, which is the documented contract
here).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame

_ITERS = 32
_EPS = 1e-9


def _weiszfeld(mat) -> "list[float]":
    import numpy as np

    c = mat.mean(axis=0)
    for _ in range(_ITERS):
        d = np.sqrt(((mat - c) ** 2).sum(axis=1))
        # a point coinciding with the current estimate contributes a
        # zero distance; clamp so the weight stays finite (Vardi-Zhang
        # handling collapses to this for the fixed-iters contract)
        w = 1.0 / np.maximum(d, _EPS)
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
