"""Win-probability model inference (SURVEY §2.10 U3).

The reference applies a pickled sklearn multinomial
LogisticRegression (C=1, 5 features) batch-wise and rounds the three
class probabilities to 1e-6 (src/pipeline_import/models.py:102-121,
applied in src/inference.py:57-61).

Multinomial LR is a closed-form expression — softmax(b_c + x·w_c) —
so the engine's *primary* realization is a pure Catalyst column
expression (JVM-side, whole-stage-codegen'd, zero Python in the hot
path, and exactly checkable by a SQL oracle). A vectorized
pandas_udf realization is provided as the pattern for models that are
NOT expression-representable (broadcast weights + Arrow batches) and
is property-tested for equality against the native path.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column

# Frozen stand-in coefficients for the reference's 5-feature, 3-class
# model (models.py:112-117): rows = classes (white win / draw / black
# win), cols = features. Deterministic literals so both engines and
# both realizations agree bit-for-bit pre-rounding.
FEATURES = ("elo_diff", "evaluation", "white_sig_clock_pct", "black_sig_clock_pct", "has_increment")
WINPROB_COEF: dict[str, tuple[float, ...]] = {
    # class:      (bias, w_elo_diff, w_eval, w_wclock, w_bclock, w_incr)
    "white_win": (0.10, 0.0021, 0.3500, 0.8000, -0.6000, 0.0500),
    "draw": (-0.90, -0.0002, -0.0500, 0.1000, 0.1000, 0.0100),
    "black_win": (0.05, -0.0019, -0.4100, -0.7000, 0.7500, -0.0300),
}


def _logit(cls: str, x: dict[str, Column]) -> Column:
    b, *w = WINPROB_COEF[cls]
    z: Column = F.lit(b)
    for wi, feat in zip(w, FEATURES):
        z = z + F.lit(wi) * x[feat]
    return z


def lr_probabilities(x: dict[str, Column], decimals: int = 6) -> dict[str, Column]:
    """Native-expression softmax over the three classes.

    Returns columns named like the reference's win_probabilities table
    (FIXTURES.md F7). round(p, 6) reproduces models.py:119.
    """
    from chess_pipeline_spark.functions.rounding import fround

    zs = {cls: _logit(cls, x) for cls in WINPROB_COEF}
    # max-stabilized softmax (shift-invariant): without it a mate
    # evaluation (+-9999 sentinel) pushes exp() to inf and every
    # probability to NaN — sklearn's predict_proba stabilizes too
    zmax = F.greatest(*zs.values())
    exps = {cls: F.exp(z - zmax) for cls, z in zs.items()}
    denom = exps["white_win"] + exps["draw"] + exps["black_win"]
    return {
        "win_probability_white": fround(exps["white_win"] / denom, decimals),
        "draw_probability": fround(exps["draw"] / denom, decimals),
        "win_probability_black": fround(exps["black_win"] / denom, decimals),
    }


def lr_probabilities_pandas_udf(decimals: int = 6):
    """Arrow-vectorized realization: the pattern for non-expression
    models (broadcast weights, one numpy matmul per batch). Returns a
    pandas_udf producing a struct of the three probabilities;
    `decimals` matches the native path's rounding."""
    import numpy as np
    from pyspark.sql.types import DoubleType, StructField, StructType

    out_schema = StructType(
        [
            StructField("win_probability_white", DoubleType()),
            StructField("draw_probability", DoubleType()),
            StructField("win_probability_black", DoubleType()),
        ]
    )
    # weight matrix: classes x (1+features), closed over (tiny; shipped
    # in the serialized closure — a real model would use a broadcast)
    W = np.array([WINPROB_COEF[c] for c in ("white_win", "draw", "black_win")])

    @F.pandas_udf(out_schema)
    def infer(
        elo_diff: pd.Series,
        evaluation: pd.Series,
        wclock: pd.Series,
        bclock: pd.Series,
        incr: pd.Series,
    ) -> pd.DataFrame:
        X = np.column_stack(
            [np.ones(len(elo_diff)), elo_diff, evaluation, wclock, bclock, incr]
        )
        Z = X @ W.T
        Z = Z - Z.max(axis=1, keepdims=True)  # stabilized, like the native path
        E = np.exp(Z)
        P = E / E.sum(axis=1, keepdims=True)
        # floor-based rounding to match functions.rounding.fround
        scale = 10.0**decimals
        P = np.floor(P * scale + 0.5) / scale
        return pd.DataFrame(
            {
                "win_probability_white": P[:, 0],
                "draw_probability": P[:, 1],
                "win_probability_black": P[:, 2],
            }
        )

    return infer
