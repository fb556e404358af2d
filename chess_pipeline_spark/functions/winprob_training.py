"""Win-probability model TRAINING twin (closes the §2.10 U3 loop).

The reference trains its multinomial LogisticRegression offline
(res/analyses/win_probability/v3/src/models/model_training.py:55-75:
seed-13 train/val/test split, IQR outlier removal on `evaluation`,
C=1, 5 features) and ships the pickle; the engine previously shipped
only frozen coefficients + inference (functions/winprob.py). This
module re-expresses the TRAINING side with Spark ML so the whole
model lifecycle lives in-engine:

  fixture  — a deterministic feature grid (pure column arithmetic,
             no RNG to ship) soft-labeled by the frozen model: each
             feature row expands into three weighted rows, one per
             class, weighted by the model's own class probability.
             Maximum-likelihood on soft labels drawn exactly from a
             multinomial-logit model recovers THAT model — so the
             trained coefficients must reproduce WINPROB_COEF, which
             is what the pytest pins.
  split    — randomSplit([.6, .2, .2], seed=13): the reference's
             two-stage train_test_split(0.2)+(0.25) proportions.
  outliers — IQR fence on `evaluation` over the train split
             (percentile_approx; model_training.py:40-48), same
             1.5·IQR whiskers.
  fit      — pyspark.ml LogisticRegression(family='multinomial',
             weightCol, regParam=0, standardization=False). The
             reference uses C=1 (weak L2); the twin fits the
             unregularized MLE because the recovery property is
             exact there, and asserts the C=1 fit stays within the
             shrinkage tolerance.

Identifiability: multinomial-logit coefficients are invariant to
adding one shared vector to every class row (softmax cancels it), so
coefficient comparison happens after mean-centering across classes —
the same canonicalization sklearn's multinomial parametrization
converges to.

100 TB shape: the expansion is a 3-row explode (narrow); Spark ML's
L-BFGS aggregates gradient partials tree-wise per iteration — the
only per-iteration traffic is the (classes × features) dense gradient,
independent of row count.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from chess_pipeline_spark.functions.winprob import FEATURES, lr_probabilities

_CLASSES = ("white_win", "draw", "black_win")


def winprob_training_frame(spark: SparkSession, n: int = 4000) -> DataFrame:
    """Deterministic training fixture: n feature rows spanning the
    model's input ranges (pure integer arithmetic on a sequence — no
    RNG, identical on any cluster), each soft-labeled with the frozen
    model's class probabilities.

    Output: one row per (example, class) with columns
    (features..., label ∈ {0,1,2}, w = P(class | x)) — the weighted
    form Spark ML's weightCol consumes.
    """
    base = (
        spark.range(n)
        .select(
            F.col("id"),
            # coprime multipliers walk the full grid without repeats
            ((F.col("id") * 37 % 401) - 200).cast("double").alias("elo_diff"),
            (((F.col("id") * 53) % 2001 - 1000) / 250.0).alias("evaluation"),
            (((F.col("id") * 29) % 101) / 100.0).alias("white_sig_clock_pct"),
            (((F.col("id") * 31) % 101) / 100.0).alias("black_sig_clock_pct"),
            ((F.col("id") * 7) % 2).cast("double").alias("has_increment"),
        )
    )
    probs = lr_probabilities(
        {f: F.col(f) for f in FEATURES}, decimals=12
    )
    soft = base.select(
        "id",
        *FEATURES,
        probs["win_probability_white"].alias("p0"),
        probs["draw_probability"].alias("p1"),
        probs["win_probability_black"].alias("p2"),
    )
    return soft.select(
        "id",
        *FEATURES,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).cast("double").alias("label"),
                        F.col(f"p{i}").alias("w"),
                    )
                    for i in range(3)
                ]
            )
        ).alias("lw"),
    ).select("id", *FEATURES, F.col("lw.label").alias("label"), F.col("lw.w").alias("w"))


def iqr_outlier_filter(df: DataFrame, col: str, whisker: float = 1.5) -> DataFrame:
    """The reference's pre-fit outlier removal
    (model_training.py:40-48): drop rows outside
    [p25 - 1.5·IQR, p75 + 1.5·IQR] of `col`. percentile_approx keeps
    it one pass + broadcastable scalars at any scale."""
    q = df.agg(
        F.percentile_approx(col, 0.25, 10000).alias("p25"),
        F.percentile_approx(col, 0.75, 10000).alias("p75"),
    )
    return (
        df.crossJoin(F.broadcast(q))
        .filter(
            (F.col(col) > F.col("p25") - whisker * (F.col("p75") - F.col("p25")))
            & (F.col(col) < F.col("p75") + whisker * (F.col("p75") - F.col("p25")))
        )
        .drop("p25", "p75")
    )


def train_winprob_lr(
    train: DataFrame, reg_param: float = 0.0, max_iter: int = 300
) -> dict[str, tuple[float, ...]]:
    """Fit the multinomial LR with Spark ML and return coefficients in
    WINPROB_COEF's layout: {class: (bias, w_feature...)}.

    reg_param=0 is the exact-recovery setting; pass the C=1
    equivalent (1/n_effective) to mirror the reference's sklearn
    shrinkage.
    """
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    assembled = VectorAssembler(
        inputCols=list(FEATURES), outputCol="features_vec"
    ).transform(train)
    lr = LogisticRegression(
        featuresCol="features_vec",
        labelCol="label",
        weightCol="w",
        family="multinomial",
        regParam=reg_param,
        elasticNetParam=0.0,
        standardization=False,
        maxIter=max_iter,
        tol=1e-10,
    )
    model = lr.fit(assembled)
    W = model.coefficientMatrix.toArray()  # classes x features
    b = model.interceptVector.toArray()
    return {
        cls: (float(b[i]), *[float(x) for x in W[i]])
        for i, cls in enumerate(_CLASSES)
    }


def center_coefs(coefs: dict[str, tuple[float, ...]]) -> dict[str, tuple[float, ...]]:
    """Mean-center each coefficient position across classes — the
    canonical representative of the softmax's shift-invariance class,
    so two parametrizations of the SAME model compare equal."""
    k = len(next(iter(coefs.values())))
    means = [sum(coefs[c][j] for c in _CLASSES) / len(_CLASSES) for j in range(k)]
    return {
        c: tuple(coefs[c][j] - means[j] for j in range(k)) for c in _CLASSES
    }


def training_pipeline(
    spark: SparkSession, n: int = 4000, reg_param: float = 0.0
) -> dict[str, tuple[float, ...]]:
    """The full reference-shaped pipeline: fixture → seed-13
    60/20/20 split → IQR outlier fence on `evaluation` (train split
    only, like model_training.py) → weighted multinomial fit on the
    train split. Returns coefficients in WINPROB_COEF layout."""
    data = winprob_training_frame(spark, n)
    # split by EXAMPLE id, not by expanded row — the three soft rows
    # of one example must land in the same split or the soft labels
    # stop being a distribution
    ids = data.select("id").distinct()
    train_ids, _val_ids, _test_ids = ids.randomSplit([0.6, 0.2, 0.2], seed=13)
    train = data.join(F.broadcast(train_ids), "id")
    train = iqr_outlier_filter(train, "evaluation")
    return train_winprob_lr(train, reg_param=reg_param)
