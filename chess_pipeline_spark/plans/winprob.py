"""Win-probability feature pipeline + inference as a catalog query.

Maps the reference's feature engineering (models.py:19-99) onto
lineitem columns and runs the native-expression LR (functions/
winprob.py). The whole pipeline — features, softmax, rounding — is
one Catalyst projection: no UDF, no shuffle, fully
whole-stage-codegen'd, which is the 100 TB plan of record for
expression-representable models.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from chess_pipeline_spark.functions.winprob import WINPROB_COEF, lr_probabilities
from chess_pipeline_spark.plans.spec import QuerySpec
from chess_pipeline_spark.sources import load_table as _L


def win_prob_lr(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _L(spark, sf_dir, "lineitem")
    feats = {
        # elo_diff ≙ models.py:86-90 (signed rating gap)
        "elo_diff": (F.col("l_extendedprice") - F.lit(30000.0)) / F.lit(100.0),
        # evaluation ≙ the joined position eval (inference.py:41-50)
        "evaluation": (F.col("l_discount") - F.lit(0.05)) * F.lit(20.0),
        # sig clock pcts ≙ models.py:63-80 (clipped to [0,1], F11)
        "white_sig_clock_pct": F.least(
            F.greatest(F.col("l_quantity") / F.lit(50.0), F.lit(0.0)), F.lit(1.0)
        ),
        "black_sig_clock_pct": F.lit(1.0)
        - F.least(F.greatest(F.col("l_quantity") / F.lit(50.0), F.lit(0.0)), F.lit(1.0)),
        # has_increment ≙ increment > 0 flag (create_features.py)
        "has_increment": (F.col("l_orderkey") % 2).cast("double"),
    }
    probs = lr_probabilities(feats)
    return li.select(
        F.col("l_orderkey").alias("game_link"),
        F.col("l_linenumber").alias("half_move"),
        probs["win_probability_white"].alias("win_probability_white"),
        probs["draw_probability"].alias("draw_probability"),
        probs["win_probability_black"].alias("win_probability_black"),
    )


def _oracle() -> str:
    # generate the z_c expressions in the exact literal/order layout
    # the Spark expression tree uses, so float results agree
    feat_sql = {
        "elo_diff": "((l_extendedprice - 30000.0) / 100.0)",
        "evaluation": "((l_discount - 0.05) * 20.0)",
        "white_sig_clock_pct": "least(greatest(l_quantity / 50.0, 0.0), 1.0)",
        "black_sig_clock_pct": "(1.0 - least(greatest(l_quantity / 50.0, 0.0), 1.0))",
        "has_increment": "CAST(l_orderkey % 2 AS DOUBLE)",
    }
    feats = ("elo_diff", "evaluation", "white_sig_clock_pct", "black_sig_clock_pct", "has_increment")
    zs = {}
    for cls, (b, *w) in WINPROB_COEF.items():
        z = repr(b)
        for wi, f in zip(w, feats):
            z = f"({z} + {wi!r} * {feat_sql[f]})"
        zs[cls] = z
    # mirror the native path's max-stabilized softmax exactly (same
    # float ops in the same order, or rounding-boundary rows diverge)
    zmax = f"greatest({zs['white_win']}, {zs['draw']}, {zs['black_win']})"
    ex = {cls: f"exp({z} - {zmax})" for cls, z in zs.items()}
    denom = f"({ex['white_win']} + {ex['draw']} + {ex['black_win']})"
    return f"""
SELECT l_orderkey AS game_link,
       l_linenumber AS half_move,
       floor(({ex['white_win']} / {denom}) * 1000000.0 + 0.5) / 1000000.0 AS win_probability_white,
       floor(({ex['draw']} / {denom}) * 1000000.0 + 0.5) / 1000000.0 AS draw_probability,
       floor(({ex['black_win']} / {denom}) * 1000000.0 + 0.5) / 1000000.0 AS win_probability_black
FROM lineitem
"""


WIN_PROB_LR_SQL = _oracle()

QUERIES: dict[str, QuerySpec] = {
    "win_prob_lr": QuerySpec(win_prob_lr, WIN_PROB_LR_SQL, "U3 F11 F12 F13"),
}
