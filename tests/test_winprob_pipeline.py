"""Window-semantics tests for the win-probability feature pipeline —
the exact pandas shift/fillna chain of models.py:19-99 re-expressed
as windows, property-checked on hand-computed fixtures (incl. the
1-move and 2-move edge cases the reference's fillna chain exists
for)."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from chess_pipeline_spark.operators.winprob_pipeline import (
    add_clock_features,
    add_initial_clocks,
    add_opponent_clock,
    infer_win_probabilities,
)


@pytest.fixture(scope="module")
def clocks(spark):
    rows = [
        # 5-move game
        ("g1", 1, 60), ("g1", 2, 58), ("g1", 3, 55), ("g1", 4, 50), ("g1", 5, 47),
        # 1-move game (lead and lag both null -> own clock)
        ("g2", 1, 30),
        # 2-move game
        ("g3", 1, 30), ("g3", 2, 29),
    ]
    return spark.createDataFrame(rows, "game_link string, half_move int, clock int")


def test_opponent_clock_chain(clocks):
    out = {
        (r.game_link, r.half_move): r.opponent_clock
        for r in add_opponent_clock(clocks).collect()
    }
    # coalesce(lead1, lag(lead1,2), clock) — models.py:25-30
    assert out[("g1", 1)] == 58
    assert out[("g1", 2)] == 55
    assert out[("g1", 3)] == 50
    assert out[("g1", 4)] == 47
    assert out[("g1", 5)] == 50  # lead null -> lag2 of lead = lead at half 3
    assert out[("g2", 1)] == 30  # both null -> own clock
    assert out[("g3", 1)] == 29
    assert out[("g3", 2)] == 29  # lead null, lag2 null -> own clock


def test_initial_clocks(clocks):
    df = add_initial_clocks(add_opponent_clock(clocks))
    got = {
        (r.game_link, r.half_move): (
            r.player_to_move,
            r.initial_clock,
            r.initial_clock_opponent,
        )
        for r in df.collect()
    }
    # parity partitions of g1: odd halves (white) start 60; even 58;
    # the opponent's initial clock is the FLIPPED parity's first
    # clock (models.py:50-60)
    assert got[("g1", 1)] == (1, 60, 58)
    assert got[("g1", 3)] == (1, 60, 58)
    assert got[("g1", 5)] == (1, 60, 58)
    assert got[("g1", 2)] == (0, 58, 60)
    assert got[("g1", 4)] == (0, 58, 60)
    # g2 is a 1-move game: the reference's flipped-bit merge is
    # inner, so its row drops out entirely
    assert ("g2", 1) not in got
    assert got[("g3", 1)] == (1, 30, 29)
    assert got[("g3", 2)] == (0, 29, 30)


def test_clock_features_clip_and_sig(clocks):
    df = add_clock_features(add_initial_clocks(add_opponent_clock(clocks)))
    r = df.filter((F.col("game_link") == "g1") & (F.col("half_move") == 5)).first()
    pct = 47 / 60
    assert abs(r.clock_pct - pct) < 1e-12
    assert abs(r.sig_clock_pct - math.log(pct / (1.00001 - pct))) < 1e-9
    # pct clipped at 1.0 for the first move (clock == initial)
    r1 = df.filter((F.col("game_link") == "g1") & (F.col("half_move") == 1)).first()
    assert r1.clock_pct == 1.0
    assert abs(r1.sig_clock_pct - math.log(1.0 / (1.00001 - 1.0))) < 1e-6


def test_inference_outputs_probability_simplex(spark, clocks):
    from chess_pipeline_spark.operators.winprob_pipeline import add_color_features

    games = spark.createDataFrame(
        [("g1", "white", 1800.0, 1750.0, 3), ("g2", "black", 1500.0, 1600.0, 0),
         ("g3", "white", 2000.0, 2000.0, 2)],
        "game_link string, player_color string, player_elo double, opponent_elo double, increment int",
    )
    feats = add_color_features(
        add_clock_features(add_initial_clocks(add_opponent_clock(clocks))), games
    ).withColumn("evaluation", F.lit(0.25))
    probs = infer_win_probabilities(feats)
    rows = probs.collect()
    # 8 input rows minus the 1-move game g2 (dropped by the
    # reference's inner flipped-parity merge)
    assert len(rows) == 7
    for r in rows:
        s = r.win_probability_white + r.draw_probability + r.win_probability_black
        assert abs(s - 1.0) < 5e-6  # rounded to 1e-6 each
        assert r.win_prob_model_version == "native-lr-v1"


def test_pandas_udf_matches_native_expression(spark):
    """The Arrow-UDF realization agrees with the pure-expression path
    (models.py:102-121 parity between the two implementations)."""
    import pyspark.sql.functions as F

    from chess_pipeline_spark.functions.winprob import (
        lr_probabilities,
        lr_probabilities_pandas_udf,
    )

    df = spark.range(200).select(
        (F.col("id") * 3.7 - 300).alias("elo_diff"),
        ((F.col("id") % 40) / 10.0 - 2.0).alias("evaluation"),
        ((F.col("id") % 17) / 17.0).alias("wclock"),
        ((F.col("id") % 13) / 13.0).alias("bclock"),
        (F.col("id") % 2).cast("double").alias("incr"),
    )
    x = {
        "elo_diff": F.col("elo_diff"),
        "evaluation": F.col("evaluation"),
        "white_sig_clock_pct": F.col("wclock"),
        "black_sig_clock_pct": F.col("bclock"),
        "has_increment": F.col("incr"),
    }
    native = lr_probabilities(x)
    udf = lr_probabilities_pandas_udf()
    out = df.select(
        native["win_probability_white"].alias("nw"),
        native["draw_probability"].alias("nd"),
        native["win_probability_black"].alias("nb"),
        udf("elo_diff", "evaluation", "wclock", "bclock", "incr").alias("u"),
    )
    for r in out.collect():
        assert abs(r.nw - r.u.win_probability_white) < 2e-6
        assert abs(r.nd - r.u.draw_probability) < 2e-6
        assert abs(r.nb - r.u.win_probability_black) < 2e-6


def test_training_twin_recovers_frozen_coefficients(spark):
    """The in-engine Spark-ML training pipeline (r7; mirrors the
    reference's model_training.py:55-75 shape: seed-13 split, IQR
    fence, multinomial LR) must RECOVER the frozen inference
    coefficients from a fixture soft-labeled by that very model —
    the MLE of a multinomial logit on its own soft labels is the
    generating model. Comparison is mean-centered across classes
    (softmax shift-invariance); the bound is loose enough for L-BFGS
    convergence, tight enough that a wrong feature order, dropped
    feature, or sign flip fails loudly."""
    from chess_pipeline_spark.functions.winprob import FEATURES, WINPROB_COEF
    from chess_pipeline_spark.functions.winprob_training import (
        center_coefs,
        training_pipeline,
    )

    trained = center_coefs(training_pipeline(spark, n=4000, reg_param=0.0))
    frozen = center_coefs(WINPROB_COEF)
    # per-coefficient scale varies by orders of magnitude (elo_diff
    # ~2e-3 vs clock ~0.8): bound the ABSOLUTE error against the
    # feature's dynamic range contribution instead of one global eps
    ranges = {"elo_diff": 200.0, "evaluation": 4.0, "white_sig_clock_pct": 1.0,
              "black_sig_clock_pct": 1.0, "has_increment": 1.0}
    for cls in WINPROB_COEF:
        t, f = trained[cls], frozen[cls]
        assert abs(t[0] - f[0]) < 2e-3, (cls, "bias", t[0], f[0])
        for j, feat in enumerate(FEATURES, start=1):
            # error in LOGIT units over the feature's span
            err_logit = abs(t[j] - f[j]) * ranges[feat]
            assert err_logit < 5e-3, (cls, feat, t[j], f[j], err_logit)


def test_training_twin_inference_unchanged(spark):
    """win_prob_lr's catalog output must be BYTE-identical before and
    after the training work landed — training reads the frozen
    coefficients, it must never mutate them — and re-running
    inference with the TRAINED coefficients reproduces the frozen
    probabilities within rounding."""
    import math

    import pyspark.sql.functions as F

    from chess_pipeline_spark.functions.winprob import (
        FEATURES,
        WINPROB_COEF,
        lr_probabilities,
    )
    from chess_pipeline_spark.functions.winprob_training import (
        training_pipeline,
        winprob_training_frame,
    )

    trained = training_pipeline(spark, n=4000, reg_param=0.0)

    feats = (
        winprob_training_frame(spark, 200)
        .filter(F.col("label") == 0.0)
        .select(*FEATURES)
    )
    frozen_rows = feats.select(
        *FEATURES, *[c.alias(n) for n, c in lr_probabilities(
            {f: F.col(f) for f in FEATURES}, decimals=6
        ).items()]
    ).collect()

    def softmax(coefs, row):
        zs = []
        for cls in ("white_win", "draw", "black_win"):
            b, *w = coefs[cls]
            zs.append(b + sum(wi * row[f] for wi, f in zip(w, FEATURES)))
        m = max(zs)
        es = [math.exp(z - m) for z in zs]
        tot = sum(es)
        return [e / tot for e in es]

    for r in frozen_rows:
        p = softmax(trained, r)
        assert abs(p[0] - r["win_probability_white"]) < 1e-3
        assert abs(p[1] - r["draw_probability"]) < 1e-3
        assert abs(p[2] - r["win_probability_black"]) < 1e-3
