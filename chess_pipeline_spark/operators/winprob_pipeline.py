"""Win-probability feature engineering — the reference's models.py
pipeline re-expressed as window functions and column expressions.

Reference: src/pipeline_import/models.py:19-99 (convert_clock_to_
seconds already applied upstream). Every pandas shift/self-join
becomes a window over (game_link, ordered half_move):

- W2/W3: opponent clock = lead(clock) filled by lag(lead,2) then own
  clock (models.py:25-30) — the exact coalesce chain.
- W4/J6: initial clock per (game, parity) = first over the ordered
  parity partition (models.py:37-48) — one window replaces the
  reference's double self-join.
- F11-F14: clock pct clipping, inverse-sigmoid transform, branchless
  color swaps (models.py:63-97).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def add_opponent_clock(clocks: DataFrame) -> DataFrame:
    """coalesce(lead(clock,1), lag(lead(clock,1),2), clock) over each
    game (models.py:25-30). Handles end-of-game (no lead) and 1-2-move
    games exactly like the pandas fillna chain."""
    w = Window.partitionBy("game_link").orderBy("half_move")
    out = clocks.withColumn("_lead1", F.lead("clock", 1).over(w))
    return out.withColumn(
        "opponent_clock",
        F.coalesce(F.col("_lead1"), F.lag("_lead1", 2).over(w), F.col("clock")),
    ).drop("_lead1")


def add_player_to_move(clocks: DataFrame) -> DataFrame:
    """half_move parity -> 1 if white to move made this move
    (models.py:33: half_move % 2)."""
    return clocks.withColumn("player_to_move", (F.col("half_move") % 2).cast("int"))


def add_initial_clocks(clocks: DataFrame) -> DataFrame:
    """Initial time per (game, mover parity) — berserk-aware because
    it reads the actual first clock of each side rather than the time
    control (models.py:37-60; one window over the game replaces both
    reference self-joins, including the flipped-bit one: the
    opponent's initial clock is the FIRST CLOCK OF THE OTHER PARITY,
    not anything derived from opponent_clock)."""
    df = add_player_to_move(clocks)
    w_game = (
        Window.partitionBy("game_link")
        .orderBy("half_move")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    init_odd = F.first(
        F.when(F.col("player_to_move") == 1, F.col("clock")), ignorenulls=True
    ).over(w_game)
    init_even = F.first(
        F.when(F.col("player_to_move") == 0, F.col("clock")), ignorenulls=True
    ).over(w_game)
    own_is_odd = F.col("player_to_move") == 1
    out = df.withColumn(
        "initial_clock", F.when(own_is_odd, init_odd).otherwise(init_even)
    ).withColumn(
        "initial_clock_opponent", F.when(own_is_odd, init_even).otherwise(init_odd)
    )
    # the reference's flipped-bit merge is INNER (models.py:55-60):
    # rows whose opposite parity never moved (1-move games) drop out
    return out.filter(F.col("initial_clock_opponent").isNotNull())


def add_clock_features(df: DataFrame) -> DataFrame:
    """clock_pct = clip(clock,1,)/initial, clipped to <=1, then the
    inverse-sigmoid 'sig' transform log(p / (1.00001 - p))
    (models.py:63-80 — F11/F12)."""
    def sig(p: F.Column) -> F.Column:
        p = F.least(p, F.lit(1.0))
        return F.log(p / (F.lit(1.00001) - p))

    pct = F.greatest(F.col("clock"), F.lit(1)) / F.greatest(
        F.col("initial_clock"), F.lit(1)
    )
    opp_pct = F.greatest(F.col("opponent_clock"), F.lit(1)) / F.greatest(
        F.col("initial_clock_opponent"), F.lit(1)
    )
    return (
        df.withColumn("clock_pct", F.least(pct, F.lit(1.0)))
        .withColumn("opponent_clock_pct", F.least(opp_pct, F.lit(1.0)))
        .withColumn("sig_clock_pct", sig(pct))
        .withColumn("opponent_sig_clock_pct", sig(opp_pct))
    )


def add_color_features(df: DataFrame, games: DataFrame) -> DataFrame:
    """Join game facts and derive white/black-perspective features via
    branchless flag arithmetic -> when/otherwise (models.py:86-97 —
    F13; game-info join J5, broadcast: games ≪ moves)."""
    facts = games.select(
        "game_link",
        "player_color",
        "player_elo",
        "opponent_elo",
        "increment",
    )
    df = df.join(F.broadcast(facts), "game_link")
    # the reference selects by the game-perspective PLAYER COLOR for
    # all three swaps (models.py:84-97 branchless flag arithmetic) —
    # NOT by move parity: sig_clock_pct is 'the player's' series and
    # opponent_sig 'the opponent's' on every row
    player_is_white = F.col("player_color") == "white"
    white_elo = F.when(player_is_white, F.col("player_elo")).otherwise(F.col("opponent_elo"))
    black_elo = F.when(player_is_white, F.col("opponent_elo")).otherwise(F.col("player_elo"))
    return (
        df.withColumn("elo_diff", white_elo - black_elo)
        .withColumn(
            "white_sig_clock_pct",
            F.when(player_is_white, F.col("sig_clock_pct")).otherwise(
                F.col("opponent_sig_clock_pct")
            ),
        )
        .withColumn(
            "black_sig_clock_pct",
            F.when(~player_is_white, F.col("sig_clock_pct")).otherwise(
                F.col("opponent_sig_clock_pct")
            ),
        )
        .withColumn("has_increment", (F.col("increment") > 0).cast("double"))
    )


def build_features(
    clocks: DataFrame,
    games: DataFrame,
    positions: DataFrame,
    eval_cache: DataFrame,
) -> DataFrame:
    """Full feature frame for inference (inference.py:33-55 chain):
    positions LEFT JOIN eval cache on fen, nulls -> 0 (J3); join onto
    the clock features on (game_link, half_move) (J4); broadcast-join
    game facts (J5). Clock windows and sig transforms as above."""
    from chess_pipeline_spark.operators.evals import attach_evals

    pos_evals = attach_evals(positions, eval_cache, fill_zero=False).select(
        "game_link", "half_move", "evaluation"
    )
    # the reference drops unparseable clocks BEFORE the shift chain
    # (models.py:23) so neighbors shift past them
    clocks = clocks.filter(F.col("clock") != -1)
    df = add_initial_clocks(add_opponent_clock(clocks))
    df = add_clock_features(df)
    df = df.join(pos_evals, ["game_link", "half_move"], "left").withColumn(
        "evaluation", F.coalesce(F.col("evaluation"), F.lit(0.0))
    )
    df = add_color_features(df, games)
    return df


def infer_win_probabilities(features: DataFrame, model_version: str = "native-lr-v1") -> DataFrame:
    """Apply the native-expression LR (functions/winprob.py) and emit
    the win_probabilities table shape (inference.py:57-72; model
    version fingerprint F16 kept driver-side as a literal)."""
    from chess_pipeline_spark.functions.winprob import lr_probabilities

    x = {
        "elo_diff": F.col("elo_diff").cast("double"),
        "evaluation": F.col("evaluation").cast("double"),
        "white_sig_clock_pct": F.col("white_sig_clock_pct"),
        "black_sig_clock_pct": F.col("black_sig_clock_pct"),
        "has_increment": F.col("has_increment"),
    }
    probs = lr_probabilities(x)
    return features.select(
        "game_link",
        "half_move",
        probs["win_probability_white"].alias("win_probability_white"),
        probs["draw_probability"].alias("draw_probability"),
        probs["win_probability_black"].alias("win_probability_black"),
        F.lit(model_version).alias("win_prob_model_version"),
    )
