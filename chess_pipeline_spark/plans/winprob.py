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



def pgn_moves_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 derived-table contract under the oracle (SURVEY §2.10): the
    fixture PGN games (chess_pipeline_spark/fixtures_pgn.py — the
    reference visitor-test scenario shapes) run through the REAL
    mapInPandas parse UDTF (parse.parse_pgn_dataframe, from-scratch
    SAN tokenizer + visitors), and the visitor arrays explode into
    the per-ply moves table: (game_id, ply, san, clock_s,
    evaluation). The oracle is the precomputed golden rows — the same
    goldens-as-oracle strategy the reference's own visitor tests use
    (reference tests/test_visitors.py:9-215) — so a tokenizer
    regression, a clock-parse drift, a mate-eval fill change, or a
    ragged-eval misalignment all hash-mismatch.

    Ignores sf_dir by design: the contract input is the fixture set,
    not the synthetic tables. 100 TB shape: the UDTF is an
    Arrow-batched mapInPandas over whatever PGN corpus is loaded
    (parse cost is per-row and embarrassingly parallel); arrays_zip +
    posexplode is a narrow transform — the derived table inherits the
    input partitioning with zero shuffles.
    """
    from chess_pipeline_spark.fixtures_pgn import ORACLE_GAMES
    from chess_pipeline_spark.parse import parse_pgn_dataframe

    pgns = spark.createDataFrame([(g,) for g in ORACLE_GAMES], "pgn string")
    raw = parse_pgn_dataframe(pgns)
    # clocks is lockstep with moves ("" when a move has no comment);
    # evaluations is ragged at the TAIL for these shapes (the
    # comment-less final move appends nothing), so arrays_zip's
    # NULL-padding aligns it correctly
    exploded = raw.select(
        F.regexp_extract("Site", r"([^/]+)$", 1).alias("game_id"),
        F.posexplode(F.arrays_zip("moves", "clocks", "evaluations")).alias(
            "ply0", "mce"
        ),
    )
    clock = F.col("mce.clocks")
    clock_s = F.when(
        clock != "",
        F.split(clock, ":").getItem(0).cast("long") * 3600
        + F.split(clock, ":").getItem(1).cast("long") * 60
        + F.floor(F.split(clock, ":").getItem(2).cast("double")).cast("long"),
    )
    return exploded.select(
        "game_id",
        (F.col("ply0") + 1).cast("long").alias("ply"),
        F.col("mce.moves").alias("san"),
        clock_s.alias("clock_s"),
        F.col("mce.evaluations").alias("evaluation"),
    )


PGN_MOVES_TABLE_SQL = """
SELECT game_id, CAST(ply AS BIGINT) AS ply, san, clock_s, evaluation
FROM (VALUES
  ('abcd1234', 1, 'e4', CAST(300 AS BIGINT), CAST(0.3 AS DOUBLE)),
  ('abcd1234', 2, 'c5', CAST(300 AS BIGINT), CAST(-0.1 AS DOUBLE)),
  ('abcd1234', 3, 'Nf3', CAST(298 AS BIGINT), CAST(0.25 AS DOUBLE)),
  ('abcd1234', 4, 'd6', CAST(297 AS BIGINT), CAST(0.2 AS DOUBLE)),
  ('mate0001', 1, 'e4', CAST(60 AS BIGINT), CAST(0.3 AS DOUBLE)),
  ('mate0001', 2, 'g5', CAST(60 AS BIGINT), CAST(0.9 AS DOUBLE)),
  ('mate0001', 3, 'Nc3', CAST(59 AS BIGINT), CAST(0.6 AS DOUBLE)),
  ('mate0001', 4, 'f5', CAST(58 AS BIGINT), CAST(9999.0 AS DOUBLE)),
  ('mate0001', 5, 'Qh5#', NULL, NULL),
  ('feat0001', 1, 'd4', CAST(60 AS BIGINT), NULL),
  ('feat0001', 2, 'd5', CAST(120 AS BIGINT), NULL),
  ('feat0001', 3, 'e4', CAST(58 AS BIGINT), NULL),
  ('feat0001', 4, 'dxe4', CAST(119 AS BIGINT), NULL),
  ('feat0001', 5, 'Qxd8+', CAST(55 AS BIGINT), NULL),
  ('feat0001', 6, 'Kxd8', CAST(118 AS BIGINT), NULL),
  ('feat0001', 7, 'O-O-O', CAST(52 AS BIGINT), NULL),
  ('feat0001', 8, 'e1=Q', CAST(115 AS BIGINT), NULL))
  AS t(game_id, ply, san, clock_s, evaluation)
"""


QUERIES: dict[str, QuerySpec] = {
    "win_prob_lr": QuerySpec(win_prob_lr, WIN_PROB_LR_SQL, "U3 F11 F12 F13"),
    "pgn_moves_table": QuerySpec(
        pgn_moves_table, PGN_MOVES_TABLE_SQL, "U1 S2 E1 E3"
    ),
}
