"""Canonical table schemas (SURVEY §1.4) + ragged-input normalization.

The reference infers schemas from API JSON and patches missing
columns defensively (fix_provisional_columns transforms.py:226-233,
rating-diff defaults transforms.py:267-271, loader column
intersection postgres_templates.py:187-203). Here every canonical
table has an explicit StructType and `normalize_to_schema` reproduces
the tolerance deterministically: missing columns materialize with a
default, extra columns drop, types cast.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql import types as T

# ---- raw inputs --------------------------------------------------------

# one row per PGN game with visitor outputs attached (FIXTURES.md F1;
# reference src/vendors/lichess.py:61-123 + visitors.py)
RAW_PGN = T.StructType(
    [
        T.StructField("Event", T.StringType()),
        T.StructField("Site", T.StringType()),
        T.StructField("Date", T.StringType()),
        T.StructField("Round", T.StringType()),
        T.StructField("White", T.StringType()),
        T.StructField("Black", T.StringType()),
        T.StructField("Result", T.StringType()),
        T.StructField("UTCDate", T.StringType()),
        T.StructField("UTCTime", T.StringType()),
        T.StructField("WhiteElo", T.StringType()),
        T.StructField("BlackElo", T.StringType()),
        T.StructField("WhiteRatingDiff", T.StringType()),
        T.StructField("BlackRatingDiff", T.StringType()),
        T.StructField("Variant", T.StringType()),
        T.StructField("TimeControl", T.StringType()),
        T.StructField("ECO", T.StringType()),
        T.StructField("Opening", T.StringType()),
        T.StructField("Termination", T.StringType()),
        T.StructField("evaluations", T.ArrayType(T.DoubleType())),
        T.StructField("eval_depths", T.ArrayType(T.IntegerType())),
        T.StructField("clocks", T.ArrayType(T.StringType())),
        T.StructField("white_berserked", T.BooleanType()),
        T.StructField("black_berserked", T.BooleanType()),
        T.StructField("queen_exchange", T.BooleanType()),
        T.StructField(
            "castling_sides",
            T.StructType(
                [
                    T.StructField("black", T.StringType()),
                    T.StructField("white", T.StringType()),
                ]
            ),
        ),
        T.StructField("has_promotion", T.BooleanType()),
        T.StructField("promotion_count_white", T.IntegerType()),
        T.StructField("promotion_count_black", T.IntegerType()),
        T.StructField("promotions_white", T.StringType()),
        T.StructField("promotions_black", T.StringType()),
        T.StructField("positions", T.ArrayType(T.StringType())),
        T.StructField("material_by_move", T.ArrayType(T.MapType(T.StringType(), T.IntegerType()))),
        T.StructField("moves", T.ArrayType(T.StringType())),
    ]
)

# flattened Lichess API JSON, one row per game (FIXTURES.md F2;
# flatten semantics of pd.json_normalize(sep='_') lichess.py:53)
RAW_JSON = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("rated", T.BooleanType()),
        T.StructField("variant", T.StringType()),
        T.StructField("speed", T.StringType()),
        T.StructField("perf", T.StringType()),
        T.StructField("createdAt", T.LongType()),
        T.StructField("lastMoveAt", T.LongType()),
        T.StructField("status", T.StringType()),
        T.StructField("winner", T.StringType()),
        T.StructField("players_white_user_name", T.StringType()),
        T.StructField("players_white_rating", T.IntegerType()),
        T.StructField("players_white_ratingDiff", T.IntegerType()),
        T.StructField("players_white_provisional", T.BooleanType()),
        T.StructField("players_black_user_name", T.StringType()),
        T.StructField("players_black_rating", T.IntegerType()),
        T.StructField("players_black_ratingDiff", T.IntegerType()),
        T.StructField("players_black_provisional", T.BooleanType()),
        T.StructField("clock_initial", T.IntegerType()),
        T.StructField("clock_increment", T.IntegerType()),
        T.StructField("clock_totalTime", T.IntegerType()),
    ]
)

# ---- canonical output tables (db/tables/*.sql) -------------------------

GAME_MOVES = T.StructType(
    [
        T.StructField("game_link", T.StringType(), False),
        T.StructField("half_move", T.IntegerType(), False),
        T.StructField("move", T.StringType()),
    ]
)

GAME_CLOCKS = T.StructType(
    [
        T.StructField("game_link", T.StringType(), False),
        T.StructField("half_move", T.IntegerType(), False),
        T.StructField("clock", T.IntegerType()),
    ]
)

GAME_POSITIONS = T.StructType(
    [
        T.StructField("game_link", T.StringType(), False),
        T.StructField("half_move", T.IntegerType(), False),
        T.StructField("fen", T.StringType()),
    ]
)

_MATERIAL_COLS = (
    "pawns_white",
    "pawns_black",
    "bishops_white",
    "bishops_black",
    "knights_white",
    "knights_black",
    "rooks_white",
    "rooks_black",
    "queens_white",
    "queens_black",
)

GAME_MATERIALS = T.StructType(
    [
        T.StructField("game_link", T.StringType(), False),
        T.StructField("half_move", T.IntegerType(), False),
    ]
    + [T.StructField(c, T.IntegerType()) for c in _MATERIAL_COLS]
)

POSITION_EVALS = T.StructType(
    [
        T.StructField("fen", T.StringType(), False),
        T.StructField("evaluation", T.DoubleType()),
        T.StructField("eval_depth", T.IntegerType()),
    ]
)

WIN_PROBABILITIES = T.StructType(
    [
        T.StructField("game_link", T.StringType(), False),
        T.StructField("half_move", T.IntegerType(), False),
        T.StructField("win_probability_white", T.DoubleType()),
        T.StructField("draw_probability", T.DoubleType()),
        T.StructField("win_probability_black", T.DoubleType()),
        T.StructField("win_prob_model_version", T.StringType()),
    ]
)

ECO_CODES = T.StructType(
    [
        T.StructField("eco_code", T.StringType(), False),
        T.StructField("opening_name", T.StringType()),
        T.StructField("opening_notes", T.StringType()),
    ]
)


def normalize_to_schema(
    df: DataFrame,
    schema: T.StructType,
    defaults: dict[str, object] | None = None,
) -> DataFrame:
    """Project df onto `schema`: add missing columns (NULL or the
    given default), drop extras, cast types. The Spark-native
    equivalent of the reference's defensive column patching +
    intersection loading."""
    defaults = defaults or {}
    cols = []
    for field in schema.fields:
        if field.name in df.columns:
            cols.append(F.col(field.name).cast(field.dataType).alias(field.name))
        else:
            default = defaults.get(field.name)
            cols.append(F.lit(default).cast(field.dataType).alias(field.name))
    return df.select(*cols)
