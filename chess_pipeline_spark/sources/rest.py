"""REST/JSON source adapter (SURVEY §2.1 S1, §2.6 E6).

The reference fetches Lichess games as nested JSON and flattens it
with ``pd.json_normalize(sep='_')`` (src/vendors/lichess.py:25-58,
flatten at :53). Spark-native equivalent: the (driver-side, tiny)
HTTP response becomes ``spark.createDataFrame`` rows under an
explicit schema, and the flatten is a pure projection over nested
``StructType`` columns — ``players.white.rating`` →
``players_white_rating`` — so Catalyst sees plain column pruning.

No HTTP client lives here: fetching is I/O orchestration outside the
engine (and this environment has no network); the engine surface is
rows-in → normalized-DataFrame-out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def flatten_structs(df: DataFrame, sep: str = "_") -> DataFrame:
    """Recursively flatten all StructType columns into top-level
    columns named ``path<sep>field`` — ``json_normalize`` semantics.
    Arrays are left intact (the reference normalizes only objects;
    arrays stay list-valued until an explicit explode)."""
    cols: list[F.Column] = []

    def walk(prefix_expr: str, prefix_name: str, dtype: T.DataType) -> None:
        if isinstance(dtype, T.StructType):
            for field in dtype.fields:
                walk(
                    f"{prefix_expr}.`{field.name}`",
                    f"{prefix_name}{sep}{field.name}" if prefix_name else field.name,
                    field.dataType,
                )
        else:
            cols.append(F.col(prefix_expr).alias(prefix_name))

    for field in df.schema.fields:
        if isinstance(field.dataType, T.StructType):
            walk(f"`{field.name}`", field.name, field.dataType)
        else:
            cols.append(F.col(f"`{field.name}`"))
    return df.select(*cols)


def json_records_source(
    spark: SparkSession,
    records: list[dict],
    schema: T.StructType | str | None = None,
    sep: str = "_",
) -> DataFrame:
    """Materialize an API response (list of nested dicts) as a
    flattened DataFrame — the S1 source minus the HTTP call.

    With an explicit schema the frame is deterministic even when
    some records lack fields (the reference's defensive
    missing-column patches, transforms.py:226-233, happen naturally:
    absent keys become NULL under the declared schema)."""
    df = (
        spark.createDataFrame(records, schema=schema)
        if schema is not None
        else spark.createDataFrame(records)
    )
    return flatten_structs(df, sep=sep)
