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


# ------------------------------------------------------------------
# Opt-in live HTTP adapter (stdlib urllib; no third-party client)
# ------------------------------------------------------------------
#
# The reference's vendor layer does live HTTP against the Lichess
# export API (src/vendors/lichess.py:25-123, via the `lichess`
# package). This container has no network, so the live path is
# DOUBLY gated: callers must either inject an `opener` (tests pass a
# fake; production passes None) or set SPARK_GRAFT_LIVE_HTTP=1 to
# reach the real urllib opener. Everything below the fetch reuses
# the engine surface above (json_records_source / parse_pgn_dataframe).

_LICHESS_BASE = "https://lichess.org/api/games/user"


def lichess_games_url(
    player: str,
    since_ms: int,
    until_ms: int,
    perf_type: str,
    **flags: str,
) -> str:
    """The export-endpoint URL the reference's vendor builds
    (lichess.py:43-51 query surface: since/until/perfType plus
    per-call feature flags like evals/clocks/moves/opening)."""
    from urllib.parse import urlencode

    params = {
        "since": str(since_ms),
        "until": str(until_ms),
        "perfType": perf_type,
        **{k: str(v) for k, v in sorted(flags.items())},
    }
    return f"{_LICHESS_BASE}/{player}?{urlencode(params)}"


def _http_get(url: str, headers: dict[str, str], opener=None) -> bytes:
    import os as _os
    import urllib.request

    if opener is None:
        if _os.environ.get("SPARK_GRAFT_LIVE_HTTP") != "1":
            raise RuntimeError(
                "live HTTP is gated: set SPARK_GRAFT_LIVE_HTTP=1 or inject "
                "an opener (this container has no network)"
            )
        opener = urllib.request.urlopen
    req = urllib.request.Request(url, headers=headers)
    with opener(req) as resp:
        return resp.read()


def fetch_user_games_json(
    player: str,
    since_ms: int,
    until_ms: int,
    perf_type: str,
    token: str | None = None,
    opener=None,
) -> list[dict]:
    """ND-JSON games export -> list of nested records, ready for
    json_records_source (the reference's fetch_lichess_api_json,
    lichess.py:25-58, minus pandas)."""
    import json as _json

    url = lichess_games_url(
        player, since_ms, until_ms, perf_type,
        evals="false", clocks="false", moves="false",
    )
    headers = {"Accept": "application/x-ndjson"}
    if token:
        headers["Authorization"] = f"Bearer {token}"
    raw = _http_get(url, headers, opener)
    return [
        _json.loads(line)
        for line in raw.decode("utf-8").splitlines()
        if line.strip()
    ]


def fetch_user_games_pgn(
    player: str,
    since_ms: int,
    until_ms: int,
    perf_type: str,
    token: str | None = None,
    opener=None,
) -> str:
    """Multi-game PGN export text, ready for parse_pgn_dataframe
    (the reference's fetch_lichess_api_pgn, lichess.py:61-123 —
    there the per-game visitor loop runs on the driver; here the
    text goes to the mapInPandas parser, so parse work distributes)."""
    url = lichess_games_url(
        player, since_ms, until_ms, perf_type,
        clocks="true", evals="true", opening="true",
    )
    headers = {"Accept": "application/x-chess-pgn"}
    if token:
        headers["Authorization"] = f"Bearer {token}"
    return _http_get(url, headers, opener).decode("utf-8")
