"""Source adapters: REST-JSON flatten (S1/E6), CSV dimension load
(S6), small-file spread."""

from __future__ import annotations

from pyspark.sql import types as T

from chess_pipeline_spark.sinks import load_csv_dimension
from chess_pipeline_spark.sources import load_table, spread
from chess_pipeline_spark.sources.rest import flatten_structs, json_records_source

GAME_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("rated", T.BooleanType()),
        T.StructField(
            "players",
            T.StructType(
                [
                    T.StructField(
                        "white",
                        T.StructType(
                            [
                                T.StructField("rating", T.IntegerType()),
                                T.StructField("provisional", T.BooleanType()),
                            ]
                        ),
                    ),
                    T.StructField(
                        "black",
                        T.StructType([T.StructField("rating", T.IntegerType())]),
                    ),
                ]
            ),
        ),
    ]
)


def test_json_records_flatten_nested(spark):
    records = [
        {"id": "abc", "rated": True,
         "players": {"white": {"rating": 1500, "provisional": True},
                     "black": {"rating": 1600}}},
        # ragged record: missing provisional and black — NULL-filled
        {"id": "xyz", "rated": False,
         "players": {"white": {"rating": 1700, "provisional": None},
                     "black": None}},
    ]
    df = json_records_source(spark, records, schema=GAME_SCHEMA)
    assert df.columns == [
        "id", "rated", "players_white_rating",
        "players_white_provisional", "players_black_rating",
    ]
    rows = {r["id"]: r for r in df.collect()}
    assert rows["abc"]["players_white_rating"] == 1500
    assert rows["abc"]["players_white_provisional"] is True
    assert rows["xyz"]["players_black_rating"] is None


def test_flatten_structs_leaves_arrays_intact(spark):
    df = spark.createDataFrame(
        [(1, {"a": [1, 2, 3]})],
        T.StructType(
            [
                T.StructField("k", T.IntegerType()),
                T.StructField(
                    "s",
                    T.StructType(
                        [T.StructField("a", T.ArrayType(T.IntegerType()))]
                    ),
                ),
            ]
        ),
    )
    out = flatten_structs(df)
    assert out.columns == ["k", "s_a"]
    assert out.first()["s_a"] == [1, 2, 3]


def test_load_csv_dimension(spark, tmp_path):
    # eco_codes-style seed (db/assorted_sql/copy_eco_codes.sql)
    p = tmp_path / "eco.csv"
    p.write_text('A00,"Polish (Sokolsky) opening"\nB00,"King\'s pawn opening"\n')
    schema = T.StructType(
        [
            T.StructField("eco_code", T.StringType()),
            T.StructField("opening_name", T.StringType()),
        ]
    )
    df = load_csv_dimension(spark, str(p), schema)
    rows = {r["eco_code"]: r["opening_name"] for r in df.collect()}
    assert rows == {
        "A00": "Polish (Sokolsky) opening",
        "B00": "King's pawn opening",
    }


def test_spread_noop_when_enough_partitions(spark, sf_dir):
    df = load_table(spark, sf_dir, "lineitem").repartition(64)
    assert spread(df) is df


def test_spread_preserves_rows(spark, sf_dir):
    df = load_table(spark, sf_dir, "documents")
    assert spread(df, "doc_id").count() == df.count()


def test_embedding_queries_survive_float64_layout(spark, sf_dir, tmp_path):
    """The driver regenerates testdata between rounds and physical
    types have drifted before (events ns-timestamps). Embeddings
    could plausibly arrive as array<double> instead of array<float>;
    every embedding query CASTs inside its folds, so both layouts
    must produce identical oracle-parity results."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from chess_pipeline_spark.plans import catalog
    from tests.oracle_harness import run_and_compare

    src = pq.read_table(f"{sf_dir}/embeddings.parquet")
    cols = {name: src.column(name) for name in src.column_names}
    cols["embedding"] = src.column("embedding").cast(pa.list_(pa.float64()))
    d = tmp_path / "f64"
    d.mkdir()
    pq.write_table(pa.table(cols), str(d / "embeddings.parquet"))

    cat = catalog()
    for name in (
        "semdedup_embedding",
        "embedding_quantize_int8",
        "embedding_random_projection",
    ):
        run_and_compare(spark, str(d), name, cat[name])


def test_live_rest_adapter_gating_and_parse(spark):
    """The live-HTTP seam: URL construction matches the reference's
    query surface, the token rides as a Bearer header, ndjson parses
    to records that flow through json_records_source, PGN text flows
    through parse_pgn_dataframe, and the no-opener/no-env path
    refuses loudly (this container has no network)."""
    import io
    import json
    import os

    import pytest

    from chess_pipeline_spark.parse import parse_pgn_dataframe
    from chess_pipeline_spark.sources.rest import (
        fetch_user_games_json,
        fetch_user_games_pgn,
        json_records_source,
        lichess_games_url,
    )
    from tests.test_parse import PGN_FULL

    url = lichess_games_url("someone", 1000, 2000, "blitz", evals="false")
    assert url.startswith("https://lichess.org/api/games/user/someone?")
    assert "since=1000" in url and "until=2000" in url and "perfType=blitz" in url

    seen = {}

    class _Resp(io.BytesIO):
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    def fake_opener(req):
        seen["url"] = req.full_url
        seen["headers"] = dict(req.header_items())
        if "ndjson" in req.get_header("Accept", ""):
            recs = [
                {"id": "abcd1234", "players": {"white": {"rating": 1800}}},
                {"id": "efgh5678", "players": {"white": {"rating": 1700}}},
            ]
            return _Resp("\n".join(json.dumps(r) for r in recs).encode())
        return _Resp(PGN_FULL.encode())

    recs = fetch_user_games_json(
        "someone", 1000, 2000, "blitz", token="tok", opener=fake_opener
    )
    assert [r["id"] for r in recs] == ["abcd1234", "efgh5678"]
    assert seen["headers"].get("Authorization") == "Bearer tok"
    # schemaless dict inference yields maps, so pass the declared
    # schema (the RAW_JSON-contract discipline) to get struct flatten
    flat = json_records_source(
        spark, recs, schema="id string, players struct<white: struct<rating: int>>"
    )
    assert "players_white_rating" in flat.columns
    assert flat.count() == 2

    pgn_text = fetch_user_games_pgn(
        "someone", 1000, 2000, "blitz", opener=fake_opener
    )
    games = parse_pgn_dataframe(
        spark.createDataFrame([(pgn_text,)], "pgn string")
    )
    assert games.count() == 1
    assert games.first().moves == ["e4", "c5", "Nf3", "d6"]

    os.environ.pop("SPARK_GRAFT_LIVE_HTTP", None)
    with pytest.raises(RuntimeError, match="gated"):
        fetch_user_games_json("someone", 1000, 2000, "blitz")
