"""Newsletter tier vs the reference's phrasing and mark semantics
(src/utils/newsletter.py:18-146, src/pipeline_import/plots.py):
text builders reproduce the exact sentences including the tricky
second-row branch, SVGs are well-formed with the expected marks, and
the assembled mail carries both HTML and a tag-free plaintext."""

from __future__ import annotations

import xml.etree.ElementTree as ET

from chess_pipeline_spark.newsletter import (
    build_newsletter,
    color_stats_text,
    elo_by_weekday_text,
    render_color_stats_svg,
    render_elo_by_weekday_svg,
    win_ratio_by_color_text,
)

_CS_SCHEMA = (
    "time_control_category string, player_color string, "
    "win double, draw double, loss double"
)


def _cs(spark, rows):
    return spark.createDataFrame(rows, _CS_SCHEMA)


def test_color_stats_text_branches(spark):
    # single row
    one = _cs(spark, [("blitz", "black", 0.5, 0.25, 0.25)])
    assert (
        color_stats_text(one)
        == "You had a 50.00% win rate with black in blitz."
    )
    # two rows, same category -> tail row, no ' in' suffix
    same = _cs(
        spark,
        [
            ("blitz", "black", 0.5, 0.25, 0.25),
            ("blitz", "white", 0.625, 0.125, 0.25),
        ],
    )
    assert color_stats_text(same) == (
        "You had a 50.00% win rate with black in blitz"
        " and a 62.50% win rate with white."
    )
    # two rows, different categories -> ' in <category>' suffix
    diff = _cs(
        spark,
        [
            ("blitz", "black", 0.5, 0.25, 0.25),
            ("rapid", "white", 1.0, 0.0, 0.0),
        ],
    )
    assert color_stats_text(diff) == (
        "You had a 50.00% win rate with black in blitz"
        " and a 100.00% win rate with white in rapid."
    )
    # empty
    empty = _cs(spark, [])
    assert color_stats_text(empty) == "Wait a second, no you didn't!"
    assert win_ratio_by_color_text(empty) == "Wait a second, no you didn't!"
    assert "cid:win-by-color" in win_ratio_by_color_text(one)


_ELO_SCHEMA = (
    "weekday_played int, mean double, std double, min double, max double"
)


def test_elo_by_weekday_text(spark):
    elo = spark.createDataFrame(
        [(-1, 1500.0, 10.0, 1480.0, 1520.0), (0, 1510.0, 5.0, 1502.0, 1530.0)],
        _ELO_SCHEMA,
    )
    t = elo_by_weekday_text(elo, "blitz")
    assert "your highest elo in blitz was 1530" in t
    assert "your lowest elo was 1480" in t
    assert "cid:elo-by-weekday" in t
    assert elo_by_weekday_text(spark.createDataFrame([], _ELO_SCHEMA), "blitz") == "\n"


def test_svg_renderers_well_formed(spark):
    cs = _cs(
        spark,
        [
            ("blitz", "black", 0.5, 0.25, 0.25),
            ("blitz", "white", 0.625, 0.125, 0.25),
        ],
    )
    svg = render_color_stats_svg(cs)
    root = ET.fromstring(svg)
    ns = "{http://www.w3.org/2000/svg}"
    rects = root.findall(f"{ns}rect")
    assert len(rects) == 6  # 2 bars x 3 segments
    labels = [t.text for t in root.findall(f"{ns}text")]
    assert "50.00%" in labels and "62.50%" in labels

    elo = spark.createDataFrame(
        [(-1, 1500.0, 10.0, 1480.0, 1520.0), (0, 1510.0, 5.0, 1502.0, 1530.0)],
        _ELO_SCHEMA,
    )
    svg2 = render_elo_by_weekday_svg(elo)
    root2 = ET.fromstring(svg2)
    assert root2.findall(f"{ns}polyline"), "no mean line"
    assert root2.findall(f"{ns}polygon"), "no std band"
    assert len(root2.findall(f"{ns}line")) == 2  # min/max whiskers


def test_build_newsletter_assembly():
    out = build_newsletter(
        ["You had a 50.00% win rate with black in blitz. <br>"
         "<img alt='x' src='cid:win-by-color'><br>"],
        "TestPlayer",
        "someone@example.com",
    )
    assert out["subject"] == "Chess Newsletter - TestPlayer"
    assert out["html"].startswith("<html><body>")
    assert "Hi TestPlayer" in out["html"]
    assert "<" not in out["text"] and "50.00% win rate" in out["text"]
    assert "Hope you do well this upcoming week!" in out["text"]


def test_newsletter_end_to_end_from_operators(spark):
    # the real wiring: fixture games -> get_color_stats /
    # get_elo_by_weekday -> texts + SVGs -> assembled mail
    from chess_pipeline_spark.operators.chess_transforms import (
        get_color_stats,
        get_elo_by_weekday,
    )
    from tests.test_chess_domain import PLAYER

    games = spark.createDataFrame(
        [
            ("g1", "blitz", "white", "Win", "2024-01-29 02:34:14", 1800.0),
            ("g2", "blitz", "black", "Loss", "2024-01-30 02:34:14", 1795.0),
            ("g3", "rapid", "white", "Draw", "2024-01-31 02:34:14", 1810.0),
        ],
        "game_link string, time_control_category string, player_color string,"
        " player_result string, datetime_played string, player_elo double",
    )
    cs = get_color_stats(games)
    elo = get_elo_by_weekday(games, category="blitz")
    texts = [
        win_ratio_by_color_text(cs),
        elo_by_weekday_text(elo, "blitz"),
    ]
    out = build_newsletter(texts, PLAYER, "someone@example.com")
    assert "100.00% win rate with black in blitz" not in out["html"]
    assert "win rate" in out["html"]
    assert "your highest elo in blitz was 1800" in out["html"]
    assert "your lowest elo was 1795" in out["html"]
    for svg in (render_color_stats_svg(cs), render_elo_by_weekday_svg(elo)):
        ET.fromstring(svg)
