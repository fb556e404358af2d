"""Laws for exact_substring_spans (the ExactSubstr planning pass).

Mirrors the dup-gram family's test discipline: planted span geometry
(cross-doc repeat, intra-doc repeat, overlap merging, zero-fill),
randomized Python brute-force parity, hot/cold-split byte identity,
and the digest-only-shuffle plan gate. The DuckDB oracle parity at
sf0.001 rides the catalog-wide test (tests/test_catalog_oracle.py).
"""

from __future__ import annotations

import random
import re

import pyspark.sql.functions as F

from chess_pipeline_spark.plans.corpus import (
    exact_substring_spans,
    repeated_spans,
    span_positions,
)


def _docs_df(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def _brute(rows, n):
    """Python ground truth: positional grams, corpus occurrence
    counts, same-length interval island merge (break when the start
    gap exceeds n), per-doc rollup with zero-fill."""
    from collections import Counter

    toks = {d: re.findall(r"[a-z]+", t.lower()) for d, t in rows}
    cnt: Counter = Counter()
    pos: dict[int, list[tuple[int, str]]] = {}
    for d, w in toks.items():
        ps = []
        for i in range(1, len(w) - n + 2):
            g = " ".join(w[i - 1 : i - 1 + n])
            cnt[g] += 1
            ps.append((i, g))
        pos[d] = ps
    out = []
    for d, w in sorted(toks.items()):
        if len(w) < n:
            continue
        rep = [i for i, g in pos[d] if cnt[g] >= 2]
        spans: list[list[int]] = []
        prev = None
        for i in rep:
            if prev is None or i - prev > n:
                spans.append([i, i])
            else:
                spans[-1][1] = i
            prev = i
        merged = [(s, e + n - 1) for s, e in spans]
        dup = sum(e - s + 1 for s, e in merged)
        mx = max((e - s + 1 for s, e in merged), default=0)
        out.append(
            (d, len(w), len(merged), dup, mx, dup * 10000 // len(w))
        )
    return out


def _collect(df):
    return [
        (
            r["doc_id"],
            r["n_words"],
            r["n_spans"],
            r["dup_words"],
            r["max_span_words"],
            r["dup_word_bp"],
        )
        for r in df.orderBy("doc_id").collect()
    ]


def test_planted_span_geometry(spark):
    rows = [
        # docs 1/2 share "a b c" and "b c d": overlapping repeated
        # grams at positions {1,2} / {2,3} must MERGE into one span
        # of 4 words each
        (1, "a b c d e f"),
        (2, "x a b c d y"),
        # no repeats anywhere -> zero-filled row, not a missing row
        (3, "p q r s t u"),
        # intra-doc repeat ("m n o" twice in ONE doc) counts; the two
        # occurrences are > n apart -> TWO spans of 3, not one
        (4, "m n o z w m n o"),
    ]
    pos = span_positions(_docs_df(spark, rows), n=3)
    got = _collect(repeated_spans(pos, n=3))
    assert got == [
        (1, 6, 1, 4, 4, 6666),
        (2, 6, 1, 4, 4, 6666),
        (3, 6, 0, 0, 0, 0),
        (4, 8, 2, 6, 3, 7500),
    ]
    assert got == _brute(rows, 3)


def test_short_docs_excluded(spark):
    rows = [(1, "a b"), (2, "a b c d"), (3, "a b c e")]
    pos = span_positions(_docs_df(spark, rows), n=3)
    got = _collect(repeated_spans(pos, n=3))
    # doc 1 has < n words: no row; docs 2/3 share only "a b c"
    assert [r[0] for r in got] == [2, 3]
    assert got == _brute(rows, 3)


def test_randomized_brute_force_parity(spark):
    rng = random.Random(20260816)
    vocab = ["ab", "cd", "ef", "gh", "ij", "kl", "mn", "op"]
    rows = [
        (
            d,
            " ".join(rng.choice(vocab) for _ in range(rng.randint(2, 20))),
        )
        for d in range(1, 31)
    ]
    pos = span_positions(_docs_df(spark, rows), n=3)
    assert _collect(repeated_spans(pos, n=3)) == _brute(rows, 3)


def test_hot_cold_split_byte_identical(spark):
    # forcing every repeated gram through the broadcast (hot) branch
    # must not change a single row — the dup-gram hot/cold law
    rng = random.Random(7)
    vocab = ["aa", "bb", "cc", "dd"]
    rows = [
        (d, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 15))))
        for d in range(1, 21)
    ]
    pos = span_positions(_docs_df(spark, rows), n=3)
    cold_only = _collect(repeated_spans(pos, n=3))  # hot_cnt = 1e6
    all_hot = _collect(repeated_spans(pos, n=3, hot_cnt=2))
    assert cold_only == all_hot
    assert cold_only == _brute(rows, 3)


def test_spans_plan_digest_only_shuffles(spark, sf_dir):
    # the catalog plan must stay linear and narrow: no cartesian, no
    # gram text or document text on any keyed exchange (positions
    # fold to xxhash64 digests inside the scan-stage transform), and
    # the occurrence count shuffles digests with a map-side partial
    import re as _re

    from chess_pipeline_spark.introspect import explain_text

    df = exact_substring_spans(spark, sf_dir)
    plan = explain_text(df)
    assert "CartesianProduct" not in plan
    sections = _re.split(r"\n\((\d+)\) ", plan)
    keyed_gd = 0
    for head, body in zip(sections[1::2], sections[2::2]):
        node = body.split("\n", 1)[0]
        if not node.startswith("Exchange"):
            continue
        if "REPARTITION_BY_NUM" in body:
            continue  # spread()'s parallelism fix-up — test-scale only
        assert "text#" not in body, f"text rides Exchange ({head}): {body}"
        if "hashpartitioning(gd#" in body:
            keyed_gd += 1
    assert keyed_gd >= 1, plan
    assert plan.count("HashAggregate") >= 4  # map-side partials


def test_catalog_row_matches_brute_force_at_fixture_scale(spark, sf_dir):
    # run the real catalog query at sf0.001 and replay it in Python
    # over the same parquet rows (full-semantics cross-check, not
    # just the planted fixtures)
    rows = [
        (r["doc_id"], r["text"])
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    ]
    got = _collect(exact_substring_spans(spark, sf_dir))
    assert got == _brute(rows, 10)
    # sanity: the fixture corpus actually exercises the operator
    assert any(r[2] > 0 for r in got), "no repeated spans at sf0.001"
