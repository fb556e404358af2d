"""Laws for exact_substring_rewrite (the ExactSubstr removal pass).

Mirrors the spans family's discipline: planted rewrite geometry
(overlap merge, whole-doc removal, zero-removal pass-through),
randomized Python brute-force parity, the spans↔rewrite consistency
law (removed_words must equal the spans rollup's dup_words row for
row — shared interval machinery, two consumers), and a plan gate
(the rewrite may carry text to the OUTPUT, but the gram-count
exchange must still be digest-only). DuckDB oracle parity at
sf0.001/sf0.01 rides the catalog-wide sweep.
"""

from __future__ import annotations

import random
import re

import pyspark.sql.functions as F

from chess_pipeline_spark.plans.corpus import (
    _SPANGRAM_N,
    exact_substring_rewrite,
    exact_substring_spans,
    repeated_span_intervals,
    span_positions,
)


def _docs_df(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def _brute_rewrite(rows, n):
    """Python ground truth: corpus gram counts, covered word indexes
    (union of [i, i+n-1] over repeated-gram starts), kept-token join."""
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
        covered = set()
        for i, g in pos[d]:
            if cnt[g] >= 2:
                covered.update(range(i, i + n))
        kept = [t for j, t in enumerate(w, start=1) if j not in covered]
        out.append((d, len(w), len(w) - len(kept), " ".join(kept)))
    return out


def _rewrite_rows(docs, n):
    """Planted-geometry runner: the catalog query hard-wires the
    module n, so planted tests re-assemble the same plan from the
    shared pieces at a small n."""
    words = docs.select(
        "doc_id",
        F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)").alias("w"),
    ).filter(F.size("w") >= n)
    doc_spans = (
        repeated_span_intervals(span_positions(docs, n=n), n=n)
        .groupBy("doc_id")
        .agg(F.collect_list(F.struct("s", "e")).alias("spans"))
    )
    kept = (
        "filter(transform(w, (x, j) -> struct(x AS t, CAST(j + 1 AS BIGINT)"
        " AS i)), p -> NOT exists(coalesce(spans, array()),"
        " sp -> p.i >= sp.s AND p.i <= sp.e))"
    )
    out = (
        words.join(doc_spans, "doc_id", "left")
        .select(
            "doc_id",
            F.size("w").cast("long").alias("n_words"),
            F.expr(kept).alias("k"),
        )
        .select(
            "doc_id",
            "n_words",
            (F.col("n_words") - F.size("k")).cast("long").alias("removed_words"),
            F.expr("concat_ws(' ', transform(k, p -> p.t))").alias("text_clean"),
        )
    )
    return [
        (r["doc_id"], r["n_words"], r["removed_words"], r["text_clean"])
        for r in out.orderBy("doc_id").collect()
    ]


def test_planted_rewrite_geometry(spark):
    rows = [
        # docs 1/2 share "a b c" / "b c d": overlapping grams merge,
        # 4 covered words drop from EACH copy (Lee et al. remove all
        # occurrences)
        (1, "a b c d e f"),
        (2, "x a b c d y"),
        # no repeats -> pass-through, 0 removed
        (3, "p q r s t u"),
        # whole doc is one repeated gram (both copies of "m n o"
        # within reach): doc collapses toward ''
        (4, "m n o m n o"),
    ]
    got = _rewrite_rows(_docs_df(spark, rows), n=3)
    assert got == [
        (1, 6, 4, "e f"),
        (2, 6, 4, "x y"),
        (3, 6, 0, "p q r s t u"),
        (4, 6, 6, ""),
    ]
    assert got == _brute_rewrite(rows, 3)


def test_randomized_brute_force_parity(spark):
    rng = random.Random(20260817)
    vocab = ["ab", "cd", "ef", "gh", "ij", "kl", "mn", "op"]
    rows = [
        (d, " ".join(rng.choice(vocab) for _ in range(rng.randint(2, 20))))
        for d in range(1, 31)
    ]
    assert _rewrite_rows(_docs_df(spark, rows), n=3) == _brute_rewrite(rows, 3)


def test_rewrite_consistent_with_spans_rollup(spark, sf_dir):
    # the two consumers of repeated_span_intervals must agree row for
    # row: removed_words == the spans rollup's dup_words, and the
    # cleaned text's word count == n_words - dup_words
    spans = {
        r["doc_id"]: (r["n_words"], r["dup_words"])
        for r in exact_substring_spans(spark, sf_dir).collect()
    }
    out = exact_substring_rewrite(spark, sf_dir).collect()
    assert {r["doc_id"] for r in out} == set(spans)
    for r in out:
        n_words, dup_words = spans[r["doc_id"]]
        assert r["n_words"] == n_words
        assert r["removed_words"] == dup_words
        kept = len(r["text_clean"].split()) if r["text_clean"] else 0
        assert kept == n_words - dup_words
    # the fixture corpus actually exercises removal
    assert any(r["removed_words"] > 0 for r in out)


def test_catalog_row_matches_brute_force_at_fixture_scale(spark, sf_dir):
    rows = [
        (r["doc_id"], r["text"])
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    ]
    got = [
        (r["doc_id"], r["n_words"], r["removed_words"], r["text_clean"])
        for r in exact_substring_rewrite(spark, sf_dir).collect()
    ]
    assert got == _brute_rewrite(rows, _SPANGRAM_N)


def test_rewrite_plan_gram_exchange_digest_only(spark, sf_dir):
    # text legitimately flows to the OUTPUT here (it IS the output),
    # but the gram-count exchange must still carry digests only, and
    # nothing may go cartesian
    import re as _re

    from chess_pipeline_spark.introspect import explain_text

    plan = explain_text(exact_substring_rewrite(spark, sf_dir))
    assert "CartesianProduct" not in plan
    sections = _re.split(r"\n\((\d+)\) ", plan)
    keyed_gd = 0
    for head, body in zip(sections[1::2], sections[2::2]):
        node = body.split("\n", 1)[0]
        if not node.startswith("Exchange"):
            continue
        if "hashpartitioning(gd#" in body:
            keyed_gd += 1
            assert "text#" not in body, f"text rides the gram Exchange: {body}"
    assert keyed_gd >= 1, plan
