"""operators.robust.robust_centroid_per_label laws: single-point and
symmetric exactness, outlier resistance vs the arithmetic mean,
optimality against perturbations, determinism, and the plan shape
(one grouped-map applyInPandas, one label-keyed exchange)."""

from __future__ import annotations

import math

from chess_pipeline_spark.operators.robust import robust_centroid_per_label


def _run(spark, rows):
    df = spark.createDataFrame(rows, "label string, embedding array<double>")
    return {
        r["label"]: (list(r["centroid"]), r["n_vecs"])
        for r in robust_centroid_per_label(df).collect()
    }


def _sumdist(points, c):
    return sum(
        math.sqrt(sum((x - y) ** 2 for x, y in zip(p, c))) for p in points
    )


def test_single_point_and_symmetric_groups_are_exact(spark):
    out = _run(
        spark,
        [
            ("solo", [3.0, 4.0]),
            # square around (1, 1): geometric median = center
            ("sq", [0.0, 0.0]),
            ("sq", [2.0, 0.0]),
            ("sq", [0.0, 2.0]),
            ("sq", [2.0, 2.0]),
        ],
    )
    assert out["solo"][0] == [3.0, 4.0] and out["solo"][1] == 1
    assert all(abs(v - 1.0) < 1e-9 for v in out["sq"][0]) and out["sq"][1] == 4


def test_outlier_resistance_beats_mean(spark):
    # 9 points at the origin cluster + 1 far outlier: the mean is
    # dragged ~10% of the way out; the geometric median stays at the
    # cluster and strictly wins on total distance
    pts = [[0.0, 0.0]] * 9 + [[1000.0, 0.0]]
    out = _run(spark, [("g", p) for p in pts])
    c = out["g"][0]
    assert abs(c[0]) < 1.0 and abs(c[1]) < 1e-9, c
    mean = [100.0, 0.0]
    assert _sumdist(pts, c) < _sumdist(pts, mean)


def test_weiszfeld_is_locally_optimal_and_deterministic(spark):
    rows = [
        ("g", [float(i % 7), float((i * 3) % 5), float(i % 2)])
        for i in range(40)
    ]
    a = _run(spark, rows)["g"][0]
    b = _run(spark, rows)["g"][0]
    assert a == b  # fixed iters, fixed start, no RNG
    pts = [r[1] for r in rows]
    base = _sumdist(pts, a)
    for dim in range(3):
        for step in (0.05, -0.05):
            c = list(a)
            c[dim] += step
            assert base <= _sumdist(pts, c) + 1e-9


def test_plan_is_single_label_keyed_grouped_map(spark):
    df = spark.createDataFrame(
        [("a", [1.0]), ("b", [2.0])], "label string, embedding array<double>"
    )
    out = robust_centroid_per_label(df)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "FlatMapGroupsInPandas" in plan
    assert plan.count("Exchange") <= 2  # tree+detail of the ONE label exchange


def _run_bucketed(spark, rows, n_buckets):
    from chess_pipeline_spark.operators.robust import (
        robust_centroid_per_label_bucketed,
    )

    df = spark.createDataFrame(rows, "label string, embedding array<double>")
    return {
        r["label"]: (list(r["centroid"]), r["n_vecs"])
        for r in robust_centroid_per_label_bucketed(
            df, n_buckets=n_buckets
        ).collect()
    }


def test_bucketed_single_bucket_equals_exact(spark):
    # n_buckets=1: level 1 folds the whole group, level 2's weighted
    # merge of one row returns it unchanged — bit-equal to the exact
    # single-level path
    rows = [
        ("g", [float(i % 7), float((i * 3) % 5), float(i % 2)])
        for i in range(40)
    ] + [("h", [1.0, 2.0, 3.0])]
    exact = _run(spark, rows)
    two_level = _run_bucketed(spark, rows, n_buckets=1)
    assert two_level == exact


def test_bucketed_objective_within_2pct_of_exact(spark):
    # adversarial fixture: a tight cluster + 10% far outliers (the
    # case the geometric median exists for). The two-level result
    # must stay within 2% of the exact objective AND keep the
    # outlier resistance (centroid near the cluster, not the mean).
    import math

    pts = [
        [math.cos(i * 0.7) * 0.5 + 10.0, math.sin(i * 1.3) * 0.5 - 4.0]
        for i in range(90)
    ] + [[1000.0 + i, -500.0] for i in range(10)]
    rows = [("g", p) for p in pts]
    exact_c = _run(spark, rows)["g"][0]
    for n_buckets in (4, 8, 16):
        c2 = _run_bucketed(spark, rows, n_buckets=n_buckets)["g"][0]
        assert _sumdist(pts, c2) <= 1.02 * _sumdist(pts, exact_c), n_buckets
        assert abs(c2[0] - 10.0) < 1.0 and abs(c2[1] + 4.0) < 1.0, c2


def test_bucketed_deterministic_and_counts(spark):
    rows = [
        ("a", [float(i), float(2 * i)]) for i in range(25)
    ] + [("b", [5.0, 5.0])] * 3
    one = _run_bucketed(spark, rows, n_buckets=8)
    two = _run_bucketed(spark, rows, n_buckets=8)
    assert one == two  # content-hash buckets: no RNG, no row-order
    assert one["a"][1] == 25 and one["b"][1] == 3


def test_bucketed_spreads_duplicate_vectors(spark):
    """The r9 ADVICE duplicate-skew fix: a mode-collapsed label (one
    vector repeated many times) must NOT reunite in a single bucket —
    the Arrow-batch cap the bucketing exists for fails exactly on the
    duplicate-heavy data the dedup/diversity tiers handle. Both the
    row_number fallback and the id_col path must cap every
    (label, bucket) group at ~n/n_buckets."""
    import pyspark.sql.functions as F

    from chess_pipeline_spark.operators.robust import _bucketize

    n, n_buckets = 256, 8
    rows = [("collapsed", [1.5, -2.5, 0.25], i) for i in range(n)]
    df = spark.createDataFrame(
        rows, "label string, embedding array<double>, rid long"
    )
    for id_col in (None, "rid"):
        b = _bucketize(df, "label", "embedding", n_buckets, id_col)
        sizes = [
            r["c"]
            for r in b.groupBy("__bucket").agg(F.count("*").alias("c")).collect()
        ]
        assert sum(sizes) == n
        if id_col is None:
            # round-robin over duplicates: perfectly balanced
            assert len(sizes) == n_buckets and max(sizes) == n // n_buckets
        else:
            # hash-mixed: balanced up to hash noise, never one bucket
            assert len(sizes) == n_buckets
            assert max(sizes) <= 3 * (n // n_buckets), sizes
    # end-to-end: the centroid of the collapsed label is the vector
    # itself with the full count, whichever path assigned the buckets
    out = _run_bucketed(spark, [(l, v) for l, v, _ in rows], n_buckets=8)
    assert out["collapsed"][1] == n
    assert all(abs(a - b) < 1e-9 for a, b in zip(out["collapsed"][0], [1.5, -2.5, 0.25]))


def test_bucketed_plan_has_two_grouped_maps(spark):
    from chess_pipeline_spark.operators.robust import (
        robust_centroid_per_label_bucketed,
    )

    df = spark.createDataFrame(
        [("a", [1.0]), ("b", [2.0])], "label string, embedding array<double>"
    )
    out = robust_centroid_per_label_bucketed(df, n_buckets=4)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    # (label, bucket) fold + label merge: exactly two grouped maps
    # (tree + detail section each mention a node once, so 2 nodes =
    # 4 occurrences, matching the Exchange-count convention above);
    # the second exchange moves ONLY partials (<= n_buckets rows per
    # label), never the corpus
    assert plan.count("FlatMapGroupsInPandas") == 4
