"""operators.temporal.point_in_time_join unit laws: correct version
selection at boundaries, left-join backfill semantics, composition
with the scd2_apply sink (the dimension it is designed to read), and
the misuse guards."""

from __future__ import annotations

import pytest

import pyspark.sql.functions as F

from chess_pipeline_spark.operators.temporal import point_in_time_join
from chess_pipeline_spark.sinks import scd2_apply


def _dim(spark):
    # key 1: two versions, cut at t=100; key 2: single open version
    rows = [
        (1, 10.0, 0, 100, False),
        (1, 20.0, 100, None, True),
        (2, 5.0, 50, None, True),
    ]
    return spark.createDataFrame(
        rows, "k int, bal double, valid_from long, valid_to long, is_current boolean"
    )


def _facts(spark):
    # ts hits: inside v1, the exact cut (belongs to v2: half-open
    # windows), far future (v2), before key 2 exists, after
    rows = [(101, 1, 50), (102, 1, 100), (103, 1, 999), (104, 2, 10), (105, 2, 60)]
    return spark.createDataFrame(rows, "fact_id int, k int, ts long")


def test_pit_selects_the_containing_version(spark):
    out = {
        r["fact_id"]: (r["bal"], r["is_current"])
        for r in point_in_time_join(
            _facts(spark), _dim(spark), keys=["k"], fact_ts="ts"
        ).collect()
    }
    # fact 104 predates key 2's first version -> dropped (inner)
    assert out == {
        101: (10.0, False),
        102: (20.0, True),   # boundary ts == valid_from of v2: half-open
        103: (20.0, True),
        105: (5.0, True),
    }


def test_pit_left_join_keeps_orphan_facts(spark):
    out = {
        r["fact_id"]: r["bal"]
        for r in point_in_time_join(
            _facts(spark), _dim(spark), keys=["k"], fact_ts="ts", how="left"
        ).collect()
    }
    assert out[104] is None and len(out) == 5


def test_pit_reads_scd2_apply_output_directly(spark):
    """Composition law: fold a batch through the scd2_apply sink,
    then look up facts on either side of the merge timestamp — the
    pre-merge fact sees the OLD balance, the post-merge fact the NEW
    one. The sink's output schema is the operator's input contract."""
    current = spark.createDataFrame(
        [(1, 10.0, 0, None, True)],
        "k int, bal double, valid_from long, valid_to long, is_current boolean",
    )
    batch = spark.createDataFrame([(1, 99.0)], "k int, bal double")
    dim = scd2_apply(current, batch, keys=["k"], attrs=["bal"], batch_ts=500)
    facts = spark.createDataFrame([(1, 1, 499), (2, 1, 500)], "fact_id int, k int, ts long")
    out = {
        r["fact_id"]: r["bal"]
        for r in point_in_time_join(
            facts, dim.drop("is_current"), keys=["k"], fact_ts="ts"
        ).collect()
    }
    assert out == {1: 10.0, 2: 99.0}


def test_pit_rejects_clashing_columns_and_bad_how(spark):
    facts = _facts(spark).withColumn("bal", F.lit(0.0))
    with pytest.raises(ValueError, match="already exist"):
        point_in_time_join(facts, _dim(spark), keys=["k"], fact_ts="ts")
    with pytest.raises(ValueError, match="inner|left"):
        point_in_time_join(
            _facts(spark), _dim(spark), keys=["k"], fact_ts="ts", how="outer"
        )


def test_pit_plan_is_keyed_equi_join(spark):
    # the operator's reason to exist: the interval predicate rides
    # the KEY hash join, never a nested-loop range join
    df = point_in_time_join(_facts(spark), _dim(spark), keys=["k"], fact_ts="ts")
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pit_matches_bruteforce_on_random_histories(spark):
    """Randomized ground truth: generate an SCD2 history (disjoint,
    contiguous versions per key, last one open) and random facts;
    point_in_time_join must equal the per-row python scan. Exercises
    many-version keys, facts before the first version, and exact
    boundary timestamps — shapes the fixture dim is too small to
    cover."""
    import random

    rng = random.Random(13)
    dim_rows, truth = [], {}
    for k in range(1, 21):
        n_versions = rng.randint(1, 4)
        cuts = sorted(rng.sample(range(1, 100), n_versions - 1)) if n_versions > 1 else []
        bounds = [0, *cuts, None]
        spans = []
        for v in range(n_versions):
            lo, hi = bounds[v], bounds[v + 1]
            spans.append((k, float(k * 100 + v), lo, hi, hi is None))
        dim_rows.extend(spans)
        truth[k] = spans
    fact_rows = []
    for f in range(300):
        k = rng.randint(0, 22)  # includes keys with no dim rows
        ts = rng.randint(0, 120)
        fact_rows.append((f, k, ts))
    dim = spark.createDataFrame(
        dim_rows, "k int, bal double, valid_from long, valid_to long, is_current boolean"
    )
    facts = spark.createDataFrame(fact_rows, "fact_id int, k int, ts long")

    def expect(k, ts):
        for _, bal, lo, hi, _cur in truth.get(k, []):
            if lo <= ts and (hi is None or ts < hi):
                return bal
        return None

    got = {
        r["fact_id"]: r["bal"]
        for r in point_in_time_join(
            facts, dim, keys=["k"], fact_ts="ts", how="left"
        ).collect()
    }
    assert len(got) == 300
    for f, k, ts in fact_rows:
        assert got[f] == expect(k, ts), (f, k, ts, got[f], expect(k, ts))
