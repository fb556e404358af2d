"""Sketch-algebra properties for the profiling tier.

Oracle parity (test_catalog_oracle) proves Spark == DuckDB; these
prove the MATH: the guarantees each sketch advertises hold on real
data — mergeability, one-sided error, bounded quantile drift. A
refactor that kept both engines wrong in the same way would pass
parity but fail here.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from chess_pipeline_spark.plans.profiling import (
    _QBIN_W,
    hll_registers_for,
)
from chess_pipeline_spark.plans import catalog
from chess_pipeline_spark.sources import load_table

_CATALOG = catalog()


def test_hll_registers_merge_invariant(spark, sf_dir):
    """max-merge of per-day register tables == registers of the whole
    stream: the mergeability claim the streaming ledger relies on,
    checked against an arbitrary (date-based) partitioning."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.md5(F.col("user_id").cast("string")).alias("h"),
        F.to_date("ts").alias("day"),
    )
    direct = hll_registers_for(ev.select("event_type", "h"))

    by_day = (
        ev.select("event_type", "day", "h")
        .withColumn("event_type_day", F.concat_ws("|", "event_type", "day"))
        .select(F.col("event_type_day").alias("event_type"), "h")
    )
    daily = hll_registers_for(by_day).select(
        F.split("event_type", r"\|")[0].alias("event_type"), "reg", "m_j"
    )
    merged = daily.groupBy("event_type", "reg").agg(F.max("m_j").alias("m_j"))

    d = {(r.event_type, r.reg): r.m_j for r in direct.collect()}
    m = {(r.event_type, r.reg): r.m_j for r in merged.collect()}
    assert d == m and len(d) > 0


def test_hll_estimate_within_tolerance(spark, sf_dir):
    """m=256 gives ~1.04/sqrt(m) ≈ 6.5% standard error; assert every
    group lands within 4 sigma (26%) — loose enough to survive driver
    testdata regeneration, tight enough to catch broken register
    math (which typically errs by 2-10x)."""
    rows = _CATALOG["hll_distinct_users"].spark(spark, sf_dir).collect()
    assert rows
    for r in rows:
        rel = abs(r.hll_estimate - r.n_exact) / max(r.n_exact, 1)
        assert rel < 0.26, (r.event_type, r.n_exact, r.hll_estimate)


def test_cms_never_underestimates(spark, sf_dir):
    """The Count-Min guarantee is one-sided: estimate >= exact,
    always — an underestimate means the hash rows disagree between
    the sketch fold and the probe."""
    rows = _CATALOG["cms_heavy_hitters"].spark(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.cms_estimate >= r.n_exact, (r.word, r.n_exact, r.cms_estimate)


def test_binned_quantile_contains_order_statistic(spark, sf_dir):
    """The real histogram guarantee: the reported edge is the lower
    edge of the bin holding the ceil(q·n)-th ORDER STATISTIC, so that
    value must lie in [edge, edge + W). (The exact INTERPOLATED
    percentile can legitimately cross into the next bin — between two
    order statistics — so no fixed bound against it exists; the
    containment below is what the sketch promises.)"""
    import math

    rows = _CATALOG["value_quantiles_binned"].spark(spark, sf_dir).collect()
    assert rows
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    by_type: dict[str, list[float]] = {}
    for r in ev.collect():
        if r.value is not None:
            by_type.setdefault(r.event_type, []).append(r.value)
    for r in rows:
        vals = sorted(by_type[r.event_type])
        assert len(vals) == r.n
        for q, edge in ((0.5, r.p50_binned), (0.9, r.p90_binned), (0.99, r.p99_binned)):
            x_k = vals[math.ceil(q * r.n) - 1]
            # clamp: values beyond the last bin report the last edge
            x_k_c = min(x_k, (1000 - 1) * _QBIN_W)
            assert edge <= x_k_c + 1e-9 < edge + _QBIN_W + 1e-9, (
                r.event_type,
                q,
                edge,
                x_k,
            )


def test_hll_cumulative_final_day_equals_whole_stream(spark, sf_dir):
    """The last day's cumulative estimate must equal the whole-stream
    hll_distinct_users estimate exactly — forward-filled max-merge
    over days is the same register table as one pass over everything."""
    cum = _CATALOG["hll_cumulative_daily"].spark(spark, sf_dir).collect()
    last = {}
    for r in cum:
        cur = last.get(r.event_type)
        if cur is None or r.day > cur.day:
            last[r.event_type] = r
    whole = {
        r.event_type: (r.n_exact, r.hll_estimate)
        for r in _CATALOG["hll_distinct_users"].spark(spark, sf_dir).collect()
    }
    assert set(last) == set(whole)
    for t, r in last.items():
        n_exact, est = whole[t]
        assert r.n_exact_cum == n_exact, t
        assert abs(r.hll_estimate_cum - est) < 1e-9, t
