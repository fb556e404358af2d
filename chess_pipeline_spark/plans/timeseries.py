"""Time-series / streaming-semantics queries over the events table.

The reference is strictly batch (SURVEY §2.11) — these are the
Structured-Streaming extension surface expressed in their *batch*
equivalents so the DuckDB oracle can check semantics. The true
streaming variants (readStream + watermark + the same window specs)
live in chess_pipeline_spark/streaming/ and are covered by pytest.

Timestamp discipline: events.ts has shipped as both TIMESTAMP(NANOS)
and TIMESTAMP(MICROS) parquet across driver testdata generations;
sources.load_table normalizes either to exact integer epoch seconds
(ts_sec), and all window math here runs on ts_sec so no float or
sub-second precision can diverge between engines. The DuckDB oracle
macro uses epoch_ns(ts), which accepts both layouts. Window
boundaries are exported as epoch seconds (BIGINT).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from chess_pipeline_spark.functions.rounding import (
    fround,
    grid_cents,
    grid_sum,
    sql_round,
)
from chess_pipeline_spark.plans.spec import QuerySpec
from chess_pipeline_spark.sources import load_table as _L

# DuckDB equivalent of ts_sec (exact integer truncation of ns epoch)
_TS_SEC = "(epoch_ns(ts) // 1000000000)"


def value_stats_by_weekday(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-weekday multi-agg stats (A3+F9 — elo_by_weekday,
    transforms.py:420-440): mean/std/min/max with NULL std→0."""
    ev = _L(spark, sf_dir, "events")
    return (
        ev.withColumn("weekday", (F.dayofweek("ts") - 1).cast("int"))
        .groupBy("weekday")
        .agg(
fround(
                F.sum(grid_cents("value", 2))
                / F.lit(100.0)
                / F.count("value"),
                6,
            ).alias("mean_value"),
            fround(F.coalesce(F.stddev_samp("value"), F.lit(0.0)), 6).alias("std_value"),
            fround(F.min("value"), 2).alias("min_value"),
            fround(F.max("value"), 2).alias("max_value"),
            F.count("*").alias("n_events"),
        )
    )


VALUE_STATS_BY_WEEKDAY_SQL = """
SELECT CAST(dayofweek(ts) AS INT) AS weekday,
       floor((sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) / 100.0 / count(value)) * 1000000.0 + 0.5) / 1000000.0 AS mean_value,
       floor((coalesce(stddev_samp(value), 0)) * 1000000.0 + 0.5) / 1000000.0 AS std_value,
       floor((min(value)) * 100.0 + 0.5) / 100.0 AS min_value,
       floor((max(value)) * 100.0 + 0.5) / 100.0 AS max_value,
       count(*) AS n_events
FROM events GROUP BY 1
"""


def weekday_recode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's exact Sunday-first weekday recode (F9,
    transforms.py:423-426): pandas weekday (Mon=0..Sun=6) with 6→-1,
    so Sunday=-1, Monday=0, ..., Saturday=5 — reproduced from Spark's
    Sunday=1 dayofweek and DuckDB's Sunday=0 dayofweek."""
    ev = _L(spark, sf_dir, "events")
    pandas_weekday = F.when(F.dayofweek("ts") == 1, 6).otherwise(F.dayofweek("ts") - 2)
    recoded = F.when(pandas_weekday == 6, -1).otherwise(pandas_weekday)
    return ev.groupBy(recoded.cast("int").alias("weekday_recode")).agg(
        F.count("*").alias("n"),
        fround(
            F.sum(grid_cents("value", 2)) / F.lit(100.0) / F.count("value"), 6
        ).alias("mean_value"),
    )


WEEKDAY_RECODE_SQL = """
SELECT CAST(CASE WHEN dayofweek(ts) = 0 THEN -1 ELSE dayofweek(ts) - 1 END AS INT)
         AS weekday_recode,
       count(*) AS n,
       floor((sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) / 100.0 / count(value)) * 1000000.0 + 0.5) / 1000000.0 AS mean_value
FROM events GROUP BY 1
"""


def events_tumbling_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregate by event_type — the batch
    equivalent of the streaming groupBy(window(ts,'1 hour')) plan
    (streaming/windows.py). Window start exported as epoch seconds."""
    ev = _L(spark, sf_dir, "events")
    win = F.window("ts", "1 hour")
    return (
        ev.groupBy(win.alias("w"), "event_type")
        .agg(F.count("*").alias("n"), grid_sum("value", 2).alias("sum_value"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


EVENTS_TUMBLING_1H_SQL = f"""
SELECT ({_TS_SEC} // 3600) * 3600 AS window_start,
       event_type,
       count(*) AS n,
       (sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) / 100.0) AS sum_value
FROM events
GROUP BY 1, 2
"""


def events_sliding_1h_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (1h length, 30m slide): every event belongs to
    two windows. Oracle expresses the same by unnesting the two
    candidate window starts."""
    ev = _L(spark, sf_dir, "events")
    win = F.window("ts", "1 hour", "30 minutes")
    return (
        ev.groupBy(win.alias("w"), "event_type")
        .agg(F.count("*").alias("n"), grid_sum("value", 2).alias("sum_value"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


EVENTS_SLIDING_1H_30M_SQL = f"""
WITH e AS (
  SELECT event_type, value,
         unnest([({_TS_SEC} // 1800) * 1800,
                 ({_TS_SEC} // 1800) * 1800 - 1800]) AS window_start
  FROM events)
SELECT window_start, event_type,
       count(*) AS n,
       (sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) / 100.0) AS sum_value
FROM e GROUP BY 1, 2
"""


def _session_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user_id, session_id, session_start, session_end, n_events,
    value sum pre-round) — the lag+cumsum sessionization core shared
    by events_sessionized and the sweep-line concurrency query."""
    ev = _L(spark, sf_dir, "events").select("user_id", "event_id", "ts_sec", "value")
    w = Window.partitionBy("user_id").orderBy("ts_sec", "event_id")
    gap = F.when(
        (F.col("ts_sec") - F.lag("ts_sec", 1).over(w)) > 1800, 1
    ).otherwise(0)
    sess = ev.withColumn("new_session", gap).withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.min("ts_sec").alias("session_start"),
        F.max("ts_sec").alias("session_end"),
        F.count("*").alias("n_events"),
        F.sum(grid_cents("value", 2)).alias("raw_sum_cents"),
    )


def events_sessionized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization with a 30-minute inactivity gap per user
    (streaming session_window analog), expressed as the classic
    lag+cumsum composition so both engines agree exactly. Works on
    integer seconds with event_id as total tiebreak. Emits
    per-session start/end/count/sum."""
    return _session_frame(spark, sf_dir).select(
        "user_id",
        "session_id",
        "session_start",
        "session_end",
        "n_events",
        (F.col("raw_sum_cents") / F.lit(100.0)).alias("sum_value"),
    )


EVENTS_SESSIONIZED_SQL = f"""
WITH t AS (
  SELECT user_id, event_id, {_TS_SEC} AS ts_sec, value FROM events),
flagged AS (
  SELECT user_id, event_id, ts_sec, value,
         CASE WHEN ts_sec - lag(ts_sec) OVER w > 1800 THEN 1 ELSE 0 END AS new_session
  FROM t WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id)),
sessions AS (
  SELECT user_id, ts_sec, value,
         CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM flagged)
SELECT user_id, session_id,
       min(ts_sec) AS session_start,
       max(ts_sec) AS session_end,
       count(*) AS n_events,
       (sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) / 100.0) AS sum_value
FROM sessions GROUP BY user_id, session_id
"""


# ------------------------------------------------------------------
# Sweep-line peak concurrency via bucketed prefix sums
# ------------------------------------------------------------------

_CONC_BUCKET_S = 3600  # sweep buckets: one hour


def concurrency_peak_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per day — the capacity-planning
    number ("how many users were on at once") — computed by the
    sweep line: every session contributes +1 at its start and -1 one
    second after its inclusive end; concurrency at any instant is the
    running sum of deltas; the day's peak is the max of that running
    sum over the day.

    The scalable decomposition (and the reason this query exists):
    the textbook form is ONE global-order running-sum window — the
    anti-pattern that serializes the corpus through a single
    partition. Instead the prefix sum splits two-level, exactly like
    a parallel scan: (1) per-hour delta totals (map-side-combined
    shuffle to ≤ #hours rows), (2) an unbounded window over THAT
    bounded bucket frame for each hour's carry-in offset, (3) a
    within-hour running sum partitioned by hour (state bounded by
    events-per-hour), (4) concurrency = carry-in + within-hour sum.
    Deltas order (-1 before +1) at equal timestamps is made total
    with (t, d, user_id, session_id), so both engines walk the same
    sweep. All-integer arithmetic.
    """
    # r14 restructure (guide §2.4 — remove redundant passes): the old
    # form UNIONED two selects of the session frame (2 sessionization
    # subtree evaluations) and then consumed `deltas` twice — once for
    # the per-bucket carry aggregation, once joined back against it —
    # so the events scan + sessionization windows executed 4x per run.
    # This form (a) emits both deltas from ONE pass via explode, and
    # (b) aggregates each bucket BEFORE the carry: because the bucket
    # width divides a day, max(conc) over a day's rows equals
    # max over its buckets of (carry_in + max within-bucket running
    # sum), and sessions_started sums per bucket. The within-bucket
    # window and the per-bucket aggregation share one hash exchange;
    # everything after is ≤ #buckets rows — the carry join-back on the
    # delta-scale frame is gone entirely. Same total order (t, d,
    # user_id, session_id), all-integer arithmetic: results identical
    # (oracle hash).
    assert 86400 % _CONC_BUCKET_S == 0  # day-alignment the fold relies on
    sess = _session_frame(spark, sf_dir)
    deltas = sess.select(
        "user_id",
        "session_id",
        F.explode(
            F.array(
                F.struct(
                    F.col("session_start").alias("t"), F.lit(1).alias("d")
                ),
                F.struct(
                    (F.col("session_end") + 1).alias("t"),
                    F.lit(-1).alias("d"),
                ),
            )
        ).alias("e"),
    ).select(
        F.col("e.t").alias("t"),
        F.col("e.d").alias("d"),
        "user_id",
        "session_id",
        F.floor(F.col("e.t") / _CONC_BUCKET_S).cast("long").alias("bucket"),
    )
    wb = Window.partitionBy("bucket").orderBy(
        "t", "d", "user_id", "session_id"
    )
    per_bucket = (
        deltas.withColumn(
            "within",
            F.sum("d").over(wb.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy("bucket")
        .agg(
            F.max("within").alias("mx"),
            F.sum("d").alias("bucket_delta"),
            F.sum(F.when(F.col("d") == 1, 1).otherwise(0)).alias("starts"),
        )
    )
    carried = per_bucket.withColumn(
        "carry_in",
        F.coalesce(
            F.sum("bucket_delta").over(
                Window.orderBy("bucket").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ),
    )
    return (
        carried.withColumn(
            "day",
            F.floor(F.col("bucket") * _CONC_BUCKET_S / 86400).cast("long"),
        )
        .groupBy("day")
        .agg(
            F.max(F.col("carry_in") + F.col("mx"))
            .cast("long")
            .alias("peak_concurrency"),
            F.sum("starts").cast("long").alias("sessions_started"),
        )
    )


CONCURRENCY_PEAK_DAILY_SQL = f"""
WITH t AS (
  SELECT user_id, event_id, {_TS_SEC} AS ts_sec FROM events),
flagged AS (
  SELECT user_id, event_id, ts_sec,
         CASE WHEN ts_sec - lag(ts_sec) OVER w > 1800 THEN 1 ELSE 0 END AS new_session
  FROM t WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id)),
sessions_raw AS (
  SELECT user_id, ts_sec,
         CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM flagged),
sess AS (
  SELECT user_id, session_id,
         min(ts_sec) AS session_start, max(ts_sec) AS session_end
  FROM sessions_raw GROUP BY 1, 2),
deltas AS (
  SELECT session_start AS t, 1 AS d, user_id, session_id FROM sess
  UNION ALL
  SELECT session_end + 1 AS t, -1 AS d, user_id, session_id FROM sess),
bucketed AS (
  SELECT *, CAST(floor(t / {_CONC_BUCKET_S}) AS BIGINT) AS bucket FROM deltas),
carry AS (
  SELECT bucket,
         coalesce(sum(bucket_delta) OVER (ORDER BY bucket
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS carry_in
  FROM (SELECT bucket, sum(d) AS bucket_delta FROM bucketed GROUP BY 1)),
swept AS (
  SELECT b.t, b.d,
         c.carry_in + sum(b.d) OVER (PARTITION BY b.bucket
             ORDER BY b.t, b.d, b.user_id, b.session_id
             ROWS UNBOUNDED PRECEDING) AS conc,
         CAST(floor(b.t / 86400) AS BIGINT) AS day
  FROM bucketed b JOIN carry c ON b.bucket = c.bucket)
SELECT day,
       CAST(max(conc) AS BIGINT) AS peak_concurrency,
       CAST(sum(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS sessions_started
FROM swept GROUP BY 1
"""


def events_dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep the latest event per (user_id, event_type) — the batch
    analog of streaming dropDuplicates / the S5 upsert's
    last-writer-wins key semantics. row_number over ts DESC with
    event_id tiebreak."""
    ev = _L(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.desc("ts_ns"), F.desc("event_id")
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id", "event_type", "event_id", "ts_sec", fround("value", 2).alias("value")
        )
    )


EVENTS_DEDUP_LATEST_SQL = f"""
SELECT user_id, event_type, event_id, {_TS_SEC} AS ts_sec, floor((value) * 100.0 + 0.5) / 100.0 AS value
FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
WHERE rn = 1
"""


def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from a string column (S1/E6 — the
    Lichess JSON flatten, vendors/lichess.py:53): get_json_object ≙
    DuckDB json_extract_string."""
    ev = _L(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("prop_k"),
    )


JSON_PROPS_EXTRACT_SQL = """
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS INT) AS prop_k
FROM events
"""


def events_asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: every event picks up the user's most recent
    purchase value at-or-before its timestamp (operators/asof.py —
    union+window composition, one shuffle on user_id). The DuckDB
    oracle uses its NATIVE ASOF JOIN, so the composition's semantics
    are checked against a first-class implementation."""
    from chess_pipeline_spark.operators.asof import asof_join

    ev = _L(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts_sec", "event_type", "value"
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts_sec")
        .agg(F.max("value").alias("last_purchase_value"))
    )
    out = asof_join(
        ev, purchases, on=["user_id"], ts="ts_sec", payload=["last_purchase_value"]
    )
    return out.select(
        "event_id",
        "user_id",
        "ts_sec",
        fround("last_purchase_value", 2).alias("last_purchase_value"),
    )


EVENTS_ASOF_LAST_PURCHASE_SQL = f"""
WITH e AS (
  SELECT event_id, user_id, {_TS_SEC} AS ts_sec, event_type, value
  FROM events),
p AS (
  SELECT user_id, ts_sec, max(value) AS last_purchase_value
  FROM e WHERE event_type = 'purchase' GROUP BY 1, 2)
SELECT e.event_id, e.user_id, e.ts_sec,
       floor((p.last_purchase_value) * 100.0 + 0.5) / 100.0 AS last_purchase_value
FROM e ASOF LEFT JOIN p
  ON e.user_id = p.user_id AND e.ts_sec >= p.ts_sec
"""


def event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel per user: first view -> first click AFTER that
    view -> first purchase AFTER that click, then stage counts.
    Conditional min-aggregation, no self-joins: each stage timestamp
    is min(ts where type=X and ts >= previous stage) — two passes of
    per-user aggregation, one shuffle on user_id."""
    ev = _L(spark, sf_dir, "events").select("user_id", "event_type", "ts_sec", "event_id")
    t_view = F.min(F.when(F.col("event_type") == "view", F.col("ts_sec")))
    per_user = ev.groupBy("user_id").agg(t_view.alias("t_view"))
    with_view = ev.join(per_user, "user_id")
    t_click = F.min(
        F.when(
            (F.col("event_type") == "click") & (F.col("ts_sec") >= F.col("t_view")),
            F.col("ts_sec"),
        )
    )
    per_user2 = with_view.groupBy("user_id", "t_view").agg(t_click.alias("t_click"))
    with_click = ev.join(per_user2, "user_id")
    t_buy = F.min(
        F.when(
            (F.col("event_type") == "purchase") & (F.col("ts_sec") >= F.col("t_click")),
            F.col("ts_sec"),
        )
    )
    funnel = with_click.groupBy("user_id", "t_view", "t_click").agg(t_buy.alias("t_buy"))
    return funnel.agg(
        F.count("*").alias("n_users"),
        F.count("t_view").alias("reached_view"),
        F.count("t_click").alias("reached_click"),
        F.count("t_buy").alias("reached_purchase"),
    )


EVENT_FUNNEL_SQL = f"""
WITH e AS (
  SELECT user_id, event_type, {_TS_SEC} AS ts_sec FROM events),
v AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN ts_sec END) AS t_view
  FROM e GROUP BY 1),
c AS (
  SELECT e.user_id, v.t_view,
         min(CASE WHEN e.event_type = 'click' AND e.ts_sec >= v.t_view
                  THEN e.ts_sec END) AS t_click
  FROM e JOIN v ON e.user_id = v.user_id GROUP BY 1, 2),
p AS (
  SELECT e.user_id, c.t_view, c.t_click,
         min(CASE WHEN e.event_type = 'purchase' AND e.ts_sec >= c.t_click
                  THEN e.ts_sec END) AS t_buy
  FROM e JOIN c ON e.user_id = c.user_id GROUP BY 1, 2, 3)
SELECT count(*) AS n_users,
       count(t_view) AS reached_view,
       count(t_click) AS reached_click,
       count(t_buy) AS reached_purchase
FROM p
"""


# ------------------------------------------------------------------
# Bounded interval join (range join via bin bucketing)
# ------------------------------------------------------------------

_INTERVAL_S = 600  # "errors in the 10 minutes before each purchase"


def events_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every purchase, count error events by the same user in the
    preceding 10 minutes — the bounded-range temporal join Spark has
    no native optimization for (a raw inequality join falls back to
    broadcast-nested-loop and goes quadratic per user).

    Plan shape (100 TB): bucket both sides on bin = ts_sec div W
    where W equals the interval width, and replicate each right-side
    row into (bin, bin+1). Any qualifying pair then agrees on exactly
    ONE (user_id, bin) key — an equi-join with bounded 2x replication
    of the (smaller) error side, one keyed shuffle per input, never a
    nested loop. The exact range predicate applied after the
    equi-match only discards within-bucket misses.
    """
    ev = _L(spark, sf_dir, "events").select("event_id", "user_id", "event_type", "ts_sec")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        "ts_sec",
        F.expr(f"ts_sec div {_INTERVAL_S}").alias("bin"),
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("e_user"),
        F.col("ts_sec").alias("err_ts"),
        F.explode(
            F.array(
                F.expr(f"ts_sec div {_INTERVAL_S}"),
                F.expr(f"ts_sec div {_INTERVAL_S} + 1"),
            )
        ).alias("bin"),
    )
    joined = purchases.join(
        errors,
        (purchases.user_id == errors.e_user)
        & (purchases.bin == errors.bin)
        & (errors.err_ts >= purchases.ts_sec - _INTERVAL_S)
        & (errors.err_ts < purchases.ts_sec),
        "left",
    )
    return joined.groupBy("event_id", "user_id", "ts_sec").agg(
        F.count("err_ts").cast("long").alias("n_errors_10m"),
        F.max("err_ts").alias("last_error_ts"),
    )


EVENTS_INTERVAL_JOIN_SQL = f"""
WITH e AS (
  SELECT event_id, user_id, event_type, {_TS_SEC} AS ts_sec FROM events),
p AS (SELECT event_id, user_id, ts_sec FROM e WHERE event_type = 'purchase'),
r AS (SELECT user_id, ts_sec AS err_ts FROM e WHERE event_type = 'error')
SELECT p.event_id, p.user_id, p.ts_sec,
       CAST(count(r.err_ts) AS BIGINT) AS n_errors_10m,
       max(r.err_ts) AS last_error_ts
FROM p LEFT JOIN r
  ON p.user_id = r.user_id
 AND r.err_ts >= p.ts_sec - {_INTERVAL_S} AND r.err_ts < p.ts_sec
GROUP BY 1, 2, 3
"""


# ------------------------------------------------------------------
# Rolling z-score anomaly detection (trailing window frame)
# ------------------------------------------------------------------

_Z_LOOKBACK = 10  # trailing events per user


def events_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user anomaly score: each event's value against the mean
    and sample stddev of that user's previous 10 events — the
    trailing-frame monitoring query (fraud/alerting) that exercises
    an explicit ROWS frame rather than a growing or tumbling window.

    Determinism: the frame orders by (ts_sec, event_id) — a total
    order, so both engines aggregate the identical row set; mean and
    stddev are floor-rounded at 1e-6 before the z computation, and
    the z denominator nulls out via nullif so a constant-valued
    window yields NULL on both engines rather than one inf and one
    NaN. Plan: ONE keyed shuffle on user_id; every frame aggregate
    shares the same window spec, so Catalyst computes them in a
    single Window operator pass.
    """
    ev = _L(spark, sf_dir, "events").select("event_id", "user_id", "ts_sec", "value")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_sec", "event_id")
        .rowsBetween(-_Z_LOOKBACK, -1)
    )
    m = fround(F.avg("value").over(w), 6)
    s = fround(F.stddev_samp("value").over(w), 6)
    z = fround(
        (F.col("value") - F.col("roll_mean")) / F.expr("nullif(roll_std, 0.0)"), 6
    )
    return (
        ev.withColumn("roll_mean", m)
        .withColumn("roll_std", s)
        .withColumn("zscore", z)
        .select(
            "event_id",
            "user_id",
            "ts_sec",
            fround("value", 2).alias("value"),
            "roll_mean",
            "roll_std",
            "zscore",
        )
    )


EVENTS_ROLLING_ZSCORE_SQL = f"""
WITH t AS (
  SELECT event_id, user_id, {_TS_SEC} AS ts_sec, value FROM events),
r AS (
  SELECT event_id, user_id, ts_sec, value,
         floor((avg(value) OVER w) * 1000000.0 + 0.5) / 1000000.0 AS roll_mean,
         floor((stddev_samp(value) OVER w) * 1000000.0 + 0.5) / 1000000.0 AS roll_std
  FROM t
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id
               ROWS BETWEEN {_Z_LOOKBACK} PRECEDING AND 1 PRECEDING))
SELECT event_id, user_id, ts_sec,
       floor((value) * 100.0 + 0.5) / 100.0 AS value,
       roll_mean, roll_std,
       floor(((value - roll_mean) / nullif(roll_std, 0.0)) * 1000000.0 + 0.5)
         / 1000000.0 AS zscore
FROM r
"""


# ------------------------------------------------------------------
# OHLC bars (ordered first/last aggregation)
# ------------------------------------------------------------------


def events_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly open/high/low/close bars per event type — the classic
    TSDB rollup whose open/close need a DETERMINISTIC ordered pick:
    both come from min/max over struct(ts_sec, event_id, value), so
    exact-timestamp ties resolve by event_id identically on both
    engines (DuckDB mirrors with first(... ORDER BY ts_sec, event_id)).
    One map-side-combined shuffle on (hour, type)."""
    hour = (F.expr("ts_sec div 3600") * 3600).cast("long")
    ev = _L(spark, sf_dir, "events").select(
        hour.alias("window_start"), "event_type", "ts_sec", "event_id", "value"
    )
    o = F.min(F.struct("ts_sec", "event_id", "value")).getField("value")
    c = F.max(F.struct("ts_sec", "event_id", "value")).getField("value")
    return ev.groupBy("window_start", "event_type").agg(
        fround(o, 2).alias("open"),
        fround(F.max("value"), 2).alias("high"),
        fround(F.min("value"), 2).alias("low"),
        fround(c, 2).alias("close"),
        F.count("*").alias("n"),
    )


EVENTS_OHLC_HOURLY_SQL = f"""
WITH t AS (
  SELECT event_type, {_TS_SEC} AS ts_sec, event_id, value,
         ({_TS_SEC} // 3600) * 3600 AS window_start
  FROM events)
SELECT window_start, event_type,
       floor((first(value ORDER BY ts_sec, event_id)) * 100.0 + 0.5) / 100.0 AS open,
       floor((max(value)) * 100.0 + 0.5) / 100.0 AS high,
       floor((min(value)) * 100.0 + 0.5) / 100.0 AS low,
       floor((last(value ORDER BY ts_sec, event_id)) * 100.0 + 0.5) / 100.0 AS close,
       count(*) AS n
FROM t GROUP BY 1, 2
"""


# ------------------------------------------------------------------
# Time-weighted average (irregular-sample TSDB aggregate)
# ------------------------------------------------------------------


def events_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user time-weighted mean value: each sample holds until the
    user's next event, so its weight is that duration in seconds —
    the irregular-sampling average a metrics store computes (a value
    held for an hour counts 3600x one held a second).

    Cross-engine determinism trick: double summation order inside a
    groupBy is engine-defined, so the weighted sum is computed in
    EXACT integer cents (values are 2-decimal) times integer seconds
    — BIGINT addition commutes — and converted to a double by ONE
    division at the end. Plan: one window (lead) and one aggregate,
    both on the same user_id partitioning, so Catalyst reuses a
    single exchange."""
    ev = _L(spark, sf_dir, "events").select("user_id", "ts_sec", "event_id", "value")
    w = Window.partitionBy("user_id").orderBy("ts_sec", "event_id")
    nxt = F.lead("ts_sec", 1).over(w)
    cents = F.expr("CAST(floor(value * 100.0 + 0.5) AS BIGINT)")
    t = ev.select(
        "user_id",
        "ts_sec",
        cents.alias("cents"),
        (nxt - F.col("ts_sec")).cast("long").alias("weight_s"),
    ).filter(F.col("weight_s").isNotNull())
    # nullif the denominator: a user whose events all share one
    # second has total held-time 0 — no defined time-weighted mean —
    # and ANSI Spark would otherwise abort the whole job on the
    # divide (found by the hypothesis generator; both engines agree
    # on NULL through the nullif)
    return t.groupBy("user_id").agg(
        fround(
            F.sum(F.col("cents") * F.col("weight_s")).cast("double")
            / (F.lit(100.0) * F.expr("nullif(sum(weight_s), 0)").cast("double")),
            6,
        ).alias("twa_value"),
        F.sum("weight_s").cast("long").alias("total_seconds"),
        F.count("*").cast("long").alias("n_intervals"),
    )


EVENTS_TIME_WEIGHTED_AVG_SQL = f"""
WITH t AS (
  SELECT user_id, {_TS_SEC} AS ts_sec, event_id,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
  FROM events),
iv AS (
  SELECT user_id, cents,
         lead(ts_sec) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id)
           - ts_sec AS weight_s
  FROM t)
SELECT user_id,
       floor((CAST(sum(cents * weight_s) AS DOUBLE)
              / (100.0 * CAST(nullif(sum(weight_s), 0) AS DOUBLE))) * 1000000.0 + 0.5)
         / 1000000.0 AS twa_value,
       CAST(sum(weight_s) AS BIGINT) AS total_seconds,
       CAST(count(*) AS BIGINT) AS n_intervals
FROM iv WHERE weight_s IS NOT NULL
GROUP BY 1
"""


_GAP_SEC = 3600  # report silences longer than an hour


def events_gap_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heartbeat-gap detection: per user, consecutive-event pairs
    whose time gap exceeds a threshold — the TSDB monitoring staple
    (missed heartbeats, dead sensors, churn precursors).

    Determinism: the lag frame orders by (ts_sec, event_id), a total
    order; NULL-ts rows are excluded explicitly on BOTH engines
    (Spark sorts nulls first, DuckDB last — filtering is the only
    portable semantic). Plan: ONE keyed shuffle on user_id, one
    window pass, filter in the same stage.
    """
    ev = (
        _L(spark, sf_dir, "events")
        .select("event_id", "user_id", "ts_sec")
        .filter(F.col("ts_sec").isNotNull())
    )
    w = Window.partitionBy("user_id").orderBy("ts_sec", "event_id")
    out = ev.select(
        "user_id",
        F.lag("event_id").over(w).alias("prev_event_id"),
        F.col("event_id"),
        (F.col("ts_sec") - F.lag("ts_sec").over(w)).alias("gap_sec"),
    )
    return out.filter(F.col("gap_sec") > _GAP_SEC)


EVENTS_GAP_DETECTION_SQL = f"""
WITH t AS (
  SELECT event_id, user_id, {_TS_SEC} AS ts_sec
  FROM events WHERE ts IS NOT NULL),
g AS (
  SELECT user_id,
         lag(event_id) OVER w AS prev_event_id,
         event_id,
         ts_sec - lag(ts_sec) OVER w AS gap_sec
  FROM t
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id))
SELECT user_id, prev_event_id, event_id, gap_sec
FROM g WHERE gap_sec > {_GAP_SEC}
"""


# ------------------------------------------------------------------
# Exponential-decay engagement score (recency-weighted value)
# ------------------------------------------------------------------

_DECAY_HALF_LIFE_S = 21600  # 6-hour half-life
_DECAY_MAX_K = 20  # beyond 20 half-lives (5 days) the weight is exactly 0


def events_decay_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user recency-weighted engagement: each event's value is
    down-weighted by 2^-k where k = half-lives elapsed between the
    event and that user's LATEST event — the decayed activity score
    behind churn models and leaderboards.

    Cross-engine determinism (the TWA trick, extended): a float
    decay (pow(0.5, age/hl)) summed in engine-defined order cannot
    hash-match across engines. Instead the half-life index k is an
    INTEGER, the weight is the exact integer 2^(MAX_K - k) (0 past
    MAX_K), and the accumulator is BIGINT cents x weight — addition
    commutes, and one final division by 100*2^MAX_K (a power-of-two
    scale, then the 1e-6 grid) converts to the score. Bounds: cents
    <= 5e4, weight <= 2^20, so even 1e5 events/user stay under 2^53
    — the DOUBLE cast at the end is exact.

    Plan: the per-user max rides a whole-partition window on the
    same user_id partitioning the final groupBy needs, so Catalyst
    plans ONE keyed exchange end-to-end.
    """
    ev = (
        _L(spark, sf_dir, "events")
        .select("user_id", "ts_sec", "value")
        .filter(F.col("ts_sec").isNotNull())
    )
    cents = F.expr("CAST(floor(value * 100.0 + 0.5) AS BIGINT)")
    w = Window.partitionBy("user_id")
    t = (
        ev.select("user_id", "ts_sec", cents.alias("cents"))
        .withColumn("mx", F.max("ts_sec").over(w))
        # `div` is exact integer division on longs — no float detour
        .withColumn("k", F.expr(f"(mx - ts_sec) div {_DECAY_HALF_LIFE_S}"))
    )
    wgt = F.when(
        F.col("k") <= _DECAY_MAX_K,
        F.expr(
            f"CAST(shiftleft(CAST(1 AS BIGINT), "
            f"CAST({_DECAY_MAX_K} - k AS INT)) AS BIGINT)"
        ),
    ).otherwise(F.lit(0).cast("long"))
    denom = float(100 * (2**_DECAY_MAX_K))
    return t.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum(F.when(F.col("k") <= _DECAY_MAX_K, 1).otherwise(0))
        .cast("long")
        .alias("n_recent"),
        fround(
            F.sum(F.col("cents") * wgt).cast("double") / F.lit(denom), 6
        ).alias("decay_score"),
    )


EVENTS_DECAY_SCORE_SQL = f"""
WITH t AS (
  SELECT user_id, {_TS_SEC} AS ts_sec,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
  FROM events WHERE ts IS NOT NULL),
k AS (
  SELECT user_id, cents,
         (max(ts_sec) OVER (PARTITION BY user_id) - ts_sec)
           // {_DECAY_HALF_LIFE_S} AS k
  FROM t)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN k <= {_DECAY_MAX_K} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_recent,
       floor((CAST(sum(cents * (CASE WHEN k <= {_DECAY_MAX_K}
                  THEN (CAST(1 AS BIGINT) << CAST({_DECAY_MAX_K} - k AS INTEGER))
                  ELSE 0 END)) AS DOUBLE)
              / {float(100 * (2 ** _DECAY_MAX_K))}) * 1000000.0 + 0.5)
         / 1000000.0 AS decay_score
FROM k GROUP BY 1
"""




_ATTR_WINDOW_S = 1800  # last-touch lookback


def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch conversion attribution: each purchase credits the
    user's most recent non-purchase event within the preceding 30
    minutes (strictly earlier second); purchases with no touch in
    the window are 'direct'. Revenue and conversion counts per
    attributed channel — the marketing-analytics companion to the
    as-of family, done with ONE user-keyed shuffle and a time-RANGE
    window frame (no self-join).

    Determinism: the frame is integer ts_sec RANGE [-1800, -1]; the
    in-frame argmax is a zero-padded (ts_sec, event_id) string so
    lexicographic max == numeric recency with a total tiebreak — the
    same encoding trick on both engines.
    """
    ev = _L(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts_sec", "event_type", "value"
    )
    enc = F.when(
        F.col("event_type") != "purchase",
        F.concat(
            F.lpad(F.col("ts_sec").cast("string"), 12, "0"),
            F.lpad(F.col("event_id").cast("string"), 12, "0"),
            F.col("event_type"),
        ),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_sec")
        .rangeBetween(-_ATTR_WINDOW_S, -1)
    )
    touched = ev.withColumn("touch", F.max(enc).over(w))
    purchases = touched.filter(F.col("event_type") == "purchase").select(
        F.coalesce(F.expr("substring(touch, 25)"), F.lit("direct")).alias(
            "channel"
        ),
        "value",
    )
    return (
        purchases.groupBy("channel")
        .agg(
            F.count("*").alias("n_conversions"),
            grid_sum("value", 2).alias("attributed_value"),
        )
        .orderBy("channel")
    )


ATTRIBUTION_LAST_TOUCH_SQL = f"""
WITH e AS (
  SELECT event_id, user_id, {_TS_SEC} AS ts_sec, event_type, value
  FROM events),
t AS (
  SELECT event_type, value,
         max(CASE WHEN event_type <> 'purchase'
                  THEN lpad(CAST(ts_sec AS VARCHAR), 12, '0')
                       || lpad(CAST(event_id AS VARCHAR), 12, '0')
                       || event_type END)
           OVER (PARTITION BY user_id ORDER BY ts_sec
                 RANGE BETWEEN {_ATTR_WINDOW_S} PRECEDING AND 1 PRECEDING)
           AS touch
  FROM e)
SELECT coalesce(substring(touch, 25), 'direct') AS channel,
       count(*) AS n_conversions,
       (sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) / 100.0) AS attributed_value
FROM t WHERE event_type = 'purchase'
GROUP BY 1 ORDER BY 1
"""




def funnel_latency_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: for users who complete the
    view -> purchase funnel, the view->purchase delay in seconds,
    summarized as exact interpolated percentiles — the latency
    companion to event_funnel's stage counts. Delays are integer
    second differences, so only the final interpolation touches
    floats (grid-rounded).

    Same shuffle budget as the funnel: per-user conditional min
    aggregation (one user_id exchange), then one global percentile
    over |converting users| rows.
    """
    ev = _L(spark, sf_dir, "events").select("user_id", "event_type", "ts_sec")
    t_view = F.min(F.when(F.col("event_type") == "view", F.col("ts_sec")))
    per_user = ev.groupBy("user_id").agg(t_view.alias("t_view"))
    with_view = ev.join(per_user, "user_id")
    t_buy = F.min(
        F.when(
            (F.col("event_type") == "purchase") & (F.col("ts_sec") >= F.col("t_view")),
            F.col("ts_sec"),
        )
    )
    funnel = with_view.groupBy("user_id", "t_view").agg(t_buy.alias("t_buy"))
    delays = funnel.filter(
        F.col("t_view").isNotNull() & F.col("t_buy").isNotNull()
    ).select((F.col("t_buy") - F.col("t_view")).cast("long").alias("delay_s"))
    return delays.agg(
        F.count("*").alias("n_converted"),
        fround(F.expr("percentile(delay_s, 0.5)"), 4).alias("p50_s"),
        fround(F.expr("percentile(delay_s, 0.9)"), 4).alias("p90_s"),
        F.min("delay_s").alias("min_s"),
        F.max("delay_s").alias("max_s"),
    )


FUNNEL_LATENCY_PERCENTILES_SQL = f"""
WITH e AS (
  SELECT user_id, event_type, {_TS_SEC} AS ts_sec FROM events),
pv AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN ts_sec END) AS t_view
  FROM e GROUP BY 1),
f AS (
  SELECT e.user_id, pv.t_view,
         min(CASE WHEN e.event_type = 'purchase' AND e.ts_sec >= pv.t_view
                  THEN e.ts_sec END) AS t_buy
  FROM e JOIN pv USING (user_id)
  GROUP BY 1, 2),
d AS (
  SELECT CAST(t_buy - t_view AS BIGINT) AS delay_s
  FROM f WHERE t_view IS NOT NULL AND t_buy IS NOT NULL)
SELECT count(*) AS n_converted,
       {{p50}} AS p50_s,
       {{p90}} AS p90_s,
       min(delay_s) AS min_s,
       max(delay_s) AS max_s
FROM d
""".format(
    p50=sql_round("quantile_cont(delay_s, 0.5)", 4),
    p90=sql_round("quantile_cont(delay_s, 0.9)", 4),
)




def session_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral path mining: the most common 3-step event-type
    sequences WITHIN a session (same 30-min-gap sessionization as
    events_sessionized), top-10 with counts — the "what do users do
    next" query a product-analytics warehouse serves constantly.

    One user-keyed window pass builds session ids and the two leads;
    trigrams crossing a session boundary are discarded by comparing
    the lead session ids (cheaper than re-partitioning by session).
    Total tiebreak (ts_sec, event_id) everywhere, so both engines
    walk identical paths.
    """
    ev = _L(spark, sf_dir, "events").select("user_id", "event_id", "ts_sec", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts_sec", "event_id")
    gap = F.when(
        (F.col("ts_sec") - F.lag("ts_sec", 1).over(w)) > 1800, 1
    ).otherwise(0)
    sess = ev.withColumn(
        "session_id",
        F.sum(gap).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    tri = sess.select(
        "session_id",
        "event_type",
        F.lead("event_type", 1).over(w).alias("t1"),
        F.lead("event_type", 2).over(w).alias("t2"),
        F.lead("session_id", 1).over(w).alias("s1"),
        F.lead("session_id", 2).over(w).alias("s2"),
    ).filter(
        F.col("t2").isNotNull()
        & (F.col("s1") == F.col("session_id"))
        & (F.col("s2") == F.col("session_id"))
    )
    path = F.concat_ws(">", "event_type", "t1", "t2")
    return (
        tri.select(path.alias("path"))
        .groupBy("path")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("path"))
        .limit(10)
    )


SESSION_PATH_TRIGRAMS_SQL = f"""
WITH t AS (
  SELECT user_id, event_id, {_TS_SEC} AS ts_sec, event_type FROM events),
flagged AS (
  SELECT user_id, event_id, ts_sec, event_type,
         CASE WHEN ts_sec - lag(ts_sec) OVER w > 1800 THEN 1 ELSE 0 END AS new_session
  FROM t WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id)),
sessions AS (
  SELECT user_id, event_id, ts_sec, event_type,
         CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM flagged),
tri AS (
  SELECT session_id, event_type,
         lead(event_type, 1) OVER w AS t1,
         lead(event_type, 2) OVER w AS t2,
         lead(session_id, 1) OVER w AS s1,
         lead(session_id, 2) OVER w AS s2
  FROM sessions WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id))
SELECT event_type || '>' || t1 || '>' || t2 AS path, count(*) AS n
FROM tri
WHERE t2 IS NOT NULL AND s1 = session_id AND s2 = session_id
GROUP BY 1 ORDER BY n DESC, path ASC
LIMIT 10
"""




def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over within-session event
    types: P(next | current) with counts — the one-step companion to
    session_path_trigrams (same single window pass, same boundary
    discard via lead session id). Probabilities are per-row divisions
    of two exact counts, grid-rounded — no float aggregation.
    """
    ev = _L(spark, sf_dir, "events").select("user_id", "event_id", "ts_sec", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts_sec", "event_id")
    gap = F.when(
        (F.col("ts_sec") - F.lag("ts_sec", 1).over(w)) > 1800, 1
    ).otherwise(0)
    sess = ev.withColumn(
        "session_id",
        F.sum(gap).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    bi = sess.select(
        "session_id",
        F.col("event_type").alias("from_type"),
        F.lead("event_type", 1).over(w).alias("to_type"),
        F.lead("session_id", 1).over(w).alias("s1"),
    ).filter(F.col("to_type").isNotNull() & (F.col("s1") == F.col("session_id")))
    counts = bi.groupBy("from_type", "to_type").agg(F.count("*").alias("n"))
    wtot = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n",
        fround(F.col("n") / F.sum("n").over(wtot).cast("double"), 6).alias("p"),
    ).orderBy("from_type", "to_type")


EVENT_TRANSITION_MATRIX_SQL = f"""
WITH t AS (
  SELECT user_id, event_id, {_TS_SEC} AS ts_sec, event_type FROM events),
flagged AS (
  SELECT user_id, event_id, ts_sec, event_type,
         CASE WHEN ts_sec - lag(ts_sec) OVER w > 1800 THEN 1 ELSE 0 END AS new_session
  FROM t WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id)),
sessions AS (
  SELECT user_id, event_id, ts_sec, event_type,
         CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM flagged),
bi AS (
  SELECT session_id, event_type AS from_type,
         lead(event_type, 1) OVER w AS to_type,
         lead(session_id, 1) OVER w AS s1
  FROM sessions WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id)),
counts AS (
  SELECT from_type, to_type, count(*) AS n
  FROM bi WHERE to_type IS NOT NULL AND s1 = session_id
  GROUP BY 1, 2)
SELECT from_type, to_type, n,
       floor((n / CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE))
             * 1000000.0 + 0.5) / 1000000.0 AS p
FROM counts ORDER BY from_type, to_type
"""


QUERIES: dict[str, QuerySpec] = {
    "attribution_last_touch": QuerySpec(
        attribution_last_touch, ATTRIBUTION_LAST_TOUCH_SQL, "asof ext: attribution"
    ),
    "funnel_latency_percentiles": QuerySpec(
        funnel_latency_percentiles,
        FUNNEL_LATENCY_PERCENTILES_SQL,
        "funnel ext: latency",
    ),
    "session_path_trigrams": QuerySpec(
        session_path_trigrams, SESSION_PATH_TRIGRAMS_SQL, "path-mining ext"
    ),
    "event_transition_matrix": QuerySpec(
        event_transition_matrix, EVENT_TRANSITION_MATRIX_SQL, "markov ext"
    ),
    "value_stats_by_weekday": QuerySpec(
        value_stats_by_weekday, VALUE_STATS_BY_WEEKDAY_SQL, "A3 F9"
    ),
    "events_gap_detection": QuerySpec(
        events_gap_detection, EVENTS_GAP_DETECTION_SQL, "tsdb-gap ext W2"
    ),
    "weekday_recode": QuerySpec(weekday_recode, WEEKDAY_RECODE_SQL, "F9 P8"),
    "events_tumbling_1h": QuerySpec(
        events_tumbling_1h, EVENTS_TUMBLING_1H_SQL, "§2.11 streaming-batch"
    ),
    "events_sliding_1h_30m": QuerySpec(
        events_sliding_1h_30m, EVENTS_SLIDING_1H_30M_SQL, "§2.11 streaming-batch"
    ),
    "events_sessionized": QuerySpec(events_sessionized, EVENTS_SESSIONIZED_SQL, "§2.11 W2"),
    "concurrency_peak_daily": QuerySpec(
        concurrency_peak_daily, CONCURRENCY_PEAK_DAILY_SQL, "tsdb-sweepline"
    ),
    "events_dedup_latest": QuerySpec(
        events_dedup_latest, EVENTS_DEDUP_LATEST_SQL, "S5 W1 P9 A8"
    ),
    "json_props_extract": QuerySpec(json_props_extract, JSON_PROPS_EXTRACT_SQL, "S1 E6"),
    "events_asof_last_purchase": QuerySpec(
        events_asof_last_purchase, EVENTS_ASOF_LAST_PURCHASE_SQL, "asof-join ext"
    ),
    "event_funnel": QuerySpec(event_funnel, EVENT_FUNNEL_SQL, "funnel ext A5"),
    "events_interval_join": QuerySpec(
        events_interval_join, EVENTS_INTERVAL_JOIN_SQL, "interval-join ext"
    ),
    "events_rolling_zscore": QuerySpec(
        events_rolling_zscore, EVENTS_ROLLING_ZSCORE_SQL, "W-frame anomaly ext"
    ),
    "events_ohlc_hourly": QuerySpec(
        events_ohlc_hourly, EVENTS_OHLC_HOURLY_SQL, "tsdb-ohlc ext"
    ),
    "events_time_weighted_avg": QuerySpec(
        events_time_weighted_avg, EVENTS_TIME_WEIGHTED_AVG_SQL, "tsdb-twa ext"
    ),
    "events_decay_score": QuerySpec(
        events_decay_score, EVENTS_DECAY_SCORE_SQL, "tsdb-decay ext"
    ),
}
