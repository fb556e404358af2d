"""Core relational query catalog (SURVEY §2.2-2.9).

Each entry re-expresses one (or a cluster of) reference operators on
the driver's TPC-H-ish synthetic tables, with a DuckDB oracle. Role
mapping (FIXTURES.md F10): orders ≙ chess_games, lineitem ≙ per-move
tables ((l_orderkey, l_linenumber) ≙ (game_link, half_move)), part ≙
position_evals (p_partkey ≙ fen), region/nation ≙ eco_codes.

Cross-engine determinism rules used throughout:
- every float output is round(x, N) on BOTH sides;
- counts / row_numbers cast to BIGINT on the Spark side (DuckDB's
  native integer-agg type);
- dates exported as 'yyyy-MM-dd' strings;
- no ORDER BY needed for the hash (driver compare is order-insensitive)
  except where LIMIT makes order semantic — there a total tiebreak
  order is used.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from chess_pipeline_spark.functions.rounding import (
    fround,
    grid_cents,
    grid_sum,
    sql_grid_sum,
    sql_round,
)
from chess_pipeline_spark.plans.spec import QuerySpec
from chess_pipeline_spark.sources import load_table as _L

# --------------------------------------------------------------------------
# Flagship: win-ratio-by-color pivot (reference transforms.py:396-417, A1+A2+E5)
# --------------------------------------------------------------------------


def win_ratio_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy + pivot(countDistinct) + row-normalize + 0-fill.

    Reference: `win_ratio_by_color`'s pivot of game results
    (src/pipeline_import/transforms.py:396-417) — here
    o_orderpriority ≙ time-control category, o_orderstatus ≙ result.
    Explicit pivot value list guarantees the missing-column 0-fill the
    reference does by hand.
    """
    orders = _L(spark, sf_dir, "orders")
    statuses = ["O", "F", "P"]
    counts = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", statuses)
        .agg(F.countDistinct("o_orderkey"))
    )
    filled = [F.coalesce(F.col(s), F.lit(0)).alias(f"n_{s.lower()}") for s in statuses]
    counts = counts.select("o_orderpriority", *filled)
    total = sum(F.col(f"n_{s.lower()}") for s in statuses)
    return counts.select(
        "o_orderpriority",
        *[
            fround(F.col(f"n_{s.lower()}") / total, 6).alias(f"pct_{s.lower()}")
            for s in statuses
        ],
    )


WIN_RATIO_SQL = """
WITH c AS (
  SELECT o_orderpriority,
         count(DISTINCT CASE WHEN o_orderstatus = 'O' THEN o_orderkey END) AS n_o,
         count(DISTINCT CASE WHEN o_orderstatus = 'F' THEN o_orderkey END) AS n_f,
         count(DISTINCT CASE WHEN o_orderstatus = 'P' THEN o_orderkey END) AS n_p
  FROM orders GROUP BY o_orderpriority)
SELECT o_orderpriority,
       floor((n_o / CAST(n_o + n_f + n_p AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS pct_o,
       floor((n_f / CAST(n_o + n_f + n_p AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS pct_f,
       floor((n_p / CAST(n_o + n_f + n_p AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS pct_p
FROM c
"""


# --------------------------------------------------------------------------
# Multi-agg stats (A1, A3 — TPC-H Q1 shape; headline bench query)
# --------------------------------------------------------------------------


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped groupBy with 8 aggregates.

    Exercises A3 (multi-agg stats incl. stddev with NULL→0 fill,
    reference transforms.py:428-439) at lineitem scale. Map-side
    partial aggregation + single shuffle on the two low-cardinality
    group keys — the plan of record at 100 TB.
    """
    li = _L(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            fround(F.sum("l_quantity"), 2).alias("sum_qty"),
            grid_sum("l_extendedprice", 2).alias("sum_base_price"),
            fround(
                grid_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4), 2
            ).alias("sum_disc_price"),
            fround(F.avg("l_quantity"), 6).alias("avg_qty"),
            fround(
                F.sum(grid_cents("l_extendedprice", 2))
                / F.lit(100.0)
                / F.count("l_extendedprice"),
                6,
            ).alias("avg_price"),
            fround(
                F.sum(grid_cents("l_discount", 2))
                / F.lit(100.0)
                / F.count("l_discount"),
                6,
            ).alias("avg_disc"),
            fround(F.coalesce(F.stddev_samp("l_quantity"), F.lit(0.0)), 6).alias("std_qty"),
            F.count("*").alias("count_order"),
        )
    )


PRICING_SUMMARY_SQL = """
SELECT l_returnflag, l_linestatus,
       floor((sum(l_quantity)) * 100.0 + 0.5) / 100.0                              AS sum_qty,
       (sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) / 100.0)       AS sum_base_price,
       floor((sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000.0 + 0.5) AS BIGINT)) / 10000.0) * 100.0 + 0.5) / 100.0 AS sum_disc_price,
       floor((avg(l_quantity)) * 1000000.0 + 0.5) / 1000000.0                              AS avg_qty,
       floor((sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) / 100.0 / count(l_extendedprice)) * 1000000.0 + 0.5) / 1000000.0 AS avg_price,
       floor((sum(CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT)) / 100.0 / count(l_discount)) * 1000000.0 + 0.5) / 1000000.0 AS avg_disc,
       floor((coalesce(stddev_samp(l_quantity), 0)) * 1000000.0 + 0.5) / 1000000.0         AS std_qty,
       count(*)                                               AS count_order
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------------
# Join + agg + top-k (J5, O3 — TPC-H Q3 shape; headline bench query)
# --------------------------------------------------------------------------


def top_customer_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer ⋈ orders ⋈ lineitem → revenue per customer, top 10.

    Join order small→large with the fact table last; customer is
    broadcast below the default threshold, orders⋈lineitem shuffles on
    the join key. Deterministic top-k via (revenue DESC, key ASC).
    """
    c = _L(spark, sf_dir, "customer")
    o = _L(spark, sf_dir, "orders")
    li = _L(spark, sf_dir, "lineitem")
    rev = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            fround(
                grid_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4), 2
            ).alias("revenue")
        )
    )
    return rev.orderBy(F.desc("revenue"), F.asc("c_custkey")).limit(10)


TOP_CUSTOMER_REVENUE_SQL = """
SELECT c_custkey, c_name,
       floor((sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000.0 + 0.5) AS BIGINT)) / 10000.0) * 100.0 + 0.5) / 100.0 AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
GROUP BY c_custkey, c_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 10
"""


# --------------------------------------------------------------------------
# Projection / rename / recode layer (P1, P2, P8, F3, F6, F10)
# --------------------------------------------------------------------------


def order_priority_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-list select + rename-map + regexp extract + CASE recode.

    Reference: header renames (feature_engineering.py:48-69), regex
    time-control split (transforms.py:329-331), dict-map recodes
    (transforms.py:279-321), '?'→numeric cast (transforms.py:388-391).
    """
    o = _L(spark, sf_dir, "orders")
    return o.select(
        F.col("o_orderkey").alias("game_link"),
        F.col("o_custkey").alias("player_id"),
        F.regexp_extract(F.col("o_orderpriority"), r"(\d+)-", 1).cast("int").alias(
            "priority_num"
        ),
        F.when(F.col("o_orderstatus") == "O", "Win")
        .when(F.col("o_orderstatus") == "F", "Loss")
        .otherwise("Draw")
        .alias("result_label"),
        F.when(F.col("o_orderpriority").contains("URGENT"), "In arena")
        .otherwise("Not in arena")
        .alias("in_arena"),
        fround(F.col("o_totalprice"), 2).alias("total_price"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("date_played"),
    )


ORDER_PRIORITY_CLEAN_SQL = r"""
SELECT o_orderkey AS game_link,
       o_custkey  AS player_id,
       CAST(regexp_extract(o_orderpriority, '(\d+)-', 1) AS INT) AS priority_num,
       CASE WHEN o_orderstatus = 'O' THEN 'Win'
            WHEN o_orderstatus = 'F' THEN 'Loss'
            ELSE 'Draw' END AS result_label,
       CASE WHEN o_orderpriority LIKE '%URGENT%' THEN 'In arena'
            ELSE 'Not in arena' END AS in_arena,
       floor((o_totalprice) * 100.0 + 0.5) / 100.0 AS total_price,
       strftime(o_orderdate, '%Y-%m-%d') AS date_played
FROM orders
"""


def lineitem_filter_isin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equality / inequality / IN-list predicates (P3, P4).

    Reference: clock != -1 filter (models.py:23), elo>2800 + category
    IN-list (create_dataset.py:125-129). All three predicates reach
    the parquet scan as PushedFilters.
    """
    li = _L(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_quantity") > 45)
        & (F.col("l_returnflag") != "A")
        & F.col("l_linestatus").isin("O", "F")
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "l_linestatus")


LINEITEM_FILTER_ISIN_SQL = """
SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag, l_linestatus
FROM lineitem
WHERE l_quantity > 45 AND l_returnflag <> 'A' AND l_linestatus IN ('O', 'F')
"""


def distinct_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT over two columns (P9; reference drop_duplicates on fen,
    stockfish.py:51 / SELECT DISTINCT, utils/db.py:22-25)."""
    li = _L(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus").distinct()


DISTINCT_FLAG_STATUS_SQL = """
SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
"""


# --------------------------------------------------------------------------
# Join layer (J3, J4, J7, J8, J10)
# --------------------------------------------------------------------------


def parts_never_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (J7 — the eval-cache anti-join on fen,
    stockfish.py:96: positions not already evaluated)."""
    p = _L(spark, sf_dir, "part")
    li = _L(spark, sf_dir, "lineitem")
    return p.join(li, p.p_partkey == li.l_partkey, "left_anti").select(
        "p_partkey", "p_name", "p_brand"
    )


PARTS_NEVER_ORDERED_SQL = """
SELECT p_partkey, p_name, p_brand
FROM part
WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
"""


def customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (J10 — the upsert delete's `WHERE key IN
    (SELECT DISTINCT key …)`, postgres_templates.py:192-196)."""
    c = _L(spark, sf_dir, "customer")
    o = _L(spark, sf_dir, "orders")
    big = o.filter(F.col("o_totalprice") > 150000)
    return c.join(big, c.c_custkey == big.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


CUSTOMERS_WITH_ORDERS_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_totalprice > 150000)
"""


def orders_fulfillment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join + coalesce-to-0 for the missing side (J3 —
    positions ⋈ evals with nulls→0, inference.py:41-50; P7 fillna)."""
    o = _L(spark, sf_dir, "orders")
    li = _L(spark, sf_dir, "lineitem")
    heavy = (
        li.filter(F.col("l_quantity") > 45)
        .groupBy("l_orderkey")
        .agg(
            fround(F.sum("l_quantity"), 2).alias("heavy_qty"),
            F.count("*").alias("heavy_lines"),
        )
    )
    joined = o.join(heavy, o.o_orderkey == heavy.l_orderkey, "left")
    return joined.select(
        "o_orderkey",
        "o_orderstatus",
        fround(F.coalesce(F.col("heavy_qty"), F.lit(0.0)), 2).alias("heavy_qty"),
        F.coalesce(F.col("heavy_lines"), F.lit(0)).alias("heavy_lines"),
    )


ORDERS_FULFILLMENT_SQL = """
WITH heavy AS (
  SELECT l_orderkey,
         floor((sum(l_quantity)) * 100.0 + 0.5) / 100.0 AS heavy_qty,
         count(*) AS heavy_lines
  FROM lineitem WHERE l_quantity > 45 GROUP BY l_orderkey)
SELECT o_orderkey, o_orderstatus,
       floor((coalesce(heavy_qty, 0)) * 100.0 + 0.5) / 100.0 AS heavy_qty,
       coalesce(heavy_lines, 0) AS heavy_lines
FROM orders LEFT JOIN heavy ON o_orderkey = l_orderkey
"""


def order_lines_enriched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chained inner joins incl. a broadcast dimension (J4+J5+J8/J9 —
    the game_evals view & model-dataset chain). part is the fen-keyed
    eval dimension; evaluation := p_retailprice/100."""
    li = _L(spark, sf_dir, "lineitem")
    o = _L(spark, sf_dir, "orders")
    p = _L(spark, sf_dir, "part")
    evals = p.select(
        "p_partkey", fround(F.col("p_retailprice") / 100.0, 6).alias("evaluation")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(evals), li.l_partkey == evals.p_partkey)
        .filter(F.col("o_orderstatus") == "F")
        .select(
            "l_orderkey",
            "l_linenumber",
            "o_orderpriority",
            "evaluation",
            fround(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2).alias(
                "net_price"
            ),
        )
    )


ORDER_LINES_ENRICHED_SQL = """
SELECT l_orderkey, l_linenumber, o_orderpriority,
       floor((p_retailprice / 100.0) * 1000000.0 + 0.5) / 1000000.0 AS evaluation,
       floor((l_extendedprice * (1 - l_discount)) * 100.0 + 0.5) / 100.0 AS net_price
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN part   ON l_partkey = p_partkey
WHERE o_orderstatus = 'F'
"""


# --------------------------------------------------------------------------
# Window layer (W1-W5)
# --------------------------------------------------------------------------

def clock_lead_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lead + lag-of-lead coalesce chain (W2+W3) — the exact
    opponent-clock fill semantics of models.py:25-30:
    coalesce(lead(clock,1), lag(lead(clock,1),2), clock)."""
    # l_linenumber ties exist in the synthetic data (and at sf0.1 so
    # do (l_linenumber, l_quantity) ties) → the sort key must be a
    # TOTAL order for the shifts to be engine-independent
    _W = Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_quantity", "l_partkey", "l_suppkey", "l_extendedprice"
    )
    li = _L(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_partkey", "l_suppkey",
        "l_extendedprice",
    )
    step1 = li.withColumn("lead1", F.lead("l_quantity", 1).over(_W))
    return step1.select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        F.coalesce(F.col("lead1"), F.lit(-1.0)).alias("lead_qty"),
        F.coalesce(
            F.col("lead1"), F.lag("lead1", 2).over(_W), F.col("l_quantity")
        ).alias("opponent_clock"),
    )


CLOCK_LEAD_FILL_SQL = """
SELECT l_orderkey, l_linenumber, l_quantity,
       coalesce(lead1, -1.0) AS lead_qty,
       coalesce(lead1,
                lag(lead1, 2) OVER (PARTITION BY l_orderkey
                                    ORDER BY l_linenumber, l_quantity, l_partkey,
                                             l_suppkey, l_extendedprice),
                l_quantity) AS opponent_clock
FROM (SELECT l_orderkey, l_linenumber, l_quantity, l_partkey, l_suppkey, l_extendedprice,
             lead(l_quantity, 1) OVER (PARTITION BY l_orderkey
                                       ORDER BY l_linenumber, l_quantity, l_partkey,
                                                l_suppkey, l_extendedprice) AS lead1
      FROM lineitem)
"""


def initial_clock_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value over an ordered composite partition (W4/A4 — initial
    clock per (game, parity), models.py:37-48; replaces the
    reference's double self-join J6 with one window)."""
    li = _L(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber", "l_quantity")
    li = li.withColumn("parity", (F.col("l_linenumber") % 2).cast("int"))
    w = Window.partitionBy("l_orderkey", "parity").orderBy("l_linenumber", "l_quantity")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "parity",
        F.first("l_quantity").over(w).alias("initial_qty"),
    )


INITIAL_CLOCK_PER_GROUP_SQL = """
SELECT l_orderkey, l_linenumber, CAST(l_linenumber % 2 AS INT) AS parity,
       first_value(l_quantity) OVER (PARTITION BY l_orderkey, l_linenumber % 2
                                     ORDER BY l_linenumber, l_quantity) AS initial_qty
FROM lineitem
"""


def top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number top-k per group (W1/O3) with a total tiebreak."""
    o = _L(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", fround("o_totalprice", 2).alias("total_price"), "rn")
    )


TOP3_ORDERS_PER_CUSTOMER_SQL = """
SELECT o_custkey, o_orderkey, floor((o_totalprice) * 100.0 + 0.5) / 100.0 AS total_price, rn
FROM (SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      FROM orders)
WHERE rn <= 3
"""


# --------------------------------------------------------------------------
# Explode / reshape layer (E1, E2, E3)
# --------------------------------------------------------------------------


def explode_quantities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array build + posexplode round-trip (E1/W1): half_move :=
    array position + 1, the deterministic replacement for the
    reference's order-dependent cumcount (feature_engineering.py:92)."""
    li = _L(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber", "l_quantity")
    arr = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_list(F.struct("l_linenumber", "l_quantity"))).alias("moves")
    )
    return arr.select(
        "l_orderkey", F.posexplode("moves").alias("pos", "s")
    ).select(
        "l_orderkey",
        (F.col("pos") + 1).cast("long").alias("half_move"),
        F.col("s.l_quantity").alias("quantity"),
    )


EXPLODE_QUANTITIES_SQL = """
-- (l_linenumber is NOT unique per order in the synthetic data, so the
-- ordinal is defined over the full (linenumber, quantity) sort key —
-- matching sort_array on the struct)
SELECT l_orderkey,
       row_number() OVER (PARTITION BY l_orderkey
                          ORDER BY l_linenumber, l_quantity) AS half_move,
       l_quantity AS quantity
FROM lineitem
"""


def zip_explode_lockstep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """arrays_zip + posexplode: lockstep explode of parallel arrays
    (E3 — evaluations/eval_depths/positions zip, stockfish.py:36-53;
    replaces pandas positional concat U2)."""
    li = _L(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )
    arr = li.groupBy("l_orderkey").agg(
        F.sort_array(
            F.collect_list(F.struct("l_linenumber", "l_quantity", "l_extendedprice"))
        ).alias("s")
    )
    two = arr.select(
        "l_orderkey",
        F.expr("transform(s, x -> x.l_quantity)").alias("qty"),
        F.expr("transform(s, x -> x.l_extendedprice)").alias("price"),
    )
    z = two.select("l_orderkey", F.posexplode(F.arrays_zip("qty", "price")).alias("pos", "z"))
    return z.select(
        "l_orderkey",
        (F.col("pos") + 1).cast("long").alias("half_move"),
        F.col("z.qty").alias("quantity"),
        fround(F.col("z.price"), 2).alias("price"),
    )


ZIP_EXPLODE_LOCKSTEP_SQL = """
SELECT l_orderkey,
       row_number() OVER (PARTITION BY l_orderkey
                          ORDER BY l_linenumber, l_quantity, l_extendedprice) AS half_move,
       l_quantity AS quantity,
       floor((l_extendedprice) * 100.0 + 0.5) / 100.0 AS price
FROM lineitem
"""


def material_map_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """map column → fixed columns with 0-fill (E2 — material Counter →
    10 piece-count columns, feature_engineering.py:161-181)."""
    li = _L(spark, sf_dir, "lineitem")
    per_flag = li.groupBy("l_orderkey", "l_returnflag").agg(F.count("*").alias("n"))
    as_map = per_flag.groupBy("l_orderkey").agg(
        F.map_from_entries(F.collect_list(F.struct("l_returnflag", "n"))).alias("m")
    )
    return as_map.select(
        "l_orderkey",
        F.coalesce(F.element_at("m", "A"), F.lit(0)).alias("cnt_a"),
        F.coalesce(F.element_at("m", "N"), F.lit(0)).alias("cnt_n"),
        F.coalesce(F.element_at("m", "R"), F.lit(0)).alias("cnt_r"),
    )


MATERIAL_MAP_EXPAND_SQL = """
SELECT l_orderkey,
       count(CASE WHEN l_returnflag = 'A' THEN 1 END) AS cnt_a,
       count(CASE WHEN l_returnflag = 'N' THEN 1 END) AS cnt_n,
       count(CASE WHEN l_returnflag = 'R' THEN 1 END) AS cnt_r
FROM lineitem
GROUP BY l_orderkey
"""


# --------------------------------------------------------------------------
# Set operations (U1)
# --------------------------------------------------------------------------


def union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName with missing-column fill (U1 — evals union,
    stockfish.py:94,109; allowMissingColumns ≙ UNION ALL BY NAME)."""
    o = _L(spark, sf_dir, "orders")
    a = o.filter(F.col("o_totalprice") > 250000).select(
        "o_orderkey", fround("o_totalprice", 2).alias("total_price")
    )
    b = o.filter(F.col("o_totalprice") < 5000).select("o_orderkey", "o_orderpriority")
    return a.unionByName(b, allowMissingColumns=True)


UNION_BY_NAME_SQL = """
SELECT o_orderkey, floor((o_totalprice) * 100.0 + 0.5) / 100.0 AS total_price, NULL AS o_orderpriority
FROM orders WHERE o_totalprice > 250000
UNION ALL
SELECT o_orderkey, NULL AS total_price, o_orderpriority
FROM orders WHERE o_totalprice < 5000
"""


# --------------------------------------------------------------------------
# Scalar-function layer (F1-F15 sampler; F8 duration parse; F17 eval parse)
# --------------------------------------------------------------------------


def scalar_feature_sampler(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One wide projection exercising the §2.9 scalar library:
    concat (F1), replace (F2), regexp_extract (F3), contains→CASE
    (F4), split+index (F5), date parts (F7/F9), clip (F11),
    log-sigmoid-inverse (F12), modulo/pow (F14), rounding (F15)."""
    o = _L(spark, sf_dir, "orders")
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-(F.col("o_totalprice") / F.lit(100000.0))))
    return o.select(
        F.concat(F.lit("https://lichess.org/"), F.col("o_orderkey").cast("string")).alias(
            "game_link"
        ),
        F.regexp_replace(F.col("o_orderpriority"), "-", " ").alias("priority_spaced"),
        F.regexp_extract(F.col("o_orderpriority"), r"(\d+)-", 1).cast("int").alias(
            "priority_num"
        ),
        F.when(F.col("o_orderpriority").contains("LOW"), "Casual")
        .otherwise("Rated")
        .alias("rated_casual"),
        F.split(F.col("o_orderpriority"), "-").getItem(1).alias("priority_word"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("date_played"),
        (F.dayofweek("o_orderdate") - 1).cast("int").alias("weekday"),
        fround(F.greatest(F.least(F.col("o_totalprice"), F.lit(200000.0)), F.lit(1000.0)), 2).alias("price_clipped"),
        fround(F.log(p / (F.lit(1.00001) - p)), 6).alias("sig_inverse"),
        (F.col("o_orderkey") % 2).cast("long").alias("parity"),
        fround(F.pow(F.col("o_totalprice") / 1000.0, 2), 4).alias("price_sq"),
    )


SCALAR_FEATURE_SAMPLER_SQL = r"""
SELECT 'https://lichess.org/' || CAST(o_orderkey AS VARCHAR) AS game_link,
       replace(o_orderpriority, '-', ' ') AS priority_spaced,
       CAST(regexp_extract(o_orderpriority, '(\d+)-', 1) AS INT) AS priority_num,
       CASE WHEN o_orderpriority LIKE '%LOW%' THEN 'Casual' ELSE 'Rated' END AS rated_casual,
       string_split(o_orderpriority, '-')[2] AS priority_word,
       strftime(o_orderdate, '%Y-%m-%d') AS date_played,
       CAST(dayofweek(o_orderdate) AS INT) AS weekday,
       floor((greatest(least(o_totalprice, 200000.0), 1000.0)) * 100.0 + 0.5) / 100.0 AS price_clipped,
       floor((ln((1.0 / (1.0 + exp(-(o_totalprice / 100000.0))))
                / (1.00001 - (1.0 / (1.0 + exp(-(o_totalprice / 100000.0))))))) * 1000000.0 + 0.5) / 1000000.0 AS sig_inverse,
       o_orderkey % 2 AS parity,
       floor((pow(o_totalprice / 1000.0, 2)) * 10000.0 + 0.5) / 10000.0 AS price_sq
FROM orders
"""


def clock_seconds_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'H:MM:SS' → seconds with unparseable→-1 (F8 — convert_clock_to_
    seconds, transforms.py:236-243). The clock string is synthesized
    from integer columns so the round-trip is exactly checkable."""
    li = _L(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber", "l_extendedprice")
    # floor, not cast: DuckDB's double→int cast rounds half-to-even
    # while Spark's truncates — floor() agrees on both engines
    total = (F.floor("l_extendedprice") % 7200).alias("total_sec")
    df = li.select("l_orderkey", "l_linenumber", total)
    clock = F.when(
        F.col("l_linenumber") != 7,
        F.format_string(
            "%d:%02d:%02d",
            (F.col("total_sec") / 3600).cast("long"),
            ((F.col("total_sec") % 3600) / 60).cast("long"),
            (F.col("total_sec") % 60).cast("long"),
        ),
    )  # linenumber 7 → NULL clock, exercising the -1 fill
    df = df.withColumn("clock", clock)
    # try_cast, not cast: under ANSI mode (default in Spark 4) a
    # malformed segment must yield the -1 fill, not abort the query —
    # same discipline as chess_transforms.convert_clock_to_seconds
    parts = F.split(F.col("clock"), ":")
    parsed = (
        parts.getItem(0).try_cast("long") * 3600
        + parts.getItem(1).try_cast("long") * 60
        + parts.getItem(2).try_cast("long")
    )
    return df.select(
        "l_orderkey",
        "l_linenumber",
        F.coalesce(F.col("clock"), F.lit("")).alias("clock"),
        F.coalesce(parsed, F.lit(-1)).alias("clock_seconds"),
    )


CLOCK_SECONDS_PARSE_SQL = """
WITH base AS (
  SELECT l_orderkey, l_linenumber,
         CAST(floor(l_extendedprice) AS BIGINT) % 7200 AS total_sec
  FROM lineitem),
clocked AS (
  SELECT l_orderkey, l_linenumber,
         CASE WHEN l_linenumber <> 7
              THEN printf('%d:%02d:%02d', total_sec // 3600,
                          (total_sec % 3600) // 60, total_sec % 60)
         END AS clock
  FROM base)
SELECT l_orderkey, l_linenumber,
       coalesce(clock, '') AS clock,
       coalesce(CAST(string_split(clock, ':')[1] AS BIGINT) * 3600
                + CAST(string_split(clock, ':')[2] AS BIGINT) * 60
                + CAST(string_split(clock, ':')[3] AS BIGINT), -1) AS clock_seconds
FROM clocked
"""


def eval_comment_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UCI eval-comment regex parse (F17 — transforms.py:186-212):
    'score cp N' → N/100, 'score mate N' → ±9999; synthesized from
    numeric columns for exact checkability."""
    li = _L(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
    cp = (F.floor(F.col("l_discount") * 10000) - 500).cast("string")
    comment = F.when(
        F.col("l_quantity") > 45, F.concat(F.lit("info score mate "), (F.col("l_linenumber") - 4).cast("string"))
    ).otherwise(F.concat(F.lit("info score cp "), cp))
    df = li.withColumn("comment", comment)
    kind = F.regexp_extract("comment", r"score (cp|mate) (-?\d+)", 1)
    val = F.regexp_extract("comment", r"score (cp|mate) (-?\d+)", 2).cast("double")
    evaluation = (
        F.when(kind == "cp", fround(val / 100.0, 6))
        .when((kind == "mate") & (val >= 0), 9999.0)
        .otherwise(-9999.0)
    )
    return df.select("l_orderkey", "l_linenumber", "comment", evaluation.alias("evaluation"))


EVAL_COMMENT_PARSE_SQL = r"""
WITH c AS (
  SELECT l_orderkey, l_linenumber,
         CASE WHEN l_quantity > 45
              THEN 'info score mate ' || CAST(l_linenumber - 4 AS VARCHAR)
              ELSE 'info score cp ' ||
                   CAST(CAST(floor(l_discount * 10000) AS BIGINT) - 500 AS VARCHAR)
         END AS comment
  FROM lineitem)
SELECT l_orderkey, l_linenumber, comment,
       CASE WHEN regexp_extract(comment, 'score (cp|mate) (-?\d+)', 1) = 'cp'
            THEN floor((CAST(regexp_extract(comment, 'score (cp|mate) (-?\d+)', 2) AS DOUBLE) / 100.0) * 1000000.0 + 0.5) / 1000000.0
            WHEN CAST(regexp_extract(comment, 'score (cp|mate) (-?\d+)', 2) AS DOUBLE) >= 0
            THEN 9999.0
            ELSE -9999.0 END AS evaluation
FROM c
"""


# --------------------------------------------------------------------------
# Aggregation extras (A1 exact count-distinct; A7 global scalars)
# --------------------------------------------------------------------------


def orders_per_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy + exact countDistinct (A1 — games per category,
    transforms.py:397-399)."""
    o = _L(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count("*").alias("n_orders"),
    )


ORDERS_PER_PRIORITY_SQL = """
SELECT o_orderpriority,
       count(DISTINCT o_custkey) AS n_customers,
       count(*) AS n_orders
FROM orders GROUP BY o_orderpriority
"""


def global_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global scalar aggregate row (A7 — newsletter min/max elo,
    utils/newsletter.py:69-70)."""
    o = _L(spark, sf_dir, "orders")
    return o.agg(
        fround(F.max("o_totalprice"), 2).alias("max_price"),
        fround(F.min("o_totalprice"), 2).alias("min_price"),
        F.count("*").alias("n"),
    )


GLOBAL_MINMAX_SQL = """
SELECT floor((max(o_totalprice)) * 100.0 + 0.5) / 100.0 AS max_price,
       floor((min(o_totalprice)) * 100.0 + 0.5) / 100.0 AS min_price,
       count(*) AS n
FROM orders
"""


def sql_view_game_evals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The game_evals view as Spark SQL over temp views (J8 —
    db/tables/game_evals_view.sql): positions ⋈ evals chained joins
    expressed in the SQL API end-to-end."""
    _L(spark, sf_dir, "lineitem").createOrReplaceTempView("v_lineitem")
    _L(spark, sf_dir, "part").createOrReplaceTempView("v_part")
    return spark.sql(
        """
        SELECT l.l_orderkey AS game_link,
               l.l_linenumber AS half_move,
               l.l_partkey AS fen,
               -- 1e6 not 1000000.0: Spark SQL parses x.y literals as
               -- DECIMAL, which would turn the whole expr decimal
               floor((p.p_retailprice / double(100)) * 1e6 + 0.5) / 1e6 AS evaluation
        FROM v_lineitem l
        JOIN v_part p ON l.l_partkey = p.p_partkey
        WHERE p.p_size > 25
        """
    )


SQL_VIEW_GAME_EVALS_SQL = """
SELECT l_orderkey AS game_link,
       l_linenumber AS half_move,
       l_partkey AS fen,
       floor((p_retailprice / 100.0) * 1000000.0 + 0.5) / 1000000.0 AS evaluation
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_size > 25
"""


# --------------------------------------------------------------------------
# Coverage extras: P5 array predicate, F19 array sort+join, A5 binned
# mean, E4 struct fields, P10 empty-relation guard
# --------------------------------------------------------------------------


def array_predicate_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate on an array column + sorted-array join (P5 —
    has-evals partition split, vendors/stockfish.py:33-34; F19 —
    promotions ''.join(sorted(...)), visitors.py:172-176): keep docs
    whose word array contains a marker word; project the sorted
    first-5 distinct words as a joined string."""
    d = _L(spark, sf_dir, "documents")
    words = F.split("text", " ")
    has_marker = F.exists(words, lambda w: w.isin("the", "a", "of"))
    sorted_sample = F.array_join(
        F.slice(F.array_sort(F.array_distinct(words)), 1, 5), " "
    )
    return d.select(
        "doc_id",
        has_marker.alias("has_marker"),
        sorted_sample.alias("first5_sorted"),
    ).filter("has_marker")


ARRAY_PREDICATE_FILTER_SQL = """
SELECT doc_id,
       len(list_filter(string_split(text, ' '),
                       w -> w IN ('the', 'a', 'of'))) > 0 AS has_marker,
       array_to_string(list_sort(list_distinct(string_split(text, ' ')))[1:5], ' ')
         AS first5_sorted
FROM documents
WHERE len(list_filter(string_split(text, ' '), w -> w IN ('the', 'a', 'of'))) > 0
"""


def binned_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped mean over a computed bin (A5 + F15 — mean result per
    binned evaluation, res/.../create_features.py:16,122-123)."""
    li = _L(spark, sf_dir, "lineitem")
    bin_ = (F.floor(F.col("l_extendedprice") / 1000) * 1000).cast("long")
    return li.groupBy(bin_.alias("price_bin")).agg(
        fround(
            F.sum(grid_cents("l_discount", 2))
            / F.lit(100.0)
            / F.count("l_discount"),
            6,
        ).alias("mean_discount"),
        F.count("*").alias("n"),
    )


BINNED_MEAN_SQL = """
SELECT CAST(floor(l_extendedprice / 1000) * 1000 AS BIGINT) AS price_bin,
       floor((sum(CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT)) / 100.0 / count(l_discount)) * 1000000.0 + 0.5) / 1000000.0 AS mean_discount,
       count(*) AS n
FROM lineitem GROUP BY 1
"""


def struct_pack_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct column built then projected back to fields with a
    null-default (E4 — castling_sides dict → white/black cols with
    fillna 'No castling', transforms.py:347-372). The struct stays a
    column-store struct: no explode, field access is a projection."""
    ev = _L(spark, sf_dir, "events")
    packed = ev.select(
        "event_id",
        F.struct(
            F.col("event_type").alias("etype"),
            F.get_json_object("props", "$.k").alias("k"),
        ).alias("s"),
    )
    return packed.select(
        "event_id",
        F.col("s.etype").alias("etype"),
        F.coalesce(F.col("s.k"), F.lit("missing")).alias("k_or_default"),
    )


STRUCT_PACK_FIELDS_SQL = """
WITH packed AS (
  SELECT event_id,
         struct_pack(etype := event_type,
                     k := json_extract_string(props, '$.k')) AS s
  FROM events)
SELECT event_id, s.etype AS etype,
       coalesce(s.k, 'missing') AS k_or_default
FROM packed
"""


def empty_relation_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empty-input short-circuit (P10 — every reference step emits a
    schema-preserving empty output when its input is empty,
    feature_engineering.py:26-32). Lazy plans give this for free:
    an impossible predicate yields 0 rows with the full agg schema
    intact — which is exactly what the driver's schema check sees."""
    li = _L(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_quantity") < -1)
        .groupBy("l_linestatus")
        .agg(grid_sum("l_extendedprice", 2).alias("sum_price"),
             F.count("*").alias("n"))
    )


EMPTY_RELATION_GUARD_SQL = """
SELECT l_linestatus,
       (sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) / 100.0) AS sum_price,
       count(*) AS n
FROM lineitem WHERE l_quantity < -1 GROUP BY l_linestatus
"""


def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5-shaped 5-table join: region -> nation -> customer ->
    orders -> lineitem, revenue per nation. The three dimension hops
    (region, nation, customer) broadcast; only the orders⋈lineitem
    fact join and the final agg shuffle — the canonical star-join
    plan at 100 TB."""
    region = _L(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = _L(spark, sf_dir, "nation")
    cust = _L(spark, sf_dir, "customer")
    orders = _L(spark, sf_dir, "orders")
    li = _L(spark, sf_dir, "lineitem")
    dims = (
        cust.join(
            F.broadcast(nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)),
            cust.c_nationkey == nation.n_nationkey,
        )
        .select("c_custkey", "n_name")
    )
    revenue = grid_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
    return (
        li.join(orders.select("o_orderkey", "o_custkey"), li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(dims), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("n_name")
        .agg(fround(revenue, 2).alias("revenue"), F.count("*").alias("n_lines"))
    )


REVENUE_BY_NATION_SQL = """
SELECT n_name,
       floor((sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000.0 + 0.5) AS BIGINT)) / 10000.0) * 100.0 + 0.5) / 100.0 AS revenue,
       count(*) AS n_lines
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
"""


def price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (Spark `percentile`
    ≙ DuckDB `quantile_cont`). The exact variant shuffles the group's
    values; at 100 TB swap in approx_percentile (t-digest sketch,
    mergeable map-side) — same plan shape, bounded state."""
    li = _L(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        fround(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("p50"),
        fround(F.expr("percentile(l_extendedprice, 0.9)"), 4).alias("p90"),
        fround(F.expr("percentile(l_extendedprice, 0.99)"), 4).alias("p99"),
        F.count("*").alias("n"),
    )


PRICE_PERCENTILES_SQL = """
SELECT l_returnflag,
       floor((quantile_cont(l_extendedprice, 0.5)) * 10000.0 + 0.5) / 10000.0 AS p50,
       floor((quantile_cont(l_extendedprice, 0.9)) * 10000.0 + 0.5) / 10000.0 AS p90,
       floor((quantile_cont(l_extendedprice, 0.99)) * 10000.0 + 0.5) / 10000.0 AS p99,
       count(*) AS n
FROM lineitem GROUP BY l_returnflag
"""


def running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative sum with an explicit frame spec (rows unbounded
    preceding — the frame-spec surface SURVEY §2.5 notes Spark
    exposes beyond the reference): running order total per customer
    in (date, orderkey) order."""
    o = _L(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        (F.sum(grid_cents("o_totalprice", 2)).over(w) / F.lit(100.0)).alias(
            "running_total"
        ),
    )


RUNNING_REVENUE_SQL = """
SELECT o_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS order_date,
       (sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) OVER (
            PARTITION BY o_custkey
            ORDER BY o_orderdate, o_orderkey
            ROWS UNBOUNDED PRECEDING) / 100.0)
         AS running_total
FROM orders
"""


def rollup_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals via ROLLUP + grouping_id (SURVEY §2.4
    note: no grouping sets exist in the reference — Spark's
    rollup/cube come free and are exposed here). NULL group keys from
    the subtotal rows are sentinel-filled for cross-engine hashing."""
    o = _L(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            grid_sum("o_totalprice", 2).alias("sum_price"),
            F.grouping_id().cast("long").alias("gid"),
        )
        .select(
            F.coalesce("o_orderpriority", F.lit("<all>")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("<all>")).alias("status"),
            "n",
            "sum_price",
            "gid",
        )
    )


ROLLUP_PRIORITY_STATUS_SQL = """
SELECT coalesce(o_orderpriority, '<all>') AS priority,
       coalesce(o_orderstatus, '<all>') AS status,
       count(*) AS n,
       (sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) / 100.0) AS sum_price,
       CAST(grouping(o_orderpriority) * 2 + grouping(o_orderstatus) AS BIGINT) AS gid
FROM orders
GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
"""


def orders_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention cohort matrix: customers grouped by the month of
    their FIRST order; for each (cohort, month-offset) cell, how many
    of that cohort's customers placed an order — the classic
    retention/engagement rollup every analytics warehouse runs.

    Cross-engine exactness: the cohort key is a formatted yyyy-MM
    string and the offset is pure integer month arithmetic
    (year*12 + month differences) — no interval/months_between
    floats to diverge. Plan: one shuffle for the per-customer min
    (map-side partial min), the join back is co-keyed on o_custkey
    (AQE picks the strategy), one final cohort-cell aggregation.
    """
    o = _L(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    firsts = o.groupBy("o_custkey").agg(F.min("o_orderdate").alias("first_dt"))
    j = o.join(firsts, "o_custkey")
    months = F.year("o_orderdate") * 12 + F.month("o_orderdate")
    cohort_months = F.year("first_dt") * 12 + F.month("first_dt")
    return (
        j.select(
            F.date_format("first_dt", "yyyy-MM").alias("cohort_month"),
            (months - cohort_months).cast("int").alias("month_offset"),
            "o_custkey",
        )
        .groupBy("cohort_month", "month_offset")
        .agg(
            F.countDistinct("o_custkey").cast("long").alias("n_customers"),
            F.count("*").cast("long").alias("n_orders"),
        )
    )


ORDERS_RETENTION_COHORT_SQL = """
WITH firsts AS (
  SELECT o_custkey, min(o_orderdate) AS first_dt
  FROM orders GROUP BY o_custkey)
SELECT strftime(first_dt, '%Y-%m') AS cohort_month,
       CAST((year(o_orderdate) * 12 + month(o_orderdate))
            - (year(first_dt) * 12 + month(first_dt)) AS INTEGER)
         AS month_offset,
       CAST(count(DISTINCT o.o_custkey) AS BIGINT) AS n_customers,
       CAST(count(*) AS BIGINT) AS n_orders
FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey
GROUP BY 1, 2
"""


# fixed RFM thresholds (integer-exact — percentile-derived cuts
# would reintroduce cross-engine interpolation hazards); chosen
# around the synthetic orders' medians (f=10, m≈$2.5M, r=169d) so
# all three scores populate
_RFM_RECENCY_DAYS = (90, 365)  # <=90d -> 3, <=365d -> 2, else 1
_RFM_FREQ = (12, 6)  # >=12 -> 3, >=6 -> 2, else 1
_RFM_MONETARY_CENTS = (300_000_000, 150_000_000)


def orders_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: per customer, recency (days since
    last order, against the dataset's global latest date), frequency
    (order count), monetary (lifetime cents), each scored 1-3 on
    fixed thresholds and concatenated into the classic 'RFM' segment
    code — the marketing-analytics staple.

    Cross-engine exactness: datediff on DATE columns, BIGINT counts
    and cent sums, CASE thresholds — no floats anywhere. Plan: one
    map-side-combined groupBy on o_custkey; the global max date
    rides in as a broadcast single-row aggregate (the idf-join
    shape); scoring is a scan-stage projection after the agg.
    """
    o = _L(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    cents = F.expr("CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)")
    per_cust = o.groupBy("o_custkey").agg(
        F.count("*").cast("long").alias("n_orders"),
        F.sum(cents).cast("long").alias("monetary_cents"),
        F.max("o_orderdate").alias("last_dt"),
    )
    ref = o.groupBy().agg(F.max("o_orderdate").alias("ref_dt"))
    r_hi, r_mid = _RFM_RECENCY_DAYS
    f_hi, f_mid = _RFM_FREQ
    m_hi, m_mid = _RFM_MONETARY_CENTS
    rec = F.datediff(F.col("ref_dt"), F.col("last_dt")).cast("long")
    r_s = (
        F.when(F.col("recency_days") <= r_hi, 3)
        .when(F.col("recency_days") <= r_mid, 2)
        .otherwise(1)
    )
    f_s = (
        F.when(F.col("n_orders") >= f_hi, 3)
        .when(F.col("n_orders") >= f_mid, 2)
        .otherwise(1)
    )
    m_s = (
        F.when(F.col("monetary_cents") >= m_hi, 3)
        .when(F.col("monetary_cents") >= m_mid, 2)
        .otherwise(1)
    )
    return (
        per_cust.crossJoin(F.broadcast(ref))
        .withColumn("recency_days", rec)
        .select(
            "o_custkey",
            "recency_days",
            "n_orders",
            "monetary_cents",
            r_s.cast("int").alias("r_score"),
            f_s.cast("int").alias("f_score"),
            m_s.cast("int").alias("m_score"),
        )
        .withColumn(
            "segment",
            F.concat_ws(
                "",
                F.col("r_score").cast("string"),
                F.col("f_score").cast("string"),
                F.col("m_score").cast("string"),
            ),
        )
    )


ORDERS_RFM_SEGMENTS_SQL = f"""
WITH per_cust AS (
  SELECT o_custkey,
         CAST(count(*) AS BIGINT) AS n_orders,
         CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
           AS monetary_cents,
         max(o_orderdate) AS last_dt
  FROM orders GROUP BY o_custkey),
ref AS (SELECT max(o_orderdate) AS ref_dt FROM orders),
scored AS (
  SELECT o_custkey,
         CAST(date_diff('day', last_dt, ref_dt) AS BIGINT) AS recency_days,
         n_orders, monetary_cents,
         CASE WHEN date_diff('day', last_dt, ref_dt) <= {_RFM_RECENCY_DAYS[0]}
              THEN 3
              WHEN date_diff('day', last_dt, ref_dt) <= {_RFM_RECENCY_DAYS[1]}
              THEN 2 ELSE 1 END AS r_score,
         CASE WHEN n_orders >= {_RFM_FREQ[0]} THEN 3
              WHEN n_orders >= {_RFM_FREQ[1]} THEN 2 ELSE 1 END AS f_score,
         CASE WHEN monetary_cents >= {_RFM_MONETARY_CENTS[0]} THEN 3
              WHEN monetary_cents >= {_RFM_MONETARY_CENTS[1]} THEN 2
              ELSE 1 END AS m_score
  FROM per_cust, ref)
SELECT o_custkey, recency_days, n_orders, monetary_cents,
       CAST(r_score AS INTEGER) AS r_score,
       CAST(f_score AS INTEGER) AS f_score,
       CAST(m_score AS INTEGER) AS m_score,
       CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
         || CAST(m_score AS VARCHAR) AS segment
FROM scored
"""


# deterministic snapshot derivation for the CDC diff: the "old"
# snapshot is pre-1998 orders at whole-dollar prices, the "new" is
# post-1996 orders at exact prices — overlap keys classify as
# update/unchanged, disjoint keys as delete/insert, so every change
# class populates from one immutable table
_SNAP_OLD_BEFORE = "1998-01-01"
_SNAP_NEW_SINCE = "1996-01-01"


def orders_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-style snapshot diff: classify every key across two table
    snapshots as insert / delete / update / unchanged with the old
    and new values — the audit an incremental warehouse load (SCD,
    MERGE validation, replication check) runs. Mirrors the keyed
    delete-then-insert semantics of the reference's upsert loader
    (postgres_templates.py:160-214) as a QUERY: what WOULD change.

    Exactness: prices compare as integer cents; change_type is a
    CASE over NULL-ness and cent equality. Plan: two filtered
    projections of the same parquet (both filters push to the scan)
    full-outer-joined on the key — co-partitioned single join, no
    window, no cartesian.
    """
    o = _L(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    old = o.filter(F.col("o_orderdate") < _SNAP_OLD_BEFORE).select(
        "o_orderkey",
        F.expr("CAST(floor(o_totalprice) AS BIGINT) * 100").alias("old_cents"),
    )
    new = o.filter(F.col("o_orderdate") >= _SNAP_NEW_SINCE).select(
        "o_orderkey",
        F.expr("CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)").alias(
            "new_cents"
        ),
    )
    j = old.join(new, "o_orderkey", "full_outer")
    change = (
        F.when(F.col("old_cents").isNull(), "insert")
        .when(F.col("new_cents").isNull(), "delete")
        .when(F.col("old_cents") != F.col("new_cents"), "update")
        .otherwise("unchanged")
    )
    return j.select("o_orderkey", "old_cents", "new_cents", change.alias("change_type"))


ORDERS_SNAPSHOT_DIFF_SQL = f"""
WITH old AS (
  SELECT o_orderkey,
         CAST(floor(o_totalprice) AS BIGINT) * 100 AS old_cents
  FROM orders WHERE o_orderdate < '{_SNAP_OLD_BEFORE}'),
new AS (
  SELECT o_orderkey,
         CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS new_cents
  FROM orders WHERE o_orderdate >= '{_SNAP_NEW_SINCE}')
SELECT coalesce(old.o_orderkey, new.o_orderkey) AS o_orderkey,
       old_cents, new_cents,
       CASE WHEN old_cents IS NULL THEN 'insert'
            WHEN new_cents IS NULL THEN 'delete'
            WHEN old_cents <> new_cents THEN 'update'
            ELSE 'unchanged' END AS change_type
FROM old FULL OUTER JOIN new ON old.o_orderkey = new.o_orderkey
"""




# ------------------------------------------------------------------
# Classic decision-support shapes (TPC-H Q4/Q12/Q13/Q17 analogues)
# ------------------------------------------------------------------


def order_priority_pending(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: per order priority, how many orders have at
    least one lineitem still open (EXISTS correlated subquery → the
    left-semi join Catalyst rewrites it to). Exercises the semi-join
    path the catalog's anti-join queries don't.

    Scale: the semi probe carries only l_orderkey after the pushed
    linestatus filter; one keyed shuffle pair + the final tiny agg.
    """
    orders = _L(spark, sf_dir, "orders")
    li = _L(spark, sf_dir, "lineitem").filter(F.col("l_linestatus") == "O").select(
        "l_orderkey"
    )
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_open_orders"))
        .orderBy("o_orderpriority")
    )


ORDER_PRIORITY_PENDING_SQL = """
SELECT o_orderpriority, count(*) AS n_open_orders
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_linestatus = 'O')
GROUP BY 1 ORDER BY 1
"""


def returnflag_priority_casesum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional aggregation — per lineitem
    returnflag, split the joined orders into urgent (1/2 priority)
    vs other via CASE-sum in ONE pass instead of two filtered scans.

    Scale: one fact-fact join on orderkey, then a 3-group agg; the
    CASE folding happens map-side inside the partial agg.
    """
    orders = _L(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = _L(spark, sf_dir, "lineitem").select("l_orderkey", "l_returnflag")
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(urgent, 1).otherwise(0)).cast("long").alias("n_urgent"),
            F.sum(F.when(urgent, 0).otherwise(1)).cast("long").alias("n_other"),
        )
        .orderBy("l_returnflag")
    )


RETURNFLAG_PRIORITY_CASESUM_SQL = """
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS n_other
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY 1 ORDER BY 1
"""


def cust_order_count_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of customers by order count,
    INCLUDING zero-order customers — the left outer join + double
    aggregation whose first groupBy must preserve the unmatched side.

    Scale: customer⋈orders shuffles once on custkey (customer is
    small here and broadcasts; at warehouse scale both sides
    co-partition), then the distribution agg runs over |distinct
    counts| rows.
    """
    cust = _L(spark, sf_dir, "customer").select("c_custkey")
    orders = _L(spark, sf_dir, "orders").select("o_custkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_custkey").alias("n_orders"))
    )
    return (
        per_cust.groupBy("n_orders")
        .agg(F.count("*").alias("n_customers"))
        .orderBy(F.desc("n_customers"), F.desc("n_orders"))
    )


CUST_ORDER_COUNT_DIST_SQL = """
WITH per_cust AS (
  SELECT c.c_custkey, count(o.o_custkey) AS n_orders
  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY 1)
SELECT n_orders, count(*) AS n_customers
FROM per_cust GROUP BY 1
ORDER BY n_customers DESC, n_orders DESC
"""


def small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery — revenue from
    lineitems whose quantity is below 50%% of their part's average
    quantity. Catalyst decorrelates this into a per-part aggregate
    broadcast-joined back to the fact — the plan this builder writes
    directly.

    Determinism: the 0.5·avg threshold is grid-rounded (1e-6) before
    the comparison so both engines filter on bit-identical bounds;
    the revenue sum is fround'd like every price aggregate.
    """
    li = _L(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        fround(F.avg("l_quantity") * F.lit(0.5), 6).alias("half_avg_qty")
    )
    return (
        li.join(F.broadcast(per_part), "l_partkey")
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(
            grid_sum("l_extendedprice", 2).alias("small_qty_revenue"),
            F.count("*").cast("long").alias("n_lines"),
        )
    )


SMALL_QTY_REVENUE_SQL = f"""
WITH per_part AS (
  SELECT l_partkey, {{half_avg}} AS half_avg_qty
  FROM lineitem GROUP BY 1)
SELECT {{rev}} AS small_qty_revenue,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem l JOIN per_part p USING (l_partkey)
WHERE l.l_quantity < p.half_avg_qty
""".format(
    half_avg=sql_round("avg(l_quantity) * 0.5", 6),
    rev=sql_grid_sum("l_extendedprice", 2),
)





_Q5_REGION = "ASIA"
_Q5_YEAR_FROM = "1997-01-01"
_Q5_YEAR_TO = "1998-01-01"


def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue per nation from LOCAL trade — lineitems
    of one region's customers supplied by a supplier in the SAME
    nation, over one order year. The six-table snowflake whose
    distinguishing feature is the c_nationkey = s_nationkey equality
    BETWEEN two dimension branches.

    Plan: nation⋈region collapses to the region's five nations
    (broadcast); customer and supplier each pre-join that tiny frame
    and BROADCAST; the locality equality is evaluated on broadcast
    columns after the fact joins, so the only wide work is
    lineitem⋈orders on orderkey (orders pre-filtered to the year at
    the scan); one ≤5-row final agg.
    """
    nations = (
        _L(spark, sf_dir, "nation")
        .join(
            F.broadcast(
                _L(spark, sf_dir, "region").filter(F.col("r_name") == _Q5_REGION)
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    cust = (
        _L(spark, sf_dir, "customer")
        .join(F.broadcast(nations), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("c_nationkey").alias("cust_nk"))
    )
    sup = (
        _L(spark, sf_dir, "supplier")
        .join(F.broadcast(nations), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("s_nationkey").alias("supp_nk"), "n_name")
    )
    orders = _L(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _Q5_YEAR_FROM)
        & (F.col("o_orderdate") < _Q5_YEAR_TO)
    ).select("o_orderkey", "o_custkey")
    li = _L(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    rev = grid_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .filter(F.col("cust_nk") == F.col("supp_nk"))
        .groupBy("n_name")
        .agg(fround(rev, 2).alias("revenue"), F.count("*").cast("long").alias("n_lines"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


LOCAL_SUPPLIER_VOLUME_SQL = f"""
SELECT n.n_name,
       {sql_round(sql_grid_sum('l.l_extendedprice * (1 - l.l_discount)', 4), 2)} AS revenue,
       CAST(count(*) AS BIGINT) AS n_lines
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE c.c_nationkey = s.s_nationkey
  AND r.r_name = '{_Q5_REGION}'
  AND o.o_orderdate >= TIMESTAMP '{_Q5_YEAR_FROM}'
  AND o.o_orderdate < TIMESTAMP '{_Q5_YEAR_TO}'
GROUP BY 1
ORDER BY revenue DESC, n_name ASC
"""


_SCD2_TS = 1000


def scd2_customer_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 merge under ORACLE verification: drives the PRODUCTION
    `sinks.scd2_apply` (not a reimplementation) on a deterministic
    scenario derived purely from the customer table, so the
    Type-2 dimension semantics — close-and-version on change, append
    new keys, keep untouched keys open — get a DuckDB row-for-row
    check on top of their pytest coverage.

    Scenario (modular arithmetic picks every code path):
    * current dim = customers with custkey % 3 != 0, open since t=0;
    * batch snapshot = customers with custkey % 2 == 0, where
      custkey % 4 == 0 rows carry a changed balance (+100, cents-
      rounded) and % 4 == 2 rows are unchanged;
    * so: %4==0 & %3!=0 → close + reopen; %4==2 & %3!=0 → survivor;
      %2==0 & %3==0 → brand-new open row; odd non-batch keys → kept
      open untouched.

    Plan shape is scd2_apply's: keyed joins touch only open rows and
    the batch; closed history (empty here) unions through untouched.
    """
    from chess_pipeline_spark.sinks import scd2_apply

    cust = _L(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    current = cust.filter(F.col("c_custkey") % 3 != 0).select(
        "c_custkey",
        "c_acctbal",
        F.lit(0).cast("long").alias("valid_from"),
        F.lit(None).cast("long").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    batch = cust.filter(F.col("c_custkey") % 2 == 0).select(
        "c_custkey",
        F.when(
            F.col("c_custkey") % 4 == 0, fround(F.col("c_acctbal") + 100.0, 2)
        )
        .otherwise(F.col("c_acctbal"))
        .alias("c_acctbal"),
    )
    dim = scd2_apply(
        current, batch, keys=["c_custkey"], attrs=["c_acctbal"], batch_ts=_SCD2_TS
    )
    return dim.orderBy("c_custkey", "valid_from")


SCD2_CUSTOMER_SNAPSHOT_SQL = f"""
WITH cur AS (
  SELECT c_custkey, c_acctbal,
         CAST(0 AS BIGINT) AS valid_from,
         CAST(NULL AS BIGINT) AS valid_to,
         TRUE AS is_current
  FROM customer WHERE c_custkey % 3 != 0),
batch AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 4 = 0
              THEN {sql_round('c_acctbal + 100.0', 2)}
              ELSE c_acctbal END AS c_acctbal
  FROM customer WHERE c_custkey % 2 = 0),
matched AS (
  SELECT c.c_custkey, c.c_acctbal AS old_bal, b.c_acctbal AS new_bal
  FROM cur c JOIN batch b USING (c_custkey)),
keep_open AS (
  SELECT * FROM cur
  WHERE c_custkey NOT IN (SELECT c_custkey FROM batch)),
survivors AS (
  SELECT c_custkey, old_bal AS c_acctbal,
         CAST(0 AS BIGINT) AS valid_from, CAST(NULL AS BIGINT) AS valid_to,
         TRUE AS is_current
  FROM matched WHERE old_bal IS NOT DISTINCT FROM new_bal),
closed_now AS (
  SELECT c_custkey, old_bal AS c_acctbal,
         CAST(0 AS BIGINT) AS valid_from,
         CAST({_SCD2_TS} AS BIGINT) AS valid_to,
         FALSE AS is_current
  FROM matched WHERE old_bal IS DISTINCT FROM new_bal),
openers AS (
  SELECT b.c_custkey, b.c_acctbal,
         CAST({_SCD2_TS} AS BIGINT) AS valid_from,
         CAST(NULL AS BIGINT) AS valid_to,
         TRUE AS is_current
  FROM batch b LEFT JOIN cur c USING (c_custkey)
  WHERE c.c_custkey IS NULL
     OR EXISTS (SELECT 1 FROM matched m
                WHERE m.c_custkey = b.c_custkey
                  AND m.old_bal IS DISTINCT FROM m.new_bal))
SELECT * FROM keep_open
UNION ALL SELECT * FROM survivors
UNION ALL SELECT * FROM closed_now
UNION ALL SELECT * FROM openers
ORDER BY c_custkey, valid_from
"""


# Point-in-time join constants: version-2 epoch and the fact-clock
# modulus (facts span both validity windows deterministically).
_PIT_T = _SCD2_TS
_PIT_MOD = 2 * _PIT_T


def scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (temporal-validity) join under ORACLE
    verification: drives the PRODUCTION `operators.temporal.
    point_in_time_join` (not a reimplementation) — the feature-store
    lookup every training pipeline needs: each fact row is enriched
    with the dimension attributes AS OF the fact's own timestamp, so
    features never leak values that postdate the label event.

    Deterministic scenario from the base tables alone: the SCD2
    customer dimension has two versions for custkey % 3 == 0 keys
    (balance bumps +100 at t={_PIT_T}) and one open version
    otherwise; each order carries fact_ts = (o_orderkey * 7) mod
    {_PIT_MOD}, spanning both validity windows. Every fact matches
    exactly one version.

    100 TB shape: this is a plain keyed EQUI-join — never a range
    join. The SCD2 invariant bounds versions-per-key by a small
    constant, so joining on the key fans out by at most that
    constant and the validity predicate (valid_from <= ts < valid_to)
    then selects exactly one row as a post-join filter Catalyst
    attaches to the hash join itself; output = |facts|. Contrast a
    timestamp range join, which has no equi key and degrades to a
    broadcast-nested-loop. Dimension exchanges hash on the same key
    as the fact side, AQE broadcasts when the dim fits.
    """
    cust = _L(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    v1 = F.struct(
        F.lit(0).cast("long").alias("valid_from"),
        F.lit(_PIT_T).cast("long").alias("valid_to"),
        F.col("c_acctbal").alias("bal"),
    )
    v2 = F.struct(
        F.lit(_PIT_T).cast("long").alias("valid_from"),
        F.lit(None).cast("long").alias("valid_to"),
        fround(F.col("c_acctbal") + 100.0, 2).alias("bal"),
    )
    single = F.struct(
        F.lit(0).cast("long").alias("valid_from"),
        F.lit(None).cast("long").alias("valid_to"),
        F.col("c_acctbal").alias("bal"),
    )
    dim = (
        cust.select(
            "c_custkey",
            F.explode(
                F.when(F.col("c_custkey") % 3 == 0, F.array(v1, v2)).otherwise(
                    F.array(single)
                )
            ).alias("v"),
        )
        .select("c_custkey", "v.valid_from", "v.valid_to", "v.bal")
    )
    from chess_pipeline_spark.operators.temporal import point_in_time_join

    facts = _L(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_custkey").alias("c_custkey"),
        ((F.col("o_orderkey") * 7) % _PIT_MOD).cast("long").alias("fact_ts"),
    )
    dim = dim.withColumn("is_current_version", F.col("valid_to").isNull())
    joined = point_in_time_join(
        facts, dim, keys=["c_custkey"], fact_ts="fact_ts"
    )
    return joined.select(
        "o_orderkey",
        F.col("c_custkey").alias("o_custkey"),
        "fact_ts",
        F.col("bal").alias("acctbal_asof"),
        "is_current_version",
    ).orderBy("o_orderkey")


SCD2_POINT_IN_TIME_JOIN_SQL = f"""
WITH dim AS (
  SELECT c_custkey, CAST(0 AS BIGINT) AS valid_from,
         CAST({_PIT_T} AS BIGINT) AS valid_to, c_acctbal AS bal
  FROM customer WHERE c_custkey % 3 = 0
  UNION ALL
  SELECT c_custkey, CAST({_PIT_T} AS BIGINT),
         CAST(NULL AS BIGINT), {sql_round('c_acctbal + 100.0', 2)}
  FROM customer WHERE c_custkey % 3 = 0
  UNION ALL
  SELECT c_custkey, CAST(0 AS BIGINT), CAST(NULL AS BIGINT), c_acctbal
  FROM customer WHERE c_custkey % 3 != 0),
facts AS (
  SELECT o_orderkey, o_custkey,
         CAST((o_orderkey * 7) % {_PIT_MOD} AS BIGINT) AS fact_ts
  FROM orders)
SELECT f.o_orderkey, f.o_custkey, f.fact_ts,
       d.bal AS acctbal_asof,
       (d.valid_to IS NULL) AS is_current_version
FROM facts f JOIN dim d ON f.o_custkey = d.c_custkey
WHERE d.valid_from <= f.fact_ts
  AND (d.valid_to IS NULL OR f.fact_ts < d.valid_to)
ORDER BY o_orderkey
"""


def segment_top_value_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-rank window report: within each market segment, the
    top-1%-by-value orders with their percent_rank and cume_dist,
    plus the segment's maximum order value via nth_value — the three
    ranking-window functions (percent_rank / cume_dist / nth_value)
    the catalog's other window queries don't touch (ntile lives in
    customer_value_deciles, row_number/lead/lag elsewhere).

    Determinism: the window orders by (o_totalprice, o_orderkey) — a
    total order — so rank positions are engine-stable; percent_rank
    and cume_dist are exact rationals of row counts and compare
    bit-equal after the 1e-6 grid round. Plan: one segment-keyed
    window pass over the customer⋈orders join (customer broadcasts),
    then the cume_dist filter — no self-join, no global sort.
    """
    cust = _L(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    orders = _L(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    j = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.asc("o_totalprice"), F.asc("o_orderkey")
    )
    wall = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("o_totalprice"), F.desc("o_orderkey")
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked = j.select(
        "c_mktsegment",
        "o_orderkey",
        "o_totalprice",
        fround(F.percent_rank().over(w), 6).alias("pct_rank"),
        fround(F.cume_dist().over(w), 6).alias("cum_dist"),
        fround(F.nth_value("o_totalprice", 1).over(wall), 2).alias("segment_max"),
    )
    return ranked.filter(F.col("cum_dist") >= 0.99).orderBy(
        "c_mktsegment", F.desc("o_totalprice"), "o_orderkey"
    )


SEGMENT_TOP_VALUE_ORDERS_SQL = f"""
WITH ranked AS (
  SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
         {sql_round('percent_rank() OVER (PARTITION BY c.c_mktsegment ORDER BY o.o_totalprice ASC, o.o_orderkey ASC)', 6)} AS pct_rank,
         {sql_round('cume_dist() OVER (PARTITION BY c.c_mktsegment ORDER BY o.o_totalprice ASC, o.o_orderkey ASC)', 6)} AS cum_dist,
         {sql_round('nth_value(o.o_totalprice, 1) OVER (PARTITION BY c.c_mktsegment ORDER BY o.o_totalprice DESC, o.o_orderkey DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)', 2)} AS segment_max
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey)
SELECT c_mktsegment, o_orderkey, o_totalprice, pct_rank, cum_dist, segment_max
FROM ranked
WHERE cum_dist >= 0.99
ORDER BY c_mktsegment, o_totalprice DESC, o_orderkey
"""


_Q8_REGION = "ASIA"
_Q8_NATION = "NATION_2"  # an ASIA nation (regionkey 2) at every SF
_Q8_TYPE = "STANDARD"


def nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: market share — the fraction of one region's
    customers' spend on one part type that was supplied by ONE
    nation, per order year. The two-level conditional-aggregate ratio
    over the widest dim snowflake in the catalog (part + supplier
    nation + customer nation/region).

    Plan: the type-filtered part dim, the supplier⋈nation branch, and
    the region-restricted customer branch all BROADCAST; lineitem ⋈
    orders is the only fact-fact join; numerator and denominator come
    from ONE pass (CASE folded into the partial agg, the
    promo_revenue_share idiom) and divide after cent-grid rounding.
    """
    part = _L(spark, sf_dir, "part").filter(F.col("p_type") == _Q8_TYPE).select(
        "p_partkey"
    )
    nations = _L(spark, sf_dir, "nation")
    region = _L(spark, sf_dir, "region").filter(F.col("r_name") == _Q8_REGION)
    cust = (
        _L(spark, sf_dir, "customer")
        .join(
            F.broadcast(
                nations.join(
                    F.broadcast(region),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                ).select("n_nationkey")
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    sup = (
        _L(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nations.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    orders = _L(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.year("o_orderdate").alias("o_year")
    )
    li = _L(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    agg = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .groupBy("o_year")
        .agg(
            # quantize the term ONCE; the CASE routes exact integers
            fround(
                F.sum(
                    F.when(
                        F.col("supp_nation") == _Q8_NATION, grid_cents(rev, 4)
                    ).otherwise(F.lit(0).cast("long"))
                )
                / F.lit(1e4),
                2,
            ).alias("nation_revenue"),
            fround(F.sum(grid_cents(rev, 4)) / F.lit(1e4), 2).alias(
                "total_revenue"
            ),
        )
    )
    return (
        agg.select(
            F.col("o_year").cast("int").alias("o_year"),
            "nation_revenue",
            "total_revenue",
            fround(
                F.col("nation_revenue") / F.col("total_revenue"), 6
            ).alias("market_share"),
        )
        .orderBy("o_year")
    )


NATION_MARKET_SHARE_SQL = f"""
WITH agg AS (
  SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
         {sql_round(f"(sum(CASE WHEN sn.n_name = '{_Q8_NATION}' THEN CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 10000.0 + 0.5) AS BIGINT) ELSE 0 END) / 10000.0)", 2)} AS nation_revenue,
         {sql_round(sql_grid_sum('l.l_extendedprice * (1 - l.l_discount)', 4), 2)} AS total_revenue
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation cn ON c.c_nationkey = cn.n_nationkey
  JOIN region r ON cn.n_regionkey = r.r_regionkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation sn ON s.s_nationkey = sn.n_nationkey
  WHERE p.p_type = '{_Q8_TYPE}' AND r.r_name = '{_Q8_REGION}'
  GROUP BY 1)
SELECT o_year, nation_revenue, total_revenue,
       {sql_round('nation_revenue / total_revenue', 6)} AS market_share
FROM agg ORDER BY o_year
"""


def cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping-sets report: order counts and revenue over every
    combination of (o_orderstatus, o_orderpriority) including both
    marginals and the grand total, with an explicit grouping_id so
    subtotal rows are distinguishable from genuine NULL groups —
    the full-cube complement to rollup_priority_status's hierarchy.

    Plan: Spark expands the cube via one Expand (4 grouping sets x
    input rows) feeding a single partial-aggregated shuffle — the
    same shape a k-dimensional OLAP rollup keeps at any scale
    (output is |status| x |priority| level cardinality, never rows).
    """
    orders = _L(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count("*").alias("n_orders"),
            grid_sum("o_totalprice", 2).alias("revenue"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("<all>")).alias("o_orderstatus"),
            F.coalesce("o_orderpriority", F.lit("<all>")).alias("o_orderpriority"),
            "gid",
            "n_orders",
            "revenue",
        )
        .orderBy("gid", "o_orderstatus", "o_orderpriority")
    )


CUBE_STATUS_PRIORITY_SQL = f"""
SELECT coalesce(o_orderstatus, '<all>') AS o_orderstatus,
       coalesce(o_orderpriority, '<all>') AS o_orderpriority,
       CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS INT) AS gid,
       count(*) AS n_orders,
       {sql_grid_sum('o_totalprice', 2)} AS revenue
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY gid, o_orderstatus, o_orderpriority
"""


_Q3_SEGMENT = "BUILDING"
_Q3_CUTOFF = "1998-01-01"


def shipping_priority_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: unshipped-revenue shipping-priority report —
    top-10 orders by revenue among a customer segment's orders whose
    lineitems shipped after a cutoff. customer(segment) ⋈ orders ⋈
    lineitem, group by order, top-k.

    Plan: the segment filter pushes to the customer scan and that dim
    BROADCASTS; the date filter pushes to the lineitem scan; one
    orderkey fact join + one order-grain agg shuffle; top-10 is
    orderBy+limit = TakeOrdered. Ties broken by orderkey for a total
    order (the grid-rounded revenue makes the cutoff engine-stable).
    """
    cust = _L(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == _Q3_SEGMENT
    ).select("c_custkey")
    orders = _L(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    )
    li = _L(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > _Q3_CUTOFF
    )
    rev = grid_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(fround(rev, 2).alias("revenue"))
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
            "revenue",
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


SHIPPING_PRIORITY_TOPK_SQL = f"""
SELECT o.o_orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o.o_orderpriority,
       {sql_round(sql_grid_sum('l.l_extendedprice * (1 - l.l_discount)', 4), 2)} AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE c.c_mktsegment = '{_Q3_SEGMENT}'
  AND l.l_shipdate > TIMESTAMP '{_Q3_CUTOFF}'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""


def forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: the pure scan-filter aggregate — revenue
    delta from discounted small-quantity lineitems in one ship year.
    The simplest plan in the DSS family and the purest pushdown
    check: EVERY predicate (date range, discount band, quantity cap)
    must reach the parquet scan, the projection must read only the 4
    touched columns, and the whole query is one partial-agg reduce —
    zero joins, zero keyed shuffles (plan-gated).
    """
    li = _L(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
        & (F.col("l_discount").between(0.02, 0.04))
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        fround(
            grid_sum(F.col("l_extendedprice") * F.col("l_discount"), 4), 2
        ).alias("revenue_delta"),
        F.count("*").cast("long").alias("n_lines"),
    )


FORECAST_REVENUE_CHANGE_SQL = f"""
SELECT {sql_round(sql_grid_sum('l_extendedprice * l_discount', 4), 2)} AS revenue_delta,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.02 AND 0.04
  AND l_quantity < 24
"""


def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share — the CASE-inside-
    aggregate ratio (promo-typed parts' revenue over all revenue) for
    one ship month. The conditional-aggregation idiom: ONE pass
    computes both numerator and denominator (a CASE folded into the
    partial sum), never two filtered scans.

    Plan: date range pushes to the lineitem scan; part broadcasts;
    the ratio is computed from grid-rounded cent sums so the division
    is engine-stable. Output: promo share in percent plus both sums.
    """
    li = _L(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-03-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    part = _L(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    agg = j.agg(
        # quantize the term ONCE; the CASE routes exact integers
        fround(
            F.sum(
                F.when(
                    F.col("p_type").startswith("PROMO"), grid_cents(rev, 4)
                ).otherwise(F.lit(0).cast("long"))
            )
            / F.lit(1e4),
            2,
        ).alias("promo_revenue"),
        fround(F.sum(grid_cents(rev, 4)) / F.lit(1e4), 2).alias(
            "total_revenue"
        ),
    )
    return agg.select(
        "promo_revenue",
        "total_revenue",
        fround(
            F.lit(100.0) * F.col("promo_revenue") / F.col("total_revenue"), 6
        ).alias("promo_share_pct"),
    )


PROMO_REVENUE_SHARE_SQL = f"""
WITH agg AS (
  SELECT {sql_round("(sum(CASE WHEN p.p_type LIKE 'PROMO%' THEN CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 10000.0 + 0.5) AS BIGINT) ELSE 0 END) / 10000.0)", 2)} AS promo_revenue,
         {sql_round(sql_grid_sum('l.l_extendedprice * (1 - l.l_discount)', 4), 2)} AS total_revenue
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE l.l_shipdate >= TIMESTAMP '1997-03-01'
    AND l.l_shipdate < TIMESTAMP '1997-04-01')
SELECT promo_revenue, total_revenue,
       {sql_round('100.0 * promo_revenue / total_revenue', 6)} AS promo_share_pct
FROM agg
"""


def disjunctive_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR-of-ANDs predicate across
    the lineitem⋈part join — three (brand, size-range, qty-range)
    arms. The shape is interesting for the optimizer, not the math:
    the disjunction itself can't push down whole, but the arm-wise
    bounds union into coarse pushable ranges, and the predicate
    evaluates inside the join's codegen stage.

    Plan: part is the dim side and BROADCASTS with its own pushable
    bounds (p_size <= 35 covers all arms, pushed to the part scan);
    the lineitem scan pushes l_quantity <= 30; one broadcast join,
    one final 1-row aggregate — no shuffle beyond the partial-agg
    reduce at any scale.
    """
    li = _L(spark, sf_dir, "lineitem").filter(F.col("l_quantity") <= 30)
    part = _L(spark, sf_dir, "part").filter(F.col("p_size") <= 35).select(
        "p_partkey", "p_brand", "p_size"
    )
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    arm = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    rev = grid_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
    return j.filter(arm).agg(
        fround(rev, 2).alias("revenue"),
        F.count("*").cast("long").alias("n_lines"),
    )


DISJUNCTIVE_BRAND_REVENUE_SQL = f"""
SELECT {sql_round(sql_grid_sum('l.l_extendedprice * (1 - l.l_discount)', 4), 2)} AS revenue,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
       AND l.l_quantity BETWEEN 20 AND 30)
"""


_Q15_SHIP_FROM = "1996-01-01"
_Q15_SHIP_TO = "1996-04-01"  # one quarter, as in Q15


def top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the revenue VIEW + scalar-max pattern —
    per-supplier revenue over one ship quarter, returning the
    supplier(s) whose revenue EQUALS the global max (ties all
    surface, as in the spec). The correlated `= (SELECT max(...))`
    decorrelates to: aggregate once, reduce to a 1-row max, broadcast
    it back as an equality filter.

    Determinism: revenue is cents-rounded BEFORE both the max and the
    equality (float equality against an engine-ordered sum is a
    coin flip; against grid-rounded sums it is exact). Plan: the
    quarter filter pushes to the lineitem scan; one suppkey
    partial-agg shuffle; the 1-row max broadcasts; supplier dim
    broadcasts for the name.
    """
    li = _L(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _Q15_SHIP_FROM)
        & (F.col("l_shipdate") < _Q15_SHIP_TO)
    )
    rev = (
        li.groupBy("l_suppkey")
        .agg(
            fround(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("total_revenue")
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("max_revenue"))
    sup = _L(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx), rev.total_revenue == mx.max_revenue)
        .join(F.broadcast(sup), rev.l_suppkey == sup.s_suppkey)
        .select(
            F.col("s_suppkey").cast("long").alias("s_suppkey"),
            "s_name",
            "total_revenue",
        )
        .orderBy("s_suppkey")
    )


TOP_SUPPLIER_REVENUE_SQL = f"""
WITH revenue AS (
  SELECT l_suppkey,
         {sql_round(sql_grid_sum('l_extendedprice * (1 - l_discount)', 4), 2)} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{_Q15_SHIP_FROM}'
    AND l_shipdate < TIMESTAMP '{_Q15_SHIP_TO}'
  GROUP BY 1)
SELECT CAST(s.s_suppkey AS BIGINT) AS s_suppkey, s.s_name, r.total_revenue
FROM revenue r
JOIN supplier s ON r.l_suppkey = s.s_suppkey
WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


_Q7_NATION_A = "NATION_1"
_Q7_NATION_B = "NATION_2"


def nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume — revenue shipped
    between two specific nations (supplier nation x customer nation,
    both directions), grouped by (supp_nation, cust_nation,
    ship year). The classic two-branch dimension snowflake: lineitem
    ⋈ orders ⋈ customer ⋈ nation on one side, lineitem ⋈ supplier ⋈
    nation on the other.

    Plan: both nation-restricted dim chains (supplier⋈nation,
    customer⋈nation — each pre-filtered to the two nations, so a
    fraction of the dim) BROADCAST; the only fact-fact work is
    lineitem⋈orders on orderkey; the cross-pair filter
    (supp != cust nation) applies post-join on broadcast columns; one
    final partial-agg shuffle over ≤ 2·|years| rows.
    """
    nations = _L(spark, sf_dir, "nation").filter(
        F.col("n_name").isin(_Q7_NATION_A, _Q7_NATION_B)
    )
    sup = (
        _L(spark, sf_dir, "supplier")
        .join(F.broadcast(nations), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        _L(spark, sf_dir, "customer")
        .join(F.broadcast(nations), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    orders = _L(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _L(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"
    )
    rev = grid_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
    return (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(fround(rev, 2).alias("revenue"), F.count("*").cast("long").alias("n_lines"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


NATION_TRADE_VOLUME_SQL = f"""
SELECT sn.n_name AS supp_nation,
       cn.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS INT) AS l_year,
       {sql_round(sql_grid_sum('l.l_extendedprice * (1 - l.l_discount)', 4), 2)} AS revenue,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation sn ON s.s_nationkey = sn.n_nationkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation cn ON c.c_nationkey = cn.n_nationkey
WHERE sn.n_name IN ('{_Q7_NATION_A}', '{_Q7_NATION_B}')
  AND cn.n_name IN ('{_Q7_NATION_A}', '{_Q7_NATION_B}')
  AND sn.n_name != cn.n_name
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


def waiting_supplier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: double-correlated EXISTS + NOT EXISTS — per
    supplier, count multi-supplier orders where THIS supplier left a
    line open ('O' linestatus) and NO OTHER supplier in the order
    did. The hardest classic decorrelation: Catalyst turns the EXISTS
    into a left-semi and the NOT EXISTS into a left-anti over the
    same fact, both correlated on (orderkey, suppkey≠).

    Plan shape here (r13, guide §2.4): the decorrelated
    single-lineage form — lineitem projected to (orderkey, suppkey,
    open), a per-(order, supplier) aggregate, then the per-order
    totals as UNORDERED WINDOW AGGREGATES over the same frame. The
    previous two-level-agg form scanned the projected fact twice (no
    subplan sharing) and broadcast an ORDER-CARDINALITY aggregate
    back — a broadcast that grows with the fact table, i.e. a driver
    OOM at warehouse scale; the window keeps everything
    partition-local after one orderkey exchange. Top-10 by
    (count desc, suppkey) for a stable driver hash.
    """
    li = _L(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_linestatus") == "O").cast("int").alias("open"),
    )
    per_os = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("open").alias("has_open")
    )
    wo = Window.partitionBy("l_orderkey")
    hits = per_os.select(
        "l_orderkey",
        "l_suppkey",
        "has_open",
        F.count("*").over(wo).alias("n_supps"),
        F.sum("has_open").over(wo).alias("n_open_supps"),
    ).filter(
        (F.col("has_open") == 1)
        & (F.col("n_supps") >= 2)
        & (F.col("n_open_supps") == 1)
    )
    return (
        hits.groupBy("l_suppkey")
        .agg(F.count("*").alias("n_waiting_orders"))
        .orderBy(F.desc("n_waiting_orders"), F.asc("l_suppkey"))
        .limit(10)
    )


WAITING_SUPPLIER_ORDERS_SQL = """
WITH per_os AS (
  SELECT l_orderkey, l_suppkey,
         max(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END) AS has_open
  FROM lineitem GROUP BY 1, 2),
per_o AS (
  SELECT l_orderkey, count(*) AS n_supps, sum(has_open) AS n_open_supps
  FROM per_os GROUP BY 1)
SELECT s.l_suppkey, count(*) AS n_waiting_orders
FROM per_os s JOIN per_o o USING (l_orderkey)
WHERE s.has_open = 1 AND o.n_supps >= 2 AND o.n_open_supps = 1
GROUP BY 1
ORDER BY n_waiting_orders DESC, l_suppkey ASC
LIMIT 10
"""




def customer_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-value decile report: per-customer order revenue →
    ntile(10) over a TOTAL order (revenue rounded to cents, then
    custkey tiebreak — ntile on a tied, under-specified sort is
    engine lottery), then per-decile aggregates. Covers the ranking
    window family (ntile / percent_rank) the catalog's other window
    queries don't touch.

    Scale: per-customer agg shuffles once on custkey; the decile
    assignment is ONE global sort of customer-cardinality rows (not
    fact rows). At warehouse scale you'd derive decile cuts from the
    binned quantile sketch instead of a global ntile sort — same
    report, no global exchange; this form is exact.
    """
    orders = _L(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        grid_sum("o_totalprice", 2).alias("revenue"),
        F.count("*").alias("n_orders"),
    )
    w = Window.orderBy(F.asc("revenue"), F.asc("o_custkey"))
    tiled = per_cust.select(
        "o_custkey",
        "revenue",
        "n_orders",
        F.ntile(10).over(w).alias("decile"),
    )
    return (
        tiled.groupBy("decile")
        .agg(
            F.count("*").alias("n_customers"),
            grid_sum("revenue", 2).alias("decile_revenue"),
            fround(F.min("revenue"), 2).alias("min_revenue"),
            fround(F.max("revenue"), 2).alias("max_revenue"),
            F.sum("n_orders").cast("long").alias("n_orders"),
        )
        .orderBy("decile")
    )


CUSTOMER_VALUE_DECILES_SQL = f"""
WITH per_cust AS (
  SELECT o_custkey, {{rev}} AS revenue, count(*) AS n_orders
  FROM orders GROUP BY 1),
tiled AS (
  SELECT o_custkey, revenue, n_orders,
         ntile(10) OVER (ORDER BY revenue ASC, o_custkey ASC) AS decile
  FROM per_cust)
SELECT CAST(decile AS INT) AS decile,
       count(*) AS n_customers,
       {{drev}} AS decile_revenue,
       {{mn}} AS min_revenue,
       {{mx}} AS max_revenue,
       CAST(sum(n_orders) AS BIGINT) AS n_orders
FROM tiled GROUP BY 1 ORDER BY 1
""".format(
    rev=sql_grid_sum("o_totalprice", 2),
    drev=sql_grid_sum("revenue", 2),
    mn=sql_round("min(revenue)", 2),
    mx=sql_round("max(revenue)", 2),
)


_DECILE_BIN_W = 1000.0  # revenue bin width (cents-rounded revenue / 1000)
_DECILE_BIN_N = 4096  # covers per-customer revenue to ~4.1M; top clamps


def customer_value_deciles_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer_value_deciles WITHOUT the global ntile sort — the
    documented 100 TB swap: decile cuts derived from a fixed-width
    revenue histogram (the value_quantiles_binned machinery), then
    each customer classified against the broadcast 9-cut array.

    Exactness trade: deciles are bin-granular (customers sharing a
    revenue bin share a decile, so decile populations are equal only
    up to bin ties) — deterministic on both engines because the cuts
    are integer bin arithmetic, not engine quantile estimation.

    Plan shape at 100 TB: per-customer agg shuffles once on custkey;
    the histogram is a second map-side-combined shuffle down to
    ≤ {_DECILE_BIN_N} rows; the only window/sort runs over that
    ≤ {_DECILE_BIN_N}-row frame (plan-gated: the Window sits ABOVE the
    bin aggregate, and no ntile / no customer-cardinality global sort
    appears); the cut array broadcasts back. No single-partition
    exchange ever carries customer rows.
    """
    orders = _L(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        grid_sum("o_totalprice", 2).alias("revenue"),
        F.count("*").alias("n_orders"),
    )
    binned = per_cust.withColumn(
        "bin",
        F.least(
            F.greatest(F.floor(F.col("revenue") / F.lit(_DECILE_BIN_W)), F.lit(0)),
            F.lit(_DECILE_BIN_N - 1),
        ).cast("long"),
    )
    hist = binned.groupBy("bin").agg(F.count("*").alias("cnt"))
    wcum = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wtot = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = hist.select(
        "bin",
        F.sum("cnt").over(wcum).alias("cum"),
        F.sum("cnt").over(wtot).alias("n"),
    )
    cuts = cum.agg(
        F.array(
            *[
                F.min(
                    F.when(
                        F.col("cum") >= F.ceil(F.lit(k) * F.col("n") / F.lit(10.0)),
                        F.col("bin"),
                    )
                )
                for k in range(1, 10)
            ]
        ).alias("cuts")
    )
    assigned = binned.crossJoin(F.broadcast(cuts)).withColumn(
        "decile",
        # cuts are nondecreasing, so the satisfied set is a suffix:
        # decile = 10 - |{k : bin <= cut_k}| lands bin <= cut_1 in
        # decile 1 and bin above every cut in decile 10
        (
            F.lit(10)
            - F.size(F.filter("cuts", lambda c: F.col("bin") <= c))
        ).cast("int"),
    )
    return (
        assigned.groupBy("decile")
        .agg(
            F.count("*").alias("n_customers"),
            grid_sum("revenue", 2).alias("decile_revenue"),
            fround(F.min("revenue"), 2).alias("min_revenue"),
            fround(F.max("revenue"), 2).alias("max_revenue"),
            F.sum("n_orders").cast("long").alias("n_orders"),
        )
        .orderBy("decile")
    )


CUSTOMER_VALUE_DECILES_SKETCH_SQL = f"""
WITH per_cust AS (
  SELECT o_custkey, {{rev}} AS revenue, count(*) AS n_orders
  FROM orders GROUP BY 1),
binned AS (
  SELECT o_custkey, revenue, n_orders,
         CAST(least(greatest(floor(revenue / {_DECILE_BIN_W!r}), 0),
                    {_DECILE_BIN_N - 1}) AS BIGINT) AS bin
  FROM per_cust),
hist AS (SELECT bin, count(*) AS cnt FROM binned GROUP BY 1),
cum AS (
  SELECT bin,
         sum(cnt) OVER (ORDER BY bin) AS cum,
         sum(cnt) OVER () AS n
  FROM hist),
cutrows AS (
  SELECT k.k, min(c.bin) AS cut
  FROM (SELECT unnest(range(1, 10)) AS k) k, cum c
  WHERE c.cum >= ceil(k.k * c.n / 10.0)
  GROUP BY 1),
cuts AS (SELECT list(cut ORDER BY k) AS cuts FROM cutrows),
assigned AS (
  SELECT b.*,
         10 - len(list_filter(cuts.cuts, c -> b.bin <= c)) AS decile
  FROM binned b, cuts)
SELECT CAST(decile AS INT) AS decile,
       count(*) AS n_customers,
       {{drev}} AS decile_revenue,
       {{mn}} AS min_revenue,
       {{mx}} AS max_revenue,
       CAST(sum(n_orders) AS BIGINT) AS n_orders
FROM assigned GROUP BY 1 ORDER BY 1
""".format(
    rev=sql_grid_sum("o_totalprice", 2),
    drev=sql_grid_sum("revenue", 2),
    mn=sql_round("min(revenue)", 2),
    mx=sql_round("max(revenue)", 2),
)




_Q18_MIN_QTY = 150  # large-order threshold (sized to the synthetic data)


def large_quantity_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total lineitem quantity exceeds
    a threshold — the IN-(SELECT … GROUP BY … HAVING) pattern, which
    decorrelates to an aggregate + semi join. Joined back to customer
    for the report; top-20 by (total_qty desc, orderkey).

    The aggregate runs BEFORE any join (map-side partials on the
    fact), the qualifying key set is tiny and broadcasts; customer
    broadcasts as usual.
    """
    li = _L(spark, sf_dir, "lineitem")
    orders = _L(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    cust = _L(spark, sf_dir, "customer").select("c_custkey", "c_name")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > _Q18_MIN_QTY)
    )
    return (
        orders.join(F.broadcast(big), orders.o_orderkey == big.l_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            fround("o_totalprice", 2).alias("o_totalprice"),
            fround("total_qty", 2).alias("total_qty"),
        )
        .orderBy(F.desc("total_qty"), F.asc("o_orderkey"))
        .limit(20)
    )


LARGE_QUANTITY_ORDERS_SQL = f"""
WITH big AS (
  SELECT l_orderkey, sum(l_quantity) AS total_qty
  FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > {_Q18_MIN_QTY}
)
SELECT c.c_custkey, c.c_name, o.o_orderkey,
       {sql_round('o.o_totalprice', 2)} AS o_totalprice,
       {sql_round('b.total_qty', 2)} AS total_qty
FROM orders o
JOIN big b ON o.o_orderkey = b.l_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
ORDER BY total_qty DESC, o.o_orderkey ASC
LIMIT 20
"""


_Q22_IDLE_SINCE = "2000-06-01"  # ~recent-18-months idleness cutoff


def idle_customer_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: per market segment, customers holding an
    above-average positive balance with NO RECENT orders (none since
    the cutoff) — the scalar-subquery filter (global avg broadcasts)
    composed with a date-filtered NOT EXISTS (left-anti join whose
    probe side is pre-filtered at the scan). Grid-rounded scalar
    keeps the balance filter engine-stable.
    """
    cust = _L(spark, sf_dir, "customer")
    recent = (
        _L(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= _Q22_IDLE_SINCE)
        .select("o_custkey")
    )
    avg_pos = cust.filter(F.col("c_acctbal") > 0).agg(
        fround(
            F.sum(grid_cents("c_acctbal", 2))
            / F.lit(100.0)
            / F.count("c_acctbal"),
            6,
        ).alias("avg_bal")
    )
    idle = (
        cust.join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .crossJoin(F.broadcast(avg_pos))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
    )
    return (
        idle.groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_customers"),
            grid_sum("c_acctbal", 2).alias("total_balance"),
        )
        .orderBy("c_mktsegment")
    )


IDLE_CUSTOMER_BALANCE_SQL = f"""
WITH avg_pos AS (
  SELECT {sql_round('(sum(CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT)) / 100.0 / count(c_acctbal))', 6)} AS avg_bal
  FROM customer WHERE c_acctbal > 0
)
SELECT c.c_mktsegment, count(*) AS n_customers,
       {sql_grid_sum('c.c_acctbal', 2)} AS total_balance
FROM customer c, avg_pos a
WHERE c.c_acctbal > a.avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '{_Q22_IDLE_SINCE} 00:00:00')
GROUP BY 1 ORDER BY 1
"""




_FUZZY_MAX_DIST = 4


def fuzzy_part_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution fuzzy self-match: for every part, its closest
    OTHER part name (Levenshtein ≤ {_FUZZY_MAX_DIST}) inside the
    (p_brand, p_size) block — the record-linkage primitive behind
    catalog dedup / product matching, with the candidate space bounded
    by BLOCKING, never all-pairs.

    Three-stage funnel, each stage provably containing the next:
    (1) blocking equi-join on (brand, size) — the pair space is
    Σ block² ≈ N²/|blocks|, and block keys are chosen so blocks stay
    bounded (at 100 TB you block on higher-cardinality keys or add a
    sorted-neighborhood pass, same funnel); (2) the |len(a)-len(b)| ≤
    {_FUZZY_MAX_DIST} length prefilter — a provable lower bound of
    edit distance, one subtraction per pair, cuts pairs before the
    O(len²) stage; (3) exact Levenshtein (JVM codegen, both engines'
    standard DP). Best match per part by (dist, lowest key) window —
    a bounded per-key top-1, not a global sort.
    """
    part = _L(spark, sf_dir, "part")
    a = part.select(
        F.col("p_partkey").alias("p_partkey"),
        F.col("p_name").alias("name_a"),
        "p_brand",
        "p_size",
    )
    b = part.select(
        F.col("p_partkey").alias("match_key"),
        F.col("p_name").alias("name_b"),
        "p_brand",
        "p_size",
    )
    cand = (
        a.join(b, ["p_brand", "p_size"])
        .filter(F.col("p_partkey") != F.col("match_key"))
        .filter(
            F.abs(F.length("name_a") - F.length("name_b")) <= _FUZZY_MAX_DIST
        )
        .withColumn("dist", F.levenshtein("name_a", "name_b").cast("long"))
        .filter(F.col("dist") <= _FUZZY_MAX_DIST)
    )
    w = Window.partitionBy("p_partkey").orderBy(F.asc("dist"), F.asc("match_key"))
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("p_partkey", "match_key", "dist", "p_brand")
        .orderBy("p_partkey")
    )


FUZZY_PART_MATCHES_SQL = f"""
WITH cand AS (
  SELECT a.p_partkey, b.p_partkey AS match_key,
         CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist,
         a.p_brand
  FROM part a JOIN part b
    ON a.p_brand = b.p_brand AND a.p_size = b.p_size
   AND a.p_partkey <> b.p_partkey
   AND abs(length(a.p_name) - length(b.p_name)) <= {_FUZZY_MAX_DIST}
  WHERE levenshtein(a.p_name, b.p_name) <= {_FUZZY_MAX_DIST})
SELECT p_partkey, match_key, dist, p_brand FROM (
  SELECT p_partkey, match_key, dist, p_brand,
         row_number() OVER (
           PARTITION BY p_partkey ORDER BY dist ASC, match_key ASC) AS rk
  FROM cand)
WHERE rk = 1
ORDER BY p_partkey
"""


_Q2_TYPE = "STANDARD"
_Q2_MAX_SIZE = 10


def cheapest_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 core shape: per-group argmin with attribute join-back —
    for each STANDARD part of size ≤ 10, the supplier offering the
    lowest observed unit price (extendedprice/quantity), deterministic
    suppkey tie-break.

    Spark-first argmin: ``min(struct(unit_price, suppkey))`` in ONE
    partial-aggregated pass — no window function over the fact, so at
    100 TB this is a map-side-combined shuffle keyed on partkey with
    no per-partition sort. The filtered part list and the supplier
    dim both broadcast; the fact is scanned once with the 4-column
    projection pushed down. The classic Q2 MIN-correlated subquery
    decorrelates to exactly this aggregate-then-join plan.
    """
    parts = (
        _L(spark, sf_dir, "part")
        .filter(
            (F.col("p_type") == _Q2_TYPE) & (F.col("p_size") <= _Q2_MAX_SIZE)
        )
        .select("p_partkey", "p_brand", "p_size")
    )
    li = _L(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_suppkey",
        fround(F.col("l_extendedprice") / F.col("l_quantity"), 6).alias("unit"),
    )
    best = (
        li.join(F.broadcast(parts), li.l_partkey == parts.p_partkey)
        .groupBy("p_partkey", "p_brand", "p_size")
        .agg(F.min(F.struct("unit", "l_suppkey")).alias("m"))
        .select(
            "p_partkey",
            "p_brand",
            "p_size",
            F.col("m.unit").alias("min_unit_price"),
            F.col("m.l_suppkey").alias("best_suppkey"),
        )
    )
    supp = _L(spark, sf_dir, "supplier").select(
        F.col("s_suppkey"), F.col("s_name").alias("supplier_name")
    )
    return (
        best.join(F.broadcast(supp), best.best_suppkey == supp.s_suppkey)
        .select(
            "p_partkey",
            "p_brand",
            "p_size",
            "min_unit_price",
            "best_suppkey",
            "supplier_name",
        )
        .orderBy("p_partkey")
    )


CHEAPEST_SUPPLIER_PER_PART_SQL = f"""
WITH priced AS (
  SELECT l.l_partkey, l.l_suppkey,
         {sql_round('l.l_extendedprice / l.l_quantity', 6)} AS unit
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  WHERE p.p_type = '{_Q2_TYPE}' AND p.p_size <= {_Q2_MAX_SIZE}),
ranked AS (
  SELECT l_partkey, l_suppkey, unit,
         row_number() OVER (
           PARTITION BY l_partkey ORDER BY unit ASC, l_suppkey ASC) AS rk
  FROM priced)
SELECT p.p_partkey, p.p_brand, p.p_size,
       r.unit AS min_unit_price,
       r.l_suppkey AS best_suppkey,
       s.s_name AS supplier_name
FROM ranked r
JOIN part p ON r.l_partkey = p.p_partkey
JOIN supplier s ON r.l_suppkey = s.s_suppkey
WHERE r.rk = 1
ORDER BY p.p_partkey
"""


_Q11_SHARE_CUT = 0.045


def above_share_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: HAVING against a global scalar subquery —
    supplier nations whose lineitem revenue exceeds 4.5% of GLOBAL
    revenue.

    The scalar subquery decorrelates to a one-row aggregate
    cross-joined via broadcast (Catalyst's own plan for an
    uncorrelated scalar): the fact is scanned twice, but both scans
    carry the same 3-column pushdown and the second collapses to one
    row before the exchange, so at 100 TB the added cost is one
    map-side-combined pass, never a joined shuffle. Revenue sums are
    grid-rounded before the share division so the HAVING boundary is
    bit-identical on both engines.
    """
    li = _L(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).alias("rev"),
    )
    supp = F.broadcast(
        _L(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    )
    nat = F.broadcast(_L(spark, sf_dir, "nation").select("n_nationkey", "n_name"))
    per_nation = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(nat, supp.s_nationkey == nat.n_nationkey)
        .groupBy("n_name")
        .agg(fround(grid_sum("rev", 4), 2).alias("revenue"))
    )
    total = li.agg(fround(grid_sum("rev", 4), 2).alias("total_rev"))
    return (
        per_nation.crossJoin(F.broadcast(total))
        .withColumn("share", fround(F.col("revenue") / F.col("total_rev"), 6))
        .filter(F.col("share") > _Q11_SHARE_CUT)
        .select("n_name", "revenue", "share")
        .orderBy(F.desc("revenue"), "n_name")
    )


ABOVE_SHARE_NATIONS_SQL = f"""
WITH per_nation AS (
  SELECT n.n_name,
         {sql_round(sql_grid_sum('l.l_extendedprice * (1 - l.l_discount)', 4), 2)} AS revenue
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  GROUP BY 1),
total AS (
  SELECT {sql_round(sql_grid_sum('l_extendedprice * (1 - l_discount)', 4), 2)} AS total_rev
  FROM lineitem)
SELECT n_name, revenue, share FROM (
  SELECT n_name, revenue,
         {sql_round('revenue / total_rev', 6)} AS share
  FROM per_nation, total)
WHERE share > {_Q11_SHARE_CUT}
ORDER BY revenue DESC, n_name
"""


_Q9_NAME_TOKEN = "gear"
_Q9_COST_RATE = 0.1


def profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: product-line profit by supplier nation × order
    year — lineitem joined to a name-filtered part list, its supplier's
    nation, and orders (for the year), with a two-sided derived
    measure (revenue minus a retail-price-proportional cost standing
    in for ps_supplycost, which the synthetic schema omits).

    All three dimension branches broadcast (part pre-filtered at the
    scan, so its broadcast shrinks with the predicate); the only wide
    work is lineitem⋈orders on orderkey. Profit folds row-local
    before the ≤ nations×years aggregate.
    """
    parts = F.broadcast(
        _L(spark, sf_dir, "part")
        .filter(F.col("p_name").contains(_Q9_NAME_TOKEN))
        .select("p_partkey", "p_retailprice")
    )
    supp = F.broadcast(
        _L(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    )
    nat = F.broadcast(_L(spark, sf_dir, "nation").select("n_nationkey", "n_name"))
    orders = _L(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").alias("o_year")
    )
    li = _L(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_extendedprice", "l_discount", "l_quantity",
    )
    profit = (
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity") * F.lit(_Q9_COST_RATE)
    )
    return (
        li.join(parts, li.l_partkey == parts.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(nat, supp.s_nationkey == nat.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("n_name", "o_year")
        .agg(
            fround(grid_sum(profit, 4), 2).alias("profit"),
            F.count("*").cast("long").alias("n_lines"),
        )
        .orderBy("n_name", F.desc("o_year"))
    )


_Q9_PROFIT_EXPR = sql_grid_sum(
    "l.l_extendedprice * (1 - l.l_discount)"
    f" - p.p_retailprice * l.l_quantity * {_Q9_COST_RATE}",
    4,
)

PROFIT_BY_NATION_YEAR_SQL = f"""
SELECT n.n_name, CAST(year(o.o_orderdate) AS INT) AS o_year,
       {sql_round(_Q9_PROFIT_EXPR, 2)} AS profit,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE p.p_name LIKE '%{_Q9_NAME_TOKEN}%'
GROUP BY 1, 2
ORDER BY 1, 2 DESC
"""


def dominant_supplier_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: two-level correlated aggregate — suppliers who
    shipped MORE THAN DOUBLE a part's fair share (2 × total/n_suppliers),
    counted over parts served by at least two distinct suppliers. The
    fair-share form keeps the threshold correlated with BOTH per-part
    aggregates (total qty and supplier count) and stays non-vacuous as
    per-part line counts grow with scale (Q20's absolute >50% cut
    empties out once parts average many suppliers).

    The correlated `qty > 2 × (SELECT sum(qty)/count(*) … same part)`
    decorrelates into per-(part, supplier) partials (ONE map-side
    combined pass over the fact) with the per-part rollup expressed
    as an unordered window over that pair frame — the pair frame is
    |parts×suppliers-seen|, far below the fact, so the window's
    partkey exchange is dimension-scale and the fact is scanned
    exactly once (a groupBy-then-self-join rollup would duplicate the
    fact subtree: Spark shares no subplans without caching). Quantity
    sums are grid-rounded before the half-threshold compare.
    """
    li = _L(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_quantity")
    pair = li.groupBy("l_partkey", "l_suppkey").agg(
        fround(F.sum("l_quantity"), 4).alias("s_qty")
    )
    w = Window.partitionBy("l_partkey")
    dominated = (
        pair.withColumn("t_qty", fround(F.sum("s_qty").over(w), 4))
        .withColumn("n_supp", F.count("*").over(w).cast("long"))
        .filter(
            (F.col("n_supp") >= 2)
            & (
                F.col("s_qty")
                > fround(F.col("t_qty") * F.lit(2.0) / F.col("n_supp"), 4)
            )
        )
    )
    supp = F.broadcast(
        _L(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    )
    return (
        dominated.groupBy("l_suppkey")
        .agg(F.count("*").cast("long").alias("n_dominated"))
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .select(F.col("l_suppkey").alias("suppkey"), "s_name", "n_dominated")
        .orderBy(F.desc("n_dominated"), "suppkey")
    )


DOMINANT_SUPPLIER_PARTS_SQL = f"""
WITH pair AS (
  SELECT l_partkey, l_suppkey, {sql_round('sum(l_quantity)', 4)} AS s_qty
  FROM lineitem GROUP BY 1, 2),
per_part AS (
  SELECT l_partkey, {sql_round('sum(s_qty)', 4)} AS t_qty,
         CAST(count(*) AS BIGINT) AS n_supp
  FROM pair GROUP BY 1),
dominated AS (
  SELECT pr.l_suppkey
  FROM pair pr JOIN per_part pp USING (l_partkey)
  WHERE pp.n_supp >= 2
    AND pr.s_qty > {sql_round('pp.t_qty * 2.0 / pp.n_supp', 4)})
SELECT d.l_suppkey AS suppkey, s.s_name,
       CAST(count(*) AS BIGINT) AS n_dominated
FROM dominated d JOIN supplier s ON d.l_suppkey = s.s_suppkey
GROUP BY 1, 2
ORDER BY n_dominated DESC, suppkey
"""


_Q16_SIZES = (1, 5, 9, 13, 19, 23, 31, 45)


def brand_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: supplier-variety report with a NOT-IN
    exclusion subquery — per (brand, size) over a size shortlist,
    the number of DISTINCT suppliers who shipped that part class,
    excluding suppliers in arrears (negative account balance — the
    synthetic stand-in for Q16's complaints predicate).

    The NOT IN (SELECT s_suppkey …) decorrelates to a broadcast
    left-anti join (the exclusion list is supplier-scale, i.e. tiny
    against the fact); part joins broadcast after its isin pushdown.
    countDistinct keys the shuffle on (brand, size) with the suppkey
    carried as the distinct column — one exchange, no fact re-scan.
    """
    bad = (
        _L(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    parts = F.broadcast(
        _L(spark, sf_dir, "part")
        .filter(F.col("p_size").isin(*_Q16_SIZES))
        .select("p_partkey", "p_brand", "p_size")
    )
    li = _L(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(parts, li.l_partkey == parts.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_size")
    )


BRAND_SUPPLIER_COUNTS_SQL = f"""
SELECT p.p_brand, p.p_size,
       CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_size IN {_Q16_SIZES!r}
  AND l.l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2
ORDER BY supplier_cnt DESC, p_brand, p_size
"""


QUERIES: dict[str, QuerySpec] = {
    "win_ratio_by_status": QuerySpec(win_ratio_by_status, WIN_RATIO_SQL, "A1 A2 E5 P7"),
    "cheapest_supplier_per_part": QuerySpec(
        cheapest_supplier_per_part,
        CHEAPEST_SUPPLIER_PER_PART_SQL,
        "Q2 argmin min(struct) ext",
    ),
    "above_share_nations": QuerySpec(
        above_share_nations, ABOVE_SHARE_NATIONS_SQL, "Q11 global-scalar HAVING ext"
    ),
    "profit_by_nation_year": QuerySpec(
        profit_by_nation_year, PROFIT_BY_NATION_YEAR_SQL, "Q9 profit rollup ext"
    ),
    "dominant_supplier_parts": QuerySpec(
        dominant_supplier_parts,
        DOMINANT_SUPPLIER_PARTS_SQL,
        "Q20 two-level correlated agg ext",
    ),
    "brand_supplier_counts": QuerySpec(
        brand_supplier_counts, BRAND_SUPPLIER_COUNTS_SQL, "Q16 not-in anti ext"
    ),
    "orders_rfm_segments": QuerySpec(
        orders_rfm_segments, ORDERS_RFM_SEGMENTS_SQL, "rfm ext A3 F6"
    ),
    "orders_snapshot_diff": QuerySpec(
        orders_snapshot_diff, ORDERS_SNAPSHOT_DIFF_SQL, "cdc ext S5 J10 U3"
    ),
    "orders_retention_cohort": QuerySpec(
        orders_retention_cohort, ORDERS_RETENTION_COHORT_SQL, "cohort ext J4 A1"
    ),
    "order_priority_pending": QuerySpec(
        order_priority_pending, ORDER_PRIORITY_PENDING_SQL, "Q4 semi-join ext"
    ),
    "returnflag_priority_casesum": QuerySpec(
        returnflag_priority_casesum, RETURNFLAG_PRIORITY_CASESUM_SQL, "Q12 case-sum ext"
    ),
    "cust_order_count_dist": QuerySpec(
        cust_order_count_dist, CUST_ORDER_COUNT_DIST_SQL, "Q13 outer-join dist ext"
    ),
    "small_qty_revenue": QuerySpec(
        small_qty_revenue, SMALL_QTY_REVENUE_SQL, "Q17 correlated scalar ext"
    ),
    "waiting_supplier_orders": QuerySpec(
        waiting_supplier_orders, WAITING_SUPPLIER_ORDERS_SQL, "Q21 double-corr ext"
    ),
    "disjunctive_brand_revenue": QuerySpec(
        disjunctive_brand_revenue, DISJUNCTIVE_BRAND_REVENUE_SQL, "Q19 or-of-ands ext"
    ),
    "shipping_priority_topk": QuerySpec(
        shipping_priority_topk, SHIPPING_PRIORITY_TOPK_SQL, "Q3 segment topk ext"
    ),
    "local_supplier_volume": QuerySpec(
        local_supplier_volume, LOCAL_SUPPLIER_VOLUME_SQL, "Q5 local-trade snowflake ext"
    ),
    "nation_market_share": QuerySpec(
        nation_market_share, NATION_MARKET_SHARE_SQL, "Q8 market-share ratio ext"
    ),
    "cube_status_priority": QuerySpec(
        cube_status_priority, CUBE_STATUS_PRIORITY_SQL, "CUBE grouping-sets ext"
    ),
    "segment_top_value_orders": QuerySpec(
        segment_top_value_orders,
        SEGMENT_TOP_VALUE_ORDERS_SQL,
        "W percent_rank/cume_dist/nth_value ext",
    ),
    "scd2_customer_snapshot": QuerySpec(
        scd2_customer_snapshot,
        SCD2_CUSTOMER_SNAPSHOT_SQL,
        "S5-SCD2 ext (sinks.scd2_apply under oracle)",
    ),
    "scd2_point_in_time_join": QuerySpec(
        scd2_point_in_time_join,
        SCD2_POINT_IN_TIME_JOIN_SQL,
        "J4 S5-SCD2 ext (point-in-time feature lookup)",
    ),
    "forecast_revenue_change": QuerySpec(
        forecast_revenue_change, FORECAST_REVENUE_CHANGE_SQL, "Q6 pure-pushdown ext"
    ),
    "promo_revenue_share": QuerySpec(
        promo_revenue_share, PROMO_REVENUE_SHARE_SQL, "Q14 case-ratio ext"
    ),
    "top_supplier_revenue": QuerySpec(
        top_supplier_revenue, TOP_SUPPLIER_REVENUE_SQL, "Q15 view+scalar-max ext"
    ),
    "nation_trade_volume": QuerySpec(
        nation_trade_volume, NATION_TRADE_VOLUME_SQL, "Q7 bilateral snowflake ext"
    ),
    "customer_value_deciles": QuerySpec(
        customer_value_deciles, CUSTOMER_VALUE_DECILES_SQL, "W ntile decile ext"
    ),
    "customer_value_deciles_sketch": QuerySpec(
        customer_value_deciles_sketch,
        CUSTOMER_VALUE_DECILES_SKETCH_SQL,
        "W decile sketch-cut ext",
    ),
    "large_quantity_orders": QuerySpec(
        large_quantity_orders, LARGE_QUANTITY_ORDERS_SQL, "Q18 having-in ext"
    ),
    "idle_customer_balance": QuerySpec(
        idle_customer_balance, IDLE_CUSTOMER_BALANCE_SQL, "Q22 scalar+anti ext"
    ),
    "pricing_summary": QuerySpec(pricing_summary, PRICING_SUMMARY_SQL, "A3 P3"),
    "top_customer_revenue": QuerySpec(
        top_customer_revenue, TOP_CUSTOMER_REVENUE_SQL, "J5 A1 O1 O3"
    ),
    "order_priority_clean": QuerySpec(
        order_priority_clean, ORDER_PRIORITY_CLEAN_SQL, "P1 P2 P8 F3 F6 F7 F10"
    ),
    "lineitem_filter_isin": QuerySpec(lineitem_filter_isin, LINEITEM_FILTER_ISIN_SQL, "P3 P4"),
    "distinct_flag_status": QuerySpec(distinct_flag_status, DISTINCT_FLAG_STATUS_SQL, "P9"),
    "parts_never_ordered": QuerySpec(parts_never_ordered, PARTS_NEVER_ORDERED_SQL, "J7 P6"),
    "customers_with_orders": QuerySpec(customers_with_orders, CUSTOMERS_WITH_ORDERS_SQL, "J10"),
    "orders_fulfillment": QuerySpec(orders_fulfillment, ORDERS_FULFILLMENT_SQL, "J3 P7"),
    "order_lines_enriched": QuerySpec(
        order_lines_enriched, ORDER_LINES_ENRICHED_SQL, "J4 J5 J8 J9"
    ),
    "clock_lead_fill": QuerySpec(clock_lead_fill, CLOCK_LEAD_FILL_SQL, "W2 W3 W5"),
    "initial_clock_per_group": QuerySpec(
        initial_clock_per_group, INITIAL_CLOCK_PER_GROUP_SQL, "W4 A4 J6"
    ),
    "top3_orders_per_customer": QuerySpec(
        top3_orders_per_customer, TOP3_ORDERS_PER_CUSTOMER_SQL, "W1 O2 O3"
    ),
    "explode_quantities": QuerySpec(explode_quantities, EXPLODE_QUANTITIES_SQL, "E1 W1"),
    "zip_explode_lockstep": QuerySpec(zip_explode_lockstep, ZIP_EXPLODE_LOCKSTEP_SQL, "E3 U2"),
    "material_map_expand": QuerySpec(material_map_expand, MATERIAL_MAP_EXPAND_SQL, "E2 A6"),
    "union_by_name": QuerySpec(union_by_name, UNION_BY_NAME_SQL, "U1 U3"),
    "scalar_feature_sampler": QuerySpec(
        scalar_feature_sampler, SCALAR_FEATURE_SAMPLER_SQL,
        "F1 F2 F3 F4 F5 F7 F9 F11 F12 F14 F15",
    ),
    "clock_seconds_parse": QuerySpec(clock_seconds_parse, CLOCK_SECONDS_PARSE_SQL, "F8 P7"),
    "eval_comment_parse": QuerySpec(eval_comment_parse, EVAL_COMMENT_PARSE_SQL, "F17 F6"),
    "orders_per_priority": QuerySpec(orders_per_priority, ORDERS_PER_PRIORITY_SQL, "A1"),
    "global_minmax": QuerySpec(global_minmax, GLOBAL_MINMAX_SQL, "A7"),
    "sql_view_game_evals": QuerySpec(sql_view_game_evals, SQL_VIEW_GAME_EVALS_SQL, "J8 S3"),
    "array_predicate_filter": QuerySpec(
        array_predicate_filter, ARRAY_PREDICATE_FILTER_SQL, "P5 F18 F19"
    ),
    "binned_mean": QuerySpec(binned_mean, BINNED_MEAN_SQL, "A5 F15"),
    "struct_pack_fields": QuerySpec(struct_pack_fields, STRUCT_PACK_FIELDS_SQL, "E4 E6 P7"),
    "empty_relation_guard": QuerySpec(
        empty_relation_guard, EMPTY_RELATION_GUARD_SQL, "P10"
    ),
    "rollup_priority_status": QuerySpec(
        rollup_priority_status, ROLLUP_PRIORITY_STATUS_SQL, "A2+ grouping-sets"
    ),
    "revenue_by_nation": QuerySpec(revenue_by_nation, REVENUE_BY_NATION_SQL, "J5 A1 O1"),
    "price_percentiles": QuerySpec(price_percentiles, PRICE_PERCENTILES_SQL, "A3+ percentile"),
    "running_revenue": QuerySpec(running_revenue, RUNNING_REVENUE_SQL, "W5+ frame-spec"),
    "fuzzy_part_matches": QuerySpec(
        fuzzy_part_matches, FUZZY_PART_MATCHES_SQL, "ext: blocked fuzzy entity match"
    ),
}
