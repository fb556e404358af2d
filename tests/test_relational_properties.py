"""Randomized cross-engine parity for the relational + events queries.

Same idea as test_corpus_properties, pointed at the TPC-H-ish side:
hypothesis generates tiny-but-adversarial orders/lineitem/customer and
events tables (duplicate line numbers, ties on every sort key, empty
joins, one-row groups, null-ish funnels), writes them as parquet with
the exact production schemas, and runs a battery of catalog queries
through the SAME Spark-vs-DuckDB harness the driver mirrors. The
fixed testdata can't hit these shapes; ties in particular are where
cross-engine determinism bugs live (the repo's window/sort tiebreak
discipline exists because of them).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from chess_pipeline_spark.plans import catalog
from tests.oracle_harness import run_and_compare

_CATALOG = catalog()

# fixed tiny dimensions (randomizing them adds nothing; the fact
# tables reference these keys)
_REGION = pd.DataFrame(
    {"r_regionkey": np.array([0, 1], dtype="int32"), "r_name": ["AMERICA", "ASIA"]}
)
_NATION = pd.DataFrame(
    {
        "n_nationkey": np.array([0, 1, 2], dtype="int32"),
        "n_name": ["BRAZIL", "JAPAN", "PERU"],
        "n_regionkey": np.array([0, 1, 0], dtype="int32"),
    }
)
_CUSTOMER = pd.DataFrame(
    {
        "c_custkey": np.arange(4, dtype="int64"),
        "c_name": [f"Customer#{i}" for i in range(4)],
        "c_nationkey": np.array([0, 1, 2, 0], dtype="int32"),
        "c_acctbal": [10.25, -3.5, 0.0, 99.99],
        "c_mktsegment": ["BUILDING", "MACHINERY", "BUILDING", "AUTOMOBILE"],
    }
)
_PART = pd.DataFrame(
    {
        "p_partkey": np.arange(5, dtype="int64"),
        "p_name": [f"part {i}" for i in range(5)],
        "p_brand": ["Brand#1", "Brand#2", "Brand#1", "Brand#3", "Brand#2"],
        "p_type": ["STANDARD", "SMALL", "LARGE", "STANDARD", "SMALL"],
        "p_size": np.array([1, 5, 10, 15, 20], dtype="int32"),
        "p_retailprice": [100.0, 200.5, 300.25, 400.75, 500.0],
    }
)
_SUPPLIER = pd.DataFrame(
    {
        "s_suppkey": np.arange(3, dtype="int64"),
        "s_name": [f"Supplier#{i}" for i in range(3)],
        "s_nationkey": np.array([0, 1, 2], dtype="int32"),
        "s_acctbal": [1.5, 2.5, 3.5],
    }
)

_STATUS = ("O", "F", "P")
_PRIORITY = ("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
_FLAG = ("A", "N", "R")
_LSTATUS = ("O", "F")
_ETYPE = ("view", "click", "purchase")
_PROPS = ('{"k": 1}', '{"k": 2, "tag": "x"}', "{}", '{"tag": "y"}')

# cents-valued doubles: both engines read the identical parquet
# double, and two-decimal values keep fround boundaries honest
_cents = st.integers(min_value=0, max_value=99999).map(lambda c: c / 100.0)


@st.composite
def _tables(draw):
    n_orders = draw(st.integers(min_value=1, max_value=10))
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(n_orders, dtype="int64"),
            "o_custkey": np.array(
                draw(
                    st.lists(
                        st.integers(0, 3), min_size=n_orders, max_size=n_orders
                    )
                ),
                dtype="int64",
            ),
            "o_orderstatus": draw(
                st.lists(
                    st.sampled_from(_STATUS), min_size=n_orders, max_size=n_orders
                )
            ),
            "o_totalprice": draw(
                st.lists(_cents, min_size=n_orders, max_size=n_orders)
            ),
            "o_orderdate": pd.to_datetime(
                draw(
                    st.lists(
                        st.integers(1_600_000_000, 1_600_400_000),
                        min_size=n_orders,
                        max_size=n_orders,
                    )
                ),
                unit="s",
            ).astype("datetime64[ms]"),
            "o_orderpriority": draw(
                st.lists(
                    st.sampled_from(_PRIORITY), min_size=n_orders, max_size=n_orders
                )
            ),
        }
    )
    n_lines = draw(st.integers(min_value=0, max_value=20))
    lineitem = pd.DataFrame(
        {
            "l_orderkey": np.array(
                draw(
                    st.lists(
                        st.integers(0, n_orders - 1),
                        min_size=n_lines,
                        max_size=n_lines,
                    )
                ),
                dtype="int64",
            ),
            "l_partkey": np.array(
                draw(st.lists(st.integers(0, 4), min_size=n_lines, max_size=n_lines)),
                dtype="int64",
            ),
            "l_suppkey": np.array(
                draw(st.lists(st.integers(0, 2), min_size=n_lines, max_size=n_lines)),
                dtype="int64",
            ),
            # deliberately NON-unique within an order (the documented
            # tiebreak landmine)
            "l_linenumber": np.array(
                draw(st.lists(st.integers(1, 3), min_size=n_lines, max_size=n_lines)),
                dtype="int32",
            ),
            "l_quantity": [
                float(q)
                for q in draw(
                    st.lists(st.integers(1, 50), min_size=n_lines, max_size=n_lines)
                )
            ],
            "l_extendedprice": draw(
                st.lists(_cents, min_size=n_lines, max_size=n_lines)
            ),
            "l_discount": draw(
                st.lists(
                    st.sampled_from([0.0, 0.05, 0.1]),
                    min_size=n_lines,
                    max_size=n_lines,
                )
            ),
            "l_tax": draw(
                st.lists(
                    st.sampled_from([0.0, 0.04, 0.08]),
                    min_size=n_lines,
                    max_size=n_lines,
                )
            ),
            "l_returnflag": draw(
                st.lists(st.sampled_from(_FLAG), min_size=n_lines, max_size=n_lines)
            ),
            "l_linestatus": draw(
                st.lists(st.sampled_from(_LSTATUS), min_size=n_lines, max_size=n_lines)
            ),
            "l_shipdate": pd.to_datetime(
                draw(
                    st.lists(
                        st.integers(1_600_000_000, 1_600_400_000),
                        min_size=n_lines,
                        max_size=n_lines,
                    )
                ),
                unit="s",
            ).astype("datetime64[ms]"),
        }
    ).astype(
        {
            # n_lines can be 0: columns built from empty Python lists
            # get object dtype and the parquet schema degrades (Spark
            # then reads l_quantity as string) — pin every dtype
            "l_quantity": "float64",
            "l_extendedprice": "float64",
            "l_discount": "float64",
            "l_tax": "float64",
            "l_returnflag": "string",
            "l_linestatus": "string",
        }
    )
    n_events = draw(st.integers(min_value=1, max_value=20))
    events = pd.DataFrame(
        {
            "event_id": np.arange(n_events, dtype="int64"),
            # second-resolution stamps INCLUDING exact ties, stored as
            # TIMESTAMP(NANOS) like the production table
            "ts": pd.to_datetime(
                draw(
                    st.lists(
                        st.integers(1_700_000_000, 1_700_020_000),
                        min_size=n_events,
                        max_size=n_events,
                    )
                ),
                unit="s",
            ).astype("datetime64[ns]"),
            "user_id": np.array(
                draw(st.lists(st.integers(0, 3), min_size=n_events, max_size=n_events)),
                dtype="int64",
            ),
            "event_type": draw(
                st.lists(st.sampled_from(_ETYPE), min_size=n_events, max_size=n_events)
            ),
            "value": draw(st.lists(_cents, min_size=n_events, max_size=n_events)),
            "props": draw(
                st.lists(st.sampled_from(_PROPS), min_size=n_events, max_size=n_events)
            ),
        }
    )
    return orders, lineitem, events


def _write_all(tmp, orders, lineitem, events):
    for name, df in (
        ("region", _REGION),
        ("nation", _NATION),
        ("customer", _CUSTOMER),
        ("part", _PART),
        ("supplier", _SUPPLIER),
        ("orders", orders),
        ("lineitem", lineitem),
        ("events", events),
    ):
        df.to_parquet(tmp / f"{name}.parquet", index=False)


_RELATIONAL_QUERIES = (
    "pricing_summary",
    "orders_fulfillment",
    "order_priority_clean",
    "orders_per_priority",
    "parts_never_ordered",
    "customers_with_orders",
    "top3_orders_per_customer",
    "running_revenue",
    "rollup_priority_status",
    "revenue_by_nation",
    "top_customer_revenue",
    "price_percentiles",
    "lineitem_filter_isin",
    "order_lines_enriched",
    "clock_lead_fill",
    "initial_clock_per_group",
    "zip_explode_lockstep",
    "union_by_name",
    "scalar_feature_sampler",
    "orders_retention_cohort",
    "orders_rfm_segments",
    "orders_snapshot_diff",
    "order_priority_pending",
    "returnflag_priority_casesum",
    "cust_order_count_dist",
    "small_qty_revenue",
    "waiting_supplier_orders",
    "customer_value_deciles",
    "large_quantity_orders",
    "idle_customer_balance",
    "referential_integrity_audit",
    # r6 additions (several intentionally hit empty/degenerate results
    # on these random tables — the date windows and nation constants
    # don't always exist here, and 0-row/NULL-aggregate parity is a
    # real cross-engine check in its own right)
    "customer_value_deciles_sketch",
    "disjunctive_brand_revenue",
    "shipping_priority_topk",
    "forecast_revenue_change",
    "promo_revenue_share",
    "local_supplier_volume",
    "nation_trade_volume",
    "nation_market_share",
    "top_supplier_revenue",
    "cube_status_priority",
    "segment_top_value_orders",
    "scd2_customer_snapshot",
    # r7 additions: the sketch-based planner statistics must agree on
    # adversarial fact tables (0-line orders, repeated keys, ties)
    "cms_join_size_estimate",
    "join_key_skew_profile",
    # r7: point-in-time lookup — generated orders carry custkeys the
    # dim lacks (inner-join drops) and orderkey-derived timestamps on
    # both sides of the version cut
    "scd2_point_in_time_join",
)

_EVENTS_QUERIES = (
    "events_tumbling_1h",
    "events_sessionized",
    "events_dedup_latest",
    "events_asof_last_purchase",
    "event_funnel",
    "json_props_extract",
    "events_interval_join",
    "events_rolling_zscore",
    "events_ohlc_hourly",
    "events_time_weighted_avg",
    "events_gap_detection",
    "events_decay_score",
    "attribution_last_touch",
    "funnel_latency_percentiles",
    "session_path_trigrams",
    "event_transition_matrix",
)


@given(tables=_tables())
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_relational_queries_match_oracle_on_random_inputs(
    spark, tmp_path_factory, tables
):
    orders, lineitem, events = tables
    tmp = tmp_path_factory.mktemp("randrel")
    _write_all(tmp, orders, lineitem, events)
    for name in _RELATIONAL_QUERIES:
        run_and_compare(spark, str(tmp), name, _CATALOG[name])


@given(tables=_tables())
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_events_queries_match_oracle_on_random_inputs(
    spark, tmp_path_factory, tables
):
    orders, lineitem, events = tables
    tmp = tmp_path_factory.mktemp("randev")
    _write_all(tmp, orders, lineitem, events)
    for name in _EVENTS_QUERIES:
        run_and_compare(spark, str(tmp), name, _CATALOG[name])


_PROFILING_QUERIES = (
    "hll_distinct_users",
    "data_profile_orders",
    "mad_outlier_bounds",
    "returned_items_report",
    "value_quantiles_binned",
)


@given(tables=_tables())
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_profiling_queries_match_oracle_on_random_inputs(
    spark, tmp_path_factory, tables
):
    # the sketch/profile tier on adversarial inputs: one-row groups,
    # duplicate users, tied values on MAD fence boundaries (cents
    # grid), empty lineitem for the Q10 report
    orders, lineitem, events = tables
    tmp = tmp_path_factory.mktemp("randprof")
    _write_all(tmp, orders, lineitem, events)
    for name in _PROFILING_QUERIES:
        run_and_compare(spark, str(tmp), name, _CATALOG[name])


# ---------------------------------------------------------------------------
# r7: randomized fuzzy-match parity — part names from a tiny alphabet
# so near-matches, exact duplicates, and length-prefilter edge cases
# (|len a - len b| exactly 4) arise naturally; blocks randomized too.
# ---------------------------------------------------------------------------

_fuzzy_name = st.text(alphabet="abcde ", min_size=0, max_size=12)


@st.composite
def _fuzzy_parts(draw):
    n = draw(st.integers(min_value=1, max_value=12))
    return pd.DataFrame(
        {
            "p_partkey": np.arange(n, dtype="int64"),
            "p_name": draw(
                st.lists(_fuzzy_name, min_size=n, max_size=n)
            ),
            "p_brand": draw(
                st.lists(
                    st.sampled_from(["Brand#1", "Brand#2"]), min_size=n, max_size=n
                )
            ),
            "p_type": ["STANDARD"] * n,
            "p_size": np.array(
                draw(st.lists(st.integers(1, 2), min_size=n, max_size=n)),
                dtype="int32",
            ),
            "p_retailprice": [100.0] * n,
        }
    )


@given(parts=_fuzzy_parts())
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_fuzzy_part_matches_oracle_on_random_inputs(
    spark, tmp_path_factory, parts
):
    tmp = tmp_path_factory.mktemp("fuzzyparts")
    parts.to_parquet(tmp / "part.parquet", index=False)
    run_and_compare(spark, str(tmp), "fuzzy_part_matches", _CATALOG["fuzzy_part_matches"])


def test_grid_sum_is_partition_order_independent_on_half_cents(
    spark, tmp_path_factory
):
    """Regression for the hypothesis-found returned_items_report flip:
    a revenue sum landing EXACTLY on a half-cent (price 2dp x discount
    2dp = 4dp terms) rounds differently depending on float summation
    order — which partitioning changes. grid_sum folds exact integers,
    so (a) every repartitioning yields byte-identical results, and
    (b) Spark matches the DuckDB oracle on a fixture built entirely
    of boundary sums."""
    import pandas as pd

    import pyspark.sql.functions as F

    from chess_pipeline_spark.functions.rounding import fround, grid_sum

    # 101 terms of 0.005 -> true sum 0.505 (half-cent boundary), plus
    # jitter rows that push float error around
    rows = [(1, 10.01, 0.50)] * 1 + [(1, 0.01, 0.50)] * 100 + [
        (1, 9999999.99, 0.13)
    ] * 7
    df = spark.createDataFrame(rows, "k int, price double, disc double")
    term = F.col("price") * (1 - F.col("disc"))
    vals = set()
    for parts in (1, 3, 7, 32):
        v = (
            df.repartition(parts)
            .groupBy("k")
            .agg(fround(grid_sum(term, 4), 2).alias("rev"))
            .first()["rev"]
        )
        vals.add(v)
    assert len(vals) == 1, vals

    # full-query oracle parity on a boundary-sum corpus
    tmp = tmp_path_factory.mktemp("halfcent")
    n = 40
    li = pd.DataFrame(
        {
            "l_orderkey": [i % 4 for i in range(n)],
            "l_partkey": [0] * n,
            "l_suppkey": [0] * n,
            "l_linenumber": list(range(n)),
            "l_quantity": [1.0] * n,
            "l_extendedprice": [10.01 if i % 10 == 0 else 0.01 for i in range(n)],
            "l_discount": [0.50] * n,
            "l_tax": [0.0] * n,
            "l_returnflag": ["R"] * n,
            "l_linestatus": ["O"] * n,
            "l_shipdate": pd.to_datetime(["2020-09-13 12:26:40"] * n),
        }
    )
    orders = pd.DataFrame(
        {
            "o_orderkey": [0, 1, 2, 3],
            "o_custkey": [0, 1, 2, 3],
            "o_orderstatus": ["O"] * 4,
            "o_totalprice": [1.0] * 4,
            "o_orderdate": pd.to_datetime(["2020-09-01"] * 4),
            "o_orderpriority": ["1-URGENT"] * 4,
        }
    )
    li.to_parquet(tmp / "lineitem.parquet", index=False)
    orders.to_parquet(tmp / "orders.parquet", index=False)
    _CUSTOMER.to_parquet(tmp / "customer.parquet", index=False)
    _NATION.to_parquet(tmp / "nation.parquet", index=False)
    _REGION.to_parquet(tmp / "region.parquet", index=False)
    _PART.to_parquet(tmp / "part.parquet", index=False)
    _SUPPLIER.to_parquet(tmp / "supplier.parquet", index=False)
    pd.DataFrame(
        {
            "event_id": [0],
            "ts": pd.to_datetime(["2023-11-14 22:13:20"]),
            "user_id": [0],
            "event_type": ["view"],
            "value": [0.0],
            "props": ['{"k": 1}'],
        }
    ).to_parquet(tmp / "events.parquet", index=False)
    run_and_compare(
        spark, str(tmp), "returned_items_report", _CATALOG["returned_items_report"]
    )
