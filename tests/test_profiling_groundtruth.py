"""Python/numpy ground truths for the profiling tier.

Oracle parity proves Spark == DuckDB; the sketch tests prove the
sketch algebra; these pin the PLAIN-AGGREGATE semantics against an
independent pandas/numpy replay so a shared SQL-side mistake (wrong
null handling, wrong rank rounding, wrong fence constant) can't pass
unnoticed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from chess_pipeline_spark.plans import catalog

_CATALOG = catalog()


def test_data_profile_matches_pandas(spark, sf_dir):
    got = {
        r.column_name: (r.n_rows, r.n_nulls, r.n_distinct)
        for r in _CATALOG["data_profile_orders"].spark(spark, sf_dir).collect()
    }
    pdf = pd.read_parquet(f"{sf_dir}/orders.parquet")
    for col in got:
        s = pdf[col]
        assert got[col] == (
            len(pdf),
            int(s.isna().sum()),
            int(s.dropna().nunique()),
        ), col


def test_mad_outliers_match_numpy(spark, sf_dir):
    rows = _CATALOG["mad_outlier_bounds"].spark(spark, sf_dir).collect()
    pdf = pd.read_parquet(f"{sf_dir}/events.parquet")

    def grid6(x):
        return np.floor(x * 1e6 + 0.5) / 1e6

    for r in rows:
        v = pdf.loc[pdf["event_type"] == r.event_type, "value"].dropna().to_numpy()
        med = grid6(np.percentile(v, 50, method="linear"))
        mad = grid6(np.percentile(np.abs(v - med), 50, method="linear"))
        assert abs(r.med - med) < 1e-9, r.event_type
        assert abs(r.mad - mad) < 1e-9, r.event_type
        lo, hi = med - 4.4478 * mad, med + 4.4478 * mad
        n_out = int(((v < lo) | (v > hi)).sum())
        assert r.n_outliers == n_out, r.event_type
        assert r.n == len(v)


def test_returned_items_match_pandas(spark, sf_dir):
    got = [
        (r.c_custkey, r.revenue, r.n_lines)
        for r in _CATALOG["returned_items_report"].spark(spark, sf_dir).collect()
    ]
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    j = li[li["l_returnflag"] == "R"].merge(
        o[["o_orderkey", "o_custkey"]], left_on="l_orderkey", right_on="o_orderkey"
    )
    j["rev"] = j["l_extendedprice"] * (1 - j["l_discount"])
    per = j.groupby("o_custkey").agg(revenue=("rev", "sum"), n=("rev", "size"))
    per["revenue"] = np.floor(per["revenue"] * 100 + 0.5) / 100
    per = per.sort_values(["revenue", "o_custkey"], ascending=[False, True]).head(20)
    want = [(int(k), float(r.revenue), int(r.n)) for k, r in per.iterrows()]
    assert got == want


def test_unigram_logprob_matches_python(spark, sf_dir):
    import math

    got = {
        r.doc_id: (r.n_words, r.n_oov, r.avg_logprob)
        for r in _CATALOG["unigram_logprob_score"].spark(spark, sf_dir).collect()
    }
    pdf = pd.read_parquet(f"{sf_dir}/documents.parquet")
    pdf = pdf[pdf["text"].notna()]
    toks = {int(r.doc_id): r.text.split(" ") for r in pdf.itertuples()}
    train: dict[str, int] = {}
    n_train = 0
    for d, ws in toks.items():
        if d % 2 == 0:
            for w in ws:
                train[w] = train.get(w, 0) + 1
                n_train += 1
    denom = n_train + len(train)
    lp = {w: int(math.floor(math.log((c + 1) / denom) * 1e6 + 0.5)) for w, c in train.items()}
    lp_oov = int(math.floor(math.log(1.0 / denom) * 1e6 + 0.5))
    for d, ws in toks.items():
        s = sum(lp.get(w, lp_oov) for w in ws)
        oov = sum(1 for w in ws if w not in lp)
        avg = math.floor((s / 1e6 / len(ws)) * 1e6 + 0.5) / 1e6
        assert got[d] == (len(ws), oov, avg), d
