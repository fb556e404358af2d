"""Every catalog query hash-matches its DuckDB oracle at sf0.001 —
the local mirror of the driver's t2 correctness gate."""

from __future__ import annotations

import pytest

from chess_pipeline_spark.plans import catalog
from tests.oracle_harness import run_and_compare

_CATALOG = catalog()
_WITH_ORACLE = sorted(n for n, s in _CATALOG.items() if s.oracle is not None)
_ROWS_ONLY = sorted(n for n, s in _CATALOG.items() if s.oracle is None)


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_query_matches_oracle(spark, sf_dir, name):
    run_and_compare(spark, sf_dir, name, _CATALOG[name])


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_query_runs(spark, sf_dir, name):
    from chess_pipeline_spark.checkpoints import scoped_checkpoints

    with scoped_checkpoints(spark):
        df = _CATALOG[name].spark(spark, sf_dir)
        assert df.count() >= 0
        assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0


def test_entry_contract_alignment():
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    os_ = entrymod.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 30
