"""Differential test: every oracle-paired query in the suite must match
DuckDB on sf0.001 (the driver runs the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from e_commerce_data_pipeline_spark.plans.queries import QUERIES

from .oracle_diff import assert_matches_oracle

ORACLE_QUERIES = [n for n, s in QUERIES.items() if s.oracle is not None]


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, sf_dir, name):
    spec = QUERIES[name]
    df = spec.fn(spark, sf_dir)
    assert_matches_oracle(df, spec.oracle, sf_dir, name)


def test_entry_smoke(spark):
    from __spark_entry__ import entry

    df = entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert "revenue" in df.columns
