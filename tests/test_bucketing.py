"""Bucketed co-located join: the join must plan without a shuffle
Exchange on either side (the write pre-paid the partitioning)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from e_commerce_data_pipeline_spark.sources.bucketing import (
    bucketed_join,
    write_bucketed,
)


@pytest.fixture()
def bucketed_tables(spark, sf_dir):
    from e_commerce_data_pipeline_spark.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    write_bucketed(li.withColumnRenamed("l_orderkey", "okey"), "b_lineitem", "okey", 8)
    write_bucketed(o.withColumnRenamed("o_orderkey", "okey"), "b_orders", "okey", 8)
    yield "b_lineitem", "b_orders"
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables, sf_dir):
    from e_commerce_data_pipeline_spark.catalog import load_table

    lt, rt = bucketed_tables
    # disable broadcast so the sort-merge path is exercised (at real
    # scale neither fact side would fit the broadcast threshold)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, lt, rt, "okey")
        n = len(joined.collect())  # materialize THIS plan so AQE finalizes
        # correctness: same row count as the plain shuffled join
        li = load_table(spark, sf_dir, "lineitem")
        o = load_table(spark, sf_dir, "orders")
        assert n == li.join(o, li.l_orderkey == o.o_orderkey).count()
        # plan: no Exchange feeding the join (bucket layout satisfies
        # the join's distribution requirement on both sides)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_aggregation_avoids_shuffle(spark, bucketed_tables):
    lt, _ = bucketed_tables
    agg = spark.table(lt).groupBy("okey").agg(F.count(F.lit(1)).alias("n"))
    agg.collect()
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan
