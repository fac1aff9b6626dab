"""Plan-shape regression tests: the performance properties the engine
depends on must be visible in the physical plan (SURVEY §4.2) —
pushdown, pruning, broadcast joins, partial aggregation. These guard
against regressions that correctness tests can't see."""

from __future__ import annotations

from e_commerce_data_pipeline_spark.plans.queries import QUERIES


def _executed_plan(df) -> str:
    df.collect()  # let AQE finalize
    return df._jdf.queryExecution().executedPlan().toString()


def test_q06_scan_prunes_columns_and_pushes_filters(spark, sf_dir):
    plan = _executed_plan(QUERIES["q06_promo_revenue"].fn(spark, sf_dir))
    scan_lines = [l for l in plan.splitlines() if "FileScan parquet" in l]
    assert scan_lines, plan
    scan = scan_lines[0]
    # projection pruning: only the 4 needed columns reach the scan
    for col in ("l_quantity", "l_extendedprice", "l_discount", "l_shipdate"):
        assert col in scan
    for col in ("l_orderkey", "l_tax", "l_returnflag", "l_partkey"):
        assert col not in scan
    # predicate pushdown to the reader
    assert "PushedFilters: [" in plan
    assert "IsNotNull(l_shipdate)" in plan or "isnotnull(l_shipdate" in plan


def test_q02_star_join_broadcasts_dims(spark, sf_dir):
    plan = _executed_plan(QUERIES["q02_revenue_by_nation"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    # dims must never be the probe side of a shuffle join
    assert plan.count("BroadcastExchange") >= 3  # customer, nation, region


def test_q01_partial_aggregation(spark, sf_dir):
    plan = _executed_plan(QUERIES["q01_pricing_summary"].fn(spark, sf_dir))
    # map-side partial + reduce-side final aggregation
    assert "partial_sum" in plan
    assert "HashAggregate" in plan


def test_q01_whole_stage_codegen(spark, sf_dir):
    plan = _executed_plan(QUERIES["q01_pricing_summary"].fn(spark, sf_dir))
    assert "*(" in plan  # codegen stage markers


def test_q26_broadcasts_query_side(spark, sf_dir):
    plan = _executed_plan(QUERIES["q26_knn_bruteforce"].fn(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_q24_lsh_is_equi_join_not_cross(spark, sf_dir):
    plan = _executed_plan(QUERIES["q24_minhash_lsh_candidates"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
