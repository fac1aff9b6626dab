"""Misra-Gries heavy hitters: exactness vs brute force on skewed data,
candidate-superset guarantee, and the no-tail-shuffle plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from e_commerce_data_pipeline_spark.operators.frequency import (
    heavy_hitters,
    mg_candidates,
)


@pytest.fixture(scope="module")
def skewed(spark):
    # Zipf-ish stream: item i appears ~ N/i times -> real MG pruning
    # (vocab 200 >> k) across a multi-partition layout
    rows = []
    for i in range(1, 201):
        rows.extend([(f"item{i:03d}",)] * (2000 // i))
    return spark.createDataFrame(rows, "token string").repartition(8).cache()


def test_heavy_hitters_exact_vs_bruteforce(spark, skewed):
    k = 10
    got = {
        (r["token"], r["freq"]) for r in heavy_hitters(skewed, "token", k).collect()
    }
    n = skewed.count()
    brute = {
        (r["token"], r["freq"])
        for r in skewed.groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") * (k + 1) > n)
        .collect()
    }
    assert got == brute and len(brute) > 0


def test_mg_candidates_superset_and_bounded(spark, skewed):
    k = 10
    n = skewed.count()
    cand = {r["token"] for r in mg_candidates(skewed, "token", k).collect()}
    heavy = {
        r["token"]
        for r in skewed.groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") * (k + 1) > n)
        .collect()
    }
    assert heavy <= cand  # superset guarantee (pigeonhole over partitions)
    n_parts = skewed.rdd.getNumPartitions()
    assert len(cand) <= k * n_parts  # <= k survivors per partition
    assert len(cand) < 200  # the tail was actually pruned


def test_heavy_hitters_ignores_nulls(spark):
    df = spark.createDataFrame(
        [("a",)] * 8 + [(None,)] * 5 + [("b",)] * 1, "token string"
    )
    rows = heavy_hitters(df, "token", k=2).collect()
    # N excludes nulls: 9 non-null, threshold 9/3=3 -> only 'a'
    assert [(r["token"], r["freq"], r["n_total"]) for r in rows] == [("a", 8, 9)]


def test_recount_uses_broadcast_candidates(spark, skewed):
    plan = heavy_hitters(skewed, "token", 10)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # the tail never shuffles


def test_count_min_one_sided_and_mergeable(spark):
    """CM guarantee: est >= true for EVERY key; and counters built on
    disjoint splits merge by plain addition into exactly the
    whole-corpus sketch (the property that makes it a partial agg)."""
    from pyspark.sql import functions as F

    from e_commerce_data_pipeline_spark.operators.frequency import (
        count_min_counters,
        count_min_estimate,
    )

    rows = [(f"k{i % 37}",) for i in range(2000)] + [("hot",)] * 500
    df = spark.createDataFrame(rows, "k string")
    counters = count_min_counters(df, "k", depth=4, width=32)  # narrow: collisions certain
    exact = df.groupBy("k").agg(F.count(F.lit(1)).alias("n"))
    est = count_min_estimate(counters, exact.select("k"), "k", depth=4, width=32)
    j = {r.k: (r.n, r.cm_est) for r in exact.join(est, "k").collect()}
    assert len(j) == 38
    assert all(e >= n for n, e in j.values())
    assert j["hot"][0] == 500 and j["hot"][1] >= 500

    # mergeability: sum of split sketches == whole sketch
    a = count_min_counters(df.filter(F.length("k") == 2), "k", 4, 32)
    b = count_min_counters(df.filter(F.length("k") != 2), "k", 4, 32)
    merged = {
        (r.row, r.bucket): r.c
        for r in a.unionByName(b)
        .groupBy("row", "bucket")
        .agg(F.sum("c").alias("c"))
        .collect()
    }
    whole = {(r.row, r.bucket): r.c for r in counters.collect()}
    assert merged == whole


def test_hll_registers_merge_by_max_and_estimate_tracks_n(spark):
    """HLL registers built on disjoint splits merge by MAX into exactly
    the whole-corpus register table (the mergeable-summary property),
    duplicates don't move the sketch, and the raw estimate lands within
    the ~1.04/sqrt(m) relative-error regime for n >> 2.5m."""
    from pyspark.sql import functions as F

    from e_commerce_data_pipeline_spark.operators.frequency import (
        hll_estimate,
        hll_registers,
    )

    n = 5000
    df = spark.createDataFrame([(i,) for i in range(n)], "k long")
    regs = hll_registers(df, "k", p=6)
    whole = {r.register: r.m_j for r in regs.collect()}

    # duplicates are invisible to a distinct sketch
    dup = hll_registers(df.unionAll(df), "k", p=6)
    assert {r.register: r.m_j for r in dup.collect()} == whole

    # mergeability: MAX of split sketches == whole sketch
    a = hll_registers(df.filter(F.col("k") % 2 == 0), "k", p=6)
    b = hll_registers(df.filter(F.col("k") % 2 == 1), "k", p=6)
    merged = {
        r.register: r.m_j
        for r in a.unionByName(b)
        .groupBy("register")
        .agg(F.max("m_j").alias("m_j"))
        .collect()
    }
    assert merged == whole

    row = hll_estimate(regs, p=6).collect()[0]
    assert row.m == 64 and 0 < row.nonzero_registers <= 64
    # 64 registers -> sigma ~ 13%; 4-sigma bound keeps this non-flaky
    assert abs(row.hll_est / n - 1) < 0.52

    # nulls are ignored entirely
    withnull = spark.createDataFrame(
        [(i,) for i in range(n)] + [(None,)] * 7, "k long"
    )
    assert {
        r.register: r.m_j for r in hll_registers(withnull, "k", p=6).collect()
    } == whole
