"""Skew utilities: salted join/aggregate equivalence with unsalted."""

from __future__ import annotations

from pyspark.sql import functions as F

from e_commerce_data_pipeline_spark.operators.skew import (
    key_skew_profile,
    salted_aggregate,
    salted_join,
)


def _skewed(spark, n=10_000):
    # 80% of rows land on key 'hot'
    return spark.range(n).select(
        F.when(F.col("id") % 5 != 0, "hot")
        .otherwise(F.concat(F.lit("k"), F.col("id") % 100))
        .alias("k"),
        (F.col("id") % 7).cast("double").alias("v"),
    )


def test_skew_profile_finds_hot_key(spark):
    prof = key_skew_profile(_skewed(spark), "k", top_k=3).collect()
    assert prof[0]["k"] == "hot"
    assert prof[0]["share"] > 0.7


def test_salted_join_matches_plain_join(spark):
    big = _skewed(spark)
    small = spark.createDataFrame(
        [("hot", 1.5), ("k0", 2.0), ("k5", 3.0)], "k string, w double"
    )
    plain = big.join(small, "k").agg(F.sum(F.col("v") * F.col("w")).alias("s"), F.count(F.lit(1)).alias("n")).collect()[0]
    salted = salted_join(big, small, "k", n_salts=8).agg(
        F.sum(F.col("v") * F.col("w")).alias("s"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    assert salted["n"] == plain["n"]
    assert abs(salted["s"] - plain["s"]) < 1e-6


def test_salted_aggregate_matches_plain(spark):
    df = _skewed(spark)
    plain = {
        r["k"]: (r["s"], r["n"])
        for r in df.groupBy("k").agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n")).collect()
    }
    salted = {
        r["k"]: (r["s"], r["n"])
        for r in salted_aggregate(
            df,
            "k",
            n_salts=8,
            partial_aggs=[F.sum("v").alias("ps"), F.count(F.lit(1)).alias("pn")],
            final_aggs=[F.sum("ps").alias("s"), F.sum("pn").alias("n")],
        ).collect()
    }
    assert set(plain) == set(salted)
    for k in plain:
        assert plain[k][1] == salted[k][1]
        assert abs(plain[k][0] - salted[k][0]) < 1e-6
