"""Bloom-filter join pruning (operators/bloom): equivalence to the
plain semi join, measured false-positive behavior, and the JVM-only
plan shape the 100 TB rationale depends on."""

from __future__ import annotations

from pyspark.sql import functions as F

from e_commerce_data_pipeline_spark.operators.bloom import (
    BloomFilter,
    bloom_semi_join,
    build_bloom,
    might_contain,
)


def _fact(spark, n=5000):
    return spark.range(n).select((F.col("id") * 13 % 7919).alias("k"), F.col("id"))


def _build(spark):
    return spark.range(400).select((F.col("id") * 31 % 7919).alias("bk"))


def test_bloom_semi_join_equals_plain_semi_join(spark):
    fact, build = _fact(spark), _build(spark)
    plain = sorted(
        fact.join(build.select(F.col("bk").alias("k")), "k", "left_semi")
        .select("k", "id")
        .collect()
    )
    pruned = sorted(bloom_semi_join(fact, "k", build, "bk").select("k", "id").collect())
    assert plain == pruned
    assert len(plain) > 0


def test_bloom_never_false_negative_and_bounded_fp(spark):
    build = _build(spark)
    bf = build_bloom(build, "bk", m_bits=1 << 14, k=4)
    keys = {r["bk"] for r in build.collect()}
    probe = spark.range(20000).select((F.col("id") % 100000).alias("k"))
    hits = probe.filter(might_contain(bf, F.col("k"))).collect()
    hit_keys = {r["k"] for r in hits}
    # no false negatives: every true key that appears in probe is kept
    assert {k for k in keys if k < 100000} <= hit_keys
    # false positives bounded: fpp ~= (1-e^{-kn/m})^k ~= 0.05% here;
    # allow 50x slack — the point is "most rows pruned", not the exact rate
    n_true = len({r["k"] for r in probe.collect()} & keys)
    assert len(hit_keys) - n_true <= 0.025 * 100000


def test_bloom_build_is_compact_and_distributed(spark):
    build = _build(spark)
    bf = build_bloom(build, "bk", m_bits=1 << 13, k=3)
    assert isinstance(bf, BloomFilter)
    assert len(bf.words) == (1 << 13) // 64
    n_keys = build.distinct().count()
    assert 0 < bf.n_set_bits <= 3 * n_keys


def test_bloom_probe_plan_stays_jvm_side(spark):
    """The membership predicate must compile to native expressions —
    no Python/Arrow eval node — and sit as a Filter on the fact side
    below the exchange (pruning happens before the shuffle)."""
    fact, build = _fact(spark), _build(spark)
    bf = build_bloom(build, "bk")
    pruned = fact.filter(might_contain(bf, F.col("k")))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan  # no Python boundary
    assert "xxhash64" in plan.lower()
