"""Deterministic split/sample/shuffle: layout independence, exact
counts, proportion sanity, shuffle-is-a-permutation."""

from __future__ import annotations

from pyspark.sql import functions as F

from e_commerce_data_pipeline_spark.catalog import load_table
from e_commerce_data_pipeline_spark.operators.sampling import (
    deterministic_shuffle,
    hash_split,
    stratified_sample,
)


def test_split_is_layout_independent(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = {
        r["doc_id"]: r["split"]
        for r in hash_split(docs, "doc_id").select("doc_id", "split").collect()
    }
    b = {
        r["doc_id"]: r["split"]
        for r in hash_split(docs.repartition(17), "doc_id")
        .select("doc_id", "split")
        .collect()
    }
    assert a == b  # randomSplit would fail this


def test_split_proportions_and_totality(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    counts = {
        r["split"]: r["n"]
        for r in hash_split(docs, "doc_id")
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert sum(counts.values()) == n  # every row lands in exactly one split
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
    # 80/10/10 within binomial noise (n=500 -> sd ~9 for train)
    assert abs(counts["train"] - 0.8 * n) < 5 * (0.8 * 0.2 * n) ** 0.5


def test_stratified_sample_exact_counts(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    group_sizes = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    out = stratified_sample(docs, "lang", 20, "doc_id")
    got = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == {g: min(20, n) for g, n in group_sizes.items()}
    # deterministic: same draw twice
    ids1 = sorted(r["doc_id"] for r in out.collect())
    ids2 = sorted(
        r["doc_id"] for r in stratified_sample(docs, "lang", 20, "doc_id").collect()
    )
    assert ids1 == ids2


def test_deterministic_shuffle_permutes_stably(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    order1 = [r["doc_id"] for r in deterministic_shuffle(docs, "doc_id").collect()]
    order2 = [
        r["doc_id"]
        for r in deterministic_shuffle(docs.repartition(13), "doc_id").collect()
    ]
    assert order1 == order2  # same global order regardless of layout
    assert sorted(order1) == sorted(r["doc_id"] for r in docs.collect())
    assert order1 != sorted(order1)  # actually shuffled


def test_source_mix_quotas_and_composition(spark, sf_dir):
    import pytest

    from e_commerce_data_pipeline_spark.operators.sampling import source_mix

    docs = load_table(spark, sf_dir, "documents")
    weights = {"src0": 0.5, "src1": 0.3, "src2": 0.2}
    out = source_mix(docs, "source", weights, "doc_id")
    counts = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # scarcest source binds: each src has 25 docs -> scale = 25/0.5 = 50
    assert counts == {"src0": 25, "src1": 15, "src2": 10}
    # achieved composition matches the weights exactly at these counts
    total = sum(counts.values())
    for s, w in weights.items():
        assert counts[s] == int(w * 50)
    assert total == 50
    # deterministic draw
    ids1 = sorted(r["doc_id"] for r in out.collect())
    ids2 = sorted(
        r["doc_id"] for r in source_mix(docs, "source", weights, "doc_id").collect()
    )
    assert ids1 == ids2
    # unknown source names fail loudly
    with pytest.raises(ValueError):
        source_mix(docs, "source", {"nope": 1.0}, "doc_id")


def test_pack_sequences_contract(spark, sf_dir):
    from e_commerce_data_pipeline_spark.operators.sampling import pack_sequences
    from e_commerce_data_pipeline_spark.operators.text import token_count

    docs = (
        load_table(spark, sf_dir, "documents")
        .withColumn("n_tokens", token_count("text").cast("int"))
        .select("doc_id", "n_tokens")
    )
    budget = 200
    packed = pack_sequences(docs, budget=budget, n_groups=8).cache()
    rows = packed.collect()
    n_docs = docs.count()
    # every doc assigned exactly once
    assert len(rows) == n_docs
    assert len({r["doc_id"] for r in rows}) == n_docs
    # no pack exceeds the budget unless it holds a single oversize doc
    tok = {r["doc_id"]: r["n_tokens"] for r in docs.collect()}
    by_pack: dict[int, list] = {}
    for r in rows:
        by_pack.setdefault(r["pack_id"], []).append(r)
    for pack, members in by_pack.items():
        total = sum(tok[m["doc_id"]] for m in members)
        assert total <= budget or len(members) == 1
        # reported fill equals the true pack total
        assert all(m["pack_fill"] == total for m in members)
        # slots are 0..k-1
        assert sorted(m["pack_slot"] for m in members) == list(range(len(members)))
    # packing is efficient: average fill well above half the budget
    fills = [sum(tok[m["doc_id"]] for m in members) for members in by_pack.values()]
    assert sum(fills) / len(fills) > 0.5 * budget
    # layout independence: same assignment after repartition
    again = pack_sequences(docs.repartition(13), budget=budget, n_groups=8)
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again.collect()))


def test_cluster_balanced_sample_quota_and_determinism(spark):
    from e_commerce_data_pipeline_spark.operators.sampling import (
        cluster_balanced_sample,
    )

    # cluster 0: 10 rows (downsampled), cluster 1: 2 rows (kept whole)
    assigned = spark.createDataFrame(
        [(i, 0) for i in range(10)] + [(100, 1), (101, 1)],
        "vec_id long, cluster int",
    )
    out1 = cluster_balanced_sample(assigned, per_cluster=3).collect()
    out2 = cluster_balanced_sample(assigned, per_cluster=3).collect()
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))  # deterministic
    by_cluster = {}
    for r in out1:
        by_cluster.setdefault(r["cluster"], []).append(r)
    assert len(by_cluster[0]) == 3 and len(by_cluster[1]) == 2
    assert all(r["cluster_size"] == 10 for r in by_cluster[0])
    assert all(r["rk"] <= 3 for r in out1)


def test_dsir_importance_hand_checked(spark):
    import math

    from e_commerce_data_pipeline_spark.operators.sampling import (
        dsir_importance,
    )

    # target docs are pure "aa", raw adds "bb"-heavy noise docs
    docs = spark.createDataFrame(
        [
            (1, "aa aa", "tgt"),
            (2, "aa bb", "tgt"),
            (3, "bb bb bb", "other"),
            (4, "bb cc", "other"),
        ],
        "doc_id long, text string, source string",
    )
    out = {
        r["doc_id"]: r
        for r in dsir_importance(
            docs, F.col("source") == "tgt"
        ).collect()
    }
    # corpus: aa=3 (tgt 3), bb=5 (tgt 1), cc=1 (tgt 0); V=3,
    # t_raw=9, t_tgt=4
    def w(c_tgt, c_raw):
        return round(
            (math.log((c_tgt + 1) / 7.0) - math.log((c_raw + 1) / 12.0))
            * 1_000_000
        )

    w_aa, w_bb, w_cc = w(3, 3), w(1, 5), w(0, 1)
    assert w_aa > 0 > w_bb  # target-like tokens up, noise tokens down
    assert out[1]["sum_w_micro"] == 2 * w_aa
    assert out[2]["sum_w_micro"] == w_aa + w_bb
    assert out[3]["sum_w_micro"] == 3 * w_bb
    assert out[4]["sum_w_micro"] == w_bb + w_cc
    assert out[1]["is_target"] and not out[3]["is_target"]
    assert out[3]["n_tokens"] == 3


def test_weighted_sample_deterministic_and_layout_independent(spark, sf_dir):
    from e_commerce_data_pipeline_spark.catalog import load_table
    from e_commerce_data_pipeline_spark.operators.sampling import weighted_sample

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    a = {r["doc_id"] for r in weighted_sample(docs, "doc_id", "n_chars", 50).collect()}
    b = {
        r["doc_id"]
        for r in weighted_sample(docs.repartition(13), "doc_id", "n_chars", 50).collect()
    }
    assert a == b and len(a) == 50


def test_weighted_sample_bias_follows_weights(spark):
    from pyspark.sql import functions as F

    from e_commerce_data_pipeline_spark.operators.sampling import weighted_sample

    # 500 light rows (w=1) + 500 heavy rows (w=50): a 100-row sample
    # should be dominated by heavy rows (E[heavy] ~ 98)
    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 500, 1).otherwise(50).alias("w"),
    )
    got = weighted_sample(df, "doc_id", "w", 100).collect()
    heavy = sum(1 for r in got if r["doc_id"] >= 500)
    assert len(got) == 100 and heavy > 80
