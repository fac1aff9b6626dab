"""Embedding-space decontamination: agreement with a brute-force HOF
cosine reference, threshold semantics, and nearest-eval tie-breaks."""

from __future__ import annotations

from pyspark.sql import functions as F

from e_commerce_data_pipeline_spark.operators.decontam import (
    embedding_contamination,
)
from e_commerce_data_pipeline_spark.operators.similarity import cosine


def _emb(spark, sf_dir):
    from e_commerce_data_pipeline_spark.catalog import load_table

    return load_table(spark, sf_dir, "embeddings")


def test_matches_bruteforce_hof_reference(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    corpus, ev = emb.filter(F.col("vec_id") >= 5), emb.filter(F.col("vec_id") < 5)
    got = {
        (r["vec_id"], r["nearest_eval_id"], r["sim"])
        for r in embedding_contamination(corpus, ev, threshold=0.25).collect()
    }
    # reference: JVM higher-order-function cosine, same rounding/ties
    from pyspark.sql import Window

    pairs = corpus.select(
        "vec_id", F.col("embedding").alias("cv")
    ).crossJoin(
        F.broadcast(
            ev.select(F.col("vec_id").alias("eval_id"), F.col("embedding").alias("ev"))
        )
    ).withColumn("s", cosine(F.col("cv"), F.col("ev")))
    w = Window.partitionBy("vec_id").orderBy(F.desc("s"), F.asc("eval_id"))
    ref = {
        (r["vec_id"], r["eval_id"], r["sim"])
        for r in pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .withColumn("sim", F.round("s", 6))
        .filter(F.col("sim") >= 0.25)
        .select("vec_id", "eval_id", "sim")
        .collect()
    }
    assert got == ref and len(got) > 0


def test_exact_duplicate_is_flagged_at_one(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    ev = emb.filter(F.col("vec_id") < 3)
    # plant the eval vectors inside the corpus under shifted ids
    leak = ev.select((F.col("vec_id") + 100000).alias("vec_id"), "embedding")
    corpus = emb.filter(F.col("vec_id") >= 5).select("vec_id", "embedding").union(leak)
    rows = {
        r["vec_id"]: (r["nearest_eval_id"], r["sim"])
        for r in embedding_contamination(corpus, ev, threshold=0.999).collect()
    }
    assert set(rows) == {100000, 100001, 100002}
    for planted, (near, sim) in rows.items():
        assert near == planted - 100000 and sim == 1.0
