"""10x scale probe (round 14): convert the 100x-scale design argument
into a measurement for the heaviest LLM rows — q65 (WARC corpus
walk), q59/q129 (embedding near-dup / SemDeDup), q157 (exact-quantile
narrowing).

Synthesizes a 10x-sf0.1-equivalent corpus into /tmp/scale10x by
replicating the sf0.1 tables with DECORRELATING perturbation, so the
replicas are new data rather than artificial exact-duplicate mass
(which would quadratically inflate every near-dup candidate stage by
construction):

- documents: per-replica deterministic character rotation of text
  (length-preserving, so n_chars/quality gates keep their sf0.1
  distribution; shingle sets decorrelate across replicas).
- embeddings: per-replica dimension roll (norm-preserving, cosine
  structure within a replica preserved, across replicas decorrelated).
- lineitem: plain replication with offset keys (quantile narrowing is
  duplicate-insensitive; the value RANGE — what sizes the bucket
  count — is unchanged, which is also the realistic shape: more rows,
  same domain).

Usage: PYTHONPATH=/root/repo python tests/scale_probe.py synth
       PYTHONPATH=/root/repo python tests/scale_probe.py run q65 q157
       PYTHONPATH=/root/repo python tests/scale_probe.py run q59 q59p q129

Each `run` times the query at sf0.1 and at the 10x dir in the SAME
session (bench-identical _timed_min: warm pass at sf0.001, System.gc,
clearCache between runs) and prints the wall-time ratio; ~10x means
linear scaling. q65 uses min-of-4 (its documented floor rule), the
rest min-of-2. `q59p` is q59's operator with n_planes scaled +3 for
the 10x corpus (log2(10) ~ 3.3) — fixed-width LSH buckets hold 10x
the members at 10x corpus, so candidate pairs grow ~100x per bucket
unless the plane count grows with log(n); q59p measures the knob.

Findings are recorded in PERF.md (round-14 scale-probe section).
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402
from e_commerce_data_pipeline_spark.plans.queries import QUERIES  # noqa: E402
from e_commerce_data_pipeline_spark.session import get_spark  # noqa: E402

OUT = "/tmp/scale10x"
SF = "/root/testdata/sf0.1"
WARM = "/root/testdata/sf0.001"
FACTOR = 10

TARGETS = {
    "q65": ("q65_llm_corpus_pipeline", 4),
    "q59": ("q59_embedding_near_dup", 2),
    "q129": ("q129_semdedup", 2),
    "q157": ("q157_exact_quantile_narrowing", 2),
}


def synthesize(spark):
    from pyspark.sql import functions as F

    reps = spark.range(FACTOR).withColumnRenamed("id", "k")

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    (
        docs.crossJoin(reps)
        .withColumn(
            "off",
            F.when(F.col("k") == 0, F.lit(0)).otherwise(
                F.pmod(
                    F.xxhash64("doc_id", "k"),
                    F.greatest(F.length("text"), F.lit(1)),
                )
            ),
        )
        .select(
            (F.col("doc_id") + F.col("k") * F.lit(10_000_000)).alias(
                "doc_id"
            ),
            F.concat(
                F.expr("substring(text, off + 1)"),
                F.expr("substring(text, 1, off)"),
            ).alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        .write.mode("overwrite")
        .parquet(f"{OUT}/documents.parquet")
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    (
        emb.crossJoin(reps)
        .select(
            (F.col("vec_id") + F.col("k") * F.lit(10_000_000)).alias(
                "vec_id"
            ),
            F.expr(
                "cast(transform(sequence(0, 63),"
                " i -> embedding[int((i + k) % 64)]) as array<float>)"
            ).alias("embedding"),
            "label",
        )
        .write.mode("overwrite")
        .parquet(f"{OUT}/embeddings.parquet")
    )

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    (
        li.crossJoin(reps)
        .withColumn(
            "l_orderkey",
            F.col("l_orderkey") + F.col("k") * F.lit(1_000_000_000),
        )
        .drop("k")
        .write.mode("overwrite")
        .parquet(f"{OUT}/lineitem.parquet")
    )
    print("synthesized 10x tables at", OUT, flush=True)


def _q59_scaled(spark, sf_dir):
    """q59's operator with the plane count grown for the 10x corpus:
    bucket occupancy ~ n / 2^planes, so holding per-bucket pair cost
    flat across a 10x corpus needs ~log2(10) ~ 3 extra planes."""
    from e_commerce_data_pipeline_spark.catalog import load_table
    from e_commerce_data_pipeline_spark.operators.dedup import (
        embedding_near_dup,
    )

    return embedding_near_dup(
        load_table(spark, sf_dir, "embeddings"),
        dim=64,
        threshold=0.4,
        n_planes=7,
        n_tables=2,
    )


def run(keys):
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    for key in keys:
        if key == "q59p":
            fn, runs, label = _q59_scaled, 2, "q59 n_planes=7 (scaled)"
        else:
            name, runs = TARGETS[key]
            fn, label = QUERIES[name].fn, name
        fn(spark, WARM).collect()
        spark.catalog.clearCache()
        base, rows_b = bench._timed_min(spark, fn, SF, runs=runs, gc=True)
        big, rows_x = bench._timed_min(spark, fn, OUT, runs=runs, gc=True)
        print(
            f"SCALE {label}: sf0.1 {base:.3f}s ({len(rows_b)} rows)"
            f" -> 10x {big:.3f}s ({len(rows_x)} rows)"
            f" ratio {big / base:.2f}x",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    if sys.argv[1] == "synth":
        spark = get_spark("scale-probe-synth")
        spark.sparkContext.setLogLevel("ERROR")
        synthesize(spark)
        spark.stop()
    else:
        run(sys.argv[2:])
