"""Benchmark decontamination: flag training documents that share
n-gram shingles with an evaluation/benchmark set.

The standard LLM-corpus hygiene step (the reference pipeline has no
analog; this is part of the training-data surface this engine adds):
before training, any document overlapping the eval benchmarks must be
dropped or the eval is contaminated. Detection is n-gram overlap — the
method used by GPT-3/PaLM/Llama dataset reports (typically 8-13 token
n-grams; the synthetic corpus here is short, so tests use n=5).

Scale shape: the eval set is SMALL (thousands of docs) while the
corpus is the 100-TB side. Eval shingles therefore broadcast —
``F.broadcast`` on the exploded (eval_id, shingle) frame — so the
corpus scan never shuffles: each corpus partition streams its shingles
past the in-memory eval index, and only matching (doc, eval) rows
continue to the overlap count. No corpus-sized shuffle exists in the
plan until the final per-doc aggregation over *matches only*.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import doc_shingles


def ngram_contamination(
    corpus: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    min_overlap: int = 1,
) -> DataFrame:
    """Per contaminated corpus doc: how many eval docs it overlaps and
    how strongly.

    Returns (id_col, n_eval_matches, total_shared, max_shared) for
    corpus docs sharing >= ``min_overlap`` distinct n-gram shingles
    with at least one eval doc. A (corpus doc, eval doc) pair counts as
    a match when they share >= ``min_overlap`` distinct shingles;
    ``total_shared`` sums shared-shingle counts over matched eval docs.
    """
    ev = F.broadcast(
        doc_shingles(eval_df, id_col, text_col, n).withColumnRenamed(
            "id", "eval_id"
        )
    )
    cs = doc_shingles(corpus, id_col, text_col, n)
    overlap = (
        cs.join(ev, "shingle")
        .groupBy("id", "eval_id")
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= min_overlap)
    )
    return (
        overlap.groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_eval_matches"),
            F.sum("shared").alias("total_shared"),
            F.max("shared").alias("max_shared"),
        )
        .select(
            F.col("id").alias(id_col),
            "n_eval_matches",
            F.col("total_shared").cast("long").alias("total_shared"),
            F.col("max_shared").cast("long").alias("max_shared"),
        )
    )
