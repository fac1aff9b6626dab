"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame) -> DataFrame:
    """Repartition compute-heavy inputs to the session's parallelism.

    A small parquet file arrives as ONE partition; per-row hashing or
    vector math over it would run on one core. At real scale the scan
    splits naturally and this round-robin is a near-no-op relative to
    the compute it feeds.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
