"""Streaming gold layer: incrementally maintained business aggregates
(the reference's declared Gold "business-ready aggregations",
lake_writer.py:13-21, kept fresh by the stream instead of an hourly
batch).

Pattern: foreachBatch computes the micro-batch's partial aggregate,
merges it with the current gold table, and atomically swaps the result
in (write to a staging dir, rename over the live dir). Merging partial
aggregates works because the gold metrics are algebraic (sums/counts
keyed by date+category) — the same partial-aggregation property the
batch engine relies on.

On a lakehouse runtime the swap is replaced by Delta/Iceberg MERGE
INTO, which also makes the upsert transactional per micro-batch; the
checkpoint provides exactly-once batch ids either way (a re-run of a
failed batch re-merges the same partial, which is idempotent here
because the swap is all-or-nothing).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GOLD_KEYS = ("event_date", "category")


def _batch_revenue(order_events: DataFrame) -> DataFrame:
    """Partial gold aggregate for one micro-batch of order events."""
    lines = order_events.select(
        F.to_date("timestamp").alias("event_date"), F.explode("items").alias("item")
    )
    revenue = (
        F.col("item.quantity")
        * F.col("item.unit_price")
        * (F.lit(1.0) - F.coalesce(F.col("item.discount_pct"), F.lit(0.0)) / 100.0)
    )
    return lines.groupBy(
        "event_date", F.col("item.category").alias("category")
    ).agg(
        F.sum(revenue).alias("revenue"),
        F.sum("item.quantity").cast("long").alias("units"),
        F.count(F.lit(1)).alias("n_lines"),
    )


def merge_gold_revenue(batch_df: DataFrame, gold_path: str) -> None:
    """Merge one batch's partial aggregate into the gold table
    (read-merge-swap; MERGE INTO on a lakehouse runtime)."""
    spark = batch_df.sparkSession
    partial = _batch_revenue(batch_df)
    if os.path.exists(gold_path):
        current = spark.read.parquet(gold_path)
        merged = (
            current.unionByName(partial)
            .groupBy(*GOLD_KEYS)
            .agg(
                F.sum("revenue").alias("revenue"),
                F.sum("units").cast("long").alias("units"),
                F.sum("n_lines").alias("n_lines"),
            )
        )
    else:
        merged = partial
    staging = gold_path + ".staging"
    merged.write.mode("overwrite").parquet(staging)
    old = gold_path + ".old"
    shutil.rmtree(old, ignore_errors=True)
    if os.path.exists(gold_path):
        os.rename(gold_path, old)
    os.rename(staging, gold_path)
    shutil.rmtree(old, ignore_errors=True)


def gold_revenue_stream_query(
    spark,
    raw: DataFrame,
    gold_path: str,
    checkpoint_path: str,
    trigger: str = "30 seconds",
    available_now: bool = False,
):
    """orders topic stream -> continuously maintained revenue gold."""
    from .stream_processor import parse_topic_stream

    parsed = parse_topic_stream(raw, "ecommerce.orders").filter(~F.col("_corrupt"))

    writer = (
        parsed.writeStream.foreachBatch(
            lambda df, batch_id: merge_gold_revenue(df, gold_path)
        )
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=trigger)
    return writer.start()
