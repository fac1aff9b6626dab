"""Stream-stream joins (the canonical hard Structured Streaming op):
event-time click -> purchase attribution with watermark-bounded state.

Semantics (reference analog: the funnel the batch q13/q31 queries
compute, expressed incrementally): a purchase joins every click by the
same user whose timestamp precedes it by at most ``max_gap``. Spark
buffers both sides in state; the join time-bound plus the watermarks
lets it evict: a click older than (watermark - max_gap) can never
match a future purchase and is dropped. Without the time-bound the
state would grow forever — the at-scale failure mode this module
exists to avoid.

Outer-join caveat, stated honestly: unmatched rows of a stream-stream
LEFT/RIGHT outer join emit only when the watermark passes their
eviction bound. A bounded drain (``availableNow``) ends the query at
the last input, so rows whose watermark never advances past them are
NOT emitted — batch replays that need the unmatched set should use
the batch anti-join instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribution_stream_join(
    clicks: DataFrame,
    purchases: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    watermark: str = "30 minutes",
    max_gap: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join purchase events to the clicks that preceded them within
    ``max_gap``, on watermarked event time.

    Returns (user_id, click_ts, purchase_ts, value, lag_sec). State
    per side is bounded by ``watermark + max_gap`` of event time.
    """
    c = clicks.select(
        F.col(user_col).alias("user_id"), F.col(ts_col).alias("click_ts")
    ).withWatermark("click_ts", watermark)
    p = purchases.select(
        F.col(user_col).alias("p_user_id"),
        F.col(ts_col).alias("purchase_ts"),
        F.col(value_col).alias("value"),
    ).withWatermark("purchase_ts", watermark)
    cond = (
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {max_gap}"))
    )
    joined = c.join(p, cond, how)
    return joined.select(
        "user_id",
        "click_ts",
        "purchase_ts",
        "value",
        (
            F.unix_timestamp("purchase_ts") - F.unix_timestamp("click_ts")
        ).alias("lag_sec"),
    )


_DRAIN_SEQ = 0


def drain_attribution_from_events(
    spark,
    events_path: str,
    watermark: str = "30 minutes",
    max_gap: str = "10 minutes",
    shuffle_partitions: int | None = 8,
) -> DataFrame:
    """Run the stream-stream attribution join over the events table's
    click and purchase streams (two independent bounded file sources
    over the same parquet) and drain with availableNow — the harness
    that lets the driver diff the *streaming* join against a batch SQL
    oracle (same pattern as the q56 session drain)."""
    from ..session import configure_existing

    configure_existing(spark)  # nanosAsLong before schema inference
    batch = spark.read.parquet(events_path)
    parent, fname = events_path.rsplit("/", 1)

    def source() -> DataFrame:
        s = (
            spark.readStream.schema(batch.schema)
            .option("pathGlobFilter", fname)
            .parquet(parent)
        )
        if dict(batch.dtypes).get("ts") == "bigint":
            # TIMESTAMP(NANOS) read as long ns -> µs (mirrors catalog)
            s = s.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return s

    clicks = source().filter(F.col("event_type") == "click")
    purchases = source().filter(F.col("event_type") == "purchase")
    out = attribution_stream_join(
        clicks, purchases, watermark=watermark, max_gap=max_gap
    )
    global _DRAIN_SEQ
    _DRAIN_SEQ += 1
    name = f"attribution_drain_{_DRAIN_SEQ}"
    from .stream_processor import state_sized_shuffle

    with state_sized_shuffle(spark, shuffle_partitions):
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError("attribution stream drain did not finish in 300s")
    return spark.table(name)


def drain_attribution_join(
    spark,
    clicks_path: str,
    purchases_path: str,
    schema,
    checkpoint: str,
    **join_kwargs,
) -> DataFrame:
    """Run the attribution join over bounded parquet stream sources,
    drain with availableNow into a memory sink, return the result."""
    clicks = spark.readStream.schema(schema).parquet(clicks_path)
    purchases = spark.readStream.schema(schema).parquet(purchases_path)
    out = attribution_stream_join(clicks, purchases, **join_kwargs)
    q = (
        out.writeStream.format("memory")
        .queryName("attribution_join_drain")
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(120):
        q.stop()
        raise TimeoutError("attribution join drain did not finish in 120s")
    return spark.table("attribution_join_drain")
