"""Sessionization (SURVEY W1-W3): the reference's 10-minute-inactivity
session semantics (/root/reference/kafka/producer/event_producer.py:90-95)
as batch gap-and-island windows and as a streaming session_window.

Batch path: two windows over (user, time) — a lag to flag gaps, a
running sum to number sessions. One shuffle on the user key; state per
partition is one row. The same frame also yields funnel/cart analytics
(collect_list per session, W3 analog).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import epoch_us

GAP_US_DEFAULT = 600_000_000  # 10 minutes


def assign_sessions(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_us: int = GAP_US_DEFAULT,
) -> DataFrame:
    """Add ``session_no`` (1-based per user) via gap-and-island windows."""
    us = epoch_us(ts_col)
    w = Window.partitionBy(user_col).orderBy(us, id_col)
    new_s = F.when(us - F.lag(us).over(w) <= gap_us, F.lit(0)).otherwise(F.lit(1))
    return df.withColumn(
        "session_no",
        F.sum(new_s)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"),
    )


def session_stats(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_us: int = GAP_US_DEFAULT,
) -> DataFrame:
    """Per-session rollup: start, end, event count, duration seconds."""
    s = assign_sessions(df, user_col, ts_col, id_col, gap_us)
    us = epoch_us(ts_col)
    return s.groupBy(user_col, "session_no").agg(
        F.timestamp_micros(F.min(us)).alias("session_start"),
        F.timestamp_micros(F.max(us)).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        ((F.max(us) - F.min(us)) / F.lit(1_000_000.0)).alias("duration_s"),
    )


def session_event_sequences(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    gap_us: int = GAP_US_DEFAULT,
) -> DataFrame:
    """W3 analog: ordered event-type sequence per session (the batch view
    of the generator's cart-accumulation state machine)."""
    s = assign_sessions(df, user_col, ts_col, id_col, gap_us)
    return s.groupBy(user_col, "session_no").agg(
        F.array_sort(
            F.collect_list(F.struct(epoch_us(ts_col).alias("us"), F.col(type_col)))
        ).alias("__seq")
    ).select(
        user_col,
        "session_no",
        F.expr(f"transform(__seq, x -> x.{type_col})").alias("event_sequence"),
    )


def drain_streaming_session_stats(
    spark,
    events_path: str,
    gap: str = "10 minutes",
    watermark: str = "30 minutes",
    shuffle_partitions: int | None = 8,
) -> DataFrame:
    """Run ``streaming_session_stats`` over a bounded parquet source
    (availableNow trigger) and return the drained result as a batch
    DataFrame — the harness that lets the driver diff the *streaming*
    session operator against a batch SQL oracle.

    The memory sink collects the final sessions to the driver, which is
    fine for a bounded drain at test scale; the production path is
    append-mode past the watermark into a parquet sink
    (W1/W6, streaming/stream_processor.py).
    """
    from ..catalog import load_table  # noqa: F401  (conf side effects)
    from ..session import configure_existing

    configure_existing(spark)  # nanosAsLong before schema inference
    batch = spark.read.parquet(events_path)
    # the file streaming source needs a directory: stream the parent dir
    # filtered down to this one file
    parent, fname = events_path.rsplit("/", 1)
    stream = (
        spark.readStream.schema(batch.schema)
        .option("pathGlobFilter", fname)
        .parquet(parent)
    )
    if dict(batch.dtypes).get("ts") == "bigint":
        # TIMESTAMP(NANOS) read as long ns -> µs (mirrors catalog.load_table)
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    sess = streaming_session_stats(
        stream, user_col="user_id", ts_col="ts", gap=gap, watermark=watermark
    )
    global _DRAIN_SEQ
    _DRAIN_SEQ += 1
    name = f"session_drain_{_DRAIN_SEQ}"
    from ..streaming.stream_processor import state_sized_shuffle

    with state_sized_shuffle(spark, shuffle_partitions):
        q = (
            sess.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
    if not q.awaitTermination(300):
        # proceeding would read a partially-populated memory sink and
        # surface as a confusing data mismatch instead of a timeout
        q.stop()
        raise TimeoutError("streaming session drain did not finish in 300s")
    return spark.table(name)


_DRAIN_SEQ = 0


def streaming_session_stats(
    stream_df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Structured Streaming session windows with watermarked state
    eviction (W1 + W6). Same 10-minute semantics as the batch path."""
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap), F.col(user_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            user_col,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )
