"""Streaming gold upsert: totals after N micro-batch merges must equal
the batch aggregation over all events."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from e_commerce_data_pipeline_spark.streaming.gold_stream import (
    gold_revenue_stream_query,
)


def _order(i, ts, qty, price, cat="Electronics", disc=0.0):
    return json.dumps(
        {
            "event_id": f"ord-{i}",
            "event_type": "order",
            "timestamp": ts,
            "session_id": f"s{i}",
            "user_id": f"u{i}",
            "order_id": f"o{i}",
            "order_status": "confirmed",
            "items": [
                {
                    "product_id": "P1",
                    "product_name": "x",
                    "category": cat,
                    "quantity": qty,
                    "unit_price": price,
                    "discount_pct": disc,
                }
            ],
            "total_amount": qty * price * (1 - disc / 100),
        }
    )


def _run(spark, src, gold, ckpt):
    raw = (
        spark.readStream.format("text")
        .load(str(src))
        .select(
            F.lit("ecommerce.orders").alias("topic"),
            F.col("value"),
            F.current_timestamp().alias("kafka_ts"),
        )
    )
    q = gold_revenue_stream_query(spark, raw, str(gold), str(ckpt), available_now=True)
    q.awaitTermination(120)


def test_streaming_gold_merges_across_batches(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    gold = tmp_path / "gold_revenue"
    ckpt = tmp_path / "ck"

    (src / "b1.txt").write_text(
        "\n".join(
            [
                _order(1, "2024-01-01 10:00:00", 2, 10.0),           # 20.00
                _order(2, "2024-01-01 11:00:00", 1, 50.0, "Kitchen"),  # 50.00
            ]
        )
    )
    _run(spark, src, gold, ckpt)
    g1 = {
        (str(r["event_date"]), r["category"]): (r["revenue"], r["units"])
        for r in spark.read.parquet(str(gold)).collect()
    }
    assert g1[("2024-01-01", "Electronics")] == (20.0, 2)
    assert g1[("2024-01-01", "Kitchen")] == (50.0, 1)

    # second run, same checkpoint: merge, don't overwrite
    (src / "b2.txt").write_text(
        "\n".join(
            [
                _order(3, "2024-01-01 12:00:00", 1, 5.0),            # +5 Electronics
                _order(4, "2024-01-02 09:00:00", 4, 2.5, "Kitchen"), # new day
            ]
        )
    )
    _run(spark, src, gold, ckpt)
    g2 = {
        (str(r["event_date"]), r["category"]): (r["revenue"], r["units"])
        for r in spark.read.parquet(str(gold)).collect()
    }
    assert g2[("2024-01-01", "Electronics")] == (25.0, 3)
    assert g2[("2024-01-01", "Kitchen")] == (50.0, 1)
    assert g2[("2024-01-02", "Kitchen")] == (10.0, 4)


def test_gold_merge_replay_is_idempotent(spark, tmp_path):
    """At-least-once replay: re-merging an already-applied batch_id is
    a no-op, and crash recovery restores the table from .old."""
    import os
    import json as _json

    from e_commerce_data_pipeline_spark.streaming.gold_stream import (
        merge_gold_revenue,
    )

    gold = str(tmp_path / "gold")
    batch = spark.read.json(
        spark.sparkContext.parallelize(
            [_order(1, "2024-01-01 10:00:00", 2, 10.0)]
        )
    ).withColumn("timestamp", F.col("timestamp").cast("timestamp"))

    merge_gold_revenue(batch, gold, batch_id=0)
    first = spark.read.parquet(gold).collect()
    assert [(r["revenue"], r["units"]) for r in first] == [(20.0, 2)]

    # replayed batch 0: must not double-count
    merge_gold_revenue(batch, gold, batch_id=0)
    again = spark.read.parquet(gold).collect()
    assert [(r["revenue"], r["units"]) for r in again] == [(20.0, 2)]

    # new batch id merges
    merge_gold_revenue(batch, gold, batch_id=1)
    assert [
        (r["revenue"], r["units"]) for r in spark.read.parquet(gold).collect()
    ] == [(40.0, 4)]

    # crash between the two swap renames: live dir gone, data in .old
    os.rename(gold, gold + ".old")
    merge_gold_revenue(batch, gold, batch_id=1)  # replay -> repair + skip
    assert [
        (r["revenue"], r["units"]) for r in spark.read.parquet(gold).collect()
    ] == [(40.0, 4)]


def test_silver_stream_replay_overwrites_not_appends(spark, tmp_path):
    """A replayed micro-batch (fresh checkpoint, same sink) rewrites its
    __batch_id partitions instead of appending duplicates."""
    from e_commerce_data_pipeline_spark.streaming.stream_processor import (
        read_event_stream,
        silver_stream_query,
    )

    src = tmp_path / "in"
    src.mkdir()
    (src / "b.txt").write_text(
        "\n".join(
            json.dumps(
                {
                    "event_id": f"c{i}",
                    "event_type": "user_click",
                    "timestamp": "2024-01-01 05:00:00",
                    "session_id": f"s{i}",
                    "user_id": f"u{i}",
                    "click_type": "page_view",
                    "page_url": "https://x.example/p",
                    "device_type": "mobile",
                    "product_id": "P1",
                    "category": "Electronics",
                }
            )
            for i in range(8)
        )
    )
    out = str(tmp_path / "silver")
    for ck in ("ck_a", "ck_b"):  # second run = full replay of batch 0
        raw = read_event_stream(spark, source="file", file_path=str(src))
        q = silver_stream_query(
            spark, raw, "ecommerce.user_clicks", out, str(tmp_path / ck),
            available_now=True,
        )
        q.awaitTermination(120)
    silver = spark.read.parquet(out)
    assert silver.count() == 8
    assert silver.select("event_id").distinct().count() == 8
