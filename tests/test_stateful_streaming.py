"""Stateful streaming cart operator: state must persist across separate
query runs through the checkpoint (durable session state)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql.types import (
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from e_commerce_data_pipeline_spark.streaming.stateful import streaming_cart_state

EVENT_SCHEMA = StructType(
    [
        StructField("session_id", StringType()),
        StructField("event_id", StringType()),
        StructField("timestamp", TimestampType()),
        StructField("event_kind", StringType()),
        StructField("product_id", StringType()),
    ]
)


def _evt(session, eid, ts, kind, product=None):
    return json.dumps(
        {
            "session_id": session,
            "event_id": eid,
            "timestamp": ts,
            "event_kind": kind,
            "product_id": product,
        }
    )


def _run_batch(spark, src_dir, ckpt, out_name):
    raw = spark.readStream.format("text").load(str(src_dir))
    parsed = raw.select(F.from_json("value", EVENT_SCHEMA).alias("p")).select("p.*")
    carts = streaming_cart_state(parsed)  # 10-min event-time expiry
    collected: dict = {}

    def sink(batch_df, batch_id):
        for r in batch_df.collect():
            collected[r["session_id"]] = r

    # foreachBatch: supports checkpoint recovery (memory sink does not)
    q = (
        carts.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return collected


def test_cart_state_survives_restart(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    ckpt = tmp_path / "ckpt"

    # batch 1: s1 adds two items, removes one
    (src / "b1.txt").write_text(
        "\n".join(
            [
                _evt("s1", "e1", "2024-01-01 00:00:00", "add_to_cart", "A"),
                _evt("s1", "e2", "2024-01-01 00:01:00", "add_to_cart", "B"),
                _evt("s1", "e3", "2024-01-01 00:02:00", "remove_from_cart", "A"),
            ]
        )
    )
    res1 = _run_batch(spark, src, ckpt, "carts_b1")
    assert res1["s1"]["cart_items"] == "B"
    assert res1["s1"]["n_adds"] == 2 and not res1["s1"]["finalized"]

    # batch 2 (separate query run, same checkpoint): the order clears
    # the cart ONLY if state survived the restart
    (src / "b2.txt").write_text(
        _evt("s1", "e4", "2024-01-01 00:03:00", "order")
    )
    res2 = _run_batch(spark, src, ckpt, "carts_b2")
    assert res2["s1"]["cart_size"] == 0
    assert res2["s1"]["n_adds"] == 2  # carried over, not recounted
    assert res2["s1"]["n_orders"] == 1


def test_session_finalizes_when_watermark_passes_timeout(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    ckpt = tmp_path / "ckpt"
    (src / "b1.txt").write_text(
        _evt("s1", "e1", "2024-01-01 00:00:00", "add_to_cart", "A")
    )
    res1 = _run_batch(spark, src, ckpt, "fin_b1")
    assert not res1["s1"]["finalized"]
    # an event far past s1's last activity pushes the watermark beyond
    # the 10-minute timeout -> s1 is finalized and evicted
    (src / "b2.txt").write_text(
        _evt("s2", "e2", "2024-01-01 01:00:00", "add_to_cart", "B")
    )
    res2 = _run_batch(spark, src, ckpt, "fin_b2")
    assert res2["s1"]["finalized"]
    assert res2["s1"]["cart_items"] == "A"
    assert not res2["s2"]["finalized"]
