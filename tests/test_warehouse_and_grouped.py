"""Tests: quality-gated warehouse load (S9) and grouped-map cart
replay (U7/W3)."""

from __future__ import annotations

import os

from e_commerce_data_pipeline_spark.operators.grouped import cart_replay
from e_commerce_data_pipeline_spark.operators.quality import (
    expect_between,
    expect_not_null,
)
from e_commerce_data_pipeline_spark.sources.warehouse import (
    gated_load,
    jdbc_writer,
    parquet_writer,
)


def _df(spark, with_nulls: bool):
    rows = [(1, 10.0), (2, 20.0)] + ([(3, None)] if with_nulls else [(3, 30.0)])
    return spark.createDataFrame(rows, "id int, v double")


def test_gate_blocks_bad_load(spark, tmp_path):
    out = str(tmp_path / "wh")
    suite = [expect_not_null("v"), expect_between("v", 0, 100)]
    res = gated_load(_df(spark, with_nulls=True), suite, parquet_writer(out))
    assert not res.loaded and res.score == 0.5
    assert not os.path.exists(out)  # nothing written below threshold


def test_gate_allows_good_load(spark, tmp_path):
    out = str(tmp_path / "wh")
    suite = [expect_not_null("v"), expect_between("v", 0, 100)]
    res = gated_load(_df(spark, with_nulls=False), suite, parquet_writer(out))
    assert res.loaded and res.score == 1.0
    assert spark.read.parquet(out).count() == 3
    assert res.report["n_null_v"] == 0


def test_jdbc_writer_constructs(spark):
    # no database in this environment: the factory must build without
    # connecting; invoking it would connect and fail, so don't.
    w = jdbc_writer("jdbc:postgresql://h/db", "gold.revenue", user="u")
    assert callable(w)


def test_cart_replay_state_machine(spark):
    rows = [
        # session s1: add A, add B, remove A, order -> cleared
        ("s1", "2024-01-01 00:00:00", "add_to_cart", "A"),
        ("s1", "2024-01-01 00:01:00", "add_to_cart", "B"),
        ("s1", "2024-01-01 00:02:00", "remove_from_cart", "A"),
        ("s1", "2024-01-01 00:03:00", "order", None),
        # session s2: add C, never orders -> abandoned
        ("s2", "2024-01-01 00:00:00", "add_to_cart", "C"),
        ("s2", "2024-01-01 00:05:00", "page_view", None),
    ]
    df = spark.createDataFrame(
        rows, "session_id string, timestamp string, event_kind string, product_id string"
    )
    res = {r["session_id"]: r for r in cart_replay(df).collect()}
    s1 = res["s1"]
    assert (s1["n_adds"], s1["n_removes"], s1["n_orders"]) == (2, 1, 1)
    assert s1["max_cart_size"] == 2 and s1["final_cart_size"] == 0
    assert not s1["abandoned"]
    s2 = res["s2"]
    assert s2["abandoned"] and s2["final_cart_size"] == 1
