"""End-to-end pipeline tests: generator -> bronze -> silver -> gold,
CDC apply, sessionization, multimodal plumbing (SURVEY §5.2 item 3)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from e_commerce_data_pipeline_spark.operators.cdc import apply_cdc, lsn_sort_key, stock_asof_join
from e_commerce_data_pipeline_spark.operators.sessionize import (
    assign_sessions,
    session_event_sequences,
    session_stats,
)
from e_commerce_data_pipeline_spark.schemas.events import TOPIC_SCHEMA_MAP
from e_commerce_data_pipeline_spark.sources.bronze import (
    bronze_catalog_stats,
    read_bronze,
    with_time_partitions,
    write_bronze,
)
from e_commerce_data_pipeline_spark.sources.generator import (
    TOPIC_OF_TYPE,
    events_for_topic,
    generate_events,
)
from e_commerce_data_pipeline_spark.sources.medallion import (
    bronze_to_silver,
    run_medallion,
    silver_quarantine_split,
)


@pytest.fixture(scope="module")
def gen(spark):
    return generate_events(spark, n=3000).cache()


def test_generator_mix_and_determinism(spark, gen):
    mix = dict(gen.groupBy("event_type").count().collect())
    total = sum(mix.values())
    assert total == 3000
    assert abs(mix["user_click"] / total - 0.7) < 0.05
    assert abs(mix["order"] / total - 0.2) < 0.05
    assert abs(mix["inventory_cdc"] / total - 0.1) < 0.05
    # deterministic: regenerating yields identical rows
    again = generate_events(spark, n=3000)
    assert gen.exceptAll(again).count() == 0 and again.exceptAll(gen).count() == 0


def test_generator_order_reconciliation(spark, gen):
    orders = events_for_topic(gen, "ecommerce.orders")
    calc = F.expr(
        "aggregate(items, 0D, (acc, x) -> acc + x.quantity * x.unit_price * (1 - x.discount_pct/100))"
    )
    bad = orders.filter(F.abs(F.col("total_amount") - calc) > 0.01).count()
    assert bad == 0


def test_bronze_roundtrip(spark, gen, tmp_path):
    clicks = events_for_topic(gen, "ecommerce.user_clicks")
    path = str(tmp_path / "bronze" / "user_clicks")
    write_bronze(clicks, path, ts_col="timestamp")
    back = read_bronze(spark, path, clicks.schema)
    assert back.count() == clicks.count()
    # event-time partitioning, not arrival time: hours match the data
    hours = {r["hour"] for r in with_time_partitions(clicks, "timestamp").select("hour").distinct().collect()}
    import glob

    disk_hours = {
        int(p.rsplit("hour=", 1)[1].split("/")[0])
        for p in glob.glob(path + "/year=*/month=*/day=*/hour=*")
    }
    assert disk_hours == hours
    stats = bronze_catalog_stats(spark, path)
    srow = stats.agg(F.sum("file_count").alias("f"), F.sum("total_bytes").alias("b")).collect()[0]
    assert srow["f"] > 0 and srow["b"] > 0


def test_medallion_end_to_end(spark, gen, tmp_path):
    bronze = {t: events_for_topic(gen, t) for t in TOPIC_OF_TYPE.values()}
    gold = run_medallion(spark, bronze, str(tmp_path / "lake"))
    rev = gold["revenue_by_category_day"]
    assert rev.count() > 0
    assert rev.filter(F.col("revenue") < 0).count() == 0
    funnel = gold["funnel_conversion"]
    assert funnel.count() > 0
    # converted sessions must have at least one order
    assert funnel.filter(F.col("converted") & (F.col("n_orders") == 0)).count() == 0
    inv = gold["inventory_snapshot"]
    assert inv.count() > 0
    assert inv.filter(F.col("stock_quantity") < 0).count() == 0
    # snapshot has one row per product
    assert inv.groupBy("product_id").count().filter("count > 1").count() == 0


def test_silver_dedup_and_quarantine(spark, gen):
    clicks = events_for_topic(gen, "ecommerce.user_clicks")
    dup = clicks.union(clicks.limit(50))  # inject duplicates
    silver = bronze_to_silver(dup, "ecommerce.user_clicks")
    assert silver.count() == clicks.count()  # dedup by event_id
    valid, quarantined = silver_quarantine_split(silver)
    assert valid.count() + quarantined.count() == silver.count()


def test_lsn_ordering(spark):
    df = spark.createDataFrame(
        [("0/FF",), ("1/01",), ("0/0A",)], "lsn string"
    ).withColumn("k", lsn_sort_key("lsn"))
    ks = {r["lsn"]: r["k"] for r in df.collect()}
    # numeric order, not lexicographic: 0/0A < 0/FF < 1/01
    assert ks["0/0A"] < ks["0/FF"] < ks["1/01"]


def test_cdc_apply_semantics(spark):
    img = lambda p, s: {"product_id": p, "product_name": p, "sku": "s", "stock_quantity": s, "reorder_level": 1, "warehouse_id": "w", "last_updated": None}  # noqa: E731
    rows = [
        ("e1", "2024-01-01 00:00:00", "INSERT", None, img("P1", 10), "0/01"),
        ("e2", "2024-01-01 00:01:00", "UPDATE", img("P1", 10), img("P1", 7), "0/02"),
        ("e3", "2024-01-01 00:00:30", "INSERT", None, img("P2", 5), "0/03"),
        ("e4", "2024-01-01 00:02:00", "DELETE", img("P2", 5), None, "0/04"),
    ]
    schema = (
        "event_id string, ts_s string, operation string, "
        "before struct<product_id:string,product_name:string,sku:string,stock_quantity:int,reorder_level:int,warehouse_id:string,last_updated:timestamp>, "
        "after struct<product_id:string,product_name:string,sku:string,stock_quantity:int,reorder_level:int,warehouse_id:string,last_updated:timestamp>, "
        "lsn string"
    )
    df = spark.createDataFrame(rows, schema).withColumn(
        "timestamp", F.col("ts_s").cast("timestamp")
    )
    snap = {r["product_id"]: r["stock_quantity"] for r in apply_cdc(df).collect()}
    assert snap == {"P1": 7}  # P2 deleted; P1 at latest update


def test_stock_asof_join(spark):
    img = lambda p, s: {"product_id": p, "product_name": p, "sku": "s", "stock_quantity": s, "reorder_level": 1, "warehouse_id": "w", "last_updated": None}  # noqa: E731
    cdc = spark.createDataFrame(
        [
            ("c1", "2024-01-01 00:00:00", "INSERT", None, img("P1", 10), "0/01"),
            ("c2", "2024-01-01 01:00:00", "UPDATE", img("P1", 10), img("P1", 3), "0/02"),
        ],
        "event_id string, ts_s string, operation string, "
        "before struct<product_id:string,product_name:string,sku:string,stock_quantity:int,reorder_level:int,warehouse_id:string,last_updated:timestamp>, "
        "after struct<product_id:string,product_name:string,sku:string,stock_quantity:int,reorder_level:int,warehouse_id:string,last_updated:timestamp>, "
        "lsn string",
    ).withColumn("timestamp", F.col("ts_s").cast("timestamp"))
    orders = spark.createDataFrame(
        [
            ("o_before", "2024-01-01 00:30:00", [{"product_id": "P1"}]),
            ("o_after", "2024-01-01 02:00:00", [{"product_id": "P1"}]),
        ],
        "event_id string, ts_s string, items array<struct<product_id:string>>",
    ).withColumn("timestamp", F.col("ts_s").cast("timestamp"))
    res = {r["order_event_id"]: r["stock_at_time"] for r in stock_asof_join(orders, cdc).collect()}
    assert res == {"o_before": 10, "o_after": 3}


def test_sessionize_gap_rule(spark):
    rows = [
        ("u1", "2024-01-01 00:00:00", 1),
        ("u1", "2024-01-01 00:05:00", 2),   # same session (5 min)
        ("u1", "2024-01-01 00:15:00", 3),   # exactly 10 min -> same session
        ("u1", "2024-01-01 00:25:01", 4),   # 10:01 gap -> new session
        ("u2", "2024-01-01 00:00:00", 5),
    ]
    df = spark.createDataFrame(rows, "user_id string, ts_s string, event_id int").withColumn(
        "ts", F.col("ts_s").cast("timestamp")
    )
    s = assign_sessions(df)
    by_user = {(r["user_id"], r["event_id"]): r["session_no"] for r in s.collect()}
    assert by_user[("u1", 1)] == by_user[("u1", 2)] == by_user[("u1", 3)] == 1
    assert by_user[("u1", 4)] == 2
    assert by_user[("u2", 5)] == 1
    stats = session_stats(df)
    first = stats.filter((F.col("user_id") == "u1") & (F.col("session_no") == 1)).collect()[0]
    assert first["n_events"] == 3 and first["duration_s"] == 900.0


def test_session_sequences(spark):
    rows = [
        ("u1", "2024-01-01 00:00:00", 1, "view"),
        ("u1", "2024-01-01 00:01:00", 2, "cart"),
        ("u1", "2024-01-01 00:02:00", 3, "order"),
    ]
    df = spark.createDataFrame(
        rows, "user_id string, ts_s string, event_id int, event_type string"
    ).withColumn("ts", F.col("ts_s").cast("timestamp"))
    seq = session_event_sequences(df).collect()[0]
    assert seq["event_sequence"] == ["view", "cart", "order"]


def test_topic_schemas_parse_generated_json(spark, gen):
    """S3: every generated event round-trips through its topic schema."""
    for topic in TOPIC_OF_TYPE.values():
        typed = events_for_topic(gen, topic)
        as_json = typed.select(F.to_json(F.struct(*typed.columns)).alias("value"))
        parsed = as_json.select(
            F.from_json("value", TOPIC_SCHEMA_MAP[topic]).alias("p")
        ).select("p.*")
        assert parsed.filter(F.col("event_id").isNull()).count() == 0
        assert parsed.count() == typed.count()


def test_gap_and_island_equivalent_to_session_window(spark, gen):
    """The batch gap-and-island path and Spark's native session_window
    must agree — including at the exact-600s boundary, where both match
    the reference's strictly-greater-than expiry rule
    (event_producer.py:90-95): an event at exactly +600s stays
    in-session."""
    from pyspark.sql import functions as F2

    rows = [
        ("u1", "2024-01-01 00:00:00", 1),
        ("u1", "2024-01-01 00:10:00", 2),  # exactly 600s -> same session
        ("u1", "2024-01-01 00:20:01", 3),  # 601s -> new session
    ]
    df = spark.createDataFrame(rows, "user_id string, ts_s string, event_id int").withColumn(
        "ts", F2.col("ts_s").cast("timestamp")
    )
    ours = {r["event_id"]: r["session_no"] for r in assign_sessions(df).collect()}
    assert ours == {1: 1, 2: 1, 3: 2}
    sw = (
        df.groupBy(F2.session_window("ts", "10 minutes"), "user_id").count().count()
    )
    assert sw == 2  # session_window agrees: boundary-inclusive

    # equivalence on real data: same number of sessions per user
    e = events_for_topic(gen, "ecommerce.user_clicks").filter(F2.col("user_id").isNotNull())
    ours_n = (
        assign_sessions(e, user_col="user_id", ts_col="timestamp")
        .groupBy("user_id")
        .agg(F2.max("session_no").alias("n_ours"))
    )
    sw_n = (
        e.groupBy(F2.session_window("timestamp", "10 minutes"), "user_id")
        .count()
        .groupBy("user_id")
        .count()
        .withColumnRenamed("count", "n_sw")
    )
    diff = ours_n.join(sw_n, "user_id").filter(F2.col("n_ours") != F2.col("n_sw"))
    assert diff.count() == 0


def test_compact_partitions_reduces_files_preserving_rows(spark, gen, tmp_path):
    """OPTIMIZE-style small-file compaction (SURVEY §4.3): many small
    JSONL files per hour partition collapse to target_files_per_partition
    with identical rows and partition layout."""
    import glob

    from e_commerce_data_pipeline_spark.sources.bronze import compact_partitions

    clicks = events_for_topic(gen, "ecommerce.user_clicks")
    src = str(tmp_path / "bronze_small")
    # force a small-file problem: 8 writers per partition
    (
        with_time_partitions(clicks, "timestamp")
        .repartition(8)
        .write.option("compression", "gzip")
        .partitionBy("year", "month", "day", "hour")
        .json(src)
    )
    out = str(tmp_path / "bronze_compact")
    compact_partitions(spark, src, clicks.schema, out)

    def files_per_partition(root):
        counts = {}
        for f in glob.glob(root + "/year=*/month=*/day=*/hour=*/part-*"):
            part = f.rsplit("/", 1)[0].split(root + "/", 1)[1]
            counts[part] = counts.get(part, 0) + 1
        return counts

    before, after = files_per_partition(src), files_per_partition(out)
    assert set(before) == set(after)  # same partition layout
    assert sum(before.values()) > len(before)  # fixture had small files
    assert all(n == 1 for n in after.values())  # compacted to 1/partition
    # identical content
    a = read_bronze(spark, src, clicks.schema)
    b = read_bronze(spark, out, clicks.schema)
    assert a.count() == clicks.count()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
