"""Fixed, declared schemas enforced at the boundary (SURVEY §1.4).

Spark StructTypes for the four reference event streams and the
processed-event envelope; mirrors the reference's Pydantic data model
(/root/reference/data/schemas/events.py: BaseEvent :74-87, ClickEvent
:95-125, OrderEvent :133-177, InventoryCDCEvent :190-222,
ProcessedEvent :230-253, UserActivityEvent + TOPIC_SCHEMA_MAP
:260-265).

Design decision carried over: schemas are explicit, never inferred, so
bad records are caught at the entry point (``from_json`` yields null on
corrupt rows and the validation operators route them to quarantine,
not silently dropped).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _base_fields() -> list[StructField]:
    """Shared event envelope: event_id/event_type/timestamp/session/user."""
    return [
        StructField("event_id", StringType(), False),
        StructField("event_type", StringType(), False),
        StructField("timestamp", TimestampType(), False),
        StructField("session_id", StringType(), False),
        StructField("user_id", StringType(), True),  # null = anonymous
    ]


CLICK_SCHEMA = StructType(
    _base_fields()
    + [
        StructField("click_type", StringType(), False),
        StructField("page_url", StringType(), False),
        StructField("referrer_url", StringType(), True),
        StructField("product_id", StringType(), True),
        StructField("category", StringType(), True),
        StructField("search_query", StringType(), True),
        StructField("device_type", StringType(), False),
        StructField("browser", StringType(), True),
        StructField("country_code", StringType(), True),
        StructField("ip_address", StringType(), True),
        StructField("utm_source", StringType(), True),
        StructField("utm_medium", StringType(), True),
        StructField("utm_campaign", StringType(), True),
    ]
)

ORDER_ITEM_SCHEMA = StructType(
    [
        StructField("product_id", StringType(), False),
        StructField("product_name", StringType(), True),
        StructField("category", StringType(), True),
        StructField("quantity", IntegerType(), False),
        StructField("unit_price", DoubleType(), False),
        StructField("discount_pct", DoubleType(), True),
    ]
)

ORDER_SCHEMA = StructType(
    _base_fields()
    + [
        StructField("order_id", StringType(), False),
        StructField("order_status", StringType(), False),
        StructField("items", ArrayType(ORDER_ITEM_SCHEMA), False),
        StructField("total_amount", DoubleType(), False),
        StructField("currency", StringType(), True),
        StructField("shipping_country", StringType(), True),
        StructField("shipping_city", StringType(), True),
        StructField("payment_method", StringType(), True),
    ]
)

INVENTORY_IMAGE_SCHEMA = StructType(
    [
        StructField("product_id", StringType(), False),
        StructField("product_name", StringType(), True),
        StructField("sku", StringType(), True),
        StructField("stock_quantity", IntegerType(), True),
        StructField("reorder_level", IntegerType(), True),
        StructField("warehouse_id", StringType(), True),
        StructField("last_updated", TimestampType(), True),
    ]
)

INVENTORY_CDC_SCHEMA = StructType(
    _base_fields()
    + [
        StructField("operation", StringType(), False),
        StructField("table_name", StringType(), True),
        StructField("before", INVENTORY_IMAGE_SCHEMA, True),  # null iff INSERT
        StructField("after", INVENTORY_IMAGE_SCHEMA, True),  # null iff DELETE
        StructField("lsn", StringType(), True),
    ]
)

# Generic user-activity events (the reference maps a 4th topic to the
# click schema's base; we give it the envelope + free-form payload)
USER_ACTIVITY_SCHEMA = StructType(
    _base_fields()
    + [
        StructField("activity_type", StringType(), True),
        StructField("payload_json", StringType(), True),
    ]
)

PROCESSED_EVENT_SCHEMA = StructType(
    [
        StructField("event_id", StringType(), False),
        StructField("event_type", StringType(), False),
        StructField("timestamp", TimestampType(), False),
        StructField("user_id", StringType(), True),
        StructField("session_id", StringType(), False),
        StructField("processing_timestamp", TimestampType(), False),
        StructField("is_bot", BooleanType(), True),
        StructField("user_segment", StringType(), True),
        StructField("geo_region", StringType(), True),
        StructField("raw_payload", StringType(), True),  # original JSON
        StructField("has_missing_fields", BooleanType(), True),
        StructField("quality_score", DoubleType(), True),
    ]
)

# topic -> schema registry (events.py:260-265)
TOPIC_SCHEMA_MAP: dict[str, StructType] = {
    "ecommerce.user_clicks": CLICK_SCHEMA,
    "ecommerce.orders": ORDER_SCHEMA,
    "ecommerce.inventory_changes": INVENTORY_CDC_SCHEMA,
    "ecommerce.user_activity": USER_ACTIVITY_SCHEMA,
}
