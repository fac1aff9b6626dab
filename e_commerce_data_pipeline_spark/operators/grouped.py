"""Grouped-map utilities (SURVEY U7, W3) — the Arrow-batched escape
hatch for semantics the built-in operators can't express.

- ``grouped_apply``: thin, typed wrapper over
  ``groupBy(...).applyInPandas`` (pattern: one pandas frame per group;
  group key columns included).
- ``cart_replay``: the reference producer's cart state machine
  (/root/reference/kafka/producer/event_producer.py:134-136,163-192)
  replayed per session: add_to_cart accumulates, remove_from_cart
  drops, order/checkout clears — an inherently sequential fold, the
  legitimate use of per-group Python.

Scale: applyInPandas shuffles by the group key once; each group must
fit in memory (sessions are tiny). Skewed giant groups would need
salting + two-phase merge — not applicable to sessions bounded by the
10-minute expiry.
"""

from __future__ import annotations

from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame


def grouped_apply(
    df: DataFrame,
    group_cols: list[str],
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    schema: str,
) -> DataFrame:
    return df.groupBy(*group_cols).applyInPandas(fn, schema)


CART_RESULT_SCHEMA = (
    "session_id string, n_adds int, n_removes int, n_orders int, "
    "max_cart_size int, final_cart_size int, abandoned boolean"
)


def cart_replay(clicks_and_orders: DataFrame) -> DataFrame:
    """Replay cart state per session from the interleaved event log.

    Input columns: session_id, timestamp, event_kind
    ('add_to_cart' | 'remove_from_cart' | 'order' | other), product_id.
    """

    def replay(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["timestamp", "event_kind"], kind="mergesort")
        cart: list = []
        n_adds = n_removes = n_orders = max_size = 0
        for kind, product in zip(pdf["event_kind"], pdf["product_id"]):
            if kind == "add_to_cart":
                cart.append(product)
                n_adds += 1
                max_size = max(max_size, len(cart))
            elif kind == "remove_from_cart":
                if product in cart:
                    cart.remove(product)
                n_removes += 1
            elif kind == "order":
                cart.clear()
                n_orders += 1
        return pd.DataFrame(
            [
                {
                    "session_id": pdf["session_id"].iloc[0],
                    "n_adds": n_adds,
                    "n_removes": n_removes,
                    "n_orders": n_orders,
                    "max_cart_size": max_size,
                    "final_cart_size": len(cart),
                    "abandoned": len(cart) > 0 and n_orders == 0,
                }
            ]
        )

    return grouped_apply(
        clicks_and_orders, ["session_id"], replay, CART_RESULT_SCHEMA
    )
