"""Incremental rollup maintenance: algebraic aggregate STATE that
merges batch-over-batch without recomputing history — materialized-
view maintenance for append-mostly fact tables.

At 100 TB you never re-aggregate the whole table to refresh a daily
rollup; you aggregate the new partition and MERGE. That works exactly
when every measure is algebraic (count/sum/min/max — and anything
derived from them downstream: avg, span). The state here keeps
fixed-point int64 sums (same cross-engine discipline as the query
suite), so merged results are bit-identical to a from-scratch
aggregation — which is also how the oracle checks it.

No reference counterpart (file:line n/a — the reference recomputes);
shape follows the standard partial-aggregation algebra Spark itself
uses map-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def rollup_state(
    df: DataFrame, keys: list[str], measures: dict[str, Column]
) -> DataFrame:
    """Aggregate ``df`` to one state row per key group.

    ``measures`` maps a name to an INTEGER-valued column expression
    (fixed-point-quantize floats first). State columns per measure m:
    ``sum_m`` / ``min_m`` / ``max_m`` (int64), plus one shared ``n``
    row count. One partial-agg shuffle on the rollup keys."""
    aggs = [F.count(F.lit(1)).alias("n")]
    for m, expr in measures.items():
        e = expr.cast("long")
        aggs += [
            F.sum(e).alias(f"sum_{m}"),
            F.min(e).alias(f"min_{m}"),
            F.max(e).alias(f"max_{m}"),
        ]
    return df.groupBy(*keys).agg(*aggs)


def merge_rollup_states(states: list[DataFrame], keys: list[str]) -> DataFrame:
    """Merge any number of state frames into one, as if the union of
    their inputs had been aggregated directly: sums and counts add,
    mins/maxes fold. Shuffles only state rows (|key groups|, not
    |input rows|) — the whole point of incremental maintenance."""
    assert states, "need at least one state"
    first = states[0]
    merged = first
    for s in states[1:]:
        merged = merged.unionByName(s)
    aggs = [F.sum("n").alias("n")]
    for c in first.columns:
        if c.startswith("sum_"):
            aggs.append(F.sum(c).alias(c))
        elif c.startswith("min_"):
            aggs.append(F.min(c).alias(c))
        elif c.startswith("max_"):
            aggs.append(F.max(c).alias(c))
    return merged.groupBy(*keys).agg(*aggs)
