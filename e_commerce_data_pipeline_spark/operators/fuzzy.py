"""Fuzzy string matching / entity resolution over catalog-style
columns (names, titles, SKUs).

The scale discipline mirrors the dedup family: NEVER levenshtein the
raw table against itself. Edit distance is quadratic per comparison
and the self-join would be quadratic in rows; instead

1. **distinct first** — catalog columns are massively repeated
   (millions of rows, thousands of distinct names), so the pair
   search runs on the distinct value set;
2. **block, then compare** — candidate pairs must share a cheap block
   key (default: the last whitespace token, the head noun of a
   product name). The join is an equi-join on the block key, so the
   comparison count is sum(block^2) over distinct values, never
   corpus^2;
3. edit-distance filter runs JVM-side (``F.levenshtein``, codegen) on
   the blocked candidates only.

Rows map back to resolved pairs by joining on the name value — an
equi-join against the (tiny, broadcastable) pair frame.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def last_token(col) -> Column:
    """Default block key: the final whitespace token (head noun)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.element_at(F.split(c, r"\s+"), -1)


def fuzzy_name_pairs(
    df: DataFrame,
    name_col: str,
    max_distance: int = 2,
    block: Column | None = None,
) -> DataFrame:
    """(name_a, name_b, distance) over the DISTINCT values of
    ``name_col``: pairs share a block key and sit within
    ``max_distance`` edits (name_a < name_b lexicographically).

    ``block`` overrides the blocking expression, evaluated against the
    distinct values exposed as column ``name`` (default ``last_token``
    of the name). Blocking trades recall for tractability exactly like
    LSH banding: a pair differing in the block key itself is never
    compared.
    """
    blk = block if block is not None else last_token("name")
    names = (
        df.select(F.col(name_col).alias("name"))
        .distinct()
        .select("name", blk.alias("__blk"))
    )
    a = names.select(F.col("name").alias("name_a"), "__blk")
    b = names.select(F.col("name").alias("name_b"), "__blk")
    return (
        a.join(b, "__blk")
        .filter(F.col("name_a") < F.col("name_b"))
        .withColumn(
            "distance", F.levenshtein("name_a", "name_b").cast("long")
        )
        .filter(F.col("distance") <= max_distance)
        .select("name_a", "name_b", "distance")
    )
