"""Storage-layout operators: multi-dimensional clustering for data
skipping (z-order / Morton keys) — the lakehouse `OPTIMIZE ZORDER BY`
capability, built from plain Catalyst bit expressions.

Why it matters at 100 TB: parquet zone maps (per-file/rowgroup
min-max) prune a scan only on columns the layout is sorted by. A
1-D sort gives perfect pruning on one column and none on the others;
interleaving the bits of k quantized columns into one sort key gives
each of the k columns ~1/k of its bits of pruning power — the right
trade for star-schema fact tables probed by several independent
dimensions. The key computation is a pure expression tree (shift /
and / or terms, whole-stage-codegen'd, no UDF), so clustering cost is
the one range-repartition shuffle the rewrite needs anyway.

No reference counterpart (the reference has no storage layout logic
at all); semantics follow the publicly documented Delta/Iceberg
OPTIMIZE ZORDER behavior and the classic Morton encoding.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: list[Column | str], bits: int = 16) -> Column:
    """Morton/z-order key: interleave the low ``bits`` bits of each
    column (column i contributes bit b to output position b*k + i).

    Inputs must be non-negative ints; callers quantize first (mask,
    ``quantize_minmax``, or a natural small domain). The result fits
    a long when ``bits * len(cols) <= 63``. Pure codegen expression —
    ``bits * k`` shift/and/or terms, no shuffle, no Python."""
    k = len(cols)
    if bits * k > 63:
        raise ValueError(f"bits*cols = {bits * k} exceeds long range")
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    terms = [
        F.shiftleft(
            F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1)), b * k + i
        )
        for b in range(bits)
        for i, c in enumerate(cs)
    ]
    return reduce(lambda a, t: a.bitwiseOR(t), terms)


def zorder_key_sql(cols: list[str], bits: int = 16) -> str:
    """The identical key as an ANSI-SQL expression string (DuckDB /
    any engine with integer shift operators) — used by oracle queries
    and handy for pushing the same layout into another system."""
    k = len(cols)
    terms = [
        f"((({c}) >> {b} & 1) << {b * k + i})"
        for b in range(bits)
        for i, c in enumerate(cols)
    ]
    return "(" + " | ".join(terms) + ")"


def quantize_minmax_sql(
    x: str, lo, hi, bits: int, idiv: str = "DIV"
) -> str:
    """Declared-bounds quantizer as a SQL fragment: map an INTEGER
    expression in [lo, hi] onto the grid [0, 2^bits - 1], clamped.
    Pure integer arithmetic — (x-lo)*top INTEGER-DIV (hi-lo) — per the
    house rule (integer DIV, never floor(double/): a double ratio that
    rounds up across an integer boundary would diverge engines on
    large counts). ``idiv`` is the dialect's integer-division operator:
    "DIV" for Spark SQL, "//" for DuckDB. Use inside F.expr() on the
    Spark side so BOTH engines evaluate the same tree; fixed-point-
    quantize float columns before calling."""
    top = (1 << bits) - 1
    return (
        f"greatest(0, least({top}, "
        f"(({x} - ({lo})) * {top}) {idiv} (({hi}) - ({lo}))))"
    )


def zorder_repartition(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    num_files: int = 32,
) -> DataFrame:
    """Cluster ``df`` for multi-dim data skipping: compute the z-key,
    range-repartition on it (one shuffle — AQE-balanced quantile
    ranges), and sort within partitions so parquet rowgroup min-max
    stats are tight on EVERY participating column. Write the result
    with any sink; the layout travels with the rows."""
    key = zorder_key(cols, bits).alias("__zkey")
    return (
        df.withColumn("__zkey", key)
        .repartitionByRange(num_files, F.col("__zkey"))
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
    )
