"""Storage-layout operators (operators/layout.py): Morton-key
correctness vs a bit-twiddling reference, dialect parity of the SQL
fragment, and the actual point of z-ordering — per-partition span
tightness on BOTH dimensions after zorder_repartition."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from e_commerce_data_pipeline_spark.operators.layout import (
    zorder_key,
    zorder_key_sql,
    zorder_repartition,
)


def _morton_ref(vals: list[int], bits: int) -> int:
    z = 0
    for b in range(bits):
        for i, v in enumerate(vals):
            z |= ((v >> b) & 1) << (b * len(vals) + i)
    return z


def test_zorder_key_matches_reference(spark):
    pts = [(x, y) for x in (0, 1, 5, 170, 255) for y in (0, 3, 128, 255)]
    df = spark.createDataFrame(pts, "x int, y int")
    got = {
        (r.x, r.y): r.z
        for r in df.select(
            "x", "y", zorder_key(["x", "y"], 8).alias("z")
        ).collect()
    }
    for x, y in pts:
        assert got[(x, y)] == _morton_ref([x, y], 8), (x, y)


def test_zorder_sql_fragment_matches_spark(spark):
    # the literal fragment the oracle uses must agree with the Column
    # form bit-for-bit, in DuckDB
    frag = zorder_key_sql(["x", "y"], 8)
    rows = duckdb.sql(
        f"SELECT x, y, {frag} AS z FROM (SELECT r % 256 AS x,"
        " (r * 37) % 256 AS y FROM range(500) t(r))"
    ).fetchall()
    for x, y, z in rows:
        assert z == _morton_ref([x, y], 8)


def test_zorder_key_rejects_long_overflow(spark):
    import pytest

    with pytest.raises(ValueError):
        zorder_key(["a", "b", "c", "d"], 16)  # 64 bits > long


def test_zorder_repartition_tightens_both_dims(spark):
    # 64x64 grid of points; 16 target files. A 1-D sort on x gives
    # perfect x-spans but full-range y-spans; the z-layout must keep
    # the AVERAGE per-partition area well under the global area / a
    # linear-layout's area.
    n = 64
    pts = spark.range(n * n).select(
        (F.col("id") % n).cast("int").alias("x"),
        (F.col("id") / n).cast("int").alias("y"),
    )
    zed = zorder_repartition(pts, ["x", "y"], bits=6, num_files=16)
    spans = (
        zed.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(
            (F.max("x") - F.min("x") + 1).alias("sx"),
            (F.max("y") - F.min("y") + 1).alias("sy"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .collect()
    )
    assert sum(r.cnt for r in spans) == n * n
    nonempty = [r for r in spans if r.cnt > 0]
    avg_area = sum(r.sx * r.sy for r in nonempty) / len(nonempty)
    global_area = n * n
    # ideal 16-cell z-split of a square grid gives 16x16 cells (area
    # 256); range-boundary sampling is approximate, so just require
    # a clear win over any 1-D layout (which cannot beat area n*n/16
    # on x times FULL n on y => 4096... its area equals n*n/16 * 1?
    # no: a 1-D x-sort gives sx=4, sy=64 => area 256 too, but sy is
    # full-range; so assert BOTH dims tighten instead of area alone)
    assert avg_area < global_area / 8, avg_area
    avg_sx = sum(r.sx for r in nonempty) / len(nonempty)
    avg_sy = sum(r.sy for r in nonempty) / len(nonempty)
    # a 1-D sort leaves one dimension at (nearly) full range; the
    # z-layout must tighten BOTH well below half the domain
    assert avg_sx < n / 2 and avg_sy < n / 2, (avg_sx, avg_sy)


def test_rollup_merge_equals_direct(spark):
    from e_commerce_data_pipeline_spark.operators.rollup import (
        merge_rollup_states,
        rollup_state,
    )

    rows = [(k % 3, (k * 7) % 100) for k in range(500)]
    df = spark.createDataFrame(rows, "g int, v int")
    parts = [
        df.filter(F.col("v") % 3 == i) for i in range(3)
    ]  # uneven, some groups absent from some parts
    states = [
        rollup_state(p, ["g"], {"v": F.col("v")}) for p in parts
    ]
    merged = {
        r.g: r
        for r in merge_rollup_states(states, ["g"]).collect()
    }
    direct = {
        r.g: r
        for r in rollup_state(df, ["g"], {"v": F.col("v")}).collect()
    }
    assert merged.keys() == direct.keys()
    for g in direct:
        for c in ("n", "sum_v", "min_v", "max_v"):
            assert merged[g][c] == direct[g][c], (g, c)
