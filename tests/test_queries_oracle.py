"""Differential test: every oracle-paired query in the suite must match
DuckDB on sf0.001 (the driver runs the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from e_commerce_data_pipeline_spark.plans.queries import QUERIES

from .oracle_diff import assert_matches_oracle

ORACLE_QUERIES = [n for n, s in QUERIES.items() if s.oracle is not None]


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, sf_dir, name):
    spec = QUERIES[name]
    df = spec.fn(spark, sf_dir)
    assert_matches_oracle(df, spec.oracle, sf_dir, name)


def test_entry_smoke(spark):
    from __spark_entry__ import entry

    df = entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert "revenue" in df.columns


def test_q92_zero_variance_brand_yields_null_not_task_kill(spark, tmp_path):
    """Round-16 q162-class guard: a brand with a single lineitem row
    has n*sxx - sx^2 = 0, and ANSI Spark raises DIVIDE_BY_ZERO even
    on DOUBLE 0/0 — the guarded q92 must instead emit corr_micro
    NULL for that brand, still match the nullif-mirrored oracle, and
    leave every healthy brand's value untouched."""
    import os
    import shutil

    import duckdb

    from e_commerce_data_pipeline_spark.catalog import TABLES

    src = "/root/testdata/sf0.001"
    sf = str(tmp_path / "degenerate")
    os.makedirs(sf)
    for t in TABLES:
        shutil.copy(os.path.join(src, f"{t}.parquet"), sf)
    con = duckdb.connect()
    # give one partkey a unique brand and keep exactly ONE lineitem
    # row for it -> that brand's variance terms are exactly zero
    pk = con.execute(
        f"SELECT l_partkey FROM '{src}/lineitem.parquet' "
        "GROUP BY l_partkey ORDER BY COUNT(*) DESC, l_partkey LIMIT 1"
    ).fetchone()[0]
    con.execute(
        f"""COPY (SELECT * REPLACE (
                CASE WHEN p_partkey = {pk} THEN 'Brand#ZZ' ELSE p_brand
                END AS p_brand)
            FROM '{src}/part.parquet')
            TO '{sf}/part.parquet' (FORMAT PARQUET)"""
    )
    con.execute(
        f"""COPY (
            SELECT * FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY l_partkey ORDER BY l_orderkey, l_linenumber
                ) AS __rn
                FROM '{src}/lineitem.parquet')
            WHERE l_partkey <> {pk} OR __rn = 1)
            TO '{sf}/__li.parquet' (FORMAT PARQUET)"""
    )
    con.execute(
        f"""COPY (SELECT * EXCLUDE (__rn) FROM '{sf}/__li.parquet')
            TO '{sf}/lineitem.parquet' (FORMAT PARQUET)"""
    )
    os.remove(f"{sf}/__li.parquet")
    con.close()
    spec = QUERIES["q92_brand_price_qty_corr"]
    df = spec.fn(spark, sf)
    rows = {r.p_brand: r for r in df.collect()}
    assert rows["Brand#ZZ"].n == 1
    assert rows["Brand#ZZ"].corr_micro is None
    assert any(
        r.corr_micro is not None for b, r in rows.items() if b != "Brand#ZZ"
    )
    assert_matches_oracle(df, spec.oracle, sf, "q92-degenerate")


def test_ordered_part_pairs_equals_self_join(spark, sf_dir):
    """Round-16 restructure guard: the one-shuffle per-order part-set
    expansion (_order_part_sets + _ordered_part_pairs, now behind
    q84/q93/q138/q145) must emit exactly the multiset of (a < b)
    co-occurrence rows the old distinct + self-join build produced —
    per-pair counts included, since q84/q145 aggregate counts off it."""
    from collections import Counter

    from pyspark.sql import functions as F

    from e_commerce_data_pipeline_spark.plans.queries import (
        _order_part_sets,
        _ordered_part_pairs,
    )

    new_rows = Counter(
        (r["part_a"], r["part_b"])
        for r in _ordered_part_pairs(_order_part_sets(spark, sf_dir)).collect()
    )
    from e_commerce_data_pipeline_spark.catalog import load_table

    lp = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = lp.select(F.col("l_orderkey"), F.col("l_partkey").alias("part_a"))
    b = lp.select(F.col("l_orderkey"), F.col("l_partkey").alias("part_b"))
    old_rows = Counter(
        (r["part_a"], r["part_b"])
        for r in a.join(b, "l_orderkey")
        .filter(F.col("part_a") < F.col("part_b"))
        .select("part_a", "part_b")
        .collect()
    )
    assert new_rows and new_rows == old_rows
