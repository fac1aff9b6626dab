"""Shared differential-test helper: run a Spark query and its DuckDB
oracle on the same parquet tables and compare row count, column names,
and order-insensitive values (mirrors the driver's t2 check).
"""

from __future__ import annotations

import math
import os

import duckdb

from e_commerce_data_pipeline_spark.catalog import TABLES


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con.execute(sql).fetch_df()


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # bit-exact: the engine's fixed-point discipline should make
        # Spark and DuckDB produce identical doubles
        return repr(v)
    return v


def _norm_rows(cols, rows):
    out = []
    for row in rows:
        d = dict(zip(cols, row))
        out.append(tuple(_norm_cell(d[c]) for c in sorted(cols)))
    return sorted(out, key=repr)


def assert_matches_oracle(spark_df, sql: str, sf_dir: str, name: str = "query"):
    sdf = spark_df.toPandas()
    odf = run_oracle(sql, sf_dir)
    s_cols = sorted(sdf.columns)
    o_cols = sorted(odf.columns)
    assert s_cols == o_cols, f"{name}: columns {s_cols} != oracle {o_cols}"
    dtype_diff = {
        c: (str(sdf[c].dtype), str(odf[c].dtype))
        for c in s_cols
        if str(sdf[c].dtype) != str(odf[c].dtype)
    }
    assert not dtype_diff, f"{name}: dtype mismatches {dtype_diff}"
    assert len(sdf) == len(odf), f"{name}: rows {len(sdf)} != oracle {len(odf)}"
    s_rows = _norm_rows(list(sdf.columns), sdf.itertuples(index=False, name=None))
    o_rows = _norm_rows(list(odf.columns), odf.itertuples(index=False, name=None))
    mismatches = [
        (a, b) for a, b in zip(s_rows, o_rows) if a != b
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)}/{len(s_rows)} rows differ; "
        f"first: spark={mismatches[0][0]} oracle={mismatches[0][1]}"
    )
