"""Source-format parity: parquet/CSV/JSONL round-trips are exact, and
corrupt text rows quarantine instead of crashing the scan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from e_commerce_data_pipeline_spark.catalog import load_table
from e_commerce_data_pipeline_spark.sources.formats import read_table, write_table


@pytest.mark.parametrize("fmt", ["parquet", "orc", "csv", "jsonl"])
def test_roundtrip_exact(spark, sf_dir, tmp_path, fmt):
    src = load_table(spark, sf_dir, "lineitem").limit(500).cache()
    path = str(tmp_path / f"li_{fmt}")
    write_table(src, path, fmt)
    back = read_table(spark, path, fmt, src.schema)
    assert back.schema == src.schema
    a = sorted(map(tuple, src.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b  # doubles/dates survive the text formats exactly


def test_corrupt_rows_quarantine_not_crash(spark, tmp_path):
    p = tmp_path / "rows.json"
    p.write_text(
        '{"n_nationkey": 1, "n_name": "FRANCE"}\n'
        "{broken json\n"
        '{"n_nationkey": 2, "n_name": "KENYA"}\n'
    )
    schema = "n_nationkey long, n_name string"
    from pyspark.sql.types import _parse_datatype_string

    st = _parse_datatype_string(schema)
    clean = read_table(spark, str(p), "jsonl", st)
    assert {r["n_name"] for r in clean.collect()} == {"FRANCE", "KENYA"}
    # Spark disallows querying only _corrupt_record from a raw text
    # scan; materialize first (the documented cache() contract)
    dlq = read_table(spark, str(p), "jsonl", st, keep_corrupt=True).cache()
    bad = dlq.filter(F.col("_corrupt_record").isNotNull())
    assert bad.count() == 1
    dlq.unpersist()


def test_unknown_format_fails_loudly(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "region")
    with pytest.raises(ValueError):
        write_table(src, str(tmp_path / "x"), "orc2")
    with pytest.raises(ValueError):
        read_table(spark, str(tmp_path / "x"), "avroish", src.schema)
