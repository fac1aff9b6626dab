"""Snapshot reconciliation: bucket checksums localize, row phase
classifies; identical snapshots reconcile without reporting a row."""

from pyspark.sql import functions as F

from e_commerce_data_pipeline_spark.operators.reconcile import (
    bucket_checksums,
    anti_entropy_diff,
)


def _frame(spark, rows):
    return spark.createDataFrame(rows, "k long, status string, cents long")


def _sig_cols():
    return [F.col("status"), F.col("cents")]


def test_identical_snapshots_report_nothing(spark):
    a = _frame(spark, [(i, "OK", i * 100) for i in range(200)])
    out = anti_entropy_diff(a, a, "k", _sig_cols(), _sig_cols(), n_buckets=16)
    assert out.count() == 0
    # and the checksum phase itself already agrees bucket-for-bucket
    ca = {r.bucket: (r.n_rows, r.checksum) for r in bucket_checksums(a, "k", _sig_cols(), 16).collect()}
    cb = {r.bucket: (r.n_rows, r.checksum) for r in bucket_checksums(a, "k", _sig_cols(), 16).collect()}
    assert ca == cb


def test_diff_classifies_deleted_inserted_modified(spark):
    base = [(i, "OK", i * 100) for i in range(200)]
    a = _frame(spark, base + [(900, "OK", 1)])  # 900 only in a
    b_rows = [
        (k, ("CHANGED" if k in (7, 13) else s), c) for k, s, c in base
        if k != 55  # 55 deleted from b
    ] + [(901, "OK", 2)]  # 901 only in b
    b = _frame(spark, b_rows)
    got = {
        (r.k, r.status)
        for r in anti_entropy_diff(a, b, "k", _sig_cols(), _sig_cols(), 16).collect()
    }
    assert got == {
        (900, "deleted"),
        (55, "deleted"),
        (901, "inserted"),
        (7, "modified"),
        (13, "modified"),
    }


def test_null_vs_value_is_a_modification(spark):
    a = _frame(spark, [(1, "OK", 5), (2, "OK", 5)])
    b = _frame(spark, [(1, None, 5), (2, "OK", 5)])
    got = {(r.k, r.status) for r in anti_entropy_diff(a, b, "k", _sig_cols(), _sig_cols(), 8).collect()}
    assert got == {(1, "modified")}
