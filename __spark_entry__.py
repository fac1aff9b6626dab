"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in ``e_commerce_data_pipeline_spark``; this file
only adapts the package registry to the driver contract.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from e_commerce_data_pipeline_spark.plans.queries import (  # noqa: E402
    QUERIES,
    entry_query,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return entry_query(spark, "/root/testdata/sf0.001")


def _with_cache_hygiene(fn):
    """Drop the PREVIOUS query's operator-internal caches before
    building the next plan. Several operators cache() self-join
    inputs (signatures, unit vectors, exploded shingles) and a
    sequential many-query session that never clears them runs the
    driver JVM out of heap eventually (measured: a default-1g bare
    session died at query ~145 of a full-registry sf0.1 sweep).
    Clearing between queries is safe — the prior query's result was
    already collected — and bounds cache residency to one query."""

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        try:
            spark.catalog.clearCache()
        except Exception:
            pass  # never let hygiene break a query build
        return fn(spark, sf_dir)

    return wrapped


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: _with_cache_hygiene(spec.fn) for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every oracle-expressible query."""
    return {
        name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None
    }
