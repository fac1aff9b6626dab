"""SparkSession construction tuned for the engine.

Design notes (100 TB posture):
- AQE on: runtime coalescing of shuffle partitions, skew-join splitting,
  and dynamic broadcast selection replace hand-tuned plans.
- ``spark.sql.shuffle.partitions`` defaults to the local core count here;
  on a real cluster it should be ~2-3x total executor cores (AQE coalesces
  down, it cannot split a too-small number except for skew).
- Arrow enabled so any pandas interchange (pandas_udf, toPandas) is
  columnar-batched instead of row-pickled.
- ``nanosAsLong`` because the events table carries TIMESTAMP(NANOS),
  which Spark has no native type for; :mod:`catalog` converts to
  microsecond timestamps (matching DuckDB's read behavior exactly).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Conf applied at build time AND re-applied (where dynamic) by
# `configure_existing` when the driver hands us a pre-built session.
_DYNAMIC_CONF = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # TIMESTAMP(MICROS, isAdjustedToUTC=false) parquet (the current
    # events table encoding) would otherwise read as TIMESTAMP_NTZ,
    # which watermarks/unix_micros reject; with NTZ inference off the
    # stored micros load as TIMESTAMP whose epoch equals what DuckDB
    # exposes (session tz is pinned to UTC below).
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # dims up to 32 MB get broadcast; region/nation/customer/part/supplier
    # are all far below this at every SF we target per-executor.
    "spark.sql.autoBroadcastJoinThreshold": str(32 * 1024 * 1024),
    "spark.sql.session.timeZone": "UTC",
    # InferFiltersFromGenerate synthesizes size(arr)>0/isnotnull
    # filters under every explode and PushDownPredicates then inlines
    # the full array-building expression into them (twice) — for
    # computed arrays (shingles, grams, chunk windows) that re-runs
    # the tokenizer per row per predicate BELOW the repartition
    # barrier: measured 50.8 s -> 1.4 s on winnowing and -26% on the
    # shingle join family at sf0.1. The rule only ever pays when the
    # generator input is a STORED column (pushable to the scan),
    # which no operator here generates from.
    "spark.sql.optimizer.excludedRules": (
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"
    ),
}


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(app_name: str = "e-commerce-pipeline-spark") -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults."""
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in _DYNAMIC_CONF.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    configure_existing(spark)
    return spark


def scale_conf(
    total_executor_cores: int = 4000,
    target_shuffle_partition_mb: int = 200,
    shuffle_tb: float = 20.0,
) -> dict[str, str]:
    """The 100-TB cluster config map, as reproducible settings rather
    than prose (PERF.md renders this table).

    Not applied in local mode — local[32] keeps the small defaults
    above. On a real cluster, pass these to spark-submit --conf or the
    session builder. Sizing rules:

    - shuffle.partitions: max(2-3x total cores, shuffle_bytes /
      ~200 MB) so a partition fits executor memory with headroom; AQE
      coalesces small ones but cannot split a too-coarse layout except
      at skew points.
    - maxPartitionBytes 256 MB: scan tasks big enough to amortize
      startup against 100k+ input files.
    - S3A: the magic committer makes task commits O(1) metadata ops
      (no rename storm); bounded retry with backoff mirrors the
      reference's adaptive retry (lake_writer.py:77-81).
    """
    by_size = int(shuffle_tb * 1024 * 1024 / target_shuffle_partition_mb)
    n_shuffle = max(3 * total_executor_cores, by_size)
    return {
        # --- shuffle & memory sizing ---
        "spark.sql.shuffle.partitions": str(n_shuffle),
        "spark.sql.files.maxPartitionBytes": str(256 * 1024 * 1024),
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": str(128 * 1024 * 1024),
        # --- joins ---
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "5",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": str(
            256 * 1024 * 1024
        ),
        # --- object-store writes (S3A committer; reference parity for
        #     lake_writer's retry/adaptive config) ---
        "spark.hadoop.fs.s3a.committer.name": "magic",
        "spark.hadoop.fs.s3a.committer.magic.enabled": "true",
        "spark.hadoop.fs.s3a.attempts.maximum": "10",
        "spark.hadoop.fs.s3a.retry.limit": "7",
        "spark.hadoop.fs.s3a.retry.interval": "500ms",
        "spark.hadoop.fs.s3a.connection.maximum": "200",
        "spark.hadoop.fs.s3a.fast.upload": "true",
        "spark.sql.parquet.output.committer.class": (
            "org.apache.spark.internal.io.cloud.BindingParquetOutputCommitter"
        ),
        "spark.sql.sources.commitProtocolClass": (
            "org.apache.spark.internal.io.cloud.PathOutputCommitProtocol"
        ),
        # --- elasticity ---
        "spark.dynamicAllocation.enabled": "true",
        "spark.dynamicAllocation.shuffleTracking.enabled": "true",
    }


def configure_existing(spark: SparkSession) -> SparkSession:
    """Apply the engine's dynamic SQL conf to an externally built session.

    The correctness driver constructs its own SparkSession and passes it
    in; every entry point routes through here so behavior is identical.
    """
    for k, v in _DYNAMIC_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # static conf on a live session - keep going, defaults are sane
            pass
    return spark
