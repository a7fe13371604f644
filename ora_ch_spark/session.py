"""SparkSession factory tuned for the engine.

Local-mode defaults mirror what we would set on a real cluster:
AQE on (runtime re-planning, skew-join splitting, partition
coalescing), shuffle partitions sized to cores (locally) — on a
1000-executor cluster this would be ``max(2 * total_cores, input_TB *
1024)`` and AQE coalesces down; Arrow enabled for any pandas-UDF
boundary; UTC session timezone so timestamp semantics match the
DuckDB differential oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _cpus() -> int:
    try:
        return max(2, int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    except ValueError:
        return 32


def get_spark(
    app_name: str = "ora_ch_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    In local mode one JVM hosts everything; ``spark.driver.memory`` is
    the only memory knob. On a cluster the same confs apply per
    executor and the master URL changes — nothing else in the engine
    assumes local mode.
    """
    n = cpus or _cpus()
    shuffle = shuffle_partitions or n
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{n}]")
        # ---- shuffle & adaptivity (scale-critical) ----
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # broadcast all dims comfortably below this (runtime-size based
        # with AQE); 64m is safe for 128 GiB driver, still sane per
        # executor on a cluster
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # ---- python boundary ----
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # ---- determinism for the differential oracle ----
        .config("spark.sql.session.timeZone", "UTC")
        # ---- io ----
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        # FAIR scheduling: parallel table loads (P1) interleave stages
        # instead of FIFO-queueing behind each other
        .config("spark.scheduler.mode", "FAIR")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
