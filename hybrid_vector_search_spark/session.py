"""SparkSession factory with scale-appropriate defaults.

Local testing runs on ``local[N]`` (single JVM); the configs below are the
ones that also matter on a 1000-executor cluster: AQE for runtime
re-planning (skew joins, partition coalescing), Arrow for the pandas-UDF
scoring path, UTC session time zone so results compare bit-for-bit against
the DuckDB oracle, and shuffle partitions sized to the parallelism at hand
rather than the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Local-mode knobs: the driver machine has 32 cores / 128 GiB.
_DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(
    app_name: str = "hybrid_vector_search_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's defaults.

    On a real cluster, callers pass ``master=None`` and submit via
    spark-submit; locally we default to ``local[$SPARK_GRAFT_CPUS]``.
    """
    master = master or f"local[{_DEFAULT_CPUS}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(_DEFAULT_CPUS) if master.startswith("local") else 200

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
