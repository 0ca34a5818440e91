"""SparkSession factory with scale-appropriate defaults.

The engine targets large clusters (the design point is ~100 TB across ~1000
executors) but is tested on ``local[N]``. Every setting below is equally
valid on a real cluster:

  * AQE on — runtime partition coalescing, skew-join splitting, and
    dynamic broadcast-join selection replace hand-tuned shuffle counts.
  * Arrow on — any Pandas-UDF escape hatch moves data in columnar batches.
  * ``spark.sql.shuffle.partitions`` is only the *initial* value; AQE
    coalesces it down, so a high value is safe at scale and cheap locally.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "*")


def get_spark(app_name: str = "customer-segmentation-engine") -> SparkSession:
    """Create (or get) a SparkSession tuned for this engine.

    On a real cluster the ``master`` is supplied by the submitter; locally we
    default to ``local[$SPARK_GRAFT_CPUS]``.
    """
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(DEFAULT_SHUFFLE_PARTITIONS))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # events.ts is parquet TIMESTAMP(NANOS) which Spark has no native
        # type for; read as long nanos and convert in the table loader.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    if not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{DEFAULT_CPUS}]")
    return builder.getOrCreate()
