"""SparkSession factory with scale-oriented defaults.

The reference enables AQE + partition coalescing + skew-join handling and Kryo
(apps/srvc-stats/src/main/scala/srvc-stats/MainHourly.scala:193-230). We keep
those and add the settings that matter on a real cluster:

- ``spark.sql.session.timeZone=UTC``: the reference stores ISO-8601 UTC
  strings; we use real TimestampType pinned to UTC so event-time windows are
  unambiguous.
- ``spark.sql.shuffle.partitions``: sized by env; on a 1000-executor cluster
  this should be ~2-3x total cores (AQE coalesces down), locally 32.
- Arrow enabled for the few pandas-interop paths (multimodal stubs).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "inde1-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession tuned for this engine.

    Local tests run ``local[$SPARK_GRAFT_CPUS]``; on a cluster the master is
    supplied by spark-submit and this factory only contributes conf.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
        )

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # AQE re-plans at runtime: coalesces tiny post-shuffle partitions and
        # splits skewed ones — essential at 100 TB where static partition
        # counts are always wrong somewhere.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Broadcast threshold: dimension tables (users/capacity/nation/region)
        # must broadcast, never shuffle the fact side.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
