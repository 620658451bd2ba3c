"""SparkSession factory with scale-oriented defaults.

Defaults chosen for the 100 TB design point (and harmless locally):
AQE on (runtime re-planning, skew-join splitting, partition coalescing),
Arrow for every pandas interchange, and a shuffle-partition count that a
cluster deployment would override via ``SPARK_GRAFT_SHUFFLE_PARTITIONS``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "graph500-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    On a real cluster, ``master`` comes from spark-submit and the
    defaults here are safe; locally we default to ``local[N]`` with
    N from ``SPARK_GRAFT_CPUS`` (driver contract).
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
    # local mode runs driver + every executor thread in ONE JVM; Spark's
    # 1g default heap throttles 32-thread shuffles with GC pressure and
    # OOMs long iterative loops (accumulated checkpoint/broadcast
    # blocks). On a real cluster spark-submit overrides this.
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.driver.memory", driver_mem)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Iterative BFS truncates lineage with localCheckpoint; no HDFS dir needed.
        .config("spark.driver.maxResultSize", "4g")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
