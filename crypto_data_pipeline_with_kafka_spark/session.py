"""SparkSession factory.

The reference hand-tunes ``spark.sql.shuffle.partitions=8`` and relies on
defaults otherwise (reference ``dags/spark_job_1.py:13-14``). Here: AQE on
(runtime shuffle coalescing + skew-join splitting supersede hand tuning),
UTC session timezone (the reference's epoch-ms -> datetime conversion at
``dags/consumer_prices.py:76-78`` is local-TZ; we pin UTC for determinism
and oracle parity), and Arrow enabled for the Pandas-UDF slow path.

At 100 TB these same settings hold: AQE picks post-shuffle partition
counts from runtime statistics, so the config does not need retuning per
scale factor; only ``spark.sql.shuffle.partitions`` (the pre-AQE upper
bound) should rise with cluster size.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "crypto_data_pipeline_with_kafka_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    ``SPARK_GRAFT_CPUS`` (driver contract) sets local parallelism;
    shuffle partitions default to that so local runs don't over-schedule
    tiny tasks, while AQE coalesces further at runtime.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    # Config-gated connector transports: this container ships neither
    # spark-sql-kafka jars nor a MySQL JDBC driver jar, so those surfaces
    # are plan-level by default. An environment that CAN provide them sets
    #   SPARK_KAFKA_PACKAGE=org.apache.spark:spark-sql-kafka-0-10_2.13:4.1.0
    #   SPARK_JDBC_PACKAGE=com.mysql:mysql-connector-j:9.3.0
    # (maven coordinates, resolved over the network) and/or
    #   SPARK_JDBC_JARS=/path/to/driver.jar[,...]
    # (already-downloaded jar files — no network needed; how the test
    # suite attests the live JDBC transport against a DuckDB database
    # file when a duckdb_jdbc jar is present on disk), plus
    # SPARK_KAFKA_BOOTSTRAP / SPARK_JDBC_URL for the live round-trip
    # tests in tests/test_connectors.py.
    pkgs = ",".join(
        p
        for p in (
            os.environ.get("SPARK_KAFKA_PACKAGE"),
            os.environ.get("SPARK_JDBC_PACKAGE"),
        )
        if p
    )
    local_jars = os.environ.get("SPARK_JDBC_JARS", "")

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Allow shuffled-hash joins where the planner's own size
        # conditions prove a build side fits (r15, optimization guide
        # §3.1: hash beats sort-merge when one side is moderately
        # small per partition; unknown-stat sides still plan
        # sort-merge, so the spill-safe fallback is untouched).
        # Measured on the dedup family's big self-joins at sf0.1:
        # minhash 3.51→3.07 s, simhash 4.06→3.73 s, ngram neutral
        # (interleaved A/B, same JVM). Scale posture: the gate is the
        # planner's per-partition size estimate, which scales with the
        # data — not a local constant.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    if pkgs:
        builder = builder.config("spark.jars.packages", pkgs)
    if local_jars:
        builder = builder.config("spark.jars", local_jars)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
