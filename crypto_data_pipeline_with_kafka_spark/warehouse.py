"""Warehouse layout: the 100-TB storage design the fixtures stand in
for (SURVEY §4 'Partition pruning' and the §7 scale stance).

The reference keeps one unpartitioned MySQL fact
(``datawarehouse/kline_dim_fact.sql``) and re-reads ALL of it every run.
The engine's layout: Parquet facts **partitioned by event date** (and by
symbol/interval for the kline-shaped tables), so

* time-range predicates prune partitions at planning time,
* the join-side of a dim filter prunes dynamically (DPP),
* incremental jobs touch only the affected date partitions,
* idempotent appends anti-join only the overlapping partitions.

At 100 TB with ~daily partitions this bounds every incremental run to
O(day) instead of O(history); partition count stays in the thousands
(healthy for the driver's file index). These writers are exercised by
tests on tmp dirs — the driver's fixture files themselves are read-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_events_warehouse(events: DataFrame, path: str) -> None:
    """Events fact partitioned by event date: `dt=YYYY-MM-DD/` dirs.
    Sort within partitions by (user_id, ts) so per-key scans are
    sequential and min/max column stats stay tight."""
    (
        events.withColumn("dt", F.date_format("ts", "yyyy-MM-dd"))
        .repartition("dt")
        .sortWithinPartitions("user_id", "ts")
        .write.mode("overwrite")
        .partitionBy("dt")
        .parquet(path)
    )


def read_events_range(
    spark: SparkSession, path: str, start_date: str, end_date: str
) -> DataFrame:
    """Time-range read: the `dt` predicate prunes partition directories
    before any file is opened (verify via PartitionFilters in explain)."""
    return spark.read.parquet(path).filter(
        (F.col("dt") >= start_date) & (F.col("dt") < end_date)
    )
