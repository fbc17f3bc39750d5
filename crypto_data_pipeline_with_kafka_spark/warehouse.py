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


def compact_partitions(
    spark: SparkSession,
    path: str,
    partitions: list[str] | None = None,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_cols: tuple[str, ...] = (),
) -> dict[str, int]:
    """Small-file compaction for a ``dt=``-partitioned store — the
    maintenance job every streaming sink needs at scale: per-batch
    appends (foreachBatch idempotent writers, late-data rewrites)
    accrete many small files per partition, degrading scan throughput
    and file-index size. For each selected partition this rewrites the
    data as ``ceil(bytes / target_file_bytes)`` files (optionally
    re-sorted so min/max stats tighten again), atomically per
    partition via an overwrite of only that ``dt=`` directory.

    Idempotent and safe to re-run; compact ONLY partitions no writer
    can still append to (e.g. dates older than the watermark + late
    window) — the same contract real table formats attach to
    compaction. Returns {dt: files_written}.

    Scale shape: driver work is one directory listing per selected
    partition (file sizes come from the FS metadata, no data read on
    the driver); each partition rewrite is an independent distributed
    job touching exactly that partition's files — run it from a
    scheduled maintenance slot, partition-parallel if needed."""
    import math

    sc = spark.sparkContext
    hconf = sc._jsc.hadoopConfiguration()
    jpath = sc._jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(hconf)
    if partitions is None:
        partitions = sorted(
            st.getPath().getName().split("=", 1)[1]
            for st in fs.listStatus(jpath)
            if st.isDirectory() and st.getPath().getName().startswith("dt=")
        )
    written: dict[str, int] = {}
    for dt in partitions:
        pdir = sc._jvm.org.apache.hadoop.fs.Path(f"{path}/dt={dt}")
        if not fs.exists(pdir):
            continue
        files = [
            st for st in fs.listStatus(pdir) if not st.getPath().getName().startswith("_")
        ]
        total = sum(st.getLen() for st in files)
        n_out = max(1, math.ceil(total / target_file_bytes))
        if n_out >= len(files):
            continue  # already compact
        part = spark.read.parquet(f"{path}/dt={dt}").coalesce(n_out)
        if sort_cols:
            part = part.sortWithinPartitions(*sort_cols)
        # stage-then-swap: the overwrite targets ONLY this partition dir
        staged = f"{path}/.compact_dt={dt}"
        part.write.mode("overwrite").parquet(staged)
        fs.delete(pdir, True)
        fs.rename(sc._jvm.org.apache.hadoop.fs.Path(staged), pdir)
        written[dt] = n_out
    return written
