"""Time-window queries (SURVEY §2.9 ST5 extensions): tumbling-window
candle construction (the engine-side version of Binance's pre-bucketed
klines), gap sessionization, and RANGE (time-interval) frames.

All are single-shuffle window/groupBy plans keyed by (user, time) — the
layout that scales: at 100 TB the same plan partitions by key and
bucket with AQE sizing the shuffle."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from crypto_data_pipeline_with_kafka_spark.catalog import load_table
from crypto_data_pipeline_with_kafka_spark.plans.registry import register

_WTS = "PARTITION BY user_id ORDER BY ts, event_id"


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


@register(
    "win_tumbling_candles",
    f"""
    WITH b AS (
      SELECT user_id, time_bucket(INTERVAL '1 hour', ts) AS bucket_start,
             ts, event_id, value
      FROM events
    ), o AS (
      SELECT *,
        first_value(value) OVER (PARTITION BY user_id, bucket_start ORDER BY ts, event_id) AS open_v,
        last_value(value)  OVER (PARTITION BY user_id, bucket_start ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS close_v
      FROM b
    )
    SELECT user_id, bucket_start,
           max(open_v) AS open_v, max(value) AS high_v,
           min(value) AS low_v, max(close_v) AS close_v,
           CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS volume,
           CAST(count(*) AS BIGINT) AS n_trades
    FROM o
    GROUP BY user_id, bucket_start
    """,
    doc="ST5 extension: tumbling 1-hour OHLCV candle construction from a "
    "raw event stream — window(ts,'1 hour') + first/last over the bucket; "
    "the reference receives candles pre-bucketed from Binance "
    "(producer_prices.py:18), the engine can build them",
    tags=("window", "time"),
)
def win_tumbling_candles(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = (
        _events(spark, sf_dir)
        .withColumn("_w", F.window("ts", "1 hour"))
        .withColumn("bucket_start", F.col("_w.start"))
        .drop("_w")
    )
    wb = Window.partitionBy("user_id", "bucket_start").orderBy("ts", "event_id")
    wall = wb.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    o = e.withColumns(
        {"open_v": F.first("value").over(wb), "close_v": F.last("value").over(wall)}
    )
    return o.groupBy("user_id", "bucket_start").agg(
        F.max("open_v").alias("open_v"),
        F.max("value").alias("high_v"),
        F.min("value").alias("low_v"),
        F.max("close_v").alias("close_v"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("volume"),
        F.count(F.lit(1)).alias("n_trades"),
    )


@register(
    "win_sessionize",
    f"""
    WITH g AS (
      SELECT user_id, ts, event_id,
        CASE WHEN lag(ts) OVER ({_WTS}) IS NULL
               OR epoch_us(ts) - lag(epoch_us(ts)) OVER ({_WTS}) > 1800000000
             THEN 1 ELSE 0 END AS new_sess
      FROM events
    ), s AS (
      SELECT *, CAST(sum(new_sess) OVER ({_WTS}
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INTEGER) AS session_seq
      FROM g
    )
    SELECT user_id, session_seq,
           min(ts) AS session_start, max(ts) AS session_end,
           CAST(count(*) AS BIGINT) AS n_events
    FROM s GROUP BY user_id, session_seq
    """,
    doc="Sessionization (30-min gap): lag + cumulative-sum session ids — "
    "the batch twin of streaming session_window; one window sort per key",
    tags=("window", "time"),
)
def win_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, 0)
    g = _events(spark, sf_dir).withColumn(
        "new_sess",
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w) > 1800000000),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    s = g.withColumn("session_seq", F.sum("new_sess").over(wrun).cast("int"))
    return s.groupBy("user_id", "session_seq").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "win_range_frame",
    """
    SELECT user_id, event_id, ts,
           CAST(count(*) OVER w AS BIGINT) AS n_1h,
           CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sum_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
    doc="RANGE frame (trailing 1 wall-clock hour, vs the reference's "
    "14-ROW frame — SURVEY §2.5 notes ROWS-not-RANGE as a parity trap; "
    "here the engine exposes the RANGE variant too)",
    tags=("window", "time"),
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3600000000, 0)
    )
    return _events(spark, sf_dir).select(
        "user_id",
        "event_id",
        "ts",
        F.count(F.lit(1)).over(w).alias("n_1h"),
        F.sum(F.col("value").cast("decimal(18,6)")).over(w).cast("double").alias("sum_1h"),
    )
