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


@register(
    "win_gap_fill",
    """
    WITH b AS (
      SELECT user_id, time_bucket(INTERVAL '1 hour', ts) AS bucket, value,
             row_number() OVER (PARTITION BY user_id, time_bucket(INTERVAL '1 hour', ts)
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ),
    c AS (SELECT user_id, bucket, value AS close_v FROM b WHERE rn = 1),
    bounds AS (SELECT user_id, min(bucket) AS t0, max(bucket) AS t1 FROM c GROUP BY user_id),
    grid AS (
      SELECT user_id, unnest(generate_series(t0, t1, INTERVAL '1 hour')) AS bucket
      FROM bounds
    ),
    j AS (
      SELECT g.user_id, g.bucket, c.close_v
      FROM grid g LEFT JOIN c ON c.user_id = g.user_id AND c.bucket = g.bucket
    )
    SELECT user_id, bucket, close_v,
           last_value(close_v IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS close_filled,
           (close_v IS NULL) AS was_gap
    FROM j
    """,
    doc="Time-series gap fill / resample: hourly grid per key "
    "(sequence+explode), last-trade close per bucket, forward fill via "
    "last(ignorenulls) — the candle-continuity operation the reference "
    "can't do (it only stores what Binance sends); one window pass, "
    "grid generated without a shuffle",
    tags=("window", "time", "resample"),
)
def win_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir).withColumn("bucket", F.date_trunc("hour", "ts"))
    wlast = Window.partitionBy("user_id", "bucket").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    closes = (
        e.withColumn("rn", F.row_number().over(wlast))
        .filter(F.col("rn") == 1)
        .select("user_id", "bucket", F.col("value").alias("close_v"))
    )
    bounds = closes.groupBy("user_id").agg(
        F.min("bucket").alias("t0"), F.max("bucket").alias("t1")
    )
    grid = bounds.select(
        "user_id",
        F.explode(F.sequence("t0", "t1", F.expr("interval 1 hour"))).alias("bucket"),
    )
    j = grid.join(closes, ["user_id", "bucket"], "left")
    wff = (
        Window.partitionBy("user_id")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return j.select(
        "user_id",
        "bucket",
        "close_v",
        F.last("close_v", ignorenulls=True).over(wff).alias("close_filled"),
        F.col("close_v").isNull().alias("was_gap"),
    )
