"""Indicator queries (SURVEY §2.5 W1-W5, §2.7 U1, §2.3 J1/J2, §2.2 P3/P4).

The ``events`` fixture plays the kline fact: user_id ↔ symbol_id
(partition key), ts ↔ close_time (order key), value ↔ close_price
(measure); ``event_id`` is appended to the ORDER BY as the deterministic
tie-breaker the reference lacks (``dags/spark_job_1.py:25``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from crypto_data_pipeline_with_kafka_spark.catalog import load_table
from crypto_data_pipeline_with_kafka_spark.operators.indicators import (
    compute_indicators,
    indicator_pipeline,
    indicator_type_dim,
)
from crypto_data_pipeline_with_kafka_spark.plans.registry import register

# Shared DuckDB window text (ROWS frame, deterministic tie-break).
_W = "PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 13 PRECEDING AND CURRENT ROW"
_WO = "PARTITION BY user_id ORDER BY ts, event_id"

_FRAMED_CTE = f"""
WITH diffed AS (
  SELECT user_id, event_id, ts, value,
         value - lag(value) OVER ({_WO}) AS diff
  FROM events
), gained AS (
  SELECT *,
         CASE WHEN diff > 0 THEN diff ELSE 0.0 END AS gain,
         CASE WHEN diff < 0 THEN -diff ELSE 0.0 END AS loss
  FROM diffed
), framed AS (
  SELECT user_id, event_id, ts,
         avg(value) OVER w AS sma,
         avg(gain) OVER w AS avg_gain,
         avg(loss) OVER w AS avg_loss,
         stddev_samp(value) OVER w AS sd
  FROM gained
  WINDOW w AS ({_W})
), stacked AS (
  SELECT user_id, ts, 'SMA' AS type_name, sma AS ind_value FROM framed
  UNION ALL
  SELECT user_id, ts, 'RSI', 100 - (100 / (1 + (avg_gain / nullif(avg_loss, 0)))) FROM framed
  UNION ALL
  SELECT user_id, ts, 'BB_UP', sma + 2 * sd FROM framed
  UNION ALL
  SELECT user_id, ts, 'BB_DOWN', sma - 2 * sd FROM framed
)
"""


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


def _wspec():
    """(ordered window, 14-row trailing frame) — built lazily; pyspark 4
    needs an active session to construct Window specs."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return w, w.rowsBetween(-13, 0)


@register(
    "ind_sma",
    f"""
    SELECT user_id, event_id, ts,
           round(avg(value) OVER ({_W}), 6) AS sma
    FROM events
    """,
    doc="W1: trailing 14-row simple moving average (spark_job_1.py:28-29)",
    tags=("window",),
)
def ind_sma(spark: SparkSession, sf_dir: str) -> DataFrame:
    _w, _wf = _wspec()
    return _events(spark, sf_dir).select(
        "user_id",
        "event_id",
        "ts",
        F.round(F.avg("value").over(_wf), 6).alias("sma"),
    )


@register(
    "ind_lag_diff",
    f"""
    SELECT user_id, event_id, ts,
           round(value - lag(value) OVER ({_WO}), 6) AS diff
    FROM events
    """,
    doc="W2: lag-1 price diff, NULL on first row per key (spark_job_1.py:32)",
    tags=("window",),
)
def ind_lag_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    _w, _wf = _wspec()
    return _events(spark, sf_dir).select(
        "user_id",
        "event_id",
        "ts",
        F.round(F.col("value") - F.lag("value").over(_w), 6).alias("diff"),
    )


@register(
    "ind_rsi",
    f"""
    WITH diffed AS (
      SELECT user_id, event_id, ts,
             value - lag(value) OVER ({_WO}) AS diff
      FROM events
    ), gained AS (
      SELECT *,
             CASE WHEN diff > 0 THEN diff ELSE 0.0 END AS gain,
             CASE WHEN diff < 0 THEN -diff ELSE 0.0 END AS loss
      FROM diffed
    ), framed AS (
      SELECT user_id, event_id, ts,
             avg(gain) OVER w AS avg_gain, avg(loss) OVER w AS avg_loss
      FROM gained WINDOW w AS ({_W})
    )
    SELECT user_id, event_id, ts,
           round(100 - (100 / (1 + (avg_gain / nullif(avg_loss, 0)))), 6) AS rsi
    FROM framed
    WHERE (avg_gain / nullif(avg_loss, 0)) IS NOT NULL
    """,
    doc="W3: RSI-14, simple-average variant — NOT Wilder's (spark_job_1.py:32-39); "
    "zero-loss frames yield NULL and are filtered (spark_job_1.py:54)",
    tags=("window",),
)
def ind_rsi(spark: SparkSession, sf_dir: str) -> DataFrame:
    _w, _wf = _wspec()
    df = _events(spark, sf_dir)
    diff = F.col("value") - F.lag("value").over(_w)
    df = df.withColumn("_diff", diff).withColumns(
        {
            "_gain": F.when(F.col("_diff") > 0, F.col("_diff")).otherwise(F.lit(0.0)),
            "_loss": F.when(F.col("_diff") < 0, -F.col("_diff")).otherwise(F.lit(0.0)),
        }
    )
    rs = F.avg("_gain").over(_wf) / F.nullif(F.avg("_loss").over(_wf), F.lit(0.0))
    return (
        df.select(
            "user_id",
            "event_id",
            "ts",
            (F.lit(100.0) - F.lit(100.0) / (F.lit(1.0) + rs)).alias("_rsi"),
        )
        .filter(F.col("_rsi").isNotNull())
        .select("user_id", "event_id", "ts", F.round("_rsi", 6).alias("rsi"))
    )


@register(
    "ind_bollinger",
    f"""
    WITH framed AS (
      SELECT user_id, event_id, ts,
             avg(value) OVER w AS m, stddev_samp(value) OVER w AS sd
      FROM events WINDOW w AS ({_W})
    )
    SELECT user_id, event_id, ts,
           round(m + 2 * sd, 6) AS bb_up, round(m - 2 * sd, 6) AS bb_down
    FROM framed WHERE sd IS NOT NULL
    """,
    doc="W4+W5: Bollinger Bands = mean ± 2·sample-stddev over the 14-row "
    "frame (spark_job_1.py:42-45); 1-row frames have NULL stddev → dropped",
    tags=("window",),
)
def ind_bollinger(spark: SparkSession, sf_dir: str) -> DataFrame:
    _w, _wf = _wspec()
    df = _events(spark, sf_dir)
    m = F.avg("value").over(_wf)
    sd = F.stddev("value").over(_wf)
    return (
        df.select("user_id", "event_id", "ts", m.alias("_m"), sd.alias("_sd"))
        .filter(F.col("_sd").isNotNull())
        .select(
            "user_id",
            "event_id",
            "ts",
            F.round(F.col("_m") + 2 * F.col("_sd"), 6).alias("bb_up"),
            F.round(F.col("_m") - 2 * F.col("_sd"), 6).alias("bb_down"),
        )
    )


@register(
    "ind_union_branches",
    _FRAMED_CTE
    + """
    SELECT user_id, ts, type_name, round(ind_value, 6) AS ind_value
    FROM stacked WHERE ind_value IS NOT NULL
    """,
    doc="U1: the reference's 4-branch unionByName pivot into the long "
    "(key, type_name, value, ts) relation (spark_job_1.py:50-54) — engine "
    "computes it in ONE window pass + stack()",
    tags=("window", "setop"),
)
def ind_union_branches(spark: SparkSession, sf_dir: str) -> DataFrame:
    ind = compute_indicators(_events(spark, sf_dir))
    return ind.select(
        "user_id", "ts", "type_name", F.round("ind_value", 6).alias("ind_value")
    )


@register(
    "ind_pipeline",
    _FRAMED_CTE
    + """
    , named AS (
      SELECT s.user_id, s.ts, s.type_name, s.ind_value, CAST(d.type_id AS BIGINT) AS type_id
      FROM stacked s
      JOIN (VALUES ('SMA',1),('RSI',2),('BB_UP',3),('BB_DOWN',4)) d(type_name, type_id)
        USING (type_name)
      WHERE s.ind_value IS NOT NULL
    )
    SELECT user_id, type_id, type_name, round(ind_value, 6) AS ind_value, ts
    FROM named n
    WHERE NOT EXISTS (
      SELECT 1 FROM named e
      WHERE e.ts < TIMESTAMP '2024-01-15'
        AND e.user_id = n.user_id AND e.type_id = n.type_id AND e.ts = n.ts
    )
    """,
    doc="Flagship (reference entry point A, spark_job_1.py:11-97): window "
    "indicators → stack → broadcast dim join (J1) → left-anti idempotent "
    "dedup (J2) against already-persisted keys (simulated as ts < 2024-01-15)",
    tags=("window", "join", "flagship"),
)
def ind_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _events(spark, sf_dir)
    # 'existing' = what a previous run would have persisted: all indicator
    # keys strictly before the cutoff (plays indicator_fact_1's role).
    full = compute_indicators(events).join(
        F.broadcast(indicator_type_dim(spark)), "type_name", "inner"
    )
    existing = full.filter(F.col("ts") < F.lit("2024-01-15").cast("timestamp")).select(
        "user_id", "type_id", "ts"
    )
    out = indicator_pipeline(spark, events, existing=existing)
    return out.select(
        "user_id",
        F.col("type_id").cast("long").alias("type_id"),
        "type_name",
        F.round("ind_value", 6).alias("ind_value"),
        "ts",
    )
