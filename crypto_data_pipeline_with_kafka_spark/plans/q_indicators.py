"""Indicator queries (SURVEY §2.5 W1-W5, §2.7 U1, §2.3 J1/J2, §2.2 P3/P4).

The ``events`` fixture plays the kline fact: user_id ↔ symbol_id
(partition key), ts ↔ close_time (order key), value ↔ close_price
(measure); ``event_id`` is appended to the ORDER BY as the deterministic
tie-breaker the reference lacks (``dags/spark_job_1.py:25``).

Float parity: frame aggregates use exact DECIMAL sums cast to double
(see ``operators/indicators.py``) so Spark and the DuckDB oracle agree
bitwise — no tolerance, no rounding.
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

# Exact-decimal frame sums (bitwise-identical to the Spark plan).
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
), sums AS (
  SELECT user_id, event_id, ts,
         count(*) OVER w AS n,
         CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sx,
         CAST(sum(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sxx,
         CAST(sum(CAST(gain AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sg,
         CAST(sum(CAST(loss AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sl
  FROM gained
  WINDOW w AS ({_W})
), framed AS (
  SELECT user_id, event_id, ts,
         sx / n AS sma,
         sg / n AS avg_gain,
         sl / n AS avg_loss,
         CASE WHEN n > 1
              THEN sqrt(greatest((sxx - sx * sx / n) / (n - 1), 0.0)) END AS sd
  FROM sums
), stacked AS (
  SELECT user_id, ts, 'SMA' AS type_name, sma AS ind_value FROM framed
  UNION ALL
  SELECT user_id, ts, 'RSI', 100 - (100 / (1 + (avg_gain / nullif(avg_loss, 0.0)))) FROM framed
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


def _exact_sma(wf):
    dv = F.col("value").cast("decimal(18,6)")
    return F.sum(dv).over(wf).cast("double") / F.count(F.lit(1)).over(wf)


@register(
    "ind_sma",
    f"""
    SELECT user_id, event_id, ts,
           CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE)
             / count(*) OVER w AS sma
    FROM events WINDOW w AS ({_W})
    """,
    doc="W1: trailing 14-row simple moving average (spark_job_1.py:28-29)",
    tags=("window",),
)
def ind_sma(spark: SparkSession, sf_dir: str) -> DataFrame:
    _w, _wf = _wspec()
    return _events(spark, sf_dir).select(
        "user_id", "event_id", "ts", _exact_sma(_wf).alias("sma")
    )


@register(
    "ind_lag_diff",
    f"""
    SELECT user_id, event_id, ts,
           value - lag(value) OVER ({_WO}) AS diff
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
        (F.col("value") - F.lag("value").over(_w)).alias("diff"),
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
    ), sums AS (
      SELECT user_id, event_id, ts, count(*) OVER w AS n,
             CAST(sum(CAST(gain AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sg,
             CAST(sum(CAST(loss AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sl
      FROM gained WINDOW w AS ({_W})
    ), framed AS (
      SELECT user_id, event_id, ts,
             100 - (100 / (1 + ((sg / n) / nullif(sl / n, 0.0)))) AS rsi
      FROM sums
    )
    SELECT user_id, event_id, ts, rsi FROM framed WHERE rsi IS NOT NULL
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
    n = F.count(F.lit(1)).over(_wf)
    avg_gain = F.sum(F.col("_gain").cast("decimal(18,6)")).over(_wf).cast("double") / n
    avg_loss = F.sum(F.col("_loss").cast("decimal(18,6)")).over(_wf).cast("double") / n
    rs = avg_gain / F.nullif(avg_loss, F.lit(0.0))
    return (
        df.select(
            "user_id",
            "event_id",
            "ts",
            (F.lit(100) - F.lit(100) / (F.lit(1) + rs)).alias("rsi"),
        )
        .filter(F.col("rsi").isNotNull())
    )


@register(
    "ind_bollinger",
    f"""
    WITH sums AS (
      SELECT user_id, event_id, ts, count(*) OVER w AS n,
             CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sx,
             CAST(sum(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sxx
      FROM events WINDOW w AS ({_W})
    ), framed AS (
      SELECT user_id, event_id, ts, sx / n AS m,
             CASE WHEN n > 1
                  THEN sqrt(greatest((sxx - sx * sx / n) / (n - 1), 0.0)) END AS sd
      FROM sums
    )
    SELECT user_id, event_id, ts, m + 2 * sd AS bb_up, m - 2 * sd AS bb_down
    FROM framed WHERE sd IS NOT NULL
    """,
    doc="W4+W5: Bollinger Bands = mean ± 2·sample-stddev over the 14-row "
    "frame (spark_job_1.py:42-45); 1-row frames have NULL stddev → dropped",
    tags=("window",),
)
def ind_bollinger(spark: SparkSession, sf_dir: str) -> DataFrame:
    _w, _wf = _wspec()
    df = _events(spark, sf_dir)
    dv = F.col("value").cast("decimal(18,6)")
    n = F.count(F.lit(1)).over(_wf)
    sx = F.sum(dv).over(_wf).cast("double")
    sxx = F.sum(dv * dv).over(_wf).cast("double")
    m = sx / n
    sd = F.when(n > 1, F.sqrt(F.greatest((sxx - sx * sx / n) / (n - 1), F.lit(0.0))))
    return (
        df.select("user_id", "event_id", "ts", m.alias("_m"), sd.alias("_sd"))
        .filter(F.col("_sd").isNotNull())
        .select(
            "user_id",
            "event_id",
            "ts",
            (F.col("_m") + 2 * F.col("_sd")).alias("bb_up"),
            (F.col("_m") - 2 * F.col("_sd")).alias("bb_down"),
        )
    )


@register(
    "ind_union_branches",
    _FRAMED_CTE
    + """
    SELECT user_id, ts, type_name, ind_value
    FROM stacked WHERE ind_value IS NOT NULL
    """,
    doc="U1: the reference's 4-branch unionByName pivot into the long "
    "(key, type_name, value, ts) relation (spark_job_1.py:50-54) — engine "
    "computes it in ONE window pass + stack()",
    tags=("window", "setop"),
)
def ind_union_branches(spark: SparkSession, sf_dir: str) -> DataFrame:
    ind = compute_indicators(_events(spark, sf_dir))
    return ind.select("user_id", "ts", "type_name", "ind_value")


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
    SELECT user_id, type_id, type_name, ind_value, ts
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
    # The indicator relation feeds BOTH sides of the anti-join, so persist
    # it — the reference instead re-executes its whole plan twice
    # (isEmpty + write, spark_job_1.py:88-93) with only a scan-level cache.
    full = (
        compute_indicators(events)
        .join(F.broadcast(indicator_type_dim(spark)), "type_name", "inner")
        .persist()
    )
    existing = full.filter(F.col("ts") < F.lit("2024-01-15").cast("timestamp")).select(
        "user_id", "type_id", "ts"
    )
    # the existing-keys side is pre-filtered to the relevant time range —
    # which is what makes it broadcastable at scale; measured ~2× over
    # the shuffle anti-join at sf0.1
    out = full.join(
        F.broadcast(existing), on=["user_id", "type_id", "ts"], how="left_anti"
    )
    return out.select(
        "user_id",
        F.col("type_id").cast("long").alias("type_id"),
        "type_name",
        "ind_value",
        "ts",
    )


@register(
    "ind_ema",
    f"""
    WITH RECURSIVE ordered AS (
      SELECT user_id, event_id, ts, value,
             CAST(row_number() OVER ({_WO}) AS BIGINT) AS rn
      FROM events
    ), r AS (
      SELECT user_id, event_id, ts, value, rn, value AS ema
      FROM ordered WHERE rn = 1
      UNION ALL
      SELECT o.user_id, o.event_id, o.ts, o.value, o.rn,
             CAST(0.125 AS DOUBLE) * o.value + CAST(0.875 AS DOUBLE) * r.ema
      FROM r JOIN ordered o ON o.user_id = r.user_id AND o.rn = r.rn + 1
    )
    SELECT user_id, event_id, ts, value, ema FROM r
    """,
    doc="EMA (α=0.125, binary-exact): the RECURSIVE indicator a Spark "
    "window cannot express (SURVEY §2.10) — applyInPandas per key with "
    "an Arrow-batched ordered walk; oracle is a recursive CTE running "
    "the identical IEEE recurrence, so even this Python path is "
    "value-exact",
    tags=("window", "udf", "recursive"),
)
def ind_ema(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crypto_data_pipeline_with_kafka_spark.operators.recursive import ema

    return ema(_events(spark, sf_dir), alpha=0.125)
