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

from pyspark.sql import DataFrame, SparkSession
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


# (ind_sma / ind_lag_diff / ind_rsi / ind_bollinger were folded into the
# two composite queries below: ind_union_branches and ind_pipeline emit
# every SMA/RSI/BB value and are hash-checked against the exact-decimal
# oracle CTE, so W1/W3/W4/W5 stay value-attested; lag/diff (W2) is
# attested by win_rank_nav's prev_value/diff columns. The per-indicator
# semantics remain pinned by tests/test_indicators_golden.py.)


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
    "indicators → stack → broadcast dim join (J1) → ingest-range pre-filter "
    "of the existing-keys side (prefilter_to_ingest_range) → left-anti "
    "idempotent dedup (J2) against already-persisted keys (simulated as "
    "ts < 2024-01-15)",
    tags=("window", "join", "flagship"),
)
def ind_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _events(spark, sf_dir)
    # 'existing' = what a previous run would have persisted: all indicator
    # keys strictly before the cutoff (plays indicator_fact_1's role).
    # The indicator relation feeds BOTH sides of the anti-join, so persist
    # it and hand it to indicator_pipeline via the `indicators` hook — the
    # reference instead re-executes its whole plan twice (isEmpty + write,
    # spark_job_1.py:88-93) with only a scan-level cache.
    full = (
        compute_indicators(events)
        .join(F.broadcast(indicator_type_dim(spark)), "type_name", "inner")
        .persist()
    )
    existing = full.filter(F.col("ts") < F.lit("2024-01-15").cast("timestamp")).select(
        "user_id", "type_id", "ts"
    )
    # The real operator path: indicator_pipeline pre-filters `existing`
    # to the ingest [min(ts), max(ts)] (a no-op reduction HERE, where
    # existing is simulated from the same events — but the honest
    # production shape, probe included) and anti-joins WITHOUT a forced
    # broadcast: the existing side is history-sized, not structurally
    # bounded; post-prefilter it is O(ingest-window), so AQE broadcasts
    # it at runtime when it fits (it does at every tested SF) and falls
    # back to a shuffle instead of a driver OOM when it does not.
    out = indicator_pipeline(spark, events, existing=existing, indicators=full)
    return out.select(
        "user_id",
        F.col("type_id").cast("long").alias("type_id"),
        "type_name",
        "ind_value",
        "ts",
    )


# Shared by ind_ema (batch applyInPandas) and stream_stateful_ema (the
# applyInPandasWithState twin in q_streaming): the EMA recurrence PLUS
# Wilder-smoothed RSI-14 state (seed = simple mean of the first 14
# diffs, then avg_t = (avg_{t-1}*13 + x_t)/14) carried through the same
# recursion. Every float op appears in the exact order both Python
# walks perform it, so all output columns are value-exact.
_EMA_WILDER_ORACLE_SQL = f"""
    WITH RECURSIVE ordered AS (
      SELECT user_id, event_id, ts, value,
             CAST(row_number() OVER ({_WO}) AS BIGINT) AS rn
      FROM events
    ), r AS (
      SELECT user_id, event_id, ts, value, rn, value AS ema,
             CAST(0.0 AS DOUBLE) AS sg, CAST(0.0 AS DOUBLE) AS sl,
             CAST(NULL AS DOUBLE) AS ag, CAST(NULL AS DOUBLE) AS al
      FROM ordered WHERE rn = 1
      UNION ALL
      SELECT o.user_id, o.event_id, o.ts, o.value, o.rn,
             CAST(0.125 AS DOUBLE) * o.value + CAST(0.875 AS DOUBLE) * r.ema,
             CASE WHEN o.rn <= 15 THEN r.sg + greatest(o.value - r.value, 0.0)
                  ELSE r.sg END,
             CASE WHEN o.rn <= 15 THEN r.sl + greatest(r.value - o.value, 0.0)
                  ELSE r.sl END,
             CASE WHEN o.rn < 15 THEN CAST(NULL AS DOUBLE)
                  WHEN o.rn = 15
                    THEN (r.sg + greatest(o.value - r.value, 0.0)) / 14.0
                  ELSE (r.ag * 13.0 + greatest(o.value - r.value, 0.0)) / 14.0
             END,
             CASE WHEN o.rn < 15 THEN CAST(NULL AS DOUBLE)
                  WHEN o.rn = 15
                    THEN (r.sl + greatest(r.value - o.value, 0.0)) / 14.0
                  ELSE (r.al * 13.0 + greatest(r.value - o.value, 0.0)) / 14.0
             END
      FROM r JOIN ordered o ON o.user_id = r.user_id AND o.rn = r.rn + 1
    )
    SELECT user_id, event_id, ts, value, ema,
           CASE WHEN ag IS NULL THEN CAST(NULL AS DOUBLE)
                WHEN al = 0.0 THEN 100.0
                ELSE 100.0 - 100.0 / (1.0 + ag / al) END AS rsi_wilder
    FROM r
    """


@register(
    "ind_ema",
    _EMA_WILDER_ORACLE_SQL,
    doc="The RECURSIVE indicators a Spark window cannot express (SURVEY "
    "§2.10), ONE applyInPandas ordered walk per key: EMA (α=0.125, "
    "binary-exact) and — r5 extension — Wilder-smoothed RSI-14, the "
    "industry-standard variant alongside the reference's simple-average "
    "RSI (W3, pinned by ind_pipeline): simple-mean seed over the first "
    "14 diffs, then avg = (prev*13 + x)/14, NULL through the warm-up. "
    "Oracle is a recursive CTE running the identical IEEE op sequence, "
    "so even this Python path is value-exact",
    tags=("window", "udf", "recursive"),
)
def ind_ema(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crypto_data_pipeline_with_kafka_spark.operators.recursive import (
        recursive_indicators,
    )

    return recursive_indicators(_events(spark, sf_dir), alpha=0.125, period=14)
