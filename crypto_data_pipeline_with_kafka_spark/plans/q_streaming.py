"""Streaming queries (SURVEY §2.9): each runs the REAL Structured
Streaming engine (file source standing in for the Kafka topic, as §5's
test strategy prescribes) to completion with the AvailableNow trigger,
then returns the materialized result — so even streaming semantics are
value-checked against a batch DuckDB oracle."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crypto_data_pipeline_with_kafka_spark.plans.q_indicators import EMA_ORACLE_SQL
from crypto_data_pipeline_with_kafka_spark.plans.registry import register
from crypto_data_pipeline_with_kafka_spark.sources.readers import events_stream_reader
from crypto_data_pipeline_with_kafka_spark.streaming.pipeline import (
    run_to_memory,
    streaming_dedup,
    streaming_session_windows,
    streaming_tumbling_counts,
)


def _stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    return events_stream_reader(spark, os.path.join(sf_dir, "events.parquet"))


@register(
    "stream_tumbling_counts",
    """
    SELECT time_bucket(INTERVAL '1 hour', ts) AS bucket_start, event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total
    FROM events
    GROUP BY 1, 2
    """,
    doc="ST4/ST5: watermarked tumbling-window streaming aggregation, run "
    "through the real incremental engine (AvailableNow → complete mode "
    "memory sink); equals the batch result because complete mode emits "
    "every window",
    tags=("streaming",),
)
def stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    agg = streaming_tumbling_counts(_stream(spark, sf_dir))
    return run_to_memory(agg, output_mode="complete", name_prefix="tumbling_counts")


@register(
    "stream_dedup_distinct",
    """
    SELECT DISTINCT user_id, event_type FROM events
    """,
    doc="ST3: stateful streaming dropDuplicates over (user_id, event_type) "
    "— the engine-checkpointed replacement for the producer's in-memory "
    "dedup sets (producer_news.py:45); append mode emits each key once",
    tags=("streaming",),
)
def stream_dedup_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    dd = streaming_dedup(
        _stream(spark, sf_dir).select("user_id", "event_type"),
        ["user_id", "event_type"],
    )
    return run_to_memory(dd, output_mode="append", name_prefix="dedup_distinct")


@register(
    "stream_session_window",
    """
    WITH g AS (
      SELECT user_id, ts,
        CASE WHEN lag(ts) OVER w IS NULL
               OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000
             THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
      SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, new_sess DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seq
      FROM g
    )
    SELECT user_id, min(ts) AS session_start, max(ts) + INTERVAL 30 MINUTE AS session_end,
           CAST(count(*) AS BIGINT) AS n_events
    FROM s GROUP BY user_id, seq
    """,
    doc="ST5: native streaming session_window (30-min gap) through the "
    "real incremental engine — sessions merge across micro-batches in "
    "the state store; complete mode emits the final merged sessions. "
    "Oracle is the batch lag+cumsum sessionization with session_end = "
    "last event + gap (session-window convention; boundary at "
    "diff >= gap, matching the engine's [start, end) window)",
    tags=("streaming", "window", "time"),
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    sw = streaming_session_windows(_stream(spark, sf_dir))
    return run_to_memory(sw, output_mode="complete", name_prefix="session_window")


@register(
    "stream_idempotent_replay",
    """
    SELECT event_id, user_id, event_type, value, ts FROM events
    """,
    doc="ST2/S7: exactly-once-to-idempotent-sink delivery, value-checked "
    "— the SAME micro-batch is delivered TWICE through "
    "foreach_batch_idempotent_append into a fresh date-partitioned store "
    "(crash-between-write-and-commit redelivery); the second delivery is "
    "absorbed by the partition-pruned anti-join, so the read-back store "
    "equals one clean copy of the batch (oracle: plain SELECT — "
    "event_id is the batch key and is unique). Replaces the reference's "
    "at-least-once manual commit + per-row INSERT IGNORE "
    "(consumer_prices.py:70-81)",
    tags=("streaming", "sink"),
)
def stream_idempotent_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from crypto_data_pipeline_with_kafka_spark.catalog import load_table
    from crypto_data_pipeline_with_kafka_spark.streaming.pipeline import (
        foreach_batch_idempotent_append,
    )

    cols = ["event_id", "user_id", "event_type", "value", "ts"]
    batch = load_table(spark, sf_dir, "events").select(*cols)
    target = os.path.join(tempfile.mkdtemp(prefix="replay_store_"), "store")
    sink = foreach_batch_idempotent_append(target, keys=["event_id"], ts_col="ts")
    sink(batch, 0)
    sink(batch, 1)  # redelivered batch → anti-join no-op
    return spark.read.parquet(target).select(*cols)


@register(
    "stream_stateful_ema",
    EMA_ORACLE_SQL,  # shared with ind_ema — identical IEEE recurrence
    doc="ST6: checkpointed per-key state — the recursive EMA as a "
    "STREAMING query (applyInPandasWithState, engine-managed state "
    "store) run to completion via AvailableNow + memory sink; the "
    "oracle is ind_ema's recursive CTE, so the stateful streaming path "
    "is value-equal to both the batch applyInPandas walk and the SQL "
    "recurrence. Replaces the reference's in-memory producer dicts "
    "lost on restart (producer_prices.py:31)",
    tags=("streaming", "udf", "recursive"),
)
def stream_stateful_ema(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crypto_data_pipeline_with_kafka_spark.streaming.stateful import streaming_ema

    out = streaming_ema(_stream(spark, sf_dir), alpha=0.125)
    return run_to_memory(out, output_mode="append", name_prefix="stateful_ema")
