"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference crypto data pipeline
(nguyenngocnam4399-dev/Crypto-Data-Pipeline-with-Kafka), re-expressed
Spark-first: DataFrame/SQL declarative plans, Catalyst/AQE optimization,
Structured Streaming for ingestion, Arrow-batched Pandas UDFs for the
(rare) Python escape hatches.

Layout:
  session      - SparkSession factory (AQE on, UTC, sized shuffles)
  catalog      - fixture-table loading / view registration
  operators/   - indicators (the reference's analytical core), relational
                 helpers (get-or-create dims, idempotent append, as-of join),
                 time windows, dedup family, similarity search
  functions/   - scalar function library (json, text, time)
  sources/     - message schemas + batch/streaming readers, sinks
  streaming/   - Structured Streaming pipelines (the reference's
                 producer/consumer/Airflow apparatus, collapsed)
  multimodal   - binary-column (image/audio) plumbing with stub decoders
"""

__version__ = "0.1.0"
