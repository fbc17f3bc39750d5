"""Batch + streaming readers.

The engine's default source is Parquet (driver testdata); the Kafka
reader builders mirror the reference's consumer settings
(``dags/consumer_prices.py:45-52``) onto the Structured Streaming Kafka
source — strictly stronger delivery semantics: checkpointed offsets +
idempotent sinks give effectively-exactly-once vs the reference's
at-least-once manual commit (SURVEY §2.9 ST2).

Kafka jars aren't in this container, so ``kafka_stream_reader`` only
*builds* the configured reader; instantiating it without the package
raises — gated exactly like the multimodal codecs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


_TS_PROBE_CACHE: dict[str, T.DataType] = {}


def events_stream_reader(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source streaming reader over the events fixture — the test
    stand-in for the Kafka topic (same rows, same schema, declared not
    inferred). The file stream source requires a declared schema, and
    the events fixture has shipped ``ts`` in two parquet layouts
    (epoch-ns, which reads as long under nanosAsLong, and plain µs
    TIMESTAMP): a one-footer batch probe picks the matching declaration,
    then ``ts`` is normalized to the session TimestampType either way.
    The probe is cached per path (a stream-stream self-join constructs
    two readers over the same fixture), and a path with no matching
    files yet — a normal streaming start condition — falls back to the
    µs-timestamp declaration instead of failing, so the stream can wait
    for files. ``max_files_per_trigger`` is the file-source's batch-size
    cap (O3's file-source analogue of maxOffsetsPerTrigger); tests use 1
    to force one micro-batch per file."""
    import os

    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    if path not in _TS_PROBE_CACHE:
        # Schema probe: footer-only read of whatever files the path
        # matches — driver-side metadata, not a data scan. Only the
        # zero-files-yet AnalysisException falls back (a normal stream
        # start condition); I/O or footer-corruption errors propagate
        # — silently mis-declaring the layout would fail every later
        # micro-batch far from the root cause. The cache is process-
        # scoped: replacing files at a path with the OTHER ts layout
        # mid-process needs a `_TS_PROBE_CACHE.clear()`.
        from pyspark.errors import AnalysisException

        try:
            _TS_PROBE_CACHE[path] = spark.read.parquet(path).schema["ts"].dataType
        except AnalysisException:
            # Don't cache — the first real file should re-probe. The
            # guess is NOT silent (r4 advice): if files later land with
            # the OTHER layout (epoch-ns long), every micro-batch fails
            # with a parquet conversion error that doesn't mention this
            # fallback — the warning is the breadcrumb pointing back.
            import warnings

            warnings.warn(
                f"events_stream_reader: no files match {path!r} yet; "
                "declaring ts as µs TIMESTAMP. If the first files arrive "
                "with the epoch-ns long layout instead, micro-batches "
                "will fail with a parquet type-conversion error — "
                "recreate the reader after the first file lands (the "
                "probe is not cached for this path).",
                stacklevel=2,
            )
            probed: T.DataType = T.TimestampType()
        else:
            probed = _TS_PROBE_CACHE[path]
    else:
        probed = _TS_PROBE_CACHE[path]
    ts_is_long = isinstance(probed, T.LongType)
    if ts_is_long:
        ts_decl: T.DataType = T.LongType()
    elif isinstance(probed, T.TimestampNTZType):
        ts_decl = T.TimestampNTZType()
    else:
        # µs TIMESTAMP with isAdjustedToUTC either way — declare the
        # session TimestampType and pass through (catalog.load_table's
        # behavior for the batch side)
        ts_decl = T.TimestampType()
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType(), False),
            T.StructField("ts", ts_decl, False),
            T.StructField("user_id", T.LongType(), False),
            T.StructField("event_type", T.StringType(), True),
            T.StructField("value", T.DoubleType(), True),
            T.StructField("props", T.StringType(), True),
        ]
    )
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    if not path.endswith("/") and "." in os.path.basename(path):
        # the file stream source wants a DIRECTORY; to stream a single
        # file, stream its parent filtered down to that file name
        reader = reader.option("pathGlobFilter", os.path.basename(path))
        path = os.path.dirname(path)
    raw = reader.parquet(path)
    if ts_is_long:
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def documents_stream_reader(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source streaming reader over the documents fixture — the
    arriving-corpus stand-in for the incremental dedup stream (schema
    declared, matching ``testdata/*/documents.parquet``)."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("text", T.StringType(), True),
            T.StructField("lang", T.StringType(), True),
            T.StructField("source", T.StringType(), True),
            T.StructField("n_chars", T.LongType(), True),
        ]
    )
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(path)


def embeddings_stream_reader(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source streaming reader over the embeddings fixture — the
    arriving-vectors stand-in for the incremental ANN-index stream
    (schema declared, matching ``testdata/*/embeddings.parquet``)."""
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType(), True),
            T.StructField("embedding", T.ArrayType(T.FloatType()), True),
            T.StructField("label", T.IntegerType(), True),
        ]
    )
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(path)


def kafka_stream_reader(
    spark: SparkSession,
    topic: str,
    bootstrap_servers: str = "localhost:9092",
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
):
    """Configured Kafka source (reference consumer settings: subscribe,
    auto_offset_reset='earliest' → startingOffsets, poll max_records →
    maxOffsetsPerTrigger; offset commits become checkpointLocation).
    Requires the spark-sql-kafka package on the classpath."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    return reader
