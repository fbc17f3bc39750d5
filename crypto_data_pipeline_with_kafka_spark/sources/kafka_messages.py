"""Kafka message shapes and (de)serialization — the typed replacement
for the reference's schemaless JSON topics.

The reference trusts producer dict keys (``dags/consumer_prices.py:62-78``)
and JSON-encodes with ``json.dumps(...).encode('utf-8')``
(``producer_prices.py:13``). Here every topic has a declared StructType;
``from_json`` with ``columnNameOfCorruptRecord``-style null-on-corrupt
semantics replaces the bare ``except`` swallow
(``producer_news.py:72-74``).

Prices arrive with STRING-typed OHLCV (Binance returns JSON strings,
``producer_prices.py:48-56``); the reference lets MySQL cast implicitly —
the engine casts explicitly to DECIMAL(20,10)/(38,18)
(``kline_dim_fact.sql:15-19``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# crypto-prices topic value (producer_prices.py:48-59)
PRICE_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType(), False),
        T.StructField("interval", T.StringType(), True),
        T.StructField("open_time", T.LongType(), False),  # epoch ms
        T.StructField("open", T.StringType(), True),  # Binance sends strings
        T.StructField("high", T.StringType(), True),
        T.StructField("low", T.StringType(), True),
        T.StructField("close", T.StringType(), True),
        T.StructField("volume", T.StringType(), True),
        T.StructField("close_time", T.LongType(), True),  # epoch ms
        T.StructField("fetched_at", T.StringType(), True),  # ISO-8601
    ]
)

# crypto-news topic value (producer_news.py:76-83)
NEWS_SCHEMA = T.StructType(
    [
        T.StructField("title", T.StringType(), True),
        T.StructField("url", T.StringType(), False),
        T.StructField("published", T.StringType(), True),  # RFC-822
        T.StructField("tag", T.StringType(), True),
        T.StructField("sentiment_score", T.DoubleType(), True),
        T.StructField("content", T.StringType(), True),
    ]
)

# The reference parses '%a, %d %b %Y %H:%M:%S %z' (producer_news.py:61).
# Spark ≥3's java.time parser refuses day-of-week NAMES on input, so the
# engine strips the 'Mon, ' prefix and parses the unambiguous remainder.
RFC822_FORMAT = "dd MMM yyyy HH:mm:ss Z"
RFC822_DOW_PREFIX = r"^[A-Za-z]{3}, "


def parse_price_values(value_col: Column) -> Column:
    """JSON string → typed struct (F2)."""
    return F.from_json(value_col, PRICE_SCHEMA)


def typed_price_rows(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """Kafka-shaped rows (value json string) → typed kline fact rows:
    explicit decimal casts (F12), epoch-ms → timestamp (F3), default
    interval '1h' (F11, consumer_prices.py:63)."""
    parsed = raw.select(parse_price_values(F.col(value_col)).alias("m"))
    return parsed.select(
        F.col("m.symbol").alias("symbol"),
        F.coalesce(F.col("m.interval"), F.lit("1h")).alias("interval"),
        F.col("m.open").cast(T.DecimalType(20, 10)).alias("open_price"),
        F.col("m.high").cast(T.DecimalType(20, 10)).alias("high_price"),
        F.col("m.low").cast(T.DecimalType(20, 10)).alias("low_price"),
        F.col("m.close").cast(T.DecimalType(20, 10)).alias("close_price"),
        F.col("m.volume").cast(T.DecimalType(38, 18)).alias("volume"),
        F.timestamp_millis(F.col("m.open_time")).alias("open_time"),
        F.timestamp_millis(F.col("m.close_time")).alias("close_time"),
        F.to_timestamp(F.col("m.fetched_at")).alias("fetched_at"),
    ).filter(F.col("symbol").isNotNull())  # corrupt records → null struct → dropped


def typed_news_rows(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """News messages → typed rows; RFC-822 pubDate parse (F4)."""
    parsed = raw.select(F.from_json(F.col(value_col), NEWS_SCHEMA).alias("m"))
    return parsed.select(
        F.col("m.title").alias("title"),
        F.col("m.url").alias("url"),
        F.to_timestamp(
            F.regexp_replace(F.col("m.published"), RFC822_DOW_PREFIX, ""),
            RFC822_FORMAT,
        ).alias("created_date"),
        F.col("m.tag").alias("tag_name"),
        F.col("m.sentiment_score").cast("float").alias("sentiment_score"),
        F.col("m.content").alias("content"),
    ).filter(F.col("url").isNotNull())


def to_kafka_shape(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Typed rows → Kafka sink shape: (key, value) with JSON value and
    concat_ws('-') key — the producer's f'{symbol}-{interval}' partition
    key (producer_prices.py:38,63). Write with
    df.write.format('kafka')... when a broker is configured."""
    return df.select(
        F.concat_ws("-", *key_cols).alias("key"),
        F.to_json(F.struct(*df.columns)).alias("value"),
    )
