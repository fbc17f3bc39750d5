"""Fixture-table catalog.

The driver materializes deterministic Parquet tables under
``/root/testdata/sf{0.001,0.01,0.1}``; these play the roles of the
reference's MySQL star schemas and Kafka topics (see SURVEY.md §5).
Parquet is the engine's default source: columnar, with predicate pushdown
and column pruning reaching the scan (check ``PushedFilters`` /
``ReadSchema`` in ``.explain``). At 100 TB these tables would be
partitioned by date/key; the loaders keep that orthogonal.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


# Parquet TIMESTAMP(NANOS) columns. Spark 4 rejects them outright
# (PARQUET_TYPE_ILLEGAL); with spark.sql.legacy.parquet.nanosAsLong they
# read as epoch-ns longs, which we truncate to the µs TimestampType —
# the exact semantics DuckDB applies when it reads the same file (ns
# truncated, not rounded, to its µs TIMESTAMP), keeping oracle parity.
_NANO_TS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown fixture table {name!r}; have {TABLES}")
    # Query semantics are defined in UTC; pin it even when the calling
    # session (the driver builds its own) didn't — otherwise collected
    # timestamps would shift against the timezone-naive DuckDB oracle.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    nano_cols = _NANO_TS_COLS.get(name, ())
    if nano_cols:
        # runtime-settable; done here so the driver's own SparkSession
        # (which we don't construct) also reads these files.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, name))
    for c in nano_cols:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view (for the SQL API)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
