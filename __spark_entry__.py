"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship indicator pipeline (the reference's
analytical core, ``dags/spark_job_1.py``) on sf0.001. ``queries()`` /
``oracle_sql()`` expose the full operator inventory from SURVEY.md §2 via
the engine's plan registry.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

from crypto_data_pipeline_with_kafka_spark.plans import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    fn = registry.queries()["ind_pipeline"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (omitted for non-SQL ops)."""
    return registry.oracle_sql()
