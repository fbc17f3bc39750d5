"""Query registry: every operator from SURVEY.md §2 (plus the extended
LLM-pipeline surface) gets a named PySpark query and, where
SQL-expressible, a DuckDB oracle string over the same parquet tables.

Conventions (driver contract, ``/root/repo/__spark_entry__.py``):

* Each query callable takes ``(spark, sf_dir)`` and returns a DataFrame.
* Every computed column is aliased IDENTICALLY in the Spark plan and the
  oracle SQL (the driver sorts columns by name before value-hashing).
* Floating-point results are rounded to 6 decimals on BOTH sides —
  cross-engine float aggregation differs in ulps; 1e-6 rounding is far
  above noise (~1e-13 relative) and far below semantic differences.
* Integer aggregates are cast to BIGINT on both sides (DuckDB ``sum(int)``
  is HUGEINT, Spark is LONG).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None -> rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, Query] = {}


def register(
    name: str, oracle: str | None, doc: str = "", tags: tuple[str, ...] = ()
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = Query(name, fn, oracle, doc, tags)
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    # import for side effect: modules self-register
    from crypto_data_pipeline_with_kafka_spark.plans import (  # noqa: F401
        q_dedup,
        q_indicators,
        q_relational,
        q_scalar,
        q_similarity,
        q_streaming,
        q_text,
        q_windows,
    )

    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in all_queries().items() if q.oracle is not None}
