"""Run every registered query against its DuckDB oracle, mirroring the
driver's CORRECTNESS gate. sf0.001 by default (fast); set
TEST_SF_DIR=/root/testdata/sf0.01 for the driver-scale check."""

from __future__ import annotations

import pytest

from crypto_data_pipeline_with_kafka_spark.plans.registry import all_queries
from tests.oracle_utils import compare

QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_correct, name):
    q = QUERIES[name]
    df = q.fn(spark, sf_correct)
    if q.oracle is None:
        assert df.count() >= 0  # rows-only check (driver's weaker gate)
        assert len(df.schema.fields) > 0
    else:
        compare(df, q.oracle, sf_correct)
