#!/usr/bin/env python
"""Mini-bench replicating bench.py's measurement protocol for a subset
of queries: sf0.001 JIT warm-up for each, then clearCache-isolated
samples at sf0.1, report min. Usage:
    python plans/r15/minibench.py <label> <query> [query ...]
Env: SPARK_GRAFT_SAMPLES (default 4).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from crypto_data_pipeline_with_kafka_spark.plans.registry import queries  # noqa: E402
from crypto_data_pipeline_with_kafka_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N = int(os.environ.get("SPARK_GRAFT_SAMPLES", "4"))


def main() -> None:
    label = sys.argv[1]
    names = sys.argv[2:]
    spark = get_spark(app_name=f"minibench-{label}")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    qs = queries()
    for n in names:
        try:
            qs[n](spark, "/root/testdata/sf0.001").count()
        except Exception as e:  # pragma: no cover
            print(f"# warm-up {n} failed: {e}", file=sys.stderr)
        spark.catalog.clearCache()
    for n in names:
        samples = []
        rows = 0
        for _ in range(N):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            rows = qs[n](spark, SF).count()
            samples.append(round(time.perf_counter() - t0, 3))
        print(
            f"[{label}] {n:26s} min={min(samples):6.3f} rows={rows} "
            f"samples={samples}",
            flush=True,
        )


if __name__ == "__main__":
    main()
