#!/usr/bin/env python
"""Capture .explain('formatted') + job/stage telemetry for registered
queries (optimization round 16). Usage:
    python plans/r16/capture_plans.py <suffix> [query ...]
Writes plans/r16/<query>_<suffix>.txt and prints one summary line per
query: wall seconds (count() on a cache-cleared session), # jobs the
action ran, # Exchange / BroadcastExchange nodes in the formatted plan.
Streaming-backed queries (stream_*) execute real micro-batches inside
the plan function; their formatted plan is still captured.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from crypto_data_pipeline_with_kafka_spark.plans.registry import queries  # noqa: E402
from crypto_data_pipeline_with_kafka_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.dirname(os.path.abspath(__file__))


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    qs = queries()
    if not names:
        names = list(qs)
    spark = get_spark(app_name="plan-capture")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    for name in names:
        spark.catalog.clearCache()
        sc.setJobDescription(f"{name} [{suffix}]")
        j0 = len(tracker.getJobIdsForGroup(None) or [])
        t0 = time.perf_counter()
        df = qs[name](spark, SF_DIR)
        t_plan = time.perf_counter() - t0
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        t1 = time.perf_counter()
        rows = df.count()
        wall = time.perf_counter() - t1
        # job ids are global; count all jobs since j0 (works because we
        # run queries sequentially in this session)
        import re

        j1 = max((tracker.getJobIdsForGroup(None) or [-1])) + 1
        n_jobs = j1 - j0 if j1 >= j0 else -1
        n_ex = len(re.findall(r"\bExchange\b", plan))
        n_bx = plan.count("BroadcastExchange")
        with open(os.path.join(OUT, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print(
            f"{name:26s} plan={t_plan:6.2f}s run={wall:6.2f}s rows={rows:7d} "
            f"jobs={n_jobs:3d} exchanges={n_ex:2d} (bcast {n_bx})",
            flush=True,
        )
    sc.setJobDescription(None)


if __name__ == "__main__":
    main()
