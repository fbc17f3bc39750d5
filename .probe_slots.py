#!/usr/bin/env python
"""Ad-hoc driver-pace probe for selected headline slots (round-13
watch items): replicates bench.py's protocol — JVM warm-up, sf0.001
JIT warm-up, clearCache-isolated samples at sf0.1 — for just the
slots named on the command line. Not a driver artifact; diagnostics
only."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from crypto_data_pipeline_with_kafka_spark.plans.registry import queries  # noqa: E402
from crypto_data_pipeline_with_kafka_spark.session import get_spark  # noqa: E402

names = sys.argv[1:] or ["dedup_ngram_jaccard", "sim_ann_suite"]
n_samples = max(1, int(os.environ.get("PROBE_SAMPLES", "5")))
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spark = get_spark(app_name="probe-slots")
spark.range(1_000_000).selectExpr("sum(id)").collect()
qs = queries()
out = {}
for name in names:
    try:
        qs[name](spark, "/root/testdata/sf0.001").count()
    except Exception as e:
        print(f"# warm-up {name} failed: {e}", file=sys.stderr)
    spark.catalog.clearCache()
    samples = []
    for _ in range(n_samples):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        rows = qs[name](spark, sf_dir).count()
        samples.append(round(time.perf_counter() - t0, 3))
    out[name] = {"min": min(samples), "samples": samples, "rows": rows}
    print(f"# {name}: min {min(samples)} samples {samples}", file=sys.stderr)
print(json.dumps(out))
