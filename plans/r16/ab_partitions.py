#!/usr/bin/env python
"""Interleaved same-JVM A/B of AQE partition-coalescing settings
(optimization round 16, guide §2.2 "fewer, larger reduce partitions").
Usage: python plans/r16/ab_partitions.py [rounds] [query ...]

Variants (runtime SQL confs, reset between samples):
  base : shipped defaults (parallelismFirst=true, minPartitionSize=1m)
  pf   : coalescePartitions.parallelismFirst=false (respect the 64m
         advisory size — the Spark-docs-recommended setting)
  mps4 : parallelismFirst=true + minPartitionSize=4m (coalesce only
         genuinely tiny shuffles below 4 MB/partition)

Timing mimics bench.py: clearCache() then .count() per sample,
variants interleaved round-robin so host drift hits all equally.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from crypto_data_pipeline_with_kafka_spark.plans.registry import queries  # noqa: E402
from crypto_data_pipeline_with_kafka_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

VARIANTS = {
    "base": {
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "true",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "1m",
    },
    "pf": {
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "1m",
    },
    "mps4": {
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "true",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "4m",
    },
}


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    names = sys.argv[2:] or [
        "dedup_ngram_jaccard",
        "dedup_minhash_lsh",
        "dedup_simhash",
        "sim_cosine_topk",
        "win_tumbling_candles",
    ]
    qs = queries()
    spark = get_spark(app_name="ab-partitions")
    # JIT warm-up, the bench protocol
    for name in names:
        qs[name](spark, "/root/testdata/sf0.001").count()
        spark.catalog.clearCache()
    results: dict[str, dict[str, list[float]]] = {
        n: {v: [] for v in VARIANTS} for n in names
    }
    for r in range(rounds):
        for variant, confs in VARIANTS.items():
            for k, v in confs.items():
                spark.conf.set(k, v)
            for name in names:
                spark.catalog.clearCache()
                spark.sparkContext.setJobDescription(f"{name} [{variant} r{r}]")
                t0 = time.perf_counter()
                qs[name](spark, SF_DIR).count()
                dt = time.perf_counter() - t0
                results[name][variant].append(round(dt, 3))
                print(f"r{r} {variant:5s} {name:24s} {dt:6.3f}s", flush=True)
    print("\n== mins ==")
    for name in names:
        mins = {v: min(t) for v, t in results[name].items()}
        print(name, mins)


if __name__ == "__main__":
    main()
