#!/usr/bin/env python
"""Benchmark harness (driver contract): run the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Headline set = the flagship pipeline + the heavy representatives of each
operator family (window analytics, agg, as-of join, candles, dedup
family, similarity family, text scoring, real streaming) — the queries
whose plans matter at 100 TB.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from crypto_data_pipeline_with_kafka_spark.plans.registry import queries  # noqa: E402
from crypto_data_pipeline_with_kafka_spark.session import get_spark  # noqa: E402

HEADLINE = (
    "ind_pipeline",
    "agg_q1",
    "win_tumbling_candles",
    "win_sessionize",
    "rel_asof_join",
    "topk_per_group",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "sim_cosine_topk",
    "sim_ann_suite",
    "text_profile",
    "news_pipeline",  # sentiment hot path (built-in fold) + dim + anti-join
    "stream_tumbling_counts",
    "stream_interval_join",  # stateful stream-stream join (round 3)
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf"))
    except ValueError:
        sf = -1.0
    spark = get_spark(app_name="crypto_data_pipeline_with_kafka_spark-bench")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warm-up

    qs = queries()
    # JIT warm-up: run every headline query once on the TINY sf0.001
    # fixture so the benched samples measure the plan, not first-call
    # class-loading / whole-stage-codegen compilation (each query's
    # generated code differs, so warming one does not warm the rest —
    # measured: a cold first sample reads 2-4× the warm floor). The
    # warm-up data is 100× smaller than the benched SF dir and every
    # sample still clears the cache, so no benched bytes are
    # pre-materialized. Warm-up failures never fail the bench.
    for name in HEADLINE:
        try:
            qs[name](spark, "/root/testdata/sf0.001").count()
        except Exception as e:  # pragma: no cover - warm-up is best-effort
            print(f"# warm-up {name} failed: {e}", file=sys.stderr)
        spark.catalog.clearCache()
    per_query: dict[str, float] = {}
    per_samples: dict[str, list[float]] = {}
    for name in HEADLINE:
        samples: list[float] = []
        rows = 0
        # adaptive sampling: host-load noise swings queries ±40%, and a
        # flat min-of-2 can catch two bad samples back-to-back. Sample
        # until the two best runs agree within 20% (the reading is then
        # load-free, not a fluke), capped at 4; sub-second queries keep
        # their guaranteed 3rd sample
        while (
            len(samples) < 2
            or (min(samples) < 1.0 and len(samples) < 3)
            or (sorted(samples)[1] / min(samples) > 1.2 and len(samples) < 4)
        ):
            spark.catalog.clearCache()  # isolate queries: no leftover persists
            t0 = time.perf_counter()
            rows = qs[name](spark, sf_dir).count()
            samples.append(time.perf_counter() - t0)
        per_query[name] = round(min(samples), 3)
        per_samples[name] = [round(s, 3) for s in samples]
        print(
            f"# {name}: {per_query[name]:.3f}s ({rows} rows; "
            f"samples {per_samples[name]})",
            file=sys.stderr,
        )

    total = round(sum(per_query.values()), 3)
    # "samples" carries the raw convergence telemetry: n per query plus
    # every reading, so a high min is distinguishable from host-load
    # scatter (best two agreeing within 20% = a load-free reading; a
    # wide spread = a noisy window) without re-running the bench.
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": per_query,
                "samples": per_samples,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
