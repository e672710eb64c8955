"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is timed end-to-end: plan construction + execution to a count
of the materialized result (foreach-noop would skip result production;
count forces every operator including final projection aggregation).
A warmup query first amortizes JVM/codegen startup so numbers reflect
steady-state engine throughput, not JIT warmup.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from real_time_e_commerce_analytics_lakehouse_spark.plans import QUERIES
from real_time_e_commerce_analytics_lakehouse_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = Path(sf_dir).name.replace("sf", "")
    spark = get_spark(app_name="bench")

    bench_queries = [name for name, q in QUERIES.items() if q.bench]

    # warmup: run the flagship once to pay JVM/codegen/parquet-footer costs
    QUERIES["revenue_by_nation_status"].builder(spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name in bench_queries:
        t0 = time.perf_counter()
        QUERIES[name].builder(spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
