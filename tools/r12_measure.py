"""Round-12 optimization measurement harness (guide §1).

For each named query (default: the bench headline set):
- dumps `.explain("formatted")` to plans/r12/<query>_<tag>.txt
- times the bench-methodology action (collect, AQE in play) cold + best
  of N steady runs
- times one noop-sink write (guide §1.4) for sink-free comparison
- labels jobs via setJobDescription so any UI/eventlog trace is readable

New vs tools/r11_measure.py (VERDICT r11 "what's wrong" #2): queries
whose iterative stages hide behind localCheckpoint (`Scan ExistingRDD`
in the final plan) get their PRE-checkpoint stage plans dumped too —
`--stage-plans` installs operators.graph.PLAN_AUDIT_HOOK so every frame
passed to a CC `_materialize` is explained BEFORE lineage truncation,
written as plans/r12/<query>_stage<NN>_<tag>.txt. The hook runs no
actions, so the timed numbers are taken WITHOUT it (plan dump and
timing are separate passes).

Usage: python tools/r12_measure.py [--tag before|after] [--sf DIR]
                                   [--runs N] [--noop] [--stage-plans]
                                   [query ...]
Writes a JSON summary to /tmp/r12_measure_<tag>.json and prints it.
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path
import sys

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from real_time_e_commerce_analytics_lakehouse_spark.plans import QUERIES
from real_time_e_commerce_analytics_lakehouse_spark.session import get_spark


def formatted_plan(df) -> str:
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="before")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--noop", action="store_true", help="also time a noop-sink write")
    ap.add_argument(
        "--stage-plans",
        action="store_true",
        help="dump pre-checkpoint CC stage plans (plan pass only)",
    )
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    spark = get_spark(app_name="r12_measure")
    from real_time_e_commerce_analytics_lakehouse_spark.operators import graph
    from real_time_e_commerce_analytics_lakehouse_spark.operators.simsearch import (
        release_cached,
    )

    names = args.queries or [n for n, q in QUERIES.items() if q.bench]
    plans_dir = Path(__file__).resolve().parent.parent / "plans" / "r12"
    plans_dir.mkdir(parents=True, exist_ok=True)

    # warmup: pay JVM/codegen/footer costs outside the timings
    spark.sparkContext.setJobDescription("r12 warmup")
    QUERIES["revenue_by_nation_status"].builder(spark, args.sf).collect()

    out: dict = {}
    for name in names:
        spark.catalog.clearCache()
        stage_counter = {"n": 0}
        if args.stage_plans:
            # capture each frame handed to a CC _materialize before its
            # lineage is truncated — this is the only way the per-round
            # plan shape is auditable from committed artifacts
            def _hook(df, _name=name, _ctr=stage_counter):
                _ctr["n"] += 1
                (plans_dir / f"{_name}_stage{_ctr['n']:02d}_{args.tag}.txt").write_text(
                    formatted_plan(df)
                )

            graph.PLAN_AUDIT_HOOK = _hook
        try:
            df = QUERIES[name].builder(spark, args.sf)
            (plans_dir / f"{name}_{args.tag}.txt").write_text(formatted_plan(df))
            release_cached(df)
        finally:
            graph.PLAN_AUDIT_HOOK = None
        spark.catalog.clearCache()

        def run_once() -> float:
            # builder INSIDE the timing, like bench.py: several builders
            # do eager work (CC rounds, index builds, codebook collects)
            t0 = time.perf_counter()
            df = QUERIES[name].builder(spark, args.sf)
            df.collect()
            dt = time.perf_counter() - t0
            release_cached(df)
            return dt

        spark.sparkContext.setJobDescription(f"r12 {name} cold")
        cold = run_once()
        steady = []
        for i in range(args.runs):
            spark.sparkContext.setJobDescription(f"r12 {name} steady{i}")
            steady.append(run_once())
        rec = {"cold": round(cold, 3), "steady": round(min(steady), 3),
               "steady_all": [round(s, 3) for s in steady]}
        if args.noop:
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"r12 {name} noop")
            t0 = time.perf_counter()
            df = QUERIES[name].builder(spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            rec["noop"] = round(time.perf_counter() - t0, 3)
            release_cached(df)
        if stage_counter["n"]:
            rec["stage_plans"] = stage_counter["n"]
        out[name] = rec
        print(name, rec, flush=True)
        spark.sparkContext.setJobDescription(None)

    dest = Path(f"/tmp/r12_measure_{args.tag}.json")
    dest.write_text(json.dumps(out, indent=1))
    print(json.dumps({"total_steady": round(sum(r["steady"] for r in out.values()), 3),
                      "n": len(out), "file": str(dest)}))


if __name__ == "__main__":
    main()
