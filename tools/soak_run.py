"""sf1 soak (VERDICT r3 #8): time every bench query at sf0.1 and at the
10x soak dataset (tools/soak_gen.py), compute per-query scaling
exponents e = log(t_big/t_small)/log(10), and flag super-linear
queries (t_big > 10x t_small) that lack a documented fan-out reason.

Each query is timed as cold + one steady rerun per scale; the steady
time is the exponent input (codegen compilation amortized). Emits
soak_sf1.json and a markdown table for BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from real_time_e_commerce_analytics_lakehouse_spark.plans import QUERIES
from real_time_e_commerce_analytics_lakehouse_spark.session import get_spark

# Quadratic-by-design fan-outs (documented in their docstrings): pair
# generation scales with candidate-pair count, not row count. Names
# must be bench=True registry queries (validated in main()).
KNOWN_FANOUT = {
    "copurchase_part_pairs",  # basket self-join: pairs ~ sum(basket^2)
    "ngram_jaccard_pairs",    # token-blocked pair generation
    "lsh_candidate_pairs",    # collisions grow with near-dup density (soak data is 10x near-dup by construction)
}


def time_query(spark, name: str, sf_dir: str) -> tuple[float, float]:
    """Cold + concordant steady time (bench.py's protocol: single runs
    on this shared box swing up to ~2.8x with host noise, so keep
    sampling until the two fastest runs agree within 15%, max 4)."""

    def once() -> float:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        QUERIES[name].builder(spark, sf_dir).collect()
        return time.perf_counter() - t0

    cold = once()
    steady: list[float] = []
    for _ in range(4):
        steady.append(once())
        s = sorted(steady)
        if len(s) >= 2 and s[1] / max(s[0], 1e-9) <= 1.15:
            break
    return round(cold, 3), round(min(*steady, cold), 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", default="/root/testdata/sf0.1")
    ap.add_argument("--big", default="/tmp/sf1_soak")
    ap.add_argument("--factor", type=float, default=10.0)
    ap.add_argument("--out", default=str(Path(__file__).parent.parent / "soak_sf1.json"))
    a = ap.parse_args()

    spark = get_spark(app_name="soak")
    bench_queries = [n for n, q in QUERIES.items() if q.bench]
    stale = KNOWN_FANOUT - set(bench_queries)
    if stale:
        raise SystemExit(f"KNOWN_FANOUT names non-bench queries: {sorted(stale)}")
    # warmup
    QUERIES["revenue_by_nation_status"].builder(spark, a.small).collect()

    rows = []
    for name in bench_queries:
        c_s, t_s = time_query(spark, name, a.small)
        c_b, t_b = time_query(spark, name, a.big)
        # floor timings for the ratio/log math: a sub-millisecond steady
        # time would divide by zero / hit log(0)
        ts_f, tb_f = max(t_s, 1e-3), max(t_b, 1e-3)
        exp = round(math.log(tb_f / ts_f) / math.log(a.factor), 2)
        flag = tb_f > a.factor * ts_f and name not in KNOWN_FANOUT
        rows.append(
            {
                "query": name,
                "small_steady": t_s,
                "small_cold": c_s,
                "big_steady": t_b,
                "big_cold": c_b,
                "ratio": round(tb_f / ts_f, 2),
                "exponent": exp,
                "known_fanout": name in KNOWN_FANOUT,
                "flag_superlinear": flag,
            }
        )
        print(json.dumps(rows[-1], separators=(",", ":")), flush=True)

    with open(a.out, "w") as f:
        json.dump(
            {"factor": a.factor, "small": a.small, "big": a.big, "rows": rows},
            f,
            indent=1,
        )

    flagged = [r for r in rows if r["flag_superlinear"]]
    print(f"\nflagged super-linear (no documented fan-out): {[r['query'] for r in flagged]}")

    # markdown table for BASELINE.md
    md = [
        f"| query | {a.small} s | {a.big} s | ratio | exponent | note |",
        "| --- | --- | --- | --- | --- | --- |",
    ]
    for r in sorted(rows, key=lambda r: -r["ratio"]):
        note = "fan-out (documented)" if r["known_fanout"] else ("**super-linear**" if r["flag_superlinear"] else "")
        md.append(
            f"| {r['query']} | {r['small_steady']} | {r['big_steady']} |"
            f" {r['ratio']}x | {r['exponent']} | {note} |"
        )
    print("\n".join(md))


if __name__ == "__main__":
    main()
