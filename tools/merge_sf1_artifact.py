"""Merge the sharded sf1 correctness runs into CORRECTNESS_SF1_r10.json
(VERDICT r9 next #1). Inputs: the shard/fix part-JSONs written by
check_correctness --json, newest result wins per query; the first
(killed) runner's log-only passes are parsed from its log. Two queries
are excluded with documented reasons (their OUTPUT is quadratic in the
soak corpus's near-dup density — collecting ~200M pairs on both
engines is a harness limit, not an engine one; their consumers are
verified at sf1 instead)."""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

EXCLUDED = {
    "fuzzy_part_name_matches": (
        "output-quadratic on the 10x-replicated soak corpus (~196M pairs; "
        "1.95M verified at sf0.1); its consumer entity_resolution_parts "
        "IS verified at sf1 over the identical group-pair edges"
    ),
    "simhash_band_pairs": (
        "output-quadratic on the 10x-replicated soak corpus (band "
        "collisions; 2.28M rows verified at sf0.1; collect exceeds "
        "spark.driver.maxResultSize at sf1 on both engines)"
    ),
}


def main() -> int:
    parts = sys.argv[1:-1]
    out_path = sys.argv[-1]
    merged: dict[str, dict] = {}
    for p in parts:
        p = Path(p)
        if p.suffix == ".json":
            doc = json.loads(p.read_text())
            for name, row in doc["queries"].items():
                # later inputs win (fix re-runs listed after shard runs)
                merged[name] = row
        else:  # a log: parse PASS lines only (killed runner, no JSON)
            for m in re.finditer(
                r"\[PASS\] (\S+): (?:ok|rows-only) \((\d+) rows\)",
                p.read_text(),
            ):
                merged.setdefault(
                    m.group(1),
                    {"pass": True, "rows": int(m.group(2)), "msg": None},
                )
    for q in EXCLUDED:
        merged.pop(q, None)
    import subprocess

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from real_time_e_commerce_analytics_lakehouse_spark.plans import QUERIES

    expected = [n for n in QUERIES if n not in EXCLUDED]
    missing = [n for n in expected if n not in merged]
    extra = [n for n in merged if n not in expected]
    passed = sum(1 for r in merged.values() if r["pass"])
    artifact = {
        "sf_dir": "/tmp/sf1_soak",
        "round": 10,
        "passed": passed,
        "total": len(merged),
        "registered": len(QUERIES),
        "excluded": {q: why for q, why in EXCLUDED.items()},
        "missing": missing,
        "commit": subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True,
        ).stdout.strip(),
        "queries": {n: merged[n] for n in expected if n in merged},
    }
    Path(out_path).write_text(json.dumps(artifact, indent=1))
    fails = [n for n, r in merged.items() if not r["pass"]]
    print(f"{passed}/{len(merged)} merged; missing={missing}; "
          f"extra={extra}; fails={fails}")
    return 1 if fails or missing else 0


if __name__ == "__main__":
    raise SystemExit(main())
