#!/usr/bin/env python
"""Scaling-efficiency evidence (BASELINE.json north_rule).

The rule's criterion — throughput scaling efficiency >= 0.8 from N to 4N
executors — cannot use a real cluster in this sandbox, so per the driver
instruction we run the SAME job on the SAME input at local[8] and
local[32] (N and 4N cores) and report throughput at both plus
efficiency = (T8/T32) / 4 per query and overall.

Writes BENCH_SCALING.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# amplify input so each core has real work: at raw sf0.1 the per-task
# compute is milliseconds and scheduler overhead dominates a 32-way run
MULT = os.environ.get("SPARK_GRAFT_MULT", "16")


def run_bench(cpus: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_SF_DIR=SF_DIR,
        SPARK_GRAFT_MULT=MULT,
    )
    out = subprocess.run(
        [sys.executable, "bench.py"], env=env, capture_output=True, text=True,
        cwd=os.path.dirname(os.path.abspath(__file__)), timeout=3600,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    r8 = run_bench(8)
    r32 = run_bench(32)
    rows = []
    effs = []
    for q in r8["queries"]:
        t8, t32 = r8["queries"][q], r32["queries"][q]
        speedup = t8 / t32 if t32 > 0 else float("nan")
        eff = speedup / 4.0
        effs.append(eff)
        rows.append((q, t8, t32, round(speedup, 2), round(eff, 3)))
    total_speedup = r8["value"] / r32["value"]
    total_eff = total_speedup / 4.0

    md = [
        "# BENCH_SCALING — local[8] vs local[32] (N vs 4N cores)\n",
        f"Input: `{SF_DIR}` (same input both runs). ",
        "Efficiency = (t_8core / t_32core) / 4; target >= 0.8 per the north rule ",
        "(sandbox evidence for the N->4N executor criterion, per driver instruction).\n",
        "| query | local[8] s | local[32] s | speedup | efficiency |",
        "|---|---|---|---|---|",
    ]
    for q, t8, t32, sp, eff in rows:
        md.append(f"| {q} | {t8} | {t32} | {sp}x | {eff} |")
    md.append(f"| **total** | {r8['value']} | {r32['value']} | {round(total_speedup,2)}x | {round(total_eff,3)} |")
    md.append("")
    md.append(f"Throughput at local[32]: {r32['spans_per_sec']} spans/sec, "
              f"{r32['docs_per_sec']} docs/sec (tile assignment), "
              f"{r32['boxes_per_sec']} boxes/sec (batch spatial join).")
    md.append(f"Throughput at local[8]:  {r8['spans_per_sec']} spans/sec, "
              f"{r8['docs_per_sec']} docs/sec, {r8['boxes_per_sec']} boxes/sec.")
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_SCALING.md"), "w") as fh:
        fh.write("\n".join(md) + "\n")

    print(json.dumps({
        "metric": "scaling_efficiency_8_to_32_cores",
        "value": round(total_eff, 3),
        "unit": "ratio",
        "per_query": {q: e for q, _, _, _, e in rows},
        "t8": r8["value"],
        "t32": r32["value"],
        "sf": r8["sf"],
    }))


if __name__ == "__main__":
    main()
