"""Input-scaling evidence: does flagship throughput HOLD as the input
grows, at fixed parallelism?

The core-count scaling bench (tools/scaling_bench.py) fixes the input
and varies cores; this tool fixes cores (local[16] — the sandbox's real
capacity ceiling) and varies the input (the 2.8M-page bench table vs a
~10M-page table from the same generator). A scan-dominated pipeline
whose plan is healthy should hold pages/sec roughly constant as the
input grows; a super-linear blow-up (all-pairs join, driver collect,
unbounded window state) shows up as throughput collapse.

Writes bench_results/input_scaling.json:
  {small: {rows, median_wall_s, pages_per_sec},
   large: {...}, throughput_ratio}

Run on a QUIET machine (same caveat as scaling_bench).
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import sys, time
sys.path.insert(0, {repo!r})
from pliers_spark.session import get_spark
from pliers_spark.pages_pipeline import pages_flagship

spark = get_spark("input-scaling", cpus={cpus}, shuffle_partitions={cpus})
spark.sparkContext.setLogLevel("ERROR")
n = spark.read.parquet({path!r}).count()
for i in range({iters}):
    t0 = time.monotonic()
    pages_flagship(spark, {path!r}).write.format("noop").mode("overwrite").save()
    print("ITER %d %.3f %d" % (i, time.monotonic() - t0, n), flush=True)
"""


def run_level(path: str, cpus: int, iters: int) -> tuple[int, float]:
    code = CHILD.format(repo=REPO, cpus=cpus, path=path, iters=iters)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, check=True
    ).stdout
    walls, rows = [], 0
    for line in out.splitlines():
        if line.startswith("ITER"):
            _, _, w, n = line.split()
            walls.append(float(w))
            rows = int(n)
    return rows, statistics.median(walls)


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--small", default=os.path.join(REPO, "data", "pages_bench.parquet"))
    ap.add_argument("--large", default=os.path.join(REPO, "data", "pages_bench_10m.parquet"))
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument(
        "--out", default=os.path.join(REPO, "bench_results", "input_scaling.json")
    )
    args = ap.parse_args()

    result = {}
    for name, path in (("small", args.small), ("large", args.large)):
        rows, wall = run_level(path, args.cpus, args.iters)
        result[name] = {
            "rows": rows,
            "median_wall_s": round(wall, 2),
            "pages_per_sec": round(rows / wall, 1),
        }
        print(name, result[name], flush=True)
    result["cpus"] = args.cpus
    result["throughput_ratio"] = round(
        result["large"]["pages_per_sec"] / result["small"]["pages_per_sec"], 3
    )
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
