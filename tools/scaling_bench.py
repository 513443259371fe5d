"""Two-parallelism scaling evidence for BENCH/BASELINE.md.

The north rule's ≥0.8 N→4N-executor scaling efficiency cannot be run on
a real cluster in this sandbox; per the driver instruction the same job
runs at two local parallelism levels (default local[8] vs local[32]) on
the same input, reporting pages/sec at both plus
efficiency = (T_N / T_4N) / 4.

Each measurement runs in a fresh subprocess (own JVM) so the two levels
don't share executor state. The job is the flagship pages pipeline
(pliers_spark/pages_pipeline.py) on a seeded synthetic pages table.

Usage: python tools/scaling_bench.py [--n-urls 300000] [--low 8] [--high 32]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, time
os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")
sys.path.insert(0, {repo!r})
from pliers_spark.session import get_spark
from pliers_spark.pages_pipeline import pages_flagship

spark = get_spark("scaling-{cpus}", cpus={cpus}, shuffle_partitions={cpus})
df = spark.read.parquet({path!r})
n_pages = df.count()  # warm: JVM, parquet footers
wall = float("inf")
for _ in range(2):  # best-of-2: first run pays JIT compilation
    t0 = time.time()
    out = pages_flagship(spark, {path!r})
    out.write.format("noop").mode("overwrite").save()
    wall = min(wall, time.time() - t0)
print("RESULT " + json.dumps({{"cpus": {cpus}, "wall_s": round(wall, 2),
      "n_pages": n_pages, "pages_per_sec": round(n_pages / wall, 1)}}))
spark.stop()
"""


def measure(path: str, cpus: int) -> dict:
    code = CHILD.format(repo=REPO, cpus=cpus, path=path)
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=3000
    )
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT line (rc={proc.returncode}):\n{proc.stderr[-3000:]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-urls", type=int, default=800_000)
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    ap.add_argument("--path", default=os.path.join(REPO, "data", "pages_bench.parquet"))
    args = ap.parse_args()

    if not os.path.exists(args.path):
        os.makedirs(os.path.dirname(args.path), exist_ok=True)
        sys.path.insert(0, REPO)
        from pliers_spark.synthgen import write_pages

        t0 = time.time()
        write_pages(args.path, n_urls=args.n_urls, max_snapshots=6, n_domains=200, seed=42)
        print(f"generated pages table in {time.time()-t0:.1f}s → {args.path}")

    low = measure(args.path, args.low)
    high = measure(args.path, args.high)
    factor = args.high / args.low
    eff = (low["wall_s"] / high["wall_s"]) / factor
    result = {
        "job": "pages_flagship (extract + windowed features + as-of join)",
        "input_rows": low["n_pages"],
        "low": low,
        "high": high,
        "speedup": round(low["wall_s"] / high["wall_s"], 2),
        "parallelism_factor": factor,
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(result, indent=2))
    out_path = os.path.join(REPO, "bench_results", "scaling.json")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
