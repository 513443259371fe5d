"""API-drift checker — the engine's analog of the reference's golden-hash
updater (``pliers/utils/updater.py:26-98``, which records extractor
output hashes over time and reports drift).

Records an order-insensitive sha256 over every registered query's
normalized result at sf0.001 into ``tests/golden_hashes.json``; a later
run with ``--check`` reports any query whose output changed. Refresh
intentionally after a semantic change with ``--update``.

Usage:
    python tools/golden_hashes.py --update           # (re)record all
    python tools/golden_hashes.py --check [names...] # verify
"""

from __future__ import annotations

import argparse
import hashlib
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "..", "tests", "golden_hashes.json")
SF_DIR = os.environ.get("SPARK_GRAFT_GOLDEN_SF", "/root/testdata/sf0.001")


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return round(v, 6)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return v


def result_hash(df) -> str:
    cols = sorted(c.lower() for c in df.columns)
    idx = [([c.lower() for c in df.columns]).index(c) for c in cols]
    rows = sorted(
        json.dumps([norm_cell(r[i]) for i in idx], default=str) for r in df.collect()
    )
    h = hashlib.sha256()
    h.update(json.dumps(cols).encode())
    for r in rows:
        h.update(r.encode())
    return h.hexdigest()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--update", action="store_true")
    ap.add_argument("--check", action="store_true")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()
    if not (args.update or args.check):
        ap.error("pass --update or --check")

    from pliers_spark.queries import QUERIES
    from pliers_spark.session import get_spark

    spark = get_spark("golden", cpus=8, shuffle_partitions=8)
    names = args.names or sorted(QUERIES)
    golden = {}
    if os.path.exists(GOLDEN_PATH):
        golden = json.load(open(GOLDEN_PATH))

    drift = []
    for name in names:
        try:
            h = result_hash(QUERIES[name](spark, SF_DIR))
        except Exception as e:  # noqa: BLE001 — report, keep sweeping
            print(f"{name:28s} ERROR {type(e).__name__}: {e}")
            drift.append(name)
            continue
        if args.update:
            golden[name] = h
            print(f"{name:28s} recorded {h[:12]}")
        else:
            old = golden.get(name)
            status = "OK" if old == h else ("NEW" if old is None else "DRIFT")
            if status != "OK":
                drift.append(name)
            print(f"{name:28s} {status}")

    if args.update:
        json.dump(golden, open(GOLDEN_PATH, "w"), indent=0, sort_keys=True)
        print(f"wrote {len(golden)} hashes -> {GOLDEN_PATH}")
    elif drift:
        print(f"{len(drift)} drifted/new/errored: {', '.join(drift)}")
        sys.exit(1)


if __name__ == "__main__":
    main()
