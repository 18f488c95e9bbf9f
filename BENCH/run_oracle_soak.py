"""Determinism soak: replay EVERY registered oracle comparison under
a deliberately perturbed Spark config — odd core count, prime (and
mismatched) shuffle partition count — to catch results that secretly
depend on partitioning or parallelism (float fold order, unstable
window ties, per-partition state) before the driver's own harness
does. The pytest rehearsal pins local[4]/4; the driver does not
promise that config, so a query is only done when its oracle holds
under an arbitrary one.

Usage: python BENCH/run_oracle_soak.py [--master local[7]]
       [--partitions 13]   (exits nonzero on any mismatch)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--master", default="local[7]")
    ap.add_argument("--partitions", type=int, default=13)
    ap.add_argument("--only", default=None,
                    help="comma-separated query subset")
    args = ap.parse_args()

    import test_oracle_queries as reh  # the pytest harness, reused
    from textract_demo_spark.datapipe.dedup import release_cached
    from textract_demo_spark.engine.session import get_spark

    spark = get_spark(master=args.master, app="oracle-soak",
                      shuffle_partitions=args.partitions)
    names = sorted(reh.ORACLES)
    if args.only:
        names = [n for n in names if n in set(args.only.split(","))]
    failed: list[str] = []
    t0 = time.time()
    for i, name in enumerate(names, 1):
        try:
            df = reh.QUERIES[name](spark, reh.SF_DIR)
            got = reh._normalize(df.toPandas())
            release_cached(df)
            exp = reh._normalize(reh._duck(reh.ORACLES[name]))
            ok = (list(got.columns) == list(exp.columns)
                  and len(got) == len(exp)
                  and not (got != exp).any(axis=1).any())
        except Exception as e:  # noqa: BLE001 - soak must report all
            print(f"[{i}/{len(names)}] {name}: ERROR {e}")
            failed.append(name)
            continue
        if not ok:
            print(f"[{i}/{len(names)}] {name}: MISMATCH")
            failed.append(name)
        elif i % 10 == 0:
            print(f"[{i}/{len(names)}] ... ok through {name}")
    print(json.dumps({
        "master": args.master, "partitions": args.partitions,
        "n_queries": len(names), "failed": failed,
        "wall_sec": round(time.time() - t0, 1),
    }))
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
