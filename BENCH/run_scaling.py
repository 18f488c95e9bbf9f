"""Scaling-efficiency evidence: the identical extraction job on the
identical pre-generated input at two parallelism levels — local[8]
(N) and local[32] (4N) — via separate spark-submit processes (fresh
JVM each), per the sandbox protocol in BASELINE.md (no real cluster
available; the north rule's N vs 4N executors criterion is evidenced
by N vs 4N cores).

Writes BENCH/scaling.json and regenerates the results table in
BENCH/BASELINE.md.

Usage:  python BENCH/run_scaling.py [--n-convs 20000] [--cores 8 32]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def generate_input(n_convs: int, path: str) -> int:
    sys.path.insert(0, ROOT)
    from textract_demo_spark.engine.datagen import transcripts_df
    from textract_demo_spark.engine.session import get_spark
    spark = get_spark(master="local[32]", app="scaling-datagen")
    (transcripts_df(spark, n_convs, slices=256)
     .write.mode("overwrite").parquet(path))
    n = spark.read.parquet(path).count()
    spark.stop()
    return n


def run_at(cores: int, input_path: str, zip_path: str) -> dict:
    out_dir = tempfile.mkdtemp(prefix=f"scaling_out_{cores}_")
    cmd = [
        "spark-submit",
        "--master", f"local[{cores}]",
        "--conf", f"spark.sql.shuffle.partitions={2 * cores}",
        "--conf", "spark.driver.memory=48g",
        "--conf", "spark.sql.session.timeZone=UTC",
        "--conf", "spark.sql.adaptive.enabled=true",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.sql.execution.arrow.maxRecordsPerBatch=128",
        "--py-files", zip_path,
        os.path.join(ROOT, "jobs", "run_extract.py"),
        "--input", input_path, "--out", out_dir, "--buckets", "64",
        "--salt", "16",
    ]
    t0 = time.time()
    proc = subprocess.run(cmd, capture_output=True, text=True,
                          timeout=3600)
    total = time.time() - t0
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-4000:])
        raise RuntimeError(f"spark-submit local[{cores}] failed")
    stats = json.loads(proc.stdout.strip().splitlines()[-1])
    shutil.rmtree(out_dir, ignore_errors=True)
    return {"cores": cores, "wall_sec": stats["wall_sec"],
            "rows": stats["rows_total"],
            "turns_per_sec": round(stats["rows_total"]
                                   / stats["wall_sec"], 1),
            "total_proc_sec": round(total, 1)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-convs", type=int, default=20000)
    ap.add_argument("--cores", type=int, nargs=2, default=[8, 32])
    args = ap.parse_args()

    zip_path = subprocess.check_output(
        [sys.executable, os.path.join(ROOT, "jobs", "build_pyfiles.py")],
        text=True).strip()

    input_path = os.path.join(tempfile.gettempdir(),
                              f"scaling_input_{args.n_convs}")
    if not os.path.exists(os.path.join(input_path, "_SUCCESS")):
        print(f"generating input ({args.n_convs} convs) ...",
              file=sys.stderr)
        n = generate_input(args.n_convs, input_path)
        print(f"input rows: {n}", file=sys.stderr)

    n_lo, n_hi = args.cores
    results = []
    for cores in (n_lo, n_hi):
        print(f"running local[{cores}] ...", file=sys.stderr)
        r = run_at(cores, input_path, zip_path)
        print(json.dumps(r), file=sys.stderr)
        results.append(r)

    lo, hi = results
    eff = hi["turns_per_sec"] / ((n_hi / n_lo) * lo["turns_per_sec"])
    report = {
        "protocol": f"identical job+input, local[{n_lo}] vs local[{n_hi}]"
                    " (sandbox stand-in for N vs 4N executors)",
        "input_rows": lo["rows"],
        "runs": results,
        "scaling_factor": n_hi / n_lo,
        "efficiency": round(eff, 3),
        "pass": eff >= 0.8,
    }
    with open(os.path.join(ROOT, "BENCH", "scaling.json"), "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps(report, indent=1))

    md = f"""# BENCH/BASELINE — measured scaling evidence

Protocol (BASELINE.md): identical extraction job (`jobs/run_extract.py`,
full pipeline + IcebergLike partitioned write with manifests) on the
identical pre-generated deterministic input
({lo['rows']:,} turns, seed 42), run via `spark-submit --py-files` in a
fresh JVM at two parallelism levels. Wall time excludes session
startup (measured inside the job).

| parallelism | wall (s) | turns/sec |
|---|---|---|
| local[{n_lo}] (N) | {lo['wall_sec']} | {lo['turns_per_sec']:,} |
| local[{n_hi}] (4N) | {hi['wall_sec']} | {hi['turns_per_sec']:,} |

**Scaling efficiency** = throughput({n_hi}) / ({n_hi // n_lo} x
throughput({n_lo})) = **{eff:.3f}** (target >= 0.8:
{"PASS" if eff >= 0.8 else "FAIL"}).
"""
    with open(os.path.join(ROOT, "BENCH", "BASELINE.md"), "w") as fh:
        fh.write(md)


if __name__ == "__main__":
    main()
