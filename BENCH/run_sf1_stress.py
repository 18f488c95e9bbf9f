"""sf1.0-scale stress run (round-3): ~5.7M turns (600k conversations,
10x the sf0.1 bench volume) through (a) the extraction pipeline alone
(Arrow batch caps, salted exchange at volume) and (b) the FULL job via
spark-submit --py-files with the IcebergLike commit at 4096 buckets
(staging REBALANCE + thread-pooled promotes at a bucket count 128x
the default test size).

Single-run protocol (this VM drifts up to 2x; see BASELINE.md) — the
numbers evidence that the plan survives the volume, not a best-of
throughput claim. Writes BENCH/SF1_STRESS.json.

Usage: python BENCH/run_sf1_stress.py [--n-convs 600000]
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
sys.path.insert(0, ROOT)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-convs", type=int, default=600000)
    ap.add_argument("--buckets", type=int, default=4096)
    args = ap.parse_args()

    from textract_demo_spark.engine.datagen import transcripts_df
    from textract_demo_spark.engine.pipeline import run_pipeline
    from textract_demo_spark.engine.session import get_spark

    in_dir = os.path.join(tempfile.gettempdir(), "sf1_stress_input")
    out_dir = os.path.join(tempfile.gettempdir(), "sf1_stress_out")
    shutil.rmtree(in_dir, ignore_errors=True)
    shutil.rmtree(out_dir, ignore_errors=True)

    spark = get_spark(master="local[32]", app="sf1-stress",
                      extra={"spark.driver.memory": "24g"})
    (transcripts_df(spark, args.n_convs, slices=512)
     .write.mode("overwrite").parquet(in_dir))
    transcripts = spark.read.parquet(in_dir)
    n_turns = transcripts.count()

    # (a) pipeline alone (the BENCH_r* headline at 10x volume)
    t0 = time.time()
    n_rows = run_pipeline(transcripts, reviews=None, salt=16).count()
    pipe_sec = time.time() - t0
    spark.stop()

    # (b) full job incl. 4096-bucket IcebergLike commit, fresh JVM,
    # north-rule packaging (spark-submit --py-files)
    subprocess.run([sys.executable, os.path.join(ROOT, "jobs",
                                                 "build_pyfiles.py")],
                   check=True, cwd=ROOT)
    t0 = time.time()
    proc = subprocess.run(
        ["spark-submit", "--master", "local[32]",
         "--driver-memory", "24g",
         "--py-files", os.path.join(ROOT, "build",
                                    "textract_demo_spark.zip"),
         os.path.join(ROOT, "jobs", "run_extract.py"),
         "--input", in_dir, "--buckets", str(args.buckets),
         "--out", out_dir],
        capture_output=True, text=True, cwd=ROOT)
    job_sec = time.time() - t0
    if proc.returncode != 0:
        sys.stderr.write(proc.stdout[-4000:] + proc.stderr[-4000:])
        raise SystemExit(proc.returncode)
    job_line = [ln for ln in proc.stdout.splitlines()
                if ln.startswith("{")][-1]
    job = json.loads(job_line)

    n_files = sum(len(fs) for _, _, fs in os.walk(out_dir))
    record = {
        "n_convs": args.n_convs, "n_turns": n_turns,
        "pipeline_only_sec": round(pipe_sec, 2),
        "pipeline_turns_per_sec": round(n_rows / pipe_sec, 1),
        "full_job": job, "full_job_wall_sec_incl_jvm": round(job_sec, 2),
        "buckets": args.buckets, "out_files": n_files,
    }
    with open(os.path.join(ROOT, "BENCH", "SF1_STRESS.json"), "w") as fh:
        json.dump(record, fh, indent=1)
    print(json.dumps(record))
    shutil.rmtree(in_dir, ignore_errors=True)
    shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
