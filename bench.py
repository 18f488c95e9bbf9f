"""Benchmark runner (driver contract, BENCH_r{N}.json).

Runs the headline queries on local[$SPARK_GRAFT_CPUS] against
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) and prints ONE
JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec}, "sf": ..., "turns_per_sec": ...}

Headline = the extraction pipeline (the BASELINE.json metric is
turns/sec) over a distributed-generated synthetic transcript table,
plus representative operator queries over the sf parquet tables.
Scaling-efficiency evidence (local[8] vs local[32]) is produced by
BENCH/run_scaling.py, reported in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # big enough that the timed section (~45-60 s) amortizes task/
    # worker startup; ~9.6 turns/conv at the default mix
    n_convs = int(os.environ.get("SPARK_GRAFT_BENCH_CONVS", "60000"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from textract_demo_spark.engine.datagen import transcripts_df
    from textract_demo_spark.engine.pipeline import run_pipeline
    from textract_demo_spark.engine.queries import QUERIES
    from textract_demo_spark.engine.session import get_spark

    spark = get_spark(master=f"local[{cpus}]", app="bench")
    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    # -- headline: extraction throughput (turns/sec) --------------------
    # materialize the input once (not timed) so the timed section is
    # the pipeline alone, as if reading a pre-existing table
    import shutil
    import tempfile
    tmp_in = os.path.join(tempfile.gettempdir(),
                          f"bench_transcripts_{n_convs}")
    shutil.rmtree(tmp_in, ignore_errors=True)
    (transcripts_df(spark, n_convs, slices=int(cpus) * 4)
     .write.mode("overwrite").parquet(tmp_in))
    transcripts = spark.read.parquet(tmp_in)
    n_turns = transcripts.count()
    t0 = time.time()
    out = run_pipeline(transcripts, reviews=None, salt=16)
    n_rows = out.count()
    dt = time.time() - t0
    timings["extract_pipeline"] = round(dt, 3)
    extras["turns_per_sec"] = round(n_rows / dt, 1)
    extras["n_turns"] = n_turns
    shutil.rmtree(tmp_in, ignore_errors=True)

    # -- operator queries over the sf tables -----------------------------
    # steady-state timing: first run warms codegen/JIT + file index,
    # the recorded number is the second run
    for name in ("p_filter_project", "j1_containment_join",
                 "a1_first_line_vendor", "a2_ordered_concat",
                 "w2_top1_ranking", "u1_union_fallback",
                 "a12_confidence_histogram",
                 "extract_html_boilerplate_strip"):
        if name not in QUERIES:
            continue
        df = QUERIES[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()  # warm
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    print(json.dumps({
        "metric": "extraction+operator suite wall time",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        **extras,
    }))


if __name__ == "__main__":
    main()
