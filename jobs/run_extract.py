"""spark-submit entrypoint: extraction pipeline over the transcript
table with per-partition IcebergLike commits + resume.

Usage (north-rule packaging, BASELINE.json:14):
    python jobs/build_pyfiles.py
    spark-submit --master local[8] \
        --py-files build/textract_demo_spark.zip \
        jobs/run_extract.py --n-convs 2000 --out /tmp/extract_out \
        --buckets 32 [--input /path/to/transcripts_parquet]

Re-running after a kill resumes: committed partitions are detected
from their manifests and skipped before the Spark job starts.

Output schema note: the committed table includes the per-row stats
columns (n_blocks_kept, n_blocks_dropped, conf_hist) computed by
with_block_stats — they are part of the table contract (cheap scalar
lineage alongside the data). Tables written before these columns
existed still read consistently: IcebergLike.read applies the schema
recorded in the snapshot manifest, so older partitions surface the
missing columns as null instead of depending on which parquet footer
Spark samples.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-convs", type=int, default=500,
                    help="synthetic transcript conversations (ignored"
                         " when --input is given)")
    ap.add_argument("--input", default=None,
                    help="optional parquet transcripts table to read"
                         " instead of synthesizing")
    ap.add_argument("--out", required=True)
    ap.add_argument("--buckets", type=int, default=32,
                    help="IcebergLike partition buckets")
    ap.add_argument("--salt", type=int, default=16,
                    help="skew salt for hot conversations")
    ap.add_argument("--fail-after", type=int, default=None,
                    help="inject a crash after N partition commits"
                         " (resume testing)")
    ap.add_argument("--compact", action="store_true",
                    help="after committing, rewrite small-file"
                         " partitions (>= --compact-min-files parquet"
                         " files) into ~--compact-target-mb files —"
                         " the Iceberg rewrite_data_files analog")
    ap.add_argument("--compact-min-files", type=int, default=2)
    ap.add_argument("--compact-target-mb", type=int, default=128)
    ap.add_argument("--expire-keep-last", type=int, default=0,
                    help="after the commit, expire snapshot history"
                         " down to the newest N (0 = keep all; live"
                         " equality-delete snapshots always survive)")
    ap.add_argument("--conv-report", action="store_true",
                    help="also write a conversation-integrity report"
                         " next to the table: per-conv stats + keep"
                         " verdict (<out>/conv_stats) and the top-50"
                         " tool-transition bigrams"
                         " (<out>/tool_transitions)")
    ap.add_argument("--conv-max-gap-minutes", type=int, default=120)
    ap.add_argument("--conv-max-role-runs", type=int, default=3)
    ap.add_argument("--streaming", action="store_true",
                    help="treat --input as a file-arrival stream:"
                         " drain new files (availableNow) into a"
                         " checkpointed exactly-once sink under --out;"
                         " re-running resumes from the sink checkpoint")
    ap.add_argument("--stat-cols", default=None,
                    help="comma-separated columns whose per-partition"
                         " AND per-file min/max go into the manifests"
                         " (read_where partition pruning + file-level"
                         " skipping); --zorder-cols implies its own")
    ap.add_argument("--bloom-cols", default=None,
                    help="comma-separated int/str columns that get a"
                         " per-file bloom over their distinct values"
                         " (read_where point-lookup file skipping —"
                         " e.g. conv_id for find-one-conversation)")
    ap.add_argument("--zorder-cols", default=None,
                    help="comma-separated NUMERIC result columns:"
                         " cluster table partitions along a Z-curve"
                         " over these columns instead of"
                         " hash-bucketing conv_id; manifest min/max"
                         " then prune scans on ANY of them"
                         " (IcebergLike.read_where)")
    ap.add_argument("--rollback-to", type=int, default=None,
                    help="undo commits made to --out after this"
                         " snapshot id (the bad-ingest-wave escape"
                         " hatch) and exit")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from textract_demo_spark.engine.datagen import transcripts_df
    from textract_demo_spark.engine.metrics import (partition_metrics,
                                                    with_block_stats)
    from textract_demo_spark.engine.pipeline import run_pipeline
    from textract_demo_spark.engine.tables import (IcebergLike,
                                                   with_part_key,
                                                   zorder_part_key)

    spark = SparkSession.builder.appName("run_extract").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if args.rollback_to is not None:
        r = IcebergLike(args.out).rollback(spark, args.rollback_to)
        print(json.dumps({
            "mode": "rollback", "rollback_to": args.rollback_to,
            "snapshot_id": r["snapshot_id"],
            "dropped_partitions": r["dropped_partitions"],
            "stripped_partitions": r["stripped_partitions"],
            "dropped_snapshots": r["dropped_snapshots"]}))
        return

    if args.streaming:
        if not args.input:
            raise SystemExit("--streaming requires --input (a directory"
                             " receiving transcript parquet files)")
        from textract_demo_spark.streaming.stream import (
            read_transcripts_stream, start_to_parquet, streaming_pipeline)
        t0 = time.time()
        stream = read_transcripts_stream(spark, args.input)
        results = streaming_pipeline(stream, salt=args.salt)
        q = start_to_parquet(results,
                             out_dir=f"{args.out}/data",
                             checkpoint_dir=f"{args.out}/_checkpoint")
        q.awaitTermination()
        wall = time.time() - t0
        n = spark.read.schema(results.schema).parquet(
            f"{args.out}/data").count()
        print(json.dumps({"mode": "streaming", "rows_total": n,
                          "wall_sec": round(wall, 2)}))
        return

    if args.input:
        transcripts = spark.read.parquet(args.input)
        fingerprint = args.input
    else:
        transcripts = transcripts_df(spark, args.n_convs)
        fingerprint = f"synthetic:seed=42:n_convs={args.n_convs}"

    t0 = time.time()
    results = with_block_stats(
        run_pipeline(transcripts, reviews=None, salt=args.salt))
    stat_cols = None
    if args.stat_cols:
        stat_cols = [c.strip() for c in args.stat_cols.split(",")
                     if c.strip()]
    if args.zorder_cols:
        stat_cols = [c.strip() for c in args.zorder_cols.split(",")
                     if c.strip()]
        results = zorder_part_key(results, stat_cols, args.buckets)
    else:
        results = with_part_key(results, args.buckets)
    table = IcebergLike(args.out)
    bloom_cols = None
    if args.bloom_cols:
        bloom_cols = [c.strip() for c in args.bloom_cols.split(",")
                      if c.strip()]
    snapshot = table.write(results, metrics_fn=partition_metrics,
                           input_fingerprint=fingerprint,
                           fail_after=args.fail_after,
                           stat_cols=stat_cols,
                           bloom_cols=bloom_cols)
    compaction: dict | None = None
    if args.compact:
        c = table.compact(spark, min_files=args.compact_min_files,
                          target_mb=args.compact_target_mb)
        compaction = {"compacted_partitions": len(c["compacted_keys"]),
                      "files_before": c["files_before"],
                      "files_after": c["files_after"]}
    expired: dict | None = None
    if args.expire_keep_last > 0:
        expired = table.expire_snapshots(keep_last=args.expire_keep_last)

    conv_report: dict | None = None
    if args.conv_report:
        from textract_demo_spark.datapipe.transcripts import (
            conversation_stats, tool_transitions)
        stats = conversation_stats(
            transcripts, max_gap_minutes=args.conv_max_gap_minutes,
            max_role_runs=args.conv_max_role_runs)
        stats.write.mode("overwrite").parquet(f"{args.out}/conv_stats")
        (tool_transitions(transcripts, k=50)
         .write.mode("overwrite").parquet(f"{args.out}/tool_transitions"))
        stats = spark.read.parquet(f"{args.out}/conv_stats")
        kept = stats.filter("keep").count()
        conv_report = {"n_convs": stats.count(), "convs_kept": kept}

    wall = time.time() - t0
    rows = sum(m["metrics"].get("rows", 0)
               for k in snapshot["committed_keys"]
               if (m := table.manifest(k)) is not None)
    print(json.dumps({
        "committed_partitions": len(snapshot["committed_keys"]),
        "newly_committed": len(snapshot["newly_committed"]),
        "skipped_already_committed":
            len(snapshot["skipped_already_committed"]),
        "rows_total": rows,
        "wall_sec": round(wall, 2),
        "phase_sec": snapshot.get("phase_sec", {}),
        **({"compaction": compaction} if compaction else {}),
        **({"snapshots_expired": len(expired["expired"])}
           if expired else {}),
        **({"conv_report": conv_report} if conv_report else {}),
    }))


if __name__ == "__main__":
    main()
