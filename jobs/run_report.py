"""spark-submit entrypoint: corpus health report over a documents
table — the read-side companion of ``run_curate.py`` (what a data
team inspects BEFORE choosing curation thresholds, and re-runs after
to verify the effect).

One pass per section, every aggregate exact-integer where feasible:

- per-source rollup: doc/token counts, p50/p90/p99 token length
  (discrete integer percentiles), exact-duplicate docs (md5 content
  groups), Gopher named-rule pass count, mean quality score (integer
  basis points via div);
- corpus-level rollup of the same, printed as ONE JSON line on
  stdout (the lineage-style record a pipeline stores next to its
  input snapshot).

Scale shape: everything groups on the source key (low cardinality)
or on the 16-byte content hash (exact dedup's one shuffle); no
self-joins, so plan trees stay flat — no lineage checkpoint needed.

Usage:
    spark-submit --master local[8] \
        --py-files build/textract_demo_spark.zip \
        jobs/run_report.py --input .../documents.parquet --out /tmp/report
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--gopher-min-words", type=int, default=50)
    ap.add_argument("--gopher-min-stopwords", type=int, default=2)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from textract_demo_spark.datapipe.dedup import normalize_text
    from textract_demo_spark.datapipe.textstats import (
        length_percentiles, with_gopher_rules, with_quality_score,
        with_token_stats)

    spark = (SparkSession.builder.appName("run_report")
             .config("spark.sql.maxPlanStringLength", str(1024 * 1024))
             .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    t0 = time.time()

    docs = spark.read.parquet(args.input)

    # narrow per-doc stats, computed once and reused by both rollups
    scored = with_gopher_rules(
        with_quality_score(with_token_stats(docs)),
        min_words=args.gopher_min_words,
        min_stopword_hits=args.gopher_min_stopwords)
    per_doc = scored.select(
        "source", "doc_id", "n_tokens", "quality_score_bp",
        "gopher_keep", F.md5(normalize_text("text")).alias("_h"))

    # exact-dup docs = members of content groups of size > 1 (one
    # shuffle on the 16-byte digest, map-side partial count)
    dup_docs = (per_doc.groupBy("source", "_h")
                .agg(F.count("*").alias("c"))
                .groupBy("source")
                .agg(F.sum(F.when(F.col("c") > 1, F.col("c"))
                           .otherwise(0)).cast("long")
                     .alias("n_exact_dup_docs")))

    rollup = (per_doc.groupBy("source")
              .agg(F.count("*").cast("long").alias("n_docs"),
                   F.sum("n_tokens").cast("long").alias("n_tokens"),
                   F.sum(F.when(F.col("gopher_keep"), 1).otherwise(0))
                    .cast("long").alias("n_gopher_pass"),
                   F.expr("sum(quality_score_bp) div count(*)")
                    .alias("mean_quality_bp")))

    pcts = (length_percentiles(docs, qs=(50, 90, 99), by="source")
            .groupBy("source")
            .pivot("q", [50, 90, 99]).agg(F.first("p_tokens"))
            .withColumnsRenamed({"50": "p50_tokens", "90": "p90_tokens",
                                 "99": "p99_tokens"}))

    report = (rollup
              .join(F.broadcast(dup_docs), "source")
              .join(F.broadcast(pcts), "source")
              .orderBy("source"))
    report.write.mode("overwrite").parquet(f"{args.out}/per_source")

    rows = spark.read.parquet(f"{args.out}/per_source").collect()
    total = {
        "n_sources": len(rows),
        "n_docs": int(sum(r.n_docs for r in rows)),
        "n_tokens": int(sum(r.n_tokens for r in rows)),
        "n_exact_dup_docs": int(sum(r.n_exact_dup_docs for r in rows)),
        "n_gopher_pass": int(sum(r.n_gopher_pass for r in rows)),
    }
    print(json.dumps({"per_source_rows": len(rows), "corpus": total,
                      "wall_sec": round(time.time() - t0, 2)}))


if __name__ == "__main__":
    main()
