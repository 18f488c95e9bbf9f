"""Exact-substring span dedup volume stress: duplicated_spans +
the keep-first rewrite (remove_duplicated_spans) at ~40x the
per-round bench corpus (fast xxhash64 path).

Synthesizes ~200k docs by replicating the sf0.1 documents table with
a per-replica token perturbation every 8th position (no 16-token
window survives ACROSS replicas — replicas are near-dups at the
whole-doc level but not substring-dups), then plants cross-doc
duplicated runs: for every 10th base doc, two extra docs share that
doc's first 40 original tokens between unique sentinels. The
surviving duplicated tail (~9% of docs) is mostly the generator's
natural near-whole-doc copies, phase-aligned within each replica
(433 such docs at sf0.1, all >90% covered), plus the ~1k planted
twins. Measures the full spans + per-doc coverage passes and prints
one JSON line (BENCH/SUBSTRING_STRESS.json is the committed record).

What this stresses that sf0.1 does not:
- the window explode at ~10M windows (20 bytes each on the wire):
  the (h0,h1) exchange and the window count(*) at a key space where
  almost every key is unique (the scale regime — duplicated keys are
  the rare tail);
- island merge + offset recovery joining back only the ~2% of docs
  that actually carry duplicated spans;
- the per-doc coverage aggregate over the same survivor set.

Usage: python BENCH/run_substring_stress.py [--replicas 40]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--replicas", type=int, default=40)
    ap.add_argument("--window", type=int, default=16)
    ap.add_argument("--cpus", default=os.environ.get(
        "SPARK_GRAFT_CPUS", "32"))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from textract_demo_spark.datapipe.dedup import (duplicated_spans,
                                                    duplication_stats,
                                                    remove_duplicated_spans)
    from textract_demo_spark.engine.session import get_spark

    spark = get_spark(master=f"local[{args.cpus}]",
                      app="substring-stress",
                      shuffle_partitions=int(args.cpus))
    docs = (spark.read.parquet(f"{args.sf_dir}/documents.parquet")
            .select("doc_id", "text"))

    width = int(args.cpus) * 4
    reps = spark.range(args.replicas).select(F.col("id").alias("rep"))
    # per-replica perturbation every 8th token: kills every 16-token
    # run both across replicas and (by phase shift) most natural
    # cross-doc chunk reuse, leaving the planted runs as the
    # dominant duplicated tail — the post-whole-doc-dedup regime
    base = (docs.crossJoin(reps)
            .select((F.col("doc_id") + F.col("rep") * 1000000)
                    .alias("doc_id"),
                    F.expr("""
              array_join(transform(split(text, ' '), (t, i) ->
                CASE WHEN i % 8 = 0
                     THEN concat(t, 'x', cast(rep AS STRING))
                     ELSE t END), ' ')""").alias("text")))
    run40 = F.expr("array_join(slice(split(text, ' '), 1, 40), ' ')")
    seeds = (docs.filter((F.col("doc_id") % 10 == 0)
                         & (F.size(F.split("text", " ")) >= 40))
             .select("doc_id", run40.alias("run")))
    twin_a = seeds.select(
        (F.col("doc_id") + 90000000).alias("doc_id"),
        F.concat(F.lit("head-a-"), F.col("doc_id").cast("string"),
                 F.lit(" "), F.col("run")).alias("text"))
    twin_b = seeds.select(
        (F.col("doc_id") + 91000000).alias("doc_id"),
        F.concat(F.lit("head-b-"), F.col("doc_id").cast("string"),
                 F.lit(" "), F.col("run"),
                 F.lit(" tail-b")).alias("text"))
    corpus = (base.unionByName(twin_a).unionByName(twin_b)
              .repartition(width).persist())
    n_docs = corpus.count()
    n_windows = corpus.select(F.sum(F.greatest(
        F.size(F.split("text", " ")) - (args.window - 1),
        F.lit(0))).alias("w")).collect()[0].w

    t0 = time.time()
    spans = duplicated_spans(corpus, window=args.window)
    n_spans = spans.count()
    spans_sec = round(time.time() - t0, 2)

    n_docs_with_spans = spans.select("doc_id").distinct().count()

    t0 = time.time()
    stats = duplication_stats(corpus, window=args.window)
    n_heavy = stats.filter("dup_frac_milli > 900").count()
    stats_sec = round(time.time() - t0, 2)

    # keep-first rewrite pass (the REMOVE step) over the same corpus:
    # adds the global-first row_number to the key exchange and the
    # excision join paid only by docs with removals; token
    # conservation asserted on the full output
    t0 = time.time()
    rw = remove_duplicated_spans(corpus, window=args.window)
    conserve = rw.select(
        F.sum("n_removed_tokens").alias("removed"),
        F.sum("n_tokens").alias("total"),
        F.sum(F.when(F.col("n_removed_tokens") > 0, 1).otherwise(0))
        .alias("docs_rewritten")).collect()[0]
    rewrite_sec = round(time.time() - t0, 2)

    rec = {
        "n_docs": n_docs,
        "n_windows": int(n_windows),
        "window": args.window,
        "spans_sec": spans_sec,
        "windows_per_sec": round(n_windows / spans_sec, 1),
        "docs_per_sec": round(n_docs / spans_sec, 1),
        "n_spans": n_spans,
        "n_docs_with_spans": n_docs_with_spans,
        "stats_sec": stats_sec,
        "n_heavy_docs": n_heavy,
        "rewrite_sec": rewrite_sec,
        "rewrite_windows_per_sec": round(n_windows / rewrite_sec, 1),
        "docs_rewritten": int(conserve.docs_rewritten),
        "tokens_removed": int(conserve.removed),
        "tokens_total": int(conserve.total),
    }
    out = os.path.join(ROOT, "BENCH", "SUBSTRING_STRESS.json")
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
