"""Incremental-dedup volume stress: the continuous-ingestion probe at
~40x the per-round bench corpus.

Synthesizes a corpus by replicating the sf0.1 documents table with
per-replica id offsets and deterministic token noise (so replicas are
near- but not exact dups of their base), builds the frozen MinHash
signature index once, then probes it with a batch (fresh replicas +
planted near-dups) — the exact shape a 100 TB pipeline runs per
ingest. Records wall times for index build vs per-batch probe and the
candidate/verified pair counts, and prints one JSON line to stdout
(BENCH/DEDUP_STRESS.json is the committed record).

What this stresses that sf0.1 does not:
- broadcast sizes: the batch-derived band-key and candidate frames
  must stay broadcastable as the batch grows to tens of thousands of
  docs (the design contract: batch small, corpus never shuffles);
- the banded self-join's bucket skew at a large distinct-band space;
- per-scan column pruning of a multi-hundred-MB index relation.

Usage: python BENCH/run_dedup_stress.py [--replicas 40] [--batch 20000]
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
    ap.add_argument("--replicas", type=int, default=40,
                    help="corpus = documents x this many noisy replicas")
    ap.add_argument("--batch", type=int, default=20000,
                    help="batch size probed against the frozen index")
    ap.add_argument("--cpus", default=os.environ.get(
        "SPARK_GRAFT_CPUS", "32"))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from textract_demo_spark.datapipe.dedup import (
        build_minhash_index, incremental_dedup_pairs, release_cached)
    from textract_demo_spark.engine.session import get_spark

    spark = get_spark(master=f"local[{args.cpus}]", app="dedup-stress")
    docs = spark.read.parquet(f"{args.sf_dir}/documents.parquet") \
        .select("doc_id", "text")
    n_base = docs.count()

    # corpus: replicas with a variant-specific noise token spliced in
    # after every 8th word — each splice breaks the 3 shingles that
    # span it, so replicas of the same base sit at ~0.45 Jaccard
    # against each other (below the 0.7 verify threshold: the corpus
    # is NOT one giant dup set), while a tail-only edit stays >= 0.7
    def with_noise(df, tag):
        w = "split(text, ' ')"
        return df.withColumn("text", F.expr(f"""
            array_join(zip_with({w}, sequence(0, size({w}) - 1),
              (wd, i) -> if(i % 8 = 0,
                            concat(wd, ' nz-', {tag}, '-', i), wd)),
              ' ')"""))

    # repartition after synthesis: the sf0.1 table is one parquet
    # file (1-2 scan tasks), while the object under test is the
    # operator over a properly-partitioned table — at scale the
    # corpus arrives as many files/partitions
    width = int(args.cpus) * 4
    reps = spark.range(args.replicas).select(F.col("id").alias("rep"))
    corpus = with_noise(
        docs.crossJoin(reps)
        .select((F.col("doc_id") + F.col("rep") * 1000000)
                .alias("doc_id"), "text", "rep"),
        "rep").drop("rep").repartition(width)

    t0 = time.time()
    idx_path = "/tmp/dedup_stress_index"
    build_minhash_index(corpus, num_hashes=32) \
        .write.mode("overwrite").parquet(idx_path)
    t_index = time.time() - t0
    index = spark.read.parquet(idx_path)
    n_corpus = index.count()
    idx_bytes = sum(
        os.path.getsize(os.path.join(idx_path, f))
        for f in os.listdir(idx_path) if f.endswith(".parquet"))

    # batch: fresh docs (their own noise namespace — ~0.45 Jaccard vs
    # every corpus replica, i.e. genuinely novel) plus planted true
    # near-dups of corpus rows (tail words appended: >= 0.7 vs their
    # source, still ~0.45 vs that source's sibling replicas)
    n_fresh_reps = max(1, (args.batch * 3 // 4) // max(n_base, 1))
    freps = spark.range(n_fresh_reps).select(F.col("id").alias("rep"))
    batch_fresh = with_noise(
        docs.crossJoin(freps)
        .select((F.col("doc_id") + F.col("rep") * 1000000
                 + 900000000).alias("doc_id"), "text", "rep"),
        "concat('f', rep)").drop("rep")
    batch_planted = (corpus.filter(F.col("doc_id") % 97 == 0)
                     .limit(args.batch // 4)
                     .select((F.col("doc_id") + 950000000)
                             .alias("doc_id"),
                             F.concat_ws(" ", "text",
                                         F.lit("tail noise words"))
                              .alias("text")))
    batch = (batch_fresh.unionByName(batch_planted)
             .repartition(width).persist())
    n_batch = batch.count()

    t0 = time.time()
    pairs = incremental_dedup_pairs(batch, index, threshold=0.7,
                                    num_hashes=32, bands=16)
    n_pairs = pairs.count()
    t_probe = time.time() - t0
    by_src = {r["match_src"]: r["count"]
              for r in pairs.groupBy("match_src").count().collect()}
    release_cached(pairs)
    batch.unpersist()

    rec = {
        "n_base_docs": n_base,
        "n_corpus_docs": n_corpus,
        "index_parquet_mb": round(idx_bytes / 1e6, 1),
        "n_batch_docs": n_batch,
        "index_build_sec": round(t_index, 2),
        "probe_sec": round(t_probe, 2),
        "batch_docs_per_sec": round(n_batch / t_probe, 1),
        "n_verified_pairs": n_pairs,
        "pairs_by_src": by_src,
        "cpus": args.cpus,
    }
    with open(os.path.join(ROOT, "BENCH", "DEDUP_STRESS.json"),
              "w") as fh:
        json.dump(rec, fh, indent=1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
