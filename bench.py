"""Benchmark runner (driver contract, BENCH_r{N}.json).

Runs the headline queries on local[$SPARK_GRAFT_CPUS] against
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) and prints ONE
compact JSON line LAST on stdout:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec}, "sf": ..., "turns_per_sec": ...}
The driver records only a bounded tail of stdout (BENCH_r03.json
came back ``parsed: null`` because the full per-query + delta map
outgrew that buffer), so the stdout line carries the contract
fields plus the per-query seconds only; the complete record —
delta table vs the previous round, host-phase probe, fast-family
companions — is written to BENCH/LAST_RUN.json (machine) and
BENCH/LAST_RUN.md (human).

Headline = the extraction pipeline (the BASELINE.json metric is
turns/sec) over a distributed-generated synthetic transcript table,
plus representative operator queries over the sf parquet tables —
one per family: filters/joins/aggs/windows, extraction end-to-end,
dedup (exact + MinHash-LSH + SimHash), ANN (exact + LSH), text
stats, multimodal plumbing, table/selection extraction and the error
taxonomy. ``delta_vs_prev`` compares against the newest BENCH_r*.json
at the repo root so regressions are visible round over round.
Scaling-efficiency evidence (width sweep + control) is produced by
BENCH/run_scaling.py, reported in BENCH/BASELINE.md.
"""

from __future__ import annotations

import glob
import json
import os
import re
import time

# one representative per operator family; order = report order
BENCH_QUERIES = [
    # scans / filters / joins / aggs / windows
    "p_filter_project", "j1_containment_join", "a1_first_line_vendor",
    "a2_ordered_concat", "w2_top1_ranking", "u1_union_fallback",
    "a12_confidence_histogram",
    # extraction end-to-end variants
    "extract_html_boilerplate_strip", "extract_table_cells",
    "error_taxonomy_routing", "words_from_lines",
    "extract_pdf_success", "extract_pdf_multipage",
    # trained quality gate (full pipeline + learned score, 6 arms)
    "quality_gate_learned",
    # dedup family
    "dedup_exact", "dedup_minhash_lsh", "dedup_simhash",
    "dedup_simhash_pairs", "dedup_incremental",
    "dedup_substring_spans", "dedup_substring_rewrite",
    "dedup_star_clusters",
    # line-level cleaning (C4 hygiene + corpus keep-first line dedup)
    "c4_line_filter", "line_dedup_rewrite",
    # similarity / ANN family
    "ann_cosine_topk", "ann_lsh_topk", "ann_ivf_topk",
    "semantic_dedup", "semantic_dedup_incremental",
    # text analysis family (incl. BPE tokenization)
    "bpe_tokenize", "text_token_stats", "text_quality_score",
    "gopher_quality_rules", "gopher_ngram_fracs", "lm_unigram_surprisal",
    # dataset curation family (splits / decontamination / repetition)
    "split_assign", "shard_shuffle",
    "decontam_ngram_overlap", "text_repetition_stats",
    "mix_resample", "temperature_mix_targets",
    "dsir_importance", "text_classifier_quality",
    "pii_detect_redact", "pack_sequences",
    "token_topk_by_source", "pack_fill_stats",
    "length_percentiles_by_source",
    # temporal operators (as-of join, sessionization incl. streaming)
    "events_asof_join", "events_sessionize", "streaming_sessionize",
    "events_point_in_session",
    # bloom membership (md5 oracle mode; xxhash64 companion below)
    "dedup_bloom_probe",
    # web-archive ingestion end-to-end
    "warc_ingest_extract",
    # multimodal plumbing + real stdlib decode
    "multimodal_frame_features", "multimodal_real_decode",
    "multimodal_png_decode",
    # mergeable sketches + chunking + tf-idf
    "hll_register_sketch", "cms_heavy_hitters", "logq_quantile_sketch",
    "chunk_overlap", "tfidf_top_terms",
    # search / retrieval family
    "search_inverted_index", "search_bm25_topk", "search_phrase",
    # web-graph family (URL canon, link harvest, fixed-point PageRank)
    "url_canonicalize", "link_harvest", "pagerank_topk", "hits_topk",
    # hybrid retrieval fusion + transcript analytics
    "frontier_robots_filter",
    "search_hybrid_rrf", "transcript_tool_bigrams",
    "transcript_conv_stats",
    # bigram LM, PQ / IVF-PQ ANN, bottom-k sampling (round-4 additions)
    "lm_bigram_surprisal", "ann_pq_topk", "ann_ivfpq_topk",
    "group_sample_bottomk", "dq_validate_constraints",
    # table layer: z-order clustering + two-dimensional stats pruning,
    # tagged-snapshot rollback, atomic MERGE, schema evolution
    "table_zorder_scan", "table_rollback_scan",
    "table_merge_upsert", "table_schema_evolution",
    # theta/KMV set operations + hidden partitioning + file-level
    # footer-stats skipping (round-5)
    "sketch_theta_setops", "table_hidden_partitioning",
    "table_file_skipping", "table_bloom_skipping",
    # round-5 second wave: branch refs, stream-stream interval join,
    # JSONL ingest, cluster reps, curriculum, grouping sets, pivot,
    # trailing RANGE window
    "table_branch_write", "streaming_interval_join",
    "jsonl_gz_ingest", "dedup_cluster_representative",
    "curriculum_order", "metrics_rollup_cube",
    "events_pivot_by_type", "events_trailing_window",
    # round-5 third wave: global numbering, metadata-only
    # aggregates, salt-replication skew join, VARIANT JSON paths,
    # bounded-state in-stream dedup
    "global_row_ids", "table_stats_agg", "skew_salted_join",
    "events_json_props", "streaming_dedup_watermark",
    "events_unpivot_metrics", "split_stratified_exact",
    # skew_salted_extract is deliberately NOT here: at sf0.1 it
    # extracts a 10^6-turn hot conversation (a stress run, not a
    # suite row — BENCH/run_skew_probe.py records its histograms)
]


def _md5_burn(_i: int) -> None:
    # one slot of the all-cores host probe (module-level so it pickles)
    import hashlib
    acc = 0
    for i in range(400_000):
        acc ^= hashlib.md5(str(i).encode()).digest()[0]


def _load_prev() -> tuple[str | None, dict]:
    """Newest BENCH_r*.json at the repo root (the driver's record of
    the previous round), if any."""
    root = os.path.dirname(os.path.abspath(__file__))
    # numeric round sort: lexicographic would put r10 before r2
    cands = sorted(
        glob.glob(os.path.join(root, "BENCH_r*.json")),
        key=lambda p: int(re.search(r"BENCH_r(\d+)", p).group(1)))
    if not cands:
        return None, {}
    path = cands[-1]
    name = re.search(r"BENCH_(r\d+)", path).group(1)
    try:
        with open(path) as fh:
            data = json.load(fh)
    except (OSError, ValueError):
        return None, {}
    # driver records either the parsed JSON line or a wrapper with
    # "parsed"; when the driver's tail buffer truncated the line
    # (parsed: null, r03), fall back to the committed sidecar from
    # that round's local run
    parsed = data.get("parsed", data)
    if isinstance(parsed, dict) and parsed.get("queries"):
        return name, parsed
    sidecar = os.path.join(root, "BENCH", "LAST_RUN.json")
    try:
        with open(sidecar) as fh:
            side = json.load(fh)
        if isinstance(side, dict) and side.get("queries"):
            return f"{name} (via BENCH/LAST_RUN.json)", side
    except (OSError, ValueError):
        pass
    return None, {}


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

    # host-phase context: this VM drifts up to 2x between identical
    # runs (BENCH/BASELINE.md error-bar protocol), so every bench
    # record carries (a) the 1-min load average and (b) a fixed
    # single-core md5 probe — compare probe times across rounds to
    # tell a slow HOST phase from a slow CODE change before reading
    # any per-query ratio.
    import hashlib
    t0 = time.time()
    acc = 0
    for i in range(400_000):
        acc ^= hashlib.md5(str(i).encode()).digest()[0]
    extras["host_probe_sec"] = round(time.time() - t0, 3)
    extras["loadavg_1m"] = round(os.getloadavg()[0], 2)
    # (c) an all-cores probe: the same md5 loop on every vCPU at
    # once.  The single-core probe misses host phases where only
    # PARALLEL throughput degrades (vCPU oversubscription /
    # memory-bandwidth contention on the shared VM) — exactly the
    # phases that hit the 32-thread Spark stages hardest.  Compare
    # par/serial ratios across rounds before reading any ratio on a
    # wide query.
    import multiprocessing as _mp
    t0 = time.time()
    with _mp.Pool(int(cpus)) as _pool:
        _pool.map(_md5_burn, range(int(cpus)))
    extras["host_probe_par_sec"] = round(time.time() - t0, 3)

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
    # best of 2 timed reps: this host drifts up to 2x between
    # identical runs on multi-minute timescales (BENCH/BASELINE.md
    # error bars), so a single-shot headline conflates host phase
    # with code. Both reps are recorded; best-of is the headline,
    # matching the scaling sweep's protocol.
    reps = []
    for _ in range(2):
        t0 = time.time()
        out = run_pipeline(transcripts, reviews=None, salt=16)
        n_rows = out.count()
        reps.append(time.time() - t0)
    dt = min(reps)
    timings["extract_pipeline"] = round(dt, 3)
    extras["extract_pipeline_reps"] = [round(r, 3) for r in reps]
    extras["turns_per_sec"] = round(n_rows / dt, 1)
    extras["n_turns"] = n_turns
    shutil.rmtree(tmp_in, ignore_errors=True)

    # -- operator queries over the sf tables -----------------------------
    # steady-state timing: first run warms codegen/JIT + file index,
    # the recorded number is the second run
    from textract_demo_spark.datapipe.dedup import release_cached
    for name in BENCH_QUERIES:
        if name not in QUERIES:
            continue
        df = QUERIES[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()  # warm
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)
        # pair/cluster/semdedup frames carry persisted handles; the
        # suite runs ~45 queries in one session — release per query
        release_cached(df)

    # -- fast-family companions ------------------------------------------
    # dedup_simhash / ann_lsh_topk / ann_ivf_topk run the md5
    # cross-engine hash family so their VALUES are DuckDB-oracled; a
    # production run uses the xxhash64 default (one JVM intrinsic per
    # value vs an md5 digest + hex conv). These rows record the fast
    # family's time next to the oracle mode's so a round-over-round
    # ratio on the md5 rows is read as mode cost, not regression.
    from pyspark.sql import functions as F  # noqa: N812

    from textract_demo_spark.datapipe.dedup import (with_shingles,
                                                    with_simhash)
    from textract_demo_spark.datapipe.similarity import ivf_topk, lsh_topk

    def _emb_q(spark, sf_dir):
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        return emb, (emb.filter(F.col("vec_id") < 5)
                     .select(F.col("vec_id").alias("qid"),
                             F.col("embedding").alias("qv")))

    def _fast_simhash(spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        return (with_simhash(with_shingles(docs), hash_mode="xxhash64")
                .select("doc_id", "simhash"))

    def _fast_lsh(spark, sf_dir):
        emb, q = _emb_q(spark, sf_dir)
        return lsh_topk(emb, q, k=10, hash_mode="xxhash64", dim=64) \
            .select("qid", "rank", "vec_id")

    def _fast_ivf(spark, sf_dir):
        emb, q = _emb_q(spark, sf_dir)
        return ivf_topk(emb, q, k=10, n_centroids=16, n_probe=4,
                        iters=1, hash_mode="xxhash64") \
            .select("qid", "rank", "vec_id")

    def _fast_dsir(spark, sf_dir):
        from textract_demo_spark.datapipe.dsir import with_dsir_scores
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        return with_dsir_scores(docs,
                                docs.filter(F.col("doc_id") % 5 == 0),
                                num_buckets=8192, hash_mode="xxhash64")

    def _fast_bloom(spark, sf_dir):
        from textract_demo_spark.datapipe.bloom import (bloom_probe,
                                                        build_bloom_bitmap)
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        bitmap = build_bloom_bitmap(
            docs.filter(F.col("doc_id") % 4 != 0).select("text"),
            hash_mode="xxhash64")
        return (bloom_probe(docs.filter(F.col("doc_id") % 4 == 0)
                            .select("doc_id", "text"), bitmap,
                            hash_mode="xxhash64")
                .select("doc_id", "maybe_seen"))

    for name, fn in [("dedup_simhash_fast", _fast_simhash),
                     ("ann_lsh_topk_fast", _fast_lsh),
                     ("ann_ivf_topk_fast", _fast_ivf),
                     ("dsir_importance_fast", _fast_dsir),
                     ("dedup_bloom_probe_fast", _fast_bloom)]:
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()  # warm
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    # -- round-over-round delta vs the newest BENCH_r*.json --------------
    prev_name, prev = _load_prev()
    delta = {}
    if prev_name:
        prev_q = prev.get("queries", {})
        per_query = {
            n: {"prev": prev_q[n], "now": timings[n],
                "ratio": round(timings[n] / prev_q[n], 2)
                if prev_q[n] else None}
            for n in timings if n in prev_q}
        delta = {
            "prev_round": prev_name,
            "prev_turns_per_sec": prev.get("turns_per_sec"),
            "queries": per_query,
        }

    # human-readable sidecar (BENCH/LAST_RUN.md) with the delta table
    try:
        root = os.path.dirname(os.path.abspath(__file__))
        prev_tps = delta.get("prev_turns_per_sec") if delta else None
        lines = ["# BENCH last run", "",
                 f"sf={sf}, turns/sec={extras['turns_per_sec']:,},"
                 f" n_turns={extras['n_turns']:,}"
                 + (f" (prev {prev_name}: {prev_tps:,} turns/sec)"
                    if prev_tps is not None else ""),
                 f"host phase: probe={extras['host_probe_sec']}s,"
                 f" load_1m={extras['loadavg_1m']}"
                 " (compare probes across rounds before reading"
                 " ratios)", "",
                 "| query | sec | prev | ratio |", "|---|---|---|---|"]
        dq = delta.get("queries", {}) if delta else {}
        for n, v in timings.items():
            p = dq.get(n, {})
            lines.append(f"| {n} | {v} | {p.get('prev', '—')} |"
                         f" {p.get('ratio', '—')} |")
        with open(os.path.join(root, "BENCH", "LAST_RUN.md"), "w") as fh:
            fh.write("\n".join(lines) + "\n")
    except Exception:
        pass  # sidecar is best-effort: stdout JSON is the contract

    # full record -> sidecar (machine-readable, used for next round's
    # delta); compact contract line LAST on stdout so the driver's
    # bounded tail buffer always captures a parseable JSON line
    full = {
        "metric": "extraction+operator suite wall time",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        **extras,
        "delta_vs_prev": delta,
    }
    try:
        root = os.path.dirname(os.path.abspath(__file__))
        with open(os.path.join(root, "BENCH", "LAST_RUN.json"), "w") as fh:
            json.dump(full, fh, indent=1)
    except OSError:
        pass  # sidecar is best-effort: stdout JSON is the contract
    # r03 AND r04 both came back ``parsed: null``: even without the
    # delta table, an 85-entry queries map outgrows the driver's tail
    # buffer (r04 captured ~2.9 kB of a ~3.8 kB line, losing the line
    # start).  The stdout contract line therefore carries only a
    # handful of headline per-family representatives; the complete
    # per-query map lives in BENCH/LAST_RUN.json.
    headline = [
        "extract_pipeline", "extract_pdf_multipage", "dedup_minhash_lsh",
        "dedup_substring_rewrite", "ann_ivf_topk", "semantic_dedup",
        "gopher_quality_rules", "search_bm25_topk", "table_zorder_scan",
        "table_merge_upsert", "events_sessionize",
    ]
    compact = {
        "metric": full["metric"],
        "value": full["value"],
        "unit": full["unit"],
        "queries": {n: timings[n] for n in headline if n in timings},
        "sf": full["sf"],
        "turns_per_sec": extras["turns_per_sec"],
        "n_turns": extras["n_turns"],
        "host_probe_sec": extras["host_probe_sec"],
        "loadavg_1m": extras["loadavg_1m"],
        "n_queries": len(timings),
        "full_record": "BENCH/LAST_RUN.json",
    }
    line = json.dumps(compact)
    assert len(line) < 1500, f"stdout contract line too long: {len(line)}"
    print(line)


if __name__ == "__main__":
    main()
