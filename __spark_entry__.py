"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Engine: ``textract_demo_spark`` — see SURVEY.md. Flagship query =
the full extraction pipeline (quality gate -> HTML/PDF/plain
extraction -> field rules -> review override) over deterministic
synthetic transcripts plus the driver's ``documents`` table treated
as plain-text transcript turns.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SF0001 = "/root/testdata/sf0.001"


def _documents_as_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map the driver's documents table onto the transcript shape
    (BASELINE.json:15) — each document is one plain-text turn."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.concat(F.lit("doc-"), F.col("doc_id").cast("string")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.lit("tool").alias("role"),
        F.col("text"),
        F.lit("").alias("tool"),
        F.to_timestamp(F.lit("2026-01-01 00:00:00")).alias("ts"),
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full extraction pipeline over synthetic transcripts
    unioned with sf0.001 documents-as-turns; returns per-turn results."""
    from textract_demo_spark.engine.pipeline import (
        fixtures_to_dfs, run_pipeline)

    dfs = fixtures_to_dfs(spark, n_convs=40)
    transcripts = dfs["transcripts"].unionByName(
        _documents_as_transcripts(spark, SF0001))
    out = run_pipeline(transcripts, dfs["reviews"], salt=8)
    return out.select(
        "conv_id", "turn_idx", "status", "kind", "main_text",
        F.size("spans").alias("n_spans"),
        F.col("model_result.vendor.value").alias("vendor"),
        F.col("model_result.date.value").alias("date"),
        F.col("model_result.total.value").alias("total"),
        F.col("model_result.confidence").alias("confidence"),
        "needs_review", "reviewed",
        F.col("final_result.confidence").alias("final_confidence"),
    )


# Registration order = driver verification order: the driver's
# CORRECTNESS pass oracles the FIRST 50 registered queries, so the
# least-proven entries must register first.
#
# ROUND-5 ROTATION CANDIDATES (registered late in round 4, after the
# window was already full of never-verified entries; all are locally
# oracle-rehearsed in tests/test_oracle_queries.py): table_equality_
# delete, table_incremental_read, table_stats_pruned_scan,
# lm_bigram_surprisal, ann_pq_topk, ann_ivfpq_topk,
# group_sample_bottomk, streaming_cdc_upsert, table_changelog_scan,
# dq_validate_constraints, table_sketch_rollup, table_zorder_scan,
# table_rollback_scan. Next round, swap them in for whichever
# in-window entries earn green r04 rows.
#
# Round 3 learned the ordering lesson the hard way — 17 queries
# registered at positions 51-67 got no driver row despite having
# oracles. Priority here: (1) everything with NO
# driver-verified round yet (the r03 tail + this round's new
# queries), then (2) the streaming/stateful/extraction/dedup queries
# whose correctness is hardest to establish any other way; the pure-
# SQL field-rule algebra (two green rounds of driver history, r02 +
# r03) rotates to the tail.
_PRIORITY = [
    # never driver-verified before round 4 (r03 positions 51-67)
    "ann_ivf_topk", "multimodal_media_meta",
    "text_repetition_stats", "split_assign", "shard_shuffle",
    "mix_resample", "temperature_mix_targets", "decontam_ngram_overlap",
    "token_topk_by_source", "length_percentiles_by_source",
    "pii_detect_redact", "pack_fill_stats", "pack_sequences",
    "semantic_dedup", "semantic_dedup_incremental", "lm_unigram_surprisal",
    # new in round 4
    "extract_pdf_multipage", "quality_gate_learned",
    "multimodal_real_decode", "skew_salted_extract",
    "c4_line_filter", "line_dedup_rewrite", "dsir_importance",
    "streaming_dsir_scoring", "text_classifier_quality",
    "events_asof_join", "events_sessionize", "dedup_bloom_probe",
    "warc_ingest_extract", "streaming_sessionize",
    "events_point_in_session", "multimodal_png_decode", "bpe_tokenize",
    "hll_register_sketch", "cms_heavy_hitters", "chunk_overlap",
    "tfidf_top_terms",
    "search_inverted_index", "search_bm25_topk", "search_phrase",
    # hardest-to-prove green queries (streaming, extraction core,
    # dedup family) keep their driver rows; extract_plain_identity /
    # extract_html_boilerplate_strip / quality_gate_routing /
    # extract_table_cells rotated to the tail (r02+r03 double-green,
    # and the same extraction pipeline is re-proven in-window by
    # extract_pdf_multipage / skew_salted_extract / warc_ingest_extract)
    "url_canonicalize", "link_harvest", "pagerank_topk",
    "hits_topk", "search_hybrid_rrf", "frontier_robots_filter",
    # (streaming_ttl_cache / multimodal_frame_features /
    # dedup_substring_rewrite rotated out for the three newest-machinery
    # queries above: ttl_cache is r03 driver-green and its re-park
    # hazard guard is pinned by tests/test_ttl_state.py while
    # streaming_review_wait — the larger state.py change — stays
    # in-window; frame_features' plumbing is re-proven in-window by
    # multimodal_media_meta + multimodal_real_decode +
    # multimodal_png_decode; substring_rewrite is r03 driver-green on
    # since-untouched code with spans/stats sharing its exchange.)
    "streaming_review_wait",
    "gopher_ngram_fracs", "logq_quantile_sketch",
    # (dedup_incremental and streaming_dedup_incremental rotated out
    # for gopher_ngram_fracs + logq_quantile_sketch: both r03
    # driver-green with code untouched since; four streaming queries
    # (ttl_cache, review_wait, sessionize, dsir_scoring) stay
    # in-window, including both applyInPandasWithState operators
    # whose state.py changed this round.)
    "dedup_star_clusters",
    # (gopher_quality_rules rotated out for dedup_star_clusters: it is
    # r03 driver-green and purely narrow zero-shuffle CASE algebra
    # whose semantics the pytest perturbation suite pins; star CC is
    # brand-new iterative code that needs a hard-signal row.
    # dedup_clusters / dedup_substring_spans / dedup_simhash_pairs
    # rotated out for the web-graph family: all three are r03
    # driver-green, cluster formation is re-proven in-window by
    # dedup_star_clusters on a strictly harder graph, the substring
    # (h0,h1) exchange machinery is re-proven by the in-window
    # rewrite query, and the banded-equi-join shape of simhash_pairs
    # stays plan-gated in tests/test_plans.py.)
    # (extract_pdf_success rotated out for the search family: its PDF
    # path is re-proven in-window by extract_pdf_multipage, which adds
    # the indirect-/Length arm on top; streaming_extract_availablenow
    # is r02+r03 double-green with six streaming queries still in
    # window; dedup_substring_stats shares its (h0,h1) exchange with
    # spans + rewrite, both still in window.)
    # (ann_cosine_topk / ann_lsh_topk / text_fingerprint / text_langid
    # / text_token_stats rotated to the tail as the line-operator +
    # DSIR + classifier queries landed, then words_from_lines /
    # dedup_exact / embedding_cosine_neardup / text_quality_score /
    # dedup_ngram_jaccard / selection_elements / dedup_simhash /
    # dedup_minhash_lsh (the incremental variant, which subsumes the
    # minhash+band machinery, stays) as the temporal
    # + bloom + WARC + streaming-session + range-join + PNG queries
    # landed:
    # all rotated names are r02+r03
    # double-green, and the ANN fast companions are timed every
    # bench)
]


def _ordered(mapping: dict) -> dict:
    missing = [n for n in _PRIORITY if n not in mapping]
    if missing:
        raise KeyError(f"_PRIORITY names not registered: {missing}")
    tail = [n for n in mapping if n not in set(_PRIORITY)]
    return {n: mapping[n] for n in [*_PRIORITY, *tail]}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Each callable takes (spark, sf_dir) and returns a DataFrame.
    Registered lazily from the engine's query module; re-ordered so
    the driver's 50-query verification window covers the entries
    with the least driver history (see _PRIORITY).
    """
    from textract_demo_spark.engine.queries import QUERIES
    return _ordered(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted => rows-only check);
    same registration order as queries()."""
    from textract_demo_spark.engine.queries import ORACLES
    return _ordered(dict(ORACLES))
