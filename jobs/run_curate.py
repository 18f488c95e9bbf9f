"""spark-submit entrypoint: the training-data curation pipeline over
a documents table — the datapipe/ operators chained the way
``run_extract.py`` chains the extraction engine.

Usage:
    python jobs/build_pyfiles.py
    spark-submit --master local[8] \
        --py-files build/textract_demo_spark.zip \
        jobs/run_curate.py --input /root/testdata/sf0.01/documents.parquet \
        --out /tmp/curated

Stages (each stage's shuffle budget is the design constraint at
10^12 docs — see the operator docstrings for the full arguments):

0b. line hygiene     optional (--c4-lines): C4-style per-line
                     drops (terminal punctuation / min words / lorem
                     ipsum / code braces) — narrow array SQL, zero
                     shuffles; docs left with no lines are dropped
0c. line dedup       optional (--line-dedup): corpus-wide keep-first
                     exact line dedup — one (h0,h1) line-key window
                     exchange of narrow rows, excision join only for
                     docs that lost a line
1. exact dedup       one window shuffle on the 16-byte content hash
1b. snapshot dedup   optional (--snapshot-index): drop docs that
                     near-duplicate a FROZEN prior corpus snapshot
                     (incremental_dedup_pairs — batch side broadcast,
                     the index never shuffles); this is the
                     continuous-ingestion mode where re-running
                     all-pairs LSH per batch would be O(corpus)
2. near-dup dedup    MinHash+LSH band join + connected components;
                     keeps each cluster's min-id representative (or
                     its longest-text member with --rep-longest: one
                     max_by aggregate, no window)
2b. substring cap    corpus-wide duplicated k-token coverage per doc
                     (duplicated_spans / Lee et al.): docs that are
                     mostly text duplicated elsewhere are dropped —
                     one shuffle on the window key, then only
                     duplicated windows shuffle on doc_id
2c. substring rewrite optional (--rewrite-dup-spans): the surviving
                     docs are REWRITTEN — every duplicated window run
                     keeps only its globally-first occurrence, later
                     occurrences are excised from the text
                     (remove_duplicated_spans; same shuffle budget as
                     2b plus one rebuild join paid only by docs with
                     removals)
3. quality filter    narrow per-row scores (quality, repetition,
                     lang-id) plus the unigram-surprisal cap (one
                     broadcast vocab + one per-doc aggregate); with
                     --gopher also the named Gopher rule conjunction
                     (Rae et al. Table A1, zero extra shuffles); with
                     --gopher-ngrams also the Table A1 n-gram
                     repetition rules (top-2-gram char fraction +
                     duplicate-5-gram char coverage, per-row sorted-
                     run aggregates, zero extra shuffles); with
                     --learned-gate also the trained quality scorer
                     (engine/learned_gate.py — one codegen'd
                     projection, zero extra shuffles); with
                     --text-clf also the trained hashed-ngram text
                     classifier (datapipe/classifier.py — literal-
                     array weights, zero joins, one narrow exchange)
                     ; with --bigram-lm also the Stupid-Backoff
                     bigram-LM band filter (order-2 perplexity:
                     broadcast count tables + one per-doc aggregate —
                     catches ordered repetition the unigram cap
                     cannot see)
3b. DSIR selection   optional (--dsir-target): keep docs whose
                     importance log-weight vs a small target corpus
                     clears --dsir-min-bits (Xie et al. 2023; two
                     broadcast-size hashed-ngram models, exact
                     integer bits — corpus text never shuffles)
3c. temperature mix  optional (--temperature-mix): down-sample
                     domains toward the T=2 mix (w = sqrt(count);
                     one domain-count aggregate + broadcast
                     thresholds + per-row hash — corpus rows never
                     shuffle)
3d. per-source cap   optional (--cap-per-source K): bottom-k
                     consistent sampling — exact K-doc strata as a
                     WindowGroupLimit, one source-keyed exchange
4. PII redaction     narrow per-row regex — zero shuffles
5. decontamination   optional (--eval-input): broadcast shingle probe
6. split assignment  pure (salt, id) hash — zero shuffles
6b. DQ gate          optional (--dq-report): the standard
                     constraint set over the curated output in
                     ONE aggregate pass; report written next to
                     the data, violations fail the run
7. sequence packing  one shuffle of (id, n_tok) pairs; pack ids join
                     back onto the curated rows
7b. curriculum       optional (--curriculum): difficulty stage from
                     exact per-source token-count quartiles
                     (broadcast bounds, no NTILE window) + a
                     deterministic within-stage shuffle key
7c. global ids       optional (--global-ids): dense 0..n-1 numbering
                     in doc_id order without a global window
                     (percentile buckets + prefix-summed offsets)

Output: parquet partitioned by split, plus one JSON stats line on
stdout (per-stage surviving row counts + wall time) — the lineage
summary a curation run records next to its output. With
--snapshot-index-out the run also writes the updated MinHash
signature index (prior snapshot, if any, unioned with this run's
kept docs) for the NEXT incremental run to probe.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="documents parquet (doc_id, text, source, ...)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--eval-input", default=None,
                    help="optional eval/benchmark documents parquet for"
                         " decontamination")
    ap.add_argument("--min-quality-bp", type=int, default=300)
    ap.add_argument("--max-dup-2gram-bp", type=int, default=600000)
    ap.add_argument("--max-surprisal-milli", type=int, default=30000,
                    help="drop docs whose mean unigram surprisal"
                         " exceeds this (x1000 bits): rare-token noise")
    ap.add_argument("--bigram-lm", action="store_true",
                    help="also score docs with the Stupid-Backoff"
                         " bigram LM (order-2 perplexity band filter:"
                         " sees word order the unigram cap cannot)")
    ap.add_argument("--max-bigram-bits-milli", type=int, default=30000)
    ap.add_argument("--min-bigram-bits-milli", type=int, default=0,
                    help="lower band edge: ordered repetition scores"
                         " NEAR-ZERO under the bigram LM, so a floor"
                         " drops looping/boilerplate docs")
    ap.add_argument("--dq-report", action="store_true",
                    help="validate the CURATED output against the"
                         " standard constraint set (one aggregate"
                         " pass) and write the per-constraint report"
                         " next to the data; a failed constraint"
                         " fails the run")
    ap.add_argument("--cap-per-source", type=int, default=0,
                    help="keep at most K docs per source via bottom-k"
                         " consistent sampling (0 = off): exact"
                         " deterministic strata, at-most-one-member"
                         " churn when the corpus grows")
    ap.add_argument("--max-dup-frac-milli", type=int, default=900,
                    help="drop docs whose corpus-wide duplicated-span"
                         " token coverage exceeds this (x1000);"
                         " >= 1000 disables the stage")
    ap.add_argument("--dup-span-window", type=int, default=20,
                    help="token window for exact-substring duplicate"
                         " detection (Lee et al. granularity)")
    ap.add_argument("--rewrite-dup-spans", action="store_true",
                    help="after the coverage cap, excise every"
                         " non-first duplicated span from the"
                         " surviving docs (keep-first corpus rewrite)")
    ap.add_argument("--c4-lines", action="store_true",
                    help="C4-style line hygiene before dedup: drop"
                         " lines without terminal punctuation / < 3"
                         " words / lorem ipsum / curly braces; drop"
                         " docs with no surviving lines")
    ap.add_argument("--line-dedup", action="store_true",
                    help="corpus-wide keep-first exact line dedup"
                         " before whole-doc dedup (boilerplate/log"
                         " line scrubber)")
    ap.add_argument("--gopher", action="store_true",
                    help="also require the Gopher named-rule"
                         " conjunction (word count / mean word length"
                         " / symbols / alpha words / stop words)")
    ap.add_argument("--learned-gate", action="store_true",
                    help="also require the trained quality scorer"
                         " (core/quality_model.py frozen logistic) to"
                         " accept each doc — narrow SQL, no Python")
    ap.add_argument("--text-clf", action="store_true",
                    help="also require the trained hashed-ngram text"
                         " classifier (datapipe/classifier.py frozen"
                         " fastText-style logistic) to label each doc"
                         " good — literal-array weights, zero joins")
    ap.add_argument("--dsir-target", default=None,
                    help="parquet of target-domain docs (doc_id,"
                         " text); keep docs whose DSIR importance"
                         " log-weight >= --dsir-min-bits (Xie et al."
                         " 2023 importance resampling, integer bits)")
    ap.add_argument("--dsir-min-bits", type=int, default=0,
                    help="integer-bits importance threshold; 0 keeps"
                         " docs at least as target-like as raw-like")
    ap.add_argument("--dsir-buckets", type=int, default=8192)
    ap.add_argument("--gopher-ngrams", action="store_true",
                    help="apply the Gopher n-gram repetition rules "
                         "(top-2-gram char fraction, duplicate-5-gram "
                         "char coverage) as zero-shuffle per-row stats")
    ap.add_argument("--max-top-2gram-bp", type=int, default=200000,
                    help="Gopher threshold: top-2-gram char fraction "
                         "<= 0.20 (basis points of 1e6)")
    ap.add_argument("--max-dup-5gram-bp", type=int, default=150000,
                    help="Gopher threshold: duplicate-5-gram char "
                         "coverage <= 0.15 (basis points of 1e6)")
    ap.add_argument("--gopher-min-words", type=int, default=50)
    ap.add_argument("--gopher-min-stopwords", type=int, default=2,
                    help="distinct Gopher stop words required; corpora"
                         " whose register lacks function words (logs,"
                         " code, tables) should pass 0-1")
    ap.add_argument("--jaccard", type=float, default=0.7)
    ap.add_argument("--rep-longest", action="store_true",
                    help="keep each near-dup cluster's LONGEST-text"
                         " member (quality proxy, min-id tiebreak)"
                         " instead of the min-id member — one max_by"
                         " aggregate, no window"
                         " (dedup.cluster_representatives)")
    ap.add_argument("--curriculum", action="store_true",
                    help="emit curriculum stage (per-source exact"
                         " token-count quartiles, broadcast bounds)"
                         " + deterministic within-stage shuffle_key"
                         " on the curated rows"
                         " (splits.with_curriculum_stage)")
    ap.add_argument("--global-ids", action="store_true",
                    help="number the curated corpus 0..n-1 in doc_id"
                         " order without a global window"
                         " (splits.with_global_ids)")
    ap.add_argument("--temperature-mix", action="store_true",
                    help="after the quality gate, down-sample domains"
                         " toward the T=2 temperature mix"
                         " (w = sqrt(count) per source)")
    ap.add_argument("--pack-budget", type=int, default=2048)
    ap.add_argument("--pack-shards", type=int, default=64)
    ap.add_argument("--decontam-min-overlap", type=int, default=5)
    ap.add_argument("--snapshot-index", default=None,
                    help="MinHash signature index parquet from a prior"
                         " run's --snapshot-index-out: incoming docs"
                         " near-duplicating the frozen snapshot are"
                         " dropped before within-batch dedup")
    ap.add_argument("--snapshot-index-out", default=None,
                    help="write the updated signature index (prior"
                         " snapshot + this run's kept docs) here for"
                         " the next incremental run")
    args = ap.parse_args()
    if args.snapshot_index and args.snapshot_index == args.snapshot_index_out:
        raise SystemExit("--snapshot-index-out must differ from"
                         " --snapshot-index (cannot overwrite the index"
                         " being read)")

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from textract_demo_spark.datapipe.dedup import (build_minhash_index,
                                                    contamination_overlap,
                                                    duplication_stats,
                                                    incremental_dedup_pairs,
                                                    minhash_dedup_pairs,
                                                    neardup_clusters,
                                                    normalize_text,
                                                    release_cached)
    from textract_demo_spark.datapipe.packing import pack_greedy
    from textract_demo_spark.datapipe.pii import redact_pii
    from textract_demo_spark.datapipe.splits import (with_hash_sample,
                                                     with_split_assignment)
    from textract_demo_spark.datapipe.textstats import (
        with_langid, with_quality_score, with_repetition_stats,
        with_token_stats, with_unigram_surprisal)

    # maxPlanStringLength: every stage below re-derives a frame from
    # `d` and joins it back, so the logical plan TREE doubles per
    # stage; the plan string rendered for the execution-start event on
    # each action grows with it and OOMed a default 1g spark-submit
    # driver. Bounding the string costs nothing (it is display-only);
    # the localCheckpoint() below bounds the tree itself.
    spark = (SparkSession.builder.appName("run_curate")
             .config("spark.sql.maxPlanStringLength", str(1024 * 1024))
             .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    t0 = time.time()
    stats: dict[str, int] = {}

    docs = spark.read.parquet(args.input)
    stats["input"] = docs.count()

    # 0b/0c. optional line-level cleaning (C4 hygiene, then corpus
    # keep-first line dedup) — both rewrite `text` in place before
    # any doc-level dedup sees it
    if args.c4_lines:
        from textract_demo_spark.datapipe.lines import c4_line_filter
        docs = (c4_line_filter(docs)
                .withColumn("text", F.col("clean_text"))
                .drop("clean_text", "n_lines_kept", "n_lines_dropped"))
        stats["after_c4_lines"] = docs.count()
    if args.line_dedup:
        from textract_demo_spark.datapipe.lines import line_dedup
        docs = (line_dedup(docs)
                .withColumn("text", F.col("clean_text"))
                .drop("clean_text", "n_lines", "n_lines_removed"))
        stats["after_line_dedup"] = docs.count()

    # 1. exact dedup: keep the min doc_id per normalized content
    w = Window.partitionBy(F.md5(normalize_text("text"))) \
              .orderBy("doc_id")
    d = (docs.withColumn("_rn", F.row_number().over(w))
         .filter(F.col("_rn") == 1).drop("_rn"))
    stats["after_exact_dedup"] = d.count()

    # 1b. optional snapshot dedup: drop docs near-duplicating the
    # frozen prior-corpus index (within-batch dups are left to stage
    # 2's cluster representative selection)
    if args.snapshot_index:
        idx = spark.read.parquet(args.snapshot_index)
        hits = incremental_dedup_pairs(d.select("doc_id", "text"), idx,
                                       threshold=args.jaccard)
        dup_ids = (hits.filter(F.col("match_src") == "corpus")
                   .select("doc_id").distinct())
        d = d.join(dup_ids, "doc_id", "left_anti")
        stats["after_snapshot_dedup"] = d.count()
        release_cached(hits)

    # 2. near-dup dedup: keep one representative per cluster —
    # min-id by default (cluster_id IS the min label after
    # propagation, so the pick is a free filter), or the
    # longest-text member with --rep-longest (quality proxy; one
    # max_by aggregate over the clusters, dedup.cluster_
    # representatives)
    pairs = minhash_dedup_pairs(d, threshold=args.jaccard)
    clusters = neardup_clusters(d.select("doc_id"), pairs)
    if args.rep_longest:
        from textract_demo_spark.datapipe.dedup import \
            cluster_representatives
        reps = cluster_representatives(d.select("doc_id", "text"),
                                       clusters)
        # clusters has one row per doc (singletons self-labeled), so
        # reps covers every doc and a semi-join keeps exactly one
        # member per cluster
        keep = reps.select(F.col("rep_doc_id").alias("doc_id"))
        d = d.join(keep, "doc_id", "left_semi")
    else:
        d = (d.join(clusters, "doc_id")
             .filter(F.col("cluster_id") == F.col("doc_id"))
             .drop("cluster_id"))
    # localCheckpoint: materialize the dedup survivors AND truncate
    # lineage — stages 2b-7 each self-join a derived frame back onto
    # `d`, which doubles the plan tree per stage (exponential without
    # a cut; Catalyst re-optimizes the whole tree on every action).
    # At cluster scale this boundary is a checkpoint to reliable
    # storage / an intermediate table; local mode keeps it on
    # executor-local blocks.
    d = d.localCheckpoint()
    stats["after_neardup_dedup"] = d.count()
    release_cached(pairs)
    release_cached(clusters)

    # 2b. substring-duplication cap: whole-doc dedup above misses docs
    # assembled from text duplicated across MANY distinct sources
    # (never pairwise-similar to any one of them); duplicated-span
    # coverage (Lee et al. granularity) catches exactly those
    if args.max_dup_frac_milli < 1000:
        heavy = (duplication_stats(d.select("doc_id", "text"),
                                   window=args.dup_span_window)
                 .filter(F.col("dup_frac_milli")
                         > args.max_dup_frac_milli)
                 .select("doc_id"))
        d = d.join(heavy, "doc_id", "left_anti")
        stats["after_substring_cap"] = d.count()

    # 2c. optional keep-first rewrite: the cap drops mostly-duplicated
    # docs; the rewrite cleans the rest — later occurrences of any
    # duplicated run are excised so the training set carries each
    # duplicated sequence once (Lee et al.'s remove step). Docs with
    # removals take the cleaned (normalized) text; untouched docs keep
    # their original text.
    if args.rewrite_dup_spans:
        from textract_demo_spark.datapipe.dedup import \
            remove_duplicated_spans
        rewritten = (remove_duplicated_spans(
            d.select("doc_id", "text"), window=args.dup_span_window)
            .filter(F.col("n_removed_tokens") > 0)
            .select("doc_id", "clean_text"))
        d = (d.join(rewritten, "doc_id", "left")
             .withColumn("text", F.coalesce("clean_text", "text"))
             .drop("clean_text"))
        stats["rewritten_docs"] = rewritten.count()

    # 3. quality gate: narrow per-row scores, plus the unigram-LM
    # surprisal cap (one broadcast vocab + one per-doc aggregate —
    # the corpus's own token distribution is the LM, CCNet-style)
    d = with_repetition_stats(
        with_langid(with_quality_score(with_token_stats(d))))
    surp = with_unigram_surprisal(d).select(
        "doc_id", "surprisal_milli_bits")
    d = d.join(surp, "doc_id")
    d = d.filter(
        (F.col("quality_score_bp") >= args.min_quality_bp)
        & (F.col("dup_2gram_frac_bp") <= args.max_dup_2gram_bp)
        & (F.col("surprisal_milli_bits") <= args.max_surprisal_milli))
    if args.bigram_lm:
        from textract_demo_spark.datapipe.textstats import \
            with_bigram_surprisal
        bi = with_bigram_surprisal(d.select("doc_id", "text")).select(
            "doc_id", "bits_milli")
        d = (d.join(bi, "doc_id")
             .filter((F.col("bits_milli")
                      <= args.max_bigram_bits_milli)
                     & (F.col("bits_milli")
                        >= args.min_bigram_bits_milli))
             .drop("bits_milli"))
        stats["after_bigram_lm"] = d.count()
    if args.gopher:
        from textract_demo_spark.datapipe.textstats import \
            with_gopher_rules
        keep = (with_gopher_rules(
                    d.select("doc_id", "text"),
                    min_words=args.gopher_min_words,
                    min_stopword_hits=args.gopher_min_stopwords)
                .filter("gopher_keep").select("doc_id"))
        d = d.join(keep, "doc_id")
        stats["after_gopher"] = d.count()
    if args.gopher_ngrams:
        from textract_demo_spark.datapipe.textstats import \
            with_gopher_ngram_fracs
        d = with_gopher_ngram_fracs(d, tops=(2,), dups=(5,))
        d = (d.filter(
                (F.col("top_2gram_char_frac_bp")
                 <= args.max_top_2gram_bp)
                & (F.col("dup_5gram_char_frac_bp")
                   <= args.max_dup_5gram_bp))
             .drop("top_2gram_char_frac_bp", "dup_5gram_char_frac_bp"))
        stats["after_gopher_ngrams"] = d.count()
    if args.learned_gate:
        from textract_demo_spark.engine.learned_gate import \
            with_learned_quality
        d = (with_learned_quality(d)
             .filter(F.col("learned_label") == "good")
             .drop("learned_score_micro", "learned_label"))
        stats["after_learned_gate"] = d.count()

    if args.text_clf:
        from textract_demo_spark.datapipe.classifier import \
            with_text_classifier
        keep = (with_text_classifier(d.select("doc_id", "text"))
                .filter(F.col("clf_label") == "good").select("doc_id"))
        d = d.join(keep, "doc_id")
        stats["after_text_clf"] = d.count()

    # 3b. optional DSIR target-domain selection: score every surviving
    # doc against a small target corpus (two broadcast-size hashed-
    # ngram bucket models; the corpus never shuffles by content) and
    # keep the docs whose integer-bits importance log-weight clears
    # the threshold — the learned counterpart of the hand rules above
    if args.dsir_target:
        from textract_demo_spark.datapipe.dsir import with_dsir_scores
        tgt = spark.read.parquet(args.dsir_target)
        keep = (with_dsir_scores(d.select("doc_id", "text"), tgt,
                                 num_buckets=args.dsir_buckets)
                .filter(F.col("dsir_bits") >= args.dsir_min_bits)
                .select("doc_id"))
        d = d.join(keep, "doc_id")
        stats["after_dsir"] = d.count()

    # 3c. optional temperature mixing: reshape the post-quality corpus
    # toward the T=2 domain mix (sqrt-dampened counts) — the most
    # under-represented domain keeps everything, the rest down-sample
    # deterministically (integer thresholds, per-row hash)
    if args.temperature_mix:
        from textract_demo_spark.datapipe.splits import \
            apply_temperature_mix
        d = (apply_temperature_mix(d)
             .filter("kept").drop("kept", "keep_thr"))
        stats["after_temperature_mix"] = d.count()

    # 3d. optional hard per-source cap: bottom-k consistent sampling
    # (exact strata, deterministic, minimal churn as the corpus grows
    # — see splits.group_sample_bottomk); runs as WindowGroupLimit so
    # tasks forward at most K rows per source before the one exchange
    if args.cap_per_source > 0:
        from textract_demo_spark.datapipe.splits import \
            group_sample_bottomk
        d = group_sample_bottomk(d, k=args.cap_per_source) \
            .drop("sample_rank")
        stats["after_source_cap"] = d.count()

    # 4. PII redaction: the curated text IS the redacted text
    d = (redact_pii(d)
         .withColumn("text", F.col("text_redacted"))
         .drop("text_redacted"))
    # redaction is the last text mutation — recompute token counts so
    # stage 7 packs against budgets measured on the text it actually
    # emits (stage-3 counts are pre-redaction); narrow per-row
    # expressions, zero shuffle
    d = with_token_stats(d.drop("n_chars_calc", "n_tokens",
                                "n_distinct_tokens", "n_subword_est"))

    # 5. optional decontamination against an eval set
    if args.eval_input:
        eval_docs = spark.read.parquet(args.eval_input)
        flags = contamination_overlap(
            d, eval_docs, min_overlap=args.decontam_min_overlap)
        d = (d.join(flags.filter("contaminated").select("doc_id"),
                    "doc_id", "left_anti"))

    # 6. deterministic split + 10% sample marker
    d = with_hash_sample(with_split_assignment(d), fraction=0.1)
    d = d.persist()
    stats["curated"] = d.count()

    # 6b. optional data-quality gate on the curated output: the
    # standard constraint set in ONE aggregate pass (datapipe/dq.py);
    # the report lands next to the data and a violation fails the run
    # (a curation job must not silently ship a broken table)
    if args.dq_report:
        from textract_demo_spark.datapipe.dq import validate_constraints
        report = validate_constraints(d, [
            {"kind": "not_null", "col": "text"},
            {"kind": "not_null", "col": "doc_id"},
            {"kind": "unique", "col": "doc_id"},
            {"kind": "range", "col": "n_tokens", "lo": 0},
            {"kind": "in_set", "col": "split",
             "values": ["train", "val", "test"],
             "name": "in_set(split)"},
            {"kind": "row_count", "lo": 1},
        ])
        report.write.mode("overwrite").parquet(f"{args.out}/dq_report")
        failed = [r.constraint for r in report.collect()
                  if not r.passed]
        stats["dq_failed"] = failed
        if failed:
            raise SystemExit(f"DQ constraints failed: {failed}")

    # 7. pack the training split into context-length bins
    packs = pack_greedy(d.filter(F.col("split") == "train"),
                        budget=args.pack_budget,
                        n_shards=args.pack_shards,
                        tok_col="n_tokens")
    d = (d.join(packs.select("doc_id", "shard", "pack_idx", "pack_pos"),
                "doc_id", "left"))
    stats["train_packs"] = packs.select("shard", "pack_idx") \
                                .distinct().count()

    # 7b. optional curriculum annotation: difficulty stage from exact
    # per-source token-count quartiles (one tiny aggregate, broadcast
    # bounds — no NTILE window) + a deterministic within-stage
    # shuffle key; pure narrow expressions on the curated rows
    if args.curriculum:
        from textract_demo_spark.datapipe.splits import \
            with_curriculum_stage
        d = with_curriculum_stage(d, score_col="n_tokens")
        stats["curriculum_stages"] = (d.select("stage").distinct()
                                      .count())

    # 7c. optional dense global numbering: 0..n-1 in doc_id order
    # without a global window (percentile buckets + driver
    # prefix-summed offsets + per-bucket rank)
    if args.global_ids:
        from textract_demo_spark.datapipe.splits import with_global_ids
        d = with_global_ids(d, order_col="doc_id",
                            buckets=args.pack_shards)

    # optional: write the updated snapshot index for the next run —
    # the prior snapshot (if any) unioned with this run's kept docs.
    # Built over the CURATED text (post-redaction): that is the corpus
    # the next batch actually joins.
    if args.snapshot_index_out:
        new_idx = build_minhash_index(d.select("doc_id", "text"))
        if args.snapshot_index:
            new_idx = (spark.read.parquet(args.snapshot_index)
                       .unionByName(new_idx))
        new_idx.write.mode("overwrite").parquet(args.snapshot_index_out)
        stats["snapshot_index_docs"] = (
            spark.read.parquet(args.snapshot_index_out).count())

    (d.write.mode("overwrite").partitionBy("split")
     .parquet(f"{args.out}/data"))
    # explicit schema: an empty result (e.g. everything deduped or
    # decontaminated away) still reads back as a valid empty table
    out = spark.read.schema(d.schema).parquet(f"{args.out}/data")
    stats["written"] = out.count()
    d.unpersist()

    print(json.dumps({"stats": stats,
                      "wall_sec": round(time.time() - t0, 2)}))


if __name__ == "__main__":
    main()
