"""End-to-end smoke of the curation job entrypoint
(jobs/run_curate.py): runs main() in-process over the sf0.001
documents table and checks the stage funnel + output layout."""

from __future__ import annotations

import json
import sys


def test_run_curate_end_to_end(spark, tmp_path, capsys, monkeypatch):
    # eval set = docs 0-9: those ids (when they survive dedup) are
    # decontaminated away; the rest of the corpus flows through
    eval_path = str(tmp_path / "eval")
    (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
     .filter("doc_id < 10").write.parquet(eval_path))
    monkeypatch.setattr(sys, "argv", [
        "run_curate.py",
        "--input", "/root/testdata/sf0.001/documents.parquet",
        "--out", str(tmp_path / "curated"),
        "--eval-input", eval_path,
        "--pack-budget", "256", "--pack-shards", "4",
    ])
    import importlib
    import jobs.run_curate as rc
    importlib.reload(rc)
    rc.main()
    line = capsys.readouterr().out.strip().splitlines()[-1]
    st = json.loads(line)["stats"]
    # monotone funnel: every stage can only drop rows
    assert (st["input"] >= st["after_exact_dedup"]
            >= st["after_neardup_dedup"] >= st["curated"])
    assert st["input"] == 500
    assert st["written"] == st["curated"]
    out = spark.read.parquet(str(tmp_path / "curated" / "data"))
    # the eval docs themselves are fully self-overlapping => gone
    assert out.filter("doc_id < 10").count() == 0
    assert out.count() > 100  # the bulk of the corpus flows through
    assert set(out.select("split").distinct().toPandas()["split"]) \
        <= {"train", "val", "test"}
    # train rows carry pack assignments
    tr = out.filter("split = 'train'")
    if tr.count():
        assert tr.filter("pack_idx IS NULL").count() == 0


def test_run_curate_incremental_snapshot(spark, tmp_path, capsys,
                                         monkeypatch):
    """Continuous-ingestion mode: run 1 writes a snapshot signature
    index; run 2 probes it and drops re-ingested docs (same curated
    text, new ids) at stage 1b while novel docs flow through."""
    import importlib
    import jobs.run_curate as rc
    importlib.reload(rc)
    from pyspark.sql import functions as F

    raw = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    in1 = str(tmp_path / "in1")
    raw.filter("doc_id < 250").write.parquet(in1)
    idx1 = str(tmp_path / "idx1")
    monkeypatch.setattr(sys, "argv", [
        "run_curate.py", "--input", in1,
        "--out", str(tmp_path / "out1"),
        "--snapshot-index-out", idx1,
        "--pack-budget", "256", "--pack-shards", "4"])
    rc.main()
    st1 = json.loads(
        capsys.readouterr().out.strip().splitlines()[-1])["stats"]
    assert st1["snapshot_index_docs"] == st1["curated"]

    # run 2 batch: 20 byte-identical re-ingests of kept docs (new
    # ids) + 50 genuinely new docs
    curated1 = spark.read.parquet(str(tmp_path / "out1" / "data"))
    keep20 = (curated1.select("doc_id").orderBy("doc_id").limit(20)
              .withColumnRenamed("doc_id", "_k"))
    reingest = (curated1.join(keep20, curated1.doc_id == keep20._k)
                .select(*[
                    (F.col("doc_id") + 5000).alias("doc_id")
                    if c == "doc_id" else F.col(c) for c in raw.columns]))
    novel = raw.filter("doc_id >= 250 AND doc_id < 300")
    in2 = str(tmp_path / "in2")
    reingest.unionByName(novel).write.parquet(in2)
    monkeypatch.setattr(sys, "argv", [
        "run_curate.py", "--input", in2,
        "--out", str(tmp_path / "out2"),
        "--snapshot-index", idx1,
        "--pack-budget", "256", "--pack-shards", "4"])
    rc.main()
    st2 = json.loads(
        capsys.readouterr().out.strip().splitlines()[-1])["stats"]
    assert st2["input"] == 70
    # every re-ingest matches the frozen snapshot at Jaccard 1.0
    assert st2["after_exact_dedup"] - st2["after_snapshot_dedup"] >= 20
    out2 = spark.read.parquet(str(tmp_path / "out2" / "data"))
    assert out2.filter("doc_id >= 5000").count() == 0
    assert out2.filter("doc_id < 300").count() > 0


def test_run_curate_substring_cap_drops_frankendoc(spark, tmp_path,
                                                   capsys, monkeypatch):
    """Stage 2b catches what whole-doc dedup cannot: a doc assembled
    from 25-token chunks of six different donors is never pairwise-
    similar to any ONE of them (MinHash Jaccard ~1/6), but its
    duplicated-span coverage is total — the substring cap drops it,
    while the donors (only ~half their text duplicated) survive.
    With the stage disabled (>= 1000) the frankendoc flows through."""
    from pyspark.sql import functions as F

    raw = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
           .filter("doc_id < 120"))
    donors = [r.text for r in
              raw.filter(F.size(F.split("text", " ")) >= 25)
              .orderBy("doc_id").limit(6).collect()]
    assert len(donors) == 6
    frank = " ".join(" ".join(t.split()[:25]) for t in donors)
    extra = spark.createDataFrame(
        [(9999, frank, "en", "frank", len(frank))],
        "doc_id BIGINT, text STRING, lang STRING, source STRING,"
        " n_chars BIGINT")
    in_path = str(tmp_path / "in")
    raw.unionByName(extra).write.parquet(in_path)

    import importlib
    import jobs.run_curate as rc
    importlib.reload(rc)

    def run(max_milli: int, out: str) -> dict:
        monkeypatch.setattr(sys, "argv", [
            "run_curate.py", "--input", in_path,
            "--out", str(tmp_path / out),
            "--max-dup-frac-milli", str(max_milli),
            "--pack-budget", "256", "--pack-shards", "4",
        ])
        rc.main()
        line = capsys.readouterr().out.strip().splitlines()[-1]
        return json.loads(line)["stats"]

    st = run(900, "capped")
    assert st["after_substring_cap"] < st["after_neardup_dedup"]
    out = spark.read.parquet(str(tmp_path / "capped" / "data"))
    assert out.filter("doc_id = 9999").count() == 0
    # the donors are only partially duplicated => they survive 2b
    donor_ids = [r.doc_id for r in
                 raw.filter(F.size(F.split("text", " ")) >= 25)
                 .orderBy("doc_id").limit(6).collect()]
    surviving = out.filter(F.col("doc_id").isin(donor_ids)).count()
    assert surviving >= 4  # later stages may drop some on quality

    st2 = run(1000, "uncapped")
    assert "after_substring_cap" not in st2
    out2 = spark.read.parquet(str(tmp_path / "uncapped" / "data"))
    assert out2.filter("doc_id = 9999").count() == 1


def test_run_curate_rewrite_and_gopher(spark, tmp_path, capsys,
                                       monkeypatch):
    """Stage 2c (--rewrite-dup-spans) excises the non-first copy of a
    shared 25-token run while the first-occurrence doc keeps it; the
    --gopher gate drops a doc violating the word-count rule. Built on
    a fully-controlled corpus: filler tokens are unique per doc, so
    the planted run is the only duplicated sequence."""
    from pyspark.sql import functions as F

    run = ("alpha bravo charlie delta echo foxtrot golf hotel india"
           " juliet kilo lima mike november oscar papa quebec romeo"
           " sierra tango uniform victor whiskey xray yankee")
    def filler(d, n, k):
        return " ".join(f"w{d}x{k}n{j}" for j in range(n))
    rows = []
    for d in range(10):
        rows.append((d, f"the filler doc with calm words {filler(d, 40, 0)}"))
    rows.append((20, f"the first keeper with {filler(20, 10, 0)} {run}"
                     f" {filler(20, 10, 1)}"))
    rows.append((30, f"the later copy with {filler(30, 20, 0)} {run}"
                     f" {filler(30, 15, 1)}"))
    rows.append((40, "the tiny doc with few"))  # gopher word-count fail
    docs = spark.createDataFrame(
        [(i, t, "en", "synth", len(t)) for i, t in rows],
        "doc_id BIGINT, text STRING, lang STRING, source STRING,"
        " n_chars BIGINT")
    in_path = str(tmp_path / "in")
    docs.write.parquet(in_path)

    monkeypatch.setattr(sys, "argv", [
        "run_curate.py", "--input", in_path,
        "--out", str(tmp_path / "curated"),
        "--rewrite-dup-spans", "--gopher", "--gopher-min-words", "20",
        "--min-quality-bp", "0", "--max-surprisal-milli", "999999",
        "--pack-budget", "256", "--pack-shards", "2",
    ])
    import importlib
    import jobs.run_curate as rc
    importlib.reload(rc)
    rc.main()
    line = capsys.readouterr().out.strip().splitlines()[-1]
    st = json.loads(line)["stats"]
    assert st["rewritten_docs"] == 1
    assert st["after_gopher"] == st["after_substring_cap"] - 1

    out = spark.read.parquet(str(tmp_path / "curated" / "data"))
    texts = {r.doc_id: r.text for r in
             out.select("doc_id", "text").collect()}
    assert 40 not in texts            # gopher word-count gate
    assert run in texts[20]           # first occurrence kept verbatim
    assert run not in texts[30]       # later copy excised
    assert "w30x0n0" in texts[30]     # the copy's own text survives


def test_run_report_per_source_rollup(spark, tmp_path, capsys,
                                      monkeypatch):
    """run_report: one row per source; percentiles ordered; exact-dup
    and gopher counts bounded by n_docs; corpus rollup consistent."""
    monkeypatch.setattr(sys, "argv", [
        "run_report.py",
        "--input", "/root/testdata/sf0.001/documents.parquet",
        "--out", str(tmp_path / "report"),
        "--gopher-min-words", "20", "--gopher-min-stopwords", "1",
    ])
    import importlib
    import jobs.run_report as rr
    importlib.reload(rr)
    rr.main()
    line = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(line)
    out = spark.read.parquet(str(tmp_path / "report" / "per_source"))
    rows = out.collect()
    n_sources = (spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet")
        .select("source").distinct().count())
    assert len(rows) == n_sources == rec["per_source_rows"]
    for r in rows:
        assert r.p50_tokens <= r.p90_tokens <= r.p99_tokens
        assert 0 <= r.n_exact_dup_docs <= r.n_docs
        assert 0 <= r.n_gopher_pass <= r.n_docs
        assert 0 <= r.mean_quality_bp <= 1000
    assert rec["corpus"]["n_docs"] == sum(r.n_docs for r in rows) == 500
    assert rec["corpus"]["n_gopher_pass"] > 0


def test_run_curate_temperature_mix_stage(spark, tmp_path, capsys,
                                          monkeypatch):
    """--temperature-mix reshapes the post-quality corpus toward the
    sqrt-dampened domain mix: the funnel records the stage and the
    output's per-source skew shrinks (max/min source share)."""
    monkeypatch.setattr(sys, "argv", [
        "run_curate.py",
        "--input", "/root/testdata/sf0.001/documents.parquet",
        "--out", str(tmp_path / "curated"),
        "--temperature-mix",
        "--pack-budget", "256", "--pack-shards", "4",
    ])
    import importlib
    import jobs.run_curate as rc
    importlib.reload(rc)
    rc.main()
    line = capsys.readouterr().out.strip().splitlines()[-1]
    st = json.loads(line)["stats"]
    assert 0 < st["after_temperature_mix"] <= st["after_substring_cap"]
    assert st["curated"] <= st["after_temperature_mix"]
    out = spark.read.parquet(str(tmp_path / "curated" / "data"))
    assert out.count() == st["written"] > 0


def test_run_curate_line_stages(spark, tmp_path, capsys, monkeypatch):
    """--c4-lines + --line-dedup + --learned-gate: the line stages
    rewrite text before doc-level dedup; planted boilerplate lines
    vanish corpus-wide; the funnel stays monotone through the three
    new stage counters."""
    from pyspark.sql import functions as F
    src = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
           .select(
               "doc_id",
               F.concat(F.lit("Doc head sentence number "),
                        F.col("doc_id").cast("string"), F.lit(".\n"),
                        F.lit("Every doc carries this boilerplate"
                              " line.\n"),
                        F.lit("unterminated trailer line")).alias("text"),
               "lang", "source", "n_chars"))
    in_path = str(tmp_path / "docs")
    src.write.parquet(in_path)
    monkeypatch.setattr(sys, "argv", [
        "run_curate.py", "--input", in_path,
        "--out", str(tmp_path / "curated"),
        "--c4-lines", "--line-dedup", "--learned-gate",
        "--min-quality-bp", "0", "--max-surprisal-milli", "1000000",
        "--max-dup-2gram-bp", "1000000", "--max-dup-frac-milli", "1000",
        "--pack-budget", "256", "--pack-shards", "2",
    ])
    import importlib

    import jobs.run_curate as rc
    importlib.reload(rc)
    rc.main()
    line = capsys.readouterr().out.strip().splitlines()[-1]
    st = json.loads(line)["stats"]
    assert st["after_c4_lines"] <= st["input"]
    assert st["after_line_dedup"] == st["after_c4_lines"]
    assert st["after_learned_gate"] <= st["after_line_dedup"]
    out = spark.read.parquet(str(tmp_path / "curated" / "data"))
    texts = [r["text"] for r in out.select("text").collect()]
    # the c4 filter dropped the unterminated trailer everywhere,
    # and line dedup left the boilerplate line in at most one doc
    assert all("unterminated" not in t for t in texts)
    assert sum("boilerplate" in t for t in texts) <= 1


def test_run_curate_dsir_stage(spark, tmp_path, capsys, monkeypatch):
    """--dsir-target keeps the target-vocabulary docs and drops the
    off-domain ones: raw docs written in the target's vocabulary get
    strictly positive integer-bits importance weights, disjoint-
    vocabulary docs strictly negative, and the default threshold 0
    separates them (Xie et al. 2023 importance resampling)."""
    tgt_rows = [(100 + i, "alpha beta gamma delta epsilon zeta",
                 "en", "tgt", 36) for i in range(8)]
    raw_rows = (
        [(d, f"alpha beta gamma delta epsilon zeta tail{d}x tail{d}y",
          "en", "synth", 50) for d in (1, 2, 3)]
        + [(d, f"zulu yankee xray whiskey victor uniform off{d}a"
               f" off{d}b", "en", "synth", 50) for d in (11, 12, 13)])
    schema = ("doc_id BIGINT, text STRING, lang STRING, source STRING,"
              " n_chars BIGINT")
    tgt_path, in_path = str(tmp_path / "tgt"), str(tmp_path / "in")
    spark.createDataFrame(tgt_rows, schema).write.parquet(tgt_path)
    spark.createDataFrame(raw_rows, schema).write.parquet(in_path)

    monkeypatch.setattr(sys, "argv", [
        "run_curate.py", "--input", in_path,
        "--out", str(tmp_path / "curated"),
        "--dsir-target", tgt_path,
        "--min-quality-bp", "0", "--max-surprisal-milli", "1000000",
        "--max-dup-2gram-bp", "1000000", "--max-dup-frac-milli", "1000",
        "--jaccard", "0.95",
        "--pack-budget", "256", "--pack-shards", "2",
    ])
    import importlib
    import jobs.run_curate as rc
    importlib.reload(rc)
    rc.main()
    line = capsys.readouterr().out.strip().splitlines()[-1]
    st = json.loads(line)["stats"]
    assert st["after_dsir"] == 3
    out = spark.read.parquet(str(tmp_path / "curated" / "data"))
    ids = {r.doc_id for r in out.select("doc_id").collect()}
    assert ids == {1, 2, 3}


def test_run_curate_text_clf_stage(spark, tmp_path, capsys, monkeypatch):
    """--text-clf drops consonant-mash docs and keeps natural prose
    under the frozen hashed-ngram model (held-out text, not the
    training corpus)."""
    rows = [
        (1, "The young man walked along the old road in the morning"
            " while the light fell on the quiet stones of the bridge."),
        (2, "Everyone there agreed that the people would be done with"
            " the work before the end of the morning light."),
        (3, "She said that the road to the harbor was quiet and the"
            " morning market would be done before the light fell."),
        (4, "The people stayed near the old garden while the morning"
            " light moved softly along the stones of the road."),
        (11, "qk zv xw jj pq vb nm tr qk zv xw jj pq vb nm tr qk zv"
             " xw jj pq vb nm tr"),
        # held-out mash from the training junk's trigram space (i=15,
        # outside the trained i<12 rows): fully-novel random tokens
        # can collide into positive buckets — hashed classifiers only
        # promise generalization NEAR the training distribution
        (12, "htt ljv pww slx wzz bnb fcc jqd mff qsg ttj xhk bvl"
             " fkm jzn mnp qcq sqr wfs bts"),
        (13, "@#$% !!! zzzz @#$% !!! zzzz @#$% !!! zzzz @#$% !!! zzzz"),
    ]
    docs = spark.createDataFrame(
        [(i, t, "en", "synth", len(t)) for i, t in rows],
        "doc_id BIGINT, text STRING, lang STRING, source STRING,"
        " n_chars BIGINT")
    in_path = str(tmp_path / "in")
    docs.write.parquet(in_path)
    monkeypatch.setattr(sys, "argv", [
        "run_curate.py", "--input", in_path,
        "--out", str(tmp_path / "curated"),
        "--text-clf",
        "--min-quality-bp", "0", "--max-surprisal-milli", "1000000",
        "--max-dup-2gram-bp", "1000000", "--max-dup-frac-milli", "1000",
        "--jaccard", "0.95",
        "--pack-budget", "256", "--pack-shards", "2",
    ])
    import importlib
    import jobs.run_curate as rc
    importlib.reload(rc)
    rc.main()
    line = capsys.readouterr().out.strip().splitlines()[-1]
    st = json.loads(line)["stats"]
    assert st["after_text_clf"] == 4
    out = spark.read.parquet(str(tmp_path / "curated" / "data"))
    ids = {r.doc_id for r in out.select("doc_id").collect()}
    assert ids == {1, 2, 3, 4}


def test_run_curate_gopher_ngrams_gate(spark, tmp_path, capsys,
                                       monkeypatch):
    """--gopher-ngrams drops the keyword-stuffed doc (top-2-gram char
    fraction over threshold) and the self-repeating doc (duplicate-
    5-gram coverage over threshold) while clean docs pass."""
    def filler(d, n, k=0):
        return " ".join(f"w{d}x{k}n{j}" for j in range(n))
    block = "the quick brown fox jumps over the lazy dog tonight"
    rows = []
    for d in range(6):
        rows.append((d, f"the calm filler doc with {filler(d, 40)}"))
    # top-2-gram stuffing: 'buy now' dominates the text
    rows.append((50, "buy now " * 30 + "unique tail words here"))
    # duplicate-5-gram coverage: the 10-word block appears twice
    rows.append((60, f"the later doc with {filler(60, 5)} {block}"
                     f" {filler(60, 5, 1)} {block}"))
    docs = spark.createDataFrame(
        [(i, t, "en", "synth", len(t)) for i, t in rows],
        "doc_id BIGINT, text STRING, lang STRING, source STRING,"
        " n_chars BIGINT")
    in_path = str(tmp_path / "in_ng")
    docs.write.parquet(in_path)

    monkeypatch.setattr(sys, "argv", [
        "run_curate.py", "--input", in_path,
        "--out", str(tmp_path / "curated_ng"),
        "--gopher-ngrams",
        "--min-quality-bp", "0", "--max-surprisal-milli", "999999",
        "--max-dup-2gram-bp", "1000000",
        "--pack-budget", "256", "--pack-shards", "2",
    ])
    import importlib
    import jobs.run_curate as rc
    importlib.reload(rc)
    rc.main()
    line = capsys.readouterr().out.strip().splitlines()[-1]
    st = json.loads(line)["stats"]
    out = spark.read.parquet(str(tmp_path / "curated_ng" / "data"))
    kept = {r.doc_id for r in out.select("doc_id").collect()}
    assert 50 not in kept             # top-2-gram stuffing gate
    assert 60 not in kept             # dup-5-gram coverage gate
    assert {0, 1, 2, 3, 4, 5} <= kept
    assert st["after_gopher_ngrams"] == len(kept)


def test_run_curate_bigram_lm_and_source_cap(spark, tmp_path, capsys,
                                             monkeypatch):
    """--bigram-lm drops an ordered-repetition doc via the LOWER band
    edge (near-zero transition bits: every bigram is the corpus's
    dominant one) that the unigram surprisal cap cannot see, and
    --cap-per-source enforces exact per-source strata."""
    from pyspark.sql import functions as F  # noqa: F401

    def filler(d, n):
        return " ".join(f"w{d}n{j} common{j % 7}" for j in range(n))
    rows = [(d, f"the doc number {d} with calm words {filler(d, 30)}",
             "src_a" if d % 2 else "src_b") for d in range(12)]
    # looping doc: "x y x y ..." -- unigram-balanced, bigram-trivial
    rows.append((100, "x y " * 40, "src_a"))
    docs = spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, t, s in rows],
        "doc_id BIGINT, text STRING, lang STRING, source STRING,"
        " n_chars BIGINT")
    in_path = str(tmp_path / "in")
    docs.write.parquet(in_path)

    monkeypatch.setattr(sys, "argv", [
        "run_curate.py", "--input", in_path,
        "--out", str(tmp_path / "curated"),
        "--bigram-lm", "--min-bigram-bits-milli", "1500",
        "--cap-per-source", "4",
        "--min-quality-bp", "0", "--max-surprisal-milli", "999999",
        "--max-dup-2gram-bp", "1000000",
        "--max-dup-frac-milli", "1000",
        "--pack-budget", "256", "--pack-shards", "2",
    ])
    import importlib
    import jobs.run_curate as rc
    importlib.reload(rc)
    rc.main()
    line = capsys.readouterr().out.strip().splitlines()[-1]
    st = json.loads(line)["stats"]
    assert "after_bigram_lm" in st and "after_source_cap" in st
    assert st["after_source_cap"] <= 8  # 4 per source max

    out = spark.read.parquet(str(tmp_path / "curated" / "data"))
    ids = {r.doc_id for r in out.select("doc_id").collect()}
    assert 100 not in ids  # the looping doc fell to the bigram floor
    per_src = {r.source: r["count"] for r in
               out.groupBy("source").count().collect()}
    assert all(v <= 4 for v in per_src.values()), per_src


def test_run_curate_dq_report(spark, tmp_path, capsys, monkeypatch):
    """--dq-report writes a per-constraint report next to the data
    and the standard set passes on a healthy run."""
    monkeypatch.setattr(sys, "argv", [
        "run_curate.py",
        "--input", "/root/testdata/sf0.001/documents.parquet",
        "--out", str(tmp_path / "curated"), "--dq-report",
        "--pack-budget", "256", "--pack-shards", "4",
    ])
    import importlib
    import jobs.run_curate as rc
    importlib.reload(rc)
    rc.main()
    line = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(line)["stats"]["dq_failed"] == []
    rep = spark.read.parquet(str(tmp_path / "curated" / "dq_report"))
    rows = {r.constraint: r.passed for r in rep.collect()}
    assert len(rows) == 6 and all(rows.values())


def test_run_curate_rep_curriculum_global_ids(spark, tmp_path, capsys,
                                              monkeypatch):
    """Round-5 stages: --rep-longest keeps each near-dup cluster's
    longest member, --curriculum emits stage + shuffle_key, and
    --global-ids numbers the curated corpus densely 0..n-1."""
    import importlib
    import json
    import sys

    import jobs.run_curate as rc
    importlib.reload(rc)
    monkeypatch.setattr(sys, "argv", [
        "run_curate.py",
        "--input", "/root/testdata/sf0.001/documents.parquet",
        "--out", str(tmp_path / "curated"),
        "--rep-longest", "--curriculum", "--global-ids",
        "--pack-budget", "256", "--pack-shards", "4",
    ])
    rc.main()
    line = capsys.readouterr().out.strip().splitlines()[-1]
    st = json.loads(line)["stats"]
    assert st["input"] >= st["after_neardup_dedup"] >= st["curated"]
    assert st["curriculum_stages"] >= 2
    out = spark.read.parquet(str(tmp_path / "curated" / "data"))
    n = out.count()
    assert n == st["curated"]
    # dense global ids in doc_id order
    rows = sorted((r.doc_id, r.global_id) for r in
                  out.select("doc_id", "global_id").collect())
    assert [g for _, g in rows] == list(range(n))
    # curriculum columns present with sane domains
    assert out.filter("stage < 1 OR stage > 4").count() == 0
    assert out.filter("length(shuffle_key) != 16").count() == 0
