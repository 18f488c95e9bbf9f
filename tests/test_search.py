"""Search / retrieval family (datapipe/search.py): inverted index,
integer-exact BM25, index-answered phrase search — each cross-checked
against an independent brute-force Python computation, plus the plan
shapes that make them survive 10^12 rows."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from textract_demo_spark.datapipe.search import (
    B_MILLI, K1_MILLI, _norm_query, bm25_topk, build_inverted_index,
    phrase_search)

CORPUS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick quick fox"),
    (2, "lazy  lazy   lazy dog\ndog"),          # messy whitespace
    (3, "a a a a a a a a a a a a a a a a"),      # one hot token
    (4, "Unique Zebra phrase here"),             # mixed case
    (5, "   "),                                  # whitespace-only
    (6, "zebra"),                                # single token
]


def _toks(text: str) -> list[str]:
    t = re.sub(r"\s+", " ", text.strip()).lower()
    return [x for x in t.split(" ") if x]


def _df(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


# ---------------------------------------------------------------------------
# inverted index


def test_index_matches_bruteforce(spark):
    rows = build_inverted_index(_df(spark)).collect()
    got = {(r["token"], r["doc_id"]): (r["tf"], r["positions"])
           for r in rows}
    want: dict = {}
    for did, text in CORPUS:
        for pos, tok in enumerate(_toks(text)):
            tf, ps = want.setdefault((tok, did), (0, []))
            want[(tok, did)] = (tf + 1, ps + [pos])
    assert got == {k: (tf, ps) for k, (tf, ps) in want.items()}
    # whitespace-only doc yields no postings at all
    assert not any(d == 5 for (_, d) in got)


# ---------------------------------------------------------------------------
# BM25


def _brute_bm25(corpus, query, k):
    """Independent integer replay of the documented fixed-point
    algebra (Python // == Spark div == DuckDB // on positives)."""
    qtoks = sorted(set(_norm_query(query)))
    docs = {d: _toks(t) for d, t in corpus if _toks(t)}
    n = len(docs)
    avgdl_milli = 1000 * sum(len(v) for v in docs.values()) // n
    dfreq = {t: sum(1 for v in docs.values() if t in v) for t in qtoks}
    out = []
    for did, toks in docs.items():
        dl = len(toks)
        score = 0
        hits = 0
        for t in qtoks:
            tf = toks.count(t)
            if not tf:
                continue
            hits += 1
            idf_bits = (n // dfreq[t]).bit_length() - 1
            rel = (1000000 * dl) // avgdl_milli
            inner = 1000 - B_MILLI + (B_MILLI * rel) // 1000
            den = 1000 * tf + (K1_MILLI * inner) // 1000
            score += idf_bits * ((tf * (K1_MILLI + 1000) * 1000) // den)
        if hits:
            out.append((did, score, hits, dl))
    out.sort(key=lambda r: (-r[1], r[0]))
    return [(did, i + 1, s, h, dl)
            for i, (did, s, h, dl) in enumerate(out[:k])]


def test_bm25_matches_bruteforce(spark):
    got = [(r["doc_id"], r["rank"], r["score_milli"], r["n_hit_terms"],
            r["dl"])
           for r in bm25_topk(_df(spark), "zebra quick dog", k=10)
           .orderBy("rank").collect()]
    assert got == _brute_bm25(CORPUS, "zebra quick dog", 10)


def test_bm25_rare_term_beats_common(spark):
    # 'zebra' (df=2) discriminates; 'the' (df=2 of 6 non-empty... )
    top = bm25_topk(_df(spark), "zebra", k=3).orderBy("rank").collect()
    assert [r["doc_id"] for r in top] == [6, 4]
    # shorter doc wins the tie on tf: doc 6 (dl=1) over doc 4 (dl=4)
    assert top[0]["score_milli"] > top[1]["score_milli"]


def test_bm25_zero_idf_terms_never_rank(spark):
    # a term in EVERY non-empty doc has n_docs div df == 1 -> 0 bits;
    # docs matching only that term still appear (n_hit_terms rows)
    # but with score 0 — and a query of only such terms ranks by id
    docs = spark.createDataFrame(
        [(i, "common filler") for i in range(4)],
        "doc_id long, text string")
    rows = bm25_topk(docs, "common", k=10).orderBy("rank").collect()
    assert [r["score_milli"] for r in rows] == [0, 0, 0, 0]
    assert [r["doc_id"] for r in rows] == [0, 1, 2, 3]


def test_bm25_empty_query_raises(spark):
    with pytest.raises(ValueError):
        bm25_topk(_df(spark), "   ", k=5)


# ---------------------------------------------------------------------------
# phrase search


def _brute_phrase(corpus, phrase):
    p = _norm_query(phrase)
    m = len(p)
    out = set()
    for did, text in corpus:
        toks = _toks(text)
        for s in range(len(toks) - m + 1):
            if toks[s:s + m] == p:
                out.add((did, s))
    return out


@pytest.mark.parametrize("phrase", [
    "quick fox",           # simple bigram
    "the quick",           # phrase at doc start
    "lazy dog",            # across messy whitespace/newline
    "a a a",               # repeated token, overlapping matches
    "unique zebra phrase here",  # whole doc, case-folded
    "zebra quick",         # zero matches
    "dog",                 # single-token phrase
])
def test_phrase_matches_bruteforce(spark, phrase):
    idx = build_inverted_index(_df(spark))
    got = {(r["doc_id"], r["start"])
           for r in phrase_search(idx, phrase).collect()}
    assert got == _brute_phrase(CORPUS, phrase)


def test_phrase_overlapping_hot_token(spark):
    # doc 3 is 16x 'a': 'a a' must match at starts 0..14 (overlaps)
    idx = build_inverted_index(_df(spark))
    got = sorted(r["start"] for r in phrase_search(idx, "a a")
                 .filter(F.col("doc_id") == 3).collect())
    assert got == list(range(15))


# ---------------------------------------------------------------------------
# plan shapes


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_index_build_single_partial_exchange(spark):
    p = _plan(build_inverted_index(_df(spark)))
    assert p.count("Exchange") == 1, p[:3000]
    assert "partial_count" in p, p[:3000]
    assert "Python" not in p


def test_bm25_broadcast_stats_partial_topk(spark):
    p = _plan(bm25_topk(_df(spark), "zebra quick", k=5))
    assert "BroadcastHashJoin" in p, p[:3000]
    assert "SortMergeJoin" not in p, p[:3000]
    assert ("TakeOrderedAndProject" in p
            or "WindowGroupLimit" in p), p[:3000]


def test_phrase_broadcast_map_no_smj(spark):
    idx = build_inverted_index(_df(spark))
    p = _plan(phrase_search(idx, "quick fox"))
    assert "BroadcastHashJoin" in p, p[:3000]
    assert "SortMergeJoin" not in p, p[:3000]
    assert "CartesianProduct" not in p
