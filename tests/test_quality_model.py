"""Trainable quality-gate scorer (core/quality_model.py) — the
Rekognition custom-labels TRAINING analog
(source/ocr/preprocessing/README.md:46-57).

Covers: (a) determinism — the frozen constants reproduce from a fresh
training run; (b) fixture faithfulness — the learned gate routes the
engine's fixture corpus exactly like the heuristic gate it distills;
(c) featurizer parity — the Python mirror and the DuckDB SQL features
agree byte-for-byte on adversarial strings (the Spark side shares the
same expression text modulo function spelling, and is driver-oracled
by quality_gate_learned); (d) the trained model separates a noisy
held-out set better than the strongest single feature.
"""

from __future__ import annotations

import random

import duckdb
import pandas as pd
import pytest

from textract_demo_spark.core.quality import classify_quality
from textract_demo_spark.core.quality_model import (
    FEATURES, PDF_PREFIX, TRAINED_BIAS_MICRO, TRAINED_WEIGHTS_MICRO,
    featurize, feature_sql, labelled_corpus, score_micro, score_sql,
    train_quality_scorer)


def test_frozen_weights_reproduce():
    b, w = train_quality_scorer()
    assert b == TRAINED_BIAS_MICRO
    assert w == TRAINED_WEIGHTS_MICRO


def test_learned_gate_matches_heuristic_on_training_corpus():
    for text, label in labelled_corpus():
        assert (score_micro(text) >= 0) == bool(label), repr(text[:80])


def test_learned_gate_matches_heuristic_on_fixture_corpus():
    """The engine's own fixture payloads (html/pdf/plain/bad across
    every taxonomy arm) route identically under the learned gate."""
    from textract_demo_spark.fixtures.generator import make_fixtures
    fx = make_fixtures(n_convs=120, seed=7)
    n = 0
    for turn in fx["transcripts"]:
        text = turn["text"]
        heur = classify_quality(text)["label"]
        learned = "good" if score_micro(text) >= 0 else "bad"
        assert learned == heur, repr(text[:100])
        n += 1
    assert n > 300


def _duck_features(texts: list[str]) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"text": texts}))
    feats = feature_sql("text", "duckdb")
    cols = ", ".join(f"CAST({sql} AS BIGINT) AS {name}"
                     for name, sql in feats.items())
    return con.sql(
        f"SELECT {cols}, CAST({score_sql('text', 'duckdb')} AS BIGINT)"
        f" AS score FROM t").df()


ADVERSARIAL = [
    "", " ", "\n", "\t \x0b\f\r ", "a", "<", ">", "</", "<>", "></",
    "<a><b></b>", "plain text", "x" * 5000,
    "\x00\x01\x02", "ok\x07\x08ok", "< html>", "<!DOCTYPEhtml>",
    "<!doctype html><p>hi</p>", "<html", "<html>", "<html></html>",
    "text with < and > and </ inside", "5 < 6 > 4",
    PDF_PREFIX, PDF_PREFIX + "JVBE", PDF_PREFIX + "JVBERg==",
    PDF_PREFIX + "!!!", PDF_PREFIX + "abc", PDF_PREFIX + "abcd",
    PDF_PREFIX + "YWJj", "data:application/pdf;base64",
    "  <html><p>pad</p></html>  ", "tag soup <<<>>></",
]


def test_featurizer_python_duckdb_parity():
    texts = ADVERSARIAL + [t for t, _ in labelled_corpus()]
    duck = _duck_features(texts)
    for i, t in enumerate(texts):
        py = featurize(t)
        got = [int(duck.iloc[i][name]) for name in FEATURES]
        assert got == py, f"{t!r}: duckdb {got} != python {py}"
        assert int(duck.iloc[i]["score"]) == score_micro(t), repr(t)


def _noisy_heldout() -> list[tuple[str, int]]:
    """Held-out set, different seed, deliberately borderline: noise
    ratios straddling the heuristic's 15% binary cut, truncations of
    varying length, near-miss envelopes."""
    import base64
    rng = random.Random(99)
    words = "report line item figure note page total net".split()

    def sent(k):
        return " ".join(rng.choice(words) for _ in range(k))

    out: list[str] = []
    for i in range(60):  # noise ratio 5%..30% around the 15% cut
        base = sent(12 + i % 10)
        n_noise = max(1, int(len(base) * (0.05 + (i % 26) / 100.0)))
        chars = list(base) + [chr(rng.randrange(1, 32))] * n_noise
        rng.shuffle(chars)
        out.append("".join(chars))
    for i in range(40):  # truncated html, long and short bodies
        out.append("<html><body>" + "<p>" + sent(2 + i % 30))
    for i in range(40):  # good html
        out.append("<html><body><p>" + sent(2 + i % 30)
                   + "</p></body></html>")
    for i in range(30):  # pdf near-misses and hits
        body = (f"%PDF-1.4\n1 0 obj\n<< /N {i} >>\nendobj\n%%EOF"
                if i % 2 else sent(5))
        out.append(PDF_PREFIX + base64.b64encode(body.encode()).decode())
    for i in range(30):
        out.append(sent(3 + i % 25))
    return [(t, 1 if classify_quality(t)["label"] == "good" else 0)
            for t in out]


def _auc(scores: list[float], labels: list[int]) -> float:
    pairs = sorted(zip(scores, labels))
    pos = sum(labels)
    neg = len(labels) - pos
    assert pos and neg
    rank_sum = 0.0
    i = 0
    while i < len(pairs):  # midranks for ties
        j = i
        while j < len(pairs) and pairs[j][0] == pairs[i][0]:
            j += 1
        mid = (i + j - 1) / 2.0 + 1.0
        rank_sum += mid * sum(lab for _, lab in pairs[i:j])
        i = j
    return (rank_sum - pos * (pos + 1) / 2.0) / (pos * neg)


def test_trained_model_separates_noisy_heldout():
    held = _noisy_heldout()
    labels = [y for _, y in held]
    trained = [score_micro(t) for t, _ in held]
    auc_trained = _auc(trained, labels)
    # strongest single feature as the baseline: non-printable ratio
    # (lower = better, so negate)
    baseline = [-featurize(t)[FEATURES.index("f_nonprint_bp")]
                for t, _ in held]
    auc_base = _auc(baseline, labels)
    assert auc_trained > 0.97, auc_trained
    assert auc_trained > auc_base + 0.05, (auc_trained, auc_base)


def test_retraining_on_custom_corpus():
    """The 'improve the gate with new labelled data' path: retraining
    on a corpus with an extra failure mode shifts the decision, and
    the quantized model still reproduces the float decisions."""
    extra = [("x" * (2 ** k), 0) for k in range(6, 12)]  # long = bad
    corpus = labelled_corpus() + extra * 20
    b, w = train_quality_scorer(corpus)
    assert (b, w) != (TRAINED_BIAS_MICRO, TRAINED_WEIGHTS_MICRO)
    long_score = b + sum(wi * fi for wi, fi in
                         zip(w, featurize("y" * 4096)))
    assert long_score < score_micro("y" * 4096)


def test_score_sql_rejects_unknown_dialect():
    with pytest.raises(ValueError):
        feature_sql("text", "postgres")


import os as _os

from hypothesis import given, settings
from hypothesis import strategies as st

_EX = int(_os.environ.get("SPARK_GRAFT_PROP_EXAMPLES", "0")) or None

_payloadish = st.one_of(
    st.text(max_size=200),
    st.text(alphabet="<>/!abc \t\n\x0b{}=+", max_size=80),
    st.builds(lambda s: PDF_PREFIX + s, st.text(max_size=60)),
    st.builds(lambda s: "<html>" + s, st.text(max_size=60)),
)


@settings(max_examples=_EX or 60, deadline=None)
@given(st.lists(_payloadish, min_size=1, max_size=25))
def test_featurizer_parity_fuzz(texts):
    """Property: the Python featurizer and the DuckDB SQL featurizer
    agree on ARBITRARY strings (the Spark SQL side shares the same
    expression text modulo function spelling and is driver-oracled).
    Batched per example — one DuckDB round trip scores 25 strings."""
    duck = _duck_features(texts)
    for i, t in enumerate(texts):
        py = featurize(t)
        got = [int(duck.iloc[i][name]) for name in FEATURES]
        assert got == py, f"{t!r}: duckdb {got} != python {py}"
