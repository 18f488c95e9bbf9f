"""BPE (byte-pair-encoding) tokenizer: a distributed trainer and a
zero-shuffle applier — the "tokenize" stage a training-data pipeline
runs over every surviving document.

Training (Sennrich et al. 2016) is iterative argmax over symbol-pair
counts. The Spark-first insight is that BPE trains on the WORD
FREQUENCY table, not the corpus: the corpus is touched ONCE (one
explode + groupBy(word) shuffle); every merge iteration then runs on
the vocabulary-sized (word, freq, symbols) frame — pair counts are a
narrow explode + partial-aggregated groupBy, the winning pair is the
only thing the driver ever sees (a 1-row collect), and the merge is
applied as a narrow string rewrite. Lineage is truncated per
iteration (localCheckpoint) so the plan does not grow with merges —
the run_curate lesson (plan-string OOM) applied preemptively.

Application has two forms, proven equal in tests:

* ``apply_bpe`` — the canonical greedy per-word loop as an
  Arrow-batched pandas UDF with a word-level memo (Zipf makes the
  memo hit rate extreme). The production path.
* ``bpe_sql_expr`` — the same function as a chain of plan-time
  literal ``replace`` calls over the space-joined symbol string
  (codegen'd, zero Python, zero shuffle), emitted for BOTH the Spark
  and DuckDB dialects — which is what makes the driver query's BPE
  segmentation hash-verifiable against the oracle. Replace semantics
  continue scanning AFTER each replacement, so a single pass
  under-merges self-chaining runs (``a a a a``); the expression
  repeats each merge's replace ``repeats`` times, which reaches the
  canonical fixpoint for runs up to ~2^repeats (asserted against the
  canonical applier in tests; raise ``repeats`` for pathological
  corpora).

The frozen default (``FROZEN_MERGES``) is trained offline by the
pure-Python reference implementation (``ref_train_bpe``, also the
test oracle for the Spark trainer) on the fixture paragraph below —
the classifier.py / quality_model.py convention for trained
artifacts: deterministic, committed, reproduced by tests.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import normalize_text

END = "</w>"  # end-of-word symbol (Sennrich)

# fixture corpus for the frozen tokenizer (word-boundary English with
# repeated stems so merges are linguistically meaningful)
_BPE_FIXTURE = (
    "the lower lowest newer newest wider widest low lower new newer"
    " wide wider the lowest newest widest low new wide the the"
    " lower newer wider lowest newest widest")


def _word_syms(word: str) -> tuple[str, ...]:
    return tuple(list(word) + [END])


def ref_train_bpe(words: dict[str, int],
                  n_merges: int) -> list[tuple[str, str]]:
    """Pure-Python reference trainer (Sennrich alg. 1) with the
    deterministic tie-break (count DESC, pair ASC) the Spark trainer
    must reproduce."""
    vocab = {_word_syms(w): f for w, f in words.items()}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        new_vocab = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (i < len(syms) - 1
                        and (syms[i], syms[i + 1]) == best):
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges


def _ref_segment(word: str, merges: list[tuple[str, str]]) -> list[str]:
    syms = list(_word_syms(word))
    for a, b in merges:
        out, i = [], 0
        while i < len(syms):
            if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def _frozen() -> list[tuple[str, str]]:
    words: dict[str, int] = {}
    for w in _BPE_FIXTURE.split():
        words[w] = words.get(w, 0) + 1
    return ref_train_bpe(words, 16)


FROZEN_MERGES: list[tuple[str, str]] = _frozen()


def train_bpe(docs: DataFrame, n_merges: int, text_col: str = "text",
              min_freq: int = 1,
              repeats: int = 6) -> list[tuple[str, str]]:
    """Distributed BPE training (module docstring for the scale
    shape). Returns the learned merge list in order."""
    wf = (docs
          .select(F.explode(F.split(normalize_text(text_col), " "))
                  .alias("w"))
          .filter(F.col("w") != "")
          .groupBy("w").agg(F.count("*").alias("freq"))
          .withColumn(
              "sym",
              F.concat(F.regexp_replace("w", "(.)", "$1 "),
                       F.lit(END)))
          .drop("w")
          .localCheckpoint())
    merges: list[tuple[str, str]] = []
    try:
        for _ in range(n_merges):
            top = (wf.select("freq", F.split("sym", " ").alias("ss"))
                   # guard single-symbol rows: sequence(0, -1) counts
                   # DOWN in Spark and would index past the array
                   .select("freq", F.expr(
                       "CASE WHEN size(ss) < 2 THEN"
                       " array() ELSE"
                       " transform(sequence(0, size(ss) - 2),"
                       " i -> struct(ss[i] AS a, ss[i + 1] AS b)) END")
                       .alias("ps"))
                   .select("freq", F.explode("ps").alias("p"))
                   .groupBy("p.a", "p.b")
                   .agg(F.sum("freq").alias("n"))
                   .orderBy(F.desc("n"), "a", "b")
                   .limit(1).collect())
            if not top or top[0]["n"] < min_freq:
                break
            a, b = top[0]["a"], top[0]["b"]
            merges.append((a, b))
            expr: Column = F.concat(F.lit(" "), F.col("sym"), F.lit(" "))
            for _r in range(repeats):
                expr = F.replace(expr, F.lit(f" {a} {b} "),
                                 F.lit(f" {a + b} "))
            old = wf
            wf = wf.withColumn("sym", F.trim(expr)).localCheckpoint()
            old.unpersist()
    finally:
        wf.unpersist()
    return merges


def apply_bpe(docs: DataFrame, merges: list[tuple[str, str]] | None = None,
              text_col: str = "text",
              out_col: str = "bpe_tokens") -> DataFrame:
    """Canonical BPE segmentation (Arrow-batched pandas UDF with a
    per-batch word memo): adds ``out_col`` = array of BPE tokens for
    the normalized text. Zero shuffle."""
    merges = FROZEN_MERGES if merges is None else merges

    @F.pandas_udf("array<string>")
    def seg(texts: pd.Series) -> pd.Series:
        memo: dict[str, list[str]] = {}

        def one(t):
            toks: list[str] = []
            for w in " ".join((t or "").lower().split()).split():
                got = memo.get(w)
                if got is None:
                    got = memo[w] = _ref_segment(w, merges)
                toks.extend(got)
            return toks

        return texts.map(one)

    return docs.withColumn(out_col, seg(F.col(text_col)))


def _sym_string_sql(text_expr: str, dialect: str) -> str:
    """SQL building the space-joined symbol string with END markers:
    normalize -> space every char -> original spaces (now triple)
    become the END separator -> trailing END. Empty text => ''."""
    # Spark SQL string literals process backslash escapes ('\s' ->
    # 's', silently turning the regex into literal 's+'); DuckDB's
    # don't. Double it for Spark only.
    norm = (f"lower(regexp_replace(trim({text_expr}),"
            + (r" '\\s+', ' '))" if dialect == "spark"
               else r" '\s+', ' ', 'g'))"))
    spaced = (f"regexp_replace({norm}, '(.)', "
              + ("'$1 ')" if dialect == "spark" else r"'\1 ', 'g')"))
    with_end = (f"replace({spaced}, '   ', ' {END} ')")
    return (f"CASE WHEN {norm} = '' THEN ''"
            f" ELSE concat({with_end}, '{END}') END")


def bpe_sql_expr(text_expr: str, merges: list[tuple[str, str]] | None = None,
                 repeats: int = 6, dialect: str = "spark") -> str:
    """The BPE segmentation as ONE SQL expression (space-joined token
    string): plan-time literal replace chain over the symbol string —
    len(merges) * repeats codegen'd replaces, no join, no shuffle, no
    Python. ``dialect`` emits Spark or DuckDB syntax (they differ
    only in regexp_replace's global flag)."""
    merges = FROZEN_MERGES if merges is None else merges
    expr = f"concat(' ', {_sym_string_sql(text_expr, dialect)}, ' ')"
    for a, b in merges:
        pat, rep = f" {a} {b} ", f" {a}{b} "
        for _ in range(repeats):
            expr = f"replace({expr}, '{pat}', '{rep}')"
    return f"trim({expr})"
