"""Text analysis for training-data pipelines: token counting, quality
scoring, language-ID heuristic, repetition markers, heavy hitters,
document fingerprinting. Native SQL expressions (JVM-side,
whole-stage codegen) wherever codegen actually applies; the
repetition markers default to an Arrow kernel because their SQL form
is a higher-order-function tree Spark interprets (see
``_repetition_stats_udf`` for the measurement) — the SQL form stays
as the cross-engine reference semantics.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword marker sets for the n-gram/stopword
# language heuristic (deterministic, SQL-expressible in both engines)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "is", "in", "that"],
    "es": ["el", "la", "de", "que", "y", "los", "es", "una"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "des", "est", "une", "dans"],
}

STOPWORDS_EN = LANG_MARKERS["en"] + ["it", "for", "on", "with", "as"]


def _tokens(text_col: str) -> str:
    return (f"split(lower(regexp_replace(trim({text_col}),"
            r" '\\s+', ' ')), ' ')")


def with_token_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish subword estimate
    (words + extra pieces for long words, ~4 chars/piece)."""
    t = _tokens(text_col)
    return (docs
            .withColumn("n_chars_calc",
                        F.length(text_col).cast("long"))
            .withColumn("n_tokens", F.expr(f"size({t})").cast("long"))
            .withColumn("n_distinct_tokens",
                        F.expr(f"size(array_distinct({t}))").cast("long"))
            .withColumn("n_subword_est", F.expr(f"""
                aggregate({t}, 0L, (acc, w) ->
                  acc + 1 + int(greatest(length(w) - 1, 0) / 4))"""))
            )


def with_quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality score: length band + stopword ratio + alpha
    ratio. Outputs are integer basis points via floor() — decimal
    round() at half boundaries diverges across engines (Java
    BigDecimal.valueOf canonicalizes the double's shortest repr,
    DuckDB rounds the raw binary), while floor on bit-identical IEEE
    doubles is deterministic."""
    t = _tokens(text_col)
    sw = ", ".join(f"'{w}'" for w in STOPWORDS_EN)
    return (docs
            .withColumn("stopword_ratio_bp", F.expr(f"""
                cast(floor(1000000 * size(filter({t}, w -> w IN ({sw})))
                      / cast(greatest(size({t}), 1) AS DOUBLE)) AS BIGINT)"""))
            .withColumn("alpha_ratio_bp", F.expr(f"""
                cast(floor(1000000 *
                      length(regexp_replace({text_col}, '[^a-zA-Z]', ''))
                      / cast(greatest(length({text_col}), 1) AS DOUBLE))
                     AS BIGINT)"""))
            .withColumn("quality_score_bp", F.expr("""
                cast(floor(1000 * least(1.0d,
                  0.3d * least(n_tokens / 50.0d, 1.0d)
                  + 0.4d * least((stopword_ratio_bp / 1000000.0d) * 5.0d,
                                 1.0d)
                  + 0.3d * (alpha_ratio_bp / 1000000.0d))) AS BIGINT)""")))


# the Gopher rules' stop-word set (Rae et al. 2021, "Scaling Language
# Models: ... Gopher", Table A1): a doc must contain >= 2 of these
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have",
                    "with"]


def with_gopher_rules(docs: DataFrame, text_col: str = "text",
                      min_words: int = 50, max_words: int = 100_000,
                      min_mean_wl_milli: int = 3000,
                      max_mean_wl_milli: int = 10_000,
                      max_symbol_ratio_milli: int = 100,
                      min_alpha_frac_milli: int = 800,
                      min_stopword_hits: int = 2) -> DataFrame:
    """Gopher-style named quality rules (Rae et al. 2021, Table A1) —
    the rule-per-column complement of the blended
    ``with_quality_score``: each document gets the raw statistic, the
    per-rule boolean, and the overall ``gopher_keep`` conjunction, so
    a curation pipeline can threshold, audit or ablate rules
    individually.

    Rules (defaults = the published bounds):
      - word count in [min_words, max_words];
      - mean word length in [3, 10] chars (integer milli — div, no
        float, so the value is engine-bit-stable);
      - symbol-to-word ratio <= 0.1, symbols = '#' and '...'
        occurrences (non-overlapping greedy count via replace());
      - >= 80% of words contain an alphabetic character;
      - >= min_stopword_hits DISTINCT Gopher stop words present
        (counted as 8 array_contains terms — identical semantics in
        Spark and DuckDB, no list-dedup ambiguity).

    All-native narrow SQL: zero shuffle, no UDF, whole-stage codegen
    except the two small lambda filters; comparisons are
    integer-cross-multiplied (1000*x <= r*n) so no division happens
    at all. Scale shape: a pure map — partition-count-preserving,
    pushdown-friendly (reads only ``text``)."""
    t = _tokens(text_col)
    sw_terms = " + ".join(
        f"if(array_contains({t}, '{w}'), 1, 0)" for w in GOPHER_STOPWORDS)
    return (docs
            .withColumn("n_words", F.expr(f"size({t})").cast("long"))
            .withColumn("sum_word_len", F.expr(
                f"aggregate({t}, 0L, (acc, w) -> acc + length(w))"))
            .withColumn("mean_wl_milli", F.expr(
                "(1000 * sum_word_len) div greatest(n_words, 1)"))
            .withColumn("n_symbols", F.expr(f"""
                cast(length({text_col}) -
                     length(replace({text_col}, '#', '')) +
                     (length({text_col}) -
                      length(replace({text_col}, '...', ''))) div 3
                     AS BIGINT)"""))
            .withColumn("n_alpha_words", F.expr(
                f"cast(size(filter({t}, w -> w rlike '[a-z]'))"
                " AS BIGINT)"))
            .withColumn("n_stopword_hits",
                        F.expr(f"cast({sw_terms} AS BIGINT)"))
            .withColumn("word_count_ok",
                        F.col("n_words").between(min_words, max_words))
            .withColumn("mean_wl_ok",
                        F.col("mean_wl_milli").between(
                            min_mean_wl_milli, max_mean_wl_milli))
            .withColumn("symbol_ok", F.expr(
                f"1000 * n_symbols <="
                f" {max_symbol_ratio_milli} * n_words"))
            .withColumn("alpha_ok", F.expr(
                f"1000 * n_alpha_words >="
                f" {min_alpha_frac_milli} * n_words"))
            .withColumn("stopword_ok",
                        F.col("n_stopword_hits") >= min_stopword_hits)
            .withColumn("gopher_keep", F.expr(
                "word_count_ok AND mean_wl_ok AND symbol_ok"
                " AND alpha_ok AND stopword_ok"))
            .drop("sum_word_len"))


def with_langid(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-marker language ID: argmax over language marker-set
    hit counts; 'und' when nothing matches. Ties resolve in fixed
    language order (en, es, de, fr)."""
    t = _tokens(text_col)
    hits = []
    for lang, words in LANG_MARKERS.items():
        ws = ", ".join(f"'{w}'" for w in words)
        hits.append(f"size(filter({t}, w -> w IN ({ws}))) AS {lang}")
    docs = docs.withColumn("lang_hits",
                           F.expr("struct(" + ", ".join(hits) + ")"))
    order = list(LANG_MARKERS)
    best = "GREATEST(" + ", ".join(f"lang_hits.{lg}" for lg in order) + ")"
    case = "CASE WHEN " + best + " = 0 THEN 'und' " + " ".join(
        f"WHEN lang_hits.{lg} = {best} THEN '{lg}'" for lg in order
    ) + " END"
    return docs.withColumn("lang_pred", F.expr(case))


def _repetition_stats_udf():
    """Arrow-batched repetition kernel: Counter top-token + 2-gram
    set per doc. Why Python: the SQL higher-order form is interpreted
    (no codegen for lambda trees) and an in-lambda token reference
    re-tokenizes per element — measured 3.6 s vs ~0.4 s for this
    kernel on the sf0.1 corpus (same pattern as the SimHash and
    shingle-hash kernels). Bit-identical output (floor of the same
    IEEE double division); tokenization mirrors ``_tokens`` exactly
    (space-only trim, Java ASCII whitespace class; ASCII corpora for
    lower() parity)."""
    import re as _re
    from collections import Counter

    import pandas as pd

    ws = _re.compile(r"[ \t\n\x0b\f\r]+")

    @F.pandas_udf(
        "struct<top_token_frac_bp:bigint,dup_2gram_frac_bp:bigint>")
    def kernel(texts):  # typed by returnType string (see
        # _simhash_from_hashes_udf note on the hint resolver)
        import math
        tops, dups = [], []
        for s in texts:
            toks = ws.sub(" ", (s or "").strip(" ")).lower().split(" ")
            n = len(toks)
            top = Counter(toks).most_common(1)[0][1]
            tops.append(math.floor(1000000 * top / max(n, 1)))
            m = max(n - 2, 0) + 1
            grams = {" ".join(toks[i:i + 2]) for i in range(m)}
            dups.append(math.floor(1000000 * (1.0 - len(grams) / m)))
        return pd.DataFrame({"top_token_frac_bp": tops,
                             "dup_2gram_frac_bp": dups})

    return kernel


def with_repetition_stats(docs: DataFrame, text_col: str = "text",
                          use_arrow: bool = True) -> DataFrame:
    """Within-document repetition markers (Gopher/C4-style quality
    rules): the fraction of the doc taken by its most frequent token,
    and the fraction of word-2-gram occurrences that are repeats.
    High values mark boilerplate/spam/keyword-stuffed docs a training
    corpus drops.

    Integer basis points via floor (cross-engine determinism, same
    convention as ``with_quality_score``). Zero shuffles either way.
    Default is the Arrow kernel (``_repetition_stats_udf``); the SQL
    form (``use_arrow=False``, the reference semantics the DuckDB
    oracle states) binds the token array ONCE as a column — an
    in-lambda ``split(...)`` reference is re-evaluated per lambda
    element, i.e. O(n) tokenizations per doc — and computes the
    top-token count as the max run length of the SORTED array (one
    aggregate pass, O(n log n); the naive distinct x filter form is
    O(n^2) in document length).
    """
    if use_arrow:
        k = _repetition_stats_udf()
        return (docs.withColumn("_rep", k(text_col))
                .withColumn("top_token_frac_bp",
                            F.col("_rep.top_token_frac_bp"))
                .withColumn("dup_2gram_frac_bp",
                            F.col("_rep.dup_2gram_frac_bp"))
                .drop("_rep"))
    t = _tokens(text_col)
    out = (docs
           .withColumn("_toks", F.expr(t))
           .withColumn("top_token_frac_bp", F.expr("""
                cast(floor(1000000 * aggregate(array_sort(_toks),
                      named_struct('prev', cast(null AS string),
                                   'run', 0L, 'best', 0L),
                      (s, w) -> named_struct(
                        'prev', w,
                        'run', IF(s.prev IS NOT NULL AND w = s.prev,
                                  s.run + 1L, 1L),
                        'best', greatest(s.best,
                          IF(s.prev IS NOT NULL AND w = s.prev,
                             s.run + 1L, 1L))),
                      s -> s.best)
                    / cast(greatest(size(_toks), 1) AS DOUBLE))
                     AS BIGINT)"""))
           .withColumn("dup_2gram_frac_bp", F.expr("""
                cast(floor(1000000 * (1.0d -
                      size(array_distinct(transform(
                        sequence(0, greatest(size(_toks) - 2, 0)),
                        i -> array_join(slice(_toks, i + 1, 2), ' '))))
                      / cast(greatest(size(_toks) - 2, 0) + 1
                             AS DOUBLE))) AS BIGINT)""")))
    return out.drop("_toks")


def length_percentiles(docs: DataFrame, qs=(50, 90, 99),
                       by: str = "source",
                       text_col: str = "text") -> DataFrame:
    """Exact per-group token-length percentiles — the curation
    report's distribution summary ("what does p99 doc length look
    like per source before/after filtering").

    Discrete (lower) percentile, all-integer: the q-th percentile is
    the value at 1-indexed rank ceil(q*n/100) of the group's sorted
    lengths, computed as ``(q*n + 99) div 100`` — no floats anywhere,
    so Spark and DuckDB agree bit-for-bit (ties in length don't
    matter: any tie order puts the same VALUE at a given rank).

    Plan shape: ONE exchange on the group key; rank and group count
    share the partitioning (row_number's sort + an unordered
    count(*)); the qs explode multiplies rows only after ranking.
    Exact percentiles need the per-group sort by definition — at
    10^12 rows use this on sampled or already-filtered corpora, or
    reach for approx_percentile when the contract allows error.

    Output: (by, q, n_docs, p_tokens) — one row per group per q.
    """
    from pyspark.sql import Window as W
    base = docs.select(
        F.col(by),
        F.expr(f"size({_tokens(text_col)})").cast("long").alias("v"))
    by_grp = W.partitionBy(by)
    ranked = (base
              .withColumn("rn", F.row_number().over(by_grp.orderBy("v")))
              .withColumn("n", F.count("*").over(by_grp)))
    qarr = F.array([F.lit(int(q)) for q in qs])
    return (ranked
            .withColumn("q", F.explode(qarr))
            .filter(F.expr("rn = (q * n + 99) div 100"))
            .select(by, F.col("q").cast("long").alias("q"),
                    F.col("n").cast("long").alias("n_docs"),
                    F.col("v").alias("p_tokens")))


def token_topk(docs: DataFrame, k: int = 10,
               group_col: str | None = "source",
               text_col: str = "text") -> DataFrame:
    """Per-group token heavy hitters: the k most frequent tokens per
    ``group_col`` (per-domain vocabulary / spam-token discovery), with
    deterministic ties (count desc, then token asc).

    Scale shape: explode tokens -> ONE groupBy((group, token)) count
    whose map-side partial aggregation collapses every within-partition
    repeat before the exchange (the shuffle carries distinct
    (group, token) pairs, not token occurrences), then a per-group
    rank that Spark executes as WindowGroupLimit — partial top-k
    BEFORE the group exchange, never a full sort of the count table.
    ``group_col=None`` ranks one global top-k (the partial group-limit
    still bounds what reaches the single reducer to k per partition).
    """
    t = _tokens(text_col)
    from pyspark.sql import Window
    gcols = [group_col] if group_col else []
    counts = (docs
              .select(*gcols, F.explode(F.expr(t)).alias("token"))
              .groupBy(*gcols, "token")
              .agg(F.count("*").cast("long").alias("n")))
    w = (Window.partitionBy(*gcols)
         .orderBy(F.col("n").desc(), F.col("token")))
    return (counts
            .withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= k))


def token_bits_vocab(docs: DataFrame, text_col: str = "text",
                     min_count: int = 2) -> DataFrame:
    """Corpus unigram vocabulary with EXACT integer log-frequency:
    one row per token with corpus count >= ``min_count`` and
    ``bits = floor(log2(count))`` computed as ``length(bin(count)) - 1``
    — pure integer/string arithmetic, so the value is bit-identical in
    every engine (no libm log whose last-ulp could flip a floor).

    Scale shape: explode -> ONE groupBy(token) count with map-side
    partial aggregation (the exchange carries distinct tokens per
    partition, not occurrences); the ``min_count`` cutoff is what
    bounds the vocabulary at corpus scale — natural-language token
    counts are zipfian, so the table that survives the filter is
    MB-sized even for a 10^12-token corpus and safely broadcastable.
    """
    t = _tokens(text_col)
    return (docs
            .select(F.explode(F.expr(t)).alias("token"))
            .groupBy("token")
            .agg(F.count("*").cast("long").alias("n"))
            .filter(F.col("n") >= min_count)
            .withColumn("bits",
                        (F.length(F.expr("bin(n)")) - 1).cast("long")))


def with_unigram_surprisal(docs: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id", min_count: int = 2,
                           vocab: DataFrame | None = None) -> DataFrame:
    """CCNet-style unigram language-model scoring: each document gets
    its mean token surprisal under the corpus's own unigram
    distribution — the perplexity-filtering step of corpus curation
    (low surprisal = repetitive/boilerplate, high = rare-token noise;
    curation keeps the middle band).

    Surprisal is measured in WHOLE BITS via exact integer arithmetic:
    ``-log2 p(tok) = log2(total) - log2(count)`` approximated as
    ``bits(total) - bits(count)`` with ``bits(x) = floor(log2 x)``
    from ``length(bin(x)) - 1`` — deterministic across engines by
    construction (the DuckDB oracle recomputes it exactly; no
    floating-point log anywhere). Tokens below ``min_count`` are OOV
    and take the rarest bucket (bits = 0, i.e. maximum surprisal) —
    the standard vocabulary-cutoff convention.

    Output per doc: ``n_tokens``, ``oov_bp`` (OOV fraction in basis
    points), ``surprisal_milli_bits`` (mean surprisal x1000, floor) —
    all integer via ``div``.

    Scale shape: the vocab (see ``token_bits_vocab``) is broadcast;
    the corpus side is explode -> broadcast left join -> ONE
    groupBy(doc) whose partial aggregation collapses each doc's tokens
    before the exchange (explode preserves locality, so the shuffle
    carries ~one partial row per doc per partition, not token
    occurrences). Pass a precomputed ``vocab`` to score a stream or a
    second corpus against a frozen LM table.
    """
    if vocab is None:
        vocab = token_bits_vocab(docs, text_col, min_count)
    total = (docs
             .select(F.expr(f"size({_tokens(text_col)})").alias("_n"))
             .agg(F.sum("_n").cast("long").alias("_total"))
             .withColumn("total_bits",
                         (F.length(F.expr("bin(_total)")) - 1)
                         .cast("long"))
             .select("total_bits"))
    tok = docs.select(F.col(id_col),
                      F.explode(F.expr(_tokens(text_col))).alias("token"))
    return (tok
            .join(F.broadcast(vocab.select("token", "bits")),
                  "token", "left")
            .crossJoin(F.broadcast(total))
            .groupBy(id_col)
            .agg(F.count("*").cast("long").alias("n_tokens"),
                 F.sum(F.when(F.col("bits").isNull(), 1)
                        .otherwise(0)).alias("_oov"),
                 F.sum(F.col("total_bits")
                       - F.coalesce(F.col("bits"), F.lit(0)))
                  .alias("_sb"))
            .select(id_col, "n_tokens",
                    F.expr("1000000 * _oov div n_tokens").cast("long")
                     .alias("oov_bp"),
                    F.expr("1000 * _sb div n_tokens").cast("long")
                     .alias("surprisal_milli_bits")))


def with_fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """64-bit content fingerprint: md5 prefix of normalized text
    (cross-engine deterministic), plus a shingle-based robust
    fingerprint (min of shingle hashes - rolling-hash analog)."""
    norm = (f"lower(regexp_replace(trim({text_col}), '\\\\s+', ' '))")
    return (docs
            .withColumn("fingerprint",
                        F.expr(f"substr(md5({norm}), 1, 16)"))
            .withColumn("robust_fingerprint", F.expr(f"""
                array_min(transform(
                  sequence(0, greatest(size(split({norm}, ' ')) - 3, 0)),
                  i -> xxhash64(array_join(
                       slice(split({norm}, ' '), i + 1, 3), ' '))))""")))


def tfidf_top_terms(docs: DataFrame, k: int = 3,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Per-document characteristic terms by TF-IDF with EXACT integer
    IDF: ``idf_bits = floor(log2(N / df))`` computed as
    ``length(bin(N div df)) - 1`` (the identity
    ``floor(log2(a/b)) == floor(log2(a div b))`` holds for integers
    a >= b > 0, so no float log and no cross-engine boundary risk).
    ``score = tf * idf_bits``; ties rank deterministically
    (score desc, token asc). Corpus-wide stopwords (df == N) score 0.

    Scale shape: (1) ONE groupBy((doc, token)) exchange with map-side
    partial counts — the shuffle carries distinct pairs, not
    occurrences; (2) document frequency derives from that tf frame
    (already one row per (doc, token), so ``count per token`` IS df)
    and joins back as a BROADCAST (the df table is the vocabulary —
    zipf-bounded, MB-sized even at 10^12 tokens, same argument as
    ``token_bits_vocab``); (3) N arrives as a broadcast 1-row
    aggregate, not a driver collect; (4) the per-doc rank runs as
    WindowGroupLimit — partial top-k before the doc exchange.
    """
    from pyspark.sql import Window
    t = _tokens(text_col)
    tf = (docs
          .select(id_col, F.explode(F.expr(t)).alias("token"))
          .groupBy(id_col, "token")
          .agg(F.count("*").cast("long").alias("tf")))
    tf = tf.persist()
    dfreq = (tf.groupBy("token")
             .agg(F.count("*").cast("long").alias("df")))
    # N = number of documents with >= 1 token: derive it from the tf
    # frame too (distinct doc count) so the whole query reads the
    # corpus exactly once
    ndocs = (tf.select(id_col).distinct()
             .agg(F.count("*").cast("long").alias("n_docs")))
    scored = (tf
              .join(F.broadcast(dfreq), "token")
              .crossJoin(F.broadcast(ndocs))
              .withColumn("idf_bits",
                          (F.length(F.expr("bin(n_docs div df)")) - 1)
                          .cast("long"))
              .withColumn("score",
                          (F.col("tf") * F.col("idf_bits")).cast("long")))
    w = (Window.partitionBy(id_col)
         .orderBy(F.col("score").desc(), F.col("token")))
    out = (scored
           .withColumn("rank", F.row_number().over(w).cast("long"))
           .filter(F.col("rank") <= k)
           .select(id_col, "rank", "token", "tf", "df",
                   "idf_bits", "score"))
    # release handle consumed by dedup.release_cached
    out._cached_banded = tf  # noqa: SLF001
    return out


def _norm_sql(text_col: str) -> str:
    return f"lower(regexp_replace(trim({text_col}), '\\\\s+', ' '))"


def _grams_sql(toks: str, n: int) -> str:
    return (f"IF(size({toks}) < {n}, array(),"
            f" transform(sequence(0, size({toks}) - {n}),"
            f" i -> array_join(slice({toks}, i + 1, {n}), ' ')))")


def with_gopher_ngram_fracs(docs: DataFrame,
                            tops: tuple[int, ...] = (2, 3),
                            dups: tuple[int, ...] = (5, 6),
                            text_col: str = "text") -> DataFrame:
    """ALL Gopher n-gram char fractions in ONE Arrow pass — the
    production form of ``with_top_ngram_char_frac`` /
    ``with_dup_ngram_char_frac`` chained (output-identical, asserted
    in tests/test_textstats_ngrams.py, so the same DuckDB oracle
    applies).

    Why a Python kernel here: the stat is per-row dict counting, and
    interpreted Catalyst higher-order lambdas (no codegen for
    aggregate/transform with lambda state) cost ~0.5 us per ELEMENT —
    four chained stats re-normalize, re-split, re-build and re-SORT
    the gram arrays per n, measured 36.5 s at sf0.1 vs ~3 s for this
    kernel. One mapInPandas pass normalizes/splits once and counts
    each n with a hash map (no sort needed — the SQL form sorts only
    to get run-lengths). Same scale shape as the SQL form: zero
    shuffle, embarrassingly per-row.

    Exactness contract (mirrors the SQL forms bit-for-bit on the
    corpus domain): normalize = strip ASCII spaces, collapse Java
    ``\\s`` = ``[ \\t\\n\\x0B\\f\\r]`` runs to one space (NOT Python
    ``\\s`` — it also matches unicode spaces), lowercase; ties on
    top-count break to the lexicographically smallest gram; integer
    ``(1_000_000 * chars) // max(len, 1)``.
    """
    import re as _re

    from pyspark.sql import types as T

    ws = _re.compile(r"[ \t\n\x0B\f\r]+")
    out_cols = ([f"top_{n}gram_char_frac_bp" for n in tops]
                + [f"dup_{n}gram_char_frac_bp" for n in dups])
    schema = T.StructType(
        list(docs.schema.fields)
        + [T.StructField(c, T.LongType()) for c in out_cols])

    def kernel(batches):
        for pdf in batches:
            vals: dict[str, list[int]] = {c: [] for c in out_cols}
            for t in pdf[text_col]:
                norm = ws.sub(" ", (t if isinstance(t, str) else "")
                              .strip(" ")).lower()
                toks = norm.split(" ")
                L = max(len(norm), 1)
                for n in tops:
                    cnt: dict[str, int] = {}
                    for i in range(len(toks) - n + 1):
                        g = " ".join(toks[i:i + n])
                        cnt[g] = cnt.get(g, 0) + 1
                    if cnt:
                        best = max(cnt.values())
                        bg = min(g for g, c in cnt.items()
                                 if c == best)
                        v = (1_000_000 * best * len(bg)) // L
                    else:
                        v = 0
                    vals[f"top_{n}gram_char_frac_bp"].append(v)
                for n in dups:
                    cnt = {}
                    grams = [" ".join(toks[i:i + n])
                             for i in range(len(toks) - n + 1)]
                    for g in grams:
                        cnt[g] = cnt.get(g, 0) + 1
                    cov: set[int] = set()
                    for i, g in enumerate(grams):
                        if cnt[g] >= 2:
                            cov.update(range(i, i + n))
                    chars = sum(len(toks[j]) for j in cov)
                    vals[f"dup_{n}gram_char_frac_bp"].append(
                        (1_000_000 * chars) // L)
            for c in out_cols:
                pdf[c] = pd.Series(vals[c], index=pdf.index,
                                   dtype="int64")
            yield pdf

    return docs.mapInPandas(kernel, schema=schema)


def with_top_ngram_char_frac(docs: DataFrame, n: int,
                             text_col: str = "text") -> DataFrame:
    """Gopher Table A1 "top n-gram character fraction" (Rae et al.
    2021; n=2..4 in the paper): the fraction of normalized-text
    characters covered by the single most frequent word n-gram
    (count x n-gram string length, spaces included, over normalized
    length). Ties on count break to the lexicographically FIRST
    n-gram — deterministic, and replayed by the oracle's
    (count DESC, gram ASC) ranking.

    All-integer value: ``(1_000_000 * count * len(gram)) div len``,
    so the stat is bit-exact cross-engine (the float
    ``floor(1e6 * x)`` convention of the older stats is sensitive to
    operation order; integer div is not). Zero shuffle — one sorted
    run-length aggregate per row (O(m log m) per doc, same shape as
    ``with_repetition_stats``); the gram array binds once as a
    column (an in-lambda reference re-evaluates per element).
    """
    col = f"top_{n}gram_char_frac_bp"
    return (docs
            .withColumn("_norm", F.expr(_norm_sql(text_col)))
            .withColumn("_toks", F.expr("split(_norm, ' ')"))
            .withColumn("_grams", F.expr(_grams_sql("_toks", n)))
            .withColumn(col, F.expr("""
                (1000000L * aggregate(array_sort(_grams),
                   named_struct('prev', cast(null AS string),
                                'run', 0L, 'best', 0L,
                                'bg', cast(null AS string)),
                   (s, w) -> named_struct(
                     'prev', w,
                     'run', IF(s.prev IS NOT NULL AND w = s.prev,
                               s.run + 1L, 1L),
                     'best', IF(IF(s.prev IS NOT NULL AND w = s.prev,
                                   s.run + 1L, 1L) > s.best,
                                IF(s.prev IS NOT NULL AND w = s.prev,
                                   s.run + 1L, 1L), s.best),
                     'bg', IF(IF(s.prev IS NOT NULL AND w = s.prev,
                                 s.run + 1L, 1L) > s.best,
                              w, s.bg)),
                   s -> IF(s.bg IS NULL, 0L,
                           s.best * length(s.bg))))
                div greatest(length(_norm), 1L)"""))
            .drop("_norm", "_toks", "_grams"))


def with_dup_ngram_char_frac(docs: DataFrame, n: int,
                             text_col: str = "text") -> DataFrame:
    """Gopher Table A1 "duplicate n-gram character fraction" (Rae et
    al. 2021; n=5..10 in the paper): the fraction of normalized-text
    characters lying inside ANY occurrence of an n-gram that appears
    at least twice in the document — position-coverage semantics
    (overlapping occurrences count each character once), the
    DataTrove/Dolma reading of the rule. Characters are the covered
    tokens' characters; inter-token spaces are not attributed
    (documented; the oracle states the identical rule).

    Per row: sorted run-length aggregate collects the duplicated
    gram VALUES, a position filter marks their occurrences, covered
    token indices are the distinct flatten of the occurrence windows,
    and the character sum reads token lengths by index. All-integer
    output ``(1_000_000 * covered_chars) div len`` — bit-exact
    cross-engine. Zero shuffle; arrays bind once as columns.
    """
    col = f"dup_{n}gram_char_frac_bp"
    return (docs
            .withColumn("_norm", F.expr(_norm_sql(text_col)))
            .withColumn("_toks", F.expr("split(_norm, ' ')"))
            .withColumn("_grams", F.expr(_grams_sql("_toks", n)))
            .withColumn("_dupv", F.expr("""
                aggregate(array_sort(_grams),
                  named_struct('prev', cast(null AS string),
                               'run', 0L,
                               'acc', cast(array() AS array<string>)),
                  (s, w) -> named_struct(
                    'prev', w,
                    'run', IF(s.prev IS NOT NULL AND w = s.prev,
                              s.run + 1L, 1L),
                    'acc', IF(s.prev IS NOT NULL AND w = s.prev
                              AND s.run = 1L,
                              concat(s.acc, array(w)), s.acc)),
                  s -> s.acc)"""))
            .withColumn("_cov", F.expr(f"""
                array_distinct(flatten(transform(
                  filter(IF(size(_grams) = 0, array(),
                            sequence(0, size(_grams) - 1)),
                         i -> array_contains(_dupv,
                                             element_at(_grams, i + 1))),
                  i -> sequence(i, i + {n} - 1))))"""))
            .withColumn(col, F.expr("""
                (1000000L * aggregate(_cov, 0L,
                   (s, j) -> s + length(element_at(_toks, j + 1))))
                div greatest(length(_norm), 1L)"""))
            .drop("_norm", "_toks", "_grams", "_dupv", "_cov"))


# ---------------------------------------------------------------------------
# bigram LM scoring (Stupid Backoff)

BACKOFF_PENALTY_BITS = 2  # ~= -log2(0.25): integer stand-in for the
# Stupid-Backoff alpha=0.4 (-1.32 bits) — chosen whole so every score
# stays in exact integer bits (documented, mirrored by the oracle)


def _nonempty_tokens(text_col: str) -> str:
    return f"filter({_tokens(text_col)}, x -> x <> '')"


def _bigram_pairs(toks_col: str) -> str:
    """Per-row adjacent token pairs as array<struct<w1,w2>> over an
    ALREADY-MATERIALIZED token-array column — built NARROWLY inside
    the row (no positional self-join of an exploded token table,
    which would shuffle the corpus twice). The caller materializes
    the tokens into a column first: referencing the tokenizer
    expression itself here would re-run split+filter inside every
    element_at of the lambda (no CSE across lambda bodies — measured
    22 s -> 0.7 s at sf0.1 for the scoring query)."""
    t = toks_col
    return (f"IF(size({t}) >= 2,"
            f" transform(sequence(1, size({t}) - 1),"
            f" i -> named_struct('w1', element_at({t}, i),"
            f" 'w2', element_at({t}, i + 1))),"
            f" array())")


def bigram_counts(docs: DataFrame, text_col: str = "text",
                  min_count: int = 2) -> DataFrame:
    """Corpus bigram table (w1, w2, n12) with count >= ``min_count``:
    one explode of per-row pair arrays + ONE groupBy((w1, w2))
    exchange with map-side partial counts. The cutoff bounds the
    table the same zipfian way ``token_bits_vocab`` does (bigram
    types are heavier-tailed than unigrams, so the cutoff matters
    MORE here: singleton bigrams — the vast majority — never leave
    the map side's partial count)."""
    return (docs
            .select(F.expr(_nonempty_tokens(text_col)).alias("_tk"))
            .select(F.explode(F.expr(_bigram_pairs("_tk")))
                    .alias("p"))
            .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
            .groupBy("w1", "w2")
            .agg(F.count("*").cast("long").alias("n12"))
            .filter(F.col("n12") >= min_count))


def unigram_counts(docs: DataFrame, text_col: str = "text",
                   min_count: int = 2) -> DataFrame:
    """(token, n, bits) over NON-EMPTY tokens (the bigram family's
    vocabulary; ``token_bits_vocab`` keeps the raw-split convention
    for compatibility with the unigram scorer's driver oracle)."""
    return (docs
            .select(F.explode(F.expr(_nonempty_tokens(text_col)))
                    .alias("token"))
            .groupBy("token")
            .agg(F.count("*").cast("long").alias("n"))
            .filter(F.col("n") >= min_count)
            .withColumn("bits",
                        (F.length(F.expr("bin(n)")) - 1).cast("long")))


def with_bigram_surprisal(docs: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id", min_count: int = 2,
                          bigrams: DataFrame | None = None,
                          vocab: DataFrame | None = None) -> DataFrame:
    """Bigram language-model scoring with Stupid Backoff (Brants et
    al. 2007) — the order-2 step from ``with_unigram_surprisal``
    toward the KenLM-style perplexity filter of CCNet-grade curation
    (a unigram LM cannot see word order; a bigram LM scores
    "the the the" as the garbage it is).

    Per transition (w1 -> w2), in EXACT integer bits (no float log —
    ``floor(log2(a/b)) == floor(log2(a div b))`` for integers
    a >= b > 0, computed via ``length(bin(.)) - 1``):

    - bigram seen (n12 >= min_count):
      ``bits = floor(log2(c(w1) div c(w1,w2)))`` — the conditional
      ``-log2 p(w2|w1)``;
    - backoff: ``BACKOFF_PENALTY_BITS + bits(total) - bits(c(w2))``
      (the unigram surprisal of w2 plus a whole-bit penalty; OOV w2
      takes the rarest bucket, bits = 0, like the unigram scorer).

    Output per doc: ``n_transitions``, ``hit_bp`` (bigram hit rate in
    basis points x100), ``bits_milli`` (mean transition bits x1000,
    floor) — docs with < 2 tokens emit zeros (explode_outer keeps
    them). Pass precomputed ``bigrams``/``vocab`` to score a stream
    or a second corpus against a frozen model.

    Scale shape: pair arrays are built in-row (zero shuffle); the
    model tables join back broadcast (min_count's zipf cutoff keeps
    them MB-scale; at extreme corpus sizes drop the hint and let the
    (w1, w2) equi-join shuffle-partition — the algebra is unchanged);
    the per-doc aggregate is ONE exchange whose map-side partials
    collapse each doc's transitions."""
    if vocab is None:
        vocab = unigram_counts(docs, text_col, min_count)
        # self-scoring: total = every corpus token (incl. cut
        # singletons), the unigram scorer's/oracle's convention
        total = (docs
                 .select(F.expr(f"size({_nonempty_tokens(text_col)})")
                         .alias("_n"))
                 .agg(F.sum("_n").cast("long").alias("_total")))
    else:
        # frozen model: total = the token mass the MODEL saw (sum of
        # its vocab counts) — the batch's own size must not move the
        # model's probabilities
        total = vocab.agg(F.sum("n").cast("long").alias("_total"))
    if bigrams is None:
        bigrams = bigram_counts(docs, text_col, min_count)
    total = (total
             .withColumn("total_bits",
                         (F.length(F.expr("bin(_total)")) - 1)
                         .cast("long"))
             .select("total_bits"))
    pe = (docs
          .select(F.col(id_col),
                  F.expr(_nonempty_tokens(text_col)).alias("_tk"))
          .select(F.col(id_col),
                  F.explode_outer(F.expr(_bigram_pairs("_tk")))
                  .alias("p"))
          .select(id_col, F.col("p.w1").alias("w1"),
                  F.col("p.w2").alias("w2")))
    scored = (pe
              .join(F.broadcast(bigrams), ["w1", "w2"], "left")
              .join(F.broadcast(vocab.select(F.col("token").alias("w1"),
                                             F.col("n").alias("_n1"))),
                    "w1", "left")
              .join(F.broadcast(vocab.select(F.col("token").alias("w2"),
                                             F.col("bits")
                                             .alias("_bits2"))),
                    "w2", "left")
              .crossJoin(F.broadcast(total)))
    # n12 non-null implies _n1 non-null: c(w1) >= c(w1,w2) >= min_count
    bits_t = (F.when(F.col("w1").isNull(), F.lit(None).cast("long"))
              .when(F.col("n12").isNotNull(),
                    (F.length(F.expr("bin(_n1 div n12)")) - 1)
                    .cast("long"))
              .otherwise(F.lit(BACKOFF_PENALTY_BITS)
                         + F.col("total_bits")
                         - F.coalesce(F.col("_bits2"),
                                      F.lit(0).cast("long"))))
    return (scored
            .withColumn("_b", bits_t)
            .groupBy(id_col)
            .agg(F.sum(F.when(F.col("w1").isNotNull(), 1).otherwise(0))
                 .cast("long").alias("n_transitions"),
                 F.sum(F.when(F.col("n12").isNotNull(), 1).otherwise(0))
                 .cast("long").alias("_hits"),
                 F.sum("_b").cast("long").alias("_sum_bits"))
            .select(id_col, "n_transitions",
                    F.expr("IF(n_transitions = 0, 0L,"
                           " 10000 * _hits div n_transitions)")
                    .cast("long").alias("hit_bp"),
                    F.expr("IF(n_transitions = 0, 0L,"
                           " 1000 * _sum_bits div n_transitions)")
                    .cast("long").alias("bits_milli")))
