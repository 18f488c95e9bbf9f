"""Corpus search / retrieval operators: positional inverted index,
integer-exact BM25 ranking, and index-based phrase search.

A training-data pipeline needs retrieval over its own corpus — for
decontamination forensics ("which documents contain this eval
passage"), targeted curation ("pull the top documents for this
topic"), and audit ("show me every place this phrase appears"). At
10^12 turns you cannot re-scan the corpus per question; you build the
inverted index once and answer from it.

Scale shapes:

- **Index build** (`build_inverted_index`): posexplode + ONE
  groupBy((token, doc_id)) exchange with map-side partial aggregation
  — the shuffle carries distinct (token, doc) pairs (occurrences
  collapse in-partition), and position lists are bounded by per-doc
  term frequency. Hot tokens ("the") spread over tasks because doc_id
  is in the grouping key — no single-token hotspot.
- **BM25** (`bm25_topk`): per-doc length is computed NARROWLY in the
  same projection that explodes tokens (dl rides the explode — no
  doc-keyed join of two corpus-sized frames); the per-token document
  frequency and the corpus aggregate (N, avgdl) come back as
  BROADCAST joins (the df table is query-tokens-sized; N/avgdl is one
  row); the final top-k is a rank window that Spark executes as
  TakeOrderedAndProject / WindowGroupLimit — every task forwards at
  most k rows.
- **Phrase search** (`phrase_search`): candidate starts come from the
  index rows of the phrase's tokens only (filter pushes into the
  index scan), offset-aligned via a broadcast (i, token) phrase map,
  and the final all-offsets-present check is ONE groupBy((doc,
  start)) whose groups are at most phrase-length rows.

All ranking arithmetic is integer fixed-point (milli units, BIGINT
floor division) with IDF in exact integer bits
(``floor(log2(N div df))`` as ``length(bin(.)) - 1``), so DuckDB
replays every score bit-for-bit — the approximate-looking operator
gets an exact oracle. The BM25 shape (k1=1.2, b=0.75 length
normalization) follows Robertson & Sparck Jones as published; the
integer quantization is documented here and mirrored in the oracle.

Reference analog: textract-demo answers "find the field value in
this document" per document (fn-postprocess/main.py key-value
search); at corpus scale the same lookup inverts into an index.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textstats import _tokens

K1_MILLI = 1200  # BM25 k1 = 1.2
B_MILLI = 750    # BM25 b = 0.75


def _norm_query(q: str) -> list[str]:
    """Driver-side mirror of the corpus tokenizer (`_tokens`):
    lowercase, collapse whitespace, split."""
    return [t for t in re.sub(r"\s+", " ", q.strip()).lower().split(" ")
            if t]


def _sql_str(tok: str) -> str:
    return "'" + tok.replace("'", "''") + "'"


def build_inverted_index(docs: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """Positional inverted index: one row per (token, doc) with the
    term frequency and the sorted 0-based position list. ONE exchange
    (map-side partial count/collect collapses occurrences)."""
    t = _tokens(text_col)
    return (docs
            .select(id_col, F.posexplode(F.expr(t))
                    .alias("pos", "token"))
            .filter(F.col("token") != "")
            .groupBy("token", id_col)
            .agg(F.count("*").cast("long").alias("tf"),
                 F.sort_array(F.collect_list(F.col("pos").cast("long")))
                 .alias("positions")))


def _bm25_score_expr(div: str) -> str:
    """The BM25 per-(doc, token) score in milli fixed-point, emitted
    for either dialect (`div` = 'div' for Spark, '//' for DuckDB).
    Inputs in scope: tf, dl, df, n_docs, avgdl_milli (all BIGINT).

    idf_bits = floor(log2(N div df))            -- exact integer bits
    rel_milli = 1e6*dl div avgdl_milli           -- dl/avgdl in milli
    inner_milli = (1000 - b) + b*rel div 1000    -- 1 - b + b*dl/avgdl
    den_milli = 1000*tf + k1*inner div 1000      -- tf + k1*inner
    score_milli = idf_bits * (tf*(k1+1000)*1000 div den_milli)
    """
    return f"""(length(bin(n_docs {div} df)) - 1) *
      ((tf * {K1_MILLI + 1000} * 1000) {div}
       (1000 * tf + ({K1_MILLI} *
          (1000 - {B_MILLI} +
           ({B_MILLI} * ((1000000 * dl) {div} avgdl_milli)) {div} 1000))
         {div} 1000))"""


def bm25_topk(docs: DataFrame, query: str, k: int = 10,
              text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """Top-k documents for a query string by integer-exact BM25.

    Output: (doc_id, rank, score_milli, n_hit_terms, dl); ties break
    deterministically (score desc, doc_id asc). Documents matching no
    query token never appear. Repeated query tokens count once (bag
    semantics on the DOCUMENT side only, set semantics on the query —
    the standard BM25 form).
    """
    toks = sorted(set(_norm_query(query)))
    if not toks:
        raise ValueError("empty query")
    t = _tokens(text_col)
    # document length counts NON-empty tokens only (split('') yields
    # [''], so a whitespace-only doc would otherwise read dl = 1 and
    # pollute N / avgdl)
    dl = f"size(filter({t}, x -> x <> ''))"
    in_list = ", ".join(_sql_str(x) for x in toks)
    # dl rides the explode: no second corpus-sized frame to join back
    exploded = (docs
                .select(id_col,
                        F.expr(dl).cast("long").alias("dl"),
                        F.explode(F.expr(t)).alias("token"))
                .filter(F.expr(f"token IN ({in_list})")))
    tf = (exploded
          .groupBy(id_col, "token")
          .agg(F.count("*").cast("long").alias("tf"),
               F.max("dl").alias("dl")))
    dfreq = (tf.groupBy("token")
             .agg(F.count("*").cast("long").alias("df")))
    # corpus stats: one broadcast row (docs with >= 1 token)
    stats = (docs
             .select(F.expr(dl).cast("long").alias("_dl"))
             .filter(F.col("_dl") > 0)
             .agg(F.count("*").cast("long").alias("n_docs"),
                  F.expr("1000 * sum(_dl)").cast("long").alias("_sum")))
    stats = stats.select(
        "n_docs", F.expr("_sum div n_docs").cast("long")
        .alias("avgdl_milli"))
    scored = (tf
              .join(F.broadcast(dfreq), "token")
              .crossJoin(F.broadcast(stats))
              .withColumn("score_milli",
                          F.expr(_bm25_score_expr("div")).cast("long")))
    per_doc = (scored
               .groupBy(id_col)
               .agg(F.sum("score_milli").cast("long")
                    .alias("score_milli"),
                    F.count("*").cast("long").alias("n_hit_terms"),
                    F.max("dl").alias("dl")))
    w = Window.orderBy(F.col("score_milli").desc(), F.col(id_col))
    return (per_doc
            .withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= k)
            .select(id_col, "rank", "score_milli", "n_hit_terms", "dl"))


def bm25_oracle_sql(query: str, k: int = 10,
                    table: str = "documents") -> str:
    """The DuckDB replay of `bm25_topk` — same tokenizer, same
    integer fixed-point algebra (`//` floor division on positive
    BIGINTs == Spark `div`)."""
    toks = sorted(set(_norm_query(query)))
    in_list = ", ".join(_sql_str(x) for x in toks)
    score = _bm25_score_expr("//")
    dl_sql = ("len(list_filter(string_split(lower(regexp_replace("
              "trim(text), '\\s+', ' ', 'g')), ' '), x -> x <> '')"
              ")::BIGINT")
    return f"""
    WITH tok AS (SELECT doc_id,
          {dl_sql} AS dl,
          unnest(string_split(lower(regexp_replace(trim(text),
              '\\s+', ' ', 'g')), ' ')) AS token
        FROM {table}),
    tf AS (SELECT doc_id, token, count(*)::BIGINT AS tf,
             max(dl)::BIGINT AS dl
           FROM tok WHERE token IN ({in_list})
           GROUP BY doc_id, token),
    dfq AS (SELECT token, count(*)::BIGINT AS df FROM tf GROUP BY token),
    st AS (SELECT count(*)::BIGINT AS n_docs,
             ((1000 * sum(dl)) // count(*))::BIGINT AS avgdl_milli
           FROM (SELECT {dl_sql} AS dl
                 FROM {table}) WHERE dl > 0),
    sc AS (SELECT t.doc_id, ({score})::BIGINT AS score_milli, t.dl
           FROM tf t JOIN dfq USING (token), st),
    pd AS (SELECT doc_id, sum(score_milli)::BIGINT AS score_milli,
             count(*)::BIGINT AS n_hit_terms, max(dl)::BIGINT AS dl
           FROM sc GROUP BY doc_id),
    r AS (SELECT doc_id, score_milli, n_hit_terms, dl,
            row_number() OVER (ORDER BY score_milli DESC, doc_id
              )::BIGINT AS rank
          FROM pd)
    SELECT doc_id, rank, score_milli, n_hit_terms, dl
    FROM r WHERE rank <= {k}
    """


def rrf_fuse(rankings: list[DataFrame], k0: int = 60, k: int = 10,
             id_col: str = "doc_id",
             rank_col: str = "rank") -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of N ranked lists
    over one id space — the standard way to combine a lexical (BM25)
    and a dense (embedding-cosine) retrieval arm without score
    calibration, since only RANKS cross the arm boundary.

    Input frames carry (id_col, rank_col); output is
    (id_col, rrf_micro, n_arms, fused_rank) where
    ``rrf_micro = sum over arms of 1_000_000 div (k0 + rank)`` —
    integer floor division, so DuckDB replays the fused scores
    bit-for-bit. Ties rank deterministically (score desc, arms desc,
    id asc).

    Scale shape: each arm is already top-k' (tiny — k' rows per arm,
    not corpus-sized), so the union + groupBy(id) is a few-row
    exchange and the final window is a WindowGroupLimit over at most
    N*k' rows. The expensive work stays inside the arms, which keep
    their own scale paths (BM25's broadcast df table, ANN's
    LSH/IVF bucketing).
    """
    from functools import reduce

    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    arms = [r.select(F.col(id_col), F.col(rank_col).cast("long")
                     .alias(rank_col)) for r in rankings]
    u = reduce(DataFrame.unionByName, arms)
    scored = (u.groupBy(id_col)
              .agg(F.sum(F.expr(f"1000000 div ({k0} + {rank_col})"))
                   .cast("long").alias("rrf_micro"),
                   F.count("*").cast("long").alias("n_arms")))
    w = Window.orderBy(F.col("rrf_micro").desc(),
                       F.col("n_arms").desc(), F.col(id_col))
    return (scored
            .withColumn("fused_rank", F.row_number().over(w).cast("long"))
            .filter(F.col("fused_rank") <= k))


def phrase_search(index: DataFrame, phrase: str,
                  id_col: str = "doc_id") -> DataFrame:
    """Exact consecutive-token phrase matches answered from the
    positional index alone: (doc_id, start) for every occurrence.

    For phrase tokens p_0..p_{m-1}, a start s matches iff for ALL i
    the index holds (p_i, doc, s + i). Candidates are generated by
    offset-aligning each posting against a broadcast (i, token)
    phrase map (repeated phrase tokens yield one map row per offset),
    then ONE groupBy((doc, start)) checks all m offsets are present.
    """
    toks = _norm_query(phrase)
    if not toks:
        raise ValueError("empty phrase")
    m = len(toks)
    spark = index.sparkSession
    pmap = spark.createDataFrame(
        [(i, t) for i, t in enumerate(toks)], "i int, token string")
    cand = (index
            .filter(F.expr("token IN ({})".format(
                ", ".join(_sql_str(x) for x in sorted(set(toks))))))
            .join(F.broadcast(pmap), "token")
            .select(id_col,
                    F.explode("positions").alias("pos"),
                    F.col("i").cast("long").alias("i"))
            .select(id_col, (F.col("pos") - F.col("i")).alias("start"),
                    "i")
            .filter(F.col("start") >= 0))
    return (cand
            .groupBy(id_col, "start")
            .agg(F.countDistinct("i").alias("_n"))
            .filter(F.col("_n") == m)
            .select(id_col, F.col("start").cast("long").alias("start")))


def phrase_oracle_sql(phrase: str, table: str = "documents") -> str:
    """Independent DuckDB algorithm: slice the token list at every
    start and compare with the phrase list (never consults postings
    or offset alignment — a genuinely different computation)."""
    toks = _norm_query(phrase)
    lst = "[" + ", ".join(_sql_str(x) for x in toks) + "]"
    m = len(toks)
    return f"""
    WITH n AS (SELECT doc_id, string_split(lower(regexp_replace(
          trim(text), '\\s+', ' ', 'g')), ' ') AS toks
        FROM {table}),
    st AS (SELECT doc_id, toks,
             unnest(generate_series(0, len(toks) - {m})) AS s
           FROM n WHERE len(toks) >= {m})
    SELECT doc_id, s::BIGINT AS start
    FROM st WHERE toks[s + 1 : s + {m}] = {lst}
    """
