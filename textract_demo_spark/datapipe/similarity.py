"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force cosine top-k — the exact baseline.
  Query side broadcast, corpus scanned once, per-row JVM arithmetic
  (aggregate/zip_with — no Python), top-k via row_number window over
  (query, score).
- ``lsh_topk``: the scale path — random-hyperplane (sign) LSH with
  multi-probe-free banding: corpus hashed to ``n_bits`` sign bits,
  grouped into bands; candidates = corpus rows sharing any band with
  the query; exact cosine only within candidates. Hyperplanes are
  hash-derived (deterministic, no driver-side randomness), weights in
  {-1,+1} per (plane, dim) from xxhash64 — cheap inside codegen.

At 100 TB the brute-force path is one full scan per query batch
(acceptable for offline eval); the LSH path turns it into a bucket
join touching ~1/2^rows_per_band of the corpus per band.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_COS = """
aggregate(zip_with({a}, {b}, (x, y) -> cast(x AS DOUBLE) * y), 0.0d,
          (acc, v) -> acc + v)
/ (sqrt(aggregate({a}, 0.0d, (acc, v) ->
        acc + cast(v AS DOUBLE) * v)) *
   sqrt(aggregate({b}, 0.0d, (acc, v) ->
        acc + cast(v AS DOUBLE) * v)))
"""


def cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding",
                qid_col: str = "qid", qvec_col: str = "qv") -> DataFrame:
    """Exact top-k by cosine for each query vector.

    Output: (qid, rank, vec_id, cos). Ties broken by vec_id so the
    ranking is deterministic.
    """
    from pyspark.sql.window import Window
    j = (corpus.crossJoin(F.broadcast(queries))
         .filter(F.col(id_col) != F.col(qid_col))
         .withColumn("cos", F.expr(_COS.format(a=vec_col, b=qvec_col))))
    w = Window.partitionBy(qid_col).orderBy(F.desc("cos"), F.col(id_col))
    return (j.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(F.col(qid_col), F.col("rank").cast("long"),
                    F.col(id_col), F.round("cos", 4).alias("cos")))


def _sign_bits(vec_col: str, n_bits: int) -> str:
    """LSH signature: bit p = sign of <v, h_p> where h_p[d] in {-1,+1}
    derives from xxhash64(p, d) — deterministic across executors."""
    return f"""
    transform(sequence(0, {n_bits - 1}), p ->
      if(aggregate(zip_with({vec_col},
                            sequence(0, size({vec_col}) - 1),
                            (x, d) -> cast(x AS DOUBLE) *
                              if(xxhash64(p * 4096 + d) % 2 = 0,
                                 1.0d, -1.0d)),
                   0.0d, (acc, v) -> acc + v) > 0, 1, 0))
    """


def lsh_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
             n_bits: int = 16, bands: int = 4,
             id_col: str = "vec_id", vec_col: str = "embedding",
             qid_col: str = "qid", qvec_col: str = "qv") -> DataFrame:
    """Approximate top-k: sign-LSH banded candidate generation + exact
    cosine re-rank within candidates. Output schema = cosine_topk."""
    from pyspark.sql.window import Window
    rows = n_bits // bands
    band_keys = f"""
      transform(sequence(0, {bands - 1}), b ->
        struct(b AS band,
               array_join(slice(sig, b * {rows} + 1, {rows}), '')
                 AS key))"""
    c = (corpus.withColumn("sig", F.expr(_sign_bits(vec_col, n_bits)))
         .select(id_col, vec_col, F.explode(F.expr(band_keys)).alias("bk")))
    q = (queries.withColumn("sig", F.expr(_sign_bits(qvec_col, n_bits)))
         .select(qid_col, qvec_col, F.explode(F.expr(band_keys)).alias("bk")))
    cand = (c.join(F.broadcast(q), ["bk"])
            .filter(F.col(id_col) != F.col(qid_col))
            .select(qid_col, qvec_col, id_col, vec_col).distinct()
            .withColumn("cos", F.expr(_COS.format(a=vec_col, b=qvec_col))))
    w = Window.partitionBy(qid_col).orderBy(F.desc("cos"), F.col(id_col))
    return (cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(F.col(qid_col), F.col("rank").cast("long"),
                    F.col(id_col), F.round("cos", 4).alias("cos")))
