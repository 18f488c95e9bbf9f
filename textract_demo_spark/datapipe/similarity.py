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


def _md5_sign(key: int) -> bool:
    """True => +1 hyperplane weight: first md5 hex digit of str(key)
    is < '8' — the same derivation DuckDB and the dynamic SQL form
    compute, evaluated once at plan-build time."""
    import hashlib
    return hashlib.md5(str(key).encode()).hexdigest()[0] < "8"


def _sign_bits(vec_col: str, n_bits: int,
               hash_mode: str = "xxhash64", dim: int | None = None) -> str:
    """LSH signature: bit p = sign of <v, h_p> where h_p[d] in {-1,+1}
    derives from a hash of (p, d) — deterministic across executors.

    ``hash_mode='md5'`` is the cross-engine mode (the driver oracle
    replays it in DuckDB): the sign comes from the first md5 hex digit
    of the string "p*4096+d" (< '8' => +1), and the dot product runs
    in FIXED-POINT (each term rounded to 1e-6, summed as integers) so
    the bit is independent of float summation order — double folds
    are not bit-identical across engines; integer sums are.

    When ``dim`` is known, the md5 signs are PRECOMPUTED at plan-build
    time and inlined as an n_bits x dim literal matrix — they depend
    only on (p, d), so evaluating md5 per row is pure waste Catalyst
    cannot constant-fold through lambda variables (measured 3.5x on
    the sf0.1 bench); the per-row work drops to the dot products
    alone. Without ``dim`` the dynamic md5 expression is used."""
    if hash_mode == "xxhash64":
        return f"""
        transform(sequence(0, {n_bits - 1}), p ->
          if(aggregate(zip_with({vec_col},
                                sequence(0, size({vec_col}) - 1),
                                (x, d) -> cast(x AS DOUBLE) *
                                  if(xxhash64(p * 4096 + d) % 2 = 0,
                                     1.0d, -1.0d)),
                       0.0d, (acc, v) -> acc + v) > 0, 1, 0))
        """
    if hash_mode == "md5":
        if dim is not None:
            rows = ", ".join(
                "array(" + ", ".join(
                    ("1000000.0D" if _md5_sign(p * 4096 + d)
                     else "-1000000.0D")
                    for d in range(dim)) + ")"
                for p in range(n_bits))
            return f"""
            transform(sequence(0, {n_bits - 1}), p ->
              if(aggregate(zip_with({vec_col},
                                    element_at(array({rows}), p + 1),
                                    (x, s) -> cast(round(
                                      cast(x AS DOUBLE) * s) AS BIGINT)),
                           0L, (acc, v) -> acc + v) > 0, 1, 0))
            """
        return f"""
        transform(sequence(0, {n_bits - 1}), p ->
          if(aggregate(zip_with({vec_col},
                                sequence(0, size({vec_col}) - 1),
                                (x, d) -> cast(round(cast(x AS DOUBLE) *
                                  if(substr(md5(cast(p * 4096 + d
                                                     AS STRING)), 1, 1)
                                       < '8',
                                     1000000.0d, -1000000.0d)) AS BIGINT)),
                       0L, (acc, v) -> acc + v) > 0, 1, 0))
        """
    raise ValueError(f"unknown hash mode: {hash_mode!r}")


def ivf_centroids(corpus: DataFrame, n_centroids: int = 16,
                  iters: int = 1, id_col: str = "vec_id",
                  vec_col: str = "embedding",
                  hash_mode: str = "xxhash64") -> DataFrame:
    """Deterministic IVF coarse quantizer: seeds are the n_centroids
    corpus rows with the smallest hash64(string(id)) (a uniform,
    driver-randomness-free sample; ``hash_mode='md5'`` makes the seed
    choice DuckDB-replayable), refined by ``iters`` Lloyd steps run as
    DataFrame jobs:

    - assign = argmax cosine vs the broadcast centroid set (narrow);
    - update = per-dimension mean as ``dim`` scalar avg() columns over
      ONE groupBy(cid) — n corpus rows shuffle once with map-side
      partial aggregation (not the n x d exploded (cid, dim) rows a
      posexplode update would shuffle).

    Centroid numbering is done on the driver over the collected
    n_centroids seed rows (a bounded, tiny set at any corpus scale) —
    no global-window single-partition stage. Updated means are
    QUANTIZED to the 2^-16 grid before the float cast: double
    summation order differs across engines (and across partition
    layouts), and the grid snap makes the refined centroids — and so
    bucket assignments — deterministic and cross-engine reproducible.
    Returns (cid, cvec)."""
    from ..datapipe.dedup import hash64
    spark = corpus.sparkSession
    seeds = (corpus
             .select(F.col(id_col), F.col(vec_col),
                     F.expr(hash64(f"cast({id_col} AS STRING)",
                                   hash_mode)).alias("_h"))
             .orderBy("_h").limit(n_centroids)
             .collect())
    seeds.sort(key=lambda r: r["_h"])
    dim = len(seeds[0][vec_col])
    cents = spark.createDataFrame(
        [(cid, r[vec_col]) for cid, r in enumerate(seeds)],
        schema="cid int, cvec array<float>")
    quant = ", ".join(
        f"cast(round(_m{d} * 65536.0d) / 65536.0d AS FLOAT)"
        for d in range(dim))
    for _ in range(iters):
        assigned = assign_to_centroids(corpus, cents, id_col, vec_col)
        cents = (assigned
                 .join(corpus, id_col)
                 .groupBy("cid")
                 .agg(*[F.avg(F.col(vec_col)[d]).alias(f"_m{d}")
                        for d in range(dim)])
                 .select("cid", F.expr(f"array({quant})").alias("cvec")))
    return cents


def assign_to_centroids(corpus: DataFrame, cents: DataFrame,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """(id, cid) assignment: argmax cosine vs the broadcast centroid
    set — a narrow map over the corpus (centroids are tiny)."""
    return (corpus.crossJoin(F.broadcast(cents))
            .withColumn("_cos", F.expr(_COS.format(a=vec_col, b="cvec")))
            .groupBy(id_col)
            .agg(F.max_by("cid", F.struct("_cos", "cid")).alias("cid")))


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
             n_centroids: int = 16, n_probe: int = 4, iters: int = 1,
             id_col: str = "vec_id", vec_col: str = "embedding",
             qid_col: str = "qid", qvec_col: str = "qv",
             hash_mode: str = "xxhash64") -> DataFrame:
    """IVF approximate top-k (the inverted-file scale path): corpus
    rows are bucketed by nearest coarse centroid; each query probes
    its ``n_probe`` nearest centroids and re-ranks exactly ONLY within
    those buckets — candidates ~= n_probe/n_centroids of the corpus
    instead of a full scan. Output schema = cosine_topk. Recall vs the
    exact scorer is gated in tests/test_datapipe.py;
    ``hash_mode='md5'`` makes the whole construction (seeds, Lloyd
    update, probes) DuckDB-replayable — the driver oracle for
    ``ann_ivf_topk`` runs it."""
    from pyspark.sql.window import Window
    cents = ivf_centroids(corpus, n_centroids, iters, id_col, vec_col,
                          hash_mode)
    assigned = (assign_to_centroids(corpus, cents, id_col, vec_col)
                .join(corpus, id_col))
    wq = Window.partitionBy(qid_col).orderBy(F.desc("_cos"), F.col("cid"))
    probes = (queries.crossJoin(F.broadcast(cents))
              .withColumn("_cos", F.expr(_COS.format(a=qvec_col, b="cvec")))
              .withColumn("_r", F.row_number().over(wq))
              .filter(F.col("_r") <= n_probe)
              .select(qid_col, qvec_col, "cid"))
    cand = (assigned.join(F.broadcast(probes), "cid")
            .filter(F.col(id_col) != F.col(qid_col))
            .withColumn("cos", F.expr(_COS.format(a=vec_col, b=qvec_col))))
    w = Window.partitionBy(qid_col).orderBy(F.desc("cos"), F.col(id_col))
    return (cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(F.col(qid_col), F.col("rank").cast("long"),
                    F.col(id_col), F.round("cos", 4).alias("cos")))


def semantic_dedup(corpus: DataFrame, threshold: float = 0.85,
                   n_centroids: int = 16, iters: int = 1,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   hash_mode: str = "xxhash64") -> DataFrame:
    """SemDeDup-style semantic deduplication over an embedding column:
    bucket the corpus by nearest IVF centroid (``ivf_centroids`` /
    ``assign_to_centroids`` — deterministic, hash-seeded), generate
    candidate pairs ONLY within a cluster, and drop every row that has
    a lower-id neighbor at cosine >= ``threshold`` in its cluster
    (min-id-wins keeps exactly one representative per within-cluster
    near-dup group; deterministic, order-free).

    Output: one row per input id — (id_col, cid, kept).

    Scale shape (the SemDeDup point): pairwise cosine never runs
    corpus x corpus — the self-join is an equi-join on cid, so the
    only exchange is one cid-keyed shuffle and each task scores
    |cluster|^2 pairs. n_centroids is the knob that bounds cluster
    size (at 10^12 rows you run 100k centroids, not 16); a skewed
    mega-cluster is handled the same way as any skewed join key
    (AQE skew split, or re-cluster the heavy bucket with a second
    IVF level). Recall is approximate by design: near-dups split
    across cluster boundaries are missed — the documented SemDeDup
    tradeoff vs the exact O(n^2) scan.

    ``hash_mode='md5'`` makes the whole construction (seeds, Lloyd
    refinement, assignment, pair set) DuckDB-replayable — the driver
    oracle for ``semantic_dedup`` replays it end to end.

    The (id, cid, vec) assignment frame is PERSISTED: it feeds both
    sides of the self-join plus the final kept-flag attach, and
    without the persist Spark recomputes the whole IVF assign
    pipeline (centroid crossJoin + max_by groupBy) once per consumer
    — measured ~2.5x on the sf0.1 bench (the same recompute class the
    banded LSH frames hit). Caller contract as in
    ``dedup.lsh_candidate_pairs``: the handle is exposed as
    ``result._cached_banded``; call ``dedup.release_cached(result)``
    after materializing."""
    cents = ivf_centroids(corpus, n_centroids, iters, id_col, vec_col,
                          hash_mode)
    assigned = assign_to_centroids(corpus, cents, id_col, vec_col)
    with_vec = (assigned.join(corpus.select(id_col, vec_col), id_col)
                .persist())
    a = with_vec.select(F.col(id_col).alias("id_a"), "cid",
                        F.col(vec_col).alias("va"))
    b = with_vec.select(F.col(id_col).alias("id_b"), "cid",
                        F.col(vec_col).alias("vb"))
    dropped = (a.join(b, ["cid"])
               .filter(F.col("id_a") < F.col("id_b"))
               .withColumn("_cos", F.expr(_COS.format(a="va", b="vb")))
               .filter(F.col("_cos") >= threshold)
               .select(F.col("id_b").alias(id_col)).distinct()
               .withColumn("_dropped", F.lit(True)))
    out = (with_vec.select(id_col, "cid")
           .join(dropped, id_col, "left")
           .select(F.col(id_col), F.col("cid").cast("long").alias("cid"),
                   F.coalesce(~F.col("_dropped"), F.lit(True))
                    .alias("kept")))
    out._cached_banded = with_vec
    return out


def incremental_semantic_dedup(batch: DataFrame, cents: DataFrame,
                               corpus_assigned: DataFrame,
                               threshold: float = 0.85,
                               id_col: str = "vec_id",
                               vec_col: str = "embedding") -> DataFrame:
    """Incremental SemDeDup: an incoming batch of embeddings vs a
    FROZEN semantic snapshot — the embedding twin of
    ``dedup.incremental_dedup_pairs``. The snapshot is the pair of
    artifacts a full ``semantic_dedup`` run leaves behind:

    - ``cents`` (cid, cvec): the coarse quantizer (tiny, stored);
    - ``corpus_assigned`` (id, cid, vec): the kept vectors with their
      cluster ids (at scale: a table written bucketed by cid, so the
      per-cid probe join co-locates).

    Each batch vector is assigned to its nearest frozen centroid (a
    narrow map — centroids broadcast), then scored ONLY against kept
    corpus vectors and smaller-id batch vectors in the SAME cluster.
    The corpus side never shuffles: the batch's (cid, vec) probe is
    the broadcast side of the one corpus join. Output mirrors
    ``incremental_dedup_pairs``: one row per near-dup relation —
    ``(id, match_id, cos, match_src 'corpus'|'batch')``; a batch
    vector with no row is semantically novel.

    The batch assignment frame is PERSISTED (it feeds the corpus
    probe and both within-batch sides); caller contract as in
    ``dedup.lsh_candidate_pairs``: ``dedup.release_cached(result)``
    after materializing."""
    bass = (assign_to_centroids(batch, cents, id_col, vec_col)
            .join(batch.select(id_col, vec_col), id_col)
            .select(F.col(id_col), "cid", F.col(vec_col).alias("vb"))
            .persist())
    cos = F.expr(_COS.format(a="va", b="vb"))
    vs_corpus = (corpus_assigned
                 .select(F.col(id_col).alias("match_id"), "cid",
                         F.col(vec_col).alias("va"))
                 .join(F.broadcast(bass), "cid")
                 .filter(F.col("match_id") != F.col(id_col))
                 .withColumn("cos", cos)
                 .filter(F.col("cos") >= threshold)
                 .select(id_col, "match_id", "cos",
                         F.lit("corpus").alias("match_src")))
    wb = (bass.select(F.col(id_col).alias("match_id"), "cid",
                      F.col("vb").alias("va"))
          .join(F.broadcast(bass), "cid")
          .filter(F.col("match_id") < F.col(id_col))
          .withColumn("cos", cos)
          .filter(F.col("cos") >= threshold)
          .select(id_col, "match_id", "cos",
                  F.lit("batch").alias("match_src")))
    out = vs_corpus.unionByName(wb)
    out._cached_banded = bass
    return out


def lsh_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
             n_bits: int = 16, bands: int = 4,
             id_col: str = "vec_id", vec_col: str = "embedding",
             qid_col: str = "qid", qvec_col: str = "qv",
             hash_mode: str = "xxhash64",
             dim: int | None = None) -> DataFrame:
    """Approximate top-k: sign-LSH banded candidate generation + exact
    cosine re-rank within candidates. Output schema = cosine_topk.
    ``hash_mode='md5'`` selects the DuckDB-replayable hyperplane
    family (see ``_sign_bits``) used by the driver oracle; pass the
    known embedding ``dim`` there so the hyperplane signs inline as
    plan-time literals instead of per-row md5 calls."""
    from pyspark.sql.window import Window
    rows = n_bits // bands
    band_keys = f"""
      transform(sequence(0, {bands - 1}), b ->
        struct(b AS band,
               array_join(slice(sig, b * {rows} + 1, {rows}), '')
                 AS key))"""
    c = (corpus.withColumn("sig", F.expr(_sign_bits(vec_col, n_bits,
                                                    hash_mode, dim)))
         .select(id_col, vec_col, F.explode(F.expr(band_keys)).alias("bk")))
    q = (queries.withColumn("sig", F.expr(_sign_bits(qvec_col, n_bits,
                                                     hash_mode, dim)))
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


# ---------------------------------------------------------------------------
# Product quantization (Jégou et al. 2011): compressed-domain ANN

PQ_GRID = 1024  # embeddings snap to the 2^-10 grid BEFORE any PQ
# arithmetic: floor(x * 1024) is unambiguous on identical doubles in
# every engine, and from there the whole operator — codebook seeds,
# Lloyd means (integer div), encode argmins, ADC distances — is pure
# BIGINT, so the DuckDB oracle replays EXACT distances (the repo's
# standard move for oracling float-looking operators). The grid is
# ~3 decimal digits — far below PQ's own quantization error, so
# recall is unaffected (gated in tests).


def _quant_expr(vec_col: str) -> str:
    return (f"transform({vec_col},"
            f" x -> cast(floor(cast(x AS DOUBLE) * {PQ_GRID}.0d)"
            f" AS BIGINT))")


def _arr_lit(vals) -> str:
    return "array(" + ", ".join(f"{int(v)}L" for v in vals) + ")"


def _cb_lit(cb_s) -> str:
    return "array(" + ", ".join(_arr_lit(c) for c in cb_s) + ")"


def pq_codebooks(corpus: DataFrame, m: int = 8, ksub: int = 16,
                 iters: int = 0, id_col: str = "vec_id",
                 vec_col: str = "embedding",
                 hash_mode: str = "xxhash64") -> list[list[list[int]]]:
    """Per-subspace PQ codebooks as a DRIVER-SIDE literal structure
    ``cb[s][j] = grid-quantized sub-centroid`` (m * ksub * d/m ints —
    KB-sized at any corpus scale; like the LSH hyperplanes, codebooks
    inline into plans as literals, so encode/ADC are narrow
    expressions with ZERO joins).

    Seeds = the ksub corpus rows with the smallest hash64(id) (the
    same deterministic, driver-randomness-free sample as
    ``ivf_centroids``; ``hash_mode='md5'`` makes it DuckDB-
    replayable), split into m sub-vectors. ``iters`` integer-exact
    Lloyd steps refine each subspace independently: assignment is the
    BIGINT argmin the encoder uses, the mean is ``sum div count``
    (exact integer division — no float, no grid re-snap needed), and
    empty clusters keep their previous centroid. Each step is ONE
    exchange of (id, s, code, subvec) narrow rows.
    """
    from ..datapipe.dedup import hash64
    dim_row = corpus.select(F.expr(f"size({vec_col})").alias("d")).first()
    d = dim_row["d"]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    seeds = (corpus
             .select(F.expr(_quant_expr(vec_col)).alias("_xq"),
                     F.expr(hash64(f"cast({id_col} AS STRING)",
                                   hash_mode)).alias("_h"),
                     F.col(id_col).alias("_id"))
             .orderBy("_h", "_id").limit(ksub).collect())
    cb = [[list(r["_xq"][s * dsub:(s + 1) * dsub]) for r in seeds]
          for s in range(m)]
    for _ in range(iters):
        # codes and sub-vectors in ONE projection (no corpus self-join
        # back onto pq_encode's output — the codebook is a literal, so
        # both derive narrowly from the same row)
        exploded = (corpus
                    .select(F.expr(_quant_expr(vec_col)).alias("_xq"),
                            F.posexplode(F.expr(
                                _pq_code_expr(cb, _quant_expr(vec_col))
                            )).alias("s", "code"))
                    .select("s", "code",
                            F.expr(f"slice(_xq, s * {dsub} + 1, {dsub})")
                            .alias("_sv")))
        rows = (exploded
                .groupBy("s", "code")
                .agg(F.count("*").alias("n"),
                     *[F.sum(F.expr(f"element_at(_sv, {i + 1})"))
                       .alias(f"_s{i}") for i in range(dsub)])
                .collect())
        for r in rows:
            cb[r["s"]][r["code"]] = [
                int(r[f"_s{i}"]) // int(r["n"]) for i in range(dsub)]
    return cb


def _pq_code_expr(cb, xq: str) -> str:
    """codes array: per subspace, the BIGINT-exact argmin over the
    literal codebook (strict < keeps the smallest index on ties)."""
    m, ksub = len(cb), len(cb[0])
    dsub = len(cb[0][0])
    big = 1 << 62
    outs = []
    for s in range(m):
        dist = (f"aggregate(zip_with(slice({xq}, {s * dsub + 1},"
                f" {dsub}), element_at({_cb_lit(cb[s])}, j + 1),"
                f" (a, b) -> (a - b) * (a - b)), 0L,"
                f" (acc, v) -> acc + v)")
        outs.append(
            f"aggregate(sequence(0, {ksub - 1}),"
            f" named_struct('j', -1, 'd', {big}L),"
            f" (acc, j) -> IF({dist} < acc.d,"
            f" named_struct('j', j, 'd', {dist}), acc),"
            f" acc -> acc.j)")
    return "array(" + ", ".join(outs) + ")"


def pq_encode(corpus: DataFrame, cb, id_col: str = "vec_id",
              vec_col: str = "embedding") -> DataFrame:
    """(id, codes array<int>): the m-byte compressed representation —
    ONE narrow projection (codebooks are plan-time literals; zero
    joins, zero shuffles). At 10^12 x 64-dim float32 this is the
    256 GB-instead-of-256 TB working set that makes corpus-scale ANN
    memory-resident."""
    return corpus.select(
        F.col(id_col),
        F.expr(_pq_code_expr(cb, _quant_expr(vec_col))).alias("codes"))


def pq_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
            m: int = 8, ksub: int = 16, iters: int = 0,
            id_col: str = "vec_id", vec_col: str = "embedding",
            qid_col: str = "qid", qvec_col: str = "qv",
            hash_mode: str = "xxhash64", refine: int = 0,
            cb=None) -> DataFrame:
    """PQ approximate top-k by L2 distance, scanned in the COMPRESSED
    domain (asymmetric distance computation): each candidate's
    distance is the sum over subspaces of ||q_sub - codebook[s][code]||^2
    — codes and literal codebooks only, the original vectors are
    never touched during the scan. Corpus side stays narrow
    (broadcast queries, WindowGroupLimit top-k); every distance is
    BIGINT on the PQ grid, so ranks AND distances are cross-engine
    exact.

    ``refine=N`` adds the FAISS IndexRefineFlat arm: the ADC scan
    keeps top-N CANDIDATES per query, and only those (queries x N
    rows — tiny next to the corpus) join back to the true vectors
    for an exact grid-L2 re-rank to top-k. This is the production
    shape: the compressed scan prices the corpus pass, the refine
    prices queries x N exact distances — recall is then bounded by
    candidate recall, not by PQ reconstruction error (gated in
    tests/test_datapipe.py).

    Output: (qid, rank, vec_id, dist) — dist = grid-quantized
    squared L2 (ADC, or exact when refined), ties by vec_id."""
    from pyspark.sql.window import Window
    if cb is None:
        cb = pq_codebooks(corpus, m, ksub, iters, id_col, vec_col,
                          hash_mode)
    m, dsub = len(cb), len(cb[0][0])
    enc = pq_encode(corpus, cb, id_col, vec_col)
    qq = (queries.select(F.col(qid_col),
                         F.expr(_quant_expr(qvec_col)).alias("_qq")))
    adc = " + ".join(
        f"aggregate(zip_with(slice(_qq, {s * dsub + 1}, {dsub}),"
        f" element_at({_cb_lit(cb[s])},"
        f" element_at(codes, {s + 1}) + 1),"
        f" (a, b) -> (a - b) * (a - b)), 0L, (acc, v) -> acc + v)"
        for s in range(m))
    w = Window.partitionBy(qid_col).orderBy("dist", id_col)
    scan = (enc.crossJoin(F.broadcast(qq))
            .filter(F.col(id_col) != F.col(qid_col))
            .withColumn("dist", F.expr(adc).cast("long"))
            .withColumn("rank", F.row_number().over(w).cast("long")))
    if not refine:
        return (scan.filter(F.col("rank") <= k)
                .select(qid_col, "rank", id_col, "dist"))
    cand = (scan.filter(F.col("rank") <= refine)
            .select(qid_col, "_qq", id_col))
    exact = (corpus
             .select(F.col(id_col),
                     F.expr(_quant_expr(vec_col)).alias("_xq"))
             .join(F.broadcast(cand), id_col)
             .withColumn("dist",
                         F.expr("aggregate(zip_with(_qq, _xq,"
                                " (a, b) -> (a - b) * (a - b)), 0L,"
                                " (acc, v) -> acc + v)").cast("long")))
    return (exact.withColumn("rank",
                             F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= k)
            .select(qid_col, "rank", id_col, "dist"))


def _l2_argmin_expr(cents_q, xq: str) -> str:
    """argmin over a literal centroid list by integer grid L2 — the
    whole-vector case of the per-subspace PQ argmin."""
    return _pq_code_expr([cents_q], xq)[len("array("):-1]


def _l2_dist_expr(cvec_lit: str, idx: str, xq: str) -> str:
    return (f"aggregate(zip_with({xq}, element_at({cvec_lit},"
            f" {idx} + 1), (a, b) -> (a - b) * (a - b)), 0L,"
            f" (acc, v) -> acc + v)")


def ivfpq_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
               n_centroids: int = 8, n_probe: int = 3, m: int = 8,
               ksub: int = 16, iters: int = 0,
               id_col: str = "vec_id", vec_col: str = "embedding",
               qid_col: str = "qid", qvec_col: str = "qv",
               hash_mode: str = "xxhash64", refine: int = 0,
               cb=None, coarse=None) -> DataFrame:
    """IVF-PQ approximate top-k (the FAISS IVFPQ composition, the
    production ANN shape at corpus scale): a coarse quantizer buckets
    the corpus, each query probes its ``n_probe`` nearest buckets,
    and candidates inside probed buckets rank by the COMPRESSED-
    domain PQ ADC distance — so a scan touches ~n_probe/n_centroids
    of the corpus AND reads only m-byte codes, never raw vectors.
    ``refine=N`` re-ranks the ADC top-N on true vectors (pq_topk's
    refine arm).

    Everything runs on the 2^-10 integer grid (coarse assignment and
    probe selection by integer L2 against PLAN-TIME LITERAL
    centroids, PQ exactly as ``pq_topk``), so every distance is
    BIGINT and the DuckDB oracle replays exact values. Documented
    simplification vs classic IVFPQ: codebooks are GLOBAL over raw
    vectors, not per-bucket residuals — residual encoding needs a
    float subtract per dim before quantization, and the global form
    keeps the operator integer-exact end to end; the refine arm
    recovers the recall the residual trick would buy (gated in
    tests).

    Plan shape: coarse assignment and PQ encode are ONE narrow
    projection (literals, zero joins); probes explode to (qid, cid)
    rows and broadcast into an equi hash join on cid; the final rank
    is WindowGroupLimit. No corpus shuffle anywhere.
    """
    from pyspark.sql.window import Window
    if coarse is None:
        coarse = ivf_centroids(corpus, n_centroids, iters, id_col,
                               vec_col, hash_mode)
    import math
    cents = sorted((r["cid"], list(r["cvec"]))
                   for r in coarse.collect())
    cents_q = [[int(math.floor(float(v) * PQ_GRID)) for v in vec]
               for _, vec in cents]
    if cb is None:
        cb = pq_codebooks(corpus, m, ksub, iters, id_col, vec_col,
                          hash_mode)
    m, dsub = len(cb), len(cb[0][0])
    cents_lit = _cb_lit(cents_q)
    enc = corpus.select(
        F.col(id_col),
        F.expr(_l2_argmin_expr(cents_q, _quant_expr(vec_col)))
        .alias("cid"),
        F.expr(_pq_code_expr(cb, _quant_expr(vec_col))).alias("codes"))
    # probe list per query: the n_probe nearest centroids by the SAME
    # integer metric (sort (dist, cid) structs, slice, project cid)
    probe_expr = (
        f"transform(slice(array_sort(transform("
        f"sequence(0, {len(cents_q) - 1}),"
        f" c -> named_struct('d', {_l2_dist_expr(cents_lit, 'c', '_qq')},"
        f" 'c', c))), 1, {n_probe}), p -> p.c)")
    qq = (queries.select(F.col(qid_col),
                         F.expr(_quant_expr(qvec_col)).alias("_qq"))
          .withColumn("cid", F.explode(F.expr(probe_expr))))
    adc = " + ".join(
        f"aggregate(zip_with(slice(_qq, {s * dsub + 1}, {dsub}),"
        f" element_at({_cb_lit(cb[s])},"
        f" element_at(codes, {s + 1}) + 1),"
        f" (a, b) -> (a - b) * (a - b)), 0L, (acc, v) -> acc + v)"
        for s in range(m))
    w = Window.partitionBy(qid_col).orderBy("dist", id_col)
    scan = (enc.join(F.broadcast(qq), "cid")
            .filter(F.col(id_col) != F.col(qid_col))
            .withColumn("dist", F.expr(adc).cast("long"))
            .withColumn("rank", F.row_number().over(w).cast("long")))
    if not refine:
        return (scan.filter(F.col("rank") <= k)
                .select(qid_col, "rank", id_col, "dist"))
    cand = (scan.filter(F.col("rank") <= refine)
            .select(qid_col, "_qq", id_col))
    exact = (corpus
             .select(F.col(id_col),
                     F.expr(_quant_expr(vec_col)).alias("_xq"))
             .join(F.broadcast(cand), id_col)
             .withColumn("dist",
                         F.expr("aggregate(zip_with(_qq, _xq,"
                                " (a, b) -> (a - b) * (a - b)), 0L,"
                                " (acc, v) -> acc + v)").cast("long")))
    return (exact.withColumn("rank",
                             F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= k)
            .select(qid_col, "rank", id_col, "dist"))
