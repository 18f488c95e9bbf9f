"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard — native Spark SQL except where a measured Arrow kernel wins
(SimHash bit-packing, md5-mode shingle hashing: higher-order-function
trees are interpreted, not codegen'd, and re-evaluate under Generate).

Scale notes (the design constraints at 10^12 docs):
- exact: one hash-groupBy shuffle on a 16-byte digest — the minimum
  possible; map-side partial aggregation applies.
- MinHash+LSH: signatures are per-row narrow expressions (transform/
  array_min over shingle hashes); the only shuffle is the band-bucket
  exchange, and candidate verification happens only within buckets
  (never the O(n^2) cross join).
- SimHash: 64 per-row bit sums; Hamming-banded pair generation
  (``simhash_pairs``) buckets fingerprints by exact band keys —
  pigeonhole makes recall TOTAL (not probabilistic) for pairs within
  Hamming <= bands-1, and verification (bit_count of xor) runs only
  within buckets.
- decontamination (``contamination_overlap``): the eval-set shingle
  table is the small side by definition — hashed, deduped, broadcast;
  corpus rows only shuffle AFTER the inner probe join has dropped
  every non-matching shingle.
- exact-substring spans (``duplicated_spans``, Lee et al. 2021): no
  suffix array — sliding-window 120-bit keys built in-row, ONE
  exchange on the key with a window count(*), island merge over
  surviving (rare) windows only; the token strings never shuffle.
- hash family is parameterized (``hash64``): xxhash64 (cheaper,
  seedable, JVM intrinsic) is the default; 'md5' mode derives the
  same-width value from md5 so DuckDB can recompute identical
  fingerprints — the driver-facing oracle queries use it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_NUM_HASHES = 64
DEFAULT_BANDS = 16  # 16 bands x 4 rows: ~0.5 Jaccard threshold knee


def hash64(inner: str, mode: str = "xxhash64", variant: int = 0) -> str:
    """SQL fragment hashing the expression ``inner`` to a 64-bit-class
    integer.

    - ``xxhash64`` (default): Spark's native seedable hash — one JVM
      intrinsic per value, the fast path; not replayable outside Spark.
    - ``md5``: cross-engine mode — the top 60 bits of md5 as a
      positive BIGINT (15 hex chars, so the value fits signed int64 in
      every engine). DuckDB computes the identical integer as
      ``('0x' || substr(md5(x), 1, 15))::BIGINT``, which is what makes
      the simhash / sign-LSH / IVF driver queries DuckDB-oracleable.
      ``inner`` must be a string-typed expression in this mode.

    ``variant=1`` yields a second hash independent of variant 0 over
    the same value, so callers needing a 120-bit-class key (e.g.
    ``duplicated_spans``, where 10^12-window corpora make single-64-bit
    birthday collisions real) can pair (h0, h1). xxhash64 mixes in an
    extra literal argument; md5 takes hex chars 17-31 of the same
    digest (DuckDB: ``('0x' || substr(md5(x), 17, 15))::BIGINT``).
    """
    if mode == "xxhash64":
        return (f"xxhash64({inner})" if variant == 0
                else f"xxhash64({inner}, {variant})")
    if mode == "md5":
        off = 1 if variant == 0 else 17
        return (f"cast(conv(substr(md5({inner}), {off}, 15), 16, 10)"
                " AS BIGINT)")
    raise ValueError(f"unknown hash mode: {mode!r}")


def release_cached(df: DataFrame) -> None:
    """Unpersist the banded frame cached by ``lsh_candidate_pairs`` /
    ``minhash_dedup_pairs`` once the returned DataFrame has been
    materialized. Long-lived sessions running repeated dedup sweeps
    must call this (or ``df._cached_banded.unpersist()``) — otherwise
    each invocation leaves cached partitions in executor storage until
    eviction. No-op for frames without a cache handle."""
    handle = getattr(df, "_cached_banded", None)
    if handle is not None:
        handle.unpersist()


def normalize_text(col: str = "text"):
    """Canonical text for hashing: lowercase, whitespace-collapsed."""
    return F.lower(F.regexp_replace(F.trim(F.col(col)), r"\s+", " "))


def exact_dedup(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Exact duplicate groups by md5 of normalized text: one row per
    distinct content with the kept (min) id and duplicate count."""
    return (docs
            .select(F.col(id_col), F.md5(normalize_text(text_col))
                    .alias("content_hash"))
            .groupBy("content_hash")
            .agg(F.min(id_col).alias("keep_id"),
                 F.count("*").cast("long").alias("n_dups")))


def with_shingles(docs: DataFrame, n: int = 3, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Distinct word n-gram shingles per doc, as an array column
    (narrow; no explode)."""
    toks = F.split(normalize_text(text_col), " ")
    docs = docs.select(F.col(id_col), toks.alias("tokens"))
    sh = F.expr(f"""
        array_distinct(transform(
          sequence(0, greatest(size(tokens) - {n}, 0)),
          i -> array_join(slice(tokens, i + 1, {n}), ' ')))""")
    return docs.withColumn("shingles", sh)


def with_minhash(shingled: DataFrame,
                 num_hashes: int = DEFAULT_NUM_HASHES) -> DataFrame:
    """MinHash signature via one-string-hash + cheap rehash: each
    shingle is xxhash64'd ONCE (the expensive variable-length string
    hash), then the num_hashes family re-mixes that fixed-width 64-bit
    value with murmur3 ``hash(h, i)``. Cuts per-row hashing cost
    ~num_hashes-fold vs hashing the string per function (measured 37s
    -> ~4s on the sf0.1 corpus); standard two-level minhash
    construction, same independence guarantees."""
    base = F.expr("transform(shingles, s -> xxhash64(s))")
    sig = F.expr(f"""
        transform(sequence(0, {num_hashes - 1}), i ->
          array_min(transform(shingle_hashes, h -> hash(h, i))))""")
    return (shingled.withColumn("shingle_hashes", base)
            .withColumn("minhash", sig).drop("shingle_hashes"))


def _band_keys(bands: int, rows_per_band: int,
               sig_col: str = "minhash") -> str:
    """SQL fragment: array of (band, band_hash) structs — the banded
    LSH bucket keys of a minhash signature column. Shared by the
    all-pairs self-join (``lsh_candidate_pairs``) and the incremental
    batch-vs-index probe (``incremental_dedup_pairs``) so both sides
    of an incremental run derive identical keys."""
    return f"""
          transform(sequence(0, {bands - 1}), b ->
            struct(b AS band,
                   xxhash64(array_join(transform(
                     slice({sig_col}, b * {rows_per_band} + 1,
                           {rows_per_band}), x -> string(x)), ','))
                   AS band_hash))"""


def lsh_candidate_pairs(sig_df: DataFrame, bands: int = DEFAULT_BANDS,
                        num_hashes: int = DEFAULT_NUM_HASHES,
                        id_col: str = "doc_id") -> DataFrame:
    """Banded LSH: docs agreeing on any band of the signature become a
    candidate pair. Explode to (band, band_hash) keys, self-join per
    bucket (id_a < id_b), distinct.

    The banded keys are PERSISTED before the self-join: both join
    sides derive from the same narrow (id, band_key) frame (~24 bytes
    x bands per doc — tiny next to the corpus), and without the
    persist Spark recomputes the whole shingle->signature pipeline
    once per side (measured: the signature stage is the dominant cost
    and was paid twice). At full scale this frame is what you would
    checkpoint to a table between the signature and join stages.

    Caller contract: the persisted frame is exposed as
    ``result._cached_banded`` — call ``release_cached(result)`` after
    materializing to free the cached partitions (per-query sessions
    can skip it; repeated sweeps in one session must not)."""
    rows_per_band = num_hashes // bands
    banded = sig_df.select(
        F.col(id_col),
        F.explode(F.expr(_band_keys(bands, rows_per_band)))
         .alias("bk")).persist()
    a = banded.select(F.col(id_col).alias("id_a"), "bk")
    b = banded.select(F.col(id_col).alias("id_b"), "bk")
    out = (a.join(b, ["bk"])
           .filter(F.col("id_a") < F.col("id_b"))
           .select("id_a", "id_b").distinct())
    out._cached_banded = banded
    return out


def minhash_dedup_pairs(docs: DataFrame, n: int = 3,
                        num_hashes: int = DEFAULT_NUM_HASHES,
                        bands: int = DEFAULT_BANDS,
                        threshold: float = 0.7,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Near-duplicate pairs: MinHash LSH candidates verified by exact
    shingle Jaccard >= threshold. Verification joins shingle arrays
    back only for candidate pairs (tiny vs corpus). ``jaccard`` is the
    full-precision exact ratio (int/int IEEE division — cross-engine
    bit-stable, so callers can derive deterministic fixed-point
    projections from it)."""
    shingled = with_shingles(docs, n, id_col, text_col)
    sig = with_minhash(shingled, num_hashes)
    cands = lsh_candidate_pairs(sig, bands, num_hashes, id_col)
    sh = shingled.select(F.col(id_col), "shingles")
    out = (cands
           .join(sh.withColumnsRenamed(
               {id_col: "id_a", "shingles": "sh_a"}), "id_a")
           .join(sh.withColumnsRenamed(
               {id_col: "id_b", "shingles": "sh_b"}), "id_b")
           .withColumn("jaccard", F.expr(
               "size(array_intersect(sh_a, sh_b)) /"
               " cast(size(array_union(sh_a, sh_b)) AS DOUBLE)"))
           .filter(F.col("jaccard") >= threshold)
           .select("id_a", "id_b", "jaccard"))
    # propagate the cache handle (see lsh_candidate_pairs docstring)
    out._cached_banded = cands._cached_banded
    return out


def build_minhash_index(docs: DataFrame, n: int = 3,
                        num_hashes: int = DEFAULT_NUM_HASHES,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Snapshot-able MinHash signature index — one row per doc:
    ``(id, shingle_hashes: array<long>, minhash: array<long>)``.

    This is the frame a continuous-ingestion dedup persists between
    runs: at scale it is written to a table ONCE per corpus snapshot
    (~8 bytes per shingle + 8 per signature slot, no text), and every
    incoming batch probes it via ``incremental_dedup_pairs`` without
    re-reading or re-shingling the corpus — the part of dedup cost
    that must not be O(corpus) per batch. Jaccard over the hashed
    shingle sets equals string-shingle Jaccard (64-bit hashes;
    collisions within the union of two docs' sets are ~2^-64-scale,
    and the pipeline is deterministic either way). Signatures are the
    exact ``with_minhash`` two-level construction, so an index built
    here bands identically to ``lsh_candidate_pairs``."""
    sh = with_shingles(docs, n, id_col, text_col)
    hashed = sh.withColumn(
        "shingle_hashes",
        F.expr("array_distinct(transform(shingles, s -> xxhash64(s)))"))
    sig = F.expr(f"""
        transform(sequence(0, {num_hashes - 1}), i ->
          array_min(transform(shingle_hashes, h -> hash(h, i))))""")
    return (hashed.withColumn("minhash", sig)
            .select(id_col, "shingle_hashes", "minhash"))


def incremental_dedup_pairs(batch: DataFrame, index: DataFrame,
                            n: int = 3,
                            num_hashes: int = DEFAULT_NUM_HASHES,
                            bands: int = DEFAULT_BANDS,
                            threshold: float = 0.7,
                            id_col: str = "doc_id",
                            text_col: str = "text") -> DataFrame:
    """Incremental near-dup detection: an incoming batch of docs vs a
    FROZEN corpus signature index (``build_minhash_index``) plus
    within the batch itself — the continuous-ingestion shape of a
    100 TB dedup, where re-running all-pairs LSH per batch would be
    O(corpus) every time.

    Output: one row per verified near-dup relation whose subject is a
    batch doc — ``(id, match_id, jaccard, match_src)`` with
    ``match_src`` 'corpus' or 'batch' (batch matches only against
    smaller batch ids, min-id-wins). A batch doc with no row is novel.

    Scale shape: the corpus index NEVER shuffles — the batch is the
    small side by definition, so both joins broadcast batch-derived
    frames. The index is scanned twice, each time pruned to one array
    column (parquet column pruning): once for ``minhash`` (band-key
    probe: explode to (band, band_hash), broadcast-join the batch's
    band keys — candidates only where a band agrees), once for
    ``shingle_hashes`` (exact-Jaccard verification, broadcast-joined
    to the batch-bounded candidate set). Candidate de-dup
    (``distinct``) runs on bare (id, match_id) pairs before shingle
    arrays are attached, so the only exchange in the plan moves
    batch-bounded data.

    The batch's signature frame (``build_minhash_index`` output — the
    expensive tokenize/shingle/hash stage) is PERSISTED: it feeds the
    corpus band probe, the Jaccard verification probe, and both sides
    of the within-batch self-join, and without the persist the
    signature pipeline re-runs once per consumer (measured ~2x on the
    sf0.1 bench). The banded explode derived from it is cheap and is
    deliberately NOT persisted. Caller contract as in
    ``lsh_candidate_pairs``: ``release_cached(result)`` after
    materializing. The ``index`` side is the caller's artifact — at
    scale a stored table; pass a persisted or parquet-backed frame,
    since it is consumed twice (band probe + verification)."""
    bsig = build_minhash_index(batch, n, num_hashes, id_col,
                               text_col).persist()
    bk = _band_keys(bands, num_hashes // bands)
    b_banded = bsig.select(
        F.col(id_col), "shingle_hashes",
        F.explode(F.expr(bk)).alias("bk"))
    jac = ("size(array_intersect(shingle_hashes, sh_m)) / "
           "cast(size(array_union(shingle_hashes, sh_m)) AS DOUBLE)")

    # batch vs corpus: band probe (index scan #1, minhash only)
    i_banded = index.select(F.col(id_col).alias("match_id"),
                            F.explode(F.expr(bk)).alias("bk"))
    cand = (i_banded
            .join(F.broadcast(b_banded.select(F.col(id_col), "bk")), "bk")
            .filter(F.col("match_id") != F.col(id_col))
            .select(id_col, "match_id").distinct())
    # verification (index scan #2, shingle_hashes only): candidates +
    # batch shingles stay the broadcast side
    probe = cand.join(
        F.broadcast(bsig.select(id_col, "shingle_hashes")), id_col)
    vs_corpus = (index.select(F.col(id_col).alias("match_id"),
                              F.col("shingle_hashes").alias("sh_m"))
                 .join(F.broadcast(probe), "match_id")
                 .withColumn("jaccard", F.expr(jac))
                 .filter(F.col("jaccard") >= threshold)
                 .select(id_col, "match_id", "jaccard",
                         F.lit("corpus").alias("match_src")))

    # within batch: banded self-join, smaller id is the match
    wb = (b_banded.select(F.col(id_col).alias("_ida"),
                          F.col("shingle_hashes").alias("sh_m"), "bk")
          .join(b_banded, "bk")
          .filter(F.col("_ida") < F.col(id_col))
          .select(id_col, "shingle_hashes",
                  F.col("_ida").alias("match_id"), "sh_m")
          .distinct()
          .withColumn("jaccard", F.expr(jac))
          .filter(F.col("jaccard") >= threshold)
          .select(id_col, "match_id", "jaccard",
                  F.lit("batch").alias("match_src")))

    out = vs_corpus.unionByName(wb)
    out._cached_banded = bsig
    return out


def _simhash_from_hashes_udf():
    """Arrow-vectorized bit-sign packing: token hashing stays JVM-side
    (xxhash64), only the 64 bit-sums run in numpy. The pure-SQL
    higher-order form of the same computation is interpreted (no
    codegen for lambda trees) and costs ~64 x n_tokens interpreter
    steps per row — measured ~5x slower than this kernel at sf0.1.
    Bit-exact with the SQL form (asserted in tests): (h >> b) & 1 on
    the uint64 view equals Spark's shiftright(h, b) % 2 != 0."""
    import numpy as np
    import pandas as pd

    @F.pandas_udf("long")
    def simhash_from_hashes(hashes):
        # (pd.Series of list<int64>) -> pd.Series of int64; typed via
        # the returnType string because the hint-resolver cannot see
        # function-local imports
        shifts = np.arange(64, dtype=np.uint64)
        out = np.empty(len(hashes), dtype=np.int64)
        for i, hs in enumerate(hashes):
            arr = np.asarray(hs, dtype=np.int64).astype(np.uint64)
            if arr.size == 0:
                out[i] = 0
                continue
            bits = (arr[:, None] >> shifts) & np.uint64(1)
            counts = bits.sum(axis=0)
            sim_bits = (2 * counts > arr.size).astype(np.uint64)
            out[i] = (sim_bits << shifts).sum().astype(np.int64)
        return pd.Series(out)

    return simhash_from_hashes


def with_simhash(shingled: DataFrame, use_arrow: bool = True,
                 hash_mode: str = "xxhash64") -> DataFrame:
    """64-bit SimHash over tokens: bit b of the fingerprint is the
    sign of sum over tokens of (+1 if bit b of hash64(token) else
    -1). Near-dups differ in few bits. Tokens are hashed ONCE into a
    64-bit array JVM-side; the bit-sign packing runs as an Arrow
    numpy kernel by default (``use_arrow=False`` selects the pure-SQL
    higher-order form — same values bit-for-bit, no Python worker,
    ~5x slower because lambda trees are interpreted).

    ``hash_mode='md5'`` selects the cross-engine hash family (see
    ``hash64``): token hashes carry 60 bits (bits 60-63 of the
    fingerprint are then always 0 — each per-token term is -1, the sum
    negative), and DuckDB can recompute the identical fingerprint —
    the driver oracle for ``dedup_simhash`` does exactly that."""
    df = shingled.withColumn(
        "token_hashes",
        F.expr(f"transform(tokens, t -> {hash64('t', hash_mode)})"))
    if use_arrow:
        sim = _simhash_from_hashes_udf()(F.col("token_hashes"))
    else:
        sim = F.expr("""
          aggregate(sequence(0, 63),
            cast(0 AS BIGINT),
            (acc, b) -> acc + shiftleft(
              if(aggregate(token_hashes, 0L, (s, h) ->
                   s + if(shiftright(h, b) % 2 != 0, 1, -1)) > 0,
                 1L, 0L), b))""")
    return df.withColumn("simhash", sim).drop("token_hashes")


def simhash_pairs(fingerprinted: DataFrame, bands: int = 4,
                  max_hamming: int = 3, id_col: str = "doc_id",
                  fp_col: str = "simhash") -> DataFrame:
    """Hamming-banded SimHash near-dup pair generation — the scale
    path of simhash dedup (mirrors ``lsh_candidate_pairs``): the
    64-bit fingerprint splits into ``bands`` contiguous bit-bands;
    docs agreeing EXACTLY on any band become candidates (one band-key
    exchange, never the O(n^2) cross join); candidates are verified by
    ``bit_count(a ^ b) <= max_hamming`` within buckets only.

    Recall is TOTAL, not probabilistic: a pair within Hamming
    ``max_hamming <= bands - 1`` differs in at most bands-1 bits, so
    by pigeonhole at least one band is identical — every true pair is
    a candidate (asserted against brute force in tests). Output:
    (id_a, id_b, hamming), id_a < id_b.

    Like ``lsh_candidate_pairs``, the banded (id, fp, band_key) frame
    is PERSISTED before the self-join (without it the whole
    tokenize->hash->fingerprint pipeline is recomputed once per join
    side — measured ~2x on the sf0.1 bench); same caller contract:
    ``release_cached(result)`` after materializing.
    """
    if max_hamming > bands - 1:
        raise ValueError(
            f"max_hamming={max_hamming} needs bands >= {max_hamming + 1} "
            "for total recall (pigeonhole)")
    width = 64 // bands
    mask = (1 << width) - 1
    banded = fingerprinted.select(
        F.col(id_col), F.col(fp_col),
        F.explode(F.expr(f"""
          transform(sequence(0, {bands - 1}), b ->
            struct(b AS band,
                   shiftright({fp_col}, b * {width}) & {mask} AS key))"""
                         )).alias("bk")).persist()
    a = banded.select(F.col(id_col).alias("id_a"),
                      F.col(fp_col).alias("fp_a"), "bk")
    b = banded.select(F.col(id_col).alias("id_b"),
                      F.col(fp_col).alias("fp_b"), "bk")
    out = (a.join(b, ["bk"])
           .filter(F.col("id_a") < F.col("id_b"))
           .select("id_a", "id_b", "fp_a", "fp_b").distinct()
           .withColumn("hamming",
                       F.expr("cast(bit_count(fp_a ^ fp_b) AS BIGINT)"))
           .filter(F.col("hamming") <= max_hamming)
           .select("id_a", "id_b", "hamming"))
    out._cached_banded = banded
    return out


def neardup_clusters(ids: DataFrame, pairs: DataFrame,
                     id_col: str = "doc_id",
                     max_iters: int = 25) -> DataFrame:
    """Connected components over the near-dup pair graph — the
    keep-one-per-cluster step of a dedup pipeline (pairs from
    ``minhash_dedup_pairs`` / ``simhash_pairs`` are edges; every doc
    gets the MIN doc id of its component as ``cluster_id``, so
    ``cluster_id == id`` marks the kept representative).

    Iterative min-label propagation: label(v) starts as v; each round
    takes the min of a node's own label and its neighbors' labels;
    converges in O(diameter) rounds (a chain of templated near-dups
    is the worst case — diameter is NOT bounded by log n on chain
    graphs). Each round is ONE shuffle (edge-label join + groupBy
    min) plus a driver-side convergence count — the standard
    distributed connected-components shape; labels persist per round
    and the previous round unpersists, so memory is one label set.
    Raises if the loop exits after ``max_iters`` rounds without
    converging (changed != 0) — a silent early exit would return
    labels that are not the component min, diverging from the
    recursive-CTE oracle contract. Deterministic; DuckDB replays it
    as a recursive CTE (min reachable id), which is how the driver
    oracle checks it.

    Output: (id, cluster_id), one row per input id.
    """
    edges = pairs.select(F.col("id_a").alias("src"),
                         F.col("id_b").alias("dst"))
    sym = edges.union(edges.select(F.col("dst").alias("src"),
                                   F.col("src").alias("dst"))).persist()
    labels = ids.select(F.col(id_col).alias("v"),
                        F.col(id_col).alias("label")).persist()
    cached = labels  # the persisted handle of the current label set
    for _ in range(max_iters):
        neigh = (sym.join(labels, sym.dst == labels.v)
                 .groupBy("src").agg(F.min("label").alias("nmin")))
        nxt = (labels
               .withColumnRenamed("label", "_prev")
               .join(neigh, F.col("v") == F.col("src"), "left")
               .select("v",
                       F.least(F.col("_prev"),
                               F.coalesce(F.col("nmin"), F.col("_prev")))
                        .alias("label"),
                       "_prev")
               .persist())
        changed = nxt.filter(F.col("label") != F.col("_prev")).count()
        cached.unpersist()
        cached = nxt
        labels = nxt.select("v", "label")
        if changed == 0:
            break
    else:
        sym.unpersist()
        cached.unpersist()
        raise RuntimeError(
            f"neardup_clusters did not converge in {max_iters} rounds "
            f"({changed} labels still changing) — the pair graph has a "
            f"component with diameter > {max_iters}; raise max_iters")
    sym.unpersist()
    out = labels.select(F.col("v").alias(id_col),
                        F.col("label").alias("cluster_id"))
    # the final label frame stays persisted for the caller's action;
    # release via release_cached(result) like the banded frames
    out._cached_banded = cached
    return out


def embedding_neardup_pairs(emb: DataFrame, threshold: float = 0.47,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding",
                            use_lsh: bool = False,
                            n_bits: int = 16, bands: int = 4) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a < id_b) with
    cosine >= threshold.

    Brute force (use_lsh=False) is the exact baseline — a self
    cross-join, O(n^2): fine for verification corpora, never for the
    full table. The scale path (use_lsh=True) buckets rows by
    sign-LSH bands (deterministic hash-derived hyperplanes, see
    similarity._sign_bits) and only scores pairs sharing a band —
    the same band-join shape as MinHash LSH, so the only shuffle is
    the band-key exchange."""
    from .similarity import _COS, _sign_bits
    a = emb.select(F.col(id_col).alias("id_a"),
                   F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("id_b"),
                   F.col(vec_col).alias("vb"))
    if use_lsh:
        rows = n_bits // bands
        band_keys = f"""
          transform(sequence(0, {bands - 1}), b ->
            struct(b AS band,
                   array_join(slice(sig, b * {rows} + 1, {rows}), '')
                     AS key))"""
        def banded(df, idc, vc):
            return (df.withColumn("sig", F.expr(_sign_bits(vc, n_bits)))
                    .select(idc, vc,
                            F.explode(F.expr(band_keys)).alias("bk")))
        pairs = (banded(a, "id_a", "va")
                 .join(banded(b, "id_b", "vb"), ["bk"])
                 .filter(F.col("id_a") < F.col("id_b"))
                 .select("id_a", "va", "id_b", "vb").distinct())
    else:
        pairs = (a.crossJoin(b)
                 .filter(F.col("id_a") < F.col("id_b")))
    return (pairs
            .withColumn("cos", F.expr(_COS.format(a="va", b="vb")))
            .filter(F.col("cos") >= threshold)
            .select("id_a", "id_b", F.round("cos", 3).alias("cos")))


def ngram_jaccard_pairs(docs: DataFrame, other_ids, n: int = 3,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Exact n-gram Jaccard of selected probe docs vs the corpus
    (brute-force verification path; for all-pairs use the LSH route)."""
    sh = with_shingles(docs, n, id_col, text_col)
    probes = (sh.filter(F.col(id_col).isin(list(other_ids)))
              .select(F.col(id_col).alias("probe_id"),
                      F.col("shingles").alias("probe_sh")))
    return (sh.crossJoin(F.broadcast(probes))
            .filter(F.col(id_col) != F.col("probe_id"))
            .withColumn("jaccard", F.expr(
                "size(array_intersect(shingles, probe_sh)) /"
                " cast(size(array_union(shingles, probe_sh)) AS DOUBLE)"))
            .select("probe_id", F.col(id_col), "jaccard"))


def _md5_shingle_hashes_udf(n: int):
    """Arrow-batched (tokenize -> distinct n-gram shingles -> md5
    60-bit) kernel — the md5-mode fast path for shingle hashing.

    Why Python here: the SQL form (``with_shingles`` + per-shingle
    ``hash64``) is a higher-order-function tree that Spark interprets
    (no codegen for lambda bodies), and under a Generate the
    generator tree is re-evaluated — measured 3.7 s vs 0.9 s for this
    kernel on the sf0.1 corpus (same pattern as the SimHash kernel at
    ``_simhash_from_hashes_udf``). Parity with the SQL form is exact
    and test-asserted: trim is space-only (Spark ``trim``), the
    whitespace class is Java's ASCII ``\\s``, and the 60-bit value is
    ``int(md5(sh).hexdigest()[:15], 16)`` ==
    ``conv(substr(md5(sh), 1, 15), 16, 10)``. ASCII corpora only for
    ``lower()`` parity (Java/Python differ on e.g. dotted-I)."""
    import hashlib
    import re as _re

    import pandas as pd

    ws = _re.compile(r"[ \t\n\x0b\f\r]+")

    @F.pandas_udf("array<long>")
    def kernel(texts):  # typed by returnType string (hint
        # resolver cannot see function-local imports)
        out = []
        for s in texts:
            s = ws.sub(" ", (s or "").strip(" ")).lower()
            toks = s.split(" ")
            m = max(len(toks) - n, 0) + 1
            seen = set()
            hs = []
            for i in range(m):
                sh = " ".join(toks[i:i + n])
                if sh not in seen:
                    seen.add(sh)
                    hs.append(int(
                        hashlib.md5(sh.encode()).hexdigest()[:15], 16))
            out.append(hs)
        return pd.Series(out)

    return kernel


def hashed_shingles(docs: DataFrame, n: int = 3, id_col: str = "doc_id",
                    text_col: str = "text",
                    hash_mode: str = "xxhash64",
                    use_arrow: bool | None = None) -> DataFrame:
    """(id, h) rows: one per distinct word n-gram shingle, hashed to
    64-bit-class. md5 mode defaults to the Arrow kernel (see
    ``_md5_shingle_hashes_udf``); xxhash64 mode has no Python
    equivalent and always runs the SQL form."""
    if use_arrow is None:
        use_arrow = hash_mode == "md5"
    if use_arrow and hash_mode == "md5":
        k = _md5_shingle_hashes_udf(n)
        return (docs.select(F.col(id_col), k(text_col).alias("hs"))
                .select(id_col, F.explode("hs").alias("h")))
    return (with_shingles(docs, n, id_col, text_col)
            .select(id_col, F.explode("shingles").alias("sh"))
            .select(id_col, F.expr(hash64("sh", hash_mode)).alias("h")))


def contamination_overlap(corpus: DataFrame, eval_docs: DataFrame,
                          n: int = 3, min_overlap: int = 1,
                          id_col: str = "doc_id",
                          text_col: str = "text",
                          hash_mode: str = "xxhash64",
                          broadcast_counts: bool = True) -> DataFrame:
    """Eval-set decontamination: for every corpus doc, count its
    distinct word n-gram shingles that appear ANYWHERE in the eval
    set, and flag docs at/above ``min_overlap`` as contaminated.

    Output: one row per corpus doc — (id_col, n_overlap, contaminated).

    Scale shape (corpus = 10^12 docs, eval set = benchmarks, i.e.
    thousands of docs): shingles are hashed to 64-bit (``hash64``) so
    the join key is fixed-width, the distinct eval-shingle set is tiny
    and BROADCAST, corpus shingles explode and probe it with a
    broadcast join (no shuffle of corpus data), and the only exchange
    is the groupBy(id) that re-collapses matched shingles — bounded by
    the number of *matching* shingles, not corpus size, because the
    inner join drops non-matches first. The final attach of counts to
    the full corpus id set defaults to a broadcast join — right
    whenever the contaminated fraction is benchmark-overlap-sized; a
    corpus whose matched-doc set is itself huge should pass
    ``broadcast_counts=False`` and pay a shuffle join instead of
    broadcasting it.

    md5 ``hash_mode`` makes the counts DuckDB-replayable (the oracle
    computes identical shingle hashes); collisions across engines are
    then identical by construction rather than merely improbable.
    """
    c_sh = hashed_shingles(corpus, n, id_col, text_col, hash_mode)
    e_sh = (hashed_shingles(eval_docs, n, id_col, text_col, hash_mode)
            .select("h").distinct())
    counts = (c_sh.join(F.broadcast(e_sh), "h")
              .groupBy(id_col)
              .agg(F.count_distinct("h").alias("n_overlap")))
    if broadcast_counts:
        counts = F.broadcast(counts)
    return (corpus.select(id_col)
            .join(counts, id_col, "left")
            .select(id_col,
                    F.coalesce("n_overlap", F.lit(0)).cast("long")
                     .alias("n_overlap"))
            .withColumn("contaminated",
                        F.col("n_overlap") >= min_overlap))


def _window_key_rows(toks: DataFrame, w: int, hash_mode: str,
                     id_col: str) -> DataFrame:
    """(id, pos, hk{h0,h1}) rows — one per ``w``-token sliding window
    of a tokenized frame. The shared staging of ``duplicated_spans``
    and ``remove_duplicated_spans``.

    The expensive per-window work is staged ONCE: lambdas defeat
    Catalyst CSE, so a single transform computing both hash variants
    from the shingle string would build the string (and in md5 mode
    the digest) twice per window — measured ~1.4x on the sf0.1
    corpus. Instead transform #1 emits one string/digest per window
    and transform #2 derives the (h0, h1) pair from that bound value
    (cheap intrinsics / substr)."""
    if hash_mode == "md5":
        stage = f"md5(array_join(slice(tokens, i + 1, {w}), ' '))"
        pair = ("struct(cast(conv(substr(m, 1, 15), 16, 10) AS BIGINT)"
                " AS h0, cast(conv(substr(m, 17, 15), 16, 10) AS"
                " BIGINT) AS h1)")
    else:
        stage = f"array_join(slice(tokens, i + 1, {w}), ' ')"
        pair = (f"struct({hash64('m', hash_mode, 0)} AS h0,"
                f" {hash64('m', hash_mode, 1)} AS h1)")
    return toks.select(
        F.col(id_col),
        F.posexplode(F.expr(f"""
            CASE WHEN size(tokens) >= {w} THEN
              transform(
                transform(sequence(0, size(tokens) - {w}),
                          i -> {stage}),
                m -> {pair})
            ELSE array() END""")).alias("pos", "hk"))


def duplicated_spans(docs: DataFrame, window: int = 20,
                     min_count: int = 2, max_count: int | None = None,
                     hash_mode: str = "xxhash64",
                     id_col: str = "doc_id", text_col: str = "text",
                     include_text: bool = True) -> DataFrame:
    """Exact-substring span dedup (the token-level complement of the
    whole-doc operators above, after Lee et al. 2021, "Deduplicating
    Training Data Makes Language Models Better"): find every maximal
    run of tokens that appears verbatim >= ``min_count`` times across
    the corpus at ``window``-token granularity, per document, with
    token and character offsets into the normalized text.

    Semantics: a ``window``-token sliding window is duplicated when
    its exact token sequence occurs >= min_count times corpus-wide
    (including repeats within one doc — same convention as the suffix
    -array original, where any repeated 50-token span counts no matter
    where the other copy lives). Per doc, duplicated windows whose
    coverage is contiguous (start gap <= window) merge into one
    maximal span, so output spans are disjoint. ``max_count`` drops
    degenerate ultra-frequent windows (boilerplate that would mark
    entire corpora as duplicated) *after* counting.

    Spark-first plan — no suffix array, three bounded shuffles:
      1. narrow per-row shingling: ``transform(sequence(...))`` builds
         the (h0, h1) 120-bit window keys inside codegen'd SQL, then
         ``posexplode`` emits (id, pos, h0, h1) — 20 bytes/window, the
         shingle STRING never leaves the row it was built in;
      2. one exchange on (h0, h1) with a window ``count(*)`` — a
         single pass replacing the groupBy+self-join form, which
         would shuffle the window frame twice. Hot keys land on one
         partition; at 10^12 windows a pre-sampled stop-shingle
         blacklist (or ``max_count``) is the standard mitigation;
      3. survivors (rare by definition) exchange on id for the
         gaps-and-islands merge, then one join back to ``docs``
         (inner — only docs WITH spans pay it) recovers char offsets
         and span text from token coordinates, so offsets cost
         O(doc_len) per *matched* doc instead of a cumulative-sum
         column carried by every window corpus-wide.

    The 120-bit key (``hash64`` variant pair) stands in for string
    verification: at 10^12 windows the 64-bit birthday bound is
    saturated but 2^120 is not, which is the same exactness-by-hash
    contract ``build_minhash_index`` documents. md5 ``hash_mode``
    makes every key DuckDB-replayable for the oracle.

    Output: (id, tok_start, tok_end, char_start, char_end, n_windows
    [, span_text]) — token bounds inclusive, char bounds
    [start, end) into the normalized (lowercased, whitespace-
    collapsed) text; ``include_text=False`` skips the join back and
    returns token coordinates only.
    """
    w = int(window)
    toks = docs.select(
        F.col(id_col), F.split(normalize_text(text_col), " ")
        .alias("tokens"))
    wins = _window_key_rows(toks, w, hash_mode, id_col)
    from pyspark.sql import Window as W
    occ = wins.withColumn(
        "n_occ", F.count("*").over(W.partitionBy("hk.h0", "hk.h1")))
    dup = occ.filter(F.col("n_occ") >= min_count)
    if max_count is not None:
        dup = dup.filter(F.col("n_occ") <= max_count)
    by_doc = W.partitionBy(id_col).orderBy("pos")
    isl = (dup
           .withColumn("brk", F.when(
               F.col("pos") - F.lag("pos").over(by_doc) > w, 1)
               .otherwise(0))
           .withColumn("island", F.sum("brk").over(
               by_doc.rowsBetween(W.unboundedPreceding, 0))))
    spans = (isl.groupBy(id_col, "island")
             .agg(F.min("pos").cast("long").alias("tok_start"),
                  (F.max("pos") + w - 1).cast("long").alias("tok_end"),
                  F.count("*").cast("long").alias("n_windows"))
             .drop("island"))
    if not include_text:
        return spans
    joined = spans.join(toks, id_col)
    span_text = F.expr(
        "array_join(slice(tokens, cast(tok_start AS INT) + 1,"
        " cast(tok_end - tok_start AS INT) + 1), ' ')")
    char_start = F.when(F.col("tok_start") == 0, F.lit(0).cast("long")) \
        .otherwise(F.expr(
            "length(array_join(slice(tokens, 1,"
            " cast(tok_start AS INT)), ' ')) + 1").cast("long"))
    return (joined
            .withColumn("span_text", span_text)
            .withColumn("char_start", char_start)
            .withColumn("char_end",
                        (F.col("char_start")
                         + F.length("span_text")).cast("long"))
            .select(id_col, "tok_start", "tok_end", "char_start",
                    "char_end", "n_windows", "span_text"))


def duplication_stats(docs: DataFrame, window: int = 20,
                      min_count: int = 2,
                      max_count: int | None = None,
                      hash_mode: str = "xxhash64",
                      id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Per-document duplicated-token coverage from
    ``duplicated_spans`` — the curation signal ("drop or trim docs
    that are mostly duplicated text") a training pipeline thresholds
    on. Spans are disjoint by construction, so covered tokens =
    sum of span lengths; the fraction is exact integer milli
    (``div`` — no float), and every doc appears (0 for span-free
    docs, including docs shorter than one window).
    """
    spans = duplicated_spans(docs, window, min_count, max_count,
                             hash_mode, id_col, text_col,
                             include_text=False)
    cov = (spans.groupBy(id_col)
           .agg(F.sum(F.col("tok_end") - F.col("tok_start") + 1)
                .alias("dup_tokens"),
                F.count("*").cast("long").alias("n_spans")))
    base = docs.select(
        F.col(id_col),
        F.size(F.split(normalize_text(text_col), " "))
        .cast("long").alias("n_tokens"))
    return (base.join(cov, id_col, "left")
            .select(id_col, "n_tokens",
                    F.coalesce("dup_tokens", F.lit(0)).cast("long")
                     .alias("dup_tokens"),
                    F.coalesce("n_spans", F.lit(0)).cast("long")
                     .alias("n_spans"))
            .withColumn("dup_frac_milli", F.expr(
                "(1000 * dup_tokens) div n_tokens")))


def remove_duplicated_spans(docs: DataFrame, window: int = 20,
                            min_count: int = 2,
                            hash_mode: str = "xxhash64",
                            id_col: str = "doc_id",
                            text_col: str = "text") -> DataFrame:
    """The REMOVE step of exact-substring dedup (Lee et al. 2021):
    rewrite the corpus keeping, for every duplicated ``window``-token
    sequence, only its globally-FIRST occurrence (min (id, pos)
    lexicographic — deterministic), excising every other occurrence
    from the text. ``duplicated_spans`` only annotates; this operator
    produces the cleaned corpus a training pipeline actually trains
    on.

    Semantics: a window occurrence is removable when its exact token
    sequence occurs >= ``min_count`` times corpus-wide AND it is not
    the first occurrence. Per doc, removable windows merge into
    maximal islands (start gap <= window, the ``duplicated_spans``
    convention), and the islands' token ranges are cut out; the
    surviving tokens re-join with single spaces. Docs with nothing to
    remove pass through with their normalized text.

    Spark-first plan — same three bounded shuffles as
    ``duplicated_spans`` plus one join back:
      1. narrow per-row window keys (``_window_key_rows`` — 20-byte
         (id, pos, h0, h1) rows; token strings never shuffle);
      2. ONE exchange on (h0, h1) carrying BOTH an unordered
         count(*) and a row_number ordered by (id, pos) — occurrence
         count and global-first rank in a single partitioning (two
         WindowExecs, one Exchange; (id, pos) is unique so the rank
         is total);
      3. removable survivors exchange on id for the island merge;
      4. one inner join back to the tokenized docs for excision —
         only docs WITH removals pay the rebuild
         (``filter(tokens, (t, i) -> ...)`` over the collected island
         list, O(n_tokens x n_islands) per matched doc), then a left
         join attaches clean text to the full corpus (pass-through
         docs take the normalized text directly).

    Output: (id, clean_text, n_tokens, n_removed_tokens,
    n_spans_removed) — one row per input doc; ``n_tokens`` counts the
    normalized ORIGINAL tokens. md5 ``hash_mode`` makes the whole
    decision DuckDB-replayable (the driver oracle replays count,
    first-rank, islands and excision in pure SQL)."""
    from pyspark.sql import Window as W
    w = int(window)
    toks = docs.select(
        F.col(id_col), F.split(normalize_text(text_col), " ")
        .alias("tokens"))
    # hoist the struct fields to top-level columns: windowing on
    # hk.h0/hk.h1 directly makes Spark project fresh _w0/_w1 key
    # attributes PER window spec, so the two window ops over the same
    # key would each get their own Exchange; on named columns the
    # second window reuses the first's partitioning (one Exchange,
    # plan-gated in tests/test_plans.py)
    wins = _window_key_rows(toks, w, hash_mode, id_col).select(
        F.col(id_col), F.col("pos"),
        F.col("hk.h0").alias("h0"), F.col("hk.h1").alias("h1"))
    by_key = W.partitionBy("h0", "h1")
    ranked = (wins
              .withColumn("rn", F.row_number().over(
                  by_key.orderBy(id_col, "pos")))
              .withColumn("n_occ", F.count("*").over(by_key)))
    removable = ranked.filter(
        (F.col("n_occ") >= min_count) & (F.col("rn") > 1))
    by_doc = W.partitionBy(id_col).orderBy("pos")
    isl = (removable
           .withColumn("brk", F.when(
               F.col("pos") - F.lag("pos").over(by_doc) > w, 1)
               .otherwise(0))
           .withColumn("island", F.sum("brk").over(
               by_doc.rowsBetween(W.unboundedPreceding, 0))))
    spans = (isl.groupBy(id_col, "island")
             .agg(F.min("pos").alias("s"),
                  (F.max("pos") + w - 1).alias("e")))
    rm = (spans.groupBy(id_col)
          .agg(F.collect_list(F.struct("s", "e")).alias("rm"),
               F.sum(F.col("e") - F.col("s") + 1).cast("long")
                .alias("n_removed_tokens"),
               F.count("*").cast("long").alias("n_spans_removed")))
    rebuilt = (toks.join(rm, id_col)
               .withColumn("clean_text", F.expr("""
                   array_join(filter(tokens, (t, i) ->
                     NOT exists(rm, r -> i >= r.s AND i <= r.e)), ' ')"""))
               .select(id_col, "clean_text", "n_removed_tokens",
                       "n_spans_removed"))
    return (toks
            .select(F.col(id_col),
                    F.col("tokens"),
                    F.array_join("tokens", " ").alias("_norm"))
            .join(rebuilt, id_col, "left")
            .select(id_col,
                    F.coalesce("clean_text", F.col("_norm"))
                     .alias("clean_text"),
                    F.size("tokens").cast("long").alias("n_tokens"),
                    F.coalesce("n_removed_tokens", F.lit(0))
                     .cast("long").alias("n_removed_tokens"),
                    F.coalesce("n_spans_removed", F.lit(0))
                     .cast("long").alias("n_spans_removed")))


def _star_round(edges: DataFrame) -> DataFrame:
    """One large-star + small-star contraction round over a canonical
    (a > b) edge frame; returns the next canonical edge frame (not
    yet checkpointed). Split out of ``star_clusters`` so the plan
    gate (tests/test_plans.py) can assert the round's physical shape:
    key-equi joins and partial-aggregated groupBys only — no
    cartesian product, no broadcast-nested-loop, nothing that touches
    the doc set or all-pairs."""
    # large-star: every node points its STRICTLY LARGER neighbors at
    # min(N(u) + {u}); high-degree hubs shrink here in one round
    sym = edges.unionByName(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
    mins = (sym.groupBy("a")
            .agg(F.least(F.min("b"), F.first("a")).alias("m")))
    large = (sym.join(mins, "a")
             .filter(F.col("b") > F.col("a"))
             .select(F.col("b").alias("a"), F.col("m").alias("b"))
             .distinct())
    # small-star (edges from large-star are (v, m) with m < v,
    # already large->small oriented)
    smins = large.groupBy("a").agg(F.min("b").alias("m"))
    return (large.join(smins, "a")
            .select(F.col("b").alias("v"), F.col("m"))
            .unionByName(smins.select(F.col("a").alias("v"), "m"))
            .filter(F.col("v") != F.col("m"))
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
            .distinct())


def star_clusters(ids: DataFrame, pairs: DataFrame,
                  id_col: str = "doc_id",
                  max_rounds: int = 40) -> DataFrame:
    """Connected components via alternating large-star / small-star
    (Kiveris et al. 2014, "Connected Components in MapReduce and
    Beyond") — the scale companion to ``neardup_clusters``: label
    propagation needs O(diameter) rounds (a chain of templated
    near-dups makes diameter O(n)), while star contraction converges
    in O(log^2 n) rounds on ANY graph shape, so a 10^9-doc chain
    costs ~dozens of rounds instead of 10^9.

    Per round over the edge set E (never the doc set, never
    all-pairs):

    - **large-star**: every node points its STRICTLY LARGER neighbors
      at min(N(u) + {u}) — one groupBy(u) min (map-side partial) and
      one co-partitioned join back on u. High-degree hubs (the skew
      case: a boilerplate doc near-duping millions) shrink here —
      their larger neighbors all re-point at the min in one round.
    - **small-star**: orient edges large->small, point every
      smaller-or-equal neighbor AND u itself at the min — same
      shuffle shape.

    Convergence = the canonical edge set is a fixpoint, detected by
    (count, two independent xxhash64 sums); each round
    ``localCheckpoint``s to truncate the growing plan lineage (the
    run_curate lesson: iterative self-referential plans OOM the
    driver's explain string long before the data hurts). At the
    fixpoint every component is a star rooted at its min id, so the
    labels read off the final edges directly; isolated docs label
    themselves. Output: (id, cluster_id) — identical contract to
    ``neardup_clusters`` (asserted equal in tests/test_starcc.py).
    """
    edges = (pairs
             .select(F.col("id_a").cast("long").alias("a"),
                     F.col("id_b").cast("long").alias("b"))
             .filter(F.col("a") != F.col("b"))
             .select(F.greatest("a", "b").alias("a"),
                     F.least("a", "b").alias("b"))
             .distinct()
             .localCheckpoint())

    def _sig(e: DataFrame) -> tuple:
        # order-independent fingerprint of the edge set: count + two
        # independent 64-bit XOR folds (XOR never overflows ANSI
        # BIGINT; edges are distinct so no pair can self-cancel)
        row = e.agg(F.count("*"),
                    F.expr("bit_xor(xxhash64(a, b))"),
                    F.expr("bit_xor(xxhash64(b, a))")).collect()[0]
        return tuple(row)

    sig = _sig(edges)
    for _ in range(max_rounds):
        # lazy checkpoint: the _sig aggregate below is the single
        # action that materializes the round (eager would cost a
        # second full job per round)
        small = _star_round(edges).localCheckpoint(eager=False)
        nsig = _sig(small)
        edges = small
        if nsig == sig:
            break
        sig = nsig
    else:
        raise RuntimeError(
            f"star_clusters did not reach a fixpoint in {max_rounds} "
            f"rounds — raise max_rounds (components converge in "
            f"O(log^2 n); this should not happen below ~2^{max_rounds // 2}"
            f" nodes)")

    labels = edges.groupBy("a").agg(F.min("b").alias("_cl"))
    return (ids
            .select(F.col(id_col).cast("long").alias(id_col))
            .join(labels, F.col(id_col) == F.col("a"), "left")
            .select(id_col,
                    F.coalesce(F.col("_cl"), F.col(id_col))
                    .cast("long").alias("cluster_id")))


def cluster_representatives(corpus: DataFrame, clusters: DataFrame,
                            id_col: str = "doc_id",
                            text_col: str = "text") -> DataFrame:
    """Representative selection — the "keep ONE doc per near-dup
    cluster" step that turns ``neardup_clusters`` output into a
    deduplicated corpus: within each cluster keep the longest text
    (quality proxy), tie-broken by min id so the choice is total and
    deterministic. Singleton clusters keep their only member.

    Scale shape: one broadcast-free equi-join of the corpus to its
    cluster labels on the id (both sides keyed by id), then ONE
    cluster-keyed aggregate — max_by over an orderable (len, -id)
    struct picks the representative inside the same partial/final
    aggregate that counts members, so each task forwards one
    candidate row per cluster map-side (no Window node at all; a
    row_number formulation can't take the WindowGroupLimit shortcut
    here because the rank feeds an aggregate, not a rk<=k filter,
    and would push every member row through the exchange).

    Output: (cluster_id, rep_doc_id, n_members BIGINT, rep_chars
    BIGINT) — one row per cluster.
    """
    labeled = (clusters
               .join(corpus.select(F.col(id_col),
                                   F.length(F.col(text_col))
                                    .alias("_len")), id_col))
    # struct compares lexicographically: max len first, then min id
    # (negated) — the same total, deterministic order as the
    # (len DESC, id ASC) rank-1 spelling.
    pref = F.struct(F.col("_len").alias("l"),
                    (-F.col(id_col)).alias("ni"))
    return (labeled
            .groupBy("cluster_id")
            .agg(F.max_by(F.col(id_col), pref).alias("rep_doc_id"),
                 F.count("*").cast("long").alias("n_members"),
                 F.max("_len").cast("long").alias("rep_chars")))
