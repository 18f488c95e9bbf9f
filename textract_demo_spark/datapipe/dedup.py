"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard — all native Spark SQL (no Python in the hot path).

Scale notes (the design constraints at 10^12 docs):
- exact: one hash-groupBy shuffle on a 16-byte digest — the minimum
  possible; map-side partial aggregation applies.
- MinHash+LSH: signatures are per-row narrow expressions (transform/
  array_min over shingle hashes); the only shuffle is the band-bucket
  exchange, and candidate verification happens only within buckets
  (never the O(n^2) cross join).
- SimHash: 64 per-row bit sums; Hamming-ban ding via bucket keys.
- md5 is used where cross-engine determinism matters (DuckDB oracle);
  xxhash64 (cheaper, seedable) where it does not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_NUM_HASHES = 64
DEFAULT_BANDS = 16  # 16 bands x 4 rows: ~0.5 Jaccard threshold knee


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
    """MinHash signature: sig[i] = min over shingles of
    xxhash64(shingle, seed=i). Pure per-row expression."""
    sig = F.expr(f"""
        transform(sequence(0, {num_hashes - 1}), i ->
          array_min(transform(shingles, s -> xxhash64(s, i))))""")
    return shingled.withColumn("minhash", sig)


def lsh_candidate_pairs(sig_df: DataFrame, bands: int = DEFAULT_BANDS,
                        num_hashes: int = DEFAULT_NUM_HASHES,
                        id_col: str = "doc_id") -> DataFrame:
    """Banded LSH: docs agreeing on any band of the signature become a
    candidate pair. Explode to (band, band_hash) keys, self-join per
    bucket (id_a < id_b), distinct."""
    rows_per_band = num_hashes // bands
    banded = sig_df.select(
        F.col(id_col),
        F.explode(F.expr(f"""
          transform(sequence(0, {bands - 1}), b ->
            struct(b AS band,
                   xxhash64(array_join(transform(
                     slice(minhash, b * {rows_per_band} + 1,
                           {rows_per_band}), x -> string(x)), ','))
                   AS band_hash))""")).alias("bk"))
    a = banded.select(F.col(id_col).alias("id_a"), "bk")
    b = banded.select(F.col(id_col).alias("id_b"), "bk")
    return (a.join(b, ["bk"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b").distinct())


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
    return (cands
            .join(sh.withColumnsRenamed(
                {id_col: "id_a", "shingles": "sh_a"}), "id_a")
            .join(sh.withColumnsRenamed(
                {id_col: "id_b", "shingles": "sh_b"}), "id_b")
            .withColumn("jaccard", F.expr(
                "size(array_intersect(sh_a, sh_b)) /"
                " cast(size(array_union(sh_a, sh_b)) AS DOUBLE)"))
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard"))


def with_simhash(shingled: DataFrame) -> DataFrame:
    """64-bit SimHash over tokens: bit b of the fingerprint is the
    sign of sum over tokens of (+1 if bit b of xxhash64(token) else
    -1). Per-row expression; near-dups differ in few bits."""
    sim = F.expr("""
      aggregate(sequence(0, 63),
        cast(0 AS BIGINT),
        (acc, b) -> acc + shiftleft(
          if(aggregate(tokens, 0L, (s, t) ->
               s + if(shiftright(xxhash64(t), b) % 2 != 0, 1, -1)) > 0,
             1L, 0L), b))""")
    return shingled.withColumn("simhash", sim)


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
