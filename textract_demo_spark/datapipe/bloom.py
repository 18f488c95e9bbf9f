"""Bloom-filter membership for incremental exact dedup: a corpus of
seen content is compressed to an m-bit bitmap (built distributively,
OR-merged), broadcast, and probed by arriving batches with zero
shuffle — the constant-memory alternative to the broadcast hash-index
in ``dedup.build_minhash_index`` when even the 8-byte-per-doc digest
set no longer fits an executor (10^12 docs @ 10 bits/doc = 1.25 TB of
digests vs a 1.25 GB bitmap at the same false-positive budget).

Semantics: exact-membership with a bounded false-positive rate and
ZERO false negatives — every true re-ingest is flagged. Position
derivation is double hashing (Kirsch-Mitzenmacher 2006): k positions
``(h0 + i * stride) mod m`` from two base hashes, which preserves the
asymptotic FPR of k independent hashes. The bitmap probe and a
position-set join compute the SAME function (the bitmap is just the
set's dense representation), so the join form is the in-repo oracle
for the bitmap kernel (asserted in tests), and in md5 hash mode the
whole construction is DuckDB-replayable for the driver oracle.

Scale notes:
- build: positions are narrow per-row expressions (base hashes
  computed ONCE as columns — never inside the array lambda, where
  Catalyst cannot fold them and re-evaluates per element); each
  partition emits one m/8-byte bitmap row via mapInPandas and the
  driver ORs them. No shuffle anywhere. For m beyond ~2^30 on very
  wide jobs, coalesce the position frame first so the driver merges
  fewer rows (the merge is associative; a treeAggregate would do it
  in O(log P) rounds — unnecessary below thousands of partitions).
- probe: broadcast bitmap + one vectorized numpy bit-test per batch
  row; the batch never shuffles.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import hash64, normalize_text

DEFAULT_M_BITS = 1 << 20
DEFAULT_K = 5


def _with_positions(docs: DataFrame, m_bits: int, k: int,
                    text_col: str, hash_mode: str) -> DataFrame:
    """Adds ``positions`` (array of k bloom bit positions) for the
    normalized text. Base hashes land in real columns first so the
    transform lambda touches only integers."""
    norm = normalize_text(text_col)
    d = docs.withColumn("_bn", norm)
    h0 = hash64("_bn", hash_mode, 0)
    h1 = hash64("_bn", hash_mode, 1)
    d = (d.withColumn("_h0m", F.expr(f"pmod({h0}, {m_bits})"))
         .withColumn("_stride",
                     F.expr(f"1 + pmod({h1}, {m_bits - 1})")))
    return (d.withColumn(
        "positions",
        F.expr(f"transform(sequence(0, {k - 1}),"
               f" i -> pmod(_h0m + i * _stride, {m_bits}))"))
        .drop("_bn", "_h0m", "_stride"))


def bloom_position_rows(docs: DataFrame, m_bits: int = DEFAULT_M_BITS,
                        k: int = DEFAULT_K, id_col: str = "doc_id",
                        text_col: str = "text",
                        hash_mode: str = "xxhash64") -> DataFrame:
    """(id, pos) exploded position rows — the set representation used
    by ``bloom_probe_join`` and by the DuckDB oracle."""
    return (_with_positions(docs, m_bits, k, text_col, hash_mode)
            .select(F.col(id_col),
                    F.explode("positions").alias("pos")))


def build_bloom_bitmap(docs: DataFrame, m_bits: int = DEFAULT_M_BITS,
                       k: int = DEFAULT_K, text_col: str = "text",
                       hash_mode: str = "xxhash64") -> bytes:
    """Distributed bitmap build: one m/8-byte partial bitmap per
    partition (mapInPandas, no shuffle), OR-merged on the driver."""
    import numpy as np
    if m_bits % 8:
        raise ValueError("m_bits must be a multiple of 8")
    pos = (_with_positions(docs, m_bits, k, text_col, hash_mode)
           .select(F.explode("positions").alias("pos")))

    nbytes = m_bits // 8

    def partial(batches):
        bits = np.zeros(nbytes, dtype=np.uint8)
        for pdf in batches:
            a = pdf["pos"].to_numpy(dtype=np.int64)
            np.bitwise_or.at(bits, a >> 3,
                             np.left_shift(1, (a & 7)).astype(np.uint8))
        yield pd.DataFrame({"bits": [bits.tobytes()]})

    out = np.zeros(nbytes, dtype=np.uint8)
    for row in pos.mapInPandas(partial, "bits binary").collect():
        out |= np.frombuffer(row["bits"], dtype=np.uint8)
    return out.tobytes()


def bloom_probe(batch: DataFrame, bitmap: bytes,
                m_bits: int = DEFAULT_M_BITS, k: int = DEFAULT_K,
                text_col: str = "text",
                hash_mode: str = "xxhash64",
                out_col: str = "maybe_seen") -> DataFrame:
    """Adds ``maybe_seen``: True iff all k positions are set in the
    broadcast bitmap (never-false-negative membership). Zero shuffle."""
    import numpy as np
    spark = batch.sparkSession
    bc = spark.sparkContext.broadcast(bitmap)

    @F.pandas_udf("boolean")
    def _probe(pos_arrays: pd.Series) -> pd.Series:
        bits = np.frombuffer(bc.value, dtype=np.uint8)

        def one(arr):
            a = np.asarray(arr, dtype=np.int64)
            return bool(((bits[a >> 3] >> (a & 7)) & 1).all())

        return pos_arrays.map(one)

    return (_with_positions(batch, m_bits, k, text_col, hash_mode)
            .withColumn(out_col, _probe("positions"))
            .drop("positions"))


def bloom_probe_join(batch: DataFrame, corpus_positions: DataFrame,
                     m_bits: int = DEFAULT_M_BITS, k: int = DEFAULT_K,
                     id_col: str = "doc_id", text_col: str = "text",
                     hash_mode: str = "xxhash64",
                     out_col: str = "maybe_seen") -> DataFrame:
    """Reference formulation of the SAME function as ``bloom_probe``:
    the batch's positions left-join the corpus's DISTINCT position
    set (broadcast — it is <= m_bits rows and heavily duplicated);
    a doc is maybe_seen iff every probe row matched. Used to oracle
    the bitmap kernel in tests and (in md5 mode) by DuckDB."""
    cset = corpus_positions.select("pos").distinct()
    probes = bloom_position_rows(batch, m_bits, k, id_col, text_col,
                                 hash_mode)
    joined = probes.join(F.broadcast(cset.withColumn("_hit", F.lit(1))),
                         "pos", "left")
    return (joined.groupBy(id_col)
            .agg((F.min(F.coalesce(F.col("_hit"), F.lit(0))) == 1)
                 .alias(out_col)))
