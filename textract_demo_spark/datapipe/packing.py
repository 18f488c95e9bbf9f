"""Deterministic greedy sequence packing: group documents into
fixed-token-budget "packs" (the training-batch construction step that
concatenates documents up to the model context length).

Greedy packing is inherently sequential — pack boundaries depend on
every previous document's length — so it cannot be a window function
or any other built-in DataFrame op. This is the textbook case for a
custom stateful batch operator: shard the corpus by a pure hash of
the document id, run the sequential scan INSIDE each shard via
``applyInPandas`` (Arrow-batched, one shard per task), and make the
within-shard order a deterministic column sort so the output is a
pure function of the input set.

Scale notes (the design constraints at 10^12 docs):
- exactly ONE shuffle (the groupBy(shard) exchange); shard count is
  the parallelism knob and bounds per-task memory to corpus/shards
  rows of (id, n_tok) pairs — the text itself is never shuffled, the
  pack assignment joins back by id.
- the per-shard scan is NOT a per-row Python loop: pack boundaries
  are found by repeated ``np.searchsorted`` over the token cumsum —
  O(packs x log rows) vectorized steps per shard, so a million-row
  shard costs thousands of numpy calls, not a million Python
  iterations.
- determinism: shard = hash64(salt, id) and within-shard order is
  (id) ascending, so membership and pack ids are reproducible across
  runs, partitionings and engines (md5 hash mode for cross-engine
  replay, as everywhere in ``datapipe``).
- a document longer than the budget gets a pack of its own (callers
  truncate downstream); packing never drops or splits rows.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import hash64

PACK_SCHEMA = ("shard int, doc_id long, n_tok long,"
               " pack_idx long, pack_pos long")


def _pack_one_shard(pdf: pd.DataFrame, budget: int) -> pd.DataFrame:
    """Greedy boundaries via repeated searchsorted on the cumsum."""
    pdf = pdf.sort_values("doc_id", kind="mergesort",
                          ignore_index=True)
    tok = pdf["n_tok"].to_numpy(dtype=np.int64)
    cs = np.cumsum(tok)
    n = len(tok)
    pack_idx = np.empty(n, dtype=np.int64)
    pack_pos = np.empty(n, dtype=np.int64)
    start, base, p = 0, 0, 0
    while start < n:
        # last row whose cumulative size still fits the budget …
        end = int(np.searchsorted(cs, base + budget, side="right"))
        # … but an oversize document still forms its own pack
        end = max(end, start + 1)
        pack_idx[start:end] = p
        pack_pos[start:end] = np.arange(end - start)
        base = cs[end - 1]
        start, p = end, p + 1
    pdf["pack_idx"] = pack_idx
    pdf["pack_pos"] = pack_pos
    return pdf[["shard", "doc_id", "n_tok", "pack_idx", "pack_pos"]]


def pack_greedy(docs: DataFrame, budget: int, n_shards: int = 64,
                id_col: str = "doc_id", tok_col: str = "n_tok",
                salt: str = "pk",
                hash_mode: str = "xxhash64") -> DataFrame:
    """Assign every document to a (shard, pack_idx, pack_pos) slot.

    ``tok_col`` is the document's token count (callers compute it with
    ``textstats.with_token_stats`` or supply their own); ``budget`` is
    the pack capacity in tokens. Output columns: shard, doc_id, n_tok,
    pack_idx (per-shard pack number), pack_pos (position inside the
    pack); the global pack key is (shard, pack_idx).
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    keyed = f"concat('{salt}', '-', cast({id_col} AS STRING))"
    sharded = docs.select(
        F.expr(f"pmod({hash64(keyed, hash_mode)}, {n_shards})")
         .cast("int").alias("shard"),
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(tok_col).cast("long").alias("n_tok"))
    return (sharded.groupBy("shard")
            .applyInPandas(lambda pdf: _pack_one_shard(pdf, budget),
                           schema=PACK_SCHEMA))


def pack_stats(packed: DataFrame, budget: int) -> DataFrame:
    """Per-pack utilization rollup: docs per pack, tokens per pack,
    fill fraction in basis points (floor; cross-engine integer
    convention). One small aggregate over the packing output."""
    return (packed.groupBy("shard", "pack_idx")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_tok").alias("pack_tokens"))
            .withColumn("fill_bp", F.expr(
                f"cast(floor(10000 * least(pack_tokens, {budget})"
                f" / {budget}.0D) AS BIGINT)")))
