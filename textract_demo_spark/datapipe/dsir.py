"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling",
NeurIPS 2023) — re-expressed Spark-first.

Given a small TARGET corpus (the domain you want more of) and the big
RAW corpus, DSIR fits two bag-of-hashed-ngrams unigram models and
scores every raw document with its importance log-weight

    log w(x) = sum_feat [ log p_target(bucket(feat))
                          - log p_raw(bucket(feat)) ]

then keeps the highest-weight documents. Features are whitespace
unigrams AND bigrams hashed into ``num_buckets`` buckets (the paper's
construction); probabilities are Laplace-smoothed bucket frequencies.

Determinism: all logs are WHOLE BITS via exact integer arithmetic —
``bits(x) = floor(log2 x) = length(bin(x)) - 1`` — the same
no-libm-log trick as ``textstats.with_unigram_surprisal``, so the
score is bit-identical in Spark and DuckDB (the driver oracle replays
the whole pipeline). With p(b) = (n_b + 1) / (total + B):

    log2 p_t(b) - log2 p_r(b)
      ~= [bits(n_t[b]+1) - bits(total_t+B)]
       - [bits(n_r[b]+1) - bits(total_r+B)]

per-doc score = sum_feat delta[bucket] + n_feats * norm_bits with
delta[b] = bits(n_t[b]+1) - bits(n_r[b]+1) and
norm_bits = bits(total_r+B) - bits(total_t+B).

Scale shape (the 10^12-doc design):

* model fit = explode features -> ONE groupBy(bucket) whose map-side
  partial aggregation collapses each partition to <= B rows before
  the exchange; the model table is <= B rows (default 8192) — KB-
  sized, broadcastable, regardless of corpus size;
* the delta table is r_model LEFT JOIN broadcast(t_model) — a left
  join suffices because scoring only probes buckets the raw corpus
  observed (a full-outer join would forfeit the broadcast: Spark
  cannot broadcast a full-outer side);
* scoring = explode -> broadcast-join the delta table -> ONE
  groupBy(doc) with partial aggregation (the doc-key exchange carries
  ~one partial row per doc per partition, not feature occurrences).
  The raw corpus never shuffles by content; only narrow
  (doc_id, bucket) rows move.

Reference analog: the demo's human-curated smart-filtering stage
(source/human-review/textract-demo docs); DSIR is that filter
learned from a target sample instead of hand rules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import hash64
from .textstats import _tokens

DEFAULT_NUM_BUCKETS = 8192


# unigrams + bigrams over a pre-projected token array ``_t``. The
# empty-bigram arm uses ``slice(_t, 1, 0)`` for a TYPED empty
# array<string> (bare ``array()`` is array<null> and poisons concat's
# type coercion); the size guard matters because Spark's
# ``sequence(1, 0)`` counts DOWN ([1, 0]) instead of yielding an
# empty range.
_FEATURES = ("concat(_t, CASE WHEN size(_t) >= 2 THEN "
             "transform(sequence(1, size(_t) - 1), i -> "
             "concat(element_at(_t, i), ' ', element_at(_t, i + 1)))"
             " ELSE slice(_t, 1, 0) END)")


def _buckets(docs: DataFrame, text_col: str, id_col: str | None,
             num_buckets: int, hash_mode: str) -> DataFrame:
    """(id?, bucket) — one row per feature occurrence. Tokenization
    is projected ONCE per row before the feature expression touches
    it (the regex split is the expensive part; referencing it four
    times inline would re-evaluate it — Catalyst does not CSE across
    higher-order-function boundaries)."""
    cols = [id_col] if id_col else []
    return (docs
            .select(*cols, F.expr(_tokens(text_col)).alias("_t"))
            .select(*cols, F.explode(F.expr(_FEATURES)).alias("_f"))
            .select(*cols,
                    F.expr(f"pmod({hash64('_f', hash_mode)},"
                           f" {num_buckets})").alias("bucket")))


def dsir_bucket_model(docs: DataFrame, text_col: str = "text",
                      num_buckets: int = DEFAULT_NUM_BUCKETS,
                      hash_mode: str = "xxhash64") -> DataFrame:
    """Bag-of-hashed-ngrams model: (bucket, n) for every OBSERVED
    bucket (absent buckets are implicitly n=0; Laplace +1 happens at
    delta time). ONE partial-aggregated groupBy — the exchange
    carries <= num_buckets rows per map partition."""
    return (_buckets(docs, text_col, None, num_buckets, hash_mode)
            .groupBy("bucket")
            .agg(F.count("*").cast("long").alias("n")))


def with_dsir_scores(raw: DataFrame, target: DataFrame,
                     text_col: str = "text", id_col: str = "doc_id",
                     num_buckets: int = DEFAULT_NUM_BUCKETS,
                     hash_mode: str = "xxhash64",
                     raw_model: DataFrame | None = None,
                     target_model: DataFrame | None = None) -> DataFrame:
    """Importance score per raw document:
    (id_col, n_feats, dsir_bits) with dsir_bits the integer-bits
    importance log-weight (higher = more target-like). Pass
    precomputed ``raw_model`` / ``target_model`` (from
    ``dsir_bucket_model``) to amortize model fitting across reruns
    or to score a stream against a frozen pair."""
    if raw_model is None:
        raw_model = dsir_bucket_model(raw, text_col, num_buckets,
                                      hash_mode)
    if target_model is None:
        target_model = dsir_bucket_model(target, text_col, num_buckets,
                                         hash_mode)
    bits = "cast(length(bin({0})) - 1 AS BIGINT)"
    # delta per raw-observed bucket; buckets only the target saw are
    # never probed by raw features, so LEFT join keeps the broadcast
    delta = (raw_model
             .join(F.broadcast(target_model
                               .withColumnRenamed("n", "n_t")),
                   "bucket", "left")
             .select("bucket",
                     (F.expr(bits.format("coalesce(n_t, 0L) + 1"))
                      - F.expr(bits.format("n + 1"))).alias("delta")))
    # norm_bits = bits(total_r + B) - bits(total_t + B): per-feature
    # constant restoring the two models' denominators
    norm = (raw_model.agg(F.sum("n").cast("long").alias("_tr"))
            .crossJoin(target_model
                       .agg(F.sum("n").cast("long").alias("_tt")))
            .select((F.expr(bits.format(f"_tr + {num_buckets}"))
                     - F.expr(bits.format(f"_tt + {num_buckets}")))
                    .alias("norm_bits")))
    return (_buckets(raw, text_col, id_col, num_buckets, hash_mode)
            .join(F.broadcast(delta), "bucket", "left")
            .groupBy(id_col)
            .agg(F.count("*").cast("long").alias("n_feats"),
                 F.sum(F.coalesce(F.col("delta"), F.lit(0)))
                  .cast("long").alias("_sd"))
            .crossJoin(F.broadcast(norm))
            .select(id_col, "n_feats",
                    (F.col("_sd")
                     + F.col("n_feats") * F.col("norm_bits"))
                    .cast("long").alias("dsir_bits")))


def dsir_topk(raw: DataFrame, target: DataFrame, k: int,
              text_col: str = "text", id_col: str = "doc_id",
              num_buckets: int = DEFAULT_NUM_BUCKETS,
              hash_mode: str = "xxhash64") -> DataFrame:
    """The resampling step as deterministic top-k: the k raw docs
    with the highest importance weight, ties broken by id (the
    paper's Gumbel-noise draw replaced by a stable order so reruns
    and engines agree). Spark executes the rank as WindowGroupLimit —
    each partition forwards at most k rows to the single reducer, so
    the global window never sees the corpus."""
    scores = with_dsir_scores(raw, target, text_col, id_col,
                              num_buckets, hash_mode)
    w = Window.orderBy(F.col("dsir_bits").desc(), F.col(id_col))
    return (scores
            .withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= k))
