"""Mergeable distributed sketches: HyperLogLog distinct-count
registers and a count-min frequency sketch with heavy-hitter probe.

Both sketches exist for the 100-TB regime where exact global
``count(distinct ...)`` / full frequency tables stop being free:

- **HyperLogLog**: a fixed 2^p-register table per group. The build is
  ONE hash-groupBy whose map-side partial ``max`` collapses every
  within-partition value before the exchange — the shuffle carries at
  most (groups × m) register rows regardless of input size, and two
  register tables merge with the same ``max``, so per-partition /
  per-day sketches roll up without touching raw data.
- **Count-min**: a fixed depth×width counter table. The build is a
  key-count aggregate (map-side partial sum) followed by a tiny
  (depth × distinct-keys) re-bucket; the probe broadcasts the
  counter table (≤ depth·width rows) — zero shuffle on the probe
  side. Estimates only ever over-count (biased high), never under.

Everything is integer algebra over the shared ``hash64`` families
(``xxhash64`` fast path, ``md5`` cross-engine mode) so the register /
counter tables themselves are DuckDB-replayable — the driver
correctness rows compare the sketch CONTENT, not a float estimate.
The float cardinality estimator (``hll_estimate``, with the standard
linear-counting small-range correction) is exercised by pytest
accuracy bounds instead, because cross-engine float ``ln``/``pow``
equality is not a contract worth betting a hash-compare on.

Reference analog: the demo aggregates per-document metrics into
DynamoDB counters (textract-demo ``fn-postprocess/main.py`` result
persistence); at transcript-corpus scale the same "how many distinct
payloads / how often does each token occur" questions need sketches,
not counters.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from .dedup import hash64

# both hash modes are normalized into [0, 2^60): md5 mode already
# lands there (15 hex chars), xxhash64 is folded by pmod
_HASH_SPAN = 1 << 60
_HASH_BITS = 60


def _h60(inner: str, mode: str) -> str:
    return f"pmod({hash64(inner, mode)}, {_HASH_SPAN}L)"


# ---------------------------------------------------------------------------
# HyperLogLog


def hll_registers(df: DataFrame, value_col: str = "text",
                  group_cols: tuple[str, ...] = ("source",),
                  p: int = 8, hash_mode: str = "xxhash64") -> DataFrame:
    """Per-group HLL register table: (group..., bucket, rho).

    bucket = h mod 2^p; rho = leading-zero rank of the remaining
    w = h div 2^p within its W = 60-p bit budget, i.e.
    ``W - floor(log2(w))`` (and W+1 when w = 0), computed in exact
    integer bits as ``length(bin(w)) - 1`` — no float log in either
    engine. Registers merge under ``max`` (see ``hll_merge``).
    """
    if not 4 <= p <= 16:
        raise ValueError(f"p out of range: {p}")
    m = 1 << p
    w_bits = _HASH_BITS - p
    h = _h60(value_col, hash_mode)
    gcols = list(group_cols)
    return (df
            .select(*gcols, F.expr(h).alias("_h"))
            .select(*gcols,
                    F.expr(f"pmod(_h, {m}L)").cast("long").alias("bucket"),
                    F.expr(f"_h div {m}L").alias("_w"))
            .select(*gcols, "bucket",
                    F.expr(f"CASE WHEN _w = 0 THEN {w_bits + 1}L "
                           f"ELSE {w_bits}L - (length(bin(_w)) - 1) END")
                    .cast("long").alias("rho"))
            .groupBy(*gcols, "bucket")
            .agg(F.max("rho").alias("rho")))


def hll_merge(*register_tables: DataFrame) -> DataFrame:
    """Union register tables and re-max: the sketch's merge operator
    (per-partition / per-snapshot sketches roll up losslessly —
    ``merge(build(A), build(B)) == build(A ∪ B)``, asserted in
    tests/test_sketch.py)."""
    out = register_tables[0]
    for other in register_tables[1:]:
        out = out.unionByName(other)
    keys = [c for c in out.columns if c != "rho"]
    return out.groupBy(*keys).agg(F.max("rho").alias("rho"))


def hll_estimate(registers: DataFrame, p: int,
                 group_cols: tuple[str, ...] = ("source",)) -> DataFrame:
    """Float cardinality estimate per group from a register table:
    standard HLL harmonic mean with the linear-counting small-range
    correction (Flajolet et al. 2007). Float path — accuracy is a
    pytest bound (σ ≈ 1.04/√m), not a cross-engine hash contract."""
    m = 1 << p
    alpha = 0.7213 / (1 + 1.079 / m)
    gcols = list(group_cols)
    agg = (registers.groupBy(*gcols)
           .agg(F.sum(F.pow(F.lit(0.5), F.col("rho"))).alias("_hsum"),
                F.count("*").alias("_hit")))
    zeros = F.lit(m) - F.col("_hit")
    raw = F.lit(alpha * m * m) / (F.col("_hsum") + zeros)
    lc = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros)
    est = F.when((raw <= F.lit(2.5 * m)) & (zeros > 0), lc).otherwise(raw)
    return agg.select(*gcols, est.alias("n_distinct_est"))


# ---------------------------------------------------------------------------
# Count-min


def _salted_hash(inner: str, i_expr: str, mode: str) -> str:
    """Row i of the hash family: xxhash64 takes the index as an extra
    seed argument; md5 mode prefixes it into the digested string
    (DuckDB replay: ('0x' || substr(md5(i || '#' || x), 1, 15))::BIGINT)."""
    if mode == "xxhash64":
        return f"xxhash64({inner}, {i_expr})"
    if mode == "md5":
        return ("cast(conv(substr(md5(concat(cast(" + i_expr +
                " AS string), '#', " + inner + ")), 1, 15), 16, 10)"
                " AS BIGINT)")
    raise ValueError(f"unknown hash mode: {mode!r}")


def cms_build(df: DataFrame, key_col: str, depth: int = 3,
              width: int = 1024, weight_col: str | None = None,
              hash_mode: str = "xxhash64") -> DataFrame:
    """Count-min counter table: (i, bucket, cnt) for i in [0, depth).

    Scale shape: aggregate exact key counts FIRST (one exchange whose
    map-side partial sum collapses occurrences), then explode each
    distinct key into its depth rows and re-aggregate into the fixed
    depth×width table (second, tiny exchange bounded by depth·width).
    Exploding before the first aggregate would multiply the raw-row
    shuffle by depth for nothing.
    """
    w = (F.col(weight_col).cast("long") if weight_col
         else F.lit(1).cast("long"))
    key_counts = (df.groupBy(key_col).agg(F.sum(w).alias("_n")))
    bucket = f"pmod({_salted_hash(key_col, 'i', hash_mode)}, {width}L)"
    return (key_counts
            .select(key_col, "_n",
                    F.explode(F.expr(f"sequence(0, {depth - 1})"))
                    .alias("i"))
            .select(F.col("i").cast("long").alias("i"),
                    F.expr(bucket).cast("long").alias("bucket"), "_n")
            .groupBy("i", "bucket")
            .agg(F.sum("_n").alias("cnt")))


def cms_probe(sketch: DataFrame, probes: DataFrame, key_col: str,
              depth: int = 3, width: int = 1024,
              hash_mode: str = "xxhash64") -> DataFrame:
    """Estimate each probe key's count: min over the depth rows of the
    counter its buckets hold (0 for a never-touched bucket). The
    counter table is ≤ depth·width rows — broadcast, so the probe is
    a BroadcastHashJoin + one groupBy(key) partial-min: never a
    shuffle of the sketch, never an all-pairs anything. CMS guarantee:
    ``est >= true count`` always (collisions only add)."""
    bucket = f"pmod({_salted_hash(key_col, 'i', hash_mode)}, {width}L)"
    exp = (probes
           .select(key_col,
                   F.explode(F.expr(f"sequence(0, {depth - 1})"))
                   .alias("i"))
           .select(key_col, F.col("i").cast("long").alias("i"),
                   F.expr(bucket).cast("long").alias("bucket")))
    joined = exp.join(F.broadcast(sketch), ["i", "bucket"], "left")
    return (joined
            .groupBy(key_col)
            .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("long")))
                 .alias("cms_est")))


def logq_sketch(df: DataFrame, value_col: str,
                group_cols: tuple[str, ...] = ("source",)) -> DataFrame:
    """Mergeable log-bucket quantile sketch over a positive integer
    column: per group, a histogram keyed by ``bucket = floor(log2 v)``
    (computed as ``length(bin(v)) - 1`` — exact integer bits, the
    same engine-safe trick as the surprisal operator; v=0 gets
    bucket -1). The sketch is (group, bucket, n) — at most 64 rows
    per group regardless of input size — and two sketches merge by
    summing ``n``, so per-partition / per-day sketches roll up
    without touching raw data (the property the EXACT percentile
    operator in ``textstats.length_percentiles`` cannot offer: it
    must re-rank raw rows on every update).

    Quantile answers carry relative error bounded by the bucket
    width (value within 2x), the usual log-histogram guarantee.
    Build cost: ONE hash-groupBy whose map-side partial sum collapses
    every partition's values before the exchange.
    """
    b = (f"IF({value_col} <= 0, -1L,"
         f" CAST(length(bin(CAST({value_col} AS BIGINT))) - 1 AS BIGINT))")
    return (df
            .groupBy(*group_cols, F.expr(b).alias("bucket"))
            .agg(F.count("*").alias("n")))


def logq_merge(*sketches: DataFrame) -> DataFrame:
    """Merge log-bucket sketches built by ``logq_sketch`` (same group
    columns): union + re-sum — associative, commutative."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    keys = [c for c in out.columns if c != "n"]
    return out.groupBy(*keys).agg(F.sum("n").alias("n"))


def logq_quantile(sketch: DataFrame, qs: tuple[int, ...] = (50, 90, 99),
                  group_cols: tuple[str, ...] = ("source",)) -> DataFrame:
    """Quantile UPPER BOUNDS from a log-bucket sketch: for each q in
    percent, the smallest bucket whose running count reaches
    ``ceil(q * total / 100)`` (integer arithmetic: ``(q*total+99) div
    100``, the same discrete rank convention as the exact percentile
    operator), answered as ``2^(bucket+1) - 1`` — the largest value
    the bucket can hold (v=0's bucket answers 0). All-integer, so
    the driver oracle hash-compares exact values.

    Cost: the sketch is at most 64 rows per group, so the rank scan
    is a window over a tiny frame — group count × 64 rows total,
    never the raw data.
    """
    w = (W.partitionBy(*[F.col(c) for c in group_cols])
         .orderBy("bucket")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    tot = (W.partitionBy(*[F.col(c) for c in group_cols])
           .rowsBetween(W.unboundedPreceding, W.unboundedFollowing))
    cum = (sketch
           .withColumn("cum", F.sum("n").over(w))
           .withColumn("total", F.sum("n").over(tot)))
    qdf = cum.select(
        *group_cols, "bucket", "cum", "total",
        F.explode(F.array(*[F.lit(q) for q in qs])).alias("q"))
    ranked = (qdf
              .filter(F.col("cum") >=
                      F.expr("(q * total + 99) div 100"))
              .groupBy(*group_cols, "q")
              .agg(F.min("bucket").alias("bucket")))
    return ranked.select(
        *group_cols, "q",
        F.expr("IF(bucket < 0, 0L,"
               " CAST(shiftleft(1L, CAST(bucket AS INT) + 1) - 1"
               " AS BIGINT))").alias("q_upper"))


# ---------------------------------------------------------------------------
# Theta / KMV (k-minimum-values) — distinct-count SET OPERATIONS


def kmv_sketch(df: DataFrame, value_col: str = "text",
               group_cols: tuple[str, ...] = ("source",),
               k: int = 64, hash_mode: str = "xxhash64") -> DataFrame:
    """Per-group KMV (theta) sketch: the ``k`` smallest DISTINCT
    60-bit hashes per group, as rows (group..., h) — the sketch whose
    set-operation algebra HLL lacks (HLL unions losslessly but cannot
    intersect; theta sketches do both, the Datasketches model).

    Scale shape: one hash-groupBy collapses duplicate hashes (map-
    side partial — the unavoidable distinct), then the bottom-k per
    group runs as ``row_number() <= k``, which Spark rewrites into
    WindowGroupLimit: every map partition forwards at most k rows per
    group into the rank exchange, so the second shuffle carries
    O(partitions x groups x k), never the distinct stream.
    """
    gcols = list(group_cols)
    h = _h60(value_col, hash_mode)
    dist = (df.select(*gcols, F.expr(h).alias("h"))
            .groupBy(*gcols, "h").agg(F.lit(1).alias("_one"))
            .drop("_one"))
    w = W.partitionBy(*[F.col(c) for c in gcols]).orderBy("h")
    return (dist.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= k).drop("_rk"))


def kmv_set_ops(sketch: DataFrame, k: int = 64,
                group_col: str = "source") -> DataFrame:
    """Pairwise theta set-operation summary between every pair of
    groups of a ``kmv_sketch``: for groups (a, b) with a < b,

    - ``theta`` = min(theta_a, theta_b), where a group's theta is its
      k-th smallest hash when the sketch is full, else the full hash
      span (the group is exact below k distinct values);
    - ``n_union`` = distinct hashes of (sketch_a ∪ sketch_b) < theta;
    - ``n_inter`` = hashes present in BOTH sketches < theta;
    - float estimates ``union_est`` / ``inter_est`` = n / (theta /
      span) — the standard theta estimator. The integer columns are
      the cross-engine contract (driver oracle hash-compares them);
      the float estimates are pytest-bounded only, same split as HLL.

    Everything here is dimension-sized — sketches are k rows per
    group, pairs are groups^2 — so every join below broadcasts; the
    corpus is never touched again.
    """
    g = group_col
    thetas = (sketch.groupBy(g)
              .agg(F.count("*").alias("_n"), F.max("h").alias("_mx"))
              .select(F.col(g),
                      F.when(F.col("_n") >= k, F.col("_mx"))
                      .otherwise(F.lit(_HASH_SPAN).cast("long"))
                      .alias("_theta")))
    ta = thetas.select(F.col(g).alias("g_a"),
                       F.col("_theta").alias("_th_a"))
    tb = thetas.select(F.col(g).alias("g_b"),
                       F.col("_theta").alias("_th_b"))
    pairs = (ta.crossJoin(F.broadcast(tb))
             .filter(F.col("g_a") < F.col("g_b"))
             .select("g_a", "g_b",
                     F.least("_th_a", "_th_b").alias("theta")))
    sa = sketch.select(F.col(g).alias("g_a"), "h")
    sb = sketch.select(F.col(g).alias("g_b"),
                       F.col("h").alias("h_b"))
    # union side: each pair's surviving hashes from either sketch
    ua = pairs.join(F.broadcast(sa), "g_a").select(
        "g_a", "g_b", "theta", "h")
    ub = pairs.join(F.broadcast(sb), "g_b").select(
        "g_a", "g_b", "theta", F.col("h_b").alias("h"))
    union_n = (ua.unionByName(ub)
               .filter(F.col("h") < F.col("theta"))
               .groupBy("g_a", "g_b", "theta")
               .agg(F.count_distinct("h").alias("n_union")))
    inter_n = (pairs.join(F.broadcast(sa), "g_a")
               .join(F.broadcast(sb.withColumnRenamed("h_b", "h")),
                     ["g_b", "h"])
               .filter(F.col("h") < F.col("theta"))
               .groupBy("g_a", "g_b")
               .agg(F.count("*").alias("n_inter")))
    span = float(_HASH_SPAN)
    return (union_n
            .join(F.broadcast(inter_n), ["g_a", "g_b"], "left")
            .select("g_a", "g_b", F.col("theta").cast("long"),
                    F.col("n_union").cast("long").alias("n_union"),
                    F.coalesce("n_inter", F.lit(0)).cast("long")
                    .alias("n_inter"))
            .withColumn("union_est",
                        F.col("n_union") * F.lit(span) / F.col("theta"))
            .withColumn("inter_est",
                        F.col("n_inter") * F.lit(span) / F.col("theta")))
