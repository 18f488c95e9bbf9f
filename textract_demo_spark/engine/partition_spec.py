"""Hidden partitioning: Iceberg partition-spec transforms for the
IcebergLike table layer.

Iceberg's hidden partitioning (spec.md "Partition Transforms";
reference table layout analog: the pipeline buckets S3 output by
date prefix, source/ocr/template.sam.yml lifecycle rules) decouples
the QUERY predicate from the physical LAYOUT: the table declares a
spec like ``(days(ts), bucket(4, user_id))``, writers derive the
partition value from row data, and readers who filter on the raw
column (``ts BETWEEN ...``, ``user_id = 7``) get partition pruning
without ever naming the transform — the planner converts the
predicate into transform space.

This module implements the transform algebra for the single-int
``PART_COL`` layout used by ``IcebergLike``:

- ``days(col)`` / ``hours(col)`` / ``months(col)``: time
  granularities (Iceberg spec v1 transforms), digit = periods since
  the 1970-01-01 epoch.
- ``truncate(w, col)``: integer width-truncate, digit = floor(v/w)
  (same ordering as Iceberg's ``v - v % w`` value).
- ``bucket(n, col)``: hash bucket. DEVIATION from Iceberg noted: the
  hash is Spark's ``xxhash64`` (JVM-native, whole-stage-codegen)
  rather than Iceberg's murmur3_x86_32 — the bucketing contract
  (stable, uniform, type-sensitive) is identical, the bit pattern is
  not, so files are not byte-interchangeable with a real Iceberg
  writer.

A spec is at most ONE ordered transform (days/hours/months/truncate)
plus any number of bucket transforms; the composite key is mixed
radix — ``key = ordered_digit * prod(n_i) + sum(bucket_digit_j *
prod(n_{>j}))`` — so ``key // prod(n_i)`` recovers the ordered digit
and each bucket digit is recoverable by divmod. That keeps pruning
PURE KEY ARITHMETIC: a range predicate on the ordered source column
or an equality predicate on a bucket source column eliminates
partitions from the key alone, BEFORE any file listing and WITHOUT
per-partition column stats (stats pruning composes on top for
everything else).

Scale shape: key assignment is a pure JVM projection (datediff /
floor / xxhash64 — zero shuffle, stays inside whole-stage codegen;
plan-gated in tests/test_partition_spec.py), and pruning is driver-
side integer arithmetic over the manifest key list — O(partitions),
no data touched. At 10^12 turns the spec is what keeps a
time-sliced read (yesterday's conversations) or a point lookup (one
user's history) from listing the other ~10^5 partitions.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from datetime import date, datetime, timezone

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

PART_COL = "part_key"

ORDERED_TRANSFORMS = ("days", "hours", "months", "truncate")
_EPOCH = datetime(1970, 1, 1)


@dataclass(frozen=True)
class PartitionField:
    """One spec entry. ``n`` = bucket count (bucket) or width
    (truncate); ``dtype`` = the source column's Spark simpleString
    type, captured at key-assignment time so pruning can hash an
    equality literal with the exact physical type xxhash64 saw."""
    transform: str
    col: str
    n: int | None = None
    dtype: str | None = None


def parse_spec(fields) -> list[PartitionField]:
    """Accept ('days','ts') / ('bucket','user_id',4) tuples or
    PartitionField / dicts; validate the one-ordered-dim rule."""
    out = []
    for f in fields:
        if isinstance(f, PartitionField):
            out.append(f)
        elif isinstance(f, dict):
            out.append(PartitionField(**f))
        else:
            t, c, *rest = f
            out.append(PartitionField(t, c, rest[0] if rest else None))
    if not out:
        raise ValueError("empty partition spec")
    for f in out:
        if f.transform in ("bucket", "truncate") and not f.n:
            raise ValueError(f"{f.transform}({f.col}) needs n")
        if f.transform not in (*ORDERED_TRANSFORMS, "bucket"):
            raise ValueError(f"unknown transform {f.transform!r}")
    ordered = [f for f in out if f.transform in ORDERED_TRANSFORMS]
    if len(ordered) > 1:
        raise ValueError("at most one ordered transform per spec")
    # canonical order: ordered dim first (high digits), buckets after
    return ordered + [f for f in out if f.transform == "bucket"]


def spec_to_json(spec: list[PartitionField]) -> list[dict]:
    return [{"transform": f.transform, "col": f.col, "n": f.n,
             "dtype": f.dtype} for f in spec]


def spec_from_json(obj) -> list[PartitionField]:
    return [PartitionField(**d) for d in obj]


def _ordered_expr(f: PartitionField) -> Column:
    c = F.col(f.col)
    if f.transform == "days":
        return F.datediff(F.to_date(c), F.lit("1970-01-01"))
    if f.transform == "hours":
        return F.floor(c.cast("double") / 3600.0)
    if f.transform == "months":
        return (F.year(c) - F.lit(1970)) * 12 + F.month(c) - 1
    if f.transform == "truncate":
        return F.floor(c.cast("long") / f.n)
    raise ValueError(f.transform)


def _bucket_expr(f: PartitionField) -> Column:
    return F.pmod(F.xxhash64(F.col(f.col)), F.lit(f.n))


def spec_part_key(df: DataFrame, spec) -> tuple[DataFrame, list[PartitionField]]:
    """Assign PART_COL from the spec — a pure narrow projection
    (datediff/floor/xxhash64 fold, zero shuffle). Returns the keyed
    DataFrame plus the spec with source dtypes captured (the form
    that gets persisted in the table's spec.json)."""
    spec = parse_spec(spec)
    types = dict(df.dtypes)
    resolved = []
    key = None
    for f in spec:
        if f.col not in types:
            raise ValueError(f"spec column {f.col!r} not in DataFrame")
        f = PartitionField(f.transform, f.col, f.n, types[f.col])
        resolved.append(f)
        if f.transform in ORDERED_TRANSFORMS:
            key = _ordered_expr(f).cast("long")
        else:
            d = _bucket_expr(f).cast("long")
            key = d if key is None else key * f.n + d
    return df.withColumn(PART_COL, key.cast("int")), resolved


def _py_ordered_digit(f: PartitionField, v):
    """Python-side ordered digit — must agree with _ordered_expr for
    every value (property-tested)."""
    if f.transform == "truncate":
        return math.floor(int(v) / f.n)
    if isinstance(v, str):
        try:
            v = datetime.fromisoformat(v)
        except ValueError:
            v = datetime.strptime(v, "%Y-%m-%d %H:%M:%S")
    if f.transform == "days":
        d = v.date() if isinstance(v, datetime) else v
        return (d - _EPOCH.date()).days
    if isinstance(v, date) and not isinstance(v, datetime):
        v = datetime(v.year, v.month, v.day)
    if f.transform == "hours":
        if v.tzinfo is not None:
            v = v.astimezone(timezone.utc).replace(tzinfo=None)
        return math.floor((v - _EPOCH).total_seconds() / 3600.0)
    if f.transform == "months":
        return (v.year - 1970) * 12 + v.month - 1
    raise ValueError(f.transform)


def _bucket_digit(spark: SparkSession, f: PartitionField, v) -> int:
    """Bucket digit of an equality literal: one row of driver-side
    Spark evaluation so the hash is bit-identical to what the writer
    computed (xxhash64 is type-sensitive — the literal is cast to the
    recorded source dtype)."""
    lit = F.lit(v)
    if f.dtype:
        lit = lit.cast(f.dtype)
    row = spark.range(1).select(
        F.pmod(F.xxhash64(lit), F.lit(f.n)).alias("d")).head()
    return int(row["d"])


def key_pruner(spec: list[PartitionField], preds: dict,
               spark: SparkSession):
    """Compile ``{col: (lo, hi)}`` predicates into a key filter
    ``int -> keep?`` using only spec arithmetic. Range predicates
    bind to the ordered dim's source column; equality predicates
    (lo == hi, both non-None) additionally bind to bucket source
    columns. Predicates on non-spec columns contribute nothing
    (conservative: keep). Returns None when nothing binds."""
    radix = [f.n for f in spec if f.transform == "bucket"]
    bprod = math.prod(radix) if radix else 1
    checks = []
    for f in spec:
        if f.col not in preds:
            continue
        lo, hi = preds[f.col]
        if f.transform in ORDERED_TRANSFORMS:
            dlo = _py_ordered_digit(f, lo) if lo is not None else None
            dhi = _py_ordered_digit(f, hi) if hi is not None else None

            def _ord(k, dlo=dlo, dhi=dhi):
                d = k // bprod
                return ((dlo is None or d >= dlo)
                        and (dhi is None or d <= dhi))
            checks.append(_ord)
        elif lo is not None and lo == hi:
            want = _bucket_digit(spark, f, lo)
            # digit position: divide out the radixes of later buckets
            later = math.prod(
                g.n for g in spec
                if g.transform == "bucket"
                and spec.index(g) > spec.index(f))

            # k % bprod recovers the bucket digits even for negative
            # keys (Python % is non-negative; construction keeps the
            # bucket digits in [0, bprod))
            def _bkt(k, want=want, later=later, n=f.n):
                return (k % bprod) // later % n == want
            checks.append(_bkt)
    if not checks:
        return None
    return lambda k: all(c(k) for c in checks)
