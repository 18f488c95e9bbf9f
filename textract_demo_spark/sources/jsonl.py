"""Gzipped-JSONL ingestion — the interchange format transcript and
document corpora actually arrive in (one JSON object per line,
gzip-compressed shards). Spark's JSON file source decompresses
``.gz`` shards transparently and splits work at file granularity, so
a directory of shards parallelizes with zero custom code; this module
adds the two pieces a production ingest needs on top:

- an EXPLICIT schema (never ``inferSchema`` at 10^12 rows — schema
  inference is a full extra pass over the corpus);
- malformed-line hygiene: PERMISSIVE mode routes unparseable lines to
  a corrupt-record column instead of failing the job; rows whose
  required id is null (the signature of a corrupt line, since every
  data field of a failed parse is null) are dropped and can be
  counted for the ingest metrics sidecar.

Scale notes: gzip shards are NOT splittable — one task per shard —
so shard size (100-500 MB compressed) is the parallelism knob, same
as any web-scale JSONL corpus layout. The reader never caches or
collects; corrupt filtering is a narrow null-check on the required
column (filtering directly on the corrupt-record column is restricted
by Spark and would force a cache).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt_record"


def read_jsonl(spark: SparkSession, path: str, schema: str,
               required_col: str) -> DataFrame:
    """Read (optionally gzipped) JSONL shards under ``path`` with an
    explicit schema; malformed lines are dropped via the
    required-column null check. Returns data columns only."""
    full_schema = f"{schema}, {CORRUPT_COL} STRING"
    df = (spark.read
          .schema(full_schema)
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", CORRUPT_COL)
          .json(path))
    return (df.filter(F.col(required_col).isNotNull())
            .drop(CORRUPT_COL))
