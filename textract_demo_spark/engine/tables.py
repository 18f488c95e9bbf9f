"""IcebergLike table layer: partitioned parquet + JSON manifest
commits with atomic rename — checkpointed per partition with lineage
manifests and per-partition extraction metrics, resumable from the
last committed snapshot (north rule, BASELINE.json:6,14).

Why not real Iceberg: no Iceberg runtime jar is available offline in
this sandbox (SURVEY.md §1.5). This layer reproduces the properties
the north rule actually uses — per-partition atomic commits, snapshot
manifests, resume-skips-committed — behind a thin seam; on a
networked cluster swap in
``--packages org.apache.iceberg:iceberg-spark-runtime`` and
``df.writeTo(table).append()``.

The reference analog: each pipeline stage persists its artifact to a
deterministic S3 key ({prefix}/{srckey}.textract.json,
fn-call-textract/main.py:42-46,98-107) and the draft async design
uses an idempotent ClientRequestToken (main.py:73-75) — deterministic
partition paths + manifest-gated renames are the same idempotency
idea, done per partition instead of per document.

Layout:
    {root}/data/part_key={k}/*.parquet     -- committed data
    {root}/_manifests/part-{k}.json        -- per-partition manifest
    {root}/_manifests/snapshot-{n}.json    -- table snapshot
    {root}/_staging/{run_id}/...           -- pre-commit scratch
    {root}/_deletes/delete-{n}.parquet     -- equality-delete files
    {root}/_deletes/posdelete-{n}.parquet  -- position-delete files

Iceberg-v2 parity pieces beyond the commit protocol:

- **Equality deletes (merge-on-read)**: ``delete_rows`` writes a
  delete FILE (the tuples to drop), never touches data. Sequence
  semantics match Iceberg: every data partition records the snapshot
  id it was committed under (``data_snapshot_id``), and a delete
  applies only to files sequenced STRICTLY BEFORE it — rows appended
  later with the same key survive. ``merge`` builds on exactly that
  rule to commit an atomic single-snapshot MERGE: its delete file and
  its new data files share one sequence number, so readers flip from
  old rows to new rows at a single publish. Reads apply deletes as a
  broadcast anti-join (delete sets are dimension-sized next to 100 TB
  of data); ``materialize_deletes`` is the ``rewrite_data_files``-
  style compaction that folds them in. This is the takedown/PII-purge
  path: deleting 10^4 documents from a 10^12-row corpus must not
  rewrite the corpus.
- **Position deletes (merge-on-read)**: ``delete_where`` is the
  OTHER Iceberg-v2 delete flavor — rows identified by (data file,
  row ordinal) instead of by key values, the form engines emit for
  predicate deletes where no natural key exists. Positions come from
  the parquet scan's ``_metadata.row_index`` hidden column (stable
  physical ordinals, JVM-side, split-safe), so recording AND
  re-applying them is a narrow projection plus a broadcast anti-join
  on (partition, file, pos). Sequence rule per the Iceberg spec: a
  position delete applies to files sequenced AT-OR-BEFORE it (>=,
  vs. equality's strictly-before) — it names concrete existing
  files, so it can never touch rows appended later. ``compact``
  refuses partitions referenced by a pending position delete
  (rewriting would rename the files out from under the tombstones —
  materialize first, the Iceberg rewrite ordering).
- **Incremental reads**: ``read_incremental(a, b)`` returns exactly
  the rows appended between two snapshots (committed partitions are
  immutable, so the diff of their committed-key sets IS the append
  set) — the Iceberg incremental-scan analog that lets downstream
  consumers process only what's new.
- **Scan pruning from manifest column stats**: ``write(...,
  stat_cols=[...])`` records per-partition min/max in the manifests;
  ``read_where`` prunes partitions whose range cannot match BEFORE
  Spark ever lists their files — at 10^5 partitions the planning-time
  skip is the difference between touching 10^5 directories and 10^1.
- **File-level skipping**: the same commits also record per-FILE
  min/max (read once from the parquet footers at promote time — the
  Iceberg data-file stats analog), and ``read_where`` prunes
  individual files WITHIN kept partitions. Unlike partition stats,
  file stats are attached to immutable objects, so they never widen,
  never go stale, and stay exact inside mixed-age partitions where
  appends forced the partition-level range open (the case that
  matters for an append-heavy ingest at 10^12 rows: each append wave
  is skippable on its own bounds).
- **Bloom file skipping**: ``write(bloom_cols=)`` records a per-file
  bloom filter over each column's distinct values (the Iceberg
  puffin-blob analog, inlined in the manifest at <=1 KiB per
  file-column) and ``read_where`` point predicates drop files whose
  bloom definitely excludes the value — the interleaved-key lookup
  where every file's [min, max] straddles the probe and range stats
  keep everything. At 10^12 rows this is the "find one conversation
  by id" path: O(files) driver-side bit probes instead of a scan.
- **Z-order clustering**: ``zorder_part_key`` assigns partitions as
  contiguous Morton-curve ranges over several columns, so the
  manifest stats above are tight in EVERY clustered dimension and
  ``read_where`` prunes on any of them (the Delta OPTIMIZE ZORDER /
  Iceberg z-sort-order analog).
- **Optimistic concurrency**: snapshots publish via an atomic
  create-if-absent CAS (``_publish_snapshot``); a writer that loses
  the id race renumbers its manifests' sequence fields and retries
  serialized after the winner, and same-partition conflicts raise
  ``CommitConflictError`` (the Iceberg commit protocol /
  ValidationException analog). Disjoint-partition concurrent ingest —
  the case that matters with many writers — commits loss-free.
  ``compact`` / ``materialize_deletes`` remain single-writer
  maintenance operations.
- **Rollback**: ``rollback(spark, snapshot_id)`` undoes commits back
  to a snapshot at O(undone work) cost — drops later partitions,
  strips later appended files (recomputing only the touched
  manifests' stats), discards later delete files; refuses to cross a
  physical rewrite. Physical restore instead of Iceberg's pointer
  move, because reads here resolve from the manifest set.
- **Tags**: ``tag(name)`` / ``read(tag=...)`` name a snapshot as a
  durable reproducibility handle; tagged snapshots survive
  ``expire_snapshots``, and ``rollback`` drops (and reports) tags
  whose state it removed.
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import shutil
import threading
import time
import uuid
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

PART_COL = "part_key"


def _safe_name(s: str) -> str:
    """File-name-safe slug of a caller-supplied run id."""
    return re.sub(r"[^A-Za-z0-9._-]", "_", s)[:80]


class CommitConflictError(RuntimeError):
    """Two writers committed overlapping partitions concurrently (the
    Iceberg ValidationException analog): the loser's data cannot be
    serialized after the winner's, so the commit is refused."""

# promote/manifest I/O parallelism: renames and small JSON writes are
# GIL-releasing syscalls, so a thread pool turns the driver-side
# commit from O(partitions) sequential waits into parallel batches
# (the round-1 scale watch-item at 10^4-10^5 partitions)
PROMOTE_THREADS = 32
# Liveness thresholds for the two hygiene sweeps. Both sweeps exist
# only to reclaim disk after a KILLED run (correctness never depends
# on them: a crashed write re-stages idempotently under its own
# run_id, and unmanifested ``s*-`` append files are invisible to
# reads, which resolve file lists from the manifests). Age-gating
# them keeps a sweep from destroying a CONCURRENT live run's
# in-progress staging dir or an appender's just-renamed-but-not-yet-
# manifested files.
STAGING_SWEEP_MIN_AGE_SEC = 3600.0
ORPHAN_SWEEP_MIN_AGE_SEC = 300.0


_STAT_SAFE = (int, float, str)  # JSON-round-trippable, order-preserved


def _footer_stats(path: str, cols: list[str]) -> dict:
    """Per-file min/max for ``cols`` read from the parquet FOOTER —
    the Iceberg data-file stats analog, collected once at commit time
    (a cluster deployment would have write tasks report these; here
    the committer reads footers, which costs O(files) metadata reads
    and zero data). A column is omitted (=> pruning keeps the file)
    unless every row group carries usable min/max of a JSON-safe,
    order-preserving scalar type: int/float/str. str is safe because
    parquet truncates string bounds conservatively (min down, max up)
    and UTF-8 byte order equals code-point order, which is Python's
    ``<``. Timestamps/bytes/bools are skipped — partition-level
    col_stats still cover them."""
    try:
        import pyarrow.parquet as pq
        md = pq.ParquetFile(path).metadata
    except Exception:
        return {}
    idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
    out = {}
    for c in cols:
        i = idx.get(c)
        if i is None:
            continue
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            cmd = md.row_group(rg).column(i)
            st = cmd.statistics
            if st is None or not st.has_min_max:
                if st is not None and st.num_values == 0:
                    continue  # all-null group constrains nothing
                mins = None  # a group with values but no bounds:
                break        # no valid whole-file range
            mn, mx = st.min, st.max
            if type(mn) not in _STAT_SAFE or type(mx) not in _STAT_SAFE:
                mins = None
                break
            mins.append(mn)
            maxs.append(mx)
        if mins:  # None (unusable) and [] (all groups null) both skip
            out[c] = {"min": min(mins), "max": max(maxs)}
    return out


def _file_stats_for(dirpath: str, names: list[str],
                    cols: list[str]) -> dict:
    """``{file name: footer stats}`` for the named files, dropping
    files that yielded nothing (absent entry == keep on read)."""
    out = {}
    for f in names:
        st = _footer_stats(os.path.join(dirpath, f), cols)
        if st:
            out[f] = st
    return out


BLOOM_MAX_BITS = 1 << 13  # 1 KiB/file-column inline cap (see below)


def _bloom_params(ndv: int) -> tuple[int, int]:
    """Bits/hashes for ``ndv`` distinct keys: ~10 bits per key
    (fpp ~1%) rounded up to a power of two, capped at BLOOM_MAX_BITS
    so the bitmap inlines in the manifest JSON — a cluster deployment
    would store these as Iceberg puffin blobs; past the cap the fpp
    degrades gracefully (pruning keeps more files, never drops a
    match). k=6 is near-optimal across the whole 64..8192 range."""
    m = 64
    while m < 10 * ndv and m < BLOOM_MAX_BITS:
        m *= 2
    return m, 6


def _bloom_positions(value, m: int, k: int) -> list[int]:
    """Double-hashing bit positions for ``value``. Values hash by
    their canonical string form (int 5 and str "5" collide — safe:
    collisions only ADD bits / keep files, the false-positive
    direction). blake2b is keyed by nothing and build+probe are both
    driver-side Python, so no cross-engine hash contract is needed
    (unlike datapipe/bloom.py's xxhash64/md5 family)."""
    d = hashlib.blake2b(str(value).encode("utf-8"),
                        digest_size=16).digest()
    h1 = int.from_bytes(d[:8], "little")
    h2 = int.from_bytes(d[8:], "little") | 1
    return [(h1 + i * h2) % m for i in range(k)]


def _file_bloom(path: str, cols: list[str]) -> dict:
    """Per-file bloom filters over the DISTINCT values of ``cols`` —
    the Iceberg puffin-blob analog for point-lookup file skipping,
    built once at commit time from a column-only read (footer stats
    answer range predicates; blooms answer ``col = v`` inside files
    whose [min, max] straddles v, the interleaved-key case range
    stats cannot touch). A column is recorded only when every value
    is int or str (bool/float/bytes/timestamp excluded: no canonical
    cross-type string form); absent entry == keep on read."""
    try:
        import pyarrow.compute as pc
        import pyarrow.parquet as pq
        pf = pq.ParquetFile(path)
        have = [c for c in cols if c in pf.schema_arrow.names]
        if not have:
            return {}
        tbl = pf.read(columns=have)
    except Exception:
        return {}
    out = {}
    for c in have:
        try:
            vals = [v for v in pc.unique(tbl.column(c)).to_pylist()
                    if v is not None]
        except Exception:
            continue
        if not vals or any(type(v) not in (int, str) for v in vals):
            continue
        m_bits, kh = _bloom_params(len(vals))
        bits = bytearray(m_bits // 8)
        for v in vals:
            for pos in _bloom_positions(v, m_bits, kh):
                bits[pos >> 3] |= 1 << (pos & 7)
        out[c] = {"m": m_bits, "k": kh, "hex": bytes(bits).hex()}
    return out


def _file_blooms_for(dirpath: str, names: list[str],
                     cols: list[str]) -> dict:
    """``{file name: blooms}`` for the named files, dropping files
    that yielded nothing (absent entry == keep on read)."""
    out = {}
    for f in names:
        b = _file_bloom(os.path.join(dirpath, f), cols)
        if b:
            out[f] = b
    return out


def _bloom_probe_value(value):
    """Normalize a point-predicate value for probing, or None when
    the bloom cannot answer it. Integral floats fold to int (probe
    5.0 must hit files holding int 5 — parquet int columns surface
    Python ints at build time); non-integral floats, bools and other
    types skip the probe (file kept, residual filter decides)."""
    if isinstance(value, bool) or type(value) not in (int, str, float):
        return None
    if isinstance(value, float):
        if not value.is_integer():
            return None
        return int(value)
    return value


def _bloom_maybe_contains(entry: dict, value) -> bool:
    bits = bytes.fromhex(entry["hex"])
    return all((bits[p >> 3] >> (p & 7)) & 1
               for p in _bloom_positions(value, entry["m"], entry["k"]))


def with_part_key(df: DataFrame, n_buckets: int,
                  col: str = "conv_id") -> DataFrame:
    """Deterministic partition key: bucket of conv_id (the Iceberg
    ``bucket(N, conv_id)`` transform analog)."""
    return df.withColumn(
        PART_COL, F.pmod(F.xxhash64(col), F.lit(n_buckets)).cast("int"))


def _rank_in_bounds(value, bounds: list[float]):
    """Index of ``value`` in the sorted boundary list = number of
    boundaries <= value — a plan-time-literal binary-search substitute
    (O(len(bounds)) JVM fold per row, zero shuffle, no join). NULL
    ranks 0."""
    arr = F.array(*[F.lit(float(b)) for b in bounds])
    return F.aggregate(
        arr, F.lit(0),
        lambda acc, b: acc + F.when(value >= b, 1).otherwise(0))


def zorder_part_key(df: DataFrame, cols: list[str], n_buckets: int,
                    grid_bits: int = 8,
                    rel_err: float = 0.001,
                    sample_fraction: float | None = None) -> DataFrame:
    """Z-order clustering transform — the Iceberg
    ``sort_order(zorder(a, b))`` / Delta ``OPTIMIZE ZORDER BY``
    analog: assign ``PART_COL`` so each table partition covers one
    contiguous range of the Z-curve (Morton order) over ``cols``.
    Because the Z-curve preserves locality in EVERY dimension, the
    per-partition min/max recorded by ``write(stat_cols=cols)`` is
    tight for ALL the clustered columns at once, and ``read_where``
    can prune on any of them — a linear sort gives that for only its
    leading column.

    Scale shape: two single-pass mergeable quantile sketches
    (``approxQuantile`` — one multi-column call for the per-dimension
    grids, one for the Z-key split points) and otherwise pure narrow
    JVM expressions; the grid/split boundaries travel as plan-time
    literals (2^grid_bits + n_buckets doubles — KBs), so there is no
    extra shuffle and no join. Quantile-based grids (not
    uniform-width) keep the curve balanced under skew; quantile-based
    Z splits give near-equal partition row counts, so no straggler
    partitions at commit time.

    ``sample_fraction`` estimates BOTH boundary sets from a seeded
    sample instead of full scans — the Delta OPTIMIZE-style move when
    the input is 100 TB: boundary quality degrades only as
    O(1/sqrt(sample rows)) while the estimation passes shrink by the
    fraction, and the per-row assignment (the only full-data work)
    stays identical. Default None keeps the exact, bit-deterministic
    path; sampled boundaries are deterministic for a fixed input
    layout (fixed seed), which is looser than content-determinism —
    use the exact path when resume identity across relayouts matters.
    """
    if len(cols) < 2:
        raise ValueError("zorder needs >= 2 columns")
    if grid_bits * len(cols) > 62:
        raise ValueError("grid_bits * len(cols) must fit a long")
    est = (df.sample(fraction=sample_fraction, seed=42)
           if sample_fraction else df)
    n_grid = 1 << grid_bits
    probs = [i / n_grid for i in range(1, n_grid)]
    qs = est.stat.approxQuantile(cols, probs, rel_err)
    z = F.lit(0).cast("long")
    for j, (c, bounds) in enumerate(zip(cols, qs)):
        coord = _rank_in_bounds(
            F.col(c).cast("double"),
            sorted(set(bounds))).cast("long")
        for i in range(grid_bits):
            z = z.bitwiseOR(F.shiftleft(
                F.shiftright(coord, i).bitwiseAND(F.lit(1)),
                i * len(cols) + j))
    zprobs = [i / n_buckets for i in range(1, n_buckets)]
    zbounds = (est.withColumn("_zkey", z)
               .stat.approxQuantile("_zkey", zprobs, rel_err))
    return df.withColumn(
        PART_COL,
        _rank_in_bounds(z.cast("double"),
                        sorted(set(zbounds))).cast("int"))


class IcebergLike:
    def __init__(self, root: str):
        self.root = root
        self.data_dir = os.path.join(root, "data")
        self.manifest_dir = os.path.join(root, "_manifests")
        self.staging_dir = os.path.join(root, "_staging")
        self.delete_dir = os.path.join(root, "_deletes")
        self.spec_path = os.path.join(root, "spec.json")
        for d in (self.data_dir, self.manifest_dir, self.staging_dir,
                  self.delete_dir):
            os.makedirs(d, exist_ok=True)
        self._branch_writer: str | None = None
        self._recover_compaction()
        self._recover_appends()

    def _recover_compaction(self) -> None:
        """Repair a compaction killed between its two renames.

        ``compact`` swaps a partition dir via rename(dst -> dst.old-*)
        then rename(staged -> dst); a kill between them leaves the
        partition present only as ``.old``. Opening the table restores
        it (the compaction is simply redone later — idempotent). A
        leftover ``.old`` WITH a live dst means the kill happened
        after the swap completed: the old files are garbage, drop
        them. Runs before any read so the ``part_key=*`` glob never
        sees ``.old`` dirs."""
        for d in os.listdir(self.data_dir):
            if ".old-" not in d:
                continue
            src = os.path.join(self.data_dir, d)
            dst = os.path.join(self.data_dir, d.split(".old-", 1)[0])
            if os.path.exists(dst):
                shutil.rmtree(src)
            else:
                os.rename(src, dst)

    # -- manifest bookkeeping ------------------------------------------------

    def committed_keys(self) -> set[int]:
        out = set()
        for f in os.listdir(self.manifest_dir):
            if f.startswith("part-") and f.endswith(".json"):
                out.add(int(f[5:-5]))
        return out

    def manifest(self, part_key: int) -> dict | None:
        p = os.path.join(self.manifest_dir, f"part-{part_key:05d}.json")
        if not os.path.exists(p):
            return None
        with open(p) as fh:
            return json.load(fh)

    def snapshots(self) -> list[dict]:
        out = []
        for f in sorted(os.listdir(self.manifest_dir)):
            if f.startswith("snapshot-"):
                with open(os.path.join(self.manifest_dir, f)) as fh:
                    out.append(json.load(fh))
        return out

    def _write_json_atomic(self, path: str, obj: dict) -> None:
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(obj, fh, indent=1, sort_keys=True, default=str)
        os.replace(tmp, path)  # atomic on POSIX

    # -- commit protocol -----------------------------------------------------

    def _next_snapshot_id(self) -> int:
        return (max((s.get("snapshot_id", -1) for s in self.snapshots()),
                    default=-1) + 1)

    def _publish_snapshot(self, snap: dict, rebase=None) -> dict:
        """Publish a snapshot with optimistic concurrency — the
        Iceberg commit protocol: create-if-absent (``os.link`` is an
        atomic fail-if-exists on POSIX; ``os.replace`` would silently
        overwrite a concurrent winner's snapshot), and on conflict
        re-derive the next id, let ``rebase(snap, new_id)`` rewrite
        whatever embeds the old id (partition manifests' sequence
        numbers, a delete file's name), and retry. Two writers racing
        the same table thus both land, serialized, under distinct
        snapshot ids — no metadata is lost."""
        while True:
            sid = snap["snapshot_id"]
            path = os.path.join(self.manifest_dir,
                                f"snapshot-{sid:05d}.json")
            tmp = f"{path}.tmp-{os.getpid()}-{threading.get_ident()}"
            with open(tmp, "w") as fh:
                json.dump(snap, fh, indent=1, sort_keys=True,
                          default=str)
            try:
                os.link(tmp, path)
            except FileExistsError:
                os.remove(tmp)
                new_id = self._next_snapshot_id()
                if rebase is not None:
                    snap = rebase(snap, new_id)
                else:
                    snap = {**snap, "snapshot_id": new_id}
                continue
            os.remove(tmp)
            return snap

    def partition_spec(self):
        """The table's hidden-partitioning spec (list of
        PartitionField) or None for ad-hoc PART_COL layouts."""
        if not os.path.exists(self.spec_path):
            return None
        from .partition_spec import spec_from_json
        with open(self.spec_path) as f:
            return spec_from_json(json.load(f))

    def _bind_spec(self, df: DataFrame, spec) -> DataFrame:
        """Resolve + persist the hidden-partitioning spec and key the
        DataFrame with it. First spec-keyed write pins the spec;
        later writes must pass an identical spec (partition-spec
        EVOLUTION is intentionally unsupported here — Iceberg handles
        it by tracking a spec_id per data file; this layer derives
        key arithmetic from one table-wide spec, so a silent spec
        change would make old keys prune wrongly. Evolving = new
        table + backfill)."""
        from .partition_spec import spec_part_key, spec_to_json
        df, resolved = spec_part_key(df, spec)
        new_json = spec_to_json(resolved)
        prior = self.partition_spec()
        if prior is None:
            self._write_json_atomic(self.spec_path, new_json)
        elif spec_to_json(prior) != new_json:
            raise ValueError(
                f"partition spec mismatch: table has"
                f" {spec_to_json(prior)}, write passed {new_json}")
        return df

    def write(self, df: DataFrame, metrics_fn=None, run_id: str | None = None,
              input_fingerprint: str = "", fail_after: int | None = None,
              rebalance: bool = True,
              stat_cols: list[str] | None = None,
              bloom_cols: list[str] | None = None,
              append: bool = False,
              snapshot_extra: dict | None = None,
              partition_spec=None) -> dict:
        """Commit all not-yet-committed partitions of ``df`` (must
        carry PART_COL).

        One Spark job writes every pending partition to staging
        (partitionBy), then each partition is promoted by an atomic
        directory rename followed by its manifest write — a kill
        between promotions loses nothing: committed partitions stay,
        staging is recomputed idempotently on the next run, and
        already-committed partitions are filtered out BEFORE the job
        (the resume anti-join). ``fail_after`` injects a crash after
        N promotions (used by the kill/resume test).

        ``rebalance`` inserts an AQE REBALANCE(part_key) exchange
        before the partitionBy write. Without it every upstream task
        writes one file into every bucket it touches — tasks x buckets
        files, which anti-scales with parallelism (measured: the
        commit phase lost ~0.2 efficiency 4->32 cores from file-open
        overhead alone) and explodes at cluster scale (10^4 tasks x
        10^5 buckets). With it, each output task holds whole buckets
        (file count ~= bucket count, independent of parallelism) and
        AQE splits oversized buckets so a hot bucket doesn't become a
        straggler.

        ``stat_cols`` names columns whose per-partition min/max go
        into the manifests (the Iceberg data-file stats analog) for
        ``read_where`` scan pruning — computed in the SAME staged
        read as the row metrics, so stats cost no extra pass.

        ``bloom_cols`` names int/str columns that additionally get a
        per-FILE bloom filter over their distinct values (the Iceberg
        puffin-blob analog, inlined in the manifest capped at 1 KiB
        per file-column): ``read_where`` point predicates (lo == hi)
        then skip files whose bloom definitely excludes the value —
        the interleaved-key case where every file's [min, max]
        straddles the probe and range stats keep everything.

        ``partition_spec`` keys the DataFrame via hidden-partitioning
        transforms (partition_spec.py: days/hours/months/truncate +
        xxhash64 buckets) and pins the spec in the table's spec.json;
        ``read_where`` then prunes partitions for predicates on the
        spec's SOURCE columns by key arithmetic alone — planning-time
        skipping with no column stats collected.

        ``append=True`` adds rows to partitions that ALREADY exist
        (the Iceberg append-files-to-partition mode; the default
        keeps the resume contract where an existing partition means
        "this input is already committed" and is skipped). Appended
        files land under collision-free ``s{snap}-`` names and carry
        their OWN sequence number in the manifest's ``file_seq`` map
        — per-FILE sequencing, exactly Iceberg's model — so equality
        deletes scope correctly inside a mixed-age partition. A kill
        mid-append leaves only unmanifested ``s*-`` files — invisible
        to reads (file lists resolve from manifests) and reclaimed by
        the age-gated ``_recover_appends`` sweep or an explicit
        ``recover_orphans()`` (manifested appends are durable; the
        crashed run re-stages idempotently).
        """
        if partition_spec is not None:
            df = self._bind_spec(df, partition_spec)
        # diverged-main guard: while a branch is ahead of the pinned
        # main, a plain commit would land files sequenced INTO the
        # branch's lineage (the linear store has one sequence) —
        # refuse instead of silently merging histories.
        if self._branch_writer is None:
            pin = self._main_pin()
            if pin is not None:
                snaps = self.snapshots()
                latest = snaps[-1]["snapshot_id"] if snaps else None
                if latest is not None and latest > pin:
                    raise ValueError(
                        f"main is pinned at {pin} behind branch"
                        f" commits (latest {latest}); fast_forward"
                        " or drop the branch before writing main")
        committed = self.committed_keys()
        run_id = run_id or f"run-{int(time.time() * 1000)}"
        if append:
            # replay idempotence: a crashed earlier attempt of THIS
            # run_id may have manifested appends whose snapshot never
            # published — strip them so the rerun lands exactly once.
            # (Callers must not share a run_id across LIVE runs.)
            self._strip_run_appends(run_id)
        # the snapshot id this commit WILL append — computed up front
        # so partition manifests can record it (data_snapshot_id: the
        # Iceberg data-sequence-number analog that scopes equality
        # deletes to data committed at-or-before them). A crashed run
        # re-derives the same id (no snapshot file was appended).
        snap_id = self._next_snapshot_id()
        # sweep staging left by DEAD runs only (their committed
        # partitions are already promoted; staging is recomputed
        # idempotently). Age-gated: a concurrent LIVE writer's
        # in-progress staging dir must never be swept — removing it
        # mid-commit would fail its staged read or promote renames,
        # leaving partitions manifested without a snapshot. A crashed
        # run younger than the threshold merely keeps its disk a bit
        # longer; rerunning the same run_id overwrites it regardless.
        now = time.time()
        for stale in os.listdir(self.staging_dir):
            p = os.path.join(self.staging_dir, stale)
            try:
                if now - os.path.getmtime(p) < STAGING_SWEEP_MIN_AGE_SEC:
                    continue
            except OSError:
                continue  # vanished: another sweeper got it
            shutil.rmtree(p, ignore_errors=True)
        pending_df = df
        if committed and not append:
            pending_df = df.filter(
                ~F.col(PART_COL).isin([int(k) for k in committed]))
        if rebalance:
            pending_df = pending_df.hint("rebalance", F.col(PART_COL))
        staging = os.path.join(self.staging_dir, run_id)
        t_stage0 = time.time()
        (pending_df.write.mode("overwrite")
         .partitionBy(PART_COL).parquet(staging))
        t_stage = time.time() - t_stage0

        spark = df.sparkSession
        staged_keys = sorted(
            int(d.split("=", 1)[1]) for d in os.listdir(staging)
            if d.startswith(f"{PART_COL}="))
        metrics_by_key: dict[int, dict] = {}
        stats_by_key: dict[int, dict] = {}
        t_metrics0 = time.time()
        if staged_keys:
            staged = spark.read.parquet(staging)
            if metrics_fn is not None:
                metrics_by_key = metrics_fn(staged)
            else:
                rows = (staged.groupBy(PART_COL).count().collect())
                metrics_by_key = {r[PART_COL]: {"rows": r["count"]}
                                  for r in rows}
            if stat_cols:
                aggs = []
                for c in stat_cols:
                    aggs += [F.min(c).alias(f"_mn_{c}"),
                             F.max(c).alias(f"_mx_{c}")]
                for r in staged.groupBy(PART_COL).agg(*aggs).collect():
                    stats_by_key[r[PART_COL]] = {
                        c: {"min": r[f"_mn_{c}"], "max": r[f"_mx_{c}"]}
                        for c in stat_cols}
        t_metrics = time.time() - t_metrics0

        t_promote0 = time.time()

        def _promote(k: int) -> int:
            """Promote one staged partition: atomic dir rename + its
            manifest. Partitions are independent, so promotes run in a
            thread pool (renames + small JSON writes release the GIL);
            a kill mid-pool loses nothing — each finished promote is
            already durable, unfinished ones are recomputed from the
            idempotent staging on the next run."""
            src = os.path.join(staging, f"{PART_COL}={k}")
            dst = os.path.join(self.data_dir, f"{PART_COL}={k}")
            prior = self.manifest(k) if append else None
            if prior is not None and os.path.exists(dst):
                return self._append_into(k, src, dst, prior, run_id,
                                         snap_id,
                                         metrics_by_key.get(k, {}),
                                         stats_by_key.get(k),
                                         stat_cols, bloom_cols)
            if os.path.exists(dst):
                shutil.rmtree(dst)  # stale partial from a dead run
            os.rename(src, dst)  # atomic promote
            files = sorted(f for f in os.listdir(dst)
                           if f.endswith(".parquet"))
            m = {
                "part_key": k,
                "run_id": run_id,
                "data_snapshot_id": snap_id,
                "committed_at": time.time(),
                "input_fingerprint": input_fingerprint,
                "files": files,
                "file_seq": {f: snap_id for f in files},
                "metrics": metrics_by_key.get(k, {}),
                **({"col_stats": stats_by_key[k]}
                   if k in stats_by_key else {}),
            }
            if stat_cols:
                fs = _file_stats_for(dst, files, stat_cols)
                if fs:
                    m["file_stats"] = fs
            if bloom_cols:
                fb = _file_blooms_for(dst, files, bloom_cols)
                if fb:
                    m["file_blooms"] = fb
            self._write_json_atomic(
                os.path.join(self.manifest_dir, f"part-{k:05d}.json"), m)
            return k

        if fail_after is not None:
            # crash-injection path (kill/resume tests): deterministic
            # sequential order so "fail after N commits" is exact
            promoted = []
            for i, k in enumerate(staged_keys):
                if i >= fail_after:
                    raise RuntimeError(
                        f"injected failure after {fail_after} commits")
                promoted.append(_promote(k))
        else:
            with ThreadPoolExecutor(max_workers=PROMOTE_THREADS) as pool:
                promoted = sorted(pool.map(_promote, staged_keys))

        shutil.rmtree(staging, ignore_errors=True)
        snapshot = {
            "snapshot_id": snap_id,
            "run_id": run_id,
            **(snapshot_extra if snapshot_extra is not None
               else ({"op": "append"} if append else {})),
            "committed_keys": sorted(self.committed_keys()),
            "newly_committed": promoted,
            "skipped_already_committed":
                [] if append else sorted(committed),
            # table schema at commit time: snapshot reads use it
            # explicitly (no footer sampling, stable across schema
            # evolution of older partitions)
            "schema_json": df.schema.json(),
            "phase_sec": {"stage_write": round(t_stage, 2),
                          "metrics": round(t_metrics, 2),
                          "promote": round(time.time() - t_promote0, 2)},
        }
        def _rebase(snap: dict, new_id: int) -> dict:
            """A concurrent writer won our snapshot id. Serialize
            after it: refuse if it committed any of OUR partitions
            (same-partition racers interleave promotes — the Iceberg
            ValidationException case; disjoint-partition concurrent
            ingest, the case that matters at scale, is safe because
            every per-partition artifact is its own file), then
            renumber the sequence fields our manifests recorded under
            the lost id and retry under the new one."""
            old = snap["snapshot_id"]
            mine = set(snap["newly_committed"])
            for s in self.snapshots():
                if s["snapshot_id"] < old or s.get("run_id") == run_id:
                    continue
                theirs = set(s.get("newly_committed") or [])
                if mine & theirs:
                    raise CommitConflictError(
                        f"partitions {sorted(mine & theirs)} were"
                        f" committed concurrently by run"
                        f" {s.get('run_id')} (snapshot"
                        f" {s['snapshot_id']}); rerun this write")
            for k in sorted(mine):
                m = self.manifest(k)
                if m is None:
                    continue
                if m.get("data_snapshot_id") == old:
                    m["data_snapshot_id"] = new_id
                fseq = m.get("file_seq") or {}
                m["file_seq"] = {f: (new_id if int(s_) == old else s_)
                                 for f, s_ in fseq.items()}
                for a in m.get("appends", []):
                    if a.get("snapshot_id") == old:
                        a["snapshot_id"] = new_id
                self._write_json_atomic(
                    os.path.join(self.manifest_dir,
                                 f"part-{k:05d}.json"), m)
            return {**snap, "snapshot_id": new_id,
                    "committed_keys": sorted(self.committed_keys()),
                    "rebased_from": old}

        return self._publish_snapshot(snapshot, rebase=_rebase)

    def _append_into(self, k: int, src: str, dst: str, prior: dict,
                     run_id: str, snap_id: int, metrics: dict,
                     stats: dict | None,
                     stat_cols: list[str] | None = None,
                     bloom_cols: list[str] | None = None) -> int:
        """Append staged files into an EXISTING partition dir under
        collision-free ``s{snap}-`` names, then merge the manifest:
        files + per-file sequence numbers, summed row metric, min/max-
        merged column stats. The manifest write is the commit point —
        files moved before a crash are unmanifested ``s*-`` orphans,
        invisible to reads and reclaimed by the age-gated
        ``_recover_appends`` sweep / explicit ``recover_orphans``."""
        staged = sorted(f for f in os.listdir(src)
                        if f.endswith(".parquet"))
        new_names = []
        for i, f in enumerate(staged):
            name = f"s{snap_id:05d}-{i:04d}-{f[-24:]}"
            os.rename(os.path.join(src, f), os.path.join(dst, name))
            new_names.append(name)
        m = dict(prior)
        files = sorted(set(m.get("files", [])) | set(new_names))
        fseq = dict(m.get("file_seq") or
                    {f: m.get("data_snapshot_id", 0)
                     for f in m.get("files", [])})
        fseq.update({f: snap_id for f in new_names})
        m.update({"files": files, "file_seq": fseq})
        old_rows = (m.get("metrics") or {}).get("rows")
        new_rows = metrics.get("rows")
        if isinstance(old_rows, int) and isinstance(new_rows, int):
            m["metrics"] = {**m["metrics"], "rows": old_rows + new_rows}
        # Column-stats merge must uphold read_where's invariant that
        # a recorded [min, max] bounds EVERY non-null value in the
        # partition. A column tracked on only one side (an append
        # without stat_cols over a stats-carrying base, or vice
        # versa) has no range for the untracked side's rows — keeping
        # the one-sided range would let pruning silently drop the
        # other side's rows. Drop that column's entry instead:
        # read_where treats missing stats as "keep the partition".
        prior_stats = dict(m.get("col_stats") or {})
        merged = {}
        for c in set(prior_stats) | set(stats or {}):
            old, new = prior_stats.get(c), (stats or {}).get(c)
            if old is None or new is None:
                continue  # one-sided: no valid combined range
            if old.get("min") is None:
                merged[c] = new  # prior rows all-null in c
            elif new["min"] is None:
                merged[c] = old  # appended rows all-null in c
            else:
                merged[c] = {"min": min(old["min"], new["min"]),
                             "max": max(old["max"], new["max"])}
        if merged:
            m["col_stats"] = merged
        else:
            m.pop("col_stats", None)
        # Per-FILE stats need no merge law at all: each appended file
        # gets its own immutable footer bounds. An append without
        # stat_cols still records stats for the columns earlier
        # commits tracked, so a stats-carrying base stays file-
        # prunable after upsert/CDC appends (whose stat_cols defaults
        # to None) — the file-level fix for exactly the widening that
        # forces the partition-level entry above to drop columns.
        prior_fs = dict(m.get("file_stats") or {})
        fcols = list(stat_cols or []) or sorted(
            {c for v in prior_fs.values() for c in v})
        if fcols:
            prior_fs.update(_file_stats_for(dst, new_names, fcols))
        if prior_fs:
            m["file_stats"] = prior_fs
        # Blooms inherit the same way (immutable per-file artifacts,
        # tracked columns carried forward when the append names none)
        prior_fb = dict(m.get("file_blooms") or {})
        bcols = list(bloom_cols or []) or sorted(
            {c for v in prior_fb.values() for c in v})
        if bcols:
            prior_fb.update(_file_blooms_for(dst, new_names, bcols))
        if prior_fb:
            m["file_blooms"] = prior_fb
        m.setdefault("appends", []).append(
            {"run_id": run_id, "snapshot_id": snap_id,
             "files": new_names,
             # per-append row count: lets _strip_run_appends subtract
             # exactly when undoing a crashed attempt's manifests
             **({"rows": new_rows} if isinstance(new_rows, int)
                else {})})
        self._write_json_atomic(
            os.path.join(self.manifest_dir, f"part-{k:05d}.json"), m)
        return k

    @staticmethod
    def _refresh_file_stats(m: dict, dirpath: str,
                            files: list[str]) -> None:
        """After a physical REWRITE (compact / materialize_deletes)
        the old per-file bounds name files that no longer exist —
        recompute from the new files' footers over the columns the
        manifest tracked (file_stats' union, falling back to
        col_stats' keys), or drop the entry when nothing is
        recoverable (absent == pruning keeps everything). Per-file
        blooms are rebuilt the same way over THEIR tracked columns
        (no col_stats fallback: blooms exist only where a write asked
        for them)."""
        cols = sorted({c for v in (m.get("file_stats") or {}).values()
                       for c in v}
                      or (m.get("col_stats") or {}).keys())
        m.pop("file_stats", None)
        if cols:
            fs = _file_stats_for(dirpath, files, cols)
            if fs:
                m["file_stats"] = fs
        bcols = sorted({c for v in (m.get("file_blooms") or {}).values()
                        for c in v})
        m.pop("file_blooms", None)
        if bcols:
            fb = _file_blooms_for(dirpath, files, bcols)
            if fb:
                m["file_blooms"] = fb

    def _recover_appends(
            self,
            min_age_sec: float = ORPHAN_SWEEP_MIN_AGE_SEC) -> None:
        """Remove ``s*-`` append files not listed in their partition
        manifest (a crashed append's partial moves; completed appends
        are manifested atomically). Base-write files never carry the
        prefix, so they are never candidates.

        Age-gated: a CONCURRENT appender sits in exactly the window
        between os.rename of its files and its manifest write, so an
        un-gated sweep on every table open would delete a live run's
        files and let it commit a manifest listing nonexistent files
        (silent row loss). The cost of the gate: until the sweep, a
        crashed append's files stay visible to the directory-glob
        scan paths — the same read-uncommitted window that exists
        WHILE any append is in flight (a glob scan cannot tell the
        two apart; manifest-scoped reads like ``read_incremental``
        are unaffected). A recovery procedure that knows no appender
        is live calls ``recover_orphans()`` before serving reads."""
        for k in self.committed_keys():
            d = os.path.join(self.data_dir, f"{PART_COL}={k}")
            if not os.path.isdir(d):
                continue
            cands = [f for f in os.listdir(d)
                     if f.endswith(".parquet") and f.startswith("s")
                     and "-" in f and f.split("-", 1)[0][1:].isdigit()]
            if not cands:
                continue  # manifest JSON read only when needed: the
                # sweep must stay cheap at 10^5 partitions per open
            listed = set((self.manifest(k) or {}).get("files", []))
            now = time.time()
            for f in cands:
                if f in listed:
                    continue
                p = os.path.join(d, f)
                try:
                    if now - os.path.getmtime(p) < min_age_sec:
                        continue  # possibly a live appender mid-move
                    os.remove(p)
                except OSError:
                    pass  # vanished: its appender manifested or a
                    # concurrent sweeper removed it

    def recover_orphans(self, min_age_sec: float = 0.0) -> None:
        """Explicit maintenance sweep (the Iceberg
        ``remove_orphan_files`` analog): remove crashed-append
        orphans immediately, regardless of age. Run this only when no
        appender is live against the table."""
        self._recover_appends(min_age_sec=min_age_sec)

    def _strip_run_appends(self, run_id: str) -> list[int]:
        """Undo manifested appends left by a CRASHED earlier attempt
        of ``run_id`` — entries whose snapshot id was never published
        (a kill between the per-partition manifest writes and the
        snapshot CAS). The rerun then lands exactly once instead of
        doubling rows in the partitions the first attempt reached.
        Row metrics are subtracted from the per-append counts;
        column stats are left as-is (possibly wider than the data —
        safe: wide stats only keep extra partitions in read_where,
        they never wrongly prune). Published appends with the same
        run_id are NEVER touched."""
        published = {s["snapshot_id"] for s in self.snapshots()}
        stripped = []
        for k in self.committed_keys():
            m = self.manifest(k) or {}
            appends = m.get("appends") or []
            dead = [a for a in appends
                    if a.get("run_id") == run_id
                    and a.get("snapshot_id") not in published]
            if not dead:
                continue
            drop = {f for a in dead for f in a.get("files", [])}
            d = os.path.join(self.data_dir, f"{PART_COL}={k}")
            for f in sorted(drop):
                try:
                    os.remove(os.path.join(d, f))
                except OSError:
                    pass  # already gone (orphan sweep got it)
            m["files"] = [f for f in m.get("files", [])
                          if f not in drop]
            m["file_seq"] = {f: s_ for f, s_ in
                             (m.get("file_seq") or {}).items()
                             if f not in drop}
            for fk in ("file_stats", "file_blooms"):
                if m.get(fk):
                    m[fk] = {f: s_ for f, s_ in m[fk].items()
                             if f not in drop}
                    if not m[fk]:
                        m.pop(fk)
            m["appends"] = [a for a in appends if a not in dead]
            rows = (m.get("metrics") or {}).get("rows")
            dead_rows = [a.get("rows") for a in dead]
            if isinstance(rows, int) and all(
                    isinstance(r, int) for r in dead_rows):
                m["metrics"] = {**m["metrics"],
                                "rows": rows - sum(dead_rows)}
            elif isinstance(rows, int):
                m["metrics"] = {c: v for c, v in m["metrics"].items()
                                if c != "rows"}  # unknown: drop
            self._write_json_atomic(
                os.path.join(self.manifest_dir, f"part-{k:05d}.json"),
                m)
            stripped.append(k)
        return stripped

    def merge(self, df: DataFrame, eq_cols: list[str],
              run_id: str | None = None,
              stat_cols: list[str] | None = None,
              fail_after: int | None = None) -> dict:
        """Atomic MERGE — the Iceberg single-commit MERGE analog: ONE
        snapshot carries BOTH an equality-delete file over ``df``'s
        key tuples AND ``df``'s appended data files. The delete and
        the new files share the snapshot's sequence number, and
        equality deletes apply only to STRICTLY older files
        (``_del_cond``), so the new rows survive their own tombstones
        while every matched pre-existing row is replaced; unmatched
        keys are plain inserts; untouched rows are untouched.
        Merge-on-read: no data partition is rewritten.

        Visibility: readers switch from old to new rows atomically at
        the snapshot publish — there is NO state where matched keys
        are absent (the gap the old two-commit upsert had). Before
        the publish, appended files are already manifested, so a
        concurrent glob-scan reader can briefly see new rows
        ALONGSIDE the old — the same read-uncommitted window any
        in-flight append has (manifest-scoped reads are unaffected).

        Crash/replay: a rerun with the SAME run_id first strips the
        crashed attempt's unpublished appends (exactly-once per
        run_id), and a foreachBatch REdelivery after a successful
        publish also converges — the replay's delete outsequences and
        tombstones the earlier copy's rows before re-appending.
        ``fail_after`` injects a crash after N partition promotes
        (before the snapshot publish), for the kill/replay tests."""
        run_id = run_id or f"merge-{int(time.time() * 1000)}"
        # sweep delete files left by crashed attempts of THIS run_id
        # (never referenced by a published snapshot — pure dead weight)
        referenced = {s.get("delete_file") for s in self.snapshots()}
        prefix = f"delete-merge-{_safe_name(run_id)}-"
        for f in os.listdir(self.delete_dir):
            if f.startswith(prefix) and f not in referenced:
                shutil.rmtree(os.path.join(self.delete_dir, f),
                              ignore_errors=True)
        # run-unique name, written once, never renamed or overwritten
        # (a published snapshot may reference it — delete_rows's rule)
        name = f"{prefix}{uuid.uuid4().hex[:8]}.parquet"
        path = os.path.join(self.delete_dir, name)
        tuples = df.select(*eq_cols).distinct()
        tuples.coalesce(1).write.mode("overwrite").parquet(path)
        n = df.sparkSession.read.parquet(path).count()
        return self.write(
            df, run_id=run_id, append=True, stat_cols=stat_cols,
            fail_after=fail_after,
            snapshot_extra={"op": "merge", "eq_cols": list(eq_cols),
                            "delete_file": name,
                            "n_delete_tuples": int(n)})

    def upsert(self, df: DataFrame, eq_cols: list[str],
               run_id: str | None = None,
               stat_cols: list[str] | None = None) -> dict:
        """Upsert = atomic single-snapshot ``merge`` (see there).
        Kept as the CDC-facing name; returns the merge snapshot."""
        return self.merge(df, eq_cols, run_id=run_id,
                          stat_cols=stat_cols)

    # -- tags (named snapshots) ------------------------------------------------

    def tag(self, name: str, snapshot_id: int | None = None) -> dict:
        """Name a snapshot (the Iceberg tag analog — 'the corpus we
        trained run X on'). Defaults to the newest snapshot. Tagged
        snapshots survive ``expire_snapshots``, so a tag is the
        durable handle for reproducing a historical read."""
        if not re.fullmatch(r"[A-Za-z0-9._-]{1,128}", name):
            raise ValueError(f"bad tag name: {name!r}")
        snaps = self.snapshots()
        if snapshot_id is None:
            if not snaps:
                raise ValueError("no snapshots to tag")
            snapshot_id = snaps[-1]["snapshot_id"]
        elif not any(s["snapshot_id"] == snapshot_id for s in snaps):
            raise ValueError(f"no snapshot {snapshot_id} to tag")
        obj = {"name": name, "snapshot_id": snapshot_id,
               "created_at": time.time()}
        self._write_json_atomic(
            os.path.join(self.manifest_dir, f"tag-{name}.json"), obj)
        return obj

    def tags(self) -> dict[str, int]:
        out = {}
        for f in sorted(os.listdir(self.manifest_dir)):
            if f.startswith("tag-") and f.endswith(".json"):
                with open(os.path.join(self.manifest_dir, f)) as fh:
                    o = json.load(fh)
                out[o["name"]] = o["snapshot_id"]
        return out

    def drop_tag(self, name: str) -> None:
        p = os.path.join(self.manifest_dir, f"tag-{name}.json")
        if os.path.exists(p):
            os.remove(p)

    def _resolve_tag(self, tag: str) -> int:
        t = self.tags()
        if tag not in t:
            raise ValueError(f"no tag {tag!r}; have {sorted(t)}")
        return t[tag]

    # -- branches (mutable named refs) -----------------------------------------

    # A branch is a MUTABLE ref -> snapshot id (Iceberg branch
    # analog); a tag is the immutable flavor. The storage layer keeps
    # ONE linear snapshot sequence, and snapshot reads scope by
    # per-file sequence number, so pinning "main" at a snapshot and
    # committing further appends under a branch gives real isolation
    # with zero new read machinery: main readers filter out the
    # branch's later-sequenced files exactly like any time-travel
    # read. The supported shape is the write-audit-publish / staging
    # pattern — ONE divergent branch ahead of main at a time (the
    # linear store cannot represent two divergent heads); creating a
    # second concurrent branch or plain-writing while diverged raises
    # instead of corrupting either lineage.

    def create_branch(self, name: str,
                      snapshot_id: int | None = None) -> dict:
        """Create branch ``name`` at ``snapshot_id`` (default: the
        current main state). ``write_to_branch`` then advances it
        without moving main; ``fast_forward`` publishes it."""
        if not re.fullmatch(r"[A-Za-z0-9._-]{1,128}", name):
            raise ValueError(f"bad branch name: {name!r}")
        if name == "main":
            raise ValueError("'main' is the implicit trunk ref")
        if self.branches():
            raise ValueError(
                f"a branch already exists ({sorted(self.branches())});"
                " the linear store supports one divergent branch —"
                " fast_forward or drop it first")
        snaps = self.snapshots()
        if snapshot_id is None:
            snapshot_id = self._main_head()
            if snapshot_id is None:
                raise ValueError("no snapshots to branch from")
        elif not any(s["snapshot_id"] == snapshot_id for s in snaps):
            raise ValueError(f"no snapshot {snapshot_id} to branch")
        obj = {"name": name, "snapshot_id": snapshot_id,
               "created_at": time.time()}
        self._write_json_atomic(
            os.path.join(self.manifest_dir, f"branch-{name}.json"), obj)
        return obj

    def branches(self) -> dict[str, int]:
        out = {}
        for f in sorted(os.listdir(self.manifest_dir)):
            if f.startswith("branch-") and f.endswith(".json"):
                with open(os.path.join(self.manifest_dir, f)) as fh:
                    o = json.load(fh)
                if o["name"] != "main":
                    out[o["name"]] = o["snapshot_id"]
        return out

    def _main_pin(self) -> int | None:
        p = os.path.join(self.manifest_dir, "branch-main.json")
        if not os.path.exists(p):
            return None
        with open(p) as fh:
            return json.load(fh)["snapshot_id"]

    def _main_head(self) -> int | None:
        """Current MAIN state: the pin while diverged, else the
        newest snapshot (back-compat: no-branch tables never pin)."""
        pin = self._main_pin()
        if pin is not None:
            return pin
        snaps = self.snapshots()
        return snaps[-1]["snapshot_id"] if snaps else None

    def _resolve_branch(self, name: str) -> int:
        if name == "main":
            head = self._main_head()
            if head is None:
                raise ValueError("empty table has no main state")
            return head
        b = self.branches()
        if name not in b:
            raise ValueError(f"no branch {name!r}; have {sorted(b)}")
        return b[name]

    def write_to_branch(self, name: str, df: DataFrame,
                        **write_kwargs) -> dict:
        """Append-commit ``df`` under branch ``name``: main readers
        keep seeing the pre-branch state (pinned on first divergence),
        branch readers (``read(branch=name)``) see the appends. Only
        the tip branch is writable (linear store)."""
        head = self._resolve_branch(name)
        snaps = self.snapshots()
        latest = snaps[-1]["snapshot_id"] if snaps else None
        if head != latest:
            raise ValueError(
                f"branch {name!r} head {head} is not the newest"
                f" snapshot {latest}; only the tip branch is writable")
        if self._main_pin() is None:
            # first divergent commit: freeze main where it is
            self._write_json_atomic(
                os.path.join(self.manifest_dir, "branch-main.json"),
                {"name": "main", "snapshot_id": head,
                 "created_at": time.time()})
        if write_kwargs.pop("append", True) is not True:
            raise ValueError("branch commits are append-mode")
        self._branch_writer = name
        try:
            snap = self.write(
                df, append=True,
                snapshot_extra={
                    **(write_kwargs.pop("snapshot_extra", None) or {}),
                    "branch": name},
                **write_kwargs)
        finally:
            self._branch_writer = None
        self._write_json_atomic(
            os.path.join(self.manifest_dir, f"branch-{name}.json"),
            {"name": name, "snapshot_id": snap["snapshot_id"],
             "created_at": time.time()})
        return snap

    def fast_forward(self, name: str, drop: bool = True) -> dict:
        """Publish branch ``name``: move main to the branch head (the
        Iceberg ``fast_forward('main', branch)`` analog — the publish
        half of write-audit-publish). With ``drop`` the branch ref is
        removed; the pin is removed too when main lands back on the
        newest snapshot, restoring the zero-join plain-read path."""
        head = self._resolve_branch(name)
        main = self._main_head()
        if main is not None and main > head:
            raise ValueError(
                f"main at {main} is ahead of branch {name!r} at"
                f" {head}: not a fast-forward")
        snaps = self.snapshots()
        latest = snaps[-1]["snapshot_id"] if snaps else None
        main_path = os.path.join(self.manifest_dir, "branch-main.json")
        if head == latest and os.path.exists(main_path):
            os.remove(main_path)  # main floats with latest again
        elif head != latest:
            self._write_json_atomic(
                main_path, {"name": "main", "snapshot_id": head,
                            "created_at": time.time()})
        if drop and name != "main":
            self.drop_branch(name)
        return {"main": head, "from_branch": name}

    def drop_branch(self, name: str,
                    spark: SparkSession | None = None) -> None:
        """Remove branch ``name``'s ref. With ``spark``, ABANDON the
        branch physically: roll back to main's pin so the branch's
        unpublished commits (and the pin) are gone — the reject half
        of write-audit-publish. Without it, only the ref is dropped
        (the pin stays, so main reads stay correct; the orphaned
        commits remain time-travelable until expiry/rollback)."""
        p = os.path.join(self.manifest_dir, f"branch-{name}.json")
        if os.path.exists(p):
            os.remove(p)
        if spark is not None:
            pin = self._main_pin()
            if pin is not None:
                self.rollback(spark, pin)
                mp = os.path.join(self.manifest_dir, "branch-main.json")
                if os.path.exists(mp):
                    os.remove(mp)

    def stats_agg(self, cols: tuple[str, ...] = ()) -> dict:
        """Metadata-only aggregates — ``COUNT(*)`` plus per-column
        MIN/MAX answered ENTIRELY from the partition manifests, zero
        data files opened (the Iceberg metadata-aggregate-pushdown
        analog: at 10^12 rows "how many rows / what's the ts range"
        should cost O(partitions) driver-side JSON reads, not a scan).

        Exactness is proven, not assumed — raises when the metadata
        cannot answer exactly:

        - any live delete (equality or position) snapshot exists:
          manifest row counts predate merge-on-read tombstones
          (``materialize_deletes`` folds them in and restores
          answerability);
        - a diverged branch pins main: the newest manifests include
          branch-only files, so counts would leak unpublished rows;
        - a partition lacks a ``rows`` metric, or a requested column
          lacks min/max stats in some partition (appends without
          stat_cols widen-to-unknown rather than lie — same
          conservative rule as ``read_where`` pruning).

        Returns ``{"rows": n, "min": {col: v}, "max": {col: v}}``.
        """
        if self._delete_snapshots() or self._pos_delete_snapshots():
            raise ValueError(
                "live delete files make manifest counts stale —"
                " materialize_deletes() first")
        if self._main_pin() is not None:
            raise ValueError(
                "main is pinned behind a branch: metadata includes"
                " unpublished branch rows — fast_forward or drop the"
                " branch first")
        total = 0
        mins: dict[str, object] = {}
        maxs: dict[str, object] = {}
        for k in sorted(self.committed_keys()):
            m = self.manifest(k) or {}
            rows = (m.get("metrics") or {}).get("rows")
            if not isinstance(rows, int):
                raise ValueError(
                    f"partition {k} has no exact row metric")
            total += rows
            if rows == 0:
                continue
            cs = m.get("col_stats") or {}
            for c in cols:
                st = cs.get(c)
                if (st is None or st.get("min") is None
                        or st.get("max") is None):
                    raise ValueError(
                        f"partition {k} lacks min/max stats for"
                        f" {c!r} — cannot answer exactly")
                if c not in mins or st["min"] < mins[c]:
                    mins[c] = st["min"]
                if c not in maxs or st["max"] > maxs[c]:
                    maxs[c] = st["max"]
        return {"rows": total, "min": mins, "max": maxs}

    def expire_snapshots(self, keep_last: int = 10) -> dict:
        """Drop snapshot metadata older than the newest ``keep_last``
        (the Iceberg ``expire_snapshots`` analog: time-travel history
        is bounded; data files are untouched). Delete snapshots whose
        delete FILE is still live (not yet materialized) are always
        retained — expiring one would resurrect its tombstoned rows
        in every future read. Tagged snapshots are always retained —
        a tag is a durable reproducibility handle."""
        snaps = self.snapshots()
        if len(snaps) <= keep_last:
            return {"expired": []}
        cutoff = sorted(s["snapshot_id"] for s in snaps)[-keep_last]
        tagged = set(self.tags().values())
        # branch heads and a pinned main are live refs — expiring
        # their snapshots would orphan the ref they resolve through
        tagged |= set(self.branches().values())
        if self._main_pin() is not None:
            tagged.add(self._main_pin())
        expired = []
        for s in snaps:
            sid = s["snapshot_id"]
            if sid >= cutoff or sid in tagged:
                continue
            if (s.get("op") in ("delete", "merge", "pos_delete")
                    and os.path.exists(os.path.join(
                        self.delete_dir, s["delete_file"]))):
                continue  # live tombstones: must stay discoverable
            os.remove(os.path.join(self.manifest_dir,
                                   f"snapshot-{sid:05d}.json"))
            expired.append(sid)
        return {"expired": expired, "cutoff": cutoff}

    def rollback(self, spark: SparkSession, snapshot_id: int) -> dict:
        """Restore the table to its state at ``snapshot_id`` — the
        Iceberg ``rollback_to_snapshot`` analog, the undo for a bad
        commit (a corrupted ingest wave, a wrong takedown list).

        Deviation from real Iceberg, documented: Iceberg moves a
        metadata pointer and keeps the orphaned snapshots; this layer
        resolves reads from the manifest SET, not a pointer, so the
        rollback restores physically — partitions first committed
        after the target are removed, files appended after it are
        stripped from surviving partitions (their manifests' row
        metric and column stats recomputed from what remains, one
        tiny per-partition agg over only the touched partitions),
        delete files sequenced after it are dropped, and the
        invalidated snapshot metadata is expired. Time travel to
        snapshots at-or-before the target keeps working. Rolling back
        ACROSS a physical rewrite (``compact`` /
        ``materialize_deletes``) is refused: those rewrote rows in
        place and cannot be undone. Cost is O(undone work), never
        O(table)."""
        snaps = self.snapshots()
        target = next((s for s in snaps
                       if s["snapshot_id"] == snapshot_id), None)
        if target is None:
            have = sorted(s["snapshot_id"] for s in snaps)
            raise ValueError(
                f"no snapshot with snapshot_id={snapshot_id};"
                f" have {have}")
        later = [s for s in snaps if s["snapshot_id"] > snapshot_id]
        rewrites = [s["snapshot_id"] for s in later
                    if s.get("op") in ("compact", "materialize_deletes")]
        if rewrites:
            raise ValueError(
                f"cannot roll back across physical-rewrite snapshots"
                f" {rewrites}: compacted/materialized partitions were"
                f" rewritten in place")
        keep = {int(k) for k in target["committed_keys"]}
        dropped_parts, stripped = [], []
        for k in sorted(self.committed_keys()):
            d = os.path.join(self.data_dir, f"{PART_COL}={k}")
            mpath = os.path.join(self.manifest_dir, f"part-{k:05d}.json")
            if k not in keep:
                shutil.rmtree(d, ignore_errors=True)
                os.remove(mpath)
                dropped_parts.append(k)
                continue
            m = self.manifest(k) or {}
            fseq = m.get("file_seq") or {}
            late = {f for f, s_ in fseq.items() if int(s_) > snapshot_id}
            if not late:
                continue
            for f in sorted(late):
                p = os.path.join(d, f)
                if os.path.exists(p):
                    os.remove(p)
            m["files"] = [f for f in m.get("files", []) if f not in late]
            m["file_seq"] = {f: s_ for f, s_ in fseq.items()
                             if f not in late}
            for fk in ("file_stats", "file_blooms"):
                if m.get(fk):
                    # surviving files are untouched, so their
                    # immutable footer bounds / blooms stay valid —
                    # just drop stripped entries
                    m[fk] = {f: s_ for f, s_ in m[fk].items()
                             if f not in late}
                    if not m[fk]:
                        m.pop(fk)
            m["appends"] = [a for a in m.get("appends", [])
                            if a.get("snapshot_id", 0) <= snapshot_id]
            stat_cols = sorted((m.get("col_stats") or {}).keys())
            aggs = [F.count(F.lit(1)).alias("_rows")]
            for c in stat_cols:
                aggs += [F.min(c).alias(f"_mn_{c}"),
                         F.max(c).alias(f"_mx_{c}")]
            r = spark.read.parquet(d).agg(*aggs).collect()[0]
            m["metrics"] = {**(m.get("metrics") or {}),
                            "rows": r["_rows"]}
            if stat_cols:
                m["col_stats"] = {c: {"min": r[f"_mn_{c}"],
                                      "max": r[f"_mx_{c}"]}
                                  for c in stat_cols}
            self._write_json_atomic(mpath, m)
            stripped.append(k)
        dropped_snaps = []
        for s in later:
            if s.get("op") in ("delete", "merge", "pos_delete"):
                p = os.path.join(self.delete_dir, s["delete_file"])
                if os.path.isdir(p):
                    shutil.rmtree(p, ignore_errors=True)
                elif os.path.exists(p):
                    os.remove(p)
            os.remove(os.path.join(
                self.manifest_dir,
                f"snapshot-{s['snapshot_id']:05d}.json"))
            dropped_snaps.append(s["snapshot_id"])
        dropped_tags = [name for name, sid in self.tags().items()
                        if sid > snapshot_id]
        for name in dropped_tags:  # would dangle: their state is gone
            self.drop_tag(name)
        for name, sid in list(self.branches().items()):
            if sid > snapshot_id:  # branch head rolled away: ref dies
                os.remove(os.path.join(self.manifest_dir,
                                       f"branch-{name}.json"))
        # pin the schema as of the target (rolls back schema
        # evolution too); delete-op targets carry none, so walk back
        schema_json = next(
            (s.get("schema_json") for s in reversed(snaps)
             if s["snapshot_id"] <= snapshot_id
             and s.get("schema_json")), None)
        snapshot = {
            "snapshot_id": self._next_snapshot_id(), "op": "rollback",
            "rollback_to": snapshot_id,
            "committed_keys": sorted(self.committed_keys()),
            "dropped_partitions": dropped_parts,
            "stripped_partitions": stripped,
            "dropped_snapshots": dropped_snaps,
            "dropped_tags": dropped_tags,
            **({"schema_json": schema_json} if schema_json else {}),
        }
        return self._publish_snapshot(snapshot)

    def compact(self, spark: SparkSession,
                part_keys: list[int] | None = None,
                min_files: int = 2, target_mb: int = 128,
                run_id: str | None = None,
                fail_after_first_rename: int | None = None) -> dict:
        """Rewrite small-file partitions into few large files — the
        Iceberg ``rewrite_data_files`` (binpack) analog. At 10^5
        commits/day a streaming or incremental writer accretes
        thousands of small files per partition; scan cost then tracks
        file COUNT, not byte count, and compaction is the standard
        operational fix.

        Scale shape: ONE Spark job reads every selected partition and
        re-stages it with an AQE REBALANCE(part_key) whose advisory
        size is ``target_mb`` — output file count per partition tracks
        bytes/target (and a hot partition splits instead of
        straggling), never tasks x partitions. The swap is per
        partition and crash-safe WITHOUT ever copying data: atomic
        rename(dst -> dst.old-run), rename(staged -> dst), rm old; a
        kill between the renames is repaired by
        ``_recover_compaction`` on the next open (restore the old
        dir, redo the compaction later). Committed ROWS are never
        mutated — manifests keep their metrics and record
        files_before; a ``compact`` snapshot is appended. Deviation
        from real Iceberg, documented: partitions are rewritten in
        place, so time travel preserves the partition SET of an old
        snapshot, not its physical file list.

        ``fail_after_first_rename=N`` injects a crash right after the
        N-th partition's first rename (kill/recovery tests).
        """
        committed = self.committed_keys()
        keys = sorted(committed if part_keys is None else
                      [k for k in part_keys if k in committed])
        pending_dels = bool(self._delete_snapshots())
        # partitions referenced by a pending POSITION delete can never
        # be compacted: rewriting renames the files the tombstones
        # address, silently resurrecting the deleted rows. Those
        # partitions are skipped (materialize_deletes first — the
        # Iceberg rewrite ordering). The delete files are
        # dimension-sized, so listing their partitions is one tiny
        # driver-side read each.
        pos_parts: set[int] = set()
        for s in self._pos_delete_snapshots():
            p = os.path.join(self.delete_dir, s["delete_file"])
            pos_parts |= {int(r[0]) for r in
                          spark.read.parquet(p)
                          .select(PART_COL).distinct().collect()}
        todo: dict[int, list[str]] = {}
        skipped_mixed_seq: list[int] = []
        skipped_pos_delete: list[int] = []
        for k in keys:
            if k in pos_parts:
                skipped_pos_delete.append(k)
                continue
            dst = os.path.join(self.data_dir, f"{PART_COL}={k}")
            files = sorted(f for f in os.listdir(dst)
                           if f.endswith(".parquet"))
            if len(files) < min_files:
                continue
            m = self.manifest(k) or {}
            fseq = m.get("file_seq") or {}
            seqs = {int(fseq.get(f, m.get("data_snapshot_id", 0)))
                    for f in files}
            if pending_dels and len(seqs) > 1:
                # compacting mixes files of different sequence
                # numbers into one; a pending delete sequenced
                # BETWEEN them could no longer scope correctly —
                # materialize_deletes first, then compact (the
                # Iceberg rewrite ordering for the same reason)
                skipped_mixed_seq.append(k)
                continue
            todo[k] = files
        run_id = run_id or f"compact-{int(time.time() * 1000)}"
        if not todo:
            return {"run_id": run_id, "compacted_keys": [],
                    "skipped_mixed_seq": skipped_mixed_seq,
                    "skipped_pos_delete": skipped_pos_delete,
                    "files_before": 0, "files_after": 0}

        staging = os.path.join(self.staging_dir, run_id)
        schema = self._stored_schema(
            self.snapshots()[-1] if self.snapshots() else None)
        reader = spark.read.option("basePath", self.data_dir)
        if schema is not None:
            reader = reader.schema(schema)
        df = reader.parquet(*[os.path.join(self.data_dir,
                                           f"{PART_COL}={k}")
                              for k in todo])
        advisory_key = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
        prev_advisory = spark.conf.get(advisory_key, None)
        spark.conf.set(advisory_key, str(target_mb * 1024 * 1024))
        try:
            (df.hint("rebalance", F.col(PART_COL))
             .write.mode("overwrite").partitionBy(PART_COL)
             .parquet(staging))
        finally:
            if prev_advisory is None:
                spark.conf.unset(advisory_key)
            else:
                spark.conf.set(advisory_key, prev_advisory)

        compacted, files_before, files_after = [], 0, 0
        for i, (k, old_files) in enumerate(sorted(todo.items())):
            src = os.path.join(staging, f"{PART_COL}={k}")
            dst = os.path.join(self.data_dir, f"{PART_COL}={k}")
            old = dst + f".old-{run_id}"
            os.rename(dst, old)
            if (fail_after_first_rename is not None
                    and i >= fail_after_first_rename):
                raise RuntimeError(
                    "injected failure between compaction renames")
            os.rename(src, dst)
            shutil.rmtree(old)
            new_files = sorted(f for f in os.listdir(dst)
                               if f.endswith(".parquet"))
            m = self.manifest(k) or {"part_key": k}
            # merged files inherit the MAX of the old sequences
            # (uniform when deletes are pending — the todo guard;
            # otherwise only future deletes matter and they
            # outsequence any current value)
            old_fseq = m.get("file_seq") or {}
            seq = max((int(old_fseq.get(f, m.get("data_snapshot_id",
                                                 0)))
                       for f in old_files), default=0)
            m.update({"files": new_files, "compacted_by": run_id,
                      "file_seq": {f: seq for f in new_files},
                      "files_before_compaction": len(old_files)})
            self._refresh_file_stats(m, dst, new_files)
            self._write_json_atomic(
                os.path.join(self.manifest_dir, f"part-{k:05d}.json"), m)
            compacted.append(k)
            files_before += len(old_files)
            files_after += len(new_files)

        shutil.rmtree(staging, ignore_errors=True)
        snaps = self.snapshots()
        snap_id = (max((s.get("snapshot_id", -1) for s in snaps),
                       default=-1) + 1)
        snapshot = {
            "snapshot_id": snap_id, "op": "compact", "run_id": run_id,
            "committed_keys": sorted(self.committed_keys()),
            "compacted_keys": compacted,
            "skipped_mixed_seq": skipped_mixed_seq,
            "skipped_pos_delete": skipped_pos_delete,
            "files_before": files_before, "files_after": files_after,
            **({"schema_json": schema.json()} if schema is not None
               else {}),
        }
        self._write_json_atomic(
            os.path.join(self.manifest_dir,
                         f"snapshot-{snap_id:05d}.json"), snapshot)
        return snapshot

    def _stored_schema(self, snap: dict | None) -> T.StructType | None:
        sj = (snap or {}).get("schema_json")
        if sj is None:
            return None
        return T.StructType.fromJson(json.loads(sj))

    def read(self, spark: SparkSession,
             snapshot_id: int | None = None,
             apply_deletes: bool = True,
             tag: str | None = None,
             branch: str | None = None) -> DataFrame:
        """Read the table; with ``snapshot_id`` (or a ``tag`` naming
        one), time-travel to the partition set committed as of that
        snapshot (Iceberg ``VERSION AS OF`` analog). Committed partitions are immutable
        (resume never rewrites them), so an old snapshot is exactly
        the subset of partition directories it recorded.

        Equality-delete files at-or-before the requested snapshot are
        applied (``apply_deletes=False`` reads raw data rows) as a
        broadcast anti-join scoped by sequence number: a delete drops
        a row only when ``delete.snapshot_id > file.sequence_number``
        (STRICTLY older data — Iceberg's rule) — rows appended at or
        after the delete survive, including a ``merge``'s own appends
        under their shared snapshot id.

        Scale design: one glob scan of the partitioned layout + a
        partition-column filter — Spark prunes directories from the
        filter, so a snapshot read never enumerates one path per
        partition (the round-1 watch-item at 10^4-10^5 partitions).
        The schema comes from the snapshot manifest when present: no
        parquet footer sampling, and partitions written before a
        schema evolution read consistently (missing columns as null).
        Snapshots resolve by their embedded snapshot_id, never by
        list position. Time travel filters by PER-FILE sequence
        number, not just the partition set — append mode adds
        later-sequenced files into already-committed partition dirs,
        and a snapshot read must not see them."""
        if sum(x is not None for x in (snapshot_id, tag, branch)) > 1:
            raise ValueError("pass at most one of snapshot_id/tag/"
                             "branch")
        if tag is not None:
            snapshot_id = self._resolve_tag(tag)
        elif branch is not None:
            snapshot_id = self._resolve_branch(branch)
        elif snapshot_id is None:
            # plain read = MAIN state: while a branch is ahead, main
            # is pinned and the read time-travels to the pin (per-file
            # sequence scoping hides the branch's appends)
            snapshot_id = self._main_pin()
        dels = (self._delete_snapshots(upto=snapshot_id)
                if apply_deletes else [])
        pdels = (self._pos_delete_snapshots(upto=snapshot_id)
                 if apply_deletes else [])
        if snapshot_id is None and not dels and not pdels:
            # fast path: a plain latest-read with nothing to scope
            # stays a bare scan (no annotation join in the plan)
            return self._plain_scan(spark)
        ann = self._read_annotated(spark, snapshot_id,
                                   with_pos=bool(pdels))
        if "_dseq" not in ann.columns:
            return ann  # empty-snapshot frame (no data to scan)
        for eq_cols, d in self._delete_dims(spark, dels):
            ann = ann.join(F.broadcast(d),
                           self._del_cond(eq_cols), "left_anti")
        ann = self._apply_pos_deletes(spark, ann, pdels)
        return self._unannotate(ann)

    def _plain_scan(self, spark: SparkSession) -> DataFrame:
        """Bare latest-state scan (schema-pinned glob), no sequence
        annotation — the zero-join path for tables with no pending
        deletes and no time-travel request."""
        snaps = self.snapshots()
        snap = snaps[-1] if snaps else None
        schema = self._stored_schema(snap)
        if snap is not None and not snap["committed_keys"]:
            if schema is None:
                raise ValueError(
                    f"snapshot {snap.get('snapshot_id')} has no"
                    " committed partitions and records no schema")
            return spark.createDataFrame([], schema=schema)
        reader = spark.read.option("basePath", self.data_dir)
        if schema is not None:
            reader = reader.schema(schema)
        return reader.parquet(
            os.path.join(self.data_dir, f"{PART_COL}=*"))

    def _read_annotated(self, spark: SparkSession,
                        snapshot_id: int | None,
                        with_pos: bool = False) -> DataFrame:
        """The scan every read path shares: schema-pinned glob scan,
        ``_dseq`` per-file sequence annotation (attached HERE because
        ``input_file_name()`` rejects multi-source plans), and — for
        time travel — the partition AND file-sequence filters of the
        requested snapshot. Callers drop ``_dseq`` when done."""
        snaps = self.snapshots()
        if snapshot_id is None:
            snap = snaps[-1] if snaps else None
        else:
            snap = next((s for s in snaps
                         if s.get("snapshot_id") == snapshot_id), None)
            if snap is None:
                have = sorted(s.get("snapshot_id") for s in snaps)
                raise ValueError(
                    f"no snapshot with snapshot_id={snapshot_id};"
                    f" have {have}")
        schema = self._stored_schema(snap)
        if snap is not None and not snap["committed_keys"]:
            if schema is None:
                raise ValueError(
                    f"snapshot {snap.get('snapshot_id')} has no"
                    " committed partitions and records no schema")
            return spark.createDataFrame([], schema=schema)
        reader = spark.read.option("basePath", self.data_dir)
        if schema is not None:
            reader = reader.schema(schema)
        df = reader.parquet(os.path.join(self.data_dir, f"{PART_COL}=*"))
        if snapshot_id is not None:
            df = df.filter(F.col(PART_COL).isin(
                [int(k) for k in snap["committed_keys"]]))
        df = self._annotate_seq(spark, df, keep_pos=with_pos)
        if snapshot_id is not None:
            df = df.filter(F.col("_dseq") <= snapshot_id)
        return df

    # -- equality deletes (merge-on-read) -------------------------------------

    def _delete_snapshots(self, upto: int | None = None) -> list[dict]:
        # "merge" snapshots carry a delete file too (their tombstone
        # half); both ops scope identically by sequence number
        return [s for s in self.snapshots()
                if s.get("op") in ("delete", "merge")
                and os.path.exists(os.path.join(
                    self.delete_dir, s["delete_file"]))
                and (upto is None or s["snapshot_id"] <= upto)]

    def _file_seq_df(self, spark: SparkSession) -> DataFrame:
        """(file name, sequence number) dimension from the manifests —
        per-FILE sequencing (Iceberg's model), so appended files in a
        mixed-age partition scope deletes independently. Files
        predating the field read their partition's data_snapshot_id,
        else 0 (oldest: every delete applies)."""
        rows = []
        for k in sorted(self.committed_keys()):
            m = self.manifest(k) or {}
            fseq = m.get("file_seq") or {}
            base = int(m.get("data_snapshot_id", 0))
            for f in m.get("files", []):
                # keyed by (partition, name): one writer task serves
                # several partition dirs with the SAME file name, so
                # the name alone is not unique table-wide
                rows.append((k, f, int(fseq.get(f, base))))
        return spark.createDataFrame(
            rows or [(None, None, None)],
            f"{PART_COL} int, _fname string, _dseq long").filter(
            F.col("_fname").isNotNull())

    def _annotate_seq(self, spark: SparkSession, df: DataFrame,
                      keep_pos: bool = False) -> DataFrame:
        """Attach each row's file sequence number as ``_dseq``. MUST
        run directly on the scan frame: ``input_file_name()`` and the
        ``_metadata`` pseudo-column reject plans that already contain
        more than one source. ``keep_pos`` additionally keeps
        ``_fname`` and attaches ``_pos`` (the row's physical ordinal
        in its file, from parquet's ``_metadata.row_index`` — the
        coordinate system position deletes address)."""
        cols = {"_fname": F.element_at(
            F.split(F.input_file_name(), "/"), -1)}
        if keep_pos:
            cols["_pos"] = F.col("_metadata.row_index")
        out = (df.withColumns(cols)
               .join(F.broadcast(self._file_seq_df(spark)),
                     [PART_COL, "_fname"], "left")
               .withColumn("_dseq", F.coalesce(F.col("_dseq"),
                                               F.lit(0).cast("long"))))
        return out if keep_pos else out.drop("_fname")

    def _delete_dims(self, spark: SparkSession,
                     dels: list[dict]) -> list[tuple[tuple[str, ...],
                                                     DataFrame]]:
        """Window the delete files into per-eq_cols dimension frames
        carrying their snapshot id as ``_delseq``."""
        by_cols: dict[tuple[str, ...], list[dict]] = {}
        for s in dels:
            by_cols.setdefault(tuple(s["eq_cols"]), []).append(s)
        out = []
        for eq_cols, group in by_cols.items():
            frames = []
            for s in group:
                frames.append(
                    spark.read.parquet(os.path.join(
                        self.delete_dir, s["delete_file"]))
                    .select(*[F.col(c).alias(f"_del_{c}")
                              for c in eq_cols],
                            F.lit(int(s["snapshot_id"])).cast("long")
                            .alias("_delseq")))
            d = frames[0]
            for f in frames[1:]:
                d = d.unionByName(f)
            out.append((eq_cols, d))
        return out

    @staticmethod
    def _del_cond(eq_cols: tuple[str, ...]):
        # STRICTLY older — Iceberg's data/delete sequence rule: an
        # equality delete applies only to data files whose sequence
        # number is LESS than the delete's. Standalone deletes never
        # share an id with a data commit (snapshot ids are unique per
        # commit), so < and <= coincide for them; the strict form is
        # what lets ``merge`` publish its delete file and its new data
        # files under ONE snapshot — the new rows share the delete's
        # sequence number and therefore survive their own tombstones.
        cond = F.col("_delseq") > F.col("_dseq")
        for c in eq_cols:
            cond = cond & (F.col(c) == F.col(f"_del_{c}"))
        return cond

    # -- position deletes (merge-on-read, the other v2 flavor) ----------------

    def _pos_delete_snapshots(self, upto: int | None = None) -> list[dict]:
        return [s for s in self.snapshots()
                if s.get("op") == "pos_delete"
                and os.path.exists(os.path.join(
                    self.delete_dir, s["delete_file"]))
                and (upto is None or s["snapshot_id"] <= upto)]

    def _pos_dim(self, spark: SparkSession,
                 pdels: list[dict]) -> DataFrame:
        """Union the position-delete files into one dimension frame
        (each is a takedown-scale row list, broadcastable next to the
        data) carrying its snapshot id as ``_pdelseq``."""
        frames = [
            spark.read.parquet(os.path.join(self.delete_dir,
                                            s["delete_file"]))
            .select(F.col(PART_COL).alias("_pd_part"),
                    F.col("_fname").alias("_pd_fname"),
                    F.col("_pos").alias("_pd_pos"),
                    F.lit(int(s["snapshot_id"])).cast("long")
                    .alias("_pdelseq"))
            for s in pdels]
        d = frames[0]
        for f in frames[1:]:
            d = d.unionByName(f)
        return d

    @staticmethod
    def _pos_cond():
        # AT-OR-BEFORE (>=) — the Iceberg position-delete sequence
        # rule: a position delete names concrete files that existed
        # when it was written (same-sequence included: an engine may
        # delete from files it just committed), and can never name a
        # later file, so >= is both the spec rule and a no-op guard
        # against recycled file names.
        return ((F.col(PART_COL) == F.col("_pd_part"))
                & (F.col("_fname") == F.col("_pd_fname"))
                & (F.col("_pos") == F.col("_pd_pos"))
                & (F.col("_pdelseq") >= F.col("_dseq")))

    def _apply_pos_deletes(self, spark: SparkSession, ann: DataFrame,
                           pdels: list[dict]) -> DataFrame:
        """Anti-join an annotated scan (must carry ``_fname`` and
        ``_pos``) against the pending position deletes."""
        if not pdels:
            return ann
        return ann.join(F.broadcast(self._pos_dim(spark, pdels)),
                        self._pos_cond(), "left_anti")

    @staticmethod
    def _unannotate(df: DataFrame) -> DataFrame:
        return df.drop("_dseq", "_fname", "_pos")

    def delete_where(self, spark: SparkSession, cond,
                     run_id: str | None = None) -> dict:
        """Commit a POSITION delete (Iceberg v2 position-delete-file
        analog): scan the current live rows, record (partition, file,
        row ordinal) for every row matching ``cond`` (a Column or SQL
        string over the table's columns), and publish a
        ``pos_delete`` snapshot — no data partition is touched
        (merge-on-read). This is the predicate-takedown path when no
        natural key exists ("purge every row whose text matches this
        PII pattern"): the delete file stores coordinates, not
        values, so the purged content itself never persists in the
        tombstones (unlike an equality delete, whose file IS the key
        values). Ordinals come from the scan's
        ``_metadata.row_index`` — physical, split-safe, and stable
        because data files are immutable (``compact`` refuses
        partitions with pending position deletes).

        Rows already dead under pending deletes are not re-recorded;
        rows appended later are untouched (they cannot be named by
        position in files that already existed). Reads re-apply the
        file as a broadcast anti-join on (partition, file, pos)."""
        run_id = run_id or f"posdelete-{int(time.time() * 1000)}"
        snap_id = self._next_snapshot_id()
        ann = self._read_annotated(spark, None, with_pos=True)
        if "_dseq" not in ann.columns:
            return {"run_id": run_id, "n_delete_rows": 0,
                    "noop": "empty table"}
        for eq_cols, d in self._delete_dims(
                spark, self._delete_snapshots()):
            ann = ann.join(F.broadcast(d), self._del_cond(eq_cols),
                           "left_anti")
        ann = self._apply_pos_deletes(spark, ann,
                                      self._pos_delete_snapshots())
        cond_col = F.expr(cond) if isinstance(cond, str) else cond
        hits = ann.filter(cond_col).select(PART_COL, "_fname", "_pos")
        # run-unique name, written once, never renamed (delete_rows's
        # concurrency rule: a published snapshot may reference it)
        name = (f"posdelete-{snap_id:05d}-"
                f"{uuid.uuid4().hex[:8]}.parquet")
        path = os.path.join(self.delete_dir, name)
        hits.coalesce(1).write.mode("overwrite").parquet(path)
        n = spark.read.parquet(path).count()
        snapshot = {
            "snapshot_id": snap_id, "op": "pos_delete",
            "run_id": run_id,
            "committed_keys": sorted(self.committed_keys()),
            "delete_file": name, "n_delete_rows": int(n),
            "predicate": str(cond),
        }

        def _rebase(snap: dict, new_id: int) -> dict:
            # lost the id race: positions name files that existed at
            # scan time, so serializing after the winner is exact —
            # the winner's new files are untouched by construction
            return {**snap, "snapshot_id": new_id,
                    "committed_keys": sorted(self.committed_keys()),
                    "rebased_from": snap["snapshot_id"]}

        return self._publish_snapshot(snapshot, rebase=_rebase)

    def _apply_deletes(self, spark: SparkSession, df: DataFrame,
                       snapshot_id: int | None) -> DataFrame:
        dels = self._delete_snapshots(upto=snapshot_id)
        pdels = self._pos_delete_snapshots(upto=snapshot_id)
        if not dels and not pdels:
            return df
        df = self._annotate_seq(spark, df, keep_pos=bool(pdels))
        for eq_cols, d in self._delete_dims(spark, dels):
            df = df.join(F.broadcast(d), self._del_cond(eq_cols),
                         "left_anti")
        df = self._apply_pos_deletes(spark, df, pdels)
        return self._unannotate(df)

    def delete_rows(self, keys_df: DataFrame, eq_cols: list[str],
                    run_id: str | None = None) -> dict:
        """Commit an equality delete: persist the distinct ``eq_cols``
        tuples of ``keys_df`` as a delete FILE and append a ``delete``
        snapshot — no data partition is touched (merge-on-read). The
        delete applies to every partition committed at-or-before this
        snapshot; rows appended later survive even if their keys
        match. Delete sets are dimension-sized (a takedown list, a PII
        scan's hit list), so reads apply them as broadcast anti-joins;
        fold them into the data with ``materialize_deletes`` when the
        accumulated delete count warrants a rewrite.
        """
        run_id = run_id or f"delete-{int(time.time() * 1000)}"
        snap_id = self._next_snapshot_id()
        # Run-unique file name, written ONCE and never renamed. Two
        # concurrent delete_rows (e.g. two CDC upsert streams) both
        # compute the same provisional snap_id; a shared
        # delete-{snap_id}.parquet name would make the loser's write
        # clobber the winner's just-published file (and a post-CAS
        # rename leaves a window where a published snapshot references
        # a missing file — _delete_snapshots would silently skip the
        # tombstones). The numeric prefix is cosmetic (the PROVISIONAL
        # id); identity lives in the snapshot record's delete_file.
        name = (f"delete-{snap_id:05d}-"
                f"{uuid.uuid4().hex[:8]}.parquet")
        path = os.path.join(self.delete_dir, name)
        tuples = keys_df.select(*eq_cols).distinct()
        tuples.coalesce(1).write.mode("overwrite").parquet(path)
        n = keys_df.sparkSession.read.parquet(path).count()
        snapshot = {
            "snapshot_id": snap_id, "op": "delete", "run_id": run_id,
            "committed_keys": sorted(self.committed_keys()),
            "eq_cols": list(eq_cols), "delete_file": name,
            "n_delete_tuples": int(n),
        }

        def _rebase(snap: dict, new_id: int) -> dict:
            """Lost the snapshot id race: serialize after the winner —
            the delete then tombstones whatever is committed at its
            serialized position (matching rows appended by the
            concurrent winner included), exactly the at-or-before
            sequence rule. The delete FILE is untouched: its name is
            run-unique, so no rename is needed (and renaming here
            could move a path the winner's published snapshot
            references)."""
            return {**snap, "snapshot_id": new_id,
                    "committed_keys": sorted(self.committed_keys()),
                    "rebased_from": snap["snapshot_id"]}

        return self._publish_snapshot(snapshot, rebase=_rebase)

    def materialize_deletes(self, spark: SparkSession,
                            run_id: str | None = None) -> dict:
        """Fold pending equality deletes into the data (the
        ``rewrite_data_files``-with-deletes analog): rewrite ONLY the
        partitions that actually hold matching rows, bump their
        ``data_snapshot_id`` past every folded delete (so re-applying
        those deletes is a no-op by the sequence rule), then drop the
        delete files. Crash-safe like ``compact``: the per-partition
        swap is the same rename pair ``_recover_compaction`` repairs,
        and a kill before the delete files are removed just leaves
        merge-on-read in force (idempotent — the rows are already
        gone, and rewritten partitions outsequence the deletes).

        Documented deviation from real Iceberg (same family as
        ``compact``'s): materializing EXPIRES the folded delete files
        immediately — a later time-travel read to a snapshot between
        the delete and the materialize sees raw rows (Iceberg keeps
        delete files until ``expire_snapshots``). Reads at-or-after
        the materialize snapshot are exact.
        """
        dels = self._delete_snapshots()
        pdels = self._pos_delete_snapshots()
        run_id = run_id or f"materialize-{int(time.time() * 1000)}"
        snap_id = self._next_snapshot_id()
        if not dels and not pdels:
            return {"run_id": run_id, "rewritten_keys": [],
                    "folded_deletes": []}
        raw = self.read(spark, apply_deletes=False)
        clean = self._apply_deletes(spark, raw, None)
        # partitions with rows to drop: raw minus clean, per key —
        # driver-side list bounded by the partition count
        hit = (raw.groupBy(PART_COL).count()
               .join(clean.groupBy(PART_COL).count()
                     .withColumnRenamed("count", "c2"),
                     PART_COL, "left")
               .filter(F.col("count") != F.coalesce("c2", F.lit(0)))
               .select(PART_COL).collect())
        keys = sorted(int(r[PART_COL]) for r in hit)
        staging = os.path.join(self.staging_dir, run_id)
        if keys:
            (clean.filter(F.col(PART_COL).isin(keys))
             .hint("rebalance", F.col(PART_COL))
             .write.mode("overwrite").partitionBy(PART_COL)
             .parquet(staging))
            for k in keys:
                src = os.path.join(staging, f"{PART_COL}={k}")
                dst = os.path.join(self.data_dir, f"{PART_COL}={k}")
                old = dst + f".old-{run_id}"
                os.rename(dst, old)
                os.rename(src, dst)
                shutil.rmtree(old)
                m = self.manifest(k) or {"part_key": k}
                files = sorted(f for f in os.listdir(dst)
                               if f.endswith(".parquet"))
                m.update({
                    "files": files,
                    "file_seq": {f: snap_id for f in files},
                    "data_snapshot_id": snap_id,
                    "deletes_materialized_by": run_id,
                })
                # rows shrank: recompute the exact row metric and the
                # tracked column bounds from the survivors (same
                # per-touched-partition agg as rollback) — a stale
                # count/min/max here would silently corrupt
                # metadata-only answers (stats_agg) after the purge
                stat_cols = sorted((m.get("col_stats") or {}).keys())
                aggs = [F.count(F.lit(1)).alias("_rows")]
                for c in stat_cols:
                    aggs += [F.min(c).alias(f"_mn_{c}"),
                             F.max(c).alias(f"_mx_{c}")]
                r = spark.read.parquet(dst).agg(*aggs).collect()[0]
                m["metrics"] = {**(m.get("metrics") or {}),
                                "rows": r["_rows"]}
                if stat_cols:
                    m["col_stats"] = {c: {"min": r[f"_mn_{c}"],
                                          "max": r[f"_mx_{c}"]}
                                      for c in stat_cols}
                self._refresh_file_stats(m, dst, files)
                self._write_json_atomic(
                    os.path.join(self.manifest_dir,
                                 f"part-{k:05d}.json"), m)
            shutil.rmtree(staging, ignore_errors=True)
        folded = [s["snapshot_id"] for s in dels + pdels]
        for s in dels + pdels:
            shutil.rmtree(os.path.join(self.delete_dir,
                                       s["delete_file"]),
                          ignore_errors=True)
        snapshot = {
            "snapshot_id": snap_id, "op": "materialize_deletes",
            "run_id": run_id,
            "committed_keys": sorted(self.committed_keys()),
            "rewritten_keys": keys, "folded_deletes": folded,
        }
        self._write_json_atomic(
            os.path.join(self.manifest_dir,
                         f"snapshot-{snap_id:05d}.json"), snapshot)
        return snapshot

    # -- incremental scan ------------------------------------------------------

    def _resolve_window(self, from_snapshot_id: int,
                        to_snapshot_id: int | None) -> tuple[int, int]:
        snaps = {s["snapshot_id"] for s in self.snapshots()}
        if from_snapshot_id not in snaps:
            raise ValueError(f"no snapshot {from_snapshot_id}")
        if to_snapshot_id is None:
            to_snapshot_id = max(snaps)
        if to_snapshot_id not in snaps:
            raise ValueError(f"no snapshot {to_snapshot_id}")
        return from_snapshot_id, to_snapshot_id

    def _window_files(self, lo_excl: int, hi_incl: int
                      ) -> dict[int, set[str]]:
        """Live data files whose sequence number falls in
        (lo_excl, hi_incl], per partition — FILE-granular (append mode
        adds files to existing partitions, so a partition-set diff
        alone under-reports)."""
        out: dict[int, set[str]] = {}
        for k in sorted(self.committed_keys()):
            m = self.manifest(k) or {}
            fseq = m.get("file_seq") or {}
            base = int(m.get("data_snapshot_id", 0))
            hits = {f for f in m.get("files", [])
                    if lo_excl < int(fseq.get(f, base)) <= hi_incl}
            if hits:
                out[k] = hits
        return out

    def read_incremental(self, spark: SparkSession, from_snapshot_id: int,
                         to_snapshot_id: int | None = None) -> DataFrame:
        """Rows appended AFTER ``from_snapshot_id`` up to
        ``to_snapshot_id`` (default: latest) — the Iceberg
        incremental-scan analog, FILE-granular: new partitions and
        files appended into existing partitions both count (the row
        filter is simply ``_dseq`` in the window — the same per-file
        sequence annotation delete scoping uses, attached once at
        scan level). Deletes in the window apply under the same
        sequence rule as ``read``. Caveat shared with ``read``: files
        rewritten by compaction/materialization carry merged sequence
        numbers (documented there)."""
        a, b = self._resolve_window(from_snapshot_id, to_snapshot_id)
        files = self._window_files(a, b)
        if not files:
            return (self.read(spark, snapshot_id=b)
                    .filter(F.lit(False)))
        pdels = self._pos_delete_snapshots(upto=b)
        df = (self._read_annotated(spark, b, with_pos=bool(pdels))
              .filter(F.col(PART_COL).isin(list(files)))
              .filter(F.col("_dseq") > a))
        for eq_cols, d in self._delete_dims(
                spark, self._delete_snapshots(upto=b)):
            df = df.join(F.broadcast(d), self._del_cond(eq_cols),
                         "left_anti")
        df = self._apply_pos_deletes(spark, df, pdels)
        return self._unannotate(df)

    def read_changes(self, spark: SparkSession, from_snapshot_id: int,
                     to_snapshot_id: int | None = None) -> DataFrame:
        """NET row-level changes between two snapshots — the Iceberg
        changelog-scan (CDC read) analog: every output row carries
        ``_change_type`` ∈ {'insert', 'delete'}.

        - insert = a row visible at ``to`` that was not visible at
          ``from`` (file-granular incremental read, window deletes
          already applied — a row inserted AND deleted inside the
          window nets out);
        - delete = a row visible at ``from`` that a window delete
          tombstones under the sequence rule (an upsert therefore
          emits delete(old) + insert(new), the classic changelog
          pair).

        Valid while the window's delete files are retained
        (``materialize_deletes`` expires them — documented deviation
        shared with time travel)."""
        a, b = self._resolve_window(from_snapshot_id, to_snapshot_id)
        inserts = (self.read_incremental(spark, a, b)
                   .withColumn("_change_type", F.lit("insert")))
        window_dels = [s for s in self._delete_snapshots(upto=b)
                       if s["snapshot_id"] > a]
        window_pos = [s for s in self._pos_delete_snapshots(upto=b)
                      if s["snapshot_id"] > a]
        # annotate ONCE at scan level (input_file_name rejects
        # multi-source plans), then derive visible-at-a (anti-join
        # deletes <= a) and the tombstoned set (semi-join window
        # deletes) from the same annotated frame
        ann = self._read_annotated(spark, a, with_pos=bool(
            window_pos or self._pos_delete_snapshots(upto=a)))
        for eq_cols, d in self._delete_dims(
                spark, self._delete_snapshots(upto=a)):
            ann = ann.join(F.broadcast(d), self._del_cond(eq_cols),
                           "left_anti")
        ann = self._apply_pos_deletes(
            spark, ann, self._pos_delete_snapshots(upto=a))
        hits = [ann.join(F.broadcast(d), self._del_cond(eq_cols),
                         "left_semi")
                for eq_cols, d in self._delete_dims(spark,
                                                    window_dels)]
        if window_pos:
            hits.append(ann.join(
                F.broadcast(self._pos_dim(spark, window_pos)),
                self._pos_cond(), "left_semi"))
        if hits:
            deleted = hits[0]
            for h in hits[1:]:
                deleted = deleted.unionByName(h)
            deleted = self._unannotate(deleted).distinct()
        else:
            deleted = self._unannotate(ann).filter(F.lit(False))
        deleted = deleted.withColumn("_change_type", F.lit("delete"))
        return inserts.unionByName(deleted.select(inserts.columns))

    # -- stats-pruned scan -----------------------------------------------------

    def read_where(self, spark: SparkSession, col: str | None = None,
                   lo=None, hi=None,
                   preds: dict | None = None,
                   snapshot_id: int | None = None,
                   tag: str | None = None) -> tuple[DataFrame, dict]:
        """Scan with manifest-stats partition pruning: keep only
        partitions whose recorded [min, max] overlaps the requested
        range (missing stats keep the partition — pruning is an
        optimization, never a filter), then prune individual FILES
        within kept partitions by their immutable footer bounds
        (``file_stats``) and — for point predicates — per-file bloom
        filters (``file_blooms``, recorded by ``write(bloom_cols=)``;
        ``files_pruned_bloom`` counts the files only the bloom could
        drop), then apply the residual predicate(s).
        Returns (df, prune_report); the report records how many
        partitions the manifests eliminated BEFORE any file listing
        (``partitions_pruned``, split into ``pruned_by_spec`` /
        ``pruned_by_stats``) and the per-file skip counts
        (``files_kept`` / ``files_pruned``, counted only where file
        stats exist) — the Iceberg planning-time data-skipping
        analog.

        ``preds`` = ``{col: (lo, hi)}`` prunes on a CONJUNCTION of
        ranges — a partition is skipped when ANY predicate's range
        misses its stats. On a z-ordered layout every clustered
        column's stats are tight, so a multi-dimensional point/range
        lookup prunes multiplicatively (the query shape z-order
        exists for); on a linear layout only the sort column
        contributes.

        ``snapshot_id`` / ``tag`` scope the pruned scan to a
        historical snapshot (pruning composed with time travel — the
        'reproduce the exact training-corpus slice' read). Pruning
        stays conservative under time travel: later appends only
        WIDEN a partition's recorded min/max, so stale stats can keep
        an extra partition but never wrongly drop one.
        """
        if tag is not None:
            if snapshot_id is not None:
                raise ValueError("pass snapshot_id or tag, not both")
            snapshot_id = self._resolve_tag(tag)
        snap = None
        if snapshot_id is not None:
            snap = next((s for s in self.snapshots()
                         if s["snapshot_id"] == snapshot_id), None)
            if snap is None:
                have = sorted(s["snapshot_id"] for s in self.snapshots())
                raise ValueError(
                    f"no snapshot with snapshot_id={snapshot_id};"
                    f" have {have}")
        if preds is None:
            if col is None:
                raise ValueError("pass col or preds")
            preds = {col: (lo, hi)}
        elif col is not None:
            raise ValueError("pass col or preds, not both")
        scan_keys = sorted(self.committed_keys())
        if snap is not None:
            scan_keys = [k for k in scan_keys
                         if k in {int(x) for x in snap["committed_keys"]}]
        # hidden-partitioning pruning: if the table has a partition
        # spec, predicates on the spec's SOURCE columns eliminate
        # partitions by key arithmetic alone (partition_spec.py) —
        # no col_stats needed, exactly Iceberg's transform pruning.
        # Stats pruning still runs on the survivors.
        keyfn = None
        spec = self.partition_spec()
        if spec is not None:
            from .partition_spec import key_pruner
            keyfn = key_pruner(spec, preds, spark)
        kept, pruned, spec_pruned = [], [], []
        for k in scan_keys:
            if keyfn is not None and not keyfn(k):
                spec_pruned.append(k)
                continue
            stats = (self.manifest(k) or {}).get("col_stats", {})
            drop = False
            for c, (lo_, hi_) in preds.items():
                st = stats.get(c)
                if st is None or st["min"] is None:
                    continue
                if ((lo_ is not None and st["max"] < lo_)
                        or (hi_ is not None and st["min"] > hi_)):
                    drop = True
                    break
            (pruned if drop else kept).append(k)
        # file-level skipping WITHIN kept partitions: per-file footer
        # bounds recorded at commit time are immutable (files never
        # change in place), so unlike the partition entry they stay
        # exact in mixed-age partitions — a range scan over an
        # append-heavy table skips every non-overlapping append wave
        # file-by-file even though the partition range widened to
        # cover them all. Files without a recorded entry are kept
        # (pruning is an optimization, never a filter).
        # point predicates (lo == hi) additionally probe per-file
        # BLOOMS — the case range bounds cannot touch: every file's
        # [min, max] straddles the probe value when keys interleave
        # across write waves, yet only a few files actually hold it.
        points = {}
        for c, (lo_, hi_) in preds.items():
            if lo_ is not None and hi_ is not None and lo_ == hi_:
                pv = _bloom_probe_value(lo_)
                if pv is not None:
                    points[c] = pv
        sources, files_kept, files_pruned = [], 0, 0
        files_pruned_bloom = 0
        for k in kept:
            m = self.manifest(k) or {}
            fstats = m.get("file_stats") or {}
            fblooms = m.get("file_blooms") or {}
            names = m.get("files") or []
            if not names or (not fstats and not fblooms):
                sources.append(os.path.join(self.data_dir,
                                            f"{PART_COL}={k}"))
                continue
            for f in names:
                drop = False
                for c, (lo_, hi_) in preds.items():
                    st = (fstats.get(f) or {}).get(c)
                    if st is None or st["min"] is None:
                        continue
                    if ((lo_ is not None and st["max"] < lo_)
                            or (hi_ is not None and st["min"] > hi_)):
                        drop = True
                        break
                if not drop and points and f in fblooms:
                    for c, pv in points.items():
                        ent = fblooms[f].get(c)
                        if ent is not None and \
                                not _bloom_maybe_contains(ent, pv):
                            drop = True
                            files_pruned_bloom += 1
                            break
                if drop:
                    files_pruned += 1
                else:
                    files_kept += 1
                    sources.append(os.path.join(
                        self.data_dir, f"{PART_COL}={k}", f))
        report = {"preds": {c: list(r) for c, r in preds.items()},
                  "col": col, "lo": lo, "hi": hi,
                  "partitions_kept": kept,
                  "partitions_pruned": sorted(pruned + spec_pruned),
                  "pruned_by_spec": spec_pruned,
                  "pruned_by_stats": pruned,
                  "files_kept": files_kept,
                  "files_pruned": files_pruned,
                  "files_pruned_bloom": files_pruned_bloom}
        schema_src = snap if snap is not None else (
            self.snapshots()[-1] if self.snapshots() else None)
        schema = self._stored_schema(schema_src)
        if not kept or not sources:
            if schema is None:
                raise ValueError("nothing to scan and no stored schema")
            return spark.createDataFrame([], schema=schema), report
        reader = spark.read.option("basePath", self.data_dir)
        if schema is not None:
            reader = reader.schema(schema)
        df = reader.parquet(*sources)
        if snapshot_id is not None:
            # time travel is FILE-granular: drop later-sequenced
            # appends inside kept partition dirs, then apply only the
            # deletes committed at-or-before the snapshot
            pdels = self._pos_delete_snapshots(upto=snapshot_id)
            df = self._annotate_seq(
                spark, df, keep_pos=bool(pdels)).filter(
                F.col("_dseq") <= snapshot_id)
            for eq_cols, d in self._delete_dims(
                    spark, self._delete_snapshots(upto=snapshot_id)):
                df = df.join(F.broadcast(d), self._del_cond(eq_cols),
                             "left_anti")
            df = self._unannotate(
                self._apply_pos_deletes(spark, df, pdels))
        else:
            df = self._apply_deletes(spark, df, None)
        for c, (lo_, hi_) in preds.items():
            if lo_ is not None:
                df = df.filter(F.col(c) >= F.lit(lo_))
            if hi_ is not None:
                df = df.filter(F.col(c) <= F.lit(hi_))
        return df, report


def write_bucketed(df: DataFrame, table: str, path: str,
                   keys: list[str], buckets: int,
                   sort: bool = True) -> None:
    """Persist ``df`` as a BUCKETED external table (Spark's stored
    co-location contract — the open-format analog of Iceberg's
    bucket partition transform).

    Two tables bucketed by the same keys into the same bucket count
    join WITHOUT any Exchange: each task reads matching bucket files
    from both sides (plan-gated in tests/test_bucketed.py). At 100 TB
    this is the difference between re-shuffling the fact table on
    every join and paying the shuffle ONCE at write time — the right
    call for any join key used repeatedly (conv_id, doc_id, user_id).
    Bucket pruning applies to equality filters on the bucket key.
    External LOCATION keeps the data at ``path`` (no warehouse
    coupling); re-writing overwrites idempotently.

    ``sort=True`` sorts within buckets (and the pre-write repartition
    keeps one file per bucket, so each bucket IS globally sorted on
    disk). Note the planner still re-Sorts SMJ inputs — Spark dropped
    sorted-bucket-scan trust (SPARK-24528 lineage) because it cannot
    statically prove single-file buckets; the Exchange (the part that
    moves data between executors) is what bucketing eliminates, and
    the residual Sort is per-task over already-clustered rows.
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # co-locate each bucket's rows in one task: repartition uses the
    # same Murmur3 hash as the bucket spec, so the writer emits one
    # file per bucket instead of tasks x buckets small files
    df = df.repartition(buckets, *[F.col(k) for k in keys])
    w = df.write.mode("overwrite").bucketBy(buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.option("path", path).format("parquet").saveAsTable(table)


def _meta_snapshots(self, spark: SparkSession) -> DataFrame:
    """Iceberg ``t.snapshots`` metadata-table analog: commit history
    as a DataFrame (driver-side, manifests only — no data files
    touched)."""
    rows = [(int(s.get("snapshot_id", -1)),
             str(s.get("op", "append")),
             str(s.get("run_id", "")),
             len(s.get("committed_keys", [])),
             len(s.get("newly_committed", [])))
            for s in self.snapshots()]
    return spark.createDataFrame(
        rows or [(None, None, None, None, None)],
        "snapshot_id long, op string, run_id string,"
        " n_committed_keys int, n_newly_committed int").filter(
        F.col("snapshot_id").isNotNull())


def _meta_files(self, spark: SparkSession) -> DataFrame:
    """Iceberg ``t.files`` analog: one row per live data file with
    its partition, sequence number, size, per-file column bounds
    (``file_stats_json`` — the footer stats ``read_where`` skips on)
    and which columns carry a point-lookup bloom (``bloom_cols``) —
    the operational view behind compaction targeting and skew
    checks."""
    rows = []
    for k in sorted(self.committed_keys()):
        m = self.manifest(k) or {}
        fseq = m.get("file_seq") or {}
        fstats = m.get("file_stats") or {}
        fblooms = m.get("file_blooms") or {}
        base = int(m.get("data_snapshot_id", 0))
        for f in m.get("files", []):
            p = os.path.join(self.data_dir, f"{PART_COL}={k}", f)
            try:
                size = os.path.getsize(p)
            except OSError:
                size = None
            rows.append((k, f, int(fseq.get(f, base)), size,
                         json.dumps(fstats[f], sort_keys=True)
                         if f in fstats else None,
                         ",".join(sorted(fblooms[f]))
                         if f in fblooms else None))
    return spark.createDataFrame(
        rows or [(None, None, None, None, None, None)],
        f"{PART_COL} int, file string, data_snapshot_id long,"
        " size_bytes long, file_stats_json string,"
        " bloom_cols string").filter(
        F.col("file").isNotNull())


def _meta_partitions(self, spark: SparkSession) -> DataFrame:
    """Iceberg ``t.partitions`` analog: per-partition file count, row
    metric and recorded column stats."""
    rows = []
    for k in sorted(self.committed_keys()):
        m = self.manifest(k) or {}
        rows.append((k, str(m.get("run_id", "")),
                     len(m.get("files", [])),
                     (m.get("metrics") or {}).get("rows"),
                     json.dumps(m.get("col_stats"))
                     if m.get("col_stats") else None))
    return spark.createDataFrame(
        rows or [(None, None, None, None, None)],
        f"{PART_COL} int, run_id string, n_files int, rows long,"
        " col_stats_json string").filter(
        F.col(PART_COL).isNotNull())


def _meta_tags(self, spark: SparkSession) -> DataFrame:
    """Iceberg ``t.refs`` analog: named refs as a DataFrame —
    ``type`` distinguishes immutable tags from mutable branches
    (including a pinned main while a branch is diverged)."""
    rows = []
    for f in sorted(os.listdir(self.manifest_dir)):
        if f.startswith("tag-") and f.endswith(".json"):
            kind = "tag"
        elif f.startswith("branch-") and f.endswith(".json"):
            kind = "branch"
        else:
            continue
        with open(os.path.join(self.manifest_dir, f)) as fh:
            o = json.load(fh)
        rows.append((str(o["name"]), kind, int(o["snapshot_id"]),
                     float(o.get("created_at", 0.0))))
    return spark.createDataFrame(
        rows or [(None, None, None, None)],
        "name string, type string, snapshot_id long,"
        " created_at double").filter(F.col("name").isNotNull())


# Iceberg metadata-table analogs (``SELECT * FROM t.files`` etc.):
# the manifests surfaced AS DataFrames, so operational queries — file
# counts, skew, commit history, stats coverage — run in SQL instead
# of ad-hoc JSON spelunking.
IcebergLike.meta_snapshots = _meta_snapshots
IcebergLike.meta_files = _meta_files
IcebergLike.meta_partitions = _meta_partitions
IcebergLike.meta_tags = _meta_tags
