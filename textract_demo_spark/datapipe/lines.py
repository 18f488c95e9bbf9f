"""Line-level corpus cleaning — the C4 pipeline's cleaning tier
(Raffel et al. 2020, "Exploring the Limits of Transfer Learning",
§2.2 public heuristics), re-expressed Spark-first.

Two operators:

* ``c4_line_filter`` — per-document line hygiene: keep lines that end
  in terminal punctuation, carry a minimum word count, and contain
  neither the lorem-ipsum marker nor a curly brace (the code/JS
  tell); drop documents left with too few lines. Entirely narrow
  higher-order array expressions (split -> filter -> array_join):
  zero shuffles, zero Python — cleaning 10^12 docs costs one scan.
* ``line_dedup`` — corpus-wide exact line deduplication, keep-first:
  every distinct (normalized) line survives once, at its globally
  first (doc_id, line_idx) occurrence. Deliberately NOT a window
  min-rank: boilerplate lines are by construction the hottest keys
  in a web corpus (a navigation line can occur in 10% of all docs),
  and ``row_number() over (partition by line_hash)`` funnels every
  occurrence of a hot line into ONE task — windows get no AQE skew
  split. Instead: a partial-aggregated ``min(struct(doc_id,
  line_idx))`` per line hash (map-side combine reduces a 10^9-hot
  line to one row per map task before the shuffle), then a
  left-anti equi-join on the full (h0, h1, doc_id, line_idx) quad —
  uniformly distributed even for hot lines, since doc_id/line_idx
  vary. Every exchange ships narrow hash/position rows; line text
  never shuffles.

Both are DuckDB-replayable (driver queries ``c4_line_filter`` /
``line_dedup_rewrite``): the filter predicates are shared regex/
arithmetic, and keep-first ranks by the same (doc_id, line_idx)
total order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# terminal punctuation per C4: . ! ? plus one closing quote/bracket.
# The quote chars are spelled as \xNN escapes (\x22 " , \x27 ' ,
# \x5D ]) so the pattern embeds in a single-quoted SQL literal
# without quoting games; Spark's literal parser eats one backslash
# level, hence the doubled backslashes here.
_TERMINAL_RE_SPARK = r"[.!?][\\x22\\x27)\\x5D]?$"
_LOREM = "lorem ipsum"


def c4_line_filter(docs: DataFrame, text_col: str = "text",
                   min_words: int = 3,
                   min_lines: int = 1) -> DataFrame:
    """C4 line hygiene: per-line keep iff (ends in terminal
    punctuation) AND (>= min_words whitespace words) AND (no
    'lorem ipsum', case-insensitive) AND (no '{'). Documents
    retaining fewer than ``min_lines`` lines are dropped.

    Output: (input columns...) with ``clean_text`` (kept lines
    joined by '\\n'), ``n_lines_kept``, ``n_lines_dropped`` — exact
    integers; rows filtered to n_lines_kept >= min_lines.
    """
    lines = f"split({text_col}, '\\n')"
    keep = (f"filter({lines}, l -> "
            f"l rlike '{_TERMINAL_RE_SPARK}' "
            f"AND size(split(trim(l), '\\\\s+')) >= {min_words} "
            f"AND NOT contains(lower(l), '{_LOREM}') "
            f"AND NOT contains(l, '{{'))")
    return (docs
            .withColumn("_kept", F.expr(keep))
            .withColumn("n_lines_kept",
                        F.expr("size(_kept)").cast("long"))
            .withColumn("n_lines_dropped",
                        (F.expr(f"size({lines})")
                         - F.col("n_lines_kept")).cast("long"))
            .withColumn("clean_text",
                        F.expr("array_join(_kept, '\\n')"))
            .drop("_kept")
            .filter(F.col("n_lines_kept") >= min_lines))


def line_dedup(docs: DataFrame, id_col: str = "doc_id",
               text_col: str = "text",
               normalize: bool = True) -> DataFrame:
    """Corpus-wide exact line dedup, keep-first (C4 §2.2's
    'deduplicate at the span level' sibling at line granularity, and
    the common log/boilerplate-line scrubber): a line's first
    occurrence in (doc_id, line_idx) order survives; every later
    occurrence anywhere in the corpus is excised.

    ``normalize=True`` compares lines lowercased/whitespace-collapsed
    (the dedup key) while PRESERVING each surviving line's original
    text. Empty lines are never deduped (they are structure, not
    content).

    Output: (id, clean_text, n_lines, n_lines_removed). Scale shape
    (see module docstring for why this is NOT a window): partial-agg
    min per line hash -> anti-join losers on the uniform (h0, h1, id,
    line_idx) quad -> per-doc drop lists; the rebuild join touches
    only docs that lost a line.
    """
    norm = ("lower(regexp_replace(trim(line), '\\\\s+', ' '))"
            if normalize else "line")
    # narrow key rows: LINE TEXT NEVER SHUFFLES — only
    # (id, line_idx, h0, h1). The key is a 128-bit hash pair, same
    # reason as dedup.py's windowed (h0, h1): at 10^12 lines a single
    # 64-bit key takes real birthday collisions, each one silently
    # deleting an innocent line.
    keys = (docs
            .select(F.col(id_col),
                    F.posexplode(F.expr(f"split({text_col}, '\\n')"))
                    .alias("line_idx", "line"))
            .filter(F.expr("trim(line) != ''"))
            .select(id_col, "line_idx",
                    F.expr(f"xxhash64({norm})").alias("h0"),
                    F.expr(f"xxhash64({norm}, 1)").alias("h1")))
    # global first occurrence per line: min(struct) partial-aggregates
    # map-side, so a line occurring 10^9 times shuffles as one row per
    # map task, not 10^9 rows to one reducer
    winners = (keys.groupBy("h0", "h1")
               .agg(F.min(F.struct(F.col(id_col).alias("i"),
                                   F.col("line_idx").alias("x")))
                    .alias("_w"))
               .select("h0", "h1",
                       F.col("_w.i").alias(id_col),
                       F.col("_w.x").alias("line_idx")))
    # losers = every occurrence that is not its line's winner. The
    # anti-join keys include (id, line_idx), so hot lines spread
    # uniformly across partitions (and AQE can skew-split besides)
    losers = (keys.join(winners, ["h0", "h1", id_col, "line_idx"],
                        "left_anti")
              .select(id_col, "line_idx"))
    drops = (losers.groupBy(id_col)
             .agg(F.collect_set("line_idx").alias("_drop_idx")))
    # excision join: only docs that LOST a line carry a _drop_idx
    # list; at corpus scale the drop table is small relative to the
    # corpus and AQE broadcasts it — the corpus never shuffles
    return (docs.join(drops, id_col, "left")
            .withColumn("n_lines",
                        F.expr(f"size(split({text_col}, '\\n'))")
                        .cast("long"))
            .withColumn("n_lines_removed",
                        F.coalesce(F.expr("size(_drop_idx)"), F.lit(0))
                        .cast("long"))
            .withColumn(
                "clean_text",
                F.when(F.col("_drop_idx").isNull(), F.col(text_col))
                .otherwise(F.expr(f"""
                    array_join(filter(split({text_col}, '\\n'),
                      (l, i) -> NOT array_contains(_drop_idx, i)),
                      '\\n')""")))
            .drop("_drop_idx"))
