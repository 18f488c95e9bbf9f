"""Conversation-level analytics over agent-transcript turn tables.

The input the north rule centers on is a table of multi-turn
conversation / agent transcripts (conv_id, turn_idx, role, text,
tool, ts). Curating that corpus for training needs per-CONVERSATION
integrity signals that no per-turn operator provides:

- **Tool-transition mining** (`tool_transitions`): corpus-wide counts
  of adjacent (tool -> next tool) pairs in turn order — the behavioral
  n-gram of an agent corpus. Used to find degenerate loops (a tool
  calling itself thousands of times), to weight trajectory sampling,
  and to spot distribution drift between snapshots.
- **Conversation integrity stats** (`conversation_stats`): per-conv
  turn counts by role, adjacent same-role runs (a broken
  user/assistant alternation is how truncated or merged transcripts
  show up), and inter-turn gap extremes (a multi-hour gap inside one
  conv usually means two sessions were glued under one id). Emits a
  `keep` verdict so the operator slots into the curation cascade the
  same way the Gopher rules do.

Scale shapes (the part that matters at 10^12 turns):

- Both operators start with ONE exchange on conv_id. The lag/lead
  windows are per-conversation (never a global window), and
  `conversation_stats`' final groupBy(conv_id) REUSES the window's
  hash partitioning — EnsureRequirements inserts no second exchange,
  so the whole per-conv pass is scan -> shuffle(conv_id) -> narrow
  (gated in tests/test_plans.py).
- A hot conversation concentrates on one task here BY DESIGN: unlike
  extraction (embarrassingly per-turn, hence salted), adjacency and
  alternation need the conversation's turns together. The state per
  conv is O(turns-in-conv) rows streamed through a sort, not
  collected; the known mitigation for a pathological 10^8-turn conv
  is a turn-range pre-split upstream, which changes gap semantics at
  the seams and is deliberately not silently applied.
- `tool_transitions` adds one exchange on the (a, b) pair key with
  map-side partial aggregation (pair cardinality ~= |tools|^2, tiny)
  and a global top-k that Spark executes as WindowGroupLimit — every
  task forwards at most k rows.

All arithmetic is integer (microsecond epochs via unix_micros /
epoch_us, counts) so DuckDB replays results bit-for-bit.

Reference analog: textract-demo tracks per-document pipeline health
(processing status transitions in the DynamoDB table,
source/ocr/README.md state machine); at corpus scale the same "did
this item move through the expected sequence" question inverts into
transition mining over the whole table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tool_transitions(turns: DataFrame, k: int = 20,
                     conv_col: str = "conv_id",
                     order_col: str = "turn_idx",
                     tool_col: str = "tool") -> DataFrame:
    """Top-k adjacent (tool -> next tool) transition counts in turn
    order, corpus-wide. Output (tool_a, tool_b, cnt, rank); rows with
    no successor turn contribute nothing; ties rank deterministically
    (cnt desc, tool_a, tool_b)."""
    w = Window.partitionBy(conv_col).orderBy(order_col)
    pairs = (turns
             .select(F.col(tool_col).alias("tool_a"),
                     F.lead(tool_col).over(w).alias("tool_b"))
             .filter(F.col("tool_b").isNotNull()))
    counts = (pairs.groupBy("tool_a", "tool_b")
              .agg(F.count("*").cast("long").alias("cnt")))
    rw = Window.orderBy(F.col("cnt").desc(), "tool_a", "tool_b")
    return (counts
            .withColumn("rank", F.row_number().over(rw).cast("long"))
            .filter(F.col("rank") <= k))


def conversation_stats(turns: DataFrame,
                       max_gap_minutes: int = 120,
                       max_role_runs: int = 3,
                       conv_col: str = "conv_id",
                       order_col: str = "turn_idx",
                       role_col: str = "role",
                       ts_col: str = "ts") -> DataFrame:
    """Per-conversation integrity rollup + keep verdict.

    Output per conv_id: n_turns, n_user, role_runs (adjacent
    same-role pairs — 0 for a perfectly alternating transcript),
    max_gap_us / sum_gap_us (microsecond inter-turn gaps), and
    ``keep`` = (max gap <= max_gap_minutes AND role_runs <=
    max_role_runs). Integer-only arithmetic."""
    from .temporal import _us
    w = Window.partitionBy(conv_col).orderBy(order_col)
    lagged = turns.select(
        conv_col,
        F.col(role_col).alias("_role"),
        F.lag(role_col).over(w).alias("_prev_role"),
        (_us(ts_col) - F.lag(_us(ts_col)).over(w)).alias("_gap_us"))
    out = (lagged.groupBy(conv_col).agg(
        F.count("*").cast("long").alias("n_turns"),
        F.sum(F.when(F.col("_role") == "user", 1).otherwise(0))
         .cast("long").alias("n_user"),
        F.sum(F.when(F.col("_role") == F.col("_prev_role"), 1)
               .otherwise(0)).cast("long").alias("role_runs"),
        F.coalesce(F.max("_gap_us"), F.lit(0)).cast("long")
         .alias("max_gap_us"),
        F.coalesce(F.sum("_gap_us"), F.lit(0)).cast("long")
         .alias("sum_gap_us")))
    return out.withColumn(
        "keep",
        (F.col("max_gap_us") <= F.lit(max_gap_minutes * 60_000_000))
        & (F.col("role_runs") <= F.lit(max_role_runs)))
