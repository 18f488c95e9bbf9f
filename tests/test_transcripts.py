"""Unit semantics for the transcript-analytics operators
(datapipe/transcripts.py) on handmade conversations where every
output value is computed by eye — the oracle rehearsal
(test_oracle_queries) re-proves them relationally at sf0.01."""

from __future__ import annotations

from pyspark.sql import functions as F

from textract_demo_spark.datapipe.transcripts import (conversation_stats,
                                                      tool_transitions)

SCHEMA = ("conv_id string, turn_idx int, role string, tool string,"
          " ts timestamp")


def _turns(spark, rows):
    return spark.createDataFrame(
        [(c, i, r, t) for c, i, r, t in rows], SCHEMA.rsplit(",", 1)[0]
    ).withColumn(
        "ts", F.to_timestamp(
            F.lit("2026-01-01 00:00:00")) + F.make_interval(
            secs=F.col("turn_idx") * 10))


def test_tool_transitions_counts_and_rank(spark):
    rows = [
        # conv A: a->b, b->a, a->b   conv B: b->b
        ("A", 1, "user", "a"), ("A", 2, "assistant", "b"),
        ("A", 3, "user", "a"), ("A", 4, "assistant", "b"),
        ("B", 1, "user", "b"), ("B", 2, "assistant", "b"),
    ]
    got = {(r["tool_a"], r["tool_b"]): (r["cnt"], r["rank"])
           for r in tool_transitions(_turns(spark, rows), k=10).collect()}
    assert got == {("a", "b"): (2, 1), ("b", "a"): (1, 2),
                   ("b", "b"): (1, 3)}  # ties rank by (tool_a, tool_b)


def test_tool_transitions_never_crosses_conversations(spark):
    # adjacent rows in DIFFERENT convs must not pair up
    rows = [("A", 1, "user", "x"), ("B", 1, "user", "y")]
    assert tool_transitions(_turns(spark, rows), k=10).count() == 0


def test_conversation_stats_values(spark):
    ts0 = "2026-01-01 00:00:00"
    df = spark.createDataFrame(
        [("C", 1, "user", ts0),
         ("C", 2, "user", "2026-01-01 00:00:05"),       # role run
         ("C", 3, "assistant", "2026-01-01 02:00:05"),  # 2 h gap
         ("D", 1, "assistant", ts0)],                   # singleton conv
        "conv_id string, turn_idx int, role string, s string"
    ).select("conv_id", "turn_idx", "role",
             F.to_timestamp("s").alias("ts"), F.lit("t").alias("tool"))
    out = {r["conv_id"]: r for r in conversation_stats(
        df, max_gap_minutes=60, max_role_runs=0).collect()}
    c = out["C"]
    assert (c["n_turns"], c["n_user"], c["role_runs"]) == (3, 2, 1)
    assert c["max_gap_us"] == 7_200_000_000  # the 2 h gap
    assert c["sum_gap_us"] == 5_000_000 + 7_200_000_000
    assert not c["keep"]  # fails both arms
    d = out["D"]
    assert (d["n_turns"], d["role_runs"], d["max_gap_us"],
            d["sum_gap_us"]) == (1, 0, 0, 0)
    assert d["keep"]  # singleton: no gaps, no runs


def test_conversation_stats_orders_by_turn_idx_not_input_order(spark):
    # shuffled input rows must not change gap math
    df = spark.createDataFrame(
        [("C", 3, "user", "2026-01-01 00:00:20"),
         ("C", 1, "user", "2026-01-01 00:00:00"),
         ("C", 2, "user", "2026-01-01 00:00:10")],
        "conv_id string, turn_idx int, role string, s string"
    ).select("conv_id", "turn_idx", "role",
             F.to_timestamp("s").alias("ts"), F.lit("t").alias("tool"))
    r = conversation_stats(df).collect()[0]
    assert (r["max_gap_us"], r["sum_gap_us"]) == (10_000_000, 20_000_000)


def test_rrf_fuse_integer_algebra(spark):
    from textract_demo_spark.datapipe.search import rrf_fuse
    a = spark.createDataFrame([(1, 1), (2, 2)], "doc_id long, rank long")
    b = spark.createDataFrame([(2, 1), (3, 2)], "doc_id long, rank long")
    got = {r["doc_id"]: r for r in rrf_fuse([a, b], k0=60, k=10).collect()}
    # doc 2: 1e6//62 + 1e6//61 = 16129 + 16393
    assert got[2]["rrf_micro"] == 16129 + 16393
    assert got[2]["n_arms"] == 2 and got[2]["fused_rank"] == 1
    # docs 1 and 3: same score 1e6//61 / 1e6//62 resp.
    assert got[1]["rrf_micro"] == 16393 and got[1]["fused_rank"] == 2
    assert got[3]["rrf_micro"] == 16129 and got[3]["fused_rank"] == 3
