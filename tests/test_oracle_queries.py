"""Driver-contract rehearsal: run every ``__spark_entry__.queries()``
entry at sf0.01 and compare to its DuckDB ``oracle_sql()`` the same way
the driver does (row count + sorted-column order-insensitive values).
"""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _duck(sql: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')")
    return con.sql(sql).df()


def _normalize(df):
    import pandas as pd
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].map(
                lambda v: "null" if v is None or (isinstance(v, float)
                                                  and math.isnan(v))
                else f"{v:.9g}")
        elif "datetime" in str(df[c].dtype):
            df[c] = df[c].astype(str)
        else:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.mark.parametrize("name", sorted(ORACLES.keys()))
def test_query_matches_oracle(spark, name):
    from textract_demo_spark.datapipe.dedup import release_cached
    df = QUERIES[name](spark, SF_DIR)
    got = _normalize(df.toPandas())
    # pair/cluster/semdedup queries return frames carrying persisted
    # handles; one long pytest session runs all ~70 — release per
    # query or executor storage accumulates across the whole run
    release_cached(df)
    exp = _normalize(_duck(ORACLES[name]))
    assert list(got.columns) == list(exp.columns), (
        f"{name}: columns {list(got.columns)} != {list(exp.columns)}")
    assert len(got) == len(exp), f"{name}: rows {len(got)} != {len(exp)}"
    neq = (got != exp).any(axis=1)
    if neq.any():
        i = neq.idxmax()
        raise AssertionError(
            f"{name}: value mismatch at sorted row {i}\n"
            f"got: {got.iloc[i].to_dict()}\nexp: {exp.iloc[i].to_dict()}")


def test_all_queries_have_entries():
    assert set(ORACLES) <= set(QUERIES)
    assert len(QUERIES) >= 15


def test_driver_window_covers_priority_queries():
    """The driver oracles the FIRST 50 registered queries; the
    explicit priority order must lead the registry and fill that
    window, and queries() / oracle_sql() must stay in the same order
    (r03 lost 17 rows to registry order — this pins the fix).
    _PRIORITY may exceed 50 when every new-in-round query can't fit;
    anything past position 50 must already hold a green row in a
    prior round's CORRECTNESS file (see the comment in
    __spark_entry__._PRIORITY)."""
    names = list(QUERIES)
    assert names[:len(entrymod._PRIORITY)] == entrymod._PRIORITY
    assert len(entrymod._PRIORITY) >= 50
    overflow = entrymod._PRIORITY[50:]
    # every overflow name must hold a green (rows+schema+hash) row in
    # a prior round's CORRECTNESS file — computed, not hand-pinned
    import json
    import os
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    prior_green: set[str] = set()
    for fn in sorted(os.listdir(root)):
        if fn.startswith("CORRECTNESS_r") and fn.endswith(".json"):
            with open(os.path.join(root, fn)) as fh:
                rec = json.load(fh)
            prior_green |= {
                k for k, v in rec.items()
                if isinstance(v, dict) and v.get("rows_match")
                and v.get("schema_match") and v.get("hash_match")
                and not v.get("err")}
    not_proven = set(overflow) - prior_green
    assert not not_proven, (
        f"queries past the driver window without a prior green"
        f" CORRECTNESS row: {sorted(not_proven)}")
    oracle_names = list(ORACLES)
    assert oracle_names == [n for n in names if n in ORACLES]
