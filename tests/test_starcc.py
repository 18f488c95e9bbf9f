"""Large-star/small-star connected components (datapipe/dedup.py
star_clusters): correctness vs a driver-side union-find, parity with
the label-propagation operator, and the high-diameter case that label
propagation cannot reach in bounded rounds."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from textract_demo_spark.datapipe.dedup import (neardup_clusters,
                                                release_cached,
                                                star_clusters)


def _union_find(n_ids, edges):
    parent = {i: i for i in n_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in n_ids}


def _frames(spark, ids, edges):
    ids_df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    if edges:
        pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    else:
        pairs = spark.createDataFrame([], "id_a long, id_b long")
    return ids_df, pairs


def _run(spark, ids, edges):
    ids_df, pairs = _frames(spark, ids, edges)
    return {r["doc_id"]: r["cluster_id"]
            for r in star_clusters(ids_df, pairs).collect()}


def test_chain_diameter_100(spark):
    """A 100-long chain (diameter 99): label propagation at its
    default 25 rounds raises; star contraction converges in a
    handful of rounds and labels every node with the chain min."""
    ids = list(range(100))
    edges = [(i, i + 1) for i in range(99)]
    assert _run(spark, ids, edges) == {i: 0 for i in ids}
    ids_df, pairs = _frames(spark, ids, edges)
    with pytest.raises(RuntimeError, match="did not converge"):
        neardup_clusters(ids_df, pairs, max_iters=8)


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_random_graph_matches_union_find(spark, seed):
    rng = random.Random(seed)
    ids = list(range(60))
    edges = [(rng.randrange(60), rng.randrange(60)) for _ in range(45)]
    edges = [e for e in edges if e[0] != e[1]]
    assert _run(spark, ids, edges) == _union_find(ids, edges)


def test_isolated_and_empty(spark):
    # no edges at all: everyone labels themselves
    assert _run(spark, [3, 7, 9], []) == {3: 3, 7: 7, 9: 9}
    # some isolated, some clustered, duplicate + reversed edges
    got = _run(spark, [0, 1, 2, 3, 4],
               [(1, 2), (2, 1), (1, 2), (3, 4)])
    assert got == {0: 0, 1: 1, 2: 1, 3: 3, 4: 3}


def test_matches_label_propagation(spark):
    rng = random.Random(7)
    ids = list(range(40))
    edges = [(rng.randrange(40), rng.randrange(40)) for _ in range(25)]
    edges = [e for e in edges if e[0] != e[1]]
    ids_df, pairs = _frames(spark, ids, edges)
    star = _run(spark, ids, edges)
    lp = neardup_clusters(ids_df, pairs)
    got = {r["doc_id"]: r["cluster_id"] for r in lp.collect()}
    release_cached(lp)
    assert star == got


def test_star_of_hot_hub(spark):
    """The skew shape: one doc near-dups 500 others (hub degree 500).
    One large-star round points every larger neighbor at the min."""
    ids = list(range(501))
    edges = [(0, i) for i in range(1, 501)]
    assert _run(spark, ids, edges) == {i: 0 for i in ids}
