"""Connected components (alternating large-star/small-star).

Ground truth comes from a driver-side union-find over the same edge list —
the operator must agree exactly: every node incident to an edge mapped to
the minimum node id of its component.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from topicrawler_spark.pipeline.dedup import connected_components


def _union_find_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    par: dict[int, int] = {}

    def find(x: int) -> int:
        par.setdefault(x, x)
        while par[x] != x:
            par[x] = par[par[x]]
            x = par[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            par[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in par}


def _run(spark, edges: list[tuple[int, int]]) -> dict[int, int]:
    df = spark.createDataFrame(edges, "src long, dst long")
    out = connected_components(df).collect()
    return {r["node"]: r["component"] for r in out}


def test_components_match_union_find_random_graph(spark):
    rng = random.Random(7)
    edges = [(rng.randrange(200), rng.randrange(200)) for _ in range(120)]
    edges = [e for e in edges if e[0] != e[1]]
    got = _run(spark, edges)
    assert got == _union_find_components(edges)


def test_components_long_chain_converges(spark):
    # a 64-node path is the worst case for label propagation (63 rounds);
    # large-star/small-star must finish within the operator's max_iter
    edges = [(i, i + 1) for i in range(63)]
    got = _run(spark, edges)
    assert got == {i: 0 for i in range(64)}


def test_components_multiple_and_duplicate_edges(spark):
    # two components + duplicate/reversed edges + a self-loop to ignore
    edges = [(5, 3), (3, 5), (3, 9), (9, 9), (20, 21), (21, 20), (22, 21)]
    got = _run(spark, edges)
    assert got == {3: 3, 5: 3, 9: 3, 20: 20, 21: 20, 22: 20}


def test_components_empty_edges(spark):
    df = spark.createDataFrame([], "src long, dst long")
    assert connected_components(df).count() == 0


def test_dedup_by_components_keeps_canonicals(spark):
    from topicrawler_spark.pipeline.dedup import dedup_by_components

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(8)], "doc_id long, text string"
    )
    edges = spark.createDataFrame([(1, 4), (4, 6), (2, 3)], "src long, dst long")
    comp = connected_components(edges)
    kept = sorted(
        r["doc_id"] for r in dedup_by_components(docs, comp).collect()
    )
    # clusters {1,4,6} -> keep 1, {2,3} -> keep 2; 0,5,7 untouched
    assert kept == [0, 1, 2, 5, 7]
