"""k-hop neighborhood extraction (graph.k_hop_neighborhood): BFS
min-distance semantics on cycles, diamonds, parallel edges, and drained
frontiers."""

from __future__ import annotations

import pytest

from sonata_neo4j_loader_spark.operators import graph


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "subj string, obj string")


def _seeds(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "seed string")


def test_bfs_min_distance_on_diamond_and_cycle(spark):
    # diamond a->b->d, a->c->d (d reachable two ways, hop must be min=2)
    # plus a cycle d->a (revisiting a must NOT re-emit it)
    e = _edges(spark, [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("d", "a")])
    got = {
        (r.seed, r.node): r.hop
        for r in graph.k_hop_neighborhood(e, _seeds(spark, ["a"]), k=4).collect()
    }
    assert got == {("a", "a"): 0, ("a", "b"): 1, ("a", "c"): 1, ("a", "d"): 2}


def test_multi_seed_and_hop_bound(spark):
    # chain a->b->c->d: from a with k=2 d is out of reach; from c it isn't
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    got = {
        (r.seed, r.node): r.hop
        for r in graph.k_hop_neighborhood(e, _seeds(spark, ["a", "c"]), k=2).collect()
    }
    assert got == {
        ("a", "a"): 0,
        ("a", "b"): 1,
        ("a", "c"): 2,
        ("c", "c"): 0,
        ("c", "d"): 1,
    }


def test_parallel_edges_and_early_exit(spark):
    # parallel a->b edges collapse; frontier drains after hop 1 long
    # before k=10 (early exit, no fabricated rows)
    e = _edges(spark, [("a", "b"), ("a", "b")])
    rows = sorted(
        map(tuple, graph.k_hop_neighborhood(e, _seeds(spark, ["a"]), k=10).collect())
    )
    assert rows == [("a", "a", 0), ("a", "b", 1)]


def test_k_zero_and_negative(spark):
    e = _edges(spark, [("a", "b")])
    rows = graph.k_hop_neighborhood(e, _seeds(spark, ["a"]), k=0).collect()
    assert [tuple(r) for r in rows] == [("a", "a", 0)]
    with pytest.raises(ValueError):
        graph.k_hop_neighborhood(e, _seeds(spark, ["a"]), k=-1)
