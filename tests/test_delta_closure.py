from __future__ import annotations

from pyspark.sql import functions as F

from sonata_neo4j_loader_spark.operators import delta, graph


def test_snapshot_diff_labels(spark):
    old = spark.createDataFrame(
        [(1, "h1"), (2, "h2"), (3, "h3")], "doc_id bigint, fingerprint string"
    )
    new = spark.createDataFrame(
        [(2, "h2"), (3, "h3x"), (4, "h4")], "doc_id bigint, fingerprint string"
    )
    got = {
        r.doc_id: (r.change, r.old_fingerprint, r.new_fingerprint)
        for r in delta.snapshot_diff(old, new).collect()
    }
    # doc 2 is unchanged and must be ABSENT
    assert got == {
        1: ("removed", "h1", None),
        3: ("changed", "h3", "h3x"),
        4: ("added", None, "h4"),
    }


def test_snapshot_diff_identical_snapshots_empty(spark):
    df = spark.createDataFrame([(1, "h")], "doc_id bigint, fingerprint string")
    assert delta.snapshot_diff(df, df).count() == 0


def _closure_oracle(edges):
    adj: dict[int, set[int]] = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
    out = set()
    for start in adj:
        stack, seen = [start], set()
        while stack:
            node = stack.pop()
            for nxt in adj.get(node, ()):
                if (start, nxt) not in out:
                    out.add((start, nxt))
                    if nxt not in seen:
                        seen.add(nxt)
                        stack.append(nxt)
    return out


def test_transitive_closure_chain_and_branch(spark):
    edges = [(1, 2), (2, 3), (3, 4), (2, 5), (9, 9)]  # chain + branch + self-loop
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {(r.src, r.dst) for r in graph.transitive_closure(df).collect()}
    assert got == _closure_oracle(edges)


def test_transitive_closure_cycle_terminates(spark):
    edges = [(1, 2), (2, 3), (3, 1)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {(r.src, r.dst) for r in graph.transitive_closure(df).collect()}
    # closure of a 3-cycle: every ordered pair including self-reach
    assert got == {(a, b) for a in (1, 2, 3) for b in (1, 2, 3)}


def test_transitive_closure_deep_chain_log_rounds(spark):
    # depth 40 converges within max_iterations=20 only because rounds
    # DOUBLE path length (a frontier loop would need 40)
    edges = [(i, i + 1) for i in range(40)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint").repartition(4)
    got = graph.transitive_closure(df, max_iterations=7)
    assert got.count() == 41 * 40 // 2
    # spot-check the longest path
    assert got.where((F.col("src") == 0) & (F.col("dst") == 40)).count() == 1
