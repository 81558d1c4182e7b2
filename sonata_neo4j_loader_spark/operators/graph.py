"""Graph analytics over the emitted triple tables.

The reference stops at loading the graph into Neo4j and leaves analytics
to Cypher; a distributed triple factory can run the standard graph
measures in-engine over the ``(subj, pred, obj)`` edge table:

* :func:`degree_stats` — in/out degree per node, one aggregation each.
* :func:`pagerank` — classic damped PageRank by iterated join+aggregate:
  rank/out_degree flows along edges, dangling mass redistributes
  uniformly. Each iteration is one broadcast-or-shuffle join plus one
  groupBy; ranks are node-table-sized (dimension-scale), so at 10^12
  edges the edge table is the only big side and it is scanned once per
  iteration with the rank frame broadcast. ``localCheckpoint`` every few
  rounds truncates the growing lineage, same discipline as the
  connected-components loop (operators/canonicalize.py).

Edges are treated as a multiset (SYNAPSES_ONTO is CREATE semantics —
parallel edges carry proportionally more rank), matching what Cypher
aggregation over the loaded graph would see.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def degree_stats(edges: DataFrame, src: str = "subj", dst: str = "obj") -> DataFrame:
    """Per-node in/out degree over a (possibly multiset) edge table."""
    out_deg = edges.groupBy(F.col(src).alias("node")).agg(
        F.count(F.lit(1)).alias("out_degree")
    )
    in_deg = edges.groupBy(F.col(dst).alias("node")).agg(
        F.count(F.lit(1)).alias("in_degree")
    )
    return (
        out_deg.join(in_deg, "node", "full_outer")
        .select(
            "node",
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
        )
    )


def pagerank(
    edges: DataFrame,
    src: str = "subj",
    dst: str = "obj",
    damping: float = 0.85,
    n_iterations: int = 20,
    checkpoint_every: int = 5,
) -> DataFrame:
    """Damped PageRank with uniform dangling-mass redistribution.

    Fixed iteration count (not convergence-tested) so results are
    deterministic and cross-checkable against an independent
    implementation. Output: (node, rank), ranks summing to 1.
    """
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    n_nodes = nodes.count()
    out_deg = edges.groupBy(F.col(src).alias("node")).agg(
        F.count(F.lit(1)).alias("out_degree")
    )
    ranks = nodes.withColumn("rank", F.lit(1.0 / n_nodes))
    base = (1.0 - damping) / n_nodes

    for i in range(n_iterations):
        with_deg = ranks.join(out_deg, "node", "left")
        # dangling nodes (no out-edges) spread their whole rank uniformly
        dangling = (
            with_deg.where(F.col("out_degree").isNull())
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("d"))
            .first()["d"]
        )
        contribs = (
            edges.join(
                F.broadcast(
                    with_deg.where(F.col("out_degree").isNotNull()).select(
                        F.col("node").alias(src),
                        (F.col("rank") / F.col("out_degree")).alias("share"),
                    )
                ),
                src,
            )
            .groupBy(F.col(dst).alias("node"))
            .agg(F.sum("share").alias("incoming"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (F.coalesce("incoming", F.lit(0.0)) + F.lit(dangling / n_nodes))
                ).alias("rank"),
            )
        )
        if (i + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks
