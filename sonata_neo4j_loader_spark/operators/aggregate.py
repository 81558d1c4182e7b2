"""Aggregation layer — AGGREGATED_SYNAPSE triples.

Implements the *intended* semantics of the reference's group-pair
aggregation (per-(g1,g2) averages over contributing synapses,
``circuit/neo4j_operations.py:232-261``) and the rich 11-measure +
afferent-type-distribution variant from ``scripts/load_circuit.py:502-552``.
The reference script's Cypher is bugged — it keeps the edge variable ``r``
in the ``WITH`` grouping key (load_circuit.py:514) so each "average" is a
single edge; SURVEY.md §3.2 flags this, and tests here pin the intended
per-pair behavior instead.

Physical shape: synapses (fact) join the neuron→group map (dimension,
broadcast) twice, then one partial+final hash aggregation on the pair key.
One shuffle total on (src_group, tgt_group).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RICH_MEASURES = [
    "branch_order",
    "conductance",
    "conductance_scale_factor",
    "decay_time",
    "delay",
    "depression_time",
    "facilitation_time",
    "n_rrp_vesicles",
    "spine_length",
    "u_hill_coefficient",
    "u_syn",
]


def _with_groups(
    synapses: DataFrame, neuron_groups: DataFrame, broadcast_groups: bool = True
) -> DataFrame:
    """Attach src_group/tgt_group via the neuron→group dimension (×2 joins).

    ``neuron_groups``: (neuron_id, group) — e.g. the HAS_MTYPE triples.
    The Cypher 4-way pattern join (``neo4j_operations.py:246-250``)
    collapses to two dimension joins: the group node "join" is free
    because the group name is the key (SURVEY.md §2.4).
    """
    src = neuron_groups.select(
        F.col("neuron_id").alias("subj"), F.col("group").alias("src_group")
    )
    tgt = neuron_groups.select(
        F.col("neuron_id").alias("obj"), F.col("group").alias("tgt_group")
    )
    if broadcast_groups:
        src, tgt = F.broadcast(src), F.broadcast(tgt)
    return synapses.join(src, "subj", "inner").join(tgt, "obj", "inner")


def aggregated_synapse_triples(
    synapses: DataFrame,
    neuron_groups: DataFrame,
    group_prefix: str,
    broadcast_groups: bool = True,
) -> DataFrame:
    """Default variant: avg(conductance), avg(delay) per (g1, g2).

    ≙ ``create_nodegroup_relationships`` (neo4j_operations.py:246-252,
    invoked for mtype and synapse_class at circuit_loader.py:58-59).
    """
    joined = _with_groups(synapses, neuron_groups, broadcast_groups)
    return joined.groupBy("src_group", "tgt_group").agg(
        F.count(F.lit(1)).alias("n_synapses"),
        F.avg(F.element_at("props", "conductance")).alias("avg_conductance"),
        F.avg(F.element_at("props", "delay")).alias("avg_delay"),
    ).select(
        F.col("src_group").alias("subj"),
        F.lit(f"AGGREGATED_SYNAPSE_{group_prefix}").alias("pred"),
        F.col("tgt_group").alias("obj"),
        "n_synapses",
        "avg_conductance",
        "avg_delay",
    )


def rich_aggregated_synapse_triples(
    synapses: DataFrame,
    neuron_groups: DataFrame,
    group_prefix: str = "MTYPE",
    broadcast_groups: bool = True,
) -> DataFrame:
    """Rich variant: 11 averages + normalized afferent-type distribution map.

    ≙ intended semantics of ``scripts/load_circuit.py:511-545``: per-pair
    ``avg`` over every measure, plus ``collect(afferent_section_type)``
    reduced to a relative-frequency map (``apoc.map.fromPairs`` →
    ``map_from_entries``). The distribution is computed with a second
    grouping on (pair, type) + a pair-total join — no giant
    ``collect_list`` per pair, which would hotspot on skewed pairs at
    scale.
    """
    joined = _with_groups(synapses, neuron_groups, broadcast_groups)

    # ONE pass over the fact frame (optimization r06): the r05 shape
    # aggregated `joined` twice — once for the per-pair averages, once for
    # the per-(pair, type) distribution counts — re-running the corpus
    # join + scan per consumer. Aggregating at the FINER key first
    # (pair, afferent_section_type) lets both outputs derive from the
    # level-1 frame, which is dimension-sized (pairs × |type domain|):
    # avg_m = sum(sum_m)/sum(cnt_m) per pair (identical semantics — avg
    # ignores nulls, all-null groups stay null because sum of nulls is
    # null), and the distribution counts are the level-1 rows themselves.
    level1 = joined.groupBy("src_group", "tgt_group", "afferent_section_type").agg(
        F.count(F.lit(1)).alias("_cnt"),
        *[
            F.sum(F.element_at("props", m)).alias(f"_sum_{m}")
            for m in RICH_MEASURES
        ],
        *[
            F.count(F.element_at("props", m)).alias(f"_n_{m}")
            for m in RICH_MEASURES
        ],
    )
    avgs = level1.groupBy("src_group", "tgt_group").agg(
        F.sum("_cnt").alias("n_synapses"),
        *[
            (F.sum(f"_sum_{m}") / F.sum(f"_n_{m}")).alias(f"avg_{m}")
            for m in RICH_MEASURES
        ],
    )
    by_type = level1.where(F.col("afferent_section_type").isNotNull()).select(
        "src_group",
        "tgt_group",
        "afferent_section_type",
        F.col("_cnt").alias("cnt"),
    )
    # window-free normalization: totals come from the avgs frame (n_synapses)
    totals = avgs.select("src_group", "tgt_group", "n_synapses")
    dist = (
        by_type.join(totals, ["src_group", "tgt_group"])
        .withColumn("freq", F.col("cnt") / F.col("n_synapses"))
        .groupBy("src_group", "tgt_group")
        .agg(
            F.map_from_entries(
                F.sort_array(
                    F.collect_list(F.struct("afferent_section_type", "freq"))
                )
            ).alias("afferent_distribution")
        )
    )
    return (
        avgs.join(dist, ["src_group", "tgt_group"], "left")
        .select(
            F.col("src_group").alias("subj"),
            F.lit(f"AGGREGATED_SYNAPSE_RICH_{group_prefix}").alias("pred"),
            F.col("tgt_group").alias("obj"),
            "n_synapses",
            *[f"avg_{m}" for m in RICH_MEASURES],
            "afferent_distribution",
        )
    )
