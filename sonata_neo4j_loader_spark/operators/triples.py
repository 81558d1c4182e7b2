"""Stage 5 — triple factory: assemble (subj, pred, obj) rows.

Predicate vocabulary ≙ the reference's Cypher relationship types
(FIXTURES.md §5):

===================  =====================  ==========================================
pred                 reference type         reference source
===================  =====================  ==========================================
SYNAPSES_ONTO        SYNAPSE (CREATE)       circuit/neo4j_operations.py:376-420
HAS_MTYPE            BELONGS_TO_MTYPE       neo4j_operations.py:196-229 (MERGE)
HAS_SCLASS           BELONGS_TO_SCLASS      neo4j_operations.py:104-156 (MERGE)
HAS_ETYPE            (generic nodegroup)    neo4j_operations.py:159-193 (param label)
BELONGS_TO           BELONGS_TO             neo4j_operations.py:349-372 (MERGE)
HAS_MORPHOLOGY       (node attribute)       nodes_A.h5.txt dataset "morphology"
===================  =====================  ==========================================

MERGE ⇒ ``dropDuplicates`` on (subj, pred, obj); CREATE ⇒ multiset, one
row per source document. Cypher ``MATCH`` on both endpoints silently drops
edges referencing unknown neurons (``neo4j_operations.py:387-393``) — here
that is an inner join against the detected-neuron set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# mention kind -> predicate for neuron attribute triples
ATTRIBUTE_PREDICATES: dict[str, str] = {
    "mtype": "HAS_MTYPE",
    "etype": "HAS_ETYPE",
    "sclass": "HAS_SCLASS",
    "population": "BELONGS_TO",
    "media": "HAS_MORPHOLOGY",
}


def neuron_attribute_triples(linked: DataFrame) -> DataFrame:
    """linked mentions -> deduped neuron-attribute triples (MERGE semantics).

    Within each document, the neuron mention is the subject and every
    co-mentioned attribute entity is an object. The doc_id equi-join stands
    in for Cypher's per-row ``MATCH (n:Neuron {..}) MATCH (g {name: ..})``
    pattern (reference ``neo4j_operations.py:216-221``): the "join" to the
    group is free because the group name *is* the key (SURVEY.md §2.4).
    """
    subjects = linked.where(F.col("kind") == "neuron").select(
        "doc_id", F.col("entity_id").alias("subj")
    )
    pred_map = F.create_map(
        *[x for k, v in ATTRIBUTE_PREDICATES.items() for x in (F.lit(k), F.lit(v))]
    )
    objects = linked.where(F.col("kind") != "neuron").select(
        "doc_id",
        pred_map[F.col("kind")].alias("pred"),
        F.col("entity_id").alias("obj"),
    )
    return (
        subjects.join(objects, "doc_id")
        .select("subj", "pred", "obj")
        .where(F.col("pred").isNotNull())
        .dropDuplicates(["subj", "pred", "obj"])
    )


def known_neurons(linked: DataFrame) -> DataFrame:
    """Distinct canonical neuron ids detected in node documents."""
    return (
        linked.where(F.col("kind") == "neuron")
        .select(F.col("entity_id").alias("neuron_id"))
        .distinct()
    )


def synapse_triples(
    linked_synapses: DataFrame,
    neurons: DataFrame,
    broadcast_neurons: bool = True,
) -> DataFrame:
    """synapse rows (canonical src/tgt entity ids) -> SYNAPSES_ONTO triples.

    * multiset: one triple per source document (Cypher CREATE,
      ``neo4j_operations.py:391``), ``doc_id`` kept as provenance;
    * endpoint-existence inner joins reproduce MATCH's silent drop of
      dangling edges (``neo4j_operations.py:387-390``).

    ``neurons`` is usually small relative to the edge set (dimension-vs-fact);
    broadcast by default, sort-merge (AQE skew-handled) otherwise.
    """
    n_src = neurons.select(F.col("neuron_id").alias("subj"))
    n_tgt = neurons.select(F.col("neuron_id").alias("obj"))
    if broadcast_neurons:
        n_src, n_tgt = F.broadcast(n_src), F.broadcast(n_tgt)
    return (
        linked_synapses.select(
            "doc_id",
            F.col("src_id").alias("subj"),
            F.lit("SYNAPSES_ONTO").alias("pred"),
            F.col("tgt_id").alias("obj"),
            "props",
            "afferent_section_type",
        )
        .join(n_src, "subj", "inner")
        .join(n_tgt, "obj", "inner")
        .select("doc_id", "subj", "pred", "obj", "props", "afferent_section_type")
    )


def population_nodes(linked: DataFrame) -> DataFrame:
    """Distinct Population entity rows (≙ bulk_insert_population_nodes,
    reference ``neo4j_operations.py:297-320``)."""
    return (
        linked.where(F.col("kind") == "population")
        .select(F.col("entity_id").alias("entity_id"))
        .distinct()
        .withColumn("label", F.lit("Population"))
    )


def node_table(linked: DataFrame) -> DataFrame:
    """All distinct graph nodes with labels — the ``nodes`` output table.

    Labels ≙ reference node labels: Neuron (neo4j_operations.py:338),
    NodeGroup:MType / NodeGroup:SClass (:186), Population (:312).
    """
    label_map = F.create_map(
        F.lit("neuron"), F.lit("Neuron"),
        F.lit("mtype"), F.lit("MType"),
        F.lit("etype"), F.lit("EType"),
        F.lit("sclass"), F.lit("SClass"),
        F.lit("population"), F.lit("Population"),
        F.lit("media"), F.lit("Morphology"),
    )
    return (
        linked.select(F.col("entity_id"), label_map[F.col("kind")].alias("label"))
        .where(F.col("label").isNotNull())
        .dropDuplicates(["entity_id"])
    )
