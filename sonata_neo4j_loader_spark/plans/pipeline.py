"""The full KG-construction plan: documents -> triples.

Mirrors the reference's ``load_circuit`` lifecycle (SURVEY.md §3.1) as
DataFrame lineage: steps that the reference serializes over Bolt
round-trips (nodegroup nodes → neuron nodes → membership edges → synapse
edges → aggregates) become parallel branches off shared cached frames.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import aggregate, canonicalize, linking, mentions, parse, sampling, triples
from ..sinks import materialize as mat


@dataclass
class PipelineConfig:
    """≙ the reference's env config (main.py:16-18)."""

    node_proportion: float = 1.0
    edge_proportion: float = 1.0
    node_set_pops: list[str] | None = None
    seed: int = 42
    # 'native' (pure-JVM regexp, default) | 'arrow' (pandas-UDF batches).
    # The two are row-identical (tests/test_triples_golden.py runs both).
    # Optimization r06 flipped the default to native per guide §4.1 —
    # prefer built-ins over any Python boundary: at 10M docs/local[32] the
    # full leg measured 48.5/48.6 s (native, back-to-back) vs 55.6/61.4 s
    # (arrow), and native removes the ArrowEvalPython node plus the Python
    # worker pool's scheduling variance from the hot path entirely.
    mention_impl: str = "native"  # 'native' | 'arrow'
    link_strategy: str = "broadcast"  # 'broadcast' | 'salted'
    cc_strategy: str = "auto"  # 'auto' | 'local' | 'distributed'
    salt_buckets: int = 8
    broadcast_neurons: bool = True
    rich_aggregates: bool = True
    group_attrs: list[str] = field(default_factory=lambda: ["HAS_MTYPE", "HAS_SCLASS"])


def build_triples(
    spark: SparkSession,
    documents: DataFrame,
    entities: DataFrame,
    alias_edges: DataFrame | None,
    config: PipelineConfig | None = None,
) -> dict[str, DataFrame]:
    """Run the six-stage plan; returns the output table family.

    Returns dict with:
      * ``nodes``  — (entity_id, label, properties map) — the map carries
        the full per-node payload ≙ ``SET n += node`` / ``SET p +=
        population`` (neo4j_operations.py:339,316)
      * ``attribute_triples`` — deduped neuron-attribute triples
      * ``synapse_triples``   — multiset SYNAPSES_ONTO with props
      * ``aggregate_triples`` — AGGREGATED_SYNAPSE_* rows
      * ``node_properties``   — (entity_id, properties) standalone table
      * ``invariant_violations`` — docs whose span sequence broke (audit)
    """
    cfg = config or PipelineConfig()

    # Canonicalization moved INTO the dictionary (optimization r06, guide
    # §2.4 — remove shuffle-stage work outright): the r05 shape linked
    # every corpus-scale frame against the raw dictionary and then applied
    # the alias→canonical rewrite to each output (five broadcast left
    # joins over ~25M-row frames at sf1.0). Rewriting the DICTIONARY's
    # entity ids once — a dimension-sized join — makes every link output
    # canonical by construction: link(x, canonical(entities)) is
    # row-identical to canonical(link(x, entities)) because the rewrite is
    # applied per matched dictionary row either way. The per-frame
    # apply_canonical_mapping calls are gone from the hot path.
    if alias_edges is not None:
        mapping = canonicalize.connected_components(
            alias_edges, strategy=cfg.cc_strategy
        ).persist()
        entities = canonicalize.apply_canonical_mapping(entities, mapping, "entity_id")

    # The dictionary is dimension-sized and reused by three link passes —
    # persist() it. persist (not localCheckpoint) matters: with AQE on,
    # even a *lazy* localCheckpoint executes every upstream query stage at
    # DAG-build time (AdaptiveSparkPlanExec materializes intermediate
    # stages on toRdd), serializing the pipeline; persist stays truly
    # lazy, keeps the plan Catalyst-visible, and lets one final action
    # fuse + share everything.
    entities = entities.persist()

    # stage 1: parse + invariant audit
    parsed = parse.parse_documents(documents)
    parsed = parsed.where(F.col("spans_valid"))
    violations = parse.audit_span_invariant(documents, parsed.select("doc_id", "spans"))

    # stage 2: mention detection (Arrow-batched by default). ONE fused
    # pass over the text (both UDFs in one ArrowEvalPython node) into a
    # compact extraction frame, persisted — the mention and synapse
    # branches then each read ~100×-smaller rows instead of re-scanning +
    # re-parsing + re-regexing the corpus once per branch. Persisting the
    # *extraction* (not the parsed text) is the 100 TB-safe choice: it's
    # dimension-sized relative to the corpus.
    extracted = mentions.extract_documents(parsed, impl=cfg.mention_impl).persist()
    mention_rows = mentions.mentions_from_extracted(extracted)
    synapse_rows = mentions.synapses_from_extracted(extracted)

    # stage 3+4: entity linking against the canonical dictionary (the
    # alias→canonical rewrite already happened dictionary-side above, so
    # linked ids are canonical by construction).
    linked = linking.link_mentions(
        mention_rows, entities, strategy=cfg.link_strategy, salt_buckets=cfg.salt_buckets
    )
    # NOT persisted: linked is corpus-scale (one row per mention) and,
    # since the attribute branch went pair-first, the triple path's only
    # use of it is the dimension-sized `neurons` distinct below (itself
    # persisted). The node outputs (node_table/node_properties) re-derive
    # it with one extra broadcast-join pass over the compact cached
    # extraction frame WHEN they are materialized — at 100 TB, re-reading
    # a compact cache twice beats pinning tens of billions of wide
    # mention rows in executor storage. Cache dimension-sized frames;
    # recompute corpus-sized narrow derivations.

    # stage 5a: neuron universe + sampling / node-set restriction.
    # Optimization r06 (guide §2.3, shuffle keys not payloads): the r05
    # shape derived the universe as known_neurons(linked) — exploding ALL
    # mentions of every document (media refs included) through the link
    # join and distinct-ing the corpus-scale result — even though the
    # timed triple path needs nothing else from `linked`. Instead explode
    # only the neuron-kind mentions, take the distinct SURFACES first
    # (map-side combine over a dictionary-sized set), and run the link +
    # canonical joins on that dimension-sized frame. Row-identical:
    # distinct-before-join equals distinct-after-join for an inner
    # equi-join keyed on the distinct column, and kind='media' rows can
    # never match kind='neuron'. `linked` is still the source for the
    # node outputs below, which materialize outside the triple path.
    neuron_surf = (
        extracted.select(
            F.explode(
                F.filter(F.col("mentions"), lambda m: m["kind"] == F.lit("neuron"))
            ).alias("_m")
        )
        .select(F.col("_m.surface").alias("surface"))
        .distinct()
    )
    if cfg.link_strategy == "broadcast":
        neuron_ids = neuron_surf.join(F.broadcast(entities), "surface", "inner")
    else:
        # distinct surfaces have no hot keys — a plain shuffle join is the
        # salted strategy's equivalent here (salting exists to split heavy
        # repeated surfaces, which a distinct set cannot contain)
        neuron_ids = neuron_surf.join(entities, "surface", "inner")
    neuron_ids = neuron_ids.select(F.col("entity_id").alias("neuron_id"))
    neurons = neuron_ids.distinct()
    neurons = sampling.filter_node_set(neurons, cfg.node_set_pops)
    neurons = sampling.sample_by_hash(neurons, "neuron_id", cfg.node_proportion, cfg.seed)
    neurons = neurons.persist()

    # stage 5b: attribute triples, restricted to surviving neurons.
    # Pair-first shape: subject×object pairing happens INSIDE each
    # extraction row (array cross product — the frame co-locates a doc's
    # mentions), then both surfaces link via broadcast and the MERGE dedup
    # is the branch's only exchange. The doc_id self-join formulation
    # (triples.neuron_attribute_triples, kept for the streaming path)
    # shuffles every mention row twice; this shuffles only the distinct
    # triple set. Equality of the two shapes is pytest-pinned.
    pairs = mentions.attribute_pairs_from_extracted(extracted)
    pairs = linking.link_mentions(
        pairs.withColumnRenamed("subj_surface", "surface"),
        entities,
        strategy=cfg.link_strategy,
        salt_buckets=cfg.salt_buckets,
    ).withColumnRenamed("entity_id", "subj").drop("surface", "entity_type")
    pairs = linking.link_mentions(
        pairs.withColumnRenamed("obj_surface", "surface"),
        entities,
        strategy=cfg.link_strategy,
        salt_buckets=cfg.salt_buckets,
    ).withColumnRenamed("entity_id", "obj").drop("surface", "entity_type")
    attr = triples.neuron_attribute_triples_from_pairs(pairs)
    attr = attr.join(
        F.broadcast(neurons.withColumnRenamed("neuron_id", "subj"))
        if cfg.broadcast_neurons
        else neurons.withColumnRenamed("neuron_id", "subj"),
        "subj",
        "left_semi",
    ).persist()

    # stage 5c: synapse endpoints -> canonical ids -> endpoint-existence joins
    src_link = (
        linking.link_mentions(
            synapse_rows.withColumnRenamed("src_surface", "surface"),
            entities,
            strategy=cfg.link_strategy,
            salt_buckets=cfg.salt_buckets,
        )
        .withColumnRenamed("entity_id", "src_id")
        .drop("surface", "entity_type")
    )
    both_link = (
        linking.link_mentions(
            src_link.withColumnRenamed("tgt_surface", "surface"),
            entities,
            strategy=cfg.link_strategy,
            salt_buckets=cfg.salt_buckets,
        )
        .withColumnRenamed("entity_id", "tgt_id")
        .drop("surface", "entity_type")
    )
    syn = triples.synapse_triples(both_link, neurons, cfg.broadcast_neurons)
    syn = sampling.sample_by_hash(syn, "doc_id", cfg.edge_proportion, cfg.seed)
    syn = syn.persist()

    # stage 5d: aggregates per group attribute. When the rich variant runs
    # for a pred, the default (avg conductance/delay) variant is a pure
    # projection of the rich result — deriving it there instead of
    # re-joining + re-aggregating the synapse frame saves one full pass
    # per rich pred (same grouping key, identical values).
    agg_frames: list[DataFrame] = []
    for pred in cfg.group_attrs:
        groups = attr.where(F.col("pred") == pred).select(
            F.col("subj").alias("neuron_id"), F.col("obj").alias("group")
        )
        prefix = pred.removeprefix("HAS_")
        if cfg.rich_aggregates and pred == "HAS_MTYPE":
            # persist: two consumers (the projection below + the rich frame
            # itself), group-pair-sized output — without it the aggregation
            # pass over the synapse frame would run once per consumer
            rich = aggregate.rich_aggregated_synapse_triples(
                syn, groups, prefix, cfg.broadcast_neurons
            ).persist()
            agg_frames.append(
                rich.select(
                    "subj",
                    F.lit(f"AGGREGATED_SYNAPSE_{prefix}").alias("pred"),
                    "obj",
                    "n_synapses",
                    "avg_conductance",
                    "avg_delay",
                )
            )
            agg_frames.append(rich)
        else:
            agg_frames.append(
                aggregate.aggregated_synapse_triples(
                    syn, groups, prefix, cfg.broadcast_neurons
                )
            )

    # node property payloads (SET n += node / SET p += population):
    # dimension-sized (one row per graph node), left-joined onto the node
    # table — broadcast-sized relative to the corpus, never a wide shuffle.
    node_props = triples.node_properties(linked, extracted)
    nodes = triples.node_table(linked).join(node_props, "entity_id", "left")

    return {
        "nodes": nodes,
        "attribute_triples": attr,
        "synapse_triples": syn,
        "aggregate_triples": agg_frames,
        "node_properties": node_props,
        "invariant_violations": violations,
    }


def materialize_outputs(
    outputs: dict[str, DataFrame], root: str, num_buckets: int = 64
) -> dict[str, mat.MaterializeReport]:
    """Stage 6 — commit the table family with per-partition lineage.

    Each logical table gets its own bucketed-Parquet + manifest directory
    (≙ the reference's constraint keys, scripts/load_circuit.py:30-36:
    nodes key on entity_id, edges on their endpoint pair). Re-running after
    a kill resumes: finished partitions are fingerprint-matched and skipped
    (see sinks/materialize.py).
    """
    agg_all = outputs["aggregate_triples"]
    agg_union = agg_all[0].select("subj", "pred", "obj")
    for a in agg_all[1:]:
        agg_union = agg_union.unionByName(a.select("subj", "pred", "obj"))
    jobs = {
        "nodes": (outputs["nodes"], ["entity_id"]),
        "attribute_triples": (outputs["attribute_triples"], ["subj"]),
        "synapse_triples": (
            outputs["synapse_triples"].select("doc_id", "subj", "pred", "obj", "props"),
            ["subj", "obj"],
        ),
        "aggregate_triples": (agg_union, ["subj", "obj"]),
    }
    return {
        name: mat.materialize(df, f"{root}/{name}", keys, num_buckets, stage=name)
        for name, (df, keys) in jobs.items()
    }


def dry_run_report(outputs: dict[str, DataFrame]) -> dict[str, int]:
    """Would-be write sizes, no writes — the batch replacement for the
    reference's interactive confirmation gate (data_extraction.py:125-134,
    ``input("Do you want to proceed …")`` before the edge import). A
    distributed job can't block on stdin; instead callers inspect this
    report and re-run with lower ``edge_proportion``/``node_proportion``
    if the sizes are unacceptable. Counts run against the pipeline's
    persisted frames, so the report costs one pass, not a rebuild.
    """
    return {
        "nodes": outputs["nodes"].count(),
        "attribute_triples": outputs["attribute_triples"].count(),
        "synapse_triples": outputs["synapse_triples"].count(),
        "aggregate_triples": sum(a.count() for a in outputs["aggregate_triples"]),
        "invariant_violations": outputs["invariant_violations"].count(),
    }


def all_plain_triples(outputs: dict[str, DataFrame]) -> DataFrame:
    """Union every (subj, pred, obj) for P/R scoring."""
    frames = [
        outputs["attribute_triples"].select("subj", "pred", "obj"),
        outputs["synapse_triples"].select("subj", "pred", "obj"),
        *[a.select("subj", "pred", "obj") for a in outputs["aggregate_triples"]],
    ]
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out
