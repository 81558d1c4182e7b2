"""Deterministic generators for the interleaved documents corpus.

The pipeline input shape is fixed by BASELINE.json's input hint:

    doc_id : string
    spans  : array<struct<kind:string, text:string, media_ref:string, offset:int>>

Two generators:

* :func:`fixture_documents` — the reference's pytest fixture circuit
  (5 neurons / 16 synapses, FIXTURES.md §4) rendered as documents, plus
  alias-form documents (canonicalization pressure) and noise documents
  (precision pressure).  Driver-side rows: ~30 docs, test scale only.
* :func:`synthetic_documents` — the same grammar at arbitrary scale,
  generated *distributedly* from ``spark.range`` with column expressions
  only (xxhash64-based pseudo-randomness). No driver materialization, no
  Python RNG, deterministic under any partitioning — this is the 10^12-doc
  scale path and the bench corpus.

Span storage order is deliberately scrambled (rotation / reversal) so the
parse stage's sort-by-offset and the span-sequence invariant audit do real
work.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from . import fixture

SPAN_TYPE = StructType(
    [
        StructField("kind", StringType(), False),
        StructField("text", StringType(), True),
        StructField("media_ref", StringType(), True),
        StructField("offset", IntegerType(), False),
    ]
)

DOC_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("spans", ArrayType(SPAN_TYPE), False),
    ]
)

ENTITY_SCHEMA = StructType(
    [
        StructField("surface", StringType(), False),
        StructField("entity_id", StringType(), False),
        StructField("entity_type", StringType(), False),
    ]
)

ALIAS_SCHEMA = StructType(
    [
        StructField("alias_a", StringType(), False),
        StructField("alias_b", StringType(), False),
    ]
)


def _rotate(spans: list[tuple], key: str) -> list[tuple]:
    """Deterministically scramble span storage order (offsets stay true)."""
    if len(spans) <= 1:
        return spans
    r = int.from_bytes(hashlib.blake2b(key.encode(), digest_size=4).digest(), "big") % len(spans)
    return spans[r:] + spans[:r]


def _text(text: str, offset: int) -> tuple:
    return ("text", text, "", offset)


def _media(ref: str, offset: int) -> tuple:
    return ("media", "", ref, offset)


def _node_doc(
    pop: str,
    nid: int,
    mtype: str,
    etype: str,
    sclass: str,
    layer: str,
    region: str,
    morph: str,
    *,
    alias: bool = False,
) -> tuple:
    surface_pop = pop.lower() if alias else pop
    prefix = "alias" if alias else "node"
    doc_id = f"{prefix}-{pop}-{nid:06d}"
    # layer/region are plain node *properties* (reference ``SET n += node``,
    # neo4j_operations.py:339; values from data_extraction.py:52-58), not
    # graph entities — they ride as attribute spans, never hit the
    # entity dictionary.
    spans = [
        _text(f"neuron {surface_pop}#{nid}", 0),
        _text(f"mtype {mtype}", 1),
        _text(f"etype {etype}", 2),
        _text(f"sclass {sclass}", 3),
        _media(f"morph://{morph}", 4),
        _text(f"population {surface_pop}", 5),
        _text(f"layer {layer}", 6),
        _text(f"region {region}", 7),
    ]
    return (doc_id, _rotate(spans, doc_id))


def _edge_doc(seq: int, sp: str, si: int, tp: str, ti: int) -> tuple:
    doc_id = f"edge-{seq:06d}"
    spans = [_text(f"synapse {sp}#{si} -> {tp}#{ti}", 0)]
    off = 1
    for prop in fixture.EDGE_PROPS:
        spans.append(_text(f"prop {prop} {fixture.edge_prop_value(seq, prop):.6f}", off))
        off += 1
    spans.append(_text(f"afferent_section_type {fixture.edge_afferent_section_type(seq)}", off))
    spans.append(_media(f"trace://edge/{seq}", off + 1))
    return (doc_id, _rotate(spans, doc_id))


_NOISE_TEXTS = [
    "the neuron doctrine was proposed in the nineteenth century",
    "population dynamics of predators follow lotka volterra equations",
    "synapse pruning occurs during adolescence in the cortex",
    "mtype is short for morphological type in the literature",
    "fake reference NodeZ#9 -> NodeQ#7 should never link",
]


def _noise_doc(k: int) -> tuple:
    doc_id = f"noise-{k:06d}"
    spans = [
        _text(_NOISE_TEXTS[k % len(_NOISE_TEXTS)], 0),
        _media(f"img://noise/{k}.png", 1),
        _text(_NOISE_TEXTS[(k + 1) % len(_NOISE_TEXTS)], 2),
    ]
    return (doc_id, _rotate(spans, doc_id))


def fixture_documents(spark: SparkSession, n_noise: int = 5) -> DataFrame:
    """The fixture circuit as ~31 interleaved documents."""
    rows = []
    for pop, nid, mtype, etype, sclass, layer, region, morph in fixture.NEURONS:
        rows.append(_node_doc(pop, nid, mtype, etype, sclass, layer, region, morph))
        rows.append(
            _node_doc(pop, nid, mtype, etype, sclass, layer, region, morph, alias=True)
        )
    for seq, (_ep, sp, si, tp, ti) in enumerate(fixture.EDGES):
        rows.append(_edge_doc(seq, sp, si, tp, ti))
    rows.extend(_noise_doc(k) for k in range(n_noise))
    return spark.createDataFrame(rows, DOC_SCHEMA)


def fixture_entities(spark: SparkSession) -> DataFrame:
    """Canonical-entity dictionary for the fixture vocabulary.

    Surface-form variants (lowercase) map to *variant* entity ids; the
    alias edges (below) connect variants to canonical ids so connected
    components resolves them (SURVEY.md §7 stage 4).
    """
    rows: list[tuple[str, str, str]] = []
    seen: set[str] = set()

    def add(surface: str, entity_id: str, entity_type: str) -> None:
        if surface not in seen:
            seen.add(surface)
            rows.append((surface, entity_id, entity_type))

    for pop, nid, mtype, etype, sclass, _layer, _region, morph in fixture.NEURONS:
        add(f"{pop}#{nid}", f"neuron:{pop}:{nid}", "neuron")
        add(f"{pop.lower()}#{nid}", f"neuron:{pop.lower()}:{nid}", "neuron")
        add(mtype, f"mtype:{mtype}", "mtype")
        add(etype, f"etype:{etype}", "etype")
        add(sclass, f"sclass:{sclass}", "sclass")
        add(pop, f"pop:{pop}", "population")
        add(pop.lower(), f"pop:{pop.lower()}", "population")
        add(f"morph://{morph}", f"morphology:{morph}", "morphology")
    return spark.createDataFrame(rows, ENTITY_SCHEMA)


def fixture_alias_edges(spark: SparkSession) -> DataFrame:
    """Alias pairs: lowercase variant ids ≡ canonical ids.

    Golden: each cluster canonicalizes to its lexicographically smallest
    member (FIXTURES.md §3) — uppercase canonical forms sort first.
    """
    rows: list[tuple[str, str]] = []
    seen: set[tuple[str, str]] = set()
    for pop, nid, *_ in fixture.NEURONS:
        pairs = [
            (f"neuron:{pop.lower()}:{nid}", f"neuron:{pop}:{nid}"),
            (f"pop:{pop.lower()}", f"pop:{pop}"),
        ]
        for p in pairs:
            if p not in seen:
                seen.add(p)
                rows.append(p)
    return spark.createDataFrame(rows, ALIAS_SCHEMA)


# ---------------------------------------------------------------------------
# Scalable generator: pure column expressions over spark.range → runs
# distributed, deterministic under any partitioning, no driver loops.
# ---------------------------------------------------------------------------

def synthetic_documents(
    spark: SparkSession,
    n_node_docs: int,
    n_edge_docs: int,
    n_noise_docs: int = 0,
    n_populations: int = 8,
    neurons_per_pop: int = 1000,
    n_mtypes: int = 32,
    n_etypes: int = 8,
    partitions: int | None = None,
) -> DataFrame:
    """Arbitrary-scale corpus with the fixture grammar.

    Node docs cover neuron k = id % (P*n); edge docs pick endpoints by
    xxhash64 — every surface used is guaranteed to be in
    :func:`synthetic_entities`'s dictionary. ~10% of node docs use the
    lowercase alias form (canonicalization load), and noise docs add
    precision pressure.
    """
    total_neurons = n_populations * neurons_per_pop

    def pop_expr(neuron):
        return F.format_string("Pop%03d", F.floor((neuron % total_neurons) / neurons_per_pop))

    def nid_expr(neuron):
        return (neuron % total_neurons) % neurons_per_pop

    rng = spark.range(n_node_docs, numPartitions=partitions)
    neuron = F.col("id")
    pop = pop_expr(neuron)
    nid = nid_expr(neuron)
    is_alias = F.pmod(F.xxhash64(F.col("id"), F.lit("alias")), F.lit(10)) == 0
    surf_pop = F.when(is_alias, F.lower(pop)).otherwise(pop)
    mtype = F.format_string("MT%02d", F.pmod(F.xxhash64(pop, nid, F.lit("mt")), F.lit(n_mtypes)))
    etype = F.format_string("ET%01d", F.pmod(F.xxhash64(pop, nid, F.lit("et")), F.lit(n_etypes)))
    sclass = F.when(F.pmod(F.xxhash64(pop, nid, F.lit("sc")), F.lit(2)) == 0, "EXC").otherwise("INH")
    morph = F.format_string("m%012d", F.pmod(F.xxhash64(pop, nid, F.lit("mo")), F.lit(10**9)))
    layer = F.format_string("L%d", F.pmod(F.xxhash64(pop, nid, F.lit("ly")), F.lit(6)) + 1)
    region = F.format_string("R%02d", F.pmod(F.xxhash64(pop, nid, F.lit("rg")), F.lit(20)))

    def span(kind, text, media_ref, offset):
        return F.struct(
            F.lit(kind).alias("kind"),
            text.alias("text"),
            media_ref.alias("media_ref"),
            F.lit(offset).cast("int").alias("offset"),
        )

    e = F.lit("")
    node_docs = rng.select(
        F.format_string("node-%012d", F.col("id")).alias("doc_id"),
        F.array(
            span("text", F.format_string("neuron %s#%d", surf_pop, nid), e, 0),
            span("text", F.concat(F.lit("mtype "), mtype), e, 1),
            span("text", F.concat(F.lit("etype "), etype), e, 2),
            span("text", F.concat(F.lit("sclass "), sclass), e, 3),
            span("media", e, F.concat(F.lit("morph://"), morph), 4),
            span("text", F.concat(F.lit("population "), surf_pop), e, 5),
            span("text", F.concat(F.lit("layer "), layer), e, 6),
            span("text", F.concat(F.lit("region "), region), e, 7),
        ).alias("spans"),
    )

    rng_e = spark.range(n_edge_docs, numPartitions=partitions)
    src = F.pmod(F.xxhash64(F.col("id"), F.lit("src")), F.lit(total_neurons))
    tgt = F.pmod(F.xxhash64(F.col("id"), F.lit("tgt")), F.lit(total_neurons))
    conduct = F.round(F.pmod(F.xxhash64(F.col("id"), F.lit("c")), F.lit(10**6)) / 1e5, 6)
    delay = F.round(F.pmod(F.xxhash64(F.col("id"), F.lit("d")), F.lit(10**6)) / 1e5, 6)
    aff = F.element_at(
        F.array(*[F.lit(t) for t in fixture.AFFERENT_SECTION_TYPES]),
        (F.pmod(F.xxhash64(F.col("id"), F.lit("a")), F.lit(4)) + 1).cast("int"),
    )
    edge_docs = rng_e.select(
        F.format_string("edge-%012d", F.col("id")).alias("doc_id"),
        F.array(
            span(
                "text",
                F.format_string(
                    "synapse %s#%d -> %s#%d",
                    pop_expr(src),
                    nid_expr(src),
                    pop_expr(tgt),
                    nid_expr(tgt),
                ),
                e,
                0,
            ),
            span("text", F.format_string("prop conductance %.6f", conduct), e, 1),
            span("text", F.format_string("prop delay %.6f", delay), e, 2),
            span("text", F.concat(F.lit("afferent_section_type "), aff), e, 3),
            span("media", e, F.format_string("trace://edge/%d", F.col("id")), 4),
        ).alias("spans"),
    )

    docs = node_docs.unionByName(edge_docs)
    if n_noise_docs > 0:
        noise = spark.range(n_noise_docs, numPartitions=partitions).select(
            F.format_string("noise-%012d", F.col("id")).alias("doc_id"),
            F.array(
                span("text", F.lit("the neuron doctrine was proposed long ago"), e, 0),
                span("media", e, F.format_string("img://noise/%d.png", F.col("id")), 1),
            ).alias("spans"),
        )
        docs = docs.unionByName(noise)

    # Scramble storage order for half the docs; offsets remain the truth.
    return docs.withColumn(
        "spans",
        F.when(F.pmod(F.xxhash64("doc_id"), F.lit(2)) == 0, F.reverse("spans")).otherwise(
            F.col("spans")
        ),
    )


def synthetic_entities(
    spark: SparkSession,
    n_populations: int = 8,
    neurons_per_pop: int = 1000,
    n_mtypes: int = 32,
    n_etypes: int = 8,
) -> DataFrame:
    """Dictionary matching :func:`synthetic_documents`'s vocabulary."""
    total = n_populations * neurons_per_pop
    neurons = spark.range(total).select(
        F.format_string(
            "Pop%03d#%d", F.floor(F.col("id") / neurons_per_pop), F.col("id") % neurons_per_pop
        ).alias("surface"),
        F.format_string(
            "neuron:Pop%03d:%d", F.floor(F.col("id") / neurons_per_pop), F.col("id") % neurons_per_pop
        ).alias("entity_id"),
        F.lit("neuron").alias("entity_type"),
    )
    neurons_lc = spark.range(total).select(
        F.format_string(
            "pop%03d#%d", F.floor(F.col("id") / neurons_per_pop), F.col("id") % neurons_per_pop
        ).alias("surface"),
        F.format_string(
            "neuron:pop%03d:%d", F.floor(F.col("id") / neurons_per_pop), F.col("id") % neurons_per_pop
        ).alias("entity_id"),
        F.lit("neuron").alias("entity_type"),
    )
    pops = spark.range(n_populations).select(
        F.format_string("Pop%03d", F.col("id")).alias("surface"),
        F.format_string("pop:Pop%03d", F.col("id")).alias("entity_id"),
        F.lit("population").alias("entity_type"),
    )
    pops_lc = spark.range(n_populations).select(
        F.format_string("pop%03d", F.col("id")).alias("surface"),
        F.format_string("pop:pop%03d", F.col("id")).alias("entity_id"),
        F.lit("population").alias("entity_type"),
    )
    mtypes = spark.range(n_mtypes).select(
        F.format_string("MT%02d", F.col("id")).alias("surface"),
        F.format_string("mtype:MT%02d", F.col("id")).alias("entity_id"),
        F.lit("mtype").alias("entity_type"),
    )
    etypes = spark.range(n_etypes).select(
        F.format_string("ET%01d", F.col("id")).alias("surface"),
        F.format_string("etype:ET%01d", F.col("id")).alias("entity_id"),
        F.lit("etype").alias("entity_type"),
    )
    sclasses = spark.createDataFrame(
        [("EXC", "sclass:EXC", "sclass"), ("INH", "sclass:INH", "sclass")], ENTITY_SCHEMA
    )
    # Morphology surfaces are derivable from (pop,nid) with the same hash.
    morphs = spark.range(total).select(
        F.format_string(
            "morph://m%012d",
            F.pmod(
                F.xxhash64(
                    F.format_string("Pop%03d", F.floor(F.col("id") / neurons_per_pop)),
                    F.col("id") % neurons_per_pop,
                    F.lit("mo"),
                ),
                F.lit(10**9),
            ),
        ).alias("surface"),
        F.format_string(
            "morphology:m%012d",
            F.pmod(
                F.xxhash64(
                    F.format_string("Pop%03d", F.floor(F.col("id") / neurons_per_pop)),
                    F.col("id") % neurons_per_pop,
                    F.lit("mo"),
                ),
                F.lit(10**9),
            ),
        ).alias("entity_id"),
        F.lit("morphology").alias("entity_type"),
    ).dropDuplicates(["surface"])
    return (
        neurons.unionByName(neurons_lc)
        .unionByName(pops)
        .unionByName(pops_lc)
        .unionByName(mtypes)
        .unionByName(etypes)
        .unionByName(sclasses)
        .unionByName(morphs)
    )


def synthetic_alias_edges(
    spark: SparkSession, n_populations: int = 8, neurons_per_pop: int = 1000
) -> DataFrame:
    """Variant↔canonical pairs matching :func:`synthetic_entities`."""
    total = n_populations * neurons_per_pop
    neuron_pairs = spark.range(total).select(
        F.format_string(
            "neuron:pop%03d:%d", F.floor(F.col("id") / neurons_per_pop), F.col("id") % neurons_per_pop
        ).alias("alias_a"),
        F.format_string(
            "neuron:Pop%03d:%d", F.floor(F.col("id") / neurons_per_pop), F.col("id") % neurons_per_pop
        ).alias("alias_b"),
    )
    pop_pairs = spark.range(n_populations).select(
        F.format_string("pop:pop%03d", F.col("id")).alias("alias_a"),
        F.format_string("pop:Pop%03d", F.col("id")).alias("alias_b"),
    )
    return neuron_pairs.unionByName(pop_pairs)
