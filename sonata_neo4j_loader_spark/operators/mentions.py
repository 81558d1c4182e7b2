"""Stage 2 — batched mention detection over parsed documents.

Finds SONATA entity mentions (neuron ids like ``NodeA#0``, mtype/etype/
sclass labels, population names, morphology media refs) and synapse
statements in document text. Two interchangeable implementations, tested
for equality:

* ``impl='arrow'`` (default) — vectorized ``pandas_udf``: regex runs as
  pandas C-backed ``str.extractall`` over Arrow record batches, zero
  per-row Python loops (north rule).
* ``impl='native'`` — pure ``pyspark.sql.functions`` (``regexp_extract_all``
  inside whole-stage codegen), the everything-JVM fast path.

The reference has no mention detection (its entities arrive pre-structured
from HDF5, ``circuit/data_extraction.py:52-58``); the *vocabulary* of what
counts as an entity mirrors the attributes it extracts there.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    MapType,
    StringType,
    StructField,
    StructType,
)

# One mention grammar: "<kind> <surface>" produced by the document
# templates (datagen/documents.py). Kinds map 1:1 to the reference's
# node attributes + population registry.
_ENTITY_KINDS = ("neuron", "mtype", "etype", "sclass", "population")
_ENTITY_RE = r"\b(neuron|mtype|etype|sclass|population)\s+(\S+)"
_SYNAPSE_RE = r"\bsynapse\s+(\S+#\d+)\s*->\s*(\S+#\d+)"
_PROP_RE = r"\bprop\s+(\w+)\s+(-?\d+(?:\.\d+)?)"
_AFF_RE = r"\bafferent_section_type\s+(\w+)"

def _sql_re(pattern: str) -> str:
    """Escape a regex for embedding inside a SQL string literal."""
    return pattern.replace("\\", "\\\\").replace("'", "''")


MENTION_TYPE = ArrayType(
    StructType(
        [
            StructField("kind", StringType(), False),
            StructField("surface", StringType(), False),
        ]
    )
)

SYNAPSE_TYPE = StructType(
    [
        StructField("src_surface", StringType(), True),
        StructField("tgt_surface", StringType(), True),
        StructField("props", MapType(StringType(), DoubleType()), True),
        StructField("afferent_section_type", StringType(), True),
    ]
)


@pandas_udf(MENTION_TYPE)
def _extract_entity_mentions(doc_text: pd.Series) -> pd.Series:
    """Arrow-batched entity mention extraction (no per-row Python)."""
    hits = doc_text.str.extractall(_ENTITY_RE)
    out = pd.Series([[] for _ in range(len(doc_text))], index=doc_text.index, dtype=object)
    if not hits.empty:
        hits = hits.reset_index(level=1, drop=True)
        pairs = pd.Series(
            list(zip(hits[0].tolist(), hits[1].tolist(), strict=True)), index=hits.index
        )
        grouped = pairs.groupby(level=0).agg(list)
        out.loc[grouped.index] = grouped.map(
            lambda ms: [{"kind": k, "surface": s} for k, s in ms]
        )
    return out


@pandas_udf(SYNAPSE_TYPE)
def _extract_synapse(doc_text: pd.Series) -> pd.DataFrame:
    """Arrow-batched synapse-statement parse: endpoints + numeric props."""
    ends = doc_text.str.extract(_SYNAPSE_RE)
    props_hits = doc_text.str.extractall(_PROP_RE)
    props = pd.Series([None] * len(doc_text), index=doc_text.index, dtype=object)
    if not props_hits.empty:
        props_hits = props_hits.reset_index(level=1, drop=True)
        kv = pd.Series(
            list(zip(props_hits[0].tolist(), props_hits[1].astype(float).tolist(), strict=True)),
            index=props_hits.index,
        )
        grouped = kv.groupby(level=0).agg(list).map(dict)
        props.loc[grouped.index] = grouped
    aff = doc_text.str.extract(_AFF_RE)[0]
    return pd.DataFrame(
        {
            "src_surface": ends[0],
            "tgt_surface": ends[1],
            "props": props,
            "afferent_section_type": aff,
        },
        index=doc_text.index,
    )


def detect_mentions(parsed: DataFrame, impl: str = "arrow") -> DataFrame:
    """parsed documents -> (doc_id, kind, surface) mention rows.

    Media refs are mentions too (kind='media', surface=the ref) — the
    reference stores morphology as a plain node attribute
    (``nodes_A.h5.txt`` dataset ``morphology``).
    """
    if impl == "arrow":
        text_mentions = parsed.select(
            "doc_id", F.explode(_extract_entity_mentions("doc_text")).alias("m")
        ).select("doc_id", F.col("m.kind").alias("kind"), F.col("m.surface").alias("surface"))
    elif impl == "native":
        pairs = F.expr(f"regexp_extract_all(doc_text, '{_sql_re(_ENTITY_RE)}', 0)")
        text_mentions = (
            parsed.select("doc_id", F.explode(pairs).alias("hit"))
            .select(
                "doc_id",
                F.regexp_extract("hit", _ENTITY_RE, 1).alias("kind"),
                F.regexp_extract("hit", _ENTITY_RE, 2).alias("surface"),
            )
        )
    else:  # pragma: no cover - guarded by tests
        raise ValueError(f"unknown impl: {impl}")

    media_mentions = parsed.select(
        "doc_id", F.explode("media_refs").alias("surface")
    ).select("doc_id", F.lit("media").alias("kind"), "surface")
    return text_mentions.unionByName(media_mentions)


def detect_synapses(parsed: DataFrame, impl: str = "arrow") -> DataFrame:
    """parsed documents -> one row per synapse statement.

    Output: (doc_id, src_surface, tgt_surface, props map, afferent_section_type);
    docs without a synapse statement are dropped. Multiset semantics: one
    output row per document, duplicates preserved (Cypher CREATE,
    reference ``circuit/neo4j_operations.py:391``).
    """
    if impl == "arrow":
        out = parsed.select("doc_id", _extract_synapse("doc_text").alias("s")).select(
            "doc_id", "s.*"
        )
    elif impl == "native":
        prop_sql = _sql_re(_PROP_RE)
        out = parsed.select(
            "doc_id",
            F.nullif(F.regexp_extract("doc_text", _SYNAPSE_RE, 1), F.lit("")).alias(
                "src_surface"
            ),
            F.nullif(F.regexp_extract("doc_text", _SYNAPSE_RE, 2), F.lit("")).alias(
                "tgt_surface"
            ),
            F.map_from_entries(
                F.expr(
                    f"transform(regexp_extract_all(doc_text, '{prop_sql}', 0),"
                    f" h -> struct(regexp_extract(h, '{prop_sql}', 1),"
                    f" cast(regexp_extract(h, '{prop_sql}', 2) as double)))"
                )
            ).alias("props"),
            F.nullif(F.regexp_extract("doc_text", _AFF_RE, 1), F.lit("")).alias(
                "afferent_section_type"
            ),
        ).withColumn("props", F.when(F.size("props") > 0, F.col("props")))
    else:  # pragma: no cover
        raise ValueError(f"unknown impl: {impl}")
    return out.where(F.col("src_surface").isNotNull() & F.col("tgt_surface").isNotNull())
