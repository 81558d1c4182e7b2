"""sonata_neo4j_loader_spark — PySpark-native knowledge-graph construction engine.

A from-scratch re-expression of the *semantics* of
``KeremKurban/sonata-neo4j-loader`` (reference at ``/root/reference``,
a single-process pandas + Neo4j-Bolt loader) as a distributed Spark
DataFrame pipeline:

    documents (doc_id, spans array<struct<kind,text,media_ref,offset>>)
      -> parse (span-order invariant audit)
      -> mention detection (vectorized pandas/Arrow UDFs)
      -> entity linking (broadcast dictionary, salted-join skew handling)
      -> canonicalization (connected components over alias edges)
      -> triple factory (subj, pred, obj) + aggregation layer
      -> partitioned node/edge tables + per-partition lineage manifests

The emitted triples match the reference's Cypher writes:
``(:Neuron)-[:SYNAPSE]->`` (here SYNAPSES_ONTO, CREATE/multiset semantics,
reference ``circuit/neo4j_operations.py:376-420``),
``BELONGS_TO_MTYPE``/``BELONGS_TO_SCLASS`` (here HAS_MTYPE/HAS_SCLASS,
MERGE/dedup semantics, ``neo4j_operations.py:159-229``), population
membership ``BELONGS_TO`` (``neo4j_operations.py:349-372``) and the
``AGGREGATED_SYNAPSE`` per-group-pair averages
(``neo4j_operations.py:232-261``, rich variant
``scripts/load_circuit.py:502-552``).

No code is copied from the reference; it defines *what* to compute, not how.
"""

__version__ = "0.1.0"
