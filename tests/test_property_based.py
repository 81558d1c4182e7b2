"""Property-based checks (hypothesis): randomized inputs vs independent
pure-Python oracles.

* connected components (the distributed star-contraction path) against a
  from-scratch union-find on random graphs — shapes no hand-picked fixture
  covers (SURVEY.md §5: the golden layer the reference lacks);
* the per-row span-sequence invariant through explode -> shuffle ->
  reassemble on randomly ordered span arrays.

Few examples, real Spark jobs each — keep max_examples small.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sonata_neo4j_loader_spark.operators import canonicalize, parse

_NODES = [f"n{i:02d}" for i in range(12)]

edge_lists = st.lists(
    st.tuples(st.sampled_from(_NODES), st.sampled_from(_NODES)),
    min_size=1,
    max_size=24,
)


def _union_find_components(edges: list[tuple[str, str]]) -> dict[str, str]:
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        if u == v:
            continue
        parent.setdefault(u, u)
        parent.setdefault(v, v)
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
    comps: dict[str, list[str]] = {}
    for n in parent:
        comps.setdefault(find(n), []).append(n)
    out = {}
    for members in comps.values():
        canon = min(members)
        for m in members:
            out[m] = canon
    return out


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=edge_lists)
def test_distributed_cc_matches_union_find(spark, edges):
    want = _union_find_components(edges)
    df = spark.createDataFrame(edges, "alias_a string, alias_b string")
    got = {
        r.entity_id: r.canonical_id
        for r in canonicalize.connected_components(df, strategy="distributed").collect()
    }
    assert got == want


span_kinds = st.sampled_from(["text", "media"])
span_lists = st.lists(
    st.tuples(span_kinds, st.text(alphabet="ab c", max_size=6)),
    min_size=1,
    max_size=6,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=st.lists(span_lists, min_size=1, max_size=5), data=st.data())
def test_span_invariant_through_reassembly(spark, docs, data):
    rows = []
    for i, spans in enumerate(docs):
        seq = [
            {
                "kind": k,
                "text": t if k == "text" else "",
                "media_ref": t if k == "media" else "",
                "offset": off,
            }
            for off, (k, t) in enumerate(spans)
        ]
        stored = data.draw(st.permutations(seq))  # storage order is arbitrary
        rows.append((f"doc-{i}", stored))
    schema = (
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>"
    )
    documents = spark.createDataFrame(rows, schema)
    exploded = documents.selectExpr("doc_id", "inline(spans)")
    rebuilt = parse.reassemble_spans(exploded)
    assert parse.audit_span_invariant(documents, rebuilt).count() == 0
