"""The reference's pytest fixture circuit as plain-Python ground truth.

Contents transcribed from the h5dump twins in
``/root/reference/tests/test_data/circuit_sonata_quick_scx_multi_circuit/``
(``nodes_A.h5.txt``, ``nodes_B.h5.txt``, ``local_edges_A.h5.txt``,
``local_edges_B.h5.txt``, ``edges_AB.h5.txt``): 5 neurons over 2
populations, 16 synapse edges over 4 edge populations (duplicates are
real — the reference inserts synapses with Cypher ``CREATE``,
``circuit/neo4j_operations.py:391``, so they form a multiset).

Numeric edge properties are synthesized deterministically (seed-42-style
hashing on the edge identity) because the golden *aggregate* values are
computed from these synthesized values, not hard-coded (FIXTURES.md §4).
"""

from __future__ import annotations

import hashlib

# (population, id, mtype, etype, synapse_class, layer, region, morphology)
NEURONS: list[tuple[str, int, str, str, str, str, str, str]] = [
    ("NodeA", 0, "L4_PC", "dSTUT", "INH", "LA", "RB", "rr110330_C3_idA"),
    ("NodeA", 1, "L4_MC", "dSTUT", "EXC", "LB", "RB", "C210401C"),
    ("NodeA", 2, "L4_MC", "dNAC", "INH", "LB", "RB", "rr110330_C3_idA"),
    (
        "NodeB",
        0,
        "L4_PC",
        "dSTUT",
        "EXC",
        "LC",
        "RB",
        "dend-jy180406_B_idC_axon-jy171019_B_10x_resta_idB",
    ),
    (
        "NodeB",
        1,
        "L5_PC",
        "dSTUT",
        "EXC",
        "LC",
        "RA",
        "dend-jy180406_C_idB_axon-04752-04764-X11537-Y13753",
    ),
]

# (edge_population, src_pop, src_id, tgt_pop, tgt_id) — 16 rows, order is
# the within-population edge index; duplicates intentional (multiset).
EDGES: list[tuple[str, str, int, str, int]] = [
    ("NodeA__NodeA__chemical", "NodeA", 1, "NodeA", 0),
    ("NodeA__NodeA__chemical", "NodeA", 1, "NodeA", 0),
    ("NodeA__NodeA__chemical", "NodeA", 0, "NodeA", 1),
    ("NodeA__NodeA__chemical", "NodeA", 0, "NodeA", 1),
    ("NodeB__NodeB__chemical", "NodeB", 1, "NodeB", 0),
    ("NodeB__NodeB__chemical", "NodeB", 0, "NodeB", 1),
    ("NodeB__NodeB__chemical", "NodeB", 1, "NodeB", 0),
    ("NodeB__NodeB__chemical", "NodeB", 0, "NodeB", 1),
    ("NodeA__NodeB__chemical", "NodeA", 0, "NodeB", 0),
    ("NodeA__NodeB__chemical", "NodeA", 1, "NodeB", 1),
    ("NodeA__NodeB__chemical", "NodeA", 1, "NodeB", 0),
    ("NodeA__NodeB__chemical", "NodeA", 1, "NodeB", 1),
    ("NodeB__NodeA__chemical", "NodeB", 0, "NodeA", 0),
    ("NodeB__NodeA__chemical", "NodeB", 1, "NodeA", 0),
    ("NodeB__NodeA__chemical", "NodeB", 0, "NodeA", 0),
    ("NodeB__NodeA__chemical", "NodeB", 1, "NodeA", 0),
]

# Numeric properties carried on every synapse edge.  The first two are the
# ones the reference's default aggregation averages
# (neo4j_operations.py:249-252); the rest are the rich-variant measures
# (scripts/load_circuit.py:516-527).
EDGE_PROPS: list[str] = [
    "conductance",
    "delay",
    "branch_order",
    "conductance_scale_factor",
    "decay_time",
    "depression_time",
    "facilitation_time",
    "n_rrp_vesicles",
    "spine_length",
    "u_hill_coefficient",
    "u_syn",
]

# Categorical property for the afferent-section-type distribution
# (scripts/load_circuit.py:529-545).
AFFERENT_SECTION_TYPES: list[str] = ["soma", "axon", "dend", "apic"]


def _stable_unit(*key: object) -> float:
    """Deterministic pseudo-random float in [0, 1) from a string key.

    Uses blake2b so the value is identical across Python processes
    (unlike ``hash``) and across partitionings (unlike RNG state).
    """
    h = hashlib.blake2b("|".join(str(k) for k in key).encode(), digest_size=8)
    return int.from_bytes(h.digest(), "big") / 2**64


def edge_prop_value(edge_seq: int, prop: str) -> float:
    """Synthesized value for property ``prop`` of the ``edge_seq``-th edge.

    Rounded to 3 decimals: the text round-trip (``%.6f`` in documents) is
    exact, and averages over ≤16-edge groups can never land exactly on a
    round-half boundary at 6 decimals — so Spark, DuckDB, and Python all
    round identically regardless of rounding mode.
    """
    return round(0.1 + 9.9 * _stable_unit("edge", edge_seq, prop), 3)


def edge_afferent_section_type(edge_seq: int) -> str:
    idx = int(_stable_unit("aff", edge_seq) * len(AFFERENT_SECTION_TYPES))
    return AFFERENT_SECTION_TYPES[min(idx, len(AFFERENT_SECTION_TYPES) - 1)]


def neuron_entity(pop: str, nid: int) -> str:
    return f"neuron:{pop}:{nid}"


def golden_triples() -> dict[str, object]:
    """Expected triple sets at NODE_PROPORTION=1.0, EDGE_PROPORTION=1.0.

    Derived from the reference's Cypher semantics (FIXTURES.md §5):
    MERGE-backed predicates are sets, SYNAPSES_ONTO is a multiset.
    """
    has_mtype = {(neuron_entity(p, i), "HAS_MTYPE", f"mtype:{m}") for p, i, m, *_ in NEURONS}
    has_sclass = {
        (neuron_entity(p, i), "HAS_SCLASS", f"sclass:{s}") for p, i, _m, _e, s, *_ in NEURONS
    }
    has_etype = {(neuron_entity(p, i), "HAS_ETYPE", f"etype:{e}") for p, i, _m, e, *_ in NEURONS}
    belongs_to = {(neuron_entity(p, i), "BELONGS_TO", f"pop:{p}") for p, i, *_ in NEURONS}
    has_morph = {
        (neuron_entity(p, i), "HAS_MORPHOLOGY", f"morphology:{mo}")
        for p, i, _m, _e, _s, _l, _r, mo in NEURONS
    }
    synapses = sorted(
        (neuron_entity(sp, si), "SYNAPSES_ONTO", neuron_entity(tp, ti))
        for _ep, sp, si, tp, ti in EDGES
    )
    return {
        "HAS_MTYPE": has_mtype,
        "HAS_SCLASS": has_sclass,
        "HAS_ETYPE": has_etype,
        "BELONGS_TO": belongs_to,
        "HAS_MORPHOLOGY": has_morph,
        "SYNAPSES_ONTO": synapses,  # sorted list == multiset
    }


def golden_aggregates(group_attr: str = "mtype") -> dict[tuple[str, str], dict[str, float]]:
    """Expected AGGREGATED_SYNAPSE stats per (src_group, tgt_group).

    Implements the *intended* semantics of neo4j_operations.py:246-252
    (per-pair avg over contributing synapse edges), computed independently
    in plain Python so Spark results are cross-checked, not self-checked.
    """
    attr_idx = {"mtype": 2, "etype": 3, "synapse_class": 4}[group_attr]
    lookup = {(n[0], n[1]): n[attr_idx] for n in NEURONS}
    acc: dict[tuple[str, str], list[int]] = {}
    for seq, (_ep, sp, si, tp, ti) in enumerate(EDGES):
        pair = (lookup[(sp, si)], lookup[(tp, ti)])
        acc.setdefault(pair, []).append(seq)
    out: dict[tuple[str, str], dict[str, float]] = {}
    for pair, seqs in acc.items():
        stats: dict[str, float] = {"n_synapses": float(len(seqs))}
        for prop in EDGE_PROPS:
            stats[f"avg_{prop}"] = sum(edge_prop_value(s, prop) for s in seqs) / len(seqs)
        dist: dict[str, int] = {}
        for s in seqs:
            t = edge_afferent_section_type(s)
            dist[t] = dist.get(t, 0) + 1
        stats["afferent_distribution"] = {  # type: ignore[assignment]
            k: v / len(seqs) for k, v in dist.items()
        }
        out[pair] = stats
    return out
