"""Spike-grid source + HAS_SPIKE triples vs hand-computed goldens.

Fixture: a 2x1 campaign grid (cell_frequency x signal_frequency) of
tab-separated ``out.dat`` files, reference format (header row, 1-indexed
neuron ids — base_simulation_loader.py:50-56).
"""

from __future__ import annotations

import json

import pytest

from sonata_neo4j_loader_spark.sources import spikes as sp


@pytest.fixture(scope="module")
def campaign(tmp_path_factory):
    root = tmp_path_factory.mktemp("campaign")
    # cell 0: neurons 1,2,1 (1-indexed) ; cell 1: neurons 3,9
    (root / "c0").mkdir()
    (root / "c0" / "out.dat").write_text(
        "spike_time\tneuron_id\n10.5\t1\n11.0\t2\n12.25\t1\n"
    )
    (root / "c1").mkdir()
    (root / "c1" / "out.dat").write_text("spike_time\tneuron_id\n20.0\t3\n21.5\t9\n")
    cfg = {
        "attrs": {"target": "Mosaic_A"},
        "coords": {"cell_frequency": [1.0, 2.0], "signal_frequency": [0.5]},
        "data": {"0": "c0", "1": "c1"},
    }
    path = root / "config.json"
    path.write_text(json.dumps(cfg))
    return str(path)


def test_campaign_grid_read(spark, campaign):
    cfg = sp.load_campaign_config(campaign)
    assert cfg["target"] == "Mosaic_A"
    assert len(cfg["cells"]) == 2

    df = sp.read_spike_grid(spark, cfg["cells"])
    rows = {(r.spike_time, r.neuron_id, r.cell_frequency, r.signal_frequency)
            for r in df.collect()}
    # neuron ids shifted 1->0-indexed; each cell tagged with its coords
    assert rows == {
        (10.5, 0, 1.0, 0.5),
        (11.0, 1, 1.0, 0.5),
        (12.25, 0, 1.0, 0.5),
        (20.0, 2, 2.0, 0.5),
        (21.5, 8, 2.0, 0.5),
    }


def test_distinct_spikers(spark, campaign):
    cfg = sp.load_campaign_config(campaign)
    df = sp.read_spike_grid(spark, cfg["cells"])
    assert {r.neuron_id for r in sp.distinct_spikers(df).collect()} == {0, 1, 2, 8}


def test_has_spike_triples_match_drop(spark, campaign):
    cfg = sp.load_campaign_config(campaign)
    df = sp.read_spike_grid(spark, cfg["cells"])
    # neuron table lacks id 8 -> its spike is dropped (Cypher MATCH semantics)
    neurons = spark.createDataFrame([(0,), (1,), (2,)], "neuron_id long")
    got = {(r.subj, r.pred, r.obj) for r in sp.has_spike_triples(df, neurons).collect()}
    assert got == {
        (0, "HAS_SPIKE", "spike_0_10.5"),
        (1, "HAS_SPIKE", "spike_1_11.0"),
        (0, "HAS_SPIKE", "spike_0_12.25"),
        (2, "HAS_SPIKE", "spike_2_20.0"),
    }
