"""INDRA extraction pipeline tests with synthetic statement JSON."""

import json
import os

import numpy as np
import pandas as pd
import pytest

from stonkgs_tpu.data import filters
from stonkgs_tpu.data.indra_extraction import (
    agent_node, from_indra_statements, keep_largest_component,
    munge_evidence_text, read_indra_triples, remove_ungrounded_nodes,
    statement_edges,
)


def _agent(name, ns="HGNC", ident=None, text=None):
    refs = {}
    if ns == "TEXT":
        refs["TEXT"] = text or name
    else:
        refs[ns] = ident or "1"
        refs["TEXT"] = name.lower()
    return {"name": name, "db_refs": refs}


def _ev(text, pmid="123", species=None):
    ev = {"text": text, "pmid": pmid}
    if species:
        ev["context"] = {"species": {"name": species}}
    return ev


def _statements():
    return [
        {"type": "Activation", "subj": _agent("AKT1", ident="391"),
         "obj": _agent("MTOR", ident="3942"),
         "belief": 0.95, "evidence": [_ev("AKT1 activates MTOR.", species="human")]},
        {"type": "Phosphorylation", "enz": _agent("AKT1", ident="391"),
         "sub": _agent("GSK3B", ident="4617"),
         "belief": 0.8, "evidence": [_ev("AKT1 phosphorylates GSK3B [XREF_BIBR].")]},
        {"type": "Inhibition", "subj": _agent("GSK3B", ident="4617"),
         "obj": _agent("MTOR", ident="3942"),
         "belief": 0.7, "evidence": [_ev("GSK3B inhibits MTOR signaling.")]},
        {"type": "Complex",
         "members": [_agent("AKT1", ident="391"), _agent("MTOR", ident="3942")],
         "belief": 0.6, "evidence": [_ev("AKT1 binds MTOR.")]},
        # ungrounded statement: both agents TEXT -> removed later
        {"type": "Activation", "subj": _agent("mystery", ns="TEXT"),
         "obj": _agent("thing", ns="TEXT"),
         "belief": 0.3, "evidence": [_ev("mystery activates thing.")]},
        # disconnected pair -> dropped with largest-component filter
        {"type": "Activation", "subj": _agent("ZZZ1", ident="999"),
         "obj": _agent("ZZZ2", ident="998"),
         "belief": 0.5, "evidence": [_ev("ZZZ1 activates ZZZ2.")]},
        # direct down-regulation for the relation_type task
        {"type": "Dephosphorylation", "enz": _agent("PTEN", ident="9588"),
         "sub": _agent("AKT1", ident="391"),
         "belief": 0.9, "evidence": [_ev("PTEN dephosphorylates AKT1.")]},
    ]


def test_agent_node_naming():
    label, attrs = agent_node(_agent("AKT1", ident="391"))
    assert label == "p(HGNC:391 ! AKT1)"
    assert attrs["grounded"] and attrs["kind"] == "protein"
    label, attrs = agent_node(_agent("foo", ns="TEXT"))
    assert not attrs["grounded"]


def test_statement_edges_relations():
    edges = statement_edges(_statements()[0])
    assert len(edges) == 1
    (u, _), rel, (v, _), data = edges[0]
    assert rel == "increases"
    assert data["annotations"]["species"] == {"human": True}
    assert data["annotations"]["belief"] == 0.95

    edges = statement_edges(_statements()[1])
    assert edges[0][1] == "directlyIncreases"
    edges = statement_edges(_statements()[6])
    assert edges[0][1] == "directlyDecreases"

    cplx = statement_edges(_statements()[3])
    assert len(cplx) == 2
    assert all(rel == "partOf" for _, rel, _, _ in cplx)
    assert cplx[0][2][0].startswith("complex(")


def test_graph_hygiene():
    g = from_indra_statements(_statements())
    n0 = g.number_of_nodes()
    removed = remove_ungrounded_nodes(g)
    assert removed == 2  # the two TEXT agents
    dropped = keep_largest_component(g)
    assert dropped == 2  # ZZZ1, ZZZ2
    assert g.number_of_nodes() == n0 - 4


def test_munge_evidence():
    assert munge_evidence_text("foo [XREF_BIBR, XREF_BIBR]") == "foo "
    assert munge_evidence_text("no refs [1]") == "no refs [1]"


def test_read_indra_triples_end_to_end(tmp_path):
    raw = tmp_path / "statements.jsonl"
    with open(raw, "w") as f:
        for stmt in _statements():
            f.write(json.dumps(stmt) + "\n")
        f.write("{not json\n")  # parse-error line

    out = read_indra_triples(str(raw), str(tmp_path / "out"))
    pre = pd.read_csv(out["pretraining"], sep="\t")
    # species-annotated edge moved to the species task, polarity edges to
    # relation_type; complex partOf edges stay in pre-training
    assert set(pre.columns) >= {"source", "relation", "target", "evidence",
                                "pmid", "belief_score"}
    species = pd.read_csv(out["species"], sep="\t")
    assert len(species) == 1
    assert species["class"][0] == "human"

    rel = pd.read_csv(out["relation_type"], sep="\t")
    assert set(rel["interaction"]) <= {"direct_interaction", "indirect_interaction"}
    assert set(rel["polarity"]) <= {"up", "down"}
    # the XREF marker is stripped from pre-training evidences
    assert not pre["evidence"].str.contains("XREF").any()
    # no finetuning rows leak into pretraining
    assert not set(pre["evidence"]) & set(species["evidence"])
    assert not set(pre["evidence"]) & set(rel["evidence"])

    summary = json.load(open(tmp_path / "out" / "misc" /
                             "indra_kg_overview_summary.json"))
    assert {s["name"] for s in summary} == {
        "node_summary", "relation_summary", "functions_summary",
        "annotations_summary"}


def test_filters_behavior(tmp_path):
    df = pd.DataFrame({
        "source": ["a", "b", "c", "a"],
        "target": ["b", "c", "d", "b"],
        "evidence": ["e1", "e2", "e3", "e1"],
        "class": ["x", "x", "y", "x"],
    })
    out = filters.filter_out_duplicates(df)
    assert len(out) == 3
    out = filters.apply_kg_filtering(df, {"a", "b", "c"})
    assert len(out) == 3  # the row with d dropped

    big = pd.DataFrame({
        "class": ["x"] * 60 + ["y"] * 40,
        "evidence": [f"e{i}" for i in range(100)],
    })
    small = filters.reduce_dataset_size(big, max_dataset_size=20)
    assert len(small) == 20
    # stratification keeps the class ratio
    assert 10 <= (small["class"] == "x").sum() <= 14

    maj = filters.filter_for_majority_classes(
        pd.DataFrame({"class": ["a"] * 5 + ["b"] * 3 + ["c"] * 1 + ["-1"] * 2}),
        n_classes=2)
    assert set(maj["class"]) == {"a", "b"}

    ents = filters.load_entities(df)
    assert ents == {"a", "b", "c", "d"}
    missing = filters.find_missing_entities({"a", "b"}, {"t": {"a", "z"}})
    assert missing == {"t": 1}
    leak = filters.find_information_leakage({"e1"}, {"t": {"e1", "e9"}})
    assert leak == {"t": 1}

    fixed = filters.fix_stringified_lists(
        pd.DataFrame({"input_ids": ["[1, 2, 3]"]}))
    assert fixed["input_ids"][0] == [1, 2, 3]
