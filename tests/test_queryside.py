"""Query-side operators over the materialized tables (SURVEY.md §2.8)."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from medical_doc_knowledge_graph_system_ray.pipelines import queryside as qs
from medical_doc_knowledge_graph_system_ray.pipelines.ingest import IngestPipeline


@pytest.fixture(scope="module")
def kg_out(ray_session, tiny_corpus, tmp_path_factory):
    docs, cfg = tiny_corpus
    root = tmp_path_factory.mktemp("qs")
    docs_path = os.path.join(root, "documents")
    os.makedirs(docs_path)
    pq.write_table(docs, os.path.join(docs_path, "part-0.parquet"))
    pipe = IngestPipeline(docs_path, cfg, output_dir=os.path.join(root, "out"))
    pipe.run()
    return pipe


def _a_patient(pipe) -> str:
    t = pipe.read_table("triples")
    for r in t.to_pylist():
        if r["subj_label"] == "Patient":
            return r["subj"]
    raise AssertionError("no patient triples")


def test_k_hop_expansion(kg_out):
    p = _a_patient(kg_out)
    one = qs.expand_k_hop(kg_out.out, [p], hops=1)
    two = qs.expand_k_hop(kg_out.out, [p], hops=2)
    assert one.num_rows > 0
    assert two.num_rows >= one.num_rows
    assert set(one.column("hops").to_pylist()) == {1}
    assert p not in set(one.column("key").to_pylist())  # seeds excluded
    # hop-1 nodes are exactly the patient's direct neighbors
    tris = kg_out.read_table("triples").to_pylist()
    direct = {r["obj"] for r in tris if r["subj"] == p} | {
        r["subj"] for r in tris if r["obj"] == p
    }
    assert set(one.column("key").to_pylist()) == direct


def test_explore_nodes_and_edges(kg_out):
    p = _a_patient(kg_out)
    out = qs.explore(kg_out.out, p, hops=1)
    assert out["center"] == p
    assert out["nodes"]
    keep = {n["key"] for n in out["nodes"]} | {p}
    assert out["edges"]
    for e in out["edges"]:
        assert e["subj"] in keep and e["obj"] in keep


def test_constrained_expansion_limit(kg_out):
    p = _a_patient(kg_out)
    out = qs.relationship_constrained_expansion(kg_out.out, [p], hops=3, limit=10)
    assert out.num_rows <= 10


def test_shortest_path(kg_out):
    tris = kg_out.read_table("triples").to_pylist()
    r = tris[0]
    path = qs.shortest_path(kg_out.out, r["subj"], r["obj"])
    assert path == [r["subj"], r["obj"]]
    assert qs.shortest_path(kg_out.out, r["subj"], r["subj"]) is None


def test_condition_chains(kg_out):
    p = _a_patient(kg_out)
    out = qs.condition_chains(kg_out.out, p)
    tris = kg_out.read_table("triples").to_pylist()
    want = sorted({r["obj"] for r in tris
                   if r["subj"] == p and r["pred"] == "HAS_CONDITION"})
    assert out.column("condition").to_pylist() == want


def test_citations_sorted_by_confidence(kg_out):
    ents = [r["key"] for r in kg_out.read_table("entities").to_pylist()
            if r["label"] == "Condition"][:3]
    out = qs.citations(kg_out.out, ents)
    assert out.num_rows > 0
    confs = out.column("confidence").to_pylist()
    assert confs == sorted(confs, reverse=True)
    assert set(out.column("entity_name").to_pylist()) <= set(ents)


def test_entity_first_retrieval(kg_out):
    out = qs.entity_first_retrieval(kg_out.out, "hypertension blood pressure", top_k=5,
                                    threshold=0.0)
    assert out.num_rows > 0
    # entity dedup
    pairs = list(zip(out.column("entity").to_pylist(), out.column("label").to_pylist()))
    assert len(pairs) == len(set(pairs))
