"""CLI `paths` subcommand (path-reasoning user surface)."""

from __future__ import annotations

import json
import os

import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def kg_out(ray_session, tiny_corpus, tmp_path_factory):
    from medical_doc_knowledge_graph_system_ray.pipelines.ingest import IngestPipeline

    docs, cfg = tiny_corpus
    root = tmp_path_factory.mktemp("clipaths")
    docs_path = os.path.join(root, "documents")
    os.makedirs(docs_path)
    pq.write_table(docs, os.path.join(docs_path, "part-0.parquet"))
    pipe = IngestPipeline(docs_path, cfg, output_dir=os.path.join(root, "out"))
    pipe.run()
    return pipe


def _patient_and_condition(pipe):
    pat = cond = None
    for r in pipe.read_table("triples").to_pylist():
        if r["subj_label"] == "Patient" and pat is None:
            pat = r["subj"]
        if r["obj_label"] == "Condition" and cond is None:
            cond = r["obj"]
        if pat and cond:
            return pat, cond
    raise AssertionError("need a patient and a condition")


def test_cli_paths_ab(kg_out, capsys):
    from medical_doc_knowledge_graph_system_ray.cli import main

    pat, cond = _patient_and_condition(kg_out)
    assert main(["paths", "--out", kg_out.out, "--a", pat, "--b", cond]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["shortest"] is not None
    assert out["shortest"]["entity_chain"][0] == pat
    assert out["shortest"]["entity_chain"][-1] == cond
    assert len(out["all_paths"]) >= 1
    assert out["all_paths"][0]["hops"] <= out["all_paths"][-1]["hops"]


def test_cli_paths_seeds(kg_out, capsys):
    from medical_doc_knowledge_graph_system_ray.cli import main

    pat, cond = _patient_and_condition(kg_out)
    assert main(["paths", "--out", kg_out.out, "--seeds", pat,
                 "--target", cond]) == 0
    out = json.loads(capsys.readouterr().out)
    assert len(out["from_seeds"]) == 1
    assert out["from_seeds"][0]["seed_name"] == pat

    assert main(["paths", "--out", kg_out.out, "--seeds", pat]) == 0
    out = json.loads(capsys.readouterr().out)
    assert len(out["constrained"]) > 0
    assert all(r["hops"] <= 3 for r in out["constrained"])
