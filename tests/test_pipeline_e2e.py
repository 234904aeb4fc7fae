"""End-to-end golden check: the Ray pipeline's tables vs the
reference-semantics oracle on the same synthetic corpus.

This is the correctness gate of BASELINE.md: triple P >= 0.95 and
R >= 0.95 on the (subj, pred, obj) set, exact chunk-table equality,
span-sequence equality, and entity-table agreement.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from medical_doc_knowledge_graph_system_ray.pipelines.ingest import IngestPipeline
from medical_doc_knowledge_graph_system_ray.pipelines.oracle import run_oracle


@pytest.fixture(scope="module")
def pipeline_and_oracle(ray_session, small_corpus, tmp_path_factory):
    docs, cfg = small_corpus
    root = tmp_path_factory.mktemp("e2e")
    docs_path = os.path.join(root, "documents")
    os.makedirs(docs_path)
    pq.write_table(docs, os.path.join(docs_path, "part-0.parquet"))

    pipe = IngestPipeline(docs_path, cfg, output_dir=os.path.join(root, "out"))
    summary = pipe.run()
    golden = run_oracle(docs, cfg)
    return pipe, golden, summary, docs


def _triple_set(table):
    return set(
        zip(
            table.column("subj").to_pylist(),
            table.column("pred").to_pylist(),
            table.column("obj").to_pylist(),
        )
    )


def test_triple_precision_recall(pipeline_and_oracle):
    pipe, golden, summary, _docs = pipeline_and_oracle
    got = _triple_set(pipe.read_table("triples"))
    want = _triple_set(golden["triples"])
    assert want, "oracle produced no triples"
    tp = len(got & want)
    precision = tp / max(len(got), 1)
    recall = tp / len(want)
    assert precision >= 0.95, f"precision {precision:.4f}; extra={list(got - want)[:5]}"
    assert recall >= 0.95, f"recall {recall:.4f}; missing={list(want - got)[:5]}"


def test_triple_payload_matches(pipeline_and_oracle):
    """For agreeing (s,p,o) keys: confidence (max) and witness chunk (min) match."""
    pipe, golden, _s, _d = pipeline_and_oracle
    got = {
        (r["subj"], r["pred"], r["obj"]): (round(r["confidence"], 5), r["chunk_id"])
        for r in pipe.read_table("triples").to_pylist()
    }
    want = {
        (r["subj"], r["pred"], r["obj"]): (round(r["confidence"], 5), r["chunk_id"])
        for r in golden["triples"].to_pylist()
    }
    agree = set(got) & set(want)
    mismatches = [k for k in agree if got[k] != want[k]]
    assert not mismatches, mismatches[:5]


def test_chunk_table_exact(pipeline_and_oracle):
    pipe, golden, _s, _d = pipeline_and_oracle
    got = pipe.read_table("chunks").sort_by([("doc_id", "ascending"), ("seq", "ascending")])
    want = golden["chunks"].sort_by([("doc_id", "ascending"), ("seq", "ascending")])
    assert got.num_rows == want.num_rows
    for col in ("chunk_id", "doc_id", "section", "seq", "start_char", "end_char", "text"):
        assert got.column(col).to_pylist() == want.column(col).to_pylist(), col


def test_span_sequence_invariant(pipeline_and_oracle):
    """(kind, text, media_ref, order) recoverable exactly from the spans table."""
    pipe, _golden, _s, docs = pipeline_and_oracle
    spans = pipe.read_table("spans").to_pylist()
    by_doc: dict[str, list] = {}
    for r in spans:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, doc_spans in zip(
        docs.column("doc_id").to_pylist(), docs.column("spans").to_pylist()
    ):
        got = sorted(by_doc[doc_id], key=lambda r: r["span_seq"])
        assert [(g["kind"], g["text"], g["media_ref"], g["span_seq"]) for g in got] == [
            (s["kind"], s["text"], s["media_ref"], i) for i, s in enumerate(doc_spans)
        ], doc_id


def test_entities_match(pipeline_and_oracle):
    pipe, golden, _s, _d = pipeline_and_oracle
    got = {(r["label"], r["key"]) for r in pipe.read_table("entities").to_pylist()}
    want = {(r["label"], r["key"]) for r in golden["entities"].to_pylist()}
    sym_diff = got ^ want
    assert len(sym_diff) / max(len(want), 1) < 0.02, list(sym_diff)[:10]


def test_mentions_canonicalization_agreement(pipeline_and_oracle):
    pipe, golden, _s, _d = pipeline_and_oracle
    got = {
        (r["chunk_id"], r["canonical_name"], r["label"])
        for r in pipe.read_table("mentions").to_pylist()
    }
    want = {
        (r["chunk_id"], r["canonical_name"], r["label"])
        for r in golden["mentions"].to_pylist()
    }
    overlap = len(got & want) / max(len(got | want), 1)
    assert overlap >= 0.98, f"mention agreement {overlap:.4f}"


def test_manifest_lineage(pipeline_and_oracle):
    pipe, _g, summary, _d = pipeline_and_oracle
    units = pipe.manifest.all_units()
    shards = [u for u in units if u.startswith("extraction_shard_")]
    assert len(shards) == pipe.cfg.num_shards
    for u in shards:
        assert units[u]["lineage"]["num_shards"] == pipe.cfg.num_shards
        assert units[u]["rows"] > 0
    assert units["triples"]["rows"] == summary["triples"]
    assert all("partitions" in units[t] for t in ("triples", "entities", "mentions"))
