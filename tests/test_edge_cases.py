"""Edge-case robustness: empty inputs, media-only docs, malformed
structured payloads, unicode, dangling endpoints."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from medical_doc_knowledge_graph_system_ray.config import PipelineConfig
from medical_doc_knowledge_graph_system_ray.schemas import DOCUMENTS_SCHEMA
from medical_doc_knowledge_graph_system_ray.stages.chunking import chunk_batch, spans_batch
from medical_doc_knowledge_graph_system_ray.stages.extraction import RuleExtractor

CFG = PipelineConfig()


def _doc(doc_id, spans):
    return pa.Table.from_pylist([{"doc_id": doc_id, "spans": spans}],
                                schema=DOCUMENTS_SCHEMA)


def test_media_only_document():
    t = _doc("PT-1::note0",
             [{"kind": "media", "text": "", "media_ref": "imaging/x.png", "offset": 0}])
    chunks = chunk_batch(t, CFG)
    # no text -> whole-text Subjective section with empty body, no usable chunks
    for c in chunks.to_pylist():
        assert c["text"] == ""
    spans = spans_batch(t)
    assert spans.num_rows == 1
    assert spans.column("kind").to_pylist() == ["media"]


def test_empty_documents_batch():
    t = pa.Table.from_pylist([], schema=DOCUMENTS_SCHEMA)
    assert chunk_batch(t, CFG).num_rows == 0
    assert spans_batch(t).num_rows == 0


def test_malformed_demographics_is_isolated():
    ex = RuleExtractor()
    rows = ex.extract_chunk("c1", "PT-9::demo", "PT-9", "Demographics", 0,
                            "{not valid json")
    assert rows == []  # per-chunk fault isolation (extractor.py:153-155)


def test_empty_chunk_skipped():
    ex = RuleExtractor()
    assert ex.extract_chunk("c1", "d", "p", "Plan", 0, "   \n ") == []


def test_unicode_text_survives_chunking_and_extraction():
    text = ("Subjective:\nPatient Müller-Łukasz reports Hypertension — "
            "症状 with ♥ rate issues. BP 140/90, SpO2 96%.\n")
    t = _doc("PT-2::note0",
             [{"kind": "text", "text": text, "media_ref": "", "offset": 0}])
    chunks = chunk_batch(t, CFG).to_pylist()
    assert chunks
    ex = RuleExtractor()
    rows = []
    for c in chunks:
        rows.extend(ex.extract_chunk(c["chunk_id"], c["doc_id"], c["patient_number"],
                                     c["section"], c["seq"], c["text"]))
    names = {r["name"] for r in rows if r["kind"] == "m"}
    assert "Hypertension" in names
    assert "BP" in names and "SpO2" in names


def test_dangling_endpoints_dropped_e2e(ray_session, tmp_path):
    """A doc with the rel-only phrase produces a SCHEDULED_FOR triple whose
    object never becomes an entity -> absent from the final table."""
    import shutil

    from medical_doc_knowledge_graph_system_ray.pipelines.ingest import IngestPipeline

    text = ("Subjective:\nPatient reports Hypertension.\n"
            "Plan:\n- Referred to cardiology for further evaluation.\n")
    demo = ('{"patient_name": "A B", "patient_number": "PT-0", "dob": "1980-01-01",'
            ' "health_card_number": "1", "phone_home": "", "phone_mobile": "",'
            ' "email": "", "address": {}}')
    docs = pa.Table.from_pylist([
        {"doc_id": "PT-0::demo",
         "spans": [{"kind": "text", "text": demo, "media_ref": "", "offset": 0}]},
        {"doc_id": "PT-0::note0",
         "spans": [{"kind": "text", "text": text, "media_ref": "", "offset": 0}]},
    ], schema=DOCUMENTS_SCHEMA)
    ddir = os.path.join(tmp_path, "docs")
    os.makedirs(ddir)
    pq.write_table(docs, os.path.join(ddir, "p.parquet"))
    cfg = PipelineConfig(num_shards=1, num_output_partitions=2, extract_concurrency=1)
    pipe = IngestPipeline(ddir, cfg, output_dir=os.path.join(tmp_path, "out"))
    pipe.run()
    triples = pipe.read_table("triples").to_pylist()
    objs = {t["obj"] for t in triples}
    assert "Cardiology Referral" not in objs  # dangling -> dropped
    assert any(t["pred"] == "HAS_CONDITION" for t in triples)
