"""Chunker invariants — mirrors the reference's own chunker tests
(/root/reference/tests/test_ingestion.py:55-119) plus span-sequence checks."""

from __future__ import annotations

import hashlib

from medical_doc_knowledge_graph_system_ray.config import PipelineConfig
from medical_doc_knowledge_graph_system_ray.corpus import synthesize_corpus_table
from medical_doc_knowledge_graph_system_ray.stages.chunking import (
    chunk_batch,
    chunk_document,
    sliding_window,
    spans_batch,
    split_into_sections,
)

CFG = PipelineConfig()

# the reference's own inline fixture note (tests/test_ingestion.py:18-33)
SAMPLE_NOTE = """Subjective:
Patient reports chest pain on exertion. Has hx of GERD.
Denies SOB at rest.

Objective:
BP 152/88, HR 78, RR 16, SpO2 97%.
Lungs CTA bilaterally.

Assessment:
1. Likely stable angina given exertional pattern.
2. Hypertension - borderline control.
3. GERD - chronic.

Plan:
- Continue current medications.
- Schedule stress test.
"""


def test_all_sections_covered():
    chunks = chunk_document("doc1", SAMPLE_NOTE, CFG)
    sections = {c["section"] for c in chunks}
    assert sections == {"Subjective", "Objective", "Assessment", "Plan"}


def test_assessment_items_split():
    chunks = chunk_document("doc1", SAMPLE_NOTE, CFG)
    assessment = [c for c in chunks if c["section"] == "Assessment"]
    assert len(assessment) >= 2  # numbered items split


def test_chunk_ids_unique_and_deterministic():
    chunks = chunk_document("doc1", SAMPLE_NOTE, CFG)
    ids = [c["chunk_id"] for c in chunks]
    assert len(ids) == len(set(ids))
    expected = hashlib.sha256(b"doc1::Subjective::0").hexdigest()[:16]
    assert chunks[0]["chunk_id"] == expected
    assert chunk_document("doc1", SAMPLE_NOTE, CFG)[0]["chunk_id"] == expected


def test_offsets_valid():
    chunks = chunk_document("doc1", SAMPLE_NOTE, CFG)
    for c in chunks:
        assert 0 <= c["start_char"] < c["end_char"] <= len(SAMPLE_NOTE)
        assert c["doc_id"] == "doc1"
        assert c["text"]


def test_no_header_is_subjective():
    secs = split_into_sections("just some text with no headers")
    assert secs == [("Subjective", "just some text with no headers", 0)]


def test_sliding_window_math():
    text = "x" * 1500
    wins = sliding_window(text, 600, 80)
    assert wins[0] == ("x" * 600, 0)
    assert wins[1][1] == 520  # step = max - overlap
    assert wins[-1][0][-1] == "x"
    # covers the whole text
    assert wins[-1][1] + len(wins[-1][0]) == 1500
    assert sliding_window("short", 600, 80) == [("short", 0)]


def test_demographics_single_chunk():
    chunks = chunk_document("PT-1::demo", '{"patient_number": "PT-1"}', CFG)
    assert len(chunks) == 1
    assert chunks[0]["section"] == "Demographics"
    assert chunks[0]["seq"] == 0


def test_chunk_batch_and_spans_batch():
    docs = synthesize_corpus_table(4, CFG)
    chunks = chunk_batch(docs, CFG)
    assert chunks.num_rows > docs.num_rows  # 1 doc -> N chunks flat-map
    spans = spans_batch(docs)
    # span-sequence invariant: flat table reproduces (kind, text, media_ref, order)
    by_doc: dict[str, list] = {}
    for row in spans.to_pylist():
        by_doc.setdefault(row["doc_id"], []).append(row)
    for doc_id, doc_spans in zip(
        docs.column("doc_id").to_pylist(), docs.column("spans").to_pylist()
    ):
        got = sorted(by_doc[doc_id], key=lambda r: r["span_seq"])
        assert [(g["kind"], g["text"], g["media_ref"]) for g in got] == [
            (s["kind"], s["text"], s["media_ref"]) for s in doc_spans
        ]


def test_seq_is_emission_order():
    docs = synthesize_corpus_table(3, CFG)
    chunks = chunk_batch(docs, CFG).to_pylist()
    by_doc: dict[str, list] = {}
    for c in chunks:
        by_doc.setdefault(c["doc_id"], []).append(c["seq"])
    for seqs in by_doc.values():
        assert seqs == list(range(len(seqs)))
