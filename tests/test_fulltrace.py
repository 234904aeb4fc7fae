"""J6 keyed NEXT-chunk join (VERDICT r1 #7): full_trace must join the
next chunk on (doc_id, seq+1) via a carried chunk_id/seq — not by text
matching, which breaks when two chunks share identical text."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def trace_tables(tmp_path_factory):
    """doc D1 has chunks seq 0..3 where seq 0 and seq 2 carry IDENTICAL
    text; the entity is mentioned in both. Text-match would conflate
    their seqs; the keyed join must yield next_text of seq 1 and seq 3
    respectively."""
    out = str(tmp_path_factory.mktemp("trace"))
    chunks = pa.table({
        "chunk_id": ["D1#0", "D1#1", "D1#2", "D1#3"],
        "doc_id": ["D1"] * 4,
        "seq": pa.array([0, 1, 2, 3], type=pa.int32()),
        "section": ["Subjective"] * 4,
        "text": ["same text", "after first", "same text", "after second"],
    })
    mentions = pa.table({
        "canonical_name": ["aspirin", "aspirin"],
        "label": ["Medication"] * 2,
        "chunk_id": ["D1#0", "D1#2"],
        "doc_id": ["D1"] * 2,
        "confidence": pa.array([0.9, 0.8], type=pa.float32()),
        "extraction_method": ["rule"] * 2,
    })
    os.makedirs(os.path.join(out, "chunks"))
    os.makedirs(os.path.join(out, "mentions"))
    pq.write_table(chunks, os.path.join(out, "chunks", "part-00000.parquet"))
    pq.write_table(mentions, os.path.join(out, "mentions", "part-00000.parquet"))
    return out


def test_full_trace_keyed_next_join(ray_session, trace_tables):
    from medical_doc_knowledge_graph_system_ray.pipelines.queryside import full_trace

    rows = full_trace(trace_tables, ["aspirin"], limit=10).to_pylist()
    assert len(rows) == 2
    by_conf = sorted(rows, key=lambda r: -r["confidence"])
    # conf 0.9 mention sits in chunk seq 0 -> next is seq 1
    assert by_conf[0]["source_text"] == "same text"
    assert by_conf[0]["next_text"] == "after first"
    # conf 0.8 mention sits in chunk seq 2 (identical text!) -> next is seq 3
    assert by_conf[1]["source_text"] == "same text"
    assert by_conf[1]["next_text"] == "after second"


def test_citations_carry_chunk_provenance(ray_session, trace_tables):
    from medical_doc_knowledge_graph_system_ray.pipelines.queryside import citations

    rows = citations(trace_tables, ["aspirin"], limit=10).to_pylist()
    assert {r["chunk_id"] for r in rows} == {"D1#0", "D1#2"}
    assert all("seq" in r for r in rows)
    # ORDER BY confidence DESC preserved
    assert [r["confidence"] for r in rows] == sorted(
        (r["confidence"] for r in rows), reverse=True)
