"""SOAP-section-aware sliding-window chunking as a stateless map_batches stage.

Reimplements the reference chunker's observable semantics exactly
(section splitting /root/reference/app/ingestion/chunker.py:76-102,
assessment item splitting :105-119, sliding window :122-138, composite
:34-73, deterministic ids :25-28, demographics single-chunk path
:144-162) over the reassembled text of an interleaved-span document.
Chunk-id math is load-bearing: resume and triple matching rely on it.

One doc -> N chunks: the batch function returns more rows than it
receives (Ray Data map_batches permits row-count changes). Media spans
are zero-width for chunking, exactly as the reference reads a plain
text file; they are preserved verbatim in the spans provenance table
(see spans_batch).
"""

from __future__ import annotations

import re

import pyarrow as pa

from ..config import PipelineConfig
from ..functions.hashing import make_chunk_id
from ..schemas import CHUNKS_SCHEMA, SPANS_SCHEMA

_SECTION_PATTERNS: list[tuple[str, re.Pattern]] = [
    ("Subjective", re.compile(r"^Subjective\s*:", re.IGNORECASE)),
    ("Objective", re.compile(r"^Objective\s*:", re.IGNORECASE)),
    ("Assessment", re.compile(r"^Assessment\s*:", re.IGNORECASE)),
    ("Plan", re.compile(r"^Plan\s*:", re.IGNORECASE)),
]
_LINE_RE = re.compile(r"^(.+)$", re.MULTILINE)
_ITEM_RE = re.compile(r"(?:^|\n)\s*(\d+)\.\s+", re.MULTILINE)


def split_into_sections(text: str) -> list[tuple[str, str, int]]:
    """[(section_label, body, start_char)] — no header => whole text Subjective."""
    boundaries: list[tuple[int, str]] = []
    for line_match in _LINE_RE.finditer(text):
        line = line_match.group(1)
        for sec, pat in _SECTION_PATTERNS:
            m = pat.match(line)
            if m:
                boundaries.append((line_match.start() + m.end(), sec))
                break
    if not boundaries:
        return [("Subjective", text, 0)]
    sections: list[tuple[str, str, int]] = []
    for i, (start, label) in enumerate(boundaries):
        if i + 1 < len(boundaries):
            end = boundaries[i + 1][0] - len(label) - 2
            next_header_start = text.rfind("\n", 0, boundaries[i + 1][0])
            if next_header_start > start:
                end = next_header_start
        else:
            end = len(text)
        sections.append((label, text[start:end].strip(), start))
    return sections


def split_assessment_items(text: str, base_offset: int) -> list[tuple[str, int]]:
    matches = list(_ITEM_RE.finditer(text))
    if len(matches) <= 1:
        return [(text, base_offset)]
    items = []
    for i, m in enumerate(matches):
        start = m.start()
        end = matches[i + 1].start() if i + 1 < len(matches) else len(text)
        items.append((text[start:end].strip(), base_offset + start))
    return items


def sliding_window(text: str, max_chars: int, overlap: int) -> list[tuple[str, int]]:
    if len(text) <= max_chars:
        return [(text, 0)]
    windows = []
    step = max(max_chars - overlap, 1)
    pos = 0
    while pos < len(text):
        end = min(pos + max_chars, len(text))
        windows.append((text[pos:end], pos))
        if end == len(text):
            break
        pos += step
    return windows


def patient_of(doc_id: str) -> str:
    return doc_id.split("::", 1)[0]


def chunk_document(doc_id: str, text: str, cfg: PipelineConfig) -> list[dict]:
    """All chunk rows for one document, in emission (seq) order."""
    if doc_id.endswith("::demo"):
        # structured path: whole JSON is one Demographics chunk (chunker.py:144-162)
        return [
            {
                "chunk_id": make_chunk_id(doc_id, "Demographics", 0),
                "doc_id": doc_id,
                "patient_number": patient_of(doc_id),
                "section": "Demographics",
                "seq": 0,
                "start_char": 0,
                "end_char": len(text),
                "text": text,
            }
        ]
    chunks: list[dict] = []
    global_idx = 0
    pnum = patient_of(doc_id)
    for section_label, section_text, sec_start in split_into_sections(text):
        if section_label == "Assessment":
            sub_texts = split_assessment_items(section_text, sec_start)
        else:
            sub_texts = [(section_text, sec_start)]
        for sub_text, sub_start in sub_texts:
            for win_text, win_offset in sliding_window(
                sub_text, cfg.max_chunk_chars, cfg.overlap_chars
            ):
                abs_start = sub_start + win_offset
                chunks.append(
                    {
                        "chunk_id": make_chunk_id(doc_id, section_label, global_idx),
                        "doc_id": doc_id,
                        "patient_number": pnum,
                        "section": section_label,
                        "seq": global_idx,
                        "start_char": abs_start,
                        "end_char": abs_start + len(win_text),
                        "text": win_text.strip(),
                    }
                )
                global_idx += 1
    return chunks


def chunk_batch(batch: pa.Table, cfg: PipelineConfig) -> pa.Table:
    """map_batches body: documents(doc_id, spans) -> chunk rows."""
    out: list[dict] = []
    doc_ids = batch.column("doc_id").to_pylist()
    spans_col = batch.column("spans").to_pylist()
    for doc_id, spans in zip(doc_ids, spans_col):
        text = "".join(s["text"] for s in spans if s["kind"] == "text")
        out.extend(chunk_document(doc_id, text, cfg))
    return pa.Table.from_pylist(out, schema=CHUNKS_SCHEMA)


def spans_batch(batch: pa.Table) -> pa.Table:
    """documents -> flat spans provenance rows (the per-row span-sequence
    invariant: (kind, text, media_ref, order) preserved verbatim).

    Zero-copy Arrow kernels: the list<struct> column flattens to its
    child arrays; doc_id repeats by list length and span_seq comes from
    offset arithmetic — no per-span Python dict is ever built (this runs
    over the whole corpus inside the chunks/spans exchange)."""
    import numpy as np

    spans = batch.column("spans").combine_chunks()
    if isinstance(spans, pa.ChunkedArray):  # zero-chunk edge case
        spans = pa.array([], type=spans.type) if spans.num_chunks == 0 \
            else spans.chunk(0)
    offsets = np.asarray(spans.offsets)
    lengths = np.diff(offsets)
    doc_ids = batch.column("doc_id").combine_chunks()
    flat = spans.flatten()  # struct<kind, text, media_ref, offset>
    n = len(flat)
    # span_seq: 0..len-1 within each document
    seq = np.arange(n, dtype=np.int64) - np.repeat(offsets[:-1], lengths)
    return pa.table({
        "doc_id": doc_ids.take(pa.array(np.repeat(
            np.arange(len(batch), dtype=np.int64), lengths))),
        "span_seq": pa.array(seq.astype(np.int32)),
        "kind": flat.field("kind"),
        "text": flat.field("text"),
        "media_ref": flat.field("media_ref"),
        "offset": flat.field("offset"),
    }).cast(SPANS_SCHEMA)
