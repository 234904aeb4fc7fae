"""Single-process reference-semantics oracle.

Reimplements, faithfully and sequentially, what the reference pipeline
(/root/reference/app/ingestion/pipeline.py:36-128) computes over a
corpus: chunking (chunker.py:34-138, shared code), extraction (the
deterministic rule extractor, shared code — it replaces the LLM on both
sides, SURVEY.md §7.0), and crucially the ORIGINAL two-pass entity
resolution algorithm (entity_resolver.py:47-143) with its all-pairs
fuzzy loop, last-write-wins overwrites, single-step name_map lookup and
pass-2 transitive value rewrite — the exact semantics the Ray pipeline's
blocked union-find reformulation must match at triple P/R >= 0.95.

Iteration order (the reference iterates Python set order) is fixed to
sorted() for determinism. Documents are processed in sorted doc_id
order, chunks in seq order — the "write order" that first-writer-wins
property merges observe.
"""

from __future__ import annotations

import json

import pyarrow as pa

from ..config import PipelineConfig
from ..functions.embedder import NgramEmbedder, cosine_matrix
from ..functions.textsim import token_sort_ratio
from ..stages.chunking import chunk_document
from ..stages.extraction import RuleExtractor
from ..stages.materialize import project_entity_props
from ..vocab import SYNONYM_MAP


def oracle_build_name_map(unique_names: list[str], cfg: PipelineConfig) -> dict[str, str]:
    """Verbatim reference algorithm (entity_resolver.py:102-143), sorted order."""
    unique_names = sorted(set(unique_names))
    name_map: dict[str, str] = {n: n for n in unique_names}

    # Pass 1: known synonyms + all-pairs fuzzy (last write wins, no transitivity)
    for name in unique_names:
        lower = name.lower().strip()
        if lower in SYNONYM_MAP:
            name_map[name] = SYNONYM_MAP[lower]
            continue
        for other in unique_names:
            if other == name:
                continue
            score = token_sort_ratio(name.lower(), other.lower())
            if score >= cfg.fuzzy_threshold:
                canonical = name if len(name) >= len(other) else other
                name_map[name] = canonical
                name_map[other] = canonical

    # Pass 2: embedding cosine over canonical values, transitive value rewrite
    canonical_names = sorted(set(name_map.values()))
    if len(canonical_names) > 1:
        emb = NgramEmbedder(cfg.embedding_dim)
        embeddings = emb.embed_batch(canonical_names)
        sims = cosine_matrix(embeddings, embeddings)
        for i, name_a in enumerate(canonical_names):
            for j in range(i + 1, len(canonical_names)):
                name_b = canonical_names[j]
                if sims[i, j] >= cfg.semantic_threshold:
                    canonical = name_a if len(name_a) >= len(name_b) else name_b
                    for k, v in name_map.items():
                        if v == name_a or v == name_b:
                            name_map[k] = canonical
    return name_map


def run_oracle(documents: pa.Table, cfg: PipelineConfig) -> dict[str, pa.Table]:
    """Full sequential pipeline -> {chunks, mentions, entities, triples} tables
    (properties as canonical-JSON strings)."""
    extractor = RuleExtractor()

    docs = sorted(
        zip(documents.column("doc_id").to_pylist(), documents.column("spans").to_pylist()),
        key=lambda d: d[0],
    )

    all_chunks: list[dict] = []
    extraction_rows: list[dict] = []
    for doc_id, spans in docs:
        text = "".join(s["text"] for s in spans if s["kind"] == "text")
        chunks = chunk_document(doc_id, text, cfg)
        all_chunks.extend(chunks)
        for c in chunks:
            extraction_rows.extend(
                extractor.extract_chunk(
                    c["chunk_id"], c["doc_id"], c["patient_number"],
                    c["section"], c["seq"], c["text"],
                )
            )

    mentions_raw = [r for r in extraction_rows if r["kind"] == "m"]
    triples_raw = [r for r in extraction_rows if r["kind"] == "t"]

    name_map = oracle_build_name_map([m["name"] for m in mentions_raw], cfg)

    # remap + per-chunk (canonical, label) max-confidence dedup
    # (entity_resolver.py:70-82: strictly-greater replaces, ties keep first)
    deduped: dict[tuple, dict] = {}
    for m in mentions_raw:
        canon = name_map.get(m["name"], m["name"])
        key = (m["chunk_id"], canon, m["label"])
        prev = deduped.get(key)
        if prev is None or m["confidence"] > prev["confidence"]:
            deduped[key] = {**m, "canonical_name": canon}
    mentions = sorted(deduped.values(), key=lambda m: m["order_key"])

    # entities: first-writer-wins on (label, key) in write order
    entities: dict[tuple, dict] = {}
    for m in mentions:
        if m["label"] == "Patient" and m["method"] != "structured_json":
            continue
        props = json.loads(m["props"]) if m["props"] else {}
        key, projected = project_entity_props(m["label"], m["canonical_name"], props)
        k = (m["label"], key)
        if k not in entities:
            entities[k] = {"label": m["label"], "key": key, "properties": projected}

    entity_keys = set(entities.keys())

    # triples: endpoint remap, dangling drop, (subj,pred,obj) dedup
    triples: dict[tuple, dict] = {}
    for t in sorted(triples_raw, key=lambda r: r["order_key"]):
        subj = t["subj"] if t["subj_label"] == "Patient" else name_map.get(t["subj"], t["subj"])
        obj = t["obj"] if t["obj_label"] == "Patient" else name_map.get(t["obj"], t["obj"])
        if t["obj_label"] == "Vital":
            props = json.loads(t["props"]) if t["props"] else {}
            obj = f"{obj}_{props.get('value', '')}"
        if (t["subj_label"], subj) not in entity_keys or (t["obj_label"], obj) not in entity_keys:
            continue
        k = (subj, t["pred"], obj)
        prev = triples.get(k)
        if prev is None:
            triples[k] = {
                "subj": subj, "subj_label": t["subj_label"], "pred": t["pred"],
                "obj": obj, "obj_label": t["obj_label"],
                "confidence": t["confidence"], "chunk_id": t["chunk_id"],
            }
        else:
            prev["confidence"] = max(prev["confidence"], t["confidence"])
            prev["chunk_id"] = min(prev["chunk_id"], t["chunk_id"])

    from ..schemas import CHUNKS_SCHEMA, props_to_json

    return {
        "chunks": pa.Table.from_pylist(all_chunks, schema=CHUNKS_SCHEMA),
        "mentions": pa.Table.from_pylist(
            [
                {
                    "chunk_id": m["chunk_id"], "doc_id": m["doc_id"], "name": m["name"],
                    "canonical_name": m["canonical_name"], "label": m["label"],
                    "confidence": m["confidence"], "extraction_method": m["method"],
                    "properties": m["props"], "order_key": m["order_key"],
                }
                for m in mentions
            ]
        ),
        "entities": pa.Table.from_pylist(
            [
                {"label": e["label"], "key": e["key"],
                 "properties": props_to_json(e["properties"])}
                for e in sorted(entities.values(), key=lambda e: (e["label"], e["key"]))
            ]
        ),
        "triples": pa.Table.from_pylist(
            sorted(triples.values(), key=lambda t: (t["subj"], t["pred"], t["obj"]))
        ),
    }
