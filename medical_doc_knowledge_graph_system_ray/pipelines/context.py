"""Context assembly + semantic re-rank (SURVEY.md §2.8 Q7/Q8, §2.2 M11/M12,
§2.6 T6) — the retrieval orchestration the reference runs per query
(/root/reference/app/retrieval/context_builder.py:39-400), over the
materialized tables.

Pure query-side composition of the queryside building blocks; the LLM
generation step is replaced by a deterministic extractive answerer in
rag.py (no network in this environment).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..config import PipelineConfig
from ..functions.embedder import NgramEmbedder
from . import queryside as qs

# M12: keyword-set complexity heuristic (context_builder.py:39-59)
_COMPLEX_KEYWORDS = {
    "why", "how", "explain", "relationship", "related", "cause", "caused",
    "lead", "leads", "connection", "between", "compare", "versus", "risk",
    "interact", "chain", "path",
}


def classify_query_complexity(question: str) -> str:
    words = set(question.lower().replace("?", " ").split())
    return "complex" if words & _COMPLEX_KEYWORDS else "simple"


def sanitize_properties(props: dict) -> dict:
    """M10: drop embeddings/bytes, datetimes -> ISO strings, recursive
    (app/retrieval/utils.py:9-36)."""
    from datetime import date, datetime

    def clean(v):
        if isinstance(v, (bytes, bytearray, memoryview)):
            return None
        if isinstance(v, (datetime, date)):
            return v.isoformat()
        if isinstance(v, dict):
            return {k: clean(x) for k, x in v.items() if k != "embedding"
                    and clean(x) is not None}
        if isinstance(v, (list, tuple)):
            out = [clean(x) for x in v]
            return [x for x in out if x is not None]
        return v

    return {k: clean(v) for k, v in props.items()
            if k != "embedding" and clean(v) is not None}


@dataclass
class ContextBundle:
    """The reference's ContextBundle (app/models/schema.py:130-137),
    including neighborhood_edges (schema.py:134 — VERDICT r2 gap #1)."""

    seed_entities: list[dict] = field(default_factory=list)
    neighborhood_nodes: list[dict] = field(default_factory=list)
    neighborhood_edges: list[dict] = field(default_factory=list)
    reasoning_paths: list[list[str]] = field(default_factory=list)
    citations: list[dict] = field(default_factory=list)
    raw_chunks: list[str] = field(default_factory=list)
    complexity: str = "simple"


_PATH_TARGET_LABELS = {"Condition", "Medication", "Procedure"}


def _extract_reasoning_paths(out_dir: str, seed_keys: list[str],
                             neighborhood: list[dict]) -> list[list[str]]:
    """Reasoning chains seeds -> interesting targets
    (context_builder.py:297-327): the first 5 neighborhood nodes labeled
    Condition/Medication/Procedure become targets; each gets the
    shortest seeds->target paths (<=5 hops, LIMIT 5)."""
    targets = [n["key"] for n in neighborhood
               if n.get("label") in _PATH_TARGET_LABELS][:5]
    paths: list[list[str]] = []
    seen: set[tuple] = set()
    by_target = qs.find_paths_from_seeds_multi(out_dir, seed_keys, targets,
                                               max_hops=5, limit=5)
    for target in targets:
        for p in by_target[target]:
            chain = p["entity_chain"]
            if len(chain) >= 2 and tuple(chain) not in seen:
                seen.add(tuple(chain))
                paths.append(chain)
    return paths


def build_context(out_dir: str, question: str, top_k: int = 5,
                  cfg: PipelineConfig | None = None) -> ContextBundle:
    """Q7 full composition (context_builder.py:62-158): seeds (Q1) ->
    k-hop at adaptive depth (Q2) -> relationship-constrained merge (Q3)
    -> reasoning paths on complex queries (Q5) -> citations over seeds +
    neighborhood (J5), chunk dedup along the way."""
    cfg = cfg or PipelineConfig()
    complexity = classify_query_complexity(question)
    hops = 2 if complexity == "complex" else 1

    seeds_t = qs.entity_first_retrieval(out_dir, question, top_k=top_k, threshold=0.0,
                                        cfg=cfg)
    seeds = seeds_t.to_pylist() if seeds_t.num_rows else []
    seed_keys = sorted({s["entity"] for s in seeds})

    neighborhood: list[dict] = []
    if seed_keys:
        nb = qs.expand_k_hop(out_dir, seed_keys, hops=hops, limit=100)
        neighborhood = nb.to_pylist()
        # label the neighborhood (pruned key-filtered entities scan) — the
        # Q3 merge and path-target picks need labels
        labels = _labels_for(out_dir, [n["key"] for n in neighborhood])
        for n in neighborhood:
            n["label"] = labels.get(n["key"], "")
        # Q3 merge (context_builder.py:118-129): constrained-path targets
        # not already in the neighborhood are appended
        existing = {n["key"] for n in neighborhood}
        rel_t = qs.relationship_constrained_paths(out_dir, seed_keys,
                                                  max_hops=3, limit=50)
        for r in rel_t.to_pylist():
            if r["target"] not in existing and r["target"] not in seed_keys:
                existing.add(r["target"])
                neighborhood.append({"key": r["target"], "hops": r["hops"],
                                     "label": r["target_label"]})

    # neighborhood edges (context_builder.py:109-126): every edge between
    # kept nodes — covers both the Q2 expansion edges and the Q3-merged
    # targets' edges, collected in ONE pruned vectorized scan
    neighborhood_edges: list[dict] = []
    if seed_keys:
        all_keys = {*seed_keys, *(n["key"] for n in neighborhood)}
        neighborhood_edges = qs.edges_among(out_dir, all_keys)

    reasoning_paths: list[list[str]] = []
    if seed_keys and complexity == "complex":
        reasoning_paths = _extract_reasoning_paths(out_dir, seed_keys, neighborhood)

    cites = []
    if seed_keys:
        # citations over seeds + neighborhood (context_builder.py:135-138)
        cite_keys = sorted({*seed_keys, *(n["key"] for n in neighborhood)})
        cites = qs.citations(out_dir, cite_keys, limit=10).to_pylist()

    seen_chunks: set[str] = set()
    raw_chunks: list[str] = []
    for c in cites:  # chunk dedup (context_builder.py:94-102)
        if c["source_text"] not in seen_chunks:
            seen_chunks.add(c["source_text"])
            raw_chunks.append(c["source_text"])

    return ContextBundle(
        seed_entities=seeds,
        neighborhood_nodes=neighborhood,
        neighborhood_edges=neighborhood_edges,
        reasoning_paths=reasoning_paths,
        citations=cites,
        raw_chunks=raw_chunks,
        complexity=complexity,
    )


def _labels_for(out_dir: str, keys: list[str]) -> dict[str, str]:
    """key -> label via a pruned projected+filtered entities scan."""
    import os

    import pyarrow.compute as pc

    import ray.data as rd

    if not keys:
        return {}
    ds = rd.read_parquet(os.path.join(out_dir, "entities"),
                         columns=["key", "label"],
                         filter=pc.field("key").isin(pa_array_sorted(keys)))
    return {r["key"]: r["label"] for r in ds.take_all()}


def pa_array_sorted(keys):
    import pyarrow as pa

    return pa.array(sorted(set(keys)))


def rerank_context_bundle(bundle: ContextBundle, question: str,
                          cfg: PipelineConfig | None = None,
                          threshold: float | None = None,
                          max_seeds: int = 8, max_nodes: int = 10,
                          max_citations: int = 10,
                          max_paths: int = 5) -> ContextBundle:
    """Q8/T6, full reference semantics (context_builder.py:164-278):
    embed the question, score seeds/nodes/citations, threshold-prune and
    cap (simple queries tighten to 3/3/3, paths -> 0, threshold bar
    raised by rerank_simple_delta — the reference's 0.25 -> 0.35 floor;
    complex to 6/8/8); edges keep only those touching kept nodes,
    capped at max_nodes; reasoning paths filter by NAME OVERLAP with kept
    entities (not embedding score); raw chunks pass through UNCAPPED —
    they are the primary evidence (context_builder.py:255-257)."""
    cfg = cfg or PipelineConfig()
    emb = NgramEmbedder(cfg.embedding_dim)
    qv = emb.embed_batch([question])[0]
    threshold = cfg.rerank_threshold if threshold is None else threshold
    if bundle.complexity == "simple":
        max_seeds, max_nodes, max_citations, max_paths = (
            min(max_seeds, 3), min(max_nodes, 3), min(max_citations, 3), 0)
        # higher bar for simple queries (reference floor: default + 0.10)
        threshold = max(threshold, cfg.rerank_threshold + cfg.rerank_simple_delta)
    else:
        max_seeds, max_nodes, max_citations = (
            min(max_seeds, 6), min(max_nodes, 8), min(max_citations, 8))

    def score_filter_cap(items: list[dict], text_of, cap: int) -> list[dict]:
        if not items:
            return []
        vecs = emb.embed_batch([text_of(i) for i in items])
        scored = sorted(zip((vecs @ qv).tolist(), range(len(items))),
                        key=lambda t: (-t[0], t[1]))
        return [items[i] for s, i in scored if s >= threshold][:cap]

    seeds = score_filter_cap(bundle.seed_entities, lambda s: s["entity"],
                             max_seeds)
    nodes = score_filter_cap(bundle.neighborhood_nodes, lambda n: n["key"],
                             max_nodes)

    # edges: keep those touching a kept node, capped at max_nodes
    # (context_builder.py:226-231)
    kept_keys = {s["entity"] for s in seeds} | {n["key"] for n in nodes}
    edges = [e for e in bundle.neighborhood_edges
             if e["subj"] in kept_keys or e["obj"] in kept_keys][:max_nodes]

    # paths: name overlap with kept entities (context_builder.py:244-253)
    kept_names = {k.lower() for k in kept_keys}
    paths = [p for p in bundle.reasoning_paths
             if {s.lower() for s in p} & kept_names][:max_paths]

    return ContextBundle(
        seed_entities=seeds,
        neighborhood_nodes=nodes,
        neighborhood_edges=edges,
        reasoning_paths=paths,
        citations=score_filter_cap(
            bundle.citations,
            lambda c: f"{c['entity_name']} {c['source_text'][:100]}",
            max_citations),
        raw_chunks=list(bundle.raw_chunks),
        complexity=bundle.complexity,
    )


def format_context_for_prompt(bundle: ContextBundle) -> str:
    """M11: the reference's 3-section prompt block
    (context_builder.py:330-400) — Source Text, Graph Context (entities
    with inline relationships, the r2-missing edges section), Reasoning
    Paths, Provenance."""
    lines: list[str] = []
    if bundle.raw_chunks:
        lines.append("## Source Text")
        for i, chunk in enumerate(bundle.raw_chunks, 1):
            lines.append(f"[Chunk {i}]: {chunk}")
    entities = []
    seen = set()
    for s in bundle.seed_entities:
        if s["entity"] not in seen:
            seen.add(s["entity"])
            entities.append((s["entity"], s.get("label", "")))
    for n in bundle.neighborhood_nodes:
        if n["key"] not in seen:
            seen.add(n["key"])
            entities.append((n["key"], n.get("label", "")))
    if entities:
        lines.append("\n## Graph Context")
        for name, label in entities[:15]:
            lines.append(f"- ({label}) {name}")
        # relationships inline (context_builder.py:364-369)
        for e in bundle.neighborhood_edges[:10]:
            lines.append(f"  {e['subj']} -[{e['pred']}]-> {e['obj']}")
    if bundle.reasoning_paths:
        lines.append("\n## Reasoning Paths")
        for p in bundle.reasoning_paths[:5]:
            lines.append("  " + " -> ".join(p))
    if bundle.citations:
        lines.append("\n## Provenance")
        for c in bundle.citations[:10]:
            lines.append(
                f"- '{c['entity_name']}' from [{c['section']}] in "
                f"{c['source_file']} (confidence: {c['confidence']:.2f}): "
                f"\"{c['source_text'][:100]}\"")
    return "\n".join(lines)
