"""Query-side operators over the materialized tables — the graph-read
surface the reference serves from Neo4j (SURVEY.md §2.8), re-expressed
over the partitioned edge-list tables.

Traversals use the broadcast-frontier pattern: the frontier (a small
node set) ships to every scan task; each hop is one filtered pass over
the triples table (undirected = match either endpoint), accumulated
visited nodes act as the anti-join. Provenance joins use pruned
predicate-pushdown reads on chunk_id.

Reference parity targets:
  entity_first_retrieval  /root/reference/app/retrieval/entity_first.py:36-90
  expand_k_hop            /root/reference/app/retrieval/k_hop_expansion.py:69-128
  condition chains        /root/reference/app/retrieval/relationship_filter.py:114-134
  citations               /root/reference/app/retrieval/provenance.py:19-64
  shortest path           /root/reference/app/retrieval/path_reasoning.py:62-152
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


import ray.data as rd

from ..config import PipelineConfig
from ..functions.embedder import NgramEmbedder
from ..schemas import CLINICAL_PREDICATES


def _read(out_dir: str, table: str, columns=None, filter_expr=None) -> rd.Dataset:
    return rd.read_parquet(os.path.join(out_dir, table), columns=columns,
                           filter=filter_expr)


# ── Q2: k-hop expansion (undirected, frontier-iterated) ───────────────

def expand_k_hop(out_dir: str, seed_keys: list[str], hops: int = 2,
                 limit: int = 100, predicates: tuple[str, ...] | None = None) -> pa.Table:
    """Nodes within `hops` undirected steps of the seeds, excluding seeds,
    with their hop distance; DISTINCT, ordered by (hops, key), LIMIT.

    Each hop = one filtered scan of triples with the frontier broadcast
    in the task closure (semi-join). Matches the semantics of the
    reference's variable-length Cypher (k_hop_expansion.py:20-66)."""
    seeds = set(seed_keys)
    visited: dict[str, int] = {k: 0 for k in seeds}
    frontier = set(seeds)
    for h in range(1, hops + 1):
        if not frontier:
            break
        fr = frontier  # captured by value in the closure below

        def touch(batch: pa.Table, fr=fr) -> pa.Table:
            subj = batch.column("subj").to_pylist()
            obj = batch.column("obj").to_pylist()
            pred = batch.column("pred").to_pylist()
            rows = []
            for s, o, p in zip(subj, obj, pred):
                if predicates is not None and p not in predicates:
                    continue
                if s in fr:
                    rows.append(o)
                if o in fr:
                    rows.append(s)
            return pa.table({"node": pa.array(sorted(set(rows)), type=pa.string())})

        ds = _read(out_dir, "triples", columns=["subj", "pred", "obj"])
        new_nodes = set(ds.map_batches(touch, batch_format="pyarrow").unique("node"))
        frontier = {n for n in new_nodes if n not in visited}
        for n in frontier:
            visited[n] = h
    rows = [{"key": k, "hops": h} for k, h in visited.items() if k not in seeds]
    rows.sort(key=lambda r: (r["hops"], r["key"]))
    return pa.Table.from_pylist(rows[:limit],
                                schema=pa.schema([("key", pa.string()),
                                                  ("hops", pa.int32())]))


def explore(out_dir: str, key: str, hops: int = 2, limit: int = 100) -> dict:
    """/graph/explore analog (app/main.py:179-214): center node, the k-hop
    neighborhood nodes AND the edges among them."""
    nodes_t = expand_k_hop(out_dir, [key], hops=hops, limit=limit)
    nodes = {r["key"]: r["hops"] for r in nodes_t.to_pylist()}
    keep = set(nodes) | {key}

    def edges_within(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df[df["subj"].isin(keep) & df["obj"].isin(keep)]
        return pa.Table.from_pandas(df, preserve_index=False)

    edges = (
        _read(out_dir, "triples",
              columns=["subj", "pred", "obj", "confidence"])
        .map_batches(edges_within, batch_format="pyarrow")
        .take_all()
    )
    edges.sort(key=lambda e: (e["subj"], e["pred"], e["obj"]))
    return {
        "center": key,
        "hops": hops,
        "nodes": [{"key": k, "hops": h} for k, h in sorted(nodes.items())],
        "edges": edges,
    }


def relationship_constrained_expansion(out_dir: str, seed_keys: list[str],
                                       hops: int = 3, limit: int = 50) -> pa.Table:
    """Q3: same frontier loop restricted to the 8 clinical predicates."""
    return expand_k_hop(out_dir, seed_keys, hops=hops, limit=limit,
                        predicates=CLINICAL_PREDICATES)


# ── Q5: shortest path (bidirectional-ish BFS with parent tracking) ────

def shortest_path(out_dir: str, a: str, b: str, max_hops: int = 6) -> list[str] | None:
    if a == b:
        return None  # same-node guard (path_reasoning.py:70-72)
    parents: dict[str, str | None] = {a: None}
    frontier = {a}
    for _ in range(max_hops):
        if not frontier:
            break
        fr = frontier

        def edges_touching(batch: pa.Table, fr=fr) -> pa.Table:
            subj = batch.column("subj").to_pylist()
            obj = batch.column("obj").to_pylist()
            rows_a, rows_b = [], []
            for s, o in zip(subj, obj):
                if s in fr:
                    rows_a.append(s)
                    rows_b.append(o)
                if o in fr:
                    rows_a.append(o)
                    rows_b.append(s)
            return pa.table({"frm": pa.array(rows_a, type=pa.string()),
                             "to": pa.array(rows_b, type=pa.string())})

        ds = _read(out_dir, "triples", columns=["subj", "obj"])
        hop_edges = ds.map_batches(edges_touching, batch_format="pyarrow").take_all()
        nxt = set()
        for e in sorted(hop_edges, key=lambda e: (e["to"], e["frm"])):
            if e["to"] not in parents:
                parents[e["to"]] = e["frm"]
                nxt.add(e["to"])
        if b in parents:
            path = [b]
            while parents[path[-1]] is not None:
                path.append(parents[path[-1]])
            return list(reversed(path))
        frontier = nxt
    return None


# ── Q4: condition chains ──────────────────────────────────────────────

def condition_chains(out_dir: str, patient_number: str) -> pa.Table:
    """Per condition of the patient: treating medications + manifesting
    symptoms, collected DISTINCT (relationship_filter.py:50-61)."""
    tris = _read(out_dir, "triples",
                 columns=["subj", "pred", "obj", "subj_label"]) \
        .map_batches(
            lambda t: t.filter(
                pc.is_in(t.column("pred"),
                         value_set=pa.array(["HAS_CONDITION", "TREATED_WITH",
                                             "MANIFESTS_AS"]))),
            batch_format="pyarrow",
        ).take_all()
    conds = sorted({r["obj"] for r in tris
                    if r["pred"] == "HAS_CONDITION" and r["subj"] == patient_number})
    meds: dict[str, set] = {c: set() for c in conds}
    syms: dict[str, set] = {c: set() for c in conds}
    for r in tris:
        if r["subj"] in meds:
            if r["pred"] == "TREATED_WITH":
                meds[r["subj"]].add(r["obj"])
            elif r["pred"] == "MANIFESTS_AS":
                syms[r["subj"]].add(r["obj"])
    return pa.Table.from_pylist(
        [{"condition": c, "medications": sorted(meds[c]), "symptoms": sorted(syms[c])}
         for c in conds]
    )


# ── J5/J6: provenance citations ───────────────────────────────────────

def citations(out_dir: str, entity_keys: list[str], limit: int = 50) -> pa.Table:
    """entity -> witness chunks with text and confidence, ORDER BY
    confidence DESC (provenance.py:19-48). Pruned reads: mentions are
    filtered by canonical name at the parquet scan; chunks by the small
    chunk-id set."""
    keyset = pa.array(sorted(set(entity_keys)))
    mentions = _read(
        out_dir, "mentions",
        columns=["canonical_name", "label", "chunk_id", "confidence",
                 "extraction_method"],
        filter_expr=pc.field("canonical_name").isin(keyset),
    ).take_all()
    chunk_ids = pa.array(sorted({m["chunk_id"] for m in mentions}))
    chunks = {}
    if len(chunk_ids):
        for c in _read(out_dir, "chunks",
                       columns=["chunk_id", "doc_id", "section", "text"],
                       filter_expr=pc.field("chunk_id").isin(chunk_ids)).take_all():
            chunks[c["chunk_id"]] = c
    rows = []
    for m in mentions:
        c = chunks.get(m["chunk_id"])
        if c is None:
            continue
        rows.append({
            "entity_name": m["canonical_name"],
            "source_text": c["text"],
            "section": c["section"],
            "source_file": c["doc_id"],
            "confidence": float(m["confidence"]),
            "extraction_method": m["extraction_method"],
        })
    rows.sort(key=lambda r: (-r["confidence"], r["entity_name"], r["source_file"]))
    return pa.Table.from_pylist(rows[:limit])


def full_trace(out_dir: str, entity_keys: list[str], limit: int = 50) -> pa.Table:
    """J6: citations + the NEXT chunk's text (self-join on (doc_id, seq+1),
    provenance.py:50-64)."""
    base = citations(out_dir, entity_keys, limit=limit).to_pylist()
    if not base:
        return pa.Table.from_pylist([])
    doc_ids = pa.array(sorted({r["source_file"] for r in base}))
    by_doc_seq = {}
    for c in _read(out_dir, "chunks", columns=["doc_id", "seq", "text"],
                   filter_expr=pc.field("doc_id").isin(doc_ids)).take_all():
        by_doc_seq[(c["doc_id"], c["seq"])] = c["text"]
    # locate each citation chunk's seq via its text match fallback: re-read with seq
    chunk_seq = {}
    for c in _read(out_dir, "chunks", columns=["doc_id", "seq", "text"],
                   filter_expr=pc.field("doc_id").isin(doc_ids)).take_all():
        chunk_seq[(c["doc_id"], c["text"])] = c["seq"]
    for r in base:
        seq = chunk_seq.get((r["source_file"], r["source_text"]))
        r["next_text"] = by_doc_seq.get((r["source_file"], (seq or 0) + 1), "")
    return pa.Table.from_pylist(base)


# ── Q1: entity-first retrieval ────────────────────────────────────────

def entity_first_retrieval(out_dir: str, query: str, top_k: int = 5,
                           threshold: float = 0.35,
                           cfg: PipelineConfig | None = None) -> pa.Table:
    """Embed the query, score chunks by cosine (embedding computed on the
    fly per batch by the actor pool), take top-k above threshold, then
    left-join to mentions for seed entities (entity_first.py:36-90)."""
    cfg = cfg or PipelineConfig()
    # use the stored embedding column when the chunks table has one
    # (cfg.embed_chunks pipelines / Lance vector column); otherwise embed
    # the text on the fly inside the actor pool
    import pyarrow.parquet as _pq

    first_file = sorted(
        f for f in os.listdir(os.path.join(out_dir, "chunks"))
        if f.endswith(".parquet")
    )[0]
    has_embedding = "embedding" in _pq.read_schema(
        os.path.join(out_dir, "chunks", first_file)).names

    class ScoreChunks:
        def __init__(self):
            self.emb = NgramEmbedder(cfg.embedding_dim)
            self.q = self.emb.embed_batch([query])[0]

        def __call__(self, batch: pa.Table) -> pa.Table:
            if has_embedding:
                flat = batch.column("embedding").combine_chunks().flatten()
                vecs = np.asarray(flat).reshape(batch.num_rows, -1)
            else:
                vecs = self.emb.embed_batch(batch.column("text").to_pylist())
            scores = vecs @ self.q[: vecs.shape[1]]
            return pa.table({
                "chunk_id": batch.column("chunk_id"),
                "doc_id": batch.column("doc_id"),
                "score": pa.array(np.round(scores.astype(np.float64), 6)),
            })

    score_cols = ["chunk_id", "doc_id",
                  "embedding" if has_embedding else "text"]
    scored = (
        _read(out_dir, "chunks", columns=score_cols)
        .map_batches(ScoreChunks, batch_format="pyarrow", concurrency=(1, 4))
        .map_batches(lambda t: t.filter(pc.greater_equal(t.column("score"), threshold)),
                     batch_format="pyarrow")
        .sort("score", descending=True)
        .limit(top_k)
        .take_all()
    )
    if not scored:
        return pa.Table.from_pylist([])
    chunk_ids = pa.array(sorted({r["chunk_id"] for r in scored}))
    ments = _read(out_dir, "mentions",
                  columns=["chunk_id", "canonical_name", "label", "confidence"],
                  filter_expr=pc.field("chunk_id").isin(chunk_ids)).take_all()
    by_chunk: dict[str, list] = {}
    for m in ments:
        by_chunk.setdefault(m["chunk_id"], []).append(m)
    rows = []
    seen = set()
    for r in sorted(scored, key=lambda r: (-r["score"], r["chunk_id"])):
        for m in by_chunk.get(r["chunk_id"], []):
            key = (m["canonical_name"], m["label"])
            if key in seen:
                continue  # dedup entities by id (entity_first.py:75-82)
            seen.add(key)
            rows.append({"entity": m["canonical_name"], "label": m["label"],
                         "chunk_id": r["chunk_id"], "score": r["score"],
                         "confidence": float(m["confidence"])})
    return pa.Table.from_pylist(rows)
