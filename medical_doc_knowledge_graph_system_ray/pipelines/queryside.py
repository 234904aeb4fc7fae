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

import logging
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


import ray.data as rd

from ..config import PipelineConfig
from ..functions.embedder import make_embedder
from ..schemas import CLINICAL_PREDICATES

logger = logging.getLogger(__name__)


# Materialize-once cache for repeated query batches (the evaluation
# harness runs 11 questions x 2 strategies = dozens of traversals over
# the same tables). Opt-in via cached_tables(); each table is read and
# materialized into the object store ONCE and every unfiltered _read
# reuses the materialized blocks (column-pruned view). Predicate-
# pushdown reads (filter_expr) keep the parquet path — row-group
# pruning at the read beats a full cached scan. At scale the cache is
# object-store-resident with spill, never driver memory.
_DS_CACHE: dict[tuple[str, str], rd.Dataset] = {}


class cached_tables:
    """Context manager: materialize `tables` under `out_dir` once and
    serve unfiltered _read()s from the cache for the duration."""

    def __init__(self, out_dir: str, tables=("triples", "entities",
                                             "mentions", "chunks")):
        self.keys = [(out_dir, t) for t in tables]
        self._owned: list[tuple[str, str]] = []

    def __enter__(self):
        # ownership tracking (ADVICE r3): only evict the keys THIS
        # instance inserted, so nested/overlapping contexts over the same
        # out_dir don't pull entries out from under an outer context
        self._owned = []
        for out_dir, t in self.keys:
            if (out_dir, t) not in _DS_CACHE:
                _DS_CACHE[(out_dir, t)] = rd.read_parquet(
                    os.path.join(out_dir, t)).materialize()
                self._owned.append((out_dir, t))
        return self

    def __exit__(self, *exc):
        for k in self._owned:
            _DS_CACHE.pop(k, None)
        self._owned = []
        return False


def _read(out_dir: str, table: str, columns=None, filter_expr=None) -> rd.Dataset:
    cached = _DS_CACHE.get((out_dir, table))
    if cached is not None and filter_expr is None:
        return cached.select_columns(columns) if columns else cached
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
    pred_arr = pa.array(sorted(predicates)) if predicates is not None else None
    for h in range(1, hops + 1):
        if not frontier:
            break
        fr_arr = pa.array(sorted(frontier))  # broadcast in the task closure

        def touch(batch: pa.Table, fr_arr=fr_arr) -> pa.Table:
            # vectorized frontier probe: is_in masks + take, no row loop
            if pred_arr is not None:
                batch = batch.filter(pc.is_in(batch.column("pred"),
                                              value_set=pred_arr))
            hit_s = batch.filter(pc.is_in(batch.column("subj"), value_set=fr_arr))
            hit_o = batch.filter(pc.is_in(batch.column("obj"), value_set=fr_arr))
            nodes = pa.concat_arrays([
                hit_s.column("obj").combine_chunks(),
                hit_o.column("subj").combine_chunks(),
            ])
            return pa.table({"node": nodes.unique()})  # per-batch partial unique

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


def edges_among(out_dir: str, keys, limit: int = 10_000) -> list[dict]:
    """Edges whose BOTH endpoints are in `keys` — the explore/Q7 edge
    collection. One pruned triples scan, vectorized pc.is_in mask
    (VERDICT r2 #9: no pandas isin), limit() before driver collection."""
    keep_arr = pa.array(sorted(set(keys)))

    def within(batch: pa.Table) -> pa.Table:
        mask = pc.and_(pc.is_in(batch.column("subj"), value_set=keep_arr),
                       pc.is_in(batch.column("obj"), value_set=keep_arr))
        return batch.filter(mask)

    edges = (
        _read(out_dir, "triples",
              columns=["subj", "pred", "obj", "confidence"])
        .map_batches(within, batch_format="pyarrow")
        .limit(limit)
        .take_all()
    )
    edges.sort(key=lambda e: (e["subj"], e["pred"], e["obj"]))
    return edges


def explore(out_dir: str, key: str, hops: int = 2, limit: int = 100) -> dict:
    """/graph/explore analog (app/main.py:179-214): center node, the k-hop
    neighborhood nodes AND the edges among them."""
    nodes_t = expand_k_hop(out_dir, [key], hops=hops, limit=limit)
    nodes = {r["key"]: r["hops"] for r in nodes_t.to_pylist()}
    return {
        "center": key,
        "hops": hops,
        "nodes": [{"key": k, "hops": h} for k, h in sorted(nodes.items())],
        "edges": edges_among(out_dir, set(nodes) | {key}),
    }


def relationship_constrained_expansion(out_dir: str, seed_keys: list[str],
                                       hops: int = 3, limit: int = 50) -> pa.Table:
    """Q3: same frontier loop restricted to the 8 clinical predicates."""
    return expand_k_hop(out_dir, seed_keys, hops=hops, limit=limit,
                        predicates=CLINICAL_PREDICATES)


# ── Q5: shortest path (bidirectional-ish BFS with parent tracking) ────

def shortest_path_detailed(out_dir: str, a: str, b: str,
                           max_hops: int = 6,
                           max_frontier: int = 200_000) -> dict | None:
    """find_shortest_path analog (path_reasoning.py:62-117): BFS with
    parent+predicate tracking; returns entity_chain, relationship_chain,
    hops — or None (same-node guard path_reasoning.py:70-72).

    Hub-safe (VERDICT r2 #3): each scan task reduces its batch to ONE
    candidate parent per unvisited target node (min (frm, pred) via a
    composite key — the same winner the old driver-side sort picked), so
    the driver materializes at most the NEXT FRONTIER, never the raw
    edge list of a hub neighborhood; `limit(max_frontier)` bounds even
    that (deterministic truncation, documented for hub-heavy graphs)."""
    if a == b:
        return None
    parents = _bfs_parents_multi(out_dir, a, {b}, max_hops, max_frontier)
    if b not in parents:
        return None
    chain, preds = _chain_from_parents(parents, b)
    return {
        "entity_chain": list(reversed(chain)),
        "relationship_chain": list(reversed(preds)),
        "hops": len(preds),
    }


def _chain_from_parents(parents: dict, end: str):
    """Walk `end` up to the BFS source. Returns (nodes, preds) in WALK
    order (end -> source); callers reverse when they want source->end."""
    chain, preds = [end], []
    while parents[chain[-1]] is not None:
        parent, p = parents[chain[-1]]
        preds.append(p)
        chain.append(parent)
    return chain, preds


def _bfs_parents_multi(out_dir: str, src: str, goals: set[str],
                       max_hops: int, max_frontier: int = 200_000) -> dict:
    """Distributed BFS parent map from `src` until every goal is reached
    (or hops/frontier run out) — the iterated-frontier-join core shared
    by shortest_path_detailed and the truncation fallback in
    find_paths_from_seeds_multi. Path state is the driver-side parent
    map (O(visited nodes)); each hop moves only aggregated (target,
    min-candidate-parent) rows, never a hub's raw edge list."""
    parents: dict[str, tuple | None] = {src: None}
    frontier = {src}
    remaining = set(goals) - {src}
    for _ in range(max_hops):
        if not frontier or not remaining:
            break
        fr_arr = pa.array(sorted(frontier))
        seen_arr = pa.array(sorted(parents))  # anti-join set, task closure

        def hop_candidates(batch: pa.Table, fr_arr=fr_arr,
                           seen_arr=seen_arr) -> pa.Table:
            # vectorized undirected frontier-edge probe (is_in + take)
            hit_s = batch.filter(pc.is_in(batch.column("subj"), value_set=fr_arr))
            hit_o = batch.filter(pc.is_in(batch.column("obj"), value_set=fr_arr))
            frm = pa.concat_arrays([hit_s.column("subj").combine_chunks(),
                                    hit_o.column("obj").combine_chunks()])
            to = pa.concat_arrays([hit_s.column("obj").combine_chunks(),
                                   hit_o.column("subj").combine_chunks()])
            pred = pa.concat_arrays([hit_s.column("pred").combine_chunks(),
                                     hit_o.column("pred").combine_chunks()])
            t = pa.table({"to": to, "frm": frm, "pred": pred})
            # drop already-visited targets BEFORE anything reaches the driver
            t = t.filter(pc.invert(pc.is_in(t.column("to"), value_set=seen_arr)))
            if t.num_rows == 0:
                return pa.table({"to": pa.array([], type=pa.string()),
                                 "cand": pa.array([], type=pa.string())})
            # per-batch combiner: ONE candidate parent per target — the min
            # composite "frm\x1fpred" (\x1f sorts below printables, so the
            # composite min equals lexicographic min by (frm, pred))
            comp = pc.binary_join_element_wise(t.column("frm"), t.column("pred"),
                                               "\x1f")
            agg = (pa.table({"to": t.column("to"), "cand": comp})
                   .group_by("to", use_threads=False).aggregate([("cand", "min")]))
            return pa.table({"to": agg.column("to"),
                             "cand": agg.column("cand_min")})

        ds = _read(out_dir, "triples", columns=["subj", "pred", "obj"])
        # fast path: stream per-batch aggregated candidates straight to
        # the driver min-merge — no shuffle. Only when the capped
        # collection comes back FULL (duplicates might then be crowding
        # out distinct targets) re-run with a cross-batch groupby-min so
        # the cap measures DISTINCT next-frontier nodes (ADVICE r3)
        # without paying a sort-shuffle job per hop on every bounded-
        # degree query (review r4).
        rows = (ds.map_batches(hop_candidates, batch_format="pyarrow")
                .limit(max_frontier).take_all())
        if len(rows) >= max_frontier:
            from ray.data.aggregate import Min
            rows = (ds.map_batches(hop_candidates, batch_format="pyarrow")
                    .groupby("to").aggregate(Min("cand", alias_name="cand"))
                    .limit(max_frontier).take_all())
        best: dict[str, str] = {}
        for e in rows:  # already one row per target; dict for lookup only
            c = best.get(e["to"])
            if c is None or e["cand"] < c:
                best[e["to"]] = e["cand"]
        nxt = set()
        for to in sorted(best):
            frm, pred = best[to].split("\x1f", 1)
            parents[to] = (frm, pred)
            nxt.add(to)
        remaining -= nxt
        frontier = nxt
    return parents


def shortest_path(out_dir: str, a: str, b: str, max_hops: int = 6) -> list[str] | None:
    d = shortest_path_detailed(out_dir, a, b, max_hops)
    return d["entity_chain"] if d else None


# ── Q5/Q3: path enumeration over a pruned k-hop subgraph ──────────────
#
# The reference enumerates variable-length Cypher paths in Neo4j
# (path_reasoning.py:15-59, relationship_filter.py:19-47). Ray-Data
# shape: a distributed bounded BFS collects the edges reachable within
# max_hops of the seed set (one vectorized is_in-filtered scan of the
# triples table per hop — the same broadcast-frontier pattern as
# expand_k_hop), then simple-path enumeration runs locally over that
# pruned subgraph. Partitioning assumption (documented): the k-hop
# neighborhood of a seed set in a bounded-degree clinical graph is
# driver-small; `max_edges` caps runaway hub neighborhoods.


def _collect_subgraph_edges(out_dir: str, seed_keys: list[str], hops: int,
                            predicates: tuple[str, ...] | None = None,
                            max_edges: int = 200_000):
    """Edges (subj, subj_label, pred, obj, obj_label) within `hops`
    undirected steps of the seeds, via per-hop vectorized frontier scans.

    Hub-safe (VERDICT r2 #3): each scan task dedups its batch's edge
    rows, and `limit(max_edges)` bounds what reaches the driver BEFORE
    collection — a hub neighborhood truncates deterministically instead
    of flooding the driver and capping afterwards.

    Returns (edges, truncated). `truncated` is a conservative flag: any
    hop whose capped collection came back full may have dropped edges,
    and callers needing exact shortest paths must fall back to the
    distributed BFS (find_paths_from_seeds_multi does)."""
    frontier = set(seed_keys)
    visited = set(seed_keys)
    edges: set[tuple] = set()
    truncated = False
    pred_arr = pa.array(sorted(predicates)) if predicates is not None else None
    cols = ["subj", "subj_label", "pred", "obj", "obj_label"]
    for _h in range(hops):
        if not frontier or len(edges) >= max_edges:
            break
        fr_arr = pa.array(sorted(frontier))

        def touch(batch: pa.Table, fr_arr=fr_arr) -> pa.Table:
            if pred_arr is not None:
                batch = batch.filter(pc.is_in(batch.column("pred"),
                                              value_set=pred_arr))
            mask = pc.or_(pc.is_in(batch.column("subj"), value_set=fr_arr),
                          pc.is_in(batch.column("obj"), value_set=fr_arr))
            # per-batch distinct: duplicate (s,p,o) rows never leave the task
            return batch.filter(mask).group_by(cols, use_threads=False) \
                .aggregate([])

        hop_edges = (_read(out_dir, "triples", columns=cols)
                     .map_batches(touch, batch_format="pyarrow")
                     .limit(max_edges).take_all())
        if len(hop_edges) >= max_edges:
            truncated = True
        nxt = set()
        for e in hop_edges:
            tup = (e["subj"], e["subj_label"], e["pred"], e["obj"], e["obj_label"])
            if tup not in edges and len(edges) < max_edges:
                edges.add(tup)
            for node in (e["subj"], e["obj"]):
                if node not in visited:
                    nxt.add(node)
        visited |= nxt
        frontier = nxt
    # no cumulative-size check: edges can legitimately accumulate past
    # max_edges across hops with nothing dropped — only a hop whose
    # CAPPED collection came back full can have lost edges (review r4)
    return sorted(edges), truncated


def _adjacency(edges) -> dict[str, list[tuple]]:
    """Undirected adjacency: node -> [(neighbor, pred, edge_id)]."""
    adj: dict[str, list[tuple]] = {}
    for i, (s, _sl, p, o, _ol) in enumerate(edges):
        adj.setdefault(s, []).append((o, p, i))
        adj.setdefault(o, []).append((s, p, i))
    for v in adj.values():
        v.sort()
    return adj


def _bfs_dist(adj, src: str, max_hops: int) -> dict[str, int]:
    dist = {src: 0}
    frontier = [src]
    for d in range(1, max_hops + 1):
        nxt = []
        for node in frontier:
            for nb, _p, _eid in adj.get(node, ()):
                if nb not in dist:
                    dist[nb] = d
                    nxt.append(nb)
        frontier = nxt
    return dist


def _enumerate_paths(adj, start: str, goal: str | None, max_hops: int,
                     max_results: int = 10_000, max_steps: int = 500_000):
    """Simple-path DFS (Cypher semantics: no repeated *relationship*,
    nodes may repeat) up to max_hops edges. goal=None yields every path.
    Deterministic: neighbors visited in sorted order. Hub protection:
    goal-directed runs prune by BFS distance-to-goal (exploration stays
    near output-bound); `max_steps` hard-bounds the walk either way —
    a deterministic truncation, documented for hub-heavy graphs."""
    out = []
    path_nodes = [start]
    path_preds: list[str] = []
    used_edges: set[int] = set()
    dist_to_goal = _bfs_dist(adj, goal, max_hops) if goal is not None else None
    steps = [0]

    def dfs(node: str):
        if len(out) >= max_results or steps[0] > max_steps:
            return
        steps[0] += 1
        if path_preds and (goal is None or node == goal) and node != start:
            out.append((list(path_nodes), list(path_preds)))
        if len(path_preds) >= max_hops:
            return
        for nb, p, eid in adj.get(node, ()):
            if eid in used_edges:
                continue
            if dist_to_goal is not None and (
                len(path_preds) + 1 + dist_to_goal.get(nb, max_hops + 1) > max_hops
                and nb != goal
            ):
                continue
            used_edges.add(eid)
            path_nodes.append(nb)
            path_preds.append(p)
            dfs(nb)
            path_nodes.pop()
            path_preds.pop()
            used_edges.discard(eid)

    if goal is None or dist_to_goal.get(start, max_hops + 1) <= max_hops:
        dfs(start)
    return out


def _bfs_distances(out_dir: str, src: str, max_hops: int,
                   max_frontier: int = 200_000,
                   predicates: tuple[str, ...] | None = None):
    """Distributed hop-distance map from `src` (undirected), the distance
    analog of _bfs_parents_multi: each hop is one vectorized is_in scan
    of the triples table whose tasks emit only their batch's DISTINCT
    unvisited neighbor nodes — a hub's raw edge list never reaches the
    driver, only its O(nodes) neighbor set (capped at max_frontier).

    Returns (dist, truncated): a hop whose DISTINCT-node collection came
    back full may have dropped nodes (their distance reads as infinity
    downstream), so callers relying on the distance-pruning completeness
    proof must treat a truncated map as a deterministic subset."""
    truncated = False
    dist = {src: 0}
    frontier = {src}
    pred_arr = pa.array(sorted(predicates)) if predicates is not None else None
    for d in range(1, max_hops + 1):
        if not frontier:
            break
        fr_arr = pa.array(sorted(frontier))
        seen_arr = pa.array(sorted(dist))

        def hop_nodes(batch: pa.Table, fr_arr=fr_arr,
                      seen_arr=seen_arr) -> pa.Table:
            if pred_arr is not None:
                batch = batch.filter(pc.is_in(batch.column("pred"),
                                              value_set=pred_arr))
            hit_s = batch.filter(pc.is_in(batch.column("subj"), value_set=fr_arr))
            hit_o = batch.filter(pc.is_in(batch.column("obj"), value_set=fr_arr))
            to = pa.concat_arrays([hit_s.column("obj").combine_chunks(),
                                   hit_o.column("subj").combine_chunks()])
            t = pa.table({"to": to})
            t = t.filter(pc.invert(pc.is_in(t.column("to"), value_set=seen_arr)))
            return t.group_by("to", use_threads=False).aggregate([])

        ds = _read(out_dir, "triples", columns=["subj", "pred", "obj"])
        rows = (ds.map_batches(hop_nodes, batch_format="pyarrow")
                .limit(max_frontier).take_all())
        if len(rows) >= max_frontier:
            # cap hit with possible cross-batch duplicates: re-run with a
            # global distinct so the cap measures DISTINCT nodes
            rows = (ds.map_batches(hop_nodes, batch_format="pyarrow")
                    .groupby("to").count().limit(max_frontier).take_all())
            if len(rows) >= max_frontier:
                truncated = True
        nxt = {r["to"] for r in rows} - dist.keys()
        for n in sorted(nxt):
            dist[n] = d
        frontier = nxt
    return dist, truncated


def _collect_path_edges(out_dir: str, dist_a: dict[str, int],
                        dist_b: dict[str, int], max_hops: int,
                        max_edges: int = 200_000):
    """Distance-pruned edge collection for goal-directed path enumeration
    (VERDICT r4 next #7): an undirected edge (u, v) can lie on an a->b
    path of length <= H only if min(dist_a[u]+1+dist_b[v],
    dist_a[v]+1+dist_b[u]) <= H — and every edge of every such path
    satisfies it (BFS distance <= along-path distance). So this
    collection is PROVABLY COMPLETE for a->b enumeration while dropping
    a hub's dead-end spokes (dist_b = inf), which is what overflowed the
    plain k-hop ball. One vectorized scan: index_in against the two
    broadcast distance maps, arithmetic, filter, per-batch distinct."""
    import numpy as np

    INF = max_hops + 10

    def lookup_cols(nodes: dict[str, int]):
        keys = pa.array(sorted(nodes))
        vals = np.asarray([nodes[k] for k in sorted(nodes)], dtype=np.int64)
        return keys, vals

    ka, va = lookup_cols(dist_a)
    kb, vb = lookup_cols(dist_b)
    cols = ["subj", "subj_label", "pred", "obj", "obj_label"]

    def qualify(batch: pa.Table) -> pa.Table:
        import numpy as np

        def dist_of(col, keys, vals):
            idx = pc.fill_null(pc.index_in(batch.column(col), value_set=keys),
                               -1).to_numpy(zero_copy_only=False)
            out = np.full(len(idx), INF, dtype=np.int64)
            hit = idx >= 0
            out[hit] = vals[idx[hit]]
            return out

        das, dao = dist_of("subj", ka, va), dist_of("obj", ka, va)
        dbs, dbo = dist_of("subj", kb, vb), dist_of("obj", kb, vb)
        ok = np.minimum(das + 1 + dbo, dao + 1 + dbs) <= max_hops
        return batch.filter(pa.array(ok)).group_by(
            cols, use_threads=False).aggregate([])

    rows = (_read(out_dir, "triples", columns=cols)
            .map_batches(qualify, batch_format="pyarrow")
            .limit(max_edges).take_all())
    truncated = len(rows) >= max_edges
    edges = sorted({(r["subj"], r["subj_label"], r["pred"], r["obj"],
                     r["obj_label"]) for r in rows})
    return edges, truncated


def all_paths(out_dir: str, a: str, b: str, max_hops: int = 4,
              max_paths: int = 5, max_edges: int = 200_000) -> list[dict]:
    """Q5 bulk: every path (a)-[*..4]-(b) ORDER BY hops LIMIT max_paths
    (path_reasoning.py:36-48 ALL_PATHS_QUERY).

    Hub fallback (VERDICT r4 #7): when the plain k-hop collection
    truncates, re-collect with distance pruning — two distributed BFS
    distance maps (from a, from b) plus one distance-filtered scan keep
    exactly the edges that can lie on an a->b path of length <= max_hops
    (provably complete, see _collect_path_edges), so enumeration stays
    exact on hub graphs whose raw neighborhood overflows max_edges. Only
    if even the path-relevant subgraph exceeds max_edges (an inherently
    output-bound enumeration) does the result remain a deterministic
    subset, now loudly logged."""
    if a == b:
        return []
    edges, truncated = _collect_subgraph_edges(out_dir, [a], max_hops,
                                               max_edges=max_edges)
    if truncated:
        dist_a, ta = _bfs_distances(out_dir, a, max_hops)
        dist_b, tb = _bfs_distances(out_dir, b, max_hops)
        edges, still = _collect_path_edges(out_dir, dist_a, dist_b, max_hops,
                                           max_edges=max_edges)
        if still or ta or tb:
            logger.warning(
                "all_paths(%s, %s): the distance-pruned path subgraph "
                "itself overflowed a cap (edges=%s, dist_a=%s, dist_b=%s) "
                "— result is a deterministic subset", a, b, still, ta, tb)
    adj = _adjacency(edges)
    found = _enumerate_paths(adj, a, b, max_hops)
    found.sort(key=lambda t: (len(t[1]), t[0]))
    return [
        {"entity_chain": nodes, "relationship_chain": preds, "hops": len(preds)}
        for nodes, preds in found[:max_paths]
    ]


def _seed_paths_over_adjacency(adj, seeds: list[str], target_key: str,
                               max_hops: int, limit: int) -> list[dict]:
    """Per-seed BFS with parent tracking over a pre-collected subgraph."""
    out = []
    for seed in seeds:
        if seed == target_key:
            continue
        parents: dict[str, tuple | None] = {seed: None}
        frontier = [seed]
        depth = 0
        while frontier and target_key not in parents and depth < max_hops:
            nxt = []
            for node in frontier:
                for nb, p, _eid in adj.get(node, ()):
                    if nb not in parents:
                        parents[nb] = (node, p)
                        nxt.append(nb)
            frontier = nxt
            depth += 1
        if target_key not in parents:
            continue
        chain, preds = [target_key], []
        while parents[chain[-1]] is not None:
            parent, p = parents[chain[-1]]
            preds.append(p)
            chain.append(parent)
        out.append({
            "seed_name": seed,
            "entity_chain": list(reversed(chain)),
            "relationship_chain": list(reversed(preds)),
            "hops": len(preds),
        })
    out.sort(key=lambda r: (r["hops"], r["seed_name"]))
    return out[:limit]


def find_paths_from_seeds_multi(out_dir: str, seed_keys: list[str],
                                targets: list[str], max_hops: int = 5,
                                limit: int = 5,
                                max_edges: int = 200_000) -> dict[str, list[dict]]:
    """Seeds->target shortest paths for SEVERAL targets over ONE subgraph
    collection (the context builder queries <=5 targets per question —
    re-collecting the 5-hop neighborhood per target cost ~5x).

    Hub fallback (VERDICT r3 #7): when the subgraph collection TRUNCATES
    (an unbounded-degree seed neighborhood overflowing `max_edges`), the
    local enumeration can silently lose paths, so the result switches to
    one distributed BFS per target — BFS FROM the target over the full
    triples table (undirected), carrying only the parent map as path
    state, which reaches every seed in a single traversal. Exact hop
    counts; parent tie-break is the deterministic min-(node, pred), which
    may pick a different same-length chain than the local enumerator —
    active only on truncation, where the local chain is unreliable
    anyway. The fast path (bounded-degree clinical graphs — the
    documented common case) is unchanged."""
    seeds = sorted(set(seed_keys))
    if not seeds or not targets:
        return {t: [] for t in targets}
    edges, truncated = _collect_subgraph_edges(out_dir, seeds, max_hops,
                                               max_edges=max_edges)
    if truncated:
        out: dict[str, list[dict]] = {}
        for t in targets:
            parents = _bfs_parents_multi(out_dir, t, set(seeds), max_hops)
            rows = []
            for seed in seeds:
                if seed == t or seed not in parents:
                    continue
                # walk order seed -> target IS the output order (the BFS
                # ran from the target side)
                chain, preds = _chain_from_parents(parents, seed)
                rows.append({
                    "seed_name": seed,
                    "entity_chain": chain,
                    "relationship_chain": preds,
                    "hops": len(preds),
                })
            rows.sort(key=lambda r: (r["hops"], r["seed_name"]))
            out[t] = rows[:limit]
        return out
    adj = _adjacency(edges)
    return {t: _seed_paths_over_adjacency(adj, seeds, t, max_hops, limit)
            for t in targets}


def find_paths_from_seeds(out_dir: str, seed_keys: list[str], target_key: str,
                          max_hops: int = 5, limit: int = 5) -> list[dict]:
    """Q5: shortest path seed -[*..5]- target per seed, ORDER BY hops
    LIMIT 5 (path_reasoning.py:51-59 SEED_TO_NAMED_QUERY). One subgraph
    collection serves every seed."""
    return find_paths_from_seeds_multi(out_dir, seed_keys, [target_key],
                                       max_hops, limit)[target_key]


def _constrained_paths_frontier(out_dir: str, seeds: list[str],
                                max_hops: int, limit: int,
                                max_partials: int = 50_000) -> list[dict]:
    """Distributed constrained-path enumeration (VERDICT r4 #7): an
    iterated frontier join carrying path-prefix state with per-hop
    LIMIT-equivalent pruning — the fallback when the k-hop ball
    collection truncates on a hub.

    Level d holds the partial paths of length d on the driver (bounded
    by max_partials). Each hop: broadcast the partials' endpoints (+ the
    used (partial, edge) pairs for the no-repeated-relationship rule)
    into one vectorized scan of the triples table; tasks join their
    batch's clinical-predicate edges to the partials (a pandas hash
    join), drop used edges, and pre-sort+cap per batch; a Dataset
    sort().limit() keeps the globally smallest max_partials extensions
    by node-chain order. Levels accumulate completed paths; the loop
    stops as soon as `limit` paths exist, because every deeper path has
    more hops and sorts after them (ORDER BY hops first). Exact whenever
    no level's width exceeds max_partials — a per-LEVEL budget, vastly
    wider than the edge cap the ball collection shares across all hops;
    beyond it the result degrades to a loudly-logged deterministic
    subset (the enumeration is output-bound by then)."""
    import pandas as pd

    from ..schemas import CLINICAL_LABELS, CLINICAL_PREDICATES

    clin = set(CLINICAL_LABELS)
    pred_arr = pa.array(sorted(CLINICAL_PREDICATES))
    # partial: (nodes, labels, preds, edgekeys frozenset, interleaved key)
    # — the key (n0, p1, n1, p2, ...) makes cap selection deterministic
    # even among same-node-chain different-predicate extensions
    partials = [((s,), ("",), (), frozenset(), s) for s in seeds]
    results: list[dict] = []
    seen: set[tuple] = set()
    capped = False
    for _level in range(1, max_hops + 1):
        if len(results) >= limit or not partials:
            break
        import ray

        end_arr = pa.array(sorted({p[0][-1] for p in partials}))
        part_df = pd.DataFrame(
            [(p[0][-1], pid, p[4]) for pid, p in enumerate(partials)],
            columns=["endpoint", "pid", "prefix"])
        used = {f"{pid}\x1f{ek}" for pid, p in enumerate(partials)
                for ek in p[3]}
        # partial state rides the OBJECT STORE, not each map task's spec
        # (at the cap it is tens of MB; in-spec it would ship per block)
        state_ref = ray.put((end_arr, part_df, used))

        def extend(batch: pa.Table, state_ref=state_ref,
                   cap=max_partials) -> pa.Table:
            end_arr, part_df, used = ray.get(state_ref)
            batch = batch.filter(pc.is_in(batch.column("pred"),
                                          value_set=pred_arr))
            out_parts = []
            for ep_col, nb_col, epl_col, nbl_col in (
                    ("subj", "obj", "subj_label", "obj_label"),
                    ("obj", "subj", "obj_label", "subj_label")):
                hit = batch.filter(pc.is_in(batch.column(ep_col),
                                            value_set=end_arr))
                if hit.num_rows == 0:
                    continue
                ek = pc.binary_join_element_wise(
                    hit.column("subj").combine_chunks(),
                    hit.column("pred").combine_chunks(),
                    hit.column("obj").combine_chunks(), "\x1e")
                df = pd.DataFrame({
                    "endpoint": hit.column(ep_col).to_pylist(),
                    "nb": hit.column(nb_col).to_pylist(),
                    "ep_label": hit.column(epl_col).to_pylist(),
                    "nb_label": hit.column(nbl_col).to_pylist(),
                    "pred": hit.column("pred").to_pylist(),
                    "edgekey": ek.to_pylist(),
                })
                out_parts.append(df.merge(part_df, on="endpoint"))
            if not out_parts:
                return pa.Table.from_pylist([], schema=_EXTENSION_SCHEMA)
            df = pd.concat(out_parts, ignore_index=True)
            if used and len(df):
                pair = df["pid"].astype(str) + "\x1f" + df["edgekey"]
                df = df[~pair.isin(used)]
            if not len(df):
                return pa.Table.from_pylist([], schema=_EXTENSION_SCHEMA)
            df["sort_key"] = (df["prefix"] + "\x1f" + df["pred"]
                              + "\x1f" + df["nb"])
            df = df.sort_values("sort_key", kind="mergesort").head(cap)
            return pa.Table.from_pandas(
                df[["pid", "nb", "ep_label", "nb_label", "pred", "edgekey",
                    "sort_key"]], preserve_index=False).cast(_EXTENSION_SCHEMA)

        rows = (_read(out_dir, "triples",
                      columns=["subj", "subj_label", "pred", "obj",
                               "obj_label"])
                .map_batches(extend, batch_format="pyarrow")
                .sort("sort_key").limit(max_partials).take_all())
        if len(rows) >= max_partials:
            capped = True
        nxt = []
        for r in rows:
            p = partials[r["pid"]]
            labels = list(p[1])
            if labels[0] == "":
                labels[0] = r["ep_label"]  # seed label from its first edge
            nodes = p[0] + (r["nb"],)
            labels = tuple(labels) + (r["nb_label"],)
            preds = p[2] + (r["pred"],)
            nxt.append((nodes, labels, preds, p[3] | {r["edgekey"]},
                        r["sort_key"]))
        # completed paths at this level (same validity rules as the
        # local enumerator): target != seed, >=1 clinical-label node,
        # DISTINCT (target, nodes, preds)
        for nodes, labels, preds, _ek, _key in nxt:
            target = nodes[-1]
            if target == nodes[0]:
                continue
            if not any(lb in clin for lb in labels):
                continue
            key = (target, nodes, preds)
            if key in seen:
                continue
            seen.add(key)
            results.append({
                "target": target, "target_label": labels[-1],
                "node_chain": list(nodes), "rel_chain": list(preds),
                "hops": len(preds),
            })
        partials = nxt
    if capped:
        logger.warning(
            "constrained-path frontier join exceeded max_partials=%d at "
            "some level — result is a deterministic subset", max_partials)
    results.sort(key=lambda r: (r["hops"], r["target"], r["node_chain"]))
    return results[:limit]


_EXTENSION_SCHEMA = pa.schema([
    ("pid", pa.int64()),
    ("nb", pa.string()),
    ("ep_label", pa.string()),
    ("nb_label", pa.string()),
    ("pred", pa.string()),
    ("edgekey", pa.string()),
    ("sort_key", pa.string()),
])


def relationship_constrained_paths(out_dir: str, seed_keys: list[str],
                                   max_hops: int = 3, limit: int = 50,
                                   max_edges: int = 200_000) -> pa.Table:
    """Q3 full semantics (relationship_filter.py:19-47): paths from the
    seeds along the 8 clinical predicates only, 1..max_hops, requiring
    >=1 clinical-label node on the path; DISTINCT (target, path) rows
    ORDER BY length LIMIT `limit`, returning node + relationship chains.

    Hub fallback (VERDICT r4 #7): when the k-hop ball collection
    truncates, enumeration switches to the distributed frontier join
    (_constrained_paths_frontier) instead of silently returning a
    subset of a truncated subgraph."""
    from ..schemas import CLINICAL_LABELS, CLINICAL_PREDICATES

    seeds = sorted(set(seed_keys))
    if not seeds:
        return pa.Table.from_pylist([], schema=_CONSTRAINED_PATH_SCHEMA)
    edges, truncated = _collect_subgraph_edges(out_dir, seeds, max_hops,
                                               predicates=CLINICAL_PREDICATES,
                                               max_edges=max_edges)
    if truncated:
        rows = _constrained_paths_frontier(out_dir, seeds, max_hops, limit)
        return pa.Table.from_pylist(rows, schema=_CONSTRAINED_PATH_SCHEMA)
    labels: dict[str, str] = {}
    for s, sl, _p, o, ol in edges:
        labels.setdefault(s, sl)
        labels.setdefault(o, ol)
    adj = _adjacency(edges)
    clin = set(CLINICAL_LABELS)
    rows = []
    seen: set[tuple] = set()
    for seed in seeds:
        for nodes, preds in _enumerate_paths(adj, seed, None, max_hops):
            target = nodes[-1]
            if target == seed:
                continue
            if not any(labels.get(n) in clin for n in nodes):
                continue
            key = (target, tuple(nodes), tuple(preds))
            if key in seen:
                continue
            seen.add(key)
            rows.append({
                "target": target,
                "target_label": labels.get(target, ""),
                "node_chain": list(nodes),
                "rel_chain": list(preds),
                "hops": len(preds),
            })
    rows.sort(key=lambda r: (r["hops"], r["target"], r["node_chain"]))
    return pa.Table.from_pylist(rows[:limit], schema=_CONSTRAINED_PATH_SCHEMA)


_CONSTRAINED_PATH_SCHEMA = pa.schema([
    ("target", pa.string()),
    ("target_label", pa.string()),
    ("node_chain", pa.list_(pa.string())),
    ("rel_chain", pa.list_(pa.string())),
    ("hops", pa.int32()),
])


# ── Q4: condition chains ──────────────────────────────────────────────

def condition_chains(out_dir: str, patient_number: str) -> pa.Table:
    """Per condition of the patient: treating medications + manifesting
    symptoms, collected DISTINCT (relationship_filter.py:50-61).

    Two pruned predicate-pushdown scans (row-group filters at the parquet
    read) — never a corpus-wide collect of the clinical triples."""
    cond_rows = _read(
        out_dir, "triples", columns=["obj"],
        filter_expr=(pc.field("pred") == "HAS_CONDITION")
        & (pc.field("subj") == patient_number),
    ).take_all()
    conds = sorted({r["obj"] for r in cond_rows})
    meds: dict[str, set] = {c: set() for c in conds}
    syms: dict[str, set] = {c: set() for c in conds}
    if conds:
        chain_rows = _read(
            out_dir, "triples", columns=["subj", "pred", "obj"],
            filter_expr=pc.field("pred").isin(["TREATED_WITH", "MANIFESTS_AS"])
            & pc.field("subj").isin(pa.array(conds)),
        ).take_all()
        for r in chain_rows:
            if r["pred"] == "TREATED_WITH":
                meds[r["subj"]].add(r["obj"])
            else:
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
                       columns=["chunk_id", "doc_id", "seq", "section", "text"],
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
            # provenance keys carried so downstream joins are keyed, not
            # text-matched (FULL_TRACE_QUERY, provenance.py:50-64)
            "chunk_id": c["chunk_id"],
            "seq": int(c["seq"]),
        })
    rows.sort(key=lambda r: (-r["confidence"], r["entity_name"], r["source_file"]))
    return pa.Table.from_pylist(rows[:limit])


def full_trace(out_dir: str, entity_keys: list[str], limit: int = 50) -> pa.Table:
    """J6: citations + the NEXT chunk's text, keyed self-join on
    (doc_id, seq+1) using the chunk_id/seq carried through citations
    (provenance.py:50-64) — correct even when two chunks share text."""
    base = citations(out_dir, entity_keys, limit=limit).to_pylist()
    if not base:
        return pa.Table.from_pylist([])
    doc_ids = pa.array(sorted({r["source_file"] for r in base}))
    by_doc_seq = {}
    for c in _read(out_dir, "chunks", columns=["doc_id", "seq", "text"],
                   filter_expr=pc.field("doc_id").isin(doc_ids)).take_all():
        by_doc_seq[(c["doc_id"], c["seq"])] = c["text"]
    for r in base:
        r["next_text"] = by_doc_seq.get((r["source_file"], r["seq"] + 1), "")
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
        """On-the-fly scorer: the model-load seam (A1) — embedder built
        once per actor; the query vector must come from the SAME kernel
        that produced any stored chunk column (cfg.chunk_embedder)."""

        def __init__(self):
            self.emb = make_embedder(cfg.chunk_embedder, cfg.embedding_dim)
            self.q = self.emb.embed_batch([query])[0]

        def __call__(self, batch: pa.Table) -> pa.Table:
            vecs = self.emb.embed_batch(batch.column("text").to_pylist())
            scores = vecs @ self.q[: vecs.shape[1]]
            return pa.table({
                "chunk_id": batch.column("chunk_id"),
                "doc_id": batch.column("doc_id"),
                "score": pa.array(np.round(scores.astype(np.float64), 6)),
            })

    score_cols = ["chunk_id", "doc_id",
                  "embedding" if has_embedding else "text"]
    # Stored-embedding path: scoring is a stateless matmul against the
    # driver-computed query vector — plain tasks, no actor-pool startup
    # (the eval harness calls this dozens of times). The on-the-fly path
    # keeps the actor pool: it is the model-load seam (A1).
    if has_embedding:
        qvec = make_embedder(cfg.chunk_embedder,
                             cfg.embedding_dim).embed_batch([query])[0]

        def score_stored(batch: pa.Table, qvec=qvec) -> pa.Table:
            flat = batch.column("embedding").combine_chunks().flatten()
            vecs = np.asarray(flat).reshape(batch.num_rows, -1)
            scores = vecs @ qvec[: vecs.shape[1]]
            return pa.table({
                "chunk_id": batch.column("chunk_id"),
                "doc_id": batch.column("doc_id"),
                "score": pa.array(np.round(scores.astype(np.float64), 6)),
            })

        score_fn, score_kwargs = score_stored, {}
    else:
        score_fn, score_kwargs = ScoreChunks, {"concurrency": (1, 4)}
    scored = (
        _read(out_dir, "chunks", columns=score_cols)
        .map_batches(score_fn, batch_format="pyarrow", **score_kwargs)
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
