"""Property check: the goal-distance pruning in _enumerate_paths must not
change results — compare against a naive unpruned enumerator on random
small graphs (Cypher semantics: no repeated edge, nodes may repeat)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from medical_doc_knowledge_graph_system_ray.pipelines.queryside import (
    _adjacency, _enumerate_paths)

PREDS = ["HAS_CONDITION", "TREATED_WITH", "MANIFESTS_AS"]


def naive_paths(adj, start, goal, max_hops):
    """Reference enumerator: plain DFS, no pruning, no caps."""
    out = []

    def dfs(node, path_nodes, path_preds, used):
        if path_preds and node == goal and node != start:
            out.append((list(path_nodes), list(path_preds)))
        if len(path_preds) >= max_hops:
            return
        for nb, p, eid in adj.get(node, ()):
            if eid in used:
                continue
            used.add(eid)
            path_nodes.append(nb)
            path_preds.append(p)
            dfs(nb, path_nodes, path_preds, used)
            path_nodes.pop()
            path_preds.pop()
            used.discard(eid)

    dfs(start, [start], [], set())
    return out


edges_strategy = st.lists(
    st.tuples(st.integers(0, 6), st.integers(0, 6), st.integers(0, 2)),
    min_size=1, max_size=12,
)


@settings(max_examples=60, deadline=None)
@given(edges=edges_strategy, a=st.integers(0, 6), b=st.integers(0, 6),
       max_hops=st.integers(1, 4))
def test_pruned_enumeration_matches_naive(edges, a, b, max_hops):
    edge_rows = sorted({
        (f"n{s}", "L", PREDS[p], f"n{o}", "L") for s, o, p in edges if s != o
    })
    adj = _adjacency(edge_rows)
    start, goal = f"n{a}", f"n{b}"
    if start == goal:
        return
    got = sorted(_enumerate_paths(adj, start, goal, max_hops))
    want = sorted(naive_paths(adj, start, goal, max_hops))
    assert got == want
