"""Random-graph exactness for the round-5 distributed path fallbacks:
on graphs whose ball collection is COMPLETE (so the local enumerator is
ground truth), the distance-pruned all_paths collection and the Q3
frontier join must reproduce the local results exactly — not just on
the hand-built hub fixture (tests/test_paths_fallback.py) but on
arbitrary seeded-random topologies with cycles, parallel edges and
mixed predicates."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from medical_doc_knowledge_graph_system_ray.pipelines import queryside as qs
from medical_doc_knowledge_graph_system_ray.schemas import CLINICAL_PREDICATES

LABELS = ["Condition", "Medication", "Symptom", "Patient", "Document"]
PREDS = list(CLINICAL_PREDICATES) + ["SOURCED_FROM", "BELONGS_TO"]


def _random_graph_dir(tmp_path_factory, seed: int, n_nodes=18, n_edges=45):
    rng = np.random.RandomState(seed)
    labels = {f"n{i:02d}": LABELS[rng.randint(len(LABELS))]
              for i in range(n_nodes)}
    rows = set()
    while len(rows) < n_edges:
        s, o = rng.randint(n_nodes), rng.randint(n_nodes)
        if s == o:
            continue
        p = PREDS[rng.randint(len(PREDS))]
        rows.add((f"n{s:02d}", f"n{o:02d}", p))
    out = tmp_path_factory.mktemp(f"rand{seed}")
    t = pa.table({
        "subj": pa.array([r[0] for r in rows]),
        "subj_label": pa.array([labels[r[0]] for r in rows]),
        "pred": pa.array([r[2] for r in rows]),
        "obj": pa.array([r[1] for r in rows]),
        "obj_label": pa.array([labels[r[1]] for r in rows]),
    })
    os.makedirs(os.path.join(out, "triples"))
    pq.write_table(t, os.path.join(out, "triples", "part-00000.parquet"))
    return str(out)


@pytest.mark.parametrize("seed", [7, 23, 91])
def test_all_paths_distance_pruned_collection_is_exact(ray_session,
                                                       tmp_path_factory,
                                                       seed):
    """The distance-pruned edge set must yield the identical path set as
    the complete ball collection (completeness proof exercised on random
    graphs: every edge of every a->b path <= H survives the pruning)."""
    d = _random_graph_dir(tmp_path_factory, seed)
    a, b, H = "n00", "n01", 3
    full, trunc = qs._collect_subgraph_edges(d, [a], H)
    assert not trunc  # ground truth is complete
    local = qs._enumerate_paths(qs._adjacency(full), a, b, H)

    dist_a, ta = qs._bfs_distances(d, a, H)
    dist_b, tb = qs._bfs_distances(d, b, H)
    assert not ta and not tb
    pruned, trunc2 = qs._collect_path_edges(d, dist_a, dist_b, H)
    assert not trunc2
    assert set(pruned) <= set(full)
    dist = qs._enumerate_paths(qs._adjacency(pruned), a, b, H)
    assert sorted(local) == sorted(dist)


@pytest.mark.parametrize("seed,limit", [(7, 500), (23, 500), (91, 8)])
def test_constrained_frontier_matches_local_on_random_graphs(
        ray_session, tmp_path_factory, seed, limit):
    """The Q3 frontier join must equal the local enumerator row-for-row
    on random graphs (including the small-limit early-stop path)."""
    d = _random_graph_dir(tmp_path_factory, seed)
    seeds, H = ["n00", "n02"], 3
    local = qs.relationship_constrained_paths(d, seeds, max_hops=H,
                                              limit=limit).to_pylist()
    frontier = qs._constrained_paths_frontier(d, sorted(set(seeds)), H, limit)
    assert local == frontier
