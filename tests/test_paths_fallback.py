"""Distributed path fallback (VERDICT r3 #7): when the k-hop subgraph
collection TRUNCATES on a hub (max_edges), the local enumerator loses
paths — find_paths_from_seeds_multi must detect the truncation and
switch to the distributed per-target BFS, which carries only the parent
map and is immune to the edge cap.

The synthetic hub makes the loss DETERMINISTIC (not a take-order
accident): the seed->target path needs a hop-3 edge, but hop 2 alone
overflows max_edges, so the collection loop exits before hop 3 ever
runs — the path edge is missing from the local subgraph no matter which
hop-2 edges survive the cap."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from medical_doc_knowledge_graph_system_ray.pipelines import queryside as qs

N_FILLERS = 200
MAX_EDGES = 50


@pytest.fixture(scope="module")
def hub_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("hubgraph")
    rows = [("seed", "Patient", "HAS_CONDITION", "hub", "Condition")]
    # hub fan-out: hop 2 from the seed collects >= N_FILLERS edges,
    # overflowing MAX_EDGES on its own
    for i in range(N_FILLERS):
        rows.append(("hub", "Condition", "TREATED_WITH",
                     f"filler_{i:04d}", "Medication"))
    # the real path continues past the hub: seed-hub-x-target (3 hops);
    # x->target is a hop-3 edge the truncated collection never reaches
    rows.append(("hub", "Condition", "TREATED_WITH", "x", "Medication"))
    rows.append(("x", "Medication", "HAS_SIDE_EFFECT", "target", "Symptom"))
    t = pa.table({
        "subj": pa.array([r[0] for r in rows]),
        "subj_label": pa.array([r[1] for r in rows]),
        "pred": pa.array([r[2] for r in rows]),
        "obj": pa.array([r[3] for r in rows]),
        "obj_label": pa.array([r[4] for r in rows]),
    })
    os.makedirs(os.path.join(out, "triples"))
    pq.write_table(t, os.path.join(out, "triples", "part-00000.parquet"))
    return str(out)


def test_truncation_loses_the_path_locally(ray_session, hub_dir):
    """Documents the failure the fallback exists for: the capped local
    subgraph is missing the x->target edge, so local enumeration finds
    no seed->target path."""
    edges, truncated = qs._collect_subgraph_edges(
        hub_dir, ["seed"], 4, max_edges=MAX_EDGES)
    assert truncated
    assert not any(("target" in (e[0], e[3])) for e in edges)
    adj = qs._adjacency(edges)
    rows = qs._seed_paths_over_adjacency(adj, ["seed"], "target", 4, 5)
    assert rows == []


def test_fallback_finds_the_lost_path(ray_session, hub_dir):
    got = qs.find_paths_from_seeds_multi(
        hub_dir, ["seed"], ["target"], max_hops=4, max_edges=MAX_EDGES)
    rows = got["target"]
    assert len(rows) == 1
    assert rows[0]["entity_chain"] == ["seed", "hub", "x", "target"]
    assert rows[0]["relationship_chain"] == [
        "HAS_CONDITION", "TREATED_WITH", "HAS_SIDE_EFFECT"]
    assert rows[0]["hops"] == 3


def test_fast_path_unchanged_without_truncation(ray_session, hub_dir):
    """With the default cap the collection is complete, the local
    enumerator runs, and (the path being unique) both paths agree."""
    got = qs.find_paths_from_seeds_multi(
        hub_dir, ["seed"], ["target"], max_hops=4)
    rows = got["target"]
    assert len(rows) == 1
    assert rows[0]["entity_chain"] == ["seed", "hub", "x", "target"]
    assert rows[0]["hops"] == 3


def test_all_paths_distance_pruned_fallback(ray_session, hub_dir):
    """VERDICT r4 #7 (all_paths): the truncated ball collection misses
    the hop-3 x->target edge, so r4's all_paths returned [] on this
    graph. The distance-pruned fallback (dist-from-a + dist-to-b filter)
    keeps exactly the path-relevant edges and must find the path."""
    paths = qs.all_paths(hub_dir, "seed", "target", max_hops=4,
                         max_paths=5, max_edges=MAX_EDGES)
    assert len(paths) == 1
    assert paths[0]["entity_chain"] == ["seed", "hub", "x", "target"]
    assert paths[0]["relationship_chain"] == [
        "HAS_CONDITION", "TREATED_WITH", "HAS_SIDE_EFFECT"]
    assert paths[0]["hops"] == 3


def test_all_paths_unchanged_without_truncation(ray_session, hub_dir):
    a = qs.all_paths(hub_dir, "seed", "target", max_hops=4, max_paths=5)
    b = qs.all_paths(hub_dir, "seed", "target", max_hops=4, max_paths=5,
                     max_edges=MAX_EDGES)
    assert a == b


@pytest.fixture(scope="module")
def clinical_hub_dir(tmp_path_factory):
    """Hub graph whose edges are ALL clinical predicates, so Q3 paths
    traverse them; hop 2 alone overflows MAX_EDGES."""
    out = tmp_path_factory.mktemp("clinhub")
    rows = [("seed", "Patient", "HAS_CONDITION", "hub", "Condition")]
    for i in range(N_FILLERS):
        rows.append(("hub", "Condition", "TREATED_WITH",
                     f"filler_{i:04d}", "Medication"))
    rows.append(("hub", "Condition", "TREATED_WITH", "x", "Medication"))
    rows.append(("x", "Medication", "MANIFESTS_AS", "target", "Symptom"))
    t = pa.table({
        "subj": pa.array([r[0] for r in rows]),
        "subj_label": pa.array([r[1] for r in rows]),
        "pred": pa.array([r[2] for r in rows]),
        "obj": pa.array([r[3] for r in rows]),
        "obj_label": pa.array([r[4] for r in rows]),
    })
    os.makedirs(os.path.join(out, "triples"))
    pq.write_table(t, os.path.join(out, "triples", "part-00000.parquet"))
    return str(out)


def test_constrained_paths_frontier_fallback(ray_session, clinical_hub_dir):
    """VERDICT r4 #7 (Q3): truncation previously enumerated over the
    capped subgraph, silently dropping the hop-3 path to 'target'. The
    frontier-join fallback must find it."""
    t = qs.relationship_constrained_paths(
        clinical_hub_dir, ["seed"], max_hops=3, limit=500,
        max_edges=MAX_EDGES)
    rows = t.to_pylist()
    hit = [r for r in rows if r["target"] == "target"]
    assert len(hit) == 1
    assert hit[0]["node_chain"] == ["seed", "hub", "x", "target"]
    assert hit[0]["rel_chain"] == [
        "HAS_CONDITION", "TREATED_WITH", "MANIFESTS_AS"]
    assert hit[0]["hops"] == 3


def test_constrained_paths_frontier_matches_local(ray_session,
                                                  clinical_hub_dir):
    """Exactness: on a graph the local enumerator covers completely
    (default edge cap), forcing the frontier fallback (tiny cap) must
    produce the identical row set."""
    local = qs.relationship_constrained_paths(
        clinical_hub_dir, ["seed"], max_hops=3, limit=500).to_pylist()
    dist = qs.relationship_constrained_paths(
        clinical_hub_dir, ["seed"], max_hops=3, limit=500,
        max_edges=MAX_EDGES).to_pylist()
    assert local == dist


def test_constrained_paths_early_stop_is_exact(ray_session,
                                               clinical_hub_dir):
    """With a small limit the frontier loop stops early (ORDER BY hops:
    deeper paths can't displace shallower ones) — the top-k must equal
    the local enumerator's top-k."""
    local = qs.relationship_constrained_paths(
        clinical_hub_dir, ["seed"], max_hops=3, limit=10).to_pylist()
    dist = qs.relationship_constrained_paths(
        clinical_hub_dir, ["seed"], max_hops=3, limit=10,
        max_edges=MAX_EDGES).to_pylist()
    assert local == dist
