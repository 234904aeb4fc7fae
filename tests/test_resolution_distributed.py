"""Property test for the distributed name-map candidate generation
(VERDICT r3 #2): above DISTRIBUTED_THRESHOLD distinct names, band-key
blocking and pair generation run as a Dataset groupby(band_key) fan-out,
and the resulting name map must be BYTE-IDENTICAL to the driver path
(both call the same `_block_pairs` kernel on sorted members)."""

from __future__ import annotations

import hashlib

import pytest

from medical_doc_knowledge_graph_system_ray.config import PipelineConfig
from medical_doc_knowledge_graph_system_ray.stages import resolution as R


def _synthetic_names(n: int) -> list[str]:
    """>n distinct surface forms: mostly pairwise-dissimilar strings
    (hex-derived, so LSH collisions are rare and the candidate set stays
    proportional to the planted clusters) plus planted fuzzy-mergeable
    sibling pairs so the test is non-vacuous."""
    names = []
    for i in range(n):
        h = hashlib.blake2b(f"name-{i}".encode(), digest_size=12).hexdigest()
        names.append(f"{h[:8]} {h[8:16]} {h[16:]}")
    # planted clusters: trailing-s siblings pass token_sort_ratio >= 88
    for j in range(40):
        base = f"planted condition {j:03d} alphabeta"
        names.append(base)
        names.append(base + "s")
    return sorted(set(names))


@pytest.fixture(scope="module")
def big_names():
    names = _synthetic_names(55_000)
    assert len(names) > R.DISTRIBUTED_THRESHOLD
    return names


def test_distributed_candidates_byte_identical(ray_session, big_names,
                                               monkeypatch):
    cfg = PipelineConfig()

    # driver path, forced by lifting the threshold above the input size
    monkeypatch.setattr(R, "DISTRIBUTED_THRESHOLD", 10**9)
    edges_driver = R.fuzzy_candidate_edges(big_names, cfg)
    map_driver = R.build_name_map(big_names, cfg)

    # distributed path (natural trigger: 55k > 50k threshold)
    monkeypatch.setattr(R, "DISTRIBUTED_THRESHOLD", 50_000)
    edges_dist = R.fuzzy_candidate_edges(big_names, cfg)
    map_dist = R.build_name_map(big_names, cfg)

    assert sorted(edges_driver) == sorted(edges_dist)
    assert map_driver == map_dist

    # non-vacuous: every planted sibling pair actually merged, and the
    # hex names did not
    merged = {k for k, v in map_dist.items() if k != v}
    assert len(merged) >= 40
    for j in range(40):
        base = f"planted condition {j:03d} alphabeta"
        assert map_dist[base + "s"] == map_dist[base]


def test_batch_signatures_bit_identical():
    """The batch signature kernel must reproduce the per-item kernel
    exactly (the oracle and every LSH consumer depend on the values)."""
    import numpy as np

    from medical_doc_knowledge_graph_system_ray.functions.hashing import (
        MinHasher, char_shingles)

    h = MinHasher(16, seed=7)
    items = ["", "ab", "hypertension", "type 2 diabetes mellitus",
             "x" * 500] + [f"word{i} soup {i*7}" for i in range(200)]
    lists = [char_shingles(s.lower()) for s in items]
    # force many tiles (tile budget is cumulative SHINGLES since the
    # review-r4 memory fix, so long items can't blow the work matrix)
    batch = h.signatures(lists, max_tile_shingles=64)
    for i, sl in enumerate(lists):
        assert np.array_equal(batch[i], h.signature(sl)), items[i]


def test_threshold_constant_is_live():
    """The switch is wired, not a dead constant: a tiny input stays on
    the driver path even with Ray up (no Dataset machinery for 3 names),
    asserted by monkeypatching the distributed path to a bomb."""
    cfg = PipelineConfig()
    names = ["alpha one", "alpha ones", "gamma two"]
    orig = R._distributed_fuzzy_pairs
    try:
        def bomb(*a, **k):  # pragma: no cover - must not run
            raise AssertionError("distributed path used below threshold")

        R._distributed_fuzzy_pairs = bomb
        edges = R.fuzzy_candidate_edges(names, cfg)
    finally:
        R._distributed_fuzzy_pairs = orig
    assert ("alpha one", "alpha ones") in edges
