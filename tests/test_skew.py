"""Skew handling: oversized canonicalization blocks are salted into
bounded sub-buckets (the north rule's 'salt high-frequency concepts
before the canonicalization shuffle'), and the LSH path still finds the
merges the all-pairs oracle finds."""

from __future__ import annotations

from medical_doc_knowledge_graph_system_ray.config import PipelineConfig
from medical_doc_knowledge_graph_system_ray.stages.resolution import (
    MAX_BLOCK,
    _salt_block,
    build_name_map,
    fuzzy_candidate_edges,
)

CFG = PipelineConfig()


def test_salt_block_bounds_bucket_size():
    members = list(range(5000))
    buckets = _salt_block(members, MAX_BLOCK)
    assert len(buckets) > 1
    for b in buckets:
        # overlap factor 2: each bucket holds ~2/k of the members
        assert len(b) <= 2 * MAX_BLOCK + 2
    # every member appears in at least one bucket
    seen = set()
    for b in buckets:
        seen.update(b)
    assert seen == set(members)


def test_small_block_unsalted():
    assert _salt_block([1, 2, 3], MAX_BLOCK) == [[1, 2, 3]]


def test_hot_surface_family_still_merges():
    """A skewed family of near-identical names (a 'hot' normalized form at
    corpus scale) lands in one oversized block; salting must not lose the
    merges of the case-variant pairs."""
    base = "hyperlipidemia"
    names = [base, base.capitalize(), base.upper()]
    # pad with mutually-dissimilar decoys so blocks exist
    import random

    rng = random.Random(3)
    decoys = ["".join(rng.choices("abcdefghijklmnopqrstuvwxyz", k=12))
              for _ in range(50)]
    names += decoys
    m = build_name_map(names, CFG)
    assert m[base] == m[base.capitalize()] == m[base.upper()]
    # random decoys are below the fuzzy threshold -> untouched
    untouched = sum(1 for d in decoys if m[d] == d)
    assert untouched >= len(decoys) - 2


def test_candidate_edges_deduplicate():
    names = ["alpha beta", "beta alpha", "alpha  beta", "gamma delta"]
    edges = fuzzy_candidate_edges(names, CFG)
    # token-sort-equal names merge; (a,b) pairs not duplicated
    assert len(edges) == len(set(edges))
    pairs = {frozenset(e) for e in edges}
    assert frozenset(("alpha beta", "beta alpha")) in pairs
