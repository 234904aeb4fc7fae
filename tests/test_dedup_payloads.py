"""Shuffle-payload contract for the dedup family (VERDICT r1 #1): band
stages ship (band_key, id) only — never document text or embedding
vectors — and the de-drivered hash join + exact/LSH near-dup operators
keep their semantics."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


DOCS = pa.table({
    "doc_id": pa.array(list(range(8)), type=pa.int64()),
    "text": [
        "the quick brown fox jumps over the lazy dog today",
        "the quick brown fox jumps over the lazy dog tonight",  # near-dup of 0
        "completely different words about medical records here",
        "the quick brown fox jumps over the lazy dog today",    # exact dup of 0
        "another unrelated document with its own content",
        "yet more unrelated text that shares nothing at all",
        "completely different words about medical records here",  # exact dup of 2
        "the quick brown fox jumps over the lazy dog today ok",  # near-dup of 0
    ],
})


def test_minhash_bander_payload_free():
    from medical_doc_knowledge_graph_system_ray.stages.dedup import MinHashBander

    out = MinHashBander(num_perms=16, bands=4)(DOCS)
    # band_key + id + 8-byte signature hash ONLY — never the text
    assert set(out.column_names) == {"band_key", "doc_id", "sig64"}
    assert out.schema.field("sig64").type == "int64"


def test_minhash_hot_bucket_star_compression(ray_session):
    """A bucket of N identical documents must emit O(N) candidate edges
    (signature star), not the N^2/2 clique — and still cluster to min id."""
    import time

    import ray.data as rd

    from medical_doc_knowledge_graph_system_ray.stages.dedup import (
        _candidate_pairs_in_group, MinHashBander, minhash_lsh_dedup)

    n = 3000
    docs = pa.table({
        "doc_id": pa.array(list(range(n)), type=pa.int64()),
        "text": ["the exact same document text for every row here"] * n,
    })
    # direct group check: one band bucket of identical sigs -> n-1 edges
    band = MinHashBander(num_perms=16, bands=1)(docs)
    pairs = _candidate_pairs_in_group(band)
    assert pairs.num_rows == n - 1

    t0 = time.time()
    out = minhash_lsh_dedup(rd.from_arrow(docs), jaccard_threshold=0.8).to_pandas()
    assert (out["dup_group"] == 0).all()
    assert time.time() - t0 < 120  # clique expansion would blow past this


def test_sign_band_fn_payload_free():
    from medical_doc_knowledge_graph_system_ray.stages.dedup import make_sign_band_fn

    vecs = pa.table({
        "vec_id": pa.array([0, 1, 2], type=pa.int64()),
        "embedding": pa.array([[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]],
                              type=pa.list_(pa.float32())),
    })
    out = make_sign_band_fn(bands=4)(vecs)
    # band_key + id + 8-byte sketch ONLY — never the vector
    assert set(out.column_names) == {"band_key", "vec_id", "sketch64"}


def test_exact_dedup_min_id_per_text(ray_session):
    import ray.data as rd

    from medical_doc_knowledge_graph_system_ray.stages.dedup import exact_dedup

    ds = rd.from_arrow(DOCS)
    out = exact_dedup(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    want = (DOCS.to_pandas().sort_values("doc_id")
            .groupby("text", as_index=False).first()
            .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(out[["doc_id", "text"]],
                                  want[["doc_id", "text"]])


def test_minhash_lsh_dedup_groups(ray_session):
    import ray.data as rd

    from medical_doc_knowledge_graph_system_ray.stages.dedup import minhash_lsh_dedup

    ds = rd.from_arrow(DOCS)
    out = minhash_lsh_dedup(ds, jaccard_threshold=0.5).to_pandas()
    groups = dict(zip(out["doc_id"], out["dup_group"]))
    # exact dups + near-dups of doc 0 cluster to min id 0
    assert groups[3] == 0 and groups[1] == 0 and groups[7] == 0
    assert groups[6] == groups[2] == 2
    # singletons map to themselves
    assert groups[4] == 4 and groups[5] == 5


def test_lsh_dedup_driver_never_materializes_payloads(ray_session, monkeypatch):
    """VERDICT r2 #4 contract: during minhash_lsh_dedup and
    embedding_neardup_lsh, every driver-side materialization (take_all /
    count-triggered collects) touches only payload-free datasets —
    candidate ids, verified (a, b, score) edges, labels. Any dataset
    carrying text / embedding / joined payload columns must stay in the
    object store."""
    import ray.data as rd

    from medical_doc_knowledge_graph_system_ray.stages.dedup import (
        embedding_neardup_lsh, minhash_lsh_dedup)

    forbidden = {"text", "embedding", "__payload_a", "__payload_b"}
    orig = rd.Dataset.take_all

    def guarded(self, *args, **kwargs):
        names = set(self.schema().names)
        assert not (names & forbidden), \
            f"driver take_all on payload-bearing dataset: {sorted(names)}"
        return orig(self, *args, **kwargs)

    monkeypatch.setattr(rd.Dataset, "take_all", guarded)

    out = minhash_lsh_dedup(rd.from_arrow(DOCS), jaccard_threshold=0.5)
    # edges/labels pipelines execute inside the operator; materialize the
    # RESULT only after restoring (the caller may collect what it likes)
    monkeypatch.setattr(rd.Dataset, "take_all", orig)
    groups = dict(zip(*[out.to_pandas()[c] for c in ("doc_id", "dup_group")]))
    assert groups[3] == 0 and groups[1] == 0 and groups[6] == 2

    rng = np.random.RandomState(3)
    m = rng.randn(30, 16).astype(np.float32)
    m[7] = m[2]
    tbl = pa.table({"vec_id": pa.array(list(range(30)), type=pa.int64()),
                    "embedding": pa.array([r.tolist() for r in m],
                                          type=pa.list_(pa.float32()))})
    monkeypatch.setattr(rd.Dataset, "take_all", guarded)
    lsh = embedding_neardup_lsh(rd.from_arrow(tbl), threshold=0.45)
    monkeypatch.setattr(rd.Dataset, "take_all", orig)
    assert (2, 7) in set(zip(*[lsh.to_pandas()[c] for c in ("a", "b")]))


def test_minhash_distributed_closure_matches_driver(ray_session):
    """Forcing the label-propagation path (driver_closure_max_edges=0)
    yields the identical (doc_id, dup_group) assignment as the driver
    union-find."""
    import ray.data as rd

    from medical_doc_knowledge_graph_system_ray.stages.dedup import minhash_lsh_dedup

    base = minhash_lsh_dedup(rd.from_arrow(DOCS), jaccard_threshold=0.5) \
        .to_pandas()[["doc_id", "dup_group"]].sort_values("doc_id")
    dist = minhash_lsh_dedup(rd.from_arrow(DOCS), jaccard_threshold=0.5,
                             driver_closure_max_edges=0) \
        .to_pandas()[["doc_id", "dup_group"]].sort_values("doc_id")
    assert base.values.tolist() == dist.values.tolist()


def test_embedding_neardup_exact_matches_bruteforce(ray_session):
    import ray.data as rd

    from medical_doc_knowledge_graph_system_ray.stages.dedup import (
        embedding_neardup_exact, embedding_neardup_lsh)

    rng = np.random.RandomState(3)
    m = rng.randn(40, 16).astype(np.float32)
    m[7] = m[2] + 0.01 * rng.randn(16)  # planted near-dup
    m[31] = m[11]                       # planted exact dup
    tbl = pa.table({"vec_id": pa.array(list(range(40)), type=pa.int64()),
                    "embedding": pa.array([r.tolist() for r in m],
                                          type=pa.list_(pa.float32()))})
    ds = rd.from_arrow(tbl)

    from medical_doc_knowledge_graph_system_ray.stages.text_analysis import (
        round_half_away,
    )

    m64 = np.asarray(m, dtype=np.float64)
    n = m64 / np.linalg.norm(m64, axis=1, keepdims=True)
    sims = round_half_away(n @ n.T, 5)  # the operator's 5-decimal contract
    tau = 0.8
    want = sorted((a, b) for a in range(40) for b in range(a + 1, 40)
                  if sims[a, b] >= tau)

    got = embedding_neardup_exact(ds, threshold=tau).to_pandas()
    got_pairs = sorted(zip(got["a"], got["b"]))
    assert got_pairs == want
    assert (2, 7) in got_pairs and (11, 31) in got_pairs

    # LSH path: subset of exact, and finds the identical pair
    lsh = embedding_neardup_lsh(ds, threshold=tau).to_pandas()
    lsh_pairs = sorted(zip(lsh["a"], lsh["b"]))
    assert set(lsh_pairs) <= set(want)
    assert (11, 31) in lsh_pairs


def test_embedding_lsh_recall_floor(ray_session):
    """Quantitative recall floor vs the exact path at the shipped default
    threshold 0.45 (ADVICE r2: 8x8 banding was ~14% recall — near-blind
    at its own default). 16 bands x 4 bits targets ~95% expected recall
    at the boundary; assert >= 0.8 on planted correlated pairs."""
    import ray.data as rd

    from medical_doc_knowledge_graph_system_ray.stages.dedup import (
        embedding_neardup_exact, embedding_neardup_lsh)

    rng = np.random.RandomState(7)
    base = rng.randn(60, 32).astype(np.float32)
    # plant 20 correlated pairs spanning cosines ~0.45..0.95
    rows = [base[i] for i in range(60)]
    for k in range(20):
        noise = 0.25 + 0.05 * k  # increasing noise -> decreasing cosine
        rows.append(base[k] + noise * rng.randn(32).astype(np.float32))
    tbl = pa.table({"vec_id": pa.array(list(range(len(rows))), type=pa.int64()),
                    "embedding": pa.array([r.tolist() for r in rows],
                                          type=pa.list_(pa.float32()))})
    ds = rd.from_arrow(tbl)
    exact = set(zip(*[embedding_neardup_exact(ds, threshold=0.45)
                      .to_pandas()[c] for c in ("a", "b")]))
    lsh = set(zip(*[embedding_neardup_lsh(ds, threshold=0.45)
                    .to_pandas()[c] for c in ("a", "b")]))
    assert len(exact) >= 15  # the planted pairs are actually above tau
    assert lsh <= exact  # every LSH pair is exact-verified
    recall = len(lsh & exact) / len(exact)
    assert recall >= 0.8, f"LSH recall {recall:.2f} < 0.8 ({len(lsh)}/{len(exact)})"


@pytest.mark.parametrize("how", ["inner", "left", "outer"])
def test_hash_join_matches_pandas(ray_session, how):
    import ray.data as rd

    from medical_doc_knowledge_graph_system_ray.stages.joins import hash_join

    l = pd.DataFrame({"k": [1, 2, 3, 4, 4], "lv": [10, 20, 30, 40, 41]})
    r = pd.DataFrame({"k": [2, 3, 3, 5], "rv": ["b", "c1", "c2", "e"]})
    got = hash_join(rd.from_pandas(l), rd.from_pandas(r), on="k",
                    num_buckets=4, how=how).to_pandas()
    want = l.merge(r, on="k", how=how)
    got = got.sort_values(["k", "lv", "rv"], na_position="last").reset_index(drop=True)
    want = want.sort_values(["k", "lv", "rv"], na_position="last").reset_index(drop=True)
    assert len(got) == len(want)
    assert got["rv"].fillna("NA").tolist() == want["rv"].fillna("NA").tolist()
    assert got["lv"].fillna(-1).tolist() == want["lv"].fillna(-1).tolist()


def test_hash_join_empty_right(ray_session):
    import ray.data as rd

    from medical_doc_knowledge_graph_system_ray.stages.joins import hash_join

    l = pd.DataFrame({"k": [1, 2], "lv": [10, 20]})
    r = pd.DataFrame({"k": pd.Series(dtype="int64"),
                      "rv": pd.Series(dtype="object")})
    inner = hash_join(rd.from_pandas(l), rd.from_pandas(r), on="k",
                      num_buckets=2, how="inner")
    assert set(inner.schema().names) == {"k", "lv", "rv"}
    assert inner.count() == 0
    left = hash_join(rd.from_pandas(l), rd.from_pandas(r), on="k",
                     num_buckets=2, how="left").to_pandas()
    assert len(left) == 2 and left["rv"].isna().all()
