"""Similarity search over an embedding column (list<float>).

Baseline: brute-force cosine top-k — the query matrix is broadcast once
(ray.put) and each batch does one numpy matmul against it; global top-k
via sort().limit(). Scale path: IVF-style bucketing — coarse centroids
assigned per batch, candidates restricted to the probed buckets.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.clip(np.linalg.norm(m, axis=1, keepdims=True), 1e-9, None)


def brute_force_topk(ds, query_vecs: np.ndarray, k: int = 10,
                     id_col: str = "vec_id", emb_col: str = "embedding"):
    """Top-k cosine rows per query: (query_id, vec_id, score).

    Per-batch partial top-k (combiner) then global sort().limit() per
    query — the shuffle carries n_batches * k rows, not the corpus.
    float64 math so scores agree with SQL oracles to rounding precision."""
    import ray

    q = _normalize(np.asarray(query_vecs, dtype=np.float64))
    q_ref = ray.put(q)

    class Score:
        def __init__(self):
            self.q = ray.get(q_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            embs = np.array(batch.column(emb_col).to_pylist(), dtype=np.float64)
            embs = _normalize(embs)
            sims = embs @ self.q.T  # (rows, n_queries)
            ids = np.asarray(batch.column(id_col).to_pylist())
            out = {"query_id": [], id_col: [], "score": []}
            for qi in range(self.q.shape[0]):
                col = sims[:, qi]
                take = min(k, len(col))
                top = np.argpartition(-col, take - 1)[:take] if take else []
                for t in top:
                    out["query_id"].append(qi)
                    out[id_col].append(int(ids[t]))
                    out["score"].append(round(float(col[t]), 6))
            return pa.table({"query_id": pa.array(out["query_id"], type=pa.int64()),
                             id_col: pa.array(out[id_col], type=pa.int64()),
                             "score": pa.array(out["score"], type=pa.float64())})

    scored = ds.map_batches(Score, batch_format="pyarrow", concurrency=(1, 4))

    def topk_group(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        idx = pc.sort_indices(
            group, sort_keys=[("score", "descending"), (id_col, "ascending")]
        )[: k]
        return group.take(idx)

    return scored.groupby("query_id").map_groups(topk_group, batch_format="pyarrow")


def build_ivf_centroids(sample: np.ndarray, n_clusters: int = 64,
                        iters: int = 10, seed: int = 5) -> np.ndarray:
    """Mini k-means on a driver-side sample (deterministic seed)."""
    rng = np.random.RandomState(seed)
    sample = _normalize(np.asarray(sample, dtype=np.float32))
    idx = rng.choice(len(sample), size=min(n_clusters, len(sample)), replace=False)
    cents = sample[idx].copy()
    for _ in range(iters):
        assign = (sample @ cents.T).argmax(axis=1)
        for c in range(len(cents)):
            members = sample[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
        cents = _normalize(cents)
    return cents


def ivf_topk(ds, query_vecs: np.ndarray, centroids: np.ndarray, k: int = 10,
             n_probe: int = 4, id_col: str = "vec_id", emb_col: str = "embedding"):
    """IVF-bucketed ANN: rows are scored only when their nearest centroid is
    among the query's n_probe probed buckets."""
    import ray

    q = _normalize(np.asarray(query_vecs, dtype=np.float32))
    cents = _normalize(np.asarray(centroids, dtype=np.float32))
    probe = np.argsort(-(q @ cents.T), axis=1)[:, :n_probe]  # (nq, n_probe)
    ref = ray.put((q, cents, probe))

    class Score:
        def __init__(self):
            self.q, self.cents, self.probe = ray.get(ref)
            self.probe_sets = [set(p.tolist()) for p in self.probe]

        def __call__(self, batch: pa.Table) -> pa.Table:
            embs = _normalize(np.array(batch.column(emb_col).to_pylist(), dtype=np.float32))
            ids = np.asarray(batch.column(id_col).to_pylist())
            cell = (embs @ self.cents.T).argmax(axis=1)
            out = {"query_id": [], id_col: [], "score": []}
            sims = embs @ self.q.T
            for qi, pset in enumerate(self.probe_sets):
                mask = np.isin(cell, list(pset))
                if not mask.any():
                    continue
                col = sims[mask, qi]
                sub_ids = ids[mask]
                take = min(k, len(col))
                top = np.argpartition(-col, take - 1)[:take]
                for t in top:
                    out["query_id"].append(qi)
                    out[id_col].append(int(sub_ids[t]))
                    out["score"].append(round(float(col[t]), 6))
            return pa.table({"query_id": pa.array(out["query_id"], type=pa.int64()),
                             id_col: pa.array(out[id_col], type=pa.int64()),
                             "score": pa.array(out["score"], type=pa.float64())})

    scored = ds.map_batches(Score, batch_format="pyarrow", concurrency=(1, 4))

    def topk_group(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        idx = pc.sort_indices(
            group, sort_keys=[("score", "descending"), (id_col, "ascending")]
        )[: k]
        return group.take(idx)

    return scored.groupby("query_id").map_groups(topk_group, batch_format="pyarrow")
