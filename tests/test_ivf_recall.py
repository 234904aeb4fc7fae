"""IVF ANN (T2 scale path): recall vs the exact brute-force baseline."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def test_ivf_topk_recall(ray_session):
    import ray.data as rd

    from medical_doc_knowledge_graph_system_ray.stages.similarity import (
        brute_force_topk, build_ivf_centroids, ivf_topk)

    rng = np.random.RandomState(7)
    m = rng.randn(400, 32).astype(np.float32)
    tbl = pa.table({"vec_id": pa.array(list(range(400)), type=pa.int64()),
                    "embedding": pa.array([r.tolist() for r in m],
                                          type=pa.list_(pa.float32()))})
    ds = rd.from_arrow(tbl)
    q = m[:3].astype(np.float64)

    exact = brute_force_topk(ds, q, k=10).to_pandas()
    cents = build_ivf_centroids(m[:256], n_clusters=16)
    approx = ivf_topk(rd.from_arrow(tbl), q, cents, k=10, n_probe=6).to_pandas()

    for qi in range(3):
        want = set(exact[exact["query_id"] == qi]["vec_id"])
        got = set(approx[approx["query_id"] == qi]["vec_id"])
        recall = len(want & got) / len(want)
        # each query vector is in the corpus: its own id must be found,
        # and bucketed search should recover most exact neighbors
        assert qi in got
        assert recall >= 0.5, (qi, recall)
