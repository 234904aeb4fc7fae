"""Unit tests for the auxiliary stages: embedding, multimodal plumbing,
dedup kernels, similarity search, text analysis."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from medical_doc_knowledge_graph_system_ray.config import PipelineConfig
from medical_doc_knowledge_graph_system_ray.functions.embedder import NgramEmbedder
from medical_doc_knowledge_graph_system_ray.functions.hashing import (
    hamming64,
    rolling_fingerprint,
    simhash64,
)

CFG = PipelineConfig()


def test_ngram_embedder_deterministic_normalized():
    e = NgramEmbedder(384)
    a = e.embed_batch(["Hypertension", "hypertension", "Lisinopril"])
    assert a.shape == (3, 384)
    np.testing.assert_allclose(np.linalg.norm(a, axis=1), 1.0, rtol=1e-5)
    # case-insensitive by design (lowercases internally)
    np.testing.assert_array_equal(a[0], a[1])
    b = NgramEmbedder(384).embed_batch(["Hypertension"])
    np.testing.assert_array_equal(a[0], b[0])


def test_chunk_embedder_stage():
    from medical_doc_knowledge_graph_system_ray.stages.embedding import ChunkEmbedder

    t = pa.table({"chunk_id": ["a", "b"], "text": ["hello world", "foo bar"]})
    out = ChunkEmbedder(dim=64)(t)
    assert out.column("embedding").type == pa.list_(pa.float32(), 64)
    assert out.num_rows == 2


def test_media_featurizer_stub():
    from medical_doc_knowledge_graph_system_ray.stages.multimodal import (
        DecodeBackend,
        MediaFeaturizer,
        media_rows_from_spans,
    )
    from medical_doc_knowledge_graph_system_ray.corpus import synthesize_corpus_table

    docs = synthesize_corpus_table(20, CFG)
    media = media_rows_from_spans(docs)
    assert media.num_rows > 0
    feats = MediaFeaturizer(feature_dim=32)(media)
    assert feats.num_rows == media.num_rows
    assert feats.column("feature").type == pa.list_(pa.float32())
    # the real decode seam is explicitly not implemented in this container
    with pytest.raises(NotImplementedError):
        DecodeBackend().decode(b"x", "image")
    # deterministic fake: same payload -> same feature
    f2 = MediaFeaturizer(feature_dim=32)(media)
    assert feats.column("feature").to_pylist() == f2.column("feature").to_pylist()


def test_simhash_hamming():
    a = simhash64("the quick brown fox jumps".split())
    b = simhash64("the quick brown fox jumped".split())
    c = simhash64("completely different words entirely".split())
    assert hamming64(a, b) < hamming64(a, c)
    assert simhash64("x y z".split()) == simhash64("x y z".split())


def test_rolling_fingerprint_locality():
    base = "the patient reports chest tightness on exertion " * 4
    fp1 = set(rolling_fingerprint(base))
    fp2 = set(rolling_fingerprint(base + " new tail text here"))
    assert fp1, "no fingerprints selected"
    overlap = len(fp1 & fp2) / len(fp1)
    assert overlap > 0.8  # local change, mostly-shared fingerprints


def test_ngram_jaccard():
    from medical_doc_knowledge_graph_system_ray.stages.dedup import ngram_jaccard

    assert ngram_jaccard("a b c d e", "a b c d e") == 1.0
    assert ngram_jaccard("a b c d e", "v w x y z") == 0.0
    assert 0 < ngram_jaccard("a b c d e f", "a b c d e g") < 1


def test_ivf_matches_bruteforce(ray_session):
    import ray.data as rd

    from medical_doc_knowledge_graph_system_ray.stages.similarity import (
        brute_force_topk,
        build_ivf_centroids,
        ivf_topk,
    )

    rng = np.random.RandomState(0)
    vecs = rng.randn(500, 16).astype(np.float32)
    t = pa.table({"vec_id": pa.array(range(500), type=pa.int64()),
                  "embedding": pa.array([v.tolist() for v in vecs],
                                        type=pa.list_(pa.float32()))})
    ds = rd.from_arrow(t)
    q = vecs[:2]
    bf = brute_force_topk(ds, q, k=5).to_pandas()
    cents = build_ivf_centroids(vecs, n_clusters=8)
    ivf = ivf_topk(rd.from_arrow(t), q, cents, k=5, n_probe=4).to_pandas()
    # the query vector itself is always recalled by both
    for qi in (0, 1):
        assert qi in set(bf[bf.query_id == qi]["vec_id"])
        got = set(ivf[ivf.query_id == qi]["vec_id"])
        want = set(bf[bf.query_id == qi]["vec_id"])
        assert len(got & want) >= 3  # high recall at n_probe=4/8


def test_quality_and_langid():
    import pandas as pd

    from medical_doc_knowledge_graph_system_ray.stages.text_analysis import (
        LangId,
        quality_score_batch,
    )

    df = pd.DataFrame({
        "doc_id": [1, 2],
        "text": ["the cat and the dog sat on the mat with a hat for a while",
                 "el perro y el gato en la casa de los amigos por la tarde"],
    })
    out = LangId()(df.copy())
    assert out["lang_pred"].tolist() == ["en", "es"]
    q = quality_score_batch(df.copy())
    assert ((q["quality_score"] >= 0) & (q["quality_score"] <= 1)).all()
    assert q.loc[0, "stopword_ratio"] > 0


def test_round_half_away_matches_duckdb_mode():
    """numpy half-even vs DuckDB half-away diverge on exact 5e-7 ties —
    the CORRECTNESS r2 quality_scores hash failure."""
    import numpy as np

    from medical_doc_knowledge_graph_system_ray.stages.text_analysis import (
        round_half_away,
    )

    # 0.6263125 is an exact tie at 6 decimals: half-even gives .626312,
    # half-away (DuckDB round) gives .626313
    ties = np.array([0.6263125, 0.0000005, 0.1234565, 1.0, 0.25])
    got = round_half_away(ties, 6)
    assert got.tolist() == [0.626313, 1e-6, 0.123457, 1.0, 0.25]
    assert np.round(np.array([0.6263125]), 6)[0] == 0.626312  # the old bug
    assert round_half_away(np.array([-0.6263125]), 6)[0] == -0.626313


def test_quality_scores_whitespace_fixture_matches_oracle(tmp_path):
    """Tokenizer + rounding alignment proof (VERDICT r2 #1 'Done ='):
    whitespace-only / padded / tie-prone docs through BOTH the Ray kernel
    and the DuckDB oracle SQL, compared exactly (atol=0)."""
    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from medical_doc_knowledge_graph_system_ray.pipelines.queries import ORACLE_SQL
    from medical_doc_knowledge_graph_system_ray.stages.text_analysis import (
        quality_score_batch,
    )

    docs = pd.DataFrame({
        "doc_id": list(range(6)),
        "text": [
            "   \n\t  ",                       # whitespace-only: oracle splits '' -> ['']
            "",                                # empty
            "  the cat and the dog  ",        # padded
            "plain words without any stops",
            "punct!! heavy?? text;; here::",
            ("the and of to " * 8).strip(),    # stopword-saturated (score clamps)
        ],
    })
    p = tmp_path / "documents.parquet"
    pq.write_table(pa.Table.from_pandas(docs, preserve_index=False), p)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{p}')")
    want = con.execute(ORACLE_SQL["quality_scores"]).fetchdf()
    got = quality_score_batch(docs.copy())[
        ["doc_id", "n_tokens", "punct_ratio", "stopword_ratio", "quality_score"]
    ].sort_values("doc_id").reset_index(drop=True)
    assert got["n_tokens"].tolist() == want["n_tokens"].tolist()
    for c in ("punct_ratio", "stopword_ratio", "quality_score"):
        np.testing.assert_array_equal(got[c].to_numpy(), want[c].to_numpy(), err_msg=c)


def test_fast_token_embedder():
    from medical_doc_knowledge_graph_system_ray.functions.embedder import (
        FastTokenEmbedder,
    )

    e = FastTokenEmbedder(128)
    a = e.embed_batch(["the quick brown fox", "the quick brown fox", ""])
    assert a.shape == (3, 128)
    np.testing.assert_array_equal(a[0], a[1])  # deterministic
    assert np.linalg.norm(a[2]) == 0.0  # empty text -> zero vector
    assert abs(np.linalg.norm(a[0]) - 1.0) < 1e-5
