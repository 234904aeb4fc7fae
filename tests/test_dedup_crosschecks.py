"""Driver-visible correctness for the rows-only dedup family (VERDICT r3
#8): `minhash_dedup_docs`, `simhash_candidates` and
`embedding_neardup_lsh` have no SQL oracle in the driver, so these
cross-checks pin their semantics against the ORACLED members of the
family on a doctored corpus with planted duplicates:

  * minhash clusters ⊇ exact-dedup groups — identical texts MUST share a
    dup_group (identical signature -> identical band keys -> candidate
    -> Jaccard 1.0 >= any threshold);
  * simhash candidates ⊇ identical-text pairs (identical simhash,
    pigeonhole-complete banding);
  * embedding LSH pairs ⊆ exact cosine pairs at the same threshold
    (LSH verifies candidates with the exact kernel), and ⊇ the planted
    identical-vector pairs (identical sketch collides in every band).

All assertions are deterministic — no tuned-recall thresholds. The
testdata corpus has NO duplicate texts (FIXTURES.md), so the fixture
plants them: a 20% sample re-appended under shifted ids.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF_DIR = "/root/testdata/sf0.001"
ID_SHIFT = 1_000_000


@pytest.fixture(scope="module")
def doctored_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("doctored_sf")
    docs = pq.read_table(os.path.join(SF_DIR, "documents.parquet"))
    sample = docs.slice(0, docs.num_rows // 5)
    import pyarrow.compute as pc

    dup = sample.set_column(
        sample.schema.get_field_index("doc_id"), "doc_id",
        pc.add(sample.column("doc_id"), ID_SHIFT))
    pq.write_table(pa.concat_tables([docs, dup]),
                   os.path.join(out, "documents.parquet"))

    emb = pq.read_table(os.path.join(SF_DIR, "embeddings.parquet"))
    esample = emb.slice(0, emb.num_rows // 10)
    edup = esample.set_column(
        esample.schema.get_field_index("vec_id"), "vec_id",
        pc.add(esample.column("vec_id"), ID_SHIFT))
    pq.write_table(pa.concat_tables([emb, edup]),
                   os.path.join(out, "embeddings.parquet"))

    planted_docs = sample.column("doc_id").to_pylist()
    planted_vecs = esample.column("vec_id").to_pylist()
    return str(out), planted_docs, planted_vecs


def _pairs(df) -> set[tuple[int, int]]:
    return {(int(a), int(b)) for a, b in zip(df["a"], df["b"])}


def test_minhash_clusters_superset_of_exact_groups(ray_session, doctored_dir):
    import ray.data as rd

    from medical_doc_knowledge_graph_system_ray.stages.dedup import (
        exact_dedup, minhash_lsh_dedup)

    sf, planted, _ = doctored_dir
    ds = rd.read_parquet(os.path.join(sf, "documents.parquet"),
                         columns=["doc_id", "text"])
    kept = exact_dedup(ds).to_pandas()
    # exact dedup keeps one representative per distinct text: every
    # planted (orig, orig+SHIFT) pair collapses to a single survivor
    kept_ids = set(kept["doc_id"])
    for d in planted:
        assert (d in kept_ids) != (d + ID_SHIFT in kept_ids), d

    ds2 = rd.read_parquet(os.path.join(sf, "documents.parquet"),
                          columns=["doc_id", "text"])
    clusters = minhash_lsh_dedup(ds2, jaccard_threshold=0.8).to_pandas()
    group = dict(zip(clusters["doc_id"], clusters["dup_group"]))
    for d in planted:
        assert group[d] == group[d + ID_SHIFT], d


def test_simhash_candidates_cover_identical_texts(ray_session, doctored_dir):
    import ray.data as rd

    from medical_doc_knowledge_graph_system_ray.stages.dedup import (
        simhash_candidates)

    sf, planted, _ = doctored_dir
    ds = rd.read_parquet(os.path.join(sf, "documents.parquet"),
                         columns=["doc_id", "text"])
    cand = simhash_candidates(ds, max_hamming=3).to_pandas()
    got = _pairs(cand)
    ham = {(int(a), int(b)): int(h)
           for a, b, h in zip(cand["a"], cand["b"], cand["hamming"])}
    for d in planted:
        key = (min(d, d + ID_SHIFT), max(d, d + ID_SHIFT))
        assert key in got, key
        assert ham[key] == 0, key


def test_embedding_lsh_subset_of_exact_and_finds_planted(ray_session,
                                                         doctored_dir):
    import ray.data as rd

    from medical_doc_knowledge_graph_system_ray.stages.dedup import (
        embedding_neardup_exact, embedding_neardup_lsh)

    sf, _, planted = doctored_dir
    mk = lambda: rd.read_parquet(os.path.join(sf, "embeddings.parquet"),
                                 columns=["vec_id", "embedding"])
    exact = _pairs(embedding_neardup_exact(mk(), threshold=0.45).to_pandas())
    lsh = _pairs(embedding_neardup_lsh(mk(), threshold=0.45).to_pandas())
    assert lsh <= exact, lsh - exact
    for v in planted:
        assert (min(v, v + ID_SHIFT), max(v, v + ID_SHIFT)) in lsh, v
