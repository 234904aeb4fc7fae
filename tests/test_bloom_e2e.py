"""At-scale dangling-filter modes: entity_filter_mode='bloom' (broadcast
Bloom filter) and 'bucketed' (no broadcast at all — partition-local subj
check + two exchanges for the obj check) must each produce byte-identical
triples to the exact broadcast set (VERDICT r2 #5 three-way parity)."""

from __future__ import annotations

import os

import pyarrow.parquet as pq


def _triples(pipe):
    t = pipe.read_table("triples")
    return set(zip(t.column("subj").to_pylist(), t.column("pred").to_pylist(),
                   t.column("obj").to_pylist()))


def test_bloom_mode_matches_exact(ray_session, tiny_corpus, tmp_path):
    from medical_doc_knowledge_graph_system_ray.config import PipelineConfig
    from medical_doc_knowledge_graph_system_ray.pipelines.ingest import IngestPipeline

    docs, _ = tiny_corpus
    ddir = os.path.join(tmp_path, "docs")
    os.makedirs(ddir)
    pq.write_table(docs, os.path.join(ddir, "p.parquet"))

    base = dict(num_shards=2, num_output_partitions=4, extract_concurrency=2)
    exact = IngestPipeline(ddir, PipelineConfig(**base, entity_filter_mode="exact"),
                           output_dir=os.path.join(tmp_path, "exact"))
    exact.run(with_spans=False)
    bloom = IngestPipeline(ddir, PipelineConfig(**base, entity_filter_mode="bloom"),
                           output_dir=os.path.join(tmp_path, "bloom"))
    bloom.run(with_spans=False)

    assert _triples(exact) == _triples(bloom)


def test_bucketed_mode_matches_exact_byte_identical(ray_session, tiny_corpus,
                                                    tmp_path):
    """The bucketed semi-join must match the exact broadcast not just as a
    triple set but byte-for-byte per partition file (same bucketing, same
    sort, same finalize)."""
    from medical_doc_knowledge_graph_system_ray.config import PipelineConfig
    from medical_doc_knowledge_graph_system_ray.pipelines.ingest import IngestPipeline

    docs, _ = tiny_corpus
    ddir = os.path.join(tmp_path, "docs")
    os.makedirs(ddir)
    pq.write_table(docs, os.path.join(ddir, "p.parquet"))

    base = dict(num_shards=2, num_output_partitions=4, extract_concurrency=2)
    exact = IngestPipeline(ddir, PipelineConfig(**base, entity_filter_mode="exact"),
                           output_dir=os.path.join(tmp_path, "exact2"))
    exact.run(with_spans=False)
    bucketed = IngestPipeline(
        ddir, PipelineConfig(**base, entity_filter_mode="bucketed"),
        output_dir=os.path.join(tmp_path, "bucketed"))
    bucketed.run(with_spans=False)

    e_dir = os.path.join(tmp_path, "exact2", "triples")
    b_dir = os.path.join(tmp_path, "bucketed", "triples")
    e_files = sorted(f for f in os.listdir(e_dir) if f.endswith(".parquet"))
    b_files = sorted(f for f in os.listdir(b_dir) if f.endswith(".parquet"))
    assert e_files == b_files
    for f in e_files:
        et = pq.read_table(os.path.join(e_dir, f))
        bt = pq.read_table(os.path.join(b_dir, f))
        assert et.equals(bt), f
