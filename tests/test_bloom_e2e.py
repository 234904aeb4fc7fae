"""At-scale dangling-filter mode: entity_filter_mode='bloom' must produce
the same triples as the exact broadcast set (no false negatives; the FP
sliver is absent at this scale)."""

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
