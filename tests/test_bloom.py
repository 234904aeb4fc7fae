"""Bloom-filter semi-join mode: no false negatives (recall preserved),
bounded false-positive rate, and the pipeline runs end-to-end with it."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from medical_doc_knowledge_graph_system_ray.config import PipelineConfig
from medical_doc_knowledge_graph_system_ray.functions.bloom import BloomFilter


def test_no_false_negatives_and_low_fp():
    keys = [f"Entity\x1fname-{i}" for i in range(5000)]
    bf = BloomFilter(len(keys), bits_per_key=12)
    bf.add_many(keys)
    assert all(k in bf for k in keys)  # zero false negatives by construction
    probes = [f"Entity\x1fother-{i}" for i in range(5000)]
    fp = sum(1 for p in probes if p in bf)
    assert fp / len(probes) < 0.01
    assert bf.nbytes < 20_000  # ~12 bits/key


def test_pipeline_bloom_mode_superset_of_exact(ray_session, tiny_corpus, tmp_path):
    docs, base_cfg = tiny_corpus
    ddir = os.path.join(tmp_path, "docs")
    os.makedirs(ddir)
    pq.write_table(docs, os.path.join(ddir, "p.parquet"))

    from medical_doc_knowledge_graph_system_ray.pipelines.ingest import IngestPipeline

    def run(mode, out):
        cfg = PipelineConfig(num_shards=2, num_output_partitions=4,
                             extract_concurrency=2, entity_filter_mode=mode)
        pipe = IngestPipeline(ddir, cfg, output_dir=os.path.join(tmp_path, out))
        pipe.run(with_spans=False, with_chunks_table=False)
        return {(r["subj"], r["pred"], r["obj"])
                for r in pipe.read_table("triples").to_pylist()}

    exact = run("exact", "out_exact")
    bloom = run("bloom", "out_bloom")
    # bloom keeps every real triple (no false negatives) and may keep a few
    # extra dangling ones (false positives)
    assert exact <= bloom
    assert len(bloom - exact) <= max(2, len(exact) // 100)
