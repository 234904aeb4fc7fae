"""Chunk-embedding stage — the A1 analog (SURVEY.md §2.3): the reference
warm-loads a SentenceTransformer singleton and encodes batches of 32
(/root/reference/app/rag/embeddings.py:19-54). Here the canonical
GPU-shaped actor-pool stage: the embedder is built once per actor in
__init__ (where a real model load would go, with num_gpus set on the
pool), batches are encoded vectorized in __call__.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import PipelineConfig
from ..functions.embedder import f32_fixed_list, make_embedder


class ChunkEmbedder:
    """map_batches(ChunkEmbedder, concurrency=(m, n), batch_size=B[, num_gpus=g])."""

    def __init__(self, dim: int = 384, text_col: str = "text", kind: str = "fast"):
        self.embedder = make_embedder(kind, dim)  # model load goes here
        self.text_col = text_col
        self.dim = dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = self.embedder.embed_batch(batch.column(self.text_col).to_pylist())
        arr = f32_fixed_list(vecs, self.dim)
        if "embedding" in batch.column_names:
            batch = batch.drop_columns(["embedding"])
        return batch.append_column("embedding", arr)


def embed_chunks(ds, cfg: PipelineConfig):
    return ds.map_batches(
        ChunkEmbedder,
        fn_constructor_kwargs={"dim": cfg.embedding_dim,
                               "kind": cfg.chunk_embedder},
        batch_format="pyarrow",
        batch_size=cfg.embed_batch_size,
        concurrency=(1, 4),
    )
