"""Deterministic hashed character-ngram embedder.

Stands in for the reference's SentenceTransformer all-MiniLM-L6-v2
(/root/reference/app/rag/embeddings.py:19-54): 384-dim, L2-normalized,
batch encode. A pinned neural model cannot run in this offline
container, and the semantic-merge pass (cosine >= 0.85,
entity_resolver.py:127-141) must be bit-reproducible between the Ray
pipeline and the single-process oracle — so the embedding is a feature
hash of character 3-grams projected into R^dim with deterministic signs.
Cosine similarity under this embedding approximates character-ngram
Jaccard/cosine, which is the behavior the semantic pass needs (merging
near-identical surface forms that fuzzy matching missed).

Vectorized: one numpy pass per batch of strings.
"""

from __future__ import annotations

import numpy as np

from .hashing import stable_hash64


class NgramEmbedder:
    def __init__(self, dim: int = 384, ngram: int = 3):
        self.dim = dim
        self.ngram = ngram
        self._cache: dict[str, np.ndarray] = {}

    def _embed_one(self, text: str) -> np.ndarray:
        v = np.zeros(self.dim, dtype=np.float32)
        t = text.lower()
        n = self.ngram
        if len(t) < n:
            grams = [t] if t else []
        else:
            grams = [t[i : i + n] for i in range(len(t) - n + 1)]
        for g in grams:
            h = stable_hash64(g)
            idx = h % self.dim
            sign = 1.0 if (h >> 32) & 1 else -1.0
            v[idx] += sign
        norm = np.linalg.norm(v)
        if norm > 0:
            v /= norm
        return v

    def embed_batch(self, texts: list[str]) -> np.ndarray:
        """(len(texts), dim) float32, rows L2-normalized (zero vector for empty)."""
        out = np.zeros((len(texts), self.dim), dtype=np.float32)
        for i, t in enumerate(texts):
            cached = self._cache.get(t)
            if cached is None:
                cached = self._embed_one(t)
                if len(self._cache) < 100_000:
                    self._cache[t] = cached
            out[i] = cached
        return out


def cosine_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Cosine similarity between row-normalized matrices = matmul."""
    return a @ b.T


def make_embedder(kind: str, dim: int):
    """Embedder factory: 'fast' = FastTokenEmbedder (bulk chunk/document
    columns — C-speed crc32 token hashing), 'ngram' = NgramEmbedder (the
    resolution semantic pass, whose cosine thresholds the oracle must
    reproduce bit-for-bit). Write and query sides of a vector column must
    use the SAME kind (cfg.chunk_embedder governs both)."""
    if kind == "fast":
        return FastTokenEmbedder(dim)
    if kind == "ngram":
        return NgramEmbedder(dim)
    raise ValueError(f"unknown embedder kind: {kind!r}")


class FastTokenEmbedder:
    """High-throughput document embedder: crc32-hashed token features.

    ~50x faster than NgramEmbedder (C-speed crc32 per token vs a Python
    loop per char-3-gram) at the cost of coarser features — the right
    kernel for bulk chunk/document embedding, while NgramEmbedder stays
    the canonical kernel for the resolution semantic pass (whose cosine
    thresholds the oracle must reproduce exactly)."""

    def __init__(self, dim: int = 384):
        self.dim = dim

    def embed_batch(self, texts: list[str]) -> np.ndarray:
        import zlib

        out = np.zeros((len(texts), self.dim), dtype=np.float32)
        dim = self.dim
        for i, t in enumerate(texts):
            toks = t.lower().split()
            if not toks:
                continue
            hs = np.fromiter((zlib.crc32(w.encode()) for w in toks),
                             dtype=np.uint32, count=len(toks))
            idx = hs % dim
            sign = np.where((hs >> 16) & 1, 1.0, -1.0).astype(np.float32)
            np.add.at(out[i], idx, sign)
            n = np.linalg.norm(out[i])
            if n > 0:
                out[i] /= n
        return out


def f32_fixed_list(vecs, dim):
    """(n, dim) float32 matrix -> Arrow FixedSizeList column, zero-copy.

    An extra astype/pa.array copy here costs ~14 s per writer task when 32
    tasks allocate ~90 MB each simultaneously (measured: concurrent
    first-touch page faults dominate); from_buffers shares the numpy
    buffer instead."""
    import pyarrow as pa

    if vecs.dtype != np.float32 or not vecs.flags.c_contiguous:
        vecs = np.ascontiguousarray(vecs, dtype=np.float32)
    flat = pa.Array.from_buffers(pa.float32(), vecs.size,
                                 [None, pa.py_buffer(vecs)])
    return pa.FixedSizeListArray.from_arrays(flat, dim)
