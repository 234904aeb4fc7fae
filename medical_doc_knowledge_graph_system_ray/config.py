"""Pipeline configuration.

Mirrors the knobs of the reference's pydantic-settings config
(/root/reference/app/config.py:8-43) plus the Ray-Data-specific knobs
the reference has no concept of (partitioning, actor-pool sizing,
blocking parameters for the canonicalization shuffle).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class PipelineConfig:
    # ── chunking (reference: app/ingestion/chunker.py:34-38) ──────────────
    max_chunk_chars: int = 600
    overlap_chars: int = 80

    # ── resolution thresholds (reference: app/ingestion/entity_resolver.py:43-44) ─
    fuzzy_threshold: float = 88.0          # token_sort_ratio >= this merges
    semantic_threshold: float = 0.85       # embedding cosine >= this merges

    # ── embedding (reference: all-MiniLM-L6-v2, 384-d; here a deterministic
    #    hashed char-ngram projection so tests are reproducible offline) ──
    embedding_dim: int = 384
    embed_chunks: bool = False             # chunk embeddings are optional for the KG path
    # kernel for the chunk/document embedding column: "fast" (crc32 token
    # hashing, ~50x the ngram kernel — the bulk default) or "ngram" (the
    # char-3gram kernel the resolution semantic pass uses). Query-side
    # scoring follows this knob so stored and query vectors always agree.
    chunk_embedder: str = "fast"

    # ── Ray execution knobs ───────────────────────────────────────────────
    extract_concurrency: int = 8           # actor-pool size for the extraction stage
    extract_batch_size: int = 1024         # chunks per extraction batch
    chunk_batch_size: int = 256            # documents per chunking batch
    embed_batch_size: int = 2048

    # ── canonicalization blocking (replaces the reference's O(n^2) all-pairs,
    #    entity_resolver.py:102-143) ──────────────────────────────────────
    minhash_perms: int = 8                 # minhash permutations over char-3grams
    minhash_bands: int = 4                 # bands (rows = perms // bands)
    exact_allpairs_limit: int = 20_000     # <= this many distinct names -> exact
                                           # tiled-matmul / all-pairs path (matches
                                           # the oracle bit-for-bit); above it the
                                           # LSH-blocked distributed path is used
    salt_buckets: int = 16                 # salt for skewed normalized surface forms

    # ── dangling-endpoint semi-join (J2) ──────────────────────────────────
    # "exact": broadcast the full entity key set (bit-exact vs the oracle;
    # default). "bloom": broadcast a Bloom filter instead — the at-scale
    # mode beyond ~10^8 entities (no false negatives; FP rate ~2^-k keeps
    # a sliver of dangling triples). See DESIGN.md.
    entity_filter_mode: str = "exact"
    bloom_bits_per_key: int = 12

    # ── query-side rerank (Q8/T6) ─────────────────────────────────────────
    # minimum relevance score to keep a context element. The reference
    # default is 0.25 (config.py:36), calibrated for sentence-transformer
    # cosine; our deterministic n-gram stand-in embedder scores related
    # text ~2.5x lower (a directly-relevant citation lands near 0.15), so
    # the calibrated default is 0.10. Mechanics are unchanged: threshold
    # prune with no min-keep, and simple queries raise the bar by +0.10
    # (the reference's 0.25 -> 0.35 floor, context_builder.py:187-192).
    rerank_threshold: float = 0.10
    rerank_simple_delta: float = 0.10

    # ── post-extraction DAG fan-out bound (VERDICT r4 #1) ─────────────────
    # The fresh-run fast path ships pre-bucketed slices straight from
    # extraction tasks to the Phase-A writers: n_tasks x (2 + 3P) slice
    # objects and n_tasks-arg writer tasks. Fine at single-node task
    # counts, but on a cluster (thousands of extraction tasks) object-
    # store metadata and task-spec serialization would grow O(tasks x P).
    # Above this object budget, extraction tasks return whole tables
    # (5 objects each) and a grouped fan-in layer of ~_TARGET_SPLITS
    # concat+split tasks does the bucketing — slice objects and
    # per-writer arg counts become constants independent of task count.
    dag_direct_max_objects: int = 32_768

    # ── partitioned output / resume ───────────────────────────────────────
    num_shards: int = 8                    # input shards (resume granularity)
    num_output_partitions: int = 8         # hash partitions of final tables
    output_dir: str = "/tmp/medkg_out"

    # ── corpus synthesis (FIXTURES.md §1) ─────────────────────────────────
    corpus_seed: int = 42
    media_span_prob: float = 0.35
    dangling_patient_prob: float = 0.02    # patients w/o demographics doc -> dangling triples

    @property
    def minhash_rows_per_band(self) -> int:
        return max(self.minhash_perms // self.minhash_bands, 1)


DEFAULT_CONFIG = PipelineConfig()
