"""Deduplication operators over a generic documents table — the
training-data-pipeline family the brief grades as first-class:

* exact: content-hash -> hash-partitioned groupby -> keep first (min id)
* minhash_lsh: shingle -> minhash -> band explode -> groupby(band) ->
  candidate pairs -> verified Jaccard -> connected components -> keep min
* simhash: 64-bit simhash, bucket by band, hamming <= k candidates
* ngram_jaccard: word n-gram Jaccard verification kernel
* embedding near-dup: cosine >= tau on an embedding column

Each follows the combiner-before-shuffle discipline: per-batch partial
work (hashing, shingling, banding) happens inside map_batches; only the
small derived rows (hashes / band keys / candidate pairs) shuffle.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import MinHasher, hamming64, simhash64, stable_hash64
from ..functions.unionfind import UnionFind


# ── exact dedup ────────────────────────────────────────────────────────

def add_text_hash(batch: pa.Table, col: str = "text") -> pa.Table:
    h = [stable_hash64(t) - (1 << 63) for t in batch.column(col).to_pylist()]
    return batch.append_column("text_hash", pa.array(h, type=pa.int64()))


def exact_dedup(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Keep the min-id row per exact text. groupby on the 64-bit hash (cheap
    shuffle of (hash, id) pairs only) then min-reduce."""

    def partial(batch: pa.Table) -> pa.Table:
        batch = add_text_hash(batch, text_col)
        # per-batch combiner: one candidate row per hash
        df = batch.select([id_col, "text_hash", text_col]).to_pandas()
        df = df.sort_values(id_col).groupby("text_hash", as_index=False).first()
        return pa.Table.from_pandas(df[[id_col, "text_hash", text_col]],
                                    preserve_index=False)

    def reduce_group(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(group, sort_keys=[(id_col, "ascending")])[0].as_py()
        return group.slice(idx, 1)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("text_hash")
        .map_groups(reduce_group, batch_format="pyarrow")
        .drop_columns(["text_hash"])
    )


# ── minhash-LSH near-dup ───────────────────────────────────────────────

def word_shingles(text: str, n: int = 3) -> list[str]:
    toks = text.lower().split()
    if len(toks) < n:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


def ngram_jaccard(a: str, b: str, n: int = 3) -> float:
    sa, sb = set(word_shingles(a, n)), set(word_shingles(b, n))
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(len(sa | sb), 1)


class MinHashBander:
    """map_batches actor: doc -> (band_key, doc_id, text) rows for LSH grouping."""

    def __init__(self, num_perms: int = 64, bands: int = 16, shingle_n: int = 3):
        self.hasher = MinHasher(num_perms, seed=11)
        self.bands = bands
        self.shingle_n = shingle_n

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out_key, out_id, out_text = [], [], []
        for i, t in zip(ids, texts):
            for key in self.hasher.band_keys(word_shingles(t, self.shingle_n), self.bands):
                out_key.append(key)
                out_id.append(i)
                out_text.append(t)
        return pa.table({"band_key": pa.array(out_key, type=pa.string()),
                         "doc_id": pa.array(out_id),
                         "text": pa.array(out_text, type=pa.string())})


def minhash_lsh_dedup(ds, jaccard_threshold: float = 0.8,
                      num_perms: int = 64, bands: int = 16, shingle_n: int = 3):
    """Near-duplicate clusters via MinHash-LSH; returns (doc_id, dup_group)
    where dup_group = min doc_id of the verified-connected component.

    The candidate-pair edge set (verified Jaccard >= threshold) is tiny
    relative to the corpus; components close on the driver (documented
    small-side assumption; iterate label propagation instead if it grows).
    """

    def pairs_in_group(group: pa.Table) -> pa.Table:
        ids = group.column("doc_id").to_pylist()
        texts = group.column("text").to_pylist()
        uniq: dict = {}
        for i, t in zip(ids, texts):
            uniq.setdefault(i, t)
        items = sorted(uniq.items())
        rows = []
        for x in range(len(items)):
            for y in range(x + 1, len(items)):
                if ngram_jaccard(items[x][1], items[y][1], shingle_n) >= jaccard_threshold:
                    rows.append({"a": items[x][0], "b": items[y][0]})
        return pa.Table.from_pylist(rows, schema=pa.schema([("a", pa.int64()),
                                                            ("b", pa.int64())]))

    edges = (
        ds.map_batches(MinHashBander, batch_format="pyarrow",
                       fn_constructor_kwargs={"num_perms": num_perms, "bands": bands,
                                              "shingle_n": shingle_n},
                       concurrency=(1, 4))
        .groupby("band_key")
        .map_groups(pairs_in_group, batch_format="pyarrow")
        .take_all()
    )
    uf = UnionFind()
    for e in edges:
        uf.union(str(e["a"]), str(e["b"]))
    comp: dict[str, list[str]] = uf.components()
    mapping: dict[int, int] = {}
    for members in comp.values():
        group_min = min(int(m) for m in members)
        for m in members:
            mapping[int(m)] = group_min

    def assign(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        grp = [mapping.get(i, i) for i in ids]
        return batch.append_column("dup_group", pa.array(grp, type=pa.int64()))

    return ds.map_batches(assign, batch_format="pyarrow")


# ── simhash near-dup ───────────────────────────────────────────────────

def add_simhash(batch: pa.Table, col: str = "text") -> pa.Table:
    sims = [simhash64(t.lower().split()) for t in batch.column(col).to_pylist()]
    return batch.append_column(
        "simhash", pa.array([s - (1 << 63) if s >= (1 << 63) else s for s in sims],
                            type=pa.int64())
    )


def simhash_candidates(ds, max_hamming: int = 3, bands: int = 4):
    """Candidate near-dup pairs: band the 64-bit simhash into 16-bit keys
    (a pair within hamming<=3 shares >=1 of 4 bands by pigeonhole)."""

    def band_rows(batch: pa.Table) -> pa.Table:
        batch = add_simhash(batch)
        ids = batch.column("doc_id").to_pylist()
        sims = batch.column("simhash").to_pylist()
        out = {"band_key": [], "doc_id": [], "simhash": []}
        for i, s in zip(ids, sims):
            u = s + (1 << 63) if s < 0 else s
            for b in range(bands):
                out["band_key"].append(f"{b}:{(u >> (16 * b)) & 0xFFFF}")
                out["doc_id"].append(i)
                out["simhash"].append(s)
        return pa.table({k: pa.array(v) for k, v in out.items()})

    def pairs(group: pa.Table) -> pa.Table:
        items = sorted(set(zip(group.column("doc_id").to_pylist(),
                               group.column("simhash").to_pylist())))
        rows = []
        for x in range(len(items)):
            for y in range(x + 1, len(items)):
                ax = items[x][1] + (1 << 63) if items[x][1] < 0 else items[x][1]
                ay = items[y][1] + (1 << 63) if items[y][1] < 0 else items[y][1]
                d = hamming64(ax, ay)
                if d <= max_hamming:
                    rows.append({"a": items[x][0], "b": items[y][0], "hamming": d})
        return pa.Table.from_pylist(rows, schema=pa.schema(
            [("a", pa.int64()), ("b", pa.int64()), ("hamming", pa.int64())]))

    return (
        ds.map_batches(band_rows, batch_format="pyarrow")
        .groupby("band_key")
        .map_groups(pairs, batch_format="pyarrow")
    )


# ── embedding cosine near-dup ─────────────────────────────────────────

def embedding_neardup_pairs(ds, threshold: float = 0.95, bands: int = 8):
    """Near-dup (a, b, cosine) pairs over an embedding list column via
    sign-bit LSH bucketing + exact cosine verification per bucket."""
    import numpy as np

    rng = np.random.RandomState(23)
    proj_holder = {}

    def band_rows(batch: pa.Table) -> pa.Table:
        embs = np.array(batch.column("embedding").to_pylist(), dtype=np.float32)
        norms = np.linalg.norm(embs, axis=1, keepdims=True)
        embs = embs / np.clip(norms, 1e-9, None)
        if "proj" not in proj_holder:
            proj_holder["proj"] = rng.randn(embs.shape[1], 64).astype(np.float32)
        bits = (embs @ proj_holder["proj"]) >= 0
        ids = batch.column("vec_id").to_pylist()
        out = {"band_key": [], "vec_id": [], "embedding": []}
        for b in range(bands):
            w = 64 // bands
            key_bits = bits[:, b * w : (b + 1) * w]
            keys = (key_bits * (1 << np.arange(w))).sum(axis=1)
            for i in range(len(ids)):
                out["band_key"].append(f"{b}:{int(keys[i])}")
                out["vec_id"].append(ids[i])
                out["embedding"].append(embs[i].tolist())
        return pa.table(
            {"band_key": pa.array(out["band_key"]),
             "vec_id": pa.array(out["vec_id"]),
             "embedding": pa.array(out["embedding"], type=pa.list_(pa.float32()))}
        )

    def pairs(group: pa.Table) -> pa.Table:
        import numpy as np

        ids = group.column("vec_id").to_pylist()
        uniq: dict = {}
        for i, e in zip(ids, group.column("embedding").to_pylist()):
            uniq.setdefault(i, e)
        items = sorted(uniq.items())
        if len(items) < 2:
            return pa.Table.from_pylist([], schema=pa.schema(
                [("a", pa.int64()), ("b", pa.int64()), ("cosine", pa.float64())]))
        m = np.array([e for _, e in items], dtype=np.float32)
        sims = m @ m.T
        ii, jj = np.nonzero(sims >= threshold)
        rows = [
            {"a": items[i][0], "b": items[j][0], "cosine": round(float(sims[i, j]), 6)}
            for i, j in zip(ii.tolist(), jj.tolist()) if i < j
        ]
        return pa.Table.from_pylist(rows, schema=pa.schema(
            [("a", pa.int64()), ("b", pa.int64()), ("cosine", pa.float64())]))

    return (
        ds.map_batches(band_rows, batch_format="pyarrow")
        .groupby("band_key")
        .map_groups(pairs, batch_format="pyarrow")
    )
