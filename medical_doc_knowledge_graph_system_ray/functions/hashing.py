"""Deterministic hashing kernels: chunk ids, stable 64-bit hashes,
minhash / simhash over character shingles, rolling fingerprints.

All deterministic across processes (no PYTHONHASHSEED dependence) so
that retried Ray tasks and the single-process oracle produce identical
values.
"""

from __future__ import annotations

import hashlib

import numpy as np

_MERSENNE = (1 << 61) - 1


def make_chunk_id(doc_id: str, section: str, idx: int) -> str:
    """Deterministic chunk id — same math as the reference
    (/root/reference/app/ingestion/chunker.py:25-28)."""
    raw = f"{doc_id}::{section}::{idx}"
    return hashlib.sha256(raw.encode()).hexdigest()[:16]


def stable_hash64(s: str) -> int:
    """Process-stable unsigned 64-bit hash of a string."""
    return int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "little")


def entity_id(label: str, key: str) -> str:
    return hashlib.sha256(f"{label}::{key}".encode()).hexdigest()[:16]


def char_shingles(s: str, n: int = 3) -> list[str]:
    if len(s) < n:
        return [s] if s else []
    return [s[i : i + n] for i in range(len(s) - n + 1)]


def _minhash_params(num_perms: int, seed: int = 1) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perms, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, _MERSENNE, size=num_perms, dtype=np.int64).astype(np.uint64)
    return a, b


class MinHasher:
    """Minhash over hashed shingles; one instance per actor (params built once)."""

    def __init__(self, num_perms: int, seed: int = 1):
        self.num_perms = num_perms
        self.a, self.b = _minhash_params(num_perms, seed)

    def signature(self, shingles: list[str]) -> np.ndarray:
        if not shingles:
            return np.full(self.num_perms, _MERSENNE, dtype=np.uint64)
        h = np.array([stable_hash64(s) % _MERSENNE for s in shingles], dtype=np.uint64)
        # (a*h + b) mod p, vectorized over perms x shingles
        vals = (self.a[:, None] * h[None, :] + self.b[:, None]) % np.uint64(_MERSENNE)
        return vals.min(axis=1)

    def signatures(self, shingle_lists: list[list[str]],
                   max_tile_shingles: int = 131_072) -> np.ndarray:
        """(n, num_perms) batch signatures, bit-identical to per-item
        ``signature`` (same uint64 wrap + mod arithmetic): each DISTINCT
        shingle is blake2b-hashed once (factorize) and the per-item min
        runs as a segmented reduce — ~10x the per-item loop on batches of
        short strings.

        Tiles are sized by CUMULATIVE shingle count, not item count: the
        (num_perms x tile_shingles) uint64 work matrix is the peak
        allocation, and an item-count cap would let long documents blow
        it to gigabytes per concurrent task (the same first-touch
        page-fault storm class as the f32_fixed_list fix). 131072
        shingles x 64 perms x 8 B ≈ 67 MB per tile."""
        import pandas as pd

        n = len(shingle_lists)
        out = np.full((n, self.num_perms), _MERSENNE, dtype=np.uint64)
        tiles: list[tuple[int, int]] = []
        start, acc = 0, 0
        for i, sl in enumerate(shingle_lists):
            if acc and acc + len(sl) > max_tile_shingles:
                tiles.append((start, i))
                start, acc = i, 0
            acc += len(sl)
        if start < n:
            tiles.append((start, n))
        for c0, c1 in tiles:
            sls = shingle_lists[c0:c1]
            m = len(sls)
            lens = np.fromiter((len(s) for s in sls), dtype=np.int64, count=m)
            total = int(lens.sum())
            if total == 0:
                continue
            flat = np.empty(total, dtype=object)
            pos = 0
            for sl in sls:
                flat[pos : pos + len(sl)] = sl
                pos += len(sl)
            codes, uniques = pd.factorize(flat, sort=False)
            uh = np.fromiter((stable_hash64(u) % _MERSENNE for u in uniques),
                             dtype=np.uint64, count=len(uniques))
            h = uh[codes]
            vals = (self.a[:, None] * h[None, :] + self.b[:, None]) \
                % np.uint64(_MERSENNE)
            nonempty = np.nonzero(lens > 0)[0]
            starts = (np.concatenate(([0], np.cumsum(lens)))[:-1])[nonempty]
            for p in range(self.num_perms):
                out[c0 + nonempty, p] = np.minimum.reduceat(vals[p], starts)
        return out

    def band_keys(self, shingles: list[str], bands: int) -> list[str]:
        """LSH band keys: names sharing any band key become candidate pairs."""
        return self.band_keys_from_signature(self.signature(shingles), bands)

    def band_keys_from_signature(self, sig, bands: int) -> list[str]:
        """Band keys from an already-computed signature (lets callers that
        also need the full signature hash it without minhashing twice)."""
        rows = max(self.num_perms // bands, 1)
        keys = []
        for bi in range(bands):
            chunk = sig[bi * rows : (bi + 1) * rows]
            if chunk.size == 0:
                continue
            keys.append(f"{bi}:{hashlib.blake2b(chunk.tobytes(), digest_size=8).hexdigest()}")
        return keys


def simhash64(tokens: list[str]) -> int:
    """64-bit SimHash over tokens (weight 1 each)."""
    if not tokens:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    for t in tokens:
        h = stable_hash64(t)
        bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        acc += np.where(bits.astype(bool), 1, -1)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def rolling_fingerprint(text: str, window: int = 8, keep_mod: int = 16) -> list[int]:
    """Winnowing-style document fingerprint: polynomial rolling hash over
    char windows, keeping hashes = 0 (mod keep_mod). Deterministic."""
    n = len(text)
    if n < window:
        return [stable_hash64(text)] if text else []
    base = 1000003
    mod = (1 << 61) - 1
    codes = [ord(c) & 0xFFFF for c in text]
    pw = pow(base, window - 1, mod)
    h = 0
    for i in range(window):
        h = (h * base + codes[i]) % mod
    out = []
    if h % keep_mod == 0:
        out.append(h)
    for i in range(window, n):
        h = ((h - codes[i - window] * pw) * base + codes[i]) % mod
        if h % keep_mod == 0:
            out.append(h)
    return out
