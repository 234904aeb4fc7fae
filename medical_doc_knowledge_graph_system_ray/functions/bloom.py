"""Simple deterministic Bloom filter over strings.

The at-scale replacement for broadcasting the exact entity key set in
the dangling-endpoint semi-join (DESIGN.md §broadcasts): ~bits_per_key
bits per entity instead of the full key strings. No false negatives —
every real endpoint passes — so triple RECALL is unaffected; false
positives keep a tunable sliver of dangling triples (rate ~0.5^k for
k = bits_per_key * ln2 hash functions).
"""

from __future__ import annotations

import hashlib
import math

import numpy as np


class BloomFilter:
    def __init__(self, n_keys: int, bits_per_key: int = 12):
        self.m = max(64, n_keys * bits_per_key)
        self.k = max(1, int(round(bits_per_key * math.log(2))))
        self.bits = np.zeros((self.m + 7) // 8, dtype=np.uint8)

    def _positions(self, s: str) -> list[int]:
        h = hashlib.blake2b(s.encode(), digest_size=16).digest()
        a = int.from_bytes(h[:8], "little")
        b = int.from_bytes(h[8:], "little") | 1
        return [((a + i * b) % self.m) for i in range(self.k)]

    def add(self, s: str) -> None:
        for p in self._positions(s):
            self.bits[p >> 3] |= 1 << (p & 7)

    def add_many(self, items) -> None:
        for s in items:
            self.add(s)

    def __contains__(self, s: str) -> bool:
        for p in self._positions(s):
            if not (self.bits[p >> 3] >> (p & 7)) & 1:
                return False
        return True

    def contains_many(self, items) -> np.ndarray:
        return np.fromiter((s in self for s in items), dtype=bool,
                           count=len(items))

    @property
    def nbytes(self) -> int:
        return self.bits.nbytes
