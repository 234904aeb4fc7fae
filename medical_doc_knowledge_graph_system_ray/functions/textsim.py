"""String-similarity kernels.

``token_sort_ratio`` reproduces the semantics the reference gets from
``rapidfuzz.fuzz.token_sort_ratio`` (/root/reference/app/ingestion/
entity_resolver.py:120): whitespace-tokenize, sort tokens, join with a
single space, then the normalized InDel similarity

    ratio = 100 * 2*LCS(a, b) / (len(a) + len(b))

(rapidfuzz's ``ratio`` is the normalized indel distance; indel distance
= len(a) + len(b) - 2*LCS). Implemented here from the public definition
— the rapidfuzz wheel is not available in this container. Exactness
matters only in that the oracle and the pipeline share THIS function, so
merge decisions are identical on both sides.
"""

from __future__ import annotations

from functools import lru_cache


def _lcs_len(a: str, b: str) -> int:
    """Longest-common-subsequence length, O(len(a)*len(b)) bit-parallel-free DP.

    Names are short (< 64 chars), so the plain rolling-row DP is fine.
    """
    if not a or not b:
        return 0
    if len(b) > len(a):
        a, b = b, a
    prev = [0] * (len(b) + 1)
    for ca in a:
        curr = [0]
        up = prev
        best = 0
        for j, cb in enumerate(b, 1):
            if ca == cb:
                v = up[j - 1] + 1
            else:
                v = max(curr[j - 1], up[j])
            curr.append(v)
        prev = curr
    return prev[-1]


def indel_ratio(a: str, b: str) -> float:
    """Normalized InDel similarity in [0, 100]."""
    total = len(a) + len(b)
    if total == 0:
        return 100.0
    return 200.0 * _lcs_len(a, b) / total


@lru_cache(maxsize=65536)
def _token_sorted(s: str) -> str:
    return " ".join(sorted(s.split()))


def token_sort_ratio(a: str, b: str) -> float:
    """token_sort_ratio on already-lowercased inputs (caller lowercases,
    matching entity_resolver.py:120 ``fuzz.token_sort_ratio(name.lower(), ...)``)."""
    return indel_ratio(_token_sorted(a), _token_sorted(b))
