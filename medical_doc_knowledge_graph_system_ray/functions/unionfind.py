"""Union-find with a deterministic representative rule.

Replaces the reference's transitive value-rewrite loop
(/root/reference/app/ingestion/entity_resolver.py:127-143) with
connected components over merge edges. Representative = the member that
the reference's "keep the longer / more descriptive name" rule
(entity_resolver.py:122-123,137) converges to: longest name, ties broken
by lexicographically greatest (the reference's last-writer-wins on
equal-length pairs resolves to the later-iterated name; the oracle
iterates names in sorted order, so the final winner of a tie is the
lexicographically greater one).

The overall canonical map is a composition of two maps mirroring the
reference's two passes:

  pass 1: synonym-dictionary assignment (directional, wins over length)
          union fuzzy-match components (longest-wins representative)
  pass 2: semantic (cosine) components over pass-1 canonical VALUES,
          longest-wins representative, fully transitive (the reference's
          value-rewrite makes pass 2 transitive as well).
"""

from __future__ import annotations


class UnionFind:
    def __init__(self):
        self.parent: dict[str, str] = {}

    def find(self, x: str) -> str:
        p = self.parent.setdefault(x, x)
        while p != self.parent[p]:
            self.parent[p] = self.parent[self.parent[p]]
            p = self.parent[p]
        self.parent[x] = p
        return p

    def union(self, a: str, b: str) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[rb] = ra

    def components(self) -> dict[str, list[str]]:
        comps: dict[str, list[str]] = {}
        for x in list(self.parent):
            comps.setdefault(self.find(x), []).append(x)
        return comps


def rep_longest_lexmax(members: list[str]) -> str:
    """Pass-1 representative: longest; ties -> lexicographically greatest
    (the last-write of the sorted fuzzy loop wins equal-length ties)."""
    return max(members, key=lambda s: (len(s), s))


def rep_longest_lexmin(members: list[str]) -> str:
    """Pass-2 representative: longest; ties -> lexicographically smallest
    (``canonical = name_a if len >= else name_b`` keeps the earlier-sorted
    name on equal length, entity_resolver.py:137)."""
    return min(members, key=lambda s: (-len(s), s))


def uf_canonical_map(
    names: list[str], edges: list[tuple[str, str]], rep_fn=rep_longest_lexmax
) -> dict[str, str]:
    """name -> component representative for every name (identity if unmerged)."""
    uf = UnionFind()
    for n in names:
        uf.find(n)
    for a, b in edges:
        uf.union(a, b)
    out: dict[str, str] = {}
    for _, members in uf.components().items():
        rep = rep_fn(members)
        for m in members:
            out[m] = rep
    for n in names:
        out.setdefault(n, n)
    return out


def compose_passes(
    all_names: list[str],
    dict_targets: dict[str, str],
    fuzzy_map: dict[str, str],
    semantic_map: dict[str, str],
) -> dict[str, str]:
    """final[name] = semantic(pass1(name)); pass1 = dict hit else fuzzy rep."""
    out: dict[str, str] = {}
    for n in all_names:
        c1 = dict_targets.get(n) or fuzzy_map.get(n, n)
        out[n] = semantic_map.get(c1, c1)
    return out
