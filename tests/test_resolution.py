"""Resolution semantics: synonym map, fuzzy kernel, union-find reps, and
vocab safety (no unintended cross-canonical merges)."""

from __future__ import annotations

from medical_doc_knowledge_graph_system_ray import vocab
from medical_doc_knowledge_graph_system_ray.config import PipelineConfig
from medical_doc_knowledge_graph_system_ray.functions.textsim import token_sort_ratio
from medical_doc_knowledge_graph_system_ray.functions.unionfind import (
    rep_longest_lexmax,
    rep_longest_lexmin,
    uf_canonical_map,
)
from medical_doc_knowledge_graph_system_ray.pipelines.oracle import oracle_build_name_map
from medical_doc_knowledge_graph_system_ray.stages.resolution import build_name_map

CFG = PipelineConfig()


def test_synonym_spot_checks():
    # mirrors /root/reference/tests/test_ingestion.py:124-129
    assert vocab.SYNONYM_MAP["htn"] == "Hypertension"
    assert vocab.SYNONYM_MAP["sob"] == "Shortness of Breath"
    assert vocab.SYNONYM_MAP["mi"] == "Myocardial Infarction"
    assert vocab.SYNONYM_MAP["gerd"] == "Gastroesophageal Reflux Disease"


def test_token_sort_ratio_basics():
    assert token_sort_ratio("hypertension", "hypertension") == 100.0
    assert token_sort_ratio("fern peter", "peter fern") == 100.0  # token sort
    assert token_sort_ratio("abc", "xyz") < 30
    # indel definition: 2*LCS/(m+n)
    assert abs(token_sort_ratio("nitroglycerin", "nitroglycerin sl") - 200 * 13 / 29) < 1e-9


def test_rep_rules():
    assert rep_longest_lexmax(["abc", "abd"]) == "abd"
    assert rep_longest_lexmin(["abc", "abd"]) == "abc"
    assert rep_longest_lexmax(["short", "longer name"]) == "longer name"


def test_uf_transitive():
    m = uf_canonical_map(["a", "b", "c", "d"], [("a", "b"), ("b", "c")])
    assert m["a"] == m["b"] == m["c"]
    assert m["d"] == "d"


def test_alias_surfaces_resolve_to_canonical():
    """Every alias and case variant must land on one canonical per concept,
    and distinct canonicals must stay distinct — on BOTH resolvers."""
    surfaces: list[str] = []
    intended: dict[str, str] = {}
    for entries in vocab.LABEL_VOCAB.values():
        for canonical, aliases in entries.items():
            for s in [canonical, canonical.lower(), *aliases]:
                surfaces.append(s)
                intended[s] = canonical
    for name_map in (
        build_name_map(surfaces, CFG),
        oracle_build_name_map(surfaces, CFG),
    ):
        groups: dict[str, set[str]] = {}
        for s in surfaces:
            groups.setdefault(intended[s], set()).add(name_map[s])
        # each concept collapses to exactly one canonical
        for canon, got in groups.items():
            assert len(got) == 1, f"{canon} split into {got}"
        # distinct concepts stay distinct
        reps = {next(iter(v)) for v in groups.values()}
        assert len(reps) == len(groups), "distinct canonicals merged"


def test_pipeline_matches_oracle_on_vocab_plus_patients():
    surfaces = set()
    for entries in vocab.LABEL_VOCAB.values():
        for canonical, aliases in entries.items():
            surfaces.update([canonical, canonical.lower(), *aliases])
    for f in vocab.FIRST_NAMES:
        for l in vocab.LAST_NAMES[:8]:
            surfaces.add(f"{f} {l}")
    surfaces = sorted(surfaces)
    om = oracle_build_name_map(surfaces, CFG)
    pm = build_name_map(surfaces, CFG)
    diffs = [s for s in surfaces if om[s] != pm[s]]
    # fuzzy-chain corners on patient names are tolerated (SURVEY.md §7.5);
    # they never reach entities/triples (Patient keys are patient numbers)
    assert len(diffs) / len(surfaces) < 0.02, diffs[:10]
