"""Property-based tests (hypothesis) for the pure kernels — coverage the
reference's unit-only suite lacks (SURVEY.md §5)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from medical_doc_knowledge_graph_system_ray.config import PipelineConfig
from medical_doc_knowledge_graph_system_ray.functions.hashing import (
    hamming64,
    simhash64,
    stable_hash64,
)
from medical_doc_knowledge_graph_system_ray.functions.textsim import (
    indel_ratio,
    token_sort_ratio,
)
from medical_doc_knowledge_graph_system_ray.functions.unionfind import uf_canonical_map
from medical_doc_knowledge_graph_system_ray.stages.chunking import (
    chunk_document,
    sliding_window,
    split_into_sections,
)

CFG = PipelineConfig()

texts = st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126),
                max_size=200)
names = st.text(alphabet="abcdefghij ", min_size=1, max_size=30)


@given(texts, texts)
@settings(max_examples=200, deadline=None)
def test_ratio_symmetric_and_bounded(a, b):
    r = token_sort_ratio(a, b)
    assert 0.0 <= r <= 100.0
    assert abs(r - token_sort_ratio(b, a)) < 1e-9


@given(texts)
@settings(max_examples=100, deadline=None)
def test_ratio_identity(a):
    assert indel_ratio(a, a) == 100.0


@given(st.text(min_size=0, max_size=3000), st.integers(50, 700), st.integers(0, 80))
@settings(max_examples=100, deadline=None)
def test_sliding_window_covers_text(text, max_chars, overlap):
    wins = sliding_window(text, max_chars, overlap)
    # windows reconstruct the text: each window matches its offset slice,
    # and the last window ends at len(text)
    for w, off in wins:
        assert text[off : off + len(w)] == w
        assert len(w) <= max(max_chars, len(text) if len(text) <= max_chars else 0) or \
            len(w) <= max_chars
    assert wins[-1][1] + len(wins[-1][0]) == len(text) or text == ""


@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126),
               max_size=2000))
@settings(max_examples=100, deadline=None)
def test_chunk_document_invariants(text):
    chunks = chunk_document("docX", text, CFG)
    ids = [c["chunk_id"] for c in chunks]
    assert len(ids) == len(set(ids))
    for c in chunks:
        assert 0 <= c["start_char"] <= c["end_char"] <= len(text)
    assert [c["seq"] for c in chunks] == list(range(len(chunks)))
    # deterministic
    again = chunk_document("docX", text, CFG)
    assert [c["chunk_id"] for c in again] == ids


@given(st.text(max_size=500))
@settings(max_examples=100, deadline=None)
def test_sections_partition_text(text):
    secs = split_into_sections(text)
    assert len(secs) >= 1
    for _label, body, start in secs:
        assert 0 <= start <= len(text)


@given(st.lists(names, min_size=1, max_size=20, unique=True))
@settings(max_examples=100, deadline=None)
def test_unionfind_idempotent_and_total(name_list):
    edges = [(name_list[i], name_list[(i + 1) % len(name_list)])
             for i in range(0, len(name_list) - 1, 2)]
    m = uf_canonical_map(name_list, edges)
    assert set(m) >= set(name_list)
    # canonical of canonical is itself
    for v in m.values():
        assert m.get(v, v) == v


@given(st.lists(st.text(alphabet="abcdef", min_size=1, max_size=8),
                min_size=1, max_size=30))
@settings(max_examples=100, deadline=None)
def test_simhash_stability(tokens):
    assert simhash64(tokens) == simhash64(list(tokens))
    assert hamming64(simhash64(tokens), simhash64(tokens)) == 0


@given(st.text(max_size=50))
@settings(max_examples=100, deadline=None)
def test_stable_hash_is_stable(s):
    assert stable_hash64(s) == stable_hash64(s)
    assert 0 <= stable_hash64(s) < 2 ** 64


# --- json_col_to_map_array: dictionary-decoded path vs naive per-row parse ---

_prop_dicts = st.dictionaries(
    st.text(alphabet="abcxyz_", min_size=1, max_size=10),
    st.text(max_size=20),
    max_size=5,
)


@given(st.lists(st.one_of(st.none(), _prop_dicts), min_size=1, max_size=40),
       st.booleans())
@settings(max_examples=100, deadline=None)
def test_json_col_to_map_array_matches_per_row_parse(dicts, chunked):
    import json as _json

    import pyarrow as pa

    from medical_doc_knowledge_graph_system_ray.schemas import (
        json_col_to_map_array,
        props_to_json,
    )

    # Repeat values so the dictionary-encode fast path actually dedups,
    # and include nulls/empty dicts (the fill_null("") -> [] branch).
    strings = [None if d is None else props_to_json(d) for d in dicts] * 2
    col = pa.chunked_array([strings[: len(dicts)], strings[len(dicts):]],
                           type=pa.string()) \
        if chunked else pa.array(strings, type=pa.string())
    out = json_col_to_map_array(col)
    assert out.type == pa.map_(pa.string(), pa.string())
    expected = []
    for v in strings:
        if not v:
            expected.append([])
        else:
            expected.append(sorted((str(k), str(val))
                                   for k, val in _json.loads(v).items()))
    assert out.to_pylist() == [
        [(k, val) for k, val in row] for row in expected]


# --- props_to_json memoization edge cases (advisor r4) ---

def test_props_to_json_unhashable_values_fall_back_to_dumps():
    import json as _json

    from medical_doc_knowledge_graph_system_ray.schemas import props_to_json

    for d in ({"dob": ["1990", "01"]}, {"nested": {"a": 1}},
              {"mix": "x", "lst": [1, 2]}):
        assert props_to_json(d) == _json.dumps(
            d, sort_keys=True, separators=(",", ":"))


def test_props_to_json_distinguishes_equal_but_differently_encoded_values():
    import json as _json

    from medical_doc_knowledge_graph_system_ray.schemas import props_to_json

    # True == 1 and 1 == 1.0, but json encodes them differently; the
    # memo key must not collide (order of calls must not matter).
    pairs = [({"a": True}, {"a": 1}), ({"a": 1}, {"a": 1.0}),
             ({"b": False}, {"b": 0})]
    for d1, d2 in pairs:
        s1, s2 = props_to_json(d1), props_to_json(d2)
        assert s1 == _json.dumps(d1, sort_keys=True, separators=(",", ":"))
        assert s2 == _json.dumps(d2, sort_keys=True, separators=(",", ":"))
        assert s1 != s2
