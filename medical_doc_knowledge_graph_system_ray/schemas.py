"""Arrow schemas for every logical table (FIXTURES.md §1-§5).

The reference keeps these shapes as Pydantic models
(/root/reference/app/models/schema.py:60-97) and as Neo4j node/edge
property sets (/root/reference/app/graph/queries.py:9-181). Here each
logical table is a columnar ``pyarrow.Schema``; one ``ray.data.Dataset``
per table.

`properties` travels through the pipeline as a JSON string column (cheap
to carry through shuffles / pandas conversions) and is written to the
final parquet as `map<string,string>` to match FIXTURES.md.
"""

from __future__ import annotations

import json

import pyarrow as pa

# closed enums (reference: app/models/schema.py:16-45)
SOAP_SECTIONS = ("Subjective", "Objective", "Assessment", "Plan", "Demographics")
ENTITY_LABELS = (
    "Patient", "Condition", "Symptom", "Medication", "Procedure", "Vital", "RiskFactor",
)
CLINICAL_PREDICATES = (
    "HAS_CONDITION", "EXHIBITS_SYMPTOM", "TAKES_MEDICATION", "MANIFESTS_AS",
    "TREATED_WITH", "HAS_VITAL", "HAS_RISK_FACTOR", "SCHEDULED_FOR",
)
# labels counting as "clinically relevant" for the Q3 path constraint
# (reference: app/retrieval/relationship_filter.py:29-31)
CLINICAL_LABELS = (
    "Condition", "Medication", "Symptom", "Vital", "RiskFactor", "Procedure",
)
# patient-side predicates carry the doc's patient as subject
# (reference: graph_writer.py:258-260)
PATIENT_PREDICATES = (
    "HAS_CONDITION", "EXHIBITS_SYMPTOM", "TAKES_MEDICATION", "HAS_VITAL",
    "HAS_RISK_FACTOR", "SCHEDULED_FOR",
)

SPAN_STRUCT = pa.struct(
    [
        ("kind", pa.string()),       # "text" | "media"
        ("text", pa.string()),       # prose for text spans; "" for media
        ("media_ref", pa.string()),  # "" for text spans
        ("offset", pa.int32()),      # char offset in the reassembled document
    ]
)

DOCUMENTS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", pa.list_(SPAN_STRUCT)),
    ]
)

# flat per-span provenance table; preserves the per-row span-sequence
# invariant (kind, text, media_ref, order) required by BASELINE.json
SPANS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("span_seq", pa.int32()),
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)

CHUNKS_SCHEMA = pa.schema(
    [
        ("chunk_id", pa.string()),      # sha256(f"{doc_id}::{section}::{idx}")[:16]
        ("doc_id", pa.string()),
        ("patient_number", pa.string()),
        ("section", pa.string()),
        ("seq", pa.int32()),            # per-doc emission order (replaces (:SourceChunk)-[:NEXT]->)
        ("start_char", pa.int32()),
        ("end_char", pa.int32()),
        ("text", pa.string()),
    ]
)

MENTIONS_SCHEMA = pa.schema(
    [
        ("mention_id", pa.string()),
        ("chunk_id", pa.string()),
        ("doc_id", pa.string()),
        ("name", pa.string()),            # raw surface form
        ("canonical_name", pa.string()),  # post-canonicalization
        ("label", pa.string()),
        ("confidence", pa.float32()),
        ("extraction_method", pa.string()),
        ("properties", pa.map_(pa.string(), pa.string())),
        ("order_key", pa.string()),       # deterministic global write order
    ]
)

ENTITIES_SCHEMA = pa.schema(
    [
        ("entity_id", pa.string()),
        ("label", pa.string()),
        ("key", pa.string()),             # canonical name / vital_id / patient_number
        ("properties", pa.map_(pa.string(), pa.string())),
    ]
)

TRIPLES_SCHEMA = pa.schema(
    [
        ("subj", pa.string()),
        ("subj_label", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("obj_label", pa.string()),
        ("confidence", pa.float32()),
        ("chunk_id", pa.string()),        # min chunk_id among contributors
    ]
)


_PROPS_JSON_CACHE: dict[tuple, str] = {}


def props_to_json(d: dict) -> str:
    """Canonical JSON encoding (sorted keys) for the in-flight properties
    column. Memoized on the items tuple: property dicts come from a
    closed vocabulary and repeat heavily (json.dumps was 27% of the
    extractor kernel at ~133k calls per 20k chunks); the cache is
    worker-global and bounded."""
    try:
        # Type names in the key keep ==-but-distinct encodings apart
        # (True vs 1, 1 vs 1.0 — json.dumps renders them differently);
        # the cache probe itself hashes the values, so unhashable values
        # (lists, nested dicts) raise HERE and fall through to dumps.
        key = tuple(sorted((k, type(v).__name__, v) for k, v in d.items()))
        s = _PROPS_JSON_CACHE.get(key)
    except TypeError:  # unhashable or unorderable value — rare path
        return json.dumps(d, sort_keys=True, separators=(",", ":"))
    if s is None:
        s = json.dumps(d, sort_keys=True, separators=(",", ":"))
        if len(_PROPS_JSON_CACHE) < 100_000:
            _PROPS_JSON_CACHE[key] = s
    return s


def json_col_to_map_array(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Convert a JSON-string properties column to map<string,string> for
    final writes. Property strings come from a closed vocabulary and
    repeat heavily (~6k distinct per 100k rows in the bench corpus), so
    parse each DISTINCT string once via dictionary encoding and expand
    with a vectorized take — ~10x cheaper than a per-row json.loads,
    and this runs inside every partition write task."""
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    enc = pc.fill_null(col, "").dictionary_encode()
    parsed = []
    for v in enc.dictionary.to_pylist():
        if not v:
            parsed.append([])
        else:
            d = json.loads(v)
            parsed.append(sorted((str(k), str(val)) for k, val in d.items()))
    uniq = pa.array(parsed, type=pa.map_(pa.string(), pa.string()))
    return uniq.take(enc.indices)
