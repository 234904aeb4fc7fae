"""Canonical remap + MERGE-semantics dedup + final table materialization.

Implements, Ray-Data-first, the write-side semantics of the reference:

* canonical-name remap of mentions and triple endpoints
  (entity_resolver.py:146-165) — broadcast name map (ray.put once, read
  per actor), applied vectorized per batch;
* per-chunk (canonical_name, label) max-confidence mention dedup
  (entity_resolver.py:70-82);
* global entity dedup on (label, key) with first-writer-wins properties
  (Neo4j MERGE ON CREATE, queries.py:59-114; constraint keys
  schema_setup.py:18-28 — Vital key = "{type}_{value}"
  graph_writer.py:237, Patient key = patient_number);
* triple endpoint resolution with dangling-endpoint drop (MATCH-then-
  MERGE writing nothing, graph_writer.py:183-195) as a broadcast
  semi-join, and (subj, pred, obj) dedup with max confidence + min
  witness chunk_id (deterministic stand-in for MERGE's last-write,
  FIXTURES.md §5);
* per-batch partial reduction (combiner) ahead of every global groupby
  so the shuffle moves one row per key per batch, not every mention.
"""

from __future__ import annotations

import json

import pyarrow as pa
import pyarrow.compute as pc

from ..config import PipelineConfig
from ..functions.hashing import entity_id
from ..schemas import props_to_json

# ── remap + mention dedup ──────────────────────────────────────────────


def remap_mentions_batch(batch: pa.Table, name_map: dict[str, str]) -> pa.Table:
    """kind=='m' rows -> mention rows with canonical_name; chunk-local
    (canonical, label) max-confidence dedup.

    Chunk-locality: extraction emits each chunk's rows contiguously and no
    shuffle sits between extraction and this stage, so a batch never holds
    a partial chunk except at block-split boundaries (rare, dup-safe: the
    e2e check is on the deduped key set)."""
    m = batch.filter(pc.equal(batch.column("kind"), "m"))
    if m.num_rows == 0:
        return pa.Table.from_pylist([], schema=_MENTION_FLAT_SCHEMA)
    names = m.column("name").to_pylist()
    canon = [name_map.get(n, n) for n in names]

    best: dict[tuple, int] = {}
    chunk_ids = m.column("chunk_id").to_pylist()
    labels = m.column("label").to_pylist()
    confs = m.column("confidence").to_pylist()
    orders = m.column("order_key").to_pylist()
    for i in range(m.num_rows):
        key = (chunk_ids[i], canon[i], labels[i])
        j = best.get(key)
        # keep max confidence; ties -> first in order (reference keeps the
        # earlier mention on ties: `if e.confidence > seen[key]`)
        if j is None or confs[i] > confs[j] or (confs[i] == confs[j] and orders[i] < orders[j]):
            best[key] = i
    keep = sorted(best.values())
    m = m.take(pa.array(keep, type=pa.int64()))
    canon_kept = [canon[i] for i in keep]
    out = pa.table(
        {
            "mention_id": pc.binary_join_element_wise(
                m.column("chunk_id"), m.column("order_key"), "#"
            ),
            "chunk_id": m.column("chunk_id"),
            "doc_id": m.column("doc_id"),
            "name": m.column("name"),
            "canonical_name": pa.array(canon_kept, type=pa.string()),
            "label": m.column("label"),
            "confidence": m.column("confidence"),
            "extraction_method": m.column("method"),
            "properties": m.column("props"),
            "order_key": m.column("order_key"),
        }
    )
    return out


_MENTION_FLAT_SCHEMA = pa.schema(
    [
        ("mention_id", pa.string()),
        ("chunk_id", pa.string()),
        ("doc_id", pa.string()),
        ("name", pa.string()),
        ("canonical_name", pa.string()),
        ("label", pa.string()),
        ("confidence", pa.float32()),
        ("extraction_method", pa.string()),
        ("properties", pa.string()),  # JSON in flight; map<string,string> at final write
        ("order_key", pa.string()),
    ]
)

# ── entities ───────────────────────────────────────────────────────────


def project_entity_props(label: str, canonical: str, props: dict) -> tuple[str, dict]:
    """(key, projected properties) — the per-label projections of
    graph_writer.py:204-248 with their defaults."""
    if label == "Condition":
        return canonical, {"status": props.get("status", "active"),
                           "severity": props.get("severity", "")}
    if label == "Symptom":
        return canonical, {k: props.get(k, "") for k in
                           ("description", "frequency", "duration", "quality")}
    if label == "Medication":
        return canonical, {k: props.get(k, "") for k in ("dosage", "route", "instruction")}
    if label == "Procedure":
        return canonical, {"type": props.get("type", ""), "status": props.get("status", "")}
    if label == "Vital":
        value = props.get("value", "")
        return f"{canonical}_{value}", {"type": canonical, "value": value,
                                        "unit": props.get("unit", "")}
    if label == "RiskFactor":
        return canonical, {"source": props.get("source", "patient")}
    if label == "Patient":
        return props.get("patient_number", canonical), props
    return canonical, dict(props)


def entity_candidates_batch(batch: pa.Table) -> pa.Table:
    """Mention rows -> entity candidate rows, with a per-batch partial
    first-writer reduce (combiner) on (label, key)."""
    rows: dict[tuple, dict] = {}
    cols = {c: batch.column(c).to_pylist()
            for c in ("canonical_name", "label", "confidence", "properties",
                      "order_key", "extraction_method")}
    for canon, label, _conf, props_json, order, method in zip(
        cols["canonical_name"], cols["label"], cols["confidence"],
        cols["properties"], cols["order_key"], cols["extraction_method"],
    ):
        if label == "Patient" and method != "structured_json":
            continue  # prose Patient mentions never become entities (graph_writer.py:146-147)
        props = json.loads(props_json) if props_json else {}
        key, projected = project_entity_props(label, canon, props)
        k = (label, key)
        prev = rows.get(k)
        if prev is None or order < prev["order_key"]:
            rows[k] = {"label": label, "key": key,
                       "properties": props_to_json(projected), "order_key": order}
    return pa.Table.from_pylist(list(rows.values()), schema=_ENTITY_CAND_SCHEMA)


_ENTITY_CAND_SCHEMA = pa.schema(
    [
        ("label", pa.string()),
        ("key", pa.string()),
        ("properties", pa.string()),
        ("order_key", pa.string()),
    ]
)


def entity_reduce_group(group: pa.Table) -> pa.Table:
    """Global first-writer-wins per (label, key)."""
    idx = pc.sort_indices(group, sort_keys=[("order_key", "ascending")])[0].as_py()
    row = group.slice(idx, 1)
    eid = entity_id(row.column("label")[0].as_py(), row.column("key")[0].as_py())
    return pa.table(
        {
            "entity_id": pa.array([eid]),
            "label": row.column("label"),
            "key": row.column("key"),
            "properties": row.column("properties"),
        }
    )


def entity_finalize_partition(t: pa.Table) -> pa.Table:
    """Vectorized per-partition first-writer-wins reduce.

    Valid because the partitioned write buckets on `key`, so every
    candidate row of a given (label, key) lands in the same partition —
    the per-group reduce collapses to one table-level sort + drop-dup
    instead of a Python call per group (the map_groups path is ~50x
    slower at 10^5 groups)."""
    if t.num_rows == 0:
        return pa.table({"entity_id": pa.array([], type=pa.string()),
                         "label": pa.array([], type=pa.string()),
                         "key": pa.array([], type=pa.string()),
                         "properties": pa.array([], type=pa.string())})
    df = t.select(["label", "key", "properties", "order_key"]).to_pandas()
    df = df.sort_values("order_key", kind="stable").drop_duplicates(
        subset=["label", "key"], keep="first"
    )
    eids = [entity_id(l, k) for l, k in zip(df["label"], df["key"])]
    return pa.table({
        "entity_id": pa.array(eids, type=pa.string()),
        "label": pa.array(df["label"].tolist(), type=pa.string()),
        "key": pa.array(df["key"].tolist(), type=pa.string()),
        "properties": pa.array(df["properties"].tolist(), type=pa.string()),
    })


def triple_finalize_partition(t: pa.Table) -> pa.Table:
    """Vectorized per-partition (subj, pred, obj) reduce: max confidence,
    min witness chunk_id. Valid because the write buckets on `subj`."""
    if t.num_rows == 0:
        return t
    agg = t.group_by(["subj", "pred", "obj"], use_threads=False).aggregate(
        [("confidence", "max"), ("chunk_id", "min"),
         ("subj_label", "min"), ("obj_label", "min")]
    )
    return pa.table({
        "subj": agg.column("subj"),
        "subj_label": agg.column("subj_label_min"),
        "pred": agg.column("pred"),
        "obj": agg.column("obj"),
        "obj_label": agg.column("obj_label_min"),
        "confidence": agg.column("confidence_max"),
        "chunk_id": agg.column("chunk_id_min"),
    })


# ── triples ────────────────────────────────────────────────────────────


def remap_triples_batch(
    batch: pa.Table, name_map: dict[str, str], entity_keys: set[tuple[str, str]]
) -> pa.Table:
    """kind=='t' rows -> resolved triple rows; dangling endpoints dropped;
    per-batch partial (subj, pred, obj) reduce (max conf, min chunk_id)."""
    t = batch.filter(pc.equal(batch.column("kind"), "t"))
    if t.num_rows == 0:
        return pa.Table.from_pylist([], schema=_TRIPLE_FLAT_SCHEMA)
    cols = {c: t.column(c).to_pylist()
            for c in ("subj", "subj_label", "pred", "obj", "obj_label",
                      "confidence", "props", "chunk_id")}
    best: dict[tuple, dict] = {}
    for subj, sl, pred, obj, ol, conf, props_json, chunk_id in zip(
        cols["subj"], cols["subj_label"], cols["pred"], cols["obj"],
        cols["obj_label"], cols["confidence"], cols["props"], cols["chunk_id"],
    ):
        subj_c = subj if sl == "Patient" else name_map.get(subj, subj)
        obj_c = obj if ol == "Patient" else name_map.get(obj, obj)
        if ol == "Vital":
            props = json.loads(props_json) if props_json else {}
            obj_c = f"{obj_c}_{props.get('value', '')}"  # vital_id (graph_writer.py:270)
        if (sl, subj_c) not in entity_keys or (ol, obj_c) not in entity_keys:
            continue  # dangling endpoint -> silent drop (J2)
        k = (subj_c, pred, obj_c)
        prev = best.get(k)
        if prev is None:
            best[k] = {"subj": subj_c, "subj_label": sl, "pred": pred, "obj": obj_c,
                       "obj_label": ol, "confidence": conf, "chunk_id": chunk_id}
        else:
            if conf > prev["confidence"]:
                prev["confidence"] = conf
            if chunk_id < prev["chunk_id"]:
                prev["chunk_id"] = chunk_id
    return pa.Table.from_pylist(list(best.values()), schema=_TRIPLE_FLAT_SCHEMA)


_TRIPLE_FLAT_SCHEMA = pa.schema(
    [
        ("subj", pa.string()),
        ("subj_label", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("obj_label", pa.string()),
        ("confidence", pa.float32()),
        ("chunk_id", pa.string()),
    ]
)


def triple_reduce_group(group: pa.Table) -> pa.Table:
    """Global (subj, pred, obj) reduce: max confidence, min witness chunk."""
    conf = pc.max(group.column("confidence")).as_py()
    chunk = pc.min(group.column("chunk_id")).as_py()
    return pa.table(
        {
            "subj": group.column("subj").slice(0, 1),
            "subj_label": group.column("subj_label").slice(0, 1),
            "pred": group.column("pred").slice(0, 1),
            "obj": group.column("obj").slice(0, 1),
            "obj_label": group.column("obj_label").slice(0, 1),
            "confidence": pa.array([conf], type=pa.float32()),
            "chunk_id": pa.array([chunk]),
        }
    )


# worker-global broadcast cache: ray.put once on the driver, ray.get +
# deserialize once per worker process (NOT per batch/task), regardless of
# whether the stage runs as tasks or actors
_BCAST: dict[str, object] = {}


def fetch_broadcast(ref):
    import ray

    key = ref.hex() if hasattr(ref, "hex") else str(ref)
    if key not in _BCAST:
        if len(_BCAST) > 16:
            _BCAST.clear()
        _BCAST[key] = ray.get(ref)
    return _BCAST[key]


def make_remap_mentions_fn(name_map_ref, cfg: PipelineConfig):
    """Stage factory: plain-function map_batches (stateless tasks reuse warm
    Ray workers; the broadcast map is fetched once per worker)."""

    def remap_mentions(batch: pa.Table) -> pa.Table:
        return remap_mentions_batch(batch, fetch_broadcast(name_map_ref))

    return remap_mentions


def make_remap_triples_fn(name_map_ref, entity_keys_ref, cfg: PipelineConfig):
    def remap_triples(batch: pa.Table) -> pa.Table:
        return remap_triples_batch(
            batch, fetch_broadcast(name_map_ref), fetch_broadcast(entity_keys_ref)
        )

    return remap_triples
