"""Dictionary/rule NER + relation extraction as an actor-pool map_batches stage.

Replaces the reference's per-chunk Claude tool_use extraction
(/root/reference/app/ingestion/extractor.py:138-180) with a
deterministic alias-dictionary + rule scorer (SURVEY.md §7.0), keeping
the semantics: closed label/predicate enums, per-chunk envelope,
confidence in [0,1], per-chunk fault isolation (a failing chunk yields
an empty result, extractor.py:153-155), per-chunk (name,label)
max-confidence dedup (entity_resolver.py:70-82), and the structured
demographics path (pipeline.py:46-79 → Patient mention with the 12-key
property projection of chunker.py:165-181).

Stateful per actor: the alias alternation regex, vitals regexes and rule
tables are compiled once in ``__init__`` (the A2/A3 analog of SURVEY.md
§2.3); ``__call__`` processes one Arrow batch of chunks.

Output is ONE combined Arrow table ("extraction" rows) with a ``kind``
column ('m' mention / 't' raw triple) so the expensive stage runs once
and both downstream tables are cheap filtered reads.
"""

from __future__ import annotations

import json
import re

import pyarrow as pa

from ..config import PipelineConfig
from ..schemas import props_to_json
from .. import vocab

EXTRACTION_SCHEMA = pa.schema(
    [
        ("kind", pa.string()),          # 'm' | 't'
        ("chunk_id", pa.string()),
        ("doc_id", pa.string()),
        ("order_key", pa.string()),     # deterministic global write order
        # mention fields
        ("name", pa.string()),
        ("label", pa.string()),
        ("method", pa.string()),
        # triple fields
        ("subj", pa.string()),
        ("subj_label", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("obj_label", pa.string()),
        # shared
        ("confidence", pa.float32()),
        ("props", pa.string()),         # canonical JSON
    ]
)

# label -> patient-side predicate (graph_writer.py:57-66)
_PATIENT_PRED = {
    "Condition": "HAS_CONDITION",
    "Symptom": "EXHIBITS_SYMPTOM",
    "Medication": "TAKES_MEDICATION",
    "Vital": "HAS_VITAL",
    "RiskFactor": "HAS_RISK_FACTOR",
    "Procedure": "SCHEDULED_FOR",
}

_VITAL_PATTERNS = [
    ("BP", re.compile(r"(?<![A-Za-z0-9])BP\s+(\d{2,3}/\d{2,3})")),
    ("HR", re.compile(r"(?<![A-Za-z0-9])HR\s+(\d{2,3})(?![\d/])")),
    ("RR", re.compile(r"(?<![A-Za-z0-9])RR\s+(\d{1,2})(?![\d/])")),
    ("SpO2", re.compile(r"(?<![A-Za-z0-9])SpO2\s+(\d{2,3})%")),
    ("Temp", re.compile(r"(?<![A-Za-z0-9])Temp\s+(\d{2}(?:\.\d)?)")),
]

_PATIENT_PROSE_RE = re.compile(r"([A-Z][a-z]+ [A-Z][a-z]+) \((\d{2,3})([MF])\)")
_DOSAGE_RE = re.compile(r"\s+(\d+)\s*mg\b")
_REFERRAL_RE = re.compile(r"referred to cardiology", re.IGNORECASE)


def _conf(label: str, section: str) -> float:
    if label == "Condition":
        return 0.9 if section == "Assessment" else 0.8
    if label == "Symptom":
        return 0.85
    if label == "Medication":
        return 0.9 if section == "Plan" else 0.8
    if label == "Procedure":
        return 0.85
    if label == "RiskFactor":
        return 0.75
    if label == "Vital":
        return 0.95
    return 0.9


def build_alias_regex() -> re.Pattern:
    surfaces = sorted(vocab.ALIAS_TABLE, key=len, reverse=True)
    alts = "|".join(re.escape(s) for s in surfaces)
    return re.compile(rf"(?<![A-Za-z0-9])({alts})(?![A-Za-z0-9])", re.IGNORECASE)


def parse_demographics(data: dict) -> dict:
    """Flatten demographics JSON — same 12-key projection as chunker.py:165-181."""
    address = data.get("address", {})
    return {
        "patient_number": data.get("patient_number", ""),
        "name": data.get("patient_name", ""),
        "dob": data.get("dob", ""),
        "health_card": data.get("health_card_number", ""),
        "phone_home": data.get("phone_home", ""),
        "phone_mobile": data.get("phone_mobile", ""),
        "email": data.get("email", ""),
        "address_street": address.get("street", ""),
        "address_city": address.get("city", ""),
        "address_province": address.get("province", ""),
        "address_postal": address.get("postal_code", ""),
        "address_country": address.get("country", ""),
    }


class RuleExtractor:
    """Compile-once extraction rules. Used directly by the oracle and
    wrapped by ExtractorActor for the Ray actor pool."""

    def __init__(self):
        self.alias_re = build_alias_regex()
        self.alias_table = vocab.ALIAS_TABLE

    # ── per-chunk extraction ──────────────────────────────────────────
    def extract_chunk(
        self,
        chunk_id: str,
        doc_id: str,
        patient_number: str,
        section: str,
        seq: int,
        text: str,
    ) -> list[dict]:
        """Combined mention + raw-triple rows for one chunk (scan order)."""
        if not text.strip():
            return []  # empty-chunk filter (extractor.py:176-177)
        if section == "Demographics":
            return self._extract_demographics(chunk_id, doc_id, seq, text)

        rows: list[dict] = []
        mentions: list[tuple[int, str, str, str, dict]] = []  # (start, surface, label, canonical, props)

        for m in self.alias_re.finditer(text):
            surface = m.group(1)
            hit = self.alias_table.get(surface.lower())
            if hit is None:
                continue
            label, _canonical = hit
            props: dict = {}
            if label == "Medication":
                dm = _DOSAGE_RE.match(text, m.end())
                if dm:
                    props["dosage"] = f"{dm.group(1)} mg"
            mentions.append((m.start(), surface, label, _canonical, props))

        for abbrev, pat in _VITAL_PATTERNS:
            for m in pat.finditer(text):
                _canon, unit = vocab.VITALS[abbrev]
                mentions.append(
                    (m.start(), abbrev, "Vital", _canon, {"value": m.group(1), "unit": unit})
                )

        pm = _PATIENT_PROSE_RE.search(text)
        if pm:
            mentions.append((pm.start(), pm.group(1), "Patient", pm.group(1), {}))

        mentions.sort(key=lambda t: (t[0], t[1]))

        base = f"{doc_id}|{seq:05d}"
        for j, (_start, surface, label, _canon, props) in enumerate(mentions):
            rows.append(
                {
                    "kind": "m",
                    "chunk_id": chunk_id,
                    "doc_id": doc_id,
                    "order_key": f"{base}|{j:04d}",
                    "name": surface,
                    "label": label,
                    "method": "dict_rule",
                    "subj": "", "subj_label": "", "pred": "", "obj": "", "obj_label": "",
                    "confidence": _conf(label, section),
                    "props": props_to_json(props),
                }
            )

        rows.extend(
            self._triples_for_chunk(chunk_id, doc_id, patient_number, section, seq, text, mentions)
        )
        return rows

    def _triples_for_chunk(self, chunk_id, doc_id, patient_number, section, seq, text, mentions):
        rows: list[dict] = []
        base = f"{doc_id}|{seq:05d}"

        def add_triple(j, subj, subj_label, pred, obj, obj_label, confidence, props):
            rows.append(
                {
                    "kind": "t",
                    "chunk_id": chunk_id,
                    "doc_id": doc_id,
                    "order_key": f"{base}|t{j:04d}",
                    "name": "", "label": "", "method": "",
                    "subj": subj, "subj_label": subj_label, "pred": pred,
                    "obj": obj, "obj_label": obj_label,
                    "confidence": confidence,
                    "props": props_to_json(props),
                }
            )

        j = 0
        # patient-side predicates: every non-Patient mention links to the
        # doc's patient (generalized J3, graph_writer.py:258-260)
        for _start, surface, label, _canon, props in mentions:
            pred = _PATIENT_PRED.get(label)
            if pred is None:
                continue
            tprops = {"value": props["value"]} if label == "Vital" else {}
            add_triple(j, patient_number, "Patient", pred, surface, label,
                       _conf(label, section), tprops)
            j += 1

        # MANIFESTS_AS: condition x symptom co-occurrence in Assessment chunks
        if section == "Assessment":
            conds = [m for m in mentions if m[2] == "Condition"]
            syms = [m for m in mentions if m[2] == "Symptom"]
            for _cs, c_surf, _cl, _cc, _cp in conds:
                for _ss, s_surf, _sl, _sc, _sp in syms:
                    add_triple(j, c_surf, "Condition", "MANIFESTS_AS", s_surf, "Symptom", 0.8, {})
                    j += 1

        # TREATED_WITH: condition x medication within the same text line
        for line_start, line in _iter_lines(text):
            line_end = line_start + len(line)
            in_line = [m for m in mentions if line_start <= m[0] < line_end]
            conds = [m for m in in_line if m[2] == "Condition"]
            meds = [m for m in in_line if m[2] == "Medication"]
            for _cs, c_surf, _cl, _cc, _cp in conds:
                for _ms, m_surf, _ml, _mc, _mp in meds:
                    add_triple(j, c_surf, "Condition", "TREATED_WITH", m_surf, "Medication", 0.85, {})
                    j += 1

        # dangling-endpoint exercise: relationship-only phrase whose target
        # never becomes an entity -> dropped by the endpoint anti-join,
        # matching MATCH-then-MERGE silently writing nothing (queries.py:118-170)
        if _REFERRAL_RE.search(text):
            add_triple(j, patient_number, "Patient", "SCHEDULED_FOR",
                       "Cardiology Referral", "Procedure", 0.7, {})
            j += 1
        return rows

    def _extract_demographics(self, chunk_id, doc_id, seq, text) -> list[dict]:
        try:
            data = json.loads(text)
        except (json.JSONDecodeError, ValueError):
            return []  # per-chunk fault isolation
        flat = parse_demographics(data)
        return [
            {
                "kind": "m",
                "chunk_id": chunk_id,
                "doc_id": doc_id,
                "order_key": f"{doc_id}|{seq:05d}|{0:04d}",
                "name": flat["name"],
                "label": "Patient",
                "method": "structured_json",
                "subj": "", "subj_label": "", "pred": "", "obj": "", "obj_label": "",
                "confidence": 1.0,
                "props": props_to_json(flat),
            }
        ]

    def extract_batch(self, batch: pa.Table) -> pa.Table:
        out: list[dict] = []
        cols = [
            batch.column(c).to_pylist()
            for c in ("chunk_id", "doc_id", "patient_number", "section", "seq", "text")
        ]
        for chunk_id, doc_id, pnum, section, seq, text in zip(*cols):
            out.extend(self.extract_chunk(chunk_id, doc_id, pnum, section, seq, text))
        return pa.Table.from_pylist(out, schema=EXTRACTION_SCHEMA)


def _iter_lines(text: str):
    start = 0
    for m in re.finditer(r"\n", text):
        yield start, text[start : m.start()]
        start = m.end()
    if start <= len(text):
        yield start, text[start:]


class ExtractorActor:
    """Callable class for map_batches(ExtractorActor, concurrency=N):
    rules compiled once per actor in __init__, batches in __call__.

    This remains the documented actor-pool seam for a model-backed
    extractor (load the model in __init__, set num_gpus on the pool);
    the deterministic rule extractor itself is also reachable through
    worker_extractor() for flat-task stages."""

    def __init__(self, cfg: PipelineConfig | None = None):
        self.extractor = RuleExtractor()

    def __call__(self, batch: pa.Table) -> pa.Table:
        return self.extractor.extract_batch(batch)


# worker-global compile-once extractor: Ray tasks reuse warm worker
# processes, so this gives flat tasks the same amortized-setup property
# as an actor pool (regex/alias tables compiled once per worker, not
# once per task) without pinning any CPU to a pool
_WORKER_EXTRACTOR: list[RuleExtractor] = []


def worker_extractor() -> RuleExtractor:
    if not _WORKER_EXTRACTOR:
        _WORKER_EXTRACTOR.append(RuleExtractor())
    return _WORKER_EXTRACTOR[0]
