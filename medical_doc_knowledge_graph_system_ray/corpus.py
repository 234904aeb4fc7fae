"""Deterministic synthesis of the interleaved documents corpus.

BASELINE.json `input_hint`: one row per document,
``(doc_id: string, spans: list<struct<kind, text, media_ref, offset>>)``.
Text spans carry SOAP-note prose (section per span); media spans carry
imaging references. A fraction of documents are structured
demographics-style single-span JSON documents mirroring
/root/reference/Task_Files/demographics.json. See FIXTURES.md §1.

Every document is a pure function of (corpus_seed, patient_idx), so the
corpus can be generated distributedly (Ray tasks over patient ranges)
and is identical regardless of parallelism. Doc ids are
``{patient_number}::demo`` / ``{patient_number}::note{k}`` — the doc's
patient is its id prefix, generalizing the reference's single
demographics-threaded patient_number (pipeline.py:78,111-114) to one
patient per document group with no join needed.
"""

from __future__ import annotations

import hashlib
import json

import numpy as np
import pyarrow as pa

from .config import PipelineConfig
from . import vocab
from .schemas import DOCUMENTS_SCHEMA


def _patient_seed(corpus_seed: int, pidx: int) -> int:
    h = hashlib.blake2b(f"{corpus_seed}:{pidx}".encode(), digest_size=4).digest()
    return int.from_bytes(h, "little")


def _pick_surface(rng: np.random.RandomState, canonical: str, aliases: list[str]) -> str:
    options = [canonical, canonical.lower(), *aliases]
    return options[rng.randint(len(options))]


def _sample(rng: np.random.RandomState, pool: list[str], lo: int, hi: int) -> list[str]:
    k = rng.randint(lo, hi + 1)
    k = min(k, len(pool))
    idx = rng.choice(len(pool), size=k, replace=False)
    return [pool[i] for i in sorted(idx)]


def gen_patient_docs(pidx: int, cfg: PipelineConfig) -> list[dict]:
    """All document rows for one synthetic patient (demographics + notes)."""
    rng = np.random.RandomState(_patient_seed(cfg.corpus_seed, pidx))
    pnum = f"PT-{pidx:08d}"
    first = vocab.FIRST_NAMES[rng.randint(len(vocab.FIRST_NAMES))]
    last = vocab.LAST_NAMES[rng.randint(len(vocab.LAST_NAMES))]
    pname = f"{first} {last}"
    age = int(rng.randint(30, 91))
    sex = "M" if rng.rand() < 0.5 else "F"

    conditions = _sample(rng, list(vocab.CONDITIONS), 1, 3)
    symptoms = _sample(rng, list(vocab.SYMPTOMS), 2, 4)
    meds = _sample(rng, list(vocab.MEDICATIONS), 1, 3)
    procs = _sample(rng, list(vocab.PROCEDURES), 1, 2)
    risks = _sample(rng, list(vocab.RISK_FACTORS), 1, 2)

    docs: list[dict] = []

    if rng.rand() >= cfg.dangling_patient_prob:
        demo = {
            "patient_name": pname,
            "dob": f"{1990 - age}-{rng.randint(1, 13):02d}-{rng.randint(1, 29):02d}",
            "patient_number": pnum,
            "health_card_number": str(int(rng.randint(10**8, 10**9 - 1))),
            "phone_home": f"613-{rng.randint(100, 999)}-{rng.randint(1000, 9999)}",
            "phone_mobile": f"647-{rng.randint(100, 999)}-{rng.randint(1000, 9999)}",
            "email": f"{first.lower()}.{last.lower()}@example.com",
            "address": {
                "street": f"{rng.randint(1, 200)} {vocab.STREETS[rng.randint(len(vocab.STREETS))]}",
                "city": vocab.CITIES[rng.randint(len(vocab.CITIES))],
                "province": "ON",
                "postal_code": f"K{rng.randint(0, 10)}L {rng.randint(0, 10)}V{rng.randint(0, 10)}",
                "country": "Canada",
            },
        }
        raw = json.dumps(demo, indent=2)
        docs.append(
            {
                "doc_id": f"{pnum}::demo",
                "spans": [{"kind": "text", "text": raw, "media_ref": "", "offset": 0}],
            }
        )

    n_notes = int(rng.randint(1, 4))
    for k in range(n_notes):
        docs.append(_gen_note(rng, cfg, pnum, k, pname, age, sex,
                              conditions, symptoms, meds, procs, risks))
    return docs


def _surf(rng: np.random.RandomState, label: str, canonical: str) -> str:
    return _pick_surface(rng, canonical, vocab.LABEL_VOCAB[label][canonical])


def _gen_note(
    rng: np.random.RandomState,
    cfg: PipelineConfig,
    pnum: str,
    note_k: int,
    pname: str,
    age: int,
    sex: str,
    conditions: list[str],
    symptoms: list[str],
    meds: list[str],
    procs: list[str],
    risks: list[str],
) -> dict:
    doc_id = f"{pnum}::note{note_k}"
    serial = doc_id.replace("::", "_")

    c0 = _surf(rng, "Condition", conditions[rng.randint(len(conditions))])
    s_pool = list(symptoms)
    s0 = _surf(rng, "Symptom", s_pool[rng.randint(len(s_pool))])
    s1 = _surf(rng, "Symptom", s_pool[rng.randint(len(s_pool))])
    subj = (
        f"Subjective:\n{pname} ({age}{sex}) returns for f/u of {c0}. "
        f"Reports {s0} with exertion, episodes {rng.randint(1, 5)}x/week. "
        f"Also notes intermittent {s1}. "
        "Admits occasionally missing medication doses.\n"
    )

    sys_bp, dia_bp = int(rng.randint(105, 185)), int(rng.randint(60, 110))
    hr, rr, spo2 = int(rng.randint(55, 110)), int(rng.randint(12, 24)), int(rng.randint(90, 100))
    p0 = _surf(rng, "Procedure", procs[rng.randint(len(procs))])
    obj = (
        f"Objective:\nBP {sys_bp}/{dia_bp}, HR {hr}, RR {rr}, SpO2 {spo2}%. "
        "Appears well, no acute distress. Lungs CTA bilaterally. "
        f"Last {p0} showed nonspecific changes.\n"
    )
    if rng.rand() < 0.3:
        obj = obj[:-1] + f" Temp {36 + rng.rand() * 2:.1f} recorded at triage.\n"

    n_items = int(rng.randint(1, min(len(conditions), 4) + 1))
    items = []
    for i in range(n_items):
        cond = _surf(rng, "Condition", conditions[i % len(conditions)])
        if rng.rand() < 0.6:
            sym = _surf(rng, "Symptom", s_pool[rng.randint(len(s_pool))])
            r0 = _surf(rng, "RiskFactor", risks[rng.randint(len(risks))])
            items.append(
                f"{i + 1}. {cond} — borderline control; manifesting as {sym}. "
                f"Risk factors: {r0}."
            )
        else:
            items.append(f"{i + 1}. {cond} — stable on current therapy.")
    assess = "Assessment:\n" + "\n".join(items) + "\n"

    plan_lines = []
    m0 = _surf(rng, "Medication", meds[rng.randint(len(meds))])
    cond_for_med = _surf(rng, "Condition", conditions[rng.randint(len(conditions))])
    plan_lines.append(
        f"- Start {m0} {int(rng.choice([5, 10, 20, 40, 80]))} mg orally daily for {cond_for_med}."
    )
    if len(meds) > 1 and rng.rand() < 0.7:
        m1 = _surf(rng, "Medication", meds[rng.randint(len(meds))])
        plan_lines.append(f"- Continue {m1}; reinforce daily adherence.")
    if rng.rand() < 0.7:
        p1 = _surf(rng, "Procedure", procs[rng.randint(len(procs))])
        plan_lines.append(f"- Schedule {p1} before next visit.")
    if rng.rand() < 0.25:
        plan_lines.append("- Referred to cardiology for further evaluation.")
    plan_lines.append(f"- Follow-up in {rng.randint(1, 7)} weeks to review results.")
    plan = "Plan:\n" + "\n".join(plan_lines) + "\n"

    # assemble interleaved spans; media spans sit between text spans and
    # occupy no characters of the reassembled text
    spans: list[dict] = []
    offset = 0
    for si, sec_text in enumerate([subj, obj, assess, plan]):
        body = sec_text + "\n"
        spans.append({"kind": "text", "text": body, "media_ref": "", "offset": offset})
        offset += len(body)
        if si == 1 and rng.rand() < cfg.media_span_prob:
            mk = vocab.MEDIA_KINDS[rng.randint(len(vocab.MEDIA_KINDS))]
            spans.append(
                {"kind": "media", "text": "", "media_ref": f"imaging/{mk}_{serial}.png",
                 "offset": offset}
            )
    return {"doc_id": doc_id, "spans": spans}


def patients_to_table(pidx_list: list[int], cfg: PipelineConfig) -> pa.Table:
    rows = []
    for pidx in pidx_list:
        rows.extend(gen_patient_docs(int(pidx), cfg))
    return pa.Table.from_pylist(rows, schema=DOCUMENTS_SCHEMA)


def reassemble_text(spans: list[dict]) -> str:
    """Reassembled document text = concatenated text spans (media spans are
    zero-width, mirroring the reference reading a plain text file)."""
    return "".join(s["text"] for s in spans if s["kind"] == "text")


def synthesize_corpus_table(n_patients: int, cfg: PipelineConfig) -> pa.Table:
    """Driver-side generation (small scales / tests)."""
    return patients_to_table(list(range(n_patients)), cfg)


def synthesize_corpus_parquet(n_patients: int, path: str, cfg: PipelineConfig,
                              use_ray: bool = True) -> str:
    """Generate the corpus to a parquet directory; distributed when Ray is up.

    Cached: if ``path`` already contains a matching _CORPUS_META.json the
    existing corpus is reused.
    """
    import os

    meta_path = os.path.join(path, "_CORPUS_META.json")
    meta = {"n_patients": n_patients, "seed": cfg.corpus_seed,
            "media_span_prob": cfg.media_span_prob,
            "dangling_patient_prob": cfg.dangling_patient_prob, "version": 3}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            if json.load(f) == meta:
                return path
        import shutil
        shutil.rmtree(path)
    os.makedirs(path, exist_ok=True)

    import ray

    if use_ray and ray.is_initialized() and n_patients >= 256:
        import ray.data as rd

        def gen_batch(batch: pa.Table) -> pa.Table:
            return patients_to_table(batch.column("id").to_pylist(), cfg)

        (
            rd.range(n_patients)
            .repartition(max(8, n_patients // 2000))
            .map_batches(gen_batch, batch_format="pyarrow", batch_size=2000)
            .write_parquet(path)
        )
    else:
        import pyarrow.parquet as pq

        table = synthesize_corpus_table(n_patients, cfg)
        pq.write_table(table, os.path.join(path, "part-0.parquet"))
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    return path
