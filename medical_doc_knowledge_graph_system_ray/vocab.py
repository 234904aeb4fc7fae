"""Clinical vocabulary: the deterministic stand-in for the reference's LLM.

The reference extracts entities with Claude, constrained by a closed
label set and an abbreviation-expansion prompt
(/root/reference/app/ingestion/extractor.py:26-135), then resolves
variants through a 19-entry synonym map
(/root/reference/app/ingestion/entity_resolver.py:20-40). For offline
reproducibility (SURVEY.md §7.0) the engine replaces the LLM with a
dictionary/rule extractor over this vocabulary; the synonym map below is
a superset of the reference's, extended to cover the synthetic corpus
(the "generated alias table" of SURVEY.md §2.3 A3).

Every surface form maps to exactly one (label, canonical). A vocab
self-test (tests/test_resolution.py) asserts the resolution passes keep
distinct canonicals distinct and collapse every alias onto its
canonical.
"""

from __future__ import annotations

# ── reference synonym map (entity_resolver.py:20-40), lowercase key → canonical ──
REFERENCE_SYNONYMS: dict[str, str] = {
    "htn": "Hypertension",
    "high blood pressure": "Hypertension",
    "bp": "Blood Pressure",
    "hr": "Heart Rate",
    "rr": "Respiratory Rate",
    "spo2": "Oxygen Saturation",
    "sob": "Shortness of Breath",
    "mi": "Myocardial Infarction",
    "heart attack": "Myocardial Infarction",
    "gerd": "Gastroesophageal Reflux Disease",
    "acid reflux": "Gastroesophageal Reflux Disease",
    "ecg": "Electrocardiogram",
    "ekg": "Electrocardiogram",
    "le edema": "Lower Extremity Edema",
    "ntg": "Nitroglycerin",
    "nitroglycerin sl": "Nitroglycerin Sublingual",
    "f/u": "Follow-up",
    "cta": "Clear to Auscultation",
    "rrr": "Regular Rate and Rhythm",
}

# ── entity vocabulary: canonical → (label, aliases) ─────────────────────
# aliases are surface forms the corpus generator may emit; the canonical
# itself (and its lowercase variant) are always candidate surfaces too.
CONDITIONS: dict[str, list[str]] = {
    "Hypertension": ["HTN", "high blood pressure"],
    "Myocardial Infarction": ["MI", "heart attack"],
    "Gastroesophageal Reflux Disease": ["GERD", "acid reflux"],
    "Stable Angina": [],
    "Hyperlipidemia": [],
    "Type 2 Diabetes Mellitus": ["T2DM"],
    "Atrial Fibrillation": ["AFib"],
    "Congestive Heart Failure": ["CHF"],
    "Chronic Kidney Disease": ["CKD"],
    "Chronic Obstructive Pulmonary Disease": ["COPD"],
    "Asthma": [],
    "Hypothyroidism": [],
    "Osteoarthritis": [],
    "Pneumonia": [],
    "Migraine": [],
    "Iron Deficiency Anemia": ["IDA"],
}

SYMPTOMS: dict[str, list[str]] = {
    "Chest Tightness": [],
    "Shortness of Breath": ["SOB"],
    "Palpitations": [],
    "Dizziness": [],
    "Nausea": [],
    "Fatigue": [],
    "Headache": [],
    "Lower Extremity Edema": ["LE edema"],
    "Wheezing": [],
    "Diaphoresis": [],
    "Syncope": [],
    "Dry Cough": [],
    "Joint Stiffness": [],
    "Heartburn": [],
}

MEDICATIONS: dict[str, list[str]] = {
    "Nitroglycerin": ["NTG"],
    # NOTE: no "nitroglycerin SL" alias — that surface token-sort-fuzzy-matches
    # "Nitroglycerin" at 89.7 >= 88, which in the reference OVERWRITES the
    # synonym-dict assignment for the alias (entity_resolver.py:117-125 runs
    # dict-hit names as `other`), an order-sensitive corner the blocked
    # union-find deliberately does not reproduce (SURVEY.md §7.5).
    "Nitroglycerin Sublingual": [],
    "Lisinopril": [],
    "Metformin": [],
    "Atorvastatin": [],
    "Amlodipine": [],
    "Aspirin": ["ASA"],
    "Albuterol": [],
    "Levothyroxine": [],
    "Omeprazole": [],
    "Furosemide": ["Lasix"],
    "Warfarin": [],
    "Metoprolol": [],
    "Sumatriptan": [],
}

PROCEDURES: dict[str, list[str]] = {
    "Electrocardiogram": ["ECG", "EKG"],
    "Myocardial Perfusion Scan": ["perfusion scan"],
    "Fasting Lipid Panel": ["lipid panel"],
    "Echocardiogram": [],
    "Chest X-Ray": ["CXR"],
    "Treadmill Stress Test": ["stress test"],
    "Pulmonary Function Test": ["PFT"],
    "Hemoglobin A1c Test": ["HbA1c"],
    "Colonoscopy": [],
    "Renal Ultrasound": [],
}

RISK_FACTORS: dict[str, list[str]] = {
    "Family History": ["family hx"],
    "Smoking": ["tobacco use"],
    "Obesity": [],
    "Sedentary Lifestyle": [],
    "Alcohol Use": ["EtOH use"],
    "Advanced Age": [],
}

# ── vitals: matched by regex, not by alias (a bare "BP" in prose is not a
#    vital reading; reference Vital rows always carry value+unit,
#    graph_writer.py:235-241) ─────────────────────────────────────────────
VITALS: dict[str, tuple[str, str]] = {
    # surface abbrev -> (canonical type name, unit)
    "BP": ("Blood Pressure", "mmHg"),
    "HR": ("Heart Rate", "bpm"),
    "RR": ("Respiratory Rate", "/min"),
    "SpO2": ("Oxygen Saturation", "%"),
    "Temp": ("Temperature", "C"),
}

LABEL_VOCAB: dict[str, dict[str, list[str]]] = {
    "Condition": CONDITIONS,
    "Symptom": SYMPTOMS,
    "Medication": MEDICATIONS,
    "Procedure": PROCEDURES,
    "RiskFactor": RISK_FACTORS,
}


def build_alias_table() -> dict[str, tuple[str, str]]:
    """lowercase surface -> (label, canonical). Includes canonicals themselves."""
    table: dict[str, tuple[str, str]] = {}
    for label, entries in LABEL_VOCAB.items():
        for canonical, aliases in entries.items():
            for surface in [canonical, *aliases]:
                low = surface.lower()
                prev = table.get(low)
                assert prev is None or prev == (label, canonical), (
                    f"surface collision: {low!r} -> {prev} vs {(label, canonical)}"
                )
                table[low] = (label, canonical)
    return table


def build_synonym_map() -> dict[str, str]:
    """The resolution dictionary: reference synonyms + generated aliases
    (lowercase surface -> canonical name)."""
    syn = dict(REFERENCE_SYNONYMS)
    for entries in LABEL_VOCAB.values():
        for canonical, aliases in entries.items():
            for a in aliases:
                syn.setdefault(a.lower(), canonical)
    for abbrev, (canonical, _unit) in VITALS.items():
        syn.setdefault(abbrev.lower(), canonical)
    return syn


ALIAS_TABLE = build_alias_table()
SYNONYM_MAP = build_synonym_map()

# name pools for synthetic patients (distinct enough that fuzzy >= 88
# cross-matches between different names are rare)
FIRST_NAMES = [
    "Peter", "Maria", "Chinwe", "Ravi", "Yuki", "Omar", "Ingrid", "Tomas",
    "Amara", "Dmitri", "Leila", "Hassan", "Priya", "Marcus", "Sofia", "Kwame",
    "Elena", "Bjorn", "Nadia", "Diego", "Fatima", "Oliver", "Zainab", "Henrik",
]
LAST_NAMES = [
    "Fern", "Okafor", "Tanaka", "Petrov", "Alvarez", "Johansson", "Mbeki",
    "Rossi", "Nakamura", "Haddad", "Kovacs", "Osei", "Lindqvist", "Moreau",
    "Castillo", "Novak", "Ibrahim", "Svensson", "Duarte", "Karimi", "Walsh",
    "Fontaine", "Adeyemi", "Larsson",
]
CITIES = ["Toronto", "Ottawa", "Kingston", "Hamilton", "London", "Windsor"]
STREETS = ["Maple Ave", "Oak St", "Elm Dr", "Birch Rd", "Cedar Ln", "Pine Ct"]
MEDIA_KINDS = ["ecg", "perfusion", "cxr", "echo"]
