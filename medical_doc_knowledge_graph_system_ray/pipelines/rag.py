"""Graph-RAG / vector-RAG query paths and the evaluation harness
(SURVEY.md §2.9 R1-R4, §2.10 E1-E5, §2.5 G7-G8).

The reference calls Claude for generation and judging; there is no
network here, so generation is a deterministic extractive answerer
(rank context sentences by ngram-embedding cosine against the question)
behind the same ``generate(system, messages)`` seam the reference uses
(app/rag/llm_client.py:54-78) — swap in a real client at deployment.
Everything around it (retrieval split, timing, per-question fault
isolation, mean/std-ddof1 aggregates, markdown report) mirrors the
reference's behavior.
"""

from __future__ import annotations

import re
import time
from dataclasses import dataclass

import numpy as np

from ..config import PipelineConfig
from ..functions.embedder import NgramEmbedder
from . import queryside as qs
from .context import build_context, format_context_for_prompt, \
    rerank_context_bundle


class DeterministicGenerator:
    """Extractive stand-in for the LLM: answer = top-scoring context
    sentences. Deterministic, offline, swappable for a real client."""

    def __init__(self, dim: int = 384):
        self.emb = NgramEmbedder(dim)

    def generate(self, system: str, question: str, context: str) -> str:
        sentences = [s.strip() for s in re.split(r"(?<=[.!?])\s+|\n", context)
                     if len(s.strip()) > 20]
        if not sentences:
            return "No supporting context found."
        qv = self.emb.embed_batch([question])[0]
        sv = self.emb.embed_batch(sentences)
        order = np.argsort(-(sv @ qv), kind="stable")[:3]
        return " ".join(sentences[i] for i in sorted(order.tolist()))


@dataclass
class QueryResponse:
    question: str
    strategy: str
    answer: str
    citations: list
    retrieval_time_ms: float
    generation_time_ms: float


def graph_rag_query(out_dir: str, question: str, top_k: int = 5,
                    cfg: PipelineConfig | None = None) -> QueryResponse:
    """R1: Q7 -> Q8 -> M11 -> generate, with retrieval/generation timing
    split (app/rag/graph_rag.py:43-85)."""
    t0 = time.time()
    bundle = build_context(out_dir, question, top_k=top_k, cfg=cfg)
    bundle = rerank_context_bundle(bundle, question, cfg=cfg)
    prompt_ctx = format_context_for_prompt(bundle)
    t_retrieval = (time.time() - t0) * 1000
    t0 = time.time()
    answer = DeterministicGenerator().generate("medical QA", question, prompt_ctx)
    return QueryResponse(question, "graph", answer, bundle.citations,
                         round(t_retrieval, 2), round((time.time() - t0) * 1000, 2))


def vector_rag_query(out_dir: str, question: str, top_k: int = 5,
                     cfg: PipelineConfig | None = None) -> QueryResponse:
    """R2: pure chunk-similarity retrieval -> generate, pseudo-citations
    from the chunks (app/rag/vector_rag.py:48-112)."""
    cfg = cfg or PipelineConfig()
    t0 = time.time()
    seeds = qs.entity_first_retrieval(out_dir, question, top_k=top_k, threshold=0.0,
                                      cfg=cfg).to_pylist()
    chunk_ids = []
    for s in seeds:
        if s["chunk_id"] not in chunk_ids:
            chunk_ids.append(s["chunk_id"])
    import pyarrow.compute as pc

    texts = []
    if chunk_ids:
        import pyarrow as pa

        rows = qs._read(out_dir, "chunks", columns=["chunk_id", "text"],
                        filter_expr=pc.field("chunk_id").isin(pa.array(chunk_ids))
                        ).take_all()
        by_id = {r["chunk_id"]: r["text"] for r in rows}
        texts = [by_id[c] for c in chunk_ids if c in by_id]
    t_retrieval = (time.time() - t0) * 1000
    t0 = time.time()
    answer = DeterministicGenerator().generate("medical QA", question,
                                               "\n".join(texts[:top_k]))
    citations = [{"entity_name": "", "source_text": t, "section": "", "source_file": "",
                  "confidence": 0.0, "extraction_method": "vector"} for t in texts[:top_k]]
    return QueryResponse(question, "vector", answer, citations,
                         round(t_retrieval, 2), round((time.time() - t0) * 1000, 2))


def both_strategies(out_dir: str, question: str, **kw) -> dict:
    """R4: run both, concat answers (app/main.py:157-169)."""
    g = graph_rag_query(out_dir, question, **kw)
    v = vector_rag_query(out_dir, question, **kw)
    return {"graph": g, "vector": v, "answer": f"{g.answer}\n---\n{v.answer}"}


# ── evaluation (E1-E5, G7, G8) ────────────────────────────────────────

GOLD_QUESTIONS = [
    # E1 analog: 11 questions across the reference's five categories
    # (app/evaluation/questions.py:9-111)
    {"q": "What conditions does the patient have?", "cat": "single_hop",
     "expect_labels": ["Condition"]},
    {"q": "What symptoms are documented in the notes?", "cat": "single_hop",
     "expect_labels": ["Symptom"]},
    {"q": "Which procedures are scheduled for the patient?", "cat": "single_hop",
     "expect_labels": ["Procedure"]},
    {"q": "Which medications treat hypertension?", "cat": "relationship",
     "expect_labels": ["Medication", "Condition"]},
    {"q": "Which conditions manifest as dizziness or fatigue?", "cat": "relationship",
     "expect_labels": ["Condition", "Symptom"]},
    {"q": "Why does the patient report shortness of breath?", "cat": "multi_hop",
     "expect_labels": ["Symptom"]},
    {"q": "How do the medications relate to the documented conditions?",
     "cat": "multi_hop", "expect_labels": ["Medication", "Condition"]},
    {"q": "Where is the evidence for the hypertension diagnosis?", "cat": "provenance",
     "expect_labels": ["Condition"]},
    {"q": "Which note section records the blood pressure reading?", "cat": "provenance",
     "expect_labels": ["Vital"]},
    {"q": "Compare the risk factors and vital signs recorded.", "cat": "cross_reference",
     "expect_labels": ["RiskFactor", "Vital"]},
    {"q": "Compare the conditions against the prescribed medications.",
     "cat": "cross_reference", "expect_labels": ["Condition", "Medication"]},
]


def _citation_accuracy(citations: list, expected_terms: list[str]) -> float:
    """G8: fraction of citations overlapping expected terms by entity name
    or >4-char word (app/evaluation/metrics.py:146-169)."""
    if not citations:
        return 0.0
    exp_words = {w.lower() for t in expected_terms for w in t.split() if len(w) > 4}
    hits = 0
    for c in citations:
        name_hit = any(t.lower() in str(c.get("entity_name", "")).lower()
                       for t in expected_terms)
        word_hit = any(w in str(c.get("source_text", "")).lower() for w in exp_words)
        hits += 1 if (name_hit or word_hit) else 0
    return hits / len(citations)


def _heuristic_scores(resp: QueryResponse, expected_terms: list[str]) -> dict:
    """Deterministic judge stand-in (E2/E3): term coverage + cosine blend."""
    emb = NgramEmbedder(128)
    ans = resp.answer.lower()
    covered = sum(1 for t in expected_terms if t.lower() in ans)
    coverage = covered / max(len(expected_terms), 1)
    qv = emb.embed_batch([resp.question])[0]
    av = emb.embed_batch([resp.answer])[0]
    cos = float(qv @ av)
    return {
        "faithfulness": round(min(1.0, 0.5 + 0.5 * coverage), 4),
        "context_precision": round(min(1.0, len(resp.citations) / 5), 4),
        "context_recall": round(coverage, 4),
        # E3: 70/30 blend of judge score and embedding cosine
        "answer_correctness": round(0.7 * coverage + 0.3 * max(cos, 0.0), 4),
        "citation_accuracy": round(_citation_accuracy(resp.citations, expected_terms), 4),
    }


def _mean_std(values: list[float]) -> tuple[float, float]:
    """G7: mean + Bessel-corrected std (harness.py:129-190)."""
    n = len(values)
    mean = sum(values) / n if n else 0.0
    if n < 2:
        return round(mean, 4), 0.0
    var = sum((v - mean) ** 2 for v in values) / (n - 1)
    return round(mean, 4), round(var ** 0.5, 4)


def run_evaluation(out_dir: str, cfg: PipelineConfig | None = None,
                   questions: list | None = None) -> dict:
    """E4: each question x {vector, graph}, per-question fault isolation
    (zero-score record on failure), per-strategy aggregates. The KG
    tables are materialized into the object store once for the whole
    bank (queryside.cached_tables) — dozens of traversals reuse the
    blocks instead of re-reading parquet per question."""
    from .queryside import cached_tables

    with cached_tables(out_dir):
        records = _run_evaluation_records(out_dir, cfg, questions)
    aggregates = {}
    for strategy in ("vector", "graph"):
        sub = [r for r in records if r["strategy"] == strategy]
        agg = {}
        for metric in sub[0]["scores"]:
            mean, std = _mean_std([r["scores"][metric] for r in sub])
            agg[metric] = {"mean": mean, "std_dev": std}
        aggregates[strategy] = {"n": len(sub), **agg}
    return {"records": records, "aggregates": aggregates,
            "summary": generate_report(records, aggregates)}


def _run_evaluation_records(out_dir, cfg, questions) -> list[dict]:
    records = []
    for gold in (questions if questions is not None else GOLD_QUESTIONS):
        expected_terms = _expected_terms(out_dir, gold)
        for strategy, fn in (("vector", vector_rag_query), ("graph", graph_rag_query)):
            try:
                resp = fn(out_dir, gold["q"], cfg=cfg)
                scores = _heuristic_scores(resp, expected_terms)
            except Exception as exc:  # zero-score record (harness.py:69-71)
                resp = QueryResponse(gold["q"], strategy, f"ERROR: {exc}", [], 0, 0)
                scores = {k: 0.0 for k in ("faithfulness", "context_precision",
                                           "context_recall", "answer_correctness",
                                           "citation_accuracy")}
            records.append({"question": gold["q"], "category": gold["cat"],
                            "strategy": strategy, "answer": resp.answer,
                            "scores": scores,
                            "retrieval_time_ms": resp.retrieval_time_ms,
                            "generation_time_ms": resp.generation_time_ms})
    return records


def _expected_terms(out_dir: str, gold: dict) -> list[str]:
    """Gold terms = actual entity keys of the expected labels (the synthetic
    corpus defines ground truth)."""
    import os

    import pyarrow as pa
    import pyarrow.dataset as pads

    # pruned projected + label-filtered scan (no whole-table driver read)
    dset = pads.dataset(os.path.join(out_dir, "entities"), format="parquet")
    t = dset.to_table(columns=["key"],
                      filter=pads.field("label").isin(list(gold["expect_labels"])))
    return sorted(set(t.column("key").to_pylist()))[:10]


def generate_report(records: list, aggregates: dict) -> str:
    """E5: markdown comparison report (app/evaluation/report.py:11-99)."""
    lines = ["# Evaluation Report", "", "| strategy | metric | mean | std |",
             "|---|---|---|---|"]
    for strategy, agg in aggregates.items():
        for metric, v in agg.items():
            if metric == "n":
                continue
            lines.append(f"| {strategy} | {metric} | {v['mean']} | {v['std_dev']} |")
    lines.append("")
    lines.append(f"{len(records)} records evaluated.")
    return "\n".join(lines)
