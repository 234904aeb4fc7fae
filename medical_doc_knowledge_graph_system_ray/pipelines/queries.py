"""Named query/pipeline library backing ``__ray_entry__.queries()``.

Two families:

* ``kg_*`` — the knowledge-graph construction path over the synthesized
  interleaved-span corpus (BASELINE.json input_hint). The corpus and the
  full ingest run are cached per scale under /tmp so the per-query
  callables are cheap reads of the materialized tables. Non-SQL (the
  driver records rows-only checks; the real gate is the oracle pytest).
* testdata-backed operators over /root/testdata parquet (documents,
  embeddings, events, TPC-H-ish tables) — each paired with a DuckDB
  oracle in ``oracle_sql()``; column names match exactly.

None of these call ray.init()/ray.shutdown() — the caller owns the Ray
session (driver contract).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data as rd

from ..config import PipelineConfig
from ..corpus import synthesize_corpus_parquet
from .ingest import IngestPipeline

# scale tag -> synthetic patient count (docs ~= 3.5x patients)
_SF_PATIENTS = {"sf0.001": 40, "sf0.01": 150, "sf0.1": 1200}
_DEFAULT_PATIENTS = 150


def _sf_tag(sf_dir: str) -> str:
    return os.path.basename(os.path.normpath(sf_dir)) or "sfx"


def kg_config(num_patients: int) -> PipelineConfig:
    # 32 output partitions: downstream read/write parallelism is capped by
    # the partition-file count, so it must be >= the core count (and at
    # multi-node scale, a multiple of the cluster's total cores)
    return PipelineConfig(
        num_shards=8,
        num_output_partitions=32,
        extract_concurrency=8,
        # vector-column story on by default: the crc32-token FastTokenEmbedder
        # (cfg.chunk_embedder="fast") makes the chunk embedding column cheap
        # enough to carry in the bench; a real deployment swaps the kernel
        # for a GPU model in ChunkEmbedder.__init__.
        embed_chunks=True,
    )


def _cfg_tag(cfg: PipelineConfig) -> str:
    """Cache key component: a config change must invalidate the /tmp cache
    (a stale cached run would otherwise short-circuit via its manifest)."""
    import dataclasses
    import hashlib
    import json as _json

    blob = _json.dumps(dataclasses.asdict(cfg), sort_keys=True, default=str)
    return hashlib.blake2b(blob.encode(), digest_size=4).hexdigest()


def ensure_kg_output(sf_dir: str, scratch: str = "/tmp/medkg") -> IngestPipeline:
    """Synthesize the interleaved corpus for this scale (cached) and run the
    ingest pipeline (resumable; a completed run is a no-op)."""
    tag = _sf_tag(sf_dir)
    n = _SF_PATIENTS.get(tag, _DEFAULT_PATIENTS)
    cfg = kg_config(n)
    ctag = _cfg_tag(cfg)
    corpus_dir = os.path.join(scratch, "corpus", f"{tag}-{n}-{ctag}")
    synthesize_corpus_parquet(n, corpus_dir, cfg)
    out_dir = os.path.join(scratch, "out", f"{tag}-{n}-{ctag}")
    pipe = IngestPipeline(corpus_dir, cfg, output_dir=out_dir)
    if not pipe.manifest.is_committed("summary"):
        pipe.run()
    return pipe


# ── kg_* queries (rows-only checks) ────────────────────────────────────

def q_kg_triples(sf_dir: str):
    return ensure_kg_output(sf_dir).read_table("triples")


def q_kg_entities(sf_dir: str):
    t = ensure_kg_output(sf_dir).read_table("entities")
    return t.select(["entity_id", "label", "key"])  # map col dropped for the check


def q_kg_mentions(sf_dir: str):
    t = ensure_kg_output(sf_dir).read_table("mentions")
    return t.select(["mention_id", "chunk_id", "doc_id", "name", "canonical_name",
                     "label", "confidence", "extraction_method"])


def q_kg_chunks(sf_dir: str):
    return ensure_kg_output(sf_dir).read_table("chunks")


def q_kg_spans(sf_dir: str):
    return ensure_kg_output(sf_dir).read_table("spans")


def q_kg_stats(sf_dir: str):
    pipe = ensure_kg_output(sf_dir)
    stats = pipe.graph_stats()
    rows = [{"label": k, "n": v} for k, v in sorted(stats["entities_by_label"].items())]
    rows.append({"label": "__triples__", "n": stats["triples"]})
    return pa.Table.from_pylist(rows)


def q_kg_chunk_embeddings(sf_dir: str):
    """A1 analog: chunk embedding via the actor-pool embedder stage."""
    from ..stages.embedding import embed_chunks

    pipe = ensure_kg_output(sf_dir)
    ds = embed_chunks(
        rd.read_parquet(os.path.join(pipe.out, "chunks"), columns=["chunk_id", "text"]),
        pipe.cfg,
    )

    def norms(batch: pa.Table) -> pa.Table:
        # zero-copy list flatten + reshape (no per-row Python loop)
        flat = batch.column("embedding").combine_chunks().flatten()
        embs = np.asarray(flat, dtype=np.float32).reshape(batch.num_rows, -1)
        return pa.table({
            "chunk_id": batch.column("chunk_id"),
            "embedding_norm": pa.array(np.round(np.linalg.norm(embs, axis=1), 4)),
        })

    return ds.map_batches(norms, batch_format="pyarrow").to_pandas()


def _entity_keys(pipe, label: str, k: int) -> list[str]:
    """First k entity keys of a label via a pruned projected+filtered scan
    (key column only, label predicate pushed to the parquet read), then a
    distributed sort().limit(k) — the driver receives exactly k keys,
    never the label's full key column (VERDICT r3 #5)."""
    ds = rd.read_parquet(os.path.join(pipe.out, "entities"), columns=["key"],
                         filter=pc.field("label") == label)
    return [r["key"] for r in ds.sort("key").limit(k).take_all()]


def q_kg_khop(sf_dir: str):
    """Q2: 2-hop neighborhoods of the first 3 patients."""
    from .queryside import expand_k_hop

    pipe = ensure_kg_output(sf_dir)
    pats = _entity_keys(pipe, "Patient", 3)
    out = []
    for p in pats:
        t = expand_k_hop(pipe.out, [p], hops=2, limit=100)
        for r in t.to_pylist():
            out.append({"seed": p, **r})
    return pa.Table.from_pylist(out)


def q_kg_citations(sf_dir: str):
    """J5: provenance citations for the 5 most-mentioned conditions."""
    from .queryside import citations

    pipe = ensure_kg_output(sf_dir)
    conds = _entity_keys(pipe, "Condition", 5)
    return citations(pipe.out, conds, limit=100)


def q_kg_entity_first(sf_dir: str):
    """Q1: embed query -> top-k chunks -> seed entities."""
    from .queryside import entity_first_retrieval

    pipe = ensure_kg_output(sf_dir)
    return entity_first_retrieval(pipe.out, "hypertension blood pressure control",
                                  top_k=5, threshold=0.0)


def q_kg_condition_chains(sf_dir: str):
    """Q4: condition -> medications/symptoms chains for the first 3 patients."""
    from .queryside import condition_chains

    pipe = ensure_kg_output(sf_dir)
    pats = _entity_keys(pipe, "Patient", 3)
    rows = []
    for p in pats:
        for r in condition_chains(pipe.out, p).to_pylist():
            rows.append({"patient": p, "condition": r["condition"],
                         "n_medications": len(r["medications"]),
                         "n_symptoms": len(r["symptoms"])})
    return pa.Table.from_pylist(rows)


def q_kg_paths(sf_dir: str):
    """Q5/Q3: path reasoning — all paths (<=4 hops, LIMIT 5), shortest
    path, seeds->target shortest paths (<=5 hops, LIMIT 5), and the
    relationship-constrained clinical paths (<=3 hops, LIMIT 20) between
    the first patients and the first condition. Deterministic rows-only
    check (graph traversal is not SQL-expressible over the edge list)."""
    from .queryside import (all_paths, find_paths_from_seeds,
                            relationship_constrained_paths,
                            shortest_path_detailed)

    pipe = ensure_kg_output(sf_dir)
    pats = _entity_keys(pipe, "Patient", 2)
    conds = _entity_keys(pipe, "Condition", 1)
    rows = []
    if pats and conds:
        seed, target = pats[0], conds[0]
        for p in all_paths(pipe.out, seed, target, max_hops=4, max_paths=5):
            rows.append({"kind": "all_paths", "seed": seed, "target": target,
                         "entity_chain": " -> ".join(p["entity_chain"]),
                         "rel_chain": " -> ".join(p["relationship_chain"]),
                         "hops": p["hops"]})
        sp = shortest_path_detailed(pipe.out, seed, target)
        if sp:
            rows.append({"kind": "shortest", "seed": seed, "target": target,
                         "entity_chain": " -> ".join(sp["entity_chain"]),
                         "rel_chain": " -> ".join(sp["relationship_chain"]),
                         "hops": sp["hops"]})
        for p in find_paths_from_seeds(pipe.out, pats, target,
                                       max_hops=5, limit=5):
            rows.append({"kind": "from_seeds", "seed": p["seed_name"],
                         "target": target,
                         "entity_chain": " -> ".join(p["entity_chain"]),
                         "rel_chain": " -> ".join(p["relationship_chain"]),
                         "hops": p["hops"]})
        for r in relationship_constrained_paths(
                pipe.out, [seed], max_hops=3, limit=20).to_pylist():
            rows.append({"kind": "constrained", "seed": seed,
                         "target": r["target"],
                         "entity_chain": " -> ".join(r["node_chain"]),
                         "rel_chain": " -> ".join(r["rel_chain"]),
                         "hops": r["hops"]})
    return pa.Table.from_pylist(rows, schema=pa.schema(
        [("kind", pa.string()), ("seed", pa.string()), ("target", pa.string()),
         ("entity_chain", pa.string()), ("rel_chain", pa.string()),
         ("hops", pa.int32())]))


def q_kg_full_trace(sf_dir: str):
    """J6: citations + keyed NEXT-chunk text for the first 3 conditions."""
    from .queryside import full_trace

    pipe = ensure_kg_output(sf_dir)
    conds = _entity_keys(pipe, "Condition", 3)
    t = full_trace(pipe.out, conds, limit=50)
    if t.num_rows == 0:
        return t
    return t.select(["entity_name", "source_file", "chunk_id", "seq",
                     "confidence", "next_text"])


def q_kg_explore(sf_dir: str):
    """/graph/explore analog: nodes AND edges of the first patient's
    2-hop neighborhood, as one table (kind = node|edge)."""
    from .queryside import explore

    pipe = ensure_kg_output(sf_dir)
    pats = _entity_keys(pipe, "Patient", 1)
    d = explore(pipe.out, pats[0], hops=2, limit=50)
    rows = [{"kind": "node", "a": n["key"], "b": "", "pred": "",
             "hops": n["hops"]} for n in d["nodes"]]
    rows += [{"kind": "edge", "a": e["subj"], "b": e["obj"],
              "pred": e["pred"], "hops": -1} for e in d["edges"]]
    return pa.Table.from_pylist(rows, schema=pa.schema(
        [("kind", pa.string()), ("a", pa.string()), ("b", pa.string()),
         ("pred", pa.string()), ("hops", pa.int32())]))


def q_kg_context(sf_dir: str):
    """Q7/Q8: the full context-assembly + rerank composition for one
    complex question, flattened to (section, item) rows."""
    from .context import build_context, rerank_context_bundle

    pipe = ensure_kg_output(sf_dir)
    q = "how are the patient conditions and medications related"
    bundle = rerank_context_bundle(build_context(pipe.out, q), q)
    rows = [{"section": "seed", "item": s["entity"]} for s in bundle.seed_entities]
    rows += [{"section": "node", "item": n["key"]} for n in bundle.neighborhood_nodes]
    rows += [{"section": "edge", "item": f"{e['subj']}|{e['pred']}|{e['obj']}"}
             for e in bundle.neighborhood_edges]
    rows += [{"section": "path", "item": " -> ".join(p)}
             for p in bundle.reasoning_paths]
    rows += [{"section": "citation", "item": c["chunk_id"]}
             for c in bundle.citations]
    rows.append({"section": "complexity", "item": bundle.complexity})
    return pa.Table.from_pylist(rows, schema=pa.schema(
        [("section", pa.string()), ("item", pa.string())]))


def q_kg_evaluation(sf_dir: str):
    """E4: the evaluation harness aggregates as a table, over the FULL
    11-question gold bank x 2 strategies (reference harness.py:29-121;
    the r2 one-per-category subset is gone — the shared-subgraph path
    collection made the full bank affordable in the driver)."""
    from .rag import run_evaluation

    pipe = ensure_kg_output(sf_dir)
    report = run_evaluation(pipe.out)
    rows = []
    for strategy, agg in report["aggregates"].items():
        for metric, v in agg.items():
            if metric == "n":
                continue
            rows.append({"strategy": strategy, "metric": metric,
                         "mean": v["mean"], "std_dev": v["std_dev"]})
    return pa.Table.from_pylist(rows)


def q_kg_media_features(sf_dir: str):
    """Multimodal plumbing: media spans -> payload table -> featurizer pool."""
    from ..stages.multimodal import MediaFeaturizer, media_rows_from_spans

    pipe = ensure_kg_output(sf_dir)
    ds = (
        rd.read_parquet(pipe.docs_path)
        .map_batches(media_rows_from_spans, batch_format="pyarrow")
        .map_batches(MediaFeaturizer, batch_format="pyarrow", batch_size=64,
                     concurrency=(1, 4))
    )
    return ds.select_columns(
        ["media_ref", "doc_id", "media_type", "decoded_w", "decoded_h"]
    ).to_pandas()


# ── testdata-backed queries (DuckDB oracles) ───────────────────────────

def _docs(sf_dir: str, columns=None):
    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=columns)


def q_doc_token_counts(sf_dir: str):
    from ..stages.text_analysis import token_count_batch

    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        token_count_batch, batch_format="pyarrow"
    )
    return ds.select_columns(["doc_id", "n_tokens"]).to_pandas()


def q_doc_piece_counts(sf_dir: str):
    """BPE-ish subword piece count (letters / digit-runs / punct marks)."""
    from ..stages.text_analysis import token_count_batch

    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        token_count_batch, batch_format="pyarrow"
    )
    return ds.select_columns(["doc_id", "n_pieces"]).to_pandas()


def q_lang_counts(sf_dir: str):
    out = (
        _docs(sf_dir, ["lang"])
        .groupby("lang")
        .count()
        .rename_columns({"count()": "n"})
        .to_pandas()
    )
    return out.sort_values("lang").reset_index(drop=True)


def q_exact_dedup_docs(sf_dir: str):
    from ..stages.dedup import exact_dedup

    out = exact_dedup(_docs(sf_dir, ["doc_id", "text"])).to_pandas()
    return out[["doc_id", "text"]].sort_values("doc_id").reset_index(drop=True)


def q_doc_char_stats(sf_dir: str):
    def stats(batch: pa.Table) -> pa.Table:
        import re

        # ASCII \w to match DuckDB's RE2 semantics on non-ASCII text
        punct_re = re.compile(r"[^\w\s]", re.ASCII)
        texts = batch.column("text").to_pylist()
        n_chars = [len(t) for t in texts]
        n_punct = [len(punct_re.findall(t)) for t in texts]
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_chars": pa.array(n_chars, type=pa.int64()),
            "n_punct": pa.array(n_punct, type=pa.int64()),
        })

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        stats, batch_format="pyarrow"
    ).to_pandas()


def q_top_users_by_value(sf_dir: str):
    from ..stages.aggregates import preagg_sum_count

    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["user_id", "value"])
    out = preagg_sum_count(ds, ["user_id"], ["value"], "n_events").to_pandas()
    out = out.rename(columns={"value": "total_value"})
    out["total_value"] = out["total_value"].round(4)
    out = out.sort_values(["total_value", "user_id"],
                          ascending=[False, True]).head(10)
    return out[["user_id", "total_value", "n_events"]].reset_index(drop=True)


def q_events_hourly(sf_dir: str):
    from ..stages.aggregates import preagg_sum_count

    def add_hour(batch: pa.Table) -> pa.Table:
        # Arrow-native hour floor — no pandas conversion in the hot stage
        return pa.table({
            "hour": pc.floor_temporal(batch.column("ts"), unit="hour"),
            "event_type": batch.column("event_type"),
            "value": batch.column("value"),
        })

    ds = (
        rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                        columns=["ts", "event_type", "value"])
        .map_batches(add_hour, batch_format="pyarrow")
    )
    out = preagg_sum_count(ds, ["hour", "event_type"], ["value"], "n").to_pandas()
    out = out.rename(columns={"value": "total"})
    out["total"] = out["total"].round(4)
    return out[["hour", "event_type", "n", "total"]].sort_values(
        ["hour", "event_type"]).reset_index(drop=True)


def q_event_sessions(sf_dir: str):
    """Session windows (gap 30 min) per user over the events log."""
    from ..stages.windows import sessionize

    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_id", "ts", "user_id", "value"])
    out = sessionize(ds, gap_seconds=1800.0).to_pandas()
    return out.sort_values(["user_id", "session_idx"]).reset_index(drop=True)


def q_events_asof_signup(sf_dir: str):
    """As-of join: each 'error' event matched to the user's most recent
    prior 'signup' event."""
    from ..stages.windows import asof_join_per_user

    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_id", "ts", "user_id", "event_type"])
    out = asof_join_per_user(ds).to_pandas()
    out["asof_event_id"] = out["asof_event_id"].astype("float64")
    return out.sort_values("event_id").reset_index(drop=True)


def q_events_sliding_3h(sf_dir: str):
    """Sliding 3-hour event-time window over hourly totals (§2.7)."""
    from ..stages.windows import sliding_hourly_totals

    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["ts", "value"])
    return sliding_hourly_totals(ds, window_hours=3)


def q_top_users_per_event_type(sf_dir: str):
    """Grouped top-k: top 3 users by total value per event type."""
    from ..stages.windows import grouped_topk

    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_type", "user_id", "value"])
    out = grouped_topk(ds, "event_type", "user_id", "value", k=3).to_pandas()
    out["rk"] = out["rk"].astype("int64")
    return out.sort_values(["event_type", "rk"]).reset_index(drop=True)


def q_error_or_signup_users(sf_dir: str):
    """Set op: union of two filtered event streams, distinct user ids
    (ds.union + unique — SURVEY.md §2.7)."""
    path = os.path.join(sf_dir, "events.parquet")

    def typed(t):
        return rd.read_parquet(path, columns=["user_id", "event_type"]).map_batches(
            lambda b, t=t: b.filter(pc.equal(b.column("event_type"), t)),
            batch_format="pyarrow",
        ).select_columns(["user_id"])

    users = sorted(typed("error").union(typed("signup")).unique("user_id"))
    return pd.DataFrame({"user_id": pd.Series(users, dtype="int64")})


def q_embedding_topk(sf_dir: str):
    from ..stages.similarity import brute_force_topk

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    q0 = pq.read_table(emb_path).filter(pc.equal(pc.field("vec_id"), 0))
    qvec = np.array(q0.column("embedding").to_pylist(), dtype=np.float64)
    ds = rd.read_parquet(emb_path, columns=["vec_id", "embedding"])
    out = brute_force_topk(ds, qvec, k=10).to_pandas()
    out = out[["vec_id", "score"]].sort_values(
        ["score", "vec_id"], ascending=[False, True]
    ).reset_index(drop=True)
    return out


def q_embedding_topk_ivf(sf_dir: str):
    """T2 scale path: IVF-bucketed ANN top-k (rows-only — approximate by
    design; tests assert recall vs the oracled brute-force baseline)."""
    from ..stages.similarity import build_ivf_centroids, ivf_topk

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    sample = np.array(
        pq.read_table(emb_path, columns=["embedding"]).column("embedding")
        .to_pylist()[:512], dtype=np.float32)
    cents = build_ivf_centroids(sample, n_clusters=16)
    q0 = pq.read_table(emb_path).filter(pc.equal(pc.field("vec_id"), 0))
    qvec = np.array(q0.column("embedding").to_pylist(), dtype=np.float64)
    ds = rd.read_parquet(emb_path, columns=["vec_id", "embedding"])
    out = ivf_topk(ds, qvec, cents, k=10, n_probe=4).to_pandas()
    return out[["vec_id", "score"]].sort_values(
        ["score", "vec_id"], ascending=[False, True]).reset_index(drop=True)


def q_region_customer_counts(sf_dir: str):
    """Broadcast join: nation+region dims shipped once via ray.put."""
    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet")).to_pandas()
    region = pq.read_table(os.path.join(sf_dir, "region.parquet")).to_pandas()
    dim = nation.merge(region, left_on="n_regionkey", right_on="r_regionkey")
    lookup = dict(zip(dim["n_nationkey"], dim["r_name"]))
    ref = ray.put(lookup)

    class AddRegion:
        def __init__(self):
            # broadcast dim read once per actor; vectorized map via
            # index_in + take (no per-row dict lookup)
            lookup = ray.get(ref)
            self.keys = pa.array(list(lookup.keys()))
            self.vals = pa.array(list(lookup.values()), type=pa.string())

        def __call__(self, batch: pa.Table) -> pa.Table:
            idx = pc.index_in(batch.column("c_nationkey"), value_set=self.keys)
            return batch.append_column("region", pc.take(self.vals, idx))

    out = (
        rd.read_parquet(os.path.join(sf_dir, "customer.parquet"),
                        columns=["c_custkey", "c_nationkey"])
        .map_batches(AddRegion, batch_format="pyarrow", concurrency=(1, 2))
        .groupby("region")
        .count()
        .rename_columns({"count()": "n_customers"})
        .to_pandas()
    )
    return out.sort_values("region").reset_index(drop=True)


def q_lineitem_pricing_summary(sf_dir: str):
    """TPC-H Q1-shaped aggregate: per-batch partial sums (combiner), tiny
    global reduce, mean derived as sum/count after the shuffle."""
    from ..stages.aggregates import preagg_sum_count

    def revenue(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(batch.column("l_extendedprice"),
                          pc.subtract(pa.scalar(1.0), batch.column("l_discount")))
        return batch.append_column("revenue", rev)

    ds = (
        rd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                        columns=["l_returnflag", "l_linestatus", "l_quantity",
                                 "l_extendedprice", "l_discount"])
        .map_batches(revenue, batch_format="pyarrow")
    )
    out = preagg_sum_count(
        ds, ["l_returnflag", "l_linestatus"],
        ["l_quantity", "l_extendedprice", "revenue"], "count_order",
    ).to_pandas()
    out = out.rename(columns={"l_quantity": "sum_qty",
                              "l_extendedprice": "sum_base_price",
                              "revenue": "sum_disc_price"})
    out["avg_qty"] = out["sum_qty"] / out["count_order"]
    for c in ("sum_qty", "sum_base_price", "sum_disc_price", "avg_qty"):
        out[c] = out[c].round(3)
    return out[["l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
                "sum_disc_price", "avg_qty", "count_order"]].sort_values(
        ["l_returnflag", "l_linestatus"]).reset_index(drop=True)


def q_order_revenue_by_status(sf_dir: str):
    """Large x large: partitioned hash join lineitem ⋈ orders on orderkey,
    then revenue per order status (both sides shuffled by key bucket)."""
    from ray.data.aggregate import Count, Sum

    from ..stages.joins import hash_join

    left = rd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                           columns=["l_orderkey", "l_extendedprice", "l_discount"]) \
        .rename_columns({"l_orderkey": "orderkey"})
    right = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                            columns=["o_orderkey", "o_orderstatus"]) \
        .rename_columns({"o_orderkey": "orderkey"})
    joined = hash_join(left, right, on="orderkey", num_buckets=16)
    out = (
        joined
        .map_batches(
            lambda t: t.append_column(
                "revenue",
                pc.multiply(t.column("l_extendedprice"),
                            pc.subtract(pa.scalar(1.0), t.column("l_discount")))),
            batch_format="pyarrow")
        .groupby("o_orderstatus")
        .aggregate(Sum("revenue", alias_name="total_revenue"),
                   Count(alias_name="n_lines"))
        .to_pandas()
    )
    out["total_revenue"] = out["total_revenue"].round(2)
    return out.sort_values("o_orderstatus").reset_index(drop=True)


def q_minhash_dedup_docs(sf_dir: str):
    """Near-dup clustering (rows-only check: deterministic but not SQL)."""
    from ..stages.dedup import minhash_lsh_dedup

    out = minhash_lsh_dedup(
        _docs(sf_dir, ["doc_id", "text"]), jaccard_threshold=0.8
    ).to_pandas()
    return out[["doc_id", "dup_group"]].sort_values("doc_id").reset_index(drop=True)


def q_simhash_candidates(sf_dir: str):
    from ..stages.dedup import simhash_candidates

    out = simhash_candidates(_docs(sf_dir, ["doc_id", "text"]), max_hamming=3).to_pandas()
    if len(out) == 0:
        return pd.DataFrame({"a": pd.Series(dtype="int64"),
                             "b": pd.Series(dtype="int64"),
                             "hamming": pd.Series(dtype="int64")})
    return (out.drop_duplicates(subset=["a", "b"])
            .sort_values(["a", "b"]).reset_index(drop=True))


def q_quality_scores(sf_dir: str):
    from ..stages.text_analysis import quality_score_batch

    out = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(quality_score_batch, batch_format="pandas")
        .to_pandas()
    )
    return out[["doc_id", "n_tokens", "punct_ratio", "stopword_ratio",
                "quality_score"]].sort_values("doc_id").reset_index(drop=True)


def q_langid_pred(sf_dir: str):
    from ..stages.text_analysis import LangId

    out = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(LangId, batch_format="pandas", concurrency=(1, 2))
        .to_pandas()
    )
    return out[["doc_id", "lang_pred"]].sort_values("doc_id").reset_index(drop=True)


def q_doc_fingerprints(sf_dir: str):
    """Winnowing-style rolling-hash fingerprints + simhash per document
    (rows-only: the hash kernels are not SQL-expressible)."""
    from ..stages.text_analysis import Fingerprinter

    out = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(Fingerprinter, batch_format="pyarrow", concurrency=(1, 2))
        .select_columns(["doc_id", "n_fingerprints", "simhash"])
        .to_pandas()
    )
    return out.sort_values("doc_id").reset_index(drop=True)


def q_ngram_jaccard_pairs(sf_dir: str):
    """Exact word-3-gram Jaccard >= 0.5 pairs (blocked all-pairs;
    DuckDB list-lambda oracle)."""
    from ..stages.dedup import ngram_jaccard_pairs

    out = ngram_jaccard_pairs(_docs(sf_dir, ["doc_id", "text"]),
                              threshold=0.5).to_pandas()
    if len(out) == 0:
        return pd.DataFrame({"a": pd.Series(dtype="int64"),
                             "b": pd.Series(dtype="int64"),
                             "jaccard": pd.Series(dtype="float64")})
    return (out.drop_duplicates(subset=["a", "b"])
            .sort_values(["a", "b"]).reset_index(drop=True))


def q_embedding_neardup(sf_dir: str):
    """Exact cosine >= 0.45 pairs (blocked all-pairs; DuckDB-oracled)."""
    from ..stages.dedup import embedding_neardup_exact

    ds = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                         columns=["vec_id", "embedding"])
    out = embedding_neardup_exact(ds, threshold=0.45).to_pandas()
    if len(out) == 0:
        return pd.DataFrame({"a": pd.Series(dtype="int64"),
                             "b": pd.Series(dtype="int64"),
                             "cosine": pd.Series(dtype="float64")})
    return (out.drop_duplicates(subset=["a", "b"])
            .sort_values(["a", "b"]).reset_index(drop=True))


def q_embedding_neardup_lsh(sf_dir: str):
    """Scale path: sign-LSH candidates + keyed vector gather + verify
    (approximate by design -> rows-only check)."""
    from ..stages.dedup import embedding_neardup_lsh

    ds = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                         columns=["vec_id", "embedding"])
    out = embedding_neardup_lsh(ds, threshold=0.45).to_pandas()
    if len(out) == 0:
        return pd.DataFrame({"a": pd.Series(dtype="int64"),
                             "b": pd.Series(dtype="int64"),
                             "cosine": pd.Series(dtype="float64")})
    return (out.drop_duplicates(subset=["a", "b"])
            .sort_values(["a", "b"]).reset_index(drop=True))


def q_events_daily_users(sf_dir: str):
    """Distinct-count aggregate (round 5): daily active users via a
    combiner-first distinct — per-batch (day, user_id) dedup, one global
    groupby making the pair set distinct, then an O(days) count roll-up.
    n_events rides a separate combiner aggregate; the two O(days)
    results merge driver-side (documented small side)."""
    from ..stages.aggregates import preagg_sum_count

    def add_day(batch: pa.Table) -> pa.Table:
        return pa.table({
            "day": pc.floor_temporal(batch.column("ts"), unit="day"),
            "user_id": batch.column("user_id"),
        })

    def distinct_pairs(batch: pa.Table) -> pa.Table:
        return batch.group_by(["day", "user_id"],
                              use_threads=False).aggregate([])

    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["ts", "user_id"])
    pairs = (ds.map_batches(add_day, batch_format="pyarrow")
             .map_batches(distinct_pairs, batch_format="pyarrow")
             .groupby(["day", "user_id"]).count()
             .map_batches(lambda t: t.select(["day"]),
                          batch_format="pyarrow"))
    users = preagg_sum_count(pairs, ["day"], [], "n_users").to_pandas()
    events = preagg_sum_count(
        ds.map_batches(add_day, batch_format="pyarrow"),
        ["day"], [], "n_events").to_pandas()
    out = users.merge(events, on="day")
    out["n_users"] = out["n_users"].astype("int64")
    out["n_events"] = out["n_events"].astype("int64")
    return (out[["day", "n_users", "n_events"]]
            .sort_values("day").reset_index(drop=True))


def q_supplier_region_acctbal(sf_dir: str):
    """Three-way broadcast join + aggregate (round 5): supplier ⋈ nation
    ⋈ region with the two dim tables shipped once via ray.put, then a
    combiner-first (region) mean/count."""
    from ..stages.aggregates import preagg_sum_count

    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet")).to_pandas()
    region = pq.read_table(os.path.join(sf_dir, "region.parquet")).to_pandas()
    dim = nation.merge(region, left_on="n_regionkey", right_on="r_regionkey")
    lookup = dict(zip(dim["n_nationkey"], dim["r_name"]))
    ref = ray.put(lookup)

    class AddRegion:
        def __init__(self):
            lookup = ray.get(ref)
            self.keys = pa.array(list(lookup.keys()))
            self.vals = pa.array(list(lookup.values()), type=pa.string())

        def __call__(self, batch: pa.Table) -> pa.Table:
            idx = pc.index_in(batch.column("s_nationkey"), value_set=self.keys)
            return pa.table({"region": pc.take(self.vals, idx),
                             "s_acctbal": batch.column("s_acctbal")})

    ds = (rd.read_parquet(os.path.join(sf_dir, "supplier.parquet"),
                          columns=["s_nationkey", "s_acctbal"])
          .map_batches(AddRegion, batch_format="pyarrow", concurrency=2))
    out = preagg_sum_count(ds, ["region"], ["s_acctbal"],
                           "n_suppliers").to_pandas()
    out["avg_acctbal"] = (out["s_acctbal"] / out["n_suppliers"]).round(4)
    out["n_suppliers"] = out["n_suppliers"].astype("int64")
    return (out[["region", "avg_acctbal", "n_suppliers"]]
            .sort_values("region").reset_index(drop=True))


def q_orders_priority_monthly(sf_dir: str):
    """Multi-key temporal rollup (round 5): month x priority combiner
    aggregate over orders."""
    from ..stages.aggregates import preagg_sum_count

    def add_month(batch: pa.Table) -> pa.Table:
        return pa.table({
            "month": pc.floor_temporal(batch.column("o_orderdate"),
                                       unit="month"),
            "priority": batch.column("o_orderpriority"),
            "o_totalprice": batch.column("o_totalprice"),
        })

    ds = (rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                          columns=["o_orderdate", "o_orderpriority",
                                   "o_totalprice"])
          .map_batches(add_month, batch_format="pyarrow"))
    out = preagg_sum_count(ds, ["month", "priority"], ["o_totalprice"],
                           "n_orders").to_pandas()
    out["revenue"] = out["o_totalprice"].round(4)
    out["n_orders"] = out["n_orders"].astype("int64")
    return (out[["month", "priority", "n_orders", "revenue"]]
            .sort_values(["month", "priority"]).reset_index(drop=True))


def q_signup_no_big_purchase_users(sf_dir: str):
    """Broadcast anti-join (round 5): signup users with NO purchase of
    value > 95. The anti side is collected distinct (bounded by distinct
    users, the documented small side) and broadcast via ray.put; the
    signup scan filters with a vectorized NOT is_in — no shuffle.
    Beyond-driver-memory anti sides swap the exact set for a Bloom
    filter (functions/bloom.BloomFilter, the ingest J2 'bloom' mode) —
    NOTE: for anti-join semantics a Bloom filter's false positives drop
    matching rows, so the at-scale exact path is the bucketed
    co-partitioned check (materialize.bucketed_dangling_filter_write's
    shape), not the Bloom swap."""
    def big_purchasers(batch: pa.Table) -> pa.Table:
        m = pc.and_(pc.equal(batch.column("event_type"), "purchase"),
                    pc.greater(batch.column("value"), 95.0))
        return batch.filter(m).select(["user_id"]) \
            .group_by("user_id", use_threads=False).aggregate([])

    ds_anti = (rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["user_id", "event_type", "value"])
               .map_batches(big_purchasers, batch_format="pyarrow"))
    anti_users = {r["user_id"] for r in
                  ds_anti.groupby("user_id").count().take_all()}
    err_ref = ray.put(pa.array(sorted(anti_users), type=pa.int64()))

    class Anti:
        def __init__(self):
            self.errs = ray.get(err_ref)  # once per actor, not per batch

        def __call__(self, batch: pa.Table) -> pa.Table:
            keep = pc.invert(pc.is_in(batch.column("user_id"),
                                      value_set=self.errs))
            return batch.filter(keep).select(["user_id"]) \
                .group_by("user_id", use_threads=False).aggregate([])

    out = (rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                           columns=["user_id", "event_type"])
           .filter(expr="event_type == 'signup'")
           .map_batches(Anti, batch_format="pyarrow", concurrency=2)
           .groupby("user_id").count()
           .to_pandas())
    if "user_id" not in out.columns:  # empty result loses its schema
        return pd.DataFrame({"user_id": pd.Series(dtype="int64")})
    return (out[["user_id"]].sort_values("user_id").reset_index(drop=True))


QUERIES = {
    # knowledge-graph construction path (oracle-checked in pytest)
    "kg_triples": q_kg_triples,
    "kg_entities": q_kg_entities,
    "kg_mentions": q_kg_mentions,
    "kg_chunks": q_kg_chunks,
    "kg_spans": q_kg_spans,
    "kg_stats": q_kg_stats,
    "kg_media_features": q_kg_media_features,
    "kg_chunk_embeddings": q_kg_chunk_embeddings,
    "kg_khop": q_kg_khop,
    "kg_citations": q_kg_citations,
    "kg_entity_first": q_kg_entity_first,
    "kg_condition_chains": q_kg_condition_chains,
    "kg_paths": q_kg_paths,
    "kg_full_trace": q_kg_full_trace,
    "kg_explore": q_kg_explore,
    "kg_context": q_kg_context,
    "kg_evaluation": q_kg_evaluation,
    # testdata operators
    "doc_token_counts": q_doc_token_counts,
    "doc_piece_counts": q_doc_piece_counts,
    "lang_counts": q_lang_counts,
    "exact_dedup_docs": q_exact_dedup_docs,
    "doc_char_stats": q_doc_char_stats,
    "top_users_by_value": q_top_users_by_value,
    "events_hourly": q_events_hourly,
    "event_sessions": q_event_sessions,
    "events_asof_signup": q_events_asof_signup,
    "events_sliding_3h": q_events_sliding_3h,
    "top_users_per_event_type": q_top_users_per_event_type,
    "error_or_signup_users": q_error_or_signup_users,
    "embedding_topk": q_embedding_topk,
    "embedding_topk_ivf": q_embedding_topk_ivf,
    "region_customer_counts": q_region_customer_counts,
    "lineitem_pricing_summary": q_lineitem_pricing_summary,
    "order_revenue_by_status": q_order_revenue_by_status,
    "minhash_dedup_docs": q_minhash_dedup_docs,
    "simhash_candidates": q_simhash_candidates,
    "quality_scores": q_quality_scores,
    "langid_pred": q_langid_pred,
    "embedding_neardup": q_embedding_neardup,
    "embedding_neardup_lsh": q_embedding_neardup_lsh,
    "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
    "doc_fingerprints": q_doc_fingerprints,
    # round-5 additions: distinct-count, 3-way broadcast join + avg,
    # multi-key temporal rollup, broadcast anti-join
    "events_daily_users": q_events_daily_users,
    "supplier_region_acctbal": q_supplier_region_acctbal,
    "orders_priority_monthly": q_orders_priority_monthly,
    "signup_no_big_purchase_users": q_signup_no_big_purchase_users,
}

ORACLE_SQL = {
    "doc_token_counts": (
        "SELECT doc_id, CAST(array_length(string_split_regex(regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+')) AS BIGINT)"
        " AS n_tokens FROM documents"
    ),
    "doc_piece_counts": (
        "SELECT doc_id, CAST(len(regexp_extract_all(text, "
        "'[A-Za-z]+|\\d+|[^\\sA-Za-z\\d]')) AS BIGINT) AS n_pieces FROM documents"
    ),
    "lang_counts": "SELECT lang, count(*) AS n FROM documents GROUP BY lang ORDER BY lang",
    "exact_dedup_docs": (
        "SELECT min(doc_id) AS doc_id, text FROM documents GROUP BY text ORDER BY doc_id"
    ),
    "doc_char_stats": (
        "SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars, "
        "CAST(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS BIGINT)"
        " AS n_punct FROM documents"
    ),
    "top_users_by_value": (
        "SELECT user_id, round(sum(value), 4) AS total_value, count(*) AS n_events "
        "FROM events GROUP BY user_id ORDER BY total_value DESC, user_id LIMIT 10"
    ),
    "events_hourly": (
        "SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n, "
        "round(sum(value), 4) AS total FROM events GROUP BY 1, 2 ORDER BY hour, event_type"
    ),
    "event_sessions": (
        "WITH marks AS (SELECT user_id, event_id, ts, value, "
        "CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) "
        "> INTERVAL 1800 SECOND OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) "
        "IS NULL THEN 1 ELSE 0 END AS new_s FROM events), "
        "sess AS (SELECT *, CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_idx FROM marks) "
        "SELECT user_id, session_idx, min(ts) AS session_start, "
        "count(*) AS n_events, round(sum(value), 4) AS total_value "
        "FROM sess GROUP BY user_id, session_idx ORDER BY user_id, session_idx"
    ),
    "events_sliding_3h": (
        "WITH hourly AS (SELECT date_trunc('hour', ts) AS hour, "
        "round(sum(value), 4) AS total, count(*) AS n FROM events GROUP BY 1) "
        "SELECT hour, round(sum(total) OVER (ORDER BY hour RANGE BETWEEN "
        "INTERVAL 2 HOUR PRECEDING AND CURRENT ROW), 4) AS total_3h, "
        "CAST(sum(n) OVER (ORDER BY hour RANGE BETWEEN INTERVAL 2 HOUR "
        "PRECEDING AND CURRENT ROW) AS BIGINT) AS n_3h "
        "FROM hourly ORDER BY hour"
    ),
    "top_users_per_event_type": (
        "WITH agg AS (SELECT event_type, user_id, round(sum(value), 4) AS total "
        "FROM events GROUP BY 1, 2), "
        "r AS (SELECT *, row_number() OVER (PARTITION BY event_type "
        "ORDER BY total DESC, user_id) AS rk FROM agg) "
        "SELECT event_type, user_id, total, CAST(rk AS BIGINT) AS rk FROM r "
        "WHERE rk <= 3 ORDER BY event_type, rk"
    ),
    "error_or_signup_users": (
        "SELECT user_id FROM events WHERE event_type = 'error' "
        "UNION SELECT user_id FROM events WHERE event_type = 'signup' ORDER BY user_id"
    ),
    "events_asof_signup": (
        "SELECT e.event_id, e.user_id, e.ts, "
        "CAST(s.event_id AS DOUBLE) AS asof_event_id, s.ts AS asof_ts "
        "FROM (SELECT * FROM events WHERE event_type = 'error') e "
        "ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s "
        "ON e.user_id = s.user_id AND e.ts >= s.ts ORDER BY e.event_id"
    ),
    "embedding_topk": (
        "SELECT vec_id, round(list_cosine_similarity(embedding, "
        "(SELECT embedding FROM embeddings WHERE vec_id = 0)), 6) AS score "
        "FROM embeddings ORDER BY score DESC, vec_id LIMIT 10"
    ),
    "region_customer_counts": (
        "SELECT r.r_name AS region, count(*) AS n_customers FROM customer c "
        "JOIN nation n ON c.c_nationkey = n.n_nationkey "
        "JOIN region r ON n.n_regionkey = r.r_regionkey GROUP BY 1 ORDER BY 1"
    ),
    "order_revenue_by_status": (
        "SELECT o.o_orderstatus, round(sum(l.l_extendedprice * (1 - l.l_discount)), 2)"
        " AS total_revenue, count(*) AS n_lines FROM lineitem l "
        "JOIN orders o ON l.l_orderkey = o.o_orderkey GROUP BY 1 ORDER BY 1"
    ),
    "quality_scores": (
        "WITH f AS (SELECT doc_id, "
        "CAST(length(text) AS BIGINT) AS n_chars, "
        "CAST(array_length(string_split_regex(regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+')) AS BIGINT) AS n_tokens, "
        "(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g'))) * 1.0 "
        "/ greatest(length(text), 1) AS praw, "
        "len(list_filter(string_split_regex(regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+'), "
        "x -> list_contains(['the','and','of','to','a','in','is','for','on','with'], "
        "lower(x)))) * 1.0 "
        "/ greatest(array_length(string_split_regex(regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+')), 1) AS sraw "
        "FROM documents) "
        "SELECT doc_id, n_tokens, round(praw, 6) AS punct_ratio, "
        "round(sraw, 6) AS stopword_ratio, "
        "round(least(greatest(n_tokens/100.0, 0), 1)*0.4 "
        "+ least(greatest(1.0 - praw*4.0, 0), 1)*0.3 "
        "+ least(greatest(sraw*5.0, 0), 1)*0.3, 6) AS quality_score "
        "FROM f ORDER BY doc_id"
    ),
    "langid_pred": (
        "WITH w AS (SELECT doc_id, "
        "list_distinct(list_slice(regexp_extract_all(lower(text), '[a-z]+'), 1, 200)) AS ws "
        "FROM documents), "
        "h AS (SELECT doc_id, "
        "len(list_filter(ws, x -> list_contains(['the','and','of','to','a','in','is','for','on','with'], x))) AS en, "
        "len(list_filter(ws, x -> list_contains(['el','la','de','que','y','en','un','por','con','los'], x))) AS es, "
        "len(list_filter(ws, x -> list_contains(['le','la','de','et','les','des','un','une','du','en'], x))) AS fr, "
        "len(list_filter(ws, x -> list_contains(['der','die','und','das','von','zu','mit','den','ist','im'], x))) AS de "
        "FROM w) "
        "SELECT doc_id, CASE WHEN greatest(en,es,fr,de) = 0 THEN 'unknown' "
        "WHEN en = greatest(en,es,fr,de) THEN 'en' "
        "WHEN es = greatest(en,es,fr,de) THEN 'es' "
        "WHEN fr = greatest(en,es,fr,de) THEN 'fr' "
        "ELSE 'de' END AS lang_pred FROM h ORDER BY doc_id"
    ),
    "ngram_jaccard_pairs": (
        "WITH toks AS (SELECT doc_id, string_split_regex("
        "regexp_replace(lower(text), '^\\s+|\\s+$', '', 'g'), '\\s+') AS t "
        "FROM documents), "
        "sh AS (SELECT doc_id, CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')] "
        "ELSE list_distinct(list_transform(range(1, len(t) - 1), "
        "i -> array_to_string(list_slice(t, i, i + 2), ' '))) END AS s FROM toks) "
        "SELECT a.doc_id AS a, b.doc_id AS b, "
        "round(len(list_intersect(a.s, b.s)) * 1.0 / "
        "greatest(len(list_distinct(list_concat(a.s, b.s))), 1), 6) AS jaccard "
        "FROM sh a JOIN sh b ON a.doc_id < b.doc_id "
        "WHERE round(len(list_intersect(a.s, b.s)) * 1.0 / "
        "greatest(len(list_distinct(list_concat(a.s, b.s))), 1), 6) >= 0.5 "
        "ORDER BY a, b"
    ),
    "embedding_neardup": (
        # embeddings are stored FLOAT[]; cast to DOUBLE[] so DuckDB's cosine
        # runs in float64 like the numpy side, and round to 5 decimals so
        # last-ulp summation-order noise can't flip the final digit
        # (CORRECTNESS r2: float32 list_cosine_similarity flipped the 6th
        # decimal on pair (53,300))
        "WITH p AS (SELECT a.vec_id AS a, b.vec_id AS b, "
        "round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
        "CAST(b.embedding AS DOUBLE[])), 5) AS cosine "
        "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id) "
        "SELECT a, b, cosine FROM p WHERE cosine >= 0.45 ORDER BY a, b"
    ),
    "lineitem_pricing_summary": (
        "SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 3) AS sum_qty, "
        "round(sum(l_extendedprice), 3) AS sum_base_price, "
        "round(sum(l_extendedprice * (1 - l_discount)), 3) AS sum_disc_price, "
        "round(avg(l_quantity), 3) AS avg_qty, count(*) AS count_order "
        "FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2"
    ),
    "events_daily_users": (
        "SELECT date_trunc('day', ts) AS day, "
        "CAST(count(DISTINCT user_id) AS BIGINT) AS n_users, "
        "CAST(count(*) AS BIGINT) AS n_events "
        "FROM events GROUP BY 1 ORDER BY day"
    ),
    "supplier_region_acctbal": (
        "SELECT r_name AS region, round(avg(s_acctbal), 4) AS avg_acctbal, "
        "CAST(count(*) AS BIGINT) AS n_suppliers "
        "FROM supplier JOIN nation ON s_nationkey = n_nationkey "
        "JOIN region ON n_regionkey = r_regionkey "
        "GROUP BY 1 ORDER BY region"
    ),
    "orders_priority_monthly": (
        "SELECT date_trunc('month', o_orderdate) AS month, "
        "o_orderpriority AS priority, "
        "CAST(count(*) AS BIGINT) AS n_orders, "
        "round(sum(o_totalprice), 4) AS revenue "
        "FROM orders GROUP BY 1, 2 ORDER BY month, priority"
    ),
    "signup_no_big_purchase_users": (
        "SELECT DISTINCT user_id FROM events WHERE event_type = 'signup' "
        "AND user_id NOT IN (SELECT DISTINCT user_id FROM events "
        "WHERE event_type = 'purchase' AND value > 95) ORDER BY user_id"
    ),
}
