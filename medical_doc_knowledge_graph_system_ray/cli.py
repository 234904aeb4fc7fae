"""CLI driver — the engine's user surface (replaces the reference's HTTP
API, SURVEY.md §2.11). Designed to run under ``ray job submit``:

  python -m medical_doc_knowledge_graph_system_ray.cli ingest --docs DIR --out DIR
  python -m medical_doc_knowledge_graph_system_ray.cli query --out DIR --question "..." [--strategy graph|vector|both]
  python -m medical_doc_knowledge_graph_system_ray.cli explore --out DIR --key NAME [--hops 2]
  python -m medical_doc_knowledge_graph_system_ray.cli paths --out DIR --a K1 --b K2 | --seeds K1,K2 [--target K]
  python -m medical_doc_knowledge_graph_system_ray.cli stats --out DIR
  python -m medical_doc_knowledge_graph_system_ray.cli evaluate --out DIR
  python -m medical_doc_knowledge_graph_system_ray.cli synth --patients N --out DIR

Owns its Ray session (guarded init; the library itself never calls
ray.init, per the driver contract).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys


def _ensure_ray():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="medkg-ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("ingest", help="run the full KG construction pipeline")
    sp.add_argument("--docs", required=True)
    sp.add_argument("--out", required=True)
    sp.add_argument("--shards", type=int, default=8)
    sp.add_argument("--partitions", type=int, default=8)

    sp = sub.add_parser("query", help="graph/vector RAG query")
    sp.add_argument("--out", required=True)
    sp.add_argument("--question", required=True)
    sp.add_argument("--strategy", default="graph", choices=["graph", "vector", "both"])
    sp.add_argument("--top-k", type=int, default=5)

    sp = sub.add_parser("explore", help="k-hop neighborhood of an entity")
    sp.add_argument("--out", required=True)
    sp.add_argument("--key", required=True)
    sp.add_argument("--hops", type=int, default=2)

    sp = sub.add_parser("paths", help="path reasoning (Q5/Q3): --a/--b for "
                        "all+shortest paths, --seeds/--target for seed paths, "
                        "--seeds alone for clinically-constrained paths")
    sp.add_argument("--out", required=True)
    sp.add_argument("--a")
    sp.add_argument("--b")
    sp.add_argument("--seeds", help="comma-separated entity keys")
    sp.add_argument("--target")
    sp.add_argument("--max-hops", type=int, default=4)
    sp.add_argument("--max-paths", type=int, default=5)
    sp.add_argument("--limit", type=int, default=50)

    sp = sub.add_parser("stats", help="graph stats (G6)")
    sp.add_argument("--out", required=True)

    sp = sub.add_parser("evaluate", help="run the evaluation harness")
    sp.add_argument("--out", required=True)

    sp = sub.add_parser("synth", help="synthesize an interleaved corpus")
    sp.add_argument("--patients", type=int, required=True)
    sp.add_argument("--out", required=True)

    args = p.parse_args(argv)
    _ensure_ray()

    from .config import PipelineConfig

    if args.cmd == "ingest":
        from .pipelines.ingest import IngestPipeline

        cfg = PipelineConfig(num_shards=args.shards,
                             num_output_partitions=args.partitions)
        summary = IngestPipeline(args.docs, cfg, output_dir=args.out).run()
        print(json.dumps(summary))
    elif args.cmd == "query":
        from .pipelines.rag import both_strategies, graph_rag_query, vector_rag_query

        if args.strategy == "both":
            r = both_strategies(args.out, args.question, top_k=args.top_k)
            print(json.dumps({"answer": r["answer"],
                              "graph": dataclasses.asdict(r["graph"]),
                              "vector": dataclasses.asdict(r["vector"])}, default=str))
        else:
            fn = graph_rag_query if args.strategy == "graph" else vector_rag_query
            print(json.dumps(dataclasses.asdict(fn(args.out, args.question,
                                                   top_k=args.top_k)), default=str))
    elif args.cmd == "explore":
        from .pipelines.queryside import explore

        print(json.dumps(explore(args.out, args.key, hops=args.hops), default=str))
    elif args.cmd == "paths":
        from .pipelines.queryside import (all_paths, find_paths_from_seeds,
                                          relationship_constrained_paths,
                                          shortest_path_detailed)

        if args.a and args.b:
            out = {"shortest": shortest_path_detailed(args.out, args.a, args.b),
                   "all_paths": all_paths(args.out, args.a, args.b,
                                          max_hops=args.max_hops,
                                          max_paths=args.max_paths)}
        elif args.seeds and args.target:
            out = {"from_seeds": find_paths_from_seeds(
                args.out, args.seeds.split(","), args.target,
                max_hops=min(args.max_hops, 5), limit=args.max_paths)}
        elif args.seeds:
            out = {"constrained": relationship_constrained_paths(
                args.out, args.seeds.split(","), max_hops=min(args.max_hops, 3),
                limit=args.limit).to_pylist()}
        else:
            p.error("paths requires --a/--b, or --seeds [--target]")
        print(json.dumps(out, default=str))
    elif args.cmd == "stats":
        from .pipelines.ingest import IngestPipeline

        pipe = IngestPipeline(docs_path="/nonexistent", output_dir=args.out)
        print(json.dumps(pipe.graph_stats()))
    elif args.cmd == "evaluate":
        from .pipelines.rag import run_evaluation

        report = run_evaluation(args.out)
        print(json.dumps({"aggregates": report["aggregates"],
                          "summary": report["summary"]}))
    elif args.cmd == "synth":
        from .corpus import synthesize_corpus_parquet

        path = synthesize_corpus_parquet(args.patients, args.out, PipelineConfig())
        print(json.dumps({"path": path, "patients": args.patients}))
    return 0


if __name__ == "__main__":
    import ray

    code = main()
    if ray.is_initialized():
        ray.shutdown()
    sys.exit(code)
