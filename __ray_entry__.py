"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init(...)`` itself BEFORE importing this module;
nothing here (or in the library) calls ray.init()/ray.shutdown().

``entry()`` runs the flagship knowledge-graph construction pipeline
(chunk -> extract -> canonicalize -> materialize, SURVEY.md §7) over the
synthesized interleaved-span corpus at the sf0.001 scale and returns the
materialized triples. ``queries()`` exposes every implemented operator
(SURVEY.md §2 + the training-data family); ``oracle_sql()`` pairs the
SQL-expressible ones with DuckDB oracles over the pre-registered
testdata views. KG-path queries are non-SQL (graph construction over a
synthesized spans corpus); their gate is the reference-semantics oracle
in tests/test_pipeline_e2e.py.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline at the sf0.001 scale; returns the triples table."""
    from medical_doc_knowledge_graph_system_ray.pipelines.queries import ensure_kg_output

    pipe = ensure_kg_output("/root/testdata/sf0.001")
    return pipe.read_table("triples")


def queries() -> dict[str, Callable[[str], Any]]:
    from medical_doc_knowledge_graph_system_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from medical_doc_knowledge_graph_system_ray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
