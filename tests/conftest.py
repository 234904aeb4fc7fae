"""Session-scoped Ray fixture: init ONCE per pytest session."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_corpus():
    """~20-doc corpus (FIXTURES.md §1 'tiny')."""
    from medical_doc_knowledge_graph_system_ray.config import PipelineConfig
    from medical_doc_knowledge_graph_system_ray.corpus import synthesize_corpus_table

    cfg = PipelineConfig()
    return synthesize_corpus_table(8, cfg), cfg


@pytest.fixture(scope="session")
def small_corpus():
    """Oracle-check corpus (FIXTURES.md §1 'small')."""
    from medical_doc_knowledge_graph_system_ray.config import PipelineConfig
    from medical_doc_knowledge_graph_system_ray.corpus import synthesize_corpus_table

    cfg = PipelineConfig(num_shards=4, num_output_partitions=4, extract_concurrency=3)
    return synthesize_corpus_table(250, cfg), cfg
