"""Ray-Data-native medical knowledge-graph construction engine.

A from-scratch reimplementation of the capabilities of the reference
repo (darthmanwe/Medical_Doc_Knowledge_Graph_System, surveyed in
SURVEY.md) as streaming ``ray.data.Dataset`` pipelines over zero-copy
Arrow batches:

    documents (interleaved text+media spans)
      -> chunking            (stateless map_batches, SOAP-section-aware sliding windows)
      -> extraction          (actor-pool map_batches: dictionary/rule NER + RE)
      -> canonicalization    (blocked candidate generation -> union-find components)
      -> materialize         (dedup entities / triples -> partitioned parquet + manifest)

The reference's Neo4j/Chroma writers are replaced by partitioned
columnar tables (parquet here; Lance at deployment — the lance wheel is
not available in this container). See SURVEY.md §7 for the design and
FIXTURES.md for the table schemas.
"""

__version__ = "0.1.0"


def _warm_fsspec_http() -> None:
    """Pre-cache fsspec.implementations.http in sys.modules.

    Ray Data's path resolution try-imports that module on EVERY
    read/write call; with aiohttp absent the import fails each time and
    is retried, and concurrent Dataset construction from shard threads
    races on the partially-initialized module ("cannot import name
    'HTTPFileSystem'"). Importing it once here — against throwaway stub
    aiohttp/yarl modules that are removed immediately after — leaves a
    fully-initialized module in sys.modules, making later imports
    race-free cache hits. No network code ever runs (local paths only).
    """
    import importlib
    import sys
    import types

    if "fsspec.implementations.http" in sys.modules:
        return
    stubs = [n for n in ("aiohttp", "yarl") if n not in sys.modules]
    for n in stubs:
        sys.modules[n] = types.ModuleType(n)
    try:
        importlib.import_module("fsspec.implementations.http")
    except Exception:
        pass
    finally:
        for n in stubs:
            sys.modules.pop(n, None)


_warm_fsspec_http()
