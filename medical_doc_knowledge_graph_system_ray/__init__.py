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
