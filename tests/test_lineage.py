"""Resume lineage validation (ADVICE r1): a committed shard is reused
only when its recorded lineage matches the current input assignment;
input changes invalidate the stale shards AND everything downstream —
no silent stale/fresh output mixing."""

from __future__ import annotations

import os

import pyarrow.parquet as pq


def _run(ddir, out, cfg):
    from medical_doc_knowledge_graph_system_ray.pipelines.ingest import IngestPipeline

    pipe = IngestPipeline(ddir, cfg, output_dir=out)
    pipe.run(with_spans=False)
    return pipe


def test_input_change_invalidates_committed_output(ray_session, tiny_corpus, tmp_path):
    from medical_doc_knowledge_graph_system_ray.config import PipelineConfig

    docs, _ = tiny_corpus
    half = docs.num_rows // 2
    ddir = os.path.join(tmp_path, "docs")
    out = os.path.join(tmp_path, "out")
    os.makedirs(ddir)
    cfg = PipelineConfig(num_shards=2, num_output_partitions=4,
                         extract_concurrency=2)

    pq.write_table(docs.slice(0, half), os.path.join(ddir, "p0.parquet"))
    pipe1 = _run(ddir, out, cfg)
    ids1 = set(pipe1.read_table("chunks").column("doc_id").to_pylist())
    assert ids1 == set(docs.slice(0, half).column("doc_id").to_pylist())
    t1 = pipe1.read_table("triples")
    triples1 = set(zip(t1.column("subj").to_pylist(),
                       t1.column("pred").to_pylist(),
                       t1.column("obj").to_pylist()))

    # grow the input: the file->shard assignment shifts, so committed
    # shards are stale; a resume must recompute, not reuse
    pq.write_table(docs.slice(half), os.path.join(ddir, "p1.parquet"))
    pipe2 = _run(ddir, out, cfg)
    ids2 = set(pipe2.read_table("chunks").column("doc_id").to_pylist())
    assert ids2 == set(docs.column("doc_id").to_pylist())
    # downstream was invalidated too: triples now cover patients that only
    # exist in the second input file (note the full triple SET is not a
    # superset — the name map legitimately changes with more names)
    t2 = pipe2.read_table("triples")
    pats1 = {s for s, _p, _o in triples1 if s.startswith("PT-")}
    pats2 = {s for s in t2.column("subj").to_pylist() if s.startswith("PT-")}
    assert pats1 < pats2


def test_legacy_manifest_without_lineage_is_stale(ray_session, tiny_corpus, tmp_path):
    """ADVICE r2: a chunks/spans record committed by a pre-lineage build
    carries no 'lineage' key; resuming against it must recompute (treat
    as stale), not silently reuse a table we can't tie to the input."""
    import json

    from medical_doc_knowledge_graph_system_ray.config import PipelineConfig

    docs, _ = tiny_corpus
    ddir = os.path.join(tmp_path, "docs")
    out = os.path.join(tmp_path, "out")
    os.makedirs(ddir)
    pq.write_table(docs, os.path.join(ddir, "p0.parquet"))
    cfg = PipelineConfig(num_shards=2, num_output_partitions=4,
                         extract_concurrency=2)
    pipe1 = _run(ddir, out, cfg)
    n_chunks = pipe1.read_table("chunks").num_rows

    # simulate a pre-upgrade manifest: strip lineage from the chunks record
    mpath = os.path.join(out, "_manifest", "chunks.json")
    with open(mpath) as f:
        rec = json.load(f)
    rec.pop("lineage")
    with open(mpath, "w") as f:
        json.dump(rec, f)

    chunk_files = sorted(os.listdir(os.path.join(out, "chunks")))
    mtimes = [os.path.getmtime(os.path.join(out, "chunks", f)) for f in chunk_files]
    pipe2 = _run(ddir, out, cfg)
    chunk_files2 = sorted(os.listdir(os.path.join(out, "chunks")))
    mtimes2 = [os.path.getmtime(os.path.join(out, "chunks", f)) for f in chunk_files2]
    assert pipe2.read_table("chunks").num_rows == n_chunks  # recomputed, same data
    assert mtimes != mtimes2  # files were rebuilt, not reused


def test_unchanged_input_resume_is_noop(ray_session, tiny_corpus, tmp_path):
    from medical_doc_knowledge_graph_system_ray.config import PipelineConfig

    docs, _ = tiny_corpus
    ddir = os.path.join(tmp_path, "docs")
    out = os.path.join(tmp_path, "out")
    os.makedirs(ddir)
    pq.write_table(docs, os.path.join(ddir, "p0.parquet"))
    cfg = PipelineConfig(num_shards=2, num_output_partitions=4,
                         extract_concurrency=2)
    pipe1 = _run(ddir, out, cfg)
    mtimes = {f: os.path.getmtime(os.path.join(out, "extraction", d, f))
              for d in os.listdir(os.path.join(out, "extraction"))
              for f in os.listdir(os.path.join(out, "extraction", d))}
    pipe2 = _run(ddir, out, cfg)  # same input: committed shards untouched
    mtimes2 = {f: os.path.getmtime(os.path.join(out, "extraction", d, f))
               for d in os.listdir(os.path.join(out, "extraction"))
               for f in os.listdir(os.path.join(out, "extraction", d))}
    assert mtimes == mtimes2
