"""Kill/restart resumability: a run killed after partial extraction must,
on restart, (a) skip committed shards and (b) produce byte-identical
final tables (BASELINE.md resumability criterion)."""

from __future__ import annotations

import hashlib
import os

import pyarrow.parquet as pq
import pytest

from medical_doc_knowledge_graph_system_ray.pipelines.ingest import IngestPipeline


def _dir_digest(root: str, table: str) -> str:
    h = hashlib.blake2b(digest_size=16)
    tdir = os.path.join(root, table)
    for f in sorted(os.listdir(tdir)):
        if f.endswith(".parquet"):
            h.update(f.encode())
            with open(os.path.join(tdir, f), "rb") as fh:
                h.update(fh.read())
    return h.hexdigest()


@pytest.fixture(scope="module")
def docs_on_disk(tiny_corpus, tmp_path_factory):
    docs, cfg = tiny_corpus
    root = tmp_path_factory.mktemp("resume")
    docs_path = os.path.join(root, "documents")
    os.makedirs(docs_path)
    pq.write_table(docs, os.path.join(docs_path, "part-0.parquet"))
    return docs_path, cfg, str(root)


def test_resume_is_byte_identical(ray_session, docs_on_disk):
    docs_path, cfg, root = docs_on_disk

    # uninterrupted run
    out_a = os.path.join(root, "out_a")
    IngestPipeline(docs_path, cfg, output_dir=out_a).run()

    # interrupted run: stop ("crash") after 2 of the extraction shards
    out_b = os.path.join(root, "out_b")
    pipe_b = IngestPipeline(docs_path, cfg, output_dir=out_b)

    class Killed(RuntimeError):
        pass

    orig_commit = pipe_b.manifest.commit
    count = {"n": 0}

    def commit_then_die(unit, payload):
        orig_commit(unit, payload)
        count["n"] += 1
        if count["n"] == 2:
            raise Killed()

    pipe_b.manifest.commit = commit_then_die
    with pytest.raises(Killed):
        pipe_b.run()

    # restart with a fresh pipeline object (fresh process semantics)
    pipe_b2 = IngestPipeline(docs_path, cfg, output_dir=out_b)
    committed_before = set(pipe_b2.manifest.all_units())
    assert any(u.startswith("extraction_shard_") for u in committed_before)
    assert "summary" not in committed_before  # the run really was interrupted
    pipe_b2.run()

    for table in ("triples", "entities", "mentions", "chunks", "spans"):
        assert _dir_digest(out_a, table) == _dir_digest(out_b, table), table


def test_committed_shards_not_recomputed(ray_session, docs_on_disk, monkeypatch):
    docs_path, cfg, root = docs_on_disk
    out = os.path.join(root, "out_a")  # already complete from previous test
    pipe = IngestPipeline(docs_path, cfg, output_dir=out)

    import medical_doc_knowledge_graph_system_ray.pipelines.ingest as ingest_mod

    def boom(*a, **k):  # any re-read of the input would mean recompute
        raise AssertionError("input re-read on resume of a completed run")

    monkeypatch.setattr(ingest_mod.rd, "read_parquet", boom)
    summary = pipe.run()
    assert summary["triples"] > 0


def test_manifest_stays_small_names_in_sidecars(ray_session, docs_on_disk):
    """VERDICT r2 #6: the manifest (a driver-side JSON read on every
    resume) must not grow with the vocabulary — per-shard distinct
    names live in sidecar parquets, records keep counts only."""
    docs_path, cfg, root = docs_on_disk
    out = os.path.join(root, "out_a")  # complete from the earlier test
    pipe = IngestPipeline(docs_path, cfg, output_dir=out)

    shards = [u for u in pipe.manifest.all_units()
              if u.startswith("extraction_shard_")]
    assert shards
    total_bytes = 0
    for u in shards:
        rec = pipe.manifest.read(u)
        assert "distinct_names" not in rec, "name list back in the manifest"
        assert rec["distinct_name_count"] >= 0
        total_bytes += os.path.getsize(
            os.path.join(out, "_manifest", f"{u}.json"))
    # O(KB) regardless of vocabulary
    assert total_bytes < 8_192

    # the sidecars exist and their union matches the committed counts
    names = set()
    for s in range(cfg.num_shards):
        sc = os.path.join(out, "_names", f"shard={s:04d}.parquet")
        if os.path.isfile(sc):
            names.update(pq.read_table(sc).column("name").to_pylist())
    import json
    with open(os.path.join(out, "name_map.json")) as f:
        name_map = json.load(f)
    assert set(name_map) == names


def test_stale_uncommitted_shard_dir_is_recomputed(ray_session, docs_on_disk):
    """Crash window between the shard rename and its manifest commit
    (review r4): the renamed-but-uncommitted shard_dir must be swept and
    recomputed on restart — it used to make os.replace fail with
    ENOTEMPTY on every subsequent resume."""
    docs_path, cfg, root = docs_on_disk

    out_a = os.path.join(root, "out_ref2")
    IngestPipeline(docs_path, cfg, output_dir=out_a).run()

    out_c = os.path.join(root, "out_stale")
    stale = os.path.join(out_c, "extraction", "shard=0000")
    os.makedirs(stale)
    with open(os.path.join(stale, "part-99999.parquet"), "wb") as f:
        f.write(b"junk from the crashed attempt")

    IngestPipeline(docs_path, cfg, output_dir=out_c).run()
    for table in ("triples", "entities", "mentions", "chunks", "spans",
                  "extraction"):
        assert _dir_digest(out_a, table) == _dir_digest(out_c, table), table


def test_bucket_hash_mismatch_invalidates_whole_tree(ray_session, docs_on_disk):
    """ADVICE r4: a resume under a pandas whose internal hash_array
    changed must not mix tables bucketed under different hashes. The
    manifest records the bucket-hash identity; flipping it simulates the
    upgrade and must force a full recompute to a byte-identical tree."""
    import json

    docs_path, cfg, root = docs_on_disk

    out = os.path.join(root, "out_hashguard")
    IngestPipeline(docs_path, cfg, output_dir=out).run()
    digests = {t: _dir_digest(out, t)
               for t in ("triples", "entities", "mentions", "chunks", "spans")}

    # simulate: the completed tree was written under a different hash
    rec_path = os.path.join(out, "_manifest", "bucket_hash.json")
    with open(rec_path) as f:
        rec = json.load(f)
    assert rec["id"].startswith("siphash-v2/")
    rec["id"] = "siphash-v2/0000000000000000"
    with open(rec_path, "w") as f:
        json.dump(rec, f)
    # poison a table file: if the guard fails to invalidate, the resumed
    # run reuses this file and the digest comparison below catches it
    tfile = sorted(os.listdir(os.path.join(out, "triples")))[0]
    with open(os.path.join(out, "triples", tfile), "ab") as f:
        f.write(b"tamper")

    pipe = IngestPipeline(docs_path, cfg, output_dir=out)
    pipe.run()
    from medical_doc_knowledge_graph_system_ray.sources.io import (
        bucket_hash_identity,
    )

    assert pipe.manifest.read("bucket_hash")["id"] == bucket_hash_identity()
    for table, want in digests.items():
        assert _dir_digest(out, table) == want, table


def test_legacy_manifest_without_bucket_hash_is_stale(ray_session, docs_on_disk):
    """A pre-guard manifest (no bucket_hash unit) cannot prove its tables
    were bucketed under the current hash — treat as stale, recompute."""
    docs_path, cfg, root = docs_on_disk

    out = os.path.join(root, "out_legacy")
    IngestPipeline(docs_path, cfg, output_dir=out).run()
    digests = {t: _dir_digest(out, t) for t in ("triples", "entities")}

    os.remove(os.path.join(out, "_manifest", "bucket_hash.json"))
    efile = sorted(os.listdir(os.path.join(out, "entities")))[0]
    with open(os.path.join(out, "entities", efile), "ab") as f:
        f.write(b"tamper")

    IngestPipeline(docs_path, cfg, output_dir=out).run()
    for table, want in digests.items():
        assert _dir_digest(out, table) == want, table


def test_bounded_dag_fanin_is_byte_identical(ray_session, docs_on_disk):
    """VERDICT r4 #1: above the object budget the DAG inserts a grouped
    fan-in layer (extraction returns whole tables; ~_TARGET_SPLITS split
    tasks bucket them). Forcing that mode must produce tables
    byte-identical to the direct-slices DAG."""
    import dataclasses

    docs_path, cfg, root = docs_on_disk

    out_a = os.path.join(root, "out_direct")
    IngestPipeline(docs_path, cfg, output_dir=out_a).run()

    out_b = os.path.join(root, "out_fanin")
    cfg_b = dataclasses.replace(cfg, dag_direct_max_objects=0)
    IngestPipeline(docs_path, cfg_b, output_dir=out_b).run()

    for table in ("triples", "entities", "mentions", "chunks", "spans",
                  "extraction"):
        assert _dir_digest(out_a, table) == _dir_digest(out_b, table), table


def test_fanin_mode_interrupted_run_resumes_byte_identical(ray_session,
                                                           docs_on_disk):
    """Kill/restart under the bounded fan-in DAG mode: a crash after
    partial extraction must resume through the staged fallback and still
    match the direct-mode reference byte-for-byte."""
    import dataclasses

    docs_path, cfg, root = docs_on_disk

    out_a = os.path.join(root, "out_a")  # direct-mode reference (complete)
    if not os.path.isdir(os.path.join(out_a, "triples")):
        IngestPipeline(docs_path, cfg, output_dir=out_a).run()

    cfg_b = dataclasses.replace(cfg, dag_direct_max_objects=0)
    out_c = os.path.join(root, "out_fanin_kill")
    pipe = IngestPipeline(docs_path, cfg_b, output_dir=out_c)

    class Killed(RuntimeError):
        pass

    orig_commit = pipe.manifest.commit
    count = {"n": 0}

    def commit_then_die(unit, payload):
        orig_commit(unit, payload)
        count["n"] += 1
        if count["n"] == 3:
            raise Killed()

    pipe.manifest.commit = commit_then_die
    with pytest.raises(Killed):
        pipe.run()

    pipe2 = IngestPipeline(docs_path, cfg_b, output_dir=out_c)
    assert any(u.startswith("extraction_shard_")
               for u in pipe2.manifest.all_units())
    pipe2.run()
    for table in ("triples", "entities", "mentions", "chunks", "spans"):
        assert _dir_digest(out_a, table) == _dir_digest(out_c, table), table
