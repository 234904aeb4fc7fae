"""Partitioned, deterministic, atomically-committed table writes.

Replaces the reference's Neo4j/Chroma sinks
(/root/reference/app/ingestion/graph_writer.py) with hash-partitioned
columnar files. Lance is the deployment target for these tables (native
vector columns / ANN); the lance wheel is not available in this
container, so the same layout is written as parquet — one file per hash
partition, rows sorted by a total key, written tmp-then-rename. That
makes re-runs byte-identical (fixed pyarrow version, deterministic row
order, deterministic file names), which is what the kill/restart
resumability test asserts.

The exchange that routes rows to their hash partition is an explicit
two-stage shuffle over raw Ray tasks (split each block into P bucket
slices shipped through the object store via ``num_returns=P``, then one
concat+sort+write task per bucket). ``Dataset.groupby`` would express
the same thing, but its sort-based shuffle costs ~10x more wall time at
10^6 rows than this direct exchange — this is the one place the engine
drops below the Dataset API, and the output partitioning contract
(bucket = siphash(key) % P, see bucket_of) is documented here for every consumer that
relies on co-location (entity/triple dedup finalizers).
"""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa
import pyarrow.parquet as pq


_BUCKET_HASH_ID: str | None = None


def bucket_hash_identity() -> str:
    """Fingerprint of the ACTUAL bucket-hash implementation (ADVICE r4):
    bucket_of delegates to pandas' internal siphash, whose stability
    across pandas versions is not guaranteed, and the static
    "siphash-v2" lineage marker cannot see an implementation change. So
    fingerprint the behavior itself — hash_array's output on a fixed
    probe vector, digested — and record it in the run manifest; a resume
    under a pandas whose hash differs is detected and invalidated instead
    of silently co-locating tables bucketed under different hashes."""
    global _BUCKET_HASH_ID
    if _BUCKET_HASH_ID is None:
        import numpy as np
        import pandas as pd

        probe = np.asarray(
            ["", "a", "label\x1fkey", "0123456789" * 5, "κλμ-ünïcode",
             "Patient:000042", "hypertension"], dtype=object)
        h = np.ascontiguousarray(pd.util.hash_array(probe))
        _BUCKET_HASH_ID = ("siphash-v2/"
                           + hashlib.blake2b(h.tobytes(), digest_size=8).hexdigest())
    return _BUCKET_HASH_ID


def bucket_of(values, num_partitions: int):
    """Vectorized partition bucketing: pandas' fixed-key siphash over the
    key column in one C pass (the per-row Python crc32 loop this replaced
    cost ~1.5 us/row — 15+ cpu-seconds per full-corpus exchange). The
    bucket function is the partitioning CONTRACT: every co-location
    consumer (entity/triple finalizers, the bucketed semi-join) calls
    this same function, so they stay consistent by construction."""
    import numpy as np
    import pandas as pd

    arr = np.asarray(values, dtype=object)
    if len(arr) == 0:
        return np.empty(0, dtype=np.int64)
    return (pd.util.hash_array(arr) % num_partitions).astype(np.int64)


def bucket_slices(t: pa.Table, key, P: int) -> list[pa.Table]:
    """Split a table into its P hash-bucket slices: the partitioning
    contract's split primitive, shared by every exchange (ingest slices,
    dedup raw exchanges, the partitioned writers) so co-location between
    exchanges holds by construction. ``key`` is a column name or a
    precomputed list of key strings aligned with ``t``'s rows."""
    import numpy as np

    if t.num_rows == 0:
        return [t] * P
    keys = t.column(key).to_pylist() if isinstance(key, str) else key
    b = np.asarray(bucket_of(keys, P))
    return [t.take(pa.array(np.nonzero(b == k)[0])) if (b == k).any()
            else t.slice(0, 0) for k in range(P)]


def write_table_partition(table: pa.Table, path: str, bucket: int,
                          sort_keys: list[str]) -> dict:
    """Sort + write one partition atomically; returns a manifest row."""
    if table.num_rows > 0:
        table = table.sort_by([(k, "ascending") for k in sort_keys])
    os.makedirs(path, exist_ok=True)
    fname = os.path.join(path, f"part-{bucket:05d}.parquet")
    tmp = fname + f".tmp-{os.getpid()}"
    pq.write_table(table, tmp, compression="zstd")
    os.replace(tmp, fname)
    with open(fname, "rb") as f:
        checksum = hashlib.blake2b(f.read(), digest_size=8).hexdigest()
    return {"partition": bucket, "rows": table.num_rows, "path": fname, "checksum": checksum}


def write_partitioned(ds, path: str, key_col: str, sort_keys: list[str],
                      num_partitions: int, schema: pa.Schema | None = None,
                      finalize_fn=None) -> list[dict]:
    """Distributed deterministic partitioned write of a Dataset.

    bucket = bucket_of(key) % P; one sorted parquet file per bucket.
    ``finalize_fn`` converts the in-flight representation to the final one
    (e.g. per-partition dedup reduce, JSON properties -> map) just before
    the sort+write. Returns manifest rows (one per partition).
    """
    import ray

    P = num_partitions

    @ray.remote(num_returns=P)
    def split_block(*blocks: pa.Table):
        block = pa.concat_tables([b for b in blocks if b.num_rows > 0],
                                 promote_options="default") \
            if any(b.num_rows for b in blocks) else blocks[0]
        if block.num_rows == 0:
            empty = block.slice(0, 0)
            return tuple(empty for _ in range(P)) if P > 1 else empty
        outs = bucket_slices(block, key_col, P)
        return tuple(outs) if P > 1 else outs[0]

    @ray.remote
    def write_bucket(bucket: int, *parts: pa.Table) -> dict:
        tables = [t for t in parts if t is not None and t.num_rows > 0]
        if tables:
            t = pa.concat_tables(tables, promote_options="default")
        elif parts:
            t = parts[0]
        else:
            t = pa.Table.from_pylist([], schema=schema)
        if finalize_fn is not None:
            t = finalize_fn(t)
        if schema is not None:
            t = t.select(schema.names).cast(schema)
        return write_table_partition(t, path, bucket, sort_keys)

    block_refs = _grouped_refs(ds)
    if not block_refs:
        rows = []
        if schema is not None:
            for b in range(P):
                rows.append(write_table_partition(
                    pa.Table.from_pylist([], schema=schema), path, b, sort_keys))
        return rows

    per_block = [split_block.remote(*grp) for grp in block_refs]
    if P == 1:
        per_block = [[r] for r in per_block]
    manifest_refs = [
        write_bucket.remote(k, *[per_block[i][k] for i in range(len(per_block))])
        for k in range(P)
    ]
    return sorted(ray.get(manifest_refs), key=lambda r: r["partition"])


# target number of split tasks per exchange: bounds the shuffle's object
# count at (splits x P) regardless of how many tiny blocks the upstream
# produced (1000 blocks x 64 returns would otherwise flood the object
# store with tens of thousands of slices)
_TARGET_SPLITS = 64


def _grouped_refs(ds, n_groups: int | None = None) -> list[list]:
    """Materialize the dataset and group its block refs so the exchange
    runs ~_TARGET_SPLITS split tasks, each concatenating its group.

    Callers with quadratic task fan-out (all-pairs kernels spawn
    B(B+1)/2 tasks over B groups) pass a smaller n_groups — sized so
    task count tracks cluster cores, not the upstream block count —
    otherwise tiny-task scheduling overhead dominates the kernel."""
    refs = ds.to_arrow_refs()
    if not refs:
        return []
    n_groups = min(n_groups or _TARGET_SPLITS, len(refs))
    # round-robin so consecutive (often size-correlated) blocks spread
    # across split tasks instead of loading a few of them
    return [refs[i::n_groups] for i in range(n_groups)]


def write_partitioned_multi(ds, specs: list[dict]) -> dict[str, list[dict]]:
    """One scan, several partitioned table outputs.

    Each spec: {name, path, row_fn(block)->Table, key_col, sort_keys,
    schema, finalize_fn}. The source dataset is materialized ONCE; a
    single split task per block applies every spec's row transform and
    emits P bucket slices per spec (num_returns = len(specs)*P); one
    write task per (spec, bucket) concats/finalizes/sorts/writes.

    This is the engine's widest exchange: it exists so sibling tables
    derived from the same scan (mentions+triples_raw from extraction,
    chunks+spans from documents) never re-read or re-materialize the
    source, and never run as two competing streaming executors.
    """
    import ray

    S = len(specs)
    P0 = specs[0].get("num_partitions")
    for sp in specs:
        sp.setdefault("num_partitions", P0)
    total_returns = sum(sp["num_partitions"] for sp in specs)
    row_fns = [sp["row_fn"] for sp in specs]
    key_cols = [sp["key_col"] for sp in specs]
    parts = [sp["num_partitions"] for sp in specs]

    def _split_table(block: pa.Table):
        import numpy as np

        outs = []
        for fn, key_col, P in zip(row_fns, key_cols, parts):
            t = fn(block) if fn is not None else block
            if t.num_rows == 0:
                outs.extend([t] * P)
                continue
            b = np.asarray(bucket_of(t.column(key_col).to_pylist(), P))
            for k in range(P):
                idx = np.nonzero(b == k)[0]
                outs.append(t.take(pa.array(idx)) if len(idx) else t.slice(0, 0))
        return tuple(outs) if total_returns > 1 else outs[0]

    @ray.remote(num_returns=total_returns)
    def split_block(*blocks: pa.Table):
        block = pa.concat_tables([b for b in blocks if b.num_rows > 0],
                                 promote_options="default") \
            if any(b.num_rows for b in blocks) else blocks[0]
        return _split_table(block)

    @ray.remote(num_returns=total_returns)
    def split_files(files: list[str], columns):
        block = pa.concat_tables(
            [pq.read_table(f, columns=columns) for f in files],
            promote_options="default",
        )
        return _split_table(block)

    @ray.remote
    def write_bucket(spec_idx: int, bucket: int, *blocks: pa.Table) -> dict:
        sp = specs[spec_idx]
        tables = [t for t in blocks if t is not None and t.num_rows > 0]
        if tables:
            t = pa.concat_tables(tables, promote_options="default")
        elif blocks:
            t = blocks[0]
        else:
            t = pa.Table.from_pylist([], schema=sp["schema"])
        if sp.get("finalize_fn") is not None:
            t = sp["finalize_fn"](t)
        if sp.get("schema") is not None:
            t = t.select(sp["schema"].names).cast(sp["schema"])
        return write_table_partition(t, sp["path"], bucket, sp["sort_keys"])

    # source: either a Dataset (materialized via to_arrow_refs) or a dict
    # {"files": [...], "columns": [...]} — the file form lets split tasks
    # read their parquet group directly, skipping the Dataset scan job and
    # the extra copy of the raw source through the object store
    results: dict[str, list[dict]] = {}
    if isinstance(ds, dict):
        files = list(ds["files"])
        columns = ds.get("columns")
        if not files:
            per_block = []
        else:
            n_groups = min(_TARGET_SPLITS, len(files))
            groups = [files[i::n_groups] for i in range(n_groups)]
            per_block = [split_files.remote(g, columns) for g in groups]
    else:
        block_refs = _grouped_refs(ds)
        per_block = [split_block.remote(*grp) for grp in block_refs]
    if not per_block:
        for sp in specs:
            rows = []
            for b in range(sp["num_partitions"]):
                rows.append(write_table_partition(
                    pa.Table.from_pylist([], schema=sp["schema"]),
                    sp["path"], b, sp["sort_keys"]))
            results[sp["name"]] = rows
        return results

    if total_returns == 1:
        per_block = [[r] for r in per_block]
    manifest_refs = {}
    offset = 0
    for si, sp in enumerate(specs):
        P = sp["num_partitions"]
        manifest_refs[sp["name"]] = [
            write_bucket.remote(si, k,
                                *[pb[offset + k] for pb in per_block])
            for k in range(P)
        ]
        offset += P
    import ray as _ray

    for name, refs in manifest_refs.items():
        results[name] = sorted(_ray.get(refs), key=lambda r: r["partition"])
    return results


def map_partitions_write(src_dir: str, dst_dir: str, fn, sort_keys: list[str],
                         schema: pa.Schema | None = None) -> list[dict]:
    """Partition-preserving transform: one Ray task per source partition
    file applies ``fn`` and writes the same-numbered destination partition.
    No exchange — valid whenever ``fn`` is row-local and the bucketing key
    is unchanged (e.g. the triples dangling-filter + final reduce over
    triples_raw, which is already bucketed by subj)."""
    import ray

    @ray.remote
    def one(bucket: int, src_file: str) -> dict:
        t = pq.read_table(src_file)
        t = fn(t)
        if schema is not None:
            t = t.select(schema.names).cast(schema)
        return write_table_partition(t, dst_dir, bucket, sort_keys)

    futs = []
    for f in sorted(os.listdir(src_dir)):
        if f.endswith(".parquet"):
            bucket = int(f.split("-")[1].split(".")[0])
            futs.append(one.remote(bucket, os.path.join(src_dir, f)))
    return sorted(ray.get(futs), key=lambda r: r["partition"])


def read_table_dir(path: str, columns: list[str] | None = None) -> pa.Table:
    files = sorted(
        os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet")
    )
    return (pa.concat_tables([pq.read_table(f, columns=columns) for f in files])
            if files else None)
