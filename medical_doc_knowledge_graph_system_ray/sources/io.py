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
"""

from __future__ import annotations

import hashlib
import os
import zlib

import pyarrow as pa
import pyarrow.parquet as pq


def bucket_of(values: list[str], num_partitions: int) -> list[int]:
    return [zlib.crc32(v.encode()) % num_partitions for v in values]


def write_table_partition(table: pa.Table, path: str, bucket: int,
                          sort_keys: list[str]) -> dict:
    """Sort + write one partition atomically; returns a manifest row."""
    if table.num_rows > 0:
        table = table.sort_by([(k, "ascending") for k in sort_keys])
    os.makedirs(path, exist_ok=True)
    fname = os.path.join(path, f"part-{bucket:05d}.parquet")
    tmp = fname + ".tmp"
    pq.write_table(table, tmp, compression="zstd")
    os.replace(tmp, fname)
    with open(fname, "rb") as f:
        checksum = hashlib.blake2b(f.read(), digest_size=8).hexdigest()
    return {"partition": bucket, "rows": table.num_rows, "path": fname, "checksum": checksum}


def write_partitioned(ds, path: str, key_col: str, sort_keys: list[str],
                      num_partitions: int, schema: pa.Schema | None = None,
                      finalize_fn=None) -> list[dict]:
    """Distributed deterministic partitioned write of a Dataset.

    Adds bucket = crc32(key) % P, shuffles by bucket, writes one sorted
    parquet file per bucket. ``finalize_fn`` (optional) converts the
    in-flight representation to the final one (e.g. JSON properties ->
    map<string,string>) just before the cast. Returns manifest rows.
    """

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = bucket_of(batch.column(key_col).to_pylist(), num_partitions)
        return batch.append_column("__bucket", pa.array(b, type=pa.int32()))

    def finalize(t: pa.Table) -> pa.Table:
        if finalize_fn is not None:
            t = finalize_fn(t)
        if schema is not None:
            t = t.select(schema.names).cast(schema)
        return t

    def write_group(group: pa.Table) -> pa.Table:
        bucket = group.column("__bucket")[0].as_py()
        row = write_table_partition(
            finalize(group.drop_columns(["__bucket"])), path, bucket, sort_keys
        )
        return pa.Table.from_pylist([row])

    manifest_rows = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(write_group, batch_format="pyarrow")
        .take_all()
    )
    # partitions with no rows produce no file; record them for completeness
    seen = {r["partition"] for r in manifest_rows}
    for b in range(num_partitions):
        if b not in seen:
            if schema is not None:
                manifest_rows.append(
                    write_table_partition(
                        pa.Table.from_pylist([], schema=schema), path, b, sort_keys
                    )
                )
    return sorted(manifest_rows, key=lambda r: r["partition"])


def read_table_dir(path: str) -> pa.Table:
    files = sorted(
        os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet")
    )
    return pa.concat_tables([pq.read_table(f) for f in files]) if files else None
