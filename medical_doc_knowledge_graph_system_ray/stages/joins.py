"""Distributed joins.

Two patterns (guide §joins):

* broadcast join — small side shipped once via ray.put, lookup inside
  map_batches (see queries.region_customer_counts);
* partitioned hash join — BOTH sides large: add bucket = hash(key) % B
  to each side, co-group per bucket, pandas merge inside the bucket
  task. Skewed keys would be salted into sub-buckets (same discipline as
  resolution._salt_block); B is the explicit partitioning contract.

Implemented over raw Ray tasks with the same grouped-split exchange as
sources/io.py (Dataset.groupby's sort shuffle is ~10x slower at this
row count); each bucket join task receives the bucket's slices of both
sides through the object store.
"""

from __future__ import annotations

import pyarrow as pa

from ..sources.io import _grouped_refs, bucket_of


def hash_join(left_ds, right_ds, on: str, num_buckets: int = 32,
              how: str = "inner") -> pa.Table:
    """Partitioned hash join of two Datasets on an int/str key column.

    Returns the concatenated joined table (callers typically aggregate
    right after; for huge outputs, write per-bucket instead of concat)."""
    import numpy as np
    import ray

    B = num_buckets

    @ray.remote(num_returns=B)
    def split(*blocks: pa.Table):
        block = pa.concat_tables([b for b in blocks if b.num_rows > 0],
                                 promote_options="default") \
            if any(b.num_rows for b in blocks) else blocks[0]
        if block.num_rows == 0:
            return tuple(block.slice(0, 0) for _ in range(B)) if B > 1 else block
        keys = [str(v) for v in block.column(on).to_pylist()]
        b = np.asarray(bucket_of(keys, B))
        outs = []
        for k in range(B):
            idx = np.nonzero(b == k)[0]
            outs.append(block.take(pa.array(idx)) if len(idx) else block.slice(0, 0))
        return tuple(outs) if B > 1 else outs[0]

    @ray.remote
    def join_bucket(n_left: int, *parts: pa.Table) -> pa.Table:
        lefts = [t for t in parts[:n_left] if t.num_rows > 0]
        rights = [t for t in parts[n_left:] if t.num_rows > 0]
        if not lefts or (how == "inner" and not rights):
            return parts[0].slice(0, 0) if parts else pa.table({})
        l = pa.concat_tables(lefts, promote_options="default").to_pandas()
        if rights:
            r = pa.concat_tables(rights, promote_options="default").to_pandas()
        else:
            r = pa.concat_tables([parts[n_left]]).to_pandas()
        out = l.merge(r, on=on, how=how)
        return pa.Table.from_pandas(out, preserve_index=False)

    left_groups = _grouped_refs(left_ds)
    right_groups = _grouped_refs(right_ds)
    left_splits = [split.remote(*g) for g in left_groups]
    right_splits = [split.remote(*g) for g in right_groups]
    if B == 1:
        left_splits = [[r] for r in left_splits]
        right_splits = [[r] for r in right_splits]
    futs = []
    for k in range(B):
        args = [ls[k] for ls in left_splits] + [rs[k] for rs in right_splits]
        futs.append(join_bucket.remote(len(left_splits), *args))
    tables = [t for t in ray.get(futs) if t.num_rows > 0]
    if not tables:
        return pa.table({})
    return pa.concat_tables(tables, promote_options="default")
