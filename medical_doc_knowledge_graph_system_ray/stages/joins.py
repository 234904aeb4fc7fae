"""Distributed joins.

Two patterns (guide §joins):

* broadcast join — small side shipped once via ray.put, lookup inside
  map_batches (see queries.region_customer_counts);
* partitioned hash join — BOTH sides large: add bucket = hash(key) % B
  to each side, co-group per bucket, pyarrow hash-join inside the bucket
  task. Skewed keys would be salted into sub-buckets (same discipline as
  resolution._salt_block); B is the explicit partitioning contract.

Implemented over raw Ray tasks with the same grouped-split exchange as
sources/io.py (Dataset.groupby's sort shuffle is ~10x slower at this
row count); each bucket join task receives the bucket's slices of both
sides through the object store. The joined output NEVER materializes on
the driver: each bucket's table stays in the object store and the
result is returned as a Ray Dataset over those block refs
(``from_arrow_refs``) — callers stream it into aggregates/writes.
"""

from __future__ import annotations

import pyarrow as pa

from ..sources.io import _grouped_refs, bucket_of

_JOIN_TYPE = {
    "inner": "inner",
    "left": "left outer",
    "right": "right outer",
    "outer": "full outer",
}


def _arrow_schema(ds) -> pa.Schema:
    s = ds.schema()
    base = getattr(s, "base_schema", None)
    if isinstance(base, pa.Schema):
        return base
    fields = []
    for n, t in zip(s.names, s.types):
        if isinstance(t, pa.DataType):
            fields.append((n, t))
        else:  # pandas-block schema: numpy dtype (object -> string)
            try:
                fields.append((n, pa.from_numpy_dtype(t)))
            except (TypeError, pa.ArrowNotImplementedError):
                fields.append((n, pa.string()))
    return pa.schema(fields)


def hash_join(left_ds, right_ds, on: str, num_buckets: int = 32,
              how: str = "inner"):
    """Partitioned hash join of two Datasets on an int/str key column.

    Returns a Ray Dataset of the joined rows (one block per bucket, held
    in the object store — no driver-side concat). Row order within a
    bucket follows pyarrow's hash join and is not part of the contract;
    callers aggregate or sort downstream.
    """
    import numpy as np
    import ray
    import ray.data as rd

    B = num_buckets
    join_type = _JOIN_TYPE[how]
    left_schema = _arrow_schema(left_ds)
    right_schema = _arrow_schema(right_ds)

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
        # empty sides keep their declared schema so every bucket block has
        # the identical joined schema (required by from_arrow_refs)
        l = (pa.concat_tables(lefts, promote_options="default") if lefts
             else pa.Table.from_pylist([], schema=left_schema))
        r = (pa.concat_tables(rights, promote_options="default") if rights
             else pa.Table.from_pylist([], schema=right_schema))
        out = l.join(r, keys=on, join_type=join_type)
        # deterministic column order: left schema then right non-key columns
        cols = list(left_schema.names) + [c for c in right_schema.names if c != on]
        return out.select(cols).combine_chunks()

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
    # Hold the split handles until every bucket join has RUN (not just been
    # submitted): dependency resolution happens asynchronously on the core
    # worker's io thread, and letting this frame's split refs be GC'd while
    # a join_bucket's inlined-arg bookkeeping is still in flight races
    # Ray's reference counter (observed as a fatal
    # "Check failed: submitted_task_ref_count > 0" driver crash).
    # fetch_local=False: this waits for completion without pulling any
    # bucket block to the driver.
    ray.wait(futs, num_returns=len(futs), fetch_local=False)
    return rd.from_arrow_refs(futs)
