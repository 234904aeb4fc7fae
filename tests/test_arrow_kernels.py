"""Property tests pinning the round-4 Arrow/numpy hot-path kernels to
straightforward pandas reference implementations — the kernels replaced
pandas round-trips in the Phase-A writers and must stay semantically
identical (the table byte-identity e2e checks depend on them)."""

from __future__ import annotations

import json
import random

import pandas as pd
import pyarrow as pa
import pytest

from medical_doc_knowledge_graph_system_ray.stages.materialize import (
    _first_per_group,
    _map_dict_col,
    remap_mentions_batch,
    remap_triples_batch,
)


def _random_mentions(rng: random.Random, n: int) -> pa.Table:
    names = [f"name{rng.randrange(12)}" for _ in range(n)]
    return pa.table({
        "kind": pa.array(["m"] * n),
        "chunk_id": pa.array([f"c{rng.randrange(6)}" for _ in range(n)]),
        "doc_id": pa.array([f"d{rng.randrange(4)}" for _ in range(n)]),
        "name": pa.array(names),
        "label": pa.array([rng.choice(["Condition", "Symptom", "Vital"])
                           for _ in range(n)]),
        "confidence": pa.array([round(rng.choice([0.5, 0.7, 0.9]), 2)
                                for _ in range(n)], pa.float32()),
        "method": pa.array(["rule"] * n),
        "props": pa.array([json.dumps({"k": str(rng.randrange(3))})
                           for _ in range(n)]),
        "order_key": pa.array([f"ok{idx:06d}" for idx in range(n)]),
    })


def test_map_dict_col_matches_get():
    rng = random.Random(5)
    vals = [f"v{rng.randrange(20)}" for _ in range(500)]
    mapping = {f"v{i}": f"canon{i % 4}" for i in range(0, 20, 2)}
    out = _map_dict_col(pa.chunked_array([vals[:200], vals[200:]]), mapping)
    assert out.to_pylist() == [mapping.get(v, v) for v in vals]


def test_first_per_group_matches_pandas():
    rng = random.Random(6)
    n = 800
    t = pa.table({
        "a": pa.array([f"a{rng.randrange(7)}" for _ in range(n)]),
        "b": pa.array([f"b{rng.randrange(5)}" for _ in range(n)]),
        "payload": pa.array(list(range(n))),
    })
    got = _first_per_group(t, ["a", "b"]).to_pandas()
    want = (t.to_pandas().drop_duplicates(subset=["a", "b"], keep="first")
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)


def test_first_per_group_overflow_compaction():
    # force the int64-overflow compaction branch: per-column dictionary
    # cardinality is bounded by the row count, so 8 near-distinct key
    # columns give a code-space product ~190^10 >> 2^62
    n = 300
    rng = random.Random(7)
    ncols = 10
    cols = {f"k{j}": pa.array([f"{rng.randrange(n)}" for _ in range(n)])
            for j in range(ncols)}
    t = pa.table({**cols, "payload": pa.array(list(range(n)))})
    got = _first_per_group(t, [f"k{j}" for j in range(ncols)]).to_pandas()
    want = (t.to_pandas()
            .drop_duplicates(subset=[f"k{j}" for j in range(ncols)],
                             keep="first")
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)


def test_remap_mentions_matches_pandas_reference():
    rng = random.Random(8)
    batch = _random_mentions(rng, 600)
    name_map = {f"name{i}": f"Canon{i % 3}" for i in range(0, 12, 3)}

    got = remap_mentions_batch(batch, name_map).to_pandas()

    df = batch.to_pandas()
    canon = df["name"].map(name_map)
    df["canonical_name"] = canon.where(canon.notna(), df["name"])
    df = df.sort_values(["confidence", "order_key"], ascending=[False, True],
                        kind="stable")
    df = df.drop_duplicates(subset=["chunk_id", "canonical_name", "label"],
                            keep="first").sort_values("order_key", kind="stable")
    df["mention_id"] = df["chunk_id"] + "#" + df["order_key"]
    df = df.rename(columns={"method": "extraction_method",
                            "props": "properties"})
    want = df[list(got.columns)].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_remap_triples_matches_pandas_reference():
    rng = random.Random(9)
    n = 500
    batch = pa.table({
        "kind": pa.array(["t"] * n),
        "subj": pa.array([f"name{rng.randrange(12)}" for _ in range(n)]),
        "subj_label": pa.array([rng.choice(["Patient", "Condition"])
                                for _ in range(n)]),
        "pred": pa.array([rng.choice(["HAS_CONDITION", "HAS_VITAL"])
                          for _ in range(n)]),
        "obj": pa.array([f"name{rng.randrange(12)}" for _ in range(n)]),
        "obj_label": pa.array([rng.choice(["Condition", "Vital"])
                               for _ in range(n)]),
        "confidence": pa.array([rng.choice([0.6, 0.8]) for _ in range(n)],
                               pa.float32()),
        "props": pa.array([json.dumps({"value": str(rng.randrange(4))})
                           for _ in range(n)]),
        "chunk_id": pa.array([f"c{rng.randrange(9)}" for _ in range(n)]),
    })
    name_map = {f"name{i}": f"Canon{i % 3}" for i in range(0, 12, 2)}

    got = remap_triples_batch(batch, name_map, None).to_pandas()

    df = batch.to_pandas().drop(columns=["kind"])
    is_pat_s = df["subj_label"] == "Patient"
    mapped_s = df["subj"].map(name_map)
    df["subj"] = df["subj"].where(is_pat_s,
                                  mapped_s.where(mapped_s.notna(), df["subj"]))
    mapped_o = df["obj"].map(name_map)
    df["obj"] = mapped_o.where(mapped_o.notna(), df["obj"])  # no Patient objs
    vital = df["obj_label"] == "Vital"
    vals = df.loc[vital, "props"].map(lambda p: json.loads(p).get("value", ""))
    df.loc[vital, "obj"] = df.loc[vital, "obj"] + "_" + vals
    grp = (df.groupby(["subj", "pred", "obj"], sort=False)
           .agg(subj_label=("subj_label", "first"),
                obj_label=("obj_label", "first"),
                confidence=("confidence", "max"),
                chunk_id=("chunk_id", "min"))
           .reset_index())
    want = grp[list(got.columns)]
    key = ["subj", "pred", "obj"]
    got_s = got.sort_values(key).reset_index(drop=True)
    want_s = want.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got_s, want_s)


def test_remap_mentions_empty():
    empty = _random_mentions(random.Random(1), 0)
    out = remap_mentions_batch(empty, {})
    assert out.num_rows == 0
