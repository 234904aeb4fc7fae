"""Multimodal (image/audio) column plumbing.

Media payloads are opaque binary columns with typed metadata; decode /
feature-extract / resize / frame-sample run as actor-pool map_batches
stages. The image/audio codec libraries are NOT in this container, so
the decode kernel is stubbed behind ``DecodeBackend`` — the Ray-side
plumbing (schema, batch sizing, actor signature, output layout) is real
and tested with the deterministic fake backend.

Batch-size note: binary payloads make rows wide; callers should pass a
small ``batch_size`` (e.g. 32–128) and let blocks stay under
DataContext.target_max_block_size.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_ref", pa.string()),
        ("doc_id", pa.string()),
        ("media_type", pa.string()),   # "image" | "audio" | "video"
        ("payload", pa.binary()),      # opaque encoded bytes
        ("width", pa.int32()),
        ("height", pa.int32()),
    ]
)

MEDIA_FEATURES_SCHEMA = pa.schema(
    [
        ("media_ref", pa.string()),
        ("doc_id", pa.string()),
        ("media_type", pa.string()),
        ("feature", pa.list_(pa.float32())),
        ("decoded_w", pa.int32()),
        ("decoded_h", pa.int32()),
    ]
)


class DecodeBackend:
    """Codec seam. Real deployments plug PIL/ffmpeg here; this container
    has neither, so decode() raises and fake_decode() provides a
    deterministic stand-in derived from the payload hash."""

    def decode(self, payload: bytes, media_type: str) -> np.ndarray:
        raise NotImplementedError(
            "image/audio codecs are not available in this container; "
            "use deterministic_fake=True (see module docstring)"
        )

    def fake_decode(self, payload: bytes, media_type: str) -> np.ndarray:
        h = hashlib.blake2b(payload, digest_size=16).digest()
        rng = np.random.RandomState(int.from_bytes(h[:4], "little"))
        if media_type == "audio":
            return rng.rand(1, 800).astype(np.float32)
        return rng.rand(16, 16).astype(np.float32)


class MediaFeaturizer:
    """Actor-pool stage: decode -> resize/sample -> mean-pooled feature.

    __init__ = model/codec load (once per actor); __call__ = per batch."""

    def __init__(self, feature_dim: int = 64, deterministic_fake: bool = True):
        self.backend = DecodeBackend()
        self.fake = deterministic_fake
        self.dim = feature_dim

    def _featurize(self, arr: np.ndarray) -> np.ndarray:
        flat = arr.ravel()
        out = np.zeros(self.dim, dtype=np.float32)
        n = len(flat) // self.dim * self.dim
        if n:
            out[: self.dim] = flat[:n].reshape(self.dim, -1).mean(axis=1)
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        docs = batch.column("doc_id").to_pylist()
        types = batch.column("media_type").to_pylist()
        payloads = batch.column("payload").to_pylist()
        feats, ws, hs = [], [], []
        for p, t in zip(payloads, types):
            arr = (self.backend.fake_decode(p, t) if self.fake
                   else self.backend.decode(p, t))
            feats.append(self._featurize(arr).tolist())
            hs.append(arr.shape[0])
            ws.append(arr.shape[1] if arr.ndim > 1 else 1)
        return pa.table(
            {
                "media_ref": pa.array(refs, type=pa.string()),
                "doc_id": pa.array(docs, type=pa.string()),
                "media_type": pa.array(types, type=pa.string()),
                "feature": pa.array(feats, type=pa.list_(pa.float32())),
                "decoded_w": pa.array(ws, type=pa.int32()),
                "decoded_h": pa.array(hs, type=pa.int32()),
            }
        )


def media_rows_from_spans(batch: pa.Table) -> pa.Table:
    """documents(spans) -> media table rows with synthetic payloads (the
    payload bytes are a deterministic function of media_ref, standing in
    for object-store reads)."""
    out = {"media_ref": [], "doc_id": [], "media_type": [], "payload": [],
           "width": [], "height": []}
    for doc_id, spans in zip(batch.column("doc_id").to_pylist(),
                             batch.column("spans").to_pylist()):
        for s in spans:
            if s["kind"] != "media":
                continue
            ref = s["media_ref"]
            out["media_ref"].append(ref)
            out["doc_id"].append(doc_id)
            out["media_type"].append("image")
            out["payload"].append(hashlib.blake2b(ref.encode(), digest_size=32).digest())
            out["width"].append(16)
            out["height"].append(16)
    return pa.table({
        "media_ref": pa.array(out["media_ref"], type=pa.string()),
        "doc_id": pa.array(out["doc_id"], type=pa.string()),
        "media_type": pa.array(out["media_type"], type=pa.string()),
        "payload": pa.array(out["payload"], type=pa.binary()),
        "width": pa.array(out["width"], type=pa.int32()),
        "height": pa.array(out["height"], type=pa.int32()),
    })
