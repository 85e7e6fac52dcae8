"""Multimodal (binary-column) stages: decode / feature-extract plumbing.

Images/audio/video are opaque ``binary`` columns with typed metadata.  The
Ray-side plumbing — schema, actor-pool signatures, small batch sizes for
large payloads, output layout — is real and tested; the codec itself is
STUBBED (no image/audio libraries exist in this container): ``DecodeImage``
raises ``NotImplementedError`` unless ``fake=True``, in which case a
deterministic fake decoder (parse of our synthetic header) stands in.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),       # "image" | "audio"
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
    ]
)

_MAGIC = b"FAKEIMG1"


def synth_media_dataset(n_items: int, seed: int = 42):
    """Deterministic fake media table: payload = magic + w,h + pixel bytes."""
    import ray.data as rd

    def make(batch) -> pa.Table:
        rows = []
        for i in batch["id"]:
            rng = np.random.RandomState(seed * 7919 + int(i))
            w, h = int(rng.randint(8, 33)), int(rng.randint(8, 33))
            pixels = rng.randint(0, 256, size=w * h, dtype=np.int64).astype(np.uint8)
            payload = _MAGIC + w.to_bytes(2, "big") + h.to_bytes(2, "big") + pixels.tobytes()
            rows.append({
                "media_id": int(i), "kind": "image", "payload": payload,
                "width": w, "height": h,
            })
        return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)

    return rd.range(n_items).map_batches(make, batch_format="numpy", batch_size=256)


class DecodeImage:
    """Actor-pool decode stage (small batches: payloads are large).

    Real deployments plug a codec (PIL/libjpeg) into ``_decode``; here the
    deterministic fake parses the synthetic header.  ``fake=False`` raises
    NotImplementedError at init, making the stub explicit.
    """

    def __init__(self, fake: bool = True):
        if not fake:
            raise NotImplementedError(
                "no image codec available in this environment; use fake=True"
            )

    @staticmethod
    def _decode(payload: bytes) -> np.ndarray:
        if not payload.startswith(_MAGIC):
            raise ValueError("bad magic")
        w = int.from_bytes(payload[8:10], "big")
        h = int.from_bytes(payload[10:12], "big")
        return np.frombuffer(payload[12:12 + w * h], dtype=np.uint8).reshape(h, w)

    def __call__(self, t: pa.Table) -> pa.Table:
        means, stds = [], []
        for payload in t["payload"].to_pylist():
            img = self._decode(payload)
            means.append(int(img.mean() * 1000))
            stds.append(int(img.std() * 1000))
        return pa.table({
            "media_id": t["media_id"],
            "mean_milli": pa.array(means, pa.int64()),
            "std_milli": pa.array(stds, pa.int64()),
        })


def _decode_features(ds, concurrency: int = 2):
    return ds.map_batches(
        DecodeImage, batch_format="pyarrow", batch_size=32,
        concurrency=concurrency,
    ).sort("media_id")


def media_features(n_items: int = 256, concurrency: int = 2):
    """Synth -> decode -> per-item features (batch_size kept small on
    purpose: payload bytes dominate block memory)."""
    return _decode_features(synth_media_dataset(n_items), concurrency)


def media_from_documents(sf_dir: str, batch_size: int = 64):
    """Deterministic media table DERIVED FROM TESTDATA: each document's
    text bytes are tiled into a fake image payload whose dimensions are a
    pure function of (doc_id, text length).  The decode stage therefore
    consumes real parquet-read bytes end-to-end (driver rows-check), while
    the codec itself stays the documented stub."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def to_media(t: pa.Table) -> pa.Table:
        rows = []
        for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            data = text.encode() or b"\x00"
            w = 8 + (len(data) % 25)
            h = 8 + (int(doc_id) % 25)
            need = w * h
            pixels = (data * (need // len(data) + 1))[:need]
            payload = _MAGIC + w.to_bytes(2, "big") + h.to_bytes(2, "big") + pixels
            rows.append({
                "media_id": int(doc_id), "kind": "image", "payload": payload,
                "width": w, "height": h,
            })
        return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)

    return ds.map_batches(to_media, batch_format="pyarrow", batch_size=batch_size)


def media_features_from_documents(sf_dir: str, concurrency: int = 2):
    """sf_dir-driven decode + feature pipeline (the driver's media query)."""
    return _decode_features(media_from_documents(sf_dir), concurrency)
