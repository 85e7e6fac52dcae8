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

    ``fake=True`` (default here) parses the deterministic synthetic
    header.  ``fake=False`` is the real-codec seam: it import-tries PIL
    at actor init (once per actor, the actor-pool rule) and decodes
    grayscale via ``PIL.Image.open``; in THIS container no codec is
    installed, so init raises NotImplementedError with the dependency
    named — the stub is explicit, the plumbing (schema, batch sizing,
    actor signature) identical either way.
    """

    def __init__(self, fake: bool = True):
        self._pil = None
        if not fake:
            try:
                from PIL import Image  # noqa: F401  (absent in this container)

                self._pil = Image
            except ImportError:
                raise NotImplementedError(
                    "fake=False needs an image codec (pip install pillow); "
                    "none is available in this environment"
                ) from None

    @staticmethod
    def _decode(payload: bytes) -> np.ndarray:
        """Synthetic-header codec (the deterministic fake)."""
        if not payload.startswith(_MAGIC):
            raise ValueError("bad magic")
        w = int.from_bytes(payload[8:10], "big")
        h = int.from_bytes(payload[10:12], "big")
        return np.frombuffer(payload[12:12 + w * h], dtype=np.uint8).reshape(h, w)

    def _decode_any(self, payload: bytes) -> np.ndarray:
        if self._pil is not None:
            import io

            return np.asarray(self._pil.open(io.BytesIO(payload)).convert("L"))
        return self._decode(payload)

    def __call__(self, t: pa.Table) -> pa.Table:
        means, stds = [], []
        for payload in t["payload"].to_pylist():
            img = self._decode_any(payload)
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

    from lexmapr_ray.sources.tables import sized_read_parquet

    ds = sized_read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

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


class ResizeImage:
    """Actor-pool resize stage: decode -> integer box-downsample to
    ``target`` x ``target`` -> per-item features of the RESIZED image.

    The downsample is exact integer math (np.add.reduceat over
    floor-divided grid boundaries, block mean floored to uint8) so results
    are engine-independent; a real deployment swaps ``DecodeImage._decode``
    + this kernel for PIL's ``Image.resize``.  Same small-batch actor-pool
    shape as decode: payload bytes dominate block memory, so batch_size
    stays small and the pool scales with ``concurrency``.
    """

    def __init__(self, target: int = 8, fake: bool = True):
        if not fake:
            raise NotImplementedError(
                "no image codec available in this environment; use fake=True"
            )
        self.target = int(target)

    def _resize(self, img: np.ndarray) -> np.ndarray:
        t = self.target
        h, w = img.shape
        rb = (np.arange(t, dtype=np.int64) * h) // t
        cb = (np.arange(t, dtype=np.int64) * w) // t
        sums = np.add.reduceat(np.add.reduceat(img.astype(np.int64), rb, axis=0),
                               cb, axis=1)
        rc = np.diff(np.append(rb, h))
        cc = np.diff(np.append(cb, w))
        return (sums // np.outer(rc, cc)).astype(np.uint8)

    def __call__(self, t: pa.Table) -> pa.Table:
        means, mins, maxs = [], [], []
        for payload in t["payload"].to_pylist():
            small = self._resize(DecodeImage._decode(payload))
            means.append(int(small.mean() * 1000))
            mins.append(int(small.min()))
            maxs.append(int(small.max()))
        return pa.table({
            "media_id": t["media_id"],
            "resized_mean_milli": pa.array(means, pa.int64()),
            "resized_min": pa.array(mins, pa.int64()),
            "resized_max": pa.array(maxs, pa.int64()),
        })


_VMAGIC = b"FAKEVID1"


def video_from_documents(sf_dir: str, batch_size: int = 32):
    """Fake video table derived from testdata: each doc's text bytes are
    tiled into ``n_frames`` (4-11, a function of doc_id) frames of w*h
    pixels.  Payload = magic + n,w,h + frame bytes — an opaque binary
    column with typed metadata, exactly how real video rides a Dataset."""
    import ray.data as rd

    from lexmapr_ray.sources.tables import sized_read_parquet

    ds = sized_read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def to_video(t: pa.Table) -> pa.Table:
        rows = []
        for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            data = text.encode() or b"\x00"
            n = 4 + (int(doc_id) % 8)
            w = 8 + (len(data) % 9)
            h = 8 + (int(doc_id) % 9)
            need = n * w * h
            pixels = (data * (need // len(data) + 1))[:need]
            payload = (_VMAGIC + n.to_bytes(2, "big") + w.to_bytes(2, "big")
                       + h.to_bytes(2, "big") + pixels)
            rows.append({"media_id": int(doc_id), "kind": "video",
                         "payload": payload, "width": w, "height": h})
        return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)

    return ds.map_batches(to_video, batch_format="pyarrow", batch_size=batch_size)


class SampleFrames:
    """Actor-pool frame sampler: every ``stride``-th frame of each video
    decodes to a per-frame feature row (media_id, frame_idx, mean_milli) —
    a flat-map, so one input row fans out to len/stride output rows.

    This is the video-ingest shape for a training pipeline: sample frames
    distributed, THEN treat each frame as an image (the ResizeImage /
    DecodeImage stages compose downstream).  Small batches; payloads big.
    """

    def __init__(self, stride: int = 2, fake: bool = True):
        if not fake:
            raise NotImplementedError(
                "no video codec available in this environment; use fake=True"
            )
        self.stride = int(stride)

    @staticmethod
    def _frames(payload: bytes):
        if not payload.startswith(_VMAGIC):
            raise ValueError("bad magic")
        n = int.from_bytes(payload[8:10], "big")
        w = int.from_bytes(payload[10:12], "big")
        h = int.from_bytes(payload[12:14], "big")
        body = np.frombuffer(payload[14:14 + n * w * h], dtype=np.uint8)
        return body.reshape(n, h, w)

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, idxs, means = [], [], []
        for media_id, payload in zip(t["media_id"].to_pylist(),
                                     t["payload"].to_pylist()):
            frames = self._frames(payload)
            for i in range(0, frames.shape[0], self.stride):
                ids.append(media_id)
                idxs.append(i)
                means.append(int(frames[i].mean() * 1000))
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "frame_idx": pa.array(idxs, pa.int64()),
            "frame_mean_milli": pa.array(means, pa.int64()),
        })


def media_resize_features(sf_dir: str, concurrency: int = 2):
    """sf_dir-driven decode+resize feature pipeline (driver media query)."""
    return media_from_documents(sf_dir).map_batches(
        ResizeImage, batch_format="pyarrow", batch_size=32,
        concurrency=concurrency,
    ).sort("media_id")


def video_frame_features(sf_dir: str, concurrency: int = 2, stride: int = 2):
    """sf_dir-driven frame-sample pipeline (driver media query)."""
    return video_from_documents(sf_dir).map_batches(
        SampleFrames, batch_format="pyarrow", batch_size=32,
        fn_constructor_kwargs={"stride": stride},
        concurrency=concurrency,
    ).sort(["media_id", "frame_idx"])
