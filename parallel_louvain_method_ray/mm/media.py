"""Multimodal columns: opaque binary payloads + typed metadata.

The image/audio/video decode libraries are NOT in this container, so the
decode kernels are STUBBED (a deterministic fake behind `fake=True`, and a
clearly-marked NotImplementedError on the real path). The Ray-side plumbing
is real and tested: schema, small-batch actor-pool map_batches (wide binary
rows), zero-copy Arrow in/out, feature/frame output layout.

Fake payload format (deterministic from doc_id):
    b"FAKEMEDIA" | kind(1B: I/A/V) | width(4B LE) | height(4B LE)
    | n_frames(4B LE) | blob (splitmix-derived bytes)
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa
import ray.data

from parallel_louvain_method_ray.web.pages import _mix

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # "image" | "audio" | "video"
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("n_frames", pa.int32()),
    ]
)

_KINDS = ["image", "audio", "video"]
_MAGIC = b"FAKEMEDIA"


def _fake_payload(i: int) -> tuple[str, bytes, int, int, int]:
    kind = _KINDS[_mix(i * 11 + 5) % 3]
    w = 16 + _mix(i * 3 + 1) % 48
    h = 16 + _mix(i * 5 + 2) % 48
    frames = 1 if kind == "image" else 8 + _mix(i * 7 + 3) % 24
    blob_len = 64 + _mix(i * 13 + 4) % 192
    blob = bytes(
        (_mix(i * 1_000_003 + j) & 0xFF) for j in range(blob_len)
    )
    payload = (
        _MAGIC
        + kind[0].upper().encode()
        + struct.pack("<iii", w, h, frames)
        + blob
    )
    return kind, payload, w, h, frames


def synthesize_media(
    ids: ray.data.Dataset, id_column: str = "doc_id"
) -> ray.data.Dataset:
    """Deterministic fake media table over an id universe."""

    def gen(batch: pa.Table) -> pa.Table:
        out = {k: [] for k in ("media_id", "kind", "payload", "width", "height", "n_frames")}
        for i in batch.column(id_column).to_numpy(zero_copy_only=False).tolist():
            kind, payload, w, h, f = _fake_payload(int(i))
            out["media_id"].append(int(i))
            out["kind"].append(kind)
            out["payload"].append(payload)
            out["width"].append(w)
            out["height"].append(h)
            out["n_frames"].append(f)
        return pa.Table.from_pydict(out, schema=MEDIA_SCHEMA)

    return ids.map_batches(gen, batch_format="pyarrow")


class MediaDecoder:
    """Actor-pool decode/feature stage. Real decoders (PIL/ffmpeg/librosa)
    would be loaded ONCE here in __init__; this container has none, so the
    stub either raises (real mode) or derives deterministic features from
    the payload header (fake mode)."""

    FEATURE_DIM = 8

    def __init__(self, fake: bool = True) -> None:
        if not fake:
            raise NotImplementedError(
                "real media decoding requires PIL/ffmpeg/librosa — not "
                "available in this environment; run with fake=True"
            )
        self.fake = fake

    def _decode(self, payload: bytes) -> tuple[int, int, int, np.ndarray]:
        if not payload.startswith(_MAGIC):
            raise ValueError("not a FAKEMEDIA payload")
        w, h, frames = struct.unpack("<iii", payload[10:22])
        blob = np.frombuffer(payload[22:], dtype=np.uint8)
        # deterministic 8-dim "feature": bucketed byte histogram, L1-normed
        hist = np.bincount(blob >> 5, minlength=self.FEATURE_DIM).astype(np.float32)
        s = hist.sum()
        return w, h, frames, hist / (s if s else 1.0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_numpy(zero_copy_only=False)
        feats, ws, hs, fs = [], [], [], []
        for payload in batch.column("payload").to_pylist():
            w, h, fr, feat = self._decode(payload)
            ws.append(w)
            hs.append(h)
            fs.append(fr)
            feats.append(feat)
        return pa.table(
            {
                "media_id": ids,
                "width": pa.array(ws, pa.int32()),
                "height": pa.array(hs, pa.int32()),
                "n_frames": pa.array(fs, pa.int32()),
                "feature": pa.array(
                    [f.tolist() for f in feats], pa.list_(pa.float32())
                ),
            }
        )


def decode_features(
    media: ray.data.Dataset,
    concurrency: int | tuple[int, int] = 2,
    batch_size: int = 64,
) -> ray.data.Dataset:
    """Wide binary rows -> SMALL batches through the actor pool (batch x
    concurrency sized to worker heap; SURVEY §4.2 block-size note)."""
    return media.map_batches(
        MediaDecoder,
        fn_constructor_kwargs={"fake": True},
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )


def sample_frames(
    media: ray.data.Dataset, every_k: int = 4
) -> ray.data.Dataset:
    """video rows -> (media_id, frame_idx) for every k-th frame — the frame
    sampling layout (decode itself is stubbed)."""

    def sample(batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_numpy(zero_copy_only=False)
        kinds = batch.column("kind").to_pylist()
        frames = batch.column("n_frames").to_numpy(zero_copy_only=False)
        out_id, out_fr = [], []
        for i in range(len(ids)):
            if kinds[i] != "video":
                continue
            idx = np.arange(0, frames[i], every_k, dtype=np.int64)
            out_id.append(np.full(idx.shape[0], ids[i], dtype=np.int64))
            out_fr.append(idx)
        return pa.table(
            {
                "media_id": np.concatenate(out_id) if out_id else np.empty(0, np.int64),
                "frame_idx": np.concatenate(out_fr) if out_fr else np.empty(0, np.int64),
            }
        )

    return media.map_batches(sample, batch_format="pyarrow")
