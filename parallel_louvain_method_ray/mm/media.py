"""Multimodal columns: opaque binary payloads + typed metadata.

Two payload families coexist:

- **Fake** (`synthesize_media` / `MediaDecoder(fake=True)`): a header-only
  deterministic payload whose metadata is SQL-recomputable without any
  decoding — used by the original `media_features` / `frame_sample`
  oracles.
- **Real** (`synthesize_media_real` + the `decode_*_features` stages):
  genuine PNG / WAV / RVID bytes built by `mm.codecs` from splitmix64-
  derived pixels and samples. The decode stages run the REAL codecs
  (zlib inflate + scanline unfilter, PCM16 parse, frame seek) and emit
  features from the DECODED data; the DuckDB oracle regenerates the same
  pixels/samples via the `_mix_ctes` SQL splitmix64 and aggregates — a
  broken codec breaks the hash compare, so the real decode path is
  oracle-gated end-to-end.

The Ray-side plumbing is shared: schema, small-batch actor-pool
map_batches (wide binary rows), zero-copy Arrow in/out.

Fake payload format (deterministic from doc_id):
    b"FAKEMEDIA" | kind(1B: I/A/V) | width(4B LE) | height(4B LE)
    | n_frames(4B LE) | blob (splitmix-derived bytes)
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa
import ray.data

from parallel_louvain_method_ray.mm.codecs import (
    png_decode,
    png_encode,
    rvid_encode,
    rvid_frame,
    rvid_n_frames,
    wav_decode,
    wav_encode,
)
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


_U64 = np.uint64


def _mix_np(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer — bit-identical to `web.pages._mix`
    (and to the `_mix_ctes` SQL reproduction); uint64 wraparound is numpy's
    native unsigned overflow."""
    x = x.astype(np.uint64) + _U64(0x9E3779B97F4A7C15)
    x = (x ^ (x >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> _U64(27))) * _U64(0x94D049BB133111EB)
    return x ^ (x >> _U64(31))


# real-payload geometry/seed constants — the DuckDB oracles in
# pipelines/queries.py reproduce these EXACT expressions in SQL
IMG_PIX_SEED = 2_000_003
AUD_SAMP_SEED = 4_099
VID_PIX_SEED = 65_537
VID_FRAME_STRIDE = 257
VID_FRAME_W = VID_FRAME_H = 8


def _real_image(i: int) -> tuple[bytes, int, int]:
    w = 8 + _mix(i * 3 + 1) % 9
    h = 8 + _mix(i * 5 + 2) % 9
    p = np.arange(w * h, dtype=np.uint64) + _U64(i * IMG_PIX_SEED + 7)
    px = (_mix_np(p) & _U64(0xFF)).astype(np.uint8).reshape(h, w)
    return png_encode(px), w, h


def _real_audio(i: int) -> tuple[bytes, int]:
    n = 64 + _mix(i * 7 + 3) % 193
    j = np.arange(n, dtype=np.uint64) + _U64(i * AUD_SAMP_SEED)
    s = ((_mix_np(j) % _U64(65536)).astype(np.int64) - 32768).astype(np.int16)
    return wav_encode(s, 8000), n


def _real_video(i: int) -> tuple[bytes, int]:
    f = 2 + _mix(i * 7 + 3) % 7
    frames = []
    npix = VID_FRAME_W * VID_FRAME_H
    for fr in range(f):
        p = np.arange(npix, dtype=np.uint64) + _U64(
            i * VID_PIX_SEED + fr * VID_FRAME_STRIDE
        )
        px = (
            (_mix_np(p) & _U64(0xFF))
            .astype(np.uint8)
            .reshape(VID_FRAME_H, VID_FRAME_W)
        )
        frames.append(png_encode(px))
    return rvid_encode(frames), f


def synthesize_media_real(
    ids: ray.data.Dataset, id_column: str = "doc_id"
) -> ray.data.Dataset:
    """Deterministic REAL media table: genuine PNG / WAV / RVID payloads
    whose pixels/samples are splitmix64-derived (SQL-recomputable)."""

    def gen(batch: pa.Table) -> pa.Table:
        out = {
            k: []
            for k in ("media_id", "kind", "payload", "width", "height", "n_frames")
        }
        for i in batch.column(id_column).to_numpy(zero_copy_only=False).tolist():
            i = int(i)
            kind = _KINDS[_mix(i * 11 + 5) % 3]
            if kind == "image":
                payload, w, h = _real_image(i)
                frames = 1
            elif kind == "audio":
                payload, n = _real_audio(i)
                w = h = 0
                frames = 1
            else:
                payload, frames = _real_video(i)
                w, h = VID_FRAME_W, VID_FRAME_H
            out["media_id"].append(i)
            out["kind"].append(kind)
            out["payload"].append(payload)
            out["width"].append(w)
            out["height"].append(h)
            out["n_frames"].append(frames)
        return pa.Table.from_pydict(out, schema=MEDIA_SCHEMA)

    return ids.map_batches(gen, batch_format="pyarrow")


def decode_image_features(media: ray.data.Dataset) -> ray.data.Dataset:
    """REAL PNG decode (zlib inflate + scanline unfilter) -> integer pixel
    aggregates. Output: (media_id, width, height, px_sum, px_min, px_max)."""

    def stage(batch: pa.Table) -> pa.Table:
        ids, ws, hs, sums, mins, maxs = [], [], [], [], [], []
        kinds = batch.column("kind").to_pylist()
        mids = batch.column("media_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        for mid, kind, payload in zip(mids, kinds, payloads):
            if kind != "image":
                continue
            px = png_decode(payload)
            ids.append(mid)
            hs.append(px.shape[0])
            ws.append(px.shape[1])
            sums.append(int(px.sum(dtype=np.int64)))
            mins.append(int(px.min()))
            maxs.append(int(px.max()))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "width": pa.array(ws, pa.int32()),
                "height": pa.array(hs, pa.int32()),
                "px_sum": pa.array(sums, pa.int64()),
                "px_min": pa.array(mins, pa.int64()),
                "px_max": pa.array(maxs, pa.int64()),
            }
        )

    return media.map_batches(stage, batch_format="pyarrow", batch_size=64)


def decode_audio_features(media: ray.data.Dataset) -> ray.data.Dataset:
    """REAL WAV decode (stdlib PCM16 parse) -> sample aggregates.
    Output: (media_id, n_samples, abs_sum, zero_crossings); a zero
    crossing is a sign flip between consecutive samples (x<0 boundary)."""

    def stage(batch: pa.Table) -> pa.Table:
        ids, ns, abss, zcs = [], [], [], []
        kinds = batch.column("kind").to_pylist()
        mids = batch.column("media_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        for mid, kind, payload in zip(mids, kinds, payloads):
            if kind != "audio":
                continue
            s, _rate = wav_decode(payload)
            ids.append(mid)
            ns.append(len(s))
            abss.append(int(np.abs(s.astype(np.int64)).sum()))
            zcs.append(int(np.count_nonzero((s[:-1] < 0) != (s[1:] < 0))))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "n_samples": pa.array(ns, pa.int64()),
                "abs_sum": pa.array(abss, pa.int64()),
                "zero_crossings": pa.array(zcs, pa.int64()),
            }
        )

    return media.map_batches(stage, batch_format="pyarrow", batch_size=64)


def decode_video_frame_features(
    media: ray.data.Dataset, every_k: int = 3
) -> ray.data.Dataset:
    """REAL frame sampling: seek to every k-th frame via the RVID offset
    table and PNG-decode ONLY those frames (the others are never inflated).
    Output: (media_id, frame_idx, frame_px_sum)."""

    def stage(batch: pa.Table) -> pa.Table:
        ids, idxs, sums = [], [], []
        kinds = batch.column("kind").to_pylist()
        mids = batch.column("media_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        for mid, kind, payload in zip(mids, kinds, payloads):
            if kind != "video":
                continue
            n = rvid_n_frames(payload)
            for k in range(0, n, every_k):
                px = png_decode(rvid_frame(payload, k))
                ids.append(mid)
                idxs.append(k)
                sums.append(int(px.sum(dtype=np.int64)))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(idxs, pa.int64()),
                "frame_px_sum": pa.array(sums, pa.int64()),
            }
        )

    return media.map_batches(stage, batch_format="pyarrow", batch_size=64)


class MediaDecoder:
    """Actor-pool decode/feature stage. fake=True derives features from
    the FAKEMEDIA header blob (header-only, SQL-oracle path); fake=False
    runs the REAL codecs (mm.codecs PNG/WAV/RVID) and histograms the
    decoded pixels/samples."""

    FEATURE_DIM = 8

    def __init__(self, fake: bool = True) -> None:
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

    def _decode_real(self, payload: bytes) -> tuple[int, int, int, np.ndarray]:
        if payload[:8] == b"\x89PNG\r\n\x1a\n":
            px = png_decode(payload)
            vals = px.reshape(-1) >> 5
            h, w, frames = px.shape[0], px.shape[1], 1
        elif payload[:4] == b"RIFF":
            s, _rate = wav_decode(payload)
            vals = ((s.astype(np.int64) + 32768) >> 13).astype(np.uint8)
            h = w = 0
            frames = 1
        elif payload[:4] == b"RVID":
            frames = rvid_n_frames(payload)
            px = png_decode(rvid_frame(payload, 0))
            vals = px.reshape(-1) >> 5
            h, w = px.shape[0], px.shape[1]
        else:
            raise ValueError("unknown media payload")
        hist = np.bincount(vals, minlength=self.FEATURE_DIM).astype(np.float32)
        s = hist.sum()
        return w, h, frames, hist / (s if s else 1.0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_numpy(zero_copy_only=False)
        decode = self._decode if self.fake else self._decode_real
        feats, ws, hs, fs = [], [], [], []
        for payload in batch.column("payload").to_pylist():
            w, h, fr, feat = decode(payload)
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
    fake: bool = True,
) -> ray.data.Dataset:
    """Wide binary rows -> SMALL batches through the actor pool (batch x
    concurrency sized to worker heap; SURVEY §4.2 block-size note)."""
    return media.map_batches(
        MediaDecoder,
        fn_constructor_kwargs={"fake": fake},
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
