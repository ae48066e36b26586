"""Real media codecs (mm/codecs.py) + the real decode stages.

The codecs are stdlib-only (zlib/struct/wave + numpy); correctness is
pinned two ways: lossless roundtrips here, and the DuckDB splitmix64
oracles (`media_image_decode` / `media_audio_decode` /
`media_video_frames` in pipelines/queries.py) that recompute the decoded
aggregates from the generator side.
"""

import numpy as np
import pyarrow as pa
import pytest
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
from parallel_louvain_method_ray.mm.media import (
    MediaDecoder,
    decode_audio_features,
    decode_features,
    decode_image_features,
    decode_video_frame_features,
    synthesize_media_real,
)


@pytest.mark.parametrize(
    "shape",
    [(1, 1), (7, 5), (16, 16), (33, 17), (9, 13, 3), (32, 24, 3), (2, 3, 3)],
)
def test_png_roundtrip_lossless(shape):
    rng = np.random.default_rng(hash(shape) & 0xFFFF)
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    dec = png_decode(png_encode(img))
    assert dec.shape == img.shape
    assert np.array_equal(dec, img)


def test_png_all_five_filters_exercised():
    # the encoder cycles filter = row % 5, so >=5 rows covers
    # None/Sub/Up/Average/Paeth in one image
    img = np.arange(6 * 8 * 3, dtype=np.uint64)
    img = (img * 2654435761 % 256).astype(np.uint8).reshape(6, 8, 3)
    data = png_encode(img)
    import struct
    import zlib

    # pull the raw scanlines back out and check the filter bytes really
    # cycle 0..4 (guards against the encoder silently falling back to 0)
    pos = 8
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        if tag == b"IDAT":
            idat += data[pos + 8 : pos + 8 + length]
        pos += 12 + length
    raw = zlib.decompress(idat)
    stride = 8 * 3 + 1
    filters = [raw[y * stride] for y in range(6)]
    assert filters == [0, 1, 2, 3, 4, 0]
    assert np.array_equal(png_decode(data), img)


def test_png_rejects_garbage():
    with pytest.raises(ValueError):
        png_decode(b"not a png at all")


def test_wav_roundtrip_exact():
    rng = np.random.default_rng(7)
    s = rng.integers(-32768, 32768, size=777).astype(np.int16)
    data = wav_encode(s, 8000)
    dec, rate = wav_decode(data)
    assert rate == 8000
    assert np.array_equal(dec, s)
    assert data[:4] == b"RIFF"


def test_rvid_random_access():
    rng = np.random.default_rng(11)
    frames = [
        png_encode(rng.integers(0, 256, size=(8, 8), dtype=np.uint8))
        for _ in range(6)
    ]
    v = rvid_encode(frames)
    assert rvid_n_frames(v) == 6
    # frame k extraction is exact and independent of the others
    for k in (0, 3, 5):
        assert rvid_frame(v, k) == frames[k]
    with pytest.raises(IndexError):
        rvid_frame(v, 6)


def _ids(n):
    return ray.data.from_arrow(
        pa.table({"doc_id": pa.array(range(n), pa.int64())})
    )


def test_real_decode_stages_match_generator():
    """End-to-end: synthesize real PNG/WAV/RVID payloads, run the decode
    stages, and recompute the aggregates from the generator side (the
    same check the DuckDB oracle performs, kept here so a codec
    regression fails fast without the SQL harness)."""
    from parallel_louvain_method_ray.mm.media import (
        _mix_np,
        _real_audio,
        _real_image,
        _real_video,
        _U64,
    )
    from parallel_louvain_method_ray.web.pages import _mix

    n = 60
    media = synthesize_media_real(_ids(n))

    img = decode_image_features(media).to_pandas().set_index("media_id")
    aud = decode_audio_features(media).to_pandas().set_index("media_id")
    vid = (
        decode_video_frame_features(media, every_k=3)
        .to_pandas()
        .groupby("media_id")
    )

    kinds = {i: _mix(i * 11 + 5) % 3 for i in range(n)}
    assert set(img.index) == {i for i, k in kinds.items() if k == 0}
    assert set(aud.index) == {i for i, k in kinds.items() if k == 1}
    assert set(vid.groups) == {i for i, k in kinds.items() if k == 2}

    for i, k in kinds.items():
        if k == 0:
            payload, w, h = _real_image(i)
            px = png_decode(payload)
            row = img.loc[i]
            assert (row.width, row.height) == (w, h)
            assert row.px_sum == int(px.sum(dtype=np.int64))
            assert row.px_min == int(px.min())
            assert row.px_max == int(px.max())
        elif k == 1:
            payload, n_samp = _real_audio(i)
            s, _ = wav_decode(payload)
            row = aud.loc[i]
            assert row.n_samples == n_samp == len(s)
            assert row.abs_sum == int(np.abs(s.astype(np.int64)).sum())
            assert row.zero_crossings == int(
                np.count_nonzero((s[:-1] < 0) != (s[1:] < 0))
            )
        else:
            payload, f = _real_video(i)
            got = vid.get_group(i).set_index("frame_idx")
            assert list(got.index) == list(range(0, f, 3))
            for fr in range(0, f, 3):
                px = png_decode(rvid_frame(payload, fr))
                assert got.loc[fr].frame_px_sum == int(px.sum(dtype=np.int64))


def test_media_decoder_real_mode():
    """MediaDecoder(fake=False) dispatches on payload magic and decodes
    for real — the round-2 NotImplementedError stub is gone."""
    media = synthesize_media_real(_ids(24))
    feats = decode_features(media, concurrency=2, batch_size=8, fake=False)
    df = feats.to_pandas()
    assert len(df) == 24
    # every feature is an L1-normed 8-bin histogram of DECODED data
    for f in df.feature:
        assert len(f) == MediaDecoder.FEATURE_DIM
        assert abs(sum(f) - 1.0) < 1e-5


def test_mix_np_matches_scalar():
    from parallel_louvain_method_ray.mm.media import _mix_np
    from parallel_louvain_method_ray.web.pages import _mix

    xs = np.array([0, 1, 2, 12345, 2**63, 2**64 - 1], dtype=np.uint64)
    got = _mix_np(xs)
    want = [_mix(int(x)) for x in xs.tolist()]
    assert got.tolist() == want
