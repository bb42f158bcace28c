"""Unit tests for the dependency-free media codecs
(``functions/media.py``) and their use in ``operators/multimodal.py``.
No Spark session needed — these are pure byte-level round trips; the
distributed (mapInPandas) path is certified by the
``multimodal_png_decode`` / ``multimodal_wav_decode`` driver rows and
exercised in ``test_pipeline_ops.py``.
"""

from __future__ import annotations

import numpy as np
import pytest

from approximatequeryengine_spark.functions.media import (
    decode_png,
    decode_wav,
    encode_png,
    encode_wav,
    resize_nearest,
)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_png_roundtrip_all_filters_and_colortypes(filter_type, channels):
    rng = np.random.default_rng(filter_type * 10 + channels)
    arr = rng.integers(0, 256, size=(11, 7, channels), dtype=np.uint8)
    decoded = decode_png(encode_png(arr, filter_type=filter_type))
    assert decoded.shape == (11, 7, channels)
    assert (decoded == arr).all()


def test_png_grayscale_2d_input():
    arr = (np.arange(64, dtype=np.uint8)).reshape(8, 8)
    decoded = decode_png(encode_png(arr))
    assert decoded.shape == (8, 8, 1)
    assert (decoded[:, :, 0] == arr).all()


def test_png_rejects_garbage_and_unsupported():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"not a png at all")
    # 16-bit depth is outside the supported subset: patch IHDR depth.
    payload = bytearray(encode_png(np.zeros((2, 2), dtype=np.uint8)))
    payload[24] = 16  # IHDR bit-depth byte
    with pytest.raises(ValueError, match="unsupported PNG variant"):
        decode_png(bytes(payload))


def test_wav_roundtrip_mono_and_stereo():
    rng = np.random.default_rng(3)
    mono = rng.integers(-32768, 32767, size=100, dtype=np.int16)
    s, rate = decode_wav(encode_wav(mono, 8000))
    assert rate == 8000 and s.shape == (100, 1)
    assert (s[:, 0] == mono).all()

    stereo = rng.integers(-32768, 32767, size=(50, 2), dtype=np.int16)
    s2, rate2 = decode_wav(encode_wav(stereo, 44100))
    assert rate2 == 44100 and s2.shape == (50, 2)
    assert (s2 == stereo).all()


def test_resize_nearest_shapes_and_values():
    arr = np.arange(64, dtype=np.uint8).reshape(8, 8)
    small = resize_nearest(arr, 4, 4)
    assert (small == arr[::2, ::2]).all()
    big = resize_nearest(arr, 16, 16)
    assert big.shape == (16, 16)
    # each source pixel replicated 2×2
    assert (big[::2, ::2] == arr).all() and (big[1::2, 1::2] == arr).all()


def test_decode_media_dispatch():
    from approximatequeryengine_spark.operators.multimodal import decode_media

    arr = np.full((3, 3), 9, dtype=np.uint8)
    out = decode_media(encode_png(arr), "image/png")
    assert (np.asarray(out)[:, :, 0] == 9).all()
    samples = np.arange(10, dtype=np.int16)
    s, rate = decode_media(encode_wav(samples, 16000), "audio/wav")
    assert rate == 16000 and (np.asarray(s)[:, 0] == samples).all()
    with pytest.raises(NotImplementedError, match="no codec"):
        decode_media(b"", "video/mp4")


# -- property-based round trips (hypothesis) --------------------------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    HAVE_HYPOTHESIS = False

if HAVE_HYPOTHESIS:

    @settings(max_examples=40, deadline=None)
    @given(
        h=st.integers(1, 17),
        w=st.integers(1, 17),
        ch=st.integers(1, 4),
        filter_type=st.integers(0, 4),
        seed=st.integers(0, 2**31 - 1),
    )
    def test_png_roundtrip_property(h, w, ch, filter_type, seed):
        rng = np.random.default_rng(seed)
        arr = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
        assert (decode_png(encode_png(arr, filter_type=filter_type)) == arr).all()

    @settings(max_examples=25, deadline=None)
    @given(
        n=st.integers(1, 500),
        chs=st.integers(1, 2),
        rate=st.sampled_from([8000, 16000, 44100]),
        seed=st.integers(0, 2**31 - 1),
    )
    def test_wav_roundtrip_property(n, chs, rate, seed):
        rng = np.random.default_rng(seed)
        s = rng.integers(-32768, 32767, size=(n, chs), dtype=np.int16)
        dec, got = decode_wav(encode_wav(s, rate))
        assert got == rate and (dec == s).all()

    @settings(max_examples=25, deadline=None)
    @given(
        h=st.integers(1, 16),
        w=st.integers(1, 16),
        th=st.integers(1, 24),
        tw=st.integers(1, 24),
    )
    def test_resize_nearest_property(h, w, th, tw):
        arr = np.arange(h * w, dtype=np.uint8).reshape(h, w)
        out = resize_nearest(arr, tw, th)
        assert out.shape == (th, tw)
        # every output pixel must exist at its mapped source index
        for r in range(th):
            for c in range(tw):
                assert out[r, c] == arr[(r * h) // th, (c * w) // tw]


def test_y4m_roundtrip_and_dispatch():
    from approximatequeryengine_spark.functions.media import decode_y4m, encode_y4m
    from approximatequeryengine_spark.operators.multimodal import decode_media

    rng = np.random.default_rng(11)
    frames = rng.integers(0, 256, size=(5, 6, 4), dtype=np.uint8)
    payload = encode_y4m(frames, fps=30)
    dec, fps = decode_y4m(payload)
    assert fps == 30 and (dec == frames).all()
    dec2, _ = decode_media(payload, "video/y4m")
    assert (np.asarray(dec2) == frames).all()
    with pytest.raises(ValueError, match="YUV4MPEG2"):
        decode_y4m(b"garbage\n")
    with pytest.raises(ValueError, match="even"):
        encode_y4m(np.zeros((1, 3, 4), dtype=np.uint8))
