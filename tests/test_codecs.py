"""Property tests for the real multimodal codecs (pure-numpy PPM + WAV):
decode(encode(x)) must equal the closed-form stats for ANY dimensions/bases
in the supported envelope, not just the corpus-derived ones the registered
ops use.  Also pins the malformed-input errors (a decoder that silently
misparses garbage is worse than one that throws)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from biggie_spark.multimodal import (
    decode_image_batch,
    decode_ppm,
    decode_wav,
    encode_ppm,
    encode_wav,
)


@settings(max_examples=50, deadline=None)
@given(
    w=st.integers(1, 40),
    h=st.integers(1, 40),
    rb=st.integers(0, 150),
    gb=st.integers(0, 150),
    bb=st.integers(0, 150),
)
def test_ppm_roundtrip_closed_form(w, h, rb, gb, bb):
    out = decode_ppm(encode_ppm(w, h, (rb, gb, bb)))
    grad = h * (w * (w - 1) // 2) + w * (h * (h - 1) // 2)
    n = w * h
    assert out == (w, h, n, n * rb + grad, n * gb + grad, n * bb + grad)


@settings(max_examples=50, deadline=None)
@given(
    samples=st.lists(st.integers(-32768, 32767), min_size=0, max_size=500),
    rate=st.sampled_from([8000, 16000, 44100]),
)
def test_wav_roundtrip(samples, rate):
    sr, ch, n, total, peak = decode_wav(encode_wav(samples, sample_rate=rate))
    assert (sr, ch, n) == (rate, 1, len(samples))
    assert total == sum(samples)
    assert peak == max((abs(s) for s in samples), default=0)


def test_ppm_header_comments_and_whitespace():
    """Real netpbm grammar: comments between any header tokens."""
    b = encode_ppm(3, 2, (5, 6, 7))
    # inject an extra comment after the magic; decoder must skip it
    patched = b"P6\n# injected\n# twice\n" + b[len(b"P6\n# biggie synthetic\n") :]
    assert decode_ppm(patched) == decode_ppm(b)


def test_decode_image_batch_ppm_dispatch():
    """The batch image kernel decodes PPM payloads natively (no pillow
    needed) and rejects unknown formats with a ValueError naming the
    supported path — no NotImplementedError stubs anywhere."""
    import pandas as pd

    payloads = pd.Series([encode_ppm(3, 2, (5, 6, 7)), encode_ppm(2, 2, (0, 0, 0))])
    out = decode_image_batch(payloads)
    assert list(out.columns) == ["width", "height", "n_px", "sum_r", "sum_g", "sum_b"]
    assert tuple(out.iloc[0]) == decode_ppm(bytes(payloads[0]))
    assert tuple(out.iloc[1]) == decode_ppm(bytes(payloads[1]))
    try:
        import PIL  # noqa: F401
    except ImportError:
        with pytest.raises(ValueError, match="PPM natively"):
            decode_image_batch(pd.Series([b"\xff\xd8\xff\xe0 jpeg-ish"]))


def test_codecs_reject_garbage():
    with pytest.raises(ValueError):
        decode_ppm(b"JFIF not a ppm")
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxAVI LIST")
    # truncated WAV: fmt present, data chunk missing
    good = encode_wav([1, 2, 3])
    with pytest.raises(ValueError):
        decode_wav(good[:20])


@settings(max_examples=50, deadline=None)
@given(
    w=st.integers(2, 40),
    h=st.integers(2, 40),
    rb=st.integers(0, 150),
    gb=st.integers(0, 150),
    bb=st.integers(0, 150),
)
def test_resize_half_closed_form(w, h, rb, gb, bb):
    """2x2 average pool over the gradient image: pooled pixel is exactly
    base + 2X + 2Y + 1 (block sum 4*base + 8X + 8Y + 4, // 4 exact), for
    ANY dims in the envelope including odd ones (trailing row/col crop)."""
    from biggie_spark.multimodal import resize_ppm_half

    out = decode_ppm(resize_ppm_half(encode_ppm(w, h, (rb, gb, bb))))
    w2, h2 = w // 2, h // 2
    grad = h2 * w2 * (w2 - 1) + w2 * h2 * (h2 - 1)  # sum of 2X+2Y terms
    n = w2 * h2
    assert out == (
        w2, h2, n,
        n * (rb + 1) + grad, n * (gb + 1) + grad, n * (bb + 1) + grad,
    )


@settings(max_examples=50, deadline=None)
@given(samples=st.lists(st.integers(-32768, 32767), min_size=0, max_size=500))
def test_wav_samples_roundtrip(samples):
    """wav_samples returns the exact PCM stream, not just stats."""
    from biggie_spark.multimodal import wav_samples

    assert list(wav_samples(encode_wav(samples))) == samples


def test_sobel_constant_image_zero_energy():
    """Analytic invariant independent of the oracle: a constant raster has
    zero gradient everywhere, so Sobel energy must be exactly 0."""
    import numpy as np

    from biggie_spark.multimodal import decode_ppm_array

    w, h = 12, 8
    header = f"P6\n{w} {h}\n255\n".encode()
    px = np.full((h, w, 3), 77, dtype=np.uint8)
    a = decode_ppm_array(header + px.tobytes())[:, :, 0].astype(np.int64)
    gx = (a[:-2, 2:] + 2 * a[1:-1, 2:] + a[2:, 2:]) - (
        a[:-2, :-2] + 2 * a[1:-1, :-2] + a[2:, :-2]
    )
    gy = (a[2:, :-2] + 2 * a[2:, 1:-1] + a[2:, 2:]) - (
        a[:-2, :-2] + 2 * a[:-2, 1:-1] + a[:-2, 2:]
    )
    assert int(abs(gx).sum()) == 0 and int(abs(gy).sum()) == 0


def test_dft_pure_tone_concentrates_at_its_bin():
    """A pure cosine at bin k=3 must put (almost) all its milli-unit DFT
    energy at k=3 and essentially none at k=1 — through the full WAV
    encode/decode path."""
    import math

    import numpy as np

    from biggie_spark.multimodal import encode_wav, wav_samples

    t = np.arange(64)
    x = np.round(10000 * np.cos(2 * math.pi * 3 * t / 64)).astype("<i2")
    back = wav_samples(encode_wav(x)).astype(np.float64)

    def coeff(k):
        c = s = 0
        for i in range(64):
            th = 2 * math.pi * k * i / 64
            c += int(math.copysign(math.floor(abs(back[i] * math.cos(th)) * 1000 + 0.5), back[i] * math.cos(th)))
            s += int(math.copysign(math.floor(abs(back[i] * math.sin(th)) * 1000 + 0.5), back[i] * math.sin(th)))
        return (c * c + s * s) ** 0.5

    assert coeff(3) > 100 * coeff(1)
