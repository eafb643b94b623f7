"""Codec correctness: lossless round-trips, JPEG PSNR >= 40 dB (the
north-rule per-row invariant for lossy formats), failure semantics."""

from __future__ import annotations

import numpy as np
import pytest

from pic2vec_spark.codecs import (
    decode_bmp,
    decode_image,
    decode_png,
    encode_bmp,
    encode_image,
    encode_png,
)
from pic2vec_spark.jpeg import decode_jpeg, encode_jpeg, psnr
from pic2vec_spark.synth import _gen_pixels


@pytest.fixture(scope="module")
def img():
    return _gen_pixels(np.random.default_rng(7), 60, 45)


def test_png_roundtrip_exact(img):
    assert (decode_png(encode_png(img)) == img).all()


def test_png_gray_and_rgba():
    rng = np.random.default_rng(1)
    gray = rng.integers(0, 256, (20, 30), dtype=np.uint8)
    out = decode_png(encode_png(gray))
    assert out.shape == (20, 30, 3)
    assert (out[..., 0] == gray).all() and (out[..., 1] == gray).all()
    rgba = rng.integers(0, 256, (20, 30, 4), dtype=np.uint8)
    assert (decode_png(encode_png(rgba)) == rgba[..., :3]).all()


def test_bmp_roundtrip_exact(img):
    assert (decode_bmp(encode_bmp(img)) == img).all()


def test_bmp_row_padding():
    # width not a multiple of 4 exercises row padding
    rng = np.random.default_rng(2)
    for w in (1, 2, 3, 5, 7):
        im = rng.integers(0, 256, (5, w, 3), dtype=np.uint8)
        assert (decode_bmp(encode_bmp(im)) == im).all()


@pytest.mark.parametrize("size", [(8, 8), (45, 60), (227, 227), (13, 29)])
def test_jpeg_psnr_over_40db(size):
    img = _gen_pixels(np.random.default_rng(3), size[1], size[0])
    dec = decode_jpeg(encode_jpeg(img, quality=95))
    assert dec.shape == img.shape
    assert psnr(img, dec) >= 40.0


def test_decode_image_dispatch(img):
    for fmt in ("png", "bmp", "jpg"):
        out = decode_image(encode_image(img, fmt), fmt)
        assert out.shape == img.shape


def test_invalid_format_rejected(img):
    """gif is excluded by the reference's format filter
    (/root/reference/pic2vec/feature_preprocessing.py:118)."""
    with pytest.raises(ValueError):
        decode_image(b"GIF89a....", "gif")


def test_corrupt_and_empty_bytes_raise():
    for fmt in ("png", "bmp", "jpg"):
        with pytest.raises(Exception):
            decode_image(b"", fmt)
        with pytest.raises(Exception):
            decode_image(b"\x00\x01\x02deadbeef" * 4, fmt)


def test_jpeg_restart_intervals_roundtrip():
    """DRI/RSTn support: restart markers (byte-aligned, DC predictors
    reset, RST0-7 wraparound) reconstruct identically to the plain
    stream — what hardware encoders emit for error resilience."""
    import numpy as np

    from pic2vec_spark.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(7)
    img = np.clip(
        np.linspace(0, 255, 48)[None, :, None] + rng.normal(0, 20, (40, 48, 3)),
        0, 255,
    ).astype(np.uint8)
    plain = decode_jpeg(encode_jpeg(img, quality=95))
    for ri in (1, 2, 5, 7):  # ri=1 over 30 MCUs exercises RST0-7 wraparound
        data = encode_jpeg(img, quality=95, restart_interval=ri)
        assert b"\xff\xdd" in data  # DRI present
        assert np.array_equal(decode_jpeg(data), plain), ri


def test_wav_roundtrip_exact_16bit():
    """encode_wav -> decode_wav round-trips 16-bit PCM to quantization
    accuracy, preserves rate/channels, and 8-bit + stereo decode work."""
    import numpy as np

    from pic2vec_spark.codecs import decode_wav, encode_wav

    t = np.arange(1600) / 16000.0
    mono = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float64)
    x, rate = decode_wav(encode_wav(mono, 16000))
    assert rate == 16000 and x.shape == (1600, 1)
    assert np.allclose(x[:, 0], mono, atol=1.0 / 32767)

    stereo = np.stack([mono, -mono], axis=1)
    x2, rate2 = decode_wav(encode_wav(stereo, 8000))
    assert rate2 == 8000 and x2.shape == (1600, 2)
    assert np.allclose(x2[:, 1], -mono, atol=1.0 / 32767)

    # hand-built 8-bit unsigned WAV: constant 0x80 == silence (0.0)
    import struct

    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    raw = bytes([0x80] * 100)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(raw)) + raw)
    x3, _ = decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
    assert np.allclose(x3, 0.0)

    import pytest

    for bad in [b"", b"RIFFxxxx", b"RIFF\x00\x00\x00\x00WAVE", b"\xff" * 64]:
        with pytest.raises(ValueError):
            decode_wav(bad)


def test_wav_decode_24_32bit_and_float():
    """24-bit and 32-bit integer PCM plus IEEE-float (fmt=3) WAVs all
    decode — 24-bit studio WAVs must NOT silently fall to the stub
    path — and a genuinely non-PCM fmt still raises."""
    import struct

    import numpy as np
    import pytest

    from pic2vec_spark.codecs import decode_wav

    rng = np.random.default_rng(7)
    sig = (rng.random((200, 2)) * 2 - 1) * 0.9  # stereo

    def wav(raw: bytes, bits: int, fmt: int, ch: int = 2) -> bytes:
        fmtc = struct.pack(
            "<HHIIHH", fmt, ch, 44100, 44100 * ch * bits // 8, ch * bits // 8, bits
        )
        body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmtc)) + fmtc
                + b"data" + struct.pack("<I", len(raw)) + raw)
        return b"RIFF" + struct.pack("<I", len(body)) + body

    # 24-bit: low 3 bytes of the int32 representation, little-endian
    v24 = (sig * 8388607).astype("<i4")
    raw24 = v24.view(np.uint8).reshape(-1, 4)[:, :3].tobytes()
    x, rate = decode_wav(wav(raw24, 24, 1))
    assert rate == 44100 and x.shape == (200, 2)
    assert np.abs(x - sig).max() < 1e-6

    raw32 = (sig * 2147483647).astype("<i4").tobytes()
    x, _ = decode_wav(wav(raw32, 32, 1))
    assert np.abs(x - sig).max() < 1e-7  # float32 mantissa limit

    for dt, bits in [("<f4", 32), ("<f8", 64)]:
        x, _ = decode_wav(wav(sig.astype(dt).tobytes(), bits, 3))
        assert np.abs(x - sig).max() < 1e-6

    with pytest.raises(ValueError):  # ADPCM (fmt=2) is still not PCM
        decode_wav(wav(raw32, 32, 2))
    with pytest.raises(ValueError):  # float must be 32/64-bit
        decode_wav(wav(raw24, 24, 3))
