"""Pure NumPy/stdlib image codecs (no PIL in this environment).

The reference decodes with PIL inside ``_convert_single_image``
(/root/reference/pic2vec/feature_preprocessing.py:281-335) and treats
any decode failure as a zero tensor + missing flag
(feature_preprocessing.py:318-323).  This module supplies the decode
step for the engine's Arrow-batched decode UDF:

- BMP: 24-bit uncompressed (exact round-trip)
- PNG: 8-bit gray / RGB / RGBA, zlib DEFLATE, all 5 scanline filters on
  decode, filter-0 on encode (lossless → exact round-trip)
- JPEG: minimal baseline DCT codec (see jpeg.py; lossy — decoded pixels
  must hit PSNR ≥ 40 dB vs the source, per the north rule)

``decode_image`` returns (H, W, 3) RGB uint8 or raises; callers map
failure → zero tensor + missing=True, mirroring the reference.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# formats the reference accepts: ['JPEG', 'BMP', 'PNG']
# (/root/reference/pic2vec/feature_preprocessing.py:118); gif et al. are
# filtered out and become missing rows.
VALID_FORMATS = {"jpg", "jpeg", "png", "bmp"}


# --------------------------------------------------------------------------
# BMP (24-bit uncompressed, bottom-up)
# --------------------------------------------------------------------------

def encode_bmp(img: np.ndarray) -> bytes:
    h, w = img.shape[:2]
    row_size = (w * 3 + 3) & ~3
    pixel_bytes = row_size * h
    header = struct.pack("<2sIHHI", b"BM", 54 + pixel_bytes, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, pixel_bytes, 2835, 2835, 0, 0)
    rows = np.zeros((h, row_size), dtype=np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    return header + info + rows.tobytes()


def decode_bmp(data: bytes) -> np.ndarray:
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    offset = struct.unpack_from("<I", data, 10)[0]
    hdr_size = struct.unpack_from("<I", data, 14)[0]
    if hdr_size < 40:
        raise ValueError("unsupported BMP header")
    w, h = struct.unpack_from("<ii", data, 18)
    bpp = struct.unpack_from("<H", data, 28)[0]
    comp = struct.unpack_from("<I", data, 30)[0]
    if bpp != 24 or comp != 0:
        raise ValueError("only 24-bit uncompressed BMP supported")
    flip = h > 0
    h = abs(h)
    row_size = (w * 3 + 3) & ~3
    raw = np.frombuffer(data, dtype=np.uint8, count=row_size * h, offset=offset)
    rows = raw.reshape(h, row_size)[:, : w * 3].reshape(h, w, 3)
    img = rows[::-1] if flip else rows
    return np.ascontiguousarray(img[:, :, ::-1])  # BGR -> RGB


# --------------------------------------------------------------------------
# PNG (8-bit, zlib)
# --------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray) -> bytes:
    """Encode (H, W) gray or (H, W, 3|4) uint8 as PNG (filter 0)."""
    if img.ndim == 2:
        img = img[..., None]
    h, w, c = img.shape
    color_type = {1: 0, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), img.reshape(h, w * c)], axis=1
    ).tobytes()
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Undo PNG scanline filters (types 0-4). raw: (h, 1+stride)."""
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        ftype = raw[y, 0]
        line = raw[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, dtype=np.int32)
        if ftype == 0:
            out[y] = line
        elif ftype == 1:  # Sub
            cur = line
            for x in range(bpp, stride):
                cur[x] = (cur[x] + cur[x - bpp]) & 0xFF
            out[y] = cur
        elif ftype == 2:  # Up
            out[y] = (line + prev) & 0xFF
        elif ftype == 3:  # Average
            cur = line
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + ((left + prev[x]) >> 1)) & 0xFF
            out[y] = cur
        elif ftype == 4:  # Paeth
            cur = line
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                cc = prev[x - bpp] if x >= bpp else 0
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                cur[x] = (cur[x] + pred) & 0xFF
            out[y] = cur
        else:
            raise ValueError(f"bad PNG filter {ftype}")
    return out


def decode_png(data: bytes) -> np.ndarray:
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, w = 8, 0
    idat = []
    h = bit_depth = color_type = interlace = None
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
    if h is None or not idat:
        raise ValueError("truncated PNG")
    if bit_depth != 8 or interlace != 0:
        raise ValueError("only 8-bit non-interlaced PNG supported")
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color_type)
    if channels is None:
        raise ValueError(f"unsupported PNG color type {color_type}")
    stride = w * channels
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    if raw.size != h * (stride + 1):
        raise ValueError("bad PNG data size")
    img = _unfilter(raw.reshape(h, stride + 1), h, stride, channels).reshape(
        h, w, channels
    )
    if channels == 1:
        img = np.repeat(img, 3, axis=2)
    elif channels == 2:  # gray+alpha
        img = np.repeat(img[:, :, :1], 3, axis=2)
    elif channels == 4:
        img = img[:, :, :3]
    return img


# --------------------------------------------------------------------------
# dispatch
# --------------------------------------------------------------------------

def decode_image(data: bytes, fmt: str) -> np.ndarray:
    """bytes + declared format -> (H, W, 3) RGB uint8.  Raises
    ValueError — and ONLY ValueError — on any invalid/corrupt/
    unsupported input (caller maps to missing row): adversarial bytes
    can drive the per-format parsers into struct/zlib/index errors,
    which MUST NOT escape as executor crashes from an untrusted-ingest
    decode UDF, so they are normalized here."""
    fmt = (fmt or "").lower()
    if fmt not in VALID_FORMATS:
        raise ValueError(f"invalid format {fmt!r}")
    if not data:
        raise ValueError("empty bytes")
    try:
        if fmt == "bmp":
            return decode_bmp(bytes(data))
        if fmt == "png":
            return decode_png(bytes(data))
        from pic2vec_spark.jpeg import decode_jpeg

        return decode_jpeg(bytes(data))
    except ValueError:
        raise
    except Exception as e:
        raise ValueError(
            f"malformed {fmt} image: {type(e).__name__}"
        ) from e


def encode_image(img: np.ndarray, fmt: str) -> bytes:
    fmt = fmt.lower()
    if fmt == "bmp":
        return encode_bmp(img)
    if fmt == "png":
        return encode_png(img)
    if fmt in ("jpg", "jpeg"):
        from pic2vec_spark.jpeg import encode_jpeg

        return encode_jpeg(img)
    raise ValueError(f"cannot encode format {fmt!r}")


# ----------------------------------------------------------- audio (WAV)
# RIFF/WAVE PCM is a pure container format (public spec: RIFF chunks,
# 'fmt ' with audioFormat=1, little-endian PCM samples) — decodable with
# stdlib + NumPy alone, so audio needs no codec library for the WAV
# case.  Compressed audio (mp3/aac/ogg) still has no decoder in this
# container and stays stubbed in ops/multimodal.py.


def encode_wav(
    samples: np.ndarray, sample_rate: int = 16000
) -> bytes:
    """Encode float samples in [-1, 1] (shape (n,) mono or (n, ch)) as
    16-bit PCM RIFF/WAVE."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    ch = x.shape[1]
    pcm = np.clip(np.round(x * 32767.0), -32768, 32767).astype("<i2")
    raw = pcm.tobytes()
    import struct

    byte_rate = sample_rate * ch * 2
    fmt = struct.pack(
        "<HHIIHH", 1, ch, sample_rate, byte_rate, ch * 2, 16
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(raw)) + raw
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode RIFF/WAVE PCM (8/16/24/32-bit integer, or 32/64-bit
    IEEE-float fmt=3, any channel count) to (float32 samples scaled to
    [-1, 1] of shape (n, channels), sample_rate).  Raises ValueError —
    and ONLY ValueError (same normalization contract as decode_image) —
    for anything that is not plain PCM WAV (mp3-in-wav, ADPCM, corrupt
    chunks, …) — callers treat that as 'needs a real codec' (stub
    path)."""
    try:
        return _decode_wav_impl(bytes(data or b""))
    except ValueError:
        raise
    except Exception as e:
        raise ValueError(f"malformed WAV: {type(e).__name__}") from e


def _decode_wav_impl(data: bytes) -> tuple[np.ndarray, int]:
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not RIFF/WAVE")
    pos, fmt, raw = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        size = int.from_bytes(data[pos + 4 : pos + 8], "little")
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            raw = body
        pos += 8 + size + (size & 1)  # RIFF chunks are word-aligned
    if fmt is None or raw is None or len(fmt) < 16:
        raise ValueError("missing fmt/data chunk")
    audio_fmt = int.from_bytes(fmt[0:2], "little")
    channels = int.from_bytes(fmt[2:4], "little")
    rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    int_ok = audio_fmt == 1 and bits in (8, 16, 24, 32)
    float_ok = audio_fmt == 3 and bits in (32, 64)
    if not (int_ok or float_ok) or channels < 1 or rate <= 0:
        raise ValueError(
            f"unsupported WAV (fmt={audio_fmt}, ch={channels}, bits={bits})"
        )
    bytes_per_frame = channels * bits // 8
    n = len(raw) // bytes_per_frame
    raw = raw[: n * bytes_per_frame]
    if audio_fmt == 3:  # IEEE float, already in [-1, 1]
        dt = "<f4" if bits == 32 else "<f8"
        x = np.frombuffer(raw, dtype=dt).astype(np.float32)
    elif bits == 16:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif bits == 32:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    elif bits == 24:
        # 3-byte little-endian signed frames: pad each to 4 bytes (high
        # byte) so the value sits in the top 24 bits of an int32, then
        # scale by 2^31 — studio WAVs decode instead of hitting the stub
        b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
        padded = np.zeros((b.shape[0], 4), dtype=np.uint8)
        padded[:, 1:] = b
        x = padded.view("<i4").ravel().astype(np.float32) / 2147483648.0
    else:  # 8-bit WAV is UNSIGNED per the spec
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    return x.reshape(n, channels), rate


# ----------------------------------------------------------- video (MJV1)
# A motion-JPEG-style stream container: an uncompressed index over
# per-frame still images, each encoded with the from-scratch codecs
# above (BMP/PNG lossless, JPEG lossy).  Container formats like AVI-
# MJPEG are exactly this shape (a RIFF index over JFIF frames) — the
# only part that needs a codec library is inter-frame compression
# (H.264 etc.), which stays behind the documented stub in
# ops/multimodal.py.  Layout: b"MJV1" | u32 n_frames | per frame:
# 4-byte ascii fmt tag (space-padded) | u32 payload length | payload.

VIDEO_MAGIC = b"MJV1"


def encode_video(frames: list, fmt: str = "jpeg") -> bytes:
    """Encode (H, W, 3) uint8 frames into an MJV1 stream.  ``fmt`` may
    be a single format for every frame or a per-frame list — mixing
    lossless (bmp/png) and lossy (jpeg) frames is legal, mirroring
    keyframe/delta quality differences in real streams."""
    fmts = [fmt] * len(frames) if isinstance(fmt, str) else list(fmt)
    if len(fmts) != len(frames):
        raise ValueError("fmt list length != frame count")
    parts = [VIDEO_MAGIC, struct.pack("<I", len(frames))]
    for img, f in zip(frames, fmts):
        payload = encode_image(img, f)
        tag = f.lower().ljust(4)[:4].encode("ascii")
        parts.append(tag + struct.pack("<I", len(payload)) + payload)
    return b"".join(parts)


def decode_video(data: bytes) -> list:
    """Decode an MJV1 stream to its list of (H, W, 3) RGB uint8 frames.
    Raises ValueError — and ONLY ValueError (same normalization
    contract as decode_image) — on anything that is not a well-formed
    stream (callers map failure to video_ok=False, the shared
    missing-semantics of the binary ops)."""
    data = bytes(data or b"")
    if len(data) < 8 or data[:4] != VIDEO_MAGIC:
        raise ValueError("not an MJV1 video stream")
    (n,) = struct.unpack_from("<I", data, 4)
    pos = 8
    frames = []
    for _ in range(n):
        if pos + 8 > len(data):
            raise ValueError("truncated MJV1 stream")
        fmt = data[pos : pos + 4].decode("ascii", "replace").strip()
        (ln,) = struct.unpack_from("<I", data, pos + 4)
        pos += 8
        if pos + ln > len(data):
            raise ValueError("truncated MJV1 frame payload")
        frames.append(decode_image(data[pos : pos + ln], fmt))
        pos += ln
    return frames
