"""Pure-stdlib media codecs for the multimodal pipeline.

The container ships no Pillow/soundfile/ffmpeg, so round 2 left media
*decode* as a declared stub. These are real, dependency-free codecs for
the three formats whose specs are simple enough to implement honestly:

- **PNG** (subset): 8-bit greyscale / grey+alpha / RGB / RGBA,
  non-interlaced — zlib inflate + full scanline unfilter (all five
  filter types 0-4, including Paeth), per the PNG specification
  (RFC 2083). The encoder writes any of those color types with a
  caller-chosen filter type, which gives the tests a way to exercise
  every unfilter branch without an external library.
- **WAV**: 16-bit PCM via the stdlib ``wave`` module.
- **Y4M** (YUV4MPEG2, C420): uncompressed planar video — text header +
  raw frames, which is what makes real frame extraction possible
  without a codec library.

JPEG / MP3 / compressed video (H.264 etc.) remain out of scope (a
faithful implementation is a project in itself);
``operators/multimodal.py`` still raises ``NotImplementedError`` for
those media types, with the supported formats listed.

Scale note: these run inside ``mapInPandas`` kernels over bounded
Arrow batches — per-blob CPU, no shuffle, no driver involvement. On a
real cluster the identical plumbing calls Pillow/ffmpeg instead; the
Spark-side contract (binary column in, typed features out) is what
this repo certifies.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type → channel count (8-bit depth only)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(payload: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced PNG → uint8 array of shape
    ``(height, width, channels)``. Raises ``ValueError`` on anything
    outside the supported subset."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    ihdr = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color, _comp, _filt, interlace = ihdr
    if depth != 8 or color not in _PNG_CHANNELS or interlace != 0:
        raise ValueError(
            f"unsupported PNG variant (depth={depth}, color={color}, "
            f"interlace={interlace}); supported: 8-bit, color type in "
            f"{sorted(_PNG_CHANNELS)}, non-interlaced"
        )
    ch = _PNG_CHANNELS[color]
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG data length mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        row_start = y * (stride + 1)
        ftype = raw[row_start]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=row_start + 1
        ).astype(np.int64)
        if ftype == 0:  # None
            cur = line
        elif ftype == 2:  # Up
            cur = (line + prev) % 256
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth: sequential
            cur = np.zeros(stride, dtype=np.int64)
            for x in range(stride):
                a = cur[x - ch] if x >= ch else 0
                if ftype == 1:
                    cur[x] = (line[x] + a) % 256
                elif ftype == 3:
                    cur[x] = (line[x] + (a + prev[x]) // 2) % 256
                else:
                    c = prev[x - ch] if x >= ch else 0
                    cur[x] = (line[x] + _paeth(a, int(prev[x]), int(c))) % 256
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out.reshape(h, w, ch)


def encode_png(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """Encode a uint8 array of shape ``(h, w)`` or ``(h, w, ch)``
    (ch ∈ {1, 2, 3, 4}) as an 8-bit non-interlaced PNG. ``filter_type``
    applies the same scanline filter to every row — exists so tests can
    drive every unfilter branch of :func:`decode_png`."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    a = arr.astype(np.int64).reshape(h, w * ch)
    stride = w * ch
    lines = bytearray()
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        cur = a[y]
        if filter_type == 0:
            filt = cur
        elif filter_type == 2:
            filt = (cur - prev) % 256
        elif filter_type in (1, 3, 4):
            filt = np.zeros(stride, dtype=np.int64)
            for x in range(stride):
                left = cur[x - ch] if x >= ch else 0
                if filter_type == 1:
                    filt[x] = (cur[x] - left) % 256
                elif filter_type == 3:
                    filt[x] = (cur[x] - (left + prev[x]) // 2) % 256
                else:
                    c = prev[x - ch] if x >= ch else 0
                    filt[x] = (cur[x] - _paeth(int(left), int(prev[x]), int(c))) % 256
        else:
            raise ValueError(f"unsupported filter type {filter_type}")
        lines.append(filter_type)
        lines.extend(filt.astype(np.uint8).tobytes())
        prev = cur

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(lines), 6))
        + chunk(b"IEND", b"")
    )


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a 16-bit PCM WAV → ``(samples int16 [n, channels],
    sample_rate)``."""
    with wave.open(io.BytesIO(payload), "rb") as wf:
        if wf.getsampwidth() != 2:
            raise ValueError(
                f"unsupported WAV sample width {wf.getsampwidth()} (16-bit PCM only)"
            )
        nch = wf.getnchannels()
        rate = wf.getframerate()
        frames = wf.readframes(wf.getnframes())
    samples = np.frombuffer(frames, dtype="<i2").reshape(-1, nch)
    return samples, rate


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode int16 samples of shape ``(n,)`` or ``(n, channels)`` as
    16-bit PCM WAV."""
    if samples.ndim == 1:
        samples = samples[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(samples.shape[1])
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize of an ``(h, w[, ch])`` image — index map
    ``src = floor(dst · src_extent / dst_extent)``, the deterministic
    choice (no float kernels), so downsampled stats have closed-form
    oracles."""
    h, w = arr.shape[:2]
    rows = (np.arange(height) * h) // height
    cols = (np.arange(width) * w) // width
    return arr[rows][:, cols]


# -- Y4M (YUV4MPEG2) video ---------------------------------------------------
# The one video container simple enough to implement honestly without a
# codec library: a text header, then per frame a "FRAME\n" marker and
# raw planar YCbCr 4:2:0 bytes. No compression — which is exactly what
# makes real frame extraction possible here; compressed video (H.264
# etc.) stays behind the NotImplementedError boundary.


def encode_y4m(frames: np.ndarray, fps: int = 25) -> bytes:
    """Encode grayscale frames ``(n, h, w)`` uint8 as YUV4MPEG2 C420
    (Y = the frame, U = V = neutral 128). h and w must be even (4:2:0
    chroma subsampling halves each dimension)."""
    n, h, w = frames.shape
    if h % 2 or w % 2:
        raise ValueError(f"C420 needs even dimensions, got {h}x{w}")
    header = f"YUV4MPEG2 W{w} H{h} F{fps}:1 Ip A1:1 C420\n".encode("ascii")
    uv = np.full((h // 2) * (w // 2), 128, dtype=np.uint8).tobytes()
    out = bytearray(header)
    for f in range(n):
        out += b"FRAME\n"
        out += frames[f].astype(np.uint8).tobytes()
        out += uv + uv
    return bytes(out)


def decode_y4m(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a YUV4MPEG2 C420 stream → ``(Y frames (n, h, w) uint8,
    fps)``. Chroma planes are parsed (to advance correctly) and
    discarded."""
    nl = payload.index(b"\n")
    header = payload[:nl].decode("ascii", errors="replace")
    parts = header.split()
    if not parts or parts[0] != "YUV4MPEG2":
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = fps = None
    colorspace = "C420"
    for p in parts[1:]:
        if p.startswith("W"):
            w = int(p[1:])
        elif p.startswith("H"):
            h = int(p[1:])
        elif p.startswith("F"):
            fps = int(p[1:].split(":")[0])
        elif p.startswith("C"):
            colorspace = p
    if w is None or h is None:
        raise ValueError("Y4M header missing W/H")
    if not colorspace.startswith("C420"):
        raise ValueError(f"unsupported Y4M colorspace {colorspace}")
    frame_bytes = h * w + 2 * (h // 2) * (w // 2)
    pos = nl + 1
    frames = []
    while pos < len(payload):
        if payload[pos : pos + 5] != b"FRAME":
            raise ValueError(f"bad FRAME marker at offset {pos}")
        pos = payload.index(b"\n", pos) + 1  # frame params allowed
        y = np.frombuffer(payload, dtype=np.uint8, count=h * w, offset=pos)
        frames.append(y.reshape(h, w))
        pos += frame_bytes
    return np.stack(frames) if frames else np.zeros((0, h, w), np.uint8), fps or 25
