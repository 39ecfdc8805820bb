"""Real, dependency-free multimodal codecs: 24-bit BMP and 16-bit PCM WAV.

The multimodal operators (:mod:`clustopher_spark.functions.multimodal`)
keep a pluggable ``decode_fn`` so production pipelines can drop in
PIL/librosa/ffmpeg; this module makes one image format and one audio
format REAL with nothing beyond stdlib ``struct`` + numpy, so the
decode / feature-extract / resize stages can be exercised end-to-end over
genuine bytes instead of digest fakes.

Formats (both public, fully specified):
* BMP: BITMAPFILEHEADER + BITMAPINFOHEADER, uncompressed 24-bit BGR,
  bottom-up scanlines padded to 4 bytes — the simplest widely-readable
  raster container.
* WAV: RIFF/WAVE, PCM 16-bit little-endian, arbitrary channel count.

All functions operate on ``bytes`` <-> numpy arrays; nothing here touches
Spark. The adapters at the bottom match the ``decode_fn`` signatures of
``decode_images`` / ``resize_images`` / ``extract_audio_features``.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------------
# BMP (24-bit uncompressed)
# --------------------------------------------------------------------------

_BMP_FILE_HDR = struct.Struct("<2sIHHI")  # magic, file size, res1, res2, data offset
_BMP_INFO_HDR = struct.Struct("<IiiHHIIiiII")  # 40-byte BITMAPINFOHEADER


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> 24-bit BMP bytes (BGR, bottom-up, 4-byte
    row padding)."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected (H, W, 3) RGB array, got {arr.shape}")
    h, w = arr.shape[:2]
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    stride = row_bytes + pad
    # RGB -> BGR, flip to bottom-up, pad each row
    bgr = arr[::-1, :, ::-1]
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :row_bytes] = bgr.reshape(h, row_bytes)
    data = rows.tobytes()
    offset = _BMP_FILE_HDR.size + _BMP_INFO_HDR.size
    file_hdr = _BMP_FILE_HDR.pack(b"BM", offset + len(data), 0, 0, offset)
    info_hdr = _BMP_INFO_HDR.pack(
        _BMP_INFO_HDR.size, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return file_hdr + info_hdr + data


def decode_bmp(data: bytes) -> np.ndarray:
    """24-bit BMP bytes -> (H, W, 3) uint8 RGB. Handles bottom-up and
    top-down (negative height) scanline order and row padding."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP stream (missing 'BM' magic)")
    _, _, _, _, offset = _BMP_FILE_HDR.unpack_from(data, 0)
    (
        hdr_size, w, h, planes, bpp, compression,
        _img_size, _xppm, _yppm, _colors, _important,
    ) = _BMP_INFO_HDR.unpack_from(data, _BMP_FILE_HDR.size)
    if bpp != 24 or compression != 0:
        raise ValueError(f"only uncompressed 24-bit BMP supported (bpp={bpp}, compression={compression})")
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(data, dtype=np.uint8, count=h * stride, offset=offset)
    rows = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    rgb = rows[:, :, ::-1]  # BGR -> RGB
    return np.ascontiguousarray(rgb if top_down else rgb[::-1])


def resize_nearest(pixels: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample (H, W, 3) -> (height, width, 3): pure
    numpy fancy indexing, exact for integer up/downscales."""
    h, w = pixels.shape[:2]
    yi = (np.arange(height) * h // height).clip(0, h - 1)
    xi = (np.arange(width) * w // width).clip(0, w - 1)
    return pixels[yi[:, None], xi[None, :]]


# --------------------------------------------------------------------------
# WAV (RIFF / PCM 16-bit)
# --------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """(n,) or (n, channels) int16 -> RIFF/WAVE PCM-16 bytes."""
    arr = np.asarray(samples, dtype=np.int16)
    if arr.ndim == 1:
        arr = arr[:, None]
    n, ch = arr.shape
    data = arr.tobytes()  # interleaved little-endian on all supported hosts
    byte_rate = sample_rate * ch * 2
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, ch, sample_rate, byte_rate, ch * 2, 16)
    body = b"WAVE" + fmt + struct.pack("<4sI", b"data", len(data)) + data
    return struct.pack("<4sI", b"RIFF", len(body)) + body


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE PCM-16 bytes -> (sample_rate, (n, channels) int16).
    Walks the chunk list, so extra chunks (LIST/fact/...) are tolerated."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos, end = 12, len(data)
    sample_rate = channels = bits = None
    pcm = None
    while pos + 8 <= end:
        cid, size = struct.unpack_from("<4sI", data, pos)
        pos += 8
        if cid == b"fmt ":
            audio_fmt, channels, sample_rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", data, pos
            )
            if audio_fmt != 1 or bits != 16:
                raise ValueError(f"only PCM-16 supported (fmt={audio_fmt}, bits={bits})")
        elif cid == b"data":
            pcm = np.frombuffer(data, dtype="<i2", count=size // 2, offset=pos)
        pos += size + (size & 1)  # chunks are word-aligned
    if sample_rate is None or pcm is None:
        raise ValueError("missing fmt/data chunk")
    return sample_rate, pcm.reshape(-1, channels)


# --------------------------------------------------------------------------
# AVI (RIFF container, uncompressed 24-bit DIB frames)
# --------------------------------------------------------------------------

_AVIH = struct.Struct("<IIIIIIIIII4I")  # 56-byte MainAVIHeader
_STRH = struct.Struct("<4s4sIHHIIIIIIII4H")  # 56-byte AVIStreamHeader


def encode_avi(frames: list, fps: int = 10) -> bytes:
    """List of (H, W, 3) uint8 RGB frames (same shape) -> uncompressed AVI
    bytes ('DIB ' video stream: BGR bottom-up scanlines, 4-byte row
    padding, one '00db' chunk per frame)."""
    if not frames:
        raise ValueError("need at least one frame")
    arr0 = np.asarray(frames[0], dtype=np.uint8)
    h, w = arr0.shape[:2]
    stride = (w * 3 + 3) & ~3
    frame_bytes = stride * h

    def dib(frame: np.ndarray) -> bytes:
        a = np.asarray(frame, dtype=np.uint8)
        if a.shape != arr0.shape:
            raise ValueError("all frames must share one shape")
        rows = np.zeros((h, stride), dtype=np.uint8)
        rows[:, : w * 3] = a[::-1, :, ::-1].reshape(h, w * 3)
        return rows.tobytes()

    def chunk(tag: bytes, body: bytes) -> bytes:
        return struct.pack("<4sI", tag, len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    def lst(tag: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", tag + body)

    avih = chunk(
        b"avih",
        _AVIH.pack(
            1_000_000 // fps, frame_bytes * fps, 0, 0x10, len(frames), 0, 1,
            frame_bytes, w, h, 0, 0, 0, 0,
        ),
    )
    strh = chunk(
        b"strh",
        _STRH.pack(
            b"vids", b"DIB ", 0, 0, 0, 0, 1, fps, 0, len(frames), frame_bytes,
            0xFFFFFFFF, 0, 0, 0, w, h,
        ),
    )
    strf = chunk(
        b"strf",
        _BMP_INFO_HDR.pack(_BMP_INFO_HDR.size, w, h, 1, 24, 0, frame_bytes, 0, 0, 0, 0),
    )
    hdrl = lst(b"hdrl", avih + lst(b"strl", strh + strf))
    movi = lst(b"movi", b"".join(chunk(b"00db", dib(f)) for f in frames))
    riff_body = b"AVI " + hdrl + movi
    return struct.pack("<4sI", b"RIFF", len(riff_body)) + riff_body


def decode_avi(data: bytes) -> tuple[float, list]:
    """Uncompressed-DIB AVI bytes -> (fps, [(H, W, 3) uint8 RGB frames]).
    Walks the RIFF chunk tree; frame chunks are '00db'/'00dc' inside the
    'movi' LIST; geometry comes from the MainAVIHeader."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI stream")
    w = h = None
    usec_per_frame = 100_000
    raw_frames: list[bytes] = []

    def walk(buf: bytes) -> None:
        nonlocal w, h, usec_per_frame
        pos = 0
        while pos + 8 <= len(buf):
            tag, size = struct.unpack_from("<4sI", buf, pos)
            body = buf[pos + 8 : pos + 8 + size]
            if tag == b"LIST":
                walk(body[4:])
            elif tag == b"avih":
                fields = _AVIH.unpack_from(body)
                usec_per_frame, w, h = fields[0], fields[8], fields[9]
            elif tag in (b"00db", b"00dc"):
                raw_frames.append(body)
            pos += 8 + size + (size & 1)

    walk(data[12:])
    if w is None or h is None:
        raise ValueError("missing avih header")
    stride = (w * 3 + 3) & ~3
    frames = []
    for raw in raw_frames:
        rows = np.frombuffer(raw[: stride * h], dtype=np.uint8).reshape(h, stride)
        bgr = rows[:, : w * 3].reshape(h, w, 3)
        frames.append(bgr[::-1, :, ::-1].copy())
    fps = 1e6 / usec_per_frame if usec_per_frame else 10.0
    return fps, frames


# --------------------------------------------------------------------------
# decode_fn adapters for clustopher_spark.functions.multimodal
# --------------------------------------------------------------------------

from clustopher_spark.functions.multimodal import IMAGE_FEATURE_DIM  # noqa: E402


def bmp_image_decode(data: bytes) -> tuple[int, int, str, np.ndarray]:
    """``decode_images`` decode_fn over real BMP bytes: dimensions from the
    header, features = per-band luminance means (IMAGE_FEATURE_DIM bands
    over the flattened grayscale image, each in [0, 1])."""
    px = decode_bmp(data)
    h, w = px.shape[:2]
    gray = px.astype(np.float32).mean(axis=2).ravel() / 255.0
    bands = np.array_split(gray, IMAGE_FEATURE_DIM)
    feats = np.array([b.mean() if len(b) else 0.0 for b in bands], dtype=np.float32)
    return w, h, "bmp", feats


def bmp_resize(data: bytes, width: int, height: int) -> bytes:
    """``resize_images`` resize_fn: real decode -> nearest-neighbor
    resample -> re-encode."""
    return encode_bmp(resize_nearest(decode_bmp(data), width, height))


def wav_audio_decode(data: bytes) -> tuple[int, int, float]:
    """``extract_audio_features`` decode_fn: (sample_rate, n_samples, rms)
    with RMS computed from the actual samples, normalized to [0, 1] by
    the int16 full scale."""
    sr, pcm = decode_wav(data)
    mono = pcm.astype(np.float64).mean(axis=1)
    rms = float(np.sqrt(np.mean(mono**2)) / 32768.0) if len(mono) else 0.0
    return sr, pcm.shape[0], round(rms, 6)

def avi_video_frames(data: bytes, n: int) -> list:
    """``sample_video_frames`` decode_fn over real AVI bytes: decode the
    container, take ``n`` evenly-spaced frames, and return
    (frame_idx, frame_ts_seconds, md5-of-frame-pixels) triples."""
    import hashlib

    fps, frames = decode_avi(data)
    if not frames:
        return []
    idxs = np.unique(np.linspace(0, len(frames) - 1, num=min(n, len(frames)), dtype=int))
    return [
        (int(i), round(float(i / fps), 6), hashlib.md5(frames[i].tobytes()).hexdigest())
        for i in idxs
    ]
