"""Stdlib-only media codecs: BMP (BITMAPINFOHEADER, 24-bit
uncompressed), WAV (16-bit PCM), PGM (binary P5).

This retires the "decode needs PIL/cv2/ffmpeg" stub for the container
formats that are parseable with ``struct`` + numpy alone — the real
decode path of :func:`gminer_spark.multimodal.binary.decode_media`.
Compressed formats (JPEG/PNG/MP3/H.264) still fall back to the declared
stub.

Reference anchor: user-defined payload parsing is GMiner's `to_vertex`
extension point (/root/reference/apps/community.cpp:404-446 parses
attribute lists off the raw input line; here the "line" is a binary
container and the "attributes" are pixels/samples).

Determinism contract: synthetic payload content bytes are an
md5-derived stream — byte i of doc d is digest byte ``i % 16`` of
``md5("px:{d}:{i // 16}")`` — so a DuckDB oracle can recompute the
*decoded* aggregates (per-channel pixel sums, sample sums) from the
same definition without parsing any container, while the Spark side
genuinely round-trips encode → container bytes → header parse →
decode → aggregate.  Row padding (BMP rows pad to 4 bytes), bottom-up
row order, BGR storage, and little-endian signed samples are all
exercised: get any of them wrong and the sums diverge.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np


def stream_bytes(doc_id: int, n: int) -> np.ndarray:
    """First ``n`` bytes of the md5-derived content stream for doc_id."""
    blocks = []
    for blk in range((n + 15) // 16):
        blocks.append(hashlib.md5(f"px:{doc_id}:{blk}".encode()).digest())
    return np.frombuffer(b"".join(blocks), dtype=np.uint8)[:n].copy()


# --- BMP: 24-bit uncompressed, BITMAPINFOHEADER, bottom-up, BGR ------------


def encode_bmp(pixels: np.ndarray) -> bytes:
    """pixels: (h, w, 3) uint8 RGB, row 0 = top.  Standard layout:
    rows written bottom-up, channels BGR, rows padded to 4 bytes."""
    h, w, _ = pixels.shape
    row_raw = w * 3
    pad = (-row_raw) % 4
    stride = row_raw + pad
    data_size = stride * h
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + data_size, 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, data_size, 2835, 2835, 0, 0)
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        row = pixels[y, :, ::-1].tobytes()  # RGB -> BGR
        body += row + b"\x00" * pad
    return header + info + bytes(body)


def decode_bmp(data: bytes) -> np.ndarray:
    """-> (h, w, 3) uint8 RGB, row 0 = top.  Supports the encoded
    subset: 24-bit, BI_RGB (compression 0), positive height."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    (off,) = struct.unpack_from("<I", data, 10)
    hdr_size, w, h = struct.unpack_from("<Iii", data, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", data, 26)
    if hdr_size < 40 or bpp != 24 or compression != 0 or h <= 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, comp={compression}, h={h})")
    stride = (w * 3 + 3) // 4 * 4
    out = np.empty((h, w, 3), dtype=np.uint8)
    for i in range(h):
        row = np.frombuffer(data, dtype=np.uint8, count=w * 3, offset=off + i * stride)
        out[h - 1 - i] = row.reshape(w, 3)[:, ::-1]  # BGR -> RGB, bottom-up
    return out


# --- WAV: RIFF, PCM, 16-bit little-endian signed ----------------------------


def encode_wav(samples: np.ndarray, sample_rate: int = 8000, n_channels: int = 1) -> bytes:
    """samples: (n,) or (n, ch) int16; interleaved PCM frames."""
    pcm = np.asarray(samples, dtype="<i2").reshape(-1, n_channels)
    data = pcm.tobytes()
    byte_rate = sample_rate * n_channels * 2
    block_align = n_channels * 2
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, n_channels, sample_rate, byte_rate, block_align, 16
    )
    dchunk = struct.pack("<4sI", b"data", len(data)) + data
    riff = b"WAVE" + fmt + dchunk
    return struct.pack("<4sI", b"RIFF", len(riff)) + riff


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """-> ((n, ch) int16 samples, sample_rate).  PCM 16-bit only;
    walks RIFF chunks (fmt may not be the first chunk in the wild)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos, rate, n_channels, bits, pcm = 12, None, None, None, None
    while pos + 8 <= len(data):
        cid, size = struct.unpack_from("<4sI", data, pos)
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, n_channels, rate = struct.unpack_from("<HHI", body, 0)
            (bits,) = struct.unpack_from("<H", body, 14)
            if audio_fmt != 1 or bits != 16:
                raise ValueError(f"unsupported WAV (fmt={audio_fmt}, bits={bits})")
        elif cid == b"data":
            pcm = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or pcm is None:
        raise ValueError("WAV missing fmt/data chunk")
    return np.frombuffer(pcm, dtype="<i2").reshape(-1, n_channels).copy(), rate


# --- PGM: binary P5, maxval <= 255 ------------------------------------------


def encode_pgm(pixels: np.ndarray) -> bytes:
    h, w = pixels.shape
    return f"P5\n{w} {h}\n255\n".encode() + np.asarray(pixels, dtype=np.uint8).tobytes()


def decode_pgm(data: bytes) -> np.ndarray:
    """-> (h, w) uint8.  Binary P5 with whitespace/comment-tolerant
    header (the format allows `#` comments between tokens)."""
    if data[:2] != b"P5":
        raise ValueError("not a PGM")
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = tokens
    if maxval > 255:
        raise ValueError("16-bit PGM unsupported")
    return (
        np.frombuffer(data, dtype=np.uint8, count=w * h, offset=pos)
        .reshape(h, w)
        .copy()
    )


# --- deterministic synthetic payloads ---------------------------------------


def synth_dims(doc_id: int, fmt: str) -> tuple[int, ...]:
    """Per-doc dims, varied so header parsing and (for BMP) every row
    pad size 0-3 are exercised: bmp w in 3..6 → w*3 % 4 covers all."""
    if fmt == "bmp":
        return (3 + doc_id % 4, 2 + doc_id % 3)  # (w, h)
    if fmt == "wav":
        return (16 + (doc_id % 5) * 4,)  # n_samples
    return (4 + doc_id % 4, 2 + doc_id % 2)  # pgm (w, h)


def synth_payload(doc_id: int) -> tuple[str, bytes]:
    """(mime, container bytes); format cycles by doc_id % 3, content
    bytes from :func:`stream_bytes` (the oracle-recomputable stream)."""
    fmt = ("bmp", "wav", "pgm")[doc_id % 3]
    if fmt == "bmp":
        w, h = synth_dims(doc_id, fmt)
        px = stream_bytes(doc_id, w * h * 3).reshape(h, w, 3)
        return "image/bmp", encode_bmp(px)
    if fmt == "wav":
        (n,) = synth_dims(doc_id, fmt)
        raw = stream_bytes(doc_id, n * 2)
        samples = raw.view("<i2").astype(np.int16)
        return "audio/wav", encode_wav(samples, sample_rate=8000)
    w, h = synth_dims(doc_id, fmt)
    px = stream_bytes(doc_id, w * h).reshape(h, w)
    return "image/x-portable-graymap", encode_pgm(px)
