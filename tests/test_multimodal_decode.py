"""Stdlib codec roundtrips + the real-decode Spark path.

The r4 verdict's #1 task: retire the multimodal decode stub for the
container formats parseable without PIL/cv2/ffmpeg."""
import numpy as np
import pytest

from gminer_spark.multimodal.codecs import (
    decode_bmp,
    decode_pgm,
    decode_wav,
    encode_bmp,
    encode_pgm,
    encode_wav,
    stream_bytes,
    synth_payload,
)


def _px(seed: int, h: int, w: int, c: int | None = None) -> np.ndarray:
    rng = np.random.RandomState(seed)
    shape = (h, w) if c is None else (h, w, c)
    return rng.randint(0, 256, size=shape, dtype=np.uint8)


@pytest.mark.parametrize("w", [1, 3, 4, 5, 6, 17])  # covers all pad sizes
@pytest.mark.parametrize("h", [1, 2, 5])
def test_bmp_roundtrip(w, h):
    px = _px(w * 100 + h, h, w, 3)
    assert np.array_equal(decode_bmp(encode_bmp(px)), px)


def test_bmp_rejects_unsupported():
    px = _px(7, 2, 2, 3)
    data = bytearray(encode_bmp(px))
    data[30] = 1  # compression = BI_RLE8
    with pytest.raises(ValueError):
        decode_bmp(bytes(data))
    with pytest.raises(ValueError):
        decode_bmp(b"PNG\x00whatever")


@pytest.mark.parametrize("ch", [1, 2])
def test_wav_roundtrip(ch):
    rng = np.random.RandomState(42 + ch)
    samples = rng.randint(-32768, 32768, size=(50, ch)).astype(np.int16)
    out, rate = decode_wav(encode_wav(samples, sample_rate=16000, n_channels=ch))
    assert rate == 16000
    assert np.array_equal(out, samples)


def test_wav_chunk_walk_tolerates_extra_chunk():
    import struct

    samples = np.arange(-5, 5, dtype=np.int16)
    data = encode_wav(samples)
    # splice a LIST chunk (odd size → word-align padding) before data
    extra = struct.pack("<4sI", b"LIST", 3) + b"abc\x00"
    spliced = data[:12] + extra + data[12:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    out, rate = decode_wav(spliced)
    assert np.array_equal(out.ravel(), samples)


@pytest.mark.parametrize("w,h", [(1, 1), (4, 2), (7, 5)])
def test_pgm_roundtrip(w, h):
    px = _px(w * 10 + h, h, w)
    assert np.array_equal(decode_pgm(encode_pgm(px)), px)


def test_pgm_header_comments():
    px = _px(3, 2, 3)
    data = b"P5\n# a comment\n3 2\n# another\n255\n" + px.tobytes()
    assert np.array_equal(decode_pgm(data), px)


def test_stream_bytes_deterministic():
    a, b = stream_bytes(17, 50), stream_bytes(17, 50)
    assert np.array_equal(a, b)
    assert not np.array_equal(stream_bytes(18, 50), a)


def test_synth_payload_decodes_to_stream():
    # the invariant the DuckDB oracle relies on: decoded content ==
    # stream_bytes, through a genuine container roundtrip
    for d in range(12):
        mime, raw = synth_payload(d)
        if mime == "image/bmp":
            px = decode_bmp(raw)
            h, w, _ = px.shape
            assert np.array_equal(px.ravel(), stream_bytes(d, w * h * 3))
        elif mime == "audio/wav":
            samples, rate = decode_wav(raw)
            assert rate == 8000
            assert np.array_equal(
                samples.ravel().view(np.uint16).astype(np.int64) % 256 * 0
                + samples.ravel(),
                stream_bytes(d, samples.size * 2).view("<i2"),
            )
        else:
            px = decode_pgm(raw)
            h, w = px.shape
            assert np.array_equal(px.ravel(), stream_bytes(d, w * h))


def test_decode_media_spark(spark):
    from gminer_spark.multimodal.binary import decode_media, synth_media

    docs = spark.range(0, 30).withColumnRenamed("id", "doc_id")
    out = decode_media(synth_media(docs)).orderBy("doc_id").collect()
    assert len(out) == 30
    for r in out:
        d = r.doc_id
        mime, raw = synth_payload(d)
        assert r.mime == mime
        if mime == "image/bmp":
            px = decode_bmp(raw).astype(np.int64)
            assert (r.width, r.height, r.channels) == (px.shape[1], px.shape[0], 3)
            assert r.val_sum == int(px.sum())
            assert r.ch1_sum == int(px[:, :, 1].sum())
        elif mime == "audio/wav":
            samples, rate = decode_wav(raw)
            assert (r.rate, r.n_vals) == (rate, samples.size)
            assert r.val_sum == int(samples.astype(np.int64).sum())
