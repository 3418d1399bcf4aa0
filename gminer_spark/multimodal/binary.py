"""Multimodal columns: binary payloads + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct; decode / feature-extraction runs as Arrow-batched
``mapInPandas`` so each Python call sees a whole batch of payloads.

Decode is PARTIAL REAL: uncompressed container formats — BMP
(BITMAPINFOHEADER 24-bit), WAV (16-bit PCM), PGM (binary P5) — are
decoded for real with stdlib ``struct`` + numpy (see
:mod:`gminer_spark.multimodal.codecs`) via :func:`decode_media`;
compressed formats (JPEG/PNG/MP3/H.264) still fall back to the
declared stub (``decode_features(..., stub=True)`` byte-statistics
vector) because no decoder library ships in this container.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

META_SCHEMA = "mime string, n_bytes long, checksum string"
FEATURE_SCHEMA = (
    "doc_id long, mime string, n_bytes long, feat array<double>"
)


def attach_payload(documents: DataFrame, mime: str = "text/plain") -> DataFrame:
    """documents → + payload:binary + meta struct (mime, n_bytes, checksum).

    Stands in for an ingest that joins a WARC/object-store blob column;
    metadata is computed JVM-side (no UDF).
    """
    payload = F.encode(F.col("text"), "UTF-8")
    return documents.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit(mime).alias("mime"),
            F.length(payload).cast("long").alias("n_bytes"),
            F.md5(payload).alias("checksum"),
        ).alias("meta"),
    )


def decode_features(
    with_payload: DataFrame, n_features: int = 8, stub: bool = True
) -> DataFrame:
    """Batch decode/feature-extract over binary payloads via mapInPandas.

    Real pipelines put image resize / frame sampling / mel spectrograms
    here.  The stub emits a deterministic per-payload byte-statistics
    vector (moments + length), so downstream similarity/clustering
    plumbing can be exercised end-to-end.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not stub:
                raise NotImplementedError(
                    "real decode of compressed formats requires PIL/librosa/"
                    "ffmpeg — not in this image; BMP/WAV/PGM are decoded for "
                    "real by decode_media()"
                )
            feats = []
            for raw in pdf["payload"]:
                b = np.frombuffer(bytes(raw), dtype=np.uint8).astype(np.float64)
                if b.size == 0:
                    feats.append([0.0] * n_features)
                    continue
                v = [
                    float(b.size),
                    float(b.mean()),
                    float(b.std()),
                    float(b.min()),
                    float(b.max()),
                    float(np.median(b)),
                    float((b == 32).mean()),  # space density
                    float((b > 127).mean()),  # non-ascii density
                ]
                feats.append(v[:n_features])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": [m["mime"] for m in pdf["meta"]],
                    "n_bytes": [m["n_bytes"] for m in pdf["meta"]],
                    "feat": feats,
                }
            )

    return with_payload.mapInPandas(batches, FEATURE_SCHEMA)


MEDIA_SCHEMA = "doc_id long, mime string, payload binary"
DECODE_SCHEMA = (
    "doc_id long, mime string, width int, height int, channels int, "
    "rate int, n_vals long, val_sum long, ch0_sum long, ch1_sum long, "
    "ch2_sum long"
)


def synth_media(documents: DataFrame) -> DataFrame:
    """doc_id → a REAL container payload (BMP / WAV / PGM, cycling by
    doc_id % 3) whose content bytes are the md5-derived stream of
    :func:`codecs.stream_bytes` — deterministic, so an oracle can
    recompute the decoded aggregates without parsing containers."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from gminer_spark.multimodal.codecs import synth_payload

        for pdf in it:
            mimes, payloads = [], []
            for d in pdf["doc_id"]:
                mime, raw = synth_payload(int(d))
                mimes.append(mime)
                payloads.append(raw)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "mime": mimes, "payload": payloads}
            )

    return documents.select("doc_id").mapInPandas(gen, MEDIA_SCHEMA)


def decode_media(media: DataFrame) -> DataFrame:
    """REAL stdlib decode of (doc_id, mime, payload) → exact-integer
    shape + content aggregates, Arrow-batched.

    Per payload: parse the container header, decode pixels/samples,
    and emit ``(width, height, channels, rate, n_vals, val_sum,
    ch0_sum, ch1_sum, ch2_sum)`` — all exact integers, so the values
    are cross-engine comparable.  BMP channel sums are per RGB channel
    (catches a forgotten BGR swap); WAV val_sum is the signed-sample
    sum (catches endianness/sign errors); BMP row order and padding
    are exercised by the bottom-up padded rows.  Unsupported mimes
    raise (compressed formats need the stub path).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from gminer_spark.multimodal.codecs import decode_bmp, decode_pgm, decode_wav

        for pdf in it:
            rows = []
            for d, mime, raw in zip(pdf["doc_id"], pdf["mime"], pdf["payload"]):
                data = bytes(raw)
                if mime == "image/bmp":
                    px = decode_bmp(data).astype(np.int64)
                    h, w, _ = px.shape
                    rows.append(
                        (int(d), mime, w, h, 3, 0, w * h * 3, int(px.sum()),
                         int(px[:, :, 0].sum()), int(px[:, :, 1].sum()),
                         int(px[:, :, 2].sum()))
                    )
                elif mime == "audio/wav":
                    samples, rate = decode_wav(data)
                    s = samples.astype(np.int64)
                    rows.append(
                        (int(d), mime, 0, 0, s.shape[1], rate, s.size,
                         int(s.sum()), int(s.sum()), 0, 0)
                    )
                elif mime == "image/x-portable-graymap":
                    px = decode_pgm(data).astype(np.int64)
                    h, w = px.shape
                    rows.append(
                        (int(d), mime, w, h, 1, 0, w * h, int(px.sum()),
                         int(px.sum()), 0, 0)
                    )
                else:
                    raise NotImplementedError(f"no stdlib decoder for {mime}")
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "mime", "width", "height", "channels", "rate",
                    "n_vals", "val_sum", "ch0_sum", "ch1_sum", "ch2_sum",
                ],
            )

    return media.mapInPandas(batches, DECODE_SCHEMA)


def decode_media_oracle_sql(doc_ids_sql: str = "SELECT doc_id FROM documents") -> str:
    """DuckDB mirror of synth_media |> decode_media: recomputes the
    DECODED aggregates from the md5 content-stream definition
    (codecs.stream_bytes) — no container parsing — so any Spark-side
    header/padding/BGR/endianness mistake diverges the sums.

    Layout mirrored from codecs.synth_dims / synth_payload:
    f = doc_id % 3 → 0=bmp(w=3+id%4, h=2+id%3), 1=wav(ns=16+(id%5)*4),
    2=pgm(w=4+id%4, h=2+id%2).  WAV samples are little-endian signed
    16-bit: sample k = b[2k] + 256·b[2k+1] − 65536·[b[2k+1] ≥ 128].
    """
    return f"""
WITH ids AS ({doc_ids_sql}),
dims AS (
    SELECT doc_id, doc_id % 3 AS f,
           CASE doc_id % 3 WHEN 0 THEN 3 + doc_id % 4
                           WHEN 2 THEN 4 + doc_id % 4 ELSE 0 END AS w,
           CASE doc_id % 3 WHEN 0 THEN 2 + doc_id % 3
                           WHEN 2 THEN 2 + doc_id % 2 ELSE 0 END AS h,
           CASE doc_id % 3 WHEN 1 THEN 16 + (doc_id % 5) * 4 ELSE 0 END AS ns
    FROM ids),
need AS (
    SELECT *, CASE f WHEN 0 THEN w * h * 3 WHEN 1 THEN ns * 2
                     ELSE w * h END AS nbytes
    FROM dims),
blocks0 AS (
    SELECT doc_id, nbytes, UNNEST(range((nbytes + 15) // 16)) AS blk FROM need),
blocks AS MATERIALIZED (
    SELECT doc_id, nbytes, blk,
           md5('px:' || CAST(doc_id AS VARCHAR) || ':' || CAST(blk AS VARCHAR)) AS hx
    FROM blocks0),
bytes AS MATERIALIZED (
    SELECT b.doc_id, b.blk * 16 + j.j AS idx,
           (('0x' || substr(b.hx, CAST(j.j * 2 + 1 AS INT), 2))::BIGINT) AS bv
    FROM blocks b, range(16) j(j)
    WHERE b.blk * 16 + j.j < b.nbytes),
sums AS MATERIALIZED (
    SELECT doc_id,
           SUM(bv) AS all_sum,
           SUM(CASE WHEN idx % 3 = 0 THEN bv ELSE 0 END) AS c0,
           SUM(CASE WHEN idx % 3 = 1 THEN bv ELSE 0 END) AS c1,
           SUM(CASE WHEN idx % 3 = 2 THEN bv ELSE 0 END) AS c2,
           SUM(CASE WHEN idx % 2 = 0 THEN bv ELSE 0 END) AS lo_sum,
           SUM(CASE WHEN idx % 2 = 1 THEN bv ELSE 0 END) AS hi_sum,
           SUM(CASE WHEN idx % 2 = 1 AND bv >= 128 THEN 1 ELSE 0 END) AS n_neg
    FROM bytes GROUP BY doc_id)
SELECT n.doc_id,
       CASE n.f WHEN 0 THEN 'image/bmp' WHEN 1 THEN 'audio/wav'
                ELSE 'image/x-portable-graymap' END AS mime,
       CAST(n.w AS INT) AS width, CAST(n.h AS INT) AS height,
       CAST(CASE n.f WHEN 0 THEN 3 ELSE 1 END AS INT) AS channels,
       CAST(CASE n.f WHEN 1 THEN 8000 ELSE 0 END AS INT) AS rate,
       CAST(CASE n.f WHEN 1 THEN n.ns ELSE n.nbytes END AS BIGINT) AS n_vals,
       CAST(CASE n.f WHEN 1 THEN s.lo_sum + 256 * s.hi_sum - 65536 * s.n_neg
                     ELSE s.all_sum END AS BIGINT) AS val_sum,
       CAST(CASE n.f WHEN 0 THEN s.c0
                     WHEN 1 THEN s.lo_sum + 256 * s.hi_sum - 65536 * s.n_neg
                     ELSE s.all_sum END AS BIGINT) AS ch0_sum,
       CAST(CASE n.f WHEN 0 THEN s.c1 ELSE 0 END AS BIGINT) AS ch1_sum,
       CAST(CASE n.f WHEN 0 THEN s.c2 ELSE 0 END AS BIGINT) AS ch2_sum
FROM need n JOIN sums s USING (doc_id)"""
