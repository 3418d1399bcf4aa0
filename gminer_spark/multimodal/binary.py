"""Multimodal columns: binary payloads + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct; decode / feature-extraction runs as Arrow-batched
``mapInPandas`` so each Python call sees a whole batch of payloads.

The decode step itself is STUBBED (image/audio libs are not in this
container): ``decode_features(..., stub=True)`` computes a
deterministic byte-statistics feature vector so the Spark-side
plumbing — schema, batching, partitioning — is real and testable;
``stub=False`` raises NotImplementedError where a real
PIL/librosa/ffmpeg call would go.
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
                    "real decode requires PIL/librosa/ffmpeg — not in this image"
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
