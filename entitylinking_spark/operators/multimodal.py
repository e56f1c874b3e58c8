"""Multimodal columns: binary payloads + typed metadata.

Images/audio/video are opaque `binary` columns with a typed metadata
struct (schemas.MEDIA). The Spark-side plumbing — schema, partitioning,
Arrow batch shape, UDF signature — is real and tested; the actual decode
is STUBBED (image/audio libraries are not in this container): with
`use_stub_decoder=True` a deterministic fake derived from the payload
bytes is produced, otherwise NotImplementedError tells integrators where
to plug Pillow/torchaudio/ffmpeg.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

FEATURE_SCHEMA = (
    "media_id string, kind string, n_bytes long, payload_sha string, "
    "feature array<float>"
)


def _stub_decode(payload: bytes, kind: str, dim: int) -> np.ndarray:
    """Deterministic fake 'decoded feature' — STILL A STUB, not a decoder.

    Stands in for decode->resize->embed; replace with a real decoder where
    the libraries exist. Each component is md5-derived on a 1/4096 grid:
    f_i = (first 60 md5 bits of "{sha256(payload)}:{kind}:{i}") % 4096
          / 4096
    — exactly representable in float32 AND recomputable by the DuckDB
    oracle (media_features_demo is value-checked end to end through the
    mapInPandas plumbing despite the decode being fake)."""
    sha = hashlib.sha256(payload).hexdigest()
    ks = [
        int(hashlib.md5(f"{sha}:{kind}:{i}".encode()).hexdigest()[:15], 16) % 4096
        for i in range(dim)
    ]
    return (np.array(ks, dtype=np.float64) / 4096.0).astype(np.float32)


def extract_features(media: DataFrame, dim: int = 16,
                     use_stub_decoder: bool = True) -> DataFrame:
    """MEDIA rows -> per-item feature vectors via mapInPandas.

    mapInPandas (not a scalar UDF) because a real decoder wants batch-level
    control: shared decoder state per partition, early filtering of corrupt
    payloads, and per-batch memory bounds for large blobs.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not use_stub_decoder:
                raise NotImplementedError(
                    "real media decoding requires image/audio libraries not "
                    "present in this environment; pass use_stub_decoder=True "
                    "or plug a decoder in operators/multimodal.py"
                )
            payloads = pdf["payload"]
            feats = [
                _stub_decode(bytes(p) if p is not None else b"", k, dim)
                for p, k in zip(payloads, pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(bytes(p)) if p is not None else 0 for p in payloads],
                    "payload_sha": [
                        hashlib.sha256(bytes(p) if p is not None else b"").hexdigest()
                        for p in payloads
                    ],
                    "feature": [f.tolist() for f in feats],
                }
            )

    return media.mapInPandas(decode_batches, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plan: expands metadata into (media_id, frame_idx)
    rows JVM-side; the decode of each sampled frame is the stubbed step."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.coalesce(F.col("meta.n_frames"), F.lit(1)) - 1, F.lit(0)),
                    F.lit(every_n),
                )
            ).alias("frame_idx"),
        )
    )


def media_stats(media: DataFrame) -> DataFrame:
    """Per-kind size/metadata stats — pure relational, no decode."""
    return media.groupBy("kind").agg(
        F.count("*").alias("n_items"),
        F.avg(F.length(F.col("payload"))).alias("avg_bytes"),
        F.max(F.length(F.col("payload"))).alias("max_bytes"),
    )
