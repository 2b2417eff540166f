"""Multimodal column plumbing: binary payloads + typed metadata.

Image/audio/video assets are opaque ``binary`` columns with a typed metadata
struct; decode/feature-extract/resize/frame-sample run as Arrow-batched
``mapInPandas`` operators so payload bytes never round-trip through Python
row objects.  The actual codecs are NOT available in this container, so the
decode kernel is pluggable: the default raises NotImplementedError, and a
deterministic fake (sha-derived pseudo-features) keeps the Spark-side
plumbing — schema, batching, partitioning — real and testable.

Scale notes: payloads dominate bytes, so the operators (a) never shuffle the
payload column (feature extraction projects it away before any wide stage),
and (b) cap Arrow batch bytes via maxRecordsPerBatch; at 100 TB the asset
table is partitioned by bucket(asset_id) and feature extraction is a
map-only stage writing a payload-free features table.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

ASSETS = StructType(
    [
        StructField("asset_id", StringType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURES = StructType(
    [
        StructField("asset_id", StringType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("feature", ArrayType(FloatType()), True),
    ]
)


def real_decode(payload: bytes, kind: str) -> np.ndarray:
    """Placeholder for the codec-backed decoder (PIL/ffmpeg/torchaudio).

    Those libraries are not in this container; on a real cluster, swap this
    in via ``extract_features(df, decode=...)``.
    """
    raise NotImplementedError(
        "codec libraries unavailable in this environment; pass decode="
        "fake_decode or a codec-backed callable"
    )


def fake_decode(payload: bytes, kind: str, dim: int = 16) -> np.ndarray:
    """Deterministic stand-in: sha256-seeded pseudo-features of the bytes."""
    digest = hashlib.sha256(payload or b"").digest()
    raw = np.frombuffer((digest * ((dim * 4) // len(digest) + 1))[: dim * 4], dtype="<u4")
    return (raw.astype(np.float64) / 2**32).astype(np.float32)


def extract_features(
    assets: DataFrame,
    decode: Callable[[bytes, str], np.ndarray] = real_decode,
) -> DataFrame:
    """Arrow-batched feature extraction; projects the payload away."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from breg_dcat_harvester_spark.functions.workerenv import pin_native_threads
        pin_native_threads()

        for pdf in batches:
            feats = [
                decode(p if p is not None else b"", k).tolist()
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0),
                    "feature": feats,
                }
            )

    return assets.mapInPandas(run, schema=FEATURES)


def sample_frames(
    assets: DataFrame,
    every_ms: int = 1000,
    decode_frame: Callable[[bytes, int], bytes] | None = None,
) -> DataFrame:
    """Frame sampling for video assets: one row per sampled timestamp.

    ``decode_frame(payload, ts_ms) -> frame bytes`` is pluggable like decode;
    the default deterministic fake slices the payload (keeps plumbing honest).
    """
    out_schema = StructType(
        [
            StructField("asset_id", StringType(), False),
            StructField("ts_ms", LongType(), False),
            StructField("frame", BinaryType(), True),
        ]
    )

    def default_frame(payload: bytes, ts_ms: int) -> bytes:
        # ":"-delimited ASCII suffix (not raw LE bytes) so any engine can
        # replay the fake bit-exactly over text payloads — the DuckDB
        # oracle computes sha256(text || ':' || ts) and gates this.
        h = hashlib.sha256(payload + b":" + str(ts_ms).encode("ascii"))
        return h.digest()[:16]

    fn = decode_frame or default_frame

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from breg_dcat_harvester_spark.functions.workerenv import pin_native_threads
        pin_native_threads()

        for pdf in batches:
            rows = {"asset_id": [], "ts_ms": [], "frame": []}
            vids = pdf[pdf["kind"] == "video"]
            for aid, payload, dur in zip(
                vids["asset_id"], vids["payload"], vids["duration_ms"]
            ):
                payload = payload if payload is not None else b""
                for ts in range(0, int(dur or 0), every_ms):
                    rows["asset_id"].append(aid)
                    rows["ts_ms"].append(ts)
                    rows["frame"].append(fn(payload, ts))
            yield pd.DataFrame(rows)

    return assets.mapInPandas(run, schema=out_schema)
