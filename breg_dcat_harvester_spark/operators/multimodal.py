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


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# SOF markers carrying frame dimensions: C0-CF minus DHT(C4)/JPG(C8)/DAC(CC)
_JPEG_SOF = {m for m in range(0xC0, 0xD0)} - {0xC4, 0xC8, 0xCC}


def parse_image_header(payload: bytes) -> tuple[str | None, int | None, int | None]:
    """REAL (codec-free) image metadata: (format, width, height).

    Pure-Python header parsing of the three container formats whose
    dimensions live in fixed header structures — PNG (IHDR), JPEG (first
    SOF segment), GIF (logical screen descriptor).  This is the first
    stage a real multimodal pipeline runs (filter/bucket by dimensions
    BEFORE paying pixel decode); the pixel decoder itself stays pluggable
    (``real_decode``).  Unrecognized or truncated payloads return
    ``(None, None, None)`` — never a guess.
    """
    b = payload or b""
    if len(b) >= 24 and b[:8] == _PNG_SIG and b[12:16] == b"IHDR":
        return (
            "png",
            int.from_bytes(b[16:20], "big"),
            int.from_bytes(b[20:24], "big"),
        )
    if len(b) >= 10 and b[:6] in (b"GIF87a", b"GIF89a"):
        return (
            "gif",
            int.from_bytes(b[6:8], "little"),
            int.from_bytes(b[8:10], "little"),
        )
    if len(b) >= 4 and b[:2] == b"\xff\xd8":
        i = 2
        while i + 4 <= len(b):
            if b[i] != 0xFF:
                break
            marker = b[i + 1]
            if marker == 0xFF:  # fill byte
                i += 1
                continue
            if marker in (0x01,) or 0xD0 <= marker <= 0xD9:  # standalone
                i += 2
                continue
            seglen = int.from_bytes(b[i + 2:i + 4], "big")
            if seglen < 2:
                break
            if marker in _JPEG_SOF:
                if i + 9 <= len(b):
                    return (
                        "jpeg",
                        int.from_bytes(b[i + 7:i + 9], "big"),
                        int.from_bytes(b[i + 5:i + 7], "big"),
                    )
                break
            i += 2 + seglen
        return ("jpeg", None, None)  # JPEG signature but no parseable SOF
    return (None, None, None)


def make_png(width: int, height: int, filler: bytes = b"") -> bytes:
    """Minimal structurally-valid PNG (signature + correct-CRC IHDR);
    deterministic — used by tests and the planted-payload contract query."""
    import struct
    import zlib

    ihdr = struct.pack(">II5B", width, height, 8, 2, 0, 0, 0)
    chunk = b"IHDR" + ihdr
    return (
        _PNG_SIG
        + struct.pack(">I", len(ihdr))
        + chunk
        + struct.pack(">I", zlib.crc32(chunk) & 0xFFFFFFFF)
        + filler
    )


def make_jpeg(width: int, height: int, filler: bytes = b"") -> bytes:
    """Minimal JPEG: SOI + SOF0 frame header + payload filler + EOI."""
    import struct

    # precision 8, height, width, 3 components + component specs
    sof = struct.pack(">BHHB", 8, height, width, 3) + b"\x01\x11\x00\x02\x11\x01\x03\x11\x01"
    return (
        b"\xff\xd8"
        + b"\xff\xc0"
        + struct.pack(">H", len(sof) + 2)
        + sof
        + filler
        + b"\xff\xd9"
    )


def make_gif(width: int, height: int, filler: bytes = b"") -> bytes:
    import struct

    return b"GIF89a" + struct.pack("<HH", width, height) + filler


def image_metadata(assets: DataFrame) -> DataFrame:
    """Arrow-batched REAL header metadata per asset: (asset_id, kind,
    n_bytes, fmt, width, height) — map-only, payload projected away."""
    out_schema = StructType(
        [
            StructField("asset_id", StringType(), False),
            StructField("kind", StringType(), False),
            StructField("n_bytes", LongType(), False),
            StructField("fmt", StringType(), True),
            StructField("width", IntegerType(), True),
            StructField("height", IntegerType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [parse_image_header(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(
                        lambda x: len(x) if x is not None else 0
                    ),
                    "fmt": pd.array([m[0] for m in meta], dtype="string"),
                    "width": pd.array([m[1] for m in meta], dtype="Int32"),
                    "height": pd.array([m[2] for m in meta], dtype="Int32"),
                }
            )

    return assets.mapInPandas(run, schema=out_schema)


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
