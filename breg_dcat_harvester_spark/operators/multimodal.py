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
    """REAL pixel decode where no codec library is needed: PNG decodes
    fully (zlib inflate + filter reconstruction, pure stdlib —
    ``decode_png``); the flattened pixel bytes return as float32.

    JPEG and GIF pixels stay behind NotImplementedError with an honest
    reason — their pixel data is entropy-coded (Huffman DCT / LZW) and
    genuinely requires a codec library (PIL/ffmpeg), which this container
    does not ship; on a real cluster, swap one in via
    ``extract_features(df, decode=...)``.
    """
    b = payload or b""
    if b[:8] == _PNG_SIG:
        return decode_png(b).reshape(-1).astype(np.float32)
    raise NotImplementedError(
        "pixel decode without a codec library is only possible for PNG "
        "(JPEG is Huffman/DCT entropy-coded, GIF is LZW); install a codec "
        "and pass decode=, or use fake_decode for plumbing tests"
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


# --- real PNG pixel codec (pure stdlib: zlib + the 5 scanline filters) -----

_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # colour type -> samples/pixel


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(payload: bytes) -> np.ndarray:
    """Decode a PNG to its pixel array (height, width, channels) uint8 —
    pure stdlib: chunk walk with CRC verification, concatenated-IDAT zlib
    inflate, then scanline filter reconstruction (all five filter types
    0-4 per the PNG spec).

    Supported surface: bit depth 8, colour types 0/2/4/6 (grayscale, RGB,
    gray+alpha, RGBA), non-interlaced — the full non-palette baseline.
    Anything else (16-bit, palette, Adam7) raises NotImplementedError
    loudly; malformed structure (bad CRC, short IDAT) raises ValueError.
    Never a guessed pixel.
    """
    import struct
    import zlib

    b = payload or b""
    if b[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    i = 8
    ihdr = None
    idat = bytearray()
    while i + 8 <= len(b):
        (length,) = struct.unpack(">I", b[i:i + 4])
        ctype = b[i + 4:i + 8]
        data = b[i + 8:i + 8 + length]
        if len(data) != length or i + 12 + length > len(b):
            raise ValueError(f"truncated PNG chunk {ctype!r}")
        (crc,) = struct.unpack(">I", b[i + 8 + length:i + 12 + length])
        if crc != (zlib.crc32(ctype + data) & 0xFFFFFFFF):
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">II5B", data)
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
        i += 12 + length
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    width, height, depth, ctype_n, comp, filt, interlace = ihdr
    if depth != 8 or ctype_n not in _PNG_CHANNELS or comp != 0 or filt != 0 \
            or interlace != 0:
        raise NotImplementedError(
            f"PNG profile outside the codec-free subset: depth={depth} "
            f"colour={ctype_n} interlace={interlace} (8-bit non-interlaced "
            "gray/RGB/gray-alpha/RGBA only)"
        )
    ch = _PNG_CHANNELS[ctype_n]
    stride = width * ch
    if not idat:
        raise ValueError("PNG has no pixel data (missing IDAT)")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as ex:
        raise ValueError(f"PNG IDAT stream corrupt: {ex}") from ex
    if len(raw) != height * (1 + stride):
        raise ValueError(
            f"PNG pixel data length {len(raw)} != expected "
            f"{height * (1 + stride)}"
        )
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for r in range(height):
        f = raw[r * (1 + stride)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=r * (1 + stride) + 1
        ).astype(np.int32)
        if f == 0:
            rec = line
        elif f == 2:  # Up
            rec = (line + prev) & 0xFF
        elif f in (1, 3, 4):  # Sub / Average / Paeth: sequential in x
            rec = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                left = rec[x - ch] if x >= ch else 0
                up = int(prev[x])
                ul = int(prev[x - ch]) if x >= ch else 0
                if f == 1:
                    pred = left
                elif f == 3:
                    pred = (left + up) // 2
                else:
                    pred = _paeth(int(left), up, ul)
                rec[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"PNG scanline filter {f} is not in 0-4")
        out[r] = rec.astype(np.uint8)
        prev = out[r]
    return out.reshape(height, width, ch)


def encode_png(pixels: np.ndarray, filters: list[int] | None = None) -> bytes:
    """Encode (height, width, channels) uint8 pixels as a real PNG —
    signature, IHDR, one zlib-compressed IDAT of filtered scanlines,
    IEND, all CRCs correct.  ``filters`` picks the per-row filter type
    (default: row % 5, exercising all five); the inverse of
    ``decode_png``'s reconstruction, used by tests and the planted-payload
    contract query."""
    import struct
    import zlib

    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    height, width, ch = px.shape
    ctype_n = {1: 0, 3: 2, 2: 4, 4: 6}[ch]
    stride = width * ch
    flat = px.reshape(height, stride).astype(np.int32)
    lines = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for r in range(height):
        f = (filters[r] if filters is not None else r) % 5
        cur = flat[r]
        left = np.concatenate([np.zeros(ch, dtype=np.int32), cur[:-ch]]) \
            if stride > ch else np.zeros(stride, dtype=np.int32)
        upleft = np.concatenate([np.zeros(ch, dtype=np.int32), prev[:-ch]]) \
            if stride > ch else np.zeros(stride, dtype=np.int32)
        if f == 0:
            filt = cur
        elif f == 1:
            filt = (cur - left) & 0xFF
        elif f == 2:
            filt = (cur - prev) & 0xFF
        elif f == 3:
            filt = (cur - (left + prev) // 2) & 0xFF
        else:
            pred = np.array(
                [_paeth(int(a), int(b), int(c))
                 for a, b, c in zip(left, prev, upleft)],
                dtype=np.int32,
            )
            filt = (cur - pred) & 0xFF
        lines.append(f)
        lines.extend(filt.astype(np.uint8).tobytes())
        prev = cur

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">II5B", width, height, 8, ctype_n, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(lines)))
        + chunk(b"IEND", b"")
    )


def resize_nearest(arr: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize of an (h, w, c) uint8 array — INTEGER-exact
    index mapping (src_i = floor(i·h/out_h)), so any engine replays the
    selected pixels bit-for-bit; the standard pre-filter normalization
    step of a multimodal pipeline (bucketing thumbnails before paying a
    model forward pass)."""
    if out_h <= 0 or out_w <= 0:
        raise ValueError("resize dimensions must be positive")
    h, w, _c = arr.shape
    rows = (np.arange(out_h, dtype=np.int64) * h) // out_h
    cols = (np.arange(out_w, dtype=np.int64) * w) // out_w
    return arr[rows][:, cols]


def image_resize_stats(
    assets: DataFrame, out_h: int, out_w: int
) -> DataFrame:
    """Arrow-batched decode -> nearest-neighbor resize -> positionally
    weighted checksums per asset: (asset_id, width, height, channels,
    px_sum, px_wsum) where width/height are the RESIZED dims and the
    checksums cover the resized pixel bytes in order.  Map-only; payload
    projected away before any wide stage."""
    out_schema = StructType(
        [
            StructField("asset_id", StringType(), False),
            StructField("width", IntegerType(), True),
            StructField("height", IntegerType(), True),
            StructField("channels", IntegerType(), True),
            StructField("px_sum", LongType(), True),
            StructField("px_wsum", LongType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from breg_dcat_harvester_spark.functions.workerenv import (
            pin_native_threads,
        )

        pin_native_threads()
        for pdf in batches:
            rows = {k: [] for k in
                    ("asset_id", "width", "height", "channels",
                     "px_sum", "px_wsum")}
            for aid, p in zip(pdf["asset_id"], pdf["payload"]):
                arr = resize_nearest(decode_png(p), out_h, out_w)
                flat = arr.reshape(-1).astype(np.int64)
                rows["asset_id"].append(aid)
                rows["height"].append(arr.shape[0])
                rows["width"].append(arr.shape[1])
                rows["channels"].append(arr.shape[2])
                rows["px_sum"].append(int(flat.sum()))
                rows["px_wsum"].append(
                    int((flat * (np.arange(flat.size, dtype=np.int64) + 1)).sum())
                )
            yield pd.DataFrame(rows)

    return assets.select("asset_id", "payload").mapInPandas(
        run, schema=out_schema
    )


def image_pixel_stats(assets: DataFrame) -> DataFrame:
    """Arrow-batched REAL pixel statistics per asset: (asset_id, width,
    height, channels, px_sum, px_wsum) — map-only, payload projected away.

    Dimensions come from the DECODED array's shape (not headers) and the
    positionally-weighted checksum ``px_wsum = Σ (i+1)·byte[i]`` pins
    every reconstructed byte in order, so a single wrong pixel anywhere
    breaks the oracle's formula replay."""
    out_schema = StructType(
        [
            StructField("asset_id", StringType(), False),
            StructField("width", IntegerType(), True),
            StructField("height", IntegerType(), True),
            StructField("channels", IntegerType(), True),
            StructField("px_sum", LongType(), True),
            StructField("px_wsum", LongType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from breg_dcat_harvester_spark.functions.workerenv import (
            pin_native_threads,
        )

        pin_native_threads()
        for pdf in batches:
            rows = {k: [] for k in
                    ("asset_id", "width", "height", "channels",
                     "px_sum", "px_wsum")}
            for aid, p in zip(pdf["asset_id"], pdf["payload"]):
                arr = decode_png(p)  # (h, w, c) uint8
                flat = arr.reshape(-1).astype(np.int64)
                rows["asset_id"].append(aid)
                rows["height"].append(arr.shape[0])
                rows["width"].append(arr.shape[1])
                rows["channels"].append(arr.shape[2])
                rows["px_sum"].append(int(flat.sum()))
                rows["px_wsum"].append(
                    int((flat * (np.arange(flat.size, dtype=np.int64) + 1)).sum())
                )
            yield pd.DataFrame(rows)

    return assets.select("asset_id", "payload").mapInPandas(
        run, schema=out_schema
    )


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
