"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

At 100 TB the payload never round-trips through the driver: binary columns
ride in parquet/object storage, and decode / feature-extract / resize /
frame-sample run as Arrow-batched `mapInPandas` stages over whatever
partitioning the upstream scan produced.  Image *metadata* needs no codec
library at all — PNG/JPEG/GIF/BMP dimensions live in the container header
and `parse_image_header` reads them with stdlib `struct`.  Full pixel
decode (resize, CLIP-style embedding) does need Pillow/ffmpeg, which this
container doesn't ship; those stages keep real Spark plumbing with a
clearly-marked stub body as the single function to swap.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


#: JPEG start-of-frame markers that carry dimensions (SOF0-15 minus
#: DHT/JPG/DAC which reuse the 0xC4/0xC8/0xCC slots)
_SOF_MARKERS = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}


def parse_image_header(payload: bytes) -> tuple[str, int | None, int | None]:
    """Real image metadata from container headers — stdlib only, no codec.

    PNG IHDR (first chunk, big-endian u32 dims), JPEG SOFn via a marker
    walk, GIF87a/89a logical-screen descriptor (little-endian u16), BMP
    BITMAPINFOHEADER (little-endian i32, height may be negative for
    top-down rows).  Unknown or truncated containers yield
    ``('unknown', None, None)`` so a mixed 100 TB corpus keeps flowing;
    route the unknowns to quarantine downstream instead of failing the job.
    """
    n = len(payload)
    if n >= 24 and payload[:8] == b"\x89PNG\r\n\x1a\n" and payload[12:16] == b"IHDR":
        w, h = struct.unpack(">II", payload[16:24])
        return ("png", w, h)
    if n >= 10 and payload[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", payload[6:10])
        return ("gif", w, h)
    if n >= 4 and payload[:2] == b"\xff\xd8":
        i = 2
        while i + 1 < n and payload[i] == 0xFF:
            # spec allows any number of 0xFF fill bytes between segments
            while i + 1 < n and payload[i + 1] == 0xFF:
                i += 1
            if i + 1 >= n:  # payload ends in fill bytes: truncated, keep flowing
                break
            marker = payload[i + 1]
            if marker in (0xD9, 0xDA):  # EOI / start-of-scan: no SOF seen
                break
            if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # TEM / RSTn: no length
                i += 2
                continue
            if marker in _SOF_MARKERS:
                if i + 9 <= n:
                    h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
                    return ("jpeg", w, h)
                break
            if i + 4 > n:
                break
            (seg,) = struct.unpack(">H", payload[i + 2 : i + 4])
            i += 2 + seg
        return ("jpeg", None, None)
    if n >= 22 and payload[:2] == b"BM":
        (dib,) = struct.unpack("<I", payload[14:18])
        if dib == 12:  # BITMAPCOREHEADER: u16 dims, never negative
            w16, h16 = struct.unpack("<HH", payload[18:22])
            return ("bmp", w16, h16)
        if n >= 26:
            w, h = struct.unpack("<ii", payload[18:26])
            return ("bmp", w, abs(h))
        return ("bmp", None, None)
    return ("unknown", None, None)


def synthetic_image_bytes(doc_id: int) -> bytes:
    """Deterministic spec-valid minimal image fixture: doc_id picks the
    container (png/jpeg/gif round-robin) and the dimensions.  The headers
    are real — PNG IHDR carries a computed CRC, JPEG marker lengths are
    exact — so `parse_image_header` exercises the true decode path, and a
    DuckDB oracle can predict (format, width, height, n_bytes) from
    doc_id arithmetic alone (33/41/14 bytes per container)."""
    w = 16 + doc_id % 512
    h = 16 + (doc_id * 7) % 512
    fmt = doc_id % 3
    if fmt == 0:  # PNG: signature + IHDR chunk = 33 bytes
        body = b"IHDR" + struct.pack(">II", w, h) + b"\x08\x02\x00\x00\x00"
        return (
            b"\x89PNG\r\n\x1a\n"
            + struct.pack(">I", 13)
            + body
            + struct.pack(">I", zlib.crc32(body))
        )
    if fmt == 1:  # JPEG: SOI + APP0/JFIF + SOF0 + EOI = 41 bytes
        app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
        sof0 = (
            b"\xff\xc0"
            + struct.pack(">H", 17)
            + b"\x08"
            + struct.pack(">HH", h, w)
            + b"\x03\x01\x22\x00\x02\x11\x01\x03\x11\x01"
        )
        return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"
    # GIF89a: header + logical screen descriptor + trailer = 14 bytes
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x00" + b"\x3b"


PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def with_image_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Fixture source: one spec-valid image payload per id.  Stands in for
    the object-store scan that feeds real binaries at scale (map-only, keeps
    the upstream partitioning)."""

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {"doc_id": ids, "payload": [synthetic_image_bytes(int(i)) for i in ids]}
            )

    return df.select(id_col).mapInPandas(batches, PAYLOAD_SCHEMA)


def decode_image_meta(df: DataFrame, id_col: str = "doc_id", bin_col: str = "payload") -> DataFrame:
    """binary column → typed metadata via Arrow-batched mapInPandas, using
    the real stdlib header parser (no codec library needed for metadata)."""

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            metas = [parse_image_header(bytes(b) if b is not None else b"") for b in pdf[bin_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": [len(b) if b is not None else 0 for b in pdf[bin_col]],
                    "format": [m[0] for m in metas],
                    "width": pd.array([m[1] for m in metas], dtype="Int32"),
                    "height": pd.array([m[2] for m in metas], dtype="Int32"),
                }
            )

    return df.select(id_col, bin_col).mapInPandas(batches, IMAGE_META_SCHEMA)


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Test harness: materialize an opaque binary column from text so the
    multimodal plumbing runs against the driver's synthetic tables."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def extract_features(df: DataFrame, id_col: str = "doc_id", bin_col: str = "payload", dim: int = 16) -> DataFrame:
    """binary payload → fixed-dim feature vector via Arrow-batched mapInPandas.

    The STUB embedding is a normalized byte histogram (deterministic, so the
    ANN operators downstream are testable); swap the histogram for a real
    encoder (CLIP et al.) without touching the Spark plumbing.  Output shape
    matches the `embeddings` table, so srp_buckets_df / cosine_topk compose
    directly: decode → embed → bucket → join is one plan, no driver hop.
    """

    def batches(it):
        import numpy as np
        import pandas as pd

        for pdf in it:
            feats = []
            for b in pdf[bin_col]:
                arr = np.frombuffer(bytes(b) if b is not None else b"", dtype=np.uint8)
                if arr.size == 0:
                    feats.append([0.0] * dim)
                    continue
                hist = np.bincount(arr % dim, minlength=dim).astype("float64")
                feats.append((hist / hist.sum()).tolist())
            yield pd.DataFrame({"doc_id": pdf[id_col].astype("int64"), "feature": feats})

    return df.select(id_col, bin_col).mapInPandas(batches, FEATURE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_offset", T.LongType()),
        T.StructField("frame_bytes", T.BinaryType()),
    ]
)


def sample_frames(df: DataFrame, id_col: str = "doc_id", bin_col: str = "payload", n_frames: int = 4) -> DataFrame:
    """Video frame sampling plumbing: payload → n evenly-spaced 'frames'.

    One input row fans out to n output rows (the real op would seek the
    container's keyframe index; the STUB slices the byte stream evenly).
    Partitioning carries over from the scan — no shuffle; at 100 TB the fan
    -out multiplies bytes, so cap n_frames or follow with a projection that
    drops frame_bytes once features are extracted.
    """

    def batches(it):
        import pandas as pd

        for pdf in it:
            out = {"doc_id": [], "frame_idx": [], "frame_offset": [], "frame_bytes": []}
            for did, b in zip(pdf[id_col], pdf[bin_col]):
                raw = bytes(b) if b is not None else b""
                step = max(len(raw) // n_frames, 1)
                for i in range(n_frames):
                    off = min(i * step, max(len(raw) - 1, 0))
                    out["doc_id"].append(int(did))
                    out["frame_idx"].append(i)
                    out["frame_offset"].append(off)
                    out["frame_bytes"].append(raw[off : off + step])
            yield pd.DataFrame(out)

    return df.select(id_col, bin_col).mapInPandas(batches, FRAME_SCHEMA)


def resize_image(df: DataFrame, id_col: str = "doc_id", bin_col: str = "payload", width: int = 224, height: int = 224) -> DataFrame:
    """Image resize stage — decode libraries absent, so this raises at
    evaluation time; the signature/schema is the stable contract."""

    def batches(it):
        raise NotImplementedError(
            "image resize needs Pillow/libvips, not shipped in this image; "
            "plug the codec into this mapInPandas stage"
        )
        yield  # pragma: no cover

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("resized", T.BinaryType())]
    )
    return df.select(id_col, bin_col).mapInPandas(batches, schema)
