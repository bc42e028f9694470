"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

At 100 TB the payload never round-trips through the driver: binary columns
ride in parquet/object storage, and decode / feature-extract / resize /
frame-sample run as Arrow-batched `mapInPandas` stages over whatever
partitioning the upstream scan produced.  The decode itself needs codec
libraries this container doesn't ship, so `decode_image_meta` is a
clearly-marked deterministic FAKE (derives metadata from the raw bytes) —
the Spark-side plumbing (schema, batch iteration, partitioning) is real and
tested, and the fake body is the single function to swap for Pillow/ffmpeg.
"""

from __future__ import annotations

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


def _fake_decode(payload: bytes) -> tuple[str, int, int]:
    """STUB — stands in for a real image decoder (Pillow/libvips not in the
    image).  Deterministic from bytes so tests are stable; raise
    NotImplementedError here if a hard failure is preferred over fake data."""
    if not payload:
        return ("empty", 0, 0)
    fmt = ["png", "jpeg", "webp"][payload[0] % 3]
    width = 64 + payload[0] % 192
    height = 64 + (payload[-1] if len(payload) > 1 else 0) % 192
    return (fmt, width, height)


def decode_image_meta(df: DataFrame, id_col: str = "doc_id", bin_col: str = "payload") -> DataFrame:
    """binary column → typed metadata via Arrow-batched mapInPandas."""

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            metas = [_fake_decode(bytes(b) if b is not None else b"") for b in pdf[bin_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": [len(b) if b is not None else 0 for b in pdf[bin_col]],
                    "format": [m[0] for m in metas],
                    "width": [m[1] for m in metas],
                    "height": [m[2] for m in metas],
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
