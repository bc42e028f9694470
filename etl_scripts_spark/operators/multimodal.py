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
