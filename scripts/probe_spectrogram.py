"""10x scale probe for multimodal.audio_spectrogram.

Usage: PYTHONPATH=/root/repo python scripts/probe_spectrogram.py <n_docs>

Square-tone WAV payloads (1-4 frames, ~0.5-2 KB each) synthesized in the
same Arrow stage, then the spectral pass.  Map-only operator: wall should
track bytes scanned.  Run each scale in a FRESH process.
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from etl_scripts_spark.operators.multimodal import (
    audio_spectrogram,
    with_square_wav_payload,
)

n = int(sys.argv[1])
spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "16g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

docs = spark.range(n).select(F.col("id").alias("doc_id"))

t0 = time.time()
out = audio_spectrogram(with_square_wav_payload(docs))
rows = out.count()
dom = out.agg(F.countDistinct("dominant_bin").alias("d")).collect()[0]["d"]
wall = time.time() - t0
print(f"n_docs={n} frame_rows={rows} distinct_dominant_bins={dom} wall={wall:.1f}s")
