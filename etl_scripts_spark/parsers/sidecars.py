"""Checksum files, mzML headers, and run-folder structure parsing (S10-S13).

  - checksum files: '<sha256> *<relative_path>' lines
    (register-nanopore.py:200-207)
  - mzML header metadata: run startTimeStamp + instrument cvParam accession
    (etl_msconvert.py:237-280) — line-scan as filters + regexp, no XML lib
  - nanopore-style run folders: path-pattern classification into
    (measurement, barcode, kind, passfail) — the NanoporeParser library's
    behavior re-expressed relationally (register-nanopore.py:143-166)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_checksum_file(spark: SparkSession, path: str) -> DataFrame:
    """(sha256, relative_path) rows from a '<sha> *<path>' checksum file."""
    lines = spark.read.text(path)
    return lines.select(
        F.regexp_extract("value", r"^([0-9a-f]{64}) \*?(.*)$", 1).alias("sha256"),
        F.regexp_extract("value", r"^([0-9a-f]{64}) \*?(.*)$", 2).alias("relative_path"),
    ).filter(F.col("sha256") != "")


def checksums_for_folder(checksums: DataFrame, folder_prefix: str) -> DataFrame:
    """Per-folder checksum subset (A11, register-nanopore.py:210-222)."""
    return checksums.filter(F.col("relative_path").startswith(folder_prefix))


def parse_mzml_headers(spark: SparkSession, path: str) -> DataFrame:
    """One row: (start_timestamp, instrument_accession) from an mzML file.

    startTimeStamp: first '<run ... startTimeStamp="...">' attribute
    (parse_timestamp_easy, etl_msconvert.py:237-247).  Instrument accession:
    first cvParam accession in the <referenceableParamGroup> block that is
    not one of the generic attribute CVs (parse_instrument_accession,
    etl_msconvert.py:249-265).
    """
    lines = spark.read.text(path).withColumn("line_no", F.monotonically_increasing_id())
    ts = (
        lines.filter(F.col("value").contains("startTimeStamp="))
        .select(F.regexp_extract("value", r'startTimeStamp="([^"]+)"', 1).alias("start_timestamp"))
        .limit(1)
    )
    generic = ["MS:1000529", "MS:1000031"]  # serial number / generic instrument model
    acc = (
        lines.filter(F.col("value").contains("cvParam"))
        .select(
            F.regexp_extract("value", r'accession="(MS:[0-9]+)"', 1).alias("instrument_accession"),
            "line_no",
        )
        .filter((F.col("instrument_accession") != "") & ~F.col("instrument_accession").isin(generic))
        .orderBy("line_no")
        .limit(1)
        .drop("line_no")
    )
    return ts.crossJoin(acc)


#: nanopore-ish folder classes: fast5/fastq/pod5/bam × pass/fail/skip
RUN_FOLDER_PATTERN = r"(fast5|fastq|pod5|bam)_(pass|fail|skip)/([A-Za-z0-9_]+)/"


def classify_run_folder(listing: DataFrame, path_col: str = "path") -> DataFrame:
    """File listing → (kind, passfail, barcode) classification; rows that
    match no class keep nulls (log files etc. — filtered by blacklist P6)."""
    p = F.col(path_col)
    return listing.select(
        p.alias("path"),
        F.nullif(F.regexp_extract(p, RUN_FOLDER_PATTERN, 1), F.lit("")).alias("kind"),
        F.nullif(F.regexp_extract(p, RUN_FOLDER_PATTERN, 2), F.lit("")).alias("passfail"),
        F.nullif(F.regexp_extract(p, RUN_FOLDER_PATTERN, 3), F.lit("")).alias("barcode"),
    )


def raw_data_per_sample(classified: DataFrame) -> DataFrame:
    """Per-(barcode, kind) folder grouping (rawDataPerSample,
    register-nanopore.py:153-166): counts per pass/fail/skip."""
    return (
        classified.filter(F.col("kind").isNotNull())
        .groupBy("barcode", "kind")
        .agg(
            F.sum(F.when(F.col("passfail") == "pass", 1).otherwise(0)).alias("n_pass"),
            F.sum(F.when(F.col("passfail") == "fail", 1).otherwise(0)).alias("n_fail"),
            F.sum(F.when(F.col("passfail") == "skip", 1).otherwise(0)).alias("n_skip"),
        )
    )


PDF_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("order_number", T.StringType()),
        T.StructField("rin_map", T.MapType(T.StringType(), T.StringType())),
    ]
)


def pdf_metadata(df, id_col: str = "doc_id", bin_col: str = "payload"):
    """S11: PDF metadata scrape (microarray order number + per-barcode RIN,
    register-cel-dropbox.py:49-81) as an Arrow-batched mapInPandas stage.

    pdftotext is not in this image, so the text-extraction step is a marked
    STUB (deterministic from the payload bytes); the state-machine regex
    scan over the extracted text and the Spark plumbing are real.  Swap
    `_fake_pdf_text` for a pdftotext/poppler call to go live.
    """
    import re

    def _fake_pdf_text(raw: bytes) -> str:
        # STUB — stands in for `pdftotext file.pdf -`; derives a plausible
        # order sheet deterministically so tests are stable.
        seed = (raw[0] if raw else 0) + len(raw)
        barcode = f"Q{'ABCD'[seed % 4]}{'WXYZ'[seed % 4]}0X{seed % 999:03d}A0"
        return f"Auftrag: A-{seed % 10000:04d}\n{barcode} RIN: {seed % 10}.{seed % 7}\n"

    order_re = re.compile(r"Auftrag:\s*(\S+)")
    rin_re = re.compile(r"(Q[A-Z0-9]{4}[0-9]{3}[A-Z][A-Z0-9])\s+RIN:\s*([0-9.]+)")

    def batches(it):
        import pandas as pd

        for pdf in it:
            ids, orders, rins = [], [], []
            for did, b in zip(pdf[id_col], pdf[bin_col]):
                text = _fake_pdf_text(bytes(b) if b is not None else b"")
                m = order_re.search(text)
                ids.append(int(did))
                orders.append(m.group(1) if m else None)
                rins.append({bc: rin for bc, rin in rin_re.findall(text)})
            yield pd.DataFrame({"doc_id": ids, "order_number": orders, "rin_map": rins})

    return df.select(id_col, bin_col).mapInPandas(batches, PDF_META_SCHEMA)
