"""Sidecar-metadata parsers: TSV (positional + header-driven), key=value, JSON.

Re-expresses SURVEY §2.1 S3-S7:
  - immuno MS batch TSV, 8 positional columns (etl_msconvert.py:569-600)
  - OMERO imaging TSV, header-driven with required-column validation and the
    '*' null placeholder (register-omero.py:181-236)
  - attachment metadata.txt key=value lines (register-attachment-dropbox.py:62-79)
  - imgag upload-metadata JSON with the shipped JSON-Schema as StructType
    (upload-metadata.schema.json:1-60)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMMUNO_MS_COLUMNS = (
    "Filename", "Q_MS_DEVICE", "Q_MEASUREMENT_FINISH_DATE", "Q_EXTRACT_SHARE",
    "Q_ADDITIONAL_INFO", "Q_MS_LCMS_METHODS", "technical_replicate", "workflow_type",
)

IMAGING_REQUIRED_COLUMNS = (
    "IMAGE_DATA_PATH", "IMAGING_MODALITY", "IMAGED_TISSUE",
    "INSTRUMENT_MANUFACTURER", "INSTRUMENT_USER", "IMAGING_DATE",
)


def read_immuno_ms_tsv(spark: SparkSession, path: str) -> DataFrame:
    """Positional 8-column immuno MS metadata sheet."""
    schema = T.StructType([T.StructField(c, T.StringType()) for c in IMMUNO_MS_COLUMNS])
    return spark.read.options(sep="\t", header=True).schema(schema).csv(path)


def read_imaging_tsv(spark: SparkSession, path: str) -> DataFrame:
    """Header-driven imaging sheet; validates required columns, maps '*'→null
    (register-omero.py:204-236)."""
    df = spark.read.options(sep="\t", header=True).csv(path)
    missing = [c for c in IMAGING_REQUIRED_COLUMNS if c not in df.columns]
    if missing:
        raise ValueError(f"imaging metadata missing required columns: {missing}")
    for c in df.columns:
        df = df.withColumn(c, F.nullif(F.trim(F.col(c)), F.lit("*")))
    return df


def parse_kv_metadata(raw: F.Column) -> F.Column:
    """'k=v' newline-separated block → MAP<STRING,STRING> (S7).

    NB: str_to_map's delimiters must be Column literals — bare strings are
    resolved as column NAMES (found the hard way; the bare-"\\n" form
    analyzes only if a column of that name exists, then silently misparses).
    """
    return F.str_to_map(raw, F.lit("\n"), F.lit("="))


def read_kv_metadata(spark: SparkSession, path: str) -> DataFrame:
    """metadata.txt → one row with user/info/barcode/type + attachment kind
    ('Results' in type → RESULT else INFORMATION,
    register-attachment-dropbox.py:62-79)."""
    whole = spark.read.text(path, wholetext=True)
    m = parse_kv_metadata(F.col("value"))
    return whole.select(
        F.element_at(m, "user").alias("user"),
        F.element_at(m, "info").alias("info"),
        F.element_at(m, "barcode").alias("barcode"),
        F.element_at(m, "type").alias("type"),
    ).withColumn(
        "attachment_kind",
        F.when(F.col("type").contains("Results"), F.lit("RESULT")).otherwise(F.lit("INFORMATION")),
    )


#: StructType derived from the shipped JSON-Schema (upload-metadata.schema.json)
IMGAG_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("genome", T.StringType()),
        T.StructField("id_genetics", T.StringType()),
        T.StructField("id_qbic", T.StringType()),
        T.StructField("processing_system", T.StringType()),
        T.StructField("tumor", T.StringType()),
        T.StructField(
            "qc",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("qcml_id", T.StringType()),
                        T.StructField("name", T.StringType()),
                        T.StructField("value", T.StringType()),
                    ]
                )
            ),
        ),
    ]
)

IMGAG_METADATA_SCHEMA = T.StructType(
    [
        T.StructField("files", T.ArrayType(T.StringType())),
        T.StructField("type", T.StringType()),
        T.StructField("sample1", IMGAG_SAMPLE_SCHEMA),
        T.StructField("sample2", IMGAG_SAMPLE_SCHEMA),
    ]
)


def read_imgag_metadata(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(IMGAG_METADATA_SCHEMA).option("multiLine", True).json(path)
