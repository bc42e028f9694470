"""VCF parsing: body → DataFrame, snpEff ANN destructure, header greps.

Re-expresses the reference's hand-rolled readers
(drop-boxes/register-iontorrent-data/extractPGMdata.py:71-95 DummyVCFRecord,
:126-147 mangleSnpEffAnnotationString; header greps
register-iontorrent-data.py:164-184) as declarative reads:

  - body: csv reader with comment='#', fixed 8-column VCF schema
  - ALT: split(',') array (DummyVCFRecord splits ALT the same way)
  - ANN: the 'ANN=' INFO entry split(',') then per-annotation split('|')
    into a named 16-field struct
  - header: text read + startswith filter + regexp_extract
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

VCF_BODY_SCHEMA = T.StructType(
    [
        T.StructField("chrom", T.StringType()),
        T.StructField("pos", T.IntegerType()),
        T.StructField("id", T.StringType()),
        T.StructField("ref", T.StringType()),
        T.StructField("alt_raw", T.StringType()),
        T.StructField("qual", T.DoubleType()),
        T.StructField("filter", T.StringType()),
        T.StructField("info", T.StringType()),
    ]
)

#: snpEff ANN subfields, in pipe order (extractPGMdata.py:126-147)
ANN_FIELDS = (
    "allele", "effect", "putative_impact", "gene_name", "gene_id",
    "feature_type", "feature_id", "transcript_biotype", "rank_vs_total",
    "hgvs_c", "hgvs_p", "cdna_pos", "cds_pos", "protein_pos",
    "distance_to_feature", "errors",
)


def read_vcf(spark: SparkSession, path: str) -> DataFrame:
    """VCF body rows with typed columns and alt as array."""
    df = (
        spark.read.schema(VCF_BODY_SCHEMA)
        .options(sep="\t", comment="#", header=False)
        .csv(path)
    )
    return df.withColumn("alt", F.split(F.col("alt_raw"), ",")).drop("alt_raw")


def ann_struct(ann_string: F.Column) -> F.Column:
    """One 'A|missense_variant|...' annotation → named struct."""
    parts = F.split(ann_string, r"\|", -1)
    return F.struct(
        *[F.trim(F.element_at(parts, i + 1)).alias(name) for i, name in enumerate(ANN_FIELDS)]
    )


def with_annotations(vcf: DataFrame) -> DataFrame:
    """Add `ann ARRAY<STRUCT<...>>` parsed from the INFO field's ANN= entry."""
    entries = F.split(F.col("info"), ";")
    ann_entry = F.filter(entries, lambda e: e.startswith("ANN="))
    ann_csv = F.when(F.size(ann_entry) > 0, F.substring_index(F.element_at(ann_entry, 1), "ANN=", -1))
    anns = F.when(
        ann_csv.isNotNull(), F.transform(F.split(ann_csv, ","), ann_struct)
    ).otherwise(F.array().cast("array<struct<" + ",".join(f"{f}:string" for f in ANN_FIELDS) + ">>"))
    return vcf.withColumn("ann", anns)


def explode_annotations(vcf_with_ann: DataFrame) -> DataFrame:
    """One row per (variant, annotation) — the A4/J2 exploded view."""
    return vcf_with_ann.select(
        "chrom", "pos", "ref", "alt", F.explode("ann").alias("a")
    ).select("chrom", "pos", "ref", "alt", "a.*")


def variants_per_gene(vcf_with_ann: DataFrame) -> DataFrame:
    """Per-gene variant counts (extractVCFGenes, extractPGMdata.py:97-122)."""
    return (
        explode_annotations(vcf_with_ann)
        .filter(F.col("gene_name") != "")
        .groupBy("gene_name")
        .agg(F.count("*").alias("n_variants"))
    )


def grep_header(spark: SparkSession, path: str, prefix: str) -> DataFrame:
    """First '##<prefix>=' header value (register-iontorrent-data.py:164-184)."""
    lines = spark.read.text(path)
    return (
        lines.filter(F.col("value").startswith(f"##{prefix}="))
        .select(F.regexp_extract("value", f"^##{prefix}=(.*)$", 1).alias(prefix))
        .limit(1)
    )
