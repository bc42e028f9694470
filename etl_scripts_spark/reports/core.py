"""The reference's reporting plugins as DataFrame functions (SURVEY §2 W4, §3.2).

Each function is the Spark re-expression of one aggregation-service script:
a declarative plan over the entity catalog, collected only at the API edge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.lineage import ancestors_to_root


def query_files(files: DataFrame, dataset_codes: DataFrame | None = None) -> DataFrame:
    """File listing per dataset with derived folder, 'original' rows excluded.

    Re-expresses reporting-plugins/query-files/script.py:2-34 (SQL over the
    path-info DB + folder = second-to-last path segment + original-filter).
    """
    out = files
    if dataset_codes is not None:
        out = out.join(F.broadcast(dataset_codes), "dataset_code", "left_semi")
    out = out.withColumn("folder", F.element_at(F.split(F.col("relative_path"), "/"), -2))
    return out.filter(F.col("folder") != "original").select(
        "dataset_code", "file_name", "folder", "size_in_bytes"
    )


def projects_with_data(experiments: DataFrame, files: DataFrame) -> DataFrame:
    """Datasets-per-project count (get-projects-with-data/script.py:24-31)."""
    return (
        files.join(experiments, "orderkey")
        .groupBy("project")
        .agg(F.countDistinct("dataset_code").alias("n_datasets"))
    )


def max_experiment_number(experiments: DataFrame) -> DataFrame:
    """Max E<n> suffix per project (register-mtb-data-dropbox.py:255-259)."""
    return experiments.groupBy("project").agg(
        F.max(F.regexp_extract(F.col("experiment_id"), r"E(\d+)$", 1).cast("int")).alias("max_exp_n")
    )


def experimental_design(
    samples: DataFrame, edges: DataFrame, vocabularies: DataFrame
) -> DataFrame:
    """Per-sample design row: root ancestor + organism vocabulary label.

    Re-expresses get-experimental-design-tsv/script.py:16-54 — the unbounded
    parent walk becomes the lineage fixpoint operator; the per-sample
    vocabulary lookups (a SearchService call *per row* in the reference)
    become one broadcast join.
    """
    roots = ancestors_to_root(edges)
    coded = samples.withColumn("node_code", F.concat(F.lit("C"), F.col("custkey").cast("string")))
    organisms = vocabularies.filter(F.col("vocabulary") == "Q_NCBI_TAXONOMY").select(
        F.col("code").alias("organism_code"), F.col("label").alias("organism_label")
    )
    return (
        coded.join(roots, coded["node_code"] == roots["child_code"], "left")
        .withColumn("organism_code", F.concat(F.lit("N"), F.col("nationkey").cast("string")))
        .join(F.broadcast(organisms), "organism_code", "left")
        .select(
            F.col("code").alias("sample_code"),
            F.col("project"),
            F.col("root_code"),
            F.col("depth").alias("lineage_depth"),
            F.col("organism_label"),
        )
    )
