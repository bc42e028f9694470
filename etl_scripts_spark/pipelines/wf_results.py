"""Workflow-result registration — one parameterized pipeline for 16 dropboxes.

The register-wf-* dropboxes are byte-level clones of one template differing
only in dataset type codes (SURVEY §2.9; register-wf-mapping/
register-mapping-dropbox.py:40-83): parse 'SPACE-PROJECT-EXPERIMENT-SAMPLE'
from the result name (dash-in-space safe, counted from the right —
register-wf-hlatyping/register-hlatyping.py:45-52), update the experiment's
workflow status/finish time, and attach a RESULTS + a LOGS dataset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..expressions import split_wf_name

#: the 16 cloned families: family key → (results type, logs type)
WF_FAMILIES = {
    fam: (f"Q_WF_{fam}_RESULTS", f"Q_WF_{fam}_LOGS")
    for fam in (
        "NGS_MAPPING", "MS_QC", "MS_MAXQUANT", "MS_PEPTIDEID",
        "NGS_RNA_EXPRESSION_ANALYSIS", "NGS_16S_TAXONOMIC_PROFILING",
        "NGS_SHRNA_COUNTING", "MS_INDIVIDUALIZED_PROTEOME",
        "NGS_VARIANT_CALLING", "NGS_VARIANT_ANNOTATION", "NGS_QUALITYCONTROL",
        "MA_QUALITYCONTROL", "NGS_EPITOPE_PREDICTION", "NGS_EDDA",
        "MS_LIGANDOMICS_ID", "MS_LIGANDOMICS_QC",
    )
}


def register_wf_results(incoming: DataFrame, family: str, finished_at: str) -> dict[str, DataFrame]:
    """incoming: (arrival_id, result_name) → experiment updates + dataset rows."""
    results_type, logs_type = WF_FAMILIES[family]
    parts = split_wf_name(F.col("result_name"))
    parsed = incoming.select(
        "arrival_id",
        parts["space"].alias("space"),
        parts["project"].alias("project"),
        parts["experiment"].alias("experiment_code"),
        parts["sample"].alias("sample_code"),
    ).withColumn(
        "experiment_id",
        F.concat(
            F.lit("/"), F.col("space"), F.lit("/"), F.col("project"), F.lit("/"),
            F.col("experiment_code"),
        ),
    )
    experiment_updates = parsed.select(
        "experiment_id",
        F.lit("FINISHED").alias("q_wf_status"),
        F.lit(finished_at).alias("q_wf_finished_at"),
    ).distinct()
    datasets = parsed.select(
        "arrival_id", "experiment_id", "sample_code",
        F.lit(results_type).alias("results_type"),
        F.lit(logs_type).alias("logs_type"),
    )
    return {"parsed": parsed, "experiment_updates": experiment_updates, "datasets": datasets}


# --- the two non-clone wf dropboxes -----------------------------------------

#: sample code embedded in an mzML result filename
#: (register-wf-peakpicking/script.py:27)
MZML_CODE_PATTERN = r"Q\w{4}[0-9]{3}[a-zA-Z]\w"


def parse_hla_typing(df: DataFrame, line_col: str = "result_line") -> DataFrame:
    """wf-hlatyping's result.tsv typing parse, relationally.

    The reference reads the second line of result.tsv, splits on tab, drops
    the first field and the last two, and joins the alleles with newlines
    into the Q_HLA_TYPING property (register-wf-hlatyping/
    register-hlatyping.py:87-91).  Pure column expressions — works on a
    column of result lines regardless of how many arrive per batch.
    """
    fields = F.split(F.col(line_col), "\t")
    alleles = F.slice(fields, 2, F.greatest(F.size(fields) - F.lit(3), F.lit(0)))
    return df.withColumn("hla_typing", F.array_join(alleles, "\n")).withColumn(
        "n_alleles", F.size(alleles)
    )


def peakpick_fanout(mzml_files: DataFrame, samples: DataFrame) -> DataFrame:
    """wf-peakpicking's per-mzML registration fan-out.

    The reference loops over result/*.mzML: renames each to
    centroided_<name>, extracts the 9-char sample code from the filename,
    looks the sample up by code, and attaches one Q_MS_MZML_DATA dataset
    per file (register-wf-peakpicking/script.py:80-95).  Here the per-file
    loop is a projection + one broadcast join against the (dimension-sized)
    samples table — no driver-side iteration, linear in file count.

    mzml_files: (orderkey, linenumber, mzml_name); samples: catalog
    samples_view.  Output: one dataset row per mzML.
    """
    extracted = mzml_files.select(
        "orderkey",
        "linenumber",
        F.concat(F.lit("centroided_"), F.col("mzml_name")).alias("centroided_name"),
        F.regexp_extract("mzml_name", MZML_CODE_PATTERN, 0).alias("code"),
    )
    return (
        extracted.join(
            F.broadcast(samples.select("code", "space")), "code"
        )
        .select(
            "orderkey",
            "linenumber",
            "centroided_name",
            F.concat(F.lit("MS"), F.col("code")).alias("ms_code"),
            "space",
            F.lit("Q_MS_MZML_DATA").alias("dataset_type"),
        )
    )
