"""Table catalog: schemas, loaders, and the star-schema → entity-model mapping.

The reference's "database" is an entity graph (Space → Project → Experiment →
Sample → DataSet + a sample parent/child DAG + a path-info files table) — see
SURVEY.md §1.1 and FIXTURES.md §1.  The driver-provided test corpus is a
TPC-H-ish star schema (TESTDATA.md), so this module provides *deterministic
derivation views* that re-express the star schema as the entity model
(FIXTURES.md §6 binding).  Every derivation here has a byte-identical DuckDB
twin in :mod:`etl_scripts_spark.oracle` — keep the two in sync.

Derivation contract (the only place it is defined for Spark):
  - project_code(custkey)  = 'Q' + 3 base-26 letters of custkey + 'X'
  - sample barcode         = project_code + zero-padded (custkey % 999 + 1)
                             + class letter 'A' + mod-34 checksum char
                             (reference algorithm: register-iontorrent-data.py:79-94)
  - experiment id          = '/SPACE_<k>/<project>/<project>E<orderkey>'
  - files                  = one row per lineitem, path-info DB shape
                             (reporting-plugins/query-files/script.py:2-6)
  - sample_parents         = customer→nation→region coded edges (the DAG)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .expressions import barcode_checksum_char

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver-generated parquet table."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS) which Spark cannot read
        # natively; read nanos as long, then truncate to micros exactly
        # (integer division — no double round-trip), matching DuckDB's
        # ns→µs truncation of the same file.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return normalize_events(spark.read.parquet(f"{sf_dir}/{name}.parquet"))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_parallel(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load + widen partitioning for CPU-heavy downstream projections.

    The driver's test parquet files are single-row-group, so the scan yields
    ONE input split and per-row-expensive operators (minhash, simhash,
    checksum generation) would run single-threaded.  A production table has
    many row groups / files and never needs this; locally one small shuffle
    buys full-core parallelism.  No-op when the scan is already split.
    """
    df = load(spark, sf_dir, name)
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        df = df.repartition(target)
    return df


def normalize_events(events: DataFrame) -> DataFrame:
    """Normalize events.ts to TIMESTAMP (µs precision, UTC session TZ).

    Handles every encoding the driver testdata has shipped:
      - BIGINT nanos-since-epoch (legacy ``nanosAsLong`` read) → truncate to µs
      - TIMESTAMP_NTZ (parquet timestamp[us], no TZ; Spark 4 inference) →
        reinterpret as UTC instant — exact, because the session TZ is pinned
        UTC (:mod:`..session`), matching DuckDB's read of the same file
      - TIMESTAMP → passthrough
    """
    dtype = dict(events.dtypes).get("ts")
    if dtype == "bigint":
        events = events.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    elif dtype == "timestamp_ntz":
        events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return events


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load(spark, sf_dir, t) for t in TABLES}


# --- star-schema → entity-model derivations -------------------------------

def project_code(custkey: Column) -> Column:
    """5-char project code 'Q' + base-26(custkey) letters + 'X'.

    Mirrors the reference's project prefix Q[A-Z0-9]{4}
    (register-fastq-dropbox.py:21); deterministic from the key so the DuckDB
    oracle can reproduce it.
    """
    l1 = F.char(custkey % 26 + 65)
    l2 = F.char((custkey / 26).cast("long") % 26 + 65)
    l3 = F.char((custkey / 676).cast("long") % 26 + 65)
    return F.concat(F.lit("Q"), l1, l2, l3, F.lit("X"))


def sample_code9(custkey: Column, class_char: str = "A") -> Column:
    """9-char barcode prefix: project(5) + 3-digit number + class letter."""
    num = F.lpad((custkey % 999 + 1).cast("string"), 3, "0")
    return F.concat(project_code(custkey), num, F.lit(class_char))


def sample_barcode(custkey: Column, class_char: str = "A") -> Column:
    """Full 10-char QBiC barcode incl. mod-34 checksum char."""
    code9 = sample_code9(custkey, class_char)
    return F.concat(code9, barcode_checksum_char(code9))


def samples_view(customer: DataFrame) -> DataFrame:
    """`samples` entity table (FIXTURES.md §1) derived from `customer`."""
    return customer.select(
        sample_barcode(F.col("c_custkey")).alias("code"),
        F.concat(F.lit("SPACE_"), (F.col("c_custkey") % 5).cast("string")).alias("space"),
        project_code(F.col("c_custkey")).alias("project"),
        F.lit("Q_TEST_SAMPLE").alias("type"),
        F.col("c_custkey").alias("custkey"),
        F.col("c_name").alias("secondary_name"),
        F.col("c_mktsegment").alias("tissue"),
        F.col("c_nationkey").alias("nationkey"),
    )


def experiments_view(orders: DataFrame) -> DataFrame:
    """`experiments` entity table derived from `orders`.

    experiment_id mirrors the reference's path-identifier scheme
    ('/' + space + '/' + project + '/' + project + 'E' + n,
    register-fastq-dropbox.py:109-110).
    """
    proj = project_code(F.col("o_custkey"))
    space = F.concat(F.lit("SPACE_"), (F.col("o_custkey") % 5).cast("string"))
    return orders.select(
        F.concat(
            F.lit("/"), space, F.lit("/"), proj, F.lit("/"), proj,
            F.lit("E"), F.col("o_orderkey").cast("string"),
        ).alias("experiment_id"),
        space.alias("space"),
        proj.alias("project"),
        F.when(F.col("o_orderstatus") == "O", F.lit("Q_NGS_MEASUREMENT"))
        .otherwise(F.lit("Q_MS_MEASUREMENT"))
        .alias("type"),
        F.col("o_orderkey").alias("orderkey"),
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderdate").alias("orderdate"),
        F.col("o_orderstatus").alias("status"),
    )


def files_view(lineitem: DataFrame) -> DataFrame:
    """`files` path-info table derived from `lineitem`.

    Shape of the reference's path-info DB (data_sets ⋈ data_set_files,
    query-files/script.py:2-6).  Every third file sits in an 'original'
    folder, matching the folder-exclusion the query-files plugin applies.
    """
    folder = F.when(F.col("l_linenumber") % 3 == 0, F.lit("original")).otherwise(F.lit("data"))
    fname = F.concat(F.lit("f_"), F.col("l_linenumber").cast("string"), F.lit(".fastq.gz"))
    return lineitem.select(
        F.concat(F.lit("DS-"), F.col("l_orderkey").cast("string")).alias("dataset_code"),
        F.concat(
            F.lit("store/"), F.col("l_orderkey").cast("string"), F.lit("/"), folder, F.lit("/"), fname
        ).alias("relative_path"),
        fname.alias("file_name"),
        F.round(F.col("l_extendedprice")).cast("bigint").alias("size_in_bytes"),
        F.col("l_orderkey").alias("orderkey"),
        F.col("l_linenumber").alias("linenumber"),
    )


def sample_parent_edges(customer: DataFrame, nation: DataFrame) -> DataFrame:
    """`sample_parents` DAG edges: customer→nation→region, coded.

    Stand-in for the ENTITY → BIO_SAMPLE → TEST_SAMPLE tier DAG
    (register-mtb-data-dropbox.py:699-724); two tiers of edges let the
    lineage fixpoint operator run to a real fixpoint.
    """
    c_edges = customer.select(
        F.concat(F.lit("C"), F.col("c_custkey").cast("string")).alias("child_code"),
        F.concat(F.lit("N"), F.col("c_nationkey").cast("string")).alias("parent_code"),
    )
    n_edges = nation.select(
        F.concat(F.lit("N"), F.col("n_nationkey").cast("string")).alias("child_code"),
        F.concat(F.lit("R"), F.col("n_regionkey").cast("string")).alias("parent_code"),
    )
    return c_edges.unionByName(n_edges)


def vocabularies_view(nation: DataFrame) -> DataFrame:
    """Vocabulary dimension (Q_NCBI_TAXONOMY-style term→label lookup,
    get-experimental-design-tsv/script.py:42-48,70)."""
    return nation.select(
        F.lit("Q_NCBI_TAXONOMY").alias("vocabulary"),
        F.concat(F.lit("N"), F.col("n_nationkey").cast("string")).alias("code"),
        F.col("n_name").alias("label"),
    )
