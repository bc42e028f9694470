"""File-product sinks (W2/W9): staged write + atomic publish.

The reference attaches files to datasets with an atomic `transaction.moveFile`
(register-fastq-dropbox.py:119-130) and writes derived file products (variant
TSVs, consolidated folders, checksum files — register-iontorrent-data.py:
504-518, register-nanopore.py:256-317).  The Spark-first equivalent: write to
a staging directory, then publish with a single atomic rename — readers never
observe a half-written table, and a failed job leaves only staging debris
(the quarantine/rollback semantics of SURVEY §2.8).

At 100 TB this is the non-lakehouse commit protocol; with Delta on the
classpath, `sinks.merge` replaces it with a real table transaction.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame


def staged_write(df: DataFrame, dest: str, fmt: str = "parquet", **options) -> str:
    """Write `df` to `<dest>.staging-<uuid>`, then atomically rename to
    `dest`.  Returns the published path.  Raises if `dest` already exists —
    publishing is create-once; re-registration goes through MERGE instead.
    """
    if os.path.exists(dest):
        raise FileExistsError(f"refusing to overwrite published path {dest}")
    staging = f"{dest}.staging-{uuid.uuid4().hex}"
    try:
        df.write.format(fmt).options(**options).save(staging)
        os.rename(staging, dest)
    except Exception:
        shutil.rmtree(staging, ignore_errors=True)
        raise
    return dest


def export_tsv(df: DataFrame, dest: str) -> str:
    """W9: TSV file product (variants export, register-iontorrent-data.py:
    504-518) via the same staged-publish protocol."""
    return staged_write(df, dest, fmt="csv", sep="\t", header=True)
