"""Dataset-assembly operators: deterministic splits and sequence packing.

The last mile of a training-data pipeline, after curation (dedup/quality/
language): assign every surviving document to a split, then pack documents
into fixed-token-budget chunks.  Both are pure Catalyst expressions.

Scale notes:
  - the split is a salted-hash projection — no shuffle, no state, stable
    under re-runs and across backfills (a doc's split never changes unless
    the salt does; different salts give independent splits);
  - packing is a windowed cumulative sum PER SHARD: a global greedy pack
    would serialize 100 TB behind one cumsum, so documents are sharded by
    hash first and packed within shards — each shard's packing is
    independent, deterministic, and parallel (the industry-standard
    concat-then-chunk formulation, where a document may straddle a chunk
    boundary).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def split_hash(id_col: Column, salt: str = "split-v1") -> Column:
    """Uniform [0,100) bucket from a salted md5 of the id — engine-portable
    (DuckDB: ('0x' || substring(md5(...),1,6))::BIGINT % 100)."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt + "|"), id_col.cast("string"))), 1, 6),
        16,
        10,
    ).cast("bigint")
    return h % 100


def split_assign(id_col: Column, train_pct: int = 90, salt: str = "split-v1") -> Column:
    return F.when(split_hash(id_col, salt) < train_pct, F.lit("train")).otherwise(
        F.lit("val")
    )


def pack_chunks(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int = 2048,
    n_shards: int = 16,
) -> DataFrame:
    """Assign each doc a (shard, chunk_id): concat-then-chunk packing within
    hash shards.  chunk_id = exclusive-prefix-sum(tokens) // budget, so a
    chunk holds consecutive docs until the budget spills over."""
    shard = (F.col(id_col) % n_shards).alias("shard")
    w = Window.partitionBy("shard").orderBy(id_col)
    staged = df.select(F.col(id_col), shard, F.col(token_col))
    cum = F.sum(token_col).over(w)
    return staged.withColumn(
        "chunk_id", ((cum - F.col(token_col)) / F.lit(budget)).cast("bigint")
    )
