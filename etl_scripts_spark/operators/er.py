"""Entity resolution / record linkage — blocking, pairwise matching,
transitive clustering.

The classic pipeline (Fellegi-Sunter shaped, deterministic scoring):

  1. BLOCKING: emit several cheap keys per record (prefix+length bucket,
     sorted-token initials) — candidate generation is a self-join per
     key, never all-pairs.  Hot blocks are frequency-capped, exactly like
     span_dup_clusters' gram cap: a block shared by thousands of records
     (empty names, "unknown") is noise, not match evidence.
  2. MATCHING: candidates join back their strings ONCE and score with the
     JVM-side levenshtein() — similarity = 1 - lev/maxlen, threshold
     configurable.  No Python anywhere.
  3. CLUSTERING: matched pairs → connected components → min-id canonical
     per entity (transitive closure: A~B, B~C ⇒ one entity even if A,C
     never candidate-paired).

Scale shape (100 TB): blocking keys are map-side projections; the
per-key self-join fans out at most cap² pairs per block; matching is an
equi-join on uniform record ids; clustering is the same CC fixpoint the
dedup family uses.  The corpus is never shuffled more than once per
stage, and never compared all-pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import connected_components
from .text import normalize_text


def blocking_keys(
    df: DataFrame,
    name_col: str,
    id_col: str = "rec_id",
    prefix_len: int = 3,
    initials_len: int = 1,
) -> DataFrame:
    """(id, block_key) under two complementary strategies:

    - ``p:`` normalized `prefix_len`-char prefix + length bucket (catches
      suffix typos: "mueller gmbh" / "mueller gmbh."),
    - ``i:`` sorted `initials_len`-char token prefixes (catches token
      reorderings: "anna maria" / "maria anna").

    Records missing a usable name emit no key — they can never match.

    The two widths are the recall-vs-fan-out dials at scale: when a
    corpus grows past the point where a strategy's blocks saturate the
    hot-block cap (candidate_pairs `max_block`), widening THAT
    strategy's key restores its recall WITHOUT raising the cap (which
    would restore the k² blowup) — the blocking analog of span
    clustering's `max_freq`.  Measured in the round-7 10× probe
    (SCALE.md): at 10× records the 1-char initials blocks all saturate
    and reorder matches vanish; initials_len=2 brings them back with
    candidates still sub-linear.
    """
    norm = normalize_text(F.col(name_col))
    toks = F.split(norm, " ")
    prefix_key = F.concat(
        F.lit("p:"),
        F.substring(norm, 1, prefix_len),
        F.lit("#"),
        F.floor(F.length(norm) / 4).cast("string"),
    )
    initials_key = F.concat(
        F.lit("i:"),
        F.array_join(
            F.array_sort(
                F.transform(toks, lambda t: F.substring(t, 1, initials_len))
            ),
            "",
        ),
    )
    keyed = df.select(
        F.col(id_col),
        F.explode(F.array(prefix_key, initials_key)).alias("block_key"),
    )
    return keyed.filter(
        (F.length("block_key") > 2) & ~F.col("block_key").isin("p:#0", "i:")
    ).distinct()


def candidate_pairs(
    keys: DataFrame, id_col: str = "rec_id", max_block: int = 50
) -> DataFrame:
    """Distinct (id_a < id_b) pairs sharing a block key, with blocks
    larger than `max_block` records EXCLUDED before the self-join — the
    quadratic-blowup guard."""
    capped = keys.join(
        keys.groupBy("block_key")
        .agg(F.count("*").alias("_n"))
        .filter(F.col("_n") <= max_block)
        .select("block_key"),
        "block_key",
        "leftsemi",
    )
    a = capped.select("block_key", F.col(id_col).alias("id_a"))
    b = capped.select("block_key", F.col(id_col).alias("id_b"))
    return (
        a.join(b, "block_key")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def match_pairs(
    cands: DataFrame,
    df: DataFrame,
    name_col: str,
    id_col: str = "rec_id",
    threshold: float = 0.82,
) -> DataFrame:
    """Score candidates with normalized Levenshtein similarity
    (1 - lev/maxlen, JVM built-in) and keep pairs ≥ threshold:
    (id_a, id_b, sim).

    Two arms, max wins (fuzzywuzzy's token_sort_ratio shape): the raw
    normalized form catches typos; the SORTED-token form catches
    reorderings ("anna maria" / "maria anna"), which raw edit distance
    scores near zero.  Both are projections staged once per record, so
    each pair costs two levenshtein calls, no retokenization.
    """

    def _lev_sim(a, b):
        return F.lit(1.0) - F.levenshtein(a, b) / F.greatest(
            F.length(a), F.length(b), F.lit(1)
        )

    norm = normalize_text(F.col(name_col))
    names = df.select(
        F.col(id_col),
        norm.alias("_nm"),
        F.array_join(F.array_sort(F.split(norm, " ")), " ").alias("_ts"),
    )
    na = names.select(
        F.col(id_col).alias("id_a"), F.col("_nm").alias("_na"), F.col("_ts").alias("_ta")
    )
    nb = names.select(
        F.col(id_col).alias("id_b"), F.col("_nm").alias("_nb"), F.col("_ts").alias("_tb")
    )
    scored = (
        cands.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.greatest(_lev_sim("_na", "_nb"), _lev_sim("_ta", "_tb")), 4
            ).alias("sim"),
        )
    )
    return scored.filter(F.col("sim") >= threshold)


def resolve_entities(
    df: DataFrame,
    name_col: str,
    id_col: str = "rec_id",
    threshold: float = 0.82,
    max_block: int = 50,
    prefix_len: int = 3,
    initials_len: int = 1,
) -> DataFrame:
    """Full pipeline: (rec_id, entity_id, is_canonical) for every record
    in a matched pair; unmatched records are implicitly their own
    entity (left out, like near_dup_clusters)."""
    keys = blocking_keys(df, name_col, id_col, prefix_len, initials_len)
    cands = candidate_pairs(keys, id_col, max_block)
    matched = match_pairs(cands, df, name_col, id_col, threshold)
    cc = connected_components(matched.select("id_a", "id_b"))
    return cc.select(
        F.col("id").alias("rec_id"),
        F.col("component").alias("entity_id"),
        (F.col("component") == F.col("id")).alias("is_canonical"),
    )
