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


def _salted_hex_bits(id_col: Column, salt: str, nhex: int) -> Column:
    """First `nhex` hex chars of md5(salt|id) as a BIGINT — the ONE
    uniform-hash law behind split_hash (6 hex, mod basis) and
    weighted_bernoulli_sample (12 hex, raw 48 bits), kept in one place
    so the DuckDB twins — ('0x' || substring(md5(...), 1, n))::BIGINT —
    can never drift from a single copy."""
    return F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt + "|"), id_col.cast("string"))), 1, nhex
        ),
        16,
        10,
    ).cast("bigint")


def split_hash(id_col: Column, salt: str = "split-v1", basis: int = 100) -> Column:
    """Uniform [0, basis) bucket from a salted md5 of the id — engine-
    portable (DuckDB: ('0x' || substring(md5(...),1,6))::BIGINT % basis).
    basis=100 for percent splits; source_mix uses basis=10000 so
    fractional weights resolve to 0.01%."""
    return _salted_hex_bits(id_col, salt, 6) % basis


def split_assign(id_col: Column, train_pct: int = 90, salt: str = "split-v1") -> Column:
    return F.when(split_hash(id_col, salt) < train_pct, F.lit("train")).otherwise(
        F.lit("val")
    )


def source_mix(
    df: DataFrame,
    weights: dict[int, float],
    source_col: str = "source_id",
    id_col: str = "doc_id",
    salt: str = "mix-v1",
) -> DataFrame:
    """Deterministic temperature-weighted source mixing with fractional
    up/down-sampling — the standard pre-training data-mixing step (e.g.
    Pile/LLaMA-style source weights).

    A document from a source with weight w is emitted floor(w) times, plus
    one more copy when its salted hash lands below frac(w) — so the
    EXPECTED copy count is exactly w up to the hash resolution of 1/10000
    (weights quantize to 0.01%: w=0.3333 is honored, w=0.33333 rounds to
    0.3333), the decision is per-document deterministic (stable across
    re-runs and backfills; change the salt for an independent draw), and
    the op is pure map-side: no shuffle, no state, no RNG.  Copies get a
    `copy_idx` so downstream packing treats them as distinct rows.  w < 1
    is plain downsampling (emit 0 or 1).

    100 TB note: output volume is sum(w_s * bytes_s) — the explode
    multiplies rows but stays inside the scan's partitioning; no key is
    ever hot because copies stay on their input partition.
    """
    bp = split_hash(F.col(id_col), salt, basis=10000)  # uniform [0, 10000)
    n_copies = F.lit(1)  # sources without a declared weight pass through
    for src, w in weights.items():
        base = int(w)
        frac_bp = int(round((w - base) * 10000))
        n_copies = F.when(
            F.col(source_col) == src, F.lit(base) + (bp < frac_bp).cast("int")
        ).otherwise(n_copies)
    return df.withColumn("_n", n_copies).filter(F.col("_n") > 0).select(
        "*", F.explode(F.sequence(F.lit(0), F.col("_n") - 1)).alias("copy_idx")
    ).drop("_n")


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


def sample_order_hash(id_col: Column, salt: str) -> Column:
    """md5(salt|id) — the ONE selection-order law shared by
    deterministic_sample and stratified_sample (the string-hash sibling
    of _salted_hex_bits; both engines compare the lowercase hex)."""
    return F.md5(F.concat(F.lit(salt + "|"), id_col.cast("string")))


def deterministic_sample(
    df: DataFrame,
    n_per_group: int,
    group_col: str,
    id_col: str,
    salt: str = "sample-v1",
) -> DataFrame:
    """Deterministic per-group sample: the `n_per_group` lowest
    salted-hash rows of each group, with `sample_rank` (1-based).

    This is the reproducible substitute for rand()-based sampling in a
    pipeline that re-runs and backfills: membership is a pure function of
    (salt, id), so re-execution, arrival order, and partitioning cannot
    change the sample; a different salt draws an independent sample.

    Scale shape: one shuffle on the group key; the row_number window is
    per group, and Spark's WindowGroupLimit pushes the rank<=n cut into
    each partition, so only n rows per group survive the exchange's
    downstream.  The hash is md5 (engine-portable) with the id appended
    to the ordering for a total order even under hash collisions.
    """
    w = Window.partitionBy(group_col).orderBy(
        sample_order_hash(F.col(id_col), salt).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= n_per_group)
    )


def weighted_bernoulli_sample(
    df: DataFrame,
    weight_col: str,
    rate_num: int,
    rate_den: int,
    id_col: str = "doc_id",
    salt: str = "wbs-v1",
) -> DataFrame:
    """Keep each row independently with probability
    min(1, weight · rate_num / rate_den) — per-DOCUMENT importance
    resampling, the selection step the DSIR pipeline needs downstream of
    corpus.dsir_logweights (quantize the importance weight to an integer
    first, e.g. round(exp(logw)·10^6); source_mix handles per-SOURCE
    weights, this handles per-row ones).

    Exact integer law, no float RNG: keep iff

        u · rate_den  <  weight · rate_num · 2^48,

    u = first 48 bits of md5(salt|id) (the split_hash idiom widened).
    Both sides are DECIMAL(38,0) products — exact for
    weight · rate_num up to ~10^17 (beyond that the comparison would
    need a wider scale; raise your quantization instead).  Map-only:
    zero shuffles, composes under any partitioning, and the DuckDB
    oracle recomputes membership bit-identically.  Weights whose
    probability reaches 1 are always kept; NULL or negative weights
    drop the row (an importance weight of 'unknown' keeps nothing), and
    so does a NULL id — with no identity there is no deterministic coin
    to flip (outer-join debris quarantines, mirroring the signature
    stages).  A weight whose scaled product would overflow the decimal
    comparison raises loudly instead of silently dropping the heaviest
    rows."""
    if rate_num <= 0 or rate_den <= 0:
        raise ValueError("rate_num and rate_den must be positive integers")
    u = _salted_hex_bits(F.col(id_col), salt, 12).cast("decimal(38,0)")
    lhs = u * F.expr(f"CAST({int(rate_den)} AS DECIMAL(38,0))")
    scale = int(rate_num) * (1 << 48)
    # loud overflow bound: weight·scale past 10^38 would go NULL under
    # non-ANSI decimal overflow and silently DROP exactly the heaviest
    # rows (the probability-1 ones) — raise instead, like pagerank's
    # hub-sum guard
    w_max = (10**38 - 1) // scale
    rhs = F.col(weight_col).cast("decimal(38,0)") * F.expr(
        f"CAST('{scale}' AS DECIMAL(38,0))"
    )
    keep = (
        F.when(
            F.col(weight_col).cast("decimal(38,0)")
            > F.expr(f"CAST('{w_max}' AS DECIMAL(38,0))"),
            F.raise_error(
                F.lit(
                    "weighted_bernoulli_sample: weight overflows the decimal "
                    "comparison — lower the quantization or rate_num"
                )
            ),
        )
        .otherwise(lhs < rhs)
    )
    return df.filter(F.col(weight_col).isNotNull() & keep)


def stratified_sample(
    df: DataFrame,
    total_n: int,
    stratum_col: str,
    id_col: str,
    salt: str = "strat-v1",
) -> DataFrame:
    """Proportional stratified sample of EXACTLY `total_n` rows:
    largest-remainder (Hamilton) allocation across strata, deterministic
    salted-hash selection within each stratum, `sample_rank` annotated.

    Why not per-group fractions: floor(frac·n_g) under- or over-shoots
    the requested total by up to #strata rows, and a rand() pick is
    unreproducible.  Here the allocation law is exact integers —
    base_g = (total_n·n_g) DIV n, remainder r_g = total_n·n_g − base_g·n,
    and the total_n − Σbase leftover units go to the largest r_g
    (stratum-key tiebreak) — so Σ alloc_g == total_n ALWAYS, every
    alloc_g ≤ n_g (proportionality cannot over-allocate a stratum), and
    membership is a pure function of (salt, id): re-runs, arrival order,
    and partitioning cannot change the sample (the deterministic_sample
    contract, extended with an exact global budget).

    Scale shape: one groupBy on the stratum key (vocabulary-sized
    output), the allocation math rides two 1-row broadcast attaches and
    ONE window over the strata table (tiny by definition — strata are
    categories, not data), then the row selection is the
    deterministic_sample window (one stratum-keyed shuffle,
    WindowGroupLimit cuts rank ≤ alloc map-side).  Requesting more rows
    than a NON-EMPTY input holds raises loudly in-plan; an EMPTY input
    returns an empty sample in every engine mode (the guard carries an
    explicit n > 0 conjunct — with AQE the empty probe short-circuits
    before the guard ever evaluates, without AQE the broadcast side
    builds eagerly, and the two paths must agree).  A NULL stratum is
    its own stratum (eqNullSafe join back).
    """
    if not isinstance(total_n, int) or total_n < 0:
        raise ValueError("total_n must be a non-negative int")
    from .corpus import join_singleton

    counts = df.groupBy(F.col(stratum_col).alias("_st")).agg(
        F.count(F.lit(1)).alias("_ng")
    )
    # the budget guard rides the ALWAYS-one-row global aggregate (a
    # guard on the per-stratum table would never evaluate on an empty
    # input), and fires ONLY for a non-empty input (_n > 0): an empty input
    # must return an empty sample in BOTH engine modes — with AQE the
    # empty probe short-circuits before this evaluates at all, without
    # AQE the broadcast builds eagerly and a bare total_n > 0 check
    # would raise — so the n > 0 conjunct keeps the two paths consistent
    tot = counts.groupBy().agg(F.sum("_ng").alias("_n")).select(
        F.when(
            (F.coalesce(F.col("_n"), F.lit(0)) > 0)
            & (F.lit(total_n) > F.col("_n")),
            F.raise_error(
                F.lit("stratified_sample: total_n exceeds the input row count")
            ).cast("bigint"),
        ).otherwise(F.coalesce(F.col("_n"), F.lit(0))).alias("_n")
    )
    # tot is the LEFT side: with an empty input, counts is empty and a
    # counts-probed cross join would short-circuit without ever
    # evaluating tot's guard — probing FROM the always-one-row tot
    # forces the guard projection even when there is nothing to sample
    alloc0 = (
        tot.join(F.broadcast(counts), F.lit(True), "left")
        .filter(F.col("_ng").isNotNull())
        .select(
            "_st",
            "_ng",
            "_n",
            F.expr(f"CAST({total_n} AS DECIMAL(38,0)) * _ng DIV _n")
            .cast("bigint")
            .alias("_base"),
        )
    ).withColumn(
        "_rem",
        (
            F.expr(f"CAST({total_n} AS DECIMAL(38,0)) * _ng")
            - F.col("_base").cast("decimal(38,0)") * F.col("_n").cast("decimal(38,0)")
        ).cast("decimal(38,0)"),
    )
    spent = alloc0.groupBy().agg(F.sum("_base").alias("_spent"))
    # the strata table is categories, not data — a bare global window
    # over it is kilobytes through one task, not the q_lm_buckets trap.
    # NULLS LAST explicitly: Spark asc() defaults NULLS FIRST, DuckDB
    # ASC defaults NULLS LAST — the NULL stratum must tiebreak the same
    # way in both engines
    w = Window.orderBy(F.desc("_rem"), F.asc_nulls_last("_st"))
    alloc = (
        join_singleton(alloc0, spent)
        .withColumn("_rk", F.row_number().over(w))
        .select(
            "_st",
            (
                F.col("_base")
                + F.when(
                    F.col("_rk") <= F.lit(total_n) - F.col("_spent"), F.lit(1)
                ).otherwise(F.lit(0))
            ).alias("_alloc"),
        )
    )
    ws = Window.partitionBy(stratum_col).orderBy(
        # shared law with deterministic_sample; NULLS LAST so a NULL id
        # (NULL hash) ranks identically in the DuckDB twin
        sample_order_hash(F.col(id_col), salt).asc_nulls_last(),
        F.col(id_col).asc_nulls_last(),
    )
    ranked = df.withColumn("sample_rank", F.row_number().over(ws))
    return (
        ranked.join(
            F.broadcast(alloc), ranked[stratum_col].eqNullSafe(alloc["_st"])
        )
        .filter(F.col("sample_rank") <= F.col("_alloc"))
        .drop("_st", "_alloc")
    )


def contrastive_negatives(
    df: DataFrame,
    id_col: str,
    k: int = 4,
    n_shards: int = 64,
    salt: str = "neg-v1",
    exclude: DataFrame | None = None,
) -> DataFrame:
    """Deterministic negative-pair mining for contrastive training data:
    (anchor_id, negative_id, neg_rank 1..k) — each document paired with
    the k documents FOLLOWING it in salted-md5 order within its hash
    shard.  The hash order is independent of content, so within-shard
    neighbors are an unbiased random draw — but, unlike rand() pairing,
    membership is a pure function of (salt, ids): re-runs, backfills and
    partitioning reproduce the identical pairs, and a different salt
    draws an independent negative set.

    Scale shape: ONE shuffle on the shard key (md5-uniform, no skew), a
    per-shard sort, and k lead() taps over the same window — no self
    join, no corpus×corpus candidate stage.  Output is ≤ k·n rows; the
    last k rows of each shard emit fewer (lead past the shard tail is
    dropped rather than wrapped — with expected shard size n/n_shards ≫ k
    the loss is negligible and wrap-around would double the window
    machinery for it).

    `exclude`: optional (id_a, id_b) pair table (e.g. verified near-dup
    pairs) — known-positive pairs are anti-joined out in BOTH
    orientations so a near-duplicate can never be served as a negative.

    Ids are deduplicated up front: duplicate id rows hash identically,
    would sit adjacent in the window, and lead() would serve a document
    as its OWN negative (and make the tie order nondeterministic) —
    negatives are about identities, so each id participates once.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    df = df.select(F.col(id_col)).distinct()
    shard = (_salted_hex_bits(F.col(id_col), salt, 6) % n_shards).alias("_shard")
    h = sample_order_hash(F.col(id_col), salt)
    w = Window.partitionBy("_shard").orderBy(h.asc(), F.col(id_col).asc())
    # materialize the lead taps as plain columns FIRST — Spark rejects
    # window expressions inside a generator, and all k leads share the
    # one window sort anyway
    led = df.select(F.col(id_col), shard).select(
        F.col(id_col),
        *[F.lead(F.col(id_col), j).over(w).alias(f"_n{j}") for j in range(1, k + 1)],
    )
    taps = F.array(
        *[
            F.struct(
                F.lit(j).alias("neg_rank"), F.col(f"_n{j}").alias("negative_id")
            )
            for j in range(1, k + 1)
        ]
    )
    pairs = (
        led.withColumn("_t", F.explode(taps))
        .select(
            F.col(id_col).alias("anchor_id"),
            F.col("_t.negative_id").alias("negative_id"),
            F.col("_t.neg_rank").alias("neg_rank"),
        )
        .filter(F.col("negative_id").isNotNull())
    )
    if exclude is not None:
        ex = exclude.select(
            F.col(exclude.columns[0]).alias("_xa"),
            F.col(exclude.columns[1]).alias("_xb"),
        )
        both = ex.unionByName(
            ex.select(F.col("_xb").alias("_xa"), F.col("_xa").alias("_xb"))
        )
        pairs = pairs.join(
            both,
            (pairs["anchor_id"] == both["_xa"])
            & (pairs["negative_id"] == both["_xb"]),
            "left_anti",
        )
    return pairs
