"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — broadcast the (small) query set against
the full corpus; the dot product is a sequential double-precision fold inside
whole-stage codegen (`aggregate(zip_with(...))`), no Python.  Scale path:
sign-random-projection LSH — each vector is bucketed by the sign pattern of
its dot products with deterministic integer hyperplanes, so candidate
generation becomes an equi-join on the bucket key (one uniform shuffle)
instead of an O(n·q) cross product.

At 100 TB the corpus side stays partitioned; only queries/centroids move.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential double-precision dot product of two array columns."""
    return F.aggregate(
        F.zip_with(a.cast("array<double>"), b.cast("array<double>"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Returns (query_id, neighbor_id, rank); rank 1 = most similar, self
    excluded.  The query side is broadcast — corpus never shuffles.
    """
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cvec"))
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qvec"))
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos",
            dot(F.col("_qvec"), F.col("_cvec"))
            / (l2_norm(F.col("_qvec")) * l2_norm(F.col("_cvec"))),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def hyperplanes(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic integer-valued pseudo-random hyperplanes in [-3, 3].

    Integer weights keep the dot product exactly reproducible in any engine
    (no libm / RNG dependence).
    """
    return [
        [float((i * 31 + j * 17 + (i * j) % 11) % 7 - 3) for j in range(dim)]
        for i in range(n_planes)
    ]


def srp_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-random-projection bucket key: one char per plane ('1' if dot>0)."""
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(
                    vec.cast("array<double>"),
                    F.array(*[F.lit(w) for w in plane]),
                    lambda x, y: x * y,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            > 0,
            F.lit("1"),
        ).otherwise(F.lit("0"))
        for plane in planes
    ]
    return F.concat(*bits)


def srp_buckets_df(
    corpus: DataFrame,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, bucket) assignment for the LSH-bucketed ANN scale path."""
    planes = hyperplanes(n_planes, dim)
    return corpus.select(
        F.col(id_col), srp_bucket(F.col(vec_col), planes).alias("bucket")
    )


def srp_near_dup_pairs(
    corpus: DataFrame,
    n_planes: int = 8,
    dim: int = 64,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate pairs by cosine, LSH-pruned.

    Candidates come from an equi-join on the SRP bucket key (identical and
    near-identical vectors agree on every sign bit with high probability),
    then the exact cosine verifies.  The staging projection materializes the
    bucket AND the l2 norm once per row, so the pair stage costs exactly one
    dot product per candidate — the bucket/norm expressions are never
    re-inlined into the join (see dedup.shingles_from_words for the general
    lesson).  Shuffle key is the bucket: md-uniform for random data; a
    pathological all-identical corpus would need a band/salt refinement.
    """
    planes = hyperplanes(n_planes, dim)
    staged = corpus.select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("_v"),
        srp_bucket(F.col(vec_col), planes).alias("bucket"),
        l2_norm(F.col(vec_col)).alias("_nrm"),
    )
    a = staged.select(
        F.col(id_col).alias("id_a"), F.col("_v").alias("_va"),
        F.col("bucket"), F.col("_nrm").alias("_na"),
    )
    b = staged.select(
        F.col(id_col).alias("id_b"), F.col("_v").alias("_vb"),
        F.col("bucket"), F.col("_nrm").alias("_nb"),
    )
    pairs = a.join(b, ["bucket"]).filter(F.col("id_a") < F.col("id_b"))
    cos = dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb"))
    return (
        pairs.withColumn("_cos", cos)
        .filter(F.col("_cos") > threshold)
        .select("id_a", "id_b", F.round("_cos", 4).alias("cos"))
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    n_centroids: int = 16,
    nprobe: int = 4,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: coarse-quantize the corpus into
    centroid cells, probe only the closest `nprobe` cells per query.

    Deterministic training-free quantizer: the first `n_centroids` vectors
    by id are the centroids (so an external oracle can replay the exact
    algorithm — this checks ALGORITHM parity, not ANN recall).  Scale shape:

      - centroids broadcast to every executor; cell assignment is a
        map-side argmax over the corpus scan, NO shuffle of corpus vectors;
      - the candidate join shuffles on the cell id — bounded fan-out
        (corpus_size * nprobe / n_centroids candidates per query);
      - exact cosine + row_number window verify within the probed cells.

    Ties (equal cosine) break on the lower centroid/neighbor id in both the
    assignment and the ranking, so results are exactly reproducible.
    """
    cent = F.broadcast(
        corpus.filter(F.col(id_col) < n_centroids).select(
            F.col(id_col).alias("cid"), F.col(vec_col).alias("_cv")
        )
    )

    def best_cells(df: DataFrame, out_id: str, rank_cap: int) -> DataFrame:
        scored = df.join(cent).withColumn(
            "_ccos",
            dot(F.col("_v"), F.col("_cv")) / (F.col("_nrm") * l2_norm(F.col("_cv"))),
        )
        w = Window.partitionBy(out_id).orderBy(F.desc("_ccos"), F.asc("cid"))
        return (
            scored.withColumn("_crank", F.row_number().over(w))
            .filter(F.col("_crank") <= rank_cap)
            .select(out_id, "cid", "_v", "_nrm")
        )

    staged_c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
        l2_norm(F.col(vec_col)).alias("_nrm"),
    )
    staged_q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
        l2_norm(F.col(vec_col)).alias("_nrm"),
    )
    assigned = best_cells(staged_c, "neighbor_id", 1)
    probes = best_cells(staged_q, "query_id", nprobe).select(
        "query_id", "cid", F.col("_v").alias("_qv"), F.col("_nrm").alias("_qn")
    )
    cand = assigned.join(probes, "cid").filter(F.col("neighbor_id") != F.col("query_id"))
    cos = dot(F.col("_qv"), F.col("_v")) / (F.col("_qn") * F.col("_nrm"))
    w = Window.partitionBy("query_id").orderBy(F.desc("_cos"), F.asc("neighbor_id"))
    return (
        cand.withColumn("_cos", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )
