"""Eager release of localCheckpoint block storage.

Every iterative operator here (star-CC, label-prop CC, PageRank, BFS,
k-core peel, k-means, BPE training, perceptron) pins each round's state
with ``localCheckpoint(eager=True)`` so the plan stays flat.  (The
lineage fixpoint also checkpoints per hop but CANNOT free: every hop's
result slice still reads its round's checkpoint when the returned union
is collected — do not add a free there; an unpersisted localCheckpoint
cannot be recomputed and the collect would raise.)  Spark only frees
those blocks when the JVM-side RDD object is garbage-collected — which,
through the py4j reference chain, can lag the Python side by a long time.
On a shared executor that lag is real memory pressure: SCALE.md measured a
later operator inflating ~4x purely from retained checkpoint blocks of an
earlier one, and the diameter-100 chain-CC query (30+ rounds of
edge-table checkpoints) is the worst producer in the registry.

``free_local_checkpoint`` drops a superseded round's blocks the moment the
next round's checkpoint has materialized.  It is deliberately NARROW: the
analyzed plan of a DataFrame returned by ``localCheckpoint`` is a single
``LogicalRDD`` wrapping the persisted internal RDD, so ``analyzed().rdd()``
is exactly the block owner and ``unpersist(blocking=False)`` frees it
without touching the CacheManager (nothing here is ``.cache()``d).  For any
OTHER plan shape the call is a no-op — callers never need to check what
they are holding.

CONTRACT: only call this on a checkpoint that nothing will read again.  A
localCheckpoint's lineage is truncated, so an unpersisted one cannot be
recomputed — a later action on it raises CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND
(loud, never silently wrong).  In the round loops below that is exactly the
previous round's state after the new round's eager checkpoint finished
materializing, and never the DataFrame a function returns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def free_local_checkpoint(df: DataFrame | None) -> None:
    """Release the block-manager storage behind an eager localCheckpoint.

    Best-effort: no-op for ``None``, for plans that are not a bare
    ``LogicalRDD``, and for any py4j hiccup — hygiene must never turn a
    correct query into a failed one.
    """
    if df is None:
        return
    try:
        plan = df._jdf.queryExecution().analyzed()  # noqa: SLF001
        if plan.getClass().getSimpleName() != "LogicalRDD":
            return
        plan.rdd().unpersist(False)
    except Exception:  # pragma: no cover - py4j/session teardown races
        pass


def free_session_litter(spark) -> int:
    """Unpersist EVERY leftover persistent RDD in the session — the
    release path for loop consumers of operators that pin their inputs
    under the returned plan (pagerank, link_records, batch_retrieval,
    the n-gram scorers): call it after each fully-consumed result, as
    bench.py does between queries.  Safe because nothing in this engine
    `.cache()`s across calls — anything registered on the context after
    a result has been collected is a finished call's checkpoint litter.

    CONTRACT: only call AFTER every outstanding result DataFrame has
    been consumed (collected / written) — a lazily-held result whose
    checkpoint this frees raises CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND on
    its next action (loud, never silently wrong).  Returns the number
    of RDDs released (best-effort; py4j hiccups return early).
    """
    n = 0
    try:
        for rdd in dict(
            spark.sparkContext._jsc.getPersistentRDDs()  # noqa: SLF001
        ).values():
            rdd.unpersist(False)
            n += 1
    except Exception:  # pragma: no cover - py4j/session teardown races
        pass
    return n
