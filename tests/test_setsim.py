"""Exact set-similarity join (dedup.setsim_pairs): hand-computed pairs,
the integer threshold boundary a float compare would flip, DuckDB
brute-force parity (the oracle has NO prefix filter, so a pruning bug
cannot hide in its own mirror), and the JVM-only plan pin."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_scripts_spark import oracle
from etl_scripts_spark.operators.dedup import setsim_pairs
from tests.conftest import SF_SMALL
from tests.parity import compare, duckdb_con, plan_of


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_hand_computed_pair(spark):
    # 1 ∩ 2 = {apple banana cherry}, union 5 -> J = 0.6; 3 disjoint
    df = _docs(spark, [
        (1, "apple banana cherry date"),
        (2, "apple banana cherry fig"),
        (3, "zebra yak"),
    ])
    rows = setsim_pairs(df, "text", "doc_id", t_num=6, t_den=10).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.id_a, r.id_b, r.n_common, r.n_union) == (1, 2, 3, 5)
    assert r.jaccard == 0.6
    # raising the bar past 0.6 excludes it
    assert setsim_pairs(df, "text", "doc_id", t_num=7, t_den=10).count() == 0


def test_threshold_boundary_is_integer_exact(spark):
    # |a|=8, |b|=9, 7 shared -> J = 7/10 EXACTLY; t = 7/10 must keep it.
    shared = [f"w{i}" for i in range(7)]
    df = _docs(spark, [
        (1, " ".join(shared + ["aonly"])),
        (2, " ".join(shared + ["bonly1", "bonly2"])),
    ])
    rows = setsim_pairs(df, "text", "doc_id", t_num=7, t_den=10).collect()
    assert len(rows) == 1 and rows[0].n_common == 7 and rows[0].n_union == 10
    # one token fewer shared -> 6/11 < 7/10 -> excluded
    df2 = _docs(spark, [
        (1, " ".join(shared[:6] + ["aonly", "a2"])),
        (2, " ".join(shared[:6] + ["bonly1", "bonly2", "b3"])),
    ])
    assert setsim_pairs(df2, "text", "doc_id", t_num=7, t_den=10).count() == 0


def test_indexing_prefix_and_positional_boundary(spark):
    """r13 PPJoin math pinned at its exact edge: two size-6 docs sharing
    4 tokens (J = 4/8 = 0.5 exactly at t = 5/10), with each doc's 2
    UNIQUE tokens made rarer (df 1 vs 2) so the global (df ASC, token)
    order sorts them FIRST — the first common token then sits at
    position 3 in both docs, which is EXACTLY the indexing prefix
    p_i = 6 − ceil(2t/(1+t)·6) + 1 = 3 of the indexed side, and the
    positional bound 1 + min(6−3, 6−3) = 4 lands EXACTLY on
    α = ceil(t·12/(1+t)) = 4.  An off-by-one in either formula loses
    this pair.  The sub-threshold variant (3 shared of 6/6, J = 1/3)
    places every common token past p_i — pruned with no candidate, and
    correctly absent."""
    df = _docs(spark, [
        (1, "aa ab ca cb cc cd"),
        (2, "ba bb ca cb cc cd"),
    ])
    rows = setsim_pairs(df, "text", "doc_id", t_num=5, t_den=10).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.id_a, r.id_b, r.n_common, r.n_union) == (1, 2, 4, 8)
    assert r.jaccard == 0.5
    df2 = _docs(spark, [
        (1, "aa ab ac ca cb cc"),
        (2, "ba bb bc ca cb cc"),
    ])
    assert setsim_pairs(df2, "text", "doc_id", t_num=5, t_den=10).count() == 0


def test_duplicate_words_are_set_semantics(spark):
    # repeated words count once: both docs are the SAME 3-token set
    df = _docs(spark, [
        (1, "a a a b c"),
        (2, "c b a b a"),
    ])
    rows = setsim_pairs(df, "text", "doc_id", t_num=1, t_den=1).collect()
    assert len(rows) == 1
    assert (rows[0].n_common, rows[0].n_union, rows[0].jaccard) == (3, 3, 1.0)


def test_empty_token_docs_never_pair(spark):
    df = _docs(spark, [
        (1, "   ...   "),  # normalizes to no tokens
        (2, "...!!!"),
        (3, "real words here"),
    ])
    assert setsim_pairs(df, "text", "doc_id", t_num=1, t_den=2).count() == 0


def test_threshold_guards(spark):
    df = _docs(spark, [(1, "a b")])
    with pytest.raises(ValueError):
        setsim_pairs(df, "text", "doc_id", t_num=0, t_den=10)
    with pytest.raises(ValueError):
        setsim_pairs(df, "text", "doc_id", t_num=11, t_den=10)
    with pytest.raises(ValueError):
        setsim_pairs(df, "text", "doc_id", t_num=0.5, t_den=1)  # type: ignore[arg-type]


def test_parity_with_duckdb_brute_force(spark):
    """The oracle enumerates ALL intersecting pairs (no prefix filter):
    equality proves the prefix+size pruning loses nothing and the
    verification admits nothing extra, on the real synthetic corpus."""
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    got = setsim_pairs(docs, "text", "doc_id", t_num=5, t_den=10).toPandas()
    con = duckdb_con(SF_SMALL)
    want = con.execute(
        oracle.setsim_pairs_sql("SELECT doc_id, text FROM documents", 5, 10)
    ).fetchdf()
    assert len(want) > 0  # the corpus plants near-duplicates
    assert compare(got, want) == []


def test_plan_is_jvm_only(spark):
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    plan = plan_of(setsim_pairs(docs, "text", "doc_id"))
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_incremental_copy_and_novel(spark):
    from etl_scripts_spark.operators.dedup import incremental_setsim

    corpus = _docs(spark, [
        (1, "alpha beta gamma delta"),
        (2, "one two three four five"),
    ])
    batch = _docs(spark, [
        (10, "alpha beta gamma delta"),        # exact copy -> J = 1
        (11, "alpha beta gamma epsilon"),      # 3/5 = 0.6
        (12, "totally novel words here"),      # clean
        (13, "   ...   "),                     # no tokens -> clean
    ])
    got = {r.doc_id: r for r in incremental_setsim(
        corpus, batch, t_num=6, t_den=10
    ).collect()}
    assert got[10].is_dup and got[10].best_match_id == 1 and got[10].best_jaccard == 1.0
    assert got[11].is_dup and got[11].best_match_id == 1 and got[11].best_jaccard == 0.6
    assert not got[12].is_dup and got[12].best_match_id is None
    assert not got[13].is_dup
    assert len(got) == 4  # every batch doc reported exactly once


def test_incremental_persisted_index_equals_rebuild(spark):
    """A setsim_index built once and reused across batches gives rows
    identical to the rebuild-per-call path (the production persisted-
    index claim), and a threshold mismatch between index and query
    raises instead of silently mis-pruning."""
    from etl_scripts_spark.operators.dedup import incremental_setsim, setsim_index

    corpus = _docs(spark, [
        (1, "alpha beta gamma delta"),
        (2, "one two three four five"),
    ])
    idx = setsim_index(corpus, t_num=6, t_den=10)
    for batch_rows in (
        [(10, "alpha beta gamma delta"), (11, "novel words entirely here")],
        [(20, "one two three four six"), (21, "alpha beta gamma epsilon")],
    ):
        batch = _docs(spark, batch_rows)
        via_index = sorted(
            tuple(r)
            for r in incremental_setsim(None, batch, t_num=6, t_den=10, index=idx).collect()
        )
        rebuilt = sorted(
            tuple(r)
            for r in incremental_setsim(corpus, batch, t_num=6, t_den=10).collect()
        )
        assert via_index == rebuilt
    with pytest.raises(ValueError, match="built at threshold"):
        incremental_setsim(None, _docs(spark, [(30, "x")]), t_num=7, t_den=10, index=idx)
    with pytest.raises(ValueError, match="corpus or index"):
        incremental_setsim(None, _docs(spark, [(30, "x")]), t_num=6, t_den=10)
    # ambiguous call: both corpus AND index — silently preferring the index
    # would dedup against a stale corpus version, so the op raises
    with pytest.raises(ValueError, match="not both"):
        incremental_setsim(corpus, _docs(spark, [(30, "x")]), t_num=6, t_den=10, index=idx)


def test_incremental_null_batch_id_raises(spark):
    """The final report join is null-unsafe, so a NULL batch id would
    silently come back is_dup=false — the op raises in-plan instead."""
    from etl_scripts_spark.operators.dedup import incremental_setsim

    corpus = _docs(spark, [(1, "alpha beta gamma delta")])
    batch = spark.createDataFrame(
        [(10, "alpha beta gamma delta"), (None, "sneaky null id")],
        "doc_id bigint, text string",
    )
    with pytest.raises(Exception) as e:
        incremental_setsim(corpus, batch, t_num=6, t_den=10).collect()
    assert "NULL batch ids" in str(e.value)


def test_incremental_best_match_tiebreak(spark):
    from etl_scripts_spark.operators.dedup import incremental_setsim

    # two corpus docs with IDENTICAL jaccard to the batch doc: lower id wins
    corpus = _docs(spark, [
        (5, "a b c d"),
        (3, "a b c e"),
    ])
    batch = _docs(spark, [(9, "a b c f")])
    r = incremental_setsim(corpus, batch, t_num=1, t_den=2).collect()[0]
    assert r.best_match_id == 3 and r.best_jaccard == 0.6


def test_incremental_unseen_tokens_keep_completeness(spark):
    from etl_scripts_spark.operators.dedup import incremental_setsim

    # batch doc shares 4/5 with corpus doc but ALSO carries a token the
    # corpus never saw (df=0 extension) — the prefix filter must still
    # find the pair
    corpus = _docs(spark, [(1, "p q r s t")])
    batch = _docs(spark, [(9, "p q r s zebra")])
    r = incremental_setsim(corpus, batch, t_num=6, t_den=10).collect()[0]
    assert r.is_dup and r.best_match_id == 1
    assert r.best_jaccard == round(4 / 6, 4)


def test_incremental_parity_with_duckdb(spark):
    from etl_scripts_spark.operators.dedup import incremental_setsim
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    corpus = docs.filter(F.col("doc_id") % 4 != 0)
    batch = docs.filter(F.col("doc_id") % 4 == 0)
    got = (
        incremental_setsim(corpus, batch, t_num=4, t_den=10)
        .withColumn("is_dup", F.col("is_dup").cast("int"))
        .toPandas()
    )
    con = duckdb_con(SF_SMALL)
    want = con.execute(
        "SELECT * EXCLUDE (is_dup), is_dup::INT AS is_dup FROM ("
        + oracle.incremental_setsim_sql(
            "SELECT doc_id, text FROM documents WHERE doc_id % 4 <> 0",
            "SELECT doc_id, text FROM documents WHERE doc_id % 4 = 0",
            4,
            10,
        )
        + ")"
    ).fetchdf()
    assert len(want) > 0 and want["is_dup"].sum() > 0
    assert compare(got, want) == []


def _fuzz_corpus(seed: int, n_vocab: int, n_docs: int = 44):
    """Deterministic pseudo-random corpus over exactly `n_vocab` distinct
    tokens: coverage docs pin the realized vocabulary to n_vocab, random
    docs of size 3..18 provide bulk, and planted mutations of earlier
    docs guarantee above-threshold pairs exist."""
    import random

    rng = random.Random(seed)
    vocab = [f"tk{i:03d}" for i in range(n_vocab)]
    rows = []
    # coverage docs: every vocab token appears at least once
    for i in range(0, n_vocab, 16):
        rows.append((1000 + i, " ".join(vocab[i:i + 16])))
    bulk = [
        (d, " ".join(rng.sample(vocab, rng.randint(3, 18))))
        for d in range(n_docs)
    ]
    rows.extend(bulk)
    # planted near-dups: copy a doc, drop one token, add another
    for d in range(0, n_docs, 5):
        mutated = bulk[d][1].split()[:-1] + [rng.choice(vocab)]
        rows.append((2000 + d, " ".join(dict.fromkeys(mutated))))
    return rows


def _brute_pairs(rows, t_num: int, t_den: int):
    """All-pairs reference with NO pruning: the prefix/positional/bitmask
    machinery must reproduce this exactly."""
    sets = {i: set(t.split()) for i, t in rows}
    want = set()
    ids = sorted(sets)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            sa, sb = sets[a], sets[b]
            if not sa or not sb:
                continue
            inter = len(sa & sb)
            union = len(sa | sb)
            if inter * t_den >= union * t_num:
                want.add((a, b, inter, union))
    return want


@pytest.mark.parametrize("n_vocab", [60, 62, 63, 64, 65, 66, 68])
def test_fuzz_across_regime_boundary(spark, n_vocab):
    """Randomized corpora sweeping the dense/sparse regime boundary
    (|vocab| = 64): the bitmask emit-once law (≤ 64) and the general
    PPJoin shape (> 64) must both equal the unpruned all-pairs
    reference — the VERDICT-r13 protective fuzz for the dense-regime
    completeness proof.  The test session's defaultParallelism keeps
    these vocabularies in the SALTED branch of the candidate join, so
    the salt guard is fuzzed too (the unsalted branch is swept below)."""
    rows = _fuzz_corpus(seed=97 + n_vocab, n_vocab=n_vocab)
    df = _docs(spark, rows)
    got = setsim_pairs(df, "text", "doc_id", t_num=5, t_den=10).collect()
    want = _brute_pairs(rows, 5, 10)
    assert len(want) > 0
    got_keys = {(r.id_a, r.id_b, r.n_common, r.n_union) for r in got}
    assert got_keys == want
    assert len(got) == len(want)  # exactly-once emission, no dup rows
    for r in got:  # jaccard is a 4-dp round of n_common/n_union
        assert abs(r.jaccard - r.n_common / r.n_union) <= 5e-5 + 1e-12


@pytest.mark.parametrize("n_vocab", [63, 64, 65])
def test_fuzz_regime_boundary_unsalted(spark, n_vocab):
    """The same fuzz with the salt guard forced OFF (n_salts=1), driving
    the internals directly — both regimes must be salt-independent."""
    from etl_scripts_spark.operators.dedup import (
        _setsim_pairs_bitmask,
        _setsim_pairs_general,
        _setsim_toks,
    )

    rows = _fuzz_corpus(seed=411 + n_vocab, n_vocab=n_vocab)
    df = _docs(spark, rows)
    toks = _setsim_toks(df, "text", "doc_id")
    freq = toks.groupBy("_tok").agg(F.count(F.lit(1)).alias("_df")).localCheckpoint()
    impl = _setsim_pairs_bitmask if n_vocab <= 64 else _setsim_pairs_general
    got = impl(toks, freq, 5, 10, 1).collect()
    want = _brute_pairs(rows, 5, 10)
    assert len(want) > 0
    assert {(r.id_a, r.id_b, r.n_common, r.n_union) for r in got} == want
    assert len(got) == len(want)
