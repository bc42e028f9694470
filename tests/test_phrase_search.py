"""Exact phrase search (corpus.phrase_search): hand-checked positional law
(incl. repeated tokens and overlaps), normalization, loud guards, plan
shape (broadcast, no nested loop), and DuckDB parity via the INDEPENDENT
list-slice oracle formulation."""

from __future__ import annotations

import random

import pytest

from etl_scripts_spark.operators.corpus import phrase_search

D = "doc_id bigint, text string"
P = "query_id bigint, phrase string"


def _rows(df):
    return sorted(
        (r["query_id"], r["doc_id"], r["n_occurrences"], r["first_pos"])
        for r in df.collect()
    )


def test_hand_checked_matches(spark):
    docs = spark.createDataFrame(
        [
            (1, "The new York times is here"),
            (2, "new york new york"),
            (3, "times new roman"),
        ],
        D,
    )
    phrases = spark.createDataFrame([(10, "new york"), (11, "new york times")], P)
    got = _rows(phrase_search(docs, phrases))
    assert got == [
        (10, 1, 1, 2),  # the|new|york|... start 2
        (10, 2, 2, 1),  # starts 1 and 3
        (11, 1, 1, 2),
    ]


def test_repeated_token_phrase(spark):
    docs = spark.createDataFrame([(1, "new york new york")], D)
    phrases = spark.createDataFrame([(9, "york new york")], P)
    assert _rows(phrase_search(docs, phrases)) == [(9, 1, 1, 2)]


def test_scattered_words_do_not_match(spark):
    """The whole point vs bag-of-words retrieval."""
    docs = spark.createDataFrame([(1, "york was new once, times change")], D)
    phrases = spark.createDataFrame([(9, "new york")], P)
    assert phrase_search(docs, phrases).count() == 0


def test_normalization_is_the_shared_words_law(spark):
    docs = spark.createDataFrame([(1, "Visit NEW-York!  (Times)")], D)
    phrases = spark.createDataFrame([(9, "new york times")], P)
    assert _rows(phrase_search(docs, phrases)) == [(9, 1, 1, 2)]


def test_degenerate_phrase_raises(spark):
    docs = spark.createDataFrame([(1, "some text")], D)
    phrases = spark.createDataFrame([(9, "!!!")], P)
    with pytest.raises(Exception, match="normalizes to no tokens"):
        phrase_search(docs, phrases).collect()


def test_reserved_column_names_raise(spark):
    docs = spark.createDataFrame([(1, "x")], "_s bigint, text string")
    phrases = spark.createDataFrame([(9, "x")], P)
    with pytest.raises(ValueError, match="collide"):
        phrase_search(docs, phrases, id_col="_s")


def test_plan_broadcasts_phrases_no_nested_loop(spark):
    import contextlib
    import io

    docs = spark.createDataFrame([(i, f"w{i} w{i + 1}") for i in range(50)], D)
    phrases = spark.createDataFrame([(9, "w3 w4")], P)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        phrase_search(docs, phrases).explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan
    for marker in ("BroadcastNestedLoopJoin", "CartesianProduct", "SortMergeJoin"):
        assert marker not in plan, marker


def test_duckdb_parity_randomized(spark):
    """Count-per-start distribution law == list-slice oracle on a small-
    vocabulary corpus dense enough to exercise overlaps and repeats."""
    import duckdb

    from etl_scripts_spark.oracle import phrase_search_sql
    from tests.parity import compare

    rng = random.Random(17)
    vocab = ["aa", "bb", "cc", "dd"]
    drows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 30))))
        for i in range(120)
    ]
    prows = [(j, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 3)))) for j in range(8)]
    docs = spark.createDataFrame(drows, D)
    phrases = spark.createDataFrame(prows, P)
    got = phrase_search(docs, phrases).toPandas()
    con = duckdb.connect()
    con.execute("CREATE TABLE dd(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO dd VALUES (?,?)", drows)
    con.execute("CREATE TABLE pp(query_id BIGINT, phrase VARCHAR)")
    con.executemany("INSERT INTO pp VALUES (?,?)", prows)
    want = con.execute(
        phrase_search_sql("SELECT * FROM dd", "SELECT * FROM pp")
    ).fetchdf()
    assert compare(got, want) == []


def test_duplicate_doc_ids_sum_per_row(spark):
    """The count-per-start identity is per PHYSICAL row: two rows sharing
    doc_id=1 must neither merge their candidates into a >plen count (false
    negative) nor stitch a phantom cross-row match (false positive) —
    occurrences SUM across the rows, like the oracle's per-row law."""
    docs = spark.createDataFrame(
        [(1, "new york"), (1, "new york"), (1, "new x"), (1, "x york")], D
    )
    phrases = spark.createDataFrame([(9, "new york")], P)
    # two true matches from the duplicate rows; the "new x"/"x york" pair
    # must NOT combine into a phantom third
    assert _rows(phrase_search(docs, phrases)) == [(9, 1, 2, 1)]


def test_null_phrase_raises_loudly(spark):
    """A NULL phrase tokenizes to a NULL array, which explodes to zero
    rows — without the generator-input guard the query would silently
    vanish from the output instead of raising."""
    docs = spark.createDataFrame([(1, "some text")], D)
    phrases = spark.createDataFrame([(9, None)], P)
    with pytest.raises(Exception, match="normalizes to no tokens"):
        phrase_search(docs, phrases).collect()
