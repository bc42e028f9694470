"""Unit tests for the distributed quality-classifier training
(operators/classifier.py): exact hand-computed weights on a tiny corpus,
the misclassification-driven round-2 update, and end-to-end separability
on a concept the hashed unigram+bigram features can express."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_scripts_spark.operators import classifier


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_hashed_features_exact_counts(spark):
    # "a a b" → unigrams [a, a, b], bigrams [a_a, a_b]
    fx = classifier.hashed_features(_docs(spark, [(1, "a a b")]), d=1 << 20)
    got = {r["bucket"]: r["x"] for r in fx.collect()}
    # 4 distinct features (a, b, a_a, a_b) + the bias row; 'a' occurs twice
    assert sorted(got.values()) == [1, 1, 1, 1, 2]
    assert got[1 << 20] == 1  # bias at the sentinel bucket
    # bucket law is the engine-portable md5 prefix — spot-check one
    import hashlib

    b_a = int(hashlib.md5(b"tc|a").hexdigest()[:8], 16) % (1 << 20)
    assert got[b_a] == 2


def test_perceptron_round0_is_sum_yx(spark):
    """w_1 = Σ y·x over the whole corpus (w_0=0 misclassifies everything)."""
    docs = _docs(spark, [(1, "good good"), (2, "bad")])
    fx = classifier.hashed_features(docs, d=1 << 20)
    labels = spark.createDataFrame([(1, 1), (2, -1)], "doc_id bigint, y int")
    w = classifier.train_perceptron(fx, labels, rounds=1)
    got = {r["bucket"]: r["w"] for r in w.collect()}
    import hashlib

    def bucket(f):
        return int(hashlib.md5(f"tc|{f}".encode()).hexdigest()[:8], 16) % (1 << 20)

    assert got[bucket("good")] == 2  # y=+1, x=2
    assert got[bucket("good_good")] == 1
    assert got[bucket("bad")] == -1


def test_perceptron_round2_updates_only_on_misclassified(spark):
    """After round 1, correctly-classified docs contribute no gradient; a
    doc with margin 0 (all-unseen features) still counts as misclassified."""
    docs = _docs(spark, [(1, "good"), (2, "bad"), (3, "novel")])
    fx = classifier.hashed_features(docs, d=1 << 20)
    labels = spark.createDataFrame(
        [(1, 1), (2, -1), (3, -1)], "doc_id bigint, y int"
    )
    w2 = {
        r["bucket"]: r["w"]
        for r in classifier.train_perceptron(fx, labels, rounds=2).collect()
    }
    import hashlib

    def bucket(f):
        return int(hashlib.md5(f"tc|{f}".encode()).hexdigest()[:8], 16) % (1 << 20)

    # round 1: w = {good:+1, bad:-1, novel:-1, bias:-1}.  Margins: doc1
    # +1-1=0 → y·margin = 0 ≤ 0 MISCLASSIFIED (the boundary case); docs
    # 2,3 margin -2, y=-1 → correct.  Round 2 adds doc1's features only:
    # good +1, bias +1.
    assert w2[bucket("good")] == 2
    assert w2[bucket("bad")] == -1
    assert w2[bucket("novel")] == -1
    assert w2[1 << 20] == 0  # bias: -1 from round 1, +1 from doc1's update


def test_train_and_score_separates_vocab_concept(spark):
    """Short docs use vocabulary x, long docs vocabulary y; the
    token-count label then coincides with a linearly separable vocabulary
    concept and 2 rounds reach 100% train accuracy.  (A pure
    length-on-one-token concept is NOT separable by any linear model —
    all feature vectors share a direction — which is why the corpus here
    varies vocabulary, and why hashed_features carries a bias row.)"""
    rows = [(i, " ".join(["x" if i % 2 else "y"] * (3 if i % 2 else 9))) for i in range(40)]
    out = classifier.train_and_score(
        _docs(spark, rows), d=1 << 10, rounds=2, label_min_tokens=5
    ).collect()
    assert len(out) == 40
    acc = sum(1 for r in out if (r["margin"] > 0) == (r["label"] == 1)) / 40
    assert acc == 1.0
    for r in out:
        assert r["pred"] == (r["margin"] > 0)


def test_margin_is_exact_integer_dot_product(spark):
    docs = _docs(spark, [(7, "x y x")])
    fx = classifier.hashed_features(docs, d=1 << 20)
    w = fx.select("bucket").distinct().withColumn("w", F.lit(3))
    m = classifier._margins(fx, w, "doc_id").collect()
    # features: x(2), y(1), x_y(1), y_x(1), bias(1) → Σ 3*x = 3*6
    assert m[0]["margin"] == 18
