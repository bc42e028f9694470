"""10x scale probe for corpus.phrase_search (exact positional phrases).

Usage: PYTHONPATH=/root/repo python scripts/probe_phrase_search.py <n_docs>

Synthetic corpus with a GROWING vocabulary (vocab = n/2, the
batch_retrieval probe's law — the sf0.1 documents table's ~30-term
vocabulary puts nearly every token of every doc into some phrase, which
measures the dense-candidate worst case, not the pruned path): n docs
of 40 tokens, n/100 three-token phrases lifted verbatim from the doc
law (so every phrase HAS occurrences and the match arm is exercised,
not just the no-hit arm).  Measures the full plan wall (token explode +
broadcast offsets + candidate shuffle + count-per-start aggregate) and
verifies non-degeneracy: every phrase matches at least one doc and
first_pos stays within the 40-token doc length.  The scale law to
check: candidates = (doc tokens appearing in any phrase) x (phrase
occurrences of that token) — with vocab growing alongside n, wall
should grow near-linearly in n, never quadratically (no corpus
self-join anywhere in the plan).  Run each scale in a FRESH process
(SCALE.md probe hygiene).
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from etl_scripts_spark.operators.corpus import phrase_search

n = int(sys.argv[1])
spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "16g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

vocab = max(n // 2, 100)
N_TOK = 40


def tok(base, i):
    return F.concat(F.lit("w"), ((base * 7 + i * 13) % vocab).cast("string"))


docs = (
    spark.range(n)
    .select(
        F.col("id").alias("doc_id"),
        F.array_join(
            F.transform(F.sequence(F.lit(0), F.lit(N_TOK - 1)), lambda i: tok(F.col("id"), i)),
            " ",
        ).alias("text"),
    )
    .repartition(32)
    .localCheckpoint(eager=True)
)
# each phrase = tokens 5..7 of doc ((id*100) % n): a real consecutive run
# under the same token law, so phrase k is guaranteed >=1 occurrence (its
# source doc — the modulo keeps the source INSIDE the corpus at any n;
# an unbounded id*100 would point past it below n~400 and void the
# every-phrase-matches assertion) and typically matches the other docs
# whose stride lands on the same residues
phrases = (
    spark.range(max(n // 100, 4))
    .select(
        F.col("id").alias("query_id"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(5), F.lit(7)),
                lambda i: tok((F.col("id") * 100) % n, i),
            ),
            " ",
        ).alias("phrase"),
    )
    .localCheckpoint(eager=True)
)
n_phrases = phrases.count()

t0 = time.time()
out = phrase_search(docs, phrases)
agg = out.groupBy().agg(
    F.countDistinct("query_id").alias("nq"),
    F.count("*").alias("rows"),
    F.max("first_pos").alias("max_pos"),
    F.min("n_occurrences").alias("min_occ"),
).collect()[0]
wall = time.time() - t0
assert agg["nq"] == n_phrases, f"phrases lost: {agg['nq']} of {n_phrases}"
assert agg["min_occ"] >= 1, "zero-occurrence row emitted"
assert agg["max_pos"] <= N_TOK - 2, f"first_pos {agg['max_pos']} past doc end"
print(
    f"n={n} phrases={n_phrases} wall={wall:.1f}s rows={agg['rows']} "
    f"max_pos={agg['max_pos']}"
)
spark.stop()
