"""SCD type-2 history maintenance (sinks/merge.py scd2_apply /
scd2_snapshot): close-and-open on change, no-op on unchanged attrs
(idempotency), stale-update drop, last-writer-wins within a batch,
closed-history passthrough, and point-in-time snapshots."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_scripts_spark.sinks.merge import scd2_apply, scd2_snapshot

HIST_SCHEMA = "k string, color string, size bigint, valid_from bigint, valid_to bigint"
UPD_SCHEMA = "k string, color string, size bigint, effective_ts bigint"


def _hist(spark, rows):
    return spark.createDataFrame(rows, HIST_SCHEMA)


def _upd(spark, rows):
    return spark.createDataFrame(rows, UPD_SCHEMA)


def _apply(hist, upd):
    return scd2_apply(hist, upd, keys=["k"], attrs=["color", "size"])


def _rows(df):
    # None sorts before any value; avoids None-vs-str TypeError
    return sorted(
        (tuple(r) for r in df.collect()),
        key=lambda t: tuple((v is not None, v) for v in t),
    )


def test_change_closes_and_opens(spark):
    hist = _hist(spark, [("a", "red", 1, 100, None)])
    upd = _upd(spark, [("a", "blue", 1, 200)])
    assert _rows(_apply(hist, upd)) == [
        ("a", "blue", 1, 200, None),
        ("a", "red", 1, 100, 200),
    ]


def test_unchanged_attrs_noop_and_idempotent(spark):
    hist = _hist(spark, [("a", "red", 1, 100, None)])
    upd = _upd(spark, [("a", "red", 1, 200)])
    once = _apply(hist, upd)
    assert _rows(once) == [("a", "red", 1, 100, None)]
    assert _rows(_apply(once, upd)) == _rows(once)


def test_new_key_opens_row(spark):
    hist = _hist(spark, [("a", "red", 1, 100, None)])
    upd = _upd(spark, [("b", "green", 7, 150)])
    assert _rows(_apply(hist, upd)) == [
        ("a", "red", 1, 100, None),
        ("b", "green", 7, 150, None),
    ]


def test_stale_update_dropped(spark):
    """effective_ts at/before the current row's valid_from is stale —
    dropped, never creating a zero-or-negative-length interval."""
    hist = _hist(spark, [("a", "red", 1, 100, None)])
    upd = _upd(spark, [("a", "blue", 1, 100), ("a", "green", 1, 50)])
    assert _rows(_apply(hist, upd)) == [("a", "red", 1, 100, None)]


def test_last_writer_wins_within_batch(spark):
    hist = _hist(spark, [("a", "red", 1, 100, None)])
    upd = _upd(spark, [("a", "blue", 1, 200), ("a", "green", 1, 300)])
    assert _rows(_apply(hist, upd)) == [
        ("a", "green", 1, 300, None),
        ("a", "red", 1, 100, 300),
    ]


def test_closed_history_passes_through_untouched(spark):
    hist = _hist(
        spark,
        [("a", "red", 1, 100, 200), ("a", "blue", 1, 200, None)],
    )
    upd = _upd(spark, [("a", "gold", 2, 400)])
    assert _rows(_apply(hist, upd)) == [
        ("a", "blue", 1, 200, 400),
        ("a", "gold", 2, 400, None),
        ("a", "red", 1, 100, 200),
    ]


def test_null_attr_transitions(spark):
    """eqNullSafe: NULL→NULL is 'unchanged'; NULL→value is a change."""
    hist = _hist(spark, [("a", None, 1, 100, None), ("b", None, 2, 100, None)])
    upd = _upd(spark, [("a", None, 1, 200), ("b", "set", 2, 200)])
    assert _rows(_apply(hist, upd)) == [
        ("a", None, 1, 100, None),
        ("b", None, 2, 100, 200),
        ("b", "set", 2, 200, None),
    ]


def test_snapshot_point_in_time(spark):
    hist = _hist(
        spark,
        [
            ("a", "red", 1, 100, 200),
            ("a", "blue", 1, 200, None),
            ("b", "green", 7, 150, None),
        ],
    )
    assert _rows(scd2_snapshot(hist, 150)) == [
        ("a", "red", 1, 100, 200),
        ("b", "green", 7, 150, None),
    ]
    assert _rows(scd2_snapshot(hist, 200)) == [
        ("a", "blue", 1, 200, None),
        ("b", "green", 7, 150, None),
    ]
    assert _rows(scd2_snapshot(hist, 99)) == []


def test_partitioning_independent(spark):
    hist = _hist(
        spark,
        [(f"k{i}", "red", i, 100, None) for i in range(40)],
    )
    upd = _upd(spark, [(f"k{i}", "blue", i, 200) for i in range(0, 40, 2)])
    a = _rows(_apply(hist.repartition(11), upd.repartition(5)))
    b = _rows(_apply(hist.coalesce(1), upd.coalesce(1)))
    assert a == b and len(a) == 60  # 40 survivors/opens + 20 closed


def test_scd2_join_version_at_event_time(spark):
    """Facts pick the version whose [valid_from, valid_to) contains
    their ts; boundary at valid_from matches, at valid_to rolls to the
    next version; pre-history facts get nulls."""
    from etl_scripts_spark.sinks.merge import scd2_join

    hist = _hist(
        spark,
        [
            ("a", "red", 1, 100, 200),
            ("a", "blue", 1, 200, None),
            ("b", "green", 7, 150, None),
        ],
    )
    facts = spark.createDataFrame(
        [("a", 50), ("a", 100), ("a", 199), ("a", 200), ("b", 150), ("b", 9000)],
        "k string, ts bigint",
    )
    got = {
        (r["k"], r["ts"]): (r["color_dim"], r["valid_from_dim"], r["valid_to_dim"])
        for r in scd2_join(facts, hist, "k").collect()
    }
    assert got == {
        ("a", 50): (None, None, None),
        ("a", 100): ("red", 100, 200),
        ("a", 199): ("red", 100, 200),
        ("a", 200): ("blue", 200, None),
        ("b", 150): ("green", 150, None),
        ("b", 9000): ("green", 150, None),
    }


def test_scd2_join_gap_yields_nulls(spark):
    """A fact falling in a GAP between versions (non-contiguous history)
    must get nulls — the as-of carry alone would wrongly return the
    stale earlier version."""
    from etl_scripts_spark.sinks.merge import scd2_join

    hist = _hist(
        spark,
        [("a", "red", 1, 100, 200), ("a", "blue", 1, 500, None)],
    )
    facts = spark.createDataFrame([("a", 300)], "k string, ts bigint")
    r = scd2_join(facts, hist, "k").collect()[0]
    assert (r["color_dim"], r["valid_from_dim"], r["valid_to_dim"]) == (
        None,
        None,
        None,
    )


def test_scd2_join_equals_inequality_join_oracle(spark):
    """Row-for-row equality with the naive BETWEEN formulation on a
    generated history — the as-of rewrite changes the plan, never the
    result."""
    from etl_scripts_spark.sinks.merge import scd2_join

    hist_rows = []
    for i in range(30):
        k = f"k{i % 7}"
        base = 100 * (i // 7)
        hist_rows.append((k, f"c{i}", i, base, base + 60 if i < 23 else None))
    hist = _hist(spark, hist_rows)
    facts = spark.createDataFrame(
        [(f"k{i % 9}", 37 * i % 450) for i in range(80)], "k string, ts bigint"
    )
    naive = facts.alias("f").join(
        hist.alias("h"),
        (F.col("f.k") == F.col("h.k"))
        & (F.col("h.valid_from") <= F.col("f.ts"))
        & (F.col("h.valid_to").isNull() | (F.col("h.valid_to") > F.col("f.ts"))),
        "left",
    )
    want = sorted(
        (r["f.k"] if "f.k" in r else r["k"], r["ts"], r["color"])
        for r in naive.select("f.k", "f.ts", "h.color").collect()
    )
    got = sorted(
        (r["k"], r["ts"], r["color_dim"])
        for r in scd2_join(facts, hist, "k").collect()
    )
    assert got == [(a, b, c) for (a, b, c) in want]


def test_tied_effective_ts_resolves_deterministically(spark):
    """Two updates sharing (key, effective_ts): the greatest payload wins
    (attr-order tiebreak), identically under any partitioning."""
    hist = _hist(spark, [("a", "red", 1, 100, None)])
    upd = _upd(spark, [("a", "blue", 1, 200), ("a", "green", 1, 200)])
    want = [("a", "green", 1, 200, None), ("a", "red", 1, 100, 200)]
    assert _rows(_apply(hist, upd.repartition(7))) == want
    assert _rows(_apply(hist, upd.coalesce(1))) == want


def test_scd2_join_rejects_suffix_collision(spark):
    import pytest as _pt

    from etl_scripts_spark.sinks.merge import scd2_join

    hist = _hist(spark, [("a", "red", 1, 100, None)])
    facts = spark.createDataFrame(
        [("a", 150, "x")], "k string, ts bigint, color_dim string"
    )
    with _pt.raises(ValueError, match="collide"):
        scd2_join(facts, hist, "k")


def test_randomized_batches_match_reference_model(spark):
    """Five seeded random batches applied in sequence: the distributed
    result equals a dict-based reference SCD2 after every apply, and the
    structural invariants hold (exactly one open row per key ever seen,
    per-key intervals non-overlapping and chained)."""
    import random

    rng = random.Random(42)
    hist = _hist(spark, [])
    # reference: key -> list of [color, size, valid_from, valid_to]
    ref: dict[str, list[list]] = {}
    ts = 100
    for _ in range(5):
        batch = []
        for _ in range(30):
            k = f"k{rng.randrange(8)}"
            color = rng.choice(["red", "green", "blue", None])
            size = rng.randrange(3)
            eff = ts + rng.randrange(50)
            batch.append((k, color, size, eff))
        ts += 100
        # reference apply: LWW on (eff, then payload) per key
        best = {}
        for k, color, size, eff in batch:
            cur = best.get(k)
            cand = (eff, (color is not None, color), size)
            if cur is None or cand > cur[0]:
                best[k] = ((eff, (color is not None, color), size), (color, size, eff))
        for k, (_, (color, size, eff)) in best.items():
            versions = ref.setdefault(k, [])
            if versions and versions[-1][3] is None:
                open_v = versions[-1]
                if eff <= open_v[2]:
                    continue  # stale
                if (open_v[0], open_v[1]) == (color, size):
                    continue  # unchanged
                open_v[3] = eff
            versions.append([color, size, eff, None])
        hist = _apply(hist, _upd(spark, batch)).localCheckpoint(eager=True)
        want = sorted(
            ((k, c, s, vf, vt) for k, vs in ref.items() for c, s, vf, vt in vs),
            key=lambda t: tuple((v is not None, v) for v in t),
        )
        assert _rows(hist) == want
        # invariants: one open row per key; intervals chain without overlap
        for k, vs in ref.items():
            assert sum(1 for v in vs if v[3] is None) == 1
            for a, b in zip(vs, vs[1:]):
                assert a[3] == b[2] and a[2] < a[3]


def test_apply_plans_exactly_one_join(spark):
    """The single-pass array/explode emit keeps the physical plan at ONE
    join of current×batch — the filtered-selects formulation compiled to
    three join executions over a reused exchange (3× join CPU)."""
    import contextlib
    import io
    import re

    hist = _hist(spark, [(f"k{i}", "red", i, 100, None) for i in range(30)])
    upd = _upd(spark, [(f"k{i}", "blue", i, 200) for i in range(0, 30, 2)])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        _apply(hist, upd).explain("formatted")
    plan = buf.getvalue()
    joins = re.findall(r"\(\d+\) (\w*Join\w*)", plan)
    assert len(joins) == 1, joins


def test_scd2_apply_duckdb_oracle_parity(spark):
    """oracle.scd2_apply_sql reproduces scd2_apply row-for-row on seeded
    random batches, including tied (key, effective_ts) pairs resolved by
    the payload tiebreak — the r8 registration's oracle, pre-verified."""
    import random

    import duckdb

    from etl_scripts_spark.oracle import scd2_apply_sql

    rng = random.Random(7)
    hist_rows = []
    for i in range(12):
        k = f"k{i}"
        hist_rows.append((k, rng.choice(["red", None]), i % 3, 50, 100))
        hist_rows.append((k, rng.choice(["blue", "gold"]), i % 3, 100, None))
    upd_rows = []
    for _ in range(40):
        upd_rows.append(
            (
                f"k{rng.randrange(16)}",
                rng.choice(["red", "green", None]),
                rng.randrange(3),
                rng.choice([90, 100, 150, 150, 200]),
            )
        )
    hist = _hist(spark, hist_rows)
    upd = _upd(spark, upd_rows)
    got = _rows(_apply(hist, upd))

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE history(k VARCHAR, color VARCHAR, size BIGINT, "
        "valid_from BIGINT, valid_to BIGINT)"
    )
    con.executemany("INSERT INTO history VALUES (?,?,?,?,?)", hist_rows)
    con.execute(
        "CREATE TABLE updates(k VARCHAR, color VARCHAR, size BIGINT, "
        "effective_ts BIGINT)"
    )
    con.executemany("INSERT INTO updates VALUES (?,?,?,?)", upd_rows)
    sql = scd2_apply_sql("history", "updates", ["k"], ["color", "size"])
    want = sorted(
        (tuple(r) for r in con.execute(sql).fetchall()),
        key=lambda t: tuple((v is not None, v) for v in t),
    )
    assert got == want
