"""Row-group skipping report (sinks/layout.py rowgroup_stats /
skipping_report): footer stats match the written data exactly, a sorted
layout prunes a narrow predicate while a shuffled layout cannot, and
stats totals reconcile with the table row count."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from etl_scripts_spark.sinks.layout import rowgroup_stats, skipping_report


def test_footer_stats_match_written_data(spark, tmp_path):
    dest = str(tmp_path / "t1")
    spark.range(0, 1000).select(F.col("id").alias("v")).coalesce(2).write.parquet(dest)
    files = sorted(glob.glob(dest + "/*.parquet"))
    stats = rowgroup_stats(spark, files, "v").collect()
    assert sum(r["n_rows"] for r in stats) == 1000
    assert min(r["min_v"] for r in stats) == 0.0
    assert max(r["max_v"] for r in stats) == 999.0


def test_sorted_layout_skips_narrow_predicate(spark, tmp_path):
    """One sorted file per value band → every out-of-band row group is
    prunable; the same data shuffled across files prunes nothing (each
    file's range spans the whole domain).  This is the measurable claim
    behind write_zordered/repartitionByRange layouts."""
    dest_sorted = str(tmp_path / "sorted")
    dest_shuffled = str(tmp_path / "shuffled")
    df = spark.range(0, 10_000).select(F.col("id").alias("v"))
    df.repartitionByRange(10, "v").write.parquet(dest_sorted)
    df.repartition(10).write.parquet(dest_shuffled)

    def ratio(dest):
        files = sorted(glob.glob(dest + "/*.parquet"))
        stats = rowgroup_stats(spark, files, "v")
        rep = skipping_report(stats, 4200.0, 4300.0)
        tot = rep.agg(
            F.sum("rows_skipped").alias("s"), F.sum("rows_total").alias("t")
        ).collect()[0]
        return tot["s"] / tot["t"]

    assert ratio(dest_sorted) >= 0.8  # only the 4200-4300 band file reads
    assert ratio(dest_shuffled) == 0.0  # every file spans ~[0, 10000)


def test_statless_groups_are_must_read(spark):
    rows = [("f", 0, 100, None, None), ("f", 1, 50, 0.0, 10.0)]
    stats = spark.createDataFrame(
        rows, "file string, row_group int, n_rows bigint, min_v double, max_v double"
    )
    r = skipping_report(stats, 500.0, 600.0).collect()[0]
    # the statless group cannot be skipped even though the other one is
    assert (r["n_skipped"], r["rows_skipped"], r["rows_total"]) == (1, 50, 150)


def test_all_null_column_chunk_is_statless_must_read(spark, tmp_path):
    """pyarrow writes statistics with has_min_max=False for an all-null
    chunk (st is not None, st.min is None) — must surface as statless,
    not crash the footer sweep."""
    dest = str(tmp_path / "allnull")
    spark.range(0, 100).select(
        F.lit(None).cast("double").alias("v")
    ).coalesce(1).write.parquet(dest)
    files = sorted(glob.glob(dest + "/*.parquet"))
    stats = rowgroup_stats(spark, files, "v").collect()
    assert len(stats) == 1 and stats[0]["min_v"] is None
    r = skipping_report(rowgroup_stats(spark, files, "v"), 0.0, 1.0).collect()[0]
    assert (r["n_skipped"], r["rows_skipped"]) == (0, 0)


def test_rowgroup_stats_match_duckdb_parquet_metadata(spark, tmp_path):
    """DuckDB's parquet_metadata() reads the same footers — row-group
    counts and min/max must agree exactly (the oracle law the upcoming
    registration will use)."""
    import duckdb

    dest = str(tmp_path / "t")
    spark.range(0, 5000).select((F.col("id") * 3 % 997).alias("v")).repartition(
        4
    ).write.parquet(dest)
    files = sorted(glob.glob(dest + "/*.parquet"))
    got = sorted(
        (r["file"], r["row_group"], r["n_rows"], r["min_v"], r["max_v"])
        for r in rowgroup_stats(spark, files, "v").collect()
    )
    con = duckdb.connect()
    want = sorted(
        (f, int(rg), int(n), float(mn), float(mx))
        for f, rg, n, mn, mx in con.execute(
            "SELECT file_name, row_group_id, row_group_num_rows, "
            "stats_min_value::DOUBLE, stats_max_value::DOUBLE "
            f"FROM parquet_metadata('{dest}/*.parquet') WHERE path_in_schema = 'v'"
        ).fetchall()
    )
    assert got == want


def test_cobucketed_join_skips_both_shuffles(spark, tmp_path):
    """The claim behind write_samples_bucketed: two tables bucketed the
    same way join WITHOUT exchanging either side — bucketed scans satisfy
    the join's distribution requirement, the 100 TB co-location lever.
    The same join over plain parquet pays two Exchanges."""
    import contextlib
    import io

    from pyspark.sql import functions as F

    a = spark.range(0, 20_000).select(
        (F.col("id") % 500).alias("project"), F.col("id").alias("code")
    )
    b = spark.range(0, 5_000).select(
        (F.col("id") % 500).alias("project"), (F.col("id") * 3).alias("other")
    )
    spark.sql("DROP TABLE IF EXISTS t_buck_a")
    spark.sql("DROP TABLE IF EXISTS t_buck_b")
    for df, t in ((a, "t_buck_a"), (b, "t_buck_b")):
        df.write.bucketBy(16, "project").sortBy("project").mode("overwrite").format(
            "parquet"
        ).saveAsTable(t)
    prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the shuffle-join path: a broadcast of the small side would
        # trivially have zero exchanges without proving co-location
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = spark.table("t_buck_a").join(spark.table("t_buck_b"), "project")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            j.explain("formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan, plan[:600]
        assert plan.count("- Exchange (") == 0, plan[:600]
        # sanity: result matches the plain-join truth
        plain = a.join(b, "project")
        assert j.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
        spark.sql("DROP TABLE IF EXISTS t_buck_a")
        spark.sql("DROP TABLE IF EXISTS t_buck_b")
