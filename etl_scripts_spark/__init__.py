"""PySpark-native analytics engine with the query/data-processing capabilities
of qbicsoftware/etl-scripts, re-expressed Spark-first.

The reference is a set of Jython ETL scripts running inside the openBIS Data
Store Server; this package re-expresses every computation it performs as
declarative Spark DataFrame/SQL pipelines over an entity catalog
(samples / experiments / datasets / sample_parents / files), plus the
large-scale training-data operators (dedup, similarity search, text analysis,
multimodal columns) the reference lacks but a 100 TB deployment needs.

Layout (SURVEY.md §7.1):
    session.py      SparkSession factory tuned for local[N] and cluster use
    catalog.py      table schemas + loaders + star-schema → entity-model views
    expressions.py  barcode/checksum/date/code-gen column expressions (§2.2, §2.6)
    oracle.py       shared DuckDB SQL fragments kept in sync with catalog views
    operators/      lineage fixpoint, numbering windows, dedup, similarity,
                    text analysis, window/sessionization helpers
    parsers/        VCF(+ANN), TSV/JSON/kv metadata, checksum files, mzML
                    headers, run-folder crawler (§2.1)
    reports/        the reference's 27 reporting plugins as DataFrame fns
    pipelines/      parameterized dropbox-family pipelines (§2.7, §3.1)
    sinks/          MERGE-style idempotent upsert emulation, outbox pattern
    streaming/      Structured Streaming wrappers (Trigger.AvailableNow, windows)
"""

__version__ = "0.1.0"
