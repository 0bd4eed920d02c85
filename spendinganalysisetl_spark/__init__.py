"""PySpark-native analytics engine with the query semantics of
JustinDo720/SpendingAnalysisETL, generalized for large-scale batch +
streaming analytics.

The reference (/root/reference/, read-only) is a single-process pandas
ETL; this package re-expresses its operator family (SURVEY.md §2) as
declarative Spark DataFrame plans so that Catalyst/Tungsten/AQE choose
the physical strategy. No custom planner or IR exists here on purpose
(SURVEY.md §4): the DataFrame API *is* the plan.

Layout
------
- ``session``    SparkSession factory (AQE, UTC, Arrow pinned)
- ``catalog``    named-view loading of the testdata star schema
- ``functions``  scalar/vector/text expression builders (JVM-side F.*)
- ``operators``  the operator inventory: report aggregates, time-series,
                 joins, set ops, windows, rollup, dedup, similarity,
                 text analysis, top-k
- ``sources``    readers/writers + MERGE-style upsert over parquet
- ``streaming``  Structured Streaming jobs (tumbling/sliding/session
                 windows, stateful ops, foreachBatch upsert)
- ``multimodal`` binary-column (image/audio) plumbing over mapInPandas
- ``summarizer`` pluggable report summarizer (deterministic default)
"""

__version__ = "0.1.0"
