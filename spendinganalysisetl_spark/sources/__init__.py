"""Sources & sinks: parquet readers/writers and the MERGE-style upsert
(the reference's Snowflake boundary re-expressed — SURVEY.md §2.1)."""
