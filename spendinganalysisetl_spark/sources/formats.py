"""CSV / JSON-lines connectors with explicit schemas.

The reference's input boundary is HTTP+JSON (extractor.py:19-31) and its
only DDL is fixed-schema (README.md:44-51); the port's equivalent rule
is: EVERY non-parquet source read declares a ``StructType`` — never
``inferSchema`` (SURVEY.md §1.3). Inference costs an extra full pass
over the data (fatal at 100 TB) and silently drifts types between runs;
a declared schema also lets the scan prune columns and push filters the
same way parquet does (column pruning happens at parse time for both
formats: unneeded fields are never materialized).

JSON-lines (one object per line) rather than multiline JSON: multiline
forces whole-file parsing in one task, while JSONL splits on line
boundaries and scans in parallel like any text source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """CSV sink: header on, explicit timestamp format (ISO, matching the
    session's pinned UTC), so the file round-trips under `read_csv` with
    the writer's schema."""
    (
        df.write.mode(mode)
        .option("header", "true")
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        .csv(path)
    )


def read_csv(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """CSV source under a declared schema. FAILFAST instead of the
    default PERMISSIVE: a malformed row is a data bug to surface, not a
    row of silent nulls."""
    return (
        spark.read.schema(schema)
        .option("header", "true")
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        .option("mode", "FAILFAST")
        .csv(path)
    )


def read_csv_quarantine(
    spark: SparkSession, path: str, schema: StructType
) -> tuple[DataFrame, DataFrame]:
    """CSV source with a quarantine channel — the third point on the
    malformed-row policy axis (FAILFAST = abort, PERMISSIVE = silent
    nulls, this = split): returns ``(good, quarantined)`` where
    quarantined rows carry the raw malformed line for repair/replay.

    A 100 TB ingest can't abort on one bad line and must not null it
    away either; routing rejects to a side table with the original
    bytes is the standard DLQ move. Implementation: PERMISSIVE parse
    with ``columnNameOfCorruptRecord`` — one scan, the split is two
    filters over the same cached parse (Spark requires the corrupt
    column to be re-selected from a cache, not computed twice).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType, StructField, StructType as ST

    with_corrupt = ST(schema.fields + [StructField("_corrupt_record", StringType())])
    parsed = (
        spark.read.schema(with_corrupt)
        .option("header", "true")
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
        .cache()  # Spark disallows filtering the corrupt column on the raw scan
    )
    good = parsed.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    bad = parsed.filter(F.col("_corrupt_record").isNotNull()).select(
        F.col("_corrupt_record").alias("raw_line")
    )
    return good, bad


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON-lines sink (the reference's native interchange shape)."""
    (
        df.write.mode(mode)
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        .json(path)
    )


def read_jsonl(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """JSON-lines source under a declared schema, FAILFAST like
    `read_csv`. Maps/arrays/structs survive the round-trip (unlike CSV,
    which is flat-only) — this is the reader for reference-shaped upload
    summaries with their map<string,double> columns (SURVEY.md §1.1)."""
    return (
        spark.read.schema(schema)
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        .option("mode", "FAILFAST")
        .json(path)
    )


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink. Columnar like parquet (stripe-level min/max indexes →
    the same predicate-pushdown and column-pruning story); offered
    because warehouse estates standardized on ORC (Hive lineage) are a
    common interchange target. Engine-internal storage stays parquet —
    this is a boundary connector, not an alternative default."""
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str, schema: StructType | None = None) -> DataFrame:
    """ORC source. Schema optional: unlike CSV/JSONL, ORC embeds its
    schema in the file footer (no inference pass, no drift) — passing
    one just asserts/projects, same as parquet."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)
