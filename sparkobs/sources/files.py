"""File-format connectors beyond parquet: CSV, JSON-lines, ORC.

The reference pulls tabular data out of warehouses and object stores;
real training corpora additionally arrive as CSV/TSV dumps, JSONL crawl
shards, and ORC exports. These wrappers are thin by design — Spark's
native readers ARE the connector — but they pin the two decisions that
matter at 100 TB:

- **Explicit schemas, always.** Schema inference is a full extra pass
  over the data (CSV/JSON sample-scan every file before the real read);
  at fleet scale that doubles ingest cost and silently drifts types
  between runs. ``read_csv``/``read_jsonl`` therefore *require* a
  schema and raise otherwise.
- **FAILFAST by default.** PERMISSIVE mode (Spark's default) nulls out
  corrupt rows and keeps going — a silent-data-loss trap in a training
  pipeline. Fail loudly; callers that want quarantine semantics pass
  ``mode="PERMISSIVE"`` plus a ``columnNameOfCorruptRecord`` and deal
  with the quarantine column explicitly.

Formats stay splittable/parallel: CSV and JSONL split by newline, ORC
by stripe; one large file still fans out across executors. Column
pruning reaches ORC natively (ReadSchema) and CSV/JSON at the parse
level (only requested fields are materialized).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def _require_schema(schema, caller: str):
    if schema is None:
        raise ValueError(
            f"{caller}: an explicit schema is required — inference "
            "sample-scans every file before the real read (a full extra "
            "pass at 100 TB) and can drift types between runs. Pass the "
            "DDL string or StructType."
        )


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str | StructType,
    header: bool = True,
    mode: str = "FAILFAST",
    **options,
) -> DataFrame:
    """CSV/TSV source with mandatory schema and fail-loud parsing.

    Quoted fields (embedded delimiters/quotes) follow RFC 4180 via
    Spark's univocity parser; pass ``sep="\\t"`` for TSV,
    ``multiLine=True`` only when fields embed newlines (that option
    makes files non-splittable — leave it off unless required).

    LOSSLESS defaults (r10): Spark's stock CSV convention writes NULL
    and '' identically and trims unquoted outer whitespace — silent
    data mutation, the same trap FAILFAST exists for. This reader
    defaults ``nullValue="\\\\N"`` / ``emptyValue=""`` (the Hive
    convention :func:`write_format` emits), so NULL and empty string
    stay distinct and whitespace survives. Reading CSVs from OTHER
    producers that encode null as empty? Override both options
    explicitly.
    """
    _require_schema(schema, "read_csv")
    opts = {"nullValue": "\\N", "emptyValue": "", **options}
    return (
        spark.read.options(header=header, mode=mode, **opts)
        .schema(schema)
        .csv(path)
    )


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str | StructType,
    mode: str = "FAILFAST",
    **options,
) -> DataFrame:
    """Newline-delimited JSON source with mandatory schema.

    Only the schema's fields are materialized by the parser; extra
    keys in the records are skipped, absent keys become NULL (the
    crawl-shard contract: producers may add fields freely).
    """
    _require_schema(schema, "read_jsonl")
    return spark.read.options(mode=mode, **options).schema(schema).json(path)


def read_orc(spark: SparkSession, path: str, **options) -> DataFrame:
    """ORC source. Self-describing (schema in the footer, like
    parquet), so no schema argument; predicate pushdown and column
    pruning reach the stripe level natively."""
    return spark.read.options(**options).orc(path)


def read_parquet_merged(spark: SparkSession, path: str, **options) -> DataFrame:
    """Parquet read across SCHEMA GENERATIONS: ``mergeSchema=true``
    unions the footers of every file, so a directory written by
    evolving jobs (columns added over time) reads as one frame with
    the union schema and nulls where an older file lacks a column.
    The footer merge costs one extra driver-side pass over file
    metadata — never the data — so it is safe at any corpus size;
    leave it off (Spark's default) on single-generation tables to
    skip even that. Column RENAMES are not unified (old + new both
    appear); handle those with an explicit select."""
    return (
        spark.read.options(mergeSchema="true", **options).parquet(path)
    )


def write_format(
    df: DataFrame, path: str, fmt: str, n_files: int | None = None, **options
) -> None:
    """Write ``df`` as ``fmt`` (csv/json/orc/parquet). ``n_files``
    coalesces for small staged outputs; leave None at scale so writers
    stay one-task-per-partition.

    CSV gets LOSSLESS defaults (r10, caller-overridable): NULL is
    written as ``\\N`` and empty string as a quoted ``""`` (they are
    indistinguishable under Spark's stock convention), and the
    writer-side outer-whitespace trimming is off (stock Spark trims
    ``" x "`` to ``"x"`` on WRITE — silent mutation). Round-trips
    exactly through :func:`read_csv`; property-tested."""
    opts = dict(options)
    if fmt == "csv":
        opts = {
            "nullValue": "\\N",
            "emptyValue": '""',
            "ignoreLeadingWhiteSpace": False,
            "ignoreTrailingWhiteSpace": False,
            **opts,
        }
    out = df.coalesce(n_files) if n_files else df
    out.write.mode("overwrite").options(**opts).format(fmt).save(path)
