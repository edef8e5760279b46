"""Generic table I/O: the engine's source/sink surface beyond PqDB
(SURVEY.md §2C scans/sinks row).

Parquet is the primary format (pushdown + pruning native); JSON (including
.bz2/.gz — codec from extension) and CSV are supported for interchange;
binaryFile feeds UDF-parsed formats (see sources/mc3d.py). Writes expose the
physical-layout knobs that matter at scale: ``partition_by`` (partition
pruning on read), ``max_records_per_file`` (file sizing), ``n_files``
(repartition before write)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

READ_FORMATS = ("parquet", "json", "csv", "orc", "binaryFile")


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: T.StructType | str | None = None,
    **options,
) -> DataFrame:
    if fmt not in READ_FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {READ_FORMATS}")
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt == "csv":
        # schema inference costs an extra pass — fine for interchange files,
        # pass an explicit schema in pipelines
        options.setdefault("inferSchema", "true")
    if fmt == "csv":
        options.setdefault("header", "true")
    if fmt == "json":
        options.setdefault("multiLine", "false")
    return reader.options(**options).format(fmt).load(path)


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    max_records_per_file: int | None = None,
    n_files: int | None = None,
    **options,
) -> None:
    if n_files:
        df = df.repartition(n_files, *(partition_by or []))
    writer = df.write.mode(mode).options(**options)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "csv" and "header" not in options:
        # default only — a caller's explicit header=false must survive
        # (read_table applies the same setdefault discipline)
        writer = writer.option("header", "true")
    writer.format(fmt).save(path)
