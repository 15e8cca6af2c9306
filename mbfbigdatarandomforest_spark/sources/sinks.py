"""Sinks (SURVEY.md §2.1 S3/S4).

Parquet is the engine's inter-stage format (replaces save.ffdf,
01_DataMerge.R:50); CSV export exists only for reference-output parity
(fwrite, 03_LinearRegression.R:162).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def materialize_local(df: DataFrame) -> DataFrame:
    """JVM-materialize a Python-built local-literal frame BEFORE a file
    write (r16 — found while slimming the index-lifecycle queries'
    dead wall, VERDICT r15 finding 2): on this stack, a
    ``spark.createDataFrame(local_rows)`` plan whose action is a FILE
    write (parquet/text/csv) pays a ~5 s FIXED cost per write —
    measured 5.5 s for a one-row frame vs 0.5 s for the same frame
    materialized first, while collect/noop of the identical frame run
    in ~0.4 s, so it is specifically the FileFormatWriter job spinning
    up a fresh Python stage. ``localCheckpoint(eager=True)`` runs that
    Python stage once on the regular daemon pool and hands the writer
    a JVM-resident RDD; the tiny persisted block is released by the
    ContextCleaner when the frame goes out of scope.

    Use for every metadata/lock/model-artifact write built from driver
    data — an index build/append composes several such writes, so the
    fixed cost multiplied into tens of seconds per lifecycle."""
    return df.localCheckpoint(eager=True)


def write_parquet(
    df: DataFrame,
    path: str,
    *,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv(df: DataFrame, path: str, *, single_file: bool = True) -> None:
    """CSV export. ``single_file`` coalesces to 1 partition — only for
    small result tables (the reference's models/*.csv are ≤1.5k rows);
    never use on fact-scale data."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("header", True).csv(path)


def write_jsonl(
    df: DataFrame,
    path: str,
    *,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    compression: str | None = "gzip",
) -> None:
    """JSON-lines export — the interchange format downstream LLM
    tooling consumes. Stays distributed (one file per task; no
    single-file coalesce — corpora are fact-scale); gzip by default
    since JSONL text compresses ~10×."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)


def write_orc(
    df: DataFrame,
    path: str,
    *,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """ORC sink — mirror of ``write_parquet`` for ORC-standardized
    warehouses (native vectorized writer, zlib default)."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)
