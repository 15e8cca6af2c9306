"""Sinks (SURVEY.md §2.1 S3/S4).

Parquet is the engine's inter-stage format (replaces save.ffdf,
01_DataMerge.R:50); CSV export exists only for reference-output parity
(fwrite, 03_LinearRegression.R:162).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


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
