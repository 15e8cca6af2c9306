"""Typed source readers (SURVEY.md §2.1 S1/S2/S3).

The reference ingests a 9.3 GB CSV in 100k-row chunks into a columnar
store (01_DataMerge.R:42-47) and small CSVs via fread (01_DataMerge.R:61).
Spark subsumes both with a single declarative scan; the engine rule is:
**explicit schema always** (SURVEY.md §1.3) — inference is allowed only
behind an explicit opt-in flag for exploration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_SCHEMA_RULE_MSG = (
    "engine rule: pass an explicit schema (SURVEY.md §1.3); "
    "set infer=True only for exploration"
)


def _apply_options(reader, options: dict):
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    *,
    header: bool = True,
    null_value: str = "",
    mode: str = "DROPMALFORMED",
    infer: bool = False,
    **options,
) -> DataFrame:
    """CSV scan with imposed schema.

    - ``null_value=''`` replicates the reference's empty-string→NA recode
      (P9, 02_DataCleaning.R:35) at the scan, where it is free.
    - ``mode='DROPMALFORMED'`` replaces the reference's hard 3M-row cap
      that worked around "an issue in the last 40 rows"
      (01_DataMerge.R:44-46) — drop the malformed tail instead of
      counting rows.
    """
    reader = _apply_options(
        spark.read.option("header", header)
        .option("nullValue", null_value)
        .option("mode", mode),
        options,
    )
    if schema is not None:
        return reader.schema(schema).csv(path)
    if not infer:
        raise ValueError(_SCHEMA_RULE_MSG)
    return reader.option("inferSchema", True).csv(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    *,
    quarantine: bool = True,
    corrupt_col: str = "_corrupt_record",
    infer: bool = False,
    **options,
) -> DataFrame:
    """JSON-lines scan — the interchange format LLM corpora actually
    ship in. Same engine rule as CSV: explicit schema always (schema
    inference reads the data TWICE; at 100 TB that is a full extra
    pass), with ``infer=True`` as the documented exploration escape
    hatch.

    ``quarantine=True`` (default; requires an explicit schema — with
    ``infer=True`` there is no schema to append to, so the flag raises)
    appends ``corrupt_col`` to the schema in PERMISSIVE mode: malformed
    lines surface as rows whose other fields are NULL and whose raw
    text lands in ``corrupt_col`` — the same keep-and-audit posture as
    ``multimodal.extract_features``'s decode quarantine, instead of a
    task-killing FAILFAST or a silent DROPMALFORMED. Passing a
    ``mode=`` option alongside ``quarantine=True`` is a contradiction
    and raises; pass ``quarantine=False`` to control the mode yourself.

    Spark restriction worth knowing (SPARK docs, "referencing the
    internal corrupt record column"): a query that references ONLY
    ``corrupt_col`` (e.g. ``.filter(f"{{corrupt_col}} IS NOT NULL")
    .count()``) throws ``[UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_
    RECORD_COLUMN]`` because pruning leaves nothing but the internal
    column — ``.cache()`` the frame (as the tests do) or keep at least
    one data column in the query before corrupt-only aggregations.
    """
    if schema is None:
        if not infer:
            raise ValueError(_SCHEMA_RULE_MSG)
        if quarantine:
            raise ValueError(
                "read_jsonl: quarantine needs an explicit schema to "
                "append the corrupt column to; pass quarantine=False "
                "with infer=True"
            )
        return _apply_options(spark.read, options).json(path)
    if quarantine:
        if "mode" in options and options["mode"] != "PERMISSIVE":
            raise ValueError(
                f"read_jsonl: mode={options['mode']!r} contradicts "
                "quarantine=True (quarantine IS PERMISSIVE mode); pass "
                "quarantine=False to choose the mode yourself"
            )
        from pyspark.sql.types import StringType

        schema = StructType(schema.fields[:]).add(corrupt_col, StringType())
        options = {
            **options,
            "mode": "PERMISSIVE",
            "columnNameOfCorruptRecord": corrupt_col,
        }
    return _apply_options(spark.read, options).schema(schema).json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — the other columnar interchange format Spark ships a
    native vectorized reader for (warehouses that standardized on
    Hive/ORC rather than parquet). Same engine posture as parquet:
    self-describing schema, predicate pushdown and column pruning come
    from the format, so no imposed-schema rule applies."""
    return spark.read.orc(path)


def read_text(
    spark: SparkSession,
    path: str,
    *,
    whole_file: bool = False,
    line_col: str = "value",
) -> DataFrame:
    """Raw-text ingestion for corpus building.

    Default: one row per LINE (``value: string``) — splittable, scales
    to any file size. ``whole_file=True``: one row per FILE — the shape
    crawl dumps of one-document-per-file arrive in. WARNING at scale: a
    whole file becomes ONE row, so this mode is for many-small-files
    corpora only (a 10 GB file would materialize a 10 GB row); Spark
    cannot split inside a file in this mode. Adds the source path via
    ``input_file_name`` so downstream dedup/provenance keeps a stable
    document key either way."""
    from pyspark.sql import functions as F

    # NB: must be the text() kwarg — .option("wholetext", ...) is
    # silently ignored by the text source (verified on pyspark 4.1)
    df = spark.read.text(path, wholetext=whole_file)
    if line_col != "value":
        df = df.withColumnRenamed("value", line_col)
    return df.withColumn("source_file", F.input_file_name())


def ingest_text_documents(
    spark: SparkSession,
    text_dir: str,
    *,
    lang: str = "en",
) -> DataFrame:
    """Turn a directory tree of raw ``.txt`` files into the engine's
    ``documents`` shape (``doc_id, text, source, lang``) so every
    curation operator — Gopher rules, LM perplexity, dedup,
    decontamination, DSIR, packing — runs on crawl-dump input with no
    parquet conversion step.

    One document per FILE (``read_text(whole_file=True)``); ``source``
    is the file's immediate parent directory name (the conventional
    dump/source layout: ``dir/<source>/<file>.txt``), ``doc_id`` is the
    64-bit hash of the file path — stable across reruns, independent of
    partitioning. A ``benchmark/`` subdirectory is the conventional
    place for held-out eval text (the curation CLI wires
    ``source='benchmark'`` into decontamination)."""
    from pyspark.sql import functions as F

    raw = read_text(spark, f"{text_dir.rstrip('/')}/*/*.txt", whole_file=True)
    return documents_projection(raw, lang=lang)


def documents_projection(raw: DataFrame, *, lang: str = "en") -> DataFrame:
    """Shared (batch AND streaming) mapping from a whole-file text frame
    (``value``, ``source_file``) to the documents shape — pure column
    expressions, so it is append-mode-legal on a stream unchanged."""
    from pyspark.sql import functions as F

    return raw.select(
        F.xxhash64("source_file").alias("doc_id"),
        F.col("value").alias("text"),
        F.regexp_extract("source_file", r"([^/]+)/[^/]+$", 1).alias("source"),
        F.lit(lang).alias("lang"),
    )
