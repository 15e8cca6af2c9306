"""Schema-drift guard for the test-data catalog.

Round-3 lesson: the driver regenerated the testdata and ``events.ts``
flipped from parquet TIMESTAMP(NANOS) to TIMESTAMP(MICROS); the loader
assumed NANOS unconditionally and every consumer of the ``events`` table
broke. These tests pin the contract: every table in ``catalog.TABLES``
must load with its expected column set at the small tier, and the
``events`` loader must survive all three physical encodings of ``ts``
(nanos-as-long, micros-NTZ, micros-LTZ) and normalize them to identical
tz-aware microsecond timestamps.
"""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql.types import TimestampType

from mbfbigdatarandomforest_spark.sources.catalog import TABLES, load_table

from conftest import SF_DIR_SMALL

# The columns every registered query/oracle depends on, per TESTDATA.md's
# generated (TPC-H-ish, trimmed) tables. A driver regeneration that drops
# any of these must fail HERE, loudly, not inside 8 downstream gates.
EXPECTED_COLUMNS = {
    "region": {"r_regionkey", "r_name"},
    "nation": {"n_nationkey", "n_name", "n_regionkey"},
    "customer": {"c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"},
    "supplier": {"s_suppkey", "s_name", "s_nationkey", "s_acctbal"},
    "part": {"p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"},
    "orders": {
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    },
    "lineitem": {
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        "l_returnflag",
        "l_linestatus",
        "l_shipdate",
    },
    "events": {"event_id", "ts", "user_id", "event_type", "value", "props"},
    "documents": {"doc_id", "text", "lang", "source", "n_chars"},
    "embeddings": {"vec_id", "embedding", "label"},
}


@pytest.mark.parametrize("name", TABLES)
def test_every_table_loads_with_expected_columns(spark, name):
    df = load_table(spark, SF_DIR_SMALL, name)
    assert set(df.columns) >= EXPECTED_COLUMNS[name], (
        f"{name}: missing columns {EXPECTED_COLUMNS[name] - set(df.columns)}"
    )
    # Loading must also actually execute, not just resolve a schema.
    assert df.limit(1).count() >= 0


def test_events_ts_is_tz_aware_timestamp(spark):
    df = load_table(spark, SF_DIR_SMALL, "events")
    assert isinstance(df.schema["ts"].dataType, TimestampType)


_TS_VALUES = [
    datetime.datetime(2024, 3, 1, 10, 30, 15, 123456),
    datetime.datetime(2024, 3, 2, 23, 59, 59, 999999),
    datetime.datetime(2024, 7, 4, 0, 0, 0, 0),
]


def _write_events_fixture(tmpdir: str, ts_array: pa.Array) -> str:
    table = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([10, 20, 30], pa.int64()),
            "event_type": pa.array(["a", "b", "a"], pa.string()),
            "value": pa.array([1.0, 2.0, 3.0], pa.float64()),
            "props": pa.array(["{}", "{}", "{}"], pa.string()),
        }
    )
    pq.write_table(table, f"{tmpdir}/events.parquet", store_schema=False)
    return tmpdir


@pytest.mark.parametrize(
    "arrow_type",
    [
        pa.timestamp("ns"),  # parquet TIMESTAMP(NANOS) → Spark LongType branch
        pa.timestamp("us"),  # TIMESTAMP(MICROS, adjusted=false) → NTZ branch
        pa.timestamp("us", tz="UTC"),  # TIMESTAMP(MICROS, adjusted=true) → LTZ
    ],
    ids=["nanos_as_long", "micros_ntz", "micros_ltz"],
)
def test_events_loader_survives_all_ts_encodings(spark, tmp_path, arrow_type):
    ts = pa.array(_TS_VALUES, pa.timestamp("us")).cast(arrow_type)
    fixture_dir = _write_events_fixture(str(tmp_path), ts)
    df = load_table(spark, fixture_dir, "events")
    assert isinstance(df.schema["ts"].dataType, TimestampType)
    got = sorted(r["ts"] for r in df.select("ts").collect())
    # UTC session pin → collected naive datetimes equal the written values.
    assert got == sorted(_TS_VALUES)


def test_read_jsonl_quarantines_corrupt_lines(spark, tmp_path):
    """JSONL scan: well-formed lines parse, malformed lines survive as
    quarantine rows with the raw text in _corrupt_record, the explicit
    schema is imposed, and schema-less reads require the infer opt-in."""
    import pytest as _pt
    from pyspark.sql.types import LongType, StringType, StructType

    from mbfbigdatarandomforest_spark.sources.readers import read_jsonl

    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "alpha"}\n'
        "this is not json\n"
        '{"doc_id": 2, "text": "beta"}\n'
        '{"doc_id": "not a number", "text": "gamma"}\n'
    )
    schema = (
        StructType().add("doc_id", LongType()).add("text", StringType())
    )
    df = read_jsonl(spark, str(p), schema).cache()
    clean = {
        (r.doc_id, r.text)
        for r in df.filter("_corrupt_record IS NULL").collect()
    }
    assert clean == {(1, "alpha"), (2, "beta")}
    bad = [r for r in df.filter("_corrupt_record IS NOT NULL").collect()]
    assert len(bad) == 2
    assert any("not json" in r._corrupt_record for r in bad)
    df.unpersist()

    with _pt.raises(ValueError, match="explicit schema"):
        read_jsonl(spark, str(p))


def test_write_jsonl_roundtrip(spark, tmp_path):
    """JSONL sink roundtrips through the quarantining reader with zero
    corrupt rows and identical values."""
    from pyspark.sql.types import LongType, StringType, StructType

    from mbfbigdatarandomforest_spark.sources.readers import read_jsonl
    from mbfbigdatarandomforest_spark.sources.sinks import write_jsonl

    df = spark.createDataFrame(
        [(1, "alpha"), (2, 'quote " and \n newline'), (3, None)],
        "doc_id long, text string",
    )
    out = str(tmp_path / "out")
    write_jsonl(df, out)
    schema = StructType().add("doc_id", LongType()).add("text", StringType())
    back = read_jsonl(spark, out, schema).cache()
    assert back.filter("_corrupt_record IS NOT NULL").count() == 0
    assert {(r.doc_id, r.text) for r in back.collect()} == {
        (1, "alpha"),
        (2, 'quote " and \n newline'),
        (3, None),
    }


def test_read_jsonl_option_contradictions_raise(spark, tmp_path):
    """quarantine=True contradicts an explicit non-PERMISSIVE mode and
    requires an explicit schema — both misuses raise instead of
    silently overriding the caller."""
    import pytest as _pt
    from pyspark.sql.types import LongType, StructType

    from mbfbigdatarandomforest_spark.sources.readers import read_jsonl

    p = tmp_path / "d.jsonl"
    p.write_text('{"doc_id": 1}\n')
    schema = StructType().add("doc_id", LongType())
    with _pt.raises(ValueError, match="contradicts"):
        read_jsonl(spark, str(p), schema, mode="FAILFAST")
    with _pt.raises(ValueError, match="explicit schema"):
        read_jsonl(spark, str(p), infer=True)
    # quarantine=False + caller mode is respected (FAILFAST on clean
    # data succeeds)
    df = read_jsonl(
        spark, str(p), schema, quarantine=False, mode="FAILFAST"
    )
    assert df.count() == 1 and "_corrupt_record" not in df.columns


def test_orc_roundtrip_partitioned(spark, tmp_path):
    """ORC sink/source roundtrip, including hive-partitioned layout:
    values identical, partition column recovered from directory keys,
    and partition pruning reads only the selected key's files."""
    from mbfbigdatarandomforest_spark.sources.readers import read_orc
    from mbfbigdatarandomforest_spark.sources.sinks import write_orc

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "a", -0.5), (3, "b", 2.25), (4, "b", None)],
        "k long, part string, v double",
    )
    out = str(tmp_path / "orc")
    write_orc(df, out, partition_by=["part"])
    back = read_orc(spark, out)
    assert {(r.k, r.part, r.v) for r in back.collect()} == {
        (1, "a", 1.5), (2, "a", -0.5), (3, "b", 2.25), (4, "b", None)
    }
    # partition pruning: the 'b' filter must not scan the 'a' directory
    pruned = back.filter("part = 'b'")
    plan = pruned._sc._jvm.PythonSQLUtils.explainString(
        pruned._jdf.queryExecution(), "formatted"
    )
    assert "part#" in plan and "= b)" in plan, plan  # PartitionFilters: (part = b)
    assert pruned.count() == 2


def test_read_text_line_and_wholefile(spark, tmp_path):
    """read_text: default one-row-per-line; whole_file=True one row per
    file with the full text intact; both carry source_file provenance."""
    from mbfbigdatarandomforest_spark.sources.readers import read_text

    (tmp_path / "a.txt").write_text("line one\nline two\n")
    (tmp_path / "b.txt").write_text("solo doc\nsecond line\n")
    lines = read_text(spark, str(tmp_path / "*.txt"), line_col="text").collect()
    assert sorted(r.text for r in lines) == [
        "line one", "line two", "second line", "solo doc"
    ]
    assert all(r.source_file.endswith(".txt") for r in lines)
    docs = read_text(spark, str(tmp_path / "*.txt"), whole_file=True).collect()
    assert len(docs) == 2
    by_file = {r.source_file.rsplit("/", 1)[-1]: r.value for r in docs}
    assert by_file["a.txt"] == "line one\nline two\n"
    assert by_file["b.txt"] == "solo doc\nsecond line\n"
