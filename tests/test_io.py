"""Generic IO surface: schema-enforced readers, corrupt-row quarantine,
partitioned writes with pruning, round-trip fidelity per format."""

from __future__ import annotations

import glob
import os

import pytest

from bd_delete_records_from_external_hive_table_spark.sources.io import (
    read_dataset,
    write_dataset,
)

SCHEMA = "id BIGINT, name STRING, score DOUBLE, ts TIMESTAMP"


@pytest.fixture
def frame(spark):
    return spark.createDataFrame(
        [(1, "a", 1.5, "2024-01-01 09:00:00"),
         (2, "b", 2.5, "2024-01-02 09:00:00"),
         (3, None, -0.5, "2024-01-03 09:00:00")],
        "id BIGINT, name STRING, score DOUBLE, ts STRING",
    ).selectExpr("id", "name", "score", "CAST(ts AS TIMESTAMP) AS ts")


def rows(df):
    return sorted((r.id, r.name, r.score, str(r.ts)) for r in df.collect())


@pytest.mark.parametrize("fmt", ["parquet", "orc", "csv", "json", "xml"])
def test_round_trip(spark, frame, tmp_path, fmt):
    path = str(tmp_path / fmt)
    write_dataset(frame, path, fmt)
    res = read_dataset(spark, path, fmt, SCHEMA)
    assert rows(res.data) == rows(frame)
    if res.corrupt is not None:
        assert res.corrupt.count() == 0


def test_csv_corrupt_rows_quarantined(spark, tmp_path):
    d = tmp_path / "csvdir"
    d.mkdir()
    (d / "part-00000.csv").write_text(
        "id,name,score,ts\n"
        "1,a,1.5,2024-01-01 09:00:00\n"
        "oops,b,not_a_number,xx\n"
        "3,c,3.5,2024-01-03 09:00:00\n")
    res = read_dataset(spark, str(d), "csv", SCHEMA)
    assert res.data.count() == 2
    assert [r.id for r in res.data.orderBy("id").collect()] == [1, 3]
    corrupt = res.corrupt.collect()
    assert len(corrupt) == 1 and "oops" in corrupt[0][0]


def test_json_corrupt_rows_quarantined(spark, tmp_path):
    d = tmp_path / "jsondir"
    d.mkdir()
    (d / "part-00000.json").write_text(
        '{"id": 1, "name": "a", "score": 1.5}\n'
        'this is not json\n'
        '{"id": 2, "name": "b", "score": 2.5}\n')
    res = read_dataset(spark, str(d), "json", SCHEMA)
    assert res.data.count() == 2
    assert res.corrupt.count() == 1


def test_xml_corrupt_rows_quarantined(spark, tmp_path):
    d = tmp_path / "xmldir"
    d.mkdir()
    (d / "part-00000.xml").write_text(
        "<rows>"
        "<row><id>1</id><name>a</name><score>1.5</score></row>"
        "<row><id>bad</id><name>b</name><score>zzz</score></row>"
        "<row><id>3</id><name>c</name><score>3.5</score></row>"
        "</rows>")
    res = read_dataset(spark, str(d), "xml", SCHEMA)
    assert res.data.count() == 2
    assert [r.id for r in res.data.orderBy("id").collect()] == [1, 3]
    assert res.corrupt.count() == 1


def test_partitioned_write_prunes(spark, frame, tmp_path):
    path = str(tmp_path / "bydate")
    write_dataset(frame.withColumn("part", frame.id % 2), path, "parquet",
                  partition_by=["part"])
    assert os.path.isdir(f"{path}/part=0") and os.path.isdir(f"{path}/part=1")
    df = spark.read.parquet(path).where("part = 1")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(part" in plan
    assert sorted(r.id for r in df.collect()) == [1, 3]


def test_gzip_text_is_explicit(spark, frame, tmp_path):
    plain = str(tmp_path / "plain")
    gz = str(tmp_path / "gz")
    write_dataset(frame, plain, "csv")
    write_dataset(frame, gz, "csv", compress_text=True)
    assert not glob.glob(f"{plain}/*.gz")
    assert glob.glob(f"{gz}/*.csv.gz")


def test_unknown_format_rejected(spark, frame, tmp_path):
    with pytest.raises(ValueError, match="unsupported format"):
        write_dataset(frame, str(tmp_path / "x"), "avro")
    with pytest.raises(ValueError, match="unsupported format"):
        read_dataset(spark, str(tmp_path / "x"), "avro", SCHEMA)


def test_reader_does_not_mutate_caller_schema(spark, frame, tmp_path):
    """StructType.add mutates in place; read_dataset must copy before
    appending the corrupt column, or a reused schema object grows a
    phantom _corrupt_record field per call."""
    from pyspark.sql.types import StructType

    struct = StructType.fromDDL(SCHEMA)
    n_fields = len(struct.fields)
    path = str(tmp_path / "reuse")
    write_dataset(frame, path, "json")
    for _ in range(2):
        res = read_dataset(spark, path, "json", struct)
        assert res.data.count() == frame.count()
    assert len(struct.fields) == n_fields
    assert "_corrupt_record" not in [f.name for f in struct.fields]
