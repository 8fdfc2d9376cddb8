"""Source/sink tests: csv/json/parquet scans with declared schemas and
the reference-shaped JSON array sink (date formatting quirk included)."""

from __future__ import annotations

import datetime
import json

from pyspark.sql import Row
from pyspark.sql import functions as F

from openetlagent_spark.model import ColumnDefinition, FileDefinition, FileSchema
from openetlagent_spark.sources import save_data, scan_data
from openetlagent_spark.validate import validate_schema


def _fd(path: str, fmt: str, cols: dict[str, str], name: str = "t") -> FileDefinition:
    return FileDefinition(
        path=path,
        format=fmt,
        file_schema=FileSchema(name=name, columns={k: ColumnDefinition(type=v) for k, v in cols.items()}),
    )


def test_csv_scan_binds_by_name_not_position(spark, tmp_path):
    # File order differs from declared order — values must still land in
    # the right columns (Polars dtype-override-by-name semantics).
    p = tmp_path / "t.csv"
    p.write_text("b,a\n2,one\n4,two\n")
    fd = _fd(str(p), "csv", {"a": "string", "b": "integer"})
    rows = scan_data(spark, fd).orderBy("b").collect()
    assert [(r.a, r.b) for r in rows] == [("one", 2), ("two", 4)]


def test_csv_scan_extra_and_missing_columns(spark, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text("a,zz\nx,9\n")
    fd = _fd(str(p), "csv", {"a": "string", "missing_col": "integer"})
    df = scan_data(spark, fd)
    assert df.columns == ["a", "zz"]  # declared-present first, extras kept


def test_csv_scan_date_column(spark, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text("d\n2024-01-15\n")
    fd = _fd(str(p), "csv", {"d": "date"})
    assert scan_data(spark, fd).collect()[0].d == datetime.date(2024, 1, 15)


def test_json_scan_with_schema(spark, tmp_path):
    p = tmp_path / "t.json"
    p.write_text('{"a": "x", "n": 5}\n{"a": "y", "n": 6}\n')
    fd = _fd(str(p), "json", {"a": "string", "n": "integer"})
    rows = scan_data(spark, fd).orderBy("n").collect()
    assert [(r.a, r.n) for r in rows] == [("x", 5), ("y", 6)]


def test_json_array_sink_reference_shape(spark, tmp_path):
    # Reference JSON sink: single file, indented array of row objects,
    # dates as %Y-%m-%d strings (app/main.py:464-470).
    df = spark.createDataFrame(
        [Row(name="a", d=datetime.date(2024, 1, 15)), Row(name="b", d=datetime.date(2024, 2, 1))]
    )
    out = tmp_path / "out.json"
    fd = _fd(str(out), "json", {"name": "string", "d": "date"})
    save_data(df, fd, json_array=True)
    data = json.loads(out.read_text())
    assert sorted(data, key=lambda r: r["name"]) == [
        {"name": "a", "d": "2024-01-15"},
        {"name": "b", "d": "2024-02-01"},
    ]


def test_parquet_sink_roundtrip_with_projection(spark, tmp_path):
    df = spark.createDataFrame([Row(a=1, b="x", extra="drop-me")])
    out = str(tmp_path / "out_parquet")
    fd = _fd(out, "parquet", {"b": "string", "a": "integer"})
    save_data(df, fd)
    back = spark.read.parquet(out)
    assert back.columns == ["b", "a"]  # declared order, extras dropped
    assert back.collect()[0].b == "x"


def test_validate_schema_feedback(spark):
    df = spark.createDataFrame([Row(a=1)])
    fd = _fd("/nonexistent", "csv", {"a": "integer", "b": "string"})
    ok, feedback = validate_schema(df, fd)
    assert not ok and "Missing target column 'b'" in feedback[0]
    ok2, fb2 = validate_schema(df, _fd("/n", "csv", {"a": "string"}))
    assert not ok2 and "requires string" in fb2[0]
    ok3, _ = validate_schema(df, _fd("/n", "csv", {"a": "positive integer"}))
    assert ok3  # positivity never enforced (reference waiver)


def test_orc_sink_and_scan_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([Row(a=1, b="x"), Row(a=2, b="y")])
    out = str(tmp_path / "out_orc")
    fd = _fd(out, "orc", {"b": "string", "a": "integer"})
    save_data(df, fd)
    back = scan_data(spark, fd).orderBy("a").collect()
    assert [(r.b, r.a) for r in back] == [("x", 1), ("y", 2)]


def test_write_compacted_merges_small_partitions(spark, tmp_path):
    """A many-partition frame lands as FEW size-targeted files (AQE
    rebalance), not one file per input partition."""
    import glob

    from openetlagent_spark.sources import write_compacted

    df = spark.range(0, 10_000, 1, 64).withColumn("v", F.col("id") * 2)
    out = str(tmp_path / "compacted")
    write_compacted(df, out)
    files = glob.glob(f"{out}/part-*.parquet")
    assert 1 <= len(files) < 64, f"expected coalesced output, got {len(files)} files"


def test_write_compacted_partitioned_layout(spark, tmp_path):
    """partition_by co-locates each hive partition's rows: one file per
    partition directory instead of a sliver from every task."""
    import glob

    from openetlagent_spark.sources import write_compacted

    df = spark.range(0, 1_000, 1, 32).withColumn("bucket", (F.col("id") % 3).cast("string"))
    out = str(tmp_path / "compacted_hive")
    write_compacted(df, out, partition_by=["bucket"])
    for b in ("0", "1", "2"):
        files = glob.glob(f"{out}/bucket={b}/part-*.parquet")
        assert len(files) == 1, f"bucket={b}: expected 1 compacted file, got {len(files)}"


def test_text_scan_lines(spark, tmp_path):
    """format='text': one row per line, named by the single declared
    string column."""
    import pytest

    p = tmp_path / "corpus.txt"
    p.write_text("first line\nsecond line\n\nfourth\n")
    fd = _fd(str(p), "text", {"text": "string"})
    got = [r["text"] for r in scan_data(spark, fd).collect()]
    assert sorted(got) == sorted(["first line", "second line", "", "fourth"])
    with pytest.raises(ValueError, match="exactly one string"):
        scan_data(spark, _fd(str(p), "text", {"a": "string", "b": "string"}))
    with pytest.raises(ValueError, match="exactly one string"):
        scan_data(spark, _fd(str(p), "text", {"n": "integer"}))


def test_binary_scan_media_payloads(spark, tmp_path):
    """format='binary': binaryFile source — declared columns project
    from path/modificationTime/length/content; content carries the
    exact bytes for the multimodal stages."""
    import pytest

    payload = bytes(range(64))
    (tmp_path / "a.bin").write_bytes(payload)
    (tmp_path / "b.bin").write_bytes(payload[:10])
    fd = _fd(str(tmp_path), "binary", {"path": "string", "length": "integer",
                                       "content": "binary"})
    rows = {r["path"].rsplit("/", 1)[-1]: r for r in scan_data(spark, fd).collect()}
    assert set(rows) == {"a.bin", "b.bin"}
    assert bytes(rows["a.bin"]["content"]) == payload
    assert rows["b.bin"]["length"] == 10
    with pytest.raises(ValueError, match="none of the declared"):
        scan_data(spark, _fd(str(tmp_path), "binary", {"nope": "string"}))


def test_text_binary_are_input_only(spark, tmp_path):
    import pytest

    from openetlagent_spark.model import SpecError

    with pytest.raises(SpecError, match="format must be"):
        _fd(str(tmp_path), "avro", {"a": "string"})
    df = spark.createDataFrame([Row(text="x")])
    fd = _fd(str(tmp_path / "out"), "text", {"text": "string"})
    with pytest.raises(NotImplementedError, match="Unsupported output format"):
        save_data(df, fd)
