"""Python DataSource tests: format('cosmo-sms') through the reader API."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cosmo_spark.sources.sms_datasource import register
from tests.test_sms import HEADER, row, write_sms


@pytest.fixture()
def registered(spark):
    register(spark)
    return spark


def test_datasource_reads_typed_rows(registered, tmp_path):
    write_sms(tmp_path, "181137c2.txt", [row(), row(exp="DQ01K02", root="ld1ce4dm")])
    write_sms(tmp_path, "181150a1.txt", [row(exp="DQ02K01", cen=0, osm2="MIRRORA")])
    df = registered.read.format("cosmo-sms").load(str(tmp_path))
    rows = df.orderBy("EXPOSURE").collect()
    assert len(rows) == 3
    r = rows[0]
    assert r.EXPOSURE == "DQ01K01" and r.PROPOSID == 14440
    assert r.FPPOS == 2 and r.FILEID == "181137c2"
    assert df.schema["EXPTIME"].dataType.simpleString() == "double"
    # matches the regexp-pipeline source row for row (same grammar)
    from cosmo_spark.sources.sms import parse_sms_reports

    alt = parse_sms_reports(registered, str(tmp_path))
    assert sorted(map(repr, df.collect())) == sorted(map(repr, alt.select(df.columns).collect()))


def test_datasource_parallelism_is_per_file(registered, tmp_path):
    for i in range(4):
        write_sms(tmp_path, f"18115{i}a1.txt", [row(exp=f"DQ0{i}K01")])
    df = registered.read.format("cosmo-sms").load(str(tmp_path))
    assert df.rdd.getNumPartitions() == 4


def test_datasource_pushes_filters_post_scan(registered, tmp_path):
    write_sms(tmp_path, "181137c2.txt", [row(), row(exp="DQ01K02", det="NUV")])
    df = registered.read.format("cosmo-sms").load(str(tmp_path))
    assert df.filter(F.col("DETECTOR") == "NUV").count() == 1


def test_datasource_streaming_incremental(registered, tmp_path):
    """Streaming reader: only newly arrived files are emitted per batch;
    the offset (seen-file set) is checkpointed."""
    sms = tmp_path / "sms"
    sms.mkdir()
    ckpt = tmp_path / "ck"
    sink = tmp_path / "out"
    write_sms(sms, "181137c2.txt", [row()])

    def run():
        stream = registered.readStream.format("cosmo-sms").load(str(sms))
        q = (
            stream.writeStream.format("parquet").option("path", str(sink))
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)

    run()
    assert registered.read.parquet(str(sink)).count() == 1

    write_sms(sms, "181150a1.txt", [row(exp="DQ02K01"), row(exp="DQ02K02")])
    run()
    df = registered.read.parquet(str(sink))
    assert df.count() == 3  # 1 old + 2 new, old file NOT re-emitted
    assert df.filter("FILEID = '181150a1'").count() == 2

    run()  # no new files -> no new rows
    assert registered.read.parquet(str(sink)).count() == 3


def test_datasource_malformed_raises(registered, tmp_path):
    (tmp_path / "181137c2.txt").write_text(HEADER + "garbage\n")
    df = registered.read.format("cosmo-sms").load(str(tmp_path))
    with pytest.raises(Exception, match="malformed SMS line"):
        df.collect()
