"""Source/sink format breadth (N3/S12): the change-log model reads from
any DataSource; round-trip csv/json/orc and partitioned snapshot writes."""

import pytest

from hbase_snapshotter_spark.operators.snapshot import snapshot_as_of
from hbase_snapshotter_spark.queries.snapshot_q import events_snapshot_schema
from hbase_snapshotter_spark.sources.changelog import events_as_changelog, read_table
from hbase_snapshotter_spark.sources.warehouse import write_snapshot


@pytest.fixture(scope="module")
def log(spark, sf_dir):
    return events_as_changelog(read_table(spark, sf_dir, "events"))


@pytest.mark.parametrize("fmt", ["csv", "json", "orc"])
def test_changelog_roundtrip_any_format(spark, log, fmt, tmp_path):
    path = str(tmp_path / fmt)
    writer = log.write.mode("overwrite")
    if fmt == "csv":
        writer = writer.option("header", True)
    getattr(writer, fmt)(path)

    reader = spark.read
    if fmt == "csv":
        reader = reader.option("header", True).schema(log.schema)
    back = getattr(reader, fmt)(path)
    # snapshot over the round-tripped log matches the parquet original
    want = {tuple(r) for r in snapshot_as_of(log, events_snapshot_schema(), None).collect()}
    got = {tuple(r) for r in snapshot_as_of(back, events_snapshot_schema(), None).collect()}
    assert got == want


def test_partitioned_snapshot_write(spark, log, tmp_path):
    snap = snapshot_as_of(log, events_snapshot_schema(), None)
    write_snapshot(snap.withColumn("bucket", snap.k_hbase_row_key.substr(1, 1)),
                   "snap_part", partition_by=["bucket"])
    try:
        t = spark.table("snap_part")
        assert t.count() == snap.count()
        # partition pruning: filtering the partition column prunes files
        plan = t.filter(t.bucket == "1")._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters: [" in plan
    finally:
        spark.sql("DROP TABLE snap_part")
