"""Config loading/validation/dispatch (S17) and the end-to-end snapshot
job (config → schema → snapshot → warehouse table), mirroring the
reference's entry path (Settings.scala, HBaseSnapshotter.main)."""

import json

import pytest

from hbase_snapshotter_spark.config import ConfigError, SnapshotSettings
from hbase_snapshotter_spark.pipeline import run_snapshot
from hbase_snapshotter_spark.plans.schema import KEY_COLUMN
from tests.conftest import T2


def test_from_json_mysql_shape(tmp_path):
    cfg = tmp_path / "app.json"
    cfg.write_text(json.dumps({
        "hbase": {"zookeeper_quorum": ["zk1"], "table": "/data/changelog",
                  "timestamp": 12345},
        "mysql": {"table": "/data/schema_history"},
        "hive": {"table": "warehouse.snapshot"},
    }))
    s = SnapshotSettings.from_json(cfg)
    assert s.source_table == "/data/changelog"
    assert s.mysql_schema_history == "/data/schema_history"
    assert s.timestamp == 12345


def test_from_json_hbase_shape_defaults_now():
    s = SnapshotSettings.from_json(json.dumps({
        "hbase": {"table": "t", "schema": ["d:a:integer", "d:b"]},
        "hive": {"table": "out"},
    }))
    assert s.timestamp == -1 and s.hbase_schema == ["d:a:integer", "d:b"]


@pytest.mark.parametrize("doc", [
    {"hbase": {"table": "t"}, "hive": {"table": "o"}},           # no schema source
    {"hbase": {"table": "t", "schema": ["d:a:integer"]},
     "mysql": {"table": "h"}, "hive": {"table": "o"}},            # both
    {"hive": {"table": "o"}},                                     # no source table
])
def test_invalid_configs_rejected(doc):
    with pytest.raises(ConfigError):
        SnapshotSettings.from_json(json.dumps(doc))


def test_explicit_schema_two_part_defaults_string():
    s = SnapshotSettings(source_table="t", sink_table="o",
                         hbase_schema=["d:a:integer", "d:b"])
    schema = s.resolve_schema()
    assert schema["a"].dataType.typeName() == "integer"
    assert schema["b"].dataType.typeName() == "string"
    assert schema.fields[0].name == KEY_COLUMN


def test_run_snapshot_end_to_end(spark, changelog, schema_history, tmp_path):
    settings = SnapshotSettings(
        source_table="unused", sink_table="snap_t2", timestamp=T2,
        mysql_schema_history="inline",
    )
    out = run_snapshot(spark, settings, changelog=changelog, history=schema_history)
    assert out.count() == 3
    # the sink table exists in the catalog with identical contents
    persisted = spark.table("snap_t2")
    assert persisted.count() == 3
    assert [f.name for f in persisted.schema.fields][:2] == \
        [KEY_COLUMN, "k_replicator_row_status"]
    spark.sql("DROP TABLE snap_t2")


def test_cli_main_end_to_end(spark, changelog, schema_history, tmp_path):
    """python -m hbase_snapshotter_spark <config.json> — the reference's
    launcher path (bin/hbase-snapshotter) driven through main()."""
    from hbase_snapshotter_spark.__main__ import main

    log_path = str(tmp_path / "changelog")
    hist_path = str(tmp_path / "history")
    changelog.write.parquet(log_path)
    schema_history.write.parquet(hist_path)
    cfg = tmp_path / "app.json"
    cfg.write_text(json.dumps({
        "hbase": {"table": log_path, "timestamp": T2},
        "mysql": {"table": hist_path},
        "hive": {"table": "cli_snap"},
    }))
    try:
        assert main([str(cfg)]) == 0
        assert spark.table("cli_snap").count() == 3
    finally:
        spark.sql("DROP TABLE IF EXISTS cli_snap")
