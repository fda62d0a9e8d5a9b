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


def test_run_snapshot_via_changelog_source(spark, changelog, schema_history, tmp_path):
    """format='changelog' in the config routes the pipeline through the
    region-split Python data source; the written table matches the
    parquet-path run exactly."""
    import glob
    import os
    import shutil

    raw = str(tmp_path / "raw")
    regions = str(tmp_path / "regions")
    os.makedirs(regions)
    changelog.repartition(2).write.parquet(raw)
    for i, part in enumerate(sorted(glob.glob(f"{raw}/part-*.parquet"))):
        shutil.copy(part, os.path.join(regions, f"region-{i}.parquet"))

    settings = SnapshotSettings(
        source_table=regions, sink_table="snap_pyds", timestamp=T2,
        mysql_schema_history="inline", source_format="changelog",
    )
    try:
        out = run_snapshot(spark, settings, history=schema_history)
        want = {tuple(r) for r in run_snapshot(
            spark, SnapshotSettings(
                source_table="unused", sink_table="snap_plain", timestamp=T2,
                mysql_schema_history="inline"),
            changelog=changelog, history=schema_history).collect()}
        assert {tuple(r) for r in out.collect()} == want
    finally:
        spark.sql("DROP TABLE IF EXISTS snap_pyds")
        spark.sql("DROP TABLE IF EXISTS snap_plain")


def test_config_rejects_unknown_source_format():
    import pytest as _pytest

    from hbase_snapshotter_spark.config import ConfigError

    with _pytest.raises(ConfigError, match="source_format"):
        SnapshotSettings(source_table="x", sink_table="y",
                         hbase_schema=["d:a:string"], source_format="kafka")
