import os

import pytest
from pyspark.sql import SparkSession

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

# The in-query recall probes are part of the correctness surface under
# test; a stray SPARK_GRAFT_RECALL_PROBE=0 inherited from a bench shell
# must not vacuously green the approximate-path assertions.
os.environ["SPARK_GRAFT_RECALL_PROBE"] = "1"


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("hbase-snapshotter-spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .config("spark.sql.session.timeZone", "UTC")
        # same session prep the registry wrapper applies — tests that
        # call unwrapped query fns still get Arrow UDTF execution
        .config("spark.sql.execution.pythonUDTF.arrow.enabled", "true")
        .getOrCreate()
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


# ---- synthesized snapshot-semantics fixtures (FIXTURES.md §B) ----

# Timestamps (epoch millis). T0 < T1 < T2.
T0, T1, T2 = 1_000, 2_000, 3_000

# B1 change log: cell-granular versions. Pins:
# - a row whose latest version <= T differs across T's (r1 amount)
# - different qualifiers of one row_key last-updated at different times
#   (r1: name@1500 vs amount@2500 → a T2 row mixes cell versions)
# - "NULL" sentinel in both cases (r2 name)
# - an unsigned-int value exceeding int32 (r1 big_id)
# - a deleted row (r3 row_status=D)
CHANGELOG_ROWS = [
    # (row_key, family, qualifier, value, cell_ts)
    ("r1", "d", "row_status", "I", 500),
    ("r1", "d", "name", "alpha", 500),
    ("r1", "d", "amount", "10.5", 500),
    ("r1", "d", "big_id", "3000000000", 500),
    ("r1", "d", "created", "1000", 500),          # epoch-millis string
    ("r1", "d", "name", "alpha2", 1500),          # updated between T0 and T1
    ("r1", "d", "row_status", "U", 2500),
    ("r1", "d", "amount", "99.25", 2500),         # updated between T1 and T2
    ("r2", "d", "row_status", "I", 800),
    ("r2", "d", "name", "NULL", 800),             # sentinel, upper
    ("r2", "d", "amount", "7.0", 800),
    ("r2", "d", "big_id", "42", 800),
    ("r2", "d", "created", "2000", 800),
    ("r2", "d", "name", "beta", 2600),
    ("r2", "d", "amount", "null", 2600),          # sentinel, lower
    ("r3", "d", "row_status", "I", 2700),
    ("r3", "d", "name", "gamma", 2700),
    ("r3", "d", "amount", "1.25", 2700),
    ("r3", "d", "row_status", "D", 2900),         # deletion marker
    # column added after T1's schema (extra ignored unless schema has it)
    ("r1", "d", "note", "added-late", 2800),
]

SCHEMA_V0 = {
    "mytable": {
        "columnIndexToNameMap": {"0": "name", "1": "amount", "2": "big_id"},
        "columnsSchema": {
            "name": {"columnType": "varchar(255)"},
            "amount": {"columnType": "double"},
            "big_id": {"columnType": "int(10) unsigned"},
        },
    }
}
# adds `created` timestamp column
SCHEMA_V1 = {
    "mytable": {
        "columnIndexToNameMap": {
            "0": "name", "1": "amount", "2": "big_id", "3": "created",
        },
        "columnsSchema": {
            "name": {"columnType": "varchar(255)"},
            "amount": {"columnType": "double"},
            "big_id": {"columnType": "int(10) unsigned"},
            "created": {"columnType": "timestamp"},
        },
    }
}
# changes big_id type and adds `note`
SCHEMA_V2 = {
    "mytable": {
        "columnIndexToNameMap": {
            "0": "name", "1": "amount", "2": "big_id", "3": "created",
            "4": "note",
        },
        "columnsSchema": {
            "name": {"columnType": "varchar(255)"},
            "amount": {"columnType": "decimal(10,2)"},
            "big_id": {"columnType": "bigint unsigned"},
            "created": {"columnType": "timestamp"},
            "note": {"columnType": "text"},
        },
    }
}


@pytest.fixture(scope="session")
def changelog(spark):
    return spark.createDataFrame(
        CHANGELOG_ROWS, "row_key string, family string, qualifier string, value string, cell_ts long"
    )


@pytest.fixture(scope="session")
def schema_history(spark):
    import json

    rows = [
        ("initial-snapshot", 400, json.dumps(SCHEMA_V0)),
        ("1800", 1800, json.dumps(SCHEMA_V1)),
        ("2850", 2850, json.dumps(SCHEMA_V2)),
    ]
    return spark.createDataFrame(
        rows, "change_key string, cell_ts long, schema_json string"
    )
