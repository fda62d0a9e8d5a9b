"""Change-log and fixture-table sources.

The reference reads its versioned KV table through a distributed HBase
scan, one partition per region (``HBaseSnapshotter.scala:126-129``).  The
rebuild's source model is a **change-log DataFrame**
``(row_key, family, qualifier, value, cell_ts)`` — read from Parquet in
tests/benchmarks, or from any DataSource (an hbase-spark connector, a
Kafka CDC topic compacted to Parquet, …) in production.  Everything
downstream only sees the DataFrame, so the source swaps freely.

Scale notes: a production change log should be written date-partitioned
on ``cell_ts`` (e.g. ``dt=yyyy-MM-dd``) so the snapshot's ``cell_ts <= ts``
filter prunes whole partitions before any I/O; within files, Parquet
row-group min/max statistics prune further.  Both happen automatically
from the declarative filter — see ``operators.snapshot``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CHANGELOG_COLUMNS = ("row_key", "family", "qualifier", "value", "cell_ts")


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table (``TESTDATA.md``).

    ``events.ts`` is Parquet TIMESTAMP(NANOS), which Spark only reads
    via the nanos-as-long legacy conf; normalize it back to a proper
    (microsecond) TimestampType so downstream code sees the documented
    schema.  Nanosecond fractions are zero in the fixtures, so the
    ns→µs floor division is lossless.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes)["ts"] == "bigint":
            # integer division — `/` would round-trip through double and
            # lose sub-µs exactness (ns epoch values exceed 2^53)
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def read_changelog(spark: SparkSession, path: str) -> DataFrame:
    """Read a change-log table and validate its shape."""
    df = spark.read.parquet(path)
    missing = set(CHANGELOG_COLUMNS) - set(df.columns)
    if missing:
        raise ValueError(f"change log at {path} missing columns {sorted(missing)}")
    return df


def events_as_changelog(events: DataFrame) -> DataFrame:
    """Project the ``events`` fixture into change-log shape.

    Treats each event as a cell write: the user is the row key, the event
    type is the qualifier, the event value (stringified) is the cell
    value, and the event time (epoch millis) is the cell timestamp.  This
    gives a real, driver-provided dataset with genuine multi-version
    cells for snapshot queries that the DuckDB oracle can replay.
    """
    return events.select(
        F.col("user_id").cast("string").alias("row_key"),
        F.lit("d").alias("family"),
        F.col("event_type").alias("qualifier"),
        F.col("value").cast("string").alias("value"),
        F.unix_millis(F.col("ts")).alias("cell_ts"),
    )
