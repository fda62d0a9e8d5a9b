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


def read_table(
    spark: SparkSession, sf_dir: str, name: str, *, events_as_of_ms: int | None = None
) -> DataFrame:
    """Read one fixture table (``TESTDATA.md``).

    ``events.ts`` arrives in whatever physical Parquet form the fixture
    generator used — TIMESTAMP(NANOS) (readable only via the
    nanos-as-long legacy conf) or TIMESTAMP(MICROS) without timezone
    (read as TIMESTAMP_NTZ) — and is normalized to a proper
    session-timezone TimestampType so downstream code always sees the
    documented schema.  Both normalizations are lossless: nanosecond
    fractions are zero in the fixtures, and the NTZ→TZ cast under the
    UTC session maps wall-clock to the identical instant DuckDB's naive
    read produces.

    ``events_as_of_ms`` applies a snapshot time bound on the RAW column
    *before* the conversion — a predicate on the converted column is an
    expression and cannot reach the Parquet scan, while the raw-column
    comparison (against a constant-folded literal of the raw type)
    pushes down and prunes row groups.  Bound is ``cell_ts <= T`` under
    millis-floor semantics, i.e. ``ts < T+1ms``.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        ts_type = dict(df.dtypes)["ts"]
        want_bound = events_as_of_ms is not None and events_as_of_ms >= 0
        if ts_type == "bigint":  # TIMESTAMP(NANOS) via the legacy conf
            if want_bound:
                df = df.filter(F.col("ts") < F.lit((events_as_of_ms + 1) * 1_000_000))
            # integer division — `/` would round-trip through double and
            # lose sub-µs exactness (ns epoch values exceed 2^53)
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            if want_bound:
                bound = F.timestamp_millis(
                    F.lit(events_as_of_ms + 1)).cast("timestamp_ntz")
                df = df.filter(F.col("ts") < bound)
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        elif want_bound:
            df = df.filter(F.col("ts") < F.timestamp_millis(F.lit(events_as_of_ms + 1)))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def read_changelog(spark: SparkSession, path: str) -> DataFrame:
    """Read a change-log table and validate its shape."""
    df = spark.read.parquet(path)
    missing = set(CHANGELOG_COLUMNS) - set(df.columns)
    if missing:
        raise ValueError(f"change log at {path} missing columns {sorted(missing)}")
    return df


def events_as_changelog(events: DataFrame, *, as_of_ms: int | None = None) -> DataFrame:
    """Project the ``events`` fixture into change-log shape.

    Treats each event as a cell write: the user is the row key, the event
    type is the qualifier, the event value (stringified) is the cell
    value, and the event time (epoch millis) is the cell timestamp.  This
    gives a real, driver-provided dataset with genuine multi-version
    cells for snapshot queries that the DuckDB oracle can replay.

    ``as_of_ms`` applies the snapshot time bound on the RAW ``ts`` column
    — ``cell_ts`` is a derived expression, so a filter on it cannot reach
    the Parquet scan; the equivalent raw-column predicate pushes down and
    prunes row groups (and, on a date-partitioned log, whole partitions).
    The downstream ``snapshot_as_of`` filter on ``cell_ts`` is then a
    no-op re-check, keeping operator semantics source-independent.
    """
    if as_of_ms is not None and as_of_ms >= 0:
        # cell_ts floors ts to millis: cell_ts <= T  ⟺  ts < T+1ms
        events = events.filter(F.col("ts") < F.timestamp_millis(F.lit(as_of_ms + 1)))
    return events.select(
        F.col("user_id").cast("string").alias("row_key"),
        F.lit("d").alias("family"),
        F.col("event_type").alias("qualifier"),
        F.col("value").cast("string").alias("value"),
        F.unix_millis(F.col("ts")).alias("cell_ts"),
    )
