"""Structured Streaming operators (SURVEY §2.3 N17).

The reference declared a spark-streaming dependency but never used it
(``build.sbt:19``, no imports); this module supplies the streaming
surface a continuous snapshot pipeline needs.  Every operator below is
written against a plain DataFrame, so the SAME function serves batch
(oracle-checkable by DuckDB) and streaming (``readStream`` input) —
batch-equivalence is the test strategy for windowed semantics.

Scale notes: streaming state lives in the state store keyed by
(group, window); watermarks bound it — without one, session/dedup state
grows forever.  ``dropDuplicatesWithinWatermark`` keys state by the
dedup columns only (not event time), the right choice when duplicate
arrival spread is bounded.

``applyInPandasWithState`` is the custom-stateful surface here; Spark
4's newer ``transformWithStateInPandas`` needs the protobuf package for
its state-server protocol, which this environment does not ship — the
operator shape (per-key state + Arrow batches) is identical, so
migrating is a signature change, not a redesign.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout


def replay_stream(spark, path: str, schema, *, max_files_per_trigger: int = 1) -> DataFrame:
    """File-source replay of a parquet directory as a stream — the
    standard backfill/replay harness (one file per micro-batch)."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


#: kwargs that are TRIGGER settings, not writer options.  start()
#: swallows unknown kwargs as inert options, so passing
#: ``availableNow=True`` straight through silently leaves the default
#: processing-time trigger running — the query then never terminates
#: and every ``awaitTermination(t)`` burns its full timeout.
_TRIGGER_KWARGS = ("availableNow", "once", "processingTime", "continuous")


def start_foreach_batch(stream_df: DataFrame, process_batch, **start_kwargs):
    """Start a ``foreachBatch`` maintenance query, routing trigger
    kwargs (``availableNow``/``once``/``processingTime``/``continuous``)
    to ``.trigger(...)`` and everything else to ``.start(...)`` — the
    shared starter for the state-maintainer modules."""
    trigger = {k: start_kwargs.pop(k)
               for k in _TRIGGER_KWARGS if k in start_kwargs}
    writer = (stream_df.writeStream.foreachBatch(process_batch)
              .outputMode("update"))
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start(**start_kwargs)


def _flatten_window(df: DataFrame) -> DataFrame:
    """window struct → flat window_start / window_end columns (stable,
    oracle-comparable output shape)."""
    rest = [c for c in df.columns if c not in ("window", "session_window")]
    struct = "session_window" if "session_window" in df.columns else "window"
    return df.select(
        F.col(f"{struct}.start").alias("window_start"),
        F.col(f"{struct}.end").alias("window_end"),
        *rest,
    )


def tumbling_window_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    group_cols: list[str],
    aggs: list[Column],
    *,
    watermark: str | None = None,
) -> DataFrame:
    """Fixed windows: groupBy(window(ts, d), keys).agg(...).  With a
    watermark (streaming), late rows beyond it are dropped and windows
    finalize; in batch the same expression is exact."""
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    out = df.groupBy(F.window(F.col(ts_col), duration), *group_cols).agg(*aggs)
    return _flatten_window(out)


def sliding_window_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    group_cols: list[str],
    aggs: list[Column],
    *,
    watermark: str | None = None,
) -> DataFrame:
    """Overlapping windows — each row lands in duration/slide windows."""
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    out = df.groupBy(F.window(F.col(ts_col), duration, slide), *group_cols).agg(*aggs)
    return _flatten_window(out)


def session_window_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    group_cols: list[str],
    aggs: list[Column],
    *,
    watermark: str | None = None,
) -> DataFrame:
    """Gap-based sessions: a session ends after ``gap`` of inactivity;
    window end = last event + gap (Spark session_window semantics)."""
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    out = df.groupBy(F.session_window(F.col(ts_col), gap), *group_cols).agg(*aggs)
    return _flatten_window(out)


def interval_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    *,
    left_ts: str,
    right_ts: str,
    watermark: str,
    within: str,
) -> DataFrame:
    """Stream-stream inner join: match right rows to left rows with the
    same key whose event time falls in ``[left_ts, left_ts + within]``.

    The time-interval condition is what makes a stream-stream join
    feasible: it tells the engine exactly how long each side's rows can
    still match, so join state is purged as the watermark advances —
    without it, both sides' state grows forever.  In batch the same
    expression is an ordinary equi-join with a range residual (the
    binned form in :mod:`~.operators.rangejoin` is its skew-proof
    cousin); batch-vs-streaming equivalence is the test.
    """
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[key] == rw[key])
        & (rw[right_ts] >= lw[left_ts])
        & (rw[right_ts] <= F.expr(f"{left_ts} + INTERVAL {within}"))
    )
    return lw.join(rw, cond)


def streaming_dedup(
    df: DataFrame, dedup_cols: list[str], ts_col: str, watermark: str
) -> DataFrame:
    """Stateful exact dedup for streams: keeps the first arrival per key,
    with state expiring ``watermark`` after arrival."""
    return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(dedup_cols)


def running_max_trace(
    df: DataFrame,
    key_col: str,
    value_col: str,
    ts_col: str,
    duration: str = "1 hour",
) -> DataFrame:
    """BATCH shadow of :func:`running_max_per_key`'s state trajectory,
    sampled at window boundaries: for each (key, window) the cumulative
    max of ``value_col`` over all events at-or-before that window —
    i.e. what the stateful operator's state WOULD read if the stream
    replayed one window per micro-batch.  Fully SQL-replayable (the
    driver-checked form; the real ``applyInPandasWithState`` run is
    pinned equivalent by ``tests/test_streaming.py``: its final emitted
    state per key equals this trace's last row).

    Two cheap stages: an hourly pre-aggregation (map-side partials —
    the window function then sorts WINDOWS per key, not events), then a
    cumulative max over the per-key window sequence."""
    from pyspark.sql import Window

    hourly = (
        df.groupBy(F.window(F.col(ts_col), duration), key_col)
        .agg(F.max(value_col).alias("window_max"))
    )
    w = (Window.partitionBy(key_col).orderBy(F.col("window.start"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    out = hourly.withColumn("running_max", F.max("window_max").over(w))
    return _flatten_window(out).select(
        "window_start", "window_end", key_col, "window_max", "running_max")


def running_max_per_key(df: DataFrame, key_col: str, value_col: str, ts_col: str,
                        watermark: str) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: emits, per
    micro-batch and key, the running max seen so far — the shape of any
    per-key accumulator (counters, HLL sketches, model state)."""
    import pandas as pd

    out_schema = f"{key_col} long, running_max double"
    state_schema = "m double"

    def update(key, pdfs, state):
        m = state.get[0] if state.exists else float("-inf")
        for pdf in pdfs:
            if len(pdf):
                m = max(m, float(pdf[value_col].max()))
        state.update((m,))
        yield pd.DataFrame({key_col: [key[0]], "running_max": [m]})

    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            update, out_schema, state_schema, "Update", GroupStateTimeout.NoTimeout
        )
    )
