from hbase_snapshotter_spark.streaming.windows import (  # noqa: F401
    replay_stream,
    session_window_agg,
    sliding_window_agg,
    streaming_dedup,
    tumbling_window_agg,
)
