from mapreduce_rust_spark.streaming.jobs import (
    streaming_event_counts,
    streaming_wordcount,
)
from mapreduce_rust_spark.streaming.queries import (
    read_stream_table,
    run_available_now,
)

__all__ = [
    "read_stream_table",
    "run_available_now",
    "streaming_event_counts",
    "streaming_wordcount",
]
