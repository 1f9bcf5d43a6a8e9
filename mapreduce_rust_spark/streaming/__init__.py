from mapreduce_rust_spark.streaming.jobs import (
    streaming_event_counts,
    streaming_wordcount,
)

__all__ = ["streaming_event_counts", "streaming_wordcount"]
