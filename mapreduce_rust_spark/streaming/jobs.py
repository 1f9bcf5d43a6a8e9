"""Structured Streaming jobs — the streaming form of the engine's
batch operators (SURVEY.md §2c: the reference is batch-only; streams
are engine extension surface).

Each job is a function from a streaming DataFrame to a streaming
DataFrame, so the same logic binds to any source (kafka, file, rate,
memory) and sink. Tests drive them with in-memory sources and
``trigger(availableNow=True)``.

Scale notes: all stateful aggregations carry watermarks so state is
bounded and late data has defined semantics; keys are user_id/word —
high-cardinality, so state partitions evenly across executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mapreduce_rust_spark.functions.text import tokenize_whitespace


def streaming_wordcount(lines: DataFrame, text_col: str = "value") -> DataFrame:
    """The reference's wordcount as an incremental query: running
    word frequencies over an unbounded stream of lines. Complete/
    update output mode; Spark maintains the per-word state store."""
    return (
        lines.select(F.explode(tokenize_whitespace(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def streaming_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window event counts with a watermark: the streaming
    twin of the batch ``events_hourly`` query. Late rows beyond the
    watermark are dropped deterministically; state for closed windows
    is evicted — bounded memory at any throughput."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "cnt",
            "sum_value",
        )
    )
