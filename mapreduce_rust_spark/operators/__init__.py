from mapreduce_rust_spark.operators.mapreduce import (
    MapReduceJob,
    flat_map,
    group_by_key,
    reduce_by_key,
    reduce_groups,
    union_merge,
)

__all__ = [
    "MapReduceJob",
    "flat_map",
    "group_by_key",
    "reduce_by_key",
    "reduce_groups",
    "union_merge",
]
