from mapreduce_rust_spark.plans.wordcount import wordcount, wordcount_files

__all__ = ["wordcount", "wordcount_files"]
