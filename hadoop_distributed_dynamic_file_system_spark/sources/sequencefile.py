"""SequenceFile family (SURVEY §1.4, §2.1-2.2).

The reference's native container (io/SequenceFile.java:187, 3257 LoC of
sync markers, block compression, sorters). Spark reads/writes them via
the bundled Hadoop client on the RDD API — the ONE surface where RDDs
are the right tool (raw KV bytes parity). Native engine storage is
parquet; this module exists so a reference user's SequenceFile data
remains readable.

MapFile/SetFile/ArrayFile/BloomMapFile (io/MapFile.java etc.) map to
sorted parquet + min-max stats / bloom filters — see `sinks.py`
compaction and the parquet write options.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TEXT = "org.apache.hadoop.io.Text"
LONG = "org.apache.hadoop.io.LongWritable"
INT = "org.apache.hadoop.io.IntWritable"


def read_sequence_file(
    spark: SparkSession,
    path: str,
    key_class: str = TEXT,
    value_class: str = TEXT,
) -> DataFrame:
    """SequenceFileInputFormat: KV records → DataFrame(key, value).

    Writable→Python conversion is handled by Spark's sequenceFile
    deserializer (primitives + Text come back as str/int/float)."""
    rdd = spark.sparkContext.sequenceFile(path, key_class, value_class)
    return spark.createDataFrame(rdd, schema=["key", "value"])


def write_sequence_file(df: DataFrame, path: str) -> None:
    """SequenceFileOutputFormat: first column = key, second = value."""
    k, v = df.columns[0], df.columns[1]
    df.select(k, v).rdd.map(tuple).saveAsSequenceFile(path)


def read_sequence_file_as_text(spark: SparkSession, path: str) -> DataFrame:
    """SequenceFileAsTextInputFormat: stringify both sides."""
    rdd = spark.sparkContext.sequenceFile(path).map(
        lambda kv: (str(kv[0]), str(kv[1]))
    )
    return spark.createDataFrame(rdd, schema=["key", "value"])
