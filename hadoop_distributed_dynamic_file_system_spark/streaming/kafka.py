"""Kafka source/sink surface for Structured Streaming.

The reference has no message-bus ingestion; this is the additive
scale path: the same streaming plans that run over the file source in
tests (`events.py`) run over Kafka in production by swapping the
reader. This module is the config surface — option normalization,
checkpoint-dir conventions, and the wire-format decode helpers that
are testable WITHOUT a broker (Kafka rows are just a fixed schema:
key/value binary + topic/partition/offset/timestamp).

The kafka connector jar (spark-sql-kafka) ships separately from
pyspark; `read_kafka_stream` raises a clear error when it's absent.

Scale notes: one Spark input partition per Kafka topic-partition —
parallelism is capped by the topic's partition count, so `minPartitions`
exists to split further for expensive per-record work.
`maxOffsetsPerTrigger` bounds micro-batch size (backpressure);
`failOnDataLoss=false` tolerates aged-out offsets on replay.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# The fixed schema every kafka source row carries (key/value are bytes;
# decode is explicit and app-level, mirroring Kafka's own contract).
KAFKA_ROW_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType()),
        T.StructField("value", T.BinaryType()),
        T.StructField("topic", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("timestampType", T.IntegerType()),
    ]
)


def kafka_options(
    bootstrap_servers: str,
    topics: list[str] | None = None,
    subscribe_pattern: str | None = None,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
    min_partitions: int | None = None,
    fail_on_data_loss: bool = False,
) -> dict[str, str]:
    """Normalize connection/subscription settings into the connector's
    option strings. Exactly one of `topics` / `subscribe_pattern`."""
    if (topics is None) == (subscribe_pattern is None):
        raise ValueError("exactly one of topics or subscribe_pattern required")
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "startingOffsets": starting_offsets,
        "failOnDataLoss": "true" if fail_on_data_loss else "false",
    }
    if topics is not None:
        opts["subscribe"] = ",".join(topics)
    else:
        opts["subscribePattern"] = subscribe_pattern  # type: ignore[assignment]
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    if min_partitions is not None:
        opts["minPartitions"] = str(min_partitions)
    return opts


def read_kafka_stream(spark: SparkSession, **kwargs) -> DataFrame:
    """readStream over Kafka with normalized options (see
    `kafka_options` for kwargs). Pipe the result through
    `decode_json_values` (or `decode_string_values`) before the
    event-time logic in `events.py`."""
    opts = kafka_options(**kwargs)
    try:
        return spark.readStream.format("kafka").options(**opts).load()
    except Exception as e:  # connector jar not on the classpath
        if "Failed to find data source: kafka" in str(e):
            raise RuntimeError(
                "kafka connector not available: add the spark-sql-kafka "
                "package (--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>)"
            ) from e
        raise


def decode_string_values(df: DataFrame) -> DataFrame:
    """bytes → utf-8 strings for key/value; keeps source metadata."""
    return df.withColumn("key", F.col("key").cast("string")).withColumn(
        "value", F.col("value").cast("string")
    )


def decode_json_values(df: DataFrame, schema: T.StructType | str) -> DataFrame:
    """Parse the value bytes as JSON into typed columns; malformed
    records yield NULL fields (PERMISSIVE) instead of failing the
    stream — SkipBadRecords' streaming twin. Source metadata
    (topic/partition/offset) rides along for lineage/debug."""
    return df.select(
        F.col("key").cast("string").alias("key"),
        F.from_json(F.col("value").cast("string"), schema).alias("v"),
        "topic",
        "partition",
        "offset",
        F.col("timestamp").alias("kafka_ts"),
    ).select("key", "v.*", "topic", "partition", "offset", "kafka_ts")


def checkpoint_dir(base: str, job_name: str, version: int = 1) -> str:
    """Checkpoint location convention: <base>/<job>/v<version>.

    The version segment exists because a checkpoint pins the stateful
    plan — changing watermarks, stateful operators, or the shuffle
    partition count needs a NEW checkpoint (bump the version) while the
    old one stays for rollback. Offsets re-read from Kafka per
    startingOffsets; sinks must be idempotent across the cutover."""
    return os.path.join(base, job_name, f"v{version}")
