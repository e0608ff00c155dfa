"""Kafka source (SURVEY.md §2.1 S10 — pom-declared stretch item).

The reference module declares a Kafka 0.8 consumer example jar whose
source is absent from the fork (``pom.xml:53-57,496``). The capability it
advertises — consume a topic as a record stream — maps directly to
Spark's first-party connector: ``readStream.format("kafka")``.

This container ships no Kafka broker and no
``spark-sql-kafka-0-10`` connector jar, so construction is gated:
``kafka_available()`` probes for the data source and
``kafka_json_stream`` raises a clear, actionable error instead of the
connector's opaque ClassNotFound. The wiring itself — options, key/value
projection, JSON decode into a typed struct — is the production shape and
is what the contract test pins down.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StructType

#: Jar-name fragments that make up a working Kafka connector classpath.
_KAFKA_JAR_MARKERS = (
    "spark-sql-kafka",
    "spark-token-provider-kafka",
    "kafka-clients",
    "commons-pool2",
)


def find_kafka_jars() -> list[str]:
    """Probe the deployment's well-known jar locations for a Kafka
    connector: ``$SPARK_GRAFT_KAFKA_JARS`` (colon-separated files or
    directories — the operator-provided override), then
    ``$SPARK_HOME/jars``. Returns absolute jar paths (empty when the
    container ships no connector, this repo's default environment).

    ``session.get_spark`` feeds these into ``spark.jars`` at build time,
    so dropping the connector jars into either location auto-enables
    ``kafka_json_stream`` — and the live test gated on
    ``kafka_available`` — with no code change.
    """
    roots: list[str] = []
    env = os.environ.get("SPARK_GRAFT_KAFKA_JARS", "")
    roots += [p for p in env.split(":") if p]
    spark_home = os.environ.get("SPARK_HOME")
    if spark_home:
        roots.append(os.path.join(spark_home, "jars"))
    jars: list[str] = []
    for root in roots:
        if os.path.isfile(root) and root.endswith(".jar"):
            jars.append(os.path.abspath(root))
            continue
        if os.path.isdir(root):
            for name in sorted(os.listdir(root)):
                if name.endswith(".jar") and any(
                    m in name for m in _KAFKA_JAR_MARKERS
                ):
                    jars.append(os.path.abspath(os.path.join(root, name)))
    # pyspark's own jar dir is already on the classpath — only report
    # jars Spark would NOT pick up on its own.
    try:
        import pyspark

        builtin = os.path.join(os.path.dirname(pyspark.__file__), "jars")
        jars = [j for j in jars if os.path.dirname(j) != builtin]
    except Exception:
        pass
    return jars


def kafka_available(spark: SparkSession) -> bool:
    """True if the spark-sql-kafka connector is on the classpath."""
    try:
        # Class.forName rather than attribute access: py4j resolves missing
        # classes to a lazy JavaPackage without raising.
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False


def kafka_json_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    schema: StructType | str,
    starting_offsets: str = "latest",
) -> DataFrame:
    """Unbounded stream of JSON records from a Kafka topic.

    Output columns: the fields of ``schema`` (parsed from the message
    value) plus ``_key`` (string), ``_topic``, ``_partition``, ``_offset``,
    ``_kafka_ts`` — the metadata the reference's consumer exposes.

    Raises RuntimeError with install guidance when the connector is not
    on the classpath (this container), so callers can gate cleanly.
    """
    if not kafka_available(spark):
        raise RuntimeError(
            "Kafka connector not on classpath: start Spark with "
            "--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version> "
            "to use kafka_json_stream"
        )
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return decode_kafka_records(raw, schema)


#: The exact output schema of ``readStream.format("kafka").load()`` —
#: what :func:`decode_kafka_records` consumes and what the stub source
#: reproduces.
KAFKA_WIRE_SCHEMA = (
    "key binary, value binary, topic string, partition int, offset long, "
    "timestamp timestamp, timestampType int"
)


def kafka_wire_stub_stream(spark: SparkSession, directory: str) -> DataFrame:
    """File-backed stand-in for the connector's ``load()``: streams
    parquet files carrying the connector's exact wire schema
    (:data:`KAFKA_WIRE_SCHEMA`), one micro-batch per file.

    This is the broker-less integration path: a producer-side test writes
    wire-shaped batches (binary key/value, topic/partition/offset
    metadata), and everything downstream of ``load()`` — decode,
    projection, windowing, aggregation — runs end-to-end as a real
    Structured Streaming query. Swapping this source for
    ``kafka_json_stream`` is a one-line change, which is the point: the
    pipeline is connector-agnostic past the wire schema.
    """
    return (
        spark.readStream.schema(KAFKA_WIRE_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(directory)
    )


def decode_kafka_records(raw: DataFrame, schema: StructType | str) -> DataFrame:
    """Decode the connector's wire schema (binary key/value + topic/
    partition/offset/timestamp) into typed records. Split out from
    :func:`kafka_json_stream` so the projection is testable against a
    Kafka-SHAPED DataFrame without a broker — the only untested remainder
    is the connector's own ``load()``."""
    return raw.select(
        F.from_json(F.col("value").cast("string"), schema).alias("_rec"),
        F.col("key").cast("string").alias("_key"),
        F.col("topic").alias("_topic"),
        F.col("partition").alias("_partition"),
        F.col("offset").alias("_offset"),
        F.col("timestamp").alias("_kafka_ts"),
    ).select("_rec.*", "_key", "_topic", "_partition", "_offset", "_kafka_ts")
