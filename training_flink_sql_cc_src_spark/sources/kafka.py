"""Kafka + Avro source/sink builders (SURVEY.md §2.2: the reference's only
real transport — Avro-serialized topics behind Schema Registry,
terraform/lab-tables/main.tf:153-183, format AVRO at :173).

This container has no Kafka broker and no spark-avro artifact download, so
these helpers BUILD the reader/writer (options, watermark, key/value
projection) without starting it; construction is unit-tested, execution is
gated behind the import-try. On a real deployment the same code runs
unchanged given ``--packages org.apache.spark:spark-sql-kafka-0-10_2.13``.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

#: Spark simpleString → Avro primitive (the subset the lab schemas use;
#: terraform/lab-tables/main.tf:153-183 registers flat records of these).
_SPARK_TO_AVRO = {
    "string": "string",
    "int": "int",
    "bigint": "long",
    "float": "float",
    "double": "double",
    "boolean": "boolean",
    "binary": "bytes",
}


def avro_schema_json(record_name: str, schema: StructType) -> str:
    """Avro record schema for a flat Spark schema — the JSON handed to
    ``from_avro`` (and registered in Schema Registry on a real
    deployment). Nullable Spark fields become ["null", type] unions,
    exactly how Confluent's Avro converter emits optional fields."""
    fields = []
    for f in schema.fields:
        avro_t = _SPARK_TO_AVRO.get(f.dataType.simpleString())
        if avro_t is None:
            raise ValueError(f"no Avro mapping for {f.dataType.simpleString()}")
        fields.append(
            {"name": f.name, "type": ["null", avro_t] if f.nullable else avro_t}
        )
    return json.dumps(
        {"type": "record", "name": record_name, "fields": fields}
    )


def spark_avro_available(spark: SparkSession) -> bool:
    """True when the spark-avro connector is loaded. A functional probe,
    not Class.forName: Spark's spark-sql jar ships shim classes that
    exist only to raise AVRO_NOT_LOADED, so presence of the class proves
    nothing — analyzing a to_avro expression does."""
    try:
        from pyspark.sql.avro.functions import to_avro

        spark.range(1).select(
            to_avro(F.struct(F.lit(1).alias("x"))).alias("v")
        ).schema
        return True
    except Exception:
        return False


def kafka_reader(
    spark: SparkSession,
    bootstrap: str,
    topic: str,
    starting_offsets: str = "earliest",
):
    """Configured (unstarted) streaming reader for a topic — the
    stream-table source half of EP2."""
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )


def decode_avro_value(df: DataFrame, avro_schema_json: str) -> DataFrame:
    """Decode the Kafka value with from_avro (Schema Registry's wire format
    minus the 5-byte magic prefix, which ``substring(value, 6, ...)``
    strips in Confluent deployments). Raises ImportError if spark-avro is
    not on the classpath — callers gate on it."""
    try:
        from pyspark.sql.avro.functions import from_avro
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "spark-avro not available; add org.apache.spark:spark-avro to "
            "spark.jars.packages"
        ) from e
    return df.select(
        F.col("key").cast("string").alias("key"),
        from_avro(F.col("value"), avro_schema_json).alias("v"),
        F.col("timestamp").alias("kafka_ts"),
    ).select("key", "v.*", "kafka_ts")


def kafka_writer(df: DataFrame, bootstrap: str, topic: str, checkpoint: str):
    """Configured (unstarted) streaming writer — the INSERT INTO topic sink
    (S2/S4/S6). Value is JSON-serialized here; Avro needs to_avro from the
    same optional artifact."""
    payload = df.select(
        F.to_json(F.struct(*[F.col(c) for c in df.columns])).alias("value")
    )
    return (
        payload.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
    )
