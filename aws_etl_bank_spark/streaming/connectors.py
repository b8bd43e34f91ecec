"""Broker-style streaming-source dispatch.

The reference's ``getStreamingSource`` abstracts broker sources behind a
connection_type + options dict (reference glue-jobs/awsglue/context.py:122-147,
streaming_data_source.py:16-28).  This module maps those option dicts onto
Structured Streaming's source options so the same call shape drives
``readStream.format("kafka")`` or the public aws-kinesis connector's
``format("aws-kinesis")`` on a real cluster.

Sandbox note: the Kafka connector jar (spark-sql-kafka) is not present in
this container, so only file-backed sources are *executable* here; the
dispatch + option mapping is pure and unit-tested, and ``.load()`` on a
broker source will raise Spark's missing-data-source error until the
connector package is on the classpath.
"""

from __future__ import annotations

#: connection_types routed to readStream.format(...) with mapped options
BROKER_TYPES = ("kafka", "kinesis")

#: connection_types that would need a third-party connector we do not ship
UNSUPPORTED_BROKER_TYPES = ()

#: Glue-style option name → Spark kafka-source option name.  Options already
#: carrying their Spark name pass through unchanged.
_KAFKA_OPTION_MAP = {
    "bootstrap.servers": "kafka.bootstrap.servers",
    "connectionName": None,  # catalog-connection indirection: no Spark analogue
    "topicName": "subscribe",
    "topic": "subscribe",
    "security.protocol": "kafka.security.protocol",
    "ssl.truststore.location": "kafka.ssl.truststore.location",
    "ssl.truststore.password": "kafka.ssl.truststore.password",
    "ssl.keystore.location": "kafka.ssl.keystore.location",
    "ssl.keystore.password": "kafka.ssl.keystore.password",
    "sasl.mechanism": "kafka.sasl.mechanism",
    "sasl.jaas.config": "kafka.sasl.jaas.config",
    # format concerns handled downstream of the source, not by the reader
    "classification": None,
    "delimiter": None,
}

#: Spark kafka-source options accepted verbatim
_KAFKA_PASSTHROUGH = {
    "subscribe", "subscribePattern", "assign", "startingOffsets",
    "endingOffsets", "maxOffsetsPerTrigger", "minPartitions",
    "failOnDataLoss", "includeHeaders", "groupIdPrefix",
    "kafka.bootstrap.servers",
}


def map_kafka_options(options: dict) -> dict:
    """Glue-style kafka connection options → Spark kafka-source options."""
    mapped: dict = {}
    for k, v in options.items():
        if k in _KAFKA_OPTION_MAP:
            spark_key = _KAFKA_OPTION_MAP[k]
            if spark_key is not None:
                mapped[spark_key] = v
        elif k in _KAFKA_PASSTHROUGH or k.startswith("kafka."):
            mapped[k] = v
        # unknown keys are dropped rather than passed to the connector,
        # which rejects unrecognized options at stream start
    if "subscribe" not in mapped and "subscribePattern" not in mapped \
            and "assign" not in mapped:
        raise ValueError(
            "kafka streaming source needs one of topicName/subscribe/"
            "subscribePattern/assign in connection_options"
        )
    if "kafka.bootstrap.servers" not in mapped:
        raise ValueError(
            "kafka streaming source needs bootstrap.servers in "
            "connection_options"
        )
    return mapped


#: Glue-style option name → aws-kinesis connector option name (the public
#: spark-streaming-sql-kinesis-connector registers format "aws-kinesis"
#: and takes "kinesis."-prefixed reader options).  None → no analogue.
_KINESIS_OPTION_MAP = {
    "streamName": "kinesis.streamName",
    "endpointUrl": "kinesis.endpointUrl",
    "startingPosition": "kinesis.startingPosition",
    "awsSTSRoleARN": "kinesis.stsRoleArn",
    "awsSTSSessionName": "kinesis.stsSessionName",
    # NOTE: unit change — Glue's value is milliseconds, the connector's is
    # seconds per shard; map_kinesis_options converts (ceil, min 1s).
    "maxFetchTimeInMs": "kinesis.maxFetchTimePerShardSec",
    "maxFetchRecordsPerShard": "kinesis.maxFetchRecordsPerShard",
    # format concerns handled downstream of the source, not by the reader
    "classification": None,
    "delimiter": None,
}


def map_kinesis_options(options: dict) -> dict:
    """Glue-style kinesis connection options → aws-kinesis source options.

    ``streamARN`` (the reference's preferred addressing,
    ``arn:aws:kinesis:<region>:<acct>:stream/<name>``) resolves to the
    stream name and region; explicit ``streamName`` wins if both given.
    """
    mapped: dict = {}
    arn = options.get("streamARN")
    if arn:
        mapped["kinesis.streamName"] = str(arn).rsplit("/", 1)[-1]
        parts = str(arn).split(":")
        if len(parts) >= 4 and parts[3]:
            mapped["kinesis.region"] = parts[3]
    for k, v in options.items():
        if k == "streamARN":
            continue
        if k in _KINESIS_OPTION_MAP:
            spark_key = _KINESIS_OPTION_MAP[k]
            if spark_key is not None:
                mapped[spark_key] = v
        elif k.startswith("kinesis."):
            mapped[k] = v
        # unknown keys are dropped rather than passed to the connector,
        # which rejects unrecognized options at stream start
    if "kinesis.maxFetchTimePerShardSec" in mapped:
        # Glue option is milliseconds; the aws-kinesis connector wants
        # seconds per shard.  Round up so small values stay a usable 1s.
        ms = int(mapped["kinesis.maxFetchTimePerShardSec"])
        mapped["kinesis.maxFetchTimePerShardSec"] = max(1, -(-ms // 1000))
    if "kinesis.startingPosition" in mapped:
        pos = str(mapped["kinesis.startingPosition"])
        up = pos.upper()
        if up in ("LATEST", "TRIM_HORIZON"):
            # canonicalize known enum spellings only
            mapped["kinesis.startingPosition"] = up
        elif up == "EARLIEST":
            # Glue accepts 'earliest'; the connector's spelling is
            # TRIM_HORIZON (same semantics: oldest available record)
            mapped["kinesis.startingPosition"] = "TRIM_HORIZON"
        else:
            # timestamp form (AT_TIMESTAMP semantics): pass through
            # unmodified — uppercasing would corrupt tz names and any
            # non-ISO timestamp spelling the connector accepts
            mapped["kinesis.startingPosition"] = pos
    if "kinesis.streamName" not in mapped:
        raise ValueError(
            "kinesis streaming source needs streamName or streamARN in "
            "connection_options"
        )
    return mapped


def resolve_stream_source(connection_type: str, options: dict) -> tuple[str, dict]:
    """(spark format, reader options) for a broker connection_type.

    Both broker formats dispatch; executing them needs the matching
    connector jar on the classpath (spark-sql-kafka / the public
    aws-kinesis connector), absent in this sandbox — ``.load()`` raises
    Spark's missing-data-source error until it is installed.
    """
    ctype = (connection_type or "").lower()
    if ctype == "kafka":
        return "kafka", map_kafka_options(options)
    if ctype == "kinesis":
        return "aws-kinesis", map_kinesis_options(options)
    raise ValueError(f"not a broker connection_type: {connection_type!r}")
