"""Message-stream sources: wrdn / pl72 parsing (SURVEY §2.1 S1-S5).

The reference consumes Kafka flatbuffer messages: keep bytes whose
[4:8] == b"wrdn" (resp. b"pl72"), deserialize, drop deser errors and
writer-error records (/root/reference/src/scicat_kafka.py:89-134,198-249).

Spark-first: the Kafka source is ``spark.readStream.format("kafka")``;
this module supplies the message-layer transforms that sit on top of the
raw ``value: BINARY`` column. The cheap 4-byte type filter is kept as an
explicit relational predicate BEFORE any deserialization so Catalyst
never reorders expensive parsing ahead of it (SURVEY §4 row 1).

Deserializers: production flatbuffers decode would be a pandas UDF over
the binary column (gated import); the JSON harness used by tests and the
driver's parquet fixtures is pure ``from_json`` — built-in.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WRDN_SCHEMA = (
    "job_id string, file_name string, error_encountered boolean, "
    "metadata string, message string, service_id string"
)
PL72_SCHEMA = "job_id string, filename string, instrument_name string"


def message_type_filter(value: Column, file_identifier: bytes) -> Column:
    """S2: bytes[4:8] == identifier, evaluated on the raw binary column
    (/root/reference/src/scicat_kafka.py:89-96). substring is 1-based."""
    return F.substring(value, 5, 4) == F.lit(file_identifier)


def parse_wrdn_json(df: DataFrame, value_col: str = "value") -> DataFrame:
    """JSON-harness wrdn deserializer: binary/string JSON -> struct.
    Malformed rows yield NULL struct and are dropped, mirroring the
    reference's skip-on-deserialization-error
    (/root/reference/src/scicat_kafka.py:185-195)."""
    parsed = F.from_json(F.col(value_col).cast("string"), WRDN_SCHEMA)
    return (
        df.withColumn("_msg", parsed)
        .filter(F.col("_msg").isNotNull() & F.col("_msg.job_id").isNotNull())
        .select("*", "_msg.*")
        .drop("_msg")
    )


def parse_pl72_json(df: DataFrame, value_col: str = "value") -> DataFrame:
    """S5: JSON-harness RunStart (pl72) deserializer: binary/string JSON
    -> (job_id, filename, instrument_name), malformed rows dropped
    (/root/reference/src/scicat_kafka.py:208-249)."""
    parsed = F.from_json(F.col(value_col).cast("string"), PL72_SCHEMA)
    return (
        df.withColumn("_msg", parsed)
        .filter(F.col("_msg").isNotNull() & F.col("_msg.job_id").isNotNull())
        .select("*", "_msg.*")
        .drop("_msg")
    )


def drop_writer_errors(df: DataFrame, flag_col: str = "error_encountered") -> DataFrame:
    """S4 (/root/reference/src/scicat_kafka.py:99-110)."""
    return df.filter(~F.coalesce(F.col(flag_col), F.lit(False)))


def get_wrdn_decoder():
    """Production deserializer selection: prefer the official
    streaming_data_types codec when installed; otherwise the vendored
    pure-Python FlatBuffers reader (sources.flatbuf) — same public wire
    format, no dependency."""
    try:  # pragma: no cover - environment-dependent
        from streaming_data_types import deserialise_wrdn  # type: ignore

        return lambda b: deserialise_wrdn(b)._asdict()
    except ImportError:
        from scicat_ingestor_spark.sources.flatbuf import deserialise_wrdn

        return deserialise_wrdn


def get_pl72_decoder():
    try:  # pragma: no cover - environment-dependent
        from streaming_data_types import deserialise_pl72  # type: ignore

        return lambda b: deserialise_pl72(b)._asdict()
    except ImportError:
        from scicat_ingestor_spark.sources.flatbuf import deserialise_pl72

        return deserialise_pl72


def parse_wrdn_flatbuffer(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Production S3: flatbuffer wrdn decode as an Arrow-batched
    mapInPandas stage (the reference decodes one message at a time via
    streaming-data-types, /root/reference/src/scicat_kafka.py:113-134).

    Arrow-batched, per-row error tolerance: a malformed buffer is
    dropped and the stream continues (T4), exactly the reference's
    skip-on-deser-error. The codec is the official lib when present,
    else the vendored FlatBuffers reader.
    """
    import pandas as pd

    decode = get_wrdn_decoder()
    cols = ["job_id", "file_name", "error_encountered", "metadata", "message", "service_id"]

    def run(batches):
        for pdf in batches:
            rows = []
            for raw in pdf[value_col]:
                try:
                    decoded = decode(bytes(raw))
                except Exception:
                    continue  # T4: skip malformed, keep the stream
                rows.append([decoded.get(c) for c in cols])
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(run, schema=WRDN_SCHEMA)


def parse_pl72_flatbuffer(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Production S5: flatbuffer RunStart decode, same shape as
    :func:`parse_wrdn_flatbuffer`
    (/root/reference/src/scicat_kafka.py:208-249)."""
    import pandas as pd

    decode = get_pl72_decoder()
    cols = ["job_id", "filename", "instrument_name"]

    def run(batches):
        for pdf in batches:
            rows = []
            for raw in pdf[value_col]:
                try:
                    decoded = decode(bytes(raw))
                except Exception:
                    continue
                rows.append([decoded.get(c) for c in cols])
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(run, schema=PL72_SCHEMA)


def wrdn_stream(
    spark,
    bootstrap_servers: str,
    topics: str,
    starting_offsets: str = "earliest",
    security: dict | None = None,
):
    """S1: the Kafka source READER, configured like the reference's
    consumer (auto_offset_reset earliest, multi-topic comma list,
    SASL/SSL passthrough — /root/reference/src/scicat_kafka.py:21-71).
    Returns the unloaded reader so callers can stack options
    (maxOffsetsPerTrigger etc.) before ``.load()``; compose the result
    with message_type_filter + parse + drop_writer_errors.

    ``security`` maps the reference's option names to Kafka client
    config, e.g. ``{"security_protocol": "SASL_SSL", "sasl_mechanism":
    "SCRAM-SHA-256", "sasl_username": u, "sasl_password": p}``.
    """
    return spark.readStream.format("kafka").options(
        **kafka_options(bootstrap_servers, topics, starting_offsets, security)
    )


def kafka_options(
    bootstrap_servers: str,
    topics: str,
    starting_offsets: str = "earliest",
    security: dict | None = None,
) -> dict:
    """The reference's consumer options translated to Spark's Kafka
    source option names (pure, testable without a broker)."""
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topics,
        "startingOffsets": starting_offsets,
    }
    sec = dict(security or {})
    if sec.get("security_protocol"):
        opts["kafka.security.protocol"] = sec["security_protocol"]
    if sec.get("sasl_mechanism"):
        mech = sec["sasl_mechanism"]
        # the reference hands the mechanism straight to librdkafka
        # (/root/reference/src/scicat_kafka.py consumer config); the JVM
        # client needs the matching LoginModule spelled out — picking
        # Scram unconditionally would silently fail PLAIN auth
        modules = {
            "PLAIN": "org.apache.kafka.common.security.plain.PlainLoginModule",
            "SCRAM-SHA-256": "org.apache.kafka.common.security.scram.ScramLoginModule",
            "SCRAM-SHA-512": "org.apache.kafka.common.security.scram.ScramLoginModule",
        }
        if mech not in modules:
            raise ValueError(
                f"unsupported sasl_mechanism {mech!r}; one of {sorted(modules)}"
            )
        opts["kafka.sasl.mechanism"] = mech

        def _jaas_quote(v: str) -> str:
            # JAAS strings: backslash and double-quote must be escaped or
            # a password containing them corrupts the whole config line
            return str(v).replace("\\", "\\\\").replace('"', '\\"')

        opts["kafka.sasl.jaas.config"] = (
            f"{modules[mech]} required "
            f'username="{_jaas_quote(sec.get("sasl_username", ""))}" '
            f'password="{_jaas_quote(sec.get("sasl_password", ""))}";'
        )
    return opts
