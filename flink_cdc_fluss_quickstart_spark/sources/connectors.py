"""Production connector bindings for the CDC sources (SURVEY.md S1-S3).

The reference ingests Postgres WAL via the postgres-cdc connector
(flink-cdc/sql/tickets-cdc.sql:43-64). The in-sandbox tests replay that
changelog from per-epoch parquet files (sources/osb.py); THIS module is the
documented seam to the two production forms, Spark-first:

1. Kafka + Debezium: `spark.readStream.format("kafka")` delivers Debezium
   envelopes as JSON bytes; `debezium_decode` turns them into the engine's
   changelog frame (op/seq/payload columns) with `from_json` -- pure JVM
   expression work, no UDF. The decode is Kafka-independent and unit-tested
   against literal envelope strings; `kafka_changelog_stream` is the thin
   binding that applies it to a Kafka stream (exercised only where the Kafka
   connector jar is deployed).

2. JDBC parallel snapshot seed: the reference's snapshot-then-stream startup
   (T6) seeds from a consistent table read before tailing the WAL. Spark's
   analogue is a partitioned JDBC read -- `jdbc_snapshot_reader` configures
   partitionColumn/numPartitions so the seed scan fans out across executors
   instead of serializing through one connection.

Every changelog consumer downstream (PKTable.merge, cdc_pipeline.replicate)
is source-agnostic: it sees (op, seq, payload...) no matter which binding
produced the frame.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, DataFrameReader, SparkSession
from pyspark.sql import types as T

# Debezium op codes -> the engine's changelog ops ('r' = snapshot read row)
_DEBEZIUM_OP = {"c": "I", "r": "I", "u": "U", "d": "D"}


def debezium_envelope_schema(payload: T.StructType) -> T.StructType:
    """Schema of a (flattened) Debezium JSON envelope for a row payload."""
    return T.StructType(
        [
            T.StructField("before", payload, True),
            T.StructField("after", payload, True),
            T.StructField("op", T.StringType(), True),
            T.StructField("ts_ms", T.LongType(), True),
            T.StructField(
                "source",
                T.StructType([T.StructField("lsn", T.LongType(), True)]),
                True,
            ),
        ]
    )


def debezium_decode(raw: DataFrame, payload: T.StructType,
                    value_col: str = "value",
                    include_before: bool = True) -> DataFrame:
    """Decode Debezium JSON envelopes into the engine's changelog frame.

    ``raw`` carries one JSON envelope per row (Kafka's `value`, cast to
    string). Output: (op, seq, <payload columns...>[, before]) where op is
    I/U/D, seq is the source LSN (the WAL position -- the same total order
    the file replay models with its seq column), and the payload comes from
    `after` for upserts and `before` for deletes. With `include_before`
    (default) the envelope's before-image survives as a trailing struct
    column -- REPLICA IDENTITY FULL parity (01-init.sql:56-59) that lets the
    affected-keys view refresh retract group-key-moving updates from their
    OLD group (see streaming.analytics.affected_keys); the osb.py file
    replay carries the same column. Malformed envelopes surface as NULL-op
    rows (filter or dead-letter them; they never fail the stream).

    Wire-format coverage (the real Debezium JSON converter, not just the
    flattened test shape):

    - schemas.enable=true wraps the envelope as {"schema": ..., "payload":
      {before, after, source, op, ts_ms}} -- both forms decode (the wrapped
      payload is tried first and coalesced with the flat parse);
    - Kafka TOMBSTONES (null value after a delete, for log compaction) and
      schema-change / heartbeat messages (different JSON structure, no `op`)
      become NULL-op rows -- filter or dead-letter them, they never fail
      the stream;
    - connector config contract for typed columns: BOTH decimal modes
      decode -- 'decimal.handling.mode' = 'string' (DECIMAL arrives as
      "12.50", parseable into a DecimalType payload field) and the DEFAULT
      'precise' mode (base64 two's-complement unscaled bytes -- declare
      StringType and convert with precise_decimal(col, p, s)); for
      temporals run 'time.precision.mode' = 'connect' (TIMESTAMP arrives
      as epoch millis -- declare LongType and convert with
      epoch_millis_to_timestamp).

    All expression work (`from_json`, struct field access, CASE) is JVM-side
    whole-stage-codegen -- at 100 TB/day of CDC this path must never drop
    into Python.
    """
    val = F.col(value_col).cast("string")
    env_schema = debezium_envelope_schema(payload)
    # ONE parse for both converter shapes: a superset schema carrying the
    # flat envelope fields AND a `payload` field of the same envelope type.
    # A wrapped record fills `payload` (flat fields absent -> NULL); a flat
    # record leaves `payload` NULL and fills the fields -- so the coalesce
    # picks the right shape without tokenizing the JSON twice (this is the
    # 100 TB/day hot path; the previous two-from_json spelling parsed every
    # flat record twice).
    superset = T.StructType(
        [*env_schema.fields, T.StructField("payload", env_schema, True)]
    )
    p = F.from_json(val, superset)
    flat = F.struct(*[p[f.name].alias(f.name) for f in env_schema.fields])
    # the isNotNull gate keeps the struct constructor from touching fields
    # of a NULL parse result (tombstones / malformed JSON) -- ungated, the
    # generated unsafe projection NPEs on the null struct
    env = F.coalesce(p["payload"], F.when(p.isNotNull(), flat))
    op = F.element_at(
        F.create_map(*[F.lit(x) for kv in _DEBEZIUM_OP.items() for x in kv]),
        env["op"],
    )
    row = F.when(env["op"] == "d", env["before"]).otherwise(env["after"])
    out = raw.select(
        op.alias("op"),
        env["source"]["lsn"].alias("seq"),
        row.alias("__row"),
        env["before"].alias("before"),
    )
    cols = ["op", "seq", *[f"__row.{f.name}" for f in payload.fields]]
    if include_before:
        cols.append("before")
    return out.select(*cols)


def debezium_schema_drift(raw: DataFrame, payload: T.StructType,
                          value_col: str = "value") -> DataFrame:
    """Schema-DRIFT monitor for a Debezium topic: one row per row-image key
    that the declared payload schema does NOT carry, with occurrence count
    and the first/last LSN it appeared at.

    Why it exists: `from_json` with a fixed schema silently DROPS unknown
    fields, so a source-side `ALTER TABLE ADD COLUMN` keeps the replication
    pipeline green while every new column's values are discarded. Running
    this monitor alongside the pipeline (same topic frame) turns that silent
    data loss into an alarm with a WAL position to replay from.

    All JVM-side: get_json_object pulls the after/before objects (wrapped or
    flat converter shape), json_object_keys lists their keys, and the
    declared field names filter out expected ones -- one scan, one grouped
    aggregate, no Python. Unparseable/tombstone records contribute nothing.
    """
    val = F.col(value_col).cast("string")

    def obj(field: str) -> F.Column:
        # wrapped (schemas.enable=true) takes priority, same as the decode
        return F.coalesce(
            F.get_json_object(val, f"$.payload.{field}"),
            F.get_json_object(val, f"$.{field}"),
        )

    lsn = F.coalesce(
        F.get_json_object(val, "$.payload.source.lsn"),
        F.get_json_object(val, "$.source.lsn"),
    ).cast("long")
    keys = F.array_distinct(
        F.concat(
            F.coalesce(F.json_object_keys(obj("after")), F.array()),
            F.coalesce(F.json_object_keys(obj("before")), F.array()),
        )
    )
    declared = [f.name for f in payload.fields]
    return (
        raw.select(F.explode(keys).alias("key"), lsn.alias("lsn"))
        .filter(~F.col("key").isin(declared))
        .groupBy("key")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.min("lsn").alias("first_lsn"),
            F.max("lsn").alias("last_lsn"),
        )
    )


def precise_decimal(col, precision: int, scale: int) -> "F.Column":
    """Debezium DEFAULT 'decimal.handling.mode' = 'precise' parity: NUMERIC/
    DECIMAL columns arrive as the base64 of the unscaled value's minimal
    two's-complement big-endian bytes (Kafka Connect's logical Decimal;
    the scale lives in the connect schema and must match the DECLARED
    target type, exactly as it must for the reference's DECIMAL(10,2)
    odds columns -- tickets-cdc.sql:49). Declare the payload field
    StringType and convert after decode, the epoch_millis_to_timestamp
    pattern.

    Pure JVM expression work: unbase64 -> hex -> conv(16,10) as the
    unsigned reading; the two's-complement sign comes from the first
    nibble (>= 8 means the sign bit is set) and the modulus 2^(4*len)
    comes from a 16-entry literal map of EXACT decimal strings -- never
    pow(), whose double->decimal cast routes through the 17-significant-
    digit string form and silently corrupts 2^64's low digits. Then exact
    decimal division by 10^scale. Supports unscaled values up to 8 bytes
    -- every DECIMAL(18,s) and both of the reference's widths; wider
    payloads return NULL (dead-letter them) rather than a silently
    wrapped value, since conv() arithmetic is 64-bit.

    Malformed payloads (non-base64 text, empty strings) yield NULL rather
    than failing the stream -- under ANSI mode a bare unbase64 RAISES on
    invalid input, which would let one corrupted record kill a 100 TB/day
    pipeline; the rlike gate keeps the never-fail contract the envelope
    decode already honors for malformed JSON."""
    c = F.col(col) if isinstance(col, str) else col
    valid = c.rlike("^(?:[A-Za-z0-9+/]{4})*(?:[A-Za-z0-9+/]{2}==|[A-Za-z0-9+/]{3}=)?$") & (
        F.length(c) > 0
    )
    hexs = F.hex(F.unbase64(F.when(valid, c)))
    unsigned = F.conv(hexs, 16, 10).cast("decimal(38,0)")
    modulus = F.element_at(
        F.create_map(
            *[x for n in range(1, 17)
              for x in (F.lit(n), F.lit(str(1 << (4 * n))))]
        ),
        F.length(hexs).cast("int"),
    ).cast("decimal(38,0)")
    negative = F.conv(F.substring(hexs, 1, 1), 16, 10).cast("int") >= 8
    signed = F.when(negative, unsigned - modulus).otherwise(unsigned)
    value = signed / F.lit(10 ** scale).cast("decimal(19,0)")
    return (
        F.when(F.length(hexs) > 16, F.lit(None))
        .otherwise(value)
        .cast(T.DecimalType(precision, scale))
    )


def epoch_millis_to_timestamp(col) -> "F.Column":
    """Debezium 'time.precision.mode' = 'connect' temporal parity: TIMESTAMP
    columns arrive as int64 epoch MILLIS; this converts them to a Spark
    timestamp JVM-side (declare the payload field LongType, convert after
    decode)."""
    return F.timestamp_millis(F.col(col) if isinstance(col, str) else col)


def epoch_micros_to_timestamp(col) -> "F.Column":
    """Debezium DEFAULT 'time.precision.mode' = 'adaptive_time_microseconds'
    parity: Postgres TIMESTAMP arrives as int64 epoch MICROS
    (io.debezium.time.MicroTimestamp). Declare LongType, convert after
    decode -- with this and precise_decimal the seam consumes a Debezium
    connector running entirely on DEFAULT config."""
    return F.timestamp_micros(F.col(col) if isinstance(col, str) else col)


def epoch_days_to_date(col) -> "F.Column":
    """Debezium DATE parity (io.debezium.time.Date, both precision modes):
    int32 days since epoch. Declare IntegerType/LongType, convert after
    decode."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_from_unix_date(c.cast("int"))


def kafka_changelog_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    payload: T.StructType,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """Debezium-over-Kafka changelog stream (production S1 binding).

    Requires the spark-sql-kafka connector on the classpath; in this sandbox
    only `debezium_decode` (the non-trivial half) is exercised directly.
    """
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return debezium_decode(raw, payload)


def jdbc_snapshot_options(
    url: str,
    table: str,
    partition_column: str,
    lower_bound: int,
    upper_bound: int,
    num_partitions: int = 32,
    **options: str,
) -> dict[str, str]:
    """Option map for the parallel JDBC snapshot seed (T6).

    The partitionColumn bounds split the seed scan into `num_partitions`
    range predicates executed concurrently -- the difference between a
    snapshot that takes one connection-hours and one that takes minutes
    across the cluster. Pick a clustered/PK integer column so ranges align
    with the table's physical order.
    """
    return {
        "url": url,
        "dbtable": table,
        "partitionColumn": partition_column,
        "lowerBound": str(lower_bound),
        "upperBound": str(upper_bound),
        "numPartitions": str(num_partitions),
        # push filters/column pruning into the database
        "pushDownPredicate": "true",
        **options,
    }


def jdbc_snapshot_reader(spark: SparkSession, **kwargs) -> DataFrameReader:
    """Configured parallel JDBC reader (call `.load()` where a database is
    reachable; see jdbc_snapshot_options for the partitioning contract)."""
    return spark.read.format("jdbc").options(**jdbc_snapshot_options(**kwargs))
