"""The production connector seam: Debezium envelope decode (Kafka-free) and
the parallel JDBC snapshot reader configuration."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import types as T

from flink_cdc_fluss_quickstart_spark.sources import connectors

PAYLOAD = T.StructType(
    [
        T.StructField("ticket_id", T.LongType(), True),
        T.StructField("status", T.StringType(), True),
        T.StructField("cost", T.DoubleType(), True),
    ]
)


def _envelope(op, before, after, lsn):
    return json.dumps(
        {"before": before, "after": after, "op": op, "ts_ms": 1700000000000 + lsn,
         "source": {"lsn": lsn}}
    )


def test_debezium_decode_ops_and_order(spark):
    rows = [
        # snapshot read, insert, update, delete, malformed
        (_envelope("r", None, {"ticket_id": 1, "status": "scheduled", "cost": 5.0}, 10),),
        (_envelope("c", None, {"ticket_id": 2, "status": "scheduled", "cost": 7.5}, 11),),
        (_envelope("u", {"ticket_id": 1, "status": "scheduled", "cost": 5.0},
                   {"ticket_id": 1, "status": "live", "cost": 5.0}, 12),),
        (_envelope("d", {"ticket_id": 2, "status": "scheduled", "cost": 7.5}, None, 13),),
        ("{not json",),
    ]
    raw = spark.createDataFrame(rows, "value string")
    out = connectors.debezium_decode(raw, PAYLOAD)
    assert out.columns == ["op", "seq", "ticket_id", "status", "cost", "before"]
    decoded = {r.seq: r for r in out.collect() if r.seq is not None}
    assert decoded[10].op == "I" and decoded[10].ticket_id == 1
    assert decoded[11].op == "I" and decoded[11].cost == 7.5
    assert decoded[12].op == "U" and decoded[12].status == "live"
    # the before-image survives decode (REPLICA IDENTITY FULL parity): an
    # update carries the full old row, an insert carries null
    assert decoded[12].before.status == "scheduled"
    assert decoded[11].before is None
    # delete carries the BEFORE image (the key must survive for the merge)
    assert decoded[13].op == "D" and decoded[13].ticket_id == 2
    # malformed envelope -> NULL-op row, not a stream failure
    assert sum(1 for r in out.collect() if r.op is None) == 1


def test_debezium_decode_feeds_pk_table(spark, tmp_path):
    """End-to-end: decoded envelopes drive the same merge path the file
    replay uses -- the consumer is source-agnostic."""
    from flink_cdc_fluss_quickstart_spark.streaming.pk_table import PKTable

    rows = [
        (_envelope("c", None, {"ticket_id": 1, "status": "scheduled", "cost": 5.0}, 1),),
        (_envelope("c", None, {"ticket_id": 2, "status": "scheduled", "cost": 6.0}, 2),),
        (_envelope("u", None, {"ticket_id": 1, "status": "live", "cost": 5.0}, 3),),
        (_envelope("d", {"ticket_id": 2, "status": "scheduled", "cost": 6.0}, None, 4),),
    ]
    raw = spark.createDataFrame(rows, "value string")
    changes = connectors.debezium_decode(raw, PAYLOAD)
    t = PKTable(spark, str(tmp_path / "t"), keys=["ticket_id"], order_by=["seq"])
    t.merge(changes, batch_id=0, writer_id="kafka")
    snap = {r.ticket_id: r.status for r in t.snapshot().collect()}
    assert snap == {1: "live"}


def test_jdbc_snapshot_reader_partitioning(spark):
    opts = connectors.jdbc_snapshot_options(
        url="jdbc:postgresql://db:5432/source_db",
        table="osb.tickets",
        partition_column="ticket_id",
        lower_bound=1,
        upper_bound=1_000_000,
        num_partitions=32,
    )
    assert opts["partitionColumn"] == "ticket_id"
    assert opts["numPartitions"] == "32"
    assert opts["lowerBound"] == "1" and opts["upperBound"] == "1000000"
    # the reader builds from the same options (no DB in sandbox -> no load())
    reader = connectors.jdbc_snapshot_reader(spark, **dict(
        url="jdbc:postgresql://db:5432/source_db", table="osb.tickets",
        partition_column="ticket_id", lower_bound=1, upper_bound=1_000_000,
    ))
    assert reader is not None
