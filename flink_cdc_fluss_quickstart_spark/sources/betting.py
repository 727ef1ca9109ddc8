"""The reference's ALTERNATE ingest shape (SURVEY.md S4): the 18-column
betting-tickets CDC table + kinesis JSON events, per the generated
init-catalogs.sql (flink-cdc/flink-gen.sh:58-143).

This module provides the deterministic file-replay workload for that schema:
ticket lifecycle PENDING -> (WON | LOST | CANCELLED), winning_amount set only
on WON, cancel metadata only on CANCELLED, occasional soft delete
(deleted_at) followed by a hard CDC delete. It exercises the type surface the
movie workload does not: TIMESTAMP WITH LOCAL TIME ZONE (tz-aware
instants), BOOLEAN, and nullable BIGINT amounts.
"""

from __future__ import annotations

import os
import random
from datetime import datetime, timedelta, timezone

from pyspark.sql import types as T

from flink_cdc_fluss_quickstart_spark.sources.osb import _env, write_epoch

# mirror of the cdc_tickets DDL (flink-gen.sh:58-77) through the dialect's
# type map: STRING->string, BIGINT->long, TIMESTAMP(3) WITH LOCAL TIME
# ZONE->timestamp (tz-aware), BOOLEAN->boolean
BETTING_TICKETS_SCHEMA = _env([
    T.StructField("id", T.StringType(), False),
    T.StructField("user_id", T.StringType(), False),
    T.StructField("status", T.StringType(), False),
    T.StructField("cancel_reason", T.StringType(), True),
    T.StructField("entry_amount", T.LongType(), False),
    T.StructField("winning_amount", T.LongType(), True),
    T.StructField("transactions_entry_transaction", T.StringType(), True),
    T.StructField("transactions_winning_transaction", T.StringType(), True),
    T.StructField("transactions_cancel_transaction", T.StringType(), True),
    T.StructField("status_updated_at", T.TimestampType(), False),
    T.StructField("created_at", T.TimestampType(), False),
    T.StructField("updated_at", T.TimestampType(), False),
    T.StructField("deleted_at", T.TimestampType(), True),
    T.StructField("free_ticket_promotion_id", T.StringType(), True),
    T.StructField("booster_promotion_id", T.StringType(), True),
    T.StructField("booster_promotion_change_reason", T.StringType(), True),
    T.StructField("accept_odds_change", T.BooleanType(), True),
    T.StructField("promo_id", T.StringType(), True),
])

# kinesis_events (flink-gen.sh:94-110): JSON payload column + event-time
KINESIS_EVENTS_SCHEMA = _env([
    T.StructField("event_id", T.StringType(), True),
    T.StructField("event_type", T.StringType(), True),
    T.StructField("payload", T.StringType(), True),
    T.StructField("event_time", T.TimestampNTZType(), True),
])

BASE_TS = datetime(2025, 6, 1, 12, 0, 0, tzinfo=timezone.utc)
SETTLE = ("WON", "LOST", "CANCELLED")


def generate_betting_workload(
    out_dir: str,
    epochs: int = 6,
    seed: int = 7,
    tickets_per_epoch: int = 8,
) -> dict[str, str]:
    """Write per-epoch changelog parquet for cdc_tickets + kinesis_events.

    Returns {"tickets": dir, "events": dir}. Deterministic for a given seed.
    """
    rng = random.Random(seed)
    dirs = {t: os.path.join(out_dir, t) for t in ("tickets", "events")}
    for d in dirs.values():
        os.makedirs(d, exist_ok=True)

    def write(table: str, schema: T.StructType, epoch: int, rows: list[dict]) -> None:
        write_epoch(dirs[table], epoch, rows, schema)

    seq = 0

    def next_seq() -> int:
        nonlocal seq
        seq += 1
        return seq

    ts = lambda e, i: BASE_TS + timedelta(seconds=e * 60 + i)  # noqa: E731
    open_tickets: dict[str, dict] = {}
    n = 0

    for e in range(epochs):
        t_rows, ev_rows = [], []
        for i in range(tickets_per_epoch):
            n += 1
            tid = f"t-{n:05d}"
            created = ts(e, i)
            row = {
                "id": tid,
                "user_id": f"u-{rng.randrange(1, 12):03d}",
                "status": "PENDING",
                "cancel_reason": None,
                "entry_amount": rng.randrange(100, 10_000),
                "winning_amount": None,
                "transactions_entry_transaction": f"tx-e-{n:05d}",
                "transactions_winning_transaction": None,
                "transactions_cancel_transaction": None,
                "status_updated_at": created,
                "created_at": created,
                "updated_at": created,
                "deleted_at": None,
                "free_ticket_promotion_id": f"promo-{n % 3}" if n % 5 == 0 else None,
                "booster_promotion_id": None,
                "booster_promotion_change_reason": None,
                "accept_odds_change": bool(n % 3 == 0),
                "promo_id": None,
            }
            open_tickets[tid] = row
            t_rows.append({"op": "I", "seq": next_seq(), **row})
            ev_rows.append({
                "op": "I", "seq": seq, "event_id": f"ev-{seq:06d}",
                "event_type": "ticket_created",
                "payload": f'{{"ticket_id": "{tid}", "amount": {row["entry_amount"]}}}',
                "event_time": created.replace(tzinfo=None),
            })
        # settle a few open tickets
        for _ in range(tickets_per_epoch // 2):
            pending = [t for t, r in open_tickets.items() if r["status"] == "PENDING"]
            if not pending:
                break
            tid = pending[rng.randrange(len(pending))]
            before = dict(open_tickets[tid])
            row = dict(before)
            outcome = SETTLE[rng.randrange(len(SETTLE))]
            now = ts(e, 30)
            row.update(status=outcome, status_updated_at=now, updated_at=now)
            if outcome == "WON":
                row.update(
                    winning_amount=row["entry_amount"] * 185 // 100,
                    transactions_winning_transaction=f"tx-w-{tid}",
                )
            elif outcome == "CANCELLED":
                row.update(
                    cancel_reason="user_request" if rng.random() < 0.5 else "odds_changed",
                    transactions_cancel_transaction=f"tx-c-{tid}",
                )
            open_tickets[tid] = row
            t_rows.append({"op": "U", "seq": next_seq(), **row, "before": before})
        # soft-delete then hard-delete one settled ticket from epoch 2 on
        if e >= 2:
            settled = sorted(t for t, r in open_tickets.items() if r["status"] != "PENDING")
            if settled:
                tid = settled[rng.randrange(len(settled))]
                before = dict(open_tickets.pop(tid))
                row = dict(before)
                row.update(deleted_at=ts(e, 45), updated_at=ts(e, 45))
                t_rows.append({"op": "U", "seq": next_seq(), **row, "before": before})
                t_rows.append({"op": "D", "seq": next_seq(), **row, "before": row})
        write("tickets", BETTING_TICKETS_SCHEMA, e, t_rows)
        write("events", KINESIS_EVENTS_SCHEMA, e, ev_rows)
    return dirs
