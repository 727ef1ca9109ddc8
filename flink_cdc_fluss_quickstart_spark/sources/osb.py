"""The reference's live `osb` schema world + a deterministic CDC workload
generator replaying gen_data.py's semantics (postgres-source/gen_data.py):

- users/movies/tickets inserts at proportional rates (gen_data.py:65,118,160),
- ticket status transitions scheduled->live->finished driving retractions
  (gen_data.py:163-210), plus occasional movie-title updates so the
  stream-stream join sees updates on BOTH sides (J1),
- rare deletes (not in the reference workload, but exercised so K1's delete
  path is covered end-to-end).

Each epoch is written as one parquet file per table; replayed through
Structured Streaming with maxFilesPerTrigger=1 each epoch becomes one
micro-batch -- a deterministic stand-in for the Postgres WAL tail
(tickets-cdc.sql:43-64), exactly like the reference's
snapshot-then-stream startup (T6).
"""

from __future__ import annotations

import os
import random
from dataclasses import dataclass, field
from datetime import datetime, timedelta
from decimal import Decimal

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# changelog envelope: op + monotonically increasing seq (WAL LSN analogue)
# + payload (the after-image) + `before`, the full pre-update row on U/D
# rows (null on I). The reference's Postgres source runs REPLICA IDENTITY
# FULL (postgres-source/init-scripts/01-init.sql:56-59), so every UPDATE and
# DELETE in its WAL carries the complete old row -- that before-image is
# what lets the downstream affected-keys refresh retract a row from its OLD
# group when an update MOVES it between group keys (Flink's -U/+U pair,
# folded here into one U row with a before struct).
def _env(fields: list[T.StructField]) -> T.StructType:
    return T.StructType(
        [
            T.StructField("op", T.StringType(), False),
            T.StructField("seq", T.LongType(), False),
        ]
        + fields
        + [T.StructField("before", T.StructType(fields), True)]
    )


USERS_SCHEMA = _env([
    T.StructField("user_id", T.LongType(), False),
    T.StructField("username", T.StringType(), True),
    T.StructField("email", T.StringType(), True),
    T.StructField("full_name", T.StringType(), True),
    T.StructField("created_at", T.TimestampNTZType(), True),
])

MOVIES_SCHEMA = _env([
    T.StructField("movie_id", T.LongType(), False),
    T.StructField("title", T.StringType(), True),
    T.StructField("description", T.StringType(), True),
    T.StructField("duration_minutes", T.IntegerType(), True),
    T.StructField("start_date", T.TimestampNTZType(), True),
    T.StructField("created_at", T.TimestampNTZType(), True),
])

TICKETS_SCHEMA = _env([
    T.StructField("ticket_id", T.LongType(), False),
    T.StructField("movie_id", T.LongType(), True),
    T.StructField("user_id", T.LongType(), True),
    T.StructField("cost", T.DecimalType(10, 2), True),
    T.StructField("status", T.StringType(), True),
    T.StructField("purchased_at", T.TimestampNTZType(), True),
])

BASE_TS = datetime(2025, 6, 1, 12, 0, 0)
STATUSES = ("scheduled", "live", "finished")


@dataclass
class _State:
    seq: int = 0
    users: list[int] = field(default_factory=list)
    movies: list[int] = field(default_factory=list)
    # ticket_id -> (movie_id, user_id, cost, status, purchased_at)
    tickets: dict[int, tuple] = field(default_factory=dict)
    # movie_id -> last-written payload dict (source of before-images)
    movie_rows: dict[int, dict] = field(default_factory=dict)
    # monotonic like the reference's ticket_id_counter (gen_data.py:155) --
    # `len(tickets) + 1` would RE-ISSUE a live id after the first delete,
    # collapsing every later epoch's inserts onto one key
    last_ticket_id: int = 0

    def next_seq(self) -> int:
        self.seq += 1
        return self.seq

    def next_ticket_id(self) -> int:
        self.last_ticket_id += 1
        return self.last_ticket_id


def _pa_type(dt: T.DataType):
    """Spark type -> pyarrow type for the changelog fixture writers (shared
    with sources/betting.py so the two generators cannot drift -- a missing
    branch here silently falls through to pa.string() and fails the Spark
    stream's schema at read time)."""
    import pyarrow as pa

    if isinstance(dt, T.LongType):
        return pa.int64()
    if isinstance(dt, T.IntegerType):
        return pa.int32()
    if isinstance(dt, T.BooleanType):
        return pa.bool_()
    if isinstance(dt, T.DecimalType):
        return pa.decimal128(dt.precision, dt.scale)
    if isinstance(dt, T.TimestampType):
        return pa.timestamp("us", tz="UTC")
    if isinstance(dt, T.TimestampNTZType):
        return pa.timestamp("us")
    if isinstance(dt, T.StructType):
        return pa.struct([pa.field(f.name, _pa_type(f.dataType)) for f in dt.fields])
    return pa.string()


def write_epoch(dir_path: str, epoch: int, rows: list[dict], schema: T.StructType) -> None:
    """One changelog epoch file (driver-side fixture gen; tiny files)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    cols = {f.name: [r.get(f.name) for r in rows] for f in schema.fields}
    pa_schema = pa.schema([pa.field(f.name, _pa_type(f.dataType)) for f in schema.fields])
    pq.write_table(
        pa.Table.from_pydict(cols, schema=pa_schema),
        os.path.join(dir_path, f"epoch_{epoch:04d}.parquet"),
    )


def _ticket_payload(tid: int, r: tuple) -> dict:
    return {
        "ticket_id": tid, "movie_id": r[0], "user_id": r[1],
        "cost": r[2], "status": r[3], "purchased_at": r[4],
    }


def generate_workload(
    out_dir: str,
    epochs: int = 8,
    seed: int = 42,
    tickets_per_epoch: int = 10,
    updates_per_epoch: int = 6,
    moves_per_epoch: int = 1,
) -> dict[str, str]:
    """Write per-epoch changelog parquet files; returns table->dir map.

    From epoch 2 on, `moves_per_epoch` ticket EXCHANGES per epoch change a
    ticket's movie_id -- an update that moves the row between group keys.
    Its U row's before-image is what lets the affected-keys view refresh
    retract the ticket from the OLD movie's aggregate (REPLICA IDENTITY
    FULL semantics; an after-image-only consumer would leave it stale).
    """
    rng = random.Random(seed)
    st = _State()
    dirs = {t: os.path.join(out_dir, t) for t in ("users", "movies", "tickets")}
    for d in dirs.values():
        os.makedirs(d, exist_ok=True)

    def write(table: str, epoch: int, rows: list[dict], schema: T.StructType) -> None:
        write_epoch(dirs[table], epoch, rows, schema)

    ts = lambda e, i: BASE_TS + timedelta(seconds=e * 60 + i)  # noqa: E731

    for e in range(epochs):
        u_rows, m_rows, t_rows = [], [], []
        # user inserts (1/epoch)
        uid = len(st.users) + 1
        st.users.append(uid)
        u_rows.append({
            "op": "I", "seq": st.next_seq(), "user_id": uid,
            "username": f"user_{uid}", "email": f"user_{uid}@example.com",
            "full_name": f"User {uid}", "created_at": ts(e, 0),
        })
        # movie inserts (2/epoch)
        for i in range(2):
            mid = len(st.movies) + 1
            st.movies.append(mid)
            payload = {
                "movie_id": mid,
                "title": f"Movie {mid}", "description": f"Description of movie {mid}",
                "duration_minutes": 90 + (mid % 60),
                "start_date": ts(e, 10 + i), "created_at": ts(e, 10 + i),
            }
            st.movie_rows[mid] = payload
            m_rows.append({"op": "I", "seq": st.next_seq(), **payload})
        # ticket inserts
        for i in range(tickets_per_epoch):
            tid = st.next_ticket_id()
            mv = rng.choice(st.movies)
            us = rng.choice(st.users)
            cost = Decimal(rng.randrange(500, 5000)) / 100
            row = (mv, us, cost, "scheduled", ts(e, 20 + i))
            st.tickets[tid] = row
            t_rows.append({
                "op": "I", "seq": st.next_seq(), "ticket_id": tid,
                "movie_id": mv, "user_id": us, "cost": cost,
                "status": "scheduled", "purchased_at": row[4],
            })
        # status transitions (scheduled->live, live->finished), retractions
        for _ in range(updates_per_epoch):
            candidates = [
                (tid, r) for tid, r in st.tickets.items() if r[3] in ("scheduled", "live")
            ]
            if not candidates:
                break
            tid, r = candidates[rng.randrange(len(candidates))]
            new_status = "live" if r[3] == "scheduled" else "finished"
            nr = (r[0], r[1], r[2], new_status, r[4])
            st.tickets[tid] = nr
            t_rows.append({
                "op": "U", "seq": st.next_seq(),
                **_ticket_payload(tid, nr),
                "before": _ticket_payload(tid, r),
            })
        # ticket exchange: movie_id changes -- a group-key-moving update
        # (the case REPLICA IDENTITY FULL before-images exist for)
        if e >= 2 and len(st.movies) >= 2:
            for _ in range(moves_per_epoch):
                candidates = [
                    (tid, r) for tid, r in st.tickets.items() if r[3] != "finished"
                ]
                if not candidates:
                    break
                tid, r = candidates[rng.randrange(len(candidates))]
                new_mv = rng.choice([m for m in st.movies if m != r[0]])
                nr = (new_mv, r[1], r[2], r[3], r[4])
                st.tickets[tid] = nr
                t_rows.append({
                    "op": "U", "seq": st.next_seq(),
                    **_ticket_payload(tid, nr),
                    "before": _ticket_payload(tid, r),
                })
        # movie title update every other epoch (join-dim update, J1)
        if e % 2 == 1:
            mid = rng.choice(st.movies)
            old = st.movie_rows[mid]
            # a title-only UPDATE, like `UPDATE ... SET title = ...` would
            # emit: the immutable creation/scheduling fields carry over from
            # the previous payload (rewriting them was an accidental
            # dimension reschedule -- start_date is in the view's group-by)
            payload = {
                **old,
                "title": f"Movie {mid} (director's cut e{e})",
            }
            st.movie_rows[mid] = payload
            m_rows.append({"op": "U", "seq": st.next_seq(), **payload, "before": old})
        # rare ticket delete (refund) from epoch 3 on
        if e >= 3:
            sold = sorted(st.tickets)
            tid = sold[rng.randrange(len(sold))]
            r = st.tickets.pop(tid)
            t_rows.append({
                "op": "D", "seq": st.next_seq(),
                **_ticket_payload(tid, r),
                "before": _ticket_payload(tid, r),
            })
        write("users", e, u_rows, USERS_SCHEMA)
        write("movies", e, m_rows, MOVIES_SCHEMA)
        write("tickets", e, t_rows, TICKETS_SCHEMA)
    return dirs


def changelog_stream(spark: SparkSession, path: str, schema: T.StructType,
                     files_per_trigger: int = 1) -> DataFrame:
    """File-replay changelog stream: one epoch file per micro-batch."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(path)
    )
