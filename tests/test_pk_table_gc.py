"""PKTable commit-protocol properties: GC safety under interleaved writers.

The untested corner of the merge protocol (VERDICT r3 #8): best-effort GC of
superseded bucket directories must never remove a directory the CURRENT
manifest still references. Two complementary checks after every commit:

- over-GC would surface as vanished rows -> the snapshot is compared to an
  independent Python changelog fold after each merge,
- under-GC would surface as orphans -> every on-disk ``v*/__bucket=*`` leaf
  must be referenced by the current manifest (superseded dirs are gone).

These strict checks run with ``gc_grace_secs=0`` (immediate deletion). The
default GRACE window (superseded dirs linger so older readers' plans keep
resolving -- snapshot-expiry semantics) gets its own test: a snapshot
DataFrame captured before a merge must stay collectable after it.

A referenced dir may legitimately NOT exist (a merge that deletes every row
of a bucket writes no partition dir for it); ``snapshot`` tolerates that, so
the disk check is containment, not equality.
"""

from __future__ import annotations

import glob
import os
import threading

from hypothesis import HealthCheck, given, settings, strategies as st

from flink_cdc_fluss_quickstart_spark.streaming.pk_table import PKTable

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

SCHEMA = "op string, seq long, k long, v long"


def _fold(state: dict[int, int], batch: list[tuple[str, int, int, int]]) -> None:
    """Reference semantics of PKTable.merge: the batch collapses to its
    latest row per key (by seq), then newer-batch rows win over stored state
    unconditionally; D drops the key."""
    latest: dict[int, tuple[str, int, int, int]] = {}
    for row in batch:
        if row[2] not in latest or row[1] > latest[row[2]][1]:
            latest[row[2]] = row
    for op, _seq, k, v in latest.values():
        if op == "D":
            state.pop(k, None)
        else:
            state[k] = v


def _on_disk_bucket_dirs(path: str) -> set[str]:
    return {
        os.path.relpath(d, path)
        for d in glob.glob(os.path.join(path, "v*", "__bucket=*"))
    }


def _check_invariants(t: PKTable, state: dict[int, int]) -> None:
    m = t._read_manifest()
    referenced = set(m["buckets"].values())
    on_disk = _on_disk_bucket_dirs(t.path)
    assert on_disk <= referenced, f"orphaned bucket dirs: {on_disk - referenced}"
    snap = t.snapshot()
    got = {} if snap is None else {r["k"]: r["v"] for r in snap.collect()}
    assert got == state


# each step: (writer 0/1, replay?, ops); replay re-sends the writer's previous
# batch_id with DIFFERENT (poison) data, which must be a no-op
steps_strategy = st.lists(
    st.tuples(
        st.integers(0, 1),
        st.booleans(),
        st.lists(
            st.tuples(
                st.sampled_from(["I", "U", "D"]),
                st.integers(0, 5),
                st.integers(0, 99),
            ),
            min_size=0,
            max_size=6,
        ),
    ),
    min_size=1,
    max_size=5,
)


@given(steps_strategy)
@settings(**SETTINGS)
def test_merge_gc_never_drops_referenced_dirs(spark, tmp_path_factory, steps):
    path = str(tmp_path_factory.mktemp("pkgc") / "t")
    t = PKTable(spark, path, keys=["k"], order_by=["seq"], n_buckets=4,
                gc_grace_secs=0.0)
    state: dict[int, int] = {}
    next_id = [0, 0]
    seq = 0
    for writer, replay, ops in steps:
        wid = f"w{writer}"
        batch = []
        for op, k, v in ops:
            batch.append((op, seq, k, v))
            seq += 1
        df = (
            spark.createDataFrame(batch, SCHEMA)
            if batch
            else spark.createDataFrame([], SCHEMA)
        )
        if replay and next_id[writer] > 0:
            poison = spark.createDataFrame([("U", 10_000_000, 0, -1)], SCHEMA)
            t.merge(poison, batch_id=next_id[writer] - 1, writer_id=wid)
            # already-applied (writer, batch_id): state must be unchanged
        else:
            t.merge(df, batch_id=next_id[writer], writer_id=wid)
            next_id[writer] += 1
            _fold(state, batch)
        _check_invariants(t, state)


def test_concurrent_writers_serialize_commits(spark, tmp_path):
    """Two threads merge disjoint key ranges into the same table through ONE
    shared PKTable handle (the supported in-process pattern: an engine's
    pipelines all commit through the table's single store handle, serialized
    by the commit lock). The final state must be the union of both folds and
    hold the GC invariants -- an interleaved read-modify-write would lose
    bucket pointers. Two SEPARATE handles racing is now out of contract by
    construction: the writer-epoch fence makes the superseded handle raise
    (tests/test_pk_table_fence.py)."""
    path = str(tmp_path / "t")
    n_batches, keys_per = 4, 6
    shared = PKTable(spark, path, keys=["k"], order_by=["seq"], n_buckets=4,
                     gc_grace_secs=0.0)
    tables = [shared, shared]
    errors: list[BaseException] = []

    def writer(idx: int) -> None:
        try:
            base = idx * 1000
            for b in range(n_batches):
                rows = [
                    ("I" if b == 0 else "U", b * 100 + i, base + i, b)
                    for i in range(keys_per)
                ]
                tables[idx].merge(
                    spark.createDataFrame(rows, SCHEMA),
                    batch_id=b,
                    writer_id=f"w{idx}",
                )
        except BaseException as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(2)]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=300)
    assert not errors, errors

    expect = {
        idx * 1000 + i: n_batches - 1 for idx in range(2) for i in range(keys_per)
    }
    _check_invariants(tables[0], expect)
    # both writers' txn markers survived the interleaving
    m = tables[0]._read_manifest()
    assert m["txn"] == {"w0": n_batches - 1, "w1": n_batches - 1}


def test_gc_grace_keeps_old_reader_plans_alive(spark, tmp_path):
    """With the default grace window, a snapshot DataFrame captured before a
    merge still collects afterwards (its files linger in the gc ledger); with
    grace 0 the superseded dirs are gone immediately."""
    path = str(tmp_path / "t")
    t = PKTable(spark, path, keys=["k"], order_by=["seq"], n_buckets=2)
    t.merge(spark.createDataFrame([("I", 0, 1, 10), ("I", 1, 2, 20)], SCHEMA),
            batch_id=0, writer_id="w")
    old_snap = t.snapshot()  # plan pins the v1 bucket dirs
    t.merge(spark.createDataFrame([("U", 2, 1, 11), ("U", 3, 2, 21)], SCHEMA),
            batch_id=1, writer_id="w")
    # old plan still readable (stale data, but no FileNotFound)
    assert {r["v"] for r in old_snap.collect()} == {10, 20}
    assert {r["v"] for r in t.snapshot().collect()} == {11, 21}
    # the superseded dirs are ledgered, not orphaned
    m = t._read_manifest()
    assert m["gc"], "superseded dirs should be pending GC"
    referenced = set(m["buckets"].values()) | {e["dir"] for e in m["gc"]}
    assert _on_disk_bucket_dirs(t.path) <= referenced
