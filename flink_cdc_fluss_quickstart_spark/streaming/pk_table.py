"""Bucketed primary-key table store: the engine's Fluss/Paimon analogue.

The reference keeps every staging/serving table as a PK (upsert) table,
hash-bucketed 4 ways, with a lakehouse (parquet) representation kept fresh by
a tiering job (tickets-cdc.sql:23-37 'bucket.num'='4'; flink-gen.sh:118-142
Paimon 'merge-engine'='deduplicate'; deploy:316-358 tiering). This module
collapses those three roles into one structure, Spark-first:

- data lives as parquet, hash-bucketed by key (`pmod(xxhash64(pk), n)`),
- a tiny JSON manifest pins, per bucket, the current data directory --
  readers see an atomic snapshot; writers only rewrite CHANGED buckets
  (the 100 TB property: a micro-batch touching 2 of 1024 buckets rewrites
  2/1024ths of the table, not all of it),
- the manifest records the last applied `batch_id` per writer id, making
  foreachBatch upserts idempotent under replay -- the exactly-once story
  (reference: EXACTLY_ONCE checkpointing, tickets-cdc.sql:2-5) without
  requiring a transactional table format on the test host. In production
  the same interface maps 1:1 onto Delta/Iceberg MERGE.

Batch reads of the table ARE the "lakehouse" surface: plain parquet scans
with partition/bucket pruning available to Catalyst. Two further lakehouse
semantics ride the same manifest:

- **time travel**: the manifest keeps per-commit bucket-pointer deltas, so
  `snapshot(version=)` / `snapshot_at_batch(writer, batch)` reconstruct any
  retained past state (Iceberg snapshot reads; expiry via GC grace +
  HISTORY_KEEP, expired reads raise rather than silently mis-answer),
- **writer fencing**: each handle claims a writer epoch at its first write
  (an O_EXCL marker file, atomic across processes); a commit from a
  superseded epoch raises StaleWriterError -- the single-active-engine
  contract enforced, not just documented (production: Delta/Iceberg
  optimistic-commit conflicts).

**Delta ingest (the LSM half of the Paimon analogue).** `merge()` folds
each affected bucket by reading and rewriting it -- correct, but a
uniformly-hashed batch touches every bucket, so merge cost is O(table)
per batch at any bucket count (measured r13: ingesting a fixed 500-doc
band batch into a 1.2M-row index cost exactly a full rebuild). Paimon's
answer is an LSM tree INSIDE each bucket: ingests append level-0 delta
files, reads merge-on-read, compaction folds periodically. `ingest()` is
that path here: the batch is written as new per-bucket DELTA files (cost
O(|batch|), nothing existing read or rewritten), registered in the same
manifest under composite pointer keys (`"<bucket>#d<version>"` -- so
time travel, history replay, GC grace, fencing and txn idempotence all
ride the existing machinery unchanged), and `snapshot()` resolves
base+deltas with a latest-per-key merge-on-read keyed by commit version.
`compact()` (auto-triggered past `compact_threshold` deltas per bucket)
folds deltas back into the base -- amortizing the rewrite over many
ingests instead of paying it on every one. Tables never ingested into
have no composite keys and keep the exact pre-delta read path.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import threading
import time
from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from flink_cdc_fluss_quickstart_spark.operators.changelog import (
    OP_DELETE,
    latest_by_key,
)

MANIFEST = "manifest.json"

# Commit-history retention: the manifest keeps the bucket-pointer deltas of
# the most recent commits so `snapshot(version=)` can reconstruct earlier
# table states (the lakehouse time-travel surface; production analogue is the
# Iceberg metadata log / Delta commit log). Older entries are pruned and the
# readable floor advances -- Iceberg's expire_snapshots. Reading a pruned or
# GC-expired version raises instead of silently returning a wrong state.
HISTORY_KEEP = 512


class StaleWriterError(RuntimeError):
    """A commit was attempted by a PKTable handle whose writer epoch has been
    superseded: another handle (a second engine over the same warehouse)
    claimed the table since this handle's first write. The single-active-
    engine contract is enforced at two points -- commit entry (_fence) and
    again immediately before the manifest swap (_write_manifest) -- so a
    stale committer fails fast instead of silently interleaving manifests,
    even when supersession lands mid-way through its Spark write job. The
    residual window is the microseconds between the final re-check and
    os.replace; in production this maps onto the table format's own
    transaction protocol (Delta/Iceberg optimistic commit conflict), which
    closes it entirely."""

# Superseded bucket directories linger this long before removal: a reader
# that planned against an older manifest (a concurrent refresh job, a
# captured snapshot DataFrame) keeps resolving its files. The production
# analogue is table-format snapshot expiry (Delta VACUUM retention / Iceberg
# expire_snapshots); immediate deletion is available via gc_grace_secs=0.
GC_GRACE_SECS = 300.0

# Per-table-path commit locks: independent streaming queries (e.g. the
# tickets and movies pipelines refreshing one serving table) run foreachBatch
# callbacks on different driver threads; an unlocked read-modify-write of the
# manifest could interleave and lose bucket pointers / txn markers. All
# writers in this process serialize commits per table path; a multi-driver
# production deployment maps this onto the table format's own transaction
# protocol (Delta/Iceberg optimistic commit).
_COMMIT_LOCKS: dict[str, threading.RLock] = {}
_COMMIT_LOCKS_GUARD = threading.Lock()


def _commit_lock(path: str) -> threading.RLock:
    key = os.path.realpath(path)
    with _COMMIT_LOCKS_GUARD:
        return _COMMIT_LOCKS.setdefault(key, threading.RLock())


def _bucket_expr(keys: Sequence[str], n_buckets: int) -> F.Column:
    return F.pmod(F.xxhash64(*[F.col(k) for k in keys]), F.lit(n_buckets)).cast("int")


# on-disk (compressed) pending-delta bytes up to which the merge-on-read
# anti join broadcasts its distinct delta-key side; above it the join pins
# sort-merge. Sized well under the session's 64m autoBroadcastJoinThreshold:
# the key projection of 32 MiB of columnar delta decompresses toward the
# threshold, never past the r15 audit's observed 2x overshoot regime.
DELTA_BROADCAST_MAX_BYTES = 32 * 1024 * 1024


def _bucket_colocate(df: DataFrame, n_partitions: int) -> DataFrame:
    """Hash-shuffle the write set so every bucket's rows land in ONE task
    -- hence ONE file per bucket dir per commit (Paimon's sorted-run /
    bucketed-sink shape: writer parallelism is bounded by the bucket
    count, by design). Without it, ``partitionBy('__bucket')`` has every
    upstream partition write its own sliver into every bucket dir -- up
    to shuffle-partitions files PER BUCKET per commit. The r15
    point-serve audit measured the consequence: an 8-key lookup against
    a 64-bucket table opened 256 files and barely beat a full-scan
    filter; with one file per bucket it opens <= 8. Per-bucket FILE
    count, not bucket count, dominates point-read open cost. The shuffle
    this adds moves only the rows being rewritten (bucket-bounded for
    merge/compact; the full set for overwrite/rescale, which are
    table-sized rewrites anyway), and parquet/orc row groups keep the
    bigger per-bucket files scan-splittable."""
    return df.repartition(max(1, n_partitions), "__bucket")


def _dir_bytes(dirs: Sequence[str]) -> int:
    """Total on-disk bytes under ``dirs`` -- filesystem metadata only, the
    same true-size signal compaction thresholds use; never reads data."""
    total = 0
    for d in dirs:
        for root, _subdirs, files in os.walk(d):
            for f in files:
                try:
                    total += os.path.getsize(os.path.join(root, f))
                except OSError:
                    pass  # concurrently GC'd file: size 0 is the safe read
    return total


class PKTable:
    """A hash-bucketed upsert table rooted at ``path``.

    Schema contract: ``merge`` and ``ingest`` consume changelog batches
    carrying the payload columns plus ``op`` ('I'/'U'/'D') and the ordering
    columns; the resolved snapshot holds payload columns only (latest row
    per key, deletes absent). merge folds affected buckets eagerly
    (O(bucket) per touched bucket); ingest appends per-bucket delta files
    (O(|batch|), merge-on-read, compaction amortizes the fold) -- see the
    module docstring's delta-ingest section for when each pays off.
    Reads: ``snapshot()`` (full table / time travel) and ``lookup(probe)``
    (bucket-pruned point read of the probed keys -- the Fluss PK-table
    serving shape its 'bucket.num' exists for). Maintenance: ``compact()``
    (fold pending deltas) and ``rescale(n)`` (offline bucket-count rewrite,
    Paimon's rescale-bucket procedure -- the serving lever for a table
    that outgrew its creation-time count).
    """

    def __init__(self, spark: SparkSession, path: str, keys: Sequence[str],
                 order_by: Sequence[str], n_buckets: int = 4,
                 gc_grace_secs: float = GC_GRACE_SECS,
                 data_format: str = "parquet") -> None:
        self.spark = spark
        self.path = path
        self.keys = list(keys)
        self.order_by = list(order_by)
        self.n_buckets = n_buckets
        self.gc_grace_secs = gc_grace_secs
        # lake format: the reference deploys Paimon OR Iceberg tiering
        # (deploy:316-358) behind one table interface; the analogue here is
        # a second Spark-native columnar format behind the SAME manifest/
        # bucket/txn machinery -- every semantic (atomic snapshot swap,
        # bucket pruning, idempotent txns, GC grace) is format-agnostic
        if data_format not in ("parquet", "orc"):
            raise ValueError(f"unsupported data_format: {data_format!r}"
                             " (parquet and orc are the Spark-native columnar stores)")
        self.data_format = data_format
        # writer-epoch fence state: claimed lazily at this handle's FIRST
        # write (a read-only handle never claims), checked at every commit
        self._epoch: int | None = None
        os.makedirs(path, exist_ok=True)
        if not os.path.exists(self._manifest_path):
            self._write_manifest(
                {"buckets": {}, "txn": {}, "version": 0, "n_buckets": n_buckets,
                 "format": data_format, "history": [], "history_floor": 0}
            )
        else:
            # bucket count and lake format are CREATION-time table properties
            # (the reference's 'bucket.num', tickets-cdc.sql:34): reopening
            # with a different ctor value must not re-route keys -- a merge
            # would rewrite only the new-numbered bucket and the key's old
            # row survives in the old one (duplicate PKs with no error) --
            # or misread existing files. Adopt the stored values.
            stored = self._read_manifest()
            if stored.get("n_buckets") is not None:
                self.n_buckets = stored["n_buckets"]
            self.data_format = stored.get("format", "parquet")

    # -- manifest ---------------------------------------------------------

    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.path, MANIFEST)

    def _read_manifest(self) -> dict:
        with open(self._manifest_path) as f:
            m = json.load(f)
        # adopt a rescale() committed through ANOTHER handle: bucket count
        # is a table property owned by the manifest, and a handle that kept
        # hashing with a stale count would write rows into buckets the
        # current map does not route reads to. Every read/write path reads
        # the manifest first (writers under the commit lock), so adopting
        # here keeps self.n_buckets correct everywhere without per-site
        # refreshes.
        if m.get("n_buckets") is not None:
            self.n_buckets = m["n_buckets"]
        return m

    def _write_manifest(self, m: dict) -> None:
        # last line of defense for the writer fence (T4): the commit-entry
        # _fence() check can be seconds stale by the time the Spark write job
        # finishes, and last-writer-wins os.replace would clobber a rival
        # engine's committed manifest. Re-checking here shrinks the lost-
        # commit window from a whole write job to the microseconds between
        # this check and the rename. A raise at this point leaves at most an
        # orphaned, never-referenced v-dir on disk -- no manifest damage.
        if self._epoch is not None and self._latest_epoch() > self._epoch:
            raise StaleWriterError(
                f"writer epoch {self._epoch} superseded by"
                f" {self._latest_epoch()} at {self.path} during commit:"
                " another engine claimed this table mid-write; aborting"
                " before the manifest swap"
            )
        # WRITER-UNIQUE tmp file (r15 fence-race find): a shared '.tmp'
        # name lets two processes creating the same table concurrently
        # rename each other's half-written file into place (a torn
        # manifest every reader then crashes on) or crash on the vanished
        # tmp. mkstemp + os.replace makes the swap last-writer-wins atomic
        # with no shared intermediate. In-grace commits still serialize
        # under the commit lock / writer fence; this protects the one
        # unfenced write -- first-open manifest creation.
        fd, tmp = tempfile.mkstemp(
            prefix=MANIFEST + ".", suffix=".tmp", dir=self.path
        )
        try:
            with os.fdopen(fd, "w") as f:
                json.dump(m, f, indent=1)
            os.replace(tmp, self._manifest_path)  # atomic snapshot swap
        except BaseException:
            try:
                os.unlink(tmp)
            except OSError:
                pass
            raise

    # -- writer-epoch fence -------------------------------------------------

    @property
    def _epoch_dir(self) -> str:
        return os.path.join(self.path, "_epochs")

    def _latest_epoch(self) -> int:
        try:
            names = os.listdir(self._epoch_dir)
        except FileNotFoundError:
            return 0
        return max(
            (int(n[6:]) for n in names if n.startswith("epoch.")), default=0
        )

    def _fence(self) -> None:
        """Claim this handle's writer epoch on first write (an O_EXCL marker
        file, atomic even across processes -- no JSON read-modify-write);
        afterwards fail fast whenever a NEWER epoch exists: the table was
        claimed by another engine and this handle must not commit again."""
        if self._epoch is None:
            os.makedirs(self._epoch_dir, exist_ok=True)
            n = self._latest_epoch() + 1
            while True:
                try:
                    fd = os.open(
                        os.path.join(self._epoch_dir, f"epoch.{n}"),
                        os.O_CREAT | os.O_EXCL | os.O_WRONLY,
                    )
                    os.close(fd)
                    break
                except FileExistsError:  # lost the claim race; take the next
                    n += 1
            self._epoch = n
            # Deliberately NO cleanup of older markers: unlinking a smaller
            # epoch re-opens it for O_EXCL creation, so a lagging claimer
            # could re-claim an epoch another process already holds
            # (found by tests/test_pk_table_fence.py's 8-process race --
            # duplicates stayed SAFE, since a duplicated epoch can never be
            # the max and both holders fail the staleness check, but epoch
            # numbers lost uniqueness as writer identities). Markers
            # accumulate one tiny file per ENGINE CLAIM (a rare handoff
            # event, not per commit), so the dir stays small forever.
            return
        latest = self._latest_epoch()
        if latest > self._epoch:
            raise StaleWriterError(
                f"writer epoch {self._epoch} superseded by {latest} at"
                f" {self.path}: another engine claimed this table; this"
                " handle must not commit (single-active-engine contract)"
            )

    # -- read -------------------------------------------------------------

    def snapshot(self, version: int | None = None) -> DataFrame | None:
        """Table state as a DataFrame (None when empty).

        ``version=N`` time-travels to the state right after manifest version
        N was committed (the lakehouse snapshot-read surface; version 0 is
        the empty table). Past states stay readable while their superseded
        bucket dirs survive GC grace and their history entries retention --
        a pruned/expired version raises instead of returning a wrong state,
        exactly Iceberg's expire_snapshots contract.
        """
        m = self._read_manifest()
        if version is None:
            buckets = m["buckets"]
        else:
            buckets = self._buckets_at(m, version)
        dirs = [os.path.join(self.path, d) for d in buckets.values()]
        if version is not None:
            gone = [d for d in dirs if not os.path.exists(d)]
            if gone:
                raise ValueError(
                    f"snapshot v{version} expired: data dirs {gone} were"
                    " garbage-collected (raise gc_grace_secs to retain"
                    " longer time-travel windows)"
                )
        base_dirs = [
            os.path.join(self.path, d)
            for k, d in buckets.items() if "#" not in k
        ]
        delta_dirs = [
            os.path.join(self.path, d)
            for k, d in buckets.items() if "#" in k
        ]
        base_dirs = [d for d in base_dirs if os.path.exists(d)]
        delta_dirs = [d for d in delta_dirs if os.path.exists(d)]
        if not delta_dirs:
            # pre-delta fast path: pure pruned scan, byte-identical to the
            # behavior every table had before ingest() existed
            if not base_dirs:
                return None
            return self.spark.read.format(self.data_format).load(base_dirs)
        return self._resolve_dirs(base_dirs, delta_dirs)

    def lookup(self, probe: DataFrame, version: int | None = None) -> DataFrame | None:
        """Bucket-pruned point read -- the Fluss PK-table lookup serving
        shape (the reference's tables declare 'bucket.num' for exactly
        this, flink-gen.sh:118-142): resolve ONLY the buckets the probed
        keys hash into and return those keys' current rows.

        Cost: hash the probe keys to bucket ids (row-local), one
        driver-side distinct bounded by n_buckets scalars, a scan of the
        touched buckets' base + pending delta files, and one left-semi
        join. A k-key lookup against an N-bucket table reads at most
        min(k, N)/N of it -- at 100 TB that is the difference between a
        point read and a table scan -- and nothing table-sized shuffles
        (the delta fold is the anti/union resolve). Missing keys have no
        row; keys whose latest delta is a delete resolve to absent.
        ``version`` time-travels like snapshot().

        "No rows" is always a zero-row DataFrame in the table's schema --
        whether the probed keys are absent from live buckets or hash only
        into empty ones. None is returned ONLY when the table itself has
        no data dirs at all (nothing to source a schema from), matching
        snapshot()'s empty-table contract."""
        m = self._read_manifest()
        if version is None:
            buckets, nb = m["buckets"], self.n_buckets
        else:
            # a read at a pre-rescale version must hash the probe with the
            # bucket count IN EFFECT at that version -- the current count
            # would route keys to buckets that did not exist then
            buckets = self._buckets_at(m, version)
            nb = self._n_buckets_at(m, version)
        # xxhash64 is TYPE-sensitive (hash(1 int) != hash(1 bigint)), so a
        # probe whose key columns arrive in a different-but-compatible type
        # would hash into the WRONG buckets and silently miss every row:
        # align the probe to the stored key types first (one footer read).
        schema_src = self._empty_frame(buckets)
        if schema_src is None:
            return None  # table has no data dirs at all: nothing to serve
        stored = {f.name: f.dataType for f in schema_src.schema.fields}
        # pin the probe key set before collecting the bucket ids: the same
        # materialized keys must feed BOTH the pruning collect and the semi
        # join below. A non-deterministic or transient probe (sampled /
        # rand-derived / a re-evaluated micro-batch) re-run differently
        # between the two would join keys whose buckets were never
        # selected -- silently missing rows. merge()/ingest() pin their
        # batch for the same reason.
        keysel = (
            probe.select(
                *[F.col(k).cast(stored[k]).alias(k) for k in self.keys]
            )
            .distinct()
            .localCheckpoint(eager=True)
        )
        wanted = {
            r["__b"]
            for r in keysel.select(
                _bucket_expr(self.keys, nb).alias("__b")
            ).distinct().collect()
        }
        sel = {
            k: d for k, d in buckets.items()
            if int(k.split("#", 1)[0]) in wanted
        }
        dirs = [os.path.join(self.path, d) for d in sel.values()]
        if version is not None:
            gone = [d for d in dirs if not os.path.exists(d)]
            if gone:
                raise ValueError(
                    f"snapshot v{version} expired: data dirs {gone} were"
                    " garbage-collected (raise gc_grace_secs to retain"
                    " longer time-travel windows)"
                )
        base_dirs = [
            os.path.join(self.path, d) for k, d in sel.items() if "#" not in k
        ]
        delta_dirs = [
            os.path.join(self.path, d) for k, d in sel.items() if "#" in k
        ]
        base_dirs = [d for d in base_dirs if os.path.exists(d)]
        delta_dirs = [d for d in delta_dirs if os.path.exists(d)]
        if not base_dirs and not delta_dirs:
            return schema_src  # every probed bucket empty: zero rows
        if not delta_dirs:
            resolved = self.spark.read.format(self.data_format).load(base_dirs)
        else:
            resolved = self._resolve_dirs(base_dirs, delta_dirs)
        # the semi join reorders the key columns first; serve the stored
        # column order so both "no rows" shapes and the hit path agree
        return resolved.join(keysel, list(self.keys), "left_semi").select(
            *schema_src.columns
        )

    def _empty_frame(self, buckets: dict) -> DataFrame | None:
        """Zero-row frame in the table's serving schema, sourced from any
        live data dir (base dirs preferred; a delta dir's internal
        __op/__dv columns are dropped). None only when the table has no
        data dirs at all -- the schema is unknowable then."""
        for k, d in sorted(buckets.items(), key=lambda kv: "#" in kv[0]):
            p = os.path.join(self.path, d)
            if os.path.exists(p):
                df = self.spark.read.format(self.data_format).load(p).limit(0)
                return df.drop("__op", "__dv") if "#" in k else df
        return None

    def _resolve_dirs(
        self, base_dirs: list[str], delta_dirs: list[str]
    ) -> DataFrame | None:
        """Merge-on-read over base + delta files: latest row per key by
        commit version (delta files carry their commit version in the
        stored `__dv` column; base rows are version 0 by construction --
        every delta postdates the base fold that preceded it), then drop
        delete markers.

        Shuffle discipline (the 100 TB shape of this read): base rows are
        unique per key AND always lose last-writer resolution to any delta
        row (base is version 0, every delta postdates it), so a base row
        only survives when NO delta touches its key. The read is therefore

            base ANTI-JOIN (distinct delta keys)  UNION  latest(deltas)

        -- ONE pruned scan of the base streaming through an anti join
        (broadcast when the delta key set is small, the daily-ingest case)
        and a window over the delta rows alone. Nothing table-sized is
        ever shuffled or windowed at any delta depth; the pre-r14 plan
        folded the whole base through the latest-by-key window, a
        full-table shuffle per snapshot read (A/B in SCALE.md)."""
        base = (
            self.spark.read.format(self.data_format).load(base_dirs)
            if base_dirs else None
        )
        deltas = (
            self.spark.read.format(self.data_format).load(delta_dirs)
            if delta_dirs else None
        )
        if deltas is None:
            return base
        resolved = (
            latest_by_key(deltas, self.keys, ["__dv"])
            .filter(F.col("__op") != OP_DELETE)
            .drop("__op", "__dv")
        )
        if base is None:
            return resolved
        dkeys = deltas.select(*self.keys).distinct()
        # join-strategy pin, gated on the TRUE on-disk delta size (r15
        # audit, tools/audit_delta_read.py --wide): the distinct delta-key
        # frame is an aggregate over a pruned scan -- the static estimate
        # undershoots so badly that the planner (and even the AQE-final
        # plan) broadcast a 16M-key build side at 2x the 64m threshold.
        # Daily-ingest deltas broadcast (the designed-for case: no exchange
        # added over the compacted fast path); a bulk-backfill backlog pins
        # sort-merge -- the only shape whose memory stays partition-bounded
        # when the backlog scales with the table.
        if _dir_bytes(delta_dirs) <= DELTA_BROADCAST_MAX_BYTES:
            dkeys = F.broadcast(dkeys)
        else:
            dkeys = dkeys.hint("merge")
        return base.join(dkeys, list(self.keys), "left_anti").unionByName(resolved)

    def version_at(self, ts: float) -> int:
        """The largest committed version whose commit time is <= ``ts`` --
        the timestamp half of the time-travel surface (Iceberg's
        snapshot-as-of-timestamp resolution over committed_at).

        Edges: ``ts`` between two commits resolves to the EARLIER one (the
        state a reader at that wall-clock instant saw); ``ts`` before the
        first commit ever resolves to version 0, the empty table; ``ts``
        older than the retained history (or predating commit timestamping)
        raises as expired -- never mis-answers with a guessed state."""
        m = self._read_manifest()
        hist = m.get("history", [])
        stamped = [e for e in hist if e.get("ts") is not None]
        at_or_before = [e["v"] for e in stamped if e["ts"] <= ts]
        if at_or_before:
            return max(at_or_before)
        # ts precedes every stamped commit: only safe to call it "the empty
        # table" when history provably reaches back to the very first commit
        # (v1 retained AND stamped -- an unstamped or truncated head means
        # the real state at ts is unknowable from this manifest)
        if stamped and hist[0]["v"] == 1 and hist[0].get("ts") is not None:
            return 0
        raise ValueError(
            f"no commit history resolves timestamp {ts}: history is"
            f" retained back to v{m.get('history_floor', 0) + 1}"
            " (or predates commit timestamping); raise HISTORY_KEEP or"
            " query by VERSION AS OF instead"
        )

    def _buckets_at(self, m: dict, version: int) -> dict[str, str]:
        """Reconstruct the bucket-pointer map as of manifest `version` by
        walking the commit history backwards from the current map, undoing
        each later commit's recorded deltas."""
        if version > m["version"] or version < 0:
            raise ValueError(
                f"unknown version {version} (current is {m['version']})"
            )
        # a legacy manifest (written before commit history existed) can
        # reconstruct NO earlier version; treating its missing floor as 0
        # would silently return the current bucket map labeled as version N.
        # Expired reads must raise, never mis-answer.
        floor = m.get(
            "history_floor", m["version"] if "history" not in m else 0
        )
        if version < floor:
            raise ValueError(
                f"snapshot v{version} expired: history retained back to"
                f" v{floor} only (HISTORY_KEEP commits)"
            )
        buckets = dict(m["buckets"])
        for e in sorted(m.get("history", []), key=lambda e: -e["v"]):
            if e["v"] <= version:
                break
            for b, old in e["changed"].items():
                if old is None:
                    buckets.pop(b, None)
                else:
                    buckets[b] = old
        return buckets

    def _n_buckets_at(self, m: dict, version: int) -> int:
        """The bucket count in effect at manifest ``version`` -- the same
        backwards history walk as _buckets_at, undoing each later rescale
        commit (the only commit kind that records an ``nb`` field: the
        PRE-rescale count). Bounds/floor checks ride on _buckets_at, which
        every caller runs first."""
        nb = m.get("n_buckets", self.n_buckets)
        for e in sorted(m.get("history", []), key=lambda e: -e["v"]):
            if e["v"] <= version:
                break
            if e.get("nb") is not None:
                nb = e["nb"]
        return nb

    def snapshot_at_batch(self, writer_id: str, batch_id: int) -> DataFrame | None:
        """Read-at-batch: the table state right after `writer_id` committed
        `batch_id` (the newest data commit from that writer at or below the
        id -- empty batches advance the txn watermark without a version)."""
        m = self._read_manifest()
        versions = [
            e["v"]
            for e in m.get("history", [])
            if e.get("writer") == writer_id and e.get("batch") is not None
            and e["batch"] <= batch_id
        ]
        if not versions:
            raise ValueError(
                f"no retained commit from writer {writer_id!r} at or below"
                f" batch {batch_id} (history floor v{m.get('history_floor', 0)})"
            )
        return self.snapshot(version=max(versions))

    def _record_commit(self, m: dict, version: int, writer_id: str | None,
                       batch_id: int | None, changed: dict) -> None:
        # first commit over a legacy (pre-history) manifest: versions below
        # the previous one are unreconstructable -- pin the floor there so
        # they raise as expired instead of walking a partial history
        if "history" not in m:
            m["history_floor"] = max(m.get("history_floor", 0), version - 1)
        hist = m.get("history", [])
        # commit wall-clock: the FOR SYSTEM_TIME AS OF resolution index
        # (Iceberg snapshots record committed_at the same way); monotonicity
        # is enforced so a clock step-back can never make a LATER commit
        # resolve to an EARLIER timestamp (which would break version_at's
        # "largest version at-or-before ts" contract)
        ts = time.time()
        if hist and hist[-1].get("ts") is not None:
            ts = max(ts, hist[-1]["ts"])
        hist.append(
            {"v": version, "writer": writer_id, "batch": batch_id,
             "changed": changed, "ts": ts}
        )
        if len(hist) > HISTORY_KEEP:
            dropped = hist[: len(hist) - HISTORY_KEEP]
            hist = hist[len(hist) - HISTORY_KEEP:]
            m["history_floor"] = max(
                m.get("history_floor", 0), max(e["v"] for e in dropped)
            )
        m["history"] = hist

    def last_batch_id(self, writer_id: str) -> int:
        return self._read_manifest()["txn"].get(writer_id, -1)

    # -- write ------------------------------------------------------------

    def merge(self, changes: DataFrame, batch_id: int | None = None,
              writer_id: str = "default", op_col: str = "op") -> None:
        """Apply a changelog micro-batch: upsert I/U rows, drop D keys.

        Idempotent per (writer_id, batch_id): replays of an already-applied
        batch are no-ops, giving exactly-once results over at-least-once
        delivery (K4/T4 semantics). Streaming callers MUST pass foreachBatch's
        batch_id so replays dedupe; batch callers may omit it, which
        auto-increments past the writer's last applied batch (an omitted id
        must never silently no-op a new batch).

        Commits serialize per table path (see _commit_lock), so concurrent
        pipelines merging into one serving table cannot interleave
        manifest updates.
        """
        with _commit_lock(self.path):
            self._merge_locked(changes, batch_id, writer_id, op_col)

    def _merge_locked(self, changes: DataFrame, batch_id: int | None,
                      writer_id: str, op_col: str) -> None:
        self._fence()
        m = self._read_manifest()
        if any("#" in k for k in m["buckets"]):
            # pending delta files: fold them first so the bucket rewrite
            # below sees every committed row (merge reads base dirs only)
            self._compact_locked()
            m = self._read_manifest()
        if batch_id is None:
            batch_id = m["txn"].get(writer_id, -1) + 1
        if m["txn"].get(writer_id, -1) >= batch_id:
            return

        # collapse the batch itself first (a batch may touch a key twice)
        batch_latest = latest_by_key(changes, self.keys, self.order_by)
        batch_latest = batch_latest.withColumn(
            "__bucket", _bucket_expr(self.keys, self.n_buckets)
        ).localCheckpoint(eager=True)  # pin: source micro-batch is transient

        # driver-side collect is bounded by n_buckets (one int per DISTINCT
        # bucket, never per row): <= 4 values here, <= a few thousand at a
        # realistic production bucket count -- metadata-sized by construction
        affected = [
            r["__bucket"]
            for r in batch_latest.select("__bucket").distinct().collect()
        ]
        if not affected:
            m["txn"][writer_id] = batch_id
            self._write_manifest(m)
            return

        version = m["version"] + 1
        payload_cols = [c for c in batch_latest.columns
                        if c not in (op_col, "__bucket")]

        # union the CURRENT state of only the affected buckets (bucket
        # pruning: untouched buckets are never read or rewritten) with the
        # batch, take latest per key, drop deleted keys
        old_dirs = [
            os.path.join(self.path, m["buckets"][str(b)])
            for b in affected
            if str(b) in m["buckets"]
        ]
        old_dirs = [d for d in old_dirs if os.path.exists(d)]
        batch_rows = batch_latest.drop("__bucket").withColumn("__gen", F.lit(1))
        if old_dirs:
            old = (
                self.spark.read.format(self.data_format).load(old_dirs)
                .withColumn(op_col, F.lit("I"))
                .withColumn("__gen", F.lit(0))
            )
            merged = latest_by_key(
                old.unionByName(batch_rows), self.keys, ["__gen"]
            )
        else:
            merged = batch_rows
        result = (
            merged.filter(F.col(op_col) != OP_DELETE)
            .select(*payload_cols)
            .withColumn("__bucket", _bucket_expr(self.keys, self.n_buckets))
        )
        # ONE partitioned write job for all affected buckets -- co-located
        # so each bucket lands as ONE file (see _bucket_colocate: the r15
        # point-serve audit found per-bucket file counts, not bucket
        # counts, dominating lookup open cost)
        result = _bucket_colocate(result, len(affected))
        vdir = f"v{version}"
        result.write.partitionBy("__bucket").mode("overwrite").format(
            self.data_format
        ).save(os.path.join(self.path, vdir))

        superseded = [
            m["buckets"][str(b)] for b in affected if str(b) in m["buckets"]
        ]
        # history delta BEFORE the pointer swap: bucket -> prior dir (None =
        # bucket did not exist), enough to undo this commit on a time-travel
        # read
        changed = {str(b): m["buckets"].get(str(b)) for b in affected}
        for b in affected:
            bdir = os.path.join(vdir, f"__bucket={b}")
            if os.path.exists(os.path.join(self.path, bdir)):
                m["buckets"][str(b)] = bdir
            else:
                # the merge deleted every key in this bucket: no partition
                # dir was written, so drop the pointer rather than leave it
                # dangling (a versioned read must only see real dirs)
                m["buckets"].pop(str(b), None)
        m["version"] = version
        m["txn"][writer_id] = batch_id
        self._record_commit(m, version, writer_id, batch_id, changed)
        expired = self._queue_gc(m, superseded)
        self._write_manifest(m)
        for d in expired:
            shutil.rmtree(os.path.join(self.path, d), ignore_errors=True)

    # -- delta ingest (LSM write path) --------------------------------------

    def ingest(self, changes: DataFrame, batch_id: int | None = None,
               writer_id: str = "default", op_col: str = "op",
               compact_threshold: int = 8) -> None:
        """Append a micro-batch as per-bucket DELTA files -- O(|batch|)
        write cost, nothing existing read or rewritten (vs merge(), whose
        bucket folds cost O(table) for a uniformly-hashed batch). Reads
        resolve base+deltas latest-per-key by commit version (same
        last-writer-wins rule as merge's __gen fold); delete ops are
        retained as markers until compaction. Idempotent per
        (writer_id, batch_id), fenced, time-travelable -- identical
        guarantees to merge because the delta pointers live in the same
        manifest maps the existing machinery replays.

        When any bucket accumulates more than ``compact_threshold`` deltas,
        compaction folds them into the base in ONE rewrite -- amortizing
        the table rewrite over that many ingests (Paimon's in-bucket LSM,
        num-sorted-run.compaction-trigger). The day-2 serving-index path:
        a daily band/code batch lands at batch cost every day, and the
        full-table cost is paid once per threshold-many days."""
        with _commit_lock(self.path):
            self._ingest_locked(changes, batch_id, writer_id, op_col,
                                compact_threshold)

    def _ingest_locked(self, changes: DataFrame, batch_id: int | None,
                       writer_id: str, op_col: str,
                       compact_threshold: int) -> None:
        # unlike merge()'s transient use, ingest PERSISTS __op/__dv/__bucket
        # into the delta files as merge-on-read metadata -- a payload column
        # with one of these names would corrupt resolution, so refuse it
        reserved = {"__op", "__dv", "__bucket"} & (set(changes.columns) - {op_col})
        if reserved:
            raise ValueError(
                f"ingest payload columns {sorted(reserved)} collide with the"
                " delta files' reserved merge-on-read columns"
                " (__op/__dv/__bucket); rename them before ingesting"
            )
        self._fence()
        m = self._read_manifest()
        if batch_id is None:
            batch_id = m["txn"].get(writer_id, -1) + 1
        if m["txn"].get(writer_id, -1) >= batch_id:
            return

        batch_latest = latest_by_key(changes, self.keys, self.order_by)
        batch_latest = batch_latest.withColumn(
            "__bucket", _bucket_expr(self.keys, self.n_buckets)
        ).localCheckpoint(eager=True)
        affected = [
            r["__bucket"]
            for r in batch_latest.select("__bucket").distinct().collect()
        ]
        if not affected:
            m["txn"][writer_id] = batch_id
            self._write_manifest(m)
            return

        version = m["version"] + 1
        vdir = f"v{version}"
        payload_cols = [c for c in batch_latest.columns
                        if c not in (op_col, "__bucket")]
        out = (
            batch_latest.select(
                *payload_cols, F.col(op_col).alias("__op"), "__bucket"
            )
            .withColumn("__dv", F.lit(version).cast("long"))
        )
        # ONE file per touched bucket per delta commit (Paimon's
        # one-sorted-run-per-commit); the batch is |batch|-sized, so
        # collapsing write parallelism to the touched-bucket count costs
        # nothing -- see _bucket_colocate, which the base-write paths
        # share since the r15 point-serve audit.
        out = _bucket_colocate(out, len(affected))
        out.write.partitionBy("__bucket").mode("overwrite").format(
            self.data_format
        ).save(os.path.join(self.path, vdir))

        changed: dict = {}
        for b in affected:
            bdir = os.path.join(vdir, f"__bucket={b}")
            if os.path.exists(os.path.join(self.path, bdir)):
                key = f"{b}#d{version}"
                m["buckets"][key] = bdir
                changed[key] = None  # new pointer: undo = pop
        m["version"] = version
        m["txn"][writer_id] = batch_id
        self._record_commit(m, version, writer_id, batch_id, changed)
        self._write_manifest(m)

        depth: dict[str, int] = {}
        for k in m["buckets"]:
            if "#" in k:
                b = k.split("#", 1)[0]
                depth[b] = depth.get(b, 0) + 1
        if depth and max(depth.values()) > compact_threshold:
            self._compact_locked()

    def compact(self) -> None:
        """Fold every pending delta file into its bucket's base -- the LSM
        compaction. A no-op without deltas; otherwise one commit that
        rewrites exactly the buckets holding deltas. Superseded base and
        delta dirs keep their GC grace, so time travel across the
        compaction boundary keeps working."""
        with _commit_lock(self.path):
            self._compact_locked()

    def _compact_locked(self) -> None:
        self._fence()
        m = self._read_manifest()
        delta_keys = sorted(k for k in m["buckets"] if "#" in k)
        if not delta_keys:
            return
        affected = sorted({int(k.split("#", 1)[0]) for k in delta_keys})
        base_dirs = [
            os.path.join(self.path, m["buckets"][str(b)])
            for b in affected if str(b) in m["buckets"]
        ]
        base_dirs = [d for d in base_dirs if os.path.exists(d)]
        delta_dirs = [os.path.join(self.path, m["buckets"][k]) for k in delta_keys]
        delta_dirs = [d for d in delta_dirs if os.path.exists(d)]
        resolved = self._resolve_dirs(base_dirs, delta_dirs)

        version = m["version"] + 1
        vdir = f"v{version}"
        if resolved is not None:
            result = resolved.withColumn(
                "__bucket", _bucket_expr(self.keys, self.n_buckets)
            )
            result = _bucket_colocate(result, len(affected))
            result.write.partitionBy("__bucket").mode("overwrite").format(
                self.data_format
            ).save(os.path.join(self.path, vdir))

        changed: dict = {}
        superseded: list[str] = []
        for b in affected:
            prior = m["buckets"].get(str(b))
            changed[str(b)] = prior
            if prior is not None:
                superseded.append(prior)
            bdir = os.path.join(vdir, f"__bucket={b}")
            if os.path.exists(os.path.join(self.path, bdir)):
                m["buckets"][str(b)] = bdir
            else:
                # every key in this bucket was deleted by the deltas
                m["buckets"].pop(str(b), None)
        for k in delta_keys:
            changed[k] = m["buckets"][k]
            superseded.append(m["buckets"][k])
            m["buckets"].pop(k)
        m["version"] = version
        self._record_commit(m, version, None, None, changed)
        expired = self._queue_gc(m, superseded)
        self._write_manifest(m)
        for d in expired:
            shutil.rmtree(os.path.join(self.path, d), ignore_errors=True)

    def _queue_gc(self, m: dict, superseded: Sequence[str]) -> list[str]:
        """Age-based GC: newly superseded dirs enter the manifest's `gc`
        ledger; entries older than `gc_grace_secs` are returned for removal
        (after the manifest swap, so a crash can only under-delete)."""
        now = time.time()
        pending = m.get("gc", []) + [{"dir": d, "ts": now} for d in superseded]
        keep: list[dict] = []
        expired: list[str] = []
        for e in pending:
            if now - e["ts"] >= self.gc_grace_secs:
                expired.append(e["dir"])
            else:
                keep.append(e)
        m["gc"] = keep
        return expired

    def overwrite(self, df: DataFrame) -> None:
        """Full snapshot replace (used for seeding / batch backfills)."""
        with _commit_lock(self.path):
            self._overwrite_locked(df)

    def _overwrite_locked(self, df: DataFrame) -> None:
        self._fence()
        m = self._read_manifest()
        version = m["version"] + 1
        vdir = f"v{version}"
        bucketed = df.withColumn("__bucket", _bucket_expr(self.keys, self.n_buckets))
        bucketed = _bucket_colocate(bucketed, self.n_buckets)
        bucketed.write.partitionBy("__bucket").mode("overwrite").format(
            self.data_format
        ).save(os.path.join(self.path, vdir))
        old = dict(m["buckets"])
        # register only the bucket dirs the write actually produced (a seed
        # whose rows hash into a subset of buckets writes only those
        # partitions; dangling pointers would break versioned reads)
        m["buckets"] = {
            str(b): os.path.join(vdir, f"__bucket={b}")
            for b in range(self.n_buckets)
            if os.path.exists(os.path.join(self.path, vdir, f"__bucket={b}"))
        }
        m["version"] = version
        self._record_commit(
            m, version, None, None,
            {b: old.get(b) for b in set(old) | set(m["buckets"])},
        )
        # a full replace starts a new txn epoch: keeping the per-writer
        # high-watermarks would silently no-op every merge from a stream
        # restarted with a fresh checkpoint (batch ids restart at 0), freezing
        # the table at the seed. Re-seeding + replay stays safe without them:
        # a replayed upsert re-applies the same latest-per-key rows.
        m["txn"] = {}
        # ...and the retained history must follow the txn reset: a restarted
        # stream reuses batch ids from 0, so pre-overwrite (writer, batch)
        # tags would let snapshot_at_batch silently answer a NEW-epoch probe
        # with an OLD-epoch state. Strip the tags (version time travel keeps
        # working -- the undo deltas are untouched); read-at-batch then only
        # matches commits from the current epoch.
        for e in m["history"][:-1]:
            e["writer"] = None
            e["batch"] = None
        expired = self._queue_gc(m, list(old.values()))
        self._write_manifest(m)
        for d in expired:
            shutil.rmtree(os.path.join(self.path, d), ignore_errors=True)

    def rescale(self, n_buckets: int) -> None:
        """Offline bucket rescale -- Paimon's documented rescale-bucket
        procedure (an offline full rewrite; Fluss/Paimon cannot rescale a
        PK table in place because bucket routing is the primary-key hash).
        At 100 TB this is THE serving lever: a k-key lookup() reads
        ~1/n_buckets of the table per probed key, so a table that grew 10x
        past its creation-time 'bucket.num' (tickets-cdc.sql:34) serves
        10x-too-coarse point reads until it is rescaled.

        One commit: the fully resolved snapshot (pending ingest deltas are
        folded -- the rewrite is table-sized anyway) is re-hashed into
        ``n_buckets`` buckets and swapped in atomically. Content is
        IDENTICAL before and after, so unlike overwrite() the per-writer
        txn watermarks and read-at-batch history tags survive: replayed
        batches still dedupe, snapshot_at_batch still answers. Time travel
        across the boundary keeps working -- the commit records the prior
        bucket pointers AND the prior bucket count (the ``nb`` history
        field), so versioned snapshot()/lookup() reads hash with the count
        in effect at that version. Superseded dirs keep their GC grace.
        Same-count rescale is a no-op (no version burned)."""
        if n_buckets < 1:
            raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
        with _commit_lock(self.path):
            self._rescale_locked(n_buckets)

    def _rescale_locked(self, n_buckets: int) -> None:
        self._fence()
        m = self._read_manifest()
        prev_nb = m.get("n_buckets", self.n_buckets)
        if n_buckets == prev_nb:
            return
        snap = self.snapshot()
        version = m["version"] + 1
        vdir = f"v{version}"
        if snap is not None:
            # one partitioned write job: shuffle-free up to the hash
            # partitioning the write itself needs -- every row moves at
            # most once, straight from the pruned scan to its new bucket
            bucketed = snap.withColumn(
                "__bucket", _bucket_expr(self.keys, n_buckets)
            )
            bucketed = _bucket_colocate(bucketed, n_buckets)
            bucketed.write.partitionBy("__bucket").mode("overwrite").format(
                self.data_format
            ).save(os.path.join(self.path, vdir))
        old = dict(m["buckets"])
        m["buckets"] = {
            str(b): os.path.join(vdir, f"__bucket={b}")
            for b in range(n_buckets)
            if os.path.exists(os.path.join(self.path, vdir, f"__bucket={b}"))
        }
        m["version"] = version
        m["n_buckets"] = n_buckets
        self._record_commit(
            m, version, None, None,
            {b: old.get(b) for b in set(old) | set(m["buckets"])},
        )
        # undo info for _n_buckets_at: reads at versions BEFORE this commit
        # hash with the pre-rescale count
        m["history"][-1]["nb"] = prev_nb
        expired = self._queue_gc(m, list(old.values()))
        self._write_manifest(m)
        self.n_buckets = n_buckets
        for d in expired:
            shutil.rmtree(os.path.join(self.path, d), ignore_errors=True)
