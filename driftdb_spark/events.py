"""The event log — DriftDB's core identity, Spark-first.

The reference stores every write as an immutable event
``{sequence, timestamp, event_type: Insert|Patch|SoftDelete, primary_key,
payload}`` and reconstructs table state by replay (reference
crates/driftdb-core/src/events.rs:5-20, storage/table_storage.rs:344-428).

Here the event log is an append-only parquet directory (stand-in for a Delta
table — Delta isn't in this container, but the layout is identical: a
sequence-ordered append log plus materialized snapshots). Reconstruction is
declarative DataFrame code, so Catalyst plans it and it scales with
partitions:

1. last Insert per PK (``max(seq)`` over inserts),
2. drop PKs whose last SoftDelete is at-or-after their last Insert,
3. fold Patch payloads *after* the last Insert in sequence order —
   field-level last-writer-wins merge, exactly the reference's
   ``apply_event`` merge semantics (table_storage.rs:369-389) — via
   ``aggregate(array_sort(collect_list(...)))``, bounded by per-key history.

Scale notes (100 TB discipline):
- Reconstruction shuffles once on PK; snapshots bound the replay tail the
  same way the reference's snapshots do (snapshot.rs:19-43).
- Sequence assignment is the one inherently serial point (same as the
  reference's per-table AtomicU64, table_storage.rs:212-261). We assign
  ``base + per-partition offset + intra-partition row_number`` — the
  zipWithIndex recipe expressed in DataFrame ops, so every partition
  numbers its rows in parallel and only the #partitions-row offset table
  passes through a single task. On a real cluster you'd use Delta commit
  versions; the API shape is unchanged.
- Appends are batch-atomic (reference buffered-txn apply-at-COMMIT,
  sql_bridge.rs:453-568, transaction.rs:25-120): the batch is staged under
  ``events/_staging-*`` (a leading underscore makes it invisible to
  Spark's file listing) and published with one directory rename. A write
  that dies mid-flight leaves only hidden staging files — ``state_at``
  never sees a torn batch.
"""

from __future__ import annotations

import contextlib
import errno
import fcntl
import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window as W

from driftdb_spark.temporal import AsOf, apply_asof, resolve_sequence_at

INSERT, PATCH, SOFT_DELETE = "INSERT", "PATCH", "SOFT_DELETE"


class ReadOnlyLog(RuntimeError):
    """Write attempted against a read-only (replica) log — the standby
    analog of PostgreSQL's `cannot execute ... in a read-only transaction`
    (reference replication.rs replicas serve reads only). Carries SQLSTATE
    25006 so the wire server reports it like a Postgres standby would."""

    sqlstate = "25006"


class ConcurrentAppendError(RuntimeError):
    """Two writers raced the same sequence range; the loser's batch was
    rolled back. Retry re-reads last_sequence and appends after the
    winner — the optimistic-concurrency protocol of a Delta commit,
    standing in for the reference's per-table lock + AtomicU64
    (table_storage.rs:212-261)."""

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("sequence", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("pk", T.StringType(), False),
        # Payload as map<string,string>: the reference's rows are dynamic
        # JSON objects (schemaless within a table — SURVEY §1.2); a string
        # map is the faithful typed-Spark equivalent for the DML surface.
        T.StructField("payload", T.MapType(T.StringType(), T.StringType()), True),
    ]
)


def _payload_map(df: DataFrame, pk_col: str) -> F.Column:
    cols = []
    for c in df.columns:
        cols.append(F.lit(c))
        cols.append(F.col(c).cast("string"))
    return F.map_from_arrays(
        F.array(*cols[::2]), F.array(*cols[1::2])
    )


def fold_events(ev: DataFrame) -> DataFrame:
    """Reconstruct visible state ``(pk, last_seq, last_ts, row)`` from an
    event frame — the reference's replay loop (table_storage.rs:344-428) as
    one declarative fold, shared by batch ``EventLog.state_at`` and the
    streaming micro-batch merge:

    1. last Insert per PK; 2. drop PKs whose last SoftDelete is at-or-after
    it; 3. field-level LWW fold of the Insert + subsequent Patches in
    sequence order (apply_event merge semantics, table_storage.rs:369-389).
    One shuffle on pk; a Patch with no preceding Insert is ignored, exactly
    like the reference's replay of a patch to a missing key.

    ``last_ts`` is the max event timestamp that contributed to the key's
    state. Snapshots persist it and replay it as the pseudo-Insert's ``ts``,
    so ``AS OF <timestamp>`` still resolves after a compaction drops the
    pre-snapshot log (the reference resolves timestamps against the event
    log the same way — query/executor.rs:194-205 — and its snapshots
    implicitly keep event timestamps by keeping the events).
    """
    ins = (
        ev.filter(F.col("event_type") == INSERT)
        .groupBy("pk")
        .agg(F.max("sequence").alias("ins_seq"))
    )
    dels = (
        ev.filter(F.col("event_type") == SOFT_DELETE)
        .groupBy("pk")
        .agg(F.max("sequence").alias("del_seq"))
    )
    live = ins.join(dels, "pk", "left").filter(
        F.col("del_seq").isNull() | (F.col("del_seq") < F.col("ins_seq"))
    )
    tail = ev.join(live, "pk").filter(
        (F.col("sequence") >= F.col("ins_seq"))
        & (F.col("event_type") != SOFT_DELETE)
    )
    # Field-level LWW fold of Insert + Patches in sequence order. The
    # struct carries a map, so array_sort needs an explicit comparator
    # on sequence (maps aren't orderable).
    cmp = (
        "(l, r) -> CASE WHEN l.sequence < r.sequence THEN -1 "
        "WHEN l.sequence > r.sequence THEN 1 ELSE 0 END"
    )
    merge = "(acc, e) -> map_concat(map_filter(acc, (k, v) -> NOT map_contains_key(e.payload, k)), e.payload)"
    return tail.groupBy("pk").agg(
        F.max("sequence").alias("last_seq"),
        F.max("ts").alias("last_ts"),
        F.expr(
            f"aggregate(array_sort(collect_list(struct(sequence, payload)), {cmp}), "
            f"cast(map() as map<string,string>), {merge})"
        ).alias("row"),
    )


def state_as_events(state: DataFrame) -> DataFrame:
    """Re-enter a materialized state frame ``(pk, last_seq, [last_ts,]
    row)`` into an event fold as pseudo-Insert events at their
    ``last_seq`` — shared by ``compact()`` (snapshot + tail rebuild) and
    the streaming micro-batch merge (current state + micro-batch), so
    batch and streaming reconstruction can never diverge on this shape
    (review-found duplication). ``last_ts`` is optional for state files
    that predate it."""
    last_ts = (
        F.col("last_ts")
        if "last_ts" in state.columns
        else F.lit(None).cast("timestamp")
    )
    return state.select(
        F.col("last_seq").alias("sequence"),
        last_ts.alias("ts"),
        F.lit(INSERT).alias("event_type"),
        "pk",
        F.col("row").alias("payload"),
    )


class JsonFileMetaStore:
    """Default persisted-meta backend: one flock'd JSON file per table.

    Advances under a read-modify-write (two publishers racing a plain
    replace could persist the smaller floor); ``seq_floor`` only ever
    rises; a rewrite bumps the generation and stamps a fresh rewrite_id.
    Atomic tmp+rename so a reader never sees a torn file. On a real
    cluster this per-table counter lives in the commit protocol (Delta
    log version) instead of a local file — SCALE.md §6; the executable
    proof of that mapping is ``commitlog.CommitLogMetaStore``, which
    implements this same two-method interface."""

    def __init__(self, table_path: str):
        self.table_path = table_path

    def _meta_path(self) -> str:
        return os.path.join(self.table_path, "meta.json")

    def exists(self) -> bool:
        """Whether this table has EVER persisted meta — `admin verify`
        uses this to distinguish a checkable store from a pre-meta legacy
        log (which warns instead of failing). Store-specific because the
        probe must match the backend, not assume meta.json."""
        return os.path.exists(self._meta_path())

    def read(self) -> dict:
        try:
            with open(self._meta_path()) as fh:
                return json.load(fh)
        except (FileNotFoundError, ValueError):
            return {"seq_floor": 0, "generation": 0, "rewrite_id": ""}

    def bump(
        self,
        seq_floor: int,
        rewrite: bool = False,
        adds: list[str] | None = None,
        removes: list[str] | None = None,
    ) -> dict:
        # adds/removes (Delta-style file actions) are accepted for
        # interface parity and ignored: the JSON store keeps no entry
        # manifest — the events directory is authoritative; the
        # commit-log store records them (commitlog.entries_at).
        del adds, removes
        os.makedirs(self.table_path, exist_ok=True)
        lock_path = os.path.join(self.table_path, ".meta.lock")
        with open(lock_path, "w") as lk:
            fcntl.flock(lk, fcntl.LOCK_EX)
            meta = self.read()
            meta["seq_floor"] = max(int(meta.get("seq_floor", 0)), int(seq_floor))
            if rewrite:
                meta["generation"] = int(meta.get("generation", 0)) + 1
                meta["rewrite_id"] = uuid.uuid4().hex[:12]
            tmp = self._meta_path() + f".tmp-{uuid.uuid4().hex[:8]}"
            with open(tmp, "w") as fh:
                json.dump(meta, fh, sort_keys=True)
            os.replace(tmp, self._meta_path())
            return meta


class EventLog:
    """Append-only event log for one logical table."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        pk_col: str = "id",
        validate_fn=None,
        post_commit_fn=None,
        meta_store=None,
    ):
        """``validate_fn(batch: DataFrame, event_type: str) -> DataFrame``
        is the BEFORE-trigger analog (reference triggers.rs:30-145): it may
        return the batch transformed (ModifyRow), return it filtered
        (Skip), or raise (Abort). Applied to every write path before
        sequence assignment.

        ``post_commit_fn(events: DataFrame, event_type: str, start_seq:
        int)`` is the AFTER-trigger analog (reference fires AFTER triggers
        once the row change is applied, triggers.rs:30-145): invoked only
        after the batch's rename has made it durable and visible, with the
        exact sequenced event frame that was published. It observes, never
        modifies — an exception here propagates to the caller but the
        commit stands (the reference likewise applies the event before
        AFTER triggers run). Use for audit folds / notifications."""
        self.spark = spark
        self.path = path
        self.pk_col = pk_col
        self.validate_fn = validate_fn
        self.post_commit_fn = post_commit_fn
        self._events_dir = os.path.join(path, "events")
        self._snap_dir = os.path.join(path, "snapshots")
        # pluggable sequence-clock/rewrite-generation backend (SCALE.md §6).
        # When the caller doesn't inject one, the ON-DISK format decides:
        # a table with a _commit_log/ directory runs on the commit-log
        # store, the same way a _delta_log/ directory IS what makes a
        # directory a Delta table. Without this, a commit-store table
        # re-opened by a fresh session (the CLI constructs sessions from
        # --data) silently fell back to meta.json — which after a
        # purge-to-empty holds NO floor, so the next append would reuse
        # purged sequence numbers (the reverse-migration twin of the
        # aliased-sequence family; review-found).
        if meta_store is None:
            if os.path.isdir(os.path.join(path, "_commit_log")):
                from driftdb_spark.commitlog import CommitLogMetaStore

                meta_store = CommitLogMetaStore(path)
            else:
                meta_store = JsonFileMetaStore(path)
        self.meta_store = meta_store
        # Replica logs are read-only: every mutation path (append, txn
        # publish, snapshot, compact, purge) refuses with SQLSTATE 25006.
        # Set by replication.Replica; cleared by promote().
        self.read_only = False

    def _check_writable(self, op: str) -> None:
        if self.read_only:
            raise ReadOnlyLog(
                f"cannot {op} on table log {self.path!r}: "
                "this is a read-only replica (promote it to accept writes)"
            )

    # -- persisted meta (sequence high-water + rewrite generation) -----------
    # NOTE: there is deliberately no EventLog-level meta path — the
    # on-disk shape belongs to the STORE (meta.json is a JsonFileMetaStore
    # detail; the commit-log store has none). Probe via meta_store.exists()
    # / read(); a path probe here caused the r12 verify bypass.

    def read_meta(self) -> dict:
        """Persisted per-table meta: ``seq_floor`` is the monotonic
        high-water sequence mark (the reference persists its per-table
        counter as an AtomicU64 in meta.json, table_storage.rs:212-261 —
        deriving it from log contents alone is unsound: a compliance purge
        that empties the log would reset the clock to 0 and the next
        append would REUSE an already-shipped batch name with different
        content, silently diverging replicas and re-pointing old
        ``AS OF @SEQ:N`` identities at new rows). ``generation`` counts
        log rewrites (compact/purge) and ``rewrite_id`` is a fresh token
        per rewrite, so replication's ship() detects rewrites explicitly
        instead of inferring them from entry-name sets.

        Delegates to the pluggable ``meta_store`` — the default is the
        flock'd JSON file; :class:`driftdb_spark.commitlog.
        CommitLogMetaStore` is the Delta-commit-protocol shape proving
        the SCALE.md §6 collapse claim executable."""
        return self.meta_store.read()

    def _bump_meta(
        self,
        seq_floor: int,
        rewrite: bool = False,
        adds: list[str] | None = None,
        removes: list[str] | None = None,
    ) -> None:
        self.meta_store.bump(
            seq_floor=seq_floor, rewrite=rewrite, adds=adds, removes=removes
        )

    @contextlib.contextmanager
    def _rewrite_lock(self, op: str = "rewrite"):
        """Serialize log rewrites (compact/purge) CROSS-PROCESS. The
        in-process write gate (the session/server exec_lock) doesn't
        cover a CLI ``compact`` racing a server ``purge``: both would
        stage under the same ``events.new`` and each treats the other's
        in-flight staging as crashed-rewrite scratch. Held from entry
        pinning through the swap (and purge's snapshot sweep), so the
        second rewrite starts against the first's completed state.
        Appends don't take it — they already have single-winner rename
        semantics against a concurrent swap. Same flock discipline as
        ``_bump_meta``; on a real cluster this is the table's commit
        protocol (a Delta log transaction), not a local file lock.

        EXPECTED BLOCKING (operator-facing): holders include backup's
        per-table byte copy and IMV refresh's Spark recompute, so a
        purge/compact/ship/recover arriving mid-backup waits for the full
        copy — correctness over availability (a torn cut silently
        corrupts incrementals/replicas). Acquisition tries LOCK_NB first
        and logs one warning before blocking, so a "hung purge" is
        diagnosable from the log rather than a mystery; the holder also
        records ``(pid, op, acquired_unix)`` INTO the lock file after
        acquiring, so ``admin status`` can name who holds a contended
        lock without log access (flock itself exposes no holder
        identity). Opened append-mode — a waiter must not truncate the
        live holder's record."""
        import time as _time

        os.makedirs(self.path, exist_ok=True)
        with open(os.path.join(self.path, ".rewrite.lock"), "a+") as lk:
            try:
                fcntl.flock(lk, fcntl.LOCK_EX | fcntl.LOCK_NB)
            except BlockingIOError:
                # only real contention gets the "waiting" diagnostic —
                # a non-contention flock failure (ENOLCK on NFS, EIO)
                # must surface as itself from the blocking call below,
                # not masquerade as a rival rewrite
                import logging

                logging.getLogger("driftdb_spark.events").warning(
                    "%s waiting for rewrite lock on %s (held by a "
                    "concurrent compact/purge/backup/ship/refresh/recover;"
                    " blocking until it completes)",
                    op,
                    self.path,
                )
                fcntl.flock(lk, fcntl.LOCK_EX)
            try:
                lk.seek(0)
                lk.truncate()
                json.dump(
                    {
                        "pid": os.getpid(),
                        "op": op,
                        "acquired_unix": round(_time.time(), 3),
                    },
                    lk,
                )
                lk.flush()
            except OSError:
                pass  # telemetry only — never fail the rewrite over it
            yield

    # -- storage ------------------------------------------------------------

    def events(self) -> DataFrame:
        if not os.path.exists(self._events_dir):
            # A log rewrite (compact/purge) swaps the directory with two
            # renames; between them the path is briefly absent while an
            # `events.old-*` sibling exists. Readers wait out that window
            # instead of serving an empty log (the reference holds the
            # engine write lock across compaction; this is the lock-free
            # equivalent for a bounded instant).
            import glob
            import time as _time

            deadline = _time.monotonic() + 5.0
            while (
                not os.path.exists(self._events_dir)
                and glob.glob(self._events_dir + ".old-*")
                and _time.monotonic() < deadline
            ):
                _time.sleep(0.05)
        if not os.path.exists(self._events_dir):
            return self.spark.createDataFrame([], EVENT_SCHEMA)
        # Batches live in per-append subdirectories; recursive lookup skips
        # `_staging-*` (underscore-prefixed = hidden to Spark's listing),
        # which is exactly what makes a torn append invisible.
        return (
            self.spark.read.schema(EVENT_SCHEMA)
            .option("recursiveFileLookup", "true")
            .parquet(self._events_dir)
        )

    def last_sequence(self) -> int:
        """Max assigned sequence. Snapshot sequences participate (compaction
        may drop trailing SoftDelete events from the log) and so does the
        persisted ``seq_floor`` (a purge may empty the log AND rewrite every
        snapshot): sequences must never regress — the reference's per-table
        counter is a persisted monotonic AtomicU64
        (table_storage.rs:212-261), and this is its three-source
        equivalent."""
        ev_max = 0
        if os.path.exists(self._events_dir):
            row = self.events().agg(F.max("sequence").alias("s")).first()
            ev_max = int(row["s"] or 0)
        snaps = self._snapshot_seqs()
        floor = int(self.read_meta().get("seq_floor", 0))
        return max(ev_max, snaps[-1] if snaps else 0, floor)

    def _append(self, batch: DataFrame, event_type: str, payload: F.Column | None) -> int:
        """Assign contiguous sequences to the batch and publish it atomically.

        Sequence assignment is the zipWithIndex recipe in DataFrame ops:
        each partition numbers its own rows with a *partitioned* window
        (parallel), and partition start offsets come from a cumulative sum
        over the per-partition counts — a #partitions-row frame, the only
        single-task step. No global sort, no ``batch.count()`` re-execution
        (the row total falls out of the same counts frame).

        Publication is staged-then-renamed: the batch is written under
        ``events/_staging-<token>`` (hidden from Spark's file listing) and
        one ``os.rename`` flips it to ``batch-<startseq>``. POSIX rename is
        atomic, so readers see the whole batch or none of it — the
        reference's buffered-transaction COMMIT (sql_bridge.rs:453-568).

        The final name IS the concurrency claim: it carries no random
        token, so two writers that raced the same last_sequence target the
        same directory name, and ``rename`` onto an existing non-empty
        directory fails — exactly one writer wins, decided atomically by
        the filesystem, and the loser's batch never becomes visible (it
        rolls back from staging and raises :class:`ConcurrentAppendError`
        for retry — Delta's commit-file protocol).

        Partition pinning caveat: ``persist()`` (MEMORY_AND_DISK) keeps the
        counts pass and the write pass aligned by spilling, not
        recomputing; only executor loss (not applicable in local mode)
        could recompute a nondeterministic upstream into different
        partitions. On a cluster, Delta commit versions replace this whole
        path.
        """
        if self.validate_fn is not None:
            batch = self.validate_fn(batch, event_type)
        src = batch.select(
            F.col(self.pk_col).cast("string").alias("pk"),
            (
                payload
                if payload is not None
                else F.lit(None).cast(EVENT_SCHEMA["payload"].dataType)
            ).alias("payload"),
        ).withColumn("event_type", F.lit(event_type))
        return self._assign_and_publish(src, ["pk"], event_type)

    def _append_multi(self, staged: DataFrame) -> int:
        """Publish a multi-statement transaction buffer — columns
        ``(_stmt, event_type, pk, payload)`` — as ONE atomic batch
        (reference buffered-txn COMMIT, sql_bridge.rs:453-568). The fold
        compares sequences only within a pk, so co-locating each pk's
        events (repartition) and numbering partitions ordered by
        ``(pk, _stmt)`` preserves statement order exactly where it
        matters, with no global sort."""
        src = staged.repartition(F.col("pk"))
        return self._assign_and_publish(src, ["pk", "_stmt"], "TXN")

    def _assign_and_publish(
        self, src: DataFrame, order_cols: list[str], hook_event_type: str
    ) -> int:
        self._check_writable("append")
        base = self.last_sequence()
        src = (
            src.withColumn("_pid", F.spark_partition_id())
            # Pin partition contents: the counts pass and the write pass
            # must see identical partitioning or offsets would misalign.
            .persist()
        )
        try:
            counts = src.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n"))
            w_ofs = W.orderBy("_pid").rowsBetween(W.unboundedPreceding, -1)
            offsets = counts.select(
                "_pid",
                F.coalesce(F.sum("_n").over(w_ofs), F.lit(0)).alias("_ofs"),
                F.col("_n"),
            )
            total = int(
                offsets.agg(F.coalesce(F.max(F.col("_ofs") + F.col("_n")), F.lit(0))).first()[0]
            )
            w_loc = W.partitionBy("_pid").orderBy(*order_cols)
            out = src.join(F.broadcast(offsets.drop("_n")), "_pid").select(
                (F.row_number().over(w_loc) + F.col("_ofs") + F.lit(base))
                .cast("long")
                .alias("sequence"),
                F.current_timestamp().alias("ts"),
                F.col("event_type"),
                F.col("pk"),
                F.col("payload"),
            )
            if total == 0:
                # Nothing to publish (validate_fn dropped every row, or a
                # DELETE/UPDATE matched nothing): claiming batch-<base+1>
                # with an empty batch would block every future append at
                # this base. The sequence counter intentionally does not
                # advance.
                return base
            os.makedirs(self._events_dir, exist_ok=True)
            token = uuid.uuid4().hex[:12]
            staging = os.path.join(self._events_dir, f"_staging-{token}")
            out.write.mode("overwrite").parquet(staging)
            final = os.path.join(self._events_dir, f"batch-{base + 1:020d}")
            try:
                os.rename(staging, final)
            except OSError as exc:
                # Only two shapes are concurrency, and both are retryable:
                # the target name already exists (a rival append won this
                # start sequence — ENOTEMPTY/EEXIST or a visible dir), or
                # the staging path vanished (a concurrent compact/purge
                # moved the live dir aside mid-flight — ENOENT). Everything
                # else (ENOSPC, EACCES, EXDEV, ...) is a real I/O failure;
                # re-raise it unchanged so a retry loop can't spin on it.
                shutil.rmtree(staging, ignore_errors=True)
                retryable = exc.errno in (
                    errno.ENOTEMPTY,
                    errno.EEXIST,
                    errno.ENOENT,
                ) or os.path.exists(final)
                if not retryable:
                    raise
                raise ConcurrentAppendError(
                    f"append lost the race for sequence {base + 1} "
                    f"(a rival append or log rewrite won); retry"
                ) from exc
            # Persist the high-water mark only after the batch is visible:
            # a crash in between leaves the floor stale, which the
            # log-derived max covers (last_sequence takes the max of all
            # three sources). The floor is what survives a future
            # purge-to-empty rewrite. The published entry name rides the
            # commit as a Delta add-file action (commitlog.entries_at);
            # the same crash window leaves it unrecorded — locally the
            # directory stays authoritative (on real Delta the commit IS
            # the publish, so the window does not exist — SCALE.md §6).
            self._bump_meta(
                seq_floor=base + total, adds=[os.path.basename(final)]
            )
        finally:
            src.unpersist()
        if self.post_commit_fn is not None:
            committed = (
                self.spark.read.schema(EVENT_SCHEMA)
                .option("recursiveFileLookup", "true")
                .parquet(final)
            )
            self.post_commit_fn(committed, hook_event_type, base + 1)
        return base + total

    def begin(self):
        """Open a buffered transaction (BEGIN) — statements stage events,
        COMMIT publishes them as one atomic batch, ROLLBACK discards,
        SAVEPOINT marks partial-rollback points (reference
        sql_bridge.rs:453-568, transaction.rs:25-120). See
        :mod:`driftdb_spark.transactions`."""
        from driftdb_spark.transactions import Transaction

        return Transaction(self)

    # -- DML as event appends (reference execute_sql_insert/update/delete,
    # sql_bridge.rs:3388-3661, :5473-5669, :5981-6087) ----------------------

    def insert(self, rows: DataFrame) -> int:
        """Full-row Insert events. PK uniqueness against current state is an
        anti-join check (reference checks committed state + txn buffer);
        a key repeated WITHIN the batch is equally a violation (the
        reference's per-row check catches the second occurrence) — found
        by the constraint fuzz, gated here before anything publishes."""
        dup = rows.join(
            self.state_at().select(F.col("pk")),
            rows[self.pk_col].cast("string") == F.col("pk"),
            "left_semi",
        )
        dup_within = (
            rows.groupBy(rows[self.pk_col].cast("string").alias("pk"))
            .count()
            .filter(F.col("count") > 1)
        )
        if not dup.isEmpty() or not dup_within.isEmpty():
            raise ValueError("duplicate primary key(s) in insert batch")
        return self._append(rows, INSERT, _payload_map(rows, self.pk_col))

    def upsert(self, rows: DataFrame) -> int:
        """Insert without the PK-uniqueness gate (last writer wins)."""
        return self._append(rows, INSERT, _payload_map(rows, self.pk_col))

    def patch(self, partial_rows: DataFrame) -> int:
        """Partial-row Patch events: only the provided columns are merged
        field-by-field into existing rows at read time."""
        return self._append(partial_rows, PATCH, _payload_map(partial_rows, self.pk_col))

    def soft_delete(self, keys: DataFrame) -> int:
        """SoftDelete events for the given PKs."""
        return self._append(keys.select(self.pk_col), SOFT_DELETE, None)

    def update_where(
        self, schema_cols: dict[str, str], condition: str, assignments: dict[str, object]
    ) -> int:
        """UPDATE ... WHERE as Patch events (reference execute_sql_update,
        sql_bridge.rs:5473-5669): select matching current-state rows,
        evaluate assignment expressions against the OLD row, append one
        Patch per match. Assignment values are SQL expression strings —
        they may reference existing columns.

        An UPDATE that assigns the PRIMARY KEY cannot be a Patch (the event
        key would still be the old PK); the reference models it as
        SoftDelete(old) + Insert(new row) — the PostgreSQL delete+insert
        model (sql_bridge.rs:5473-5669) — and so does this: the full new
        row is computed from the OLD row with assignments applied, the old
        keys are soft-deleted, and the new rows insert through the normal
        PK-uniqueness gate. Time travel before the UPDATE still shows the
        old key, exactly like replaying the reference's event pair."""
        matching = self.state_df(schema_cols).filter(condition)
        if self.pk_col in assignments:
            new_rows = matching.select(
                *[
                    F.expr(str(assignments[c])).alias(c)
                    if c in assignments
                    else F.col(c)
                    for c in schema_cols
                ]
            )
            # Pin the new rows BEFORE appending the deletes: new_rows reads
            # the event log lazily, and the SoftDelete batch would otherwise
            # erase the very rows the plan re-reads (persist spills rather
            # than recomputes — same pinning contract as _append's).
            new_rows = new_rows.persist()
            try:
                new_rows.count()
                # The delete and insert are two appends, not one
                # transaction, so PK collisions must fail BEFORE anything
                # publishes: a new key may not hit a surviving (non-updated)
                # row, and the new keys must be unique among themselves.
                survivors = self.state_at().join(
                    matching.select(
                        F.col(self.pk_col).cast("string").alias("pk")
                    ),
                    "pk",
                    "left_anti",
                )
                new_keys = new_rows.select(
                    F.col(self.pk_col).cast("string").alias("pk")
                )
                clash = new_keys.join(survivors.select("pk"), "pk", "left_semi")
                dup_within = (
                    new_keys.groupBy("pk").count().filter(F.col("count") > 1)
                )
                if not clash.isEmpty() or not dup_within.isEmpty():
                    raise ValueError(
                        "primary-key UPDATE would collide with an existing "
                        "or sibling key; nothing was changed"
                    )
                self.soft_delete(matching.select(self.pk_col))
                return self.insert(new_rows)
            finally:
                new_rows.unpersist()
        patch = matching.select(
            self.pk_col, *[F.expr(str(expr)).alias(col) for col, expr in assignments.items()]
        )
        return self._append(patch, PATCH, _payload_map(patch, self.pk_col))

    def delete_where(self, schema_cols: dict[str, str], condition: str) -> int:
        """DELETE ... WHERE as SoftDelete events (reference
        execute_sql_delete, sql_bridge.rs:5981-6087)."""
        matching = self.state_df(schema_cols).filter(condition)
        return self.soft_delete(matching.select(self.pk_col))

    def truncate(self, schema_cols: dict[str, str]) -> int:
        """TRUNCATE = soft-delete every visible row (reference
        sql_bridge.rs:701-749 does exactly this)."""
        return self.delete_where(schema_cols, "true")

    # -- reconstruction (reference table_storage.rs:344-428) -----------------

    def state_at(self, asof: AsOf | None = None) -> DataFrame:
        """Reconstruct visible state: ``(pk, last_seq, last_ts, row map)``.

        The temporal target is resolved to a concrete sequence bound FIRST
        (timestamps via ``resolve_sequence_at`` — reference
        query/executor.rs:194-205 resolves ts → max sequence before anything
        else), and only then is a snapshot selected at-or-before THAT bound
        (reference snapshot.rs:87-114 find_latest_before the *resolved*
        sequence). Selecting a snapshot from a raw timestamp target would
        serve future state whenever a newer snapshot exists. ``between``
        targets never consult snapshots (a range of history can't start
        from a materialized point).
        """
        asof = asof or AsOf.now()
        ev = self.events()

        if asof.between is not None or asof.all_history:
            return fold_events(apply_asof(ev, asof))

        bound: int | None
        if asof.sequence is not None:
            bound = asof.sequence
        elif asof.timestamp is not None:
            bound = resolve_sequence_at(ev, asof.timestamp)
            if bound is None:
                # No event at-or-before the timestamp: state is empty,
                # regardless of any snapshot (all snapshots are newer).
                return fold_events(ev.filter(F.lit(False)))
        else:
            bound = None  # AS OF now: any snapshot is usable

        if bound is not None:
            ev = ev.filter(F.col("sequence") <= bound)

        snap, snap_seq = self._usable_snapshot(bound)
        if snap is not None:
            tail = ev.filter(F.col("sequence") > snap_seq)
            last_ts = (
                F.col("last_ts")
                if "last_ts" in snap.columns
                else F.lit(None).cast("timestamp")
            )
            snap_as_inserts = snap.select(
                F.col("last_seq").alias("sequence"),
                last_ts.alias("ts"),
                F.lit(INSERT).alias("event_type"),
                F.col("pk"),
                F.col("row").alias("payload"),
            )
            ev = snap_as_inserts.unionByName(tail)

        return fold_events(ev)

    def state_df(self, schema_cols: dict[str, str], asof: AsOf | None = None) -> DataFrame:
        """State with the row map projected back to typed columns."""
        st = self.state_at(asof)
        return st.select(
            "pk",
            "last_seq",
            *[F.col("row").getItem(c).cast(t).alias(c) for c, t in schema_cols.items()],
        )

    # -- drift history (reference SHOW DRIFT, query/executor.rs:327-354) -----

    def drift_history(self, pk=None) -> DataFrame:
        ev = self.events()
        if pk is not None:
            ev = ev.filter(F.col("pk") == str(pk))
        return ev.orderBy("sequence")

    # -- snapshot / compaction (reference snapshot.rs:19-43,
    # engine.rs:758-845) ------------------------------------------------------

    def _log_entries(self) -> list[str]:
        """Non-hidden entries of the events dir — the concrete set of
        published batches at one instant. Snapshot/compact/purge pin this
        set up front and read ONLY it, so a batch committed mid-rewrite is
        never half-included (it's either absent from the pinned set and
        rescued after the swap, or fully present)."""
        if not os.path.exists(self._events_dir):
            return []
        return sorted(
            e for e in os.listdir(self._events_dir) if not e.startswith(("_", "."))
        )

    def _read_entries(self, entries: list[str]) -> DataFrame:
        if not entries:
            return self.spark.createDataFrame([], EVENT_SCHEMA)
        paths = [os.path.join(self._events_dir, e) for e in entries]
        return (
            self.spark.read.schema(EVENT_SCHEMA)
            .option("recursiveFileLookup", "true")
            .parquet(*paths)
        )

    def snapshot(self) -> int:
        """Materialize current state at the max sequence of a pinned set of
        log entries. Pinning (rather than ``last_sequence()`` + a lazy
        ``state_at()``) closes a race: a batch appended between the
        sequence read and the state write would otherwise leak events newer
        than the snapshot's labeled sequence into the snapshot, making
        ``AS OF`` through that snapshot serve future state.

        Held under the rewrite flock: a cross-process snapshot racing a
        purge could otherwise pin pre-purge entries and materialize
        PURGED rows into a ``seq=`` snapshot written after the purge's
        snapshot sweep (or hit ENOENT mid-read) — the same compliance
        hole the lock closes for backup/ship/IMV refresh. compact's
        internal ``_snapshot_of`` is already inside the lock."""
        self._check_writable("snapshot")
        with self._rewrite_lock("snapshot"):
            entries = self._log_entries()
            if not entries and not self._snapshot_seqs():
                return 0  # nothing has ever been published (fuzz-found)
            return self._snapshot_of(entries)

    def _snapshot_of(self, entries: list[str]) -> int:
        ev = self._read_entries(entries)
        row = ev.agg(F.max("sequence").alias("s")).first()
        seq = max(int(row["s"] or 0), max(self._snapshot_seqs(), default=0))
        out = os.path.join(self._snap_dir, f"seq={seq}")
        fold_events(ev).write.mode("overwrite").parquet(out)
        return seq

    def _swap_events_dir(self, rebuilt: DataFrame, known_entries: list[str]) -> None:
        """Atomically replace the log with ``rebuilt``, preserving batches
        committed concurrently with the rewrite.

        Protocol (extends the single-winner append claim to log rewrites):
        write the rebuilt log to ``events.new``; rename the live dir aside;
        rename ``events.new`` into place; then RESCUE — move any
        ``batch-*`` entry that appeared in the old dir after
        ``known_entries`` was pinned into the new dir (its sequences are
        above everything in the rebuild, because appends base on
        ``last_sequence()`` which the rewrite never lowers). An append
        whose staging dir was still in flight when the live dir moved
        aside fails its rename with ENOENT and surfaces as
        :class:`ConcurrentAppendError` — never a silent loss.
        Before any rename touches the LIVE directory, the persisted meta
        advances: ``seq_floor`` to the pre-swap high-water mark (so a
        rewrite that drops trailing — or ALL — events can never reset
        the sequence clock; see :meth:`read_meta`) and
        ``generation``/``rewrite_id`` (so replication's ship() reseeds
        replicas on the persisted signal, not by diffing entry-name sets
        a clock reset could alias). The bump also records the rewrite's
        file actions — retired pinned entries, rebuilt entry — which the
        commit-log store folds into its manifest (``entries_at``).

        The rebuilt log is materialized ONCE, directly under
        ``events.new`` as a hidden staging dir, then renamed to a uniform
        ``batch-<min_seq>`` entry — ``_log_entries()`` keeps returning
        only ``batch-*`` names across rewrites (rewrite output used to
        land as raw flat ``part-*.parquet``). The single write runs the
        rebuild plan against the still-live dir; nothing moves until the
        write completes, so no defensive second materialization is
        needed (it used to write tmp then re-copy — double I/O).
        """
        new_dir = self._events_dir + ".new"
        if os.path.exists(new_dir):
            if not os.path.exists(self._events_dir):
                # live dir missing + events.new present = a crash landed
                # BETWEEN the two swap renames, and events.new holds the
                # only copy of the rebuilt log — rewriting now would base
                # the rebuild on an empty live dir and discard it. Refuse;
                # admin recover completes the swap (complete_swap action).
                raise RuntimeError(
                    f"interrupted log swap detected at {new_dir!r} (live "
                    "events dir missing): run `admin recover` before "
                    "compact/purge"
                )
            # live dir present: events.new can only be scratch from a
            # rewrite that crashed BEFORE its swap (rewrites serialize
            # under the write gate). The pre-r11 double-write cleared it
            # via mode("overwrite") on new_dir itself; the single-write
            # path stages under a subdir, so clear the scratch explicitly
            # or its stale batch-* entries would swap in beside the fresh
            # rebuild (resurrecting purged rows) or collide on rename.
            shutil.rmtree(new_dir)
        staging = os.path.join(new_dir, "_staging-rewrite")
        rebuilt.write.mode("overwrite").parquet(staging)
        row = (
            self.spark.read.schema(EVENT_SCHEMA)
            .parquet(staging)
            .agg(F.min("sequence").alias("lo"))
            .first()
        )
        adds: list[str] = []
        if row["lo"] is None:
            # the rebuild removed every event (purge-to-empty): the new
            # log is an empty dir with no batch entry
            shutil.rmtree(staging)
        else:
            entry = f"batch-{int(row['lo']):020d}"
            os.rename(staging, os.path.join(new_dir, entry))
            adds.append(entry)
        # The clock commit lands AFTER the rebuild is staged and named —
        # so its body can carry Delta-style file actions: the pinned
        # entry set this rewrite retires (removes) and the rebuilt entry
        # (adds), making commitlog.entries_at answerable from the log
        # alone — but BEFORE any rename touches the live directory: the
        # crash invariant is bump-before-swap, not bump-before-write
        # (staging is invisible, and a crash up to here leaves only
        # reclaimable scratch with NO meta change — the old floor-first
        # order paid a spurious replica reseed for a crash during the
        # Spark write; this order doesn't). A crash between this bump and
        # the renames below still costs at worst one spurious reseed
        # (safe, idempotent), during which the recorded manifest runs
        # ahead of the directory — `admin recover` repairs it with a
        # reconciling commit (recover's reconcile_manifest action;
        # without that the phantom actions would NEVER heal, because a
        # later rewrite's removes are always the pinned directory set) —
        # locally the directory stays authoritative (on real Delta the
        # commit IS the publish, so that window does not exist).
        self._bump_meta(
            seq_floor=self.last_sequence(),
            rewrite=True,
            adds=adds,
            removes=list(known_entries),
        )
        old_dir = self._events_dir + f".old-{uuid.uuid4().hex[:8]}"
        # an absent live dir is a valid (never-written or fully-purged)
        # log: rewrite it as empty rather than crash (fuzz-found)
        os.makedirs(self._events_dir, exist_ok=True)
        os.rename(self._events_dir, old_dir)
        os.rename(new_dir, self._events_dir)
        known = set(known_entries)
        for e in sorted(os.listdir(old_dir)):
            if e.startswith("batch-") and e not in known:
                os.rename(os.path.join(old_dir, e), os.path.join(self._events_dir, e))
        shutil.rmtree(old_dir)

    def _snapshot_seqs(self) -> list[int]:
        if not os.path.exists(self._snap_dir):
            return []
        # only pure-integer suffixes are snapshots; anything else under
        # the dir (crash scratch, foreign files) must not brick the table
        return sorted(
            int(d[4:])
            for d in os.listdir(self._snap_dir)
            if d.startswith("seq=") and d[4:].isdigit()
        )

    def _usable_snapshot(self, bound: int | None):
        """Newest snapshot at-or-before the RESOLVED sequence bound
        (find_latest_before, reference snapshot.rs:87-114). ``bound=None``
        means "now" — the latest snapshot is always usable. Callers must
        resolve timestamp targets to a sequence before calling."""
        candidates = [
            s for s in self._snapshot_seqs() if bound is None or s <= bound
        ]
        if not candidates:
            return None, None
        seq = candidates[-1]
        snap = self.spark.read.parquet(os.path.join(self._snap_dir, f"seq={seq}"))
        return snap, seq

    def compact(self) -> None:
        """Rewrite the log as (latest snapshot as Inserts) + post-snapshot
        tail — the reference's COMPACT (engine.rs:758-845).

        Snapshot-as-insert rows carry each key's ``last_ts`` as their event
        timestamp, so ``AS OF <timestamp>`` targets that predate the
        compaction point still resolve to a sequence instead of going
        empty. Concurrent appends are preserved by the pinned-entries +
        rescue-sweep swap (``_swap_events_dir``)."""
        self._check_writable("compact")
        with self._rewrite_lock("compact"):
            entries = self._log_entries()
            if not entries:
                # empty log (CREATE TABLE, no writes yet — fuzz-found):
                # there is nothing to rewrite and no events dir to swap
                return
            seq = self._snapshot_of(entries)
            snap = self.spark.read.parquet(
                os.path.join(self._snap_dir, f"seq={seq}")
            )
            tail = self._read_entries(entries).filter(F.col("sequence") > seq)
            rebuilt = state_as_events(snap).unionByName(tail)
            self._swap_events_dir(rebuilt, entries)

    def purge(self, keys: DataFrame) -> int:
        """Hard-delete ("right to be forgotten"): physically rewrite the log
        with EVERY event for the given PKs removed — unlike ``soft_delete``,
        which appends a tombstone and keeps history replayable. Time travel
        for purged keys intentionally stops answering (the point of a
        compliance purge); all other keys' history and sequences are
        untouched, so existing AS OF reads stay valid. Snapshots are
        rewritten too — a purge that leaves the data in a snapshot file has
        deleted nothing. The reference has no hard-delete at all (SoftDelete
        only, events.rs); at cluster scale this rewrite is the same
        anti-join expressed over Delta `MERGE/DELETE` with vacuum.

        Returns the number of events removed.

        Concurrency: like ``compact``, the rewrite pins the published batch
        set and rescues batches committed mid-rewrite, so no *other* key's
        events are ever lost. A rescued batch could itself contain events
        for a purged key (a writer racing the purge); re-run ``purge`` after
        quiescing writers of the purged keys for a compliance-grade
        guarantee — the return value being 0 confirms convergence.

        Purge scope (r11): in-engine derived artifacts converge — the
        sequence clock never regresses (persisted ``seq_floor``), replicas
        reseed on the persisted rewrite generation, incremental MVs fully
        recompute on their next REFRESH, and the result cache's version
        vector moves. The audit trail keeps per-commit pk SAMPLES by
        design (audit integrity); call ``AuditTrail.scrub_pks`` with the
        purged keys to erase the subject there too. Artifacts OUTSIDE
        the engine's management — streaming state sinks built by
        ``streaming.ingest`` (a file stream cannot un-see folded rows)
        and previously-taken backups — retain the purged rows and need
        their own compliance pass, the same way any downstream
        materialization does.
        """
        self._check_writable("purge")
        pk_list = keys.select(
            F.col(keys.columns[0]).cast("string").alias("pk")
        ).distinct()
        with self._rewrite_lock("purge"):
            return self._purge_locked(pk_list)

    def _purge_locked(self, pk_list: DataFrame) -> int:
        entries = self._log_entries()
        if not entries and not self._snapshot_seqs():
            return 0  # empty log: nothing to purge, no dir to swap
        ev = self._read_entries(entries)
        before = ev.count()
        kept = ev.join(F.broadcast(pk_list), "pk", "anti")
        self._swap_events_dir(kept, entries)
        removed = before - self.events().count()
        for seq in self._snapshot_seqs():
            snap_path = os.path.join(self._snap_dir, f"seq={seq}")
            snap = self.spark.read.parquet(snap_path)
            cleaned = snap.join(F.broadcast(pk_list), "pk", "anti")
            # Single materialization into an underscore-hidden scratch dir
            # OUTSIDE the ``seq=`` namespace (the old ``seq=N.purge`` /
            # ``seq=N.new`` scratch names matched _snapshot_seqs()'s
            # ``seq=`` prefix, so a crash mid-purge left an entry whose
            # suffix fails int() — every later _snapshot_seqs() raised and
            # the TABLE was bricked until manual cleanup; recover's torn-
            # snapshot sweep never removed a completed-but-unswapped one
            # because it carries _SUCCESS). The write executes the plan
            # against the still-live snapshot; a crash in the rmtree→
            # rename gap just loses the snapshot (state rebuilds from the
            # log — compact folds history forward before dropping it) and
            # recover reclaims the scratch.
            tmp_s = os.path.join(
                self._snap_dir, f"_purge-{seq}-{uuid.uuid4().hex[:8]}"
            )
            cleaned.write.mode("overwrite").parquet(tmp_s)
            shutil.rmtree(snap_path)
            os.rename(tmp_s, snap_path)
        return removed
