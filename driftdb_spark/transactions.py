"""Buffered transactions: BEGIN / COMMIT / ROLLBACK / SAVEPOINT over an
EventLog.

The reference's transaction model is exactly this shape: statements inside
BEGIN buffer their events in the session's transaction context, COMMIT
applies the buffer to storage, ROLLBACK discards it, SAVEPOINT marks a
buffer position for partial rollback, and a failed statement aborts the
transaction ("commands ignored until end of transaction block"; COMMIT of
an aborted transaction behaves as ROLLBACK) — reference
sql_bridge.rs:453-568, transaction.rs:25-120.

Here the buffer is a list of staged statement frames and COMMIT publishes
them as ONE batch through the same staged-rename atomic append the
single-statement DML path uses — so a multi-statement transaction is
all-or-nothing with respect to readers exactly like a single batch, and two
racing COMMITs serialize through the same filesystem-arbitrated claim
(``ConcurrentAppendError`` for the loser). Delta's equivalent is one commit
file per transaction.

Ordering: the fold only compares sequences WITHIN a primary key, so commit
repartitions the buffered events by pk and numbers each partition ordered
by (pk, statement index) — same-key events keep statement order, and the
sequence assignment stays the parallel zipWithIndex recipe (no global
sort).

Reads inside the transaction see the buffer: ``state_at()`` folds committed
events plus the staged events at provisional sequences above the
begin-point high-water mark (the reference checks PK uniqueness against
committed state + the txn buffer the same way, execute_insert_values
sql_bridge.rs:3505-3661).

Scope: one transaction spans one table (one EventLog), matching the unit of
atomic publication. ``DriftSession.begin()`` wraps several per-table
transactions and commits them in declaration order — each table's commit is
atomic, the cross-table sequence is ordered but not jointly atomic (the
reference gets cross-table atomicity from its global engine lock; a
distributed engine gets it from a shared Delta log, which is the cluster
upgrade path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from driftdb_spark.events import (
    EVENT_SCHEMA,
    INSERT,
    PATCH,
    SOFT_DELETE,
    EventLog,
    _payload_map,
    fold_events,
)


class TransactionAborted(RuntimeError):
    """A prior statement failed; commands are ignored until ROLLBACK /
    COMMIT-as-rollback (reference aborted-transaction gate,
    sql_bridge.rs:335-346)."""

    sqlstate = "25P02"  # in_failed_sql_transaction (PostgreSQL's code)


class Transaction:
    """Buffered per-table transaction. Use via ``EventLog.begin()``."""

    def __init__(self, log: EventLog):
        self.log = log
        self._stmts: list[tuple[str, DataFrame]] = []  # (event_type, (pk,payload))
        self._savepoints: dict[str, int] = {}
        self._base = log.last_sequence()
        self._aborted = False
        self._done = False

    # -- staging -------------------------------------------------------------

    def _gate(self) -> None:
        if self._done:
            raise RuntimeError("transaction already finished")
        if self._aborted:
            raise TransactionAborted(
                "current transaction is aborted, commands ignored until "
                "end of transaction block"
            )

    def _stage(self, batch: DataFrame, event_type: str, payload) -> None:
        if self.log.validate_fn is not None:
            batch = self.log.validate_fn(batch, event_type)
        normalized = batch.select(
            F.col(self.log.pk_col).cast("string").alias("pk"),
            (
                payload
                if payload is not None
                else F.lit(None).cast(EVENT_SCHEMA["payload"].dataType)
            ).alias("payload"),
        )
        # Pin the statement's rows now: later statements and the commit
        # itself must see THIS statement as of its execution point, and the
        # plan may read state the commit will change.
        normalized = normalized.persist()
        normalized.count()
        self._stmts.append((event_type, normalized))

    def insert(self, rows: DataFrame) -> None:
        """INSERT with PK uniqueness against committed state + the buffer
        (reference checks both, sql_bridge.rs:3505-3661). A violation
        aborts the transaction."""
        self._gate()
        try:
            dup = rows.join(
                self.state_at().select("pk"),
                rows[self.log.pk_col].cast("string") == F.col("pk"),
                "left_semi",
            )
            dup_within = (
                rows.groupBy(rows[self.log.pk_col].cast("string").alias("pk"))
                .count()
                .filter(F.col("count") > 1)
            )
            if not dup.isEmpty() or not dup_within.isEmpty():
                raise ValueError("duplicate primary key(s) in transaction insert")
            self._stage(rows, INSERT, _payload_map(rows, self.log.pk_col))
        except ValueError:
            self._aborted = True
            raise

    def patch(self, partial_rows: DataFrame) -> None:
        self._gate()
        self._stage(partial_rows, PATCH, _payload_map(partial_rows, self.log.pk_col))

    def soft_delete(self, keys: DataFrame) -> None:
        self._gate()
        self._stage(keys.select(self.log.pk_col), SOFT_DELETE, None)

    def update_where(
        self, schema_cols: dict[str, str], condition: str, assignments: dict[str, object]
    ) -> None:
        """UPDATE ... WHERE against the transaction's OWN view of state
        (committed ∪ buffer) — a row inserted or patched earlier in the
        txn is visible to the condition and the assignment expressions,
        exactly like the reference's buffered execution."""
        self._gate()
        if self.log.pk_col in assignments:
            raise ValueError(
                "PK-changing UPDATE inside a transaction is not supported; "
                "use EventLog.update_where (delete+insert model) outside"
            )
        matching = self.state_df(schema_cols).filter(condition)
        patch = matching.select(
            F.col("pk").alias(self.log.pk_col),
            *[F.expr(str(expr)).alias(col) for col, expr in assignments.items()],
        )
        self._stage(patch, PATCH, _payload_map(patch, self.log.pk_col))

    def delete_where(self, schema_cols: dict[str, str], condition: str) -> None:
        """DELETE ... WHERE against the txn's view of state."""
        self._gate()
        matching = self.state_df(schema_cols).filter(condition)
        self._stage(
            matching.select(F.col("pk").alias(self.log.pk_col)), SOFT_DELETE, None
        )

    # -- reads ---------------------------------------------------------------

    def staged_events(self) -> DataFrame:
        """The buffer as an event frame at provisional sequences (above the
        begin-point high-water mark, ordered by statement index)."""
        frames = []
        for i, (etype, df) in enumerate(self._stmts):
            frames.append(
                df.select(
                    F.lit(self._base + i + 1).cast("long").alias("sequence"),
                    F.current_timestamp().alias("ts"),
                    F.lit(etype).alias("event_type"),
                    "pk",
                    "payload",
                )
            )
        if not frames:
            return self.log.spark.createDataFrame([], EVENT_SCHEMA)
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f)
        return out

    def state_at(self) -> DataFrame:
        """Read-your-writes: committed events ∪ the buffer, folded."""
        return fold_events(self.log.events().unionByName(self.staged_events()))

    def state_df(self, schema_cols: dict[str, str]) -> DataFrame:
        st = self.state_at()
        return st.select(
            "pk",
            "last_seq",
            *[
                F.col("row").getItem(c).cast(t).alias(c)
                for c, t in schema_cols.items()
            ],
        )

    # -- savepoints / rollback ------------------------------------------------

    def savepoint(self, name: str) -> None:
        self._gate()
        self._savepoints[name] = len(self._stmts)

    def rollback_to(self, name: str) -> None:
        """Partial rollback: discard statements staged after the savepoint;
        also clears an abort (the reference's savepoint recovery)."""
        if self._done:
            raise RuntimeError("transaction already finished")
        if name not in self._savepoints:
            raise KeyError(f"no such savepoint: {name}")
        keep = self._savepoints[name]
        for _etype, df in self._stmts[keep:]:
            df.unpersist()
        del self._stmts[keep:]
        self._savepoints = {k: v for k, v in self._savepoints.items() if v <= keep}
        self._aborted = False

    def rollback(self) -> None:
        for _etype, df in self._stmts:
            df.unpersist()
        self._stmts.clear()
        self._done = True

    # -- commit ---------------------------------------------------------------

    def commit(self) -> int:
        """Publish the whole buffer as ONE atomic batch. COMMIT of an
        aborted transaction is a ROLLBACK (reference sql_bridge.rs:453-568);
        an empty buffer commits as a no-op. Returns the last sequence."""
        if self._done:
            raise RuntimeError("transaction already finished")
        if self._aborted or not self._stmts:
            self.rollback()
            return self.log.last_sequence()
        try:
            staged = None
            for i, (etype, df) in enumerate(self._stmts):
                part = df.select(
                    F.lit(i).alias("_stmt"),
                    F.lit(etype).alias("event_type"),
                    "pk",
                    "payload",
                )
                staged = part if staged is None else staged.unionByName(part)
            return self.log._append_multi(staged)
        finally:
            for _etype, df in self._stmts:
                df.unpersist()
            self._stmts.clear()
            self._done = True


class SessionTransaction:
    """Multi-table BEGIN over a DriftSession: one buffered ``Transaction``
    per touched table, committed in first-touch order. Each table's commit
    is atomic (one batch, one rename); the cross-table sequence is ordered
    but not jointly atomic — the reference gets joint atomicity from its
    global engine lock (executor.rs Arc<RwLock>), a cluster deployment gets
    it from a shared Delta log. Rollback discards every table's buffer."""

    def __init__(self, session):
        self._session = session
        self._txns: dict[str, Transaction] = {}
        # Savepoint bookkeeping: creation order (for pruning later
        # savepoints on partial rollback) and, per savepoint, the set of
        # tables already touched when it was taken — a table first touched
        # AFTER the savepoint rolls back entirely.
        self._sp_order: list[str] = []
        self._sp_members: dict[str, set[str]] = {}
        self._aborted = False

    @property
    def aborted(self) -> bool:
        """PostgreSQL aborted-transaction state: a failed statement poisons
        the whole transaction until ROLLBACK [TO SAVEPOINT] / COMMIT
        (reference gate, sql_bridge.rs:335-346)."""
        return self._aborted or any(t._aborted for t in self._txns.values())

    def mark_aborted(self) -> None:
        self._aborted = True

    def table(self, name: str) -> Transaction:
        if name not in self._txns:
            self._txns[name] = self._session.table(name).begin()
        return self._txns[name]

    def savepoint(self, name: str) -> None:
        for txn in self._txns.values():
            txn.savepoint(name)
        if name in self._sp_order:
            self._sp_order.remove(name)
        self._sp_order.append(name)
        self._sp_members[name] = set(self._txns)

    def rollback_to(self, name: str) -> None:
        """Partial rollback across tables; clears the aborted state
        (reference savepoint recovery, sql_bridge.rs:511-546)."""
        if name not in self._sp_members:
            raise KeyError(f"no such savepoint: {name}")
        members = self._sp_members[name]
        for tname in list(self._txns):
            if tname in members:
                self._txns[tname].rollback_to(name)
            else:
                self._txns[tname].rollback()
                del self._txns[tname]
        # Savepoints taken after this one are gone (SQL standard).
        idx = self._sp_order.index(name)
        for later in self._sp_order[idx + 1 :]:
            self._sp_members.pop(later, None)
        del self._sp_order[idx + 1 :]
        self._aborted = False

    def release(self, name: str) -> None:
        if name not in self._sp_members:
            raise KeyError(f"no such savepoint: {name}")
        self._sp_members.pop(name)
        self._sp_order.remove(name)
        for txn in self._txns.values():
            txn._savepoints.pop(name, None)

    def commit(self) -> dict[str, int]:
        if self.aborted:
            # COMMIT of an aborted transaction is a ROLLBACK (PostgreSQL /
            # reference sql_bridge.rs:476-509).
            self.rollback()
            return {}
        return {name: txn.commit() for name, txn in self._txns.items()}

    def rollback(self) -> None:
        for txn in self._txns.values():
            if not txn._done:
                txn.rollback()
        self._aborted = False
