"""Query-result cache with EXACT version-vector invalidation.

Re-expresses the reference's query cache (driftdb-core ``cache.rs``:
SHA256 query-hash keys scoped by user, LRU + TTL eviction, size caps,
hit/miss statistics, ``should_cache`` verb gating) with one deliberate
upgrade: the reference serves a cached entry until a TTL expires or
someone manually calls ``invalidate_pattern`` — a write inside the TTL
window serves STALE rows. Here the cache key embeds a **version vector**
of every table the statement reads — the sorted batch-directory listing
plus snapshot sequences of each table's event log (a pure ``os.listdir``,
zero Spark jobs, and exact: every published write changes the listing,
and compaction/purge rewrites it). A write therefore *changes the key*,
so staleness is structurally impossible and no TTL exists at all.

Scale posture: cached results are parquet directories under
``<storage>/_result_cache/`` — a hit is a distributed scan of the
materialized result, never a driver-memory replay, so caching a
million-row aggregate costs the driver nothing (the reference holds
results in process memory and caps entries at ~1000 × 1 MB,
cache.rs:38-47). The key path runs no Spark jobs; the only execution cost
of a miss over the uncached path is writing the result once instead of
streaming it.

What is cacheable (reference should_cache, cache.rs:132-164, same
policy): only statements that reach the Catalyst SELECT tail — DML/DDL/
transaction control never get here. Additionally bypassed: statements
inside an open transaction (buffered writes are invisible to the version
vector; the reference's ``cache_transactional`` defaults false),
``information_schema`` rewrites (they read live catalog, not logs), and
statements referencing any relation that is not a catalog table or a
stored view expandable to catalog tables (a temp view's content is
unversionable). Temporal ``FOR SYSTEM_TIME`` reads cache like everything
else (reference ``cache_temporal``): the AsOf target is part of the key,
and the version vector merely over-invalidates pinned-sequence reads
(re-executes after a write — correct, just conservative).

Security: the key includes the session's security context (user, roles,
superuser — reference CacheKey.user, cache.rs:66-73) AND a hash of the
RLS policy catalog + referenced view definitions, so a policy or view
redefinition invalidates every entry it could affect and two principals
never share rows through the cache.
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import shutil
from collections import OrderedDict

__all__ = ["ResultCache"]

_RELATION_RE = re.compile(r"'UnresolvedRelation \[([^\]]+)\]")
_CTE_RE = re.compile(r"\bCTE \[([^\]]+)\]")


def _parse_relations(spark, sql: str) -> set[str] | None:
    """Referenced relation names from the UNRESOLVED parse plan (no
    analysis, no catalog lookups), CTE aliases excluded. None = the text
    didn't parse (let the normal path raise the real error)."""
    try:
        plan = (
            spark._jsparkSession.sessionState().sqlParser().parsePlan(sql).toString()
        )
    except Exception:
        return None
    rels = {r.strip().split(".")[-1].lower() for r in _RELATION_RE.findall(plan)}
    ctes = {
        a.strip().lower() for m in _CTE_RE.findall(plan) for a in m.split(",")
    }
    return rels - ctes


class ResultCache:
    """LRU parquet-backed result cache for one :class:`DriftSession`."""

    def __init__(
        self,
        session,
        max_entries: int = 64,
        max_bytes: int = 256 * 1024 * 1024,
    ):
        import uuid

        self._sess = session
        self.max_entries = max_entries
        self.max_bytes = max_bytes
        # Instance-scoped directory: each enabled session (e.g. every wire
        # connection) owns its namespace, so enabling a second cache over
        # the same storage never deletes a sibling's live entries. Entries
        # are in-process state (the reference cache is too); close()
        # reclaims the directory, and admin.recover sweeps aged orphans
        # from crashed processes.
        self._dir = os.path.join(
            session.storage_dir, "_result_cache", uuid.uuid4().hex[:12]
        )
        os.makedirs(self._dir, exist_ok=True)
        self._entries: OrderedDict[str, dict] = OrderedDict()  # key -> meta
        # Evicted directories are swept one put-cycle LATE: a reader that
        # just received the DataFrame for an entry evicted by the very
        # next put can still finish its scan (same deferred-sweep pattern
        # as views.publish_versioned).
        self._sweep_queue: list[str] = []
        self._gen = 0  # unique dir per store: re-storing an evicted key
        # never reuses a path a queued sweep (or an in-flight reader of
        # the old copy) still points at
        self.hits = 0
        self.misses = 0
        self.evictions = 0
        self.bypasses = 0

    # -- keying ------------------------------------------------------------

    def _expand_to_tables(self, rels: set[str]) -> set[str] | None:
        """Resolve referenced relations to base catalog tables, expanding
        stored view definitions to fixpoint. None = some relation is
        neither a table nor an expandable view (uncacheable)."""
        sess = self._sess
        tables: set[str] = set()
        pending = list(rels)
        seen: set[str] = set()
        while pending:
            r = pending.pop()
            if r in seen:
                continue
            seen.add(r)
            if r in sess._tables:
                tables.add(r)
                continue
            defn = sess._views.get(r)
            if defn is None:
                # materialized/incremental views read their own stored
                # parquet; their refresh time is not in any log listing,
                # so results through them are unversionable — bypass.
                return None
            from driftdb_spark.temporal import parse_system_time

            clean_defn, _asof = parse_system_time(defn)
            sub = _parse_relations(sess.spark, clean_defn)
            if sub is None:
                return None
            pending.extend(sub)
        return tables

    def _version_token(self, tables: set[str]) -> str:
        sess = self._sess
        h = hashlib.sha256()
        for t in sorted(tables):
            log, cols = sess._tables[t]
            h.update(t.encode())
            h.update(json.dumps(sorted(cols.items())).encode())
            h.update("\0".join(log._log_entries()).encode())
            h.update(json.dumps(log._snapshot_seqs()).encode())
            # entry NAMES are stable across a rewrite since r11 (uniform
            # batch-<minseq> naming + a never-regressing sequence clock),
            # so a purge can leave both hashes above unchanged while the
            # CONTENT shrank — the persisted rewrite generation is the
            # signal that the bytes behind the names changed
            h.update(json.dumps(log.read_meta(), sort_keys=True).encode())
        # policy / view-definition changes must invalidate too
        h.update(json.dumps(sess.rls.to_catalog(), sort_keys=True).encode())
        h.update(json.dumps(sess._views, sort_keys=True).encode())
        return h.hexdigest()

    def _key(self, clean: str, asof, args, tables: set[str]) -> str:
        sec = self._sess._security
        parts = [
            clean,
            repr(args),
            repr(
                (asof.sequence, str(asof.timestamp), asof.all_history,
                 str(asof.between), asof.half_open)
            ),
            repr(
                (sec.username, sorted(sec.roles), sec.is_superuser)
                if sec
                else None
            ),
            self._version_token(tables),
        ]
        return hashlib.sha256("\1".join(parts).encode()).hexdigest()

    def cacheable(self, clean: str) -> set[str] | None:
        """Tables read by ``clean`` if it is cacheable, else None."""
        if self._sess._active_txn is not None:
            return None
        if "information_schema" in clean.lower():
            return None
        rels = _parse_relations(self._sess.spark, clean)
        if not rels:  # parse failure, or zero relations (SELECT 1 — not worth a slot)
            return None
        return self._expand_to_tables(rels)

    # -- storage -----------------------------------------------------------

    def lookup(self, key: str):
        meta = self._entries.get(key)
        if meta is None:
            self.misses += 1
            return None
        self._entries.move_to_end(key)  # LRU touch
        self.hits += 1
        from pyspark.sql.types import StructType

        return (
            self._sess.spark.read.schema(
                StructType.fromJson(meta["schema"])
            ).parquet(meta["path"])
        )

    def store(self, key: str, df):
        """Materialize ``df`` under the cache dir and return a DataFrame
        reading the materialized copy (so the caller's consumption never
        re-executes the plan). Oversized results are written, served once,
        and not retained."""
        self._gen += 1
        path = os.path.join(self._dir, f"{key[:24]}-{self._gen}")
        df.write.mode("overwrite").parquet(path)
        nbytes = sum(
            os.path.getsize(os.path.join(r, f))
            for r, _d, fs in os.walk(path)
            for f in fs
        )
        schema_json = json.loads(df.schema.json())
        from pyspark.sql.types import StructType

        back = self._sess.spark.read.schema(
            StructType.fromJson(schema_json)
        ).parquet(path)
        if nbytes > self.max_bytes:
            # too large to retain (reference max_result_size gate,
            # cache.rs:203-209) — serve this execution, sweep later
            self._sweep_queue.append(path)
            return back
        self._entries[key] = {
            "path": path,
            "bytes": nbytes,
            "schema": schema_json,
        }
        self._evict()
        return back

    def _evict(self) -> None:
        # previous cycle's evictions are now safe to delete
        while self._sweep_queue:
            shutil.rmtree(self._sweep_queue.pop(), ignore_errors=True)
        total = sum(m["bytes"] for m in self._entries.values())
        while self._entries and (
            len(self._entries) > self.max_entries or total > self.max_bytes
        ):
            _k, meta = self._entries.popitem(last=False)
            total -= meta["bytes"]
            self.evictions += 1
            self._sweep_queue.append(meta["path"])

    # -- management (reference clear/invalidate_pattern/statistics) --------

    def clear(self) -> None:
        for meta in self._entries.values():
            self._sweep_queue.append(meta["path"])
        self._entries.clear()

    def close(self) -> None:
        """Reclaim the instance directory (disable_result_cache and the
        wire server's per-connection teardown call this)."""
        self._entries.clear()
        self._sweep_queue.clear()
        shutil.rmtree(self._dir, ignore_errors=True)

    def invalidate_table(self, table: str) -> int:
        """Drop every entry — version-vector keying makes per-table
        tracking unnecessary for correctness (a write already changes the
        key), so this is housekeeping for space, kept for parity with the
        reference's invalidate_pattern (cache.rs:247-264)."""
        n = len(self._entries)
        self.clear()
        return n

    def statistics(self) -> dict:
        total = self.hits + self.misses
        return {
            "entries": len(self._entries),
            "total_bytes": sum(m["bytes"] for m in self._entries.values()),
            "hits": self.hits,
            "misses": self.misses,
            "bypasses": self.bypasses,
            "evictions": self.evictions,
            "hit_rate": round(self.hits / total, 4) if total else 0.0,
        }
