"""Property fuzz: time travel ≡ a Python model of the event history.

Hypothesis generates random DML programs; after every statement the
model records (last_sequence → full table state). At the end, the
engine's ``FOR SYSTEM_TIME AS OF @SEQ:n`` must reproduce the recorded
state for every n — including after snapshot/compact/purge reshaped the
physical log:

- ``snapshot`` is LOSSLESS for time travel: AS OF below the snapshot
  sequence replays raw events, at-or-above it layers snapshot + tail.
- ``compact`` FOLDS history at its fold point (reference COMPACT folds
  pre-snapshot events into snapshot-as-Inserts carrying each key's
  last_seq): sequences at-or-above the fold stay exact; below it the
  check weakens to the compliance half.
- ``purge`` erases a key's events but leaves every OTHER key's
  sequences untouched (anti-join, no renumbering): exactness survives
  for the survivors, and the purged key stops answering at every
  sequence — the model removes it retroactively, same as the engine —
  UNLESS a later insert recreates it (new, legitimate history from that
  sequence on; fuzz-found at FUZZ_SCALE=10 and pinned as @example).

The current-state check runs after every op, so a fold that corrupts
the present (not just the past) is localized to the op that did it.
This is the model-based discipline of test_fold_fuzz pointed at the
snapshot/compaction LAYERING (temporal.py resolve + events._usable_
snapshot + bounded tail replay) rather than the fold itself."""

from __future__ import annotations

import pytest
from conftest import fuzz_examples
from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st

from driftdb_spark.sql_frontend import DriftSession

_op = st.one_of(
    st.tuples(st.just("ins"), st.integers(1, 5), st.integers(0, 99)),
    st.tuples(st.just("upd"), st.integers(1, 5), st.integers(0, 99)),
    st.tuples(st.just("del"), st.integers(1, 5)),
    st.tuples(st.just("snapshot")),
    st.tuples(st.just("compact")),
    st.tuples(st.just("purge"), st.integers(1, 5)),
)


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=fuzz_examples(5),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(program=st.lists(_op, min_size=3, max_size=10))
# fuzz-found at FUZZ_SCALE=10 (r11): purge then RE-INSERT the same key —
# the re-insert creates new, legitimate history, so "ever purged" must
# not mean "never visible again"; only never-recreated keys stay erased
@example(
    program=[("ins", 5, 30), ("del", 5), ("ins", 1, 0), ("purge", 1),
             ("ins", 1, 0), ("ins", 1, 0), ("ins", 1, 0), ("ins", 4, 0),
             ("compact",)]
)
@pytest.mark.deepfuzz
def test_asof_matches_model_across_maintenance(spark, tmp_path_factory, program):
    root = tmp_path_factory.mktemp("temporalfuzz")
    sess = DriftSession(spark, str(root / "db"))
    sess.sql("CREATE TABLE t (id INT PRIMARY KEY, v INT)")
    log, _cols = sess._tables["t"]

    model: dict[int, int] = {}  # live state the engine must mirror
    states: dict[int, dict[int, int]] = {}  # sequence -> state snapshot
    fold_seq = 0  # exact history holds at-or-above the last compact fold
    purged: set[int] = set()
    last_seq = 0

    def record() -> None:
        nonlocal last_seq
        seq = log.last_sequence()
        assert seq >= last_seq  # the clock never regresses
        last_seq = seq
        states[seq] = dict(model)

    for op in program:
        kind = op[0]
        if kind == "ins":
            _k, pk, v = op
            if pk in model:
                sess.sql(f"UPDATE t SET v = {v} WHERE id = {pk}")
            else:
                sess.sql(f"INSERT INTO t VALUES ({pk}, {v})")
            model[pk] = v
            # a re-insert after a purge creates NEW legitimate history:
            # the key answers again from this sequence on (the purge
            # erased only the PRIOR events), so it leaves the erased set
            purged.discard(pk)
            record()
        elif kind == "upd":
            _k, pk, v = op
            sess.sql(f"UPDATE t SET v = {v} WHERE id = {pk}")
            if pk in model:
                model[pk] = v
            record()
        elif kind == "del":
            sess.sql(f"DELETE FROM t WHERE id = {op[1]}")
            model.pop(op[1], None)
            record()
        elif kind == "snapshot":
            log.snapshot()  # lossless: no fold-point move
        elif kind == "compact":
            log.compact()
            fold_seq = log.last_sequence()
        elif kind == "purge":
            pk = op[1]
            log.purge(spark.createDataFrame([(pk,)], "id int"))
            purged.add(pk)
            model.pop(pk, None)
            # history erasure is retroactive: the key stops answering
            # at every sequence, exactly like the engine's rewrite
            for s in states.values():
                s.pop(pk, None)
        # the present must be right after EVERY op
        now = {r["id"]: r["v"] for r in sess.sql("SELECT id, v FROM t").collect()}
        assert now == model, f"current state diverged after {op}"

    for seq in sorted(states):
        got = {
            r["id"]: r["v"]
            for r in sess.sql(
                f"SELECT id, v FROM t FOR SYSTEM_TIME AS OF @SEQ:{seq}"
            ).collect()
        }
        if seq >= fold_seq:
            assert got == states[seq], f"AS OF @SEQ:{seq} diverged"
        else:
            # below a compact fold history is coarser by design; the
            # compliance half still holds unconditionally for keys whose
            # history was erased and never recreated
            assert not (set(got) & purged), (
                f"purged (never-recreated) key answered at @SEQ:{seq}"
            )
