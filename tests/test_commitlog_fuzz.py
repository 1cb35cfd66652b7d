"""Model-based property fuzz for the commit-log meta store — the r13
retention/manifest additions get the same discipline that found the r10
rewrite bugs: random programs of appends, rewrites (with Delta-style
add/remove file actions), prunes, and crash-injected prunes, checked
after EVERY op against a pure-Python model.

Invariants (the ones a wrong fold/prune would silently break):
- read() equals the model fold exactly (clock, generation, manifest),
  at every step, through checkpoints and prunes;
- the clock never regresses across any op (prune included);
- entries_at(v) either equals the model's recorded history at v or
  raises the explicit pruned/not-exist errors — never a wrong answer;
- rewrites_since(w) is EXACT when the watermark's range survives, and
  CONSERVATIVE (synthetic rewrite) when the range was pruned and a
  rewrite could hide there — never a silent drop (the r10 family);
- a crash mid-prune (os.remove dies partway) leaves every invariant
  above intact, and re-running prune converges.
"""

from __future__ import annotations

import os

import pytest
from conftest import fuzz_examples
from hypothesis import given, settings
from hypothesis import strategies as st

from driftdb_spark.commitlog import CommitLogMetaStore

_op = st.one_of(
    # append: floor delta, one added entry (entry names from a small pool
    # so rewrites can alias a previously-removed name, like compact does)
    st.tuples(st.just("append"), st.integers(0, 5), st.integers(0, 9)),
    # rewrite: retire the whole current entry set, add one rebuilt entry
    st.tuples(st.just("rewrite"), st.integers(0, 9)),
    # bare commit: floor bump with NO file actions (a legacy-style
    # writer) — varies the actions_seen fold, which would otherwise be
    # True from the first op in every program
    st.tuples(st.just("bare"), st.integers(0, 5)),
    # retention prune with headroom 0..3
    st.tuples(st.just("prune"), st.integers(0, 3)),
    # prune whose k-th os.remove crashes (then a recovering re-prune)
    st.tuples(st.just("prune_crash"), st.integers(0, 6)),
)


class _Model:
    """Pure-Python twin of the store's fold semantics. ``legacy_floor``
    models a surviving JsonFileMetaStore meta.json: it is the floor
    while the commit log is EMPTY, and commit 1 folds it in (the
    migration contract)."""

    def __init__(self, legacy_floor: int = 0):
        self.floor = legacy_floor
        self.generation = 0
        self.version = 0
        self.entries: set[str] = set()
        self.history: dict[int, list[str]] = {0: []}
        self.rewrite_versions: set[int] = set()
        self.actions_seen = False

    def bump(self, floor_delta: int, rewrite: bool, adds, removes):
        self.floor = max(self.floor, self.floor + floor_delta)
        self.version += 1
        if rewrite:
            self.generation += 1
            self.rewrite_versions.add(self.version)
        if adds or removes:  # store records keys only for truthy lists
            self.actions_seen = True
        for r in removes or []:
            self.entries.discard(r)
        for a in adds or []:
            self.entries.add(a)
        self.history[self.version] = sorted(self.entries)


@settings(max_examples=fuzz_examples(6), deadline=None)
@given(
    program=st.lists(_op, min_size=4, max_size=30),
    legacy_floor=st.integers(0, 20),
)
def test_commitlog_matches_model(tmp_path_factory, program, legacy_floor):
    root = tmp_path_factory.mktemp("clogfuzz")
    tbl = root / "t"
    if legacy_floor:
        # a surviving JsonFileMetaStore meta.json (migration starting
        # state): its floor IS the clock while the commit log is empty,
        # and commit 1 must fold it in permanently
        import json as _json

        tbl.mkdir()
        (tbl / "meta.json").write_text(
            _json.dumps({"seq_floor": legacy_floor, "generation": 2})
        )
    store = CommitLogMetaStore(str(tbl))
    model = _Model(legacy_floor)
    # watermarks some consumer might hold: every version ever seen
    floors_at: dict[int, int] = {0: 0}

    def check():
        m = store.read()
        assert m["version"] == model.version
        assert m["seq_floor"] == model.floor
        assert m["generation"] == model.generation
        assert m["entries"] == sorted(model.entries)
        assert m["actions_seen"] == model.actions_seen
        assert store.version() == model.version
        # entries_at: every historical version answers exactly or raises
        # the explicit errors — never a wrong list
        for v, want in model.history.items():
            try:
                assert store.entries_at(v) == want, f"version {v}"
            except ValueError as exc:
                assert "pruned" in str(exc) or "does not exist" in str(exc)
        with pytest.raises(ValueError, match="does not exist"):
            store.entries_at(model.version + 7)
        # rewrites_since: exact when the range survives, conservative
        # (never silent) when pruned history could hide a rewrite
        have = {int(n[: -len(".json")]) for n in store._commit_files()}
        for w in floors_at:
            if w > model.version:
                continue
            want_exact = sorted(
                v for v in model.rewrite_versions if v > w
            )
            hits = store.rewrites_since(w)
            survived = set(range(w + 1, model.version + 1)) <= have
            if survived:
                assert [
                    h["version"] for h in hits if not h.get("conservative")
                ] == want_exact
                assert not any(h.get("conservative") for h in hits)
            else:
                got_real = [
                    h["version"] for h in hits if not h.get("conservative")
                ]
                # real hits are the surviving subset, in order
                assert got_real == [v for v in want_exact if v in have]
                missing_rewrites = [v for v in want_exact if v not in have]
                if missing_rewrites:
                    # a rewrite WAS pruned out of the range: silent drop
                    # is the r10 divergence — a conservative entry must
                    # stand in for it
                    assert any(h.get("conservative") for h in hits), (
                        f"watermark {w}: pruned rewrites {missing_rewrites} "
                        "dropped silently"
                    )

    for op in program:
        kind = op[0]
        if kind == "append":
            _k, d, e = op
            entry = f"batch-{e:03d}"
            store.bump(seq_floor=model.floor + d, adds=[entry])
            model.bump(d, False, [entry], None)
        elif kind == "rewrite":
            _k, e = op
            entry = f"batch-{e:03d}"
            removes = sorted(model.entries)
            store.bump(
                seq_floor=model.floor, rewrite=True,
                adds=[entry], removes=removes,
            )
            model.bump(0, True, [entry], removes)
        elif kind == "bare":
            _k, d = op
            store.bump(seq_floor=model.floor + d)
            model.bump(d, False, None, None)
        elif kind == "prune":
            store.prune(keep_commits=op[1])
        elif kind == "prune_crash":
            real_remove = os.remove
            calls = {"n": 0}

            def dying_remove(path, *, _real=real_remove, _calls=calls, _k=op[1]):
                if _calls["n"] == _k:
                    raise OSError(5, "injected I/O error")
                _calls["n"] += 1
                return _real(path)

            os.remove = dying_remove
            try:
                store.prune()
            except OSError:
                pass  # crashed partway: invariants must still hold below
            finally:
                os.remove = real_remove
            check()  # mid-crash state is fully consistent
            store.prune()  # recovery: re-run converges
        floors_at[model.version] = model.floor
        check()
