"""Property fuzz: the constraint engine vs a naive Python model.

Hypothesis generates random insert batches against a table declaring
UNIQUE / CHECK / NOT NULL; a driver-side model decides acceptance row
set by the SQL rules (NULLs never collide under UNIQUE, CHECK passes on
NULL, batches are all-or-nothing), and the engine must agree on BOTH the
accept/reject outcome of every statement AND the final visible state —
the Spark analog of the reference's proptest suites over its constraint
model (constraints.rs)."""

from __future__ import annotations

import pytest

from conftest import fuzz_examples
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from driftdb_spark.constraints import ConstraintViolation
from driftdb_spark.sql_frontend import DriftSession

_row = st.tuples(
    st.integers(min_value=1, max_value=6),  # pk — small range forces collisions
    st.one_of(st.none(), st.sampled_from(["a", "b", "c"])),  # unique col
    st.one_of(st.none(), st.integers(min_value=-5, max_value=105)),  # checked col
)

_batches = st.lists(
    st.lists(_row, min_size=1, max_size=3), min_size=1, max_size=3
)


def _model_accepts(state: dict, batch) -> bool:
    """The SQL rules, straight from the standard."""
    pks = [r[0] for r in batch]
    if len(set(pks)) != len(pks) or any(pk in state for pk in pks):
        return False  # PK uniqueness (within batch and vs state)
    us = [r[1] for r in batch if r[1] is not None]
    if len(set(us)) != len(us):
        return False  # within-batch UNIQUE
    live_us = {u for (_pk, u, _c) in state.values() if u is not None}
    if any(u in live_us for u in us):
        return False  # UNIQUE vs state (NULLs never collide)
    if any(c is not None and not (0 <= c <= 100) for (_pk, _u, c) in batch):
        return False  # CHECK (NULL passes)
    return True


def _lit(v):
    if v is None:
        return "NULL"
    if isinstance(v, str):
        return f"'{v}'"
    return str(v)


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=fuzz_examples(8),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(batches=_batches)
def test_constraint_engine_matches_model(spark, tmp_path_factory, batches):
    tmp = tmp_path_factory.mktemp("cfuzz")
    s = DriftSession(spark, str(tmp))
    s.sql(
        "CREATE TABLE t (k INT PRIMARY KEY, u STRING UNIQUE, "
        "c INT CHECK (c >= 0 AND c <= 100))"
    )
    state: dict = {}
    for batch in batches:
        values = ", ".join(
            f"({_lit(pk)}, {_lit(u)}, {_lit(c)})" for pk, u, c in batch
        )
        should_accept = _model_accepts(state, batch)
        try:
            s.sql(f"INSERT INTO t VALUES {values}")
            accepted = True
        except (ConstraintViolation, ValueError):
            accepted = False
        assert accepted == should_accept, (
            f"engine {'accepted' if accepted else 'rejected'} but model "
            f"says {'accept' if should_accept else 'reject'}: batch={batch} "
            f"state={sorted(state)}"
        )
        if should_accept:
            for pk, u, c in batch:
                state[pk] = (pk, u, c)
    got = {
        (r.k, r.u, r.c)
        for r in s.sql("SELECT k, u, c FROM t").collect()
    }
    assert got == set(state.values())
