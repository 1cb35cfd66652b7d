"""Property-based fuzz of event-fold reconstruction (the Spark analog of the
reference's random-ops engine fuzz — crates/driftdb-core/tests/fuzz_test.rs:
random Insert/Patch/SoftDelete streams applied to the engine, state checked
against a model).

Hypothesis generates random event sequences over a small key space;
``fold_events`` (the declarative DataFrame fold behind ``EventLog.state_at``
and the streaming merge) must agree with a 20-line sequential-replay model —
the reference's own replay loop semantics (table_storage.rs:344-428):
Insert replaces the row, Patch merges field-by-field into an existing row
and is ignored for a missing key, SoftDelete removes the key, a later
Insert revives it. A random AS OF prefix cut is checked too, so time travel
rides the same property.
"""

from __future__ import annotations

import datetime

import pytest

from conftest import fuzz_examples
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from driftdb_spark.events import EVENT_SCHEMA, fold_events

PKS = ["a", "b", "c"]
KEYS = ["k1", "k2", "k3"]

event_st = st.tuples(
    st.sampled_from(["INSERT", "PATCH", "SOFT_DELETE"]),
    st.sampled_from(PKS),
    st.dictionaries(st.sampled_from(KEYS), st.integers(0, 9), min_size=1, max_size=3),
)


def replay_model(events):
    """Reference replay loop (table_storage.rs:344-428) in 12 lines."""
    state: dict[str, dict] = {}
    for _seq, etype, pk, payload in events:
        if etype == "INSERT":
            state[pk] = dict(payload)
        elif etype == "PATCH":
            if pk in state:
                state[pk].update(payload)
        else:  # SOFT_DELETE
            state.pop(pk, None)
    return state


def spark_fold(spark, events):
    t0 = datetime.datetime(2026, 1, 1)
    rows = [
        (seq, t0, etype, pk, {k: str(v) for k, v in payload.items()})
        for seq, etype, pk, payload in events
    ]
    df = spark.createDataFrame(rows, EVENT_SCHEMA)
    return {
        r["pk"]: dict(r["row"]) for r in fold_events(df).collect()
    }


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=fuzz_examples(15),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(event_st, min_size=1, max_size=25), st.data())
@pytest.mark.deepfuzz
def test_fold_matches_sequential_replay(spark, ops, data):
    events = [
        (i + 1, etype, pk, payload) for i, (etype, pk, payload) in enumerate(ops)
    ]
    expected = {
        pk: {k: str(v) for k, v in row.items()}
        for pk, row in replay_model(events).items()
    }
    got = spark_fold(spark, events)
    assert got == expected

    # AS OF a random prefix: folding events[:cut] must equal replaying them
    cut = data.draw(st.integers(1, len(events)))
    expected_cut = {
        pk: {k: str(v) for k, v in row.items()}
        for pk, row in replay_model(events[:cut]).items()
    }
    got_cut = spark_fold(spark, events[:cut])
    assert got_cut == expected_cut
