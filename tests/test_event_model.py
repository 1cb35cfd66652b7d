"""Randomized model test: seeded random Insert/Patch/SoftDelete sequences
applied to both the EventLog and a plain-dict reference model must agree on
every reconstruction point — the Spark analog of the reference's proptest
fuzz suite (crates/driftdb-core/tests/fuzz_test.rs)."""

from __future__ import annotations

import random

import pytest

from driftdb_spark.events import EventLog
from driftdb_spark.temporal import AsOf

FIELDS = ["a", "b", "c"]


def _model_apply(model: dict, op: str, pk: int, payload: dict):
    if op == "insert":
        model[pk] = dict(payload)
    elif op == "patch":
        if pk in model:
            model[pk].update(payload)
    elif op == "delete":
        model.pop(pk, None)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_eventlog_matches_dict_model(spark, tmp_path, seed):
    rng = random.Random(seed)
    log = EventLog(spark, str(tmp_path / f"t{seed}"), pk_col="id")
    model: dict[int, dict] = {}
    checkpoints: list[tuple[int, dict]] = []

    seq = 0
    for step in range(12):
        pk = rng.randint(1, 5)
        op = rng.choice(["insert", "patch", "patch", "delete"])
        if op == "insert":
            payload = {f: rng.randint(0, 99) for f in FIELDS}
            row = spark.createDataFrame(
                [(pk, payload["a"], payload["b"], payload["c"])],
                "id int, a int, b int, c int",
            )
            payload["id"] = pk
            seq = log.upsert(row)
            _model_apply(model, "insert", pk, payload)
        elif op == "patch":
            f = rng.choice(FIELDS)
            v = rng.randint(100, 199)
            seq = log.patch(spark.createDataFrame([(pk, v)], f"id int, {f} int"))
            _model_apply(model, "patch", pk, {"id": pk, f: v})
        else:
            seq = log.soft_delete(spark.createDataFrame([(pk,)], "id int"))
            _model_apply(model, "delete", pk, {})
        if step % 4 == 3:
            checkpoints.append((seq, {k: dict(v) for k, v in model.items()}))

    def snapshot_of(asof):
        return {
            int(r["pk"]): {k: int(v) for k, v in r["row"].items()}
            for r in log.state_at(asof).collect()
        }

    # final state
    assert snapshot_of(None) == model
    # every checkpoint via AS OF time travel
    for at_seq, expected in checkpoints:
        assert snapshot_of(AsOf(sequence=at_seq)) == expected, f"seq={at_seq}"
