"""Property fuzz: incremental MV refresh ≡ full recompute.

Hypothesis generates random DML sequences (insert / update / delete,
NULL group keys included) against a table with an incremental
materialized view; after every refresh the merged MV must equal a full
re-execution of the view SQL over the current state — the invariant the
keyed-aggregate IVM math (views.IncrementalViewRegistry) promises. This
is the same model-based discipline as test_constraint_fuzz (which found
a real published-duplicate bug in r5); here the model is the engine's
own full-recompute path, so any divergence is an IVM bug by
construction. (Reference refreshes views by full re-run, views.rs:541 —
its refresh can't be wrong, only slow; ours must be neither.)"""

from __future__ import annotations

import pytest

from conftest import fuzz_examples
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from driftdb_spark.sql_frontend import DriftSession

# ops: ("ins", pk, site, hits) / ("upd", pk, site, hits) / ("del", pk)
# plus the log-REWRITING maintenance ops ("purge", pk) / ("compact",):
# purge removes events below the refresh watermark without appending
# anything, which is exactly the shape incremental maintenance cannot
# see — r11 found the MV kept purged rows' contributions forever because
# this fuzz never rewrote the log (the same blind spot that hid the r10
# replication bug until its fuzz gained purge ops)
_site = st.one_of(st.none(), st.sampled_from(["a", "b", "c"]))
_op = st.one_of(
    st.tuples(st.just("ins"), st.integers(1, 8), _site, st.integers(0, 50)),
    st.tuples(st.just("upd"), st.integers(1, 8), _site, st.integers(0, 50)),
    st.tuples(st.just("del"), st.integers(1, 8)),
    st.tuples(st.just("purge"), st.integers(1, 8)),
    st.tuples(st.just("compact")),
)
_program = st.lists(_op, min_size=1, max_size=6)


def _lit(v):
    return "NULL" if v is None else (f"'{v}'" if isinstance(v, str) else str(v))


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=fuzz_examples(6),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@pytest.mark.deepfuzz
@given(programs=st.lists(_program, min_size=1, max_size=3))
def test_incremental_refresh_equals_full_recompute(
    spark, tmp_path_factory, programs
):
    tmp = tmp_path_factory.mktemp("imv_fuzz")
    s = DriftSession(spark, str(tmp))
    s.sql("CREATE TABLE fz (id INT PRIMARY KEY, site STRING, hits INT)")
    s.sql("INSERT INTO fz VALUES (1, 'a', 5), (2, NULL, 7)")
    view_sql = (
        "SELECT site, COUNT(*) AS n, SUM(hits) AS total "
        "FROM fz GROUP BY site"
    )
    s.sql(
        "CREATE INCREMENTAL MATERIALIZED VIEW fzmv ON fz GROUP BY (site) "
        f"AS {view_sql}"
    )
    live = {1, 2}
    for prog in programs:
        for op in prog:
            if op[0] == "ins":
                _, pk, site, hits = op
                if pk in live:
                    continue  # PK collision would (correctly) reject
                s.sql(
                    f"INSERT INTO fz VALUES ({pk}, {_lit(site)}, {hits})"
                )
                live.add(pk)
            elif op[0] == "upd":
                _, pk, site, hits = op
                s.sql(
                    f"UPDATE fz SET site = {_lit(site)}, hits = {hits} "
                    f"WHERE id = {pk}"
                )
            elif op[0] == "purge":
                s.table("fz").purge(
                    spark.createDataFrame([(op[1],)], "id int")
                )
                live.discard(op[1])
            elif op[0] == "compact":
                s.table("fz").compact()
            else:
                s.sql(f"DELETE FROM fz WHERE id = {op[1]}")
                live.discard(op[1])
        s.sql("REFRESH MATERIALIZED VIEW fzmv")
        got = {
            (r.site, r.n, r.total)
            for r in s.sql("SELECT * FROM fzmv").collect()
        }
        want = {
            (r.site, r.n, r.total) for r in s.sql(view_sql).collect()
        }
        assert got == want, f"IVM diverged after {prog}: {got} != {want}"


def test_imv_recomputes_after_purge_rewrite(spark, tmp_path):
    """Deterministic pin of the r11-found IVM/purge hole: a purge removes
    events BELOW the refresh watermark without appending any, so the
    sequence-delta refresh saw nothing and the MV kept the purged rows'
    contributions forever (a compliance leak). The IMV now records the
    log's rewrite generation and falls back to a full recompute when it
    changes, returning to incremental afterwards."""
    s = DriftSession(spark, str(tmp_path))
    s.sql("CREATE TABLE t (id INT PRIMARY KEY, g INT, v INT)")
    s.sql("INSERT INTO t VALUES (1, 1, 10), (2, 1, 20), (3, 2, 5)")
    s.sql(
        "CREATE INCREMENTAL MATERIALIZED VIEW mv ON t GROUP BY (g) "
        "AS SELECT g, SUM(v) AS sv FROM t GROUP BY g"
    )
    s.table("t").purge(spark.createDataFrame([(2,)], "id int"))
    n = s.sql("REFRESH MATERIALIZED VIEW mv")
    assert n == 2  # full recompute (every group), not the 0 of pre-r11
    got = {(r.g, r.sv) for r in s.sql("SELECT * FROM mv").collect()}
    assert got == {(1, 10), (2, 5)}  # purged contribution gone
    # back to incremental afterwards: one group touched -> one recomputed
    s.sql("INSERT INTO t VALUES (4, 2, 7)")
    assert s.sql("REFRESH MATERIALIZED VIEW mv") == 1
    # the token persists in the catalog: a fresh session stays incremental
    s2 = DriftSession(spark, str(tmp_path))
    assert s2.sql("REFRESH MATERIALIZED VIEW mv") == 0
