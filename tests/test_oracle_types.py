"""Registry-wide oracle RESULT-TYPE guard — the defect class behind the only
round-6 driver failures.

DuckDB types an un-CAST integer ``SUM(...)`` as HUGEINT (int128). Python's
DB-API fetch reprs int128 and int64 identically, so the local value compare
(tests/oracle.py) stays green, but the driver's value hash renders HUGEINT
differently from BIGINT and flips ``hash_match`` red even when every value
agrees. The fix is ``CAST(SUM(...) AS BIGINT)`` in the oracle SQL; THIS test
is the guard that makes a future un-CAST aggregate fail locally, before the
driver ever samples it.

Type policy for oracle result columns (what the driver hash is known to
render identically to the Spark side):

- integers  -> BIGINT / INTEGER / SMALLINT / TINYINT (never HUGEINT — cast
  integer SUMs and ``//`` window arithmetic to BIGINT)
- floats    -> DOUBLE / FLOAT, rounded to <=6 decimals AFTER aggregation on
  BOTH engines (see tests/oracle.py normalization + spark-gotchas notes)
- DECIMAL   -> banned in oracle OUTPUT: DuckDB's DECIMAL repr (scale digits)
  differs from Spark's; intermediate DECIMAL math is fine but the projected
  column must end as BIGINT or a rounded DOUBLE
- everything else -> VARCHAR / DATE / TIMESTAMP / BOOLEAN

DESCRIBE is static (no query execution), so this sweep over ~180 oracles
runs in seconds and needs no SparkSession.
"""

from __future__ import annotations

import re

import pytest

from driftdb_spark.registry import QUERIES, query_map
from tests.oracle import duck_connection

query_map()  # force registration

#: DuckDB result types the driver hash renders identically to Spark's
#: corresponding type. Anything outside this list is a latent hash mismatch.
ALLOWED = {
    "BIGINT",
    "INTEGER",
    "SMALLINT",
    "TINYINT",
    "DOUBLE",
    "FLOAT",
    "VARCHAR",
    "DATE",
    "TIMESTAMP",
    "BOOLEAN",
}

_ORACLES = sorted(n for n in QUERIES if QUERIES[n].oracle is not None)


@pytest.fixture(scope="module")
def duck():
    return duck_connection()


@pytest.mark.parametrize("name", _ORACLES)
def test_oracle_result_types_are_hash_safe(duck, name):
    desc = duck.execute(f"DESCRIBE {QUERIES[name].oracle}").fetchall()
    offending = [
        (col, typ)
        for col, typ, *_ in desc
        # strip parametrization like DECIMAL(20,8) before the allowlist check
        if re.sub(r"\(.*\)", "", typ).strip().upper() not in ALLOWED
    ]
    assert not offending, (
        f"oracle `{name}` projects driver-hash-unsafe result types "
        f"{offending}; CAST integer aggregates to BIGINT and round/cast "
        f"float or DECIMAL results to DOUBLE (see module docstring)"
    )
