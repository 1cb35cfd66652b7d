"""Every registered query must hash-match its DuckDB oracle at sf0.001 —
the local mirror of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from driftdb_spark.registry import QUERIES, query_map
from tests.oracle import DEFAULT_TEST_SF, compare

query_map()  # force registration


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, name):
    spec = QUERIES[name]
    df = spec.fn(spark, DEFAULT_TEST_SF)
    if spec.oracle is None:
        # rows-only check: must execute and have a stable schema
        rows = df.collect()
        assert df.columns
        assert rows is not None
    else:
        compare(df, spec.oracle, DEFAULT_TEST_SF)
