"""Every oracle-declared query must match DuckDB exactly (the driver gate).

Parametrized over the registry; runs at the small SF for speed. Queries
without an oracle get a rows/schema sanity check instead.
"""

from __future__ import annotations

import pytest

from hbacker_spark.registry import load_all_queries
from tests.oracle_harness import compare

SPECS = load_all_queries()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(spark, sf_dir, name):
    spec = SPECS[name]
    df = spec.fn(spark, sf_dir)
    if spec.oracle is None:
        rows = df.limit(1_000_000).collect()
        assert df.columns, f"{name}: no columns"
        assert rows is not None
        return
    problems = compare(df, spec.oracle, sf_dir)
    assert not problems, f"{name}: " + "; ".join(problems)
