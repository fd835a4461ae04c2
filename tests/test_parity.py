"""Driver-gate emulation: every registered query vs its DuckDB oracle.

This is the same comparison the driver performs at sf0.01
(__spark_entry__.py docstring), run at sf0.001 for speed so a
mismatch is caught before commit.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR, assert_parity
from ts_data_pipeline_spark import registry


def _cases():
    oracles = registry.all_oracles()
    return [(name, fn, oracles.get(name)) for name, fn in registry.all_queries().items()]


@pytest.mark.parametrize("name,fn,sql", _cases(), ids=[c[0] for c in _cases()])
def test_query_matches_oracle(spark, oracle, name, fn, sql):
    df = fn(spark, SF_DIR)
    if sql is None:
        # rows-only check (driver's weaker gate for non-SQL ops)
        assert df.count() >= 0
        return
    assert_parity(df, oracle, sql)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0
