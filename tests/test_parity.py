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


def test_no_vacuous_suite_members(oracle):
    """Every suite member's gated relation must be NON-EMPTY at the
    pytest SF: a member whose oracle returns 0 rows passes the hash
    compare no matter how broken the Spark side is (the r7 seasonal
    gate shipped vacuous — operator default min_n=30 emptied it at
    every gate SF). Mechanized here the way plans/lint.py mechanizes
    the anti-pattern rules: adding a vacuous member now fails CI."""
    from ts_data_pipeline_spark.queries import suites

    builders = [
        suites._enrichment_members, suites._filters_members,
        suites._quality_members, suites._text_stats_members,
        suites._olap_pivot_members, suites._join_semi_anti_members,
        suites._dedup_exact_simhash_members,
        suites._catalog_browse_members, suites._media_members,
        suites._streaming_finals_members,
    ]
    empty = []
    for b in builders:
        for m in b():
            n = oracle.execute(
                f"SELECT COUNT(*) FROM ({m.sql})"
            ).fetchone()[0]
            if n == 0:
                empty.append(m.name)
    assert not empty, f"vacuous suite members (0 oracle rows): {empty}"


def test_registry_cap_and_oracle_parity():
    """Mechanize the 50-entry registry invariant (VERDICT r9 ask #2).

    The driver's CORRECTNESS artifact records only the FIRST 50
    queries() entries — a hard cap rounds 7/8 proved fails SILENTLY:
    entry #51 simply vanishes from the official artifact. The
    invariant lived as a comment (registry.py _PRIORITY block); this
    makes it CI: adding entry #51 now fails here instead of dropping
    a gate from the artifact. The oracle-key check pins the second
    half of the contract: every registered query carries a DuckDB
    twin (a keyed query with no oracle gets only the weaker
    rows-only check, which must be an explicit decision, not a
    forgotten registration).
    """
    queries = registry.all_queries()
    oracles = registry.all_oracles()
    assert len(queries) <= 50, (
        f"registry has {len(queries)} entries > the driver artifact's "
        "hard 50-row cap — fold the new operator into an existing "
        "suite (queries/suites.py) instead of appending entry #51"
    )
    missing = set(queries) - set(oracles)
    assert not missing, (
        f"registered queries without DuckDB oracles: {sorted(missing)} "
        "— every gate needs a twin (or an explicit exemption here)"
    )
    extra = set(oracles) - set(queries)
    assert not extra, f"oracles without queries: {sorted(extra)}"
