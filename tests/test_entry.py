"""Driver-contract smoke tests: entry(), queries(), oracle_sql()."""

from __future__ import annotations

import duckdb
import pytest

from conftest import SF_SMOKE


def test_entry_runs(spark):
    import __spark_entry__ as mod

    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_queries_and_oracles_aligned():
    import __spark_entry__ as mod

    qs = mod.queries()
    oracles = mod.oracle_sql()
    assert qs, "no queries registered"
    assert set(oracles) <= set(qs)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings".split()
    ):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_SMOKE}/{t}.parquet')")
    return con


def test_all_queries_match_oracle_smoke(spark, duck):
    """Full oracle sweep at sf0.001 — the same comparison the driver runs."""
    import __spark_entry__ as mod
    from tools.oracle_check import compare

    qs = mod.queries()
    oracles = mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        sdf = fn(spark, SF_SMOKE).toPandas()
        if name not in oracles:
            assert len(sdf) >= 0
            continue
        odf = duck.sql(oracles[name]).df()
        problems = compare(name, sdf, odf)
        if problems:
            failures.append((name, problems))
    assert not failures, failures


def test_priority_and_certified_names_exist():
    # A typo in _PRIORITY/_CERTIFIED silently reorders the driver's checked
    # window — pin that every listed name is a real registry query.
    import __spark_entry__ as m

    names = set(m.plans.REGISTRY)
    missing_p = [n for n in m._PRIORITY if n not in names]
    missing_c = [n for n in m._CERTIFIED_R01 if n not in names]
    assert missing_p == [] and missing_c == []
    ordered = list(m.queries())
    assert ordered[: len(m._PRIORITY)] == m._PRIORITY
    # certified queries occupy the tail, never the checked window
    assert all(n in m._CERTIFIED for n in ordered[-len(m._CERTIFIED_R01):])
