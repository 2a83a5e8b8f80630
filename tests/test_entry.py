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


def test_compare_flags_int_vs_float_dtype_class(duck):
    """Regression for the r02 driver-hash failures (doc_sequence_packing
    et al.): DuckDB SUM(BIGINT)->HUGEINT comes back float64, values equal
    numerically, but the driver's canonical hash formats 1234 vs 1234.0
    differently. compare() must flag the dtype-class mismatch instead of
    passing on numeric equality — proven against the literal pre-fix
    oracle shape (uncast SUM over a BIGINT column)."""
    import pandas as pd

    from tools.oracle_check import compare, dtype_class

    prefix_oracle = duck.sql(
        """
        SELECT source,
               COUNT(*) AS n_docs,
               SUM(CAST(LENGTH(regexp_extract_all(text, '\\S+')) AS BIGINT))
                   AS pack_tokens
        FROM documents GROUP BY source ORDER BY source
        """
    ).df()
    assert dtype_class(prefix_oracle["pack_tokens"]) == "float"  # the landmine
    spark_shaped = prefix_oracle.copy()
    spark_shaped["pack_tokens"] = spark_shaped["pack_tokens"].astype("int64")
    problems = compare("pre_fix_packing", spark_shaped, prefix_oracle)
    assert any("dtype class differs" in p for p in problems), problems
    # and the CAST fix clears it
    fixed = prefix_oracle.copy()
    fixed["pack_tokens"] = fixed["pack_tokens"].astype("int64")
    assert compare("post_fix_packing", spark_shaped, fixed) == []


def test_priority_and_certified_names_exist():
    # A typo in _PRIORITY/_CERTIFIED silently reorders the driver's checked
    # window — pin that every listed name is a real registry query.
    import __spark_entry__ as m

    names = set(m.plans.REGISTRY)
    missing_p = [n for n in m._PRIORITY if n not in names]
    missing_c = [n for n in m._CERTIFIED if n not in names]
    missing_n = [n for n in m._NEW_R03 if n not in names]
    assert missing_p == [] and missing_c == [] and missing_n == []
    ordered = list(m.queries())
    assert ordered[: len(m._PRIORITY)] == m._PRIORITY
    # certified queries occupy the tail, never the checked window
    assert all(n in m._CERTIFIED for n in ordered[-len(m._CERTIFIED):])
    # rotation invariant: every uncertified query that predates this round
    # (i.e. is not in the current _NEW_* list) must sit inside the driver's
    # 50-query window — only current-round additions may overflow, and they
    # rotate into the next round's window.
    uncert = [n for n in ordered if n not in m._CERTIFIED]
    assert ordered[: len(uncert)] == uncert
    overflow = uncert[50:]
    assert all(n in m._NEW_R03 for n in overflow), (
        f"pre-existing uncertified queries pushed out of the window: "
        f"{[n for n in overflow if n not in m._NEW_R03]}"
    )
