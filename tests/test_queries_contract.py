"""Driver-contract smoke: every registry entry runs and returns rows with a
stable schema; oracle coverage is complete."""

from __future__ import annotations

import pytest

import __spark_entry__ as E


def test_entry_smoke(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) == 3
    assert df.columns == ["key", "doc_count"]


def test_registry_order_unproven_first():
    """The driver proves only the first 50 REGISTRY entries per round; the
    mechanical ordering must float every never-proven name ahead of every
    proven one so proof coverage can't silently cap (round-3 verdict #3)."""
    from sentiment_analysis_data_pipeline_spark.queries import (
        REGISTRY,
        _REGISTRY_BASE,
        _proven_names,
    )

    assert set(REGISTRY) == set(_REGISTRY_BASE)
    proven = _proven_names(_REGISTRY_BASE)
    names = list(REGISTRY)
    seen_proven = False
    for n in names:
        if n in proven:
            seen_proven = True
        else:
            assert not seen_proven, f"unproven {n!r} listed after a proven entry"


def test_oracle_coverage():
    qs, oracles = E.queries(), E.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 25
    # every oracle is syntactically runnable duckdb SQL
    import duckdb

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events documents embeddings").split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '/root/testdata/sf0.001/{t}.parquet'")
    for name, sql in oracles.items():
        con.sql(sql)  # raises on syntax/semantic errors


@pytest.mark.parametrize("name", sorted(E.queries()))
def test_query_runs(spark, sf_dir, name):
    df = E.queries()[name](spark, sf_dir)
    rows = df.collect()
    assert rows is not None
    assert len(df.columns) > 0
    # keyword_search may legitimately be small; volume_shipping's nation-pair
    # x ship-year filter (TPC-H Q7 shape) selects zero rows from sf0.001's
    # ~6k lineitems (it is hash-checked vs the oracle at sf0.01).
    if name not in ("keyword_search", "volume_shipping"):
        assert len(rows) > 0
