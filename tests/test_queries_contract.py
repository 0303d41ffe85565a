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


def test_registry_order_unproven_first_then_stalest():
    """The driver proves only the first 50 REGISTRY entries per round; the
    mechanical ordering must float every never-proven name ahead of every
    proven one so proof coverage can't silently cap (round-3 verdict #3),
    then (round 12) the optimization-touched _REPROOF_PRIORITY block whose
    plans changed most recently (round-11 verdict #7), and within the
    remaining proven group order by OLDEST latest-green round first so each
    round re-proves the stalest entries instead of re-submitting the same
    50 forever (round-7 verdict #4)."""
    from sentiment_analysis_data_pipeline_spark.queries import (
        REGISTRY,
        _REGISTRY_BASE,
        _REPROOF_PRIORITY,
        _proven_rounds,
    )

    assert set(REGISTRY) == set(_REGISTRY_BASE)
    proven = _proven_rounds(_REGISTRY_BASE)
    names = list(REGISTRY)
    # tier 1: every unproven name precedes every proven one
    seen_proven = False
    for n in names:
        if n in proven:
            seen_proven = True
        else:
            assert not seen_proven, f"unproven {n!r} listed after a proven entry"
    # tier 2: the reproof-priority block heads the proven group, in its
    # declared order
    proven_names = [n for n in names if n in proven]
    prio = [n for n in _REPROOF_PRIORITY if n in proven]
    assert proven_names[: len(prio)] == prio
    # tier 3: the rest is stalest-first
    prev_round = 0
    for n in proven_names[len(prio):]:
        assert proven[n] >= prev_round, (
            f"proven {n!r} (r{proven[n]}) listed after a fresher entry (r{prev_round})"
        )
        prev_round = proven[n]
    # With the whole registry ever-proven, the driver's 50-row window must
    # hit the priority block then the stalest proofs, never the newest.
    if len(proven) == len(names):
        rest = [n for n in names if n not in _REPROOF_PRIORITY]
        first_rounds = [proven[n] for n in rest[:40]]
        assert max(first_rounds) <= min(
            proven[n] for n in rest[40:]
        ), "rotation failed: a fresher proof precedes a staler one across the window"


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


def test_no_duplicate_defs_or_registry_keys():
    """Name-shadowing guard (round 8): a re-`def q_<name>` silently rebinds
    every later reference and a duplicate _REGISTRY_BASE key keeps only the
    last pair -- both mispair a Spark callable with another query's oracle
    (the second funnel_conversion and the _key_skew_sql collision were
    caught by failures, not by review). Parse the source and refuse both."""
    import os
    import re
    from collections import Counter

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = open(
        os.path.join(root, "sentiment_analysis_data_pipeline_spark", "queries.py")
    ).read()
    defs = re.findall(r"^def ([a-zA-Z_0-9]+)", src, re.M)
    dup_defs = [n for n, c in Counter(defs).items() if c > 1]
    assert not dup_defs, f"duplicate top-level defs in queries.py: {dup_defs}"
    reg = src[src.index("_REGISTRY_BASE") :]
    keys = re.findall(r'^\s+"([a-z_0-9]+)":', reg, re.M)
    dup_keys = [k for k, c in Counter(keys).items() if c > 1]
    assert not dup_keys, f"duplicate registry keys: {dup_keys}"
