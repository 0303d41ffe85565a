"""Round-11 wave-14 behavioral pins (oracle gate proves cross-engine
equality; these prove each operator computes the claimed quantity on
closed-form fixtures)."""

from __future__ import annotations

import math

from sentiment_analysis_data_pipeline_spark import queries as Q


def _docs_view(spark, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).createOrReplaceTempView("documents")


def _events_view(spark, rows):
    spark.createDataFrame(
        rows,
        "event_id long, ts long, user_id long, event_type string, value double",
    ).createOrReplaceTempView("events")


# --------------------------------------------------------- dbscan_labels


def test_dbscan_planted_overlay_roles(spark):
    """The planted overlay on the top-24 vec_ids must produce exactly
    3 clusters of (3 cores + 1 border) and 4 noise per group, regardless
    of the natural pair structure below them."""
    from collections import Counter

    out = Q.q_dbscan_labels(spark, "/root/testdata/sf0.001").collect()
    roles = Counter(r["role"] for r in out)
    assert roles["core"] >= 9 and roles["border"] >= 3
    mx = max(r["vec_id"] for r in out)
    planted = {r["vec_id"]: r for r in out if r["vec_id"] > mx - 24}
    assert len(planted) == 24
    for g in range(3):
        m = mx - 23 + g * 8
        assert [planted[m + o]["role"] for o in range(8)] == (
            ["core", "core", "core", "border"] + ["noise"] * 4
        )
        # cluster = min core id; border inherits it; noise is -1
        assert all(planted[m + o]["cluster"] == m for o in range(4))
        assert all(planted[m + o]["cluster"] == -1 for o in range(4, 8))


# ------------------------------------------------------ kfold_assignment


def test_kfold_assignment_partitions_and_is_deterministic(spark):
    rows = [(i, "alpha bravo", "en" if i % 3 else "fr", "s", 1) for i in range(200)]
    _docs_view(spark, rows)
    out1 = {r["fold"]: r for r in spark.sql(Q._kfold_assignment_sql(Q.D.SPARK)).collect()}
    out2 = {r["fold"]: r for r in spark.sql(Q._kfold_assignment_sql(Q.D.SPARK)).collect()}
    assert sum(r["n_fold"] for r in out1.values()) == 200
    assert set(out1) <= set(range(Q.KFOLD_K))
    for f in out1:
        assert out1[f]["n_fold"] == out2[f]["n_fold"]  # md5 hash, not random
        assert out1[f]["chi2_lang"] >= 0.0


def test_kfold_chi2_counts_absent_cells(spark):
    """A lang drawn by NO doc of some fold must still contribute its
    expected mass: with 2 langs perfectly separable by... construct a tiny
    corpus where lang 'zz' has 1 doc, so 4 folds miss it entirely and get
    chi2 >= expected-mass > 0 rather than 0."""
    rows = [(i, "alpha", "en", "s", 1) for i in range(100)]
    rows.append((1000, "alpha", "zz", "s", 1))
    _docs_view(spark, rows)
    out = spark.sql(Q._kfold_assignment_sql(Q.D.SPARK)).collect()
    zz_holder = None
    for r in out:
        assert r["chi2_lang"] > 0.0  # every fold is off-expectation for zz
    assert sum(r["n_fold"] for r in out) == 101


# ------------------------------------------------------- hill_tail_index


def test_hill_tail_index_recovers_pareto_alpha(spark):
    """Exact Pareto(alpha=2) quantile grid: x_i = (1 - i/n)^(-1/2) for the
    top-k order statistics gives a Hill estimate ~ 2."""
    n = 5000
    rows = [
        (i, 0, i, "e", (1.0 - i / n) ** (-1.0 / 2.0)) for i in range(n)
    ]
    _events_view(spark, rows)
    r = spark.sql(Q._hill_tail_index_sql(Q.D.SPARK)).collect()[0]
    assert r["k"] == Q.HILL_K
    assert abs(r["hill_alpha"] - 2.0) < 0.25


def test_hill_tail_index_constant_values_guarded(spark):
    rows = [(i, 0, i, "e", 7.0) for i in range(300)]
    _events_view(spark, rows)
    r = spark.sql(Q._hill_tail_index_sql(Q.D.SPARK)).collect()[0]
    assert r["hill_alpha"] == 0.0  # all-equal top-k -> zero log-sum, guarded


# --------------------------------------------------------------- ipw_ate


def test_ipw_ate_removes_stratum_confounding(spark):
    """Treatment has ZERO within-stratum effect but treated users are
    over-represented in the high-value stratum: the naive diff of means is
    large, the stratified estimate must be ~0."""
    rows = []
    eid = 0
    # stratum H: y=100, 8 treated (odd user_id), 2 control
    for u in [1, 3, 5, 7, 9, 11, 13, 15, 2, 4]:
        rows.append((eid, 0, u, "H", 100.0)); eid += 1
    # stratum L: y=1, 2 treated, 8 control
    for u in [17, 19, 6, 8, 10, 12, 14, 16, 18, 20]:
        rows.append((eid, 0, u, "L", 1.0)); eid += 1
    _events_view(spark, rows)
    r = spark.sql(Q._ipw_ate_sql(Q.D.SPARK)).collect()[0]
    assert r["n_strata_used"] == 2 and r["n_rows_used"] == 20
    assert abs(r["ate"]) < 1e-6  # exact 0 up to quantization


def test_ipw_ate_excludes_single_arm_strata(spark):
    rows = [(i, 0, 2 * i, "onlyctrl", 5.0) for i in range(10)]  # all control
    rows += [(100 + i, 0, i, "ok", float(i % 3)) for i in range(10)]
    _events_view(spark, rows)
    r = spark.sql(Q._ipw_ate_sql(Q.D.SPARK)).collect()[0]
    assert r["n_strata_excluded"] == 1 and r["n_rows_excluded"] == 10
    assert r["n_strata_used"] == 1


# ------------------------------------------------------ vocab_composition


def test_vocab_composition_counts(spark):
    rows = [
        (0, "aa aa bb cc", "en", "s1", 1),   # aa tf2, bb/cc hapax
        (1, "bb dd", "en", "s1", 1),          # bb -> tf2 (dis), dd hapax
        (2, "xx xx xx", "en", "s2", 1),
    ]
    _docs_view(spark, rows)
    out = {r["source"]: r for r in spark.sql(Q._vocab_composition_sql(Q.D.SPARK)).collect()}
    s1 = out["s1"]
    assert s1["n_tokens"] == 6 and s1["vocab"] == 4
    assert s1["hapax"] == 2  # cc, dd
    assert s1["dis"] == 2  # aa, bb
    assert s1["hapax_share"] == 0.5 and s1["ttr"] == 4 / 6
    s2 = out["s2"]
    assert s2["vocab"] == 1 and s2["hapax"] == 0 and s2["ttr"] == 1 / 3
