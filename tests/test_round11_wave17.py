"""Round-11 wave-17 behavioral pins (the oracle gate proves cross-engine
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


HOUR_NS = 3_600_000_000_000


# ------------------------------------------------------ group_sequential


def test_group_sequential_boundary_shape_and_counts(spark):
    """Users enroll over 5 distinct hours (one per look window); user u
    converts iff its purchase lands within 24h of entry. The cumulative
    panel must accrue users look by look and the OBF bounds must decrease
    as C*sqrt(K/k)."""
    rows = []
    eid = 0
    for u in range(10):  # users 0..9, first event at hour 2*u
        eid += 1
        rows.append((eid, 2 * u * HOUR_NS, u, "view", 0.0))
        # even users purchase 1h after entry (convert); odd never purchase
        if u % 2 == 0:
            eid += 1
            rows.append((eid, (2 * u + 1) * HOUR_NS, u, "purchase", 5.0))
    _events_view(spark, rows)
    out = spark.sql(Q._group_sequential_sql(Q.D.SPARK)).collect()
    assert len(out) == Q._GS_LOOKS
    ns = [(r["n_t"] + r["n_c"]) for r in out]
    assert ns == sorted(ns) and ns[-1] == 10  # monotone accrual to all
    for k, r in enumerate(out, 1):
        assert abs(r["obf_bound"] - Q._GS_C * math.sqrt(Q._GS_LOOKS / k)) < 1e-12
    # conversions: every even-user purchase is within 24h -> conv = number
    # of even users enrolled by the look bound
    last = out[-1]
    assert last["conv_t"] + last["conv_c"] == 5
    # controls (even users) all convert, treated never: |z| grows with n
    # and crosses the SHRINKING boundary exactly at looks 4 and 5
    # (|z| = 2.83 vs 2.28, 3.16 vs 2.04) -- the early-stop branch is live
    assert [r["crossed"] for r in out] == [False, False, False, True, True]
    assert abs(abs(last["z"]) - 1.0 / math.sqrt(0.25 * (2.0 / 5.0))) < 1e-12


def test_group_sequential_conversion_window(spark):
    """A purchase 30h after entry must NOT count as conversion (24h
    window), even though it precedes the final look bound."""
    rows = [
        (1, 0, 1, "view", 0.0),
        (2, 30 * HOUR_NS, 1, "purchase", 5.0),
        (3, 0, 2, "view", 0.0),
        (4, 40 * HOUR_NS, 2, "view", 0.0),
        (5, 35 * HOUR_NS, 3, "view", 0.0),
    ]
    _events_view(spark, rows)
    out = spark.sql(Q._group_sequential_sql(Q.D.SPARK)).collect()
    assert all(r["conv_t"] + r["conv_c"] == 0 for r in out)


# ------------------------------------------------------ positivity_check


def test_positivity_closed_form(spark):
    """Stratum A (activity 2): 2 treated + 2 controls -> e = 0.5, w = 1.
    Stratum B (activity 4): 1 treated, 0 controls -> violation. ESS_c
    over stratum A alone: w constant -> ESS = n_t^2*1e6.../ exact = 2."""
    rows = []
    eid = 0
    for u in (1, 3, 2, 4):  # two treated (odd), two controls (even), act 2
        for _ in range(2):
            eid += 1
            rows.append((eid, 0, u, "view", 0.0))
    for _ in range(4):  # user 5 treated, activity 4
        eid += 1
        rows.append((eid, 0, 5, "view", 0.0))
    _events_view(spark, rows)
    out = {r["stratum"]: r for r in spark.sql(Q._positivity_check_sql(Q.D.SPARK)).collect()}
    a = out[2 // Q._CEM_BIN]
    assert (a["n_t"], a["n_c"], a["e"], a["w_att"]) == (2, 2, 0.5, 1.0)
    assert not a["violates_positivity"]
    b = out[4 // Q._CEM_BIN]
    assert b["violates_positivity"] and b["n_c"] == 0
    # ESS: only stratum A contributes (w=1 over 2 controls) -> ESS = 2
    assert abs(a["ess_control"] - 2.0) < 1e-6


def test_positivity_extreme_propensity_flag(spark):
    """9 treated vs 1 control in one stratum -> e = 0.9... wait, flags are
    strict: e = 0.9 is NOT > 0.9; use 10:1 -> e > 0.9 flagged."""
    rows = []
    eid = 0
    for u in range(1, 22, 2):  # 11 odd users (treated), activity 2
        eid += 1
        rows.append((eid, 0, u, "view", 0.0))
        eid += 1
        rows.append((eid, 0, u, "view", 0.0))
    rows.append((99, 0, 2, "view", 0.0))
    rows.append((100, 0, 2, "view", 0.0))  # one control, activity 2
    _events_view(spark, rows)
    out = spark.sql(Q._positivity_check_sql(Q.D.SPARK)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_t"] == 11 and r["n_c"] == 1
    assert r["e"] > 0.9 and r["violates_positivity"]


# -------------------------------------------------------- blocklist_rate


def test_blocklist_natural_and_injected_hits(spark):
    """doc 1 (not a 29-multiple) with a natural blocklist token counts;
    doc 29 gets the injected ' casino prize' pair; doc 2 clean."""
    _docs_view(
        spark,
        [
            (1, "win the jackpot now", "en", "s1", 0),
            (2, "perfectly clean text", "en", "s1", 0),
            (29, "ordinary words here", "en", "s2", 0),
        ],
    )
    out = {r["source"]: r for r in spark.sql(Q._blocklist_rate_sql(Q.D.SPARK)).collect()}
    assert out["s1"]["flagged_docs"] == 1 and out["s1"]["hit_tokens"] == 1
    assert out["s1"]["flag_rate"] == 0.5
    assert out["s2"]["flagged_docs"] == 1 and out["s2"]["hit_tokens"] == 2


# --------------------------------------------------- quality_signal_corr


def test_quality_corr_panel_shape_and_bounds(spark):
    """Six pairs, every r in [-1, 1]; word_count x quality must be
    strongly positive on a corpus where quality is length-driven."""
    rows = [
        (i, " ".join(["the word is"] * i), "en", "s", 0) for i in range(1, 13)
    ]  # ids 1..12: none hits the %23 punctuation injection
    _docs_view(spark, rows)
    out = {(r["sig_a"], r["sig_b"]): r["r"] for r in spark.sql(Q._quality_signal_corr_sql(Q.D.SPARK)).collect()}
    assert len(out) == 6
    assert all(-1.0 <= v <= 1.0 for v in out.values())
    assert out[("word_count", "quality")] > 0.9


def test_quality_corr_constant_signal_guard(spark):
    """Identical docs -> zero variance on every signal -> all r guarded
    to 0."""
    _docs_view(spark, [(i, "same text here", "en", "s", 0) for i in range(1, 6)])
    out = spark.sql(Q._quality_signal_corr_sql(Q.D.SPARK)).collect()
    assert all(r["r"] == 0.0 for r in out)


# ------------------------------------------------------------ tail_trend


def test_tail_trend_exact_p90_and_slope(spark):
    """Day 0: values 1..10 -> p90 band = 9 (ceil(0.9*10)=9th of sorted).
    Day 1: values 11..20 -> p90 band = 19. Slope = 10 per day."""
    rows = []
    eid = 0
    for day in (0, 1):
        for i in range(1, 11):
            eid += 1
            rows.append((eid, day * 24 * HOUR_NS, 1, "view", float(10 * day + i)))
    _events_view(spark, rows)
    out = spark.sql(Q._tail_trend_sql(Q.D.SPARK)).collect()
    assert len(out) == 2
    assert out[0]["p90_band"] == 9 and out[1]["p90_band"] == 19
    assert out[0]["p90_slope"] == 10.0 and out[0]["n_days"] == 2


def test_tail_trend_single_day_guard(spark):
    _events_view(spark, [(1, 0, 1, "view", 3.0), (2, 0, 1, "view", 7.0)])
    out = spark.sql(Q._tail_trend_sql(Q.D.SPARK)).collect()
    assert len(out) == 1 and out[0]["p90_slope"] == 0.0
    assert out[0]["p90_band"] == 7  # ceil(0.9*2)=2nd of {3,7}
